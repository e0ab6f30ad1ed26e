"""Batch source IO tests (sources/batch.py)."""

from __future__ import annotations

import os

from mrcond_spark.sources import read_table, write_table


def test_parquet_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id LONG, v STRING")
    path = str(tmp_path / "t.parquet")
    write_table(df, path)
    back = read_table(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_csv_with_schema(spark, tmp_path):
    path = str(tmp_path / "t.csv")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id LONG, v STRING")
    write_table(df, path, fmt="csv", header="true")
    back = read_table(spark, path, fmt="csv", schema="id LONG, v STRING")
    assert back.schema.simpleString() == "struct<id:bigint,v:string>"
    assert back.count() == 2


def test_partitioned_write_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", "2024"), (2, "y", "2024"), (3, "z", "2025")], "id LONG, v STRING, yr STRING"
    )
    path = str(tmp_path / "part")
    write_table(df, path, partition_by=["yr"])
    assert sorted(d for d in os.listdir(path) if d.startswith("yr=")) == ["yr=2024", "yr=2025"]
    back = read_table(spark, path)
    filtered = back.filter("yr = '2025'")
    assert filtered.count() == 1
    # the predicate must become a PARTITION filter (directory pruning — at
    # scale the difference between listing one partition and scanning all),
    # not a post-scan data filter
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "yr" in plan.split("PartitionFilters", 1)[1][:120], plan


def test_json_round_trip(spark, tmp_path):
    path = str(tmp_path / "t.json")
    df = spark.createDataFrame([(1, {"k": "v"})], "id LONG, m MAP<STRING,STRING>")
    write_table(df, path, fmt="json")
    back = read_table(spark, path, fmt="json", schema="id LONG, m MAP<STRING,STRING>")
    assert back.collect()[0]["m"] == {"k": "v"}


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """A join of two tables bucketed on the join key runs with NO Exchange —
    the co-located layout that replaces the shuffle at 100 TB."""
    from pyspark.sql import functions as F

    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    try:
        write_table(a, str(tmp_path / "ba"), bucket_by=(8, ["k"]), table_name="bt_a")
        write_table(b, str(tmp_path / "bb"), bucket_by=(8, ["k"]), table_name="bt_b")
        # merge hint pins sort-merge join: bucketed layout must satisfy the
        # join's distribution requirement with zero Exchange operators
        joined = spark.table("bt_a").hint("merge").join(spark.table("bt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_orc_round_trip(spark, tmp_path):
    """ORC is the second columnar format the engine reads/writes natively
    (vectorized reader + pushdown, same as parquet)."""
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id LONG, v STRING")
    path = str(tmp_path / "t.orc")
    write_table(df, path, fmt="orc")
    back = read_table(spark, path, fmt="orc").filter("id >= 2")
    assert sorted(tuple(r) for r in back.collect()) == [(2, "b"), (3, "c")]
