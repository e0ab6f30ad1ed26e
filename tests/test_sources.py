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
    assert back.filter("yr = '2025'").count() == 1


def test_json_round_trip(spark, tmp_path):
    path = str(tmp_path / "t.json")
    df = spark.createDataFrame([(1, {"k": "v"})], "id LONG, m MAP<STRING,STRING>")
    write_table(df, path, fmt="json")
    back = read_table(spark, path, fmt="json", schema="id LONG, m MAP<STRING,STRING>")
    assert back.collect()[0]["m"] == {"k": "v"}
