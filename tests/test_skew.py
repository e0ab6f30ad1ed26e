"""Skew-mitigation tests: the salted aggregate must be value-identical to the
plain aggregate and spread hot keys across partial groups."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mrcond_spark.catalog import load
from mrcond_spark.operators.skew import salted_aggregate


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    plain = {
        tuple(r[:1]): r[1:]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"),
            F.min("l_orderkey").alias("mn"),
            F.max("l_orderkey").alias("mx"),
        )
        .collect()
    }
    salted = {
        tuple(r[:1]): r[1:]
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            [
                ("count", "*", "cnt"),
                ("sum", F.col("l_quantity").cast("decimal(18,2)"), "sq"),
                ("min", "l_orderkey", "mn"),
                ("max", "l_orderkey", "mx"),
            ],
            salt_buckets=16,
        ).collect()
    }
    assert salted == plain


def test_content_salt_is_layout_independent(spark):
    """The salt must be a pure function of row content: reshuffling the input
    into a different partition layout must assign every row the SAME salt
    (seeded rand — the previous implementation — fails this: it is
    deterministic only per partition index)."""
    from mrcond_spark.operators.skew import content_salt

    base = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 113).alias("v")
    )
    layouts = [base.repartition(1), base.repartition(37, "v"), base.coalesce(3)]
    salted = [
        {(r["k"], r["v"]): r["s"] for r in
         df.withColumn("s", content_salt(["k", "v"], 16)).collect()}
        for df in layouts
    ]
    assert salted[0] == salted[1] == salted[2]
    assert set(salted[0].values()) == set(range(16))  # spreads across all buckets


def test_salted_aggregate_rejects_non_algebraic():
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(None, ["k"], [("avg", "v", "a")])


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling (the runtime half of the skew story — salting
    is the planned half): with one mega-hot key, the final adaptive plan must
    mark the sort-merge join skew=true (the hot partition was split across
    tasks). Thresholds are lowered so test-scale data exhibits 'skew'."""
    from pyspark.sql import functions as F

    lowered = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in lowered}
    for k, v in lowered.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") < 199_900, 0).otherwise(F.col("id") % 100).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        joined = left.join(right, "k")
        rows = joined.collect()  # collect() finalizes THIS plan adaptively
        assert len(rows) == 200_000  # every left row matches exactly one right row
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
