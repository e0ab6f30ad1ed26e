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


def test_salted_aggregate_rejects_non_algebraic():
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(None, ["k"], [("avg", "v", "a")])
