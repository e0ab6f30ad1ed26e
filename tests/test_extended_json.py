"""Extended-JSON extraction fidelity (BSON edge types in fullDocument)."""

from __future__ import annotations

import datetime
import decimal
import json

from pyspark.sql import functions as F

from mrcond_spark.streaming import extended_json as ej

DOCS = [
    # extended-JSON shapes (what serde emits for BSON edge types)
    json.dumps(
        {
            "_id": {"$oid": "65a1b2c3d4e5f6a7b8c9d0e1"},
            "n": {"$numberLong": "9007199254740993"},
            "price": {"$numberDecimal": "19.9900"},
            "at": {"$date": "2024-03-01T12:30:00.000Z"},
            "at_ms": {"$date": {"$numberLong": "1709296200000"}},
        }
    ),
    # plain-JSON fallbacks
    json.dumps({"_id": "plain-id", "n": 42, "price": 1.5, "at": "2024-01-01T00:00:00.000Z"}),
]


def test_extended_json_extraction(spark):
    df = spark.createDataFrame([(d,) for d in DOCS], "doc STRING").select(
        ej.oid(F.col("doc"), "_id").alias("id"),
        ej.number_long(F.col("doc"), "n").alias("n"),
        ej.number_decimal(F.col("doc"), "price", scale=4).alias("price"),
        ej.date(F.col("doc"), "at").alias("at"),
        ej.date(F.col("doc"), "at_ms").alias("at_ms"),
    )
    ext, plain = df.collect()

    assert ext["id"] == "65a1b2c3d4e5f6a7b8c9d0e1"
    assert ext["n"] == 9007199254740993  # > 2^53: string-wrapped long survives
    assert ext["price"] == decimal.Decimal("19.9900")
    assert ext["at"] == datetime.datetime(2024, 3, 1, 12, 30)
    assert ext["at_ms"] == datetime.datetime(2024, 3, 1, 12, 30)

    assert plain["id"] == "plain-id"
    assert plain["n"] == 42
    assert plain["price"] == decimal.Decimal("1.5000")
    assert plain["at"] == datetime.datetime(2024, 1, 1)
