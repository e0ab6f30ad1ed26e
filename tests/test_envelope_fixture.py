"""Pin the envelope against a RECORDED raw change-stream capture.

The reference's e2e asserts the exact change-event document the connector
forwards (`mrcond/tests/e2e.rs:407,437`). The sandbox has no mongod, so the
equivalent pin here is a recorded fixture: raw change-stream documents in
MongoDB extended-JSON wire shape (tests/fixtures/change_events_v10.jsonl),
normalized by ``raw_change_event_to_envelope`` into ``ENVELOPE_SCHEMA``.
Protects the R1→S2 seam against silent schema drift: if either the adapter
or ENVELOPE_SCHEMA changes shape, these goldens break.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os

from pyspark.sql import functions as F

from mrcond_spark.streaming import extended_json as ej
from mrcond_spark.streaming.envelope import ENVELOPE_SCHEMA, to_payload
from mrcond_spark.streaming.source import raw_change_event_to_envelope

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "change_events_v10.jsonl")


def _envelope_df(spark):
    with open(FIXTURE) as f:
        lines = [line.strip() for line in f if line.strip()]
    raw = spark.createDataFrame([(line,) for line in lines], "event STRING")
    return raw_change_event_to_envelope(raw)


def test_adapter_output_matches_envelope_schema(spark):
    env = _envelope_df(spark)
    got = {f.name: f.dataType.simpleString() for f in env.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in ENVELOPE_SCHEMA.fields}
    assert got == want, f"adapter drifted from ENVELOPE_SCHEMA: {got} vs {want}"


def test_recorded_capture_golden_values(spark):
    rows = _envelope_df(spark).orderBy("_id").collect()
    assert [r["operationType"] for r in rows] == ["insert", "insert", "delete", "drop"]

    first = rows[0]
    # resume token survives as opaque JSON (the reference's contract — it
    # never parses tokens, only stores/replays them)
    assert json.loads(first["_id"])["_data"].startswith("826418B5E3")
    assert first["ns"]["db"] == "appdb" and first["ns"]["coll"] == "people"
    assert json.loads(first["documentKey"])["_id"]["$oid"] == "6418b5e35c18956defdc2f70"
    assert first["clusterTime"] == datetime.datetime(2023, 3, 20, 5, 57, 55)
    doc = json.loads(first["fullDocument"])
    assert doc["name"] == "Alice" and doc["age"] == 30

    # delete carries the key but no document; drop carries neither
    assert rows[2]["fullDocument"] is None
    assert json.loads(rows[2]["documentKey"])["_id"]["$oid"] == "6418b5e35c18956defdc2f70"
    assert rows[3]["fullDocument"] is None and rows[3]["documentKey"] is None


def test_extended_json_types_round_trip_from_capture(spark):
    """BSON edge types inside fullDocument stay consumable: $oid, $numberLong,
    $numberDecimal, $date all extract typed via the extended_json helpers."""
    env = _envelope_df(spark).filter(F.col("operationType") == "insert")
    typed = env.select(
        ej.oid(F.col("fullDocument"), "_id").alias("doc_id"),
        F.get_json_object("fullDocument", "$.name").alias("name"),
        ej.number_long(F.col("fullDocument"), "age").alias("age"),
        ej.number_decimal(F.col("fullDocument"), "balance").alias("balance"),
        ej.date(F.col("fullDocument"), "joined").alias("joined"),
    ).orderBy("name")
    alice, bob = typed.collect()
    assert alice["doc_id"] == "6418b5e35c18956defdc2f70" and alice["age"] == 30
    assert bob["age"] == 25
    assert bob["balance"] == decimal.Decimal("19.9900")
    assert bob["joined"] == datetime.datetime(2023, 3, 19, 12, 0, 0)


def test_payload_preserves_capture_order_and_content(spark):
    """The publish projection over the recorded capture: payloads stay in
    resume-token order and re-parse to the original ns/key/document."""
    pdf = to_payload(_envelope_df(spark)).orderBy("_token").collect()
    payloads = [json.loads(r["value"]) for r in pdf]
    assert [p["operationType"] for p in payloads] == ["insert", "insert", "delete", "drop"]
    assert all(p["ns"]["db"] == "appdb" for p in payloads)
    assert json.loads(payloads[0]["fullDocument"])["name"] == "Alice"
