"""S12 late-data semantics + S13 multi-collection supervision matrix."""

from __future__ import annotations

import json
import os
import uuid

from mrcond_spark.streaming import windows
from mrcond_spark.streaming.metrics import Metrics
from mrcond_spark.streaming.sink import MemoryPublisher
from mrcond_spark.streaming.source import file_replay_stream
from mrcond_spark.streaming.supervisor import ConnectorServer, StreamSpec

from test_streaming import drop_event, insert_event, received_docs, write_envelope_file


def _write_events(d: str, fname: str, rows: list[tuple]) -> None:
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{fname}.tmp")
    with open(tmp, "w") as f:
        for i, (ts, uid, et, v) in enumerate(rows):
            f.write(
                json.dumps(
                    {"event_id": i, "ts": ts, "user_id": uid, "event_type": et, "value": v}
                )
                + "\n"
            )
    os.rename(tmp, os.path.join(d, fname))


def test_watermark_drops_late_rows(spark, tmp_path):
    """An event older than watermark behind the observed max ts must be
    dropped from a windowed aggregation in append mode (S5/S12 contract)."""
    d = str(tmp_path / "late-events")
    # batch 0: advance event time to 01:00
    _write_events(
        d,
        "b0.json",
        [
            ("2024-01-01T00:00:30.000Z", 1, "view", 1.0),
            ("2024-01-01T01:00:00.000Z", 1, "view", 1.0),
        ],
    )
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"

    def agg_df():
        return windows.tumbling_counts(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(d),
            duration="5 minutes",
            watermark="10 minutes",
        )

    ckpt = str(tmp_path / "ckpt")
    emitted: list = []

    def run_once():
        q = (
            agg_df()
            .writeStream.foreachBatch(
                lambda bdf, eid: emitted.extend(bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()

    # batch 1: a row 50+ minutes behind the watermark -> must be dropped
    _write_events(d, "b1.json", [("2024-01-01T00:00:40.000Z", 9, "view", 99.0)])
    # and one fresh row to push processing forward
    _write_events(d, "b2.json", [("2024-01-01T01:20:00.000Z", 1, "view", 1.0)])
    run_once()

    # the late user-9 event must not appear in any emitted window
    assert emitted, "no windows emitted"
    assert not [r for r in emitted if r["sum_value"] == 99.0]


def test_observe_metrics_attach(spark, tmp_path):
    d = str(tmp_path / "obs-events")
    _write_events(d, "b0.json", [("2024-01-01T00:00:30.000Z", 1, "view", 1.0)])
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    seen = {}

    df = windows.with_late_data_metrics(spark.readStream.schema(schema).json(d))
    q = (
        df.writeStream.format("memory")
        .queryName(f"obs_{uuid.uuid4().hex[:6]}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for p in q.recentProgress:
        om = p.get("observedMetrics", {}) if isinstance(p, dict) else p["observedMetrics"]
        if "late_data" in om:
            seen = om["late_data"]
    assert seen and seen["rows"] == 1


def test_three_collection_matrix(spark, tmp_path):
    """S13: healthy / sink-failing / dropped collections supervised together;
    each reaches its correct terminal state independently."""
    base = tmp_path
    specs, pubs, dirs = [], {}, {}
    docs = [{"n": i} for i in range(3)]
    for role in ("healthy", "failing", "dropped"):
        name = f"{role}-{uuid.uuid4().hex[:6]}"
        d = str(base / f"{role}-events")
        os.makedirs(d, exist_ok=True)
        pub = MemoryPublisher.named(name)
        pubs[role], dirs[role] = pub, d
        specs.append(
            StreamSpec(
                stream_name=name,
                source_factory=(lambda dd=d: file_replay_stream(spark, dd)),
                publisher=pub,
                checkpoint_dir=str(base / f"{role}-ckpt"),
                available_now=True,
            )
        )
        events = [insert_event(i, doc) for i, doc in enumerate(docs)]
        if role == "dropped":
            events.append(drop_event(len(events)))
        write_envelope_file(d, "b0.json", events)
    pubs["failing"].fail_next = 1

    metrics = Metrics()
    server = ConnectorServer(specs, metrics=metrics)
    server.start()
    server.await_all(poll_interval_s=0.2, timeout_s=240)

    for role, spec in zip(("healthy", "failing", "dropped"), specs):
        assert received_docs(pubs[role], spec.stream_name) == docs, role
    dropped_name = specs[2].stream_name
    failing_name = specs[1].stream_name
    assert dropped_name in server.stopped_clean
    assert metrics.restarts == {(failing_name, "sink"): 1}
    assert not os.path.exists(str(base / "dropped-ckpt"))
