"""Per-collection CDC pipeline (SURVEY §2.1 R1–R7 → §2.3 S1–S4).

One checkpointed streaming query per watched collection:

    source (change stream / file replay)
      -> foreachBatch: sort by resume token, to_json(struct(*)), publish
      -> checkpoint commit (R2/R6: replaces the resume-token store)

Terminal handling (R7): a ``drop``/``invalidate`` event in a batch is
published (the reference forwards every event the cursor yields,
`connector.rs:145-167`) and then flags the query terminal; the supervisor
stops it cleanly and does NOT restart (`connector.rs:169-171`,
`server.rs:205-207`).

Sink failures raise out of foreachBatch tagged ``SINK_ERROR`` so the
supervisor can classify them (mirror of `server.rs:215-230`).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from .envelope import TERMINAL_OPERATIONS, to_payload
from .sink import Publish


@dataclass
class CdcQuery:
    """Handle pairing a StreamingQuery with its terminal-event flag."""

    stream_name: str
    query: StreamingQuery
    terminal: threading.Event = field(default_factory=threading.Event)

    @property
    def is_active(self) -> bool:
        return self.query.isActive


def start_cdc_query(
    source_df: DataFrame,
    publisher: Publish,
    stream_name: str,
    checkpoint_dir: str,
    available_now: bool = False,
) -> CdcQuery:
    """Start the publish pipeline for one collection's change stream.

    ``available_now=True`` drains everything currently available then stops —
    the replay-test mode; production runs continuous micro-batches.
    """
    publisher.declare(stream_name)
    terminal = threading.Event()

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        # ONE job per micro-batch: token + payload + operationType drained
        # together (sorted by resume token for the ordering contract), so
        # terminal detection costs nothing extra on the hot path. Arrow
        # toPandas beats a pickled-Row collect ~2x on the driver-side drain —
        # the drain is the serial section of the queue contract, so its
        # constant factor IS the throughput ceiling per queue: measured
        # 9.5k-14.1k ev/s single-queue (PERF.md "Per-queue CDC publish
        # ceiling" — the one intentional driver-side data path; scale axis
        # is per-collection fan-out, R8, per the reference's per-queue
        # ordering contract e2e.rs:413).
        pdf = to_payload(batch_df, include_operation=True).orderBy(F.col("_token")).toPandas()
        if len(pdf):
            try:
                publisher.publish_batch(stream_name, pdf["value"].tolist())
            except Exception as e:
                # tag sink-origin failures for supervisor classification
                raise RuntimeError(f"SINK_ERROR[{stream_name}]: {e}") from e
            if pdf["__op"].isin(list(TERMINAL_OPERATIONS)).any():
                terminal.set()

    writer = (
        source_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(stream_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return CdcQuery(stream_name=stream_name, query=query, terminal=terminal)
