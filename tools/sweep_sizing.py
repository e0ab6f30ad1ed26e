"""Off-anchor calibration sweep for streaming state-partition sizing.

Round-8 calibrated ``streaming/sizing.py::ROWS_PER_TASK = 32768`` at ONE
per-trigger volume (100k rows, where 4 partitions won). Round-9 judge task:
sweep two more volumes (~10k and ~1M rows/trigger) on the same windowed-agg
bench shape and record whether ``ceil(rows / 32768)`` still picks the
winning (or within-noise-of-winning) partition count off-anchor.

Usage: ``python tools/sweep_sizing.py [volume ...]`` (defaults: 10000
1000000). Prints one JSON line per (volume, partitions) setting plus a
per-volume summary. Run in a quiet window (check /proc/loadavg first —
host storms swing results; PERF.md §r6 reconciliation).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EVENT_SCHEMA, _write_event_files  # noqa: E402
from mrcond_spark.session import get_spark  # noqa: E402
from mrcond_spark.streaming import windows  # noqa: E402
from mrcond_spark.streaming.sizing import ROWS_PER_TASK  # noqa: E402


def one_run(spark, n_events: int, parts: int) -> tuple[float, bool]:
    """One windowed-agg drain at an explicit partition count; returns
    (ev/s over what the complete-mode snapshot aggregated — same honesty
    rule as bench.bench_windowed_stream, drain_finished). A timed-out drain
    (awaitTermination cap hit) still yields a rate over the partial
    snapshot, but the caller marks and excludes it so a truncated sample
    can never be folded into the calibration record as a clean one."""
    tmp = tempfile.mkdtemp(prefix="sweep-sizing-")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        events_dir = os.path.join(tmp, "events")
        _write_event_files(events_dir, n_events)
        stream = spark.readStream.schema(EVENT_SCHEMA).json(events_dir)
        agg = windows.tumbling_counts(stream, duration="5 minutes")
        name = f"sweep{uuid.uuid4().hex[:8]}"
        t0 = time.perf_counter()
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(300)
        elapsed = time.perf_counter() - t0
        if not finished:
            q.stop()
        counted = spark.sql(f"SELECT COALESCE(SUM(cnt), 0) AS c FROM {name}").collect()[0]["c"]
        spark.catalog.dropTempView(name)
        rate = round(counted / elapsed, 1) if elapsed > 0 else 0.0
        return rate, bool(finished)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    volumes = [int(v) for v in sys.argv[1:]] or [10_000, 1_000_000]
    best_of = int(os.environ.get("SWEEP_BEST_OF", "2"))
    spark = get_spark(app_name="sweep-sizing")
    # warm-up: one discarded drain so the first graded cell (the lowest
    # partition count at the first volume — exactly the rule's predicted
    # winner at small volumes) doesn't pay the process's JVM/codegen
    # cold-start while every later cell runs warm
    one_run(spark, min(volumes), 4)
    for n in volumes:
        predicted = max(1, math.ceil(n / ROWS_PER_TASK))
        # candidate grid: the prediction, its neighbors, and the old
        # cluster-width default for contrast
        cand = sorted(
            {1, 2, 4, 8, max(1, predicted // 2), predicted, predicted * 2, 32, 64}
        )
        results: dict[int, float] = {}
        for p in cand:
            runs = [one_run(spark, n, p) for _ in range(best_of)]
            clean = [r for r, fin in runs if fin]
            results[p] = max(clean) if clean else 0.0
            print(
                json.dumps(
                    {
                        "volume": n,
                        "parts": p,
                        "best_evps": results[p],
                        "samples": [r for r, _ in runs],
                        "timed_out": sum(1 for _, fin in runs if not fin),
                    }
                ),
                flush=True,
            )
        winner = max(results, key=lambda p: results[p])
        print(
            json.dumps(
                {
                    "volume": n,
                    "summary": True,
                    "predicted_parts": predicted,
                    "winner_parts": winner,
                    "predicted_evps": results[predicted],
                    "winner_evps": results[winner],
                    "predicted_over_winner": round(
                        results[predicted] / results[winner], 3
                    )
                    if results[winner]
                    else None,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
