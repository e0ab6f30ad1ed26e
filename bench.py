#!/usr/bin/env python
"""Benchmark harness: runs the declared query corpus at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full execution, no
collect/driver materialization — same discipline as a cluster run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mrcond_spark.queries import all_queries  # noqa: E402
from mrcond_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: every declared query (batch + LLM tiers). Streaming is
# benchmarked separately (tests/test_streaming.py harness).
SKIP: set[str] = set()


def main() -> None:
    spark = get_spark("mrcond-bench", cpus=CPUS, shuffle_partitions=max(CPUS, 32))
    queries = all_queries()

    # warm the JVM + parquet footers with one tiny query, not counted
    queries["q01_scan_project"].spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        if name in SKIP:
            continue
        t0 = time.perf_counter()
        df = queries[name].spark(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "declared_corpus_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_queries": len(timings),
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
