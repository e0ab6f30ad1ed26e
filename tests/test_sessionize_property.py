"""Property-based test: the sessionize operator must agree with a direct
single-threaded reference implementation on arbitrary generated inputs —
including ties (equal timestamps), exact-gap boundaries (strict >), and
multi-key interleavings."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

key_s = st.integers(min_value=0, max_value=3)
ts_s = st.integers(min_value=0, max_value=120)

GAP_SECONDS = 10


def reference_sessions(rows: list[tuple[int, int, int]]) -> dict[tuple[int, int], int]:
    """(key, ts, row_id) -> session_seq via a plain sorted scan."""
    out: dict[tuple[int, int], int] = {}
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, ts, rid in rows:
        by_key.setdefault(k, []).append((ts, rid))
    for k, items in by_key.items():
        items.sort()
        seq, prev = 0, None
        for ts, rid in items:
            if prev is None or ts - prev > GAP_SECONDS:
                seq += 1
            prev = ts
            out[(k, rid)] = seq
    return out


@settings(max_examples=12, deadline=None)
@given(rows=st.lists(st.tuples(key_s, ts_s), min_size=1, max_size=25))
def test_sessionize_matches_reference(spark_global, rows):
    from pyspark.sql import functions as F

    from mrcond_spark.operators.sessionize import sessionize

    spark = spark_global
    # unique row ids make ties deterministic on both sides
    tagged = [(k, ts, i) for i, (k, ts) in enumerate(rows)]
    df = (
        spark.createDataFrame(tagged, "k LONG, tsec LONG, rid LONG")
        .withColumn("ts", F.timestamp_seconds("tsec"))
        .drop("tsec")
    )
    got = {
        (r["k"], r["rid"]): r["session_seq"]
        for r in sessionize(
            df, key_col="k", ts_col="ts", order_cols=("rid",), gap_seconds=GAP_SECONDS
        ).collect()
    }
    assert got == reference_sessions(tagged)
