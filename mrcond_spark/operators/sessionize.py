"""Gap-based sessionization — batch analog of streaming session windows (S7).

Reference semantics (classic sessionization, same contract as
``session_window`` in Structured Streaming and the reference's downstream
session analyses): a new session starts at a row whose gap from the previous
row of the same key exceeds ``gap_seconds``; session ids are per-key ordinal
sequence numbers.

100 TB shape: ONE shuffle on the (high-cardinality) key; both windows below
share that single partitioning, and no global sort exists anywhere. The
running-sum trick (lag -> boundary flag -> prefix sum) is the standard
O(n log n / partition) formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = (),
    gap_seconds: int = 3600,
) -> DataFrame:
    """Append a ``session_seq`` column (1-based per key) to ``df``.

    ``order_cols`` break ties between equal timestamps deterministically.
    The gap comparison is strict: a gap of exactly ``gap_seconds`` stays in
    the same session.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    gap_us = int(gap_seconds) * 1_000_000
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
