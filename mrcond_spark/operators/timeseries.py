"""Time-series feature recurrences over event streams (SURVEY §2.4 E5+/B16
companion).

EWMA (exponentially weighted moving average) is the canonical *stateful
numeric recurrence*: ``e_i = alpha * v_i + (1 - alpha) * e_{i-1}``. Unlike a
windowed SUM it has multiplicative state, so it is NOT a plain SQL window
frame — but it IS exactly a linear recursive CTE, which is how the DuckDB
oracle states it (same pattern as the packing recurrence, packing.py).

Scale shape: one shuffle on the partition key (user/entity — high
cardinality), then one ``applyInPandas`` walk per group in event order.
Each group is O(rows/key) memory with zero driver involvement; at 100 TB
the key space is the parallelism dial exactly like streaming stateful ops.
Determinism: both engines evaluate the identical float64 op sequence in the
identical per-key order, so results are bit-equal and hash-checkable.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ewma(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key EWMA of ``value_col`` walking rows in ``order_cols`` order.

    ``order_cols`` must TOTALLY order rows within each key (e.g. include a
    unique id as tiebreak): ties leave the visit order to the shuffle, and a
    multiplicative recurrence is order-dependent — the result would vary
    run to run. Returns the input columns (key, order, value) plus
    ``out_col`` (double). The closure is self-contained (cloudpickle
    by-value) so consumers that cannot import this package on their Python
    workers still run it.
    """
    keyed = df.select(
        F.col(key_col).alias("__k"),
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        F.col(value_col).cast("double").alias("__v"),
    )
    ocols = [f"__o{i}" for i in range(len(order_cols))]
    otypes = [keyed.schema[c].dataType.simpleString() for c in ocols]
    a = float(alpha)

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        # `ewm(adjust=False)` computes the identical recurrence
        # e_i = a*v_i + (1-a)*e_{i-1} vectorized at C speed (the repo's
        # property test pins the loop<->ewm equivalence). Values must be
        # non-null: a NaN would diverge (ewm skips it; the recurrence
        # would propagate it) — q92 casts from a non-null events column.
        pdf = pdf.sort_values(ocols).reset_index(drop=True)
        pdf["__e"] = pdf["__v"].ewm(alpha=a, adjust=False).mean()
        return pdf

    schema = ", ".join(
        ["__k " + keyed.schema["__k"].dataType.simpleString()]
        + [f"{c} {t}" for c, t in zip(ocols, otypes)]
        + ["__v double", "__e double"]
    )
    out = keyed.groupBy("__k").applyInPandas(walk, schema=schema)
    return out.select(
        F.col("__k").alias(key_col),
        *[F.col(f"__o{i}").alias(c) for i, c in enumerate(order_cols)],
        F.col("__v").alias(value_col),
        F.col("__e").alias(out_col),
    )

def time_weighted_average(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    out_col: str = "twap",
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each observation's value is
    held until the NEXT observation and weighted by that holding interval —
    the metric a last-observation-carried-forward series (sensor feeds,
    prices, rate limits) aggregates to, where a plain ``avg`` over-weights
    bursts.

    Returns ``(key_col, n_intervals, out_col)``; keys with fewer than two
    observations produce no row (no interval exists). ``tiebreak_col``
    must make ``(ts, tiebreak)`` a total order per key — an ambiguous
    order would make the interval assignment nondeterministic.

    Determinism: intervals are exact integer microseconds
    (``unix_micros``); each ``value * dt_us`` product is computed in
    double (identical in any engine) and summed through per-term
    ``DECIMAL(38,18)`` casts — exact, order-independent — so the final
    double quotient is bit-identical to the SQL oracle's.

    Scale shape (100 TB): ONE shuffle on the high-cardinality key for the
    ``lead`` window, then a hash aggregate on the same key — AQE reuses
    the partitioning, so the agg is shuffle-free. No collect, no Python.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    us = F.unix_micros(F.col(ts_col))
    dt = (F.lead(us, 1).over(w) - us).alias("dt_us")
    seg = df.select(F.col(key_col), F.col(value_col).cast("double").alias("__v"), dt).filter(
        F.col("dt_us").isNotNull()
    )
    return (
        seg.groupBy(key_col)
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            (
                F.sum((F.col("__v") * F.col("dt_us")).cast("decimal(38,18)")).cast("double")
                / F.sum(F.col("dt_us"))
            ).alias(out_col),
        )
    )


def cusum(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    drift_col: str,
    out_col: str = "cusum",
) -> DataFrame:
    """Per-key one-sided CUSUM over a precomputed drift column:
    ``S_i = max(0, S_{i-1} + drift_i)``, ``S_0 = 0`` — the classic
    change-point statistic (Page 1954): the running sum of evidence for an
    upward mean shift, clamped at zero so old evidence cannot go negative.

    The caller computes ``drift = value - mu - slack`` JVM-side (keeping
    any exact-decimal reference-mean arithmetic out of Python); this
    operator only walks the recurrence. ``order_cols`` must totally order
    rows per key (the recurrence is order-dependent).

    Determinism: the walk applies EXACTLY the scalar op sequence
    ``max(0, s + d)`` per row (a frompyfunc accumulate — not the
    vectorized cumsum-minus-running-min identity, whose different float
    op order would drift in the last ulp from a recursive-SQL oracle).

    Scale shape (100 TB): one shuffle on the high-cardinality key, one
    Arrow walk per group — the batch analog of a stateful stream
    (applyInPandasWithState carries S as the state value). Self-contained
    closure (cloudpickle by-value).
    """
    keyed = df.select(
        F.col(key_col).alias("__k"),
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        F.col(drift_col).cast("double").alias("__d"),
    )
    ocols = [f"__o{i}" for i in range(len(order_cols))]
    otypes = [keyed.schema[c].dataType.simpleString() for c in ocols]

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(ocols).reset_index(drop=True)
        step = np.frompyfunc(lambda s, d: max(0.0, s + d), 2, 1)
        d = pdf["__d"].to_numpy()
        acc = step.accumulate(
            np.concatenate(([0.0], d)).astype(object)
        )[1:]
        pdf["__s"] = acc.astype(np.float64)
        return pdf

    schema = ", ".join(
        ["__k " + keyed.schema["__k"].dataType.simpleString()]
        + [f"{c} {t}" for c, t in zip(ocols, otypes)]
        + ["__d double", "__s double"]
    )
    out = keyed.groupBy("__k").applyInPandas(walk, schema=schema)
    return out.select(
        F.col("__k").alias(key_col),
        *[F.col(f"__o{i}").alias(c) for i, c in enumerate(order_cols)],
        F.col("__d").alias(drift_col),
        F.col("__s").alias(out_col),
    )
