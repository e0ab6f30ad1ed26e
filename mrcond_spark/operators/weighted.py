"""Exact weighted median per group — two-level banded window, fully lazy.

``SUM(w) OVER (PARTITION BY g ORDER BY v)`` is the natural running-weight
plan, but when the group key has O(1) cardinality each window partition is
a corpus/|groups|-row single task — the low-cardinality cousin of the
single-reducer window this repo eliminated in `ntile.py`/`prefix_sum.py`.
This operator computes the identical running weight with every data-sized
stage distributed:

1. ``band = floor(value / band_width)`` — monotonic in the value, so the
   global per-group order ``(value, tiebreak)`` equals
   ``(band, value, tiebreak)``;
2. within-band running sums window on ``(group, band)`` — parallelism =
   |groups| x |bands|;
3. band offsets and group totals come from a ``(group, band)`` aggregate —
   a |groups x bands|-row frame whose per-group windows touch only
   metadata-sized input — broadcast-joined back.

The weighted median is then the smallest value whose running weight
reaches half the group total, decided on exact integer weights
(``2*cw >= tw`` — no float threshold); the selected value is a stored
passthrough. Used by q151; property-tested against a pandas scan
reference in tests/test_weighted_median_property.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    band_width: float,
) -> DataFrame:
    """Per-group ``(total_weight, weighted_median)``.

    ``value_col`` must be NON-NULL on every row: a NULL value has no
    position in the band-aligned order, and its rows would fall out of
    the offset equi-join while still counting into the band totals —
    filter NULLs first. The same applies to NaN / +-Infinity doubles
    (``floor`` gives them a NULL band); this operator's callers are
    integer/decimal-typed, so the contract is FINITE values — for
    doubles with possible non-finite tails use the pinned-band variant
    in ``operators/stats._banded_running_counts``. ``weight_col`` must be integer-typed (exact gate
    arithmetic) and non-negative; rows with zero weight never become the
    median unless tied on value with positive-weight rows (they add
    nothing to the running sum). ``band_width`` trades parallelism against the size of
    the broadcast offset frame: aim for tens-to-hundreds of bands over
    the value domain (for unknown domains derive bands from approx
    quantiles instead of a fixed width).
    """
    # isfinite + > 0 rejects NaN, +-inf, 0, and negatives — inf slipped the
    # old `> 0` check and folded every finite value into band 0 (round-7
    # ADVICE: the guard must match the "positive finite" message)
    if not (math.isfinite(float(band_width)) and float(band_width) > 0):
        raise ValueError(
            f"weighted_median: band_width={band_width} must be a positive "
            "finite number (a negative width inverts band order and "
            "silently corrupts the running-weight gate; an infinite width "
            "folds every value into one band)"
        )
    li = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.col(weight_col).alias("wt"),
    ).withColumn(
        "band", F.floor(F.col("v") / F.lit(float(band_width))).cast("long")
    )
    w_in = (
        Window.partitionBy("g", "band")
        .orderBy("v", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    banded = li.select(
        "g", "band", "v", F.sum("wt").over(w_in).alias("cw_in")
    )
    band_tot = li.groupBy("g", "band").agg(F.sum("wt").alias("bt"))
    # |groups x bands| rows only — metadata-sized window input.
    w_off = (
        Window.partitionBy("g")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_g = Window.partitionBy("g")
    offs = band_tot.select(
        "g",
        "band",
        F.coalesce(F.sum("bt").over(w_off), F.lit(0)).alias("off"),
        F.sum("bt").over(w_g).alias("tw"),
    )
    cum = banded.join(F.broadcast(offs), ["g", "band"]).select(
        "g", "v", (F.col("off") + F.col("cw_in")).alias("cw"), "tw"
    )
    return (
        cum.groupBy("g")
        .agg(
            F.max("tw").cast("bigint").alias("total_weight"),
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v"))).alias(
                "weighted_median"
            ),
        )
        .select(
            F.col("g").alias(group_col),
            "total_weight",
            "weighted_median",
        )
        .orderBy(group_col)
    )
