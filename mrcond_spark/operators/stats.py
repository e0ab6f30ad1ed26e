"""Cross-engine-exact moment statistics (mean / stddev per key).

The standardization half of q115 and the streaming anomaly gate share this
definition. Moments are computed from SUM(value) and SUM(value^2) with
per-term ``DECIMAL`` casts — exact, order-independent sums — then combined
in double with a fixed operation tree, so ``mu`` and ``sd`` are
bit-identical in Spark and the DuckDB oracle (no Welford merge-order
drift). One partial->final hash aggregate; the output is |keys|-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moment_stats(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
) -> DataFrame:
    """Per-key ``(n, mu, sd)`` with sample (n-1) standard deviation.

    Keys with a single row get ``sd = NaN`` via an explicit ``n > 1``
    branch (a bare ``/(n-1)`` would raise DIVIDE_BY_ZERO under Spark's
    default ANSI mode instead of producing the documented NaN — the whole
    training job would die on one rare key); keys with zero spread get
    ``sd = 0``. Callers joining this back for z-scores should treat both
    as "no standardization possible".
    """
    s = df.groupBy(*key_cols).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast("decimal(28,12)")).cast("double").alias("__s1"),
        F.sum((F.col(value_col) * F.col(value_col)).cast("decimal(38,18)"))
        .cast("double")
        .alias("__s2"),
    )
    mu = F.col("__s1") / F.col("n")
    var = F.when(
        F.col("n") > 1,
        (F.col("__s2") - F.col("n") * mu * mu) / (F.col("n") - F.lit(1.0)),
    ).otherwise(F.lit(float("nan")))
    return s.select(*key_cols, "n", mu.alias("mu"), F.sqrt(var).alias("sd"))


def robust_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group robust center/spread: ``(n, p05, p95, med, win_mean, mad)``
    — 5/95 winsorized mean and the median absolute deviation (the q145
    shape, exposed as a reusable operator).

    Two interchangeable percentile backends, same output schema:

    - ``exact=True``: ``percentile_disc`` — selects stored values, exact
      and cross-engine bit-stable, but the aggregation state buffers EVERY
      group member's value, so group granularity is the memory/parallelism
      knob (fine up to ~10^8-row groups; the declared q145 oracle route).
    - ``exact=False``: ``approx_percentile`` — Greenwald-Khanna sketch with
      rank error <= 1/accuracy and O(accuracy * log n) state per group,
      map-side mergeable like any partial aggregate. This is the 100 TB
      path: petabyte-scale groups never buffer their members, at the cost
      of a bounded rank error on the three quantiles (and hence a bounded
      perturbation of the clip points feeding ``win_mean`` / the MAD
      pivot). ``approx_percentile`` also selects a stored value, so output
      types match the exact route exactly.

    Both paths: quantile aggregate -> |groups|-row broadcast back ->
    second aggregate for the winsorized mean (order-independent
    DECIMAL(38,18) summation) and the MAD. Two scans of ``df``, all
    shuffles keyed on ``group_cols``. Tolerance-tested against each other
    in tests/test_robust_stats.py.
    """
    if exact:
        def pct(p: float, order_expr: str):
            return F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {order_expr})"
            )
    else:
        def pct(p: float, order_expr: str):
            return F.expr(f"approx_percentile({order_expr}, {p}, {accuracy})")

    q = df.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n"),
        pct(0.05, value_col).alias("p05"),
        pct(0.95, value_col).alias("p95"),
        pct(0.5, value_col).alias("med"),
    )
    j = df.join(F.broadcast(q), group_cols)
    clipped = F.greatest(
        F.col("p05"), F.least(F.col("p95"), F.col(value_col))
    )
    return (
        j.groupBy(*group_cols, "n", "p05", "p95", "med")
        .agg(
            F.round(
                F.sum(clipped.cast("decimal(38,18)")).cast("double")
                / F.count("*"),
                4,
            ).alias("win_mean"),
            pct(0.5, f"abs({value_col} - med)").alias("mad"),
        )
        .select(*group_cols, "n", "p05", "p95", "med", "win_mean", "mad")
        .orderBy(*group_cols)
    )
