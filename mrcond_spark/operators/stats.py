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
from pyspark.sql.window import Window


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

    NULL ``value_col`` rows are dropped up front (round-6 ADVICE): the
    percentile aggregates skip NULLs but ``count(*)`` would include them
    and the NULL-skipping least/greatest would clamp a NULL value to p95
    inside the winsorized sum — n, win_mean and the quantiles would
    silently disagree about the population. Dropping makes every output
    column describe the same non-NULL population, matching the
    weighted_median convention.
    """
    df = df.filter(F.col(value_col).isNotNull())
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


def mann_whitney_u_x2(
    df: DataFrame,
    group_col: str,
    side_col: str,
    value_col: str,
    band_width: int,
) -> DataFrame:
    """Per-group Mann-Whitney rank-sum statistic, DOUBLED to stay integer.

    ``side_col`` is a boolean column (True = sample A); ``value_col`` must
    be integer-typed and non-NULL (exact band math and exact midranks).
    Returns one row per group: ``(group_col, n_a, n_b, u_a_x2)`` where
    ``u_a_x2 = 2*U_A`` — midranks of ties are half-integers, so doubling
    keeps every quantity in BIGINT with no float boundary anywhere. The
    classic distribution-free two-sample location test (Mann & Whitney
    1947): under H0 the expectation of u_a_x2 is n_a*n_b, and callers with
    large samples can normalize downstream (kept out of this operator: the
    z-score needs a sqrt, and libm does not reproduce across engines).

    Plan shape / 100 TB — the q151 two-level banded-window idiom applied
    to MIDRANKS: per-group midranks are a running count over DISTINCT
    values, and ``SUM() OVER (PARTITION BY group ORDER BY v)`` with O(1)
    groups would be a corpus-sized single task. Instead: (1) one
    (group, value) hash aggregate collapses rows to distinct values
    (cnt_a, cnt); (2) within-band running counts window on
    (group, band = v div band_width) — parallelism = |groups| x |bands|;
    (3) band offsets come from a |groups x bands|-row aggregate whose
    per-group window touches only metadata-sized input, broadcast back;
    (4) per-value contributions (cnt_a * (2*less + cnt + 1) = the A rows'
    doubled midrank mass at that value) fold into one final group
    aggregate. Fully lazy, no construction job.
    """
    pts = df.select(
        F.col(group_col).alias("g"),
        F.col(side_col).cast("boolean").alias("is_a"),
        F.col(value_col).alias("v"),
    )
    vals = pts.groupBy("g", "v").agg(
        F.sum(F.col("is_a").cast("bigint")).alias("ca"),
        F.count(F.lit(1)).alias("c"),
    ).withColumn("band", F.expr(f"v div {int(band_width)}"))
    w_in = (
        Window.partitionBy("g", "band")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    banded = vals.select("g", "band", "v", "ca", "c", F.sum("c").over(w_in).alias("cum_in"))
    band_tot = vals.groupBy("g", "band").agg(F.sum("c").alias("bt"))
    w_off = (
        Window.partitionBy("g")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = band_tot.select(
        "g", "band", F.coalesce(F.sum("bt").over(w_off), F.lit(0)).alias("off")
    )
    contrib = banded.join(F.broadcast(offs), ["g", "band"]).select(
        "g",
        "ca",
        "c",
        (F.col("off") + F.col("cum_in") - F.col("c")).alias("less"),
    )
    return (
        contrib.groupBy("g")
        .agg(
            F.sum("ca").cast("bigint").alias("n_a"),
            F.sum(F.col("c") - F.col("ca")).cast("bigint").alias("n_b"),
            F.sum(
                F.col("ca") * (2 * F.col("less") + F.col("c") + 1)
            ).alias("two_ra"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_a",
            "n_b",
            (F.col("two_ra") - F.col("n_a") * (F.col("n_a") + 1))
            .cast("bigint")
            .alias("u_a_x2"),
        )
        .orderBy(group_col)
    )


def ks_d_numerator(
    df: DataFrame,
    group_col: str,
    side_col: str,
    value_col: str,
    band_width: int,
) -> DataFrame:
    """Per-group two-sample Kolmogorov-Smirnov statistic as an EXACT integer.

    ``D = max_v |F_A(v) - F_B(v)|`` compares the two empirical CDFs; this
    returns its integer numerator ``d_num = max_v |cumA(v)*n_b -
    cumB(v)*n_a|`` so that ``D = d_num / (n_a * n_b)`` — no float division
    inside the operator, no boundary ambiguity (callers doing the
    Kolmogorov tail bound need an exp(); libm stays out for the same
    reason as ``mann_whitney_u_x2``'s z-score). ``side_col`` boolean
    (True = sample A), ``value_col`` integer non-NULL. Returns
    ``(group_col, n_a, n_b, d_num)``.

    The CDF difference is piecewise constant and changes only AT observed
    values, so scanning distinct values suffices. Running counts use the
    same two-level banded decomposition as ``mann_whitney_u_x2`` (a plain
    per-group ordered window would single-task the corpus when groups are
    O(1)): per-(group, band) running counts of BOTH sides, band offsets
    and group totals from the metadata-sized (group, band) aggregate,
    broadcast back, one final max aggregate. d_num grows as n^2 — BIGINT
    through ~10^9 rows per group side; the internal product is computed
    in DECIMAL(38,0), and a d_num beyond BIGINT range raises loudly at
    the output cast (round-6 ADVICE: Spark's non-ANSI decimal-to-bigint
    cast would otherwise return a silent NULL for group sides beyond
    ~3e9 rows, not saturate).
    """
    pts = df.select(
        F.col(group_col).alias("g"),
        F.col(side_col).cast("boolean").alias("is_a"),
        F.col(value_col).alias("v"),
    )
    vals = pts.groupBy("g", "v").agg(
        F.sum(F.col("is_a").cast("bigint")).alias("ca"),
        F.sum((~F.col("is_a")).cast("bigint")).alias("cb"),
    ).withColumn("band", F.expr(f"v div {int(band_width)}"))
    w_in = (
        Window.partitionBy("g", "band")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    banded = vals.select(
        "g",
        "band",
        "v",
        F.sum("ca").over(w_in).alias("ca_in"),
        F.sum("cb").over(w_in).alias("cb_in"),
    )
    band_tot = vals.groupBy("g", "band").agg(
        F.sum("ca").alias("bta"), F.sum("cb").alias("btb")
    )
    w_off = (
        Window.partitionBy("g")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_g = Window.partitionBy("g")
    offs = band_tot.select(
        "g",
        "band",
        F.coalesce(F.sum("bta").over(w_off), F.lit(0)).alias("offa"),
        F.coalesce(F.sum("btb").over(w_off), F.lit(0)).alias("offb"),
        F.sum("bta").over(w_g).alias("na"),
        F.sum("btb").over(w_g).alias("nb"),
    )
    dec = "decimal(38,0)"
    cum = banded.join(F.broadcast(offs), ["g", "band"]).select(
        "g",
        "na",
        "nb",
        F.abs(
            (F.col("offa") + F.col("ca_in")).cast(dec) * F.col("nb").cast(dec)
            - (F.col("offb") + F.col("cb_in")).cast(dec) * F.col("na").cast(dec)
        ).alias("dev"),
    )
    bigint_max = F.lit("9223372036854775807").cast(dec)
    return (
        cum.groupBy("g")
        .agg(
            F.max("na").cast("bigint").alias("n_a"),
            F.max("nb").cast("bigint").alias("n_b"),
            F.max("dev").alias("__dev"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_a",
            "n_b",
            F.when(F.col("__dev") <= bigint_max, F.col("__dev").cast("bigint"))
            .otherwise(
                F.expr(
                    "raise_error('ks_d_numerator: d_num exceeds BIGINT"
                    " (group sides beyond ~3e9 rows) — widen the output to"
                    " DECIMAL before normalizing')"
                ).cast("bigint")
            )
            .alias("d_num"),
        )
        .orderBy(group_col)
    )
