"""robust_stats: the approx (GK-sketch) path must track the exact path.

The declared q145 oracle rides the exact route; this suite proves the
production ``exact=False`` route (the 100 TB path — bounded mergeable
sketch state instead of per-group value buffers) is a faithful
substitute: identical schema, and every figure within the documented
rank-error bound of the exact answer.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mrcond_spark.catalog import load
from mrcond_spark.operators.stats import robust_stats


def _by_group(rows):
    return {(r["l_returnflag"], r["ship_year"]): r for r in rows}


def test_approx_matches_exact_at_high_accuracy(spark, sf_dir):
    # rank error <= 1/accuracy; with accuracy >> max group size the
    # sketch holds every value exactly -> bit-identical output.
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.year("l_shipdate").cast("int").alias("ship_year"),
        "l_extendedprice",
    )
    exact = robust_stats(
        li, ["l_returnflag", "ship_year"], "l_extendedprice", exact=True
    ).collect()
    approx = robust_stats(
        li,
        ["l_returnflag", "ship_year"],
        "l_extendedprice",
        exact=False,
        accuracy=1_000_000,
    ).collect()
    assert [r.asDict() for r in exact] == [r.asDict() for r in approx]


def test_approx_within_rank_error_at_low_accuracy(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.year("l_shipdate").cast("int").alias("ship_year"),
        "l_extendedprice",
    )
    cols = ["l_returnflag", "ship_year"]
    exact = _by_group(robust_stats(li, cols, "l_extendedprice", exact=True).collect())
    approx = _by_group(
        robust_stats(li, cols, "l_extendedprice", exact=False, accuracy=100).collect()
    )
    assert exact.keys() == approx.keys()
    # Per-group value spread as the scale for the quantile tolerance: a
    # rank error of eps=1/100 moves a selected quantile by at most the
    # local value density around that rank; bound it loosely by a fraction
    # of the group's (p95 - p05) spread. win_mean shifts only through the
    # perturbed clip points (<= eps mass clipped differently), so it is
    # bounded much tighter.
    for k, e in exact.items():
        a = approx[k]
        assert a["n"] == e["n"]
        spread = max(e["p95"] - e["p05"], 1e-9)
        for col in ("p05", "p95", "med"):
            assert abs(a[col] - e[col]) <= 0.15 * spread, (k, col, a[col], e[col])
        assert math.isfinite(a["win_mean"])
        assert abs(a["win_mean"] - e["win_mean"]) <= 0.05 * spread, k
        assert abs(a["mad"] - e["mad"]) <= 0.15 * spread, k


def test_approx_schema_matches_exact(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.year("l_shipdate").cast("int").alias("ship_year"),
        "l_extendedprice",
    )
    cols = ["l_returnflag", "ship_year"]
    e = robust_stats(li, cols, "l_extendedprice", exact=True)
    a = robust_stats(li, cols, "l_extendedprice", exact=False, accuracy=100)
    assert e.schema == a.schema


def test_null_values_dropped_consistently(spark):
    """Round-6 ADVICE: NULL value rows must not let n / win_mean / the
    quantiles disagree about the population — the operator drops them up
    front, so every output column describes the same non-NULL rows (a NULL
    would otherwise clamp to p95 via NULL-skipping least/greatest while
    count(*) still counted it)."""
    rows = [("g", float(v)) for v in range(1, 21)] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "grp string, v double")
    got = robust_stats(df, ["grp"], "v", exact=True).collect()[0]
    want = robust_stats(
        df.filter(F.col("v").isNotNull()), ["grp"], "v", exact=True
    ).collect()[0]
    assert got["n"] == 20  # NULLs excluded from the population count
    assert got.asDict() == want.asDict()


import duckdb
import pytest


@pytest.mark.parametrize("band_width", [None, 0.5])
@pytest.mark.parametrize("collapse", [True, False])
def test_banded_gate_matches_duckdb_percentile_disc(spark, band_width, collapse):
    """Adversarial cross-engine pin for the round-7 exact path: the integer
    gate cw*den >= num*n over banded running counts must reproduce
    percentile_disc on tied multisets, singletons, all-duplicate groups,
    negatives, and both band extremes (band_width=None derives ~256 bands;
    0.5 gives hundreds of near-singleton bands), for both the collapsed
    (group, value, count) route and the raw unit-multiplicity route."""
    import random

    random.seed(7)
    groups = {
        "ties": [1.0] * 50 + [2.0] * 50 + [3.0],
        "singleton": [42.0],
        "two_vals": [5.0, 7.0] * 10,
        "uniform": [float(i) for i in range(1, 101)],
        "all_dup": [9.0] * 500,
        "random": [random.uniform(-100, 100) for _ in range(397)],
    }
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    got = robust_stats(
        df, ["g"], "v", exact=True, band_width=band_width, collapse_values=collapse
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    want = con.execute(
        """
        WITH q AS (
          SELECT g, CAST(COUNT(*) AS BIGINT) n,
            percentile_disc(0.05) WITHIN GROUP (ORDER BY v) p05,
            percentile_disc(0.95) WITHIN GROUP (ORDER BY v) p95,
            percentile_disc(0.5) WITHIN GROUP (ORDER BY v) med
          FROM t GROUP BY g)
        SELECT tt.g, q.n, q.p05, q.p95, q.med,
          ROUND(CAST(SUM(CAST(greatest(q.p05, least(q.p95, tt.v))
                    AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 4) win_mean,
          percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(tt.v - q.med)) mad
        FROM t tt JOIN q ON tt.g = q.g
        GROUP BY tt.g, q.n, q.p05, q.p95, q.med ORDER BY tt.g
        """
    ).fetchall()
    con.close()
    gotl = [
        (r["g"], r["n"], r["p05"], r["p95"], r["med"], r["win_mean"], r["mad"])
        for r in got
    ]
    assert gotl == [tuple(w) for w in want]


@pytest.mark.parametrize("collapse", [True, False])
def test_nonfinite_values_follow_spark_percentile_disc(spark, collapse):
    """NaN / +-Infinity must occupy their sort positions (-inf < finite <
    +inf < NaN, Spark's double order) rather than silently dropping out of
    the banded offset join — a >5% NaN tail must surface in p95. DuckDB's
    percentile_disc is inconsistent in the presence of NaN, so the pin is
    against Spark's OWN percentile_disc aggregate (the semantics the
    banded selection replaces); oracle-bearing callers stay finite-only."""
    inf, nan = float("inf"), float("nan")
    rows = (
        [("g", float(i)) for i in range(1, 15)]
        + [("g", -inf), ("g", inf), ("g", nan), ("g", nan)]
        + [("h", nan)] * 3          # all-NaN group
        + [("i", -inf), ("i", 5.0)]  # -inf must be p05, not dropped
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = robust_stats(
        df, ["g"], "v", exact=True, collapse_values=collapse
    ).select("g", "n", "p05", "p95", "med").collect()
    want = (
        df.groupBy("g")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY v)").alias("p05"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY v)").alias("p95"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").alias("med"),
        )
        .orderBy("g")
        .collect()
    )

    def key(r):
        import math

        def c(x):
            return "nan" if isinstance(x, float) and math.isnan(x) else x

        return (r["g"], r["n"], c(r["p05"]), c(r["p95"]), c(r["med"]))

    assert [key(r) for r in got] == [key(r) for r in want]


def test_band_overflow_saturation_keeps_inf_above_finite(spark):
    """Round-7 review finding: with an equal-valued finite group the AUTO
    band width clamps to 1e-9, so floor(1e10 / 1e-9) overflows the long
    cast and saturates at Long.MaxValue — unclamped, those finite rows
    would land ON the NaN band, ABOVE +Infinity, and p95 would come back
    finite where percentile_disc says +inf. The finite-band clamp keeps
    band order (-inf < finite < +inf < NaN) under saturation."""
    inf = float("inf")
    rows = [("g", 1e10)] * 100 + [("g", inf)] * 10
    df = spark.createDataFrame(rows, "g string, v double")
    got = robust_stats(df, ["g"], "v", exact=True).collect()[0]
    assert got["n"] == 110
    assert got["p05"] == 1e10
    assert got["med"] == 1e10
    assert got["p95"] == inf  # the inf tail must surface, not vanish


def test_negative_band_width_raises(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="band_width"):
        robust_stats(df, ["g"], "v", exact=True, band_width=-512.0).collect()
    from mrcond_spark.operators.weighted import weighted_median

    wdf = spark.createDataFrame([("g", 1, 1)], "g string, v int, w int")
    with pytest.raises(ValueError, match="band_width"):
        weighted_median(wdf, "g", "v", "w", band_width=-1.0).collect()


def test_non_finite_band_width_raises(spark):
    """float('inf') > 0 is True, so the old bare `> 0` guard let an infinite
    width through (round-7 ADVICE) — it folded every finite value into band
    0, defeating the banded parallelism while the error message claimed
    'positive finite'. The guard must reject inf and NaN explicitly, in both
    the stats and the weighted_median variants."""
    from mrcond_spark.operators.weighted import weighted_median

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    wdf = spark.createDataFrame([("g", 1, 1)], "g string, v int, w int")
    for bad in (float("inf"), float("-inf"), float("nan"), 0.0):
        with pytest.raises(ValueError, match="band_width"):
            robust_stats(df, ["g"], "v", exact=True, band_width=bad).collect()
        with pytest.raises(ValueError, match="band_width"):
            weighted_median(wdf, "g", "v", "w", band_width=bad).collect()
