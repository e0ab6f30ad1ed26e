"""Property test: the banded integer-gate quantile selection (the round-7
robust_stats exact path) must agree with a pure-scan percentile_disc
reference on arbitrary data — catches band-alignment bugs, the gate's
integer arithmetic, and tie handling across both collapse routes.

The reference is the SQL-standard percentile_disc definition itself:
the smallest stored value whose cumulative count c satisfies c/n >= p,
computed exactly with integers (verified against DuckDB on fixed
multisets in test_robust_stats.py — here hypothesis drives the shapes).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mrcond_spark.operators.stats import _DISC_GATES, robust_stats


def reference(rows):
    out = {}
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    for g, vs in groups.items():
        vs.sort()
        n = len(vs)
        sel = {}
        for name, (num, den) in _DISC_GATES.items():
            sel[name] = next(
                vs[i] for i in range(n) if (i + 1) * den >= num * n
            )
        out[g] = (n, sel["p05"], sel["p95"], sel["med"])
    return out


row_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        # mix of heavy ties (small int pool) and spread: both matter for
        # the gate; negatives exercise negative bands
        st.one_of(
            st.integers(min_value=-3, max_value=3),
            st.integers(min_value=-10_000, max_value=10_000),
        ),
    ),
    min_size=1,
    max_size=80,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=row_strategy)
@pytest.mark.parametrize("collapse", [True, False])
@pytest.mark.parametrize("band_width", [None, 3.0])
def test_banded_quantiles_match_scan_reference(
    spark_global, rows, collapse, band_width
):
    df = spark_global.createDataFrame(
        [(g, float(v)) for g, v in rows], "g INT, v DOUBLE"
    )
    got = {
        r["g"]: (r["n"], r["p05"], r["p95"], r["med"])
        for r in robust_stats(
            df,
            ["g"],
            "v",
            exact=True,
            band_width=band_width,
            collapse_values=collapse,
        ).collect()
    }
    assert got == reference(rows)
