"""Property test: the banded two-level weighted median must agree with a
scan reference on arbitrary data — catches band-alignment bugs (the
operator's correctness rests on floor(v/width) being order-aligned with
v, including negatives and band boundaries)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mrcond_spark.operators.weighted import weighted_median


def reference(rows):
    """Scan reference: smallest v whose running weight (ordered by (v, w))
    reaches half the group total."""
    out = {}
    groups = {}
    for g, v, w in rows:
        groups.setdefault(g, []).append((v, w))
    for g, vs in groups.items():
        vs.sort()
        tw = sum(w for _, w in vs)
        cw = 0
        med = None
        for v, w in vs:
            cw += w
            if med is None and 2 * cw >= tw:
                med = v
        out[g] = (tw, med)
    return out


row_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # group
        st.integers(min_value=-50, max_value=50),  # value (incl. negatives)
        st.integers(min_value=0, max_value=9),  # weight (incl. zeros)
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=row_strategy)
@pytest.mark.parametrize("band_width", [1.0, 7.0, 1000.0])
def test_banded_median_matches_scan_reference(spark_global, rows, band_width):
    df = spark_global.createDataFrame(
        [(g, float(v), w) for g, v, w in rows], "g INT, v DOUBLE, w LONG"
    )
    got = {
        r["g"]: (r["total_weight"], r["weighted_median"])
        for r in weighted_median(df, "g", "v", "w", band_width).collect()
    }
    assert got == reference(rows)
