"""Property test: the distributed EWMA recurrence equals pandas
ewm(adjust=False) for arbitrary keys, values, alphas, and (unique) orderings
— including out-of-order and negative values."""

from __future__ import annotations

import pandas as pdl
import pytest
from hypothesis import given, settings, strategies as st

from mrcond_spark.operators.timeseries import ewma

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), finite),
        min_size=1,
        max_size=40,
    ),
    alpha=st.floats(min_value=0.05, max_value=0.95),
)
def test_ewma_matches_pandas_ewm(spark, rows, alpha):
    # unique order key per row (hypothesis controls key/value; order is the
    # list position, shuffled by Spark's partitioning anyway)
    data = [(k, i, float(v)) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k STRING, o LONG, v DOUBLE")
    got = {
        (r["k"], r["o"]): r["ewma"]
        for r in ewma(df, key_col="k", order_cols=("o",), value_col="v", alpha=alpha).collect()
    }
    pdf = pdl.DataFrame(data, columns=["k", "o", "v"]).sort_values(["k", "o"])
    for k, g in pdf.groupby("k"):
        ref = g["v"].ewm(alpha=alpha, adjust=False).mean()
        for (_, row), e in zip(g.iterrows(), ref):
            assert got[(k, row["o"])] == pytest.approx(e, rel=1e-12, abs=1e-12)
