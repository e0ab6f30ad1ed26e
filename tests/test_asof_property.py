"""Property-based test: asof_join must agree with pandas.merge_asof on
arbitrary generated inputs (backward, inclusive), including ties handled via
pre-deduplication of the right side."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

key_s = st.integers(min_value=0, max_value=3)
ts_s = st.integers(min_value=0, max_value=50)
val_s = st.integers(min_value=-100, max_value=100)


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(st.tuples(key_s, ts_s), min_size=1, max_size=12),
    right=st.lists(st.tuples(key_s, ts_s, val_s), min_size=0, max_size=12),
)
def test_asof_matches_pandas_merge_asof(spark_global, left, right):
    from pyspark.sql import functions as F

    from mrcond_spark.operators.asof import asof_join

    spark = spark_global
    lpdf = pd.DataFrame(left, columns=["k", "lts"]).drop_duplicates()
    # deterministic right side: one row per (k, ts), max value wins
    rpdf = (
        pd.DataFrame(right, columns=["k", "rts", "v"])
        .groupby(["k", "rts"], as_index=False)["v"]
        .max()
        if right
        else pd.DataFrame(columns=["k", "rts", "v"])
    )

    ldf = spark.createDataFrame(lpdf, "k LONG, lts LONG").withColumn(
        "lts", F.timestamp_seconds("lts")
    )
    rdf = spark.createDataFrame(rpdf, "k LONG, rts LONG, v LONG").withColumn(
        "rts", F.timestamp_seconds("rts")
    )

    got = {
        (r["k"], int(r["lts"].timestamp())): r["v"]
        for r in asof_join(ldf, rdf, on=["k"], left_ts="lts", right_ts="rts").collect()
    }

    if len(rpdf):
        expected_df = pd.merge_asof(
            lpdf.sort_values("lts"),
            rpdf.rename(columns={"rts": "lts"}).sort_values("lts"),
            on="lts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        expected = {
            (int(r.k), int(r.lts)): (None if pd.isna(r.v) else int(r.v))
            for r in expected_df.itertuples()
        }
    else:
        expected = {(int(r.k), int(r.lts)): None for r in lpdf.itertuples()}

    assert got == expected
