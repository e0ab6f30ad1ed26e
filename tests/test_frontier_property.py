"""Property-based test: skyline_2d must agree with the brute-force O(n^2)
dominance reference on arbitrary generated point sets (duplicates, ties on
one axis, single-bucket and many-bucket layouts)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

point_s = st.tuples(
    st.integers(min_value=0, max_value=15),  # cost
    st.integers(min_value=0, max_value=15),  # gain
)


def brute_skyline(points: list[tuple[int, int]]) -> list[tuple[int, int, int]]:
    rows = [(i, c, g) for i, (c, g) in enumerate(points)]
    out = []
    for i, c, g in rows:
        dominated = any(
            qc <= c and qg >= g and (qc < c or qg > g) for _, qc, qg in rows
        )
        if not dominated:
            out.append((i, c, g))
    return sorted(out)


@settings(max_examples=10, deadline=None)
@given(points=st.lists(point_s, min_size=1, max_size=24))
def test_skyline_matches_brute_force(spark_global, points):
    from pyspark.sql import functions as F

    from mrcond_spark.operators.frontier import skyline_2d

    spark = spark_global
    df = spark.createDataFrame(
        [(i, c, g) for i, (c, g) in enumerate(points)],
        "id LONG, cost LONG, gain LONG",
    )
    # 4-wide buckets: order-aligned with cost by construction
    got = sorted(
        (r["id"], r["cost"], r["gain"])
        for r in skyline_2d(
            df, "cost", "gain", F.floor(F.col("cost") / 4).cast("int")
        ).collect()
    )
    assert got == brute_skyline(points)


def test_skyline_rejects_null_cost_bucket(spark_global):
    from pyspark.sql import functions as F

    from mrcond_spark.operators.frontier import skyline_2d

    df = spark_global.createDataFrame(
        [(0, None, 1), (1, 2, 3)], "id LONG, cost INT, gain INT"
    )
    with pytest.raises(ValueError, match="NULL"):
        skyline_2d(df, "cost", "gain", F.floor(F.col("cost") / 4).cast("int"))


def test_skyline_rejects_unbounded_bucket_expression(spark_global, monkeypatch):
    """A near-distinct bucket expression would turn the bounded offset
    collect into a data-sized one — the cap rejects it loudly."""
    from pyspark.sql import functions as F

    from mrcond_spark.operators import frontier
    from mrcond_spark.operators.frontier import skyline_2d

    monkeypatch.setattr(frontier, "MAX_BUCKETS", 10)
    df = spark_global.range(50).select(
        F.col("id").cast("int").alias("cost"),
        (F.lit(100) - F.col("id")).cast("int").alias("gain"),
    )
    with pytest.raises(ValueError, match="buckets"):
        skyline_2d(df, "cost", "gain", F.col("cost"))  # identity: 50 buckets


def test_skyline_keeps_exact_duplicates(spark_global):
    """Equal (cost, gain) pairs do not dominate each other — both stay."""
    from pyspark.sql import functions as F

    from mrcond_spark.operators.frontier import skyline_2d

    df = spark_global.createDataFrame(
        [(0, 1, 5), (1, 1, 5), (2, 2, 4)], "id LONG, cost INT, gain INT"
    )
    got = sorted(
        r["id"]
        for r in skyline_2d(
            df, "cost", "gain", F.col("cost").cast("int")
        ).collect()
    )
    assert got == [0, 1]
