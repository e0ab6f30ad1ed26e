"""Property test: the distributed Bradley-Terry MM iteration must agree
with an independent pure-Python implementation of the same fixed-round
recurrence on arbitrary tournaments, and its ordering must respect total
dominance."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mrcond_spark.operators.preference import bradley_terry


def reference(duels, rounds=3):
    wins: dict[tuple[int, int], int] = {}
    for i, j in duels:
        wins[(i, j)] = wins.get((i, j), 0) + 1
    n: dict[tuple[int, int], int] = {}
    for (i, j), w in wins.items():
        n[(i, j)] = n.get((i, j), 0) + w
        n[(j, i)] = n.get((j, i), 0) + w
    wtot: dict[int, int] = {}
    for (i, _j), w in wins.items():
        wtot[i] = wtot.get(i, 0) + w
    ents = sorted({i for i, _ in n})
    p = {e: 1.0 for e in ents}
    for _ in range(rounds):
        newp = {}
        for e in ents:
            denom = sum(
                nij / (p[e] + p[j]) for (i, j), nij in n.items() if i == e
            )
            newp[e] = wtot.get(e, 0) / denom
        p = newp
    s = sum(p.values())
    return {
        e: (
            wtot.get(e, 0),
            sum(nij for (i, _j), nij in n.items() if i == e),
            round(p[e] / s, 6),
        )
        for e in ents
    }


duel_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=5),
    ).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(duels=duel_strategy)
def test_bt_matches_python_reference(spark_global, duels):
    df = spark_global.createDataFrame(duels, "i INT, j INT")
    got = {
        r["entity"]: (r["n_wins"], r["n_matches"], r["strength"])
        for r in bradley_terry(df, rounds=3).collect()
    }
    ref = reference(duels)
    assert got.keys() == ref.keys()
    for e, (w, m, s) in ref.items():
        gw, gm, gs = got[e]
        assert (gw, gm) == (w, m), e
        # identical recurrence; DECIMAL-routed sums vs python float sums
        # can differ in the last ulp before rounding — allow 1e-6 slack
        assert abs(gs - s) <= 1.5e-6, (e, gs, s)


def test_bt_total_dominance_orders_strengths(spark_global):
    """A beats everyone, C loses to everyone: strength(A) > strength(B) >
    strength(C), and strengths sum to ~1."""
    duels = [("A", "B")] * 4 + [("A", "C")] * 4 + [("B", "C")] * 3 + [("C", "B")]
    df = spark_global.createDataFrame(duels, "i STRING, j STRING")
    rows = {r["entity"]: r for r in bradley_terry(df, rounds=3).collect()}
    assert rows["A"]["strength"] > rows["B"]["strength"] > rows["C"]["strength"]
    assert abs(sum(r["strength"] for r in rows.values()) - 1.0) < 1e-4
    assert rows["A"]["n_wins"] == 8 and rows["A"]["n_matches"] == 8
