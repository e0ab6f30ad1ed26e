"""Round-12 optimization pins: driver-job-floor fusions and the JVM-parsed
centroid expression.

Three optimizations changed operator INTERNALS this round (results pinned
identical by the oracle suite; these tests pin the optimization itself so
it cannot silently regress):

1. components-loop convergence rides the per-round checkpoint job via
   ``observe()`` — no per-round ``collect()`` job (guide §2.6 job floor).
2. pagerank's node count rides the nodes-checkpoint job the same way — no
   standalone ``count()`` action, and only ONE pre-loop eager checkpoint.
3. k-means cell assignment (``similarity.with_cell``) builds its centroid
   literals as ONE parsed SQL fragment instead of ~16x64 ``F.lit`` Py4J
   round-trips (measured 0.96 s -> 0.075 s driver-side per build), and
   projects the scores array once so the argmin does not duplicate the
   fold tree.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture
def chain_and_triangle(spark):
    edges = [(i, i + 1) for i in range(8)] + [(20, 21), (21, 22), (22, 20)]
    return spark.createDataFrame(edges, "src LONG, dst LONG")


def test_components_loop_issues_no_driver_collect(spark, chain_and_triangle, monkeypatch):
    """The r11 loop ran one ``agg(sum).collect()`` job per round purely to
    detect the fixpoint — a driver job floor per round (roughly half of
    q99/q170's bench-scale wall was inter-job driver time). The r12 loop
    reads the same exact decimal sum from an ``observe()`` on the round's
    eager localCheckpoint (Dataset.checkpoint is a tracked SQL action, so
    the CollectMetrics accumulators fire). Pin: in the no-speculation
    normal path, the whole loop performs ZERO DataFrame.collect calls and
    still converges to the right labels."""
    from mrcond_spark.operators.components import connected_components

    # patch the CONCRETE class (Spark 4: pyspark.sql.DataFrame is an ABC;
    # runtime frames are pyspark.sql.classic.dataframe.DataFrame — patching
    # the parent intercepts nothing and the pin would be vacuous)
    cls = type(chain_and_triangle)
    calls: list[int] = []
    orig = cls.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting)
    comp = connected_components(chain_and_triangle, max_iter=16)
    assert calls == [], (
        f"components loop ran {len(calls)} collect job(s) — the observe() "
        "convergence fusion regressed to per-round driver jobs"
    )
    monkeypatch.undo()
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == {**{i: 0 for i in range(9)}, 20: 20, 21: 20, 22: 20}


def test_pagerank_build_runs_no_count_and_one_eager_job(spark, chain_and_triangle, monkeypatch):
    """pagerank's only pre-loop scalar (the node count for the teleport
    term) rides the nodes-checkpoint job via observe(); the edge aggregate
    checkpoint went lazy (its blocks materialize inside that same job).
    Pin both fronts: no DataFrame.count/collect during construction, and
    exactly one eager localCheckpoint (the observed nodes build)."""
    from mrcond_spark.operators.graph import pagerank

    cls = type(chain_and_triangle)  # concrete class — see the collect pin above
    actions: list[str] = []
    orig_count, orig_collect = cls.count, cls.collect
    orig_ckpt = cls.localCheckpoint

    def counting_count(self):
        actions.append("count")
        return orig_count(self)

    def counting_collect(self):
        actions.append("collect")
        return orig_collect(self)

    eager_ckpts: list[bool] = []

    def counting_ckpt(self, eager=True):
        eager_ckpts.append(eager)
        return orig_ckpt(self, eager=eager)

    monkeypatch.setattr(cls, "count", counting_count)
    monkeypatch.setattr(cls, "collect", counting_collect)
    monkeypatch.setattr(cls, "localCheckpoint", counting_ckpt)
    ranks = pagerank(chain_and_triangle.withColumn("w", F.lit(1.0)), weight="w", iterations=3)
    assert actions == [], f"pagerank construction ran driver actions: {actions}"
    assert eager_ckpts.count(True) == 1, (
        f"want exactly one eager checkpoint (the observed nodes build), got "
        f"{eager_ckpts}"
    )
    monkeypatch.undo()
    rows = {r["node"]: r["rank"] for r in ranks.collect()}
    assert len(rows) == 12
    # structural exactness: a node with no in-edges holds exactly the
    # teleport term (n=12 nodes), and each 3-cycle node sits at the 1/n
    # fixed point of the recurrence (in-sum = previous 1/n over one
    # share-1.0 edge: 0.15/12 + 0.85/12 = 1/12)
    assert rows[0] == (1.0 - 0.85) / 12
    for node in (20, 21, 22):
        assert rows[node] == pytest.approx(1.0 / 12, abs=1e-15)


def test_with_cell_matches_numpy_argmin_reference(spark):
    """The D-literal SQL form must land every vector in the same cell as a
    plain numpy nearest-centroid argmin (first index on ties). Integer-
    valued doubles make the tie case exact in both engines."""
    from mrcond_spark.operators.similarity import with_cell

    centroids = np.array(
        [[0.0, 0.0], [4.0, 0.0], [2.0, 0.0], [0.0, 4.0]], dtype="float64"
    )
    vecs = [
        (0, [0.0, 0.0]),   # exact centroid 0
        (1, [4.0, 0.0]),   # exact centroid 1
        (2, [1.0, 0.0]),   # tie between cells 0 and 2 -> first index (0)
        (3, [3.0, 0.0]),   # tie between cells 1 and 2 -> first index (1)
        (4, [0.0, 3.0]),   # closer to cell 3
        (5, [-1.0, -1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {
        r["vec_id"]: r["cell"]
        for r in with_cell(df, centroids, F.col("embedding")).select("vec_id", "cell").collect()
    }
    ref = {}
    for vid, v in vecs:
        d = ((centroids - np.array(v)) ** 2).sum(axis=1)
        ref[vid] = int(np.argmin(d))  # first index attains the min
    assert got == ref


def test_with_cell_projects_scores_once(spark):
    """The argmin references the scores array twice; the two-step projection
    must keep ONE copy of the literal fold tree in the optimized plan (the
    single-Column form inlined it twice — double analysis and double
    per-row evaluation). CollapseProject leaves multi-referenced non-cheap
    expressions alone; pin that by counting the centroid literal in the
    optimized plan."""
    from mrcond_spark import plans
    from mrcond_spark.operators.similarity import with_cell

    # a distinctive literal value that appears nowhere else in the plan
    centroids = np.array([[7.25, 0.5], [1.5, 9.125]], dtype="float64")
    df = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = with_cell(df, centroids, F.col("embedding")).select("vec_id", "cell")
    optimized = plans.explain_str(out, "extended").split("== Optimized Logical Plan ==")[
        1
    ].split("== Physical Plan ==")[0]
    assert optimized.count("9.125") == 1, (
        f"centroid literals appear {optimized.count('9.125')}x in the "
        "optimized plan — the scores projection was re-inlined (double "
        "analysis + double per-row evaluation)"
    )


def test_capture_preckpt_plans_records_hidden_subplans(spark):
    """localCheckpoint truncates lineage, so committed explain() captures of
    checkpointed operators hid the exchanges their optimizations added
    (r11-verdict item 3/8). The tap must record each materialize_once
    input's full pre-checkpoint plan."""
    from mrcond_spark.operators import capture_preckpt_plans, materialize_once

    df = spark.range(100).repartition(4, "id")
    with capture_preckpt_plans() as taps:
        ck = materialize_once(df, eager=False)
    assert len(taps) == 1
    assert "Exchange" in taps[0], "pre-checkpoint plan should show the repartition exchange"
    # the checkpointed frame's own plan hides it — that asymmetry is the point
    from mrcond_spark import plans

    assert "Exchange" not in plans.explain_str(ck, "formatted")
    # and the tap is OFF outside the context
    from mrcond_spark.operators import _PRECKPT_TAP

    assert _PRECKPT_TAP is None
