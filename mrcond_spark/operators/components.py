"""Connected components — the clustering step of near-duplicate dedup.

Every pair-producing dedup tier (MinHash-LSH, SimHash, embedding near-dup)
yields an EDGE LIST; curation needs clusters and one representative per
cluster ("keep min id, drop the rest"). Components via iterative min-label
propagation:

    label(v) <- min(label(v), min over neighbors' labels)

repeated until no label changes. Each iteration is one join + one
aggregation, both shuffling on the node id — fully distributed, no
driver-side graph.

Scale notes (100 TB): iteration count is the graph DIAMETER. Near-dup
clusters are small and dense (diameter ~2-4), so a handful of iterations
settles real corpora. For adversarial long-chain graphs, production systems
use the alternating large-star/small-star formulation (O(log n) rounds,
Kiveris et al., "Connected Components in MapReduce and Beyond") — same
per-round shape as this loop. Labels are ``materialize_once``'d per round:
an iterative plan would otherwise grow its lineage linearly and re-execute
all prior rounds per action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from . import materialize_once


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) — component = min node id reachable.

    ``edges`` is undirected input (each pair listed once in either
    direction); isolated nodes simply don't appear (callers union them in if
    needed).
    """
    # Lazy checkpoints for the two loop inputs (round-12, guide §2.6 "job
    # floor"): neither is consumed by a standalone action any more — round
    # 1's single observed-checkpoint job materializes und, the initial
    # labels, and the first propagation in ONE job instead of three. Both
    # still truncate lineage, and rounds 2+ read und's stored blocks
    # (within one job a shared RDD is one DAG node, so the double reference
    # in round 1's plan does not recompute the edge pipeline).
    und = materialize_once(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct(),
        eager=False,
    )
    labels = materialize_once(
        und.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node")),
        eager=False,
    )
    converged = False
    prev_sum = None
    expected_nodes = None
    for _ in range(max_iter):
        # ONE join per round: the label POINTERS (node -> label) are just
        # more edges, so unioning them with the graph makes a single
        # probe-and-min pass compute BOTH the neighbor minimum AND the
        # path-halving jump label(label(v)) — via the pointer edge the node
        # adopts its label's label, collapsing chains in O(log diameter)
        # rounds. The pointer edge also guarantees every node survives the
        # inner join and that the new label never exceeds the old one
        # (label(label(v)) <= label(v) by min-monotonicity), so no left
        # join / coalesce is needed. (The previous 2-joins-plus-left-join
        # formulation computed the same fixpoint with ~2x the stages per
        # round: measured 6.3 -> 3.5 s on q170 at sf0.1.)
        edges_r = und.union(
            labels.select(F.col("node").alias("a"), F.col("label").alias("b"))
        )
        # labels only ever decrease, so an unchanged SUM means fixpoint.
        # The sum rides the SAME job that materializes the round via
        # observe() — Dataset.checkpoint is a tracked SQL action, so the
        # CollectMetrics accumulators are populated by the eager
        # localCheckpoint itself and the former per-round
        # .agg(...).collect() job (one driver job FLOOR per round — ~half
        # of q99/q170's wall at bench scale was these floors, guide §2.6)
        # disappears. Exactness guard: observed metrics are accumulator-
        # based, and a speculatively re-run task at cluster scale could
        # double-count; the node COUNT is loop-invariant (every node
        # survives via its pointer edge), so any count drift across rounds
        # falls back to the exact single-job aggregation for that round.
        obs = Observation()
        new_labels = materialize_once(
            edges_r.join(labels, edges_r.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("label"))
            .observe(
                obs,
                F.sum(F.col("label").cast("decimal(38,0)")).alias("label_sum"),
                F.count(F.lit(1)).alias("n_nodes"),
            )
        )
        got = obs.get
        label_sum, n_seen = got["label_sum"], got["n_nodes"]
        if expected_nodes is None:
            expected_nodes = n_seen
        elif n_seen != expected_nodes:  # pragma: no cover — speculation-only path
            label_sum = new_labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)"))
            ).collect()[0][0]
        labels = new_labels
        if label_sum == prev_sum:
            converged = True
            break
        prev_sum = label_sum
    if not converged:
        # silent non-convergence would hand wrong cluster representatives to
        # dedup callers; with pointer jumping max_iter=N covers diameter 2^N,
        # so hitting the cap means the caller sized it wrong — fail loudly
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} rounds"
        )
    return labels.select("node", F.col("label").alias("component"))


def drop_non_representatives(
    df: DataFrame, edges: DataFrame, id_col: str, max_iter: int = 25
) -> DataFrame:
    """Shared dedup tail: cluster ``edges`` (id_a/id_b pairs), keep the
    min-id representative per cluster, anti-join the rest out of ``df``."""
    comp = connected_components(edges, src="id_a", dst="id_b", max_iter=max_iter)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("__drop_id")
    )
    return df.join(losers, df[id_col] == F.col("__drop_id"), "left_anti")
