"""Weighted PageRank over an edge list — the link-analysis companion to
``operators/components.py`` (which covers the clustering half of graph
work in this engine).

Training-data relevance: source-quality scoring over a crawl's link (or
citation / co-occurrence) graph is a standard curation signal; the operator
takes ANY ``(src, dst, weight)`` edge DataFrame, so callers can feed it a
domain graph, a document-similarity graph from the dedup tiers, or a
contracted entity graph.

Determinism / oracle story: each iteration computes per-edge contribution
terms ``rank * w / out_w`` in double (identical inputs → identical doubles
in any engine), then sums them through per-term ``DECIMAL(38,30)`` casts —
exact, order-independent addition — so a fixed iteration count yields
bit-identical ranks in Spark and the unrolled-CTE DuckDB oracle.

Scale shape (100 TB): every stage is an equi-join or hash aggregate on the
node id — fully distributed, no driver-side graph, no collect. Iterations
multiply plan depth, so each round's rank table is ``materialize_once``'d
(same rule as the components loop). Dangling nodes (no out-edges) leak
their mass — the simplified formulation; both engines implement the same
recurrence, and for curation *ranking* the leak is harmless (monotone
renormalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from . import materialize_once


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Return ``(node, rank)`` after ``iterations`` rounds of weighted
    PageRank with uniform ``(1-d)/N`` teleport.

    Nodes = every id appearing as ``src`` or ``dst``. ``weight=None``
    means unweighted (each edge weight 1). Multi-edges are pre-aggregated
    so the per-iteration join touches each ``(src, dst)`` once.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    # Lazy edge checkpoint (round-12, guide §2.6 job floor): e's only
    # pre-loop consumer is the nodes build below, whose eager checkpoint
    # job materializes e's stored blocks in the same pass; out_w/share then
    # read those blocks when the final job runs. One pre-loop driver job
    # instead of three (e-materialize + nodes-materialize + nodes.count()).
    e = materialize_once(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), w.alias("w"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w")),
        eager=False,
    )
    # The node count rides the nodes-materialize job via observe():
    # Dataset.checkpoint is a tracked SQL action, so the CollectMetrics
    # accumulator is populated by the eager localCheckpoint itself and the
    # former nodes.count() job floor disappears (the components-loop
    # convergence fusion, same rationale and caveats).
    obs = Observation()
    nodes = materialize_once(
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .observe(obs, F.count(F.lit(1)).alias("n"))
    )
    n_nodes = int(obs.get["n"])  # scalar — metadata-sized driver value
    d = float(damping)
    teleport = (1.0 - d) / n_nodes

    out_w = e.groupBy("u").agg(F.sum("w").alias("out_w"))
    # out-degree-normalized edge share: rank flowing u -> v per unit rank.
    # Lazy checkpoints throughout the fixed-round loop: after the one
    # nodes.count() action above there is no mid-loop action, so eager
    # rounds would only pay construction-time job floors (the measured
    # q132 lazy-peel rule); eager=False still truncates lineage.
    share = materialize_once(
        e.join(out_w, "u").select("u", "v", (F.col("w") / F.col("out_w")).alias("share")),
        eager=False,
    )

    ranks = materialize_once(nodes.withColumn("rank", F.lit(1.0 / n_nodes)), eager=False)
    for _ in range(int(iterations)):
        contrib = (
            share.join(ranks, share.u == ranks.node)
            .select(
                F.col("v").alias("node"),
                (F.col("rank") * F.col("share")).cast("decimal(38,30)").alias("term"),
            )
            .groupBy("node")
            .agg(F.sum("term").alias("in_sum"))
        )
        ranks = materialize_once(
            nodes.join(contrib, "node", "left").select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(d) * F.coalesce(F.col("in_sum").cast("double"), F.lit(0.0))
                ).alias("rank"),
            ),
            eager=False,
        )
    return ranks
