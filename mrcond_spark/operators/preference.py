"""Bradley-Terry preference strength from pairwise outcomes.

Hunter's MM iteration (D. R. Hunter, "MM algorithms for generalized
Bradley-Terry models", Annals of Statistics 2004):

    p_i' = W_i / sum_j  n_ij / (p_i + p_j)

run for a FIXED number of rounds from p = 1 — deterministic and
cross-engine reproducible (the production fixpoint variant would iterate
to convergence; fixed rounds are this repo's oracle discipline, same as
`graph.pagerank`). The input is the DIRECTED duel table (one row per
decided comparison, winner `i` over loser `j`); everything after the
first aggregation operates on the |entities^2|-bounded win matrix, so
iteration cost is independent of corpus size.

Cross-engine determinism: per-term division runs in double (fixed op
tree over exact per-entity values); per-group sums are routed through
DECIMAL(38,18) casts so summation order cannot diverge between Spark and
a SQL oracle. Used by q159; property-tested against a pure-Python
reference in tests/test_preference_property.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import materialize_once


def bradley_terry(
    duels: DataFrame,
    winner_col: str = "i",
    loser_col: str = "j",
    rounds: int = 3,
) -> DataFrame:
    """Per-entity ``(entity, n_wins, n_matches, strength)`` from directed
    duel rows; ``strength`` is the round-``rounds`` MM estimate normalized
    to sum 1. Entities appearing only in undecided duels are absent (the
    caller filters ties out before calling)."""
    wins = materialize_once(
        duels.select(
            F.col(winner_col).alias("i"), F.col(loser_col).alias("j")
        )
        .groupBy("i", "j")
        .agg(F.count("*").alias("w")),
        eager=False,
    )
    wtot = wins.groupBy("i").agg(F.sum("w").cast("bigint").alias("wi"))
    nmat = materialize_once(
        wins.unionByName(
            wins.select(
                F.col("j").alias("i"), F.col("i").alias("j"), F.col("w")
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("w").alias("n")),
        eager=False,
    )
    p = nmat.select("i").distinct().select("i", F.lit(1.0).alias("p"))
    for _ in range(rounds):
        pi = p.select(F.col("i").alias("__i"), F.col("p").alias("pi"))
        pj = p.select(F.col("i").alias("__j"), F.col("p").alias("pj"))
        joined = nmat.join(F.broadcast(pi), F.col("i") == F.col("__i")).join(
            F.broadcast(pj), F.col("j") == F.col("__j")
        )
        term = (
            F.col("n").cast("double") / (F.col("pi") + F.col("pj"))
        ).cast("decimal(38,18)")
        denom = joined.groupBy("i").agg(
            F.sum(term).cast("double").alias("denom")
        )
        p = materialize_once(
            denom.join(wtot, "i", "left").select(
                "i",
                (
                    F.coalesce(F.col("wi"), F.lit(0)).cast("double")
                    / F.col("denom")
                ).alias("p"),
            ),
            eager=False,
        )
    tot = p.agg(
        F.sum(F.col("p").cast("decimal(38,18)")).cast("double").alias("__s")
    )
    mats = nmat.groupBy("i").agg(F.sum("n").cast("bigint").alias("n_matches"))
    return (
        p.join(mats, "i")
        .join(wtot, "i", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("i").alias("entity"),
            F.coalesce(F.col("wi"), F.lit(0)).cast("bigint").alias("n_wins"),
            "n_matches",
            F.round(F.col("p") / F.col("__s"), 6).alias("strength"),
        )
        .orderBy("entity")
    )
