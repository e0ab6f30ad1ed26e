"""Vector-column operators: per-group centroids and scalar quantization
(SURVEY §2.4 E3/E4 companions — the embedding-maintenance half of a
similarity stack).

Both operators are deterministic and cross-engine hash-checkable:

- centroids go through per-dimension ``avg`` (partial→final hash agg);
- quantization error sums fold per-element ``DECIMAL`` casts, which are
  exact and order-independent, so Spark's left-to-right array fold and the
  oracle's unordered ``SUM`` over ``unnest`` produce bit-identical totals.

Reference parity: f-squirrel/mrcond has no vector surface (it is a CDC
connector, SURVEY §1); these belong to the mandated LLM-pipeline extension
(BASELINE.json north_star: similarity search over embedding columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def embedding_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group centroid of an ``array<float>`` column.

    Returns ``(group_col, n_vecs, centroid array<double>)`` with the
    centroid ordered by dimension.

    Scale shape (100 TB): ``posexplode`` is narrow (one row per element,
    no shuffle); the only shuffle is the hash aggregate on
    ``(group, pos)`` — and because ``avg`` is algebraic, map-side partial
    aggregation collapses each partition to at most ``|groups| x dims``
    rows before the exchange, so a handful of hot groups cannot skew the
    reducers. Re-assembly aggregates ``|groups| x dims`` rows only —
    metadata-sized. No driver collect anywhere.
    """
    exploded = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    # exact decimal-sum average, NOT F.avg: a double sum's value depends on
    # partition merge order, so hash oracles would chase last-ulp drift.
    # float -> double is exact, double -> decimal(38,30) rounds the same
    # mathematical value in any engine; the decimal sum is exact and
    # order-independent, making the final double average bit-stable.
    per_dim = exploded.groupBy(group_col, "pos").agg(
        (
            F.sum(F.col("val").cast("double").cast("decimal(38,30)")).cast("double")
            / F.count("*")
        ).alias("avg_val"),
        F.count("*").alias("n"),
    )
    return per_dim.groupBy(group_col).agg(
        F.max("n").cast("bigint").alias("n_vecs"),
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("avg_val")))
        ).getField("avg_val").alias("centroid"),
    )


def _dec(col: Column) -> Column:
    # exact, order-independent accumulator term (see module docstring)
    return col.cast("decimal(38,30)")


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Per-vector int8-style scalar quantization audit.

    Each vector is linearly quantized to ``0..levels`` using its own
    min/max (``q = round((x - mn) / scale)``, ``scale = (mx - mn) /
    levels``), then de-quantized, and the reconstruction error is
    reported: adds ``q_rmse`` (root-mean-square error, double) and
    ``q_max_abs_err`` (double) to the input row. Constant vectors
    (``mx == mn``) quantize losslessly to level 0 → both errors 0.

    Scale shape (100 TB): entirely NARROW — min/max/transform/fold are
    per-row array expressions (JVM codegen, no Python); zero shuffles, so
    the operator composes into any scan without repartitioning. The error
    sum folds per-element ``DECIMAL(38,30)`` casts so the result is exact
    and engine-order-independent (hash-oracle-checkable).
    """
    x = F.col(vec_col)
    # Stage the row-level scalars (min/max/scale) and the error array as
    # SEPARATE multi-referenced projections. Referencing an aggregate
    # expression like array_min(x) directly inside a transform() lambda
    # re-evaluates it PER ELEMENT (higher-order lambdas are interpreted and
    # Catalyst doesn't CSE across them — the doc_fingerprint O(len^2)
    # lesson); as standalone aliases referenced more than once downstream,
    # CollapseProject keeps them materialized per row, so the lambda sees
    # plain attribute refs and the whole operator is O(dims) per row
    # (measured: 3.26 s -> sub-second at sf0.1 for the inlined vs staged
    # form). Still entirely narrow — projections, no shuffle.
    mn, mx, scale = F.col("__mn"), F.col("__mx"), F.col("__scale")
    base = df.select(
        "*",
        F.array_min(x).cast("double").alias("__mn"),
        F.array_max(x).cast("double").alias("__mx"),
    ).select("*", ((mx - mn) / F.lit(float(levels))).alias("__scale"))
    # de-quantized element: mn + round((v-mn)/scale)*scale; err = v - deq
    staged = base.select(
        "*",
        F.transform(
            x,
            lambda v: F.when(scale == 0.0, F.lit(0.0)).otherwise(
                v.cast("double") - (mn + F.round((v.cast("double") - mn) / scale, 0) * scale)
            ),
        ).alias("__err"),
    )
    # Spark caps decimal addition at precision 38 by dropping a scale digit
    # ((38,30)+(38,30) -> (38,29)), so the fold re-casts the accumulator to
    # keep its type fixed. The per-step rounding this introduces is bounded
    # by 64 * 1e-29 — ~19 orders of magnitude below the 9-dp display
    # rounding — while the fold order stays deterministic (left-to-right),
    # so results still hash-match the oracle's exact unordered decimal SUM.
    ssq = F.aggregate(
        F.col("__err"),
        F.lit(0).cast("decimal(38,30)"),
        lambda acc, e: (acc + _dec(e * e)).cast("decimal(38,30)"),
    )
    return staged.select(
        *df.columns,
        F.sqrt(ssq.cast("double") / F.size(x)).alias("q_rmse"),
        F.array_max(F.transform(F.col("__err"), F.abs)).alias("q_max_abs_err"),
    )
