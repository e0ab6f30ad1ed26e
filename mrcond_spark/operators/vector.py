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
    # empty vectors get NULL errors (an unguarded /size would raise
    # DIVIDE_BY_ZERO under ANSI); note the q111 oracle's unnest-based
    # formulation OMITS such rows entirely, so declared-query inputs are
    # contract-bound to non-empty vectors (fixture embeddings are fixed-dim)
    return staged.select(
        *df.columns,
        F.when(F.size(x) > 0, F.sqrt(ssq.cast("double") / F.size(x))).alias("q_rmse"),
        F.array_max(F.transform(F.col("__err"), F.abs)).alias("q_max_abs_err"),
    )


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    centered: bool = True,
) -> DataFrame:
    """Covariance (or raw second-moment) matrix via Arrow-batched numpy
    partials — the scale path for dimensions in the thousands, where the
    exact-decimal posexplode route (q127) would expand d^2 rows per vector.

    Returns ``(i, j, cov)`` for the upper triangle (i <= j), double-typed.
    ``centered=False`` skips mean subtraction (raw E[x_i x_j] * n).

    Plan shape: ``mapInPandas`` reduces each Arrow batch to ONE d x d
    partial (X^T X), d sums, and a count — the shuffle moves d(d+1)/2 rows
    per PARTITION, not per vector; a single tiny hash aggregate merges the
    partials. Float caveat: the partial sums are double (merge-order
    dependent in the last ulps), so this operator is tolerance-tested
    against the exact decimal route rather than hash-oracled.

    100 TB: cost is one scan + numpy BLAS per batch; the exchange carries
    O(partitions * d^2) rows — for d=4096 and 10k partitions that is 168M
    skinny rows into a 8.4M-group aggregate, still far below data size.
    """
    d_out = "i int, j int, p double, s double, n long"

    def partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vecs = pdf[vec_col].to_numpy()
            if len(vecs) == 0:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            g = x.T @ x
            s = x.sum(axis=0)
            n = len(x)
            iu, ju = np.triu_indices(x.shape[1])
            yield pd.DataFrame(
                {
                    "i": iu.astype("int32"),
                    "j": ju.astype("int32"),
                    "p": g[iu, ju],
                    # per-dim sums ride along on the diagonal rows (j == i)
                    "s": np.where(iu == ju, s[iu], 0.0),
                    "n": np.where((iu == 0) & (ju == 0), n, 0),
                }
            )

    agg = (
        df.select(vec_col)
        .mapInPandas(partials, schema=d_out)
        .groupBy("i", "j")
        .agg(F.sum("p").alias("sp"), F.sum("s").alias("s_diag"), F.sum("n").alias("n_part"))
    )
    if not centered:
        return agg.select("i", "j", F.col("sp").alias("cov")).orderBy("i", "j")
    n_total = agg.agg(F.sum("n_part").alias("n"))
    sums = agg.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("d"), F.col("s_diag").alias("s")
    )
    si = sums.select(F.col("d").alias("i"), F.col("s").alias("s_i"))
    sj = sums.select(F.col("d").alias("j"), F.col("s").alias("s_j"))
    return (
        agg.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n_total))
        .select(
            "i",
            "j",
            (
                F.col("sp") / F.col("n")
                - (F.col("s_i") / F.col("n")) * (F.col("s_j") / F.col("n"))
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def top_principal_component(
    cov: DataFrame,
    n_iter: int = 100,
) -> tuple[float, list[float]]:
    """Leading eigenpair of a covariance matrix given as upper-triangle rows
    ``(i, j, cov)`` (q127 / ``gram_matrix`` output) — driver-side power
    iteration, since the matrix itself is bounded metadata (d^2 doubles;
    64x64 = 32 KiB) while the DATA-sized work already happened in the
    aggregation that produced it.

    Deterministic: fixed all-ones start vector, fixed iteration count, sign
    fixed so the largest-|component| entry is positive. Returns
    ``(eigenvalue, eigenvector)``.
    """
    import numpy as np

    rows = cov.collect()  # bounded: d(d+1)/2 upper-triangle entries
    d = max(r["j"] for r in rows) + 1
    m = np.zeros((d, d))
    for r in rows:
        m[r["i"], r["j"]] = m[r["j"], r["i"]] = r["cov"]
    v = np.ones(d) / np.sqrt(d)
    for _ in range(n_iter):
        w = m @ v
        nrm = np.linalg.norm(w)
        if nrm == 0.0:
            return 0.0, v.tolist()
        v = w / nrm
    ev = float(v @ (m @ v))
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    return ev, v.tolist()
