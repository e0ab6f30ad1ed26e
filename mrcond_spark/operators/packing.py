"""Sequence packing — the training-batch assembly operator (SURVEY §2.4 E5+).

LLM training pipelines pack variable-length documents into fixed-capacity
training sequences (bins) so padding waste is bounded. Global optimal packing
is NP-hard and inherently serial; the scale shape is BUCKETED NEXT-FIT:

1. hash/modulo documents into independent buckets (shuffle key = bucket);
2. within each bucket, one ``applyInPandas`` group walks docs in id order and
   runs deterministic next-fit (new bin when the doc would overflow capacity);
3. bin identity = (bucket, bin_seq) — globally unique without coordination.

At 100 TB: buckets are the parallelism dial (64 here, thousands on a
cluster); each group is one partition-sized pandas walk — O(rows/bucket)
memory, no driver involvement, one shuffle total. Packing quality loses only
the tail bin per bucket vs a serial global pass.

The next-fit recurrence (running sum with reset) is NOT expressible as a
plain SQL window, but IS a recursive CTE — which is exactly how the DuckDB
oracle for q84 states it, so the operator stays hash-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_next_fit(
    docs: DataFrame,
    capacity: int,
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each doc a (bucket, bin_seq) training-sequence id.

    Deterministic: bucket = id % n_buckets, docs walk in id order, next-fit
    opens a new bin when fill + size > capacity. A doc larger than capacity
    gets a bin of its own (and the next doc always starts fresh).
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        fill = 0
        seq = 0
        bins = []
        for n in pdf["__size"]:
            if seq == 0 or fill + n > capacity:
                seq += 1
                fill = n
            else:
                fill += n
            bins.append(seq)
        pdf["bin_seq"] = pd.Series(bins, dtype="int64")
        return pdf[["bucket", "__id", "bin_seq", "__size"]]

    keyed = docs.select(
        (F.col(id_col) % n_buckets).cast("bigint").alias("bucket"),
        F.col(id_col).cast("bigint").alias("__id"),
        F.col(size_col).cast("bigint").alias("__size"),
    )
    out = keyed.groupBy("bucket").applyInPandas(
        pack, schema="bucket BIGINT, __id BIGINT, bin_seq BIGINT, __size BIGINT"
    )
    return out.select(
        "bucket",
        F.col("__id").alias(id_col),
        "bin_seq",
        F.col("__size").alias(size_col),
    )


def apply_repeat_factors(
    df: DataFrame,
    weight_col: str,
    out_col: str = "repeat_idx",
    max_repeat: int = 100,
) -> DataFrame:
    """Upsampling by integer repeat factors — the second half of mixture
    rebalancing (downsampling is the q93 hash-threshold resample; weights
    above 1 become row REPEATS, the standard epoch-repeat treatment of
    under-represented domains in training-data mixtures).

    Each row appears ``floor(weight)`` times (weight < 1 drops the row —
    fractional keep probabilities belong to the deterministic hash resample,
    not here) with ``out_col`` numbering the copies 1..n so downstream
    shuffles can tell them apart. ``max_repeat`` clamps runaway weights: an
    upstream weighting bug multiplies corpus size by at most that factor
    instead of without bound.

    100 TB shape: explode(sequence(...)) is a narrow transformation — rows
    amplify in place with NO shuffle; the output feeds the deterministic
    shard shuffle (q96) which spreads the copies uniformly.
    """
    rep = F.least(
        F.greatest(F.floor(F.col(weight_col)).cast("int"), F.lit(0)),
        F.lit(max_repeat),
    )
    return (
        df.withColumn("__rep", rep)
        .filter(F.col("__rep") > 0)
        .withColumn(out_col, F.explode(F.sequence(F.lit(1), F.col("__rep"))))
        .drop("__rep")
    )
