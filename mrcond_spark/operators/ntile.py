"""Distributed exact NTILE — global equal-count bucketing without a global sort.

A naive ``NTILE(k) OVER (ORDER BY ...)`` (no PARTITION BY) plans a
single-partition Window: one reducer sorts the entire table. That is the one
scale-killer the round-1 audit flagged. This operator computes the IDENTICAL
bucket assignment with every data-sized stage distributed:

1. ``repartitionByRange`` on the order keys — P disjoint, ordered ranges
   (RangePartitioner's boundary sampling is seeded per-partition, so the
   partitioning is deterministic across the two jobs below);
2. per-partition local ``row_number`` — a Window partitioned by the
   materialized ``spark_partition_id``, so each window group is exactly one
   range partition and sorts locally;
3. collect the P per-partition counts (P rows — bounded by the partition
   count, never by the data) and fold them into cumulative offsets;
4. ``global_rank = offset[pid] + local_row_number``, then the closed-form
   SQL NTILE split: with n rows and k buckets, the first ``n % k`` buckets
   hold ``n div k + 1`` rows and the rest ``n div k``.

100 TB posture: two shuffles of the projected key columns (range + pid hash),
one P-row driver collect, no single-partition exchange anywhere. The input
lineage is computed twice (counts job + final job) — for wide inputs project
down to the order keys first, as q77 does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list[str],
    out_col: str = "bucket",
    partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = NTILE(n_buckets) over the global order of
    ``order_cols`` (which must be a total order — include a unique tiebreak
    key, or ties land in nondeterministic buckets)."""
    spark = df.sparkSession
    P = partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(P, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    local = ranged.withColumn("__lrn", F.row_number().over(w))

    counts = local.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    offsets: dict[int, int] = {}
    total = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = total
        total += row["cnt"]

    n, k = total, n_buckets
    big = n % k  # first `big` buckets get one extra row
    size_big = n // k + 1
    size_small = max(n // k, 1)  # guard: n < k never reaches the small branch

    if offsets:
        omap = F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
        )
        rank = F.coalesce(F.element_at(omap, F.col("__pid")), F.lit(0)) + F.col("__lrn")
    else:
        rank = F.col("__lrn")
    bucket = (
        F.when(rank <= big * size_big, F.ceil(rank / F.lit(size_big)))
        .otherwise(F.lit(big) + F.ceil((rank - big * size_big) / F.lit(size_small)))
        .cast("int")
    )
    return local.withColumn(out_col, bucket).drop("__pid", "__lrn")
