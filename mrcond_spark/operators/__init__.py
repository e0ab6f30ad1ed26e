"""Custom operators not expressible as a single built-in Spark primitive.

Each module documents the reference/north-star contract it implements and the
100 TB scaling argument for its physical strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ONLY if the plan has fewer partitions than the cluster.

    Heavy per-row stages (Pandas-UDF hashing, featurization) inherit the
    scan's partitioning; a small local parquet file reads as ONE split, which
    would serialize the whole stage on one core. At real scale inputs have
    many splits and this is a no-op — the guard keeps us from injecting a
    gratuitous shuffle into big plans.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
