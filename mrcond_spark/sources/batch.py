"""Batch table IO.

100 TB notes baked into the defaults:
- parquet everywhere (vectorized reader, predicate pushdown, column pruning);
- writes partition by a caller-chosen low-cardinality column and can bucket
  by a join key so co-located joins skip the shuffle entirely;
- no schema inference on csv/json in production paths — callers pass one
  (inference is a full extra scan at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        # explicit opt-in to inference only outside the scale path
        reader = reader.option("inferSchema", "true")
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    return reader.options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
    **options: str,
) -> None:
    """Write with optional hive-style partitioning and bucketing.

    Bucketing requires a managed table name (Spark limitation); a bucketed
    fact table joined on its bucket key with an equally-bucketed dimension
    runs shuffle-free.
    """
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucketed writes need table_name (saveAsTable)")
        writer.option("path", path).bucketBy(n, *cols).sortBy(*cols).saveAsTable(table_name)
        return
    writer.save(path)
