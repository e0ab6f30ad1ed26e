"""mrcond_spark — a PySpark-native analytics engine.

A brand-new engine with the capabilities of the reference CDC connector
(`f-squirrel/mrcond`, surveyed in /root/repo/SURVEY.md) re-expressed
Spark-first, plus the full batch-relational and LLM-data-pipeline surface
declared in SURVEY.md §2:

- ``mrcond_spark.session``    — SparkSession factory (AQE, Arrow, tuning)
- ``mrcond_spark.catalog``    — parquet table loading / temp-view registry
- ``mrcond_spark.queries``    — declared query corpus (Q01–Q102), DuckDB-oracle checked
- ``mrcond_spark.operators``  — as-of join, dedup (exact/MinHash/SimHash), similarity
  search (exact + LSH ANN), text analysis, multimodal column plumbing
- ``mrcond_spark.streaming``  — CDC envelope, sources, queue sinks, checkpointed
  pipelines, supervisor with the reference's restart-classification semantics
- ``mrcond_spark.config``     — settings loader w/ duplicate-collection validation
  (contract: mrcon/src/config.rs:44-58)
"""

__version__ = "0.1.0"
