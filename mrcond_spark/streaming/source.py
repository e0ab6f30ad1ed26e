"""CDC sources (SURVEY §2.3 S1).

Production source: the MongoDB Spark Connector v10+ micro-batch change-stream
source (R1, `mrcon/src/mongo/connector.rs:142`). Resume semantics come from
the Structured Streaming checkpoint (R2/R6, `resume_tokens.rs:74-108`) — one
checkpoint dir per (collection, queue) pair replaces the capped token
collection.

Test double: a file source replaying envelope-shaped JSON lines in order —
same schema, same downstream pipeline, deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import Collection
from .envelope import ENVELOPE_SCHEMA


def mongo_change_stream(spark: SparkSession, mongo_uri: str, coll: Collection) -> DataFrame:
    """Streaming DataFrame over a MongoDB change stream.

    Requires the mongodb spark connector on the classpath and a replica-set
    mongod (compose healthcheck trick, reference docker-compose.yaml:17-28).
    ``change.stream.publish.full.document.only=false`` keeps the full
    envelope, matching the reference's verbatim forwarding.
    """
    return (
        spark.readStream.format("mongodb")
        .option("spark.mongodb.connection.uri", mongo_uri)
        .option("spark.mongodb.database", coll.db_name)
        .option("spark.mongodb.collection", coll.coll_name)
        .option("spark.mongodb.change.stream.publish.full.document.only", "false")
        .load()
    )


def file_replay_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Deterministic envelope replay from a directory of JSON-line files.

    ``maxFilesPerTrigger=1`` gives one micro-batch per file — replay scripts
    control batch boundaries by how they split files.
    """
    return (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(events_dir)
    )
