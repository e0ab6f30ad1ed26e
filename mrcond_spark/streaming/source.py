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
from pyspark.sql import functions as F

from ..config import Collection
from .envelope import ENVELOPE_SCHEMA


def mongo_change_stream(spark: SparkSession, mongo_uri: str, coll: Collection) -> DataFrame:
    """Streaming DataFrame over a MongoDB change stream.

    Requires the mongodb spark connector on the classpath and a replica-set
    mongod (compose healthcheck trick, reference docker-compose.yaml:17-28).
    ``change.stream.publish.full.document.only=false`` keeps the full
    envelope, matching the reference's verbatim forwarding.

    The v10 connector requires an explicit schema for change streams when
    full-document-only is off; declaring ``ENVELOPE_SCHEMA`` drives its
    conversions — nested change-event fields declared as StringType (resume
    token ``_id``, ``documentKey``, ``fullDocument``) arrive as JSON strings,
    which is exactly the envelope contract. Exercised end-to-end only by the
    gated live e2e (tests/test_e2e_live.py); everything downstream of the
    source is covered by the file-replay double.
    """
    return (
        spark.readStream.format("mongodb")
        .schema(ENVELOPE_SCHEMA)
        .option("spark.mongodb.connection.uri", mongo_uri)
        .option("spark.mongodb.database", coll.db_name)
        .option("spark.mongodb.collection", coll.coll_name)
        .option("spark.mongodb.change.stream.publish.full.document.only", "false")
        .load()
    )


def raw_change_event_to_envelope(df: DataFrame, event_col: str = "event") -> DataFrame:
    """Normalize RAW MongoDB change-stream documents (extended JSON, the wire
    shape the v10 Spark connector consumes — see FIXTURES.md §1.2) into
    ``ENVELOPE_SCHEMA``-typed columns.

    Mirrors the connector's stringify-nested-into-StringType behavior: ``_id``
    (resume token), ``documentKey`` and ``fullDocument`` stay JSON strings;
    ``ns`` becomes the typed struct; ``clusterTime`` converts from the BSON
    ``{"$timestamp": {"t": seconds, ...}}`` (or an ISO string) to TIMESTAMP.
    Pure JVM expressions — usable inside a stream with no Python boundary.
    """
    ev = F.col(event_col)
    cluster_secs = F.get_json_object(ev, "$.clusterTime.$timestamp.t")
    return df.select(
        F.get_json_object(ev, "$._id").alias("_id"),
        F.get_json_object(ev, "$.operationType").alias("operationType"),
        F.coalesce(
            F.timestamp_seconds(cluster_secs.cast("bigint")),
            F.get_json_object(ev, "$.clusterTime").cast("timestamp"),
        ).alias("clusterTime"),
        F.struct(
            F.get_json_object(ev, "$.ns.db").alias("db"),
            F.get_json_object(ev, "$.ns.coll").alias("coll"),
        ).alias("ns"),
        F.get_json_object(ev, "$.documentKey").alias("documentKey"),
        F.get_json_object(ev, "$.fullDocument").alias("fullDocument"),
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
