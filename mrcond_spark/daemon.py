"""Daemon entry point — the `mrcond` binary equivalent (SURVEY §3.1).

Mirrors `mrcond/src/main.rs`:
- CLI: ``--config`` (YAML collections file), ``--prefix`` (env prefix for
  connection URIs, default MRCON) — `main.rs:14-27`;
- settings = env connections + file collections, duplicate-validated —
  `main.rs:34-46`;
- HTTP /health + /metrics on port 3000 — `main.rs:53-73`;
- supervisor serving one pipeline per collection — `main.rs:75-91`.

Run: ``python -m mrcond_spark.daemon --config config.yaml``
(requires the MongoDB Spark connector jar + a RabbitMQ broker; both are
environment-provided, so this module is import-safe without them).
"""

from __future__ import annotations

import argparse
import os

from .config import Settings, load_settings
from .session import get_spark
from .streaming.http import start_http
from .streaming.metrics import Metrics
from .streaming.sink import RabbitMQPublisher
from .streaming.source import mongo_change_stream
from .streaming.supervisor import ConnectorServer, StreamSpec


def build_server(
    settings: Settings,
    metrics: Metrics,
    checkpoint_root: str,
    spark=None,
) -> ConnectorServer:
    spark = spark or get_spark("mrcond-daemon")
    # one publisher (connection + channel) PER stream: foreachBatch callbacks
    # run on separate driver threads and pika's BlockingConnection is not
    # thread-safe — same channel-per-publisher layout as the reference
    # (mrcon/src/rabbitmq/amqp.rs:69-86)
    specs = [
        StreamSpec(
            stream_name=c.stream_name,
            source_factory=(
                lambda coll=c: mongo_change_stream(spark, settings.connections.mongo_uri, coll)
            ),
            publisher=RabbitMQPublisher(settings.connections.rabbitmq_uri),
            checkpoint_dir=os.path.join(checkpoint_root, c.stream_name),
        )
        for c in settings.collections
    ]
    return ConnectorServer(specs, metrics=metrics)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mrcond-spark")
    ap.add_argument("--config", default="/app/config.yaml")
    ap.add_argument("--prefix", default="MRCON")
    ap.add_argument("--port", type=int, default=3000)
    ap.add_argument("--checkpoint-root", default="/tmp/mrcond-spark-checkpoints")
    args = ap.parse_args(argv)

    settings = load_settings(args.config, prefix=args.prefix)
    metrics = Metrics()
    httpd = start_http(metrics, port=args.port)
    try:
        server = build_server(settings, metrics, args.checkpoint_root)
        server.start()
        server.await_all()
        # permanently-failed streams are an operational failure, not a clean
        # exit — orchestrators must see nonzero and restart/alert
        return 1 if server.failed else 0
    finally:
        httpd.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
