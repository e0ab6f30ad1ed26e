"""Queue sinks behind the ``Publish`` seam (SURVEY §2.1 R4/R5).

The reference's only abstraction seam is the ``Publish`` trait
(`mrcon/src/rabbitmq/publish.rs:4-10`) with an AMQP implementation that
declares the queue idempotently (`amqp.rs:40-46`) and awaits a broker confirm
per message (`amqp.rs:97-107`). Here the seam is a small Python protocol used
from ``foreachBatch``:

- ordering: each micro-batch is sorted by resume token before publishing, and
  publishing is sequential per stream — preserving the reference's
  per-collection ordering contract (`connector.rs:145-167`, asserted by its
  e2e at `e2e.rs:413`);
- delivery: publish happens before the checkpoint commit for the batch, so a
  crash between them redelivers — the same at-least-once contract as
  publish-then-save-token (`connector.rs:150-163`);
- confirms: RabbitMQ sink enables publisher confirms and flushes per batch —
  batching the reference's per-message confirm round-trip (a strict
  improvement; SURVEY §4.1).
"""

from __future__ import annotations

import threading
from collections import defaultdict
from typing import Protocol



class Publish(Protocol):
    """Sink seam (contract: `mrcon/src/rabbitmq/publish.rs:4-10`)."""

    def declare(self, stream_name: str) -> None: ...

    def publish_batch(self, stream_name: str, payloads: list[str]) -> None:
        """Publish in order; raise on failure (fails the batch -> retry/redeliver)."""


class MemoryPublisher:
    """In-process sink for tests: per-stream ordered list, thread-safe.

    Process-wide registry so foreachBatch (driver-side) and assertions share
    state across StreamingQuery threads.
    """

    _registries: dict[str, "MemoryPublisher"] = {}
    _registry_lock = threading.Lock()

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.messages: dict[str, list[str]] = defaultdict(list)
        self.declared: set[str] = set()
        self.fail_next: int = 0  # fault injection: fail next N publish calls
        #: fault injection: on the next call, publish this many messages and
        #: THEN fail — models a broker failure mid-batch (redelivery dupes)
        self.fail_after: int | None = None

    @classmethod
    def named(cls, name: str) -> "MemoryPublisher":
        with cls._registry_lock:
            if name not in cls._registries:
                cls._registries[name] = cls()
            return cls._registries[name]

    @classmethod
    def reset(cls, name: str) -> None:
        with cls._registry_lock:
            cls._registries.pop(name, None)

    def declare(self, stream_name: str) -> None:
        with self._lock:
            self.declared.add(stream_name)

    def publish_batch(self, stream_name: str, payloads: list[str]) -> None:
        with self._lock:
            if self.fail_next > 0:
                self.fail_next -= 1
                raise RuntimeError("injected publish failure")
            if self.fail_after is not None:
                n = self.fail_after
                self.fail_after = None
                self.messages[stream_name].extend(payloads[:n])
                raise RuntimeError("injected mid-batch publish failure")
            self.messages[stream_name].extend(payloads)


class RabbitMQPublisher:
    """AMQP sink via pika (import-gated: not installed in this container).

    Mirrors the reference AMQP publisher: idempotent queue declare
    (`amqp.rs:40-46`), publisher confirms (`amqp.rs:97-107`), default
    exchange with the queue name as routing key.
    """

    def __init__(self, rabbitmq_uri: str) -> None:
        try:
            import pika  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - env without pika
            raise RuntimeError(
                "RabbitMQPublisher requires the 'pika' package; "
                "use MemoryPublisher for in-process testing"
            ) from e
        self._pika = pika
        self._uri = rabbitmq_uri
        self._conn = None
        self._channel = None

    def _ensure_channel(self):
        if self._channel is None or not self._channel.is_open:
            params = self._pika.URLParameters(self._uri)
            self._conn = self._pika.BlockingConnection(params)
            self._channel = self._conn.channel()
            self._channel.confirm_delivery()  # publisher confirms
        return self._channel

    def declare(self, stream_name: str) -> None:
        self._ensure_channel().queue_declare(queue=stream_name, durable=False)

    def publish_batch(self, stream_name: str, payloads: list[str]) -> None:
        ch = self._ensure_channel()
        for p in payloads:
            ch.basic_publish(exchange="", routing_key=stream_name, body=p.encode())
        # BlockingConnection with confirm_delivery raises on nack — the batch
        # fails and Structured Streaming retries it from the checkpoint.


