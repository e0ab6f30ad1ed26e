"""Config loader contract tests (reference: mrcon/src/config.rs:44-58)."""

from __future__ import annotations

import pytest

from mrcond_spark.config import (
    Collection,
    ConfigError,
    Connections,
    Settings,
    collections_from_dict,
    connections_from_env,
)


def _coll(name: str = "c1", stream: str = "q1") -> Collection:
    return Collection(db_name="db", coll_name=name, stream_name=stream)


def test_duplicate_collections_rejected():
    with pytest.raises(ConfigError, match="duplicate"):
        Settings(
            connections=Connections("mongodb://x", "amqp://y"),
            collections=(_coll(), _coll()),
        )


def test_distinct_collections_accepted():
    s = Settings(
        connections=Connections("mongodb://x", "amqp://y"),
        collections=(_coll("c1", "q1"), _coll("c2", "q2")),
    )
    assert len(s.collections) == 2


def test_connections_from_env_prefix():
    env = {"MYAPP_MONGO_URI": "mongodb://m", "MYAPP_RABBITMQ_URI": "amqp://r"}
    c = connections_from_env("MYAPP", env)
    assert c.mongo_uri == "mongodb://m"
    assert c.rabbitmq_uri == "amqp://r"


def test_connections_missing_env_raises():
    with pytest.raises(ConfigError, match="MRCON_MONGO_URI"):
        connections_from_env("MRCON", {})


def test_collections_from_yaml_shape():
    doc = {
        "collections": [
            {
                "watched": {
                    "db_name": "test",
                    "coll_name": "testcoll",
                    "change_stream_pre_and_post_images": True,
                },
                "resume_tokens": {
                    "db_name": "tokens_db",
                    "coll_name": "tokens",
                    "capped": True,
                    "size_in_bytes": 1048576,
                },
                "stream_name": "testqueue",
            }
        ]
    }
    (c,) = collections_from_dict(doc)
    assert c.qualified_name == "test.testcoll"
    assert c.stream_name == "testqueue"
    assert c.tokens_coll_size_in_bytes == 1048576
