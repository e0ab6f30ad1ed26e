"""Settings model + loader.

Contract from the reference (`mrcon/src/config.rs:3-67`, `mrcond/src/main.rs:14-46`):
- connections come from env vars with a CLI-set prefix (default ``MRCON``):
  ``<PREFIX>_MONGO_URI``, ``<PREFIX>_RABBITMQ_URI`` (`main.rs:34-37`);
- watched-collection list comes from a YAML file (`main.rs:39-43`);
- duplicate collection configs are rejected at load (`config.rs:44-58`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


class ConfigError(ValueError):
    pass


@dataclass(frozen=True)
class Collection:
    """One watched collection (mirror of `mrcon/src/config.rs:3-28`)."""

    db_name: str
    coll_name: str
    stream_name: str  # queue name AND resume identity (server.rs:158)
    change_stream_pre_and_post_images: bool = False
    tokens_db_name: str = "resume_tokens"
    tokens_coll_name: str = "tokens"
    tokens_coll_capped: bool | None = None
    tokens_coll_size_in_bytes: int | None = None

    @property
    def qualified_name(self) -> str:
        return f"{self.db_name}.{self.coll_name}"


@dataclass(frozen=True)
class Connections:
    """Env-derived connection endpoints (`mrcon/src/config.rs:30-34`)."""

    mongo_uri: str
    rabbitmq_uri: str


@dataclass(frozen=True)
class Settings:
    connections: Connections
    collections: tuple[Collection, ...] = field(default_factory=tuple)

    def __post_init__(self) -> None:
        # duplicate rejection over the FULL collection config, matching the
        # reference's HashMap check (`config.rs:44-58`)
        seen: set[Collection] = set()
        for c in self.collections:
            if c in seen:
                raise ConfigError(f"duplicate collection config: {c.qualified_name}")
            seen.add(c)


def connections_from_env(prefix: str = "MRCON", env: dict[str, str] | None = None) -> Connections:
    env = env if env is not None else dict(os.environ)
    try:
        return Connections(
            mongo_uri=env[f"{prefix}_MONGO_URI"],
            rabbitmq_uri=env[f"{prefix}_RABBITMQ_URI"],
        )
    except KeyError as e:
        raise ConfigError(f"missing required env var {e.args[0]!r}") from e


def collections_from_dict(doc: dict) -> tuple[Collection, ...]:
    out = []
    for entry in doc.get("collections", []):
        watched = entry.get("watched", entry)
        tokens = entry.get("resume_tokens", {})
        out.append(
            Collection(
                db_name=watched["db_name"],
                coll_name=watched["coll_name"],
                stream_name=entry["stream_name"],
                change_stream_pre_and_post_images=watched.get(
                    "change_stream_pre_and_post_images", False
                ),
                tokens_db_name=tokens.get("db_name", "resume_tokens"),
                tokens_coll_name=tokens.get("coll_name", "tokens"),
                tokens_coll_capped=tokens.get("capped"),
                tokens_coll_size_in_bytes=tokens.get("size_in_bytes"),
            )
        )
    return tuple(out)


def load_settings(
    config_path: str, prefix: str = "MRCON", env: dict[str, str] | None = None
) -> Settings:
    import yaml

    with open(config_path) as f:
        doc = yaml.safe_load(f) or {}
    return Settings(
        connections=connections_from_env(prefix, env),
        collections=collections_from_dict(doc),
    )
