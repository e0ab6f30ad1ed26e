"""Declared query corpus (SURVEY.md §2.2 / §2.4).

Every entry pairs a Spark-first implementation (DataFrame API) with an ANSI
SQL oracle string runnable by DuckDB on the same parquet tables. The driver
hash-compares them at sf0.01 — the engine's correctness gate.

Conventions (SURVEY §2.2 preamble) enforced here:
- every query ends with a total ORDER BY (keys first);
- money / double aggregates go through explicit DECIMAL casts (exact in both
  engines; no float-summation-order divergence);
- no raw timestamps in output (DATE / EXTRACT / epoch-micros instead);
- every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # import for side effect of registration
    from . import batch, llm, udf_surface  # noqa: F401

    return dict(REGISTRY)
