"""Deterministic dataset split assignment (train/val/test).

The split is a PURE FUNCTION of an id: md5(seed:id) -> 60-bit integer ->
bucket 0..99 -> label by the declared percentages. Properties that make
it the right primitive for corpus governance:

- reproducible across engines (DuckDB computes the identical digest; the
  q152/q153/q163 oracles restate it in SQL with the same seed string),
  retries, and partitionings — no ``rand()``;
- STABLE under corpus growth: a new batch never reshuffles existing
  docs across splits, which is what keeps eval sets frozen over time;
- key-choice = leakage policy: hash the DOCUMENT id for proportional
  splits (q152, audited for near-dup leakage by q153), or hash the
  GROUP key (source/crawl/cluster — q163) so correlated documents land
  together, leakage-proof by construction (the GroupShuffleSplit trade).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import seeded_hash60

#: split seed + percentages (out of 100 hash buckets), shared by the
#: governance queries and their SQL oracles.
SPLIT_SEED = "seed152"
TRAIN_PCT, VAL_PCT = 90, 5


def split_assignment(id_col: Column) -> Column:
    """Split label ('train' / 'val' / 'test') for an id column.

    NULL keys land in 'test' in BOTH engines: Spark's concat propagates
    NULL -> NULL bucket -> CASE falls through to the ELSE; the SQL mirror
    below uses the NULL-propagating ``||`` for the same reason (DuckDB's
    ``concat()`` SKIPS NULL args, which would silently hash a NULL key as
    the bare seed string and file it under 'train').
    """
    bucket = seeded_hash60(f"{SPLIT_SEED}:", id_col) % 100
    return (
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .when(bucket < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def sql_split(id_expr: str) -> str:
    """The DuckDB restatement of ``split_assignment`` for an id expression
    (used by the declared-query oracles — keep in lockstep, including the
    NULL-key contract: ``||`` propagates NULL like Spark's concat, where
    DuckDB's ``concat()`` would skip it)."""
    bucket = (
        f"CAST(('0x' || substr(md5('{SPLIT_SEED}:' || "
        f"CAST({id_expr} AS VARCHAR)), 1, 15)) AS BIGINT) % 100"
    )
    return (
        f"CASE WHEN {bucket} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {bucket} < {TRAIN_PCT + VAL_PCT} THEN 'val' "
        f"ELSE 'test' END"
    )
