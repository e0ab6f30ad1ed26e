"""Skew-mitigation utilities (SURVEY §2.2 preamble, 100 TB design rules).

AQE's skew-join splitting handles most cases at runtime; these helpers cover
the two patterns AQE can't fix:

- ``salted_aggregate``: a groupBy on a key with a few mega-hot values (think
  `lang='en'` over a web corpus). Two-phase: group on (key, salt) first —
  spreading each hot key over ``salt_buckets`` reducers — then combine the
  partials. Works for any algebraic aggregate (sum/count/min/max).
- ``salted_broadcast_join``: a broadcast join where the *stream* side is
  skewed is already fine (no shuffle); this helper exists to document the
  decision and keep call sites uniform.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AggSpec = Sequence[tuple[str, str, str]]  # (agg_fn, in_col, out_alias)

_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def content_salt(cols: Sequence[Column | str], salt_buckets: int) -> Column:
    """Salt in [0, salt_buckets) derived from row CONTENT, not layout.

    ``F.rand(seed)`` is deterministic only per partition *index*, so a
    seeded-rand salt silently shifts with input file layout (and costs an
    RNG call per row). A hash of the row's columns is a pure function of the
    data: same row, same salt, on any cluster at any partitioning. Pass every
    column of the row (or any superset of a unique key) so distinct rows
    under one hot key still spread across all ``salt_buckets`` reducers;
    fully identical rows share a salt, which is harmless for algebraic
    aggregates (they collapse into the same partial anyway).
    """
    return F.pmod(F.xxhash64(*cols, F.lit(0x5A17)), F.lit(salt_buckets)).cast("int")


def salted_aggregate(
    df: DataFrame, keys: list[str], aggs: AggSpec, salt_buckets: int = 32
) -> DataFrame:
    """Two-phase aggregation salted over ``salt_buckets`` partial groups.

    aggs: (fn, column, alias) with fn in {sum,count,min,max}. The partial
    phase shuffles on (keys..., salt) — hot keys fan out — and the final
    phase combines ``salt_buckets`` partial rows per key (tiny). The salt is
    a content hash of the whole row (``content_salt``): deterministic across
    partition layouts, unlike seeded ``rand``.
    """
    for fn, _, _ in aggs:
        if fn not in _PARTIAL:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = df.withColumn("__salt", content_salt(df.columns, salt_buckets))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_PARTIAL[fn](c).alias(a) for fn, c, a in aggs]
    )
    return partial.groupBy(*keys).agg(
        *[_COMBINE[fn](a).alias(a) for fn, _, a in aggs]
    )


def explode_salt(
    dim: DataFrame, fact_cols: Sequence[str], salt_buckets: int = 32
) -> tuple[DataFrame, Column]:
    """Replicate a dimension ``salt_buckets`` times for a salted shuffle join:
    fact side joins on (key, fact_salt), dim side carries every salt value.
    ``fact_cols`` names the fact side's columns (any superset of a unique key)
    from which the layout-independent fact salt is hashed.
    Returns (salted_dim, salt_col_for_fact)."""
    salted = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted, content_salt(list(fact_cols), salt_buckets)
