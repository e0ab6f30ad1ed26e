"""As-of join (event-time nearest-prior match), SURVEY.md §2.2 B10.

Spark SQL has no native ASOF JOIN (DuckDB does — it is the oracle). The
scalable formulation here is the *union + last-ignorenulls window* trick:

    union(left tagged 1, right tagged 0)
      -> window PARTITION BY keys ORDER BY (ts, side, tiebreak)
      -> last(value, ignorenulls=True) rowsBetween(unboundedPreceding, current)
      -> keep side=1 rows

Why this beats a range join at 100 TB: a key-equi range join duplicates every
left row by its candidate window before filtering (shuffle + explode), while
the union form is ONE shuffle of |left| + |right| rows followed by a sort
within each key partition — the same cost profile as any windowed aggregate,
and AQE skew-split applies to it. No row amplification, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    *,
    strict: bool = False,
    direction: str = "backward",
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same key
    group: latest with ``right.ts <= left.ts`` (``direction='backward'``, the
    default) or earliest with ``right.ts >= left.ts`` (``'forward'``);
    ``strict`` excludes equal timestamps.

    Left rows with no match keep NULL value columns (ASOF LEFT JOIN
    semantics). ``right_tiebreak`` makes same-timestamp right rows
    deterministic (last in tiebreak order wins); pre-deduplicate the right
    side if exact determinism matters and no natural tiebreak exists.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    value_cols = value_cols or [c for c in right.columns if c not in on and c != right_ts]
    left_cols = left.columns
    clash = set(value_cols) & set(left_cols)
    if clash:
        raise ValueError(
            f"right value columns {sorted(clash)} collide with left columns; "
            "rename one side before asof_join (ambiguous output otherwise)"
        )
    right_tiebreak = right_tiebreak or []

    # Side ordering at equal timestamps decides inclusivity: for backward,
    # right rows sort before left (side 0 < 1) so <= includes them; strict
    # puts them after. Forward mirrors this under a descending ts sort.
    right_side, left_side = (0, 1) if not strict else (2, 1)

    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(_TS),
        F.lit(right_side).alias(_SIDE),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left_cols],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias(_TS),
        F.lit(left_side).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    unioned = r.unionByName(l)

    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    order: list[Column] = [ts_order, F.col(_SIDE).asc()]
    order += [F.col(c).asc_nulls_first() for c in right_tiebreak]
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    filled = unioned.select(
        "*", *[F.last(F.col(c), ignorenulls=True).over(w).alias(f"__v_{c}") for c in value_cols]
    )
    out = filled.filter(F.col(_SIDE) == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        *[F.col(f"__v_{c}").alias(c) for c in value_cols],
    )
    return out
