"""Bucketized range join: points joined to enclosing intervals (SURVEY-class
custom operator — Spark plans a raw ``p BETWEEN start AND end`` join as
BroadcastNestedLoopJoin / cartesian, which is O(|points| x |intervals|)).

Strategy: quantize the domain into fixed-width buckets. Each interval
replicates into every bucket it overlaps (``sequence`` + ``explode``, bounded
by interval_width/bucket_width + 1 copies); each point lands in exactly one
bucket. An equi-join on the bucket id then only compares co-bucketed rows,
and the original range predicate runs as a residual filter. Each true
(point, interval) pair meets exactly once — the point's bucket appears once
in the interval's bucket list — so no post-join dedup is needed.

100 TB: the shuffle key is the bucket id — pick ``bucket_width`` near the
typical interval width so replication stays ~2x and bucket population stays
balanced. Degenerate huge intervals should be split out and handled with a
broadcast (they're rare by construction in span/session data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: Column,
    *,
    on: list[str] | None = None,
    inclusive_end: bool = False,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (``<= end`` when ``inclusive_end``), optionally
    also matching on equi-keys ``on``. Point/start/end must be numeric (cast
    times to epoch seconds/days first). Returns all columns from both sides.
    """
    on = on or []
    p_bucket = F.floor(F.col(point_col) / bucket_width)
    i_first = F.floor(F.col(start_col) / bucket_width)
    i_last = F.floor(F.col(end_col) / bucket_width)

    p = points.withColumn("__bucket", p_bucket)
    i = intervals.withColumn(
        "__bucket", F.explode(F.sequence(i_first.cast("long"), i_last.cast("long")))
    )
    residual = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
        if inclusive_end
        else F.col(point_col) < F.col(end_col)
    )
    return p.join(i, on=on + ["__bucket"], how="inner").filter(residual).drop("__bucket")