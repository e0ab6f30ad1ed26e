"""Distributed running sum over a global order — no single-reducer window.

A naive ``SUM(x) OVER (ORDER BY k)`` (no PARTITION BY) plans a
single-partition Window: one reducer scans the entire table — the same
scale-killer shape the distributed NTILE replaced (`ntile.py`). This
operator computes the IDENTICAL running sum with every data-sized stage
distributed, for the common case where the global order can be split into
an order-aligned bucket column plus a within-bucket order:

1. caller supplies ``bucket_col`` such that the global order equals
   ``(bucket ASC, *order_cols ASC)`` — e.g. the first hex character of an
   md5 ordering key (lowercase-hex string order == numeric order, so the
   leading character IS an order-aligned 16-way split);
2. per-bucket totals are collected to the driver (bounded: n_buckets rows,
   never data-sized) and folded into cumulative offsets embedded as plan
   literals;
3. running sum = offset[bucket] + within-bucket window sum (Window
   partitioned by the bucket — parallel across buckets).

100 TB posture: TWO passes over the input lineage (the totals job and the
window job — collapse to one stored read with ``materialize=True``), one
partial-agg shuffle for the totals, one bounded collect, one
hash-partitioned window; no ``Exchange SinglePartition`` anywhere (explicitly asserted for q97 in tests/test_prefix_sum_property.py;
the corpus-wide guard in tests/test_plans.py covers the related
empty-partition-spec Window shape for every query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: bounded-collect contract: the per-bucket offset table must stay
#: driver-sized. 4096 is ~16x the documented 16–256 sweet spot — generous
#: enough for any sane order-aligned split, small enough that the literal
#: maps stay off the codegen cliff (the same cap class as
#: frontier.MAX_BUCKETS / sampling.MAX_STRATA).
MAX_BUCKETS = 4096


def bucketed_running_sum(
    df: DataFrame,
    bucket_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    materialize: bool = False,
) -> DataFrame:
    """Append ``out_col`` = SUM(value_col) over the global order
    ``(bucket_col, *order_cols)``, rows unbounded-preceding..current.

    ``order_cols`` must complete a total order within each bucket (include
    a unique tiebreak key), and ``bucket_col``'s sort order must agree with
    the global order by construction — the operator cannot check that.
    ``bucket_col`` must be NON-NULL on every row (raised as ``ValueError``):
    a NULL bucket has no defined place in the bucket-aligned global order.
    Bucket count trades parallelism against the driver-side offset table;
    16–256 is plenty (each bucket still fans out across tasks only for the
    agg — the window itself runs one task per bucket, so pick n_buckets >=
    target parallelism for the window stage). The contract is ENFORCED:
    more than ``MAX_BUCKETS`` distinct buckets raises ``ValueError`` before
    the collect can go data-sized.

    EAGER + SNAPSHOT CONTRACT: unlike most operators in this package, the
    per-bucket totals job runs HERE, at construction time (the offsets must
    become plan literals), and the returned DataFrame embeds that snapshot —
    if the input changes between construction and execution the result mixes
    two snapshots. Cost accounting: the input lineage runs twice (once for
    the totals job, once under the window job) unless ``materialize=True``,
    which localCheckpoints the input so both jobs read stored blocks —
    choose per the repo's measured recompute-vs-materialize rule (cheap
    narrow lineage like tokenize+hash: recompute; wide/expensive lineage:
    materialize).

    NULL semantics (of ``value_col``) match the global window exactly: NULL
    values contribute nothing, and a row whose whole prefix is NULL-valued
    gets NULL (SQL SUM over zero non-null inputs) — hence the per-bucket
    non-null COUNT carried alongside the sum offsets.
    """
    if materialize:
        from . import materialize_once

        df = materialize_once(df)
    # The bounded-collect contract: one row per bucket. A near-distinct
    # bucket_col would silently turn this into a data-sized driver collect
    # and a plan-bloating literal map — so the JOB ITSELF is bounded with
    # limit(cap + 1) and the overflow rejected loudly, same pattern as
    # frontier.skyline_2d / sampling.stratified_budget_sample.
    totals = (
        df.groupBy(bucket_col)
        .agg(F.sum(value_col).alias("__t"), F.count(value_col).alias("__c"))
        .limit(MAX_BUCKETS + 1)
        .collect()
    )
    if len(totals) > MAX_BUCKETS:
        raise ValueError(
            f"bucketed_running_sum: bucket_col {bucket_col!r} produced more "
            f"than {MAX_BUCKETS} buckets; coarsen it — the bucket column "
            "must be a bounded, order-aligned split of the global order "
            "(16–256 buckets is the documented sweet spot), not a "
            "near-distinct key"
        )
    if any(r[bucket_col] is None for r in totals):
        raise ValueError(
            f"bucketed_running_sum: bucket_col {bucket_col!r} contains NULLs; "
            "a NULL bucket has no defined position in the bucket-aligned "
            "global order — filter or coalesce it first"
        )
    offsets: list[tuple[object, int, int]] = []
    acc = 0
    acc_cnt = 0
    for row in sorted(totals, key=lambda r: r[bucket_col]):
        offsets.append((row[bucket_col], acc, acc_cnt))
        acc += row["__t"] or 0
        acc_cnt += row["__c"]

    if offsets:
        sum_map = F.create_map(
            *[F.lit(x) for bk, off, _ in offsets for x in (bk, off)]
        )
        cnt_map = F.create_map(
            *[F.lit(x) for bk, _, cnt in offsets for x in (bk, cnt)]
        )
        base: Column = F.coalesce(
            F.element_at(sum_map, F.col(bucket_col)), F.lit(0)
        )
        base_cnt: Column = F.coalesce(
            F.element_at(cnt_map, F.col(bucket_col)), F.lit(0)
        )
    else:
        base = F.lit(0)
        base_cnt = F.lit(0)

    w = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = base + F.coalesce(F.sum(value_col).over(w), F.lit(0))
    nonnull_so_far = base_cnt + F.count(value_col).over(w)
    return df.withColumn(
        out_col, F.when(nonnull_so_far > 0, running)  # else NULL, like SQL SUM
    )
