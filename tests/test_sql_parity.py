"""SQL entry-point parity: the engine is usable through ``spark.sql`` too.

For every declared query whose oracle SQL is dual-dialect ANSI (no
DuckDB-specific functions), running that exact SQL text through Spark SQL over
the registered table views must produce the same columns and rows as the
DataFrame-API implementation. This pins two things:

1. the SQL surface (views + ANSI queries) is a first-class entry point — a
   user can bring plain SQL to this engine;
2. the DataFrame implementations and the declared oracle semantics agree
   inside Spark itself, independently of DuckDB.

Queries excluded use DuckDB-only routines in their oracle (UNNEST-as-table,
list_*, quantile_disc, json_extract_string, epoch_us, ASOF JOIN, sha256,
one-arg encode) — their cross-engine check lives in test_oracle.py.
"""

from __future__ import annotations

import pytest

from mrcond_spark.catalog import register_views
from mrcond_spark.queries import all_queries

QUERIES = all_queries()

DUAL_DIALECT = [
    "q01_scan_project",
    "q02_filter",
    "q03_join_chain",
    "q04_left_join",
    "q05_semi_join",
    "q06_anti_join",
    "q07_full_outer",
    "q08_cross_join",
    "q09_theta_join",
    "q10_agg_tpch_q1",
    "q11_count_distinct",
    "q12_rollup",
    "q13_cube_grouping",
    "q14_grouping_sets",
    "q15_topk_per_group",
    "q16_analytic_window",
    "q17_topk",
    "q18_union",
    "q19_intersect",
    "q20_except",
    "q21_string_funcs",
    "q22_date_funcs",
    "q23_math_funcs",
    "q24_conditional",
    "q27_distinct",
    "q28_having",
    "q29_subquery",
    "q30_cte",
    "q51_applyinpandas_topk",
    "q53_grouped_agg_udf",
    "q58_range_join",
    "q59_time_rollup",
    "q64_tpch_q5_shape",
    "q65_pivot",
    "q66_unpivot",
    "q68_latest_per_key",
    "q69_map_funcs",
    "q70_fuzzy_match",
    "q71_range_frame",
    "q72_filtered_agg",
    "q77_ntile_deciles",
    "q78_distribution_windows",
    "q79_multiset_ops",
    "q80_null_group_keys",
    "q81_lateral_join",
    "q47_minhash_lsh_pairs",
    "q48_simhash_pairs",
    "q54_embedding_near_dup",
    "q90_mixture_weights",
    "q84_sequence_packing",  # WITH RECURSIVE runs in Spark 4 too
    "q49_ann_lsh",
    "q56_ann_ivf",
    "q57_mllib_minhash_pairs",
    "q74_dedup_clusters",
    "q92_ewma_features",  # recursive-CTE EWMA
    "q95_cohort_retention",
    "q99_semantic_dedup",
    "q101_salted_aggregate",
]


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)


@pytest.mark.parametrize("name", DUAL_DIALECT)
def test_sql_matches_dataframe(name, spark, sf_dir):
    q = QUERIES[name]
    via_sql = spark.sql(q.oracle)
    via_df = q.spark(spark, sf_dir)
    assert via_sql.columns == via_df.columns, f"{name}: column mismatch"
    rows_sql = sorted(map(str, (tuple(r) for r in via_sql.collect())))
    rows_df = sorted(map(str, (tuple(r) for r in via_df.collect())))
    assert rows_sql == rows_df, f"{name}: row values differ between SQL and DataFrame"
