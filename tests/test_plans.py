"""Physical-plan assertions: the 100 TB posture, checked per query.

These tests fail if a future change silently drops predicate pushdown, column
pruning, or dimension broadcasts — the three properties that decide whether
the same plan survives a 1000-executor / 100 TB scale-up.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mrcond_spark import plans
from mrcond_spark.catalog import load
from mrcond_spark.queries import all_queries

QUERIES = all_queries()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = QUERIES["q02_filter"].spark(spark, sf_dir)
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_returnflag" in pushed, f"returnflag filter not pushed: {pushed}"
    assert "l_quantity" in pushed
    assert "l_shipdate" in pushed


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = QUERIES["q02_filter"].spark(spark, sf_dir)
    schemas = plans.read_schema_columns(df)
    assert schemas, "no parquet scan found"
    # scan must not read the other 8 lineitem columns
    for cols in schemas:
        assert cols <= {"l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"}


def test_dimension_joins_broadcast(spark, sf_dir):
    df = QUERIES["q03_join_chain"].spark(spark, sf_dir)
    assert plans.broadcast_join_count(df) >= 2  # nation AND region
    assert not plans.uses_sort_merge_join(df)


def test_q10_single_shuffle_aggregate(spark, sf_dir):
    """TPC-H Q1 shape: partial agg -> ONE hash exchange -> final agg (+ sort)."""
    df = QUERIES["q10_agg_tpch_q1"].spark(spark, sf_dir)
    # one exchange for the groupBy, one range exchange for the final orderBy
    assert plans.shuffle_exchange_count(df) <= 2


def test_asof_join_is_single_shuffle(spark, sf_dir):
    """The union+window as-of join must not blow up into a join-explode plan:
    at most the union inputs' aggregation exchanges + one window partition
    exchange — and NO nested-loop or cartesian operator."""
    df = QUERIES["q31_asof_join"].spark(spark, sf_dir)
    text = plans.explain_str(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text


def test_range_join_avoids_nested_loop(spark, sf_dir):
    """The bucketized range join must plan as a hash/sort-merge equi-join on
    bucket ids — never BroadcastNestedLoopJoin or a cartesian product."""
    text = plans.explain_str(QUERIES["q58_range_join"].spark(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text


def test_whole_stage_codegen_covers_scalar_packs(spark, sf_dir):
    """AQE defers codegen insertion to execution; disable it here so the
    static plan exposes the WholeStageCodegen subtrees for assertion."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("q21_string_funcs", "q23_math_funcs", "q24_conditional"):
            df = QUERIES[name].spark(spark, sf_dir)
            assert plans.codegen_stage_count(df) >= 1, f"{name} fell out of codegen"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_semi_anti_join_no_row_amplification(spark, sf_dir):
    for name in ("q05_semi_join", "q06_anti_join"):
        text = plans.explain_str(QUERIES[name].spark(spark, sf_dir))
        assert "LeftSemi" in text or "LeftAnti" in text, f"{name}: {text[:200]}"


def test_partition_count_respects_aqe_coalesce(spark, sf_dir):
    """AQE should coalesce the tiny post-shuffle partitions at test scale."""
    df = load(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(F.count("*").alias("c"))
    assert df.rdd.getNumPartitions() <= 8


def test_latest_per_key_uses_window_group_limit(spark, sf_dir):
    """q68's rn=1 filter must push a partial top-1 per key BELOW the shuffle
    (WindowGroupLimit before the exchange) — at 100 TB this is the difference
    between shuffling one row per key and shuffling the whole table."""
    text = plans.explain_str(QUERIES["q68_latest_per_key"].spark(spark, sf_dir))
    assert "WindowGroupLimit" in text


def test_ntile_no_single_partition_window(spark, sf_dir):
    """q77's decile bucketing must never plan a single-partition Window sort
    (the round-1 scale-killer): the distributed NTILE keeps every exchange
    hash- or range-partitioned."""
    text = plans.explain_str(QUERIES["q77_ntile_deciles"].spark(spark, sf_dir))
    assert "Exchange SinglePartition" not in text
    assert "ntile(" not in text  # no built-in global-window NTILE anywhere


def test_pivot_is_single_shuffle(spark, sf_dir):
    """q65's conditional-aggregation pivot: one hash exchange for the groupBy
    plus one range exchange for the ORDER BY — no (group, pivot-key) double
    aggregation."""
    df = QUERIES["q65_pivot"].spark(spark, sf_dir)
    assert plans.shuffle_exchange_count(df) <= 2


# --- corpus-wide plan guard ------------------------------------------------

# queries whose SEMANTICS are a cross/theta join (plan legitimately contains
# a cartesian or nested-loop operator on an intentionally bounded side)
_NONEQUI_OK = {
    "q08_cross_join",  # B8 cartesian cardinality, 5x25 rows
    "q09_theta_join",  # B9 non-equi predicate join
    "q41_cosine_topk",  # pinned-query broadcast crossJoin (|Q| driver-bounded)
    "q86_tfidf_terms",  # 1-row corpus-size scalar broadcast-crossed into tf
    "q90_mixture_weights",  # 1-row (total, k) scalar broadcast-crossed into per-source aggs
    "q93_mixture_rebalance",  # same 1-row scalar cross into the per-source prob table
    "q108_pmi_collocations",  # two 1-row corpus-total scalars broadcast-crossed into the pair table
    "q118_importance_weights",  # 1-row (raw,target) totals broadcast-crossed into the 64-bucket table
    "q125_bm25_topk",  # 1-row (N, avgdl) corpus scalars broadcast-crossed into idf + scoring
    "q127_embedding_covariance",  # 1-row vector-count scalar broadcast-crossed into the d^2 cov table
    "q141_token_kl_drift",  # 1-row (n_en, n_rest, v) totals broadcast-crossed into the vocab table
    "q143_zorder_layout",  # 1-row min/max bounds broadcast-crossed into the bucketizer
    "q158_source_epochs",  # 1-row mixture normalizer broadcast-crossed into the checkpointed per-source frame
    "q159_bradley_terry",  # 1-row strength normalizer broadcast-crossed into the checkpointed |brands|-row frame
    "q160_chi_square",  # 1-row (n, axes) totals broadcast-crossed into the checkpointed contingency cells
    "q161_benford_audit",  # 1-row digit total broadcast-crossed into the checkpointed 9-row frame
    "q162_duplication_profile",  # 1-row corpus total broadcast-crossed into the checkpointed size histogram
    "q167_key_skew_audit",  # two 1-row scalar frames (top-k shares, NULL-key count) broadcast-crossed into the 1-row Gini aggregate
    "q176_tpch_q22_dormant",  # 1-row (sum, n) balance scalar broadcast-crossed into the segment pool
    "q180_edit_distance_join",  # short-string brute-force leg: intentional non-equi join over an alphabet-bounded slice
}


def test_no_accidental_cartesian_anywhere(spark, sf_dir):
    """Every declared query except the intentional non-equi set must plan
    without CartesianProduct / BroadcastNestedLoopJoin. Guards against a
    future edit silently dropping a join condition — at 100 TB an accidental
    cartesian is not 'slow', it's an outage."""
    offenders = []
    for name, q in sorted(QUERIES.items()):
        if name in _NONEQUI_OK:
            continue
        text = plans.explain_str(q.spark(spark, sf_dir))
        if "CartesianProduct" in text or "BroadcastNestedLoopJoin" in text:
            offenders.append(name)
    assert not offenders, f"unexpected cartesian/BNLJ plans: {offenders}"


def _unpartitioned_window_lines(text: str) -> list[str]:
    """Lines whose windowspecdefinition carries NO partition column.

    Two renderings exist and both must be caught: the bracket form
    ``Window [funcs], [partSpec], [orderSpec]`` (empty part spec shows as
    ``], [], [``) and the inline form where the spec appears INSIDE the
    function list as ``windowspecdefinition(part..., order ASC..., frame)``
    — with no partition AND no order it collapses to
    ``windowspecdefinition(specifiedwindowframe(...))``, which the bracket
    regex alone misses (round-6 lesson: ``partitionBy(lit(1))``
    constant-folds to exactly this shape). Partition columns are the spec
    args that are neither ASC/DESC order entries nor the frame."""
    import re

    offenders = []
    for line in text.splitlines():
        s = line.strip()
        if "Window" not in s and not s.startswith("WindowGroupLimit"):
            continue
        if re.search(r"\], \[\], \[", s):
            offenders.append(s[:120])
            continue
        for m in re.finditer(r"windowspecdefinition\(", s):
            # take the args up to the frame spec; tolerate nested parens
            tail = s[m.end():]
            head = tail.split("specifiedwindowframe", 1)[0]
            args = [a.strip() for a in head.split(",") if a.strip()]
            part_cols = [
                a for a in args if " ASC" not in a and " DESC" not in a
            ]
            if not part_cols:
                offenders.append(s[:120])
                break
    return offenders


def test_no_unpartitioned_window_anywhere(spark, sf_dir):
    """No declared query may plan a Window with an empty partition spec: an
    unpartitioned window funnels the whole input through ONE task — the
    single-reducer shape that killed the original global-NTILE plan (fixed
    round 2 with percentile-cutpoint bucketing). Global ORDER BYs are fine
    (range-partitioned sort, fully parallel) — this guards window FUNCTIONS
    specifically, in BOTH physical renderings (see helper)."""
    offenders = []
    for name, q in sorted(QUERIES.items()):
        text = q.spark(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        for line in _unpartitioned_window_lines(text):
            offenders.append((name, line[:100]))
    assert not offenders, f"single-reducer window plans: {offenders}"


def test_unpartitioned_window_guard_catches_constant_fold(spark):
    """The guard helper must flag the partitionBy(lit) constant-fold shape
    (no partition, no order) AND the classic global ORDER BY window, and
    must NOT flag a properly key-partitioned window."""
    from pyspark.sql.window import Window

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )
    folded = df.withColumn(
        "t", F.sum("id").over(Window.partitionBy(F.lit(1)))
    )
    global_order = df.withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    )
    keyed = df.withColumn(
        "t", F.sum("id").over(Window.partitionBy("k").orderBy("id"))
    )
    plan = lambda d: d._jdf.queryExecution().executedPlan().toString()  # noqa: E731
    assert _unpartitioned_window_lines(plan(folded))
    assert _unpartitioned_window_lines(plan(global_order))
    assert not _unpartitioned_window_lines(plan(keyed))


#: sliding RANGE frames whose buffer is TIME-bounded, so the per-move
#: re-aggregation stays cheap even on a hot key (q71's 1-hour frame held
#: ~420-row buffers on the .skew hot user — 11.4 s measured). q147's 7-day
#: frame was NOT bounded this way (frame population grows with key hotness)
#: and was decomposed into running aggregates — PERF.md skew sweep finding 3.
_SLIDING_RANGE_OK = {"q71_range_frame"}


def _quadratic_frame_lines(text: str) -> list[tuple[str, str]]:
    """(kind, frame-text) for window frames Spark cannot evaluate
    incrementally: ``following`` = any frame reaching unboundedfollowing
    from a moving lower bound (whole remaining partition re-aggregated per
    row — O(n^2) per key); ``sliding-range`` = a RangeFrame with a bounded
    lower bound (buffer re-aggregated on every bound move — O(n*w))."""
    import re

    offenders = []
    for m in re.finditer(
        r"specifiedwindowframe\((\w+),\s*([^,]+?),\s*([^)]+?\)?)\)", text
    ):
        ftype, lo, hi = m.group(1), m.group(2).strip(), m.group(3).strip()
        if "unboundedfollowing" in hi and "unboundedpreceding" not in lo:
            offenders.append(("following", m.group(0)[:90]))
        elif (
            ftype == "RangeFrame"
            and "unboundedpreceding" not in lo
            and "currentrow" not in lo
        ):
            offenders.append(("sliding-range", m.group(0)[:90]))
    return offenders


def test_no_quadratic_window_frames_anywhere(spark, sf_dir):
    """Two window-frame shapes are non-incremental in Spark and turn hot
    keys into stragglers (found by the .skew sweep, PERF.md round 11 —
    both invisible on uniform keys, hours on a key owning 30% of the
    data): a frame reaching unboundedFollowing from a moving bound
    re-aggregates the whole remaining partition per row (q126, O(n^2)),
    and a sliding RANGE frame re-aggregates its buffer on every bound
    move (q147, O(n*w) with w growing with key hotness). Neither may
    appear in any declared query's executed plan; sliding RANGE frames
    only on the time-bounded allowlist."""
    offenders = []
    for name, q in sorted(QUERIES.items()):
        text = q.spark(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        for kind, line in _quadratic_frame_lines(text):
            if kind == "sliding-range" and name in _SLIDING_RANGE_OK:
                continue
            offenders.append((name, kind, line))
    assert not offenders, f"non-incremental window frames: {offenders}"


def test_quadratic_frame_guard_catches_both_shapes(spark):
    """The helper must flag a (1, unboundedFollowing) frame and a bounded
    RANGE frame, and must NOT flag running (unboundedPreceding) frames,
    whole-partition frames, or small sliding ROWS frames."""
    from pyspark.sql.window import Window

    df = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("k"))
    plan = lambda d: d._jdf.queryExecution().executedPlan().toString()  # noqa: E731
    wf = Window.partitionBy("k").orderBy("id")
    following = df.withColumn(
        "t", F.sum("id").over(wf.rowsBetween(1, Window.unboundedFollowing))
    )
    sliding_range = df.withColumn(
        "t", F.sum("id").over(wf.rangeBetween(-10, Window.currentRow))
    )
    running = df.withColumn(
        "t",
        F.sum("id").over(
            wf.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    whole = df.withColumn(
        "t",
        F.sum("id").over(
            wf.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    sliding_rows = df.withColumn(
        "t", F.sum("id").over(wf.rowsBetween(-2, Window.currentRow))
    )
    assert any(k == "following" for k, _ in _quadratic_frame_lines(plan(following)))
    assert any(
        k == "sliding-range" for k, _ in _quadratic_frame_lines(plan(sliding_range))
    )
    assert not _quadratic_frame_lines(plan(running))
    assert not _quadratic_frame_lines(plan(whole))
    assert not _quadratic_frame_lines(plan(sliding_rows))


def test_scale_report_shape(spark, sf_dir):
    """scale_report gives a correct one-call diagnostic on a known plan."""
    rep = plans.scale_report(QUERIES["q02_filter"].spark(spark, sf_dir))
    assert rep["cartesian"] is False
    assert any("l_returnflag" in f for f in rep["pushed_filters"])
    assert rep["scan_columns"] and set(rep["scan_columns"][0]) <= {
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"
    }
    rep3 = plans.scale_report(QUERIES["q03_join_chain"].spark(spark, sf_dir))
    assert rep3["broadcasts"] >= 2


def test_analytics_moments_single_shuffle_and_pruned(spark, sf_dir):
    """q106: all five co-moment aggregates fold into ONE partial->final hash
    aggregate (single data shuffle + the ORDER BY range exchange), and the
    scan reads only the three referenced columns."""
    df = QUERIES["q106_stats_moments"].spark(spark, sf_dir)
    assert plans.shuffle_exchange_count(df) <= 2
    (cols,) = plans.read_schema_columns(df)
    assert cols == {"l_returnflag", "l_quantity", "l_extendedprice"}


def test_quantize_is_narrow(spark, sf_dir):
    """q111: the quantization audit is pure per-row array work — the ONLY
    exchange in the plan is the final ORDER BY's range partitioning."""
    df = QUERIES["q111_vector_quantize"].spark(spark, sf_dir)
    assert plans.shuffle_exchange_count(df) == 1  # rangepartitioning for sort
    text = plans.explain_str(df, mode="simple")
    assert "hashpartitioning" not in text


def test_twap_agg_reuses_window_partitioning(spark, sf_dir):
    """q110: the lead window shuffles on user_id once; the downstream hash
    aggregate keys on the same column so it must NOT re-exchange (window
    shuffle + final ORDER BY only)."""
    df = QUERIES["q110_twap"].spark(spark, sf_dir)
    assert plans.shuffle_exchange_count(df) <= 2


def test_zscore_stats_join_broadcasts(spark, sf_dir):
    """q115: the |event_types|-row stats table must ride a broadcast, never
    shuffle the full events table for the z pass."""
    df = QUERIES["q115_zscore_outliers"].spark(spark, sf_dir)
    assert plans.broadcast_join_count(df) >= 1
    assert not plans.uses_sort_merge_join(df)


def test_histogram_scan_prunes_to_one_column(spark, sf_dir):
    """q109 projects only c_acctbal from the customer scan."""
    df = QUERIES["q109_acctbal_histogram"].spark(spark, sf_dir)
    (cols,) = plans.read_schema_columns(df)
    assert cols == {"c_acctbal"}


def test_salted_join_shuffles_on_salted_key(spark, sf_dir):
    """q116: the join must be a SHUFFLED join keyed on (event_type, salt) —
    a broadcast would silently bypass the salt fan-out the query exists to
    exercise."""
    df = QUERIES["q116_salted_join"].spark(spark, sf_dir)
    text = plans.explain_str(df, mode="simple")
    assert "ShuffledHashJoin" in text or "SortMergeJoin" in text
    import re

    assert re.search(r"hashpartitioning\(event_type\S*, __salt", text), text[:400]


def test_tpch_q5_fact_side_never_broadcast(spark, sf_dir):
    """TPC-H Q5 regression guard (q64 AND q146): the lineitem fact table
    must never be a broadcast build side. Both queries were originally
    declared dims-first and Spark's small-SF size estimates DID broadcast
    the whole fact scan — a plan that cannot exist at 100 TB (measured
    5.2 s vs 1.0 s at sf0.1 for q146); the fact-first declaration keeps
    every build side a dimension. In the formatted plan, a broadcast of
    lineitem would show a BroadcastExchange node whose Input carries
    lineitem-only columns."""
    import re

    for name in ("q64_tpch_q5_shape", "q146_tpch_q5"):
        text = plans.explain_str(QUERIES[name].spark(spark, sf_dir))
        for m in re.finditer(
            r"\(\d+\) BroadcastExchange\nInput \[\d+\]: \[([^\]]*)\]", text
        ):
            cols = m.group(1)
            assert "l_extendedprice" not in cols and "l_orderkey" not in cols, (
                f"{name}: lineitem columns inside a BroadcastExchange build "
                f"side: {cols}"
            )
        assert "BroadcastHashJoin" in text  # the dims do broadcast


def test_q180_value_universe_keeps_keyed_repartition(spark, sf_dir):
    """Round-10 pin (commit 028c46f / PERF.md sf1 finding): the edit-join
    VALUE universe must keep its explicit keyed repartition. AQE coalesces
    the small groupBy exchange to ONE partition at bench scale, the
    downstream localCheckpoint FREEZES that layout, and the whole candidate
    pipeline then runs single-threaded (22 s vs ~4 s for q180 at sf0.1).
    Assert the MATERIALIZED layout — plan text can't see through the
    checkpoint — on both fronts: the optimized plan carries the AQE-exempt
    user repartition, and the checkpointed RDD actually has cluster-width
    partitions, not AQE's coalesced one."""
    from mrcond_spark.operators.editsim import _value_universe
    from mrcond_spark.operators import materialize_once

    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.coalesce("text", F.lit("")).alias("s")
    )
    vals = _value_universe(docs)
    # the user repartition survives optimization (a numbered user
    # RepartitionByExpression is AQE-coalesce-exempt; plain
    # ENSURE_REQUIREMENTS exchanges are not)
    optimized = plans.explain_str(vals, "extended")
    assert "RepartitionByExpression" in optimized, (
        "q180's value universe lost its explicit keyed repartition — AQE "
        f"will coalesce the layout to 1 partition:\n{optimized[-2000:]}"
    )
    # and the frozen (checkpointed) layout is cluster-width
    frozen = materialize_once(vals, eager=True)
    n = frozen.rdd.getNumPartitions()
    expect = spark.sparkContext.defaultParallelism
    assert n == expect, f"value universe frozen at {n} partitions, want {expect}"


def test_q139_candidate_join_keeps_keyed_repartition(spark, sf_dir):
    """Round-11 sf1 finding (the q180 hazard in a second site): q139's
    within-block self-join stage is AQE-coalesced by BYTES (~60 MB of
    candidate heads -> 2 partitions) while its true cost is the per-row
    levenshtein — the verify leg ran near-serial at sf1 (21 s on 2 cores).
    The fix is a keyed user repartition both join inputs derive from; this
    pins it in the optimized plan so the layout cannot silently coalesce
    back."""
    df = QUERIES["q139_edit_blocking_pairs"].spark(spark, sf_dir)
    optimized = plans.explain_str(df, "extended")
    assert "RepartitionByExpression" in optimized, (
        "q139 lost its keyed candidate repartition — AQE will run the "
        "levenshtein verify leg on a bytes-coalesced (near-serial) stage"
    )


def test_q180_ranked_grams_keep_keyed_repartition(spark, sf_dir):
    """Round-11 finding (the q180 hazard at a THIRD site, this time inside
    q180 itself): the frequency-ranked gram frame is lazily checkpointed
    after its byte-small groupBy exchange (~160 KiB at sf0.1), which AQE
    coalesces to ONE partition — the frozen layout then serialized the
    prefix explode, the ~4.9M-pair candidate self-join and the distinct's
    56 MiB shuffle write onto one core (observed max/median task write
    ratio ~170,000x; 4.76 -> 2.74 s interleaved min-of-4 after the fix).
    Assert both fronts, like the value-universe pin above: the AQE-exempt
    user repartition in the optimized plan, and the frozen checkpoint
    layout at cluster width."""
    from mrcond_spark.operators.editsim import _ranked_grams, _value_universe

    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.coalesce("text", F.lit("")).alias("s")
    )
    vals = _value_universe(docs)
    ranked_plan = _ranked_grams(vals, q=2)
    # the helper returns the LAZY checkpoint (plan already truncated), so
    # assert the frozen layout directly: a checkpoint freezes whatever
    # partitioning its input had at materialization time
    n = ranked_plan.rdd.getNumPartitions()
    expect = spark.sparkContext.defaultParallelism
    assert n == expect, f"ranked gram frame frozen at {n} partitions, want {expect}"


def test_setsim_width_pin_lives_at_the_thin_ranked_exchange(spark, sf_dir):
    """Round-12 layout (supersedes the r11 verify-leg repartitions): the
    r11 fix pinned verify width with thin-pair repartitions on id_a/id_b
    around the verify joins, but the sf1 plan audit showed AQE turns both
    verify joins into BROADCASTS at scale, where the mid-chain
    repartition(id_b) ships candidates WITH the attached toks_a arrays —
    33.8 GiB of exchange data at sf1 for a join with no distribution
    requirement. The width pin now lives at the thin ranked exchange: one
    AQE-exempt keyed repartition(n, "id") that REPLACES the groupBy(id)
    assembly exchange (same bytes — collect_list partials don't shrink
    volume) and whose hash(id) == hash(id_a) layout flows through prefix
    posting, the candidate join's streamed side, the pair dedup (grouping
    keys ⊇ {id}), and both broadcast verify joins. Pin: exactly ONE keyed
    user repartition in the optimized plan (two would mean the fat
    thin-pair pins came back), surviving as an AQE-exempt
    REPARTITION_BY_NUM shuffle in the physical plan, and NO exchange of
    any kind downstream of the pair dedup (the fat-exchange regression
    this round removed)."""
    for name in ("q123_setsim_join", "q144_containment_join"):
        df = QUERIES[name].spark(spark, sf_dir)
        extended = plans.explain_str(df, "extended")
        physical = extended.split("== Physical Plan ==")[1]
        # (1) presence: the thin width pin survives EnsureRequirements as an
        # AQE-exempt REPARTITION_BY_NUM shuffle. The static plan prints the
        # shared ranked subtree once per candidate-join side (runtime
        # exchange reuse collapses them — the executed plan reads ONE
        # exchange twice), so the count is per-reference, not per-exchange.
        n_phys = physical.count("REPARTITION_BY_NUM")
        assert n_phys >= 1, (
            f"{name}: the thin ranked width pin is gone (no "
            "REPARTITION_BY_NUM in the physical plan) — AQE byte-coalesces "
            "the assembly exchange and the dedup/verify pipeline runs "
            "near-serial"
        )
        # (2) absence: NO hash shuffle downstream of the pair dedup. The
        # tree prints root-first, so everything before the first dedup
        # aggregate line is downstream of it; the r11 layout put two
        # thin-pair repartitions there, and at sf1 the second one shipped
        # candidates WITH attached token arrays (33.8 GiB) into a broadcast
        # join with no distribution requirement. Broadcast exchanges and
        # the final orderBy's range exchange are fine; hash shuffles are
        # the regression.
        dedup_at = physical.find("HashAggregate(keys=[id_a")
        assert dedup_at > 0, f"{name}: pair-dedup aggregate not found in plan"
        downstream = physical[:dedup_at]
        n_down = downstream.count("Exchange hashpartitioning")
        assert n_down == 0, (
            f"{name}: {n_down} hash exchange(s) sit downstream of the pair "
            "dedup — the verify pipeline no longer inherits the pinned "
            "thin layout (fat-exchange regression)"
        )
