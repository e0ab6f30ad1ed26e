"""Behavioral tests for the governance tier (q152+) beyond the DuckDB
hash oracles: split-assignment stability under corpus growth, leakage
consistency with the split definition, tie-break determinism, and the
profiler's distinct-count exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrcond_spark.queries.governance import (
    TRAIN_PCT,
    VAL_PCT,
    split_assignment,
)


def test_split_assignment_is_stable_under_corpus_growth(spark):
    """A doc's split is a pure function of its id: assigning splits over a
    PREFIX of the corpus and over the whole corpus must agree on the
    prefix — the property that keeps eval sets frozen as data arrives."""
    full = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        split_assignment(F.col("id")).alias("split"),
    )
    prefix = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        split_assignment(F.col("id")).alias("split"),
    )
    disagree = (
        full.alias("f")
        .join(prefix.alias("p"), "doc_id")
        .filter(F.col("f.split") != F.col("p.split"))
        .count()
    )
    assert disagree == 0


def test_split_proportions_roughly_match_declared_pcts(spark):
    rows = (
        spark.range(0, 20_000)
        .select(split_assignment(F.col("id")).alias("split"))
        .groupBy("split")
        .count()
        .collect()
    )
    got = {r["split"]: r["count"] for r in rows}
    assert set(got) == {"train", "val", "test"}
    n = sum(got.values())
    # 60-bit md5 buckets: binomial noise at n=20k is ~0.7% for the 90%
    # cell and ~0.5% for the 5% cells — allow 3 sigma.
    assert abs(got["train"] / n - TRAIN_PCT / 100) < 0.02
    assert abs(got["val"] / n - VAL_PCT / 100) < 0.015
    assert abs(got["test"] / n - (100 - TRAIN_PCT - VAL_PCT) / 100) < 0.015


def test_majority_vote_tie_break_is_lexicographic(spark):
    from mrcond_spark.queries import REGISTRY

    # two labels tied at 2 votes each -> lexicographically smaller wins
    df = spark.createDataFrame(
        [(1, "view"), (1, "view"), (1, "click"), (1, "click"), (2, "buy")],
        "user_id LONG, event_type STRING",
    )
    votes = df.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    top = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    winners = {r["user_id"]: r["event_type"] for r in top}
    assert winners == {1: "click", 2: "buy"}
    assert "q155_majority_vote" in REGISTRY


def test_leakage_pairs_respect_split_definition(spark, sf_dir):
    """Every emitted leakage pair must (a) be a planted near-dup pair and
    (b) actually cross splits under the shared split_assignment."""
    from mrcond_spark.queries import REGISTRY
    from mrcond_spark.queries.llm import PLANT_OFFSET

    out = REGISTRY["q153_split_leakage"].spark(spark, sf_dir).collect()
    for r in out:
        assert r["id_b"] == r["id_a"] + PLANT_OFFSET
        assert r["split_a"] != r["split_b"]
    # recompute splits independently and compare
    ids = [(r["id_a"],) for r in out] + [(r["id_b"],) for r in out]
    if ids:
        df = spark.createDataFrame(ids, "i LONG").select(
            "i", split_assignment(F.col("i")).alias("s")
        )
        lookup = {r["i"]: r["s"] for r in df.collect()}
        for r in out:
            assert lookup[r["id_a"]] == r["split_a"]
            assert lookup[r["id_b"]] == r["split_b"]


def test_profiler_distinct_counts_are_exact(spark, sf_dir):
    from mrcond_spark.catalog import load
    from mrcond_spark.queries import REGISTRY

    out = {
        r["col_name"]: r
        for r in REGISTRY["q157_column_profiler"].spark(spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem")
    for c in ("l_quantity", "l_tax"):
        truth = li.select(c).distinct().count()
        assert out[c]["n_distinct"] == truth


def test_bpe_pairs_survive_short_documents(spark, tmp_path):
    """A 0- or 1-token document must contribute zero pairs — without the
    size gate, Spark's sequence(1, 0) yields a DESCENDING [1, 0] and
    element_at throws INVALID_ARRAY_INDEX under ANSI mode (latent crash:
    the synthetic corpus happens to contain no 1-token docs)."""
    import os

    from mrcond_spark.queries import REGISTRY

    d = os.path.join(str(tmp_path), "documents.parquet")
    spark.createDataFrame(
        [
            (0, "single", "en", "s0", 6),
            (1, "", "en", "s0", 0),
            (2, "a b a b", "en", "s0", 7),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).write.mode("overwrite").parquet(d)
    out = REGISTRY["q156_bpe_pair_stats"].spark(spark, str(tmp_path)).collect()
    got = {r["pair"]: r["cnt"] for r in out}
    assert got == {"a b": 2, "b a": 1}
