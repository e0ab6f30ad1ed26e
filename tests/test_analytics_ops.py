"""Unit tests for the round-5 analytics operators (vector / graph /
timeseries / text additions) — hand-computed expectations on tiny inputs;
the full-corpus hash checks live in test_oracle.py (q106–q112)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mrcond_spark.operators.graph import pagerank
from mrcond_spark.operators.text import pmi_collocations
from mrcond_spark.operators.timeseries import time_weighted_average
from mrcond_spark.operators.vector import embedding_centroids, quantize_embeddings


def test_pagerank_two_node_cycle(spark):
    """u<->v symmetric cycle: ranks stay uniform at 0.5 for any iterations."""
    edges = spark.createDataFrame([(1, 2, 1.0), (2, 1, 1.0)], "src int, dst int, w double")
    out = {r["node"]: r["rank"] for r in pagerank(edges, weight="w", iterations=4).collect()}
    assert out[1] == pytest.approx(0.5, abs=1e-12)
    assert out[2] == pytest.approx(0.5, abs=1e-12)


def test_pagerank_star_matches_hand_rollout(spark):
    """2 spokes -> hub, hub dangling (leak formulation). One iteration from
    uniform r=1/3: hub = 0.15/3 + 0.85*(1/3 + 1/3); spokes = 0.15/3."""
    edges = spark.createDataFrame([(1, 3), (2, 3)], "src int, dst int")
    out = {r["node"]: r["rank"] for r in pagerank(edges, iterations=1).collect()}
    t = (1.0 - 0.85) / 3
    assert out[3] == pytest.approx(t + 0.85 * (2 / 3), abs=1e-12)
    assert out[1] == pytest.approx(t, abs=1e-12)
    assert out[2] == pytest.approx(t, abs=1e-12)


def test_pagerank_weighted_split(spark):
    """Out-weights split contributions 3:1; ranks must follow the shares."""
    edges = spark.createDataFrame(
        [(1, 2, 3.0), (1, 3, 1.0)], "src int, dst int, w double"
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, weight="w", iterations=1).collect()}
    t = (1.0 - 0.85) / 3
    assert out[2] == pytest.approx(t + 0.85 * (1 / 3) * 0.75, abs=1e-12)
    assert out[3] == pytest.approx(t + 0.85 * (1 / 3) * 0.25, abs=1e-12)


def test_twap_hand_case(spark):
    """Values 10 (held 2 s), 20 (held 6 s) -> TWAP (10*2+20*6)/8 = 17.5;
    the last observation and single-event keys contribute no interval."""
    rows = [
        (1, "2024-01-01 00:00:00", 10.0, 1),
        (1, "2024-01-01 00:00:02", 20.0, 2),
        (1, "2024-01-01 00:00:08", 99.0, 3),
        (2, "2024-01-01 00:00:00", 7.0, 4),  # single event: no output row
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string, value double, event_id int").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value", "event_id"
    )
    out = {
        r["user_id"]: (r["n_intervals"], r["twap"])
        for r in time_weighted_average(df, "user_id", "ts", "value", "event_id").collect()
    }
    assert out[1] == (2, pytest.approx(17.5, abs=1e-12))
    assert 2 not in out


def test_quantize_constant_vector_is_lossless(spark):
    df = spark.createDataFrame([(1, [2.5, 2.5, 2.5])], "vec_id int, embedding array<float>")
    row = quantize_embeddings(df).collect()[0]
    assert row["q_rmse"] == 0.0
    assert row["q_max_abs_err"] == 0.0


def test_quantize_two_level_vector_exact(spark):
    """[0, 255] quantizes exactly (scale 1, every element on a level)."""
    df = spark.createDataFrame([(1, [0.0, 255.0])], "vec_id int, embedding array<float>")
    row = quantize_embeddings(df).collect()[0]
    assert row["q_rmse"] == pytest.approx(0.0, abs=1e-12)
    assert row["q_max_abs_err"] == pytest.approx(0.0, abs=1e-12)


def test_quantize_error_bounded_by_half_step(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.3, 0.61, 1.0])], "vec_id int, embedding array<float>"
    )
    row = quantize_embeddings(df, levels=10).collect()[0]
    half_step = (1.0 / 10) / 2
    assert 0.0 < row["q_max_abs_err"] <= half_step + 1e-9
    assert 0.0 < row["q_rmse"] <= row["q_max_abs_err"]


def test_embedding_centroids_hand_case(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 3.0]), (0, [3.0, 5.0]), (1, [10.0, 10.0])],
        "label int, embedding array<float>",
    )
    out = {r["label"]: r for r in embedding_centroids(df).collect()}
    assert out[0]["n_vecs"] == 2
    assert [float(x) for x in out[0]["centroid"]] == pytest.approx([2.0, 4.0])
    assert [float(x) for x in out[1]["centroid"]] == pytest.approx([10.0, 10.0])


def test_pmi_prefers_exclusive_pair(spark):
    """'aa bb' always adjacent and exclusive -> highest PMI; 'cc' pairs with
    many different partners -> lower PMI for any one of them."""
    docs = [(i, "aa bb " + f"cc w{i % 5} " * 3) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = pmi_collocations(df, min_count=5).collect()
    by_pair = {(r["w1"], r["w2"]): r["pmi"] for r in out}
    assert ("aa", "bb") in by_pair
    top = max(by_pair, key=by_pair.get)
    assert top == ("aa", "bb")
    # PMI value sanity: recompute ln(p(w1,w2)/(p(w1)p(w2))) from exact
    # Python-side counts with the same whitespace tokenization
    toks = [t for _, text in docs for t in text.lower().split()]
    pair_list = [
        p
        for _, text in docs
        for p in zip(text.lower().split(), text.lower().split()[1:])
    ]
    n_toks, n_pairs = len(toks), len(pair_list)
    c_pair = pair_list.count(("aa", "bb"))
    c_aa, c_bb = toks.count("aa"), toks.count("bb")
    expect = math.log((c_pair * n_toks * n_toks) / (n_pairs * c_aa * c_bb))
    assert by_pair[("aa", "bb")] == pytest.approx(expect, rel=1e-9)


def test_pmi_short_docs_yield_no_pairs(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "   ")], "doc_id int, text string"
    )
    assert pmi_collocations(df, min_count=1).count() == 0


def test_cusum_hand_case(spark):
    """drift [1, -2, 2, 1] -> S = [1, 0, 2, 3] (clamped at zero)."""
    from mrcond_spark.operators.timeseries import cusum

    rows = [(1, i + 1, d) for i, d in enumerate([1.0, -2.0, 2.0, 1.0])]
    df = spark.createDataFrame(rows, "k int, seq int, drift double")
    out = cusum(df, key_col="k", order_cols=("seq",), drift_col="drift")
    got = [r["cusum"] for r in out.orderBy("seq").collect()]
    assert got == [1.0, 0.0, 2.0, 3.0]


def test_cusum_matches_reference_loop(spark):
    """Randomized parity with the plain Python recurrence, per key."""
    import random

    rng = random.Random(5)
    rows = [(k, i, rng.uniform(-2, 2)) for k in range(3) for i in range(50)]
    df = spark.createDataFrame(rows, "k int, seq int, drift double")
    from mrcond_spark.operators.timeseries import cusum

    got = {
        (r["k"], r["seq"]): r["cusum"]
        for r in cusum(df, key_col="k", order_cols=("seq",), drift_col="drift").collect()
    }
    for k in range(3):
        s = 0.0
        for i in range(50):
            d = next(v for kk, ii, v in rows if kk == k and ii == i)
            s = max(0.0, s + d)
            assert got[(k, i)] == s, (k, i)
