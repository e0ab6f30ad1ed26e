"""Unit tests for the round-5 retrieval/vector additions: prefix-filtered
set-similarity join (operators/setsim.py), numpy gram matrix and power
iteration (operators/vector.py). Full-corpus hash checks live in
test_oracle.py (q123–q128)."""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from mrcond_spark.operators.setsim import prefix_setsim_join
from mrcond_spark.operators.vector import gram_matrix, top_principal_component


def brute_force_pairs(sets: dict[int, set], t_num: int, t_den: int):
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and t_den * inter >= t_num * union:
            out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


@pytest.mark.parametrize("t_num,t_den", [(1, 2), (3, 4), (9, 10)])
def test_setsim_matches_brute_force(spark, t_num, t_den):
    """Randomized recall/precision check: the prefix-filtered join must
    return EXACTLY the brute-force pair set at the threshold — the prefix
    theorem promises recall 1, the verify stage precision 1."""
    rng = random.Random(42)
    vocab = [f"w{k}" for k in range(30)]
    sets = {}
    for i in range(40):
        base = rng.sample(vocab, rng.randint(1, 12))
        sets[i] = set(base)
        # plant mutated near-copies so every threshold tier has true pairs
        if i % 4 == 0:
            mutated = set(base)
            if len(mutated) > 1 and rng.random() < 0.7:
                mutated.pop()
            sets[1000 + i] = mutated
    df = spark.createDataFrame(
        [(k, sorted(v)) for k, v in sets.items()], "id long, toks array<string>"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["sz_a"], r["sz_b"])
        for r in prefix_setsim_join(df, "id", "toks", t_num, t_den).collect()
    }
    assert got == brute_force_pairs(sets, t_num, t_den)


def test_setsim_empty_set_rows_are_safe(spark):
    """Zero-element sets produce no prefix rows and no pairs (never a
    divide-by-zero or a negative slice length)."""
    df = spark.createDataFrame(
        [(1, []), (2, ["a"]), (3, ["a"])], "id long, toks array<string>"
    )
    got = {(r["id_a"], r["id_b"]) for r in prefix_setsim_join(df).collect()}
    assert got == {(2, 3)}


def test_gram_matrix_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(50, 6))
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)], "vec_id long, embedding array<double>"
    )
    out = {(r["i"], r["j"]): r["cov"] for r in gram_matrix(df).collect()}
    expected = np.cov(x, rowvar=False, bias=True)
    for (i, j), v in out.items():
        assert v == pytest.approx(expected[i, j], abs=1e-9)
    assert len(out) == 6 * 7 // 2


def test_gram_matrix_uncentered_is_xtx(spark):
    x = np.arange(12, dtype=float).reshape(4, 3)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)], "vec_id long, embedding array<double>"
    )
    out = {(r["i"], r["j"]): r["cov"] for r in gram_matrix(df, centered=False).collect()}
    g = x.T @ x
    for (i, j), v in out.items():
        assert v == pytest.approx(g[i, j], abs=1e-9)


def test_top_principal_component_matches_eigh(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(200, 5)) @ np.diag([5.0, 2.0, 1.0, 0.5, 0.1])
    cov = np.cov(x, rowvar=False, bias=True)
    iu, ju = np.triu_indices(5)
    df = spark.createDataFrame(
        [(int(i), int(j), float(cov[i, j])) for i, j in zip(iu, ju)],
        "i int, j int, cov double",
    )
    ev, vec = top_principal_component(df)
    w, v = np.linalg.eigh(cov)
    assert ev == pytest.approx(w[-1], rel=1e-9)
    lead = v[:, -1]
    if lead[np.argmax(np.abs(lead))] < 0:
        lead = -lead
    assert np.allclose(vec, lead, atol=1e-8)


def brute_force_containment(sets: dict[int, set], t_num: int, t_den: int):
    out = {}
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            inter = len(sets[a] & sets[b])
            if t_den * inter >= t_num * len(sets[a]):
                out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


@pytest.mark.parametrize("t_num,t_den", [(1, 2), (3, 4), (1, 1)])
def test_containment_matches_brute_force(spark, t_num, t_den):
    """The containment-form prefix join must return EXACTLY the brute-force
    directed pair set: recall 1 by the containment prefix theorem (A's
    suffix is too short to hold the whole overlap), precision 1 from the
    exact verify. Planted subsets guarantee true pairs at every tier."""
    from mrcond_spark.operators.setsim import prefix_containment_join

    rng = random.Random(7)
    vocab = [f"w{k}" for k in range(30)]
    sets = {}
    for i in range(30):
        base = rng.sample(vocab, rng.randint(1, 12))
        sets[i] = set(base)
        if i % 3 == 0 and len(base) > 2:
            # strict subset: containment(subset -> superset) == 1.0
            sets[1000 + i] = set(rng.sample(base, len(base) // 2))
    df = spark.createDataFrame(
        [(k, sorted(v)) for k, v in sets.items()], "id long, toks array<string>"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["sz_a"], r["sz_b"])
        for r in prefix_containment_join(df, "id", "toks", t_num, t_den).collect()
    }
    assert got == brute_force_containment(sets, t_num, t_den)


# --- exact edit-distance join (operators/editsim.py) ------------------------


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_edit_pairs(strs: dict[int, str], k: int):
    return {
        (a, b): _lev(strs[a], strs[b])
        for a, b in itertools.combinations(sorted(strs), 2)
        if _lev(strs[a], strs[b]) <= k
    }


@pytest.mark.parametrize("k,q", [(1, 2), (2, 2), (3, 2), (2, 3)])
def test_edit_distance_join_matches_brute_force(spark, k, q):
    """Randomized recall/precision check: the Ed-Join prefix-filtered join
    must return EXACTLY the brute-force pair set at the threshold — the
    q-gram count/prefix theorems promise recall 1, the levenshtein verify
    precision 1. The generator plants edits of every kind (substitution,
    insert, delete, multi-edit) plus repeated-gram strings (the
    occurrence-tagging edge) and short strings (the brute-force-leg edge,
    incl. empty and len<q)."""
    from mrcond_spark.operators.editsim import edit_distance_join

    rng = random.Random(17)
    alpha = "abcd"
    strs: dict[int, str] = {}
    for i in range(35):
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        strs[i] = s
        if i % 3 == 0 and s:
            m = list(s)
            for _ in range(rng.randint(1, k)):
                op = rng.random()
                p = rng.randrange(len(m)) if m else 0
                if op < 0.34 and m:
                    m[p] = rng.choice(alpha)
                elif op < 0.67:
                    m.insert(p, rng.choice(alpha))
                elif m:
                    m.pop(p)
            strs[1000 + i] = "".join(m)
    strs[2000] = "abababab"  # repeated grams: occurrence-tag edge
    strs[2001] = "bababab"
    df = spark.createDataFrame(list(strs.items()), "id long, s string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(df, "id", "s", k=k, q=q).collect()
    }
    assert got == _brute_edit_pairs(strs, k)


def test_edit_distance_join_null_and_empty(spark):
    """NULL strings are treated as empty; empty-empty pairs at distance 0
    survive the short-string leg."""
    from mrcond_spark.operators.editsim import edit_distance_join

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab"), (4, "abcdefgh")],
        "id long, s string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(df, "id", "s", k=2, q=2).collect()
    }
    assert got == {(1, 2): 0, (1, 3): 2, (2, 3): 2}


def test_edit_distance_join_duplicate_short_strings_bounded(spark):
    """Round-6 judge finding: the short-string leg must pair-join DISTINCT
    values, not rows — crawl corpora carry millions of duplicate empty/short
    strings, and a row-level pair join there is O(rows^2). Plants 300 rows
    over only 3 distinct short values (plus two long controls) and checks:

    (a) the leg's value-level candidate frame has EXACTLY the 5 distinct
        value pairs the bounded-domain argument promises (3 diagonal +
        ("","a") + ("a","ab"); ("","ab") fails the length filter at k=1),
        independent of the 100x row multiplicity;
    (b) the full join's output matches the analytic pair count — every
        duplicate pair at dist 0 and every cross-value pair at dist 1 —
        so the re-expansion emits each unordered row pair exactly once
        (diagonal id-gate + cross-value least/greatest)."""
    from mrcond_spark.operators.editsim import _short_value_pairs, edit_distance_join

    n = 100
    rows = [(i, "") for i in range(n)]
    rows += [(1000 + i, "a") for i in range(n)]
    rows += [(2000 + i, "ab") for i in range(n)]
    rows += [(9001, "wwwwxxxxyyyyzzzz"), (9002, "qqqqrrrrsssstttt")]
    df = spark.createDataFrame(rows, "id long, s string")

    k, q = 1, 2
    short_max = q * k + q - 1  # = 3: all three planted values are "short"
    short_rows = df.select(
        "id", F.col("s"), F.length("s").alias("len")
    ).filter(F.col("len") <= short_max)
    got_pairs = {
        (r["v_a"], r["v_b"]) for r in _short_value_pairs(short_rows, k).collect()
    }
    assert got_pairs == {("", ""), ("a", "a"), ("ab", "ab"), ("", "a"), ("a", "ab")}

    out = edit_distance_join(df, "id", "s", k=k, q=q)
    by_dist = {r["dist"]: r["n"] for r in out.groupBy("dist").agg(F.count("*").alias("n")).collect()}
    dup_pairs = 3 * (n * (n - 1) // 2)  # dist-0: within each value group
    cross_pairs = 2 * n * n  # dist-1: ""<->"a" and "a"<->"ab"
    assert by_dist == {0: dup_pairs, 1: cross_pairs}
    # each unordered pair exactly once, ordered ids
    assert out.filter(F.col("id_a") >= F.col("id_b")).count() == 0


# --- Mann-Whitney rank-sum (operators/stats.py) ------------------------------


def _brute_u_x2(rows):
    """rows: list of (group, is_a, v) -> {group: (n_a, n_b, 2*U_A)} via
    sorted midranks — the textbook scan."""
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, is_a, v in rows:
        by_g[g].append((is_a, v))
    out = {}
    for g, pts in by_g.items():
        vs = sorted(p[1] for p in pts)
        # doubled midrank per value: 2*rank_min + count - 1
        first = {}
        cnt = {}
        for i, v in enumerate(vs, 1):
            first.setdefault(v, i)
            cnt[v] = cnt.get(v, 0) + 1
        two_ra = sum(
            2 * first[v] + cnt[v] - 1 for is_a, v in pts if is_a
        )
        n_a = sum(1 for is_a, _ in pts if is_a)
        n_b = len(pts) - n_a
        out[g] = (n_a, n_b, two_ra - n_a * (n_a + 1))
    return out


@pytest.mark.parametrize("band_width", [1, 3, 100])
def test_mann_whitney_matches_brute_force(spark, band_width):
    """The banded-window decorrelation must reproduce textbook sorted
    midranks exactly at any band width — heavy ties, negative values,
    one-sided groups, and a band width of 1 (every value its own band)
    all included."""
    from mrcond_spark.operators.stats import mann_whitney_u_x2

    rng = random.Random(99)
    rows = []
    for g in ["g1", "g2", "g3"]:
        for _ in range(rng.randint(5, 60)):
            rows.append((g, rng.random() < 0.5, rng.randint(-20, 20)))
    rows.append(("only_a", True, 5))  # one-sided group: U_A = 0
    df = spark.createDataFrame(rows, "g string, is_a boolean, v long")
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["u_a_x2"])
        for r in mann_whitney_u_x2(
            df, group_col="g", side_col="is_a", value_col="v",
            band_width=band_width,
        ).collect()
    }
    assert got == _brute_u_x2(rows)


def test_ks_d_numerator_matches_brute_force(spark):
    """The banded two-sided running counts must reproduce the textbook
    max-CDF-gap numerator exactly — ties, negatives, one-sided groups."""
    from mrcond_spark.operators.stats import ks_d_numerator

    rng = random.Random(123)
    rows = []
    for g in ["g1", "g2"]:
        for _ in range(rng.randint(10, 80)):
            rows.append((g, rng.random() < 0.4, rng.randint(-15, 15)))
    rows.append(("only_b", False, 7))
    df = spark.createDataFrame(rows, "g string, is_a boolean, v long")

    def brute(g):
        pts = [(a, v) for gg, a, v in rows if gg == g]
        na = sum(1 for a, _ in pts if a)
        nb = len(pts) - na
        best = 0
        for t in sorted({v for _, v in pts}):
            cuma = sum(1 for a, v in pts if a and v <= t)
            cumb = sum(1 for a, v in pts if not a and v <= t)
            best = max(best, abs(cuma * nb - cumb * na))
        return (na, nb, best)

    got = {
        r["g"]: (r["n_a"], r["n_b"], r["d_num"])
        for r in ks_d_numerator(
            df, group_col="g", side_col="is_a", value_col="v", band_width=4
        ).collect()
    }
    assert got == {g: brute(g) for g in ["g1", "g2", "only_b"]}
