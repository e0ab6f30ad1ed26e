"""Sorted-neighborhood operator (operators/snm.py): exact SNM semantics when
no block is hot, and the round-7 hot-block guard — prefix extension, then
deterministic salt — bounding every window partition by construction."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from mrcond_spark.operators.snm import bounded_block_key, sorted_neighborhood_pairs


def _brute_snm(rows, w):
    """rows: (id, sort, blk, payload) -> {(id_a, id_b, d, p_a, p_b)} by the
    textbook definition: sort each block by (sort, id), pair row i with
    rows i+1..i+w."""
    out = set()
    by_blk: dict[str, list] = {}
    for r in rows:
        by_blk.setdefault(r[2], []).append(r)
    for blk_rows in by_blk.values():
        blk_rows.sort(key=lambda r: (r[1], r[0]))
        for i, a in enumerate(blk_rows):
            for d in range(1, w + 1):
                if i + d < len(blk_rows):
                    b = blk_rows[i + d]
                    out.add((a[0], b[0], d, a[3], b[3]))
    return out


def test_snm_matches_brute_force_when_no_hot_block(spark):
    """Below the cap the guard's when() never fires: output must be exactly
    the single-window SNM pair set, payloads carried through the lead."""
    rows = [
        (i, f"sort{(i * 7) % 23:03d}x{i:03d}", f"b{i % 5}", f"p{i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, nt string, blk string, pl string")
    got = {
        (r["id_a"], r["id_b"], r["d"], r["pl_a"], r["pl_b"])
        for r in sorted_neighborhood_pairs(
            df, "id", "nt", "blk", w=3, payload_cols=("pl",), max_block_rows=100
        ).collect()
    }
    assert got == _brute_snm(rows, w=3)


def test_hot_block_splits_by_extension_key(spark):
    """Planted boilerplate: 1200 rows share one 2-token block key but split
    at the extension key. With cap=100 every effective block must come in
    under the cap via the EXTENSION (content split), not the salt — and the
    non-hot control block must keep its key untouched."""
    rows = [(i, f"boiler plate tail{i % 30:02d} x{i:04d}", "boiler plate", f"boiler plate tail{i % 30:02d}") for i in range(1200)]
    rows += [(10_000 + i, f"cool text {i:03d}", "cool text", f"cool text {i:03d}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, nt string, blk string, blk4 string")
    keyed = bounded_block_key(
        df, "blk", "nt", "id", extend_cols=("blk4",), max_block_rows=100
    )
    sizes = {r["__bk"]: r["n"] for r in keyed.groupBy("__bk").agg(F.count("*").alias("n")).collect()}
    assert max(sizes.values()) <= 100
    assert sizes["cool text"] == 50  # non-hot block key untouched
    # every hot-block key is blk + SEP + extension, no salt level needed
    hot_keys = [k for k in sizes if k != "cool text"]
    assert len(hot_keys) == 30
    assert all(k.startswith("boiler plate\x1f") and k.count("\x1f") == 1 for k in hot_keys)


def test_hot_block_salts_when_extensions_exhausted(spark):
    """Degenerate corpus: 1000 rows identical through the base AND extension
    keys (only the sort tail differs). Extension cannot split it, so the
    deterministic salt must — group sizes land near cap with hash variance,
    never the original 1000-row window."""
    rows = [(i, f"same same same same unique{i:04d}", "same same", "same same same same") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, nt string, blk string, blk4 string")
    keyed = bounded_block_key(
        df, "blk", "nt", "id", extend_cols=("blk4",), max_block_rows=100
    )
    sizes = [r["n"] for r in keyed.groupBy("__bk").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) >= 5  # ceil(1000/100) = 10 salt buckets, hash-balanced
    assert max(sizes) <= 250  # hard bound up to hash variance; was 1000
    assert sum(sizes) == 1000  # no row lost or duplicated by the re-keying


def test_snm_pairs_complete_inside_split_blocks(spark):
    """After a hot block splits, pairs must still be the full SNM pair set
    WITHIN each effective block: per-extension-value row runs stay intact
    (the extension key is content-derived), so near-dups sharing the longer
    prefix still pair."""
    rows = [
        (100 * g + j, f"boiler plate v{g:02d} t{j:02d}", "boiler plate", f"boiler plate v{g:02d}")
        for g, j in itertools.product(range(6), range(40))
    ]
    df = spark.createDataFrame(rows, "id long, nt string, blk string, blk4 string")
    got = {
        (r["id_a"], r["id_b"], r["d"])
        for r in sorted_neighborhood_pairs(
            df, "id", "nt", "blk", w=2, extend_cols=("blk4",), max_block_rows=50
        ).collect()
    }
    # expected: within each of the 6 extension groups (40 rows, sorted by
    # nt == sorted by j), classic w=2 adjacency
    want = set()
    for g in range(6):
        ids = [100 * g + j for j in range(40)]
        for i, a in enumerate(ids):
            for d in (1, 2):
                if i + d < len(ids):
                    want.add((a, ids[i + d], d))
    assert got == want
