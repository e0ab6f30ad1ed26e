"""Deduplication operators for LLM-training-data pipelines (SURVEY §2.4 E1/E2).

Tiers:
- exact_dedup          — hash-groupBy on normalized text (one shuffle).
- minhash_lsh_pairs    — MinHash signatures over shingles, banded into LSH
                         buckets, candidate pairs via self-join *on bucket key*.
- simhash_pairs        — 64-bit SimHash fingerprints, candidates = equal
                         fingerprint (near-dup at hamming 0 on the bucketed key).
- ngram_jaccard        — exact Jaccard over shingle sets for a candidate pair
                         set (verification stage after LSH candidate gen).

100 TB design: every stage is expressed as hash/groupBy/join on bounded-size
keys — never an all-pairs comparison. The LSH self-join shuffles on
(band, bucket-hash), so candidate generation cost is proportional to bucket
collisions, not n². All hashing runs JVM-side (xxhash64 / crc32 via built-in
functions), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text(col: Column) -> Column:
    """Canonical text form for exact dedup: trim, lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def text_hash(col: Column) -> Column:
    """256-bit content hash of the normalized text (exact-dup key)."""
    return F.sha2(normalized_text(col), 256)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per distinct normalized text.

    One shuffle on the 256-bit hash — uniform key distribution, no skew.
    """
    return (
        df.withColumn("__h", text_hash(F.col(text_col)))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("__h")
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array from whitespace-tokenized text (JVM-side)."""
    toks = F.split(normalized_text(col), " ")
    # transform over a sliding index range: shingle i = tokens[i..i+n)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for seed k, min over shingles of xxhash64(shingle, k).

    Pure built-in expression (aggregate over transform) — whole-stage codegen,
    no UDF.
    """
    return F.array(
        *[
            F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(k))))
            for k in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash-LSH.

    rows/bands = num_hashes/bands hashes per band; two docs are candidates if
    any band signature matches. The self-join key is (band_idx, band_hash) —
    the shuffle is by bucket, never all-pairs.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(shingles(F.col(text_col), shingle_n), num_hashes).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash64(col: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash over word shingles, as a signed BIGINT.

    For each bit position, sum +-1 votes across shingle hashes; bit = sign.
    Expressed with JVM built-ins only: per-bit vote = sum over shingles of
    (hash >> bit & 1)*2-1 via aggregate().
    """
    sh = shingles(col, shingle_n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    bits = [
        F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1),
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    out = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        out = out.bitwiseOR(F.shiftleft(b, i))
    return out


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Docs sharing an identical 64-bit SimHash (bucketed, one shuffle)."""
    sig = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sim"))
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(b, (F.col("a.sim") == F.col("b.sim")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard(
    pairs: DataFrame, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (id_a, id_b).

    Verification stage: joins the (small) candidate set back to the corpus
    twice; array intersection/union are JVM built-ins.
    """
    sh = docs.select(
        F.col(id_col).alias("id"), F.array_distinct(shingles(F.col(text_col), n)).alias("sh")
    )
    return (
        pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1))
            ).alias("jaccard"),
        )
    )
