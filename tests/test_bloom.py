"""Bloom pre-join operator (`operators/bloom.py`): no false negatives ever,
real pruning on a selective dim, and exact-join equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mrcond_spark.operators.bloom import (
    bloom_prejoin,
    build_bloom_words,
    might_contain,
)

NUM_BITS = 1 << 12
NUM_HASHES = 5


def test_no_false_negatives(spark):
    """Every dim key must pass its own Bloom — a false negative would make
    the pre-join drop real matches (a correctness bug, not a perf one)."""
    dim = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    words = build_bloom_words(dim, "k", NUM_BITS, NUM_HASHES)
    missed = dim.filter(~might_contain(words, F.col("k"), NUM_BITS, NUM_HASHES)).count()
    assert missed == 0


def test_prunes_most_non_members(spark):
    """With 500 keys in 4096 bits the fpp is small: of 10k non-member probes
    the filter must reject the vast majority (sanity on the hash spread)."""
    dim = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    words = build_bloom_words(dim, "k", NUM_BITS, NUM_HASHES)
    non_members = spark.range(100_000, 110_000).withColumnRenamed("id", "k")
    passed = non_members.filter(
        might_contain(words, F.col("k"), NUM_BITS, NUM_HASHES)
    ).count()
    assert passed < 2_000  # theoretical fpp ~0.05 at these parameters


def test_prejoin_equals_plain_join(spark):
    """bloom_prejoin's result must be row-identical to the plain inner join
    (false positives die in the join; false negatives don't exist)."""
    fact = spark.range(0, 3_000).select(
        F.col("id").alias("fk"), (F.col("id") % 97).alias("payload")
    )
    dim = spark.range(0, 1_000).select(
        (F.col("id") * 3).alias("dk"), F.lit("d").alias("tag")
    )
    got = sorted(
        tuple(r)
        for r in bloom_prejoin(fact, dim, "fk", "dk", num_bits=NUM_BITS).collect()
    )
    want = sorted(
        tuple(r) for r in fact.join(dim, fact.fk == dim.dk).collect()
    )
    assert got == want


def test_rejects_unaligned_bits():
    with pytest.raises(ValueError):
        build_bloom_words(None, "k", num_bits=100, num_hashes=3)


def test_auto_sizing_tracks_dim_count(spark):
    """num_bits=None sizes the filter from the dim count (~10 bits/key,
    power of two, floored at 2^16): the round-10 sf1 sweep showed the old
    fixed 2^16 default saturating at a 30k-key dim. The auto-sized
    prejoin must stay row-identical to the plain join (sizing is a perf
    knob, never a correctness one)."""
    from mrcond_spark.operators import bloom

    fact = spark.range(0, 5_000).select(
        F.col("id").alias("fk"), (F.col("id") % 13).alias("payload")
    )
    dim = spark.range(0, 2_000).select(
        (F.col("id") * 2).alias("dk"), F.lit("d").alias("tag")
    )
    got = sorted(
        tuple(r) for r in bloom.bloom_prejoin(fact, dim, "fk", "dk").collect()
    )
    want = sorted(tuple(r) for r in fact.join(dim, fact.fk == dim.dk).collect())
    assert got == want
    # the sizing rule itself: floor for small dims (2,000 keys * 10 bpk
    # = 20,000 < 2^16), doubling past it (30,000 keys -> 2^19 = 524,288
    # >= 300,000), hard cap for dims that should broadcast instead
    assert bloom.auto_num_bits(2_000) == 1 << 16
    assert bloom.auto_num_bits(30_000) == 1 << 19
    assert bloom.auto_num_bits(10**9) == bloom._AUTO_MAX_BITS
