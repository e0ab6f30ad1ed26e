"""DataFrame-native Bloom-filter semi-join pruning.

Spark's runtime row-level Bloom filters (`bloom_filter_agg` /
`might_contain`) are internal expressions not exposed through the public
function registry, so this operator builds the same structure from public
primitives: k `xxhash64(key, seed)` probes into an ``num_bits``-wide bit
array packed into ``num_bits/64`` longs aggregated with ``bit_or``. The
membership test is a pure JVM expression over an embedded literal array —
no Python in the hot path, no join, no shuffle on the probe side.

Where it fits between the existing join strategies:

- dim keys fit a broadcast hash join  -> just broadcast-join (q03);
- dim keys fit an IN-list             -> semi join (q05);
- dim keys are MILLIONS (too big to broadcast as a hash relation cheaply)
  but the match fraction on the fact side is small -> a few-hundred-KB
  Bloom embeds in every task, prunes the fact rows BEFORE the join
  shuffle, and the exact join afterwards removes the false positives.

At 100 TB the payoff is the pruned shuffle: a 20%-selective dim turns an
80 TB fact exchange into ~16 TB (+fpp). False positives only cost shuffle
bytes, never correctness.

EAGER + SNAPSHOT CONTRACT (same as `prefix_sum.bucketed_running_sum`): the
Bloom build job runs at construction time — the bit array must become a
plan literal. The collects are bounded metadata, never data-sized: the
auto-sizing default first runs ONE bounded `approx_count_distinct(dim_key)`
job, then the build job collects ``num_bits / 64`` longs, where
``num_bits`` is sized at ~10 bits/distinct-key in [2^16, 2^24] — i.e. a
plan literal of 1,024 longs (8 KiB) up to 262,144 longs (~2 MiB) at the
2^24 ceiling. Pass an explicit ``num_bits`` to skip the sizing job.

Reference parity note: f-squirrel/mrcond has no batch/join surface
(SURVEY §1) — this belongs to the mandated Spark-first extension tier.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mask_array() -> Column:
    """Literal array of the 64 single-bit long masks, indexed by bit+1.

    `F.shiftleft`'s Python wrapper only accepts a literal shift amount, so
    a column-indexed lookup table replaces the dynamic shift. Bit 63 is the
    sign bit: its mask is expressed as the negative two's-complement value
    (bit_or / bitwiseAND are sign-agnostic). Built as ONE list literal —
    per-element `F.lit` calls cost a py4j round-trip each (measured: the
    1024-word array built element-wise added ~3 s of DRIVER time to q119's
    plan construction; the single-call literal is milliseconds)."""
    return F.lit([(1 << i) if i < 63 else -(1 << 63) for i in range(64)]).cast(
        "array<long>"
    )


def build_bloom_words(dim: DataFrame, key: str, num_bits: int, num_hashes: int) -> list[int]:
    """Run the (eager) build job: k hash positions per dim key, packed into
    ``num_bits/64`` longs via a partial-aggregated ``bit_or``. Returns the
    dense word array (bounded: ``num_bits/64`` entries)."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    positions = F.array(
        *[F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)]
    )
    words = (
        dim.select(F.explode(positions).alias("pos"))
        .groupBy((F.col("pos") / 64).cast("int").alias("word"))
        .agg(
            F.bit_or(
                F.element_at(_mask_array(), (F.col("pos") % 64).cast("int") + 1)
            ).alias("bits")
        )
        .collect()
    )
    dense = [0] * (num_bits // 64)
    for r in words:
        dense[r["word"]] = r["bits"]
    return dense


def might_contain(words: list[int], key: Column, num_bits: int, num_hashes: int) -> Column:
    """Membership-test expression against an embedded literal word array —
    ANDs k single-bit probes, each `element_at(lit_array, word) & bit != 0`."""
    lit_words = F.lit(list(words)).cast("array<long>")
    masks = _mask_array()
    probes = []
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        word = F.element_at(lit_words, (pos / 64).cast("int") + 1)
        bit = F.element_at(masks, (pos % 64).cast("int") + 1)
        probes.append(word.bitwiseAND(bit) != 0)
    return reduce(lambda a, b: a & b, probes)


#: auto-sizing bounds: floor keeps tiny dims at the historical 8 KiB
#: filter; the cap bounds the per-task plan literal at 2 MiB — past ~1M
#: qualifying keys a saturating Bloom prunes little and a broadcast/semi
#: join strategy should win anyway.
_AUTO_MIN_BITS = 1 << 16
_AUTO_MAX_BITS = 1 << 24
_AUTO_BITS_PER_KEY = 10  # fpp ~1% at k=5


def auto_num_bits(n_keys: int) -> int:
    """Power-of-two filter size for ``n_keys`` at ~10 bits/key, clamped to
    [2^16, 2^24] (see the constants above)."""
    bits = _AUTO_MIN_BITS
    while bits < _AUTO_MAX_BITS and bits < n_keys * _AUTO_BITS_PER_KEY:
        bits <<= 1
    return bits


def bloom_prejoin(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int | None = None,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact inner equi-join of ``fact`` with ``dim``, with the fact side
    pre-pruned by a Bloom filter over the dim keys.

    The result is IDENTICAL to ``fact.join(dim, fact_key == dim_key)`` —
    the Bloom only drops fact rows that cannot match (false positives pass
    the filter and are removed by the join). Eager: the dim-side build job
    runs here (see module docstring for the snapshot contract).

    ``num_bits=None`` (default) sizes the filter from the dim's DISTINCT
    key count at ~10 bits/key (one extra bounded approx_count_distinct job
    before the build — distinct, not row count, so a duplicate-keyed dim
    doesn't oversize the plan literal for zero pruning gain): the round-10
    sf1 sweep showed the old fixed 2^16-bit default SATURATING at a 10x
    dim — 30k keys x 5 hashes filled 66% of the bits and pruning fell from
    ~80% of fact rows to ~34% — and a filter whose size ignores the dim
    cannot hold its pruning rate at 100 TB. Power-of-two sized in
    [2^16, 2^24]; pass an explicit ``num_bits`` to pin the old behavior.
    """
    if num_bits is None:
        n_keys = dim.agg(F.approx_count_distinct(dim_key).alias("n")).first()["n"]
        num_bits = auto_num_bits(n_keys)
    words = build_bloom_words(dim, dim_key, num_bits, num_hashes)
    pruned = fact.filter(might_contain(words, F.col(fact_key), num_bits, num_hashes))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])
