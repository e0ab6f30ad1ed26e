"""Deterministic weighted sampling primitives (Efraimidis-Spirakis A-ES).

A-ES ("Weighted random sampling with a reservoir", IPL 2006) reduces
weighted sampling WITHOUT replacement to a top-k: give each row the key
``u^(1/w)`` (equivalently ``ln(u)/w``, monotone) with ``u ~ U(0,1)`` and
keep the k largest. Deriving ``u`` from a seeded md5 of the row id instead
of an RNG makes the SAME sample come out on any engine, any partitioning,
any retry, and — because top-k-by-key is a mergeable summary — in any
batch/streaming split of the input: the batch query (q140) and the
streaming reservoir (`streaming.windows.stream_weighted_sample`) provably
select identical rows over identical inputs.

100 TB: the key is pure JVM column arithmetic (md5/conv/ln), selection is
a TakeOrdered top-k (per-partition heaps, O(k) driver) batch-side and a
bounded k-row state per bucket streaming-side. No RNG coordination, no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2^60 + 1 — divisor mapping the 60-bit md5 prefix to u in (0, 1)
U_DEN = float(2**60 + 1)


def aes_key(id_col: Column, weight_col: Column, seed: str) -> Column:
    """A-ES selection key ``ln(u)/w`` with ``u`` md5-derived from the id.

    Larger = more likely selected; keep the top-k. ``weight_col`` must be
    strictly positive. The 60-bit hex prefix keeps the conv() inside
    exact BIGINT range; +1 keeps u > 0 so ln() is finite.
    """
    hk = F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
    h = F.conv(F.substring(hk, 1, 15), 16, 10).cast("long")
    u = (h + F.lit(1)) / F.lit(U_DEN)
    return F.log(u) / weight_col
