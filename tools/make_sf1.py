"""Generate an sf1-scale dataset by tiling the driver's sf0.1 testdata 10x.

Purpose (round-10 judge item 5): the engine's 100 TB claims extrapolated
from sf0.1 sweeps; this script manufactures a one-order-of-magnitude-larger
corpus INSIDE the repo (the sandbox forbids writing outside /root/repo and
regenerating /root/testdata) so the expensive-tier queries can be
hash-compared against DuckDB at ~6M lineitem rows — the scale where the
next q168-class exactness bug (int overflow, 1-ULP cast divergence,
engine-specific NULL ordering) would surface.

Construction: COPIES shifted tiles of every sf0.1 table, keys shifted by
tile * (max_key + 1) so all FK relationships hold within each tile and all
key-modulus idioms used by the declared queries keep their structure:

- region/nation: fixed dimensions, copied once (a 10x star schema grows
  facts, not the 5-row dimension).
- customer/supplier/part/orders/lineitem: every key (PK and FK) shifts by
  the same per-table stride, so tile i is an exact FK-consistent replica.
- documents: doc_id += 5000*i (5000 % 25 == 0, so the q48/q57-style
  planted idiom `doc_id % 25 == 0` selects the same rows per tile); tiles
  i>0 get a 2-token ` tile{i} m{7919*i}` text suffix so cross-tile texts
  are near- but not exact-duplicates (exact 10-way duplicate groups would
  degenerate every dedup bucket); n_chars is recomputed to keep the
  n_chars == LENGTH(text) invariant.
- embeddings: vec_id += 2000*i; tiles i>0 are FRESH deterministic
  hash-based pseudo-random vectors (see tile_sql for why perturbed copies
  are wrong: the planted-neighbor oracles' stated corpus premise is that
  no NATURAL pair approaches cosine 1; PINNED_VEC_IDS live in tile 0 and
  keep their exact sf0.1 values).
- events: event_id += 100000*i, user_id += 1500*i (per-user session/window
  state stays tile-local — 10x more users, not 10x-longer user histories,
  which is how event volume actually grows).

Determinism: pure SQL over the read-only source parquet — no RNG, no
timestamps. Output: /root/repo/.sf1/*.parquet (gitignored; ~200 MB).

Usage: python tools/make_sf1.py [--copies 10] [--out /root/repo/.sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

#: per-table (key columns -> stride) and row-builder SQL fragments.
STRIDES = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "documents": 5_000,
    "embeddings": 2_000,
    "events_id": 100_000,
    "events_user": 1_500,
}


def tile_sql(table: str, i: int) -> str:
    """SELECT for tile ``i`` of ``table`` (tile 0 is the verbatim source)."""
    src = f"'{SRC}/{table}.parquet'"
    if table in ("region", "nation"):
        raise ValueError("dimensions are copied, not tiled")
    if table == "customer":
        return (
            f"SELECT c_custkey + {i * STRIDES['customer']} AS c_custkey, c_name, "
            f"c_nationkey, c_acctbal, c_mktsegment FROM {src}"
        )
    if table == "supplier":
        return (
            f"SELECT s_suppkey + {i * STRIDES['supplier']} AS s_suppkey, s_name, "
            f"s_nationkey, s_acctbal FROM {src}"
        )
    if table == "part":
        return (
            f"SELECT p_partkey + {i * STRIDES['part']} AS p_partkey, p_name, p_brand, "
            f"p_type, p_size, p_retailprice FROM {src}"
        )
    if table == "orders":
        return (
            f"SELECT o_orderkey + {i * STRIDES['orders']} AS o_orderkey, "
            f"o_custkey + {i * STRIDES['customer']} AS o_custkey, o_orderstatus, "
            f"o_totalprice, o_orderdate, o_orderpriority FROM {src}"
        )
    if table == "lineitem":
        return (
            f"SELECT l_orderkey + {i * STRIDES['orders']} AS l_orderkey, "
            f"l_partkey + {i * STRIDES['part']} AS l_partkey, "
            f"l_suppkey + {i * STRIDES['supplier']} AS l_suppkey, "
            f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
            f"l_returnflag, l_linestatus, l_shipdate FROM {src}"
        )
    if table == "documents":
        text = "text" if i == 0 else f"text || ' tile{i} m{7919 * i}'"
        return (
            f"SELECT doc_id + {i * STRIDES['documents']} AS doc_id, {text} AS text, "
            f"lang, source, CAST(LENGTH({text}) AS BIGINT) AS n_chars FROM {src}"
        )
    if table == "embeddings":
        # Tiles i>0 get FRESH deterministic hash-based pseudo-random vectors
        # (components uniform in [-0.5, 0.5]), NOT perturbed copies. The
        # first tiling added i*1e-3 to one component; the resulting
        # cos(original, tile) ~= 1 - 5e-9 violated the corpus premise every
        # planted-neighbor oracle states explicitly (q49/q56: "max natural
        # cosine ~0.60 << 1.0"; q99: "no natural pair reaches the 0.95
        # threshold") — at 4-dp cosine quantization the tile copy TIED the
        # planted duplicate and won the id tie-break, and q99 correctly
        # semantic-deduped the tiles, so both queries diverged from oracles
        # whose premises no longer held. Independent uniform vectors at
        # dim 64 concentrate pairwise cosine at 0 +- 1/8; the max over
        # ~2e8 pairs stays ~0.75, preserving the premise by construction.
        # (Determinism is per-DuckDB-version: hash() is stable within the
        # pinned 1.0.0, which is all the gitignored .sf1 needs.)
        emb = (
            "embedding"
            if i == 0
            else (
                "list_transform(range(1, len(embedding) + 1), "
                f"j -> CAST(hash(concat('sf1emb:', {i}, ':', vec_id, ':', j)) "
                "% 1000001 AS DOUBLE) / 1000000.0 - 0.5)"
            )
        )
        return (
            f"SELECT vec_id + {i * STRIDES['embeddings']} AS vec_id, "
            f"CAST({emb} AS FLOAT[]) AS embedding, label FROM {src}"
        )
    if table == "events":
        return (
            f"SELECT event_id + {i * STRIDES['events_id']} AS event_id, ts, "
            f"user_id + {i * STRIDES['events_user']} AS user_id, event_type, "
            f"value, props FROM {src}"
        )
    raise ValueError(f"unknown table {table!r}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for dim in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') TO "
            f"'{args.out}/{dim}.parquet' (FORMAT PARQUET)"
        )
        print(f"{dim}: copied")
    for table in (
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "documents",
        "embeddings",
        "events",
    ):
        union = " UNION ALL ".join(tile_sql(table, i) for i in range(args.copies))
        con.execute(
            f"COPY ({union}) TO '{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{args.out}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
