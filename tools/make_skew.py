"""Generate a key-skew stress variant of the .sf1 corpus.

Purpose (round-11 extension of the sf1 sweep): the sf1 sweep proved the
corpus at 10x VOLUME, but both testdata tiers are perfectly uniform in
their join/window keys (max suppkey share at sf0.1: 0.12%). At 100 TB the
defining hazard is not volume, it is SKEW — one customer owning a third
of the orders, one user owning a third of the event stream. A shuffled
join funnels that key into one reducer; a `Window.partitionBy(hot_key)`
puts it in ONE task no matter how many executors exist. None of the
engine's skew claims (AQE skew-join splitting, the salted tier, the
windowed operators' per-key state) had ever been measured against data
that actually skews.

Construction (pure deterministic SQL over the .sf1 parquet; no RNG, no
timestamps — same rules as make_sf1.py):

- lineitem: rows with ``l_orderkey % 10 < 3`` are remapped to ONE hot
  ``l_suppkey`` (the minimum supplier key, so FK integrity holds) —
  ~30% of 6M rows land on a single supplier-join/group key.
- orders:   rows with ``o_orderkey % 10 < 3`` are remapped to ONE hot
  ``o_custkey`` — ~30% of 1.5M orders on a single customer.
- events:   rows with ``event_id % 10 < 3`` are remapped to ONE hot
  ``user_id`` — ~30% of 1M events in a single window partition. This
  ALSO manufactures (user_id, ts) ties (the sf1 tiles repeat ts values
  verbatim per tile), so any window whose intra-partition ORDER BY is
  not total gets caught here, exactly as it would be on a real corpus
  where two events share a timestamp.
- every other table is copied verbatim (dimensions and the text/vector
  tables keep their planted-oracle premises untouched — this generator
  skews RELATIONAL keys only; document/embedding hot-token skew is a
  different hazard class with its own premises).

The fractions stay FK-consistent and preserve every key-modulus idiom
used by declared queries on the UNTOUCHED columns (orderkeys, ids are
never rewritten — only the FK columns named above change values, to
other VALID keys).

Output: /root/repo/.skew/*.parquet (gitignored, ~250 MB).
Usage: python tools/make_skew.py [--src /root/repo/.sf1] [--out /root/repo/.skew]
Sweep: python tools/drive_contract.py --sf /root/repo/.skew <query...>
"""

from __future__ import annotations

import argparse
import os

import duckdb

COPY_VERBATIM = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "documents",
    "embeddings",
)

#: table -> (selector column, remapped FK column, hot-key source SQL)
SKEWED = {
    "lineitem": ("l_orderkey", "l_suppkey", "SELECT MIN(s_suppkey) FROM '{src}/supplier.parquet'"),
    "orders": ("o_orderkey", "o_custkey", "SELECT MIN(c_custkey) FROM '{src}/customer.parquet'"),
    "events": ("event_id", "user_id", "SELECT MIN(user_id) FROM '{src}/events.parquet'"),
}

HOT_FRACTION_MOD = 10  # selector % 10 < 3  => ~30% of rows
HOT_FRACTION_LT = 3


def build(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_VERBATIM:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"copied   {t}")
    for t, (sel, fk, hot_sql) in SKEWED.items():
        hot = con.sql(hot_sql.format(src=src)).fetchone()[0]
        con.sql(
            f"""
            COPY (
              SELECT * REPLACE(
                CASE WHEN {sel} % {HOT_FRACTION_MOD} < {HOT_FRACTION_LT}
                     THEN {hot} ELSE {fk} END AS {fk})
              FROM '{src}/{t}.parquet'
            ) TO '{out}/{t}.parquet' (FORMAT PARQUET)
            """
        )
        n, share = con.sql(
            f"SELECT COUNT(*), MAX(c) * 1.0 / SUM(c) FROM ("
            f"SELECT {fk}, COUNT(*) c FROM '{out}/{t}.parquet' GROUP BY 1)"
        ).fetchone()
        print(f"skewed   {t}: hot {fk}={hot}, top-key row share {share:.1%}, {int(n)} distinct keys")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/repo/.sf1")
    ap.add_argument("--out", default="/root/repo/.skew")
    args = ap.parse_args()
    build(args.src, args.out)


if __name__ == "__main__":
    main()
