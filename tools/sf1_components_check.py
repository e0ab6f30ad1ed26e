"""Independent sf1-scale reference check for q170_dedup_components.

Why this exists: q170's DECLARED oracle (the driver contract at sf0.01,
attested green r7 and in every pytest sweep) replays the blocking graph
with a recursive transitive-closure CTE — `reach` accumulates one row per
(node, reachable-label) pair, which is O(sum over components of size^2).
At sf0.1 the largest (lang|source|size-band) chain is small enough; at sf1
the tiled corpus grows the hottest chains ~10x and the closure ~100x, and
DuckDB 1.0 (this container) has no `USING KEY` recursive CTE to keep the
per-node state linear. That is an ORACLE resource limit of the same class
as q132's pre-materialization CTE blowup (PERF.md round-7/8 notes), not an
engine property — so the sf1 sweep checks q170 against THIS independent
reference instead: the exact same edge list built by DuckDB SQL (verbatim
the declared oracle's `a`/`b`/`e` CTEs), resolved with a 30-line
union-find in pure Python (path compression + union toward the MIN label
— the smaller root always becomes the parent, which is exactly what makes
"root == min label of the component" hold without a second pass; worst-case
tree depth therefore leans on path compression alone, fine at these sizes —
nothing shared with the Spark pointer-jumping implementation), min-label
per component to match `connected_components`' contract.

Usage: python tools/sf1_components_check.py [--sf /root/repo/.sf1]
Prints one OK/FAIL line in the sweep's format.
"""
from __future__ import annotations

import argparse
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

EDGES_SQL = r"""
WITH toked AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(coalesce(text, ''))), '\s+'),
                       t -> t <> '') AS toks
    FROM documents
),
a AS (
    SELECT doc_id,
           lead(doc_id) OVER (
               PARTITION BY array_to_string(toks[1:2], ' ') ORDER BY doc_id
           ) AS nxt
    FROM toked
),
b AS (
    SELECT doc_id,
           lead(doc_id) OVER (
               PARTITION BY concat(coalesce(lang, ''), '|',
                                   coalesce(source, ''), '|',
                                   CAST(coalesce(n_chars, 0) // 50 AS VARCHAR))
               ORDER BY doc_id
           ) AS nxt
    FROM documents
)
SELECT doc_id AS s, nxt AS t FROM a WHERE nxt IS NOT NULL
UNION ALL
SELECT doc_id, nxt FROM b WHERE nxt IS NOT NULL
"""


def reference_components(sf: str) -> dict[int, int]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    edges = con.execute(EDGES_SQL).fetchall()
    nodes = [r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for s, t in edges:
        rs, rt = find(s), find(t)
        if rs != rt:
            parent[max(rs, rt)] = min(rs, rt)  # union toward the min label
    # min-label-per-component == root label, because unions always point
    # the larger root at the smaller one
    return {n: find(n) for n in nodes}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.sf1")
    args = ap.parse_args()

    t0 = time.time()
    ref = reference_components(args.sf)
    t_ref = time.time() - t0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    t0 = time.time()
    got = {
        r["doc_id"]: r["component"]
        for r in E.queries()["q170_dedup_components"](spark, args.sf).collect()
    }
    t_spark = time.time() - t0

    ok = got == ref
    print(
        f"{'OK  ' if ok else 'FAIL'} q170_dedup_components: {len(got)} rows "
        f"(spark {t_spark:.1f}s, union-find reference {t_ref:.1f}s)",
        flush=True,
    )
    if not ok:
        diff = [(k, got.get(k), ref.get(k)) for k in ref if got.get(k) != ref.get(k)]
        print(f"  first diffs: {diff[:5]}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
