"""Batch CLI: run declared queries from the command line.

The streaming daemon surface lives in ``daemon.py`` (the `mrcond` binary
equivalent); this is the batch companion so the whole declared corpus is
drivable without writing Python:

    python -m mrcond_spark list
    python -m mrcond_spark run q10_agg_tpch_q1 --sf /root/testdata/sf0.01
    python -m mrcond_spark run q40_exact_dedup --sf /root/testdata/sf0.01 --limit 5
    python -m mrcond_spark sql "SELECT COUNT(*) FROM lineitem" --sf /root/testdata/sf0.01

``sql`` registers the table views first, so plain SQL is a first-class entry
point (same contract tests/test_sql_parity.py pins).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="mrcond_spark", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list declared queries (name, tags, oracle?)")

    runp = sub.add_parser("run", help="run one declared query and print rows")
    runp.add_argument("name")
    runp.add_argument("--sf", default="/root/testdata/sf0.01", help="table directory")
    runp.add_argument("--limit", type=int, default=20, help="max rows to print")
    runp.add_argument("--explain", action="store_true", help="print the physical plan too")

    sqlp = sub.add_parser("sql", help="run ad-hoc SQL over the registered table views")
    sqlp.add_argument("query")
    sqlp.add_argument("--sf", default="/root/testdata/sf0.01")
    sqlp.add_argument("--limit", type=int, default=20)

    args = parser.parse_args(argv)

    from .queries import all_queries

    if args.cmd == "list":
        for name, q in all_queries().items():
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:32s} [{','.join(q.tags)}] {kind}")
        return 0

    from .session import get_spark

    spark = get_spark("mrcond-cli")
    if args.cmd == "run":
        queries = all_queries()
        if args.name not in queries:
            print(f"unknown query {args.name!r}; see `python -m mrcond_spark list`", file=sys.stderr)
            return 2
        df = queries[args.name].spark(spark, args.sf)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        return 0

    # args.cmd == "sql"
    from .catalog import register_views

    register_views(spark, args.sf)
    spark.sql(args.query).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
