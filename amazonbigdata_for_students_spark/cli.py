"""Command-line entry point: the operator registry as a user-facing tool.

    python -m amazonbigdata_for_students_spark list [SUBSTR]
    python -m amazonbigdata_for_students_spark run QUERY [--sf DIR] [--show N]
    python -m amazonbigdata_for_students_spark explain QUERY [--sf DIR]
    python -m amazonbigdata_for_students_spark check [SUBSTR ...] [--sf DIR]

`list` needs no Spark session; `run`/`explain` start (or reuse) the
configured local session; `check` additionally runs each query's DuckDB
oracle and reports the same rows/columns/values verdict the correctness
gate uses.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF = "/root/testdata/sf0.01"


def _registry():
    from .plans import REGISTRY

    return REGISTRY


def _spark():
    """Reuse an already-active session untouched, else build the tuned one.

    Going through SparkSession.builder.getOrCreate() with our defaults
    would APPLY those defaults to an existing session (getOrCreate sets
    the builder's runtime confs on the session it returns) — the CLI
    embedded in a host application must never clobber the host's
    parallelism settings."""
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        from .session import configure_runtime

        configure_runtime(s)
        return s
    from .session import get_spark

    return get_spark()


def cmd_list(args) -> int:
    reg = _registry()
    names = [n for n in reg if not args.filter or args.filter in n]
    for n in names:
        q = reg[n]
        first = (q.doc or "").strip().splitlines()
        head = first[0].strip() if first else ""
        tags = ",".join(q.tags)
        oracle = "sql-oracle" if q.oracle else "rows-only"
        print(f"{n:34s} [{tags}] ({oracle}) {head}")
    print(f"\n{len(names)} queries" + (f" matching {args.filter!r}" if args.filter else ""))
    return 0


def cmd_run(args) -> int:
    reg = _registry()
    if args.query not in reg:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    spark = _spark()
    df = reg[args.query].fn(spark, args.sf)
    # collect only the preview: a pair-emitting query at sf1+ can return
    # millions of rows, and pulling them all to the driver for a 20-row
    # peek is the exact collect() antipattern the operators avoid
    rows = df.limit(args.show + 1).collect()
    preview = spark.createDataFrame(rows[: args.show], df.schema)
    preview.show(args.show, truncate=False)
    more = "+" if len(rows) > args.show else ""
    print(f"[{args.query}] {min(len(rows), args.show)}{more} rows shown at {args.sf}")
    return 0


def cmd_explain(args) -> int:
    reg = _registry()
    if args.query not in reg:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    spark = _spark()
    reg[args.query].fn(spark, args.sf).explain("formatted")
    return 0


def cmd_check(args) -> int:
    from .testing import compare_query, duckdb_connect

    reg = _registry()
    names = [
        n for n in reg if not args.filter or any(f in n for f in args.filter)
    ]
    if not names:
        print("no queries match", file=sys.stderr)
        return 2
    spark = _spark()
    con = duckdb_connect(args.sf)
    failed = 0
    try:
        for n in names:
            try:
                res = compare_query(spark, reg[n], args.sf, con)
                ok, detail = res.ok, res.detail
            except Exception as e:  # one broken query must not mask the rest
                ok, detail = False, f"error: {type(e).__name__}: {e}"
            status = "ok  " if ok else "FAIL"
            print(f"{status} {n:34s} {detail}")
            failed += 0 if ok else 1
    finally:
        con.close()
    print(f"\n{len(names) - failed}/{len(names)} match at {args.sf}")
    return 1 if failed else 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="amazonbigdata_for_students_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("filter", nargs="?", default=None)
    lp.set_defaults(fn=cmd_list)

    rp = sub.add_parser("run", help="run one query and show its result")
    rp.add_argument("query")
    rp.add_argument("--sf", default=DEFAULT_SF)
    rp.add_argument("--show", type=int, default=20)
    rp.set_defaults(fn=cmd_run)

    ep = sub.add_parser("explain", help="print a query's physical plan")
    ep.add_argument("query")
    ep.add_argument("--sf", default=DEFAULT_SF)
    ep.set_defaults(fn=cmd_explain)

    cp = sub.add_parser("check", help="compare queries against their DuckDB oracles")
    cp.add_argument("filter", nargs="*", default=None)
    cp.add_argument("--sf", default=DEFAULT_SF)
    cp.set_defaults(fn=cmd_check)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
