#!/usr/bin/env python
"""Dev loop: run every registered query against its DuckDB oracle at sf0.01
(the same comparison the driver's correctness gate performs). Usage:

    python scripts/check_oracle.py [--parallel N] [--sf DIR] [query-name-substring ...]

--sf DIR points the comparison at another scale-factor directory (e.g.
.localdata/sf1 from gen_sf.py) — the round checklist's sf1 smoke runs the
top scale-sensitive names there, catching latent scale bugs that sf0.01
gating can hide (the r5 stream_static_refresh lesson).

--parallel N runs side-effect-free queries through a thread pool of N
workers sharing the SparkSession (concurrent job submission is supported;
each worker gets its own DuckDB cursor). Queries that mutate session state
(conf toggles, catalog tables, streaming runs, on-disk fixture caches) are
detected by source inspection and always run serially afterwards — their
semantics assume exclusive use of the session.
"""

from __future__ import annotations

import argparse
import inspect
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

from amazonbigdata_for_students_spark.plans import REGISTRY
from amazonbigdata_for_students_spark.session import get_spark
from amazonbigdata_for_students_spark.testing import compare_query, duckdb_connect

SF_DIR = "/root/testdata/sf0.01"

# Source markers that make a query unsafe to run concurrently with others
# on a shared session: global conf flips, catalog/table mutation, streaming
# queries (checkpoint + state dirs), and on-disk fixture builds.
_SERIAL_MARKERS = (
    "spark.conf.set",
    "writeStream",
    "foreachBatch",
    "saveAsTable",
    "refreshTable",
    "refreshByPath",
    "_cache_dir",
    "shutil.rmtree",
    "createOrReplaceTempView",
)


def _needs_serial(q) -> bool:
    try:
        src = inspect.getsource(q.fn)
    except (OSError, TypeError):
        return True
    return any(m in src for m in _SERIAL_MARKERS)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parallel", type=int, default=1, metavar="N")
    ap.add_argument("--sf", default=SF_DIR, metavar="DIR")
    ap.add_argument("filters", nargs="*")
    args = ap.parse_args()

    sf_dir = args.sf
    spark = get_spark(cpus=8)
    con = duckdb_connect(sf_dir)
    names = [
        n for n in REGISTRY if not args.filters or any(f in n for f in args.filters)
    ]
    t_start = time.time()
    results: dict[str, tuple[bool, float, str]] = {}

    def run_one(name: str, cursor) -> None:
        t0 = time.time()
        try:
            res = compare_query(spark, REGISTRY[name], sf_dir, cursor)
            results[name] = (res.ok, time.time() - t0, res.detail)
        except Exception as exc:  # noqa: BLE001 — dev tool, report and continue
            results[name] = (False, time.time() - t0, f"{type(exc).__name__}: {exc}")

    if args.parallel > 1:
        par = [n for n in names if not _needs_serial(REGISTRY[n])]
        ser = [n for n in names if n not in set(par)]
        with ThreadPoolExecutor(max_workers=args.parallel) as pool:
            futs = [pool.submit(run_one, n, con.cursor()) for n in par]
            for f in futs:
                f.result()
    else:
        par, ser = [], names

    for name in ser:
        run_one(name, con)

    failures = 0
    for name in names:
        ok, dt, detail = results[name]
        if not ok:
            failures += 1
        print(f"{'ok  ' if ok else 'FAIL'} {name:32s} {dt:6.2f}s  {detail}")
    print(
        f"\n{len(names) - failures}/{len(names)} queries match "
        f"({time.time() - t_start:.0f}s wall, {len(par)} parallel + {len(ser)} serial)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
