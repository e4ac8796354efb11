#!/usr/bin/env python
"""Dev loop: run every registered query against its DuckDB oracle at sf0.01
(the same comparison the driver's correctness gate performs). Usage:

    python scripts/check_oracle.py [query-name-substring ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from amazonbigdata_for_students_spark.plans import REGISTRY
from amazonbigdata_for_students_spark.session import get_spark
from amazonbigdata_for_students_spark.testing import compare_query, duckdb_connect

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    filters = sys.argv[1:]
    spark = get_spark(cpus=8)
    con = duckdb_connect(SF_DIR)
    names = [
        n for n in REGISTRY if not filters or any(f in n for f in filters)
    ]
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            res = compare_query(spark, REGISTRY[name], SF_DIR, con)
        except Exception as exc:  # noqa: BLE001 — dev tool, report and continue
            failures += 1
            print(f"ERROR {name}: {type(exc).__name__}: {exc}")
            continue
        status = "ok  " if res.ok else "FAIL"
        if not res.ok:
            failures += 1
        print(f"{status} {name:32s} {time.time() - t0:6.2f}s  {res.detail}")
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
