#!/usr/bin/env python
"""Scaling sanity harness: build an Nx key-shifted replica of a testdata
sf dir under /tmp and time the headline (bench-flagged) queries on it.

    python scripts/scale_check.py [N] [src_sf_dir] [query ...]

Defaults: N=10, src=/root/testdata/sf0.1, queries=the bench-flagged
headline set (pass explicit registry names to time others). Results feed BASELINE.md's
"Scaling sanity" table — near-flat times mean the suite is
overhead-dominated; growth should stay sublinear in N for data-bound
queries (joins) because columnar scan + codegen + AQE absorb the rest.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amazonbigdata_for_students_spark.plans import REGISTRY
from amazonbigdata_for_students_spark.session import get_spark
from amazonbigdata_for_students_spark.sources.readers import load_table

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
# Key columns shifted per replica so joins/groupings keep realistic
# cardinality ratios instead of colliding.
SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build_replica(spark, src: str, dst: str, n: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        out = os.path.join(dst, f"{t}.parquet")
        if os.path.exists(out):
            continue
        df = load_table(spark, src, t)
        if t in SHIFT:
            parts = []
            for i in range(n):
                p = df
                for c in SHIFT[t]:
                    p = p.withColumn(c, F.col(c) + F.lit(i * 1_000_000_000))
                parts.append(p)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
        else:
            big = df
        big.write.mode("overwrite").parquet(out)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = f"/tmp/scale_{os.path.basename(os.path.normpath(src))}_x{n}"
    spark = get_spark(app_name=f"scale_check_x{n}")
    build_replica(spark, src, dst, n)
    names = sys.argv[3:] or [q.name for q in REGISTRY.values() if q.bench]
    for name in names:
        REGISTRY[name].fn(spark, dst).count()  # warm
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            REGISTRY[name].fn(spark, dst).count()
            best = min(best, time.time() - t0)
        print(f"x{n} {name:30s} {best:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
