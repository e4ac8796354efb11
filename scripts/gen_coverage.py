#!/usr/bin/env python
"""Regenerate COVERAGE.md: the SURVEY.md §2 operator inventory cross-
referenced against the live query registry (which queries exercise each
operator, and whether each has a DuckDB oracle twin).

    python scripts/gen_coverage.py > COVERAGE.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from amazonbigdata_for_students_spark.plans import REGISTRY

# SURVEY.md §2 inventory: id -> (section, one-line description)
OPERATORS: dict[str, tuple[str, str]] = {
    "S1": ("2.1 Sources/sinks", "CSV batch scan (hourly YYYY/MM/DD/HH.csv layout)"),
    "S2": ("2.1 Sources/sinks", "JSON-lines stream scan"),
    "S3": ("2.1 Sources/sinks", "JSON catalog-table scan (partitioned external table)"),
    "S4": ("2.1 Sources/sinks", "Dimension CSV scan (items/users)"),
    "S5": ("2.1 Sources/sinks", "KV-table scan with TTL (suspicious IPs)"),
    "S6": ("2.1 Sources/sinks", "Partitioned long-term sink (Firehose semantics)"),
    "S7": ("2.1 Sources/sinks", "KV sink with TTL"),
    "S8": ("2.1 Sources/sinks", "Alert/notification sink"),
    "S9": ("2.1 Sources/sinks", "Incremental scan (job bookmarks)"),
    "S10": ("2.1 Sources/sinks", "Schema inference / crawler with drift logging"),
    "S11": ("2.1 Sources/sinks", "Parquet scan/sink (analytical layer)"),
    "P1": ("2.2 Projection/filter", "Column projection / rename"),
    "P2": ("2.2 Projection/filter", "Predicate filter"),
    "P3": ("2.2 Projection/filter", "IP filter (anti-membership)"),
    "P4": ("2.2 Projection/filter", "NULL-sentinel normalization"),
    "P5": ("2.2 Projection/filter", "Derived/computed columns (ts parts, device split)"),
    "P6": ("2.2 Projection/filter", "Spam classification filter"),
    "J1": ("2.3 Joins", "Broadcast equi-join (dimension enrichment)"),
    "J2": ("2.3 Joins", "Left anti join (exclude suspicious IPs)"),
    "J3": ("2.3 Joins", "Left semi join / membership"),
    "J4": ("2.3 Joins", "Stream-static join"),
    "J5": ("2.3 Joins", "Stream-stream join (watermarked, range-bounded)"),
    "J6": ("2.3 Joins", "Outer joins (left/full)"),
    "J7": ("2.3 Joins", "Large-x-large shuffle equi-join"),
    "J8": ("2.3 Joins", "Theta/range join"),
    "J9": ("2.3 Joins", "As-of join"),
    "J10": ("2.3 Joins", "Cross join"),
    "A1": ("2.4 Aggregations", "Hash aggregate: count per key"),
    "A2": ("2.4 Aggregations", "Rate-per-window aggregate (bot threshold)"),
    "A3": ("2.4 Aggregations", "Multi-metric aggregate (avg/min/max/sum)"),
    "A4": ("2.4 Aggregations", "Distinct + count-distinct"),
    "A5": ("2.4 Aggregations", "Approx count-distinct (HLL)"),
    "A6": ("2.4 Aggregations", "Grouping sets / rollup / cube / pivot"),
    "A7": ("2.4 Aggregations", "Partial→final distributed aggregation"),
    "A8": ("2.4 Aggregations", "Collect-list/set aggregate"),
    "A9": ("2.4 Aggregations", "Percentiles / median"),
    "W1": ("2.5 Window functions", "Ranking (top-N per group)"),
    "W2": ("2.5 Window functions", "Lag/lead (inter-event gap)"),
    "W3": ("2.5 Window functions", "Frame-spec aggregates (rolling)"),
    "W4": ("2.5 Window functions", "ntile / percent_rank"),
    "O1": ("2.6 Sort/limit", "Global sort by event time"),
    "O2": ("2.6 Sort/limit", "Top-k (sort+limit)"),
    "O3": ("2.6 Sort/limit", "Per-group top-k"),
    "E1": ("2.7 Set ops", "Union by name"),
    "E2": ("2.7 Set ops", "Intersect / except"),
    "E3": ("2.7 Set ops", "Dedup (exact rows)"),
    "F1": ("2.8 Scalar functions", "Timestamp/date functions"),
    "F2": ("2.8 Scalar functions", "String functions"),
    "F3": ("2.8 Scalar functions", "JSON functions"),
    "F4": ("2.8 Scalar functions", "Math functions"),
    "F5": ("2.8 Scalar functions", "Conditional/null functions"),
    "F6": ("2.8 Scalar functions", "Casting"),
    "F7": ("2.8 Scalar functions", "Array/map + higher-order functions"),
    "F8": ("2.8 Scalar functions", "Hash functions / stable keys"),
    "T1": ("2.9 Streaming", "Tumbling window aggregate"),
    "T2": ("2.9 Streaming", "Sliding window aggregate"),
    "T3": ("2.9 Streaming", "Session window"),
    "T4": ("2.9 Streaming", "Watermark / late data"),
    "T5": ("2.9 Streaming", "Stateful threshold alerting (alert-once)"),
    "T6": ("2.9 Streaming", "Streaming dedup (at-least-once delivery)"),
    "T7": ("2.9 Streaming", "State TTL"),
    "T8": ("2.9 Streaming", "Exactly-once partitioned sink"),
    "U1": ("2.10 UDF surface", "Spam-classifier pandas UDF / model seam"),
    "U2": ("2.10 UDF surface", "Text tokenizer / quality / lang-id / fingerprint"),
    "U3": ("2.10 UDF surface", "Python UDAF (applyInPandas)"),
    "U4": ("2.10 UDF surface", "UDTF-style expansion"),
    "U5": ("2.10 UDF surface", "Similarity search (cosine top-k, ANN)"),
    "U6": ("2.10 UDF surface", "Near-duplicate dedup (MinHash/SimHash/Jaccard)"),
}


def driver_rounds() -> tuple[dict[str, int], int]:
    """(query -> LATEST fully-green driver round, number of CORRECTNESS
    files present) — the round map comes from the ONE shared predicate in
    plans.driver_green_rounds, so the freshness tags can never disagree
    with the rotation window about what counts as green."""
    import glob
    import os

    from amazonbigdata_for_students_spark.plans import driver_green_rounds

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    return driver_green_rounds(), len(files)


def validate(text: str, root: str) -> list[str]:
    """Freshness problems in a committed COVERAGE.md, [] if clean.

    VERDICT r9 item 1: the old guard demanded the committed header's
    CORRECTNESS-file count equal the on-disk count, which the driver's
    post-final-commit drop always broke (r8, r9). New semantics: the
    committed file may have been generated from a PREFIX of the on-disk
    CORRECTNESS files (driver dropped a newer one) — that is fine; what
    fails is (a) the committed count exceeding on-disk (impossible unless
    stale/hand-edited), (b) registry drift (missing queries / wrong
    total), or (c) the table body disagreeing with a regen from the same
    file prefix the header claims."""
    import glob
    import os
    import re

    from amazonbigdata_for_students_spark.plans import (
        REGISTRY,
        driver_green_rounds,
    )

    problems: list[str] = []
    m = re.search(r"Registry: \*\*(\d+) queries\*\*", text)
    if not m:
        return ["COVERAGE.md header count missing — regenerate"]
    if int(m.group(1)) != len(REGISTRY):
        problems.append(
            f"COVERAGE.md says {m.group(1)} queries but registry has "
            f"{len(REGISTRY)} — run: python scripts/gen_coverage.py > COVERAGE.md"
        )
    missing = [n for n in REGISTRY if f"`{n}`" not in text]
    if missing:
        problems.append(f"queries missing from COVERAGE.md: {missing[:10]}")

    m2 = re.search(r"parsed from (\d+) CORRECTNESS files: \*\*(\d+)/(\d+) queries", text)
    if not m2:
        return problems + ["driver-verdict header missing — regenerate"]
    n_committed = int(m2.group(1))
    n_disk = len(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if n_committed > n_disk:
        problems.append(
            f"committed header claims {n_committed} CORRECTNESS files but only "
            f"{n_disk} exist on disk — stale or hand-edited; regenerate"
        )
        return problems
    # Re-derive the snapshot the committed file was generated from: the
    # first n_committed files in sorted order. A newer driver drop beyond
    # that prefix is expected between the final commit and the next round.
    rounds = driver_green_rounds(root=root, limit_files=n_committed)
    n_green = sum(1 for n in REGISTRY if n in rounds)
    if (int(m2.group(2)), int(m2.group(3))) != (n_green, len(REGISTRY)):
        problems.append(
            f"driver-green count drifted: committed {m2.group(2)}/{m2.group(3)} "
            f"vs recomputed {n_green}/{len(REGISTRY)} from the same "
            f"{n_committed}-file prefix — regenerate"
        )
    for name, rn in list(rounds.items())[:5]:
        if name in REGISTRY and (
            f"`{name}`(o,r{rn})" not in text and f"`{name}`(r,r{rn})" not in text
        ):
            problems.append(f"{name}: round tag r{rn} missing/stale in COVERAGE.md")
    return problems


def main() -> None:
    by_tag: dict[str, list] = {t: [] for t in OPERATORS}
    for q in REGISTRY.values():
        for t in q.tags:
            by_tag.setdefault(t, []).append(q)

    rounds, n_files = driver_rounds()
    n_green = sum(1 for n in REGISTRY if n in rounds)
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    print("# COVERAGE — SURVEY.md §2 operator inventory vs. the query registry")
    print()
    print("Generated by `python scripts/gen_coverage.py` — do not hand-edit.")
    print(f"Registry: **{len(REGISTRY)} queries**, {n_oracle} with DuckDB oracle twins")
    print("(the rest are rows-only checks: approximate/streaming-stateful ops).")
    print("Every query is driven by the driver contract (`__spark_entry__.queries()`)")
    print("and the pytest oracle gate (`tests/test_oracle.py`,")
    print("`scripts/check_oracle.py`).")
    print()
    print(
        f"Driver verdicts parsed from {n_files} CORRECTNESS files: "
        f"**{n_green}/{len(REGISTRY)} queries driver-green**; each query below"
    )
    print(
        "carries its LATEST green driver round (`rN`) or `·` if it has not"
        " yet rotated through the driver's 50-query window."
    )
    print()
    print("| Op | Operator | Queries (o=oracle-checked, r=rows-only; rN=driver round) |")
    print("|---|---|---|")
    section = None
    for tag, (sec, desc) in OPERATORS.items():
        if sec != section:
            section = sec
            print(f"| **§{sec}** | | |")
        qs = ", ".join(
            f"`{q.name}`({'o' if q.oracle else 'r'},"
            f"{'r%d' % rounds[q.name] if q.name in rounds else '·'})"
            for q in by_tag.get(tag, [])
        )
        print(f"| {tag} | {desc} | {qs or '—'} |")
    missing = [t for t, qs in by_tag.items() if t in OPERATORS and not qs]
    print()
    print(f"Uncovered operators: {missing or 'none'}.")


if __name__ == "__main__":
    main()
