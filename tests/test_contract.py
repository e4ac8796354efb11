"""Driver-contract shape tests: entry/queries/oracle_sql."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 50
    # every oracle key is a query; non-oracle queries are the documented few
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    for name in rows_only:
        assert name in qs


ALL_SURVEY_OPS = frozenset(
    [f"S{i}" for i in range(1, 12)]
    + [f"P{i}" for i in range(1, 7)]
    + [f"J{i}" for i in range(1, 11)]
    + [f"A{i}" for i in range(1, 10)]
    + [f"W{i}" for i in range(1, 5)]
    + [f"O{i}" for i in range(1, 4)]
    + [f"E{i}" for i in range(1, 4)]
    + [f"F{i}" for i in range(1, 9)]
    + [f"T{i}" for i in range(1, 9)]
    + [f"U{i}" for i in range(1, 7)]
)


def test_priority_prefix_covers_all_operators():
    """The driver verifies the first 50 registry entries; that window must
    set-cover every SURVEY.md §2 operator id (VERDICT r1+r2 item 1)."""
    from amazonbigdata_for_students_spark.plans import DRIVER_PRIORITY, REGISTRY

    assert len(ALL_SURVEY_OPS) == 68
    first50 = list(REGISTRY)[:50]
    assert first50 == list(DRIVER_PRIORITY)[:50]
    covered = {tag for name in first50 for tag in REGISTRY[name].tags}
    assert ALL_SURVEY_OPS <= covered, f"uncovered ops: {sorted(ALL_SURVEY_OPS - covered)}"


def test_query_callables_run(spark, sf_small):
    qs = entrymod.queries()
    # spot-run one query per family through the public contract
    for name in ("q1_pricing_summary", "win_topn_per_group", "txt_token_stats", "vec_cosine_topk"):
        df = qs[name](spark, sf_small)
        assert df.count() >= 0
