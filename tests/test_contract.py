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


def test_query_callables_run(spark, sf_small):
    qs = entrymod.queries()
    # spot-run one query per family through the public contract
    for name in ("q1_pricing_summary", "win_topn_per_group", "txt_token_stats", "vec_cosine_topk"):
        df = qs[name](spark, sf_small)
        assert df.count() >= 0
