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


def _driver_green_names():
    """Query names with a fully-green row in any past driver CORRECTNESS file."""
    import glob
    import json
    import os

    names = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                # ADVICE r4: a row counts as evidence only if fully green —
                # rows AND schema AND value-hash all matched, no error.
                if (
                    row.get("rows_match")
                    and row.get("err") is None
                    and row.get("hash_match", True)
                    and row.get("schema_match", True)
                ):
                    names.add(name)
    return names


def test_priority_prefix_covers_all_operators():
    """The driver verifies the first 50 registry entries per round. The window
    rotates (round 4+) to accumulate external evidence over the whole
    registry, so the invariant is CUMULATIVE: queries already driver-green in
    past rounds plus the current window must set-cover every SURVEY.md §2
    operator id (VERDICT r1+r2 item 1)."""
    from amazonbigdata_for_students_spark.plans import DRIVER_PRIORITY, REGISTRY

    assert len(ALL_SURVEY_OPS) == 68
    first50 = list(REGISTRY)[:50]
    assert first50 == list(DRIVER_PRIORITY)[:50]
    evidence = _driver_green_names() | set(first50)
    covered = {tag for name in evidence if name in REGISTRY for tag in REGISTRY[name].tags}
    assert ALL_SURVEY_OPS <= covered, f"uncovered ops: {sorted(ALL_SURVEY_OPS - covered)}"


def test_priority_prefix_is_oracle_backed_and_fresh():
    """Every window slot must carry a DuckDB oracle (hash-checkable by the
    driver), and the rotation must spend slots on queries without prior
    driver evidence — at most a handful of repeats are tolerated."""
    import __spark_entry__ as em

    from amazonbigdata_for_students_spark.plans import DRIVER_PRIORITY

    oracles = em.oracle_sql()
    missing = [n for n in DRIVER_PRIORITY if n not in oracles]
    assert not missing, f"window entries without oracle: {missing}"
    repeats = [n for n in DRIVER_PRIORITY if n in _driver_green_names()]
    assert len(repeats) <= 5, f"window wastes slots on already-green queries: {repeats}"


def test_query_callables_run(spark, sf_small):
    qs = entrymod.queries()
    # spot-run one query per family through the public contract
    for name in ("q1_pricing_summary", "win_topn_per_group", "txt_token_stats", "vec_cosine_topk"):
        df = qs[name](spark, sf_small)
        assert df.count() >= 0


def test_cli_list_and_check(spark, capsys):
    # The CLI surfaces the same registry: list needs no session; check
    # runs the oracle compare in-process against the active session.
    from amazonbigdata_for_students_spark import cli

    assert cli.main(["list", "q1_"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "sql-oracle" in out

    from .conftest import SF_SMALL

    width_before = spark.conf.get("spark.sql.shuffle.partitions")
    assert cli.main(["check", "q1_pricing_summary", "--sf", SF_SMALL]) == 0
    out = capsys.readouterr().out
    assert "1/1 match" in out
    # Embedded use must NOT clobber the host session's parallelism — a
    # builder.getOrCreate() with our defaults would silently set 32 here
    # (that leak once broke an AQE plan-shape test downstream).
    assert spark.conf.get("spark.sql.shuffle.partitions") == width_before

    assert cli.main(["run", "no_such_query"]) == 2
