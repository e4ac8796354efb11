#!/usr/bin/env python
"""Skew-stress measurement: straggler ratios + AQE-vs-salted join evidence.

The reference's bot signature creates hot keys BY CONSTRUCTION
(log-generator/generator.py:137-154: a bot emits ~60 ev/s against a
human's ~0.1), but gen_sf.py's fitted distributions are uniform — so the
headline walls never show what a Zipf head does to a shuffle. This script
runs the skew-sensitive shapes on a uniform fixture and on a
``--hot-frac`` fixture (one user_id owning ~10% of events) and records,
per probe:

* wall seconds (min of 2 runs),
* the straggler ratio of the worst stage (max task duration / median
  task duration, stages with >= 4 tasks — read from the Spark UI REST
  API, which is why this script turns the UI on),
* whether AQE skew handling fired (``skew=true`` in the executed SMJ).

Probes:

* ``join_user_dim_smj``       events x user-dim SMJ on user_id, broadcast
                              disabled — the canonical skew-join victim
* ``  + skewJoin disabled``   same, AQE skew splitting off (the straggler
                              baseline AQE is supposed to beat)
* ``  + salted``              operators/skew.salted_join fallback (what
                              streaming micro-batches must use — AQE skew
                              splitting never applies there)
* ``clk_sessionize``          per-user window: a hot key is UNSPLITTABLE
                              for exact session semantics — measured, not
                              hidden
* ``salted_hot_key_agg``      two-phase salted agg on the 5-value
                              event_type key (always maximally hot)
* ``join_large_facts`` / ``q5_local_supplier_volume``  controls — keyed on
                              orderkey/custkey, untouched by events skew

Usage:
    python scripts/gen_sf.py --sf 10 --out .localdata/sf10
    python scripts/gen_sf.py --sf 10 --out .localdata/sf10hot --hot-frac 0.1
    python scripts/skew_bench.py --uniform .localdata/sf10 \
        --skewed .localdata/sf10hot
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from amazonbigdata_for_students_spark.session import get_spark


def _api(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def _completed_stage_ids(spark) -> set[int]:
    try:
        return {s["stageId"] for s in _api(spark, "/stages?status=COMPLETE")}
    except Exception:
        return set()


def _straggler_ratio(spark, new_stage_ids: set[int]) -> tuple[float, int, int]:
    """(worst max/median task-duration ratio, that stage's task count,
    its max task ms) over the given stages, >= 4 tasks only."""
    worst = (1.0, 0, 0)
    for sid in new_stage_ids:
        try:
            attempts = _api(spark, f"/stages/{sid}?details=true&taskStatus=SUCCESS")
        except Exception:
            continue
        for att in attempts:
            tasks = att.get("tasks") or {}
            durs = sorted(t.get("duration", 0) for t in tasks.values())
            if len(durs) < 4 or durs[-1] == 0:
                continue
            med = statistics.median(durs)
            if med < 5:
                # a trivial stage (median task < 5ms) fabricates huge
                # ratios from scheduling jitter — never the skew signal
                continue
            ratio = durs[-1] / med
            if ratio > worst[0]:
                worst = (ratio, len(durs), durs[-1])
    return worst


def measure(spark, build, sf_dir: str, runs: int = 2, eager_build: bool = False) -> dict:
    best = float("inf")
    skew_fired = False
    ratio_info = (1.0, 0, 0)
    for _ in range(runs):
        # a bounded global agg OVER the probe: .count() would execute a
        # DERIVED QueryExecution, leaving the probe df's own plan
        # unexecuted and the skew=true check vacuously False — collect()
        # on this wrapper executes the probe's full subtree inside the
        # inspectable QueryExecution with a 1-row result
        if eager_build:
            # streaming twins do their work INSIDE build() (_drain runs
            # the stream to completion eagerly): the timer and the stage
            # snapshot must bracket build(), or the probe only measures
            # the drained-table readout
            before = _completed_stage_ids(spark)
            t0 = time.time()
            df = build(spark, sf_dir).agg(F.count(F.lit(1)).alias("n"))
        else:
            df = build(spark, sf_dir).agg(F.count(F.lit(1)).alias("n"))
            # snapshot AFTER build(): probe builders may run eager setup jobs
            # (_user_dim's max(user_id) scan) whose stages must not pollute
            # the straggler attribution (/code-review r8 find)
            before = _completed_stage_ids(spark)
            t0 = time.time()
        df.collect()
        wall = time.time() - t0
        final = df._jdf.queryExecution().executedPlan().toString()
        skew_fired = skew_fired or ("skew=true" in final)
        if wall < best:
            best = wall
            time.sleep(0.3)  # UI ingestion lag
            ratio_info = _straggler_ratio(spark, _completed_stage_ids(spark) - before)
    return {
        "wall_sec": round(best, 2),
        "straggler_ratio": round(ratio_info[0], 1),
        "worst_stage_tasks": ratio_info[1],
        "worst_task_ms": ratio_info[2],
        "aqe_skew_fired": skew_fired,
    }


def _user_dim(spark, sf_dir: str) -> DataFrame:
    n_users = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .agg(F.max("user_id"))
        .collect()[0][0]
        + 1
    )
    return spark.range(n_users).select(
        F.col("id").alias("user_id"), (F.col("id") % 10).alias("segment")
    )


def join_user_dim_smj(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    dim = _user_dim(spark, sf_dir)
    return (
        ev.hint("merge")
        .join(dim, "user_id")
        .groupBy("segment")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
    )


def join_user_dim_salted(spark, sf_dir):
    from amazonbigdata_for_students_spark.operators.skew import salted_join

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    dim = _user_dim(spark, sf_dir)
    joined = salted_join(ev.select("user_id", "value"), dim, "user_id", salt_buckets=32)
    return joined.groupBy("segment").agg(
        F.count("*").alias("n"), F.sum("value").alias("sv")
    )


def registry_probe(name):
    from amazonbigdata_for_students_spark.plans import REGISTRY

    return REGISTRY[name].fn


# Both static AND adaptive broadcast thresholds must be off for the SMJ
# probes, or AQE silently converts the sort-merge join to a runtime
# broadcast (the dim is ~2MB) and there is no skewed shuffle left to
# split — the exact setup test_plan_shapes.test_aqe_splits_skewed_join_
# partition uses.
_NO_BCAST = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}

PROBES: list[tuple[str, object, dict]] = [
    ("join_user_dim_smj[aqe_skew]", join_user_dim_smj, dict(_NO_BCAST)),
    (
        # default AQE thresholds (256MB / 5x median) are sized for
        # cluster-scale partitions; at a local-mode sf the hot
        # partition is single-digit MB after shuffle compression (a constant hot key + doubles compress hard), so this variant scales the
        # thresholds the way a 100 TB deployment's defaults relate
        # to ITS partitions — the "does skew=true fire and win" probe
        "join_user_dim_smj[aqe_skew_tuned]",
        join_user_dim_smj,
        {
            **_NO_BCAST,
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        },
    ),
    (
        "join_user_dim_smj[no_skew_handling]",
        join_user_dim_smj,
        {**_NO_BCAST, "spark.sql.adaptive.skewJoin.enabled": "false"},
    ),
    (
        "join_user_dim_salted",
        join_user_dim_salted,
        {**_NO_BCAST, "spark.sql.adaptive.skewJoin.enabled": "false"},
    ),
    ("clk_sessionize", registry_probe("clk_sessionize"), {}),
    ("clk_sessionize_chunked", registry_probe("clk_sessionize_chunked"), {}),
    ("salted_hot_key_agg", registry_probe("salted_hot_key_agg"), {}),
    ("salted_hot_key_join", registry_probe("salted_hot_key_join"), {}),
    ("join_large_facts[control]", registry_probe("join_large_facts"), {}),
    ("q5_local_supplier_volume[control]", registry_probe("q5_local_supplier_volume"), {}),
    # r8 additions keyed on user_id — the hot-key victims of this fixture:
    # token bucket folds a per-user ordered ARRAY (the monster-key case its
    # docstring cites), concurrent-peak reduces users to 2 edges before any
    # window (should be immune), wilcoxon aggregates users to one |d| row.
    ("rate_limit_token_bucket", registry_probe("rate_limit_token_bucket"), {}),
    ("timeseries_concurrent_peak", registry_probe("timeseries_concurrent_peak"), {}),
    ("eval_wilcoxon_signed_rank", registry_probe("eval_wilcoxon_signed_rank"), {}),
    # r8 analytics-push additions keyed on user_id (hot-key victims) or
    # day (30-partition parallelism question): time-to-convert reduces a
    # user to one conditional-min row BEFORE ranking (should be immune),
    # growth accounting windows over DISTINCT (user, day) so the hot user
    # collapses to its active days, decayed engagement is a plain sum per
    # user (combiner handles the hot key), and SPRT's per-day walk puts
    # the hot user's volume inside ONE day partition's sort.
    ("clk_time_to_convert", registry_probe("clk_time_to_convert"), {}),
    ("clk_growth_accounting", registry_probe("clk_growth_accounting"), {}),
    ("win_decayed_engagement", registry_probe("win_decayed_engagement"), {}),
    ("eval_sprt_boundary", registry_probe("eval_sprt_boundary"), {}),
    # r9: the remaining r8 eval/timeseries grouping keys (VERDICT r8 item
    # 7). Kaplan-Meier reduces each user to ONE (min ts, max ts) span row
    # via a combiner before anything else touches the data (hot user =
    # one fat map-side partial, no fat shuffle partition); CUSUM and
    # Holt-Winters pre-aggregate events to (type, hour)/(type, day) cells
    # so user skew never reaches a shuffle key; TWAP is the one r8 shape
    # with a PER-EVENT window over the 5-value type key — always
    # maximally hot by construction (n/5 rows per partition, user skew
    # irrelevant), measured here as the unsplittable-window envelope the
    # same way clk_sessionize is.
    ("eval_kaplan_meier", registry_probe("eval_kaplan_meier"), {}),
    ("timeseries_cusum_changepoint", registry_probe("timeseries_cusum_changepoint"), {}),
    ("timeseries_holt_winters", registry_probe("timeseries_holt_winters"), {}),
    ("timeseries_twap", registry_probe("timeseries_twap"), {}),
    # the chunked treatment for TWAP's 2.1-2.4x straggler above
    ("timeseries_twap_chunked", registry_probe("timeseries_twap_chunked"), {}),
    # r9 session additions touching user_id: rolling WAU collapses the
    # hot user to its DISTINCT (user, day) rows (<= retention days)
    # before any window — immune by collapse; the windowed funnel's
    # chain is min-timestamp aggregates per user (combiner)
    ("clk_rolling_wau", registry_probe("clk_rolling_wau"), {}),
    ("clk_funnel_windowed", registry_probe("clk_funnel_windowed"), {}),
    # r9 second-session additions touching user_id: DiD/CUPED/Qini all
    # collapse users through map-side-combined aggregates (the variant
    # hash is a per-row expression, never a shuffle key), so the hot
    # user should be one fat partial, not a fat partition; Croston folds
    # a per-user ordered demand ARRAY — the token-bucket monster-key
    # shape, measured as that envelope.
    ("eval_diff_in_diff", registry_probe("eval_diff_in_diff"), {}),
    ("eval_cuped_adjustment", registry_probe("eval_cuped_adjustment"), {}),
    ("eval_qini_uplift", registry_probe("eval_qini_uplift"), {}),
    ("timeseries_croston", registry_probe("timeseries_croston"), {}),
    # r10 (VERDICT r9 item 6): the two r9 streaming monitors that carry
    # per-user state at volume — the Croston monitor folds each user's
    # ordered demand array in applyInPandasWithState (hot user = one
    # monster group inside a single state partition), the PSI monitor's
    # state is the bounded (type, win, bin, sbin) cube (user skew should
    # never reach its shuffle key) — and WL refinement, whose iterated
    # color-key joins put the hot user's degree into every round's
    # neighbor multiset.
    ("stream_croston_monitor", registry_probe("stream_croston_monitor"), {"_eager_build": True}),
    ("stream_psi_drift_monitor", registry_probe("stream_psi_drift_monitor"), {"_eager_build": True}),
    # WL joins eagerly between rounds (localCheckpoint barriers), so its
    # per-round color-key shuffles also happen inside build()
    ("graph_wl_refinement", registry_probe("graph_wl_refinement"), {"_eager_build": True}),
]


def run_fixture(fixture_name: str, sf_dir: str) -> None:
    """Single-fixture leg (run in its OWN process: one warm JVM per
    fixture, so the second fixture's controls aren't measured against a
    heap/GC state the first fixture left behind)."""
    spark = get_spark(app_name="skew_bench", extra_conf={"spark.ui.enabled": "true"})
    results: dict[str, dict] = {}
    for probe_name, fn, confs in PROBES:
        confs = dict(confs)
        eager = confs.pop("_eager_build", False)
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            results[f"{fixture_name}/{probe_name}"] = measure(
                spark, fn, sf_dir, eager_build=eager
            )
        finally:
            for k in confs:
                spark.conf.unset(k)
        r = results[f"{fixture_name}/{probe_name}"]
        print(
            f"{fixture_name:8s} {probe_name:40s} wall={r['wall_sec']:7.2f}s "
            f"straggler={r['straggler_ratio']:6.1f}x "
            f"(n_tasks={r['worst_stage_tasks']}, max_task={r['worst_task_ms']}ms) "
            f"skew_fired={r['aqe_skew_fired']}",
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps(results))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--uniform", required=True)
    ap.add_argument("--skewed", required=True)
    ap.add_argument("--one-fixture", nargs=2, metavar=("NAME", "DIR"), default=None)
    ap.add_argument(
        "--probes",
        default=None,
        help="comma-separated probe-name substrings; only matching probes run",
    )
    args = ap.parse_args()

    if args.probes:
        pats = [p for p in args.probes.split(",") if p]
        PROBES[:] = [
            row for row in PROBES if any(p in row[0] for p in pats)
        ]

    if args.one_fixture:
        run_fixture(*args.one_fixture)
        return

    import subprocess

    results: dict[str, dict] = {}
    for fixture_name, sf_dir in (("uniform", args.uniform), ("skewed", args.skewed)):
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--uniform",
                args.uniform,
                "--skewed",
                args.skewed,
                "--one-fixture",
                fixture_name,
                sf_dir,
            ]
            + (["--probes", args.probes] if args.probes else []),
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"fixture leg {fixture_name!r} failed (rc={proc.returncode})")
        for line in proc.stderr.splitlines():
            if line.startswith(fixture_name):
                print(line, flush=True)
        results.update(json.loads(proc.stdout.strip().splitlines()[-1]))

    print()
    print("| probe | uniform wall | skewed wall | skew/unif | skewed straggler | AQE skew fired |")
    print("|---|---|---|---|---|---|")
    for probe_name, _, _ in PROBES:
        u, s = results[f"uniform/{probe_name}"], results[f"skewed/{probe_name}"]
        print(
            f"| {probe_name} | {u['wall_sec']}s | {s['wall_sec']}s "
            f"| {round(s['wall_sec'] / max(u['wall_sec'], 1e-9), 2)}x "
            f"| {s['straggler_ratio']}x ({s['worst_stage_tasks']} tasks) "
            f"| {s['aqe_skew_fired']} |"
        )
    print()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
