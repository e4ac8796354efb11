#!/usr/bin/env python
"""Regenerate PLANS.md: executed physical plans (post-AQE) for the
flagship queries, with the scale-critical property each plan must show.

    python scripts/gen_plans.py > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazonbigdata_for_students_spark.plans import REGISTRY
from amazonbigdata_for_students_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query -> what the plan must demonstrate at 100 TB
SHOWCASE: dict[str, str] = {
    "q1_pricing_summary": (
        "Filter pushed into the parquet scan (PushedFilters), pruned ReadSchema, "
        "partial->final HashAggregate, one WholeStageCodegen span over the hot path."
    ),
    "q5_local_supplier_volume": (
        "Single fact-fact shuffle (lineitem join orders); customer/supplier carry NO "
        "broadcast hint — AQE converts them to BroadcastHashJoin at runtime from "
        "observed sizes, so the same plan degrades safely at 100x instead of OOMing."
    ),
    "join_bucketed_colocated": (
        "Both scans bucket-aware (SelectedBucketsCount); NO exchange on either join "
        "side — the fact shuffle was paid once at write time by bucketBy. The only "
        "exchange is the final aggregate's."
    ),
    "sort_topk": (
        "TakeOrderedAndProject instead of a global sort — top-k never materializes "
        "a total order."
    ),
    "win_topn_per_group": (
        "WindowGroupLimit (rank-limit pushdown): each partition keeps only the "
        "running top-N before the shuffle, so the window state is O(N) per group."
    ),
    "dedup_minhash_groups": (
        "Signature stage is MAP-ONLY (array_min over per-row transform — no "
        "explode, no shuffle, no SortAggregate); the ONLY exchange is the "
        "band-key groupBy. Near-dup search stays banded bucketing, never an "
        "O(n^2) pairwise join."
    ),
    "join_interval_buckets": (
        "Pure-range interval join runs as BroadcastHashJoin on the derived "
        "day bucket + residual filter — no CartesianProduct/"
        "BroadcastNestedLoopJoin anywhere; the events side never shuffles "
        "before the aggregate."
    ),
    "shard_by_token_budget": (
        "Distributed two-pass prefix sum: range partitioning supplies doc_id "
        "locality; the per-doc window partitions by _part; only the "
        "#partitions-row offsets frame passes through a single partition."
    ),
    "split_train_test": "Map-only: zero exchanges — split assignment is pure per-row hashing.",
    "decontaminate_overlap": (
        "Corpus side streams map-side through a broadcast join on the (bounded) "
        "benchmark shingle set; one aggregate."
    ),
    "q6_forecast_revenue": (
        "The scan-bandwidth probe: all three range predicates pushed to the parquet "
        "scan, 4-column pruned ReadSchema, exactly ONE exchange (the final "
        "aggregate's partial->final pair)."
    ),
    "q19_disjunctive_revenue": (
        "Disjunctive-pushdown stress: Catalyst derives the pushable residuals of the "
        "OR-of-ANDs — the quantity union reaches the lineitem scan, brand/size union "
        "the part scan — while the full disjunction evaluates once post-join."
    ),
    "join_shuffle_hash_hint": (
        "ShuffledHashJoin instead of SortMergeJoin: the hinted orders side builds a "
        "per-partition hash map, neither side pays an O(n log n) sort — the strategy "
        "for mid-sized × huge joins where broadcast won't fit."
    ),
    "q8_market_share": (
        "Widest join in the repo (8 tables): lineitem shuffles once on orderkey; "
        "nation/region are explicit broadcasts (O(1) tables), customer/supplier/part "
        "carry no hint and appear as AQE-converted BroadcastHashJoins at this SF — "
        "at 100x they degrade to shuffle joins instead of OOMing the driver."
    ),
    "q21_waiting_supplier": (
        "Semi + anti self-joins of lineitem both hash on l_orderkey with the suppkey "
        "inequality as a residual join condition — no cartesian stage, and the three "
        "passes over lineitem co-partition on the same key."
    ),
    "merge_upsert_scd1": (
        "MERGE INTO shape: union adds no exchange; ONE shuffle on the merge key "
        "feeds the latest-version-per-key window — the partitioning the next "
        "snapshot writer needs anyway."
    ),
    "profile_table": (
        "Every per-column statistic in ONE pass over the data (a single FileScan "
        "feeding an Expand-fed HashAggregate); the exchanges carry only distinct "
        "groups and the 1-row final, then a map-only inline() unpivot."
    ),
    "curriculum_stage_assign": (
        "Exact ntile(4) WITHOUT a single-partition global window: the only "
        "windows run over the value-domain histogram (distinct scores) and "
        "per-score row_number partitions; the doc stream joins the tiny "
        "cumulative frame and maps through the closed-form bucket formula."
    ),
    "dsir_importance_score": (
        "Both language models come out of ONE word-level aggregate; the "
        "vocabulary-sized count table joins back with NO forced broadcast "
        "(AQE decides), totals ride a 1-row broadcast; per-token ln is "
        "quantized to decimal before the order-independent per-doc sum."
    ),
    "dedup_shingle_containment": (
        "Undirected rare-shingle pair join (doc_a < doc_b, half the directed "
        "emission) with doc sizes riding the shingle rows; both orientations "
        "thresholded inside one projection BEFORE the explode — the pair table "
        "is built once, aggregated once, never re-joined. SPAN COLLAPSE (r7): "
        "heavy shingles group by posting signature and one weighted "
        "representative pairs per cohort — a 40-shingle boilerplate template "
        "emits its pairs once, not 40 times; shingle stream + census read from "
        "localCheckpoint (ExistingRDD, zero re-explodes of the corpus)."
    ),
    "timeseries_interpolate_linear": (
        "the three IGNORE-NULLS neighbor windows (prev value, prev/next hour, "
        "next value) share ONE sort on (event_type, h) — no re-sort between "
        "Window operators — and the gap grid joins back by broadcast, so "
        "interpolation costs one series-key shuffle plus windows."
    ),
    "dedup_semantic_clusters": (
        "seed assignment is MAP-ONLY (r10: an Arrow-batched exact integer "
        "matmul against the broadcast codebook, materialized once through the "
        "cell localCheckpoint — the census plan reads it back as ExistingRDD; "
        "the old crossJoin->window form shuffled the N x K joined relation, "
        "~15 TB at sf100), the within-cluster pair join keyed on cid "
        "(SortMergeJoin/BroadcastHashJoin on cid — never a cross join), and "
        "the final census aggregating per cid. Cluster count scales with N "
        "(max(8, N/256)) so the pair stage is ~256-member blocks."
    ),
    "dedup_span_ngrams": (
        "the duplicated-span count partial-aggregates map-side before its one "
        "span-keyed exchange; the coverage window partitions on doc_id (never "
        "a global window); and the final plan contains ZERO FileScans — the "
        "tokenize+explode-every-W-gram subtree is localCheckpointed once and "
        "all consumers (corpus-wide count, semi-join probe, final left join) "
        "read the materialized RDD. Guarded by tests/test_plan_shapes.py::"
        "test_span_dedup_partial_agg_before_span_shuffle."
    ),
    "lm_kneser_ney_bigram": (
        "the corpus-wide (w1,w2) bigram count materializes ONCE "
        "(localCheckpoint — the four consumers scan ExistingRDD, zero "
        "FileScans in the final plan; before this fix the corpus scan + "
        "explode + fact shuffle ran four times), every smoothing table then "
        "joins as a broadcast — prefix marginals, continuation counts, and "
        "the 1-row type total (the only BroadcastNestedLoopJoin, on a "
        "single-row side) — and the only hash exchanges left are the "
        "vocab-sized aggregates' own. Guarded by tests/test_plan_shapes.py::"
        "test_kneser_ney_vocab_sides_broadcast."
    ),
    "tokenizer_unigram_viterbi": (
        "The DP is COLUMN-WISE: 12 unrolled projection steps over the "
        "Heaps-law word table inside whole-stage codegen — no UDF, no "
        "per-position explode, no shuffle between dp steps; the only "
        "exchanges are the word/gram aggregates and the final histogram."
    ),
    "tokenizer_wordpiece_apply": (
        "Greedy longest-match unrolled over the word census with the "
        "learned vocab as ONE broadcast array column (not a literal per "
        "probe site); a plan barrier every 4 steps keeps the optimizer "
        "linear — the final plan reads the census from RDDs, zero "
        "FileScans under the unrolled steps."
    ),
    "eval_auc_mannwhitney": (
        "Exact ROC-AUC with ONE row-sized shuffle: the per-score groupBy "
        "(partial_sum map-side combine); the rank cumulation runs on the "
        "<=1001-row score histogram behind a SinglePartition exchange — "
        "the raw corpus is never sorted or windowed."
    ),
    "split_leakage_audit": (
        "Map-only MinHash signatures + split expression, one shuffle on "
        "the band key, no join — the audit costs exactly what the LSH "
        "dedup it composes costs; an empty result is the audit passing."
    ),
    "vec_random_projection_recall": (
        "The 64->16 JL projection is a nested higher-order expression "
        "inside codegen (no UDF, no training pass); the score table is "
        "checkpointed so the exact-space and projected-space top-k "
        "consumers share ONE full pass; the query row comes from a "
        "TakeOrdered(1) probe, not a second projection of the corpus."
    ),
    "corpus_build_pipeline_v7": (
        "Quality gate -> exact dedup -> split -> band-leakage quarantine "
        "in one plan: lang and n_tokens ride THROUGH the banded signature "
        "scan (r10 — nothing text-wide is checkpointed or re-joined; "
        "tokens materialize once and feed both size() and the minhash "
        "signatures), the 5-column banded table is the one checkpoint at "
        "its 3-consumer fan-out, the quarantine is a distinct + left-semi "
        "join on the band key, and the final accounting is a 3-row "
        "groupBy — no stage rescans the corpus (sf100: 316->94 s)."
    ),
    "quality_gopher_rules": (
        "Map-only: zero exchanges — every Gopher gate is an integer "
        "cross-multiplication inside one codegen span over the scan."
    ),
    "engine_cost_whatif": (
        "The candidate-ranking plan reads ONLY the localCheckpoint-"
        "materialized 1-row stats relation (zero FileScans, plan-pinned): "
        "all four base tables were aggregated exactly once in the stats "
        "job, and the 8 Selinger branches + rank window run over "
        "broadcast-sized data."
    ),
    "geo_radius_join_salted": (
        "Hot-cell set joins as BroadcastHashJoin (grid-bounded); the salted "
        "(cy, cx, salt) equi-join must never degrade to a nested-loop join; "
        "per-task candidate groups bounded by the salt fan-out."
    ),
    "timeseries_resample_ohlc": (
        "ONE hash exchange total: the (type, bar) window and the bar aggregate "
        "share clustering, so OHLC costs a single shuffle over the scan."
    ),
    "agg_kmv_intersection": (
        "WindowGroupLimit under the per-set ranking: only k rows per set "
        "survive any exchange — the sketch property that makes it mergeable; "
        "sketch algebra is k-row arithmetic on 1-row-broadcast joins."
    ),
    "dq_drift_psi": (
        "ONE FileScan of events for both windows and both binnings (the "
        "compact cube aggregate); everything downstream is cube-sized — "
        "grid join, smoothing, and the decimal-summed PSI terms."
    ),
    "sql_lateral_join": (
        "The correlated LATERAL subquery is fully decorrelated: one ranked "
        "window join (WindowGroupLimit bounds per-group state), nothing "
        "executes per outer row — no nested-loop stage in the plan."
    ),
    "agg_pareto_abc": (
        "ABC classes over the shared registry.global_prefix two-pass rank: the "
        "only SinglePartition exchanges carry the #buckets-row offsets window and "
        "the 1-row grand total — the part dimension never funnels through one task."
    ),
    "eval_average_precision": (
        "Ranked-retrieval AP over the same two-pass distributed rank; after the "
        "checkpoint materializes, no documents rescan survives and the whole "
        "metric is one aggregate."
    ),
    "eval_bootstrap_ci": (
        "All 40 Poisson replicates in ONE map pass: 80 conditional sums partial-"
        "aggregate map-side, no explode, no join — the shuffle carries one "
        "82-column row per partition regardless of volume."
    ),
    "timeseries_holt_winters": (
        "The triple-smoothing fold (rotating 7-slot seasonal array) runs inside "
        "codegen per series key after one (type, day) map-side-combined count; "
        "one shuffle total."
    ),
    "graph_clustering_coefficient": (
        "Degree-oriented wedge enumeration (O(m^1.5) bound) read from eager "
        "checkpoints by every consumer; per-node attribution costs one narrow "
        "explode+aggregate over closed triangles, never a second enumeration."
    ),
    "eval_sprt_boundary": (
        "The sequential walk's running sum and row_number partition by day — "
        "per-partition sorts, one integer of state per walk, bounded output."
    ),
    "dedup_lsh_precision_audit": (
        "The audit is LINEAR by construction: only the (member -> canonical) "
        "collapse pairs the dedup would perform are verified — candidate volume "
        "equals the rows deleted, not bucket^2; the intersection join is keyed."
    ),
}


def main() -> None:
    spark = get_spark(app_name="gen_plans")
    print("# PLANS — executed physical plans of the flagship queries")
    print()
    print(f"Generated by `python scripts/gen_plans.py` at {SF_DIR} — do not hand-edit.")
    print("Plans are post-execution (AQE-final); `== Initial Plan ==` sections trimmed.")
    for name, claim in SHOWCASE.items():
        df = REGISTRY[name].fn(spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0].rstrip()
        print(f"\n## {name}\n")
        print(f"**Must show:** {claim}\n")
        print("```")
        print(plan)
        print("```")


if __name__ == "__main__":
    main()
