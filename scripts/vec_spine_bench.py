#!/usr/bin/env python
"""sf100 spill-regime pass for the similarity-search / ANN lane.

Same protocol as scripts/llm_spine_bench.py (control SF and scale SF in
ONE warm session, per-stage spill/shuffle counters from the UI REST
API), pointed at the vector lane: the embeddings table is the only
input, so the scale fixture is generated with
``gen_sf.py --sf 100 --tables embeddings`` (2M 64-dim vectors, ~500 MB
— 1000x the bench-scale embeddings).

The lane's scale story differs from the LLM-text spine: every ANN
variant is a candidates-then-verify plan whose candidate stage must
stay bucketed (IVF probes, PQ cells, Hamming bands, JL projections),
and every dedup variant is cell-blocked pairwise. A quadratic slip
that is invisible at 2k vectors is a wall at 2M — which is what this
pass exists to catch.

Usage: python scripts/vec_spine_bench.py [--control DIR] [--scale DIR] [--width N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_spine_bench import run_spine  # noqa: E402  (sibling script)

SPINE = [
    # exact baseline: one full scan per query vector, broadcast query side
    "vec_cosine_topk",
    "vec_topk_mapinarrow",
    # ANN family: each a different candidate-stage shape
    "vec_ann_ivf_kmeans_topk",
    "vec_ann_pq_topk",
    "vec_binary_hamming_topk",
    "vec_random_projection_recall",
    # near-dup dedup, the cell-bounded scale path (K grows as N/256 so the
    # within-cell pairwise join is bounded work; the N x K seed assignment
    # is the stage to watch here)
    "dedup_semantic_clusters",
]

# The exact label-blocked pairwise trio is NOT in the sf100 spine: with a
# CONSTANT 10-label blocking key, blocks grow linearly with N and the pair
# stage is O(N^2/10) — at 2M vectors that's ~200B 64-dim dot products.
# They are this lane's explicit quadratic audit arms (same policy as the
# text lane's dedup_span_ngrams / join_range stress variants); run them at
# --scale .localdata/sf10vec via --queries to measure the wall they hit.
AUDIT_ARMS = [
    "vec_neardup_pairs",
    "dedup_embedding_cosine",
    "dedup_cosine_threshold_sweep",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--control", default="/root/testdata/sf0.1")
    ap.add_argument("--scale", default=".localdata/sf100vec")
    ap.add_argument("--width", default=None, help="shuffle partitions override")
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    args = ap.parse_args()
    if args.width:
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = args.width
    aliases = {"audit": AUDIT_ARMS, "spine": SPINE}
    if args.queries:
        # resolve aliases per-token so "audit,vec_cosine_topk" works too
        names = [
            n
            for tok in args.queries.split(",")
            if tok.strip()
            for n in aliases.get(tok.strip(), [tok.strip()])
        ]
    else:
        names = SPINE
    run_spine(names, [("control", args.control), ("scale", args.scale)],
              app_name="vec_spine_bench")


if __name__ == "__main__":
    main()
