#!/usr/bin/env python
"""Generate a REAL scale-factor dataset (default sf1) with the testdata
schema — not a key-shifted replica.

Every column is a deterministic pure-JVM expression over ``spark.range``:
xxhash64(id, salt) drives all pseudo-randomness, so generation is fully
distributed (no driver-side RNG loop, no collect), reproducible, and
scales linearly with executors — the same generator shape you'd run for
a 100 TB backfill. Distributions are fit to the committed testdata
(/root/testdata/sf0.1) so plans exercised at sf1 match the bench suite:

* orders: uniform status O/P/F, uniform dates 1995..2001-08
* lineitem: lines-per-order ~ Poisson(4) truncated >=1 (inverse CDF),
  uniform qty 1..50, independent shipdate (matches testdata: datediff
  order->ship spans -2399..+2496 days)
* events: uniform 5 event types over 30 days of 2024-01, value ~
  Exp(mean 50) truncated at ~560
* documents: 8..100 words from the 30-word testdata vocab + the rare
  'dup' token; ~1/600 docs exactly duplicate their predecessor (the
  dedup family needs real dup structure)
* embeddings: 64-dim float32, 10 hash-seeded cluster centers + triangular
  noise (sum of 3 uniforms), matching the labeled-cluster shape

Usage:
    python scripts/gen_sf.py [--sf 1.0] [--out .localdata/sf1]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, functions as F

from amazonbigdata_for_students_spark.session import get_spark

SRC_DIMS = "/root/testdata/sf0.1"  # region/nation are fixed dims — copy shape

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
MKTSEGMENTS = ["MACHINERY", "FURNITURE", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
PTYPES = ["ECONOMY", "MEDIUM", "LARGE", "STANDARD", "PROMO", "SMALL"]
PNOUNS = ["ring", "bolt", "screw", "washer", "nut", "gear", "rod", "plate"]
PADJS = ["large", "hot", "blue", "red", "green", "small", "cold", "dark"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "fr", "de", "es", "zh"]

# inverse CDF of Poisson(4) truncated to >=1 (fit: testdata's empirical
# lines-per-order matches this to 3 decimals), capped at 17
_P4 = [math.exp(-4) * 4**k / math.factorial(k) for k in range(1, 18)]
_P4 = [p / sum(_P4) for p in _P4]
_CDF = []
acc = 0.0
for p in _P4[:-1]:
    acc += p
    _CDF.append(round(acc, 9))


def _cols(salts) -> list[Column]:
    return [s if isinstance(s, Column) else F.lit(s) for s in salts]


def u(*salts) -> Column:
    """Deterministic uniform [0,1) from xxhash64(id, salts)."""
    return F.pmod(F.xxhash64(F.col("id"), *_cols(salts)), F.lit(1_000_000)).cast(
        "double"
    ) / F.lit(1_000_000.0)


def pick(options: list[str], *salts) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(F.xxhash64(F.col("id"), *_cols(salts)), F.lit(len(options))) + 1).cast("int"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=".localdata/sf1")
    ap.add_argument(
        "--vocab",
        type=int,
        default=len(VOCAB),
        help="document vocabulary size; > %(default)s switches to synthetic "
        "w<k> words — the large-vocabulary (real-web) regime where the "
        "containment dedup's MinHash-cohort gate engages (low signature "
        "collision), vs the default 30-word dense regime where it degenerates",
    )
    ap.add_argument(
        "--boilerplate",
        type=float,
        default=0.0,
        help="fraction of documents that open with a shared templated span "
        "(40 template-specific words) — the boilerplate-heavy web regime "
        "that stresses the containment dedup's candidate stage: every "
        "span shingle is shared by the whole template cohort",
    )
    ap.add_argument(
        "--templates",
        type=int,
        default=64,
        help="number of distinct boilerplate templates; sized so each "
        "cohort (boilerplate*n_doc/templates) stays UNDER the dedup "
        "deskew hot-filter cutoff (1%% of docs) — the worst case: too "
        "common to be rare, too rare to be dropped",
    )
    ap.add_argument(
        "--graph-window",
        type=int,
        default=0,
        help="supplier-locality window W for lineitem supplier assignment "
        "(0 = uniform over all suppliers, the legacy dense regime). When "
        "set, each order draws its suppliers from a W-wide window of the "
        "supplier id space anchored per order, so the co-supply graph's "
        "average degree is bounded by ~2W-1 CONSTANT ACROSS SF — the "
        "realistic constant-degree regime (a real supplier co-occurs with "
        "a bounded partner set; the default uniform draw densifies to "
        "avg degree ~400 at sf1, which is what made the triangle/"
        "clustering sf1 walls wedge-bound, VERDICT r8 item 4)",
    )
    ap.add_argument(
        "--tables",
        default="",
        help="comma-separated subset of tables to write (default: all). "
        "Table DEFINITIONS are lazy, so skipping a write skips its compute "
        "entirely — a vectors-only fixture (--tables embeddings) avoids "
        "generating 600M lineitem rows it will never read",
    )
    ap.add_argument(
        "--hot-frac",
        type=float,
        default=0.0,
        help="fraction of events owned by a single hot user_id (0) — the "
        "Zipf-head regime the reference's bot traffic creates by "
        "construction (log-generator/generator.py:137-154: a bot emits "
        "~60 ev/s vs a human's ~0.1, so one signature can own a double-"
        "digit share of the stream). 0 keeps the fitted uniform "
        "distribution; 0.1 makes user 0 own ~10%% of all events, the "
        "skew-join / straggler stress fixture (scripts/skew_bench.py)",
    )
    args = ap.parse_args()
    sf = args.sf
    out = args.out
    vocab_n = args.vocab
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="gen_sf")
    t_start = time.time()

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_vec = int(20_000 * sf)

    known = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    want = {t.strip() for t in args.tables.split(",") if t.strip()} or None
    if want and not want <= known:
        # fail fast: a typo would otherwise produce an empty/stale fixture
        # that only surfaces much later as a missing-parquet error
        sys.exit(f"--tables: unknown table(s) {sorted(want - known)}; "
                 f"known: {sorted(known)}")

    def write(df, name):
        if want is not None and name not in want:
            return
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        n = spark.read.parquet(os.path.join(out, f"{name}.parquet")).count()
        print(f"  {name}: {n} rows", flush=True)

    # fixed dims — same 5 regions / 25 nations as every TPC-H-ish schema
    for dim in ("region", "nation"):
        write(spark.read.parquet(os.path.join(SRC_DIMS, f"{dim}.parquet")), dim)

    write(
        spark.range(n_cust).select(
            F.col("id").alias("c_custkey"),
            F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
            F.pmod(F.xxhash64("id", F.lit("cnat")), F.lit(25)).cast("int").alias("c_nationkey"),
            F.round(F.lit(-1000.0) + u("cbal") * 11000.0, 2).alias("c_acctbal"),
            pick(MKTSEGMENTS, "cseg").alias("c_mktsegment"),
        ),
        "customer",
    )
    write(
        spark.range(n_supp).select(
            F.col("id").alias("s_suppkey"),
            F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
            F.pmod(F.xxhash64("id", F.lit("snat")), F.lit(25)).cast("int").alias("s_nationkey"),
            F.round(F.lit(-1000.0) + u("sbal") * 11000.0, 2).alias("s_acctbal"),
        ),
        "supplier",
    )
    write(
        spark.range(n_part).select(
            F.col("id").alias("p_partkey"),
            F.concat_ws(" ", pick(PADJS, "padj"), pick(PNOUNS, "pnoun")).alias("p_name"),
            F.concat(F.lit("Brand#"), (F.pmod(F.xxhash64("id", F.lit("pbrand")), F.lit(25)) + 1).cast("string")).alias("p_brand"),
            pick(PTYPES, "ptype").alias("p_type"),
            (F.pmod(F.xxhash64("id", F.lit("psize")), F.lit(50)) + 1).cast("int").alias("p_size"),
            F.round(F.lit(900.0) + F.col("id") * 0.1, 2).alias("p_retailprice"),
        ),
        "part",
    )

    date_lo, date_span_days = "1995-01-01", 2404  # ..2001-08-01
    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit("ocust")), F.lit(n_cust)).alias("o_custkey"),
        pick(["O", "P", "F"], "ostat").alias("o_orderstatus"),
        F.round(F.lit(1000.0) + u("oprice") * 499000.0, 2).alias("o_totalprice"),
        F.date_add(F.lit(date_lo).cast("date"), (u("odate") * date_span_days).cast("int"))
        .cast("timestamp")
        .alias("o_orderdate"),
        pick(PRIORITIES, "oprio").alias("o_orderpriority"),
        # lines-per-order via inverse CDF of truncated Poisson(4):
        # n = 1 + #{cdf values below u}
        (
            F.lit(1)
            + F.size(
                F.filter(
                    F.array(*[F.lit(c) for c in _CDF]),
                    lambda c: c < u("nlines"),
                )
            )
        ).alias("_nlines"),
    )
    write(orders.drop("_nlines"), "orders")

    li = (
        orders.select("o_orderkey", "_nlines")
        .select("o_orderkey", F.explode(F.sequence(F.lit(1), F.col("_nlines"))).alias("l_linenumber"))
        .withColumn("id", F.xxhash64("o_orderkey", "l_linenumber", F.lit("li")))
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.pmod(F.xxhash64("id", F.lit("lpart")), F.lit(n_part)).alias("l_partkey"),
            (
                F.pmod(
                    F.pmod(F.xxhash64("o_orderkey", F.lit("ganchor")), F.lit(n_supp))
                    + F.pmod(
                        F.xxhash64("id", F.lit("lsupp")),
                        F.lit(min(args.graph_window, n_supp)),
                    ),
                    F.lit(n_supp),
                )
                if args.graph_window > 0
                else F.pmod(F.xxhash64("id", F.lit("lsupp")), F.lit(n_supp))
            ).alias("l_suppkey"),
            F.col("l_linenumber"),
            (F.pmod(F.xxhash64("id", F.lit("lqty")), F.lit(50)) + 1).cast("double").alias("l_quantity"),
            F.round(F.lit(900.0) + u("lprice") * 104100.0, 2).alias("l_extendedprice"),
            F.round(F.pmod(F.xxhash64("id", F.lit("ldisc")), F.lit(11)).cast("double") / 100.0, 2).alias("l_discount"),
            F.round(F.pmod(F.xxhash64("id", F.lit("ltax")), F.lit(9)).cast("double") / 100.0, 2).alias("l_tax"),
            pick(["A", "N", "R"], "lret").alias("l_returnflag"),
            pick(["O", "F"], "lstat").alias("l_linestatus"),
            # independent of orderdate, matching testdata (diff spans +/- years)
            F.date_add(F.lit(date_lo).cast("date"), (u("lship") * 2499).cast("int"))
            .cast("timestamp")
            .alias("l_shipdate"),
        )
    )
    write(li, "lineitem")

    n_users = int(15_000 * sf)
    ev_span_us = 30 * 86_400_000_000  # 30 days of 2024-01
    write(
        spark.range(n_ev).select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (F.lit(1_704_067_200_000_000) + (u("ets") * ev_span_us).cast("long"))
            ).alias("ts"),
            (
                F.when(u("ehot") < F.lit(args.hot_frac), F.lit(0).cast("long")).otherwise(
                    F.pmod(F.xxhash64("id", F.lit("euser")), F.lit(n_users))
                )
                if args.hot_frac > 0
                else F.pmod(F.xxhash64("id", F.lit("euser")), F.lit(n_users))
            ).alias("user_id"),
            pick(EVENT_TYPES, "etype").alias("event_type"),
            # Exp(mean 50) truncated at ~560 (u capped below 1)
            F.round(-50.0 * F.log(F.lit(1.0) - u("eval") * 0.9999864), 2).alias("value"),
            F.format_string(
                '{"k": %d}', F.pmod(F.xxhash64("id", F.lit("eprops")), F.lit(100))
            ).alias("props"),
        ),
        "events",
    )

    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    docs = (
        spark.range(n_doc)
        # ~1/600 docs reuse the previous doc's word seed => exact duplicates
        .withColumn(
            "_seed",
            F.when(
                (F.pmod(F.xxhash64("id", F.lit("dupsel")), F.lit(600)) == 0) & (F.col("id") > 0),
                F.col("id") - 1,
            ).otherwise(F.col("id")),
        )
        .withColumn("_nw", (F.pmod(F.xxhash64("_seed", F.lit("dnw")), F.lit(93)) + 8).cast("int"))
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.col("_nw")),
                    lambda i: F.when(
                        F.pmod(F.xxhash64(F.col("_seed"), i, F.lit("ddup")), F.lit(2000)) == 0,
                        F.lit("dup"),
                    ).otherwise(
                        F.element_at(
                            vocab_arr,
                            (F.pmod(F.xxhash64(F.col("_seed"), i, F.lit("dw")), F.lit(len(VOCAB))) + 1).cast("int"),
                        )
                        if vocab_n <= len(VOCAB)
                        # synthetic large-vocab regime: w0..w<N-1>
                        else F.concat(
                            F.lit("w"),
                            F.pmod(
                                F.xxhash64(F.col("_seed"), i, F.lit("dw")), F.lit(vocab_n)
                            ).cast("string"),
                        )
                    ),
                ),
            ).alias("text"),
            F.when(F.pmod(F.xxhash64("id", F.lit("dlang")), F.lit(100)) < 41, F.lit("en"))
            .otherwise(
                F.element_at(
                    F.array(*[F.lit(x) for x in LANGS[1:]]),
                    (F.pmod(F.xxhash64("id", F.lit("dlang2")), F.lit(4)) + 1).cast("int"),
                )
            )
            .alias("lang"),
            F.concat(F.lit("src"), F.pmod(F.xxhash64("id", F.lit("dsrc")), F.lit(20)).cast("string")).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    if args.boilerplate > 0:
        # prepend a 40-word templated span to a deterministic fraction of
        # docs: words are template-specific ("b<tpl>x<i>"), so every span
        # shingle's posting list is exactly the template cohort — the
        # containment candidate stage's worst realistic case when the
        # cohort stays under the 1% deskew cutoff
        n_tpl = max(1, args.templates)
        sel = F.pmod(F.xxhash64(F.col("doc_id"), F.lit("bsel")), F.lit(1000))
        tpl = F.pmod(F.xxhash64(F.col("doc_id"), F.lit("btpl")), F.lit(n_tpl))
        span = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("b"), tpl.cast("string"), F.lit("x"), i.cast("string")
                ),
            ),
        )
        docs = docs.withColumn(
            "text",
            F.when(
                sel < F.lit(int(args.boilerplate * 1000)),
                F.concat(span, F.lit(" "), F.col("text")),
            ).otherwise(F.col("text")),
        ).withColumn("n_chars", F.length("text"))
    write(docs, "documents")

    # 10 cluster centers seeded by (label, dim); triangular noise from 3 uniforms
    write(
        spark.range(n_vec)
        .withColumn("label", F.pmod(F.xxhash64("id", F.lit("vlab")), F.lit(10)).cast("int"))
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: (
                    (
                        F.pmod(F.xxhash64(F.col("label"), d, F.lit("vc")), F.lit(1000)).cast("double") / 1000.0
                        - 0.5
                    )
                    * 0.8
                    + (
                        u(F.lit("vn"), d, 1) + u(F.lit("vn"), d, 2) + u(F.lit("vn"), d, 3) - 1.5
                    )
                    * 0.15
                ).cast("float"),
            ).alias("embedding"),
            "label",
        ),
        "embeddings",
    )

    print(f"generated sf={sf} at {out} in {time.time() - t_start:.0f}s")


if __name__ == "__main__":
    main()
