"""Extension + SQL-surface queries: pivot, grouping sets, subqueries,
array/map function families, batch session windows, salted aggregation,
custom UDAF (applyInPandas), UDTF-style expansion, SimHash, and the
approximate scale-path variants.

Registered alongside the core so the driver checks them; the pure-Spark
operator implementations live in operators/ and functions/.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.skew import salted_agg
from ..sources.readers import load_table, register_views, sf_suffix
from .registry import dsum, query
from .relational import EVENTS
from .text import SQL_TOKENS, TOKENS

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# --------------------------------------------------------------------------
# SQL surface (entry point C, SURVEY.md §3.3): queries authored as
# spark.sql over registered views — same Catalyst pipeline as DataFrames.
# --------------------------------------------------------------------------
@query(
    "sql_exists_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    """,
    tags=("J3",),
)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS correlated subquery via the SQL entry point; Catalyst
    rewrites it to a left-semi join (same plan as J3)."""
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        """
    )


@query(
    "sql_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal >= (SELECT max(c_acctbal) FROM customer) * 0.9
    """,
    tags=("J3", "A3"),
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (max is exact on doubles — deterministic across
    engines, unlike avg of a parallel sum)."""
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal >= (SELECT max(c_acctbal) FROM customer) * 0.9
        """
    )


@query(
    "sql_grouping_sets",
    oracle=f"""
    SELECT coalesce(event_type, 'ALL') AS etype,
           coalesce(CAST(year(ts) AS BIGINT), -1) AS y,
           count(*) AS n
    FROM {EVENTS} e
    GROUP BY GROUPING SETS ((event_type), (year(ts)), ())
    """,
    tags=("A6",),
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — explicit GROUPING SETS (not derivable from rollup/cube):
    (type), (year), and grand total in one pass."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_t")
    return spark.sql(
        """
        SELECT coalesce(event_type, 'ALL') AS etype,
               coalesce(CAST(year(ts) AS BIGINT), -1L) AS y,
               count(*) AS n
        FROM events_t
        GROUP BY GROUPING SETS ((event_type), (year(ts)), ())
        """
    )


@query(
    "sql_lateral_join",
    oracle="""
    SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
    """,
    tags=("J1", "W1"),
)
def sql_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — per-outer-row top-2 customers by
    balance, the SQL-standard spelling of per-group top-k. Catalyst
    decorrelates the lateral subquery into a ranked window over a single
    join (DomainJoin rewrite), so despite the correlated per-row
    formulation the physical plan is the same one shuffle as
    win_topn_per_group — nothing executes per outer row. The ORDER BY
    carries a c_name tiebreak so both engines pick identical rows."""
    register_views(spark, sf_dir, ["nation", "customer"])
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
        """
    )


@query(
    "sql_params_identifier",
    oracle=f"""
    SELECT event_type, count(*) AS n
    FROM {EVENTS} e
    WHERE value >= 0.5
    GROUP BY event_type
    """,
    tags=("A1", "P2"),
)
def sql_params_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with the IDENTIFIER() clause — the
    injection-safe templating surface a multi-tenant query service needs:
    the table name binds through IDENTIFIER(:tbl) (validated as an
    identifier, not spliced as text) and the threshold through a typed
    named parameter, so one prepared statement serves every tenant/table
    without string concatenation. Parameters are resolved before
    analysis; the optimized plan is identical to the literal query —
    pushed filter, partial agg, 5-group final."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_t")
    return spark.sql(
        "SELECT event_type, count(*) AS n FROM IDENTIFIER(:tbl) "
        "WHERE value >= :lo GROUP BY event_type",
        args={"tbl": "events_t", "lo": 0.5},
    )


# --------------------------------------------------------------------------
# Pivot / unpivot
# --------------------------------------------------------------------------
@query(
    "pivot_event_counts",
    oracle=f"""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM {EVENTS} e
    GROUP BY user_id
    """,
    tags=("A6", "A1"),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never inferred — inference is a
    separate job at scale); oracle is the FILTER-per-column equivalent."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))  # count("*") is rejected inside pivot
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey,
             CAST(c_acctbal AS DOUBLE) AS balance,
             CAST(c_nationkey AS DOUBLE) AS nation
      FROM customer
    ) UNPIVOT (val FOR metric IN (balance, nation))
    """,
    tags=("A6", "P1"),
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) via native unpivot — wide metrics to long rows."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("balance"),
        F.col("c_nationkey").cast("double").alias("nation"),
    )
    return c.unpivot("c_custkey", ["balance", "nation"], "metric", "val")


# --------------------------------------------------------------------------
# F7 — array & map function families
# --------------------------------------------------------------------------
@query(
    "array_functions",
    oracle="""
    WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    SELECT p_partkey,
           len(words) AS n_words,
           list_contains(words, 'red') AS has_red,
           words[1] AS first_word,
           words[-1] AS last_word,
           array_to_string(list_sort(words), ',') AS sorted_words,
           array_to_string(list_reverse(words), ',') AS reversed_words,
           array_to_string(list_transform(words, w -> upper(w)), ',') AS upper_words,
           coalesce(array_to_string(list_filter(words, w -> length(w) > 4), ','), '') AS long_words
    FROM t
    """,
    tags=("F7", "U4"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — array family: size/contains/indexing/sort/reverse and the
    transform/filter higher-order functions (all JVM-side codegen)."""
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_contains(words, "red").alias("has_red"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_join(F.array_sort(words), ",").alias("sorted_words"),
        F.array_join(F.reverse(words), ",").alias("reversed_words"),
        F.array_join(F.transform(words, lambda w: F.upper(w)), ",").alias("upper_words"),
        F.coalesce(
            F.array_join(F.filter(words, lambda w: F.length(w) > 4), ","), F.lit("")
        ).alias("long_words"),
    )


@query(
    "map_functions",
    oracle=f"""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           (json_extract_string(props, '$.missing') IS NOT NULL) AS has_missing
    FROM {EVENTS} e
    """,
    tags=("F7", "F3"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — map family over JSON props parsed to map<string,long>:
    map_keys / element_at / membership."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.element_at(m, "missing").isNotNull().alias("has_missing"),
    )


# --------------------------------------------------------------------------
# Batch session windows (T3's batch form, native session_window)
# --------------------------------------------------------------------------
@query(
    "batch_session_window",
    oracle=f"""
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM {EVENTS} e
      )
    )
    GROUP BY user_id, grp
    """,
    tags=("T3",),
)
def batch_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 — native session_window in a batch aggregation; the oracle is
    the lag/cumsum formulation (gap-merge semantics: a new session starts
    at gap >= 30min; session_end = last event + gap)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Skew-safe aggregation (same answer as the plain agg — that's the oracle)
# --------------------------------------------------------------------------
@query(
    "salted_hot_key_agg",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM {EVENTS} e
    GROUP BY event_type
    """,
    tags=("A1", "A7"),
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py): result must be
    bit-identical to the unsalted aggregate — decimal partials keep the
    merge order-free."""
    ev = load_table(spark, sf_dir, "events")
    return salted_agg(
        ev,
        keys=["event_type"],
        aggs=[
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("sum_dec"),
        ],
        final_aggs=[
            F.sum("n").alias("n"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
        ],
    )


_TYPE_WEIGHTS = (
    ("click", 1.0),
    ("error", 0.5),
    ("purchase", 10.0),
    ("signup", 5.0),
    ("view", 1.5),
)


@query(
    "salted_hot_key_join",
    oracle=f"""
    WITH w(event_type, weight) AS (VALUES
      {", ".join(f"('{t}', {v})" for t, v in _TYPE_WEIGHTS)})
    SELECT e.event_type,
           count(*) AS n,
           CAST(sum(CAST(e.value * w.weight AS DECIMAL(38,6))) AS DOUBLE)
             AS weighted_value
    FROM {EVENTS} e JOIN w USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("J7", "A1"),
)
def salted_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salted join (operators/skew.salted_join) on a maximally hot
    key: every events row carries one of five event_type values, so an
    unsalted shuffle join lands the whole table on five reducers. Salting
    spreads each key across 16 buckets (right side exploded 16x — fine,
    it's five rows) — the fallback for when AQE's skew splitting is
    unavailable (streaming micro-batches). The oracle is the plain
    unsalted join: salting must not change a single answer."""
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    weights = spark.createDataFrame(
        list(_TYPE_WEIGHTS), "event_type string, weight double"
    )
    joined = salted_join(ev, weights, "event_type", salt_buckets=16)
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        dsum(F.col("value") * F.col("weight")).alias("weighted_value"),
    )


# --------------------------------------------------------------------------
# U3 — custom UDAF via applyInPandas (grouped-map)
# --------------------------------------------------------------------------
@query(
    "udaf_segment_entropy",
    oracle="""
    WITH c AS (SELECT c_nationkey AS k, c_mktsegment AS s, count(*) AS n
               FROM customer GROUP BY 1, 2),
         t AS (SELECT k, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.k AS nationkey,
           round(-sum((n / tot) * log2(n / tot)), 6) AS segment_entropy
    FROM c JOIN t USING (k)
    GROUP BY c.k
    """,
    tags=("U3",),
)
def udaf_segment_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — Shannon entropy of the segment mix per nation as a grouped-map
    pandas UDAF (numpy inside, Arrow transfer). Pre-aggregating counts
    BEFORE applyInPandas keeps the Python stage key-sized: the pattern for
    custom aggregates at scale."""
    c = load_table(spark, sf_dir, "customer")
    counts = c.groupBy(
        F.col("c_nationkey").alias("nationkey"), F.col("c_mktsegment").alias("seg")
    ).agg(F.count("*").alias("n"))

    def entropy(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf["n"].to_numpy(dtype=np.float64)
        p = p / p.sum()
        h = float(-(p * np.log2(p)).sum())
        return pd.DataFrame(
            {"nationkey": [pdf["nationkey"].iloc[0]], "segment_entropy": [round(h, 6)]}
        )

    return counts.groupBy("nationkey").applyInPandas(
        entropy, "nationkey int, segment_entropy double"
    )


# --------------------------------------------------------------------------
# U4 — UDTF-style expansion (one doc → one row per token)
# --------------------------------------------------------------------------
@query(
    "udtf_token_explode",
    oracle=f"""
    SELECT tok, count(*) AS df FROM (
      SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS tok FROM documents
    ) GROUP BY tok
    HAVING count(*) >= 10
    """,
    tags=("U4", "F7"),
)
def udtf_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 — generator expansion natively via explode (no Python UDTF
    needed): document frequency per token, thresholded."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(TOKENS())).alias("tok"))
    return tok.groupBy("tok").agg(F.count("*").alias("df")).filter(F.col("df") >= 10)


# --------------------------------------------------------------------------
# SimHash — portable 16-bit variant with an oracle
# --------------------------------------------------------------------------
def _simhash16_sql() -> str:
    hi = "('8','9','a','b','c','d','e','f')"
    votes = ", ".join(
        f"sum(CASE WHEN substr(md5(tok), {p}, 1) IN {hi} THEN 1 ELSE -1 END) AS v{p}"
        for p in range(1, 17)
    )
    sig = " + ".join(f"(CASE WHEN v{p} > 0 THEN {1 << (p - 1)} ELSE 0 END)" for p in range(1, 17))
    return f"""
    WITH tok AS (SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS tok FROM documents),
         votes AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id)
    SELECT doc_id, CAST({sig} AS BIGINT) AS simhash16 FROM votes
    """


@query("dedup_simhash16", oracle=_simhash16_sql(), tags=("U6", "F8"))
def dedup_simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6 — SimHash (16-bit, md5-nibble top bits): per-bit majority vote
    over token hashes, as 16 conditional sums in ONE aggregation pass (no
    per-bit explode). The 64-bit production variant is
    operators/dedup.simhash64 (pandas UDF; rows-only check below)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(TOKENS())).alias("tok"))
    md5 = F.md5("tok")
    hi = set("89abcdef")
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring(md5, p, 1).isin(*hi), 1).otherwise(-1)
            ).alias(f"v{p}")
            for p in range(1, 17)
        ]
    )
    sig = None
    for p in range(1, 17):
        term = F.when(F.col(f"v{p}") > 0, F.lit(1 << (p - 1))).otherwise(0)
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.cast("long").alias("simhash16"))


@query(
    "dedup_simhash64_bands",
    oracle="SELECT true AS complete, true AS subset_of_exact",
    tags=("U6",),
)
def dedup_simhash64_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6 scale path: 64-bit SimHash via vectorized pandas UDF + banded
    candidate pairs + exact Hamming verify. The verify threshold (7)
    equals n_bands - 1, so by the pigeonhole bound the banded candidate
    set is COMPLETE for the emitted distance range. The fingerprints are
    FNV-hash-specific (no cross-engine twin), so the hash-checkable form
    audits the guarantee itself: it recomputes the pair set by brute force
    from the SAME fingerprints and emits booleans the oracle pins true.
    The O(n²) brute-force arm exists only for this audit — the production
    output is the banded pair set (the pre-audit shape of this query)."""
    from ..operators import dedup as dd

    d = load_table(spark, sf_dir, "documents").withColumn("toks", TOKENS())
    fp = dd.simhash64_fingerprints(d.select("doc_id", "toks")).select(
        "doc_id", "simhash64"
    )
    fp.cache()
    cand = dd.simhash_band_candidates(fp, n_bands=8)
    banded = (
        cand.select(
            "id_a", "id_b", dd.hamming64(F.col("sig_a"), F.col("sig_b")).alias("hamming")
        )
        .filter(F.col("hamming") <= 7)
        .agg(F.count("*").alias("n_banded"))
    )
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("simhash64").alias("sig_a"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("simhash64").alias("sig_b"))
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(dd.hamming64(F.col("sig_a"), F.col("sig_b")) <= 7)
        .agg(F.count("*").alias("n_brute"))
    )
    return banded.crossJoin(brute).select(
        (F.col("n_banded") == F.col("n_brute")).alias("complete"),
        (F.col("n_banded") <= F.col("n_brute")).alias("subset_of_exact"),
    )


# --------------------------------------------------------------------------
# U5 scale path — LSH-bucketed ANN (rows-only; recall tested in pytest)
# --------------------------------------------------------------------------
@query(
    "vec_ann_lsh_topk",
    oracle="SELECT CAST(10 AS BIGINT) AS k, true AS recall_ok",
    tags=("U5",),
)
def vec_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 — approximate top-k via random-hyperplane LSH with multi-probe;
    candidates come from bucket equality (groupBy shape), exact cosine
    re-ranks. The hyperplane signs are seed-specific (no cross-engine
    twin), so the hash-checkable form compares the ANN result against the
    exact brute-force top-k inline and emits a recall>=0.8 boolean the
    oracle pins true; the exact arm is the audit, the ANN arm is the
    production path."""
    from ..operators.similarity import ann_topk

    e = load_table(spark, sf_dir, "embeddings")
    qrow = e.orderBy("vec_id").limit(1).collect()[0]
    qv = [float(x) for x in qrow.embedding]
    rest = e.filter(F.col("vec_id") != qrow.vec_id)
    # spread-out vectors (testdata max cosine ~0.33) are LSH's worst case:
    # hyperplane proximity barely correlates with tail cosine, so hitting
    # recall 0.8 takes a wide probe (11/16 buckets at bits=4, probe<=2).
    # Clustered corpora (where LSH shines) get the same recall at
    # probe_hamming=1 — tests/test_operators.py asserts both regimes.
    ann = ann_topk(rest, qv, k=10, n_bits=4, probe_hamming=2)
    # probe_hamming = n_bits probes every bucket → the exact top-k
    exact = ann_topk(rest, qv, k=10, n_bits=4, probe_hamming=4)
    n_hits = (
        ann.select("vec_id")
        .join(exact.select("vec_id"), "vec_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return n_hits.select(
        F.lit(10).cast("long").alias("k"),
        (F.col("n_hits") >= 8).alias("recall_ok"),
    )


# --------------------------------------------------------------------------
# A9 scale path — approximate percentiles (rows-only)
# --------------------------------------------------------------------------
@query(
    "agg_approx_percentiles",
    oracle="""
    SELECT l_returnflag, true AS p50_ok, true AS p95_ok, true AS p99_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A9", "A5"),
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 at scale: approx_percentile sketches (bounded memory per group)
    replace exact percentile's full per-group sort. Sketch outputs are
    engine-specific, so the hash-checkable form emits per-quantile
    within-2%-of-exact booleans the oracle pins true (accuracy=1000 →
    rank error <= 0.1%; 2% value tolerance is generous for this data).
    The exact percentile arm exists only for the audit."""
    li = load_table(spark, sf_dir, "lineitem")

    def ok(p: float, name: str):
        approx = F.expr(f"approx_percentile(l_extendedprice, {p}, 1000)")
        exact = F.expr(f"percentile(l_extendedprice, {p})")
        return (F.abs(approx - exact) <= 0.02 * F.abs(exact)).alias(name)

    return li.groupBy("l_returnflag").agg(
        ok(0.5, "p50_ok"), ok(0.95, "p95_ok"), ok(0.99, "p99_ok")
    )


# --------------------------------------------------------------------------
# Multi-resolution rollup (hypertable continuous-aggregate pattern)
# --------------------------------------------------------------------------
@query(
    "rollup_multires",
    oracle=f"""
    SELECT date_trunc('day', ts) AS day, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM {EVENTS} e
    GROUP BY 1, 2
    """,
    tags=("A6", "A7", "F1"),
)
def rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: minute → hour → day, each
    level REAGGREGATED from the level below (never from raw) — the
    continuous-aggregate pattern where coarse resolutions cost |finer
    rollup| not |raw data|. Summing through decimal(38,6) makes the
    cascade exact, so the day level equals a direct day aggregation — which
    is the oracle. Counts re-sum losslessly by construction."""
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("minute"), "event_type"
    ).agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
    hour = minute.groupBy(
        F.date_trunc("hour", "minute").alias("hour"), "event_type"
    ).agg(F.sum("n").alias("n"), dsum("sum_value").alias("sum_value"))
    return hour.groupBy(
        F.date_trunc("day", "hour").alias("day"), "event_type"
    ).agg(F.sum("n").alias("n"), dsum("sum_value").alias("sum_value"))


# --------------------------------------------------------------------------
# Mergeable sketches (A5 at scale: partial sketches union losslessly)
# --------------------------------------------------------------------------
@query(
    "agg_hll_sketch_merge",
    oracle=f"""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           true AS within_bound,
           true AS total_within_bound
    FROM {EVENTS} e
    GROUP BY event_type
    """,
    tags=("A5", "A7"),
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A7 — the mergeable-aggregate pattern that makes distinct-counting
    feasible at 100 TB: per-group HLL sketches (datasketches, Spark 4
    hll_sketch_agg) built map-side, merged with hll_union_agg to a global
    estimate — no shuffle of raw values, sketch bytes only. Sketch bytes
    are engine-specific, so the hash-checkable form emits exact counts
    plus within-bound booleans (per-group estimate and merged-total
    estimate both within 5% of exact; lgK=12 → rsd≈1.6%) that the oracle
    pins true. The exact arms exist only for the audit."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sketch"),
        F.countDistinct("user_id").alias("n_users_exact"),
    )
    merged = per_type.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sketch, true))").alias("est_total"),
    )
    total_exact = ev.agg(F.countDistinct("user_id").alias("n_total_exact"))
    return (
        per_type.select(
            "event_type",
            "n_users_exact",
            F.expr("hll_sketch_estimate(sketch)").alias("est_users"),
        )
        .crossJoin(merged)
        .crossJoin(total_exact)
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("est_users") - F.col("n_users_exact"))
                <= 0.05 * F.col("n_users_exact")
            ).alias("within_bound"),
            (
                F.abs(F.col("est_total") - F.col("n_total_exact"))
                <= 0.05 * F.col("n_total_exact")
            ).alias("total_within_bound"),
        )
    )


@query(
    "agg_exact_median",
    oracle=f"""
    SELECT event_type,
           median(value) AS med_value,
           CAST(quantile_cont(value, 0.95) AS DOUBLE) AS p95_value
    FROM {EVENTS} e
    GROUP BY event_type
    """,
    tags=("A9",),
)
def agg_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 exact flavor — median / continuous p95 per group (Spark's
    percentile(), the sort-based exact aggregate, vs approx_percentile's
    sketch). Exact quantiles shuffle the full column per group — use the
    approx variant at 100 TB unless the group is bounded; both surfaces
    exist here so the tradeoff is a one-line swap."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med_value"),
        F.expr("percentile(value, 0.95)").alias("p95_value"),
    )


@query(
    "win_first_last_value",
    oracle=f"""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_event,
           last_value(event_type) OVER w AS last_event,
           CAST(count(*) OVER w AS BIGINT) AS n_events
    FROM {EVENTS} e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("W3", "W1"),
)
def win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an unbounded frame — entry/exit event
    per user (the funnel endpoints), one shuffle on user_id; DISTINCT
    collapses to one row per user. Deterministic ORDER BY (ts, event_id)
    tie-break."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_event"),
            F.last("event_type").over(w).alias("last_event"),
            F.count("*").over(w).alias("n_events"),
        )
        .distinct()
    )


@query(
    "profile_table",
    oracle=f"""
    WITH e AS (SELECT * FROM {EVENTS} e0)
    SELECT 'event_id' AS col_name, count(*) AS n,
           count(*) - count(event_id) AS n_null, count(DISTINCT event_id) AS n_distinct,
           CAST(min(event_id) AS DOUBLE) AS min_num, CAST(max(event_id) AS DOUBLE) AS max_num
    FROM e
    UNION ALL
    SELECT 'ts', count(*), count(*) - count(ts), count(DISTINCT ts),
           CAST(epoch_us(min(ts)) AS DOUBLE), CAST(epoch_us(max(ts)) AS DOUBLE) FROM e
    UNION ALL
    SELECT 'user_id', count(*), count(*) - count(user_id), count(DISTINCT user_id),
           CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE) FROM e
    UNION ALL
    SELECT 'event_type', count(*), count(*) - count(event_type), count(DISTINCT event_type),
           NULL, NULL FROM e
    UNION ALL
    SELECT 'value', count(*), count(*) - count(value), count(DISTINCT value),
           round(min(value), 6), round(max(value), 6) FROM e
    UNION ALL
    SELECT 'props', count(*), count(*) - count(props), count(DISTINCT props),
           NULL, NULL FROM e
    """,
    tags=("A3", "A4", "P1"),
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling — the first query every pipeline runs against an
    unfamiliar table: per-column null count, exact distinct count, and
    numeric range. ONE aggregation pass computes every statistic (the
    oracle's six scans collapse to a single Spark scan with 20+ aggregate
    expressions — count-distincts expand via a single expand node), then a
    map-only inline() unpivots the 1-row result to the long per-column
    form. Timestamps profile as epoch-microseconds so the range is numeric
    and exact cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    n = F.count("*")

    def null_cnt(c):
        return n - F.count(c)

    row = ev.agg(
        n.alias("n"),
        *[null_cnt(c).alias(f"null_{c}") for c in ("event_id", "ts", "user_id", "event_type", "value", "props")],
        *[F.countDistinct(c).alias(f"dist_{c}") for c in ("event_id", "ts", "user_id", "event_type", "value", "props")],
        F.min("event_id").cast("double").alias("min_event_id"),
        F.max("event_id").cast("double").alias("max_event_id"),
        F.unix_micros(F.min("ts")).cast("double").alias("min_ts"),
        F.unix_micros(F.max("ts")).cast("double").alias("max_ts"),
        F.min("user_id").cast("double").alias("min_user_id"),
        F.max("user_id").cast("double").alias("max_user_id"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )
    cols = ("event_id", "ts", "user_id", "event_type", "value", "props")
    entries = []
    for c in cols:
        mn = f"min_{c}" if c not in ("event_type", "props") else None
        mx = f"max_{c}" if c not in ("event_type", "props") else None
        entries.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n").alias("n"),
                F.col(f"null_{c}").alias("n_null"),
                F.col(f"dist_{c}").alias("n_distinct"),
                (F.col(mn) if mn else F.lit(None).cast("double")).alias("min_num"),
                (F.col(mx) if mx else F.lit(None).cast("double")).alias("max_num"),
            )
        )
    return row.select(F.inline(F.array(*entries)))


@query(
    "filter_by_quantile",
    oracle="""
    WITH thr AS (SELECT quantile_cont(n_chars, 0.10) AS t FROM documents)
    SELECT count(*) AS n_total,
           CAST(sum(CASE WHEN d.n_chars >= thr.t THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(thr.t, 6) AS threshold
    FROM documents d, thr
    GROUP BY thr.t
    """,
    tags=("A9", "P2"),
)
def filter_by_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative quality gating: drop the bottom decile by length —
    the filter whose threshold is a property of the corpus, not a
    constant, so it needs a quantile pass before the gate. The exact
    interpolated percentile here matches DuckDB's quantile_cont bit-for-
    bit; at 100 TB swap in approx_percentile (t-digest, map-side-merged)
    and the plan shape is unchanged: one tiny threshold aggregate
    broadcast back onto the scan, then a map-side conditional count."""
    d = load_table(spark, sf_dir, "documents")
    thr = d.agg(F.expr("percentile(n_chars, 0.10)").alias("t"))
    return (
        d.crossJoin(F.broadcast(thr))
        .agg(
            F.count("*").alias("n_total"),
            F.sum((F.col("n_chars") >= F.col("t")).cast("long")).alias("n_kept"),
            F.first(F.round("t", 6)).alias("threshold"),
        )
    )


@query(
    "histogram_values",
    oracle=f"""
    WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM {EVENTS} e),
         b AS (SELECT CAST(floor((e.value - mm.lo) / (mm.hi - mm.lo) * 20) AS BIGINT) + 1 AS bucket
               FROM {EVENTS} e, mm)
    SELECT bucket, count(*) AS n
    FROM b
    GROUP BY bucket
    """,
    tags=("A1", "F4"),
)
def histogram_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of a numeric column — the distribution-shape
    profile behind data-quality dashboards and skew diagnosis. Two
    aggregates: the 1-row min/max (broadcast back onto the scan) and the
    21-group bucket count (like SQL width_bucket, the exact max lands in
    the overflow bucket n+1; the explicit floor formula is used in BOTH
    engines because floor on identically-ordered double arithmetic is
    bit-stable cross-engine). Both shuffles carry bytes proportional to
    bucket count, never data size."""
    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bucket = (
        F.floor((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 20).cast(
            "long"
        )
        + 1
    )
    return (
        ev.crossJoin(F.broadcast(mm))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


@query(
    "skew_diagnose",
    oracle=f"""
    WITH c AS (SELECT event_type, user_id, count(*) AS n
               FROM {EVENTS} e GROUP BY event_type, user_id)
    SELECT event_type,
           count(*) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_per_key,
           round(avg(n), 6) AS avg_per_key,
           round(quantile_cont(n, 0.99), 6) AS p99_per_key,
           round(max(n) / avg(n), 6) AS skew_ratio
    FROM c
    GROUP BY event_type
    """,
    tags=("A1", "A9", "A3"),
)
def skew_diagnose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnosis — the query an engineer runs BEFORE choosing a
    partitioning or salting strategy: per grouping key-space, the
    distribution of per-key row counts (max, mean, p99) and the
    max/mean skew ratio that predicts straggler tasks. Two aggregates:
    per-(type,key) counts (map-side combined), then a 5-group stats
    rollup over the counts — the second shuffle carries one row per key,
    already the reduced form. A ratio near 1 means hash partitioning is
    safe; large means salt (operators/skew.py) or AQE skew-join."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    return c.groupBy("event_type").agg(
        F.count("*").alias("n_keys"),
        F.max("n").cast("long").alias("max_per_key"),
        F.round(F.avg("n"), 6).alias("avg_per_key"),
        F.round(F.expr("percentile(n, 0.99)"), 6).alias("p99_per_key"),
        F.round(F.max("n") / F.avg("n"), 6).alias("skew_ratio"),
    )


@query(
    "quality_outlier_mad",
    oracle="""
    WITH med AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
                 FROM documents GROUP BY source),
         dev AS (SELECT d.source, d.n_chars, med.med,
                        quantile_cont(abs(d.n_chars - med.med), 0.5)
                          OVER (PARTITION BY d.source) AS mad
                 FROM documents d JOIN med USING (source))
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN abs(n_chars - med) > 3 * 1.4826 * mad THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers,
           round(med, 6) AS median_chars,
           round(mad, 6) AS mad_chars
    FROM dev
    GROUP BY source, med, mad
    """,
    tags=("A9", "P2", "A3"),
)
def quality_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per stratum (median absolute deviation):
    flag documents whose length deviates from their source's median by
    more than 3 scaled MADs — the outlier rule that, unlike z-scores,
    is not itself corrupted by the outliers it hunts. Three passes, all
    keyed on source: per-source median, per-source MAD of the absolute
    deviations, then the conditional count. The interpolated median
    matches DuckDB's quantile_cont exactly, so even the float thresholds
    agree cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    med = d.groupBy("source").agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
    dev = d.join(F.broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("source").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                (F.col("adev") > 3 * 1.4826 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
            F.first(F.round("med", 6)).alias("median_chars"),
            F.first(F.round("mad", 6)).alias("mad_chars"),
        )
    )


@query(
    "json_variant_shred",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY k_mod
    ORDER BY k_mod
    """,
    tags=("F3", "P5", "A3"),
)
def json_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 via the VARIANT type (Spark 4): parse the JSON props column once
    into a binary variant, extract a typed path, aggregate on it. At 100 TB
    this is the semi-structured fast path — parse_json happens in the scan
    projection (JVM, no Python), variant_get is O(path) on the encoded
    form instead of re-parsing text per access, and since Parquet stores
    the variant shredded, repeated-path access reads a column, not a blob.
    The oracle shreds the same path with DuckDB's JSON extraction."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
            "value",
        )
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .orderBy("k_mod")
    )


@query(
    "udtf_chunk_lateral",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, i AS chunk_idx,
           array_to_string(toks[i*32+1 : (i+1)*32], ' ') AS chunk_text,
           len(toks[i*32+1 : (i+1)*32]) AS n_tokens
    FROM t, LATERAL (SELECT unnest(range(CAST((len(toks)+31)//32 AS BIGINT))) AS i)
    ORDER BY doc_id, chunk_idx
    """,
    tags=("U4", "F7", "P5"),
)
def udtf_chunk_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 via the Python UDTF API (Spark 4): a table function that splits
    each document into fixed 32-word chunks, applied with a SQL LATERAL
    join so every document row fans out to its chunks. Arrow-optimized
    (useArrow) so rows move in batches, and the UDTF runs inside the scan
    stage — per-partition, no shuffle; at 100 TB the fan-out is the
    passage-splitting pass a RAG/pretraining chunker runs. The oracle
    reproduces the chunking with DuckDB list slicing + LATERAL unnest."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int", useArrow=True)
    class ChunkWords:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range((len(toks) + 31) // 32):
                c = toks[i * 32 : (i + 1) * 32]
                yield i, " ".join(c), len(c)

    register_views(spark, sf_dir, ["documents"])
    spark.udtf.register("chunk_words", ChunkWords)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM documents d, LATERAL chunk_words(d.text) c
        ORDER BY d.doc_id, c.chunk_idx
        """
    )


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT l.l_returnflag, count(*) AS n,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    tags=("J7", "P2", "F8"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning — the 100 TB shuffle-join
    technique: when neither side broadcasts, Spark's InjectRuntimeFilter
    builds a bloom filter from the selective (filtered-orders) side and
    pushes `might_contain(xxhash64(l_orderkey))` into the lineitem scan,
    so most non-matching fact rows are dropped BEFORE the shuffle instead
    of after the join. Results are exact (bloom false positives only let
    extra rows reach the exact join). The rule skips broadcast-able joins
    — pointless there — so this query pins broadcast off, the honest
    posture for a fact×fact join at scale; eager localCheckpoint runs the
    plan under those confs, then the session is restored. Plan-shape test
    asserts the injected might_contain."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    out = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("sum_price"))
        .orderBy("l_returnflag")
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        return out.localCheckpoint(eager=True)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@query(
    "dq_constraint_check",
    oracle="""
    SELECT
      (SELECT count(*) FROM orders) AS n_orders,
      (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS n_orphan_orders,
      (SELECT count(*) FROM
        (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
        AS n_dup_orderkeys,
      (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL) AS n_null_priority,
      (SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS n_nonpositive_price
    """,
    tags=("P2", "J2", "A4", "A3"),
)
def dq_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite (the Deequ/dbt-test shape) in three
    bounded passes: (1) one scan of orders folds row count, null-priority
    count and non-positive-price count into a single aggregate; (2) a
    left-anti join against customer counts referential-integrity orphans;
    (3) a keyed pre-aggregate counts duplicate primary keys. Every check
    emits an integer, so the verdict row is hash-exact cross-engine. At
    100 TB the anti join is the only shuffle (key-partitioned), and the
    single-scan fold means adding more column checks costs zero extra
    passes — constraints scale with columns, not scans."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_priority"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_nonpositive_price"),
    )
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_orphan_orders"))
    )
    dups = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") > 1)
        .agg(F.count("*").alias("n_dup_orderkeys"))
    )
    return base.crossJoin(orphans).crossJoin(dups).select(
        "n_orders", "n_orphan_orders", "n_dup_orderkeys",
        "n_null_priority", "n_nonpositive_price",
    )


@query(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("J7", "A3"),
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 with an explicit SHUFFLE_HASH strategy hint: same shuffle as a
    sort-merge join, but the orders side builds a hash map per partition
    instead of BOTH sides paying an O(n log n) sort — the right call when
    one side is much smaller than the other yet too big to broadcast
    (orders vs lineitem at any SF: 4x fewer rows, here made explicit
    rather than left to the SMJ default). AQE can still override if the
    build side won't fit; the plan-shape test asserts the
    ShuffledHashJoin materializes. Semantics identical to the plain join,
    which is what the oracle checks."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "histogram_equidepth",
    oracle=f"""
    WITH r AS (
      SELECT value, row_number() OVER (ORDER BY value, event_id) - 1 AS rk
      FROM {EVENTS} e
    ),
    t AS (SELECT count(*) AS total FROM {EVENTS} e)
    SELECT (rk * 8) // total AS bucket,
           count(*) AS n_rows,
           min(value) AS lo,
           max(value) AS hi
    FROM r, t
    GROUP BY 1
    """,
    tags=("A9", "A1", "O1"),
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth (equal-count) histogram — the boundary profile
    optimizers and partition planners want (equi-WIDTH buckets collapse
    under skew; equi-depth buckets are the quantile grid). The global rank
    every row needs is computed WITHOUT a single-node sort, reusing the
    distributed two-pass prefix-sum shape from shard_by_token_budget:
    repartitionByRange(value) gives cross-partition order, each partition
    ranks locally, and only the #partitions-row offset table passes
    through one task before broadcasting back. Bucket assignment is pure
    integer math ((rank*8) div total), so the per-bucket counts and exact
    [lo, hi] boundaries hash-match DuckDB's window-ranked twin."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select("value", "event_id")
    part = ev.repartitionByRange(8, "value", "event_id").withColumn(
        "_part", F.spark_partition_id()
    )
    sizes = part.groupBy("_part").agg(F.count("*").alias("sz"))
    off_w = W.orderBy("_part").rowsBetween(W.unboundedPreceding, -1)
    offsets = sizes.select(
        "_part",
        F.coalesce(F.sum("sz").over(off_w), F.lit(0)).alias("off"),
        F.sum("sz").over(W.partitionBy()).alias("total"),
    )
    rk_w = W.partitionBy("_part").orderBy("value", "event_id")
    ranked = (
        part.join(F.broadcast(offsets), "_part")
        .withColumn("rk", F.row_number().over(rk_w) + F.col("off") - 1)
        .withColumn("bucket", F.expr("(rk * 8) div total"))
    )
    return ranked.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@query(
    "agg_countmin_sketch",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_exact,
           true AS never_undercounts,
           true AS within_eps_bound
    FROM {EVENTS} e
    GROUP BY event_type
    """,
    tags=("A5", "A7", "F8"),
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode-Muthukrishnan) — the mergeable FREQUENCY
    sketch completing the sketch family (HLL = distinct, Misra-Gries =
    top-k, CMS = per-key counts). d=4 hash rows x w=64 buckets: every
    event increments one bucket per row (explode to 4 (row, bucket) cells,
    one map-side-combined groupBy over 256 cells — at 100 TB the shuffle
    carries the SKETCH, never the keys), and a key's estimate is the MIN
    over its d buckets. The audit carries the two CMS guarantees per key:
    estimate >= exact (one-sided error, never undercounts) and
    estimate <= exact + (e/w)*N (the eps-bound with e/w ≈ 0.0425 at
    w=64). Exact counts ride along, so the whole row — including both
    booleans — is hash-gated against the SQL twin."""
    import math

    D, W = 4, 64
    ev = load_table(spark, sf_dir, "events").select("event_type")
    cell = ev.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        F.pmod(F.xxhash64(F.lit(r), "event_type"), F.lit(W)).alias(
                            "bucket"
                        ),
                    )
                    for r in range(D)
                ]
            )
        ).alias("c"),
    ).select("event_type", "c.row", "c.bucket")
    sketch = cell.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))
    keys = ev.groupBy("event_type").agg(F.count("*").alias("n_exact"))
    key_cells = keys.select(
        "event_type",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        F.pmod(F.xxhash64(F.lit(r), "event_type"), F.lit(W)).alias(
                            "bucket"
                        ),
                    )
                    for r in range(D)
                ]
            )
        ).alias("c"),
    ).select("event_type", "n_exact", "c.row", "c.bucket")
    est = (
        key_cells.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("event_type", "n_exact")
        .agg(F.min("cnt").alias("estimate"))
    )
    total = keys.agg(F.sum("n_exact").alias("n_total"))
    eps = math.e / W
    return est.crossJoin(F.broadcast(total)).select(
        "event_type",
        "n_exact",
        (F.col("estimate") >= F.col("n_exact")).alias("never_undercounts"),
        (F.col("estimate") <= F.col("n_exact") + F.lit(eps) * F.col("n_total")).alias(
            "within_eps_bound"
        ),
    )


@query(
    "agg_mode_exact",
    oracle=f"""
    SELECT event_type, user_id AS mode_user, n FROM (
      SELECT event_type, user_id, count(*) AS n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY count(*) DESC, user_id) AS rn
      FROM {EVENTS} e
      GROUP BY event_type, user_id
    ) WHERE rn = 1
    """,
    tags=("A1", "W1"),
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode (most frequent value) with a DETERMINISTIC
    tie-break — the built-in mode() leaves tie order engine-defined, which
    is exactly the kind of nondeterminism that breaks cross-run diffs and
    incremental recomputes at scale. Shape: count per (group, value) with
    map-side combine, then WindowGroupLimit-eligible rank-1 selection
    (ties break on the value itself), so the window state is O(1) per
    group and the heavy shuffle happens once on the pre-aggregated
    counts."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("user_id"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("user_id").alias("mode_user"), "n")
    )


@query(
    "agg_group_median_exact",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM {EVENTS} e
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           avg(value) AS median_value
    FROM ranked
    WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY event_type
    """,
    tags=("A9", "W1"),
)
def agg_group_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median by order statistics — the complement of
    percentile_approx for the audit/finance cases where "approximately the
    median" is not an answer. Each group's middle one-or-two elements are
    selected by rank (row_number + group count in one window pass over the
    group's partition), then averaged — no group ever materializes as an
    array, no sort leaves its partition, so a billion-row group costs one
    in-partition sort like any other window. The even-group interpolation
    (a+b)/2 matches quantile_cont(0.5) exactly in both engines."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select("event_type", "value", "event_id")
    w = W.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w.orderBy("value", "event_id")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.expr("(n + 1) div 2")) | (F.col("rn") == F.expr("(n + 2) div 2"))
    )
    return mid.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.avg("value").alias("median_value"),
    )


@query(
    "sql_scalar_udf",
    oracle=f"""
    SELECT event_type,
           CAST(sum(CAST(CAST(round(value * 100) AS BIGINT) / 100.0 * 1.08
                         AS DECIMAL(38,6))) AS DOUBLE) AS taxed_total,
           count(*) AS n
    FROM {EVENTS} e
    WHERE CAST(round(value * 100) AS BIGINT) / 100.0 * 1.08 > 50.0
    GROUP BY event_type
    """,
    tags=("F4", "F6", "U3"),
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs (Spark 4 `CREATE FUNCTION ... RETURN expr`) — the
    right way to share business logic across queries: the function body is
    pure SQL, so Catalyst INLINES it at plan time and the call sites keep
    whole-stage codegen, predicate behavior, and vectorization — none of
    which survive a Python UDF. The demo registers cents-rounding and
    tax logic once, uses it in both the projection and the WHERE clause,
    and the oracle inlines the same expressions — byte-identical results
    prove the inlining semantics."""
    from ..sources.readers import register_views

    register_views(spark, sf_dir, ["events"])
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION to_cents_exact(v DOUBLE) "
        "RETURNS DOUBLE RETURN CAST(round(v * 100) AS BIGINT) / 100.0"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION with_tax(v DOUBLE) "
        "RETURNS DOUBLE RETURN to_cents_exact(v) * 1.08"
    )
    return spark.sql(
        """
        SELECT event_type,
               -- decimal-routed sum: per-row quantization then exact decimal
               -- addition, so distributed order never changes the answer
               CAST(sum(CAST(with_tax(value) AS DECIMAL(38,6))) AS DOUBLE)
                 AS taxed_total,
               count(*) AS n
        FROM events
        WHERE with_tax(value) > 50.0
        GROUP BY event_type
        """
    )


@query(
    "engine_observe_metrics",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
    FROM {EVENTS} e
    WHERE event_type <> 'error'
    """,
    tags=("A3", "S8"),
)
def engine_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline telemetry via the Observation API — df.observe() attaches
    named aggregate metrics to a production pass so data-quality counters
    (row count, null count, checksum-style sums) come out of the SAME
    scan the job already runs: zero extra passes, zero extra shuffles,
    exactly the accumulator pattern a 100 TB ETL needs for its
    row-accounting canary (the batch counterpart of
    stream_progress_audit's numInputRows check). The observed metrics
    are computed executor-side during the action and surfaced as one
    driver-side row — bounded by the metric count, never by data. The
    sum routes through decimal(38,6) (registry discipline) so the
    cross-engine hash is exact; observe() forbids distinct aggregates,
    which is precisely what keeps its overhead accumulator-cheap."""
    from pyspark.sql import Observation

    from .registry import dsum

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") != "error")
    obs = Observation("pipeline_audit")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        dsum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
    )
    # The "production job": a representative downstream aggregate whose
    # action triggers metric collection; its own result is discarded —
    # the metrics row is this query's product.
    observed.groupBy("event_type").count().collect()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_null_value"], float(m["sum_value"]), float(m["max_value"]))],
        "n_rows long, n_null_value long, sum_value double, max_value double",
    )


@query(
    "sql_collated_groupby",
    oracle=f"""
    SELECT lower(CASE WHEN user_id % 2 = 0 THEN upper(event_type) ELSE event_type END) AS etype,
           count(*) AS n
    FROM {EVENTS} e
    GROUP BY 1
    """,
    tags=("F2", "A1"),
)
def sql_collated_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping — Spark 4 string collations: a mixed-case
    feed (half the producers shout CLICK, half whisper click) grouped
    under UTF8_LCASE, so case variants merge at the COMPARISON level
    instead of by lossy eager normalization. The collated comparison runs
    inside codegen (no UDF, no extra projection); the output key is
    re-lowered only for a deterministic display form (which group
    representative wins is engine-defined). The oracle models the
    equivalence classes with lower() — same partition of the key space.
    At scale, collation on the grouping key changes ONLY the hash/equality
    function: shuffle volume and plan shape are identical to the binary
    collation."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_t")
    return spark.sql(
        """
        SELECT lower(k) AS etype, n FROM (
          SELECT k, count(*) AS n FROM (
            SELECT (CASE WHEN user_id % 2 = 0 THEN upper(event_type)
                         ELSE event_type END) COLLATE UTF8_LCASE AS k
            FROM events_t
          ) GROUP BY k
        )
        """
    )


@query(
    "sql_try_arithmetic",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_rows,
           CAST(count(CASE WHEN user_id % 3 <> 1 THEN 1 END) AS BIGINT) AS n_safe_div,
           CAST(sum(CASE WHEN user_id % 3 = 1 THEN NULL
                         ELSE CAST(value / (CAST(user_id % 3 AS DOUBLE) - 1.0) AS DECIMAL(38,6))
                    END) AS DOUBLE) AS sum_div,
           CAST(count(CASE WHEN user_id % 5 <> 0 THEN 1 END) AS BIGINT) AS n_parsed_ids
    FROM {EVENTS} e
    GROUP BY event_type
    """,
    tags=("F4", "F6", "F5"),
)
def sql_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family (try_divide / try_cast) — ANSI mode's
    production posture: arithmetic faults yield NULL instead of either
    killing a 6-hour job (strict ANSI) or silently corrupting results
    (legacy wraparound). Planted faults: every user_id%3==1 row divides
    by zero; every user_id%5==0 row carries an unparseable 'N/A' id
    string. try_* lets one pass both survive the faults AND account for
    them (n_rows - n_safe_div = the fault count — the quarantine ledger,
    same philosophy as src_corrupt_records). Denominators are -1/0/+1 so
    the surviving quotients are exact; sums route through decimal. All
    map-side expression work inside codegen; one aggregate shuffle."""
    ev = load_table(spark, sf_dir, "events")
    dirty_id = F.when(F.col("user_id") % 5 == 0, F.lit("N/A")).otherwise(
        F.col("user_id").cast("string")
    )
    div = F.expr("try_divide(value, CAST(user_id % 3 AS DOUBLE) - 1.0)")
    parsed = F.expr(
        "try_cast(CASE WHEN user_id % 5 = 0 THEN 'N/A' "
        "ELSE CAST(user_id AS STRING) END AS BIGINT)"
    )
    return ev.select("event_type", div.alias("d"), parsed.alias("p")).groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n_rows"),
        F.count("d").alias("n_safe_div"),
        F.sum(F.col("d").cast("decimal(38,6)")).cast("double").alias("sum_div"),
        F.count("p").alias("n_parsed_ids"),
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE anc(start_key, node, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey % 100 = 0
      UNION ALL
      SELECT start_key, node // 2, depth + 1 FROM anc WHERE node > 0 AND depth < 10
    )
    SELECT depth, count(*) AS n, CAST(sum(node) AS BIGINT) AS sum_nodes
    FROM anc GROUP BY depth
    """,
    tags=("J7", "A1"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE in PURE Spark SQL (Spark 4.1's WITH RECURSIVE) — the
    hierarchy-walking surface (org charts, BOM explosions, folder trees)
    that previously required the DataFrame-loop pattern used by
    dedup_connected_components/graph_shortest_path. Here: ancestor chains
    of a seed customer set through the implicit binary-tree parent
    relation (parent = key DIV 2), depth-bounded so UNION ALL recursion
    terminates. Each recursion step is one incremental self-join on the
    previous frontier — the engine materializes per-step results like the
    manual loop, but the plan is declared in one statement. Integer
    arithmetic throughout, so the per-depth rollup hash-matches DuckDB's
    recursive fixpoint exactly. Depth guards are the at-scale discipline:
    an unguarded cyclic recursion diverges in ANY engine."""
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        WITH RECURSIVE anc(start_key, node, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey % 100 = 0
          UNION ALL
          SELECT start_key, node DIV 2, depth + 1 FROM anc WHERE node > 0 AND depth < 10
        )
        SELECT depth, count(*) AS n, CAST(sum(node) AS BIGINT) AS sum_nodes
        FROM anc GROUP BY depth
        """
    )


@query(
    "sql_pipe_syntax",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM {EVENTS} e
    WHERE value >= 0.5
    GROUP BY event_type
    """,
    tags=("A1", "P2"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's |> operators, the GoogleSQL-pipes
    surface): the same scan → filter → aggregate pipeline spelled as a
    linear dataflow instead of inside-out SQL — the readability bridge
    for users coming from DataFrame chains. Pipe stages are pure parse
    sugar: the analyzed plan, pushdown, and partial→final aggregation
    are identical to the classic form (the oracle IS the classic form),
    so adopting pipes costs nothing at any scale."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_t")
    return spark.sql(
        """
        FROM events_t
        |> WHERE value >= 0.5
        |> AGGREGATE count(*) AS n,
                     CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
           GROUP BY event_type
        """
    )


@query(
    "agg_filter_clause",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_all,
           count(*) FILTER (WHERE value >= 10) AS n_big,
           CAST(sum(CAST(value AS DECIMAL(38,6))) FILTER (WHERE day(ts) <= 7) AS DOUBLE)
             AS sum_week1,
           count(DISTINCT user_id) FILTER (WHERE value >= 10) AS n_big_users
    FROM {EVENTS} e
    GROUP BY event_type
    """,
    tags=("A3", "F5"),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard FILTER clause on aggregates — conditional
    aggregation without CASE-WHEN contortions, and the idiomatic way to
    compute many differently-filtered metrics in ONE pass (each FILTER
    prunes that aggregate's input inside the same partial→final
    HashAggregate; no extra scans, no joins between metric queries —
    exactly how a 100 TB metrics rollup avoids N passes for N metrics).
    Includes the tricky combination: DISTINCT + FILTER together. Spark
    and DuckDB both implement the standard; decimal-routed sums keep the
    hash exact."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_t")
    return spark.sql(
        """
        SELECT event_type,
               count(*) AS n_all,
               count(*) FILTER (WHERE value >= 10) AS n_big,
               CAST(sum(CAST(value AS DECIMAL(38,6))) FILTER (WHERE day(ts) <= 7) AS DOUBLE)
                 AS sum_week1,
               count(DISTINCT user_id) FILTER (WHERE value >= 10) AS n_big_users
        FROM events_t
        GROUP BY event_type
        """
    )


@query(
    "sql_luhn_validate",
    oracle=f"""
    WITH ids AS (
      SELECT event_id, lpad(CAST(user_id AS VARCHAR), 10, '0') || lpad(CAST(event_id % 100000 AS VARCHAR), 5, '0') AS acct
      FROM {EVENTS} e WHERE event_id % 20 = 0
    ),
    digits AS (
      SELECT event_id, acct, d.i AS pos,
             CAST(substring(acct, CAST(len(acct) - d.i AS INTEGER), 1) AS BIGINT) AS dig
      FROM ids, unnest(range(0, 15)) AS d(i)
    ),
    summed AS (
      SELECT event_id, acct,
             CAST(sum(CASE WHEN pos % 2 = 1
                           THEN CASE WHEN dig * 2 > 9 THEN dig * 2 - 9 ELSE dig * 2 END
                           ELSE dig END) AS BIGINT) AS s
      FROM digits GROUP BY event_id, acct
    )
    SELECT CAST(count(*) AS BIGINT) AS n_checked,
           CAST(count(CASE WHEN s % 10 = 0 THEN 1 END) AS BIGINT) AS n_valid
    FROM summed
    """,
    tags=("F2", "F6"),
)
def sql_luhn_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum validation at ingest — Spark 4's built-in luhn_check over
    synthetic 15-digit account identifiers, cross-checked by an oracle
    that implements the Luhn algorithm FROM FIRST PRINCIPLES (per-digit
    expansion, double-every-second-from-the-right, subtract 9 above 9,
    mod-10): the built-in and the textbook definition must agree on
    every id, which is the strongest kind of oracle — two independent
    implementations of the same spec. This is the dq_constraint_check
    pattern applied to checksummed identifiers (card/IMEI/account
    formats): a map-only validation scan whose pass/fail counts are the
    quarantine ledger."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    acct = F.concat(
        F.lpad(F.col("user_id").cast("string"), 10, "0"),
        F.lpad((F.col("event_id") % 100000).cast("string"), 5, "0"),
    )
    checked = ev.select(acct.alias("acct"))
    return checked.agg(
        F.count("*").alias("n_checked"),
        F.count(F.when(F.expr("luhn_check(acct)"), 1)).alias("n_valid"),
    )


@query(
    "agg_grouping_id",
    oracle=f"""
    SELECT coalesce(event_type, '<rollup>') AS etype,
           coalesce(CAST(year(ts) AS BIGINT), -1) AS y,
           CAST(GROUPING(event_type) AS BIGINT) AS g_type,
           CAST(GROUPING(year(ts)) AS BIGINT) AS g_year,
           count(*) AS n
    FROM {EVENTS} e
    GROUP BY ROLLUP (event_type, year(ts))
    """,
    tags=("A6", "F5"),
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() disambiguation for rollup levels — the correctness
    detail every super-aggregate report needs: a NULL grouping column is
    ambiguous (is this row the rollup total, or the group whose VALUE is
    NULL?), and coalesce-based labeling silently merges the two. The
    GROUPING() flag (0 = real group, 1 = rolled up) is the standard's
    answer, and downstream BI layers key on it. One Expand-fed aggregate
    pass, same plan as agg_rollup — the flags are free metadata from the
    grouping-set id, no extra shuffle."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_t")
    return spark.sql(
        """
        SELECT coalesce(event_type, '<rollup>') AS etype,
               coalesce(CAST(year(ts) AS BIGINT), -1L) AS y,
               CAST(GROUPING(event_type) AS BIGINT) AS g_type,
               CAST(GROUPING(year(ts)) AS BIGINT) AS g_year,
               count(*) AS n
        FROM events_t
        GROUP BY ROLLUP (event_type, year(ts))
        """
    )


# --------------------------------------------------------------------------
# Data-quality: distribution drift (PSI) between two feed windows
# --------------------------------------------------------------------------
_PSI_BINS = 15
_PSI_W = 40.0  # bin width over value's Exp(mean 50) range, cap at bin 14


@query(
    "dq_drift_psi",
    oracle=f"""
    WITH ev AS (SELECT event_type, value, day(ts) AS d FROM {{EVENTS}} e),
    base AS (SELECT event_type,
                    least(CAST(floor(value / {{W}}) AS BIGINT), {{B}} - 1) AS bin,
                    count(*) AS c
             FROM ev WHERE d BETWEEN 1 AND 7 GROUP BY 1, 2),
    curr AS (SELECT event_type,
                    least(CAST(floor(value / {{W}}) AS BIGINT), {{B}} - 1) AS bin,
                    least(CAST(floor(value * 1.5 / {{W}}) AS BIGINT), {{B}} - 1) AS sbin,
                    count(*) AS c
             FROM ev WHERE d BETWEEN 15 AND 21 GROUP BY 1, 2, 3),
    currb AS (SELECT event_type, bin, sum(c) AS c FROM curr GROUP BY 1, 2),
    currs AS (SELECT event_type, sbin AS bin, sum(c) AS c FROM curr GROUP BY 1, 2),
    grid AS (SELECT t.event_type, g.bin
             FROM (SELECT DISTINCT event_type FROM ev) t,
                  (SELECT unnest(range(0, {{B}})) AS bin) g),
    tot AS (SELECT b.event_type,
                   (SELECT sum(c) FROM base WHERE event_type = b.event_type) AS nb,
                   (SELECT sum(c) FROM currb WHERE event_type = b.event_type) AS nc
            FROM (SELECT DISTINCT event_type FROM ev) b),
    terms AS (
      SELECT g.event_type, g.bin,
             (coalesce(base.c, 0) + 1.0) / (tot.nb + {{B}}) AS p,
             (coalesce(currb.c, 0) + 1.0) / (tot.nc + {{B}}) AS q,
             (coalesce(base.c, 0) + 1.0) / (tot.nb + {{B}}) AS ps_p,
             (coalesce(currs.c, 0) + 1.0) / (tot.nc + {{B}}) AS ps_q
      FROM grid g
      JOIN tot ON tot.event_type = g.event_type
      LEFT JOIN base ON base.event_type = g.event_type AND base.bin = g.bin
      LEFT JOIN currb ON currb.event_type = g.event_type AND currb.bin = g.bin
      LEFT JOIN currs ON currs.event_type = g.event_type AND currs.bin = g.bin
    )
    SELECT event_type,
           CAST(max(tot.nb) AS BIGINT) AS n_base,
           CAST(max(tot.nc) AS BIGINT) AS n_curr,
           CAST(sum(CAST(round((p - q) * ln(p / q), 6) AS DECIMAL(38,6))) AS DOUBLE)
             AS psi_value,
           CAST(sum(CAST(round((ps_p - ps_q) * ln(ps_p / ps_q), 6) AS DECIMAL(38,6))) AS DOUBLE)
             AS psi_shifted,
           CAST(sum(CAST(round((ps_p - ps_q) * ln(ps_p / ps_q), 6) AS DECIMAL(38,6)))
                > 0.1 AS BOOLEAN) AS drifted
    FROM terms JOIN tot USING (event_type)
    GROUP BY event_type
    """.format(EVENTS=EVENTS, B=_PSI_BINS, W=_PSI_W),
    tags=("A3", "F4", "P2"),
)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring via the Population Stability Index —
    the standard production check that a feature feed still looks like
    the training window (model-input drift alarms, the dq family's
    statistical sibling to dq_constraint_check's hard constraints).
    Per event_type, `value` is histogrammed into 15 fixed bins over a
    base window (days 1-7) and a current window (days 15-21), both
    Laplace-smoothed so empty bins stay finite, and
    PSI = Σ (p−q)·ln(p/q). Two PSIs are emitted: the raw feed (stable by
    construction — the generator is stationary — so PSI ≈ 0) and a
    deliberately 1.5x-rescaled current window simulating a unit-change
    regression upstream (drifts hard, >0.1) — both decision branches
    exercised deterministically. Cross-engine exactness is the
    perplexity pattern: identical integer counts → identical float
    ratios, each transcendental term rounded to 6 decimals, summed
    through decimal(38,6). ONE scan of the fact table total: both
    windows and both binnings fold into a compact (type, window, bin,
    shifted-bin) cube first; every downstream count is cube-sized —
    at 100 TB nothing data-sized moves after the scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.dayofmonth("ts").alias("d")
    )
    B, W = _PSI_BINS, _PSI_W

    def binned(col):
        return F.least(F.floor(col / W).cast("long"), F.lit(B - 1))

    # ONE scan of events: a compact (type, window, raw-bin, shifted-bin)
    # cube — at most |types|·2·B·B rows — from which every per-window bin
    # count and total derives. The naive form (separate base/curr/shifted
    # aggregates + a distinct-types pass) scans the fact table 4x; at
    # 100 TB that is 4x the IO for identical output. localCheckpoint
    # pins the tiny cube so the three derived aggregates reuse it instead
    # of re-triggering the scan.
    # win is NULL for rows outside both windows — they contribute nothing
    # to any bin count but keep their event_type in the cube, so the type
    # grid covers EVERY type in the feed (a type absent from one or both
    # windows must surface with a NULL psi, exactly as the oracle's
    # full-table DISTINCT does — not silently vanish), still in ONE scan.
    win = (
        F.when(F.col("d").between(1, 7), F.lit("b"))
        .when(F.col("d").between(15, 21), F.lit("c"))
    )
    cube = (
        ev.groupBy(
            "event_type",
            win.alias("win"),
            binned(F.col("value")).alias("bin"),
            binned(F.col("value") * 1.5).alias("sbin"),
        )
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    return psi_readout(spark, cube)


def psi_readout(spark: SparkSession, cube: DataFrame) -> DataFrame:
    """PSI read-out over the compact (event_type, win, bin, sbin, c)
    cube — ONE definition consumed by the batch query above AND the
    streaming twin (streaming/batch_twins.stream_psi_drift_monitor),
    so the two cannot drift. All inputs are cube-sized; see
    dq_drift_psi's docstring for the smoothing/rounding contract."""
    B = _PSI_BINS
    base = (
        cube.filter(F.col("win") == "b")
        .groupBy("event_type", "bin")
        .agg(F.sum("c").alias("cb"))
    )
    currb = (
        cube.filter(F.col("win") == "c")
        .groupBy("event_type", "bin")
        .agg(F.sum("c").alias("cc"))
    )
    currs = (
        cube.filter(F.col("win") == "c")
        .groupBy("event_type", F.col("sbin").alias("bin"))
        .agg(F.sum("c").alias("cs"))
    )
    types = cube.select("event_type").distinct()
    grid = types.crossJoin(
        spark.range(B).select(F.col("id").alias("bin"))
    )
    tot = base.groupBy("event_type").agg(F.sum("cb").alias("nb")).join(
        currb.groupBy("event_type").agg(F.sum("cc").alias("nc")),
        "event_type",
        "full",  # a type in one window only keeps a NULL total -> NULL psi
    )
    j = (
        grid.join(base, ["event_type", "bin"], "left")
        .join(currb, ["event_type", "bin"], "left")
        .join(currs, ["event_type", "bin"], "left")
        .join(F.broadcast(tot), "event_type", "left")
    )
    p = (F.coalesce(F.col("cb"), F.lit(0)) + 1.0) / (F.col("nb") + B)
    q = (F.coalesce(F.col("cc"), F.lit(0)) + 1.0) / (F.col("nc") + B)
    qs = (F.coalesce(F.col("cs"), F.lit(0)) + 1.0) / (F.col("nc") + B)
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(38,6)")
    sterm = F.round((p - qs) * F.log(p / qs), 6).cast("decimal(38,6)")
    psi_s = F.sum(sterm)
    return j.groupBy("event_type").agg(
        F.max("nb").cast("long").alias("n_base"),
        F.max("nc").cast("long").alias("n_curr"),
        F.sum(term).cast("double").alias("psi_value"),
        psi_s.cast("double").alias("psi_shifted"),
        (psi_s > 0.1).alias("drifted"),
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) sketch: mergeable distinct-count + set intersection
# --------------------------------------------------------------------------
_KMV_K = 64
_KMV_SPACE = 16 ** 12  # hash prefix domain: first 12 hex digits of md5


@query(
    "agg_kmv_intersection",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    ),
    ka AS (SELECT h FROM ranked WHERE event_type = 'click' AND rn <= {_KMV_K}),
    kb AS (SELECT h FROM ranked WHERE event_type = 'purchase' AND rn <= {_KMV_K}),
    uni AS (
      SELECT h, row_number() OVER (ORDER BY h) AS rn
      FROM (SELECT h FROM ka UNION SELECT h FROM kb)
    ),
    u AS (SELECT h FROM uni WHERE rn <= {_KMV_K}),
    uk AS (SELECT (CAST(strpos('0123456789abcdef', substring(h, 1, 1)) - 1 AS BIGINT) * 17592186044416 + CAST(strpos('0123456789abcdef', substring(h, 2, 1)) - 1 AS BIGINT) * 1099511627776 + CAST(strpos('0123456789abcdef', substring(h, 3, 1)) - 1 AS BIGINT) * 68719476736 + CAST(strpos('0123456789abcdef', substring(h, 4, 1)) - 1 AS BIGINT) * 4294967296 + CAST(strpos('0123456789abcdef', substring(h, 5, 1)) - 1 AS BIGINT) * 268435456 + CAST(strpos('0123456789abcdef', substring(h, 6, 1)) - 1 AS BIGINT) * 16777216 + CAST(strpos('0123456789abcdef', substring(h, 7, 1)) - 1 AS BIGINT) * 1048576 + CAST(strpos('0123456789abcdef', substring(h, 8, 1)) - 1 AS BIGINT) * 65536 + CAST(strpos('0123456789abcdef', substring(h, 9, 1)) - 1 AS BIGINT) * 4096 + CAST(strpos('0123456789abcdef', substring(h, 10, 1)) - 1 AS BIGINT) * 256 + CAST(strpos('0123456789abcdef', substring(h, 11, 1)) - 1 AS BIGINT) * 16 + CAST(strpos('0123456789abcdef', substring(h, 12, 1)) - 1 AS BIGINT) * 1) AS v FROM uni WHERE rn = {_KMV_K}),
    overlap AS (
      SELECT count(*) AS c FROM u
      WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
    ),
    est AS (
      SELECT CAST(({_KMV_K} - 1) * {_KMV_SPACE} // uk.v AS BIGINT) AS est_union,
             overlap.c AS n_overlap
      FROM uk, overlap
    ),
    truth AS (
      SELECT count(*) AS n_inter_true FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
      )
    )
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           n_overlap,
           est_union AS n_union_est,
           CAST(n_overlap * est_union // {_KMV_K} AS BIGINT) AS n_inter_est,
           n_inter_true
    FROM est, truth
    """.format(_KMV_K=_KMV_K, _KMV_SPACE=_KMV_SPACE),
    tags=("A5", "F8", "E2"),
)
def agg_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch — the mergeable distinct-count sketch
    that, unlike HLL, also supports SET OPERATIONS: keep the k smallest
    md5 hashes per set; the union sketch is the k smallest of the merged
    sketches; Jaccard is estimated by the overlap fraction inside the
    union sketch and intersection cardinality by J x union estimate
    (Beyer et al.'s unbiased (k-1)/v_k estimator, integer-exact here via
    the 2^48 hash-prefix domain — no float anywhere, so both engines
    agree bit-for-bit on every estimate). Audited against the exact
    distinct intersection computed alongside. Scale shape: per-set top-k
    ranking is a window Spark rewrites to WindowGroupLimit (partial top-k
    map-side — only k rows per set survive any shuffle), sketch algebra
    is k-row arithmetic, and sketches from disjoint partitions/days merge
    associatively — the same property the HLL/count-min family here
    exploits, plus intersection."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    hashes = ev.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    rn = F.row_number().over(W.partitionBy("event_type").orderBy("h"))
    topk = hashes.withColumn("rn", rn).filter(F.col("rn") <= _KMV_K)
    ka = topk.filter(F.col("event_type") == "click").select("h")
    kb = topk.filter(F.col("event_type") == "purchase").select("h")
    uni = (
        ka.unionByName(kb)
        .distinct()
        .withColumn("rn", F.row_number().over(W.orderBy("h")))
        .filter(F.col("rn") <= _KMV_K)
    )
    uk = uni.filter(F.col("rn") == _KMV_K).select(
        F.conv(F.substring("h", 1, 12), 16, 10).cast("long").alias("v")
    )
    overlap = (
        uni.join(ka, "h", "left_semi")
        .join(kb, "h", "left_semi")
        .agg(F.count("*").alias("n_overlap"))
    )
    truth = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .intersect(
            ev.filter(F.col("event_type") == "purchase").select("user_id")
        )
        .agg(F.count("*").alias("n_inter_true"))
    )
    return (
        uk.crossJoin(overlap)
        .crossJoin(truth)
        .select(
            F.lit(_KMV_K).cast("long").alias("k"),
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.expr(
                f"CAST(({_KMV_K} - 1) * {_KMV_SPACE} div v AS BIGINT)"
            ).alias("n_union_est"),
            F.expr(
                f"CAST(n_overlap * (({_KMV_K} - 1) * {_KMV_SPACE} div v) "
                f"div {_KMV_K} AS BIGINT)"
            ).alias("n_inter_est"),
            F.col("n_inter_true").cast("long").alias("n_inter_true"),
        )
    )


@query(
    "sql_create_function",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_urgent_lines,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS disc_revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
    tags=("F4", "U3", "A3"),
)
def sql_create_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions (Spark 4 `CREATE FUNCTION ... RETURN expr`) —
    reusable business logic that lives in the CATALOG, not in Python: the
    scalar body is inlined by the analyzer into the calling plan, so it
    codegens like any expression (zero UDF overhead — the fastest kind of
    UDF is the one the optimizer dissolves). A scalar function
    (discounted price) and a predicate function (urgency test) register
    once and drive a revenue rollup; the oracle inlines the same bodies,
    proving the catalog indirection changes nothing about the result. At
    100 TB this matters because the predicate STILL pushes down and the
    expression STILL whole-stage-codegens — neither survives a Python
    UDF."""
    register_views(spark, sf_dir, ["lineitem", "orders"])
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_urgent(pri STRING) "
        "RETURNS BOOLEAN RETURN pri = '1-URGENT'"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_urgent_lines,
               CAST(sum(CAST(disc_price(l_extendedprice, l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE) AS disc_revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE is_urgent(o_orderpriority)
        GROUP BY l_returnflag
        """
    )


@query(
    "sql_group_order_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("A1", "O1"),
)
def sql_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 4 + DuckDB shared SQL
    surface): group on every non-aggregate select item and order on the
    whole select list without restating columns — pure parse sugar that
    analyzes to the identical grouped aggregate + sort, so pushdown and
    partial aggregation are untouched. The convenience matters at the
    ad-hoc-analytics layer this engine's SQL views serve (readers.
    register_views); nothing changes at scale because nothing changes in
    the plan."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_t"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        FROM lineitem_t
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "sql_unpivot_syntax",
    oracle=f"""
    SELECT event_type, metric, val
    FROM (
      SELECT event_type,
             CAST(min(value) AS DOUBLE) AS vmin,
             CAST(max(value) AS DOUBLE) AS vmax,
             CAST(count(*) AS DOUBLE) AS vcount
      FROM {{EVENTS}} e
      GROUP BY event_type
    ) UNPIVOT (val FOR metric IN (vmin, vmax, vcount))
    """.format(EVENTS=EVENTS),
    tags=("E1", "F7"),
)
def sql_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNPIVOT clause (wide -> long), the inverse of PIVOT and the
    declarative twin of unpivot_stack's stack() expression: per-type
    min/max/count metrics fold into (metric, val) rows inside the FROM
    clause. Spark analyzes UNPIVOT to the same Expand node stack()
    lowers to — one pass over the (already dimension-sized) aggregate,
    output rows = groups x metrics, no shuffle beyond the aggregate's
    own. min/max/count are float-exact picks so the long form
    hash-matches without a decimal detour."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_t")
    return spark.sql(
        """
        SELECT event_type, metric, val
        FROM (
          SELECT event_type,
                 CAST(min(value) AS DOUBLE) AS vmin,
                 CAST(max(value) AS DOUBLE) AS vmax,
                 CAST(count(*) AS DOUBLE) AS vcount
          FROM events_t
          GROUP BY event_type
        ) UNPIVOT (val FOR metric IN (vmin, vmax, vcount))
        """
    )


@query(
    "dq_ks_drift",
    oracle="""
    WITH ks_per AS (
      SELECT n_chars,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS cb
      FROM documents GROUP BY 1
    ),
    ks_cum AS (
      SELECT n_chars,
             sum(ca) OVER (ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
             sum(cb) OVER (ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb
      FROM ks_per
    ),
    ks_tot AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM ks_per),
    ks_scored AS (
      SELECT t.n_a, t.n_b,
             abs(t.n_b * c.fa - t.n_a * c.fb) AS dnum, c.n_chars
      FROM ks_cum c, ks_tot t
    )
    SELECT CAST(n_a AS BIGINT) AS n_en,
           CAST(n_b AS BIGINT) AS n_other,
           CAST(dnum AS BIGINT) AS ks_d_scaled,
           CAST(n_chars AS BIGINT) AS ks_at_value,
           CAST(CAST(dnum AS HUGEINT) * 1000000
                // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS ks_stat_ppm
    FROM ks_scored
    ORDER BY dnum DESC, n_chars ASC LIMIT 1
    """,
    tags=("A3", "W3", "F4"),
)
def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between cohorts (en vs
    non-en documents over the length distribution) — the dq family's
    nonparametric sibling to dq_drift_psi: no binning choice, sensitive
    to ANY distributional difference, the standard feature-drift gate
    when the monitored variable is continuous-ish.

    Exactness: the KS statistic D = max|F1 - F2| is kept as the EXACT
    integer numerator |n2·cum1 - n1·cum2| (max over the value domain,
    deterministic min-value tie-break via a single struct-max
    aggregate); D is reported as an exact decimal-lifted 1e6-scaled
    floor ratio (ks_stat_ppm), never a rounded float — Spark HALF_UP
    decimal rounding vs DuckDB double rounding can disagree at 5e-7
    boundaries. Scale: one corpus
    scan folds into a per-distinct-value count table; the cumulative
    window runs over that VALUE-DOMAIN-sized table (bounded by the
    measured variable's support, not the corpus — the histogram-ntile
    argument), the totals ride a broadcast 1-row aggregate, and the
    argmax is a single struct-max — nothing corpus-sized moves after
    the first groupBy."""
    from pyspark.sql import Window as PW

    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("n_chars").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("cb"),
    )
    w = PW.orderBy("n_chars").rowsBetween(PW.unboundedPreceding, PW.currentRow)
    cum = per.select(
        "n_chars",
        F.sum("ca").over(w).alias("fa"),
        F.sum("cb").over(w).alias("fb"),
    )
    tot = per.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        F.abs(F.col("n_b") * F.col("fa") - F.col("n_a") * F.col("fb")).alias("dnum"),
        "n_chars",
    )
    best = scored.agg(
        F.max(
            F.struct(
                F.col("dnum"),
                (-F.col("n_chars")).alias("negv"),
                F.col("n_a"),
                F.col("n_b"),
            )
        ).alias("s")
    )
    return best.select(
        F.col("s.n_a").alias("n_en"),
        F.col("s.n_b").alias("n_other"),
        F.col("s.dnum").cast("long").alias("ks_d_scaled"),
        (-F.col("s.negv")).cast("long").alias("ks_at_value"),
        # exact 1e6-scaled floor ratio, decimal-lifted: dnum*1e6 exceeds
        # int64 once cohort products pass ~9e12 (advisor find r7 — no
        # float-rounding window in a hash-gated column)
        F.expr(
            "cast(cast(s.dnum as decimal(38,0)) * 1000000"
            " div (cast(s.n_a as decimal(38,0)) * s.n_b) as bigint)"
        ).alias("ks_stat_ppm"),
    )


# --- SQL scripting (BEGIN/END control flow) ----------------------------------
_SCRIPT_CAP = 200  # target: <= this many orders above the threshold


@query(
    "sql_scripting_threshold_search",
    oracle=f"""
    WITH pows AS (
      SELECT CAST(power(2, g) AS BIGINT) AS thr
      FROM (SELECT unnest(range(0, 40)) AS g)
    ),
    cnt AS (
      SELECT thr,
             (SELECT CAST(count(*) AS BIGINT) FROM orders
               WHERE o_totalprice > thr) AS n_above
      FROM pows
    )
    SELECT thr AS threshold, n_above
    FROM cnt WHERE n_above <= {_SCRIPT_CAP}
    ORDER BY thr LIMIT 1
    """,
    tags=("P2", "A1", "F4"),
)
def sql_scripting_threshold_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (SQL/PSM BEGIN..END, Spark 4's procedural surface):
    a WHILE loop doubles a revenue threshold until at most 200
    (_SCRIPT_CAP) orders exceed it — the galloping-search shape used to
    pick spill/alert thresholds when the right value depends on the
    data. Control flow runs on the driver; each probe is an ordinary
    distributed aggregate, so
    the pattern scales exactly like ~log2(max value) count(*) queries.
    The oracle states the fixpoint declaratively: the smallest power of
    two whose exceed-count is under the cap — the loop and the
    declarative form provably agree because the exceed-count is
    monotone nonincreasing in the threshold.

    (Requires spark.sql.scripting.enabled; restored in finally. The
    temp view is session-scoped — the gate runs this serially.)"""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_script_v")
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    try:
        spark.conf.set("spark.sql.scripting.enabled", "true")
        out = spark.sql(
            f"""
            BEGIN
              DECLARE thr BIGINT DEFAULT 1;
              WHILE (SELECT count(*) FROM orders_script_v
                      WHERE o_totalprice > thr) > {_SCRIPT_CAP} DO
                SET thr = thr * 2;
              END WHILE;
              SELECT thr AS threshold,
                     (SELECT count(*) FROM orders_script_v
                       WHERE o_totalprice > thr) AS n_above;
            END
            """
        )
        return out.localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)



_KANON_K = 5


@query(
    "dq_k_anonymity",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source, n_chars // 100 AS len_bucket,
             CAST(count(*) AS BIGINT) AS grp_n
      FROM documents GROUP BY 1, 2, 3),
    sizes AS (
      SELECT CASE WHEN grp_n >= {_KANON_K} THEN {_KANON_K} ELSE grp_n END
               AS k_class,
             count(*) AS n_groups, sum(grp_n) AS n_docs
      FROM cells GROUP BY 1)
    SELECT CAST(k_class AS BIGINT) AS k_class,
           CAST(n_groups AS BIGINT) AS n_groups,
           CAST(n_docs AS BIGINT) AS n_docs,
           k_class >= {_KANON_K} AS satisfies_k,
           CAST(CAST(n_docs AS HUGEINT) * 1000000
                // (SELECT sum(grp_n) FROM cells) AS BIGINT) AS doc_share_ppm
    FROM sizes
    """,
    tags=("A1", "A4", "P2"),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the documents table — the
    privacy gate a training-data pipeline runs before release: treat
    (lang, source, length-bucket) as the quasi-identifier and report the
    anonymity histogram — how many equivalence classes have exactly 1,
    2, 3, 4, or >= k=5 members, and how many documents sit in each
    class size. A document alone in its class (k_class = 1) is
    re-identifiable from the quasi-identifiers alone; the k>=5 row is
    the releasable mass. doc_share_ppm gives each class's exact share
    so the re-identification exposure reads directly.

    Scale: two cheap aggregates — quasi-identifier groupBy (map-side
    combined), then a count-of-counts over the GROUP table (bounded by
    the quasi-identifier domain, not by documents); the total rides a
    scalar subquery over the same bounded table. The k-cap keeps the
    output at <= k rows regardless of scale."""
    d = load_table(spark, sf_dir, "documents")
    cells = (
        d.select("lang", "source", F.expr("n_chars div 100").alias("len_bucket"))
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count("*").alias("grp_n"))
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(F.sum("grp_n").cast("decimal(38,0)").alias("total"))
    sizes = (
        cells.withColumn(
            "k_class",
            F.expr(f"CASE WHEN grp_n >= {_KANON_K} THEN {_KANON_K} ELSE grp_n END"),
        )
        .groupBy("k_class")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum("grp_n").cast("long").alias("n_docs"),
        )
    )
    return sizes.crossJoin(F.broadcast(tot)).select(
        F.col("k_class").cast("long").alias("k_class"),
        "n_groups",
        "n_docs",
        (F.col("k_class") >= _KANON_K).alias("satisfies_k"),
        F.expr(
            "CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)"
        ).alias("doc_share_ppm"),
    )


_FRESHNESS_SLA_US = 24 * 3_600_000_000  # 24h staleness budget per series


@query(
    "dq_freshness_by_type",
    oracle=f"""
    WITH last AS (
      SELECT event_type,
             CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
             CAST(count(*) AS BIGINT) AS n
      FROM {EVENTS} ev GROUP BY 1),
    hz AS (SELECT max(last_us) AS max_us FROM last)
    SELECT l.event_type, l.n AS n_events,
           CAST((h.max_us - l.last_us) // 1000000 AS BIGINT) AS lag_sec,
           CASE WHEN h.max_us - l.last_us > {_FRESHNESS_SLA_US}
                THEN 'stale' ELSE 'fresh' END AS verdict
    FROM last l CROSS JOIN hz h
    """,
    tags=("A3", "F1", "F5"),
)
def dq_freshness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series data-freshness audit — the first page of every
    pipeline-health dashboard: each event type's last-seen timestamp,
    its lag behind the freshest series (the watermark proxy a real
    deployment compares against wall clock), and a stale/fresh verdict
    against a 24 h staleness SLA. A silently-dead producer shows up
    here days before anyone reads its downstream metrics.

    Scale: one map-side-combined (type) aggregate + a 1-row horizon
    broadcast. Nothing touches event payloads."""
    ev = load_table(spark, sf_dir, "events")
    last = ev.groupBy("event_type").agg(
        F.expr("CAST(max(unix_micros(ts)) AS BIGINT)").alias("last_us"),
        F.count("*").cast("long").alias("n"),
    )
    hz = last.agg(F.max("last_us").alias("max_us"))
    return last.crossJoin(F.broadcast(hz)).select(
        "event_type",
        F.col("n").alias("n_events"),
        F.expr("CAST((max_us - last_us) div 1000000 AS BIGINT)").alias("lag_sec"),
        F.expr(
            f"CASE WHEN max_us - last_us > {_FRESHNESS_SLA_US}"
            f" THEN 'stale' ELSE 'fresh' END"
        ).alias("verdict"),
    )


_AVAIL_ERR_BUDGET_PCT = 25  # an hour 'meets SLO' iff errors <= 25% of events


@query(
    "ops_availability_nines",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT)
               // 3600000000 AS h,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS err
      FROM {EVENTS} ev GROUP BY 1),
    marked AS (
      SELECT h, CASE WHEN err * 100 <= n * {_AVAIL_ERR_BUDGET_PCT}
                     THEN 1 ELSE 0 END AS up
      FROM cells),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(up) AS BIGINT) AS n_up
      FROM marked)
    SELECT n_hours, n_up,
           CAST(n_up * 1000000 // n_hours AS BIGINT) AS availability_ppm,
           CASE WHEN n_up * 100000 >= n_hours * 99990 THEN '4+'
                WHEN n_up * 10000 >= n_hours * 9990 THEN '3'
                WHEN n_up * 1000 >= n_hours * 990 THEN '2'
                WHEN n_up * 100 >= n_hours * 90 THEN '1'
                ELSE '<1' END AS nines
    FROM s
    """,
    tags=("A2", "F5", "A3"),
)
def ops_availability_nines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Availability 'nines' scorecard — the SLA summary every service
    review opens with: an hour meets SLO iff its error fraction stays
    within the 25% budget (err*100 <= n*25, exact cross-multiplied);
    availability is the up-hour fraction in ppm, classified into the
    nines ladder (>=90% one nine, >=99% two, >=99.9% three, >=99.99%
    four-plus — each tier an exact integer comparison, no float
    percentage anywhere). The complement of ops_slo_burn_rate: burn
    rates page on fast breaches, this scores the long-run record.

    Scale: event volume collapses onto the bounded hourly grid in one
    map-side-combined aggregate; everything after is a 2-sum global
    aggregate and one row of ladder algebra."""
    cells = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "CAST(unix_micros(date_trunc('hour', ts)) AS BIGINT)"
                " div 3600000000"
            ).alias("h")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END")
            ).alias("err"),
        )
    )
    s = cells.select(
        F.expr(
            f"CASE WHEN err * 100 <= n * {_AVAIL_ERR_BUDGET_PCT}"
            " THEN 1 ELSE 0 END"
        ).alias("up")
    ).agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("up").cast("long").alias("n_up"),
    )
    return s.select(
        "n_hours",
        "n_up",
        F.expr("CAST(n_up * 1000000 div n_hours AS BIGINT)").alias(
            "availability_ppm"
        ),
        F.expr(
            "CASE WHEN n_up * 100000 >= n_hours * 99990 THEN '4+'"
            " WHEN n_up * 10000 >= n_hours * 9990 THEN '3'"
            " WHEN n_up * 1000 >= n_hours * 990 THEN '2'"
            " WHEN n_up * 100 >= n_hours * 90 THEN '1'"
            " ELSE '<1' END"
        ).alias("nines"),
    )


_LDIV_L = 3  # minimum sensitive-value diversity for release


@query(
    "dq_l_diversity",
    oracle=f"""
    WITH cells AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(floor(c_acctbal / 500) AS BIGINT) AS bal_bucket,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2, 3),
    sizes AS (
      SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n_orders) AS BIGINT) AS n_orders
      FROM cells GROUP BY l)
    SELECT CAST(l AS BIGINT) AS l_class, n_groups, n_orders,
           l >= {_LDIV_L} AS satisfies_l,
           CAST(CAST(n_orders AS HUGEINT) * 1000000
                // (SELECT sum(n_orders) FROM cells) AS BIGINT)
             AS order_share_ppm
    FROM sizes
    """,
    tags=("A1", "A4", "J1"),
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the privacy
    gate k-anonymity (dq_k_anonymity) cannot provide: a class can be
    k-large yet leak the sensitive attribute if every member SHARES it
    (the homogeneity attack). Quasi-identifier = (market segment,
    nation, account-balance bucket — floor(bal/500), an IEEE-identical
    float op in both engines); sensitive attribute = order priority;
    per QI class, l =
    count of DISTINCT sensitive values observed. Output is the
    l-histogram: how many classes (and how much row mass) sit at each
    diversity level, with the l >= 3 release verdict and each level's
    exact ppm share.

    Scale: the orders-customer join is the only data-sized stage (AQE
    broadcasts the dimension); the QI aggregate is map-side combined
    with a bounded distinct (priority domain is 5), and the histogram
    runs over the QI-domain-bounded class table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        # no forced broadcast: customer scales with sf, so AQE decides
        # (the q5/q18 convention — a hint here OOMs the driver at 100x)
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            "c_nationkey",
            F.expr("CAST(floor(c_acctbal / 500) AS BIGINT)").alias("bal_bucket"),
        )
        .agg(
            F.countDistinct("o_orderpriority").cast("long").alias("l"),
            F.count("*").cast("long").alias("n_orders"),
        )
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(F.sum("n_orders").cast("decimal(38,0)").alias("total"))
    sizes = cells.groupBy("l").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("n_orders").cast("long").alias("n_orders"),
    )
    return sizes.crossJoin(F.broadcast(tot)).select(
        F.col("l").cast("long").alias("l_class"),
        "n_groups",
        "n_orders",
        (F.col("l") >= _LDIV_L).alias("satisfies_l"),
        F.expr(
            "CAST(CAST(n_orders AS DECIMAL(38,0)) * 1000000 div total"
            " AS BIGINT)"
        ).alias("order_share_ppm"),
    )


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_above,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS rev_above
    FROM orders
    WHERE o_totalprice > (SELECT CAST(floor(max(o_totalprice)) AS BIGINT) // 2
                          FROM orders)
    GROUP BY o_orderpriority
    """,
    tags=("F6", "A3", "P2"),
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL through session variables + EXECUTE IMMEDIATE — the
    Spark 4 surface a governed query service uses when the STATEMENT
    itself is data (stored report definitions, admin tooling): DECLARE
    a typed session variable, EXECUTE IMMEDIATE ... INTO to capture a
    data-derived threshold (half the max order value, exact integer via
    floor-div), then EXECUTE IMMEDIATE a parameterized statement
    binding the variable with USING — no string splicing anywhere, the
    same injection-safe posture as sql_params_identifier but with the
    statement text late-bound. The oracle is the equivalent static
    query with a scalar subquery: parameters resolve before analysis,
    so the optimized plan (pushed filter, partial agg) is identical to
    the literal form. The temp view and session variable are sf-suffixed
    (the join_bucketed_colocated convention): both are SESSION-scoped
    mutable state, and two concurrent invocations in one shared
    SparkSession against different sf_dirs would otherwise cross-bind
    the view / read the wrong scale's threshold (ADVICE r9)."""
    suffix = sf_suffix(sf_dir)
    view, var = f"orders_ei_{suffix}", f"ei_thr_{suffix}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    spark.sql(f"DECLARE OR REPLACE VARIABLE {var} BIGINT")
    spark.sql(
        "EXECUTE IMMEDIATE"
        f" 'SELECT CAST(floor(max(o_totalprice)) AS BIGINT) div 2"
        f" FROM {view}' INTO {var}"
    )
    return spark.sql(
        "EXECUTE IMMEDIATE"
        " 'SELECT o_orderpriority,"
        "         CAST(count(*) AS BIGINT) AS n_above,"
        "         CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)"
        "           AS rev_above"
        f"  FROM {view} WHERE o_totalprice > ?"
        f"  GROUP BY o_orderpriority' USING {var}"
    )


# --------------------------------------------------------------------------
# Cost-based what-if: Selinger join-order audit as data (VERDICT r9 item 8)
# --------------------------------------------------------------------------
# The chain O -ck- C -nk- N -rk- R with pushed filters on both ends. Every
# candidate is a connected left-deep join sequence over the path graph
# (8 of them for a 4-node path); each step's cardinality estimate is the
# textbook System-R formula |X join T on k| = |X| * |T| div max(ndv(k)),
# computed from EXACT base statistics (filtered row counts + exact NDVs),
# so both engines derive bit-identical integers and the chosen order is
# pure data — the what-if surface a governed deployment runs BEFORE
# letting a reordered join ship. Spark's own CBO consumes the same
# statistics shape (ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS);
# this query makes the model auditable next to the engine's choice.
_WHATIF_EDGES = {
    ("O", "C"): ("ndv_o_ck", "ndv_c_ck"),
    ("C", "N"): ("ndv_c_nk", "ndv_n_nk"),
    ("N", "R"): ("ndv_n_rk", "ndv_r_rk"),
}
# all connected left-deep sequences over the path O-C-N-R
_WHATIF_CANDS = (
    "OCNR", "CONR", "CNOR", "CNRO", "NCOR", "NCRO", "NRCO", "RNCO",
)
_WHATIF_ORDERS_PRED = "o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'"
_WHATIF_REGION_PRED = "r_name IN ('ASIA', 'EUROPE')"
# stats CTE body; {orders}/{region}/... filled with per-engine table names
_WHATIF_STATS_SQL = f"""
    SELECT * FROM
      (SELECT count(*) AS n_o, count(DISTINCT o_custkey) AS ndv_o_ck
       FROM {{orders}} WHERE {_WHATIF_ORDERS_PRED}) so
      CROSS JOIN
      (SELECT count(*) AS n_c, count(DISTINCT c_custkey) AS ndv_c_ck,
              count(DISTINCT c_nationkey) AS ndv_c_nk
       FROM {{customer}}) sc
      CROSS JOIN
      (SELECT count(*) AS n_n, count(DISTINCT n_nationkey) AS ndv_n_nk,
              count(DISTINCT n_regionkey) AS ndv_n_rk
       FROM {{nation}}) sn
      CROSS JOIN
      (SELECT count(*) AS n_r, count(DISTINCT r_regionkey) AS ndv_r_rk
       FROM {{region}} WHERE {_WHATIF_REGION_PRED}) sr
"""


def _whatif_branches_sql(big: str, idiv: str, stats: str) -> str:
    """The 8 per-candidate estimate branches, generated from ONE spec so
    the Spark and DuckDB texts cannot drift. ``big`` lifts the running
    estimate out of int64 before the product (DECIMAL(38,0) on Spark,
    HUGEINT on DuckDB — the twin-scaling convention); ``idiv`` is the
    truncating integer division (div / //; every operand is positive, so
    floor == trunc). Nested text, not lateral aliases: the COMPOSITION
    ORDER of the truncating divisions is the documented contract."""
    branches = []
    for cand in _WHATIF_CANDS:
        joined = {cand[0]}
        prev = f"n_{cand[0].lower()}"
        ests = []
        for nxt in cand[1:]:
            (ndv_a, ndv_b), = (
                v for k, v in _WHATIF_EDGES.items() if nxt in k and (set(k) & joined)
            )
            ests.append(
                f"(({big.format(x=prev)} * n_{nxt.lower()})"
                f" {idiv} greatest({ndv_a}, {ndv_b}))"
            )
            prev = ests[-1]
            joined.add(nxt)
        label = ">".join(cand)
        branches.append(
            f"SELECT '{label}' AS cand,"
            f" CAST({ests[0]} AS BIGINT) AS est_s1,"
            f" CAST({ests[1]} AS BIGINT) AS est_s2,"
            f" CAST({ests[2]} AS BIGINT) AS est_s3 FROM {stats}"
        )
    return "\n      UNION ALL\n      ".join(branches)


_WHATIF_FINAL_SQL = """
    SELECT cand, est_s1, est_s2, est_s3,
           est_s1 + est_s2 + est_s3 AS est_total,
           CAST(rank() OVER (ORDER BY est_s1 + est_s2 + est_s3, cand)
                AS BIGINT) AS rk
    FROM ({branches}) per_cand
"""


@query(
    "engine_cost_whatif",
    # AS MATERIALIZED: the 8 branches each read stats; un-materialized,
    # DuckDB would inline the 4 stat aggregates into every branch (the
    # WL-oracle CTE-inlining lesson, catch #5 pre-empted)
    oracle="WITH stats AS MATERIALIZED ("
    + _WHATIF_STATS_SQL.format(
        orders="orders", customer="customer", nation="nation", region="region"
    )
    + ")\n"
    + _WHATIF_FINAL_SQL.format(
        branches=_whatif_branches_sql(
            big="CAST({x} AS HUGEINT)",
            idiv="//",
            stats="stats",
        )
    ),
    tags=("A4", "A3", "J10"),
)
def engine_cost_whatif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based what-if as a QUERY: rank every connected left-deep
    join order of the orders-customer-nation-region chain by the
    System-R cardinality model over EXACT collected statistics
    (filtered row counts + exact per-key NDVs — the same statistics
    shape Spark's CBO reads from ANALYZE TABLE), and return the ranked
    orders as data. The point at 100 TB: before trusting a plan change
    (engine upgrade, stats refresh), a deployment replays the cost
    model as a query and diffs the chosen order against the shipped
    plan (engine_plan_audit's governance posture, applied to join
    ordering). Pushed filters on BOTH chain ends (orders date band,
    region name pair) make the ordering non-trivial: the 2-row region
    end collapses early joins that the unfiltered model would rank
    late.

    Scale: ONE aggregation pass per base table (4 bounded stat rows,
    localCheckpoint-materialized so the 8 candidate branches read the
    1-row stats table, not 8 re-scans — the Spark-side CTE-inlining
    lesson from the WL oracle applied in reverse); all candidate
    algebra runs over that single broadcast-sized row. Estimates lift
    through DECIMAL(38,0)/HUGEINT before each product and divide with
    truncating integer division, so both engines emit bit-identical
    integers at any sf."""
    suffix = sf_suffix(sf_dir)
    views = {}
    for t in ("orders", "customer", "nation", "region"):
        v = f"whatif_{t}_{suffix}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(v)
        views[t] = v
    stats_view = f"whatif_stats_{suffix}"
    (
        spark.sql(_WHATIF_STATS_SQL.format(**views))
        # materialize the 1-row stats relation: Spark inlines CTEs, so
        # the 8 branches would otherwise re-run all 4 stat aggregates
        .localCheckpoint(eager=True)
        .createOrReplaceTempView(stats_view)
    )
    return spark.sql(
        _WHATIF_FINAL_SQL.format(
            branches=_whatif_branches_sql(
                big="CAST({x} AS DECIMAL(38,0))",
                idiv="div",
                stats=stats_view,
            )
        )
    )
