"""Reference-domain pipelines re-expressed over the driver's events table.

These are the reference's dataflow components (SURVEY.md §0.1) as batch
queries with DuckDB oracles: suspicious-key detection (diagram comp. 4),
anti-join filtering (comp. 3), windowed popularity + top-N (comp. 6),
high-traffic alerting (comp. 7), TTL state reads (comp. 5), and
sessionization (T3's batch twin). The same logic runs against the
reference-schema fixtures in pipelines (plans/botdetect.py) and as
Structured Streaming queries (streaming/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.readers import load_table
from .registry import query
from .relational import EVENTS

# Per-user-per-hour event count that flags a key as suspicious. The driver
# events table is benign traffic, so a low threshold keeps the result
# non-trivial; the reference's real gap is ~200-2000x (generator.py:125,150).
RATE_THRESHOLD = 3


@query(
    "clk_suspicious_keys",
    oracle=f"""
    SELECT user_id, max(n) AS peak_hourly_rate FROM (
      SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n
      FROM {EVENTS} e GROUP BY 1, 2
    ) GROUP BY user_id
    HAVING max(n) >= {RATE_THRESHOLD}
    """,
    tags=("A2", "A1"),
    bench=True,
)
def clk_suspicious_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch bot-detection core (reference diagram comp. 4): keys whose peak
    per-hour rate crosses the threshold. Two-level aggregate, both with
    map-side partials; the second groupBy reuses the user_id clustering
    from the first, so AQE plans a single effective shuffle."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("n"))
    return (
        hourly.groupBy("user_id")
        .agg(F.max("n").alias("peak_hourly_rate"))
        .filter(F.col("peak_hourly_rate") >= RATE_THRESHOLD)
    )


@query(
    "clk_filter_suspicious",
    oracle=f"""
    WITH susp AS (
      SELECT user_id FROM (
        SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n
        FROM {EVENTS} e GROUP BY 1, 2
      ) GROUP BY user_id HAVING max(n) >= {RATE_THRESHOLD}
    )
    SELECT event_id, user_id, event_type
    FROM {EVENTS} e
    WHERE user_id NOT IN (SELECT user_id FROM susp)
    """,
    tags=("P3", "J2", "J4"),
)
def clk_filter_suspicious(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IP-filter stage (reference diagram comp. 3): anti-join the event
    stream against the detected suspicious set. The set is tiny ⇒ broadcast
    anti-join, zero shuffle of the fact side — the 100 TB shape."""
    ev = load_table(spark, sf_dir, "events")
    susp = clk_suspicious_keys(spark, sf_dir).select("user_id")
    return ev.join(F.broadcast(susp), "user_id", "left_anti").select(
        "event_id", "user_id", "event_type"
    )


@query(
    "clk_popular_by_window",
    oracle=f"""
    SELECT win, event_type, n, rnk FROM (
      SELECT win, event_type, n,
             row_number() OVER (PARTITION BY win ORDER BY n DESC, event_type) AS rnk
      FROM (
        SELECT date_trunc('hour', ts) AS win, event_type, count(*) AS n
        FROM {EVENTS} e GROUP BY 1, 2
      )
    ) WHERE rnk <= 3
    """,
    tags=("T1", "W1", "O3"),
    bench=True,
)
def clk_popular_by_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-popular per tumbling window + top-N (reference diagram comp. 6,
    Kinesis-Analytics aggregation): windowed count then row_number within
    window. The window key rides the groupBy shuffle; the rank window
    reuses that partitioning."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("win"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("win").orderBy(F.col("n").desc(), "event_type")
    return counts.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)


@query(
    "clk_high_traffic_alert",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS win, count(*) AS n
      FROM {EVENTS} e GROUP BY 1
    ),
    mean AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS avg_n FROM hourly)
    SELECT win, n FROM hourly, mean WHERE n > 1.5 * avg_n
    """,
    tags=("T2", "T5", "S8"),
)
def clk_high_traffic_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-traffic notification feed (reference diagram comp. 7): hours
    whose traffic exceeds 1.5x the mean hourly rate — a scale-free
    threshold. The mean is a one-row broadcast, not a driver collect.
    Streaming twin emits per-window alerts via foreachBatch
    (streaming/alerts.py)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("win")).agg(
        F.count("*").alias("n")
    )
    mean = hourly.agg((F.sum("n").cast("double") / F.count("*")).alias("avg_n"))
    return hourly.crossJoin(F.broadcast(mean)).filter(
        F.col("n") > 1.5 * F.col("avg_n")
    ).select("win", "n")


@query(
    "clk_state_ttl_read",
    oracle=f"""
    WITH bounds AS (SELECT max(ts) AS now_ts FROM {EVENTS} e),
         state AS (
           SELECT user_id,
                  max(ts) AS detected_at,
                  max(ts) + INTERVAL 12 HOUR AS expires_at
           FROM {EVENTS} e GROUP BY user_id
         )
    SELECT user_id, detected_at, expires_at
    FROM state, bounds
    WHERE expires_at > bounds.now_ts
    """,
    tags=("S5", "S7", "T7"),
)
def clk_state_ttl_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV-state-with-TTL read semantics (reference diagram comp. 5, DynamoDB
    TTL): state rows are visible only while expires_at > now. "now" is the
    dataset's max event time so the query is deterministic; the production
    state table (sources/state.py) uses current_timestamp."""
    ev = load_table(spark, sf_dir, "events")
    state = ev.groupBy("user_id").agg(
        F.max("ts").alias("detected_at"),
        (F.max("ts") + F.expr("INTERVAL 12 HOURS")).alias("expires_at"),
    )
    now_ts = ev.agg(F.max("ts").alias("now_ts"))
    return state.crossJoin(F.broadcast(now_ts)).filter(
        F.col("expires_at") > F.col("now_ts")
    ).select("user_id", "detected_at", "expires_at")


# One oracle for BOTH sessionize formulations: the chunked twin's
# equivalence claim (BASELINE.md r8 skew table) rests on the two @query
# decorators sharing this literal, so a gap/tie-break change can never
# reach one and miss the other (/code-review r8 find).
_SESSIONIZE_ORACLE = f"""
    SELECT user_id, session_seq,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM {EVENTS} e
      )
    )
    GROUP BY user_id, session_seq
    """


@query(
    "clk_sessionize",
    oracle=_SESSIONIZE_ORACLE,
    tags=("T3", "W2"),
    bench=True,
)
def clk_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization, batch twin of session_window (SURVEY.md §2.9 T3):
    lag-gap > 30 min starts a new session; cumulative sum numbers sessions.
    One shuffle on user_id serves both window passes and the final
    aggregate (same partitioning key)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    sessions = ev.withColumn("session_seq", F.sum(is_new).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    ))
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


_SESSION_GAP_US = 1_800_000_000  # 30 min
_SESSION_CHUNK_US = 6 * 3_600_000_000  # 6-hour time chunks


@query(
    "clk_sessionize_chunked",
    oracle=_SESSIONIZE_ORACLE,
    tags=("T3", "W2", "A7"),
)
def clk_sessionize_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase sessionization — the skew-proof twin of clk_sessionize,
    same answer (the oracle IS clk_sessionize's oracle).

    clk_sessionize's per-user window is UNSPLITTABLE: a bot owning 10%
    of the stream (the reference's bot signature, generator.py:137-154)
    lands its entire history in one task — measured 3.4x straggler /
    2.3x wall on the sf10 hot-key fixture (scripts/skew_bench.py, r8).
    AQE cannot split a window partition the way it splits a skewed join.

    The decomposition: (1) sessionize WITHIN (user_id, 6-hour time
    chunk) — the hot user's history spreads over #chunks tasks, each
    gap/cumsum window is chunk-bounded; (2) collapse each local session
    to one interval row; (3) merge adjacent intervals per user where
    start - prev_end <= 30 min (exactly the complement of the is_new
    rule, so chunk-boundary sessions stitch back losslessly), numbering
    merged sessions with the same cumulative-sum ordinal. The phase-2
    window is still per-user but runs over LOCAL-SESSION rows, bounded
    by (#real sessions + #chunks touched) — for a year-long 100 TB
    stream a saturating bot contributes ~1460 interval rows, not its
    billions of events. Correctness of the stitch: chunking is a pure
    function of ts, so identical-ts ties never straddle a boundary, and
    within a user local sessions from later chunks start strictly after
    earlier ones end."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    chunked = ev.withColumn("_chunk", (us / F.lit(_SESSION_CHUNK_US)).cast("long"))
    wl = W.partitionBy("user_id", "_chunk").orderBy("ts", "event_id")
    lgap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(wl)
    l_new = F.when(lgap.isNull() | (lgap > _SESSION_GAP_US), 1).otherwise(0)
    local = (
        chunked.withColumn(
            "_lseq", F.sum(l_new).over(wl.rowsBetween(W.unboundedPreceding, W.currentRow))
        )
        .groupBy("user_id", "_chunk", "_lseq")
        .agg(
            F.count("*").alias("_n"),
            F.min("ts").alias("_start"),
            F.max("ts").alias("_end"),
        )
    )
    wm = W.partitionBy("user_id").orderBy("_start", "_end")
    mgap = F.unix_micros(F.col("_start")) - F.lag(F.unix_micros(F.col("_end"))).over(wm)
    m_new = F.when(mgap.isNull() | (mgap > _SESSION_GAP_US), 1).otherwise(0)
    merged = local.withColumn(
        "session_seq",
        F.sum(m_new).over(wm.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return merged.groupBy("user_id", "session_seq").agg(
        F.sum("_n").alias("n_events"),
        F.min("_start").alias("session_start"),
        F.max("_end").alias("session_end"),
    )


@query(
    "funnel_conversion",
    oracle=f"""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM {EVENTS} e
                WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM {EVENTS} e
                JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM {EVENTS} e
                JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s1) AS n_viewed,
           (SELECT count(*) FROM s2) AS n_clicked_after_view,
           (SELECT count(*) FROM s3) AS n_purchased_after_click,
           round((SELECT count(*) FROM s3) / CAST((SELECT count(*) FROM s1) AS DOUBLE), 6)
             AS full_funnel_rate
    """,
    tags=("A3", "J3", "F1"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (the Athena-surface ad-hoc query family,
    diagram comp. 11): users who viewed, then clicked strictly AFTER their
    first view, then purchased strictly after that click. Order matters —
    this is not three independent filters but a chain of per-user
    first-passage times, computed as three user-keyed aggregates each
    feeding the next through an equi-join on user_id. Every shuffle keys
    on user_id, so the stages stay co-partitioned (one real exchange, AQE
    reuses it) and per-user state is three timestamps, never the event
    list."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count("*").alias("n_viewed"))
        .crossJoin(s2.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(s3.agg(F.count("*").alias("n_purchased_after_click")))
    )
    return counts.select(
        "n_viewed",
        "n_clicked_after_view",
        "n_purchased_after_click",
        F.round(
            F.col("n_purchased_after_click") / F.col("n_viewed").cast("double"), 6
        ).alias("full_funnel_rate"),
    )


@query(
    "retention_cohorts",
    oracle=f"""
    WITH first_seen AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
                        FROM {EVENTS} e GROUP BY user_id),
         active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
                    FROM {EVENTS} e)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.act_week) / 7 AS BIGINT) AS week_offset,
           count(*) AS n_users
    FROM active a JOIN first_seen f USING (user_id)
    GROUP BY f.cohort_week, week_offset
    """,
    tags=("A1", "F1", "J1"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the canonical product-analytics rollup:
    users bucketed by the ISO week they first appeared, counted in every
    subsequent week they were active. Shape: one per-user min aggregate
    (the cohort assignment), one distinct over (user, week) — both key on
    user_id so they share a partitioning — then a join back and a
    (cohort, offset) count whose cardinality is weeks², tiny at any data
    scale. The offset is day-difference/7 on week-truncated timestamps,
    exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "cdc_latest_by_key",
    oracle=f"""
    SELECT user_id, event_id, ts, event_type, value FROM (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM {EVENTS} e
    ) WHERE rn = 1
    """,
    tags=("W1", "S9"),
)
def cdc_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture compaction: collapse an append-only event log to
    the latest record per key (ts desc, event_id desc as the deterministic
    tie-break) — the read-side MERGE that turns a CDC feed into a current-
    state table. One window keyed on user_id; at scale this is the
    log-compaction pass run per ingest batch, and because the window
    partitions by the key it never globally sorts — each key's history
    sorts independently."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


@query(
    "scd2_user_history",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM {EVENTS} e
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
             AS is_current
    FROM changes
    """,
    tags=("W2", "W1", "S9"),
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 history build: treat the event
    log as an attribute change feed per user, collapse runs of the same
    value (a row survives only when it differs from its predecessor —
    lag), then stitch validity intervals (valid_from = change time,
    valid_to = next change's time via lead, open interval = current).
    This is the warehouse pattern that turns CDC into an auditable
    history table. Both windows partition by the key — per-user
    parallelism, no global sort — and the change filter shrinks the
    second window's input to the number of actual transitions, which is
    what bounds state at 100 TB (a hot key with a million unchanged
    events contributes its transitions, not its volume)."""
    ev = load_table(spark, sf_dir, "events")
    return _scd2_intervals(ev).select(
        "user_id",
        F.col("state").alias("event_type"),
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def _scd2_intervals(ev: DataFrame) -> DataFrame:
    """Run-length collapse + interval stitch shared by scd2_user_history
    and join_point_in_time: one row per event_type TRANSITION per user,
    with [valid_from, valid_to) validity (valid_to NULL = current). One
    definition so the history build and the PIT consumer can never
    disagree on tie-breaks or interval semantics."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "ts", "event_id", "event_type")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )


@query(
    "clk_attribution_last_touch",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_type, value,
             max(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_ts
      FROM {EVENTS} e
      WHERE event_type IN ('click', 'purchase')
    )
    SELECT date_trunc('hour', last_click_ts) AS click_hour,
           count(*) AS n_purchases,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS attributed_value
    FROM ordered
    WHERE event_type = 'purchase'
      AND last_click_ts IS NOT NULL
      AND ts - last_click_ts <= INTERVAL 1 DAY
    GROUP BY 1
    """,
    tags=("W2", "W3", "J9", "A3"),
)
def clk_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution — every purchase credits the user's most
    recent click within a 1-day lookback, the canonical marketing-analytics
    ask over the reference's clickstream. Implemented as ONE pass, NO join:
    a running max of click timestamps over each user's time-ordered event
    sequence (rows-frame ending 1 PRECEDING, so a purchase can never credit
    itself) makes the as-of lookup a window function — at 100 TB this is a
    single user-keyed shuffle instead of the clicks×purchases range join,
    the same trick that makes sessionization scale. Attribution revenue
    rolls up by originating click hour; deterministic tie-break on
    (ts, event_id)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "ts", "event_id", "event_type", "value")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    attributed = (
        ev.withColumn("last_click_ts", last_click)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click_ts").isNotNull()
            # exact micros, not cast("long") (which truncates to seconds and
            # would disagree with the oracle's INTERVAL compare on
            # sub-second boundary straddles)
            & (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click_ts"))
                <= 86_400_000_000
            )
        )
    )
    from .registry import dsum

    return attributed.groupBy(
        F.date_trunc("hour", "last_click_ts").alias("click_hour")
    ).agg(
        F.count("*").alias("n_purchases"),
        dsum("value").alias("attributed_value"),
    )


@query(
    "clk_trending_growth",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
      FROM {EVENTS} e GROUP BY 1, 2
    )
    SELECT h, event_type, n,
           lag(n) OVER (PARTITION BY event_type ORDER BY h) AS n_prev,
           n - coalesce(lag(n) OVER (PARTITION BY event_type ORDER BY h), 0)
             AS delta
    FROM hourly
    """,
    tags=("W2", "A2", "O3"),
)
def clk_trending_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending detection (reference diagram comp. 6's "most popular"
    upgraded to momentum): hour-over-hour count deltas per event type via
    lag over the PRE-AGGREGATED hourly counts — the window runs over
    (hours x types) rows, thousands at any corpus size, never over raw
    events. Deltas stay integers (no float growth ratio), so the result
    hash-matches exactly."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("h")
    prev = F.lag("n").over(w)
    return hourly.select(
        "h",
        "event_type",
        "n",
        prev.alias("n_prev"),
        (F.col("n") - F.coalesce(prev, F.lit(0))).alias("delta"),
    )



# md5-nibble 50/50 variant assignment — ONE definition serving
# ab_test_analysis AND eval_srm_guardrail (the guardrail's premise is
# that it checks the exact assignment the experiment reads; a third
# in-file copy would let them silently diverge — /code-review r9 find)
VARIANT_SQL = """CASE WHEN strpos('0123456789abcdef',
                              substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1 < 8
                  THEN 'control' ELSE 'treatment' END"""


def variant_col():
    """Spark twin of VARIANT_SQL."""
    nibble = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
        )
        - 1
    )
    return F.when(nibble < 8, "control").otherwise("treatment")


@query(
    "ab_test_analysis",
    oracle=f"""
    WITH assigned AS (
      SELECT user_id,
             {VARIANT_SQL} AS variant
      FROM (SELECT DISTINCT user_id FROM {EVENTS} e)
    ),
    acts AS (
      SELECT a.variant, e.user_id,
             count(*) FILTER (WHERE e.event_type = 'click') AS n_clicks,
             count(*) FILTER (WHERE e.event_type = 'purchase') AS n_purchases
      FROM {EVENTS} e JOIN assigned a USING (user_id)
      GROUP BY a.variant, e.user_id
    )
    SELECT variant,
           count(*) AS n_users,
           CAST(sum(n_clicks) AS BIGINT) AS total_clicks,
           CAST(sum(n_purchases) AS BIGINT) AS total_purchases,
           count(*) FILTER (WHERE n_purchases > 0) AS n_converted
    FROM acts
    GROUP BY variant
    """,
    tags=("A3", "A4", "F8", "P2"),
)
def ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis — the A/B readout every growth team runs on the
    clickstream: deterministic hash assignment of users to variants (the
    same md5-nibble rule as the train/test splitter — assignment must be a
    pure function of the unit id so it survives reprocessing and stays
    consistent across sessions), then per-variant unit counts, activity
    totals, and converted-unit counts. All integers — rate and lift
    computation is a trivial downstream division, kept out of the result
    so the gate stays exact. Shape: one user-keyed aggregate, one tiny
    per-variant rollup; the assignment never shuffles (it rides the
    groupBy's hash partitioning)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )
    assigned = per_user.withColumn("variant", variant_col())
    return assigned.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("n_clicks").cast("long").alias("total_clicks"),
        F.sum("n_purchases").cast("long").alias("total_purchases"),
        F.count(F.when(F.col("n_purchases") > 0, 1)).alias("n_converted"),
    )


@query(
    "clk_markov_transitions",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM {EVENTS} e
    ),
    pairs AS (
      SELECT prev, event_type AS next FROM ordered WHERE prev IS NOT NULL
    ),
    cnt AS (SELECT prev, next, count(*) AS n FROM pairs GROUP BY prev, next)
    SELECT prev, next, n,
           CAST((n * 1000000) // sum(n) OVER (PARTITION BY prev) AS BIGINT) AS p_ppm
    FROM cnt
    """,
    tags=("W2", "A1"),
)
def clk_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior — the
    "what do users do after X" model behind next-action prediction,
    funnel repair, and bot fingerprinting (bots have degenerate
    transition rows). One per-user lag window extracts consecutive
    (prev→next) pairs, one map-side-combined groupBy counts them, and
    the row-normalizing window runs over the #event_types² matrix —
    constant-size regardless of corpus. Probabilities are exact-integer
    parts-per-million (count·10⁶ DIV row_total), so the matrix
    hash-matches cross-engine with no float accumulation anywhere. At
    100 TB: the only data-sized stages are the user-keyed window and the
    pair count; everything after is matrix-sized."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .select("prev", F.col("event_type").alias("next"))
    )
    cnt = pairs.groupBy("prev", "next").agg(F.count("*").alias("n"))
    return cnt.select(
        "prev",
        "next",
        "n",
        F.expr(
            "CAST((n * 1000000) div sum(n) OVER (PARTITION BY prev) AS BIGINT)"
        ).alias("p_ppm"),
    )


@query(
    "clk_anomaly_hours",
    oracle=f"""
    WITH hc AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
      FROM {EVENTS} e GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, count(*) AS k,
             CAST(sum(n) AS BIGINT) AS sx,
             CAST(sum(n * n) AS BIGINT) AS sxx
      FROM hc GROUP BY event_type
    )
    SELECT h.event_type, h.hr, h.n,
           round((h.n - CAST(m.sx AS DOUBLE) / m.k)
                 / sqrt((m.k * m.sxx - CAST(m.sx AS DOUBLE) * m.sx) / (m.k * (m.k - 1.0))), 6) AS z
    FROM hc h JOIN m USING (event_type)
    WHERE abs((h.n - CAST(m.sx AS DOUBLE) / m.k)
              / sqrt((m.k * m.sxx - CAST(m.sx AS DOUBLE) * m.sx) / (m.k * (m.k - 1.0)))) >= 2.5
    """,
    tags=("A2", "F4"),
)
def clk_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-anomaly detection — hours whose event count sits ≥2.5
    sample standard deviations from that event type's hourly mean (the
    incident/bot-burst detector layered over the same hourly rollup the
    alerting path uses). Determinism: the moments (Σn, Σn²) are exact
    int64 sums of integer counts, and the z-score formula then uses only
    IEEE-exact operations (+,-,*,/,sqrt are correctly rounded — no
    transcendentals), so both engines produce bit-identical z values;
    round(…,6) on the emitted column is belt-and-braces. Scale shape:
    one events-sized aggregate (map-side combined), then everything runs
    over hours×types rows."""
    ev = load_table(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    m = hc.groupBy("event_type").agg(
        F.count("*").alias("k"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
    )
    z = (F.col("n") - F.col("sx").cast("double") / F.col("k")) / F.sqrt(
        (F.col("k") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        / (F.col("k") * (F.col("k") - F.lit(1.0)))
    )
    return (
        hc.join(m, "event_type")
        .filter(F.abs(z) >= 2.5)
        .select("event_type", "hr", "n", F.round(z, 6).alias("z"))
    )


@query(
    "clk_top_paths",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM {EVENTS} e
    ),
    paths AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path
      FROM ordered WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    ),
    cnt AS (SELECT path, count(*) AS n FROM paths GROUP BY path)
    SELECT path, n,
           CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rnk
    FROM cnt
    QUALIFY rnk <= 20
    """,
    tags=("W2", "W1", "O2"),
)
def clk_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey path mining — the top 20 three-step behavior paths (the
    Sankey/flow diagram feed, and the sequence-level complement to
    clk_markov_transitions' pairwise matrix: a path like
    view>click>purchase carries ordering signal no transition matrix
    holds). One user-keyed window produces both lookaheads in a single
    pass (two lead() offsets share the frame), the path count is a
    map-side-combined aggregate over at most types³ distinct paths, and
    TakeOrderedAndProject caps the result before the 20-row rank window.
    Integer counts + lexicographic tiebreak: hash-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    paths = ordered.filter(
        F.col("e2").isNotNull() & F.col("e3").isNotNull()
    ).select(
        F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    )
    cnt = paths.groupBy("path").agg(F.count("*").alias("n"))
    top = cnt.orderBy(F.col("n").desc(), "path").limit(20)
    rw = W.orderBy(F.col("n").desc(), "path")
    return top.select("path", "n", F.row_number().over(rw).cast("long").alias("rnk"))


@query(
    "clk_attribution_linear",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, ts AS cts, event_id AS cid FROM {{EVENTS}} e
      WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts AS pts, value FROM {{EVENTS}} e
      WHERE event_type = 'purchase'
    ),
    credits AS (
      SELECT c.cts, p.value,
             count(*) OVER (PARTITION BY p.user_id, p.pts) AS n_touch
      FROM purchases p JOIN clicks c
        ON c.user_id = p.user_id
       AND c.cts < p.pts
       AND c.cts >= p.pts - INTERVAL 1 DAY
    )
    SELECT date_trunc('hour', cts) AS click_hour,
           count(*) AS n_credits,
           CAST(sum(CAST(round(value / n_touch, 6) AS DECIMAL(38,6))) AS DOUBLE)
             AS attributed_value
    FROM credits
    GROUP BY 1
    """.format(EVENTS=EVENTS),
    tags=("J8", "W3", "A3"),
)
def clk_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — the other canonical attribution
    model next to clk_attribution_last_touch: a purchase's value splits
    EQUALLY over every click in its 1-day lookback, so upper-funnel
    touches get credit last-touch erases. Unlike last-touch this is
    inherently a fan-out (one purchase credits many clicks), so the
    single-window trick cannot apply; the scalable shape is the
    user-keyed equi-join with a range residual — both sides shuffle once
    on user_id, the per-user click×purchase product is bounded by a
    user's own activity, and the touch count comes from one window over
    the join output (no second join). Per-credit amounts round to 6
    decimals before the decimal-sum rollup, so the split revenue is
    hash-exact cross-engine. (purchase ts is unique per user in this
    feed; a composite (pts, event_id) partition key is the general
    form.)"""
    from .registry import dsum

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), "value"
    )
    credits = purchases.join(
        clicks,
        (purchases.user_id == clicks.user_id)
        & (F.col("cts") < F.col("pts"))
        & (
            F.unix_micros(F.col("pts")) - F.unix_micros(F.col("cts"))
            <= 86_400_000_000
        ),
    ).select(purchases.user_id, "pts", "value", "cts")
    n_touch = F.count("*").over(W.partitionBy("user_id", "pts"))
    per_credit = credits.select(
        "cts", F.round(F.col("value") / n_touch, 6).alias("credit")
    )
    return per_credit.groupBy(
        F.date_trunc("hour", "cts").alias("click_hour")
    ).agg(
        F.count("*").alias("n_credits"),
        dsum("credit").alias("attributed_value"),
    )


@query(
    "clk_pattern_funnel",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             count(*) AS n_events,
             string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS journey
      FROM {EVENTS} e GROUP BY user_id
    )
    SELECT user_id, n_events,
           len(regexp_extract_all(journey, 'vc*p')) AS n_view_to_purchase,
           regexp_matches(journey, 's.*v.*c.*p') AS has_full_journey
    FROM seq
    """,
    tags=("A8", "F2", "W1"),
)
def clk_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MATCH_RECOGNIZE analog — complex-event patterns as regex over
    the per-user journey string. Each user's events compress to one char
    per event (c/e/p/s/v), time-ordered with an event_id tiebreak; then
    `vc*p` counts non-overlapping view->clicks->purchase funnels (both
    engines scan left-to-right, non-overlapping — identical counts for
    backtrack-free patterns) and `s.*v.*c.*p` flags the signup-to-purchase
    full journey. One shuffle on user_id; the journey string is bounded by
    events-per-user (for unbounded histories, window per session first —
    clk_sessionize — and pattern-match per session). The regex runs on a
    string thousands of times smaller than the events it summarizes, so
    the scan cost is the groupBy, not the match."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("ch"))
                    )
                ),
                lambda s: s["ch"],
            ),
            "",
        ).alias("journey"),
    )
    return g.select(
        "user_id",
        "n_events",
        F.size(F.regexp_extract_all("journey", F.lit("vc*p"), F.lit(0))).cast("long").alias(
            "n_view_to_purchase"
        ),
        F.col("journey").rlike("s.*v.*c.*p").alias("has_full_journey"),
    )


@query(
    "join_point_in_time",
    oracle=f"""
    WITH nonp AS (
      SELECT user_id, ts, event_id, event_type FROM {EVENTS} e
      WHERE event_type <> 'purchase'
    ),
    ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM nonp
    ),
    dim AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    ),
    facts AS (
      SELECT user_id, ts, value FROM {EVENTS} e
      WHERE event_type = 'purchase'
    )
    SELECT dim.state,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(facts.value AS DECIMAL(38,6))) AS DOUBLE)
             AS attributed_value
    FROM facts
    JOIN dim ON facts.user_id = dim.user_id
            AND facts.ts >= dim.valid_from
            AND (dim.valid_to IS NULL OR facts.ts < dim.valid_to)
    GROUP BY dim.state
    """,
    tags=("J8", "W2", "A3"),
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join — the lookup every feature store and
    SCD2 warehouse does: attach to each fact the dimension version that
    was VALID AT THE FACT'S TIMESTAMP, never a later one (lookahead
    leakage) and never an earlier one (staleness). The dimension is the
    SCD2 state history built from non-purchase events (the
    scd2_user_history construction); each purchase joins the interval
    [valid_from, valid_to) containing its timestamp and revenue is
    attributed to the state the user was in when buying.

    Scale: the join is an EQUI-join on user_id with the interval
    predicate as a residual filter — per-key hash distribution, no
    global range sort; the dimension carries one row per state
    TRANSITION (run-length collapsed), so a hot user with a million
    unchanged events still contributes only its transitions to the
    probe side. Half-open intervals make the attribution a partition of
    the timeline: every purchase matches at most one version (exactly
    one once the user has any prior state)."""
    from .registry import dsum

    ev = load_table(spark, sf_dir, "events")
    dim = _scd2_intervals(ev.filter(F.col("event_type") != "purchase"))
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = facts.join(
        dim,
        (facts.user_id == dim.user_id)
        & (facts.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (facts.ts < dim.valid_to)),
    )
    return joined.groupBy("state").agg(
        F.count("*").cast("long").alias("n_purchases"),
        dsum("value").alias("attributed_value"),
    )


@query(
    "clk_growth_accounting",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
               AS d
      FROM {EVENTS} ev),
    marked AS (
      SELECT user_id, d,
             min(d) OVER (PARTITION BY user_id) AS first_d,
             lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
      FROM ud),
    daily AS (
      SELECT d AS day_no,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
             CAST(sum(CASE WHEN d > first_d AND prev_d = d - 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             CAST(sum(CASE WHEN d > first_d AND prev_d < d - 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM marked GROUP BY d),
    walked AS (
      SELECT *,
             coalesce(lag(n_active) OVER (ORDER BY day_no), 0) - n_retained
               AS n_churned,
             lag(day_no) OVER (ORDER BY day_no) AS prev_day
      FROM daily)
    SELECT day_no, n_active, n_new, n_retained, n_resurrected,
           CASE WHEN prev_day = day_no - 1 THEN CAST(n_churned AS BIGINT)
                ELSE NULL END AS n_churned,
           CASE WHEN prev_day = day_no - 1 AND n_churned > 0
                THEN CAST((n_new + n_resurrected) * 1000000 // n_churned
                     AS BIGINT)
                ELSE NULL END AS quick_ratio_ppm
    FROM walked
    """,
    tags=("W2", "A1", "F1", "A4"),
)
def clk_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting — the DAU decomposition every growth team runs
    (the Facebook/Social-Capital 'growth accounting' identity): each
    day's active users split into NEW (first day ever), RETAINED (also
    active yesterday), and RESURRECTED (active before, but not
    yesterday); CHURNED = yesterday's actives who didn't return =
    active(d-1) - retained(d), an identity on the aggregates — no
    per-user churn row needed. The quick ratio (new + resurrected) /
    churned is the headline: > 1e6 ppm means the product grows. Both
    churn columns are NULL on days whose predecessor day is absent from
    the data (a calendar gap would silently mis-attribute churn).

    Scale: the event volume collapses to DISTINCT (user, day) in one
    aggregate; the per-user lag/min windows run partitioned by user
    over that (users x active-days) table; the day-series walk runs
    over the bounded day grid. No joins at all — two windows and two
    aggregates."""
    ud = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT)").alias(
                "d"
            ),
        )
        .distinct()
    )
    wu = W.partitionBy("user_id")
    wo = W.partitionBy("user_id").orderBy("d")
    marked = ud.select(
        "d",
        F.min("d").over(wu).alias("first_d"),
        F.lag("d").over(wo).alias("prev_d"),
    )
    daily = marked.groupBy(F.col("d").alias("day_no")).agg(
        F.count("*").cast("long").alias("n_active"),
        F.sum(F.expr("CASE WHEN d = first_d THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_new"),
        F.sum(F.expr("CASE WHEN d > first_d AND prev_d = d - 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.expr("CASE WHEN d > first_d AND prev_d < d - 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_resurrected"),
    )
    wd = W.orderBy("day_no")
    walked = daily.select(
        "*",
        (F.coalesce(F.lag("n_active").over(wd), F.lit(0)) - F.col("n_retained")).alias(
            "churn_raw"
        ),
        F.lag("day_no").over(wd).alias("prev_day"),
    )
    return walked.select(
        "day_no",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.expr(
            "CASE WHEN prev_day = day_no - 1 THEN CAST(churn_raw AS BIGINT)"
            " ELSE NULL END"
        ).alias("n_churned"),
        F.expr(
            "CASE WHEN prev_day = day_no - 1 AND churn_raw > 0"
            " THEN CAST((n_new + n_resurrected) * 1000000 div churn_raw AS BIGINT)"
            " ELSE NULL END"
        ).alias("quick_ratio_ppm"),
    )


@query(
    "clk_time_to_convert",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS fv,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS fp
      FROM {EVENTS} ev GROUP BY 1),
    seen AS (SELECT * FROM per_user WHERE fv IS NOT NULL),
    conv AS (
      SELECT user_id, CAST(fp - fv AS BIGINT) AS delay_us
      FROM seen WHERE fp IS NOT NULL AND fp > fv),
    ranked AS (
      SELECT delay_us,
             row_number() OVER (ORDER BY delay_us, user_id) AS rk
      FROM conv),
    tot AS (
      SELECT CAST((SELECT count(*) FROM seen) AS BIGINT) AS n_users,
             CAST(count(*) AS BIGINT) AS n_conv
      FROM conv)
    SELECT n_users, n_conv AS n_converted,
           CAST(CAST(n_conv AS HUGEINT) * 1000000 // n_users AS BIGINT)
             AS conv_ppm,
           max(CASE WHEN rk = (n_conv * 50 + 99) // 100 THEN delay_us END)
             AS p50_delay_us,
           max(CASE WHEN rk = (n_conv * 90 + 99) // 100 THEN delay_us END)
             AS p90_delay_us,
           max(CASE WHEN rk = (n_conv * 99 + 99) // 100 THEN delay_us END)
             AS p99_delay_us
    FROM ranked CROSS JOIN tot
    GROUP BY n_users, n_conv
    """,
    tags=("A9", "W1", "F1", "A7"),
)
def clk_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert funnel latency — the growth companion to the
    conversion rate: for every user, the delay between their FIRST view
    and their FIRST later purchase; reported as the conversion share
    plus the exact nearest-rank p50/p90/p99 of the delay distribution
    (the numbers that decide remarketing windows). 'Converted' = first
    purchase strictly after first view — the one-aggregate funnel
    simplification (conditional mins per user), deterministic and
    engine-identical.

    Scale: one scan -> per-user conditional-min aggregate (map-side
    combine); the global delay ranking uses the distributed two-pass
    prefix shape (registry.global_prefix) — no single-node sort of the
    user dimension; the percentile read-out is one conditional
    aggregate against the broadcast totals."""
    from .registry import global_prefix

    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(
                F.expr("CASE WHEN event_type = 'view' THEN unix_micros(ts) END")
            ).alias("fv"),
            F.min(
                F.expr("CASE WHEN event_type = 'purchase' THEN unix_micros(ts) END")
            ).alias("fp"),
        )
        .where(F.col("fv").isNotNull())
        .localCheckpoint(eager=False)
    )
    conv = per_user.where(
        F.col("fp").isNotNull() & (F.col("fp") > F.col("fv"))
    ).select("user_id", (F.col("fp") - F.col("fv")).cast("long").alias("delay_us"))
    ranked = global_prefix(conv, [F.col("delay_us"), F.col("user_id")])
    tot = per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(
            F.expr("CASE WHEN fp IS NOT NULL AND fp > fv THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias("n_conv"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("n_users", "n_conv")
        .agg(
            F.max(
                F.expr("CASE WHEN rk = (n_conv * 50 + 99) div 100 THEN delay_us END")
            ).alias("p50_delay_us"),
            F.max(
                F.expr("CASE WHEN rk = (n_conv * 90 + 99) div 100 THEN delay_us END")
            ).alias("p90_delay_us"),
            F.max(
                F.expr("CASE WHEN rk = (n_conv * 99 + 99) div 100 THEN delay_us END")
            ).alias("p99_delay_us"),
        )
        .select(
            "n_users",
            F.col("n_conv").alias("n_converted"),
            F.expr(
                "CAST(CAST(n_conv AS DECIMAL(38,0)) * 1000000 div n_users AS BIGINT)"
            ).alias("conv_ppm"),
            "p50_delay_us",
            "p90_delay_us",
            "p99_delay_us",
        )
    )


_JOURNEY_TOP = 20


@query(
    "clk_top_journeys",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2
      FROM {EVENTS} ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    trips AS (
      SELECT event_type AS step1, t1 AS step2, t2 AS step3,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE t2 IS NOT NULL
      GROUP BY 1, 2, 3)
    SELECT CAST(row_number() OVER (ORDER BY n DESC, step1, step2, step3)
                AS BIGINT) AS rank,
           step1, step2, step3, n
    FROM trips
    QUALIFY rank <= {_JOURNEY_TOP}
    """,
    tags=("W2", "A1", "O2", "A8"),
)
def clk_top_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys — the most frequent 3-step event paths across
    all users (the product-analytics 'Sankey' feed, one order up from
    clk_markov_transitions' pair probabilities: length-3 paths expose
    the loops and funnels pairs can't — 'view->click->view' vs
    'view->click->purchase' tell different stories at the same pair
    counts). Consecutive-event triples via two leads over each user's
    (ts, event_id) order; exact counts; deterministic total-ordered
    top-{_JOURNEY_TOP}.

    Scale: one scan, one shuffle on user_id for the per-user windows
    (the sessionize shape), then the triple census is a map-side-
    combined count over a type^3-bounded key domain; TakeOrdered."""
    from pyspark.sql import Window as PW

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
    )
    trips = (
        seq.where(F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count("*").cast("long").alias("n"))
    )
    top = trips.orderBy(F.desc("n"), "step1", "step2", "step3").limit(_JOURNEY_TOP)
    return top.select(
        F.row_number()
        .over(PW.orderBy(F.desc("n"), "step1", "step2", "step3"))
        .cast("long")
        .alias("rank"),
        "step1",
        "step2",
        "step3",
        "n",
    )


_WAU_WINDOW_DAYS = 7


@query(
    "clk_rolling_wau",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d
      FROM {EVENTS} ev),
    spanned AS (
      SELECT user_id, d,
             CASE WHEN d - lag(d) OVER (PARTITION BY user_id ORDER BY d)
                       <= {_WAU_WINDOW_DAYS - 1} THEN 0 ELSE 1 END AS brk
      FROM ud),
    seg AS (
      SELECT user_id, d,
             sum(brk) OVER (PARTITION BY user_id ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS seg_id
      FROM spanned),
    ivals AS (
      SELECT min(d) AS s, max(d) + {_WAU_WINDOW_DAYS - 1} AS e
      FROM seg GROUP BY user_id, seg_id),
    diffs AS (
      SELECT s AS d, CAST(1 AS BIGINT) AS delta FROM ivals
      UNION ALL
      SELECT e + 1, -1 FROM ivals),
    ddays AS (SELECT d, sum(delta) AS delta FROM diffs GROUP BY d),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
    spine AS (
      SELECT unnest(generate_series(lo, hi)) AS d FROM bounds),
    walked AS (
      SELECT sp.d,
             sum(coalesce(dd.delta, 0)) OVER (ORDER BY sp.d
               ROWS UNBOUNDED PRECEDING) AS wau
      FROM spine sp LEFT JOIN ddays dd ON dd.d = sp.d)
    SELECT d AS day_no, CAST(wau AS BIGINT) AS wau
    FROM walked
    """,
    tags=("A4", "W2", "A7"),
)
def clk_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 7-day distinct active users per day (WAU-by-day) —
    the growth dashboard's denominator series — computed WITHOUT any
    per-day distinct-union pass. The trick is the interval difference
    array: per user, consecutive active days with gaps <= 6 merge into
    coverage segments [first, last+6] (a user counts toward day d iff
    some activity falls in [d-6, d], i.e. iff d lies in a coverage
    segment); each segment becomes two diff rows (+1 at start, -1 past
    end), and one running sum over the bounded day spine reads off
    WAU(d) for every day. The naive form — for each day, count distinct
    users over a 7-day self-join — shuffles the (user, day) table 7x
    and re-deduplicates per day; the diff array shuffles it once.

    Scale: event volume collapses to DISTINCT (user, day) in one
    aggregate; the segment windows run per user over their bounded
    active-day rows (a daily-active bot is ONE segment row); the diff
    array is 2 rows per segment; only the final running sum touches the
    day spine — a calendar-bounded grid (30 rows here, ~365/yr at
    100 TB), the same bounded-grid window every timeseries op uses."""
    ud = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT)").alias(
                "d"
            ),
        )
        .distinct()
    )
    wl = W.partitionBy("user_id").orderBy("d")
    spanned = ud.select(
        "user_id",
        "d",
        F.when(
            F.col("d") - F.lag("d").over(wl) <= _WAU_WINDOW_DAYS - 1, 0
        ).otherwise(1).alias("brk"),
    )
    seg = spanned.select(
        "user_id",
        "d",
        F.sum("brk").over(wl.rowsBetween(W.unboundedPreceding, W.currentRow)).alias(
            "seg_id"
        ),
    )
    ivals = seg.groupBy("user_id", "seg_id").agg(
        F.min("d").alias("s"),
        (F.max("d") + F.lit(_WAU_WINDOW_DAYS - 1)).alias("e"),
    )
    diffs = ivals.select(F.col("s").alias("d"), F.lit(1).cast("long").alias("delta")).unionByName(
        ivals.select((F.col("e") + 1).alias("d"), F.lit(-1).cast("long").alias("delta"))
    )
    ddays = diffs.groupBy("d").agg(F.sum("delta").alias("delta"))
    bounds = ud.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    walked = (
        spine.join(ddays, "d", "left")
        .select("d", F.coalesce("delta", F.lit(0)).alias("delta"))
        .select(
            "d",
            F.sum("delta")
            .over(W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("wau"),
        )
    )
    return walked.select(F.col("d").alias("day_no"), F.col("wau").cast("long").alias("wau"))


# chi^2_{1, p=0.001} = 10.827566170..., quantized once to ppm — the
# twin-oracle-constant discipline
SRM_CHI2_PPM = 10_827_566


@query(
    "eval_srm_guardrail",
    oracle=f"""
    WITH assigned AS (
      SELECT DISTINCT user_id,
             {VARIANT_SQL} AS variant
      FROM {EVENTS} ev),
    s AS (
      SELECT CAST(coalesce(sum(CASE WHEN variant = 'control' THEN 1 END), 0)
                  AS BIGINT) AS n1,
             CAST(coalesce(sum(CASE WHEN variant = 'treatment' THEN 1 END), 0)
                  AS BIGINT) AS n2
      FROM assigned)
    SELECT n1 AS n_control, n2 AS n_treatment,
           n1 - n2 AS delta_units,
           CAST(CAST(n1 - n2 AS HUGEINT) * (n1 - n2) * 1000 // (n1 + n2)
                AS BIGINT) AS chi2_milli,
           CASE WHEN CAST(n1 - n2 AS HUGEINT) * (n1 - n2) * 1000000
                     >= CAST({SRM_CHI2_PPM} AS HUGEINT) * (n1 + n2)
                THEN 'SRM' ELSE 'ok' END AS verdict
    FROM s
    """,
    tags=("A3", "F4", "F5"),
)
def eval_srm_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the first check every
    experimentation platform runs before reading an A/B test: under the
    50/50 md5-nibble assignment (the SAME rule as ab_test_analysis, so
    this guards that experiment's actual traffic), the unit-count
    imbalance chi-square (n1-n2)^2/(n1+n2) must stay under
    chi^2_{1, p=0.001} = 10.8276 — anything past it means the
    assignment, logging, or filtering is broken and every downstream
    readout is invalid (Fabijan et al. 2019). Exact integer algebra:
    the verdict cross-multiplies against the ppm-quantized critical
    value; chi2_milli is the floor-scaled statistic.

    Scale: one DISTINCT user pass (the assignment is a pure hash — no
    join against an assignment table), one 2-sum aggregate, one row."""
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.select("user_id").distinct().select(
        variant_col().alias("variant")
    )
    s = assigned.agg(
        F.expr(
            "CAST(coalesce(sum(CASE WHEN variant = 'control' THEN 1 END), 0)"
            " AS BIGINT)"
        ).alias("n1"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN variant = 'treatment' THEN 1 END), 0)"
            " AS BIGINT)"
        ).alias("n2"),
    )
    return s.select(
        F.col("n1").alias("n_control"),
        F.col("n2").alias("n_treatment"),
        F.expr("n1 - n2").alias("delta_units"),
        # (n1-n2)^2 * 1e6 passes 2^63 past ~3e6 units' imbalance — the
        # exact regime the guardrail exists for; decimal-lifted so a
        # catastrophic SRM can never wrap back under the critical value
        # (/code-review r9 find)
        F.expr(
            "CAST(CAST(n1 - n2 AS DECIMAL(38,0)) * (n1 - n2) * 1000"
            " div (n1 + n2) AS BIGINT)"
        ).alias("chi2_milli"),
        F.expr(
            f"CASE WHEN CAST(n1 - n2 AS DECIMAL(38,0)) * (n1 - n2) * 1000000"
            f" >= CAST({SRM_CHI2_PPM} AS DECIMAL(38,0)) * (n1 + n2)"
            f" THEN 'SRM' ELSE 'ok' END"
        ).alias("verdict"),
    )


_FUNNEL_WINDOWS_H = (24, 72, 168)


@query(
    "clk_funnel_windowed",
    oracle=f"""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM {EVENTS} e
                WHERE event_type = 'view' GROUP BY user_id),
    windows AS (SELECT unnest({list(_FUNNEL_WINDOWS_H)}) AS w_hours),
    s2 AS (
      SELECT w.w_hours, e.user_id, min(e.ts) AS t2
      FROM {EVENTS} e
      JOIN s1 ON e.user_id = s1.user_id
      CROSS JOIN windows w
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND epoch_us(e.ts) - epoch_us(s1.t1) <= w.w_hours * 3600000000
      GROUP BY 1, 2),
    s3 AS (
      SELECT s2.w_hours, e.user_id
      FROM {EVENTS} e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND epoch_us(e.ts) - epoch_us(s2.t2) <= s2.w_hours * 3600000000
      GROUP BY 1, 2)
    SELECT w.w_hours AS window_hours,
           (SELECT count(*) FROM s1) AS n_viewed,
           CAST(coalesce((SELECT count(*) FROM s2 WHERE s2.w_hours = w.w_hours), 0)
                AS BIGINT) AS n_clicked_within,
           CAST(coalesce((SELECT count(*) FROM s3 WHERE s3.w_hours = w.w_hours), 0)
                AS BIGINT) AS n_purchased_within
    FROM windows w
    """,
    tags=("J8", "A3", "F1"),
)
def clk_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel — the bounded-attribution variant of
    funnel_conversion every product team ALSO runs (unbounded funnels
    overstate conversion: a purchase six months after the first view is
    not that view's credit). For each window W in {{24h, 72h, 168h}}:
    users whose first view was followed by a click within W, then a
    purchase within W of that click — a RANGE-join chain (theta join on
    the time delta), swept over all three windows in ONE pass via a
    broadcast windows table (the thresholds-explode pattern, not a
    re-run per window).

    Scale: the chain stays user-co-partitioned like funnel_conversion
    (every shuffle keys on user_id; the 3-row windows table broadcasts);
    per-(user, window) state is two timestamps. The range predicate
    rides the equi-join as a post-filter, so no interval index is
    needed — the join is never a cartesian."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    windows = F.broadcast(
        ev.sparkSession.createDataFrame(
            [(w,) for w in _FUNNEL_WINDOWS_H], "w_hours long"
        )
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .crossJoin(windows)
        .filter(
            (F.col("ts") > F.col("t1"))
            & (
                F.expr("unix_micros(ts) - unix_micros(t1)")
                <= F.col("w_hours") * 3_600_000_000
            )
        )
        .groupBy("w_hours", "user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (
                F.expr("unix_micros(ts) - unix_micros(t2)")
                <= F.col("w_hours") * 3_600_000_000
            )
        )
        .select("w_hours", "user_id")
        .distinct()
    )
    n1 = s1.agg(F.count("*").alias("n_viewed"))
    c2 = s2.groupBy("w_hours").agg(F.count("*").alias("n_clicked_within"))
    c3 = s3.groupBy("w_hours").agg(F.count("*").alias("n_purchased_within"))
    return (
        windows.join(c2, "w_hours", "left")
        .join(c3, "w_hours", "left")
        .crossJoin(F.broadcast(n1))
        .select(
            F.col("w_hours").alias("window_hours"),
            F.col("n_viewed").cast("long"),
            F.coalesce("n_clicked_within", F.lit(0)).cast("long").alias(
                "n_clicked_within"
            ),
            F.coalesce("n_purchased_within", F.lit(0)).cast("long").alias(
                "n_purchased_within"
            ),
        )
    )


# Shapley weights x 4! for |S| = 0..3 (|S|! * (4-1-|S|)! — exact
# integers, so the attribution stays rational with denominator 24)
_SHAPLEY_W = (6, 2, 2, 6)
_SHAPLEY_CHANNELS = (("view", 1), ("click", 2), ("signup", 4), ("error", 8))


@query(
    "clk_attribution_shapley",
    oracle=f"""
    WITH fp AS (
      SELECT user_id, min(ts) AS pt FROM {EVENTS} e
      WHERE event_type = 'purchase' GROUP BY 1),
    touched AS (
      SELECT DISTINCT e.user_id,
             CASE e.event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                  WHEN 'signup' THEN 4 WHEN 'error' THEN 8 END AS bit
      FROM {EVENTS} e LEFT JOIN fp ON e.user_id = fp.user_id
      WHERE e.event_type <> 'purchase'
        AND (fp.pt IS NULL OR e.ts < fp.pt)),
    masks AS (
      SELECT t.user_id,
             CAST(sum(t.bit) AS BIGINT) AS mask,
             CASE WHEN max(fp.pt) IS NOT NULL THEN 1 ELSE 0 END AS conv
      FROM touched t LEFT JOIN fp ON t.user_id = fp.user_id
      GROUP BY t.user_id),
    stats AS (
      SELECT mask, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(conv) AS BIGINT) AS k
      FROM masks GROUP BY mask),
    coal AS (
      SELECT unnest(range(0, 16)) AS s),
    v AS (
      SELECT c.s,
             coalesce(CAST(st.k * 1000000 // st.n AS BIGINT), 0) AS v
      FROM coal c LEFT JOIN stats st ON st.mask = c.s),
    ch AS (SELECT * FROM (VALUES ('view', 1), ('click', 2),
                                 ('signup', 4), ('error', 8)) AS t(name, bit)),
    terms AS (
      SELECT ch.name,
             CASE bit_count(CAST(v0.s AS BIGINT) & 15)
                  WHEN 0 THEN {_SHAPLEY_W[0]} WHEN 1 THEN {_SHAPLEY_W[1]}
                  WHEN 2 THEN {_SHAPLEY_W[2]} ELSE {_SHAPLEY_W[3]} END
               * (v1.v - v0.v) AS term
      FROM ch
      JOIN v v0 ON (v0.s & ch.bit) = 0
      JOIN v v1 ON v1.s = (v0.s | ch.bit))
    SELECT name AS channel,
           CAST(sum(term) AS BIGINT) AS shapley_x24_ppm
    FROM terms GROUP BY 1
    """,
    tags=("A3", "F7", "J1", "F5"),
)
def clk_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value marketing attribution (Shapley 1953 applied per
    Zhao et al. 2018 'Shapley Value Methods for Attribution Modeling')
    — the game-theoretically fair split of conversion credit across the
    four non-purchase channels: the coalition value v(S) is the
    observed conversion rate of users whose pre-purchase touched-set is
    exactly S, and each channel's credit is the factorial-weighted sum
    of its marginal contributions v(S ∪ i) - v(S) over all 2^3 subsets
    not containing it. Exact rational arithmetic: weights are
    multiplied by 4! = 24 (so the output is shapley_x24_ppm, integer,
    possibly negative for channels that correlate with non-conversion)
    and v quantizes to ppm by floor — both engines agree bit-for-bit.

    Scale: the event volume collapses to DISTINCT (user, channel-bit)
    rows gated by the user's first-purchase time (one user-keyed
    aggregate + one keyed left join); everything after `stats` is
    algebra over at most 16 coalition rows x 4 channels — driver-safe
    constants, broadcast joins."""
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    bit = F.expr(
        "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2"
        " WHEN 'signup' THEN 4 WHEN 'error' THEN 8 END"
    )
    touched = (
        ev.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id", "left")
        .filter(F.col("pt").isNull() | (F.col("ts") < F.col("pt")))
        .select("user_id", bit.alias("bit"), "pt")
        .distinct()
    )
    masks = touched.groupBy("user_id").agg(
        F.expr("CAST(sum(DISTINCT bit) AS BIGINT)").alias("mask"),
        F.expr("CASE WHEN max(pt) IS NOT NULL THEN 1 ELSE 0 END").alias("conv"),
    )
    stats = masks.groupBy("mask").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conv").cast("long").alias("k"),
    )
    coal = ev.sparkSession.range(0, 16).select(F.col("id").alias("s"))
    v = (
        coal.join(stats, coal.s == stats.mask, "left")
        .select(
            "s",
            F.coalesce(
                F.expr("CAST(k * 1000000 div n AS BIGINT)"), F.lit(0)
            ).alias("v"),
        )
    )
    ch = ev.sparkSession.createDataFrame(
        list(_SHAPLEY_CHANNELS), "name string, bit long"
    )
    v0 = v.select(F.col("s").alias("s0"), F.col("v").alias("va"))
    v1 = v.select(F.col("s").alias("s1"), F.col("v").alias("vb"))
    terms = (
        ch.crossJoin(F.broadcast(v0))
        .filter(F.expr("(s0 & bit) = 0"))
        .join(F.broadcast(v1), F.expr("s1 = (s0 | bit)"))
        .select(
            "name",
            F.expr(
                f"CASE bit_count(s0 & 15) WHEN 0 THEN {_SHAPLEY_W[0]}"
                f" WHEN 1 THEN {_SHAPLEY_W[1]} WHEN 2 THEN {_SHAPLEY_W[2]}"
                f" ELSE {_SHAPLEY_W[3]} END * (vb - va)"
            ).alias("term"),
        )
    )
    return terms.groupBy(F.col("name").alias("channel")).agg(
        F.sum("term").cast("long").alias("shapley_x24_ppm")
    )


@query(
    "clk_cohort_ltv",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id,
             CAST(epoch_us(min(ts)) AS BIGINT) // 604800000000 AS cohort_w
      FROM {EVENTS} e GROUP BY 1),
    csize AS (
      SELECT cohort_w, CAST(count(*) AS BIGINT) AS n_users
      FROM firsts GROUP BY 1),
    buys AS (
      SELECT f.cohort_w,
             CAST(epoch_us(e.ts) AS BIGINT) // 604800000000 - f.cohort_w
               AS age_w,
             e.user_id,
             CAST(floor(e.value * 1000) AS BIGINT) AS v_milli
      FROM {EVENTS} e JOIN firsts f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'),
    cells AS (
      SELECT cohort_w, age_w,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers,
             CAST(sum(v_milli) AS BIGINT) AS revenue_milli
      FROM buys GROUP BY 1, 2),
    cum AS (
      SELECT c.cohort_w, c.age_w, c.n_buyers, c.revenue_milli, s.n_users,
             sum(c.revenue_milli) OVER (PARTITION BY c.cohort_w
               ORDER BY c.age_w ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM cells c JOIN csize s USING (cohort_w))
    SELECT cohort_w, age_w, n_users AS cohort_size, n_buyers,
           revenue_milli,
           CAST(cum_rev AS BIGINT) AS cum_revenue_milli,
           CAST(cum_rev // n_users AS BIGINT) AS ltv_per_user_milli
    FROM cum
    """,
    tags=("A3", "W3", "J1", "F1"),
)
def clk_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the growth-finance readout behind
    every payback-period decision: users cohorted by first-activity
    week, purchase revenue accumulated by cohort age (weeks since
    joining), reported per (cohort, age) as the running cumulative and
    the per-user LTV (cum div cohort size — exact integer milli, the
    money discipline). Reading down a column compares cohort quality at
    equal age; the row-wise curve is what gets extrapolated against
    CAC.

    Scale: one user-keyed min aggregate (the cohort assignment), one
    keyed join of purchases against it, one (cohort, age) cell
    aggregate with distinct-buyer count — then the cumulative window
    runs over the BOUNDED (cohorts x ages) grid, not events. Revenue
    sums are int64-safe at fixture scale and the oracle's HUGEINT-free
    form is deliberate: milli-money at 100 TB needs the dsum2 lift
    documented in the r6 envelope note, which the cum window would
    inherit by a one-line cast."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.expr(
            "CAST(unix_micros(min(ts)) AS BIGINT) div 604800000000"
        ).alias("cohort_w")
    )
    csize = firsts.groupBy("cohort_w").agg(
        F.count("*").cast("long").alias("n_users")
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort_w",
            F.expr(
                "CAST(unix_micros(ts) AS BIGINT) div 604800000000 - cohort_w"
            ).alias("age_w"),
            "user_id",
            F.expr("CAST(floor(value * 1000) AS BIGINT)").alias("v_milli"),
        )
    )
    cells = buys.groupBy("cohort_w", "age_w").agg(
        F.countDistinct("user_id").cast("long").alias("n_buyers"),
        F.sum("v_milli").cast("long").alias("revenue_milli"),
    )
    wc = W.partitionBy("cohort_w").orderBy("age_w").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = cells.join(csize, "cohort_w").select(
        "cohort_w",
        "age_w",
        F.col("n_users").alias("cohort_size"),
        "n_buyers",
        "revenue_milli",
        F.sum("revenue_milli").over(wc).alias("cum_rev"),
    )
    return cum.select(
        "cohort_w",
        "age_w",
        "cohort_size",
        "n_buyers",
        "revenue_milli",
        F.col("cum_rev").cast("long").alias("cum_revenue_milli"),
        F.expr("CAST(cum_rev div cohort_size AS BIGINT)").alias(
            "ltv_per_user_milli"
        ),
    )
