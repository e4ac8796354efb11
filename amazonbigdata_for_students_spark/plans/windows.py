"""Window functions — SURVEY.md §2.5 (W1-W4) + as-of join (J9).

Window partitioning notes for scale: every row-sized window here
partitions by a high-cardinality key (user, nation, brand) so state per
partition stays bounded. The one unpartitioned window
(win_cumulative_distinct's running sum) operates on the per-DAY series —
calendar-bounded rows, never data-bounded — after the row-sized work has
been aggregated away; a global window over row-sized input would
serialize on one task at 100 TB and is still avoided everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.readers import load_table
from .registry import query
from .relational import EVENTS


@query(
    "win_topn_per_group",
    oracle="""
    SELECT nationkey, c_custkey, c_acctbal, rn FROM (
      SELECT c_nationkey AS nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    tags=("W1", "O3"),
    bench=True,
)
def win_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/O3 — top-N per group via row_number (most-popular-items shape,
    reference diagram comp. 6). Deterministic tiebreak on the key."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("c_nationkey").alias("nationkey"), "c_custkey", "c_acctbal", "rn")
    )


@query(
    "win_lag_gap",
    oracle=f"""
    SELECT event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id) AS gap_us
    FROM {EVENTS} e
    """,
    tags=("W2",),
)
def win_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — inter-event gap per key: the direct bot signature (bots emit
    every ~16 ms vs hours-spread humans; reference: log-generator/
    generator.py:147-150). Exact integer microseconds — no float drift."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select("event_id", (us - F.lag(us).over(w)).alias("gap_us"))


@query(
    "win_running_sum",
    oracle=f"""
    SELECT event_id,
           CAST(sum(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
    FROM {EVENTS} e
    """,
    tags=("W3",),
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — running total per key (rows frame), decimal-routed so the
    prefix sums are exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(38,6)")).over(frame).cast("double").alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


@query(
    "win_range_frame",
    oracle=f"""
    SELECT event_id,
           count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_trailing_1h
    FROM {EVENTS} e
    """,
    tags=("W3",),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — trailing-hour rolling count per key (range frame over event-time
    micros): the views-in-trailing-hour query."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select("event_id", F.count("*").over(w).alias("n_trailing_1h"))


@query(
    "win_ntile_ranks",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile,
           dense_rank() OVER (ORDER BY c_mktsegment) AS segment_rank,
           round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS bal_pct_rank
    FROM customer
    """,
    tags=("W4", "W1"),
)
def win_ntile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — ntile / dense_rank / percent_rank (activity-quantile queries).
    Global windows here are fine only because customer is dimension-sized;
    fact-side quantiles go through approx_percentile instead (A9)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.ntile(4).over(W.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))).alias("quartile"),
        F.dense_rank().over(W.orderBy("c_mktsegment")).alias("segment_rank"),
        F.round(
            F.percent_rank().over(W.orderBy("c_acctbal", "c_custkey")), 6
        ).alias("bal_pct_rank"),
    )


@query(
    "join_asof",
    oracle=f"""
    WITH purchases AS (SELECT * FROM {EVENTS} e WHERE event_type = 'purchase'),
         signups   AS (SELECT * FROM {EVENTS} e WHERE event_type = 'signup')
    SELECT p.event_id, s.ts AS signup_ts
    FROM purchases p
    ASOF LEFT JOIN signups s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    tags=("J9",),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — as-of join: for each purchase, the latest signup at-or-before it
    per user (the latest-suspicious-IP-record-as-of-event-ts shape,
    SURVEY.md §2.3). Spark lacks a native ASOF; the scalable composition is
    union + last_value(ignorenulls) over a per-key event-time window — one
    shuffle on user_id, no range explosion, vs DuckDB's native ASOF JOIN
    oracle."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("signup_ts"), F.lit(1).alias("is_p")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("signup_ts"),
        F.lit(0).alias("is_p"),
    )
    # Order signups before purchases at identical ts so "at-or-before" holds.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = purchases.unionByName(signups).withColumn(
        "asof_signup", F.last("signup_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_p") == 1).select(
        "event_id", F.col("asof_signup").alias("signup_ts")
    )


@query(
    "win_first_last",
    oracle="""
    SELECT c_custkey,
           first_value(c_custkey) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS poorest_so_far,
           last_value(c_custkey) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_in_nation,
           round(cume_dist() OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey), 6) AS bal_cume
    FROM customer
    """,
    tags=("W1", "W3", "W4"),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/W4 — first_value / last_value / cume_dist per nation partition.
    last_value needs the explicit full frame (the default frame stops at
    CURRENT ROW — a classic silent-wrong-answer; both engines get the
    identical explicit frame). c_custkey breaks acctbal ties so cume_dist
    has no peer groups and the result is deterministic. Partitioned by
    nationkey, so at scale each window is one nation's customers — no
    global single-partition window."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        F.first("c_custkey").over(w).alias("poorest_so_far"),
        F.last("c_custkey").over(wfull).alias("richest_in_nation"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume"),
    )


@query(
    "join_asof_nearest",
    oracle=f"""
    WITH merged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'signup' THEN ts END AS sig_ts,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM {EVENTS} e WHERE event_type IN ('purchase', 'signup')
    ),
    w AS (
      SELECT event_id, user_id, ts, is_p,
             last_value(sig_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_ts,
             first_value(sig_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_p
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_ts
      FROM merged
    )
    SELECT event_id,
           CASE WHEN back_ts IS NULL THEN fwd_ts
                WHEN fwd_ts IS NULL THEN back_ts
                WHEN epoch_us(ts) - epoch_us(back_ts)
                     <= epoch_us(fwd_ts) - epoch_us(ts) THEN back_ts
                ELSE fwd_ts END AS nearest_signup_ts
    FROM w WHERE is_p = 1
    """,
    tags=("J9", "W2"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST mode (pandas merge_asof direction='nearest'):
    each purchase pairs with its temporally closest signup per user —
    before OR after — the sensor-alignment/attribution variant the
    backward-only join_asof can't express. Same scalable composition:
    union both streams, ONE user-keyed shuffle, then two frame-split
    window passes over the same sort order (last non-null behind,
    first non-null ahead) and an exact integer microsecond comparison
    picks the closer side (ties prefer backward; same-timestamp signups
    sort before purchases so at-or-before still wins). No range join, no
    per-row candidate explosion — state per key is one timestamp each
    direction, the 100 TB shape."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    merged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("sig_ts"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    order = [F.col("ts"), F.col("is_p")]
    back_w = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd_w = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    w = merged.select(
        "event_id",
        "ts",
        "is_p",
        F.last("sig_ts", ignorenulls=True).over(back_w).alias("back_ts"),
        F.first("sig_ts", ignorenulls=True).over(fwd_w).alias("fwd_ts"),
    )
    nearest = (
        F.when(F.col("back_ts").isNull(), F.col("fwd_ts"))
        .when(F.col("fwd_ts").isNull(), F.col("back_ts"))
        .when(
            F.unix_micros("ts") - F.unix_micros("back_ts")
            <= F.unix_micros("fwd_ts") - F.unix_micros("ts"),
            F.col("back_ts"),
        )
        .otherwise(F.col("fwd_ts"))
    )
    return w.filter(F.col("is_p") == 1).select(
        "event_id", nearest.alias("nearest_signup_ts")
    )


@query(
    "win_rolling_revenue_7d",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders GROUP BY 1
    ),
    keyed AS (
      SELECT d, rev, CAST(d - DATE '1970-01-01' AS BIGINT) AS day_num FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(sum(rev) OVER (ORDER BY day_num
                               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS revenue_7d
    FROM keyed
    """,
    tags=("W3", "A3", "F1"),
)
def win_rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue — the dashboard KPI every commerce team
    renders: pre-aggregate the fact stream to daily grain FIRST (one
    map-side-combined shuffle; the window then runs over days, not
    orders — the altitude trick that makes rolling KPIs scale: a
    calendar of daily rows is bounded at any data volume, like the
    value-domain histogram in distributed_ntile), then a RANGE frame
    keyed on the integer epoch-day so date GAPS are handled correctly —
    a missing day still counts as elapsed time, which the naive ROWS
    BETWEEN 6 PRECEDING formulation silently gets wrong. Revenue sums
    stay decimal end to end; only the emitted columns cast to double."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev"))
        .withColumn("day_num", F.datediff("d", F.lit("1970-01-01").cast("date")).cast("long"))
    )
    w = W.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("revenue_7d"),
    )


@query(
    "win_cumulative_distinct",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d
      FROM {EVENTS}
      GROUP BY user_id
    ),
    daily AS (
      SELECT d, CAST(count(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY d
    )
    SELECT CAST(d AS VARCHAR) AS day, new_users,
           CAST(sum(new_users) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM daily
    """,
    tags=("W3", "A4", "A1"),
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the count-distinct-over-a-
    running-window problem, which a naive window(COUNT(DISTINCT ...))
    can't express (Spark rejects DISTINCT in windows) and a self-join
    does in O(days x rows). The classic reformulation: distinct-to-date
    on day d == number of users whose FIRST event day <= d, so one
    groupBy(user) min(day), one groupBy(day) count, and a running sum
    over days — each shuffle keyed high-cardinality.

    Scale: the only unpartitioned window runs over the per-DAY series
    (bounded by the calendar, not the data); everything row-sized
    shuffles on user_id. This is how growth-accounting 'cumulative
    uniques' charts are computed at warehouse scale."""
    e = load_table(spark, sf_dir, "events")
    first_seen = (
        e.select("user_id", F.col("ts").cast("date").alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("d"))
    )
    daily = first_seen.groupBy("d").agg(
        F.count("*").cast("long").alias("new_users")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )
