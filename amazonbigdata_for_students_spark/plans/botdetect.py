"""Batch bot-detection pipeline — the reference's flagship flow
(SURVEY.md §3.1; reference diagram comps. 4-5).

ingest (raw strings → typed silver) → per-IP inter-event-gap analysis →
threshold → suspicious-IP state table with TTL → anti-join filter.

Scale notes: detection is one shuffle on user_ip serving both the lag
window and the aggregate. Bot IPs are hot keys *by construction* (~60
events/s in bursts, reference: log-generator/generator.py:147-150), so a
single bot's partition is large but bounded by one key's hourly volume;
if a key ever exceeded a partition's memory, the fallback is windowing
the detection per (ip, hour-bucket) first. The detected set is key-sized
⇒ broadcast anti-join on the filter side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources import state

# The bot signature is the inter-event gap: bots step ~16 ms with P=0.85
# (generator.py:147-150) so their *median* gap is ~16 ms, while the
# fastest human (1000 evenly-spaced events/hour, generator.py:125-126)
# never gaps below 3.6 s. A 1 s median-gap threshold has two orders of
# magnitude of headroom on both sides and is invariant to how many events
# a user emits — unlike a raw rate threshold.
MEDIAN_GAP_THRESHOLD_MS = 1000


def normalize_views(raw: DataFrame) -> DataFrame:
    """Raw (all-string) view events → typed silver (SURVEY.md §1.4):
    ISO-8601 ts → timestamp, "NULL" sentinel → NULL, item_id → long,
    device_type split into (family, os)."""
    return raw.select(
        F.col("item_id").cast("long").alias("item_id"),
        F.to_timestamp("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.col("device_type"),
        F.split("device_type", ":").getItem(0).alias("device_family"),
        # "other" has no os part — F.get returns NULL past the end instead
        # of raising under ANSI mode.
        F.get(F.split("device_type", ":"), 1).alias("device_os"),
        F.nullif(F.col("device_id"), F.lit("NULL")).alias("device_id"),
        F.col("user_ip"),
    )


def detect_suspicious_ips(
    views: DataFrame, threshold_ms: int = MEDIAN_GAP_THRESHOLD_MS
) -> DataFrame:
    """W2-based bot detection (reference diagram comp. 4): per-IP median
    inter-event gap via lag over an event-time window; IPs whose median gap
    is under the threshold are bots. One shuffle on user_ip serves both the
    lag window and the aggregate. Returns (user_ip, median_gap_ms,
    n_events, last_seen)."""
    w = W.partitionBy("user_ip").orderBy("ts")
    us = F.unix_micros(F.col("ts"))
    gaps = views.withColumn("gap_ms", (us - F.lag(us).over(w)) / 1000.0)
    return (
        gaps.groupBy("user_ip")
        .agg(
            F.expr("percentile_approx(gap_ms, 0.5)").alias("median_gap_ms"),
            F.count("*").alias("n_events"),
            F.max("ts").alias("last_seen"),
        )
        .filter(F.col("median_gap_ms") < threshold_ms)
    )


def write_suspicious_state(
    suspicious: DataFrame, path: str, ttl: str = "INTERVAL 1 HOUR"
) -> None:
    """Persist detections to the TTL state table (S7), event-time stamped
    so replays are deterministic."""
    state.write_state(
        suspicious,
        path,
        key_col="user_ip",
        ttl=ttl,
        reason=f"median_gap<{MEDIAN_GAP_THRESHOLD_MS}ms",
        detected_at=F.col("last_seen"),
    )


def filter_views(views: DataFrame, suspicious: DataFrame) -> DataFrame:
    """The IP-filter stage (P3/J2, reference diagram comp. 3): drop events
    from suspicious IPs via broadcast anti-join."""
    return views.join(
        F.broadcast(suspicious.select("user_ip")), "user_ip", "left_anti"
    )


def run(
    spark: SparkSession, raw_views: DataFrame, state_path: str
) -> tuple[DataFrame, DataFrame]:
    """End-to-end: normalize → detect → persist state → filtered stream.
    Returns (suspicious, clean_views)."""
    silver = normalize_views(raw_views)
    suspicious = detect_suspicious_ips(silver)
    write_suspicious_state(suspicious, state_path)
    live = state.read_state(spark, state_path, now=F.lit("1970-01-01").cast("timestamp"))
    # now=epoch keeps every freshly-written row live; production callers use
    # the default current_timestamp().
    return suspicious, filter_views(silver, live)
