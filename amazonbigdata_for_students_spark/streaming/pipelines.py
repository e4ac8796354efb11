"""Streaming pipelines (SURVEY.md §2.9 T1-T8, §3.2 entry point B).

One query per reference stream component, composed source-agnostically:

  clean_stream         T4+T6+J4/P3  watermark → in-watermark dedup →
                                    stream-static anti-join (IP filter)
  windowed_popularity  T1+W1        tumbling-window counts (top-N applied
                                    in foreachBatch/batch reader — rank
                                    over a streaming agg isn't incremental)
  sliding_traffic      T2           sliding-window traffic counts
  session_activity     T3           per-user session windows
  high_traffic_alerts  T5+S8        threshold alerts via foreachBatch,
                                    alert-once per window via state table

State-at-scale notes: every aggregate is keyed by (window, low-card key)
or (user), so state store entries stay bounded; watermarks cap state
lifetime; dedup keys fall out of state once the watermark passes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F


def normalize_stream(raw: DataFrame) -> DataFrame:
    """Typed silver view of a raw (all-string) event stream — same
    normalization as the batch path (plans.botdetect.normalize_views),
    restated here because streaming frames can't share a cached plan."""
    return raw.select(
        F.col("item_id").cast("long").alias("item_id"),
        F.to_timestamp("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.col("device_type"),
        F.nullif(F.col("device_id"), F.lit("NULL")).alias("device_id"),
        F.col("user_ip"),
    )


def clean_stream(
    stream: DataFrame,
    suspicious: DataFrame,
    watermark: str = "10 minutes",
    dedup_keys: tuple[str, ...] = ("user_ip", "ts", "item_id"),
) -> DataFrame:
    """T4 (watermark) + T6 (at-least-once dedup; the reference producer
    retries up to 10x, generator.py:210) + P3/J4 (stream-static anti-join
    against the suspicious-IP set, re-read per micro-batch so TTL expiry
    is picked up without restarting the query)."""
    wm = stream.withWatermark("ts", watermark)
    try:
        deduped = wm.dropDuplicatesWithinWatermark(list(dedup_keys))
    except AttributeError:  # older Spark: unbounded-state variant
        deduped = wm.dropDuplicates(list(dedup_keys))
    return deduped.join(suspicious.select("user_ip"), "user_ip", "left_anti")


def windowed_popularity(
    stream: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """T1 — tumbling-window per-item counts (reference diagram comp. 6).
    Append mode emits a window only after the watermark passes — the
    correct semantics for "most popular last hour" downstream."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "item_id")
        .agg(F.count("*").alias("n_views"))
        .select(F.col("w.start").alias("window_start"), "item_id", "n_views")
    )


def sliding_traffic(
    stream: DataFrame,
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T2 — overlapping windows so alert latency ≤ slide ≪ window."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_activity(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """T3 — per-user session windows (dynamic-gap tumbling)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_ip")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_ip",
            "n_events",
        )
    )


def high_traffic_alerts(
    stream: DataFrame,
    threshold: int,
    on_alert: Callable[[list], None],
    window: str = "1 minute",
    watermark: str = "10 minutes",
    checkpoint: str | None = None,
):
    """T5/S8 — threshold alerting (reference diagram comp. 7, Lambda+SNS):
    windowed counts stream into foreachBatch; rows over threshold invoke
    the callback. Append mode means each window is emitted exactly once
    (after its watermark) ⇒ alert-once without extra state."""
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") > threshold)
        .select(F.col("w.start").alias("window_start"), "n_events")
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.collect()  # alert rows only: tiny by construction
        if rows:
            on_alert(rows)

    writer = agg.writeStream.outputMode("append").foreachBatch(handle).trigger(
        availableNow=True
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
