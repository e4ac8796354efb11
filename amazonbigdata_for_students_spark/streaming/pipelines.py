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


def join_views_reviews(
    views: DataFrame,
    reviews: DataFrame,
    watermark: str = "10 minutes",
    max_lag: str = "15 minutes",
) -> DataFrame:
    """J5 — stream-stream inner join: a review joins the view of the same
    (user_ip, item_id) that happened at-or-before it within max_lag. Both
    sides carry watermarks and the join condition bounds event-time range,
    so Catalyst can evict both join-state buffers — the only formulation
    whose state doesn't grow forever."""
    v = views.select(
        F.col("user_ip").alias("v_user_ip"),
        F.col("item_id").alias("v_item_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    r = reviews.select(
        "user_ip", "item_id", F.col("ts").alias("review_ts"), "review_stars"
    ).withWatermark("review_ts", watermark)
    cond = (
        (F.col("user_ip") == F.col("v_user_ip"))
        & (F.col("item_id") == F.col("v_item_id"))
        & (F.col("view_ts") <= F.col("review_ts"))
        & (F.col("view_ts") >= F.col("review_ts") - F.expr(f"INTERVAL {max_lag}"))
    )
    return v.join(r, cond, "inner").select(
        "user_ip", "item_id", "view_ts", "review_ts", "review_stars"
    )


def alert_once_stateful(
    stream: DataFrame,
    threshold: int,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    ttl_ms: int = 3_600_000,
):
    """T5/T7 via applyInPandasWithState — the GroupState formulation of
    alert-once: per window-start key, state records whether the alert
    already fired; re-delivery of the same window (update-mode re-emission,
    replays) does not re-alert. State expires via EVENT-time timeout
    (window_start + ttl, clamped above the current watermark) — the TTL
    semantics of reference diagram comp. 5, but deterministic under replay.
    Processing-time timeouts would also never resolve under
    Trigger.AvailableNow (the drain would spin forever waiting on wall
    clock); event-time timeouts settle as the watermark advances and the
    drain terminates.

    Returns the (window_start, n_events) alert stream — emitted at most
    once per window."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # applyInPandasWithState cannot sit downstream of a streaming
    # aggregation — the counting happens inside the stateful function:
    # state per window key = (cumulative count, fired flag).
    keyed = stream.withWatermark("ts", watermark).select(
        F.date_trunc("minute" if window == "1 minute" else "hour", F.col("ts")).alias(
            "window_start"
        ),
        F.col("ts"),
    )

    def fire_once(key, pdfs, state: GroupState):
        import pandas as pd  # executor-side

        if state.hasTimedOut:  # TTL expiry — drop the alert memory
            state.remove()
            return
        batch_n = sum(len(pdf) for pdf in pdfs)
        if state.exists:
            count, fired = state.get
        else:
            count, fired = 0, False
        count += batch_n
        should_fire = count > threshold and not fired
        state.update((count, fired or should_fire))
        # (Re)arm the event-time TTL: must stay above the watermark or
        # Spark rejects it, hence the clamp.
        window_ms = int(key[0].timestamp() * 1000)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(window_ms + ttl_ms, wm_ms + 60_000))
        if should_fire:
            yield pd.DataFrame({"window_start": [key[0]], "n_events": [count]})

    return keyed.groupBy("window_start").applyInPandasWithState(
        fire_once,
        outputStructType="window_start timestamp, n_events long",
        stateStructType="count long, fired boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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


def reviews_pipeline(
    raw_reviews: DataFrame,
    model=None,
    spam_threshold: float = 0.5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """§3.2 reviews path (reference diagram comps. 2→3→9): typed silver
    view of the review stream + the spam classifier (Arrow-batched pandas
    UDF, model broadcast once) running INSIDE the stream — every
    micro-batch emits scored reviews with is_spam flags, ready to fork to
    the ham sink and the spam quarantine. The UDF sits after projection,
    so only title/text bytes cross the Arrow boundary."""
    from ..functions import spam

    silver = raw_reviews.select(
        F.col("item_id").cast("long").alias("item_id"),
        F.to_timestamp("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.col("user_ip"),
        F.col("review_title"),
        F.col("review_text"),
        F.col("review_stars").cast("int").alias("review_stars"),
    ).withWatermark("ts", watermark)
    return spam.classify_reviews(silver, model=model, threshold=spam_threshold)


def tws_available() -> bool:
    """True iff transformWithStateInPandas can run here: its state server
    speaks protobuf to the Python worker, so the `google.protobuf` package
    must be importable (this container does not ship it — see the NOTE in
    batch_twins.py)."""
    try:
        import google.protobuf  # noqa: F401
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
        return True
    except ImportError:
        return False


def alert_once_tws(
    stream: DataFrame,
    threshold: int,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    ttl_ms: int = 3_600_000,
) -> DataFrame:
    """transformWithStateInPandas port of `alert_once_stateful` — the
    typed-state successor API (Spark 4 StatefulProcessor: named
    ValueState on the store plus event-time timers replacing GroupState's
    single timeout slot). Same semantics by construction: per window key,
    a (count, fired) ValueState accumulates; the alert emits exactly once
    when count first exceeds the threshold; a timer at window_start + ttl
    (clamped above the watermark) expires the alert memory.

    Feature-gated: raises RuntimeError immediately when the runtime lacks
    protobuf (tws_available), instead of failing deep inside the first
    micro-batch — callers fall back to alert_once_stateful, which is
    label-identical (tests/test_streaming.py pins byte-equality wherever
    the API is available)."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas unavailable: google.protobuf is not "
            "installed in this runtime; use alert_once_stateful instead"
        )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class AlertOnce(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # timer_ms mirrors GroupState's single-timeout semantics:
            # registerTimer ACCUMULATES timers (unlike setTimeoutTimestamp,
            # which replaces), so the previously armed one must be deleted
            # or a stale early timer would expire the state and let the
            # alert re-fire — diverging from the applyInPandasWithState twin
            self._state = handle.getValueState(
                "alert", "count long, fired boolean, timer_ms long"
            )
            self._handle = handle

        def handleInputRows(self, key, rows, timerValues):
            batch_n = sum(len(pdf) for pdf in rows)
            count, fired, old_timer = (
                self._state.get() if self._state.exists() else (0, False, 0)
            )
            count += batch_n
            should_fire = count > threshold and not fired
            window_ms = int(key[0].timestamp() * 1000)
            wm_ms = timerValues.getCurrentWatermarkInMs()
            new_timer = max(window_ms + ttl_ms, wm_ms + 60_000)
            if old_timer and old_timer != new_timer:
                self._handle.deleteTimer(old_timer)
            self._handle.registerTimer(new_timer)
            self._state.update((count, fired or should_fire, new_timer))
            if should_fire:
                yield pd.DataFrame(
                    {"window_start": [key[0]], "n_events": [count]}
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            self._state.clear()
            yield from ()

        def close(self) -> None:
            pass

    keyed = stream.withWatermark("ts", watermark).select(
        F.date_trunc(
            "minute" if window == "1 minute" else "hour", F.col("ts")
        ).alias("window_start"),
        F.col("ts"),
    )
    return keyed.groupBy("window_start").transformWithStateInPandas(
        statefulProcessor=AlertOnce(),
        outputStructType="window_start timestamp, n_events long",
        outputMode="Update",
        timeMode="EventTime",
    )
