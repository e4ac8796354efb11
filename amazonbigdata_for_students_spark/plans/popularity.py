"""Popularity pipeline — most popular items/categories per window
(reference diagram comp. 6, SURVEY.md §3.2a) over the reference-domain
fixtures: enrichment join + windowed counts + per-window top-N."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def popular_items(
    views: DataFrame, items: DataFrame, window: str = "1 hour", top_n: int = 5
) -> DataFrame:
    """Top-N items per tumbling window, enriched with title/category.
    items is dimension-sized ⇒ broadcast; counts aggregate partially
    before the shuffle; the rank window reuses the window key."""
    counts = (
        views.join(F.broadcast(items), "item_id")
        .groupBy(F.window("ts", window).alias("w"), "item_id", "title", "category")
        .agg(F.count("*").alias("n_views"))
    )
    rank_w = W.partitionBy("w").orderBy(F.col("n_views").desc(), F.col("item_id"))
    return (
        counts.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= top_n)
        .select(
            F.col("w.start").alias("window_start"),
            "item_id",
            "title",
            "category",
            "n_views",
            "rank",
        )
    )


def popular_categories(
    views: DataFrame, items: DataFrame, window: str = "1 hour", top_n: int = 3
) -> DataFrame:
    """Top-N categories per tumbling window (the rollup axis of comp. 6)."""
    counts = (
        views.join(F.broadcast(items.select("item_id", "category")), "item_id")
        .groupBy(F.window("ts", window).alias("w"), "category")
        .agg(F.count("*").alias("n_views"), F.countDistinct("user_ip").alias("n_ips"))
    )
    rank_w = W.partitionBy("w").orderBy(F.col("n_views").desc(), F.col("category"))
    return (
        counts.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= top_n)
        .select(
            F.col("w.start").alias("window_start"),
            "category",
            "n_views",
            "n_ips",
            "rank",
        )
    )
