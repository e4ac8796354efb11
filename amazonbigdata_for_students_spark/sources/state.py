"""KV state table with TTL — the DynamoDB-suspicious-IPs replacement
(SURVEY.md §2.1 S5/S7, §2.9 T7; reference diagram comp. 5,
cloudformation/glue_cf_template.json:104-120).

A parquet-backed state table where every row carries ``expires_at``;
reads filter to live rows, writes stamp ``detected_at``/``expires_at``,
and ``compact`` drops expired rows so the table never grows unboundedly.
At scale the table stays dimension-sized (it holds *keys*, not events),
so readers broadcast it into stream/batch anti-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .. import schemas


def write_state(
    df: DataFrame,
    path: str,
    key_col: str = "user_ip",
    ttl: str = "INTERVAL 1 HOUR",
    reason: str = "rate>threshold",
    detected_at: Column | None = None,
) -> None:
    """Stamp TTL metadata and overwrite the state table.

    ``detected_at`` defaults to current_timestamp(); pass an event-time
    column for deterministic tests/backfills.
    """
    det = detected_at if detected_at is not None else F.current_timestamp()
    out = df.select(
        F.col(key_col).alias("user_ip"),
        det.alias("detected_at"),
        (det + F.expr(ttl)).alias("expires_at"),
        F.lit(reason).alias("reason"),
    )
    # State tables are key-sized: coalesce to avoid thousands of tiny files
    # from a wide upstream shuffle.
    out.coalesce(1).write.mode("overwrite").parquet(path)


def read_state(
    spark: SparkSession, path: str, now: Column | None = None
) -> DataFrame:
    """Read only live (non-expired) state rows — the TTL-filter-at-read
    semantics of the reference's DynamoDB TTL."""
    now = now if now is not None else F.current_timestamp()
    df = spark.read.schema(schemas.SUSPICIOUS_IPS).parquet(path)
    return df.filter(F.col("expires_at") > now)


def compact(spark: SparkSession, path: str, now: Column | None = None) -> int:
    """Drop expired rows (the periodic TTL compaction job). Returns the
    number of live rows kept."""
    live = read_state(spark, path, now).cache()
    n = live.count()
    live.coalesce(1).write.mode("overwrite").parquet(path + ".compact")
    spark.read.parquet(path + ".compact").coalesce(1).write.mode("overwrite").parquet(path)
    live.unpersist()
    return n
