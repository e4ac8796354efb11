"""Batch sinks (SURVEY.md §2.1 S6/S11): hive-partitioned parquet with
file-count control, plus the incremental (bookmark-style) reader S9.

The long-term-storage layout mirrors the reference's Firehose-to-S3
partitioning (reference diagram comp. 10; hourly path layout
log-generator/generator.py:244): partition columns (year, month, day,
hour) derived from event time, so hour-ranged queries prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "append",
    target_files_per_partition: int = 1,
) -> None:
    """Write time-partitioned parquet. Repartitioning by the partition
    columns before the write keeps file counts at
    ``target_files_per_partition`` per hour instead of
    (shuffle-partitions x hours) tiny files — the small-files problem is
    the #1 operational failure of this layout at scale."""
    out = (
        df.withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
        .withColumn("hour", F.hour(ts_col))
    )
    out = out.repartition(
        target_files_per_partition, "year", "month", "day", "hour"
    ) if target_files_per_partition == 1 else out.repartition(
        "year", "month", "day", "hour"
    )
    out.write.mode(mode).partitionBy("year", "month", "day", "hour").parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned layout back; partition columns come from the
    directory structure and support partition pruning."""
    return spark.read.parquet(path)


def read_incremental(
    spark: SparkSession, path: str, schema, modified_after: str
) -> DataFrame:
    """S9 — bookmark-style incremental batch read (reference:
    cloudformation/glue_cf_template.json:139, job-bookmark-enable): only
    files modified after the checkpoint time. The streaming-checkpoint
    variant (exactly-once) is streaming/pipelines.py with
    Trigger.AvailableNow."""
    return (
        spark.read.schema(schema)
        .option("modifiedAfter", modified_after)
        .option("recursiveFileLookup", True)
        .parquet(path)
    )
