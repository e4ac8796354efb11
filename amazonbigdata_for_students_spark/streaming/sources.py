"""Streaming sources & sinks (SURVEY.md §2.1 S2/S6/S8/S9).

Dev harness: JSON-lines directories as a file stream — the local stand-in
for the reference's Kinesis streams (reference:
log-generator/generator.py:202-224; records are JSON lines with sorted
keys, generator.py:158). ``maxFilesPerTrigger`` bounds micro-batch size
the way Kinesis shard limits do.
"""

from __future__ import annotations

import socket
import threading

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming import StreamingQuery

# The six wire columns Spark's format("kafka") reader produces. The dev
# harness synthesizes the same shape so every downstream transformation is
# identical code whether records arrive from a broker or from files.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def parse_kafka_records(records: DataFrame, schema: T.StructType) -> DataFrame:
    """Normalize Kafka wire records into typed rows: JSON-decode `value`
    against an explicit schema (streaming never infers), keeping the wire
    metadata namespaced with a leading underscore so it can't collide with
    payload fields. Works identically on a real format("kafka") frame and
    the dev-harness frame below."""
    return records.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r"),
        F.col("topic").alias("_topic"),
        F.col("timestamp").alias("_ingest_ts"),
    ).select("r.*", "_topic", "_ingest_ts")


def read_kafka_stream(
    spark: SparkSession,
    schema: T.StructType,
    *,
    bootstrap_servers: str | None = None,
    topic: str = "events",
    starting_offsets: str = "earliest",
    dev_jsonl_path: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S2 production analogue — Kafka-shaped stream ingress (the reference's
    ingress is a Kinesis stream, generator.py:202-224; Kafka is the
    portable equivalent). Two modes, one downstream path:

    * ``bootstrap_servers`` given → the real ``format("kafka")`` reader
      (requires the spark-sql-kafka connector on the cluster classpath).
    * ``dev_jsonl_path`` given → dev harness: a JSONL file stream whose
      lines are re-shaped into the same six wire columns
      (KAFKA_WIRE_SCHEMA), so tests exercise the identical normalization.

    Either way the result is `parse_kafka_records(wire, schema)` — typed
    payload columns plus `_topic` / `_ingest_ts` metadata."""
    if (bootstrap_servers is None) == (dev_jsonl_path is None):
        raise ValueError("pass exactly one of bootstrap_servers or dev_jsonl_path")
    if bootstrap_servers is not None:
        wire = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    else:
        reader = spark.readStream.schema(
            T.StructType([T.StructField("value", T.StringType())])
        )
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        lines = reader.text(dev_jsonl_path)
        wire = lines.select(
            F.lit(None).cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit(topic).alias("topic"),
            F.spark_partition_id().alias("partition"),
            # files carry no broker offset; a content hash is a stable
            # stand-in for logging/debug (never used for ordering)
            F.xxhash64(F.col("value")).alias("offset"),
            F.current_timestamp().alias("timestamp"),
        )
    return parse_kafka_records(wire, schema)


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S2 — JSONL file-stream source with an explicit schema (streaming
    reads never infer)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def write_partitioned_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = False,
) -> StreamingQuery:
    """S6/T8 — exactly-once partitioned parquet sink: Firehose-to-S3
    long-term storage (reference diagram comp. 10). The file sink +
    checkpoint WAL is exactly-once by design; partition columns must
    already be on the frame (sinks.write_partitioned adds them in batch)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("year", "month", "day", "hour")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_available_now_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Test/bookmark harness (S9): drain everything currently available
    through the streaming plan into an in-memory table, then stop —
    Trigger.AvailableNow is the streaming analogue of Glue job bookmarks
    (reference: cloudformation/glue_cf_template.json:139): each run
    processes exactly the files the checkpoint has not seen."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
