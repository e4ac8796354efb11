"""Streaming sources & sinks (SURVEY.md §2.1 S2/S6/S8/S9).

Dev harness: JSON-lines directories as a file stream — the local stand-in
for the reference's Kinesis streams (reference:
log-generator/generator.py:202-224; records are JSON lines with sorted
keys, generator.py:158). ``maxFilesPerTrigger`` bounds micro-batch size
the way Kinesis shard limits do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


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
