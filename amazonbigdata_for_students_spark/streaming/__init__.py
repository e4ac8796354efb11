"""Structured Streaming layer (SURVEY.md §2.9, §3.2).

The reference's stream path (Kinesis → Lambda IP filter → Kinesis
Analytics windowed aggregation → SNS alerts → Firehose S3 landing)
re-expressed as Structured Streaming queries over a file-stream dev
source. Swapping the source for Kafka/Kinesis changes one line in
``sources.py``; every transformation is source-agnostic.
"""

from . import pipelines, sources

__all__ = ["pipelines", "sources"]
