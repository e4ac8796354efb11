"""amazonbigdata_for_students_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
gridu/AMAZONBIGDATA_FOR_STUDENTS clickstream-analytics platform (reference
surveyed in SURVEY.md), re-expressed Spark-first: DataFrame/SQL logical
plans optimized by Catalyst, Structured Streaming for the stream paths,
Arrow-vectorized pandas UDFs for the few operators Spark lacks natively.

Layout:
  session      SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
  schemas      explicit StructTypes for every table (no inference in prod paths)
  sources/     readers & writers: parquet/csv/jsonl, partitioned sinks,
               TTL'd state table, incremental (bookmark-style) reads
  functions/   scalar-function helpers: timestamps, strings, json, text
               analysis, vector math, multimodal (binary-column) plumbing
  operators/   composed relational operators: as-of join, range join,
               top-k per group, dedup family (exact/minhash/simhash), ANN
  plans/       end-to-end pipelines + the query registry (the driver/bench
               surface: every SURVEY.md §2 operator as a named query with a
               DuckDB oracle twin)
  streaming/   Structured Streaming pipelines: watermarked window aggs,
               streaming dedup, stream-static anti-join, alert sinks
"""

__version__ = "0.1.0"
