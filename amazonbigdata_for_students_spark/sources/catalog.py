"""Catalog layer (SURVEY.md §2.1 S3, §3.3 entry point C).

The reference exposes landed JSON through a Glue external table with
partition keys + JSON SerDe (reference: cloudformation/
glue_cf_template.json:39-81) crawled into partitions (:82-103). The Spark
native equivalent: ``CREATE TABLE ... USING json PARTITIONED BY``
over the partitioned directory layout + ``MSCK REPAIR TABLE`` (the
crawler analogue) to register partitions, after which partition pruning
applies to SQL over the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_json_table(
    spark: SparkSession,
    name: str,
    location: str,
    columns_ddl: str,
    partition_cols: list[str],
) -> None:
    """External partitioned JSON table over an existing layout, then
    partition discovery (the crawler step, reference run_flow.py:160)."""
    parts = ", ".join(f"{c} INT" for c in partition_cols)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"""
        CREATE TABLE {name} ({columns_ddl})
        USING json
        PARTITIONED BY ({parts})
        LOCATION '{location}'
        """
    )
    spark.sql(f"MSCK REPAIR TABLE {name}")


def query_table(spark: SparkSession, sql: str) -> DataFrame:
    """Athena-surface entry: plain spark.sql over catalog tables."""
    return spark.sql(sql)


def install_views(spark: SparkSession, sf_dir: str) -> None:
    """Register base tables as temp views, then install the semantic view
    layer from sql/views.sql (SURVEY.md §3.3 — the SQL entry point is an
    equal citizen of the DataFrame API; both compile through the same
    Catalyst pipeline)."""
    import os

    from . import readers

    readers.register_views(spark, sf_dir)
    ddl_path = os.path.join(os.path.dirname(__file__), "..", "sql", "views.sql")
    with open(ddl_path) as f:
        ddl = "\n".join(
            line for line in f.read().splitlines() if not line.lstrip().startswith("--")
        )
    for stmt in ddl.split(";"):
        if stmt.strip():
            spark.sql(stmt)
