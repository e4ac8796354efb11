"""Driver contract for the spark-graft builder (PySpark target).

Thin views over the engine's query registry
(``amazonbigdata_for_students_spark.plans.REGISTRY``): every implemented
operator from SURVEY.md §2 is one named entry with a PySpark builder and
(when SQL-expressible) a DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from amazonbigdata_for_students_spark.plans import REGISTRY
from amazonbigdata_for_students_spark.session import configure_runtime

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_runtime(spark)
    return REGISTRY["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_runtime(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(q.fn) for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query; omitted => rows-only check."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
