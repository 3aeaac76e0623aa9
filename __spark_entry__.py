"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over airflow_etl_spark.queries — the engine's query registry.
Each registry entry pairs a Spark callable with its DuckDB oracle SQL;
column names and value formatting are aligned on both sides (see
airflow_etl_spark/queries.py for the conventions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from airflow_etl_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
