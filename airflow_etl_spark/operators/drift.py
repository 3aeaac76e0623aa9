"""Schema-drift detection (SURVEY.md §1.3; schemadrift_* semantics).

The reference's dbt staging layer diffs each source's live schema against
the staged schema and writes `schemadrift_tablechangedetail` rows
(columns: run_id, table_name, source_name, column_name, data_type,
status 'I'|'D', change_date, created_date — utlis/send_email.py:26-49) and a
per-table `schemadrift_tablechange` flag. Reproduced here as a pure
DataFrame diff:

- 'I' (inserted): column present in the source, absent from the registry.
- 'D' (deleted): column present in the registry, gone from the source.

Schemas are tiny (control-plane), so both sides are literal DataFrames; the
comparison itself is the J3/J4 anti-join pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def schema_df(spark: SparkSession, df: DataFrame, table_name: str) -> DataFrame:
    """A live DataFrame's schema as rows (table_name, column_name, data_type)
    — the engine's `information_schema.columns` analog."""
    rows = [(table_name, f.name, f.dataType.simpleString()) for f in df.schema.fields]
    return spark.createDataFrame(
        rows, "table_name string, column_name string, data_type string"
    )


def drift_detail(
    source_schema: DataFrame,
    registered_schema: DataFrame,
    run_id: str,
    source_name: str,
    change_date: str,
) -> DataFrame:
    """schemadrift_tablechangedetail rows for one run: I/D per column."""
    inserted = source_schema.join(
        registered_schema.select("table_name", "column_name"),
        on=["table_name", "column_name"],
        how="left_anti",
    ).withColumn("status", F.lit("I"))
    deleted = registered_schema.join(
        source_schema.select("table_name", "column_name"),
        on=["table_name", "column_name"],
        how="left_anti",
    ).withColumn("status", F.lit("D"))
    return (
        inserted.unionByName(deleted)
        .select(
            F.lit(run_id).alias("run_id"),
            "table_name",
            F.lit(source_name).alias("source_name"),
            "column_name",
            "data_type",
            "status",
            F.lit(change_date).alias("change_date"),
            F.lit(change_date).alias("created_date"),
        )
    )


def drift_flags(detail: DataFrame) -> DataFrame:
    """schemadrift_tablechange: one row per table with is_updated=1 when any
    I/D row exists (utlis/send_email.py:43-49)."""
    return (
        detail.groupBy("run_id", "table_name", "source_name")
        .agg(F.lit(1).alias("is_updated"))
    )
