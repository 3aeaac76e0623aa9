"""Bucketed-table co-location: identically-bucketed tables join with no
shuffle — the plan property that carries hub↔satellite joins at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_etl_spark import catalog, sources
from airflow_etl_spark.plans import formatted_plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    cust = catalog.load_table(spark, sf_dir, "customer")
    orders = catalog.load_table(spark, sf_dir, "orders")
    sources.write_bucketed(cust, "t_cust_b", ["c_custkey"], 8)
    sources.write_bucketed(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        "t_orders_b", ["c_custkey"], 8,
    )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("t_cust_b").join(
                spark.table("t_orders_b"), "c_custkey"
            )
            plan = formatted_plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: zero shuffle
            # and the result is right
            assert joined.count() == orders.join(
                cust, cust.c_custkey == orders.o_custkey
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cust_b")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_dv_bucketed_dimension_join_is_exchange_free(spark, sf_dir):
    """The registry's dv_bucketed_dimension end-to-end: hub + satellite
    staged via write_bucketed, dimension reconstructed from the stored
    tables — with broadcast disabled the hash-key join must be a
    co-located sort-merge join with ZERO Exchange (the SCALE.md
    'bucketed sort-merge, zero exchange' claim, now asserted on the
    actual vault load path, not an isolated pair of tables)."""
    from airflow_etl_spark import queries as Q

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dim = Q.dv_bucketed_dimension(spark, sf_dir)
        plan = formatted_plan(dim)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and the relation equals the unbucketed dv_current_dimension
        a = sorted(map(tuple, dim.collect()))
        b = sorted(map(tuple, Q.dv_current_dimension(spark, sf_dir).collect()))
        assert a == b and len(a) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS dvb_hub_customer")
        spark.sql("DROP TABLE IF EXISTS dvb_sat_customer")
