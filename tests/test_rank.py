"""Distributed exact ranking (operators/rank.py): zone_rank / zone_cumsum
must be VALUE-IDENTICAL to the unpartitioned global window they replace —
including under AQE, whose stage reuse is what guarantees both consumers
of the range exchange see the same zone layout — and ntile_from_rank must
reproduce SQL-standard ntile bit-for-bit, including the n < k edge."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from airflow_etl_spark.operators import rank as R


def _per_cust(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("f"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("m"),
    )


def test_zone_rank_matches_global_row_number(spark, sf_dir):
    pc = _per_cust(spark, sf_dir)
    order = [F.col("f").asc(), F.col("o_custkey").asc()]
    zr = R.zone_rank(pc, order, "zrk").select("o_custkey", "zrk")
    gw = pc.select(
        "o_custkey",
        F.row_number().over(Window.orderBy(*order)).cast("long").alias("rk"),
    )
    assert (
        zr.join(gw, "o_custkey").filter(F.col("zrk") != F.col("rk")).count()
        == 0
    )


def test_zone_rank_desc_ordering(spark, sf_dir):
    pc = _per_cust(spark, sf_dir)
    order = [F.col("m").desc(), F.col("o_custkey").asc()]
    zr = R.zone_rank(pc, order, "zrk").select("o_custkey", "zrk")
    gw = pc.select(
        "o_custkey",
        F.row_number().over(Window.orderBy(*order)).cast("long").alias("rk"),
    )
    assert (
        zr.join(gw, "o_custkey").filter(F.col("zrk") != F.col("rk")).count()
        == 0
    )


def test_zone_cumsum_inclusive_and_exclusive(spark, sf_dir):
    pc = _per_cust(spark, sf_dir)
    order = [F.col("f").asc(), F.col("o_custkey").asc()]
    for inclusive, end in ((True, 0), (False, -1)):
        zc = R.zone_cumsum(
            pc, order, "m", "cs", inclusive=inclusive
        ).select("o_custkey", "cs")
        gw = pc.select(
            "o_custkey",
            F.coalesce(
                F.sum("m").over(
                    Window.orderBy(*order).rowsBetween(
                        Window.unboundedPreceding, end
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("gcs"),
        )
        assert (
            zc.join(gw, "o_custkey")
            .filter(F.col("cs") != F.col("gcs"))
            .count()
            == 0
        )


def test_ntile_from_rank_matches_sql_ntile(spark, sf_dir):
    pc = _per_cust(spark, sf_dir)
    order = [F.col("m").asc(), F.col("o_custkey").asc()]
    for k in (3, 5, 7):
        zr = R.zone_rank(pc, order, "zrk")
        tot = pc.agg(F.count(F.lit(1)).cast("long").alias("n"))
        mine = zr.crossJoin(F.broadcast(tot)).select(
            "o_custkey",
            R.ntile_from_rank(F.col("zrk"), F.col("n"), k).alias("t"),
        )
        ref = pc.select(
            "o_custkey", F.ntile(k).over(Window.orderBy(*order)).alias("gt")
        )
        assert (
            mine.join(ref, "o_custkey")
            .filter(F.col("t") != F.col("gt"))
            .count()
            == 0
        )


def test_ntile_small_n_edge(spark):
    """n < k: every row lands in its own tile 1..n — the q = 0 branch
    guard (greatest(q, 1)) must never fire a division error."""
    df = spark.createDataFrame([(i,) for i in range(3)], "id long")
    zr = R.zone_rank(df, [F.col("id")], "rk")
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    got = {
        (r.id, r.t)
        for r in zr.crossJoin(F.broadcast(tot))
        .select("id", R.ntile_from_rank(F.col("rk"), F.col("n"), 5).alias("t"))
        .collect()
    }
    assert got == {(0, 1), (1, 2), (2, 3)}


def test_zone_rank_plan_has_no_single_partition_window(spark, sf_dir):
    from airflow_etl_spark.plans import single_partition_window_feeds

    pc = _per_cust(spark, sf_dir)
    df = R.zone_rank(pc, [F.col("f"), F.col("o_custkey")], "rk")
    assert single_partition_window_feeds(df) == []
