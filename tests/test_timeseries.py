"""OHLC resampling (operators/timeseries): exact bar semantics with
total-order tie-breaking, partitioning-invariance (the associativity
that makes incremental bar maintenance sound), and the no-window
one-pass plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from airflow_etl_spark.operators.timeseries import resample_ohlc
from airflow_etl_spark.plans import formatted_plan


def _df(spark):
    rows = [
        # (type, ts, id, v) — day 1: open=5 (earliest), close=9 (latest)
        ("a", datetime(2024, 1, 1, 0, 0, 1), 1, 5),
        ("a", datetime(2024, 1, 1, 12, 0, 0), 2, 100),
        ("a", datetime(2024, 1, 1, 23, 59, 59), 3, 9),
        # day 2: single row — open=high=low=close
        ("a", datetime(2024, 1, 2, 5, 0, 0), 4, 7),
        # type b day 1: EQUAL timestamps -> tie broken by id (open=id5)
        ("b", datetime(2024, 1, 1, 8, 0, 0), 5, 50),
        ("b", datetime(2024, 1, 1, 8, 0, 0), 6, 60),
    ]
    return spark.createDataFrame(
        rows, "g string, ts timestamp, id long, v long"
    )


def _bars(df):
    return {
        (r.g, r.bucket_start): (
            r.open_v, r.high_v, r.low_v, r.close_v, r.n, r.sum_v
        )
        for r in resample_ohlc(
            df, "ts", "v", ["g"], tie_col="id", bucket="day"
        ).collect()
    }


def test_ohlc_bar_semantics(spark):
    bars = _bars(_df(spark))
    assert bars[("a", "2024-01-01 00:00:00")] == (5, 100, 5, 9, 3, 114)
    assert bars[("a", "2024-01-02 00:00:00")] == (7, 7, 7, 7, 1, 7)
    # equal timestamps: lower id wins open, higher id wins close
    assert bars[("b", "2024-01-01 00:00:00")] == (50, 60, 50, 60, 2, 110)


def test_ohlc_partitioning_invariant(spark):
    """Bars are identical however the stream is partitioned — the
    partial-merge associativity incremental maintenance relies on."""
    df = _df(spark)
    assert _bars(df.repartition(1)) == _bars(df.repartition(7, "v"))


def test_ohlc_rejects_unknown_bucket(spark):
    import pytest

    with pytest.raises(ValueError, match="not in"):
        resample_ohlc(_df(spark), "ts", "v", ["g"], "id", bucket="5min")


def test_ohlc_plan_one_pass_no_window(spark, sf_dir):
    import re

    from airflow_etl_spark import queries as Q

    plan = formatted_plan(Q.queries()["ts_resample_ohlc"](spark, sf_dir))
    assert "Window" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "partial_min_by" in plan or "partial_min" in plan
