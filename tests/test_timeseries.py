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


# -- exact fixed-point EWMA ---------------------------------------------------


def test_ewma_matches_pure_python_fold(spark):
    from airflow_etl_spark.operators.timeseries import ewma_fixed

    rows = [
        ("u1", datetime(2024, 1, 1, 0, 0, i), i, v)
        for i, v in enumerate([100, 200, 50, 400, 75])
    ] + [("u2", datetime(2024, 1, 1), 99, 42)]
    df = spark.createDataFrame(
        rows, "u string, ts timestamp, id long, v long"
    )
    got = {
        r.u: (r.n_events, r.ewma_v, r.last_v)
        for r in ewma_fixed(df, ["u"], "ts", "id", "v", halvings=2).collect()
    }

    def ref(vals):
        acc = vals[0]
        for x in vals[1:]:
            acc = (acc * 3 + x) // 4
        return acc

    assert got["u1"] == (5, ref([100, 200, 50, 400, 75]), 75)
    assert got["u2"] == (1, 42, 42)  # single event: seed is the answer


def test_ewma_order_is_total_even_with_equal_timestamps(spark):
    from airflow_etl_spark.operators.timeseries import ewma_fixed

    t = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("u", t, 2, 100), ("u", t, 1, 900)],
        "u string, ts timestamp, id long, v long",
    )
    r = ewma_fixed(df, ["u"], "ts", "id", "v").collect()[0]
    # id 1 first: seed 900, then (900+100) DIV 2 = 500
    assert (r.ewma_v, r.last_v) == (500, 100)


def test_ewma_partitioning_invariant(spark):
    from airflow_etl_spark.operators.timeseries import ewma_fixed

    rows = [
        ("u", datetime(2024, 1, 1, 0, i // 60, i % 60), i, (i * 37) % 500)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "u string, ts timestamp, id long, v long"
    )

    def run(d):
        r = ewma_fixed(d, ["u"], "ts", "id", "v", halvings=3).collect()[0]
        return (r.n_events, r.ewma_v, r.last_v)

    assert run(df.repartition(1)) == run(df.repartition(13, "v"))


def test_ewma_rejects_zero_halvings(spark):
    import pytest

    from airflow_etl_spark.operators.timeseries import ewma_fixed

    df = spark.createDataFrame(
        [("u", datetime(2024, 1, 1), 1, 1)],
        "u string, ts timestamp, id long, v long",
    )
    with pytest.raises(ValueError, match="halvings"):
        ewma_fixed(df, ["u"], "ts", "id", "v", halvings=0)


# -- position-based attribution ----------------------------------------------


def test_attribution_credits_sum_to_10000_per_user(spark, sf_dir):
    from airflow_etl_spark import queries as Q

    res = Q.queries()["w12_attribution"](spark, sf_dir)
    bad = (
        res.groupBy("user_id")
        .agg(F.sum("credit_bp").alias("t"))
        .filter(F.col("t") != 10000)
        .count()
    )
    assert bad == 0


def test_attribution_shapes_for_small_journeys(spark, tmp_path):
    """Synthetic journeys: n=1 -> 10000; n=2 -> 5000/5000; n=5 -> U-shape
    4000/667/667/666/4000 with the remainder on the EARLIEST middles."""
    from datetime import datetime

    from airflow_etl_spark import queries as Q

    rows = []
    eid = 0

    def add(u, typ, minute):
        nonlocal eid
        rows.append((eid, datetime(2024, 1, 1, 0, minute), u, typ, 1.0, ""))
        eid += 1

    add(1, "click", 1); add(1, "purchase", 2)
    add(2, "click", 1); add(2, "click", 2); add(2, "purchase", 3)
    for m in range(1, 6):
        add(3, "click", m)
    add(3, "purchase", 7)
    # clicks AFTER the last purchase never credit
    add(3, "click", 8)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    # the query reads <sf_dir>/events.parquet via the catalog loader
    out = Q.queries()["w12_attribution"](spark, str(tmp_path)).collect()
    got = {}
    for r in out:
        got.setdefault(r.user_id, []).append((r.position, r.credit_bp))
    for u in got:
        got[u].sort()
    assert got[1] == [(1, 10000)]
    assert got[2] == [(1, 5000), (2, 5000)]
    assert got[3] == [(1, 4000), (2, 667), (3, 667), (4, 666), (5, 4000)]


# -------------------------------------------------------------- Holt --
def _holt_ref(vs, h=2):
    """Pure-python replay of holt_fixed's documented recurrence
    (truncation toward zero, Spark DIV == DuckDB //)."""
    w = 2 ** h

    def tdiv(a):
        return int(a / w) if a >= 0 else -((-a) // w)

    l, t = vs[0], 0
    for x in vs[1:]:
        l2 = tdiv(x + (w - 1) * (l + t))
        t2 = tdiv((l2 - l) + (w - 1) * t)
        l, t = l2, t2
    return l, t


def test_holt_matches_pure_python_replay(spark):
    from airflow_etl_spark.operators.timeseries import holt_fixed

    rows = []
    series = {
        # rising trend, falling trend (negative levels/trends exercise
        # the truncation-toward-zero contract), flat, single point
        "up": [100, 200, 320, 410, 560, 690],
        "down": [500, 300, 80, -150, -400],
        "flat": [42, 42, 42, 42],
        "one": [7],
    }
    for key, vs in series.items():
        for i, v in enumerate(vs):
            rows.append((key, datetime(2024, 1, 1, 0, 0, i), i, v))
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v long")
    got = {
        r.k: (r.n_events, r.level_v, r.trend_v, r.forecast_v)
        for r in holt_fixed(df, ["k"], "ts", "id", "v").collect()
    }
    for key, vs in series.items():
        l, t = _holt_ref(vs)
        assert got[key] == (len(vs), l, t, l + t), key


def test_holt_partitioning_invariant(spark):
    from airflow_etl_spark.operators.timeseries import holt_fixed

    rows = [("u", datetime(2024, 1, 1, 0, 0, i), i, (i * 37) % 200 - 50)
            for i in range(40)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v long")
    a = holt_fixed(df, ["k"], "ts", "id", "v").collect()
    b = holt_fixed(df.repartition(7), ["k"], "ts", "id", "v").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------------- LTTB (r9) --
def _py_lttb(pts, B):
    """Reference implementation: division-free count-scaled centroid
    areas, seconds-resolution time, ties to the lowest index."""
    n = len(pts)
    ts = [p[0] // 1_000_000 for p in pts]
    vs = [p[2] for p in pts]
    if n <= B + 2:
        return list(range(1, n + 1))
    m = n - 2
    sel, prev = [1], 1
    for j in range(1, B + 1):
        lo, hi = (j - 1) * m // B + 2, j * m // B + 1
        if j < B:
            lo2, hi2 = j * m // B + 2, (j + 1) * m // B + 1
            c = hi2 - lo2 + 1
            st = sum(ts[i - 1] for i in range(lo2, hi2 + 1))
            sv = sum(vs[i - 1] for i in range(lo2, hi2 + 1))
        else:
            c, st, sv = 1, ts[n - 1], vs[n - 1]
        ta = ts[prev - 1] * c - st
        tc = sv - vs[prev - 1] * c
        bi, ba = 0, -1
        for i in range(lo, hi + 1):
            a = abs(ta * (vs[i - 1] - vs[prev - 1])
                    - (ts[prev - 1] - ts[i - 1]) * tc)
            if a > ba:
                bi, ba = i, a
        sel.append(bi)
        prev = bi
    sel.append(n)
    return sel


def test_lttb_matches_python_reference(spark):
    import random

    from airflow_etl_spark.operators.timeseries import lttb_downsample

    random.seed(11)
    rows, expected = [], {}
    for key, n in (("a", 40), ("b", 9), ("c", 23)):
        pts = sorted(
            (random.randrange(0, 3_000_000) * 1_000_000, i,
             random.randrange(-500, 50_000))
            for i in range(n)
        )
        rows += [(key, t, k, v) for (t, k, v) in pts]
        expected[key] = (_py_lttb(pts, 8), pts)
    df = spark.createDataFrame(rows, "kid string, t long, k long, v long")
    out = lttb_downsample(df, ["kid"], "t", "k", "v", 8).collect()
    got = {}
    for r in out:
        got.setdefault(r.kid, []).append((r.idx, r.t, r.v))
    for key, (exp_idx, pts) in expected.items():
        g = sorted(got[key])
        assert [i for (i, _, _) in g] == exp_idx, key
        for (i, t, v) in g:
            assert (t, v) == (pts[i - 1][0], pts[i - 1][2]), (key, i)
