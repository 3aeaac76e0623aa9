"""as-of join and bucketed range join: semantics on handcrafted frames plus
the plan-shape properties that make them the scale path (single key shuffle,
no nested-loop join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_etl_spark.operators import joins
from airflow_etl_spark.plans import formatted_plan


def _frames(spark):
    left = spark.createDataFrame(
        [("k1", 10, "a"), ("k1", 20, "b"), ("k1", 5, "c"), ("k2", 7, "d")],
        "k string, t long, lbl string",
    )
    right = spark.createDataFrame(
        [("k1", 10, 100.0), ("k1", 15, 150.0), ("k3", 1, 999.0)],
        "k string, t long, v double",
    )
    return left, right


def test_asof_inclusive(spark):
    left, right = _frames(spark)
    out = joins.asof_join(left, right, ["k"], "t", "t", how="left")
    got = {(r.k, r.t): (r.as_of_ts, r.v) for r in out.collect()}
    assert got == {
        ("k1", 10): (10, 100.0),   # equal ts matches when inclusive
        ("k1", 20): (15, 150.0),   # latest at-or-before
        ("k1", 5): (None, None),   # nothing before → null (left join)
        ("k2", 7): (None, None),   # key with no right rows
    }


def test_asof_strict_and_inner(spark):
    left, right = _frames(spark)
    out = joins.asof_join(left, right, ["k"], "t", "t", strict=True)
    got = {(r.k, r.t): (r.as_of_ts, r.v) for r in out.collect()}
    # strict: the t=10 left row no longer matches the t=10 right row, and
    # inner drops every unmatched left row
    assert got == {("k1", 20): (15, 150.0)}


def test_asof_is_single_shuffle_no_join(spark):
    left, right = _frames(spark)
    plan = formatted_plan(joins.asof_join(left, right, ["k"], "t", "t"))
    assert "Join" not in plan  # no join node at all — union + window
    assert plan.count("Exchange") <= 2  # one hashpartitioning (+AQE read)


def test_range_join_matches_naive(spark):
    points = spark.range(0, 1000).select(
        (F.col("id") % 497).cast("double").alias("v"), "id"
    )
    ranges = spark.createDataFrame(
        [("a", 0.0, 100.0), ("b", 50.0, 200.0), ("c", 450.0, 500.0)],
        "band string, lo double, hi double",
    )
    fast = joins.range_join_bucketed(points, ranges, "v", "lo", "hi", 64.0)
    naive = points.crossJoin(ranges).filter(
        (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    )
    key = lambda r: (r.id, r.band)
    assert sorted(map(key, fast.collect())) == sorted(map(key, naive.collect()))


def test_range_join_is_equi_join(spark):
    points = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
    ranges = spark.createDataFrame(
        [("a", 0.0, 50.0)], "band string, lo double, hi double"
    )
    plan = formatted_plan(
        joins.range_join_bucketed(points, ranges, "v", "lo", "hi", 16.0)
    )
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_matches_plain(spark):
    # skewed left: one hot key with 500 rows, plus a uniform tail
    left = spark.range(0, 600).select(
        F.when(F.col("id") < 500, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        F.col("id").alias("lid"),
    )
    right = spark.createDataFrame(
        [("hot", 1.0), ("k500", 2.0), ("k599", 3.0), ("absent", 9.9)],
        "k string, rv double",
    )
    salted = joins.salted_join(left, right, ["k"], salt=8)
    plain = left.join(right, "k")
    key = lambda r: (r.k, r.lid, r.rv)
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([("a", 1), ("b", 2)], "k string, lid int")
    right = spark.createDataFrame([("a", 10.0)], "k string, rv double")
    got = {
        (r.k, r.rv) for r in joins.salted_join(left, right, ["k"], 4, "left").collect()
    }
    assert got == {("a", 10.0), ("b", None)}


def test_salted_join_null_keys_match_plain(spark):
    left = spark.createDataFrame(
        [("a", 1), (None, 2), (None, 3)], "k string, lid int"
    )
    right = spark.createDataFrame(
        [("a", 1.0), (None, 5.0)], "k string, rv double"
    )
    salted = joins.salted_join(left, right, ["k"])
    plain = left.join(right, "k")
    key = lambda r: (r.k, r.lid, r.rv)
    # null keys never match — identical to the plain join's SQL semantics
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


def test_asof_null_payload_not_spliced(spark):
    """A matched right row's legitimate NULL payload must come through as
    NULL — not get replaced by an older row's value."""
    left = spark.createDataFrame([("k", 3)], "k string, t long")
    right = spark.createDataFrame(
        [("k", 1, 5.0), ("k", 2, None)], "k string, t long, x double"
    )
    [r] = joins.asof_join(left, right, ["k"], "t", "t").collect()
    assert r.as_of_ts == 2
    assert r.x is None  # the matched row's NULL, not the t=1 value


# ------------------------------------------- interval overlap (r7 s3) --
def _naive_overlap(spark, a, b):
    return (
        a.select(
            F.col("iid").alias("iid_a"),
            F.col("st").alias("st_a"),
            F.col("en").alias("en_a"),
        )
        .crossJoin(
            b.select(
                F.col("iid").alias("iid_b"),
                F.col("st").alias("st_b"),
                F.col("en").alias("en_b"),
            )
        )
        .filter(
            (F.col("st_a") <= F.col("en_b")) & (F.col("st_b") <= F.col("en_a"))
        )
    )


def test_interval_overlap_matches_naive_join(spark):
    """Banded overlap join == the naive quadratic non-equi join,
    including pairs whose intervals share MANY bands (each must appear
    exactly once — the first-common-band dedup)."""
    from airflow_etl_spark.operators.joins import interval_overlap_join

    rows = [
        (1, 0, 50), (2, 40, 120), (3, 200, 210),
        (4, 0, 1000),  # long interval: covers every band
        (5, 95, 105), (6, 500, 505),
    ]
    df = spark.createDataFrame(rows, "iid int, st long, en long")
    banded = interval_overlap_join(df, df, "st", "en", bucket_width=100)
    got = sorted(
        (r["iid_a"], r["iid_b"]) for r in banded.collect()
    )
    want = sorted(
        (r["iid_a"], r["iid_b"]) for r in _naive_overlap(spark, df, df).collect()
    )
    assert got == want
    assert len(got) == len(set(got))  # exactly-once, no band duplicates


def test_interval_overlap_plan_is_equi_join(spark):
    """The banded plan must be a hash equi-join on the band — never the
    BroadcastNestedLoopJoin Spark gives the raw non-equi predicate —
    and must contain NO dedup aggregate (first-common-band emits each
    pair once by construction)."""
    from airflow_etl_spark.operators.joins import interval_overlap_join
    from airflow_etl_spark.plans import formatted_plan

    df = spark.range(0, 100).select(
        F.col("id").alias("iid"),
        (F.col("id") * 10).alias("st"),
        (F.col("id") * 10 + 15).alias("en"),
    )
    plan = formatted_plan(interval_overlap_join(df, df, "st", "en", 100))
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree
    assert "HashAggregate" not in tree  # no distinct-dedup pass


def test_asof_tolerance_bounds_staleness(spark):
    """tolerance='10 minutes': a match older than the bound is NO match —
    dropped under 'inner', NULL payload under 'left'; fresh matches are
    untouched."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from airflow_etl_spark.operators import joins

    left = spark.createDataFrame(
        [
            (1, "u", datetime(2024, 1, 1, 12, 0)),   # click 5 min before
            (2, "u", datetime(2024, 1, 1, 13, 0)),   # click 65 min before
            (3, "v", datetime(2024, 1, 1, 12, 0)),   # no click at all
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", datetime(2024, 1, 1, 11, 55), 100),
        ],
        "user_id string, ts timestamp, payload long",
    )
    out_left = joins.asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        how="left", tolerance="10 minutes",
    )
    got = {r.event_id: r.payload for r in out_left.collect()}
    assert got == {1: 100, 2: None, 3: None}
    # as_of_ts nulls together with the payload (no chimera rows)
    asof = {r.event_id: r.as_of_ts for r in out_left.collect()}
    assert asof[2] is None and asof[1] is not None

    out_inner = joins.asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        how="inner", tolerance="10 minutes",
    )
    assert [r.event_id for r in out_inner.collect()] == [1]


def test_asof_tolerance_equals_postfilter_of_unbounded(spark, sf_dir):
    """The in-plan tolerance must equal filtering the unbounded as-of
    join afterwards — same matches, same NULLs."""
    from airflow_etl_spark import catalog
    from airflow_etl_spark.operators import joins
    from pyspark.sql import functions as F

    ev = catalog.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        catalog.load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("prev_id"))
    )
    kw = dict(on=["user_id"], left_ts="ts", right_ts="ts", strict=True,
              how="left")
    bounded = joins.asof_join(ev, clicks, tolerance="30 minutes", **kw)
    unbounded = joins.asof_join(ev, clicks, **kw)
    stale = F.col("as_of_ts") < F.col("ts") - F.expr("INTERVAL 30 minutes")
    ref = unbounded.select(
        "event_id", "user_id",
        F.when(~stale, F.col("as_of_ts")).alias("as_of_ts"),
        F.when(~stale, F.col("prev_id")).alias("prev_id"),
    )
    assert bounded.select(*ref.columns).exceptAll(ref).count() == 0
    assert ref.exceptAll(bounded.select(*ref.columns)).count() == 0


def test_merge_full_three_branches(spark):
    """UPDATE matched, INSERT source-only, DELETE-by-source gated by the
    predicate: absent rows failing it survive untouched."""
    from pyspark.sql import functions as F

    from airflow_etl_spark.operators.merge import merge_full

    target = spark.createDataFrame(
        [(1, "F", 100), (2, "O", 200), (3, "F", 300), (4, "O", 400)],
        "k long, st string, v long",
    )
    source = spark.createDataFrame(
        [(1, "U", 111), (9, "N", 900)], "k long, st string, v long"
    )
    got = {
        r.k: (r.st, r.v)
        for r in merge_full(
            target, source, ["k"], delete_on_missing=F.col("st") == "F"
        ).collect()
    }
    # 1 updated; 3 deleted (absent + 'F'); 2,4 survive (absent, not 'F');
    # 9 inserted
    assert got == {
        1: ("U", 111), 2: ("O", 200), 4: ("O", 400), 9: ("N", 900)
    }


def test_merge_full_unconditional_delete_is_full_sync(spark):
    from airflow_etl_spark.operators.merge import merge_full

    target = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    source = spark.createDataFrame([(2, 22), (3, 33)], "k long, v long")
    got = {
        r.k: r.v for r in merge_full(target, source, ["k"]).collect()
    }
    assert got == {2: 22, 3: 33}  # target becomes the source relation


def test_merge_full_null_keys_match_nullsafe(spark):
    from airflow_etl_spark.operators.merge import merge_full

    target = spark.createDataFrame([(None, 1), (5, 2)], "k long, v long")
    source = spark.createDataFrame([(None, 99)], "k long, v long")
    got = {
        (r.k, r.v)
        for r in merge_full(
            target, source, ["k"],
            delete_on_missing=F.lit(False),
        ).collect()
    }
    assert got == {(None, 99), (5, 2)}


def test_null_aware_anti_semantics_and_plan(spark, sf_dir):
    """NOT IN over a clean list = anti-join (count > 0); ONE NULL in the
    list makes every NOT IN comparison UNKNOWN -> count 0. Spark 4
    executes the null-aware variant as a null-aware BroadcastHashJoin
    LeftAnti (older engines fall back to a nested loop); either way
    both variants plan as anti-joins."""
    from airflow_etl_spark import queries as Q
    from airflow_etl_spark.plans import formatted_plan

    df = Q.queries()["j16_null_aware_anti"](spark, sf_dir)
    got = {r.variant: r.n for r in df.collect()}
    assert got["clean"] > 0
    assert got["with_null"] == 0
    plan = formatted_plan(df)
    assert plan.count("LeftAnti") >= 2
