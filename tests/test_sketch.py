"""Sketch-family tests (operators/sketch.py): HLL register bounds, merge
losslessness and accuracy; CMS one-sided error and mergeability; Bloom
no-false-negatives and bitset bounds. These are the invariants that make
the sketches safe substitutes for exact distinct/frequency/membership at
scale — if any fails, the estimate is not just inaccurate but wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_etl_spark.operators import sketch


@pytest.fixture()
def keyed(spark):
    # 4000 rows, 1000 distinct keys, skewed counts (key k appears 4x,
    # key 0 appears in every block), two groups.
    return spark.range(0, 4000).select(
        (F.col("id") % 1000).alias("k"),
        (F.col("id") % 2).alias("g"),
    )


# ------------------------------------------------------------------ HLL --
def test_hll_register_bounds(spark, keyed):
    regs = sketch.hll_registers(keyed, "k", ["g"]).collect()
    per_group = {}
    for r in regs:
        assert 0 <= r["idx"] < sketch.HLL_M
        assert 1 <= r["r"] <= sketch.HLL_W + 1
        per_group[r["g"]] = per_group.get(r["g"], 0) + 1
    for n in per_group.values():
        assert n <= sketch.HLL_M


def test_hll_merge_is_lossless(spark, keyed):
    """Estimate over merged half-sketches == estimate over the whole —
    the property that lets partitions/days pre-aggregate independently."""
    idd = spark.range(0, 4000).select(
        F.col("id"), (F.col("id") % 1000).alias("k"), (F.col("id") % 2).alias("g")
    )
    whole = {
        r["g"]: r["est"]
        for r in sketch.hll_distinct(idd, "k", ["g"]).collect()
    }
    ra = sketch.hll_registers(idd.filter("id < 1500"), "k", ["g"])
    rb = sketch.hll_registers(idd.filter("id >= 1500"), "k", ["g"])
    merged = {
        r["g"]: r["est"]
        for r in sketch.hll_estimate_from_registers(
            sketch.hll_merge(ra, rb, ["g"]), ["g"]
        ).collect()
    }
    assert merged == whole


def test_hll_accuracy_within_error_bounds(spark):
    """m=64 gives sigma ~ 1.04/8 = 13%; assert within 3 sigma for a
    known-cardinality input (deterministic hashing -> stable result)."""
    df = spark.range(0, 5000).select(F.col("id").alias("k"), F.lit(1).alias("g"))
    est = sketch.hll_distinct(df, "k", ["g"]).collect()[0]["est"]
    assert abs(est - 5000) / 5000 < 0.39


def test_hll_small_range_uses_linear_counting(spark):
    """A tiny key set must take the linear-counting branch (zeros > 0,
    raw <= 2.5m) and land very close to exact."""
    df = spark.range(0, 10).select(F.col("id").alias("k"), F.lit(1).alias("g"))
    row = sketch.hll_distinct(df, "k", ["g"]).collect()[0]
    assert row["zeros"] > 0
    assert abs(row["est"] - 10) <= 2


# ------------------------------------------------------------------ CMS --
def test_cms_never_underestimates(spark, keyed):
    """The CMS guarantee: est >= true count for EVERY key (one-sided
    error). Checked over all 1000 distinct keys."""
    sk = sketch.cms_sketch(keyed, "k")
    exact = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    est = sketch.cms_estimate(sk, exact.select("k"), "k")
    bad = est.join(exact, "k").filter(F.col("est") < F.col("n")).count()
    assert bad == 0


def test_cms_grid_bounded(spark, keyed):
    cells = sketch.cms_sketch(keyed, "k")
    assert cells.count() <= sketch.CMS_DEPTH * sketch.CMS_WIDTH
    total = cells.groupBy("depth").agg(F.sum("n").alias("t")).collect()
    # every depth row sees every input row exactly once
    assert all(r["t"] == 4000 for r in total)


def test_cms_merge_equals_whole(spark, keyed):
    idd = spark.range(0, 4000).select(F.col("id"), (F.col("id") % 1000).alias("k"))
    whole = sketch.cms_sketch(idd, "k")
    merged = sketch.cms_merge(
        sketch.cms_sketch(idd.filter("id < 2000"), "k"),
        sketch.cms_sketch(idd.filter("id >= 2000"), "k"),
    )
    diff = (
        whole.withColumnRenamed("n", "nw")
        .join(merged, ["depth", "idx"], "full_outer")
        .filter(
            F.coalesce(F.col("nw"), F.lit(-1)) != F.coalesce(F.col("n"), F.lit(-2))
        )
        .count()
    )
    assert diff == 0


# ---------------------------------------------------------------- Bloom --
def test_bloom_no_false_negatives(spark):
    build = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    bits = sketch.bloom_build(build, "k")
    probed = sketch.bloom_probe(build, bits, "k")
    assert probed.filter(~F.col("bloom_pass")).count() == 0


def test_bloom_bitset_bounded_and_fpr_sane(spark):
    build = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    bits = sketch.bloom_build(build, "k")
    row = bits.collect()[0]
    assert len(row["bits"]) <= sketch.BLOOM_BITS
    assert row["bits"] == sorted(set(row["bits"]))
    # non-members: FPR should be in the ballpark of the theoretical
    # (1 - e^{-kn/m})^k ~ 3.4% for n=500 -> allow <10%
    probe = spark.range(0, 2000).select((F.col("id") * 7 + 1).alias("k"))
    fp = sketch.bloom_probe(probe, bits, "k").filter(F.col("bloom_pass")).count()
    assert fp / 2000 < 0.10


def test_bloom_empty_build_rejects_everything(spark):
    build = spark.range(0, 0).select(F.col("id").alias("k"))
    bits = sketch.bloom_build(build, "k")
    # empty build side -> one row with an empty bits array (groupBy().agg
    # on empty input yields a single empty-set row)
    probe = spark.range(0, 50).select(F.col("id").alias("k"))
    out = sketch.bloom_probe(probe, bits, "k")
    assert out.filter(F.col("bloom_pass")).count() == 0


# ------------------------------------------------------------------ KMV --
def test_kmv_sketch_is_k_smallest_distinct(spark):
    from airflow_etl_spark.operators.dedup import h28

    df = spark.range(0, 3000).select(
        h28(F.concat(F.lit("kmvtest:"), F.col("id").cast("string"))).alias("h")
    )
    sk = sketch.kmv_sketch(df, "h").collect()
    vals = [r["h"] for r in sk]
    assert len(vals) == sketch.KMV_K
    assert vals == sorted(vals)
    exact = sorted(r["h"] for r in df.distinct().collect())[: sketch.KMV_K]
    assert vals == exact


def test_kmv_overlap_estimates_known_sets(spark):
    """A = 0..1999, B = 1000..2999 hashed: true |A|=|B|=2000,
    |A&B|=1000, |A|B|=3000, J=1/3. k=64 gives ~1/8 relative sigma on
    cardinalities; assert within loose 3-sigma bands and that the
    jaccard estimate brackets the truth sanely."""
    from airflow_etl_spark.operators.dedup import h28

    def hashed(lo, hi):
        return (
            spark.range(lo, hi)
            .select(
                h28(
                    F.concat(F.lit("kmvtest:"), F.col("id").cast("string"))
                ).alias("h")
            )
            .distinct()
        )

    row = sketch.kmv_overlap(
        sketch.kmv_sketch(hashed(0, 2000), "h"),
        sketch.kmv_sketch(hashed(1000, 3000), "h"),
    ).collect()[0]
    assert abs(row["est_a"] - 2000) / 2000 < 0.45
    assert abs(row["est_b"] - 2000) / 2000 < 0.45
    assert abs(row["est_union"] - 3000) / 3000 < 0.45
    assert 0.1 < row["est_jaccard"] < 0.6  # truth 0.333
    assert row["est_inter"] > 0


def test_kmv_identical_sets_give_jaccard_one(spark):
    from airflow_etl_spark.operators.dedup import h28

    df = spark.range(0, 1000).select(
        h28(F.concat(F.lit("kmvtest:"), F.col("id").cast("string"))).alias("h")
    )
    row = sketch.kmv_overlap(
        sketch.kmv_sketch(df, "h"), sketch.kmv_sketch(df, "h")
    ).collect()[0]
    assert row["est_jaccard"] == 1.0
    assert row["est_a"] == row["est_b"]


def test_kmv_disjoint_sets_give_zero_intersection(spark):
    from airflow_etl_spark.operators.dedup import h28

    def hashed(salt, n):
        return spark.range(0, n).select(
            h28(F.concat(F.lit(salt), F.col("id").cast("string"))).alias("h")
        )

    row = sketch.kmv_overlap(
        sketch.kmv_sketch(hashed("setA:", 1000), "h"),
        sketch.kmv_sketch(hashed("setB:", 1000), "h"),
    ).collect()[0]
    assert row["est_inter"] == 0.0
    assert row["est_jaccard"] == 0.0


# -------------------------------------------------------- streaming HLL --
def test_windowed_hll_registers_match_batch_by_day(spark, sf_dir):
    """The streaming register relation driven to completion must equal
    batch registers grouped by the same day window — registers are
    deterministic, so streaming-vs-batch is exact equality."""
    from airflow_etl_spark import streaming
    from airflow_etl_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    stream = streaming.read_events_stream(spark, sf_dir)
    done = streaming.run_to_completion(
        streaming.windowed_hll_registers(stream, "user_id"), "hll_regs_test"
    )
    batch = (
        ev.select(
            F.window("ts", "1 day").alias("w"), F.col("user_id")
        )
        .select(F.col("w.start").alias("window_start"), "user_id")
    )
    batch_regs = sketch.hll_registers(batch, "user_id", ["window_start"])
    diff = (
        done.withColumnRenamed("r", "r_s")
        .join(batch_regs, ["window_start", "idx"], "full_outer")
        .filter(
            F.coalesce(F.col("r_s"), F.lit(-1))
            != F.coalesce(F.col("r"), F.lit(-2))
        )
        .count()
    )
    assert diff == 0


# ------------------------------------------- histogram quantiles (s3) --
def test_hist_quantiles_close_to_exact(spark, sf_dir):
    """The fixed-grid estimate must land within one bin width (25) of
    the exact interpolated percentile at every probed q."""
    from airflow_etl_spark import queries as Q

    est = {
        r["q"]: r["est"]
        for r in Q.queries()["sketch_hist_quantiles"](spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    exact = ev.agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    ).collect()[0]
    assert abs(est[0.5] - exact["p50"]) <= 25.0
    assert abs(est[0.9] - exact["p90"]) <= 25.0
    assert abs(est[0.99] - exact["p99"]) <= 25.0


def test_column_profile_exact_counts(spark, sf_dir):
    """Exact columns of the profiler must agree with direct aggregates;
    the HLL column must sit within the m=64 error band."""
    from airflow_etl_spark import queries as Q

    prof = {
        r["col_name"]: r
        for r in Q.queries()["diag_column_profile"](spark, sf_dir).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = o.count()
    nd = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    row = prof["o_custkey"]
    assert row["n_rows"] == n
    assert row["n_distinct"] == nd
    assert abs(row["hll_err_pct"]) < 45.0  # 3-sigma band for m=64


# ------------------------------------------------ CMS join size (r7) --
def test_cms_join_size_never_underestimates(spark):
    """The inner-product estimate is one-sided: hash collisions only ADD
    cross terms, so est >= exact for any key distribution — including a
    skewed one where a single hot key dominates both sides."""
    import random

    rng = random.Random(7)
    a_keys = [rng.choice(["hot"] * 20 + [f"k{i}" for i in range(50)]) for _ in range(500)]
    b_keys = [rng.choice(["hot"] * 10 + [f"k{i}" for i in range(80)]) for _ in range(400)]
    a = spark.createDataFrame([(k,) for k in a_keys], "k string")
    b = spark.createDataFrame([(k,) for k in b_keys], "k string")
    est = sketch.cms_join_size(
        sketch.cms_sketch(a, "k"), sketch.cms_sketch(b, "k")
    ).collect()[0]["est_join_rows"]
    exact = a.join(b, "k").count()
    assert est >= exact
    assert est <= exact + 4 * (500 * 400) // 256  # collision cross-term bound


def test_cms_join_size_exact_when_collision_free(spark):
    """With fewer keys than cells and no collisions across depths' min,
    the estimate equals the true join size."""
    a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "k string")
    b = spark.createDataFrame([("x",)] * 5 + [("z",)] * 4, "k string")
    est = sketch.cms_join_size(
        sketch.cms_sketch(a, "k"), sketch.cms_sketch(b, "k")
    ).collect()[0]["est_join_rows"]
    assert est == 15  # 3*5 for x; y and z never align in any depth... unless
    # a residual collision bumps it -- accept equality only: 2 keys in 256
    # cells across 4 depths collide with probability ~(2/256)^4 ~ 4e-9


def test_rolling_hll_merge_equals_raw_week_estimate(spark, sf_dir):
    """Losslessness of register merge under the rolling frame: the
    7-day merged registers must estimate EXACTLY what a direct HLL over
    the raw trailing week estimates, day by day."""
    from pyspark.sql import functions as F

    from airflow_etl_spark import catalog, queries as Q
    from airflow_etl_spark.operators import sketch

    ev = (
        catalog.load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id")
    )
    rolled = {
        r.day: (r.v_used, r.zeros, r.est)
        for r in Q.queries()["w13_rolling_hll_distinct"](
            spark, sf_dir
        ).collect()
    }
    days = [r.d for r in ev.select("d").distinct().collect()]
    import datetime as dt

    for day in sorted(days)[:5]:  # spot-check a prefix; each is a job
        week = ev.filter(
            (F.col("d") >= day - dt.timedelta(days=6)) & (F.col("d") <= day)
        )
        direct = sketch.hll_distinct(week, "user_id", []).collect()[0]
        key = day.strftime("%Y-%m-%d")
        assert rolled[key] == (direct.v_used, direct.zeros, direct.est), key


def test_ann_recall_bounds_and_self_recall(spark, sf_dir):
    """recall(exact vs exact) == 1e6 for every query; the IVF recall is
    within [0, 1e6] and the registry query reports one row per query."""
    from pyspark.sql import functions as F

    from airflow_etl_spark import catalog, queries as Q
    from airflow_etl_spark.operators import similarity

    rows = Q.queries()["sim_ann_recall_eval"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(0 <= r.recall_ppm <= 1_000_000 for r in rows)

    emb = catalog.load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(qs, emb, k=5).select(
        "query_id", "neighbor_id"
    )
    self_hits = (
        exact.alias("e")
        .join(exact.alias("a"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .count()
    )
    assert all(r["count"] == 5 for r in self_hits.collect())


# ------------------------------------------------------- KMV difference --
def test_kmv_difference_identical_sets_estimate_zero(spark):
    a = spark.range(0, 500).select((F.col("id") * 7919 % (1 << 28)).alias("h"))
    sk = sketch.kmv_sketch(a, "h")
    row = sketch.kmv_difference(sk, sk).collect()[0]
    assert row["est_a_minus_b"] == 0.0 and row["est_b_minus_a"] == 0.0


def test_kmv_difference_subset_one_sided(spark):
    # B = A plus extra keys: est |A\B| must be exactly 0 (every A-side
    # survivor is in B's survivor set when B ⊇ A under the same theta),
    # est |B\A| must be positive and within sketch error of the truth
    base = spark.range(0, 2000).select(
        (F.col("id") * 2654435761 % (1 << 28)).alias("h")
    )
    extra = spark.range(2000, 3000).select(
        (F.col("id") * 2654435761 % (1 << 28)).alias("h")
    )
    a = base
    b = base.unionByName(extra)
    row = sketch.kmv_difference(
        sketch.kmv_sketch(a, "h"), sketch.kmv_sketch(b, "h")
    ).collect()[0]
    assert row["est_a_minus_b"] == 0.0
    true_diff = b.join(a, "h", "left_anti").count()
    assert true_diff > 0
    # theta sketches at k=64 have ~1/sqrt(64) relative error; allow 3x
    assert abs(row["est_b_minus_a"] - true_diff) <= 3 * true_diff / 8 + 64


def test_kmv_difference_unsaturated_sketches_are_exact(spark):
    """ADVICE r8: sketches holding fewer than k values are in EXACT mode —
    theta is the full hash range, so the difference estimates equal the
    true set differences exactly (not a set-max-biased estimate)."""
    a = spark.range(0, 30).select((F.col("id") * 7919 % (1 << 28)).alias("h"))
    b = spark.range(20, 50).select(
        (F.col("id") * 7919 % (1 << 28)).alias("h")
    )
    row = sketch.kmv_difference(
        sketch.kmv_sketch(a, "h"), sketch.kmv_sketch(b, "h")
    ).collect()[0]
    assert row["est_a_minus_b"] == 20.0
    assert row["est_b_minus_a"] == 20.0


def test_kmv_difference_empty_sketch_yields_zero_not_null(spark):
    """ADVICE r8: an empty sketch (max(h) NULL) must produce 0 estimates,
    never NULL."""
    a = spark.range(0, 50).select((F.col("id") * 7919 % (1 << 28)).alias("h"))
    empty = spark.range(0, 0).select(F.col("id").alias("h"))
    row = sketch.kmv_difference(
        sketch.kmv_sketch(a, "h"), sketch.kmv_sketch(empty, "h")
    ).collect()[0]
    assert row["est_a_minus_b"] == 50.0  # exact: both sides unsaturated
    assert row["est_b_minus_a"] == 0.0


def test_kmv_overlap_unsaturated_side_estimates_exact_count(spark):
    """Exact mode extends to kmv_overlap: an unsaturated side's
    cardinality estimate is its exact distinct count, and empty/empty
    Jaccard is 0, never a division error."""
    a = spark.range(0, 40).select((F.col("id") * 7919 % (1 << 28)).alias("h"))
    b = spark.range(0, 40).select((F.col("id") * 7919 % (1 << 28)).alias("h"))
    row = sketch.kmv_overlap(
        sketch.kmv_sketch(a, "h"), sketch.kmv_sketch(b, "h")
    ).collect()[0]
    assert row["est_a"] == 40.0 and row["est_b"] == 40.0
    assert row["est_union"] == 40.0 and row["est_inter"] == 40.0
    assert row["est_jaccard"] == 1.0
    empty = spark.range(0, 0).select(F.col("id").alias("h"))
    row2 = sketch.kmv_overlap(
        sketch.kmv_sketch(empty, "h"), sketch.kmv_sketch(empty, "h")
    ).collect()[0]
    assert row2["est_jaccard"] == 0.0 and row2["est_union"] == 0.0
