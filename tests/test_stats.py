"""Exact-moment statistics (operators/stats): closed-form OLS and
pairwise correlation — algebraic identities, degenerate-input NULLs,
agreement with an independent float reference, and the one-pass plan
shape for the correlation matrix."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from airflow_etl_spark.operators.stats import PPM, corr_pairs, group_ols
from airflow_etl_spark.plans import formatted_plan


def _ols_rows(spark, rows):
    df = spark.createDataFrame(rows, "g string, x long, y long")
    return {r.g: r for r in group_ols(df, ["g"], "x", "y").collect()}


def test_ols_perfect_line_is_exact(spark):
    rows = [("a", x, 3 * x + 7) for x in range(50)]
    r = _ols_rows(spark, rows)["a"]
    assert r.slope_ppm == 3 * PPM
    assert r.intercept_ppm == 7 * PPM
    assert r.r2_ppm == PPM
    assert r.n == 50


def test_ols_negative_slope(spark):
    rows = [("d", x, 1000 - 2 * x) for x in range(40)]
    r = _ols_rows(spark, rows)["d"]
    assert r.slope_ppm == -2 * PPM
    assert r.r2_ppm == PPM


def test_ols_constant_x_yields_null(spark):
    rows = [("c", 5, y) for y in (1, 2, 3)]
    r = _ols_rows(spark, rows)["c"]
    assert r.slope_ppm is None and r.intercept_ppm is None


def test_ols_matches_independent_float_reference(spark):
    rng = random.Random(42)
    rows = [
        ("r", x, 40 * x + rng.randrange(-5000, 5000)) for x in range(300)
    ]
    r = _ols_rows(spark, rows)["r"]
    n = len(rows)
    sx = sum(x for _, x, _ in rows)
    sy = sum(y for _, _, y in rows)
    sxy = sum(x * y for _, x, y in rows)
    sxx = sum(x * x for _, x, _ in rows)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    expect = math.floor(float(num) / float(den) * PPM)
    assert r.slope_ppm == expect


def test_corr_bounds_and_symmetric_cases(spark):
    rng = random.Random(7)
    rows = [
        (x, 2 * x + 1, -3 * x + 10, rng.randrange(1000))
        for x in range(200)
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    got = {
        (r.col_x, r.col_y): r.corr_ppm
        for r in corr_pairs(df, ["a", "b", "c", "d"]).collect()
    }
    assert len(got) == 6
    assert got[("a", "b")] == PPM        # perfect positive
    assert got[("a", "c")] == -PPM       # perfect negative
    assert got[("b", "c")] == -PPM       # linear of linear
    for v in got.values():
        assert -PPM <= v <= PPM


def test_corr_constant_column_is_null(spark):
    df = spark.createDataFrame(
        [(x, 9) for x in range(10)], "a long, k long"
    )
    got = corr_pairs(df, ["a", "k"]).collect()
    assert got[0].corr_ppm is None


def test_corr_matrix_is_one_pass(spark, sf_dir):
    """The whole matrix must come from ONE scan + ONE aggregation — a
    per-pair plan would scan k(k-1)/2 times."""
    from airflow_etl_spark import queries as Q

    import re

    plan = formatted_plan(Q.queries()["diag_corr_matrix"](spark, sf_dir))
    # each scan appears once as a detail header "(N) Scan parquet"
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "partial_sum" in plan  # map-side combined


def test_trend_slope_is_map_side_combined(spark, sf_dir):
    from airflow_etl_spark import queries as Q

    import re

    plan = formatted_plan(Q.queries()["diag_trend_slope"](spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "partial_sum" in plan and "partial_count" in plan


# -- leave-one-out target encoding -------------------------------------------


def test_target_encode_loo_exact_vs_bruteforce(spark):
    from airflow_etl_spark.operators.stats import target_encode_loo

    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 31), ("b", 4, 7),
            ("b", 5, 9), ("c", 6, 100)]
    df = spark.createDataFrame(rows, "cat string, id long, y long")
    got = {
        r.id: r.loo
        for r in target_encode_loo(df, ["cat"], "y", "loo").collect()
    }
    # brute force: floor(mean of others)
    import math

    by_cat = {}
    for cat, i, y in rows:
        by_cat.setdefault(cat, []).append((i, y))
    for cat, members in by_cat.items():
        for i, y in members:
            others = [v for j, v in members if j != i]
            expect = (
                math.floor(sum(others) / len(others)) if others else None
            )
            assert got[i] == expect, (cat, i)


def test_target_encode_singleton_is_null_not_imputed(spark):
    from airflow_etl_spark.operators.stats import target_encode_loo

    df = spark.createDataFrame(
        [("solo", 1, 42), ("pair", 2, 1), ("pair", 3, 3)],
        "cat string, id long, y long",
    )
    got = {
        r.id: r.loo
        for r in target_encode_loo(df, ["cat"], "y", "loo").collect()
    }
    assert got == {1: None, 2: 3, 3: 1}


def test_target_encode_no_window_over_fact(spark, sf_dir):
    """Plan shape: aggregate + join back, never a Window sort over the
    fact table (which would sort the corpus inside each category)."""
    from airflow_etl_spark import queries as Q
    from airflow_etl_spark.plans import formatted_plan

    plan = formatted_plan(Q.queries()["feat_target_encode"](spark, sf_dir))
    assert "Window" not in plan
    assert "partial_sum" in plan


# -- WOE binning --------------------------------------------------------------


def test_woe_bins_exact_vs_bruteforce(spark):
    from airflow_etl_spark.operators.stats import PPM, woe_bins

    import random

    rng = random.Random(11)
    rows = [(v, 1 if rng.random() < v / 1000 else 0)
            for v in (rng.randrange(1000) for _ in range(2000))]
    df = spark.createDataFrame(rows, "v long, y int")
    got = {r.bin: r for r in woe_bins(df, "v", "y", n_bins=8).collect()}

    mn = min(v for v, _ in rows)
    mx = max(v for v, _ in rows)
    width = mx - mn + 1
    bins = {}
    for v, y in rows:
        b = (v - mn) * 8 // width
        n, p = bins.get(b, (0, 0))
        bins[b] = (n + 1, p + y)
    tp = sum(p for _, p in bins.values())
    tn = sum(n - p for n, p in bins.values())
    assert set(got) == set(bins)
    for b, (n, p) in bins.items():
        assert (got[b].n, got[b].n_pos) == (n, p)
        assert got[b].lo_v == mn + b * width // 8
        if p > 0 and n - p > 0:
            assert got[b].odds_ppm == p * tn * PPM // ((n - p) * tp)
        else:
            assert got[b].odds_ppm is None


def test_woe_bins_null_on_pure_bins(spark):
    from airflow_etl_spark.operators.stats import woe_bins

    # values 0..9 all positive, 90..99 all negative -> pure bins NULL
    rows = [(v, 1) for v in range(10)] + [(v, 0) for v in range(90, 100)]
    df = spark.createDataFrame(rows, "v long, y int")
    got = {r.bin: r.odds_ppm for r in woe_bins(df, "v", "y", 10).collect()}
    assert all(v is None for v in got.values())


# -- Gini concentration -------------------------------------------------------


def test_gini_extremes_via_query_machinery(spark):
    """Uniform spend -> G ~= (n-1)/... ~ 0; one-customer-takes-all ->
    G -> 1 - 1/n. Validates the exact ppm formula on crafted inputs."""
    from pyspark.sql import Window, functions as F

    def gini(rows):
        df = spark.createDataFrame(rows, "seg string, k long, spend long")
        w = Window.partitionBy("seg").orderBy("spend", "k")
        ranked = df.withColumn("i", F.row_number().over(w).cast("long"))
        s = ranked.groupBy("seg").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("spend").cast("long").alias("total"),
            F.sum(F.col("i") * F.col("spend")).cast("long").alias("weighted"),
        )
        a = F.expr("2 * CAST(weighted AS DECIMAL(38,0)) * 1000000")
        b = F.expr("CAST(n * total AS DECIMAL(38,0))")
        t1 = ((a - F.pmod(a, b)) / b).cast("long")
        t2 = F.expr("((n + 1) * 1000000) DIV n").cast("long")
        return s.select((t1 - t2).alias("g")).collect()[0].g

    n = 100
    uniform = [("u", k, 1000) for k in range(n)]
    assert abs(gini(uniform)) < 10_001  # ~0 (quantization only)
    concentrated = [("c", k, 1) for k in range(n - 1)] + [("c", n, 10**9)]
    assert gini(concentrated) > 980_000  # -> 1 - 1/n


# -- RFM / length buckets ------------------------------------------------------


def test_rfm_scores_cover_all_quintiles_and_code(spark, sf_dir):
    from airflow_etl_spark import queries as Q

    rows = Q.queries()["feat_rfm_scores"](spark, sf_dir).collect()
    for axis in ("r", "f", "m"):
        vals = {getattr(r, axis) for r in rows}
        assert vals == {1, 2, 3, 4, 5}, axis
    assert all(r.rfm == r.r * 100 + r.f * 10 + r.m for r in rows)
    # quintiles are balanced within 1 (ntile contract)
    from collections import Counter

    c = Counter(r.r for r in rows)
    assert max(c.values()) - min(c.values()) <= 1


def test_length_buckets_are_powers_of_two_and_conserve(spark, sf_dir):
    from airflow_etl_spark import catalog, queries as Q

    rows = Q.queries()["corpus_length_buckets"](spark, sf_dir).collect()
    n_docs_total = sum(r.n_docs for r in rows)
    assert n_docs_total == catalog.load_table(
        spark, sf_dir, "documents"
    ).count()
    for r in rows:
        assert r.bucket_hi & (r.bucket_hi - 1) == 0  # power of two
        assert 0 <= r.waste_ppm < 500_000  # never waste >= half (pow2)
        assert r.sum_tokens <= r.padded_tokens


def test_benford_expectations_sum_to_one_and_match_log(spark):
    import math

    from airflow_etl_spark.queries import _BENFORD_PPM

    assert sum(_BENFORD_PPM.values()) in (999994, 999995)  # floor residue
    for d, p in _BENFORD_PPM.items():
        assert p == math.floor(math.log10(1 + 1 / d) * 1_000_000)


def test_hash_sampled_agg_error_is_sane(spark, sf_dir):
    """The 10% deterministic sample estimates within a few percent on
    balanced groups, and the error column reports it honestly."""
    from airflow_etl_spark import queries as Q

    rows = Q.queries()["a10_hash_sampled_agg"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.err_ppm == abs(r.sum_est - r.sum_exact) * 1_000_000 // r.sum_exact
        # ~30-row samples at sf0.001: 1/sqrt(30) ~ 18% noise — the bound
        # checks honesty, not precision
        assert r.err_ppm < 400_000
