"""Merkle-bucket reconciliation (operators/recon): correctness of the
row-level diff, bucket-pruning plan shape, and a randomized-mutation
property check — the operator must find EXACTLY the damage, every time.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from airflow_etl_spark.operators import recon
from airflow_etl_spark.plans import formatted_plan


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_identical_tables_diff_empty(spark):
    left = _mk(spark, [(i, f"val-{i}") for i in range(500)])
    assert recon.reconcile(left, left, ["k"]).count() == 0


def test_three_statuses_detected(spark):
    base = [(i, f"val-{i}") for i in range(300)]
    left = _mk(spark, base + [(900, "only-in-left")])
    right = _mk(
        spark,
        [(k, ("CHANGED" if k == 7 else v)) for k, v in base if k != 13]
        + [(901, "only-in-right")],
    )
    got = {
        (r.k, r.status)
        for r in recon.reconcile(left, right, ["k"]).collect()
    }
    assert got == {
        (900, recon.ONLY_LEFT),
        (13, recon.ONLY_LEFT),
        (901, recon.ONLY_RIGHT),
        (7, recon.CHANGED),
    }


def test_random_mutations_found_exactly(spark):
    """Property: for random damage (drops, corruptions, inserts) the diff
    is exactly the mutation set — across bucket counts, including
    n_buckets=1 (every bucket dirty) and large (most buckets clean)."""
    rng = random.Random(0xC0FFEE)
    base = {i: f"payload-{i}-{rng.randrange(10**9)}" for i in range(800)}
    dropped = set(rng.sample(sorted(base), 23))
    corrupted = set(rng.sample(sorted(set(base) - dropped), 17))
    inserted = {10_000 + i: f"extra-{i}" for i in range(11)}

    left = _mk(spark, sorted(base.items()))
    right_rows = {
        k: ("X" + v if k in corrupted else v)
        for k, v in base.items()
        if k not in dropped
    }
    right_rows.update(inserted)
    right = _mk(spark, sorted(right_rows.items()))

    expect = (
        {(k, recon.ONLY_LEFT) for k in dropped}
        | {(k, recon.CHANGED) for k in corrupted}
        | {(k, recon.ONLY_RIGHT) for k in inserted}
    )
    for n_buckets in (1, 16, 4096):
        got = {
            (r.k, r.status)
            for r in recon.reconcile(
                left, right, ["k"], n_buckets=n_buckets
            ).collect()
        }
        assert got == expect, f"n_buckets={n_buckets}"


def test_composite_keys(spark):
    left = spark.createDataFrame(
        [(1, "a", "v1"), (1, "b", "v2"), (2, "a", "v3")],
        "k1 long, k2 string, v string",
    )
    right = spark.createDataFrame(
        [(1, "a", "v1"), (1, "b", "EDIT"), (3, "c", "v9")],
        "k1 long, k2 string, v string",
    )
    got = {
        (r.k1, r.k2, r.status)
        for r in recon.reconcile(left, right, ["k1", "k2"]).collect()
    }
    assert got == {
        (1, "b", recon.CHANGED),
        (2, "a", recon.ONLY_LEFT),
        (3, "c", recon.ONLY_RIGHT),
    }


def test_summary_is_bucket_bounded(spark):
    """The Merkle level never exceeds n_buckets rows regardless of input
    size — the property that makes the summary join driver-trivial."""
    fps = recon.fingerprint_rows(
        _mk(spark, [(i, str(i)) for i in range(2000)]), ["k"], "v", 64
    )
    assert recon.bucket_summary(fps).count() <= 64


def test_plan_bucket_restriction_is_broadcast(spark, sf_dir):
    """The row-grain compare must be gated by a BROADCAST semi-join on
    the differing-bucket set (never a shuffled semi-join), and the
    Merkle level must be a map-side-combined aggregate."""
    from airflow_etl_spark import queries as Q

    plan = formatted_plan(Q.queries()["recon_bucket_diff"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "partial_count" in plan and "partial_sum" in plan
