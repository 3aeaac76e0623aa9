"""Version-pinned result cache (operators/resultcache.py): hits must
serve the stored relation without recomputing, any dependency commit
must invalidate, and a recompute must re-pin atomically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_etl_spark.operators import resultcache
from airflow_etl_spark.sources import txn


@pytest.fixture()
def paths(tmp_path):
    root = str(tmp_path / "rc_test")
    return root + "/base", root + "/cache"


def _agg(spark, base, calls):
    def compute():
        calls.append(1)
        return (
            txn.read(spark, base)
            .groupBy("k")
            .agg(F.sum("v").cast("long").alias("s"))
        )

    return compute


def test_hit_serves_without_recompute(spark, paths):
    base, cache = paths
    txn.commit(spark.createDataFrame([("a", 1), ("a", 2)], "k string, v long"), base)
    calls: list[int] = []
    r1, hit1 = resultcache.cached(spark, cache, [base], _agg(spark, base, calls))
    r2, hit2 = resultcache.cached(spark, cache, [base], _agg(spark, base, calls))
    assert (hit1, hit2) == (False, True)
    assert len(calls) == 1  # compute ran exactly once
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect())) == [("a", 3)]


def test_dependency_commit_invalidates(spark, paths):
    base, cache = paths
    txn.commit(spark.createDataFrame([("a", 1)], "k string, v long"), base)
    calls: list[int] = []
    resultcache.cached(spark, cache, [base], _agg(spark, base, calls))
    txn.append_files(spark.createDataFrame([("b", 5)], "k string, v long"), base)
    r, hit = resultcache.cached(spark, cache, [base], _agg(spark, base, calls))
    assert hit is False and len(calls) == 2
    assert sorted(map(tuple, r.collect())) == [("a", 1), ("b", 5)]
    # and the refreshed entry hits again
    _, hit3 = resultcache.cached(spark, cache, [base], _agg(spark, base, calls))
    assert hit3 is True and len(calls) == 2


def test_multi_dep_any_movement_invalidates(spark, paths):
    base, cache = paths
    other = base + "_other"
    txn.commit(spark.createDataFrame([("a", 1)], "k string, v long"), base)
    txn.commit(spark.createDataFrame([("x", 9)], "k string, v long"), other)
    calls: list[int] = []
    resultcache.cached(spark, cache, [base, other], _agg(spark, base, calls))
    txn.append_files(spark.createDataFrame([("y", 1)], "k string, v long"), other)
    _, hit = resultcache.cached(spark, cache, [base, other], _agg(spark, base, calls))
    assert hit is False and len(calls) == 2


def test_manual_invalidate_busts(spark, paths):
    base, cache = paths
    txn.commit(spark.createDataFrame([("a", 1)], "k string, v long"), base)
    calls: list[int] = []
    resultcache.cached(spark, cache, [base], _agg(spark, base, calls))
    resultcache.invalidate(cache)
    _, hit = resultcache.cached(spark, cache, [base], _agg(spark, base, calls))
    assert hit is False and len(calls) == 2


def test_unversioned_dep_raises(spark, paths):
    base, cache = paths
    with pytest.raises(FileNotFoundError, match="not versioned"):
        resultcache.cached(spark, cache, [base], lambda: None)
