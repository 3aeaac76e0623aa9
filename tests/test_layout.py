"""Data-layout tests: Z-order clustering (multi-dimension file pruning)
and incremental small-file compaction (rewrite_small_files)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_etl_spark.operators import maintenance
from airflow_etl_spark.sources import txn


def _grid(spark, n=64):
    """n×n grid of (x, y) points — two independent uniform dimensions."""
    return (
        spark.range(0, n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    path = str(tmp_path / "z")
    df = _grid(spark)
    txn.commit(df, path, zorder_by=["x", "y"], cluster_partitions=16)
    n_files = len(txn.live_manifest(path)["files"])
    assert n_files > 4

    # a narrow range on EITHER dimension prunes files
    for col in ("x", "y"):
        pruned = txn.pruned_files(path, col, 10, 13)
        assert 0 < len(pruned) < n_files, f"no pruning on {col}"
        got = txn.read_range(spark, path, col, 10, 13).collect()
        want = (
            txn.read(spark, path)
            .filter(F.col(col).between(10, 13))
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_cluster_by_leading_column_only_baseline(spark, tmp_path):
    """The comparison zorder exists to beat: cluster_by(x, y) prunes x but
    NOT y (y values interleave across every file)."""
    path = str(tmp_path / "c")
    txn.commit(_grid(spark), path, cluster_by=["x", "y"], cluster_partitions=16)
    n_files = len(txn.live_manifest(path)["files"])
    assert len(txn.pruned_files(path, "x", 10, 13)) < n_files
    assert len(txn.pruned_files(path, "y", 10, 13)) == n_files


def test_zorder_rejects_bad_args(spark, tmp_path):
    df = _grid(spark)
    with pytest.raises(ValueError, match="exclusive"):
        txn.commit(df, str(tmp_path / "a"), cluster_by="x", zorder_by=["x", "y"])
    with pytest.raises(ValueError, match="2-3"):
        txn.commit(df, str(tmp_path / "b"), zorder_by=["x"])


def test_zorder_constant_dimension_is_safe(spark, tmp_path):
    path = str(tmp_path / "k")
    df = spark.range(0, 100).select(
        F.lit(7).alias("x"), F.col("id").alias("y")
    )
    txn.commit(df, path, zorder_by=["x", "y"])
    assert txn.read(spark, path).count() == 100


# ------------------------------------------------- rewrite_small_files ----
def _append_rows(path, lo, hi):
    import pyarrow as pa

    txn.append_rows(
        path, pa.table({"k": list(range(lo, hi)), "v": [1.0] * (hi - lo)})
    )


def test_rewrite_small_files_merges_only_smalls(spark, tmp_path):
    path = str(tmp_path / "t")
    # one properly-sized base file + many tiny appended files
    base = spark.range(0, 200_000).select(
        F.col("id").alias("k"), F.lit(0.5).alias("v")
    )
    txn.commit(base.coalesce(1), path)
    for i in range(6):
        _append_rows(path, 1_000_000 + i * 10, 1_000_000 + i * 10 + 10)
    m = txn.live_manifest(path)
    big_paths = {e["path"] for e in m["files"] if e["bytes"] > 100_000}
    assert len(m["files"]) == 7 and len(big_paths) == 1

    removed = maintenance.rewrite_small_files(
        spark, path, target_file_bytes=10 * 1024 * 1024, small_threshold=100_000
    )
    assert removed == 5  # 6 tiny files -> 1
    m2 = txn.live_manifest(path)
    assert len(m2["files"]) == 2
    # the big file was NOT rewritten — identical manifest entry
    assert big_paths <= {e["path"] for e in m2["files"]}
    assert txn.read(spark, path).count() == 200_060
    # second run is a no-op
    assert (
        maintenance.rewrite_small_files(
            spark, path, target_file_bytes=10 * 1024 * 1024,
            small_threshold=100_000,
        )
        == 0
    )


def test_rewrite_small_files_partitioned_preserves_layout(spark, tmp_path):
    path = str(tmp_path / "p")
    df = spark.range(0, 1000).select(
        (F.col("id") % 4).cast("string").alias("b"), F.col("id").alias("k")
    )
    # 3 loads -> 3 small files per partition
    for _ in range(3):
        txn.replace_partitions(
            df if _ == 0 else txn.read(spark, path).withColumn(
                "b", (F.col("k") % 4).cast("string")
            ),
            path,
            "b",
        )
    removed = maintenance.rewrite_small_files(
        spark, path, target_file_bytes=50 * 1024 * 1024
    )
    m = txn.live_manifest(path)
    assert m["partition_by"] == "b"
    assert sorted({e["partition"] for e in m["files"]}) == ["0", "1", "2", "3"]
    assert txn.read(spark, path).count() == 1000
    assert removed >= 0  # layout intact whether or not files merged
    # per-partition reads still work off the manifest
    assert txn.read_partitions(spark, path, ["2"]).count() == 250


def test_compact_restores_declared_zorder_layout(spark, tmp_path):
    path = str(tmp_path / "zr")
    txn.commit(_grid(spark), path, zorder_by=["x", "y"], cluster_partitions=16)
    # unsorted appends degrade the clustering
    extra = (
        spark.range(0, 256)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 4).cast("long").alias("y"),
            (F.col("id") + 10_000).alias("payload"),
        )
    )
    txn.append_files(extra, path)
    assert txn.live_manifest(path)["sort_order"] == {
        "kind": "zorder",
        "cols": ["x", "y"],
    }
    maintenance.compact(spark, path, target_file_bytes=4 * 1024)
    m = txn.live_manifest(path)
    assert m["sort_order"]["kind"] == "zorder"
    n_files = len(m["files"])
    assert n_files > 4
    # pruning works on BOTH dimensions again after compaction
    for col in ("x", "y"):
        assert 0 < len(txn.pruned_files(path, col, 10, 13)) < n_files
    assert txn.read(spark, path).count() == 64 * 64 + 256


def test_rewrite_preserves_blooms_and_recomputes_for_merged(spark, tmp_path):
    path = str(tmp_path / "bl")
    # low-cardinality key: the merged file's bloom stays under the
    # saturation cutoff and must be recomputed, not dropped
    base = spark.range(0, 5000).select((F.col("id") % 50).alias("k"))
    txn.commit(base.repartition(6, "k"), path, bloom_cols=["k"])
    removed = maintenance.rewrite_small_files(
        spark, path, target_file_bytes=50 * 1024 * 1024
    )
    assert removed > 0
    m = txn.live_manifest(path)
    assert all("bloom" in e and "k" in e["bloom"] for e in m["files"])
    assert txn.read_point(spark, path, "k", 43).count() == 100


# ---------------------------------------------------- partition evolution -
def test_repartition_table_spec_change(spark, tmp_path):
    path = str(tmp_path / "pe")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("region"),
    )
    txn.commit(df, path)
    assert txn.live_partition_by(path) is None

    # evolve: unpartitioned -> partitioned by region (kept as data column)
    txn.repartition_table(spark, path, "region")
    assert txn.live_partition_by(path) == "region"
    assert txn.read_partitions(spark, path, ["2"]).count() == 250
    assert "region" in txn.read(spark, path).columns
    # COW loads now work against the evolved layout
    delta = spark.range(0, 10).select(
        (F.col("id") + 5000).alias("k"), F.lit("2").alias("region")
    )
    txn.replace_partitions(delta, path, "region")
    assert txn.read_partitions(spark, path, ["2"]).count() == 10
    assert txn.read(spark, path).count() == 750 + 10

    # time travel across the spec change reads the OLD spec's snapshot
    assert txn.read_version(spark, path, 1).count() == 1000

    # evolve back to unpartitioned
    txn.repartition_table(spark, path, None)
    assert txn.live_partition_by(path) is None
    assert txn.read(spark, path).count() == 760


def test_repartition_table_folds_pending_deletes(spark, tmp_path):
    path = str(tmp_path / "ped")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    )
    txn.commit(df, path)
    txn.delete_keys(spark.range(0, 10).select(F.col("id").alias("k")), path)
    txn.repartition_table(spark, path, "p")
    m = txn.live_manifest(path)
    assert not m.get("deletes")
    assert txn.read(spark, path).count() == 90


def test_repartition_table_rejects_unknown_column(spark, tmp_path):
    path = str(tmp_path / "bad")
    txn.commit(spark.range(5).select(F.col("id").alias("k")), path)
    with pytest.raises(ValueError, match="not a data column"):
        txn.repartition_table(spark, path, "nope")


def test_bloom_point_skip_beats_stats_on_unsorted(spark, tmp_path):
    """Hash-scattered keys: every file spans the key range (stats prune
    nothing) but blooms prune to the files actually holding the key."""
    from pyspark.sql import functions as F

    from airflow_etl_spark.sources import txn

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    ).repartition(8)
    p = str(tmp_path / "bloomed")
    txn.commit(df, p, bloom_cols=["k"])
    total = txn.data_files(p)
    key = 501  # mid-range: inside every file's [min, max]
    stats_only = txn.pruned_files(p, "k", key, key)
    bloomed = txn.pruned_files_point(p, "k", key)
    assert len(stats_only) == len(total)          # stats are blind here
    assert len(bloomed) < len(total)              # blooms are not
    got = txn.read_point(spark, p, "k", key).collect()
    assert [(r.k, r.v) for r in got] == [(501, 501 * 7)]


def test_bloom_saturation_guard_never_lies(spark, tmp_path):
    """Past the 0.6m set-bit guard no bloom is stored — lookups degrade
    to scans but NEVER exclude a file that holds the key."""
    from pyspark.sql import functions as F

    from airflow_etl_spark.sources import txn

    # 50k keys in 2 files -> hopelessly saturated blooms -> none stored
    df = spark.range(50_000).select(F.col("id").alias("k")).repartition(2)
    p = str(tmp_path / "saturated")
    txn.commit(df, p, bloom_cols=["k"])
    assert len(txn.pruned_files_point(p, "k", 123)) == len(
        txn.data_files(p)
    )
    assert txn.read_point(spark, p, "k", 123).count() == 1
