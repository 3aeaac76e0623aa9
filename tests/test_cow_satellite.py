import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import functions as F


def test_cow_satellite_matches_default(spark, tmp_path, sf_dir):
    """Bucketed COW satellites must hold exactly the default path's rows
    (modulo the __bucket partition column), across initial load + an
    identical-snapshot re-load (which must rewrite NOTHING)."""
    import os

    from airflow_etl_spark.pipeline import EntityConfig, Pipeline, SourceConfig
    from airflow_etl_spark.sources import read_table

    src = lambda: SourceConfig(  # noqa: E731
        name="erp_c", tables=["customer"],
        entities=[EntityConfig("customer", "customer", ["c_custkey"],
                               ["c_name", "c_mktsegment"])],
    )
    # satellite_buckets=0 pins the reference-shaped full-rewrite path so
    # the parity target is genuinely the non-COW load (COW became the
    # DEFAULT in round 3)
    p_def = Pipeline(spark, str(tmp_path / "wh_def"), [src()], sf_dir,
                     satellite_buckets=0)
    p_cow = Pipeline(spark, str(tmp_path / "wh_cow"), [src()], sf_dir,
                     satellite_buckets=8)
    for p in (p_def, p_cow):
        p.ledger.seed_dates([("2024-01-01", 0, None, 0), ("2024-01-02", 0, None, 0)])
        p.run("2024-01-01")

    sat_def = read_table(spark, str(tmp_path / "wh_def/raw_vault/satellite_customer"))
    sat_cow = read_table(spark, str(tmp_path / "wh_cow/raw_vault/satellite_customer")).drop("__bucket")
    cols = sorted(sat_def.columns)
    rows_def = sorted(map(str, sat_def.select(*cols).collect()))
    rows_cow = sorted(map(str, sat_cow.select(*cols).collect()))
    assert rows_def == rows_cow

    # day 2: identical snapshot → COW path must rewrite zero partitions
    cow_path = str(tmp_path / "wh_cow/raw_vault/satellite_customer")
    before = {}
    for root, _dirs, files in os.walk(cow_path):
        for f in files:
            fp = os.path.join(root, f)
            before[fp] = os.path.getmtime(fp)
    p_cow.run("2024-01-02")
    after = {}
    for root, _dirs, files in os.walk(cow_path):
        for f in files:
            fp = os.path.join(root, f)
            after[fp] = os.path.getmtime(fp)
    assert before == after  # untouched: same files, same mtimes

    # default path day 2 for the comparison target
    p_def.run("2024-01-02")
    sat_def2 = read_table(spark, str(tmp_path / "wh_def/raw_vault/satellite_customer"))
    sat_cow2 = read_table(spark, cow_path).drop("__bucket")
    assert sorted(map(str, sat_def2.select(*cols).collect())) == \
           sorted(map(str, sat_cow2.select(*cols).collect()))


def test_cow_rewrites_only_changed_buckets(spark, tmp_path):
    """A day that changes 2 keys rewrites ONLY the partitions holding
    those keys' buckets — the O(changed buckets) write guarantee."""
    import os

    from airflow_etl_spark.functions import dv_hash_key
    from airflow_etl_spark.pipeline import EntityConfig, Pipeline, SourceConfig
    from airflow_etl_spark.sources import read_table

    ent = EntityConfig("thing", "things", ["k"], ["v"])
    p = Pipeline(
        spark, str(tmp_path / "whb"),
        [SourceConfig(name="s", tables=["things"], entities=[ent])],
        sf_dir=str(tmp_path), satellite_buckets=8,
    )
    day1 = spark.createDataFrame([(i, f"v{i}") for i in range(200)], "k long, v string")
    p._load_satellite_cow("satellite_thing", day1, ent, "2024-01-01", "s")
    path = str(tmp_path / "whb/raw_vault/satellite_thing")

    def snapshot_files():
        out = {}
        for root, _d, files in os.walk(path):
            for f in files:
                fp = os.path.join(root, f)
                out[fp] = os.path.getmtime(fp)
        return out

    before = snapshot_files()
    # day 2: keys 7 and 42 change, everything else identical
    day2 = spark.createDataFrame(
        [(i, "CHANGED" if i in (7, 42) else f"v{i}") for i in range(200)],
        "k long, v string",
    )
    p._load_satellite_cow("satellite_thing", day2, ent, "2024-01-02", "s")
    after = snapshot_files()

    changed_buckets = {
        r.b for r in spark.createDataFrame([(7,), (42,)], "k long")
        .select(F.pmod(F.hash(dv_hash_key("k")), F.lit(8)).alias("b")).collect()
    }
    touched_dirs = set()
    for fp in set(before) ^ set(after) | {
        fp for fp in before if fp in after and before[fp] != after[fp]
    }:
        part = [seg for seg in fp.split(os.sep) if seg.startswith("__bucket=")]
        if part:
            touched_dirs.add(int(part[0].split("=")[1]))
    assert touched_dirs == changed_buckets  # exactly the changed buckets

    # and the data is right: both changed keys re-versioned, one open row
    # each (satellites key on the hash key, not the business key)
    keymap = {
        r.k: r.h
        for r in spark.createDataFrame([(7,), (42,), (100,)], "k long")
        .select("k", dv_hash_key("k").alias("h")).collect()
    }
    sat = read_table(spark, path)
    for k in (7, 42):
        rows = sorted(
            (r.load_date, r.load_end_date, r.v)
            for r in sat.filter(F.col("thing_hash_key") == keymap[k]).collect()
        )
        assert rows == [
            ("2024-01-01", "2024-01-02", f"v{k}"),
            ("2024-01-02", None, "CHANGED"),
        ]
    # unchanged key: still exactly one (open) row
    assert sat.filter(F.col("thing_hash_key") == keymap[100]).count() == 1


def test_default_pipeline_uses_cow_satellites(spark, tmp_path, sf_dir):
    """VERDICT r2 next-round #3: COW is the DEFAULT satellite layout — a
    Pipeline built with no bucket argument produces a manifest-partitioned
    satellite whose loads swap partitions, never rewrite the table."""
    from airflow_etl_spark.pipeline import EntityConfig, Pipeline, SourceConfig
    from airflow_etl_spark.sources import txn

    src = SourceConfig(
        name="erp_def", tables=["customer"],
        entities=[EntityConfig("customer", "customer", ["c_custkey"],
                               ["c_name", "c_mktsegment"])],
    )
    p = Pipeline(spark, str(tmp_path / "wh"), [src], sf_dir)
    assert p.satellite_buckets > 0
    p.ledger.seed_dates([("2024-01-01", 0, None, 0)])
    p.run("2024-01-01")
    sat_path = str(tmp_path / "wh/raw_vault/satellite_customer")
    m = txn.live_manifest(sat_path)
    assert m is not None and m["partition_by"] == "__bucket"
    assert len({e["partition"] for e in m["files"]}) > 1
