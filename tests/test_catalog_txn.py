"""Warehouse-catalog (multi-table atomic commit + refs) tests — the
Nessie-analog consistency layer: catalog readers can never observe a
half-committed multi-table load, branches isolate, fast-forward merges
publish, and concurrent committers conflict instead of clobbering."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest
from pyspark.sql import functions as F

from airflow_etl_spark.sources import txn
from airflow_etl_spark.sources.catalog_txn import (
    CatalogConflict,
    WarehouseCatalog,
)


def _mk(spark, n, mult=1):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * mult).alias("v")
    )


def _vals(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_multi_table_commit_is_atomic_to_catalog_readers(spark, tmp_path):
    """Crash between two table commits: both per-table pointers may have
    moved, but the CATALOG still pins the parent versions of BOTH tables
    — no torn cross-table state. The retried transaction then publishes
    both new versions in one flip."""
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    with cat.transaction() as tx:
        tx.commit_table("hub", _mk(spark, 3))
        tx.commit_table("sat", _mk(spark, 3, mult=10))
    assert _vals(cat.read(spark, "hub")) == [(0, 0), (1, 1), (2, 2)]

    # a "crashed" load: hub committed, sat not, transaction never exits
    tx2 = cat.transaction()
    tx2.commit_table("hub", _mk(spark, 5, mult=100))
    # catalog readers still see the OLD hub (and a consistent pair)
    assert _vals(cat.read(spark, "hub")) == [(0, 0), (1, 1), (2, 2)]
    assert _vals(cat.read(spark, "sat")) == [(0, 0), (1, 10), (2, 20)]
    # ...even though the per-table live pointer already moved
    assert _vals(txn.read(spark, f"{wh}/hub")) == [
        (0, 0), (1, 100), (2, 200), (3, 300), (4, 400)
    ]

    # the retry commits BOTH; catalog flips once
    with cat.transaction() as tx3:
        tx3.commit_table("hub", _mk(spark, 5, mult=100))
        tx3.commit_table("sat", _mk(spark, 5, mult=1000))
    assert _vals(cat.read(spark, "hub"))[-1] == (4, 400)
    assert _vals(cat.read(spark, "sat"))[-1] == (4, 4000)


def test_concurrent_transactions_conflict_not_clobber(spark, tmp_path):
    """Two transactions forked from the same parent: the second publisher
    gets CatalogConflict, and the winner's pins survive untouched."""
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 2))

    a = cat.transaction()
    b = cat.transaction()
    a.commit_table("t", _mk(spark, 2, mult=7))
    b.commit_table("t", _mk(spark, 2, mult=9))
    a.__exit__(None, None, None)  # a publishes first
    with pytest.raises(CatalogConflict):
        b.__exit__(None, None, None)
    assert _vals(cat.read(spark, "t")) == [(0, 0), (1, 7)]


def test_branch_isolation_and_fast_forward(spark, tmp_path):
    """A dev branch commits without touching main; fast-forward publishes
    it; a diverged main refuses the merge."""
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 2))
    cat.create_ref("dev")

    with cat.transaction(ref="dev") as tx:
        tx.commit_table("t", _mk(spark, 2, mult=5))
    # isolation: main unchanged, dev sees its own commit
    assert _vals(cat.read(spark, "t")) == [(0, 0), (1, 1)]
    assert _vals(cat.read(spark, "t", ref="dev")) == [(0, 0), (1, 5)]

    cat.fast_forward("main", "dev")
    assert _vals(cat.read(spark, "t")) == [(0, 0), (1, 5)]

    # diverge both; fast-forward must refuse
    cat.create_ref("dev2")
    with cat.transaction(ref="dev2") as tx:
        tx.commit_table("t", _mk(spark, 2, mult=6))
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 2, mult=8))
    with pytest.raises(CatalogConflict, match="fast-forward"):
        cat.fast_forward("main", "dev2")


def test_catalog_pins_survive_table_gc(spark, tmp_path):
    """Table GC keeps >= 2 versions; the catalog's retained snapshots pin
    at most the last two versions of a transacted table, so a reader of
    the PREVIOUS catalog snapshot still resolves (the retention
    alignment the module docstring commits to)."""
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    for i in range(4):
        with cat.transaction() as tx:
            tx.commit_table("t", _mk(spark, 2, mult=i))
    snap = cat.snapshot()
    parent = snap["parent"]
    assert parent is not None
    import json

    prev = json.loads(cat.fs.read_text(cat._snap_file(parent)))
    path, ver = (
        prev["tables"]["t"]["path"], prev["tables"]["t"]["version"],
    )
    assert _vals(txn.read_named_version(spark, path, ver)) == [(0, 0), (1, 2)]


def test_append_table_through_catalog(spark, tmp_path):
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 2))
    with cat.transaction() as tx:
        tx.append_table("t", _mk(spark, 2, mult=3).where(F.col("k") == 1))
    assert _vals(cat.read(spark, "t")) == [(0, 0), (1, 1), (1, 3)]


def test_two_process_catalog_commit_race(spark, tmp_path):
    """Two driver PROCESSES publish catalog transactions on the same ref:
    every commit lands (serialized by the catalog lock, retried on
    conflict), the final snapshot chain is linear, and each snapshot's
    pins resolve."""
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 1))

    worker = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {os.getcwd()!r})
        from pyspark.sql import SparkSession, functions as F
        from airflow_etl_spark.sources.catalog_txn import (
            CatalogConflict, WarehouseCatalog)
        spark = (SparkSession.builder.master("local[2]")
                 .appName("cat_race_worker")
                 .config("spark.sql.shuffle.partitions", "2")
                 .config("spark.ui.enabled", "false").getOrCreate())
        cat = WarehouseCatalog({wh!r})
        done = 0
        while done < 3:
            try:
                with cat.transaction() as tx:
                    tx.commit_table(f"b{{done}}",
                                    spark.range(2).select(
                                        F.col("id").alias("k"),
                                        F.col("id").alias("v")))
                done += 1
            except CatalogConflict:
                pass
        print("DONE", flush=True)
    """)
    proc = subprocess.Popen(
        [sys.executable, "-c", worker],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    from airflow_etl_spark.sources.catalog_txn import CatalogConflict as CC

    done = 0
    while done < 3:
        try:
            with cat.transaction() as tx:
                tx.commit_table(f"a{done}", _mk(spark, 2, mult=done + 1))
            done += 1
        except CC:
            pass
    out, _ = proc.communicate(timeout=300)
    assert "DONE" in out

    tables = cat.tables()
    assert {"t", "a0", "a1", "a2", "b0", "b1", "b2"} <= set(tables)
    # chain is linear and every pin on the live snapshot resolves
    for name in ("a2", "b2"):
        assert cat.read(spark, name).count() == 2


def test_stream_catalog_sink_multi_table_crash_atomicity(spark, tmp_path):
    """The streaming multi-table sink dies AFTER table A's upsert but
    BEFORE the catalog flip of a batch: catalog readers stay on the
    parent pins for BOTH tables (no half-applied batch), and the
    restarted stream replays to an exactly-once final state."""
    from airflow_etl_spark import streaming

    wh = str(tmp_path / "wh")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cat = WarehouseCatalog(wh)

    for i, lo in enumerate([0, 10, 20]):
        spark.range(lo, lo + 10).selectExpr(
            "id AS k", f"id * 10 + {i} AS v"
        ).coalesce(1).write.parquet(f"{src}/f{i}")

    def read_stream():
        return (
            spark.readStream.schema("k long, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )

    crash = {"armed": False, "batches_seen": 0}

    def evens(b):
        crash["batches_seen"] += 1
        return b.where(F.col("k") % 2 == 0)

    def odds(b):
        if crash["armed"] and crash["batches_seen"] >= 2:
            crash["armed"] = False
            raise RuntimeError("injected crash between tables")
        return b.where(F.col("k") % 2 == 1)

    routes = [("evens", evens, ["k"]), ("odds", odds, ["k"])]

    crash["armed"] = True
    with pytest.raises(Exception, match="injected crash"):
        streaming.write_stream_catalog_txn(
            read_stream(), cat, routes, ckpt, query_name="cat_stream_a"
        )

    # batch 1 published; batch 2 half-applied at the TABLE layer but
    # invisible at the CATALOG layer: both pins still show batch-1 state
    n_evens = cat.read(spark, "evens").count()
    n_odds = cat.read(spark, "odds").count()
    assert (n_evens, n_odds) == (5, 5)

    # restart: replay + drain
    streaming.write_stream_catalog_txn(
        read_stream(), cat, routes, ckpt, query_name="cat_stream_b"
    )
    ev = sorted(r["k"] for r in cat.read(spark, "evens").collect())
    od = sorted(r["k"] for r in cat.read(spark, "odds").collect())
    assert ev == list(range(0, 30, 2))
    assert od == list(range(1, 30, 2))


def test_pipeline_run_publishes_warehouse_state(spark, tmp_path, sf_dir):
    """Pipeline(catalog=...): a green run ends with ONE catalog snapshot
    pinning the live version of every warehouse table, tagged with the
    etl_date; reads through the catalog equal direct reads; a second run
    advances the snapshot chain (parent linkage)."""
    from airflow_etl_spark.pipeline import EntityConfig, Pipeline, SourceConfig
    from airflow_etl_spark.sources import read_table

    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    src = SourceConfig(
        name="erp_main",
        tables=["customer"],
        entities=[
            EntityConfig(
                "customer", "customer", ["c_custkey"],
                ["c_name", "c_mktsegment"],
            ),
        ],
    )
    p = Pipeline(spark, wh, [src], sf_dir, catalog=cat)
    p.ledger.seed_dates(
        [("2024-01-01", 0, None, 0), ("2024-01-02", 0, None, 0)]
    )
    p.run()

    snap = cat.snapshot()
    assert snap is not None and snap["meta"]["etl_date"] == "2024-01-01"
    tables = cat.tables()
    assert any(t.endswith("hub_customer") for t in tables), tables
    assert any(t.startswith("staging/") for t in tables), tables

    hub_name = next(t for t in tables if t.endswith("hub_customer"))
    via_cat = cat.read(spark, hub_name)
    direct = read_table(spark, f"{wh}/raw_vault/hub_customer")
    assert sorted(r["customer_hash_key"] for r in via_cat.collect()) == sorted(
        r["customer_hash_key"] for r in direct.collect()
    )

    p.run()  # second date advances the chain
    snap2 = cat.snapshot()
    assert snap2["meta"]["etl_date"] == "2024-01-02"
    assert snap2["parent"] is not None


def test_catalog_time_travel_is_cross_table_consistent(spark, tmp_path):
    """read_at(seq) resolves BOTH tables to the pins of one atomic
    commit — per-table version_back cannot guarantee the pair came from
    the same commit."""
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    with cat.transaction() as tx:
        tx.commit_table("x", _mk(spark, 2, mult=1))
        tx.commit_table("y", _mk(spark, 2, mult=10))
    with cat.transaction() as tx:
        tx.commit_table("x", _mk(spark, 2, mult=2))
        tx.commit_table("y", _mk(spark, 2, mult=20))

    assert _vals(cat.read_at(spark, "x", 1)) == [(0, 0), (1, 1)]
    assert _vals(cat.read_at(spark, "y", 1)) == [(0, 0), (1, 10)]
    assert _vals(cat.read_at(spark, "x", 2)) == [(0, 0), (1, 2)]
    assert _vals(cat.read_at(spark, "y", 2)) == [(0, 0), (1, 20)]
    with pytest.raises(FileNotFoundError):
        cat.read_at(spark, "x", 99)


def test_multibranch_pins_survive_dev_commits(spark, tmp_path):
    """The r6 pin-enforcement invariant, multi-branch (VERDICT r6 #3 /
    next-round #6): after a dev branch advances the table THREE commits
    past main's pin (beyond txn keep_versions=2), main's pinned version
    must still resolve — table GC keeps it because the catalog rewrote
    the `_pins` file at every ref move."""
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 2, mult=7))
    main_path, main_ver = cat.table_pin("t")
    cat.create_ref("dev")
    for i in range(3):
        with cat.transaction(ref="dev") as tx:
            tx.commit_table("t", _mk(spark, 2, mult=100 + i))
    # main's pinned version fell beyond keep_versions=2 on the table —
    # only the enforced pin keeps it readable
    vers = txn.version_log(main_path)
    assert main_ver not in [v["version"] for v in vers[-2:]]
    assert main_ver in txn.read_pins(main_path)
    assert _vals(cat.read(spark, "t", ref="main")) == [(0, 0), (1, 7)]
    assert _vals(cat.read(spark, "t", ref="dev")) == [(0, 0), (1, 102)]


def test_pin_files_shrink_as_snapshots_age_out(spark, tmp_path):
    """Pins track the RETAINED snapshot set (keep_snapshots=2 per ref):
    after N commits the pin file holds the last two versions, not all N
    — bounded metadata, no pin leak."""
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    vers = []
    for i in range(5):
        with cat.transaction() as tx:
            vers.append(tx.commit_table("t", _mk(spark, 2, mult=i)))
    pins = txn.read_pins(f"{wh}/t")
    assert pins == set(vers[-2:])


def test_staged_versions_pinned_before_ref_flip(spark, tmp_path):
    """Ordering fix (ADVICE r6): staged versions are pinned BEFORE the
    ref flip, so a table commit racing between flip and pin-sync can
    never GC a version the just-published snapshot pins. Simulated by
    crashing the publish AT the flip: the pin must already be on disk
    (a safe over-pin — pins are a keep-set), while the catalog still
    points at the parent; the next successful publish prunes it."""
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 2))
    ref_file = cat._ref_file("main")
    real_atomic = cat.fs.write_text_atomic
    real_if = getattr(cat.fs, "write_text_if", None)

    class Boom(RuntimeError):
        pass

    def crash_atomic(path, text):
        if path == ref_file:
            raise Boom("crash at ref flip")
        return real_atomic(path, text)

    def crash_if(path, text, **kw):
        if path == ref_file:
            raise Boom("crash at ref flip")
        return real_if(path, text, **kw)

    tx2 = cat.transaction()
    v2 = tx2.commit_table("t", _mk(spark, 2, mult=5))
    cat.fs.write_text_atomic = crash_atomic
    if real_if is not None:
        cat.fs.write_text_if = crash_if
    try:
        with pytest.raises(Boom):
            tx2.__exit__(None, None, None)
    finally:
        cat.fs.write_text_atomic = real_atomic
        if real_if is not None:
            cat.fs.write_text_if = real_if
    # flip never happened — catalog still at parent — but the staged
    # version is already pinned: no GC window
    assert v2 in txn.read_pins(f"{wh}/t")
    assert _vals(cat.read(spark, "t")) == [(0, 0), (1, 1)]
    # the next successful publish prunes the orphaned over-pin
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 2, mult=11))
    assert v2 not in txn.read_pins(f"{wh}/t")


def test_delete_ref_releases_its_pins(spark, tmp_path):
    """Deleting a dev branch drops its table-version pins at the sync
    inside delete_ref — an abandoned branch stops pinning storage
    forever (the stale-pin leak ADVICE r6 flagged)."""
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 2))
    cat.create_ref("dev")
    dev_vers = []
    for i in range(3):
        with cat.transaction(ref="dev") as tx:
            dev_vers.append(tx.commit_table("t", _mk(spark, 2, mult=10 + i)))
    assert set(dev_vers[-2:]) <= txn.read_pins(f"{wh}/t")
    with pytest.raises(ValueError, match="main"):
        cat.delete_ref("main")
    cat.delete_ref("dev")
    assert "dev" not in cat.refs()
    pins = txn.read_pins(f"{wh}/t")
    assert not (set(dev_vers) & pins)
    # main still resolves its own pin
    assert _vals(cat.read(spark, "t")) == [(0, 0), (1, 1)]


def test_drop_table_then_pins_clear_when_unreferenced(spark, tmp_path):
    """drop_table removes the mapping from NEW snapshots (older ones
    still time-travel to it); once no retained snapshot references the
    table, the tracked-paths sync clears its pin file to the empty set
    instead of leaving a stale one forever."""
    wh = str(tmp_path / "wh")
    cat = WarehouseCatalog(wh)
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 2))
        tx.commit_table("u", _mk(spark, 2, mult=3))
    assert txn.read_pins(f"{wh}/u")
    drop_seq = None
    with cat.transaction() as tx:
        tx.drop_table("u")
    assert "u" not in cat.tables()
    # the PARENT snapshot (retained) still resolves u via time travel
    prev_seq = cat.snapshot()["seq"] - 1
    assert _vals(cat.read_at(spark, "u", prev_seq)) == [(0, 0), (1, 3)]
    # age the dropping snapshot's parent out of retention
    for i in range(2):
        with cat.transaction() as tx:
            tx.commit_table("t", _mk(spark, 2, mult=20 + i))
    assert txn.read_pins(f"{wh}/u") == set()


def test_cascade_erasure_crash_atomicity(spark, tmp_path):
    """GDPR cascade (s12_cascade_erasure shape): if the erasure txn dies
    after staging SOME tables' deletes, catalog readers still see the
    pre-erasure state for EVERY table — per-table pointers may have
    moved, but the catalog pins haven't."""
    cat = WarehouseCatalog(str(tmp_path / "wh"))
    parent = spark.createDataFrame(
        [(1, "keep"), (2, "erase")], "k long, tag string"
    )
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 2)], "ck long, fk long"
    )
    with cat.transaction() as tx:
        tx.commit_table("parent", parent)
        tx.commit_table("child", child)

    erase = parent.filter(F.col("tag") == "erase").select("k")
    with pytest.raises(RuntimeError, match="mid-cascade"):
        with cat.transaction() as tx:
            path, _ = cat.table_pin("parent")
            tx.stage("parent", path, txn.delete_keys(erase, path, ["k"]))
            raise RuntimeError("crash mid-cascade")  # child never staged

    # catalog readers: BOTH tables still pre-erasure (atomicity)
    assert cat.read(spark, "parent").count() == 2
    assert cat.read(spark, "child").count() == 3

    # completing the cascade in a fresh txn erases everywhere at once
    with cat.transaction() as tx:
        ppath, _ = cat.table_pin("parent")
        cpath, _ = cat.table_pin("child")
        tx.stage("parent", ppath, txn.delete_keys(erase, ppath, ["k"]))
        tx.stage(
            "child", cpath,
            txn.delete_keys(erase.select(F.col("k").alias("fk")), cpath,
                            ["fk"]),
        )
    assert [r.k for r in cat.read(spark, "parent").collect()] == [1]
    assert sorted(r.ck for r in cat.read(spark, "child").collect()) == [10]


def test_wap_failed_audit_never_reaches_main(spark, tmp_path):
    """WAP invariant: a branch whose audit fails publishes NOTHING —
    main's pins are untouched through branch create, bad commit, and
    branch delete; a green re-audit fast-forwards cleanly after."""
    cat = WarehouseCatalog(str(tmp_path / "wh"))
    base = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    with cat.transaction() as tx:
        tx.commit_table("t", base)

    cat.create_ref("audit")
    bad = spark.createDataFrame([(3, -5)], "k long, v long")
    with cat.transaction(ref="audit") as tx:
        tx.commit_table(
            "t", cat.read(spark, "t", ref="audit").unionByName(bad)
        )
    # main never sees the branch commit
    assert sorted(r.k for r in cat.read(spark, "t").collect()) == [1, 2]
    cat.delete_ref("audit")
    assert sorted(r.k for r in cat.read(spark, "t").collect()) == [1, 2]

    cat.create_ref("audit")
    good = spark.createDataFrame([(3, 5)], "k long, v long")
    with cat.transaction(ref="audit") as tx:
        tx.commit_table(
            "t", cat.read(spark, "t", ref="audit").unionByName(good)
        )
    cat.fast_forward("main", "audit")
    assert sorted((r.k, r.v) for r in cat.read(spark, "t").collect()) == [
        (1, 10), (2, 20), (3, 5)
    ]


# ------------------------------------------------------ three-way merge --
def test_merge_ref_disjoint_changes_merge_cleanly(spark, tmp_path):
    """dev changed t_a; main changed t_b and added t_c since the fork:
    the three-way merge takes dev's t_a, keeps main's t_b/t_c, and
    publishes ONE merge snapshot with the provenance meta."""
    cat = WarehouseCatalog(str(tmp_path / "wh"), keep_snapshots=8)
    with cat.transaction() as tx:
        tx.commit_table("t_a", _mk(spark, 3))
        tx.commit_table("t_b", _mk(spark, 3, mult=10))
    cat.create_ref("dev")
    with cat.transaction("dev") as tx:
        tx.commit_table("t_a", _mk(spark, 5))
    with cat.transaction() as tx:
        tx.commit_table("t_b", _mk(spark, 4, mult=10))
        tx.commit_table("t_c", _mk(spark, 2, mult=7))
    actions = cat.merge_ref("main", "dev")
    assert actions == {"t_a": "take_ref", "t_b": "keep_into",
                       "t_c": "keep_into"}
    assert len(_vals(cat.read(spark, "t_a"))) == 5   # dev's version
    assert len(_vals(cat.read(spark, "t_b"))) == 4   # main's version
    assert len(_vals(cat.read(spark, "t_c"))) == 2
    assert cat.snapshot()["meta"]["merge_of"] == "dev"


def test_merge_ref_conflict_on_both_sides_changed(spark, tmp_path):
    """Both refs moved the same table since the fork: merge refuses with
    the conflicted table named, and writes NOTHING."""
    cat = WarehouseCatalog(str(tmp_path / "wh"), keep_snapshots=8)
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 3))
    cat.create_ref("dev")
    with cat.transaction("dev") as tx:
        tx.commit_table("t", _mk(spark, 5))
    with cat.transaction() as tx:
        tx.commit_table("t", _mk(spark, 4))
    before = cat.snapshot()["seq"]
    with pytest.raises(CatalogConflict, match="t"):
        cat.merge_ref("main", "dev")
    assert cat.snapshot()["seq"] == before  # nothing published
    assert len(_vals(cat.read(spark, "t"))) == 4  # main untouched


def test_merge_ref_drop_and_add_and_noop(spark, tmp_path):
    """ref dropped a table and added another; a second merge of the
    already-merged ref is a no-op returning {}."""
    cat = WarehouseCatalog(str(tmp_path / "wh"), keep_snapshots=8)
    with cat.transaction() as tx:
        tx.commit_table("old", _mk(spark, 3))
    cat.create_ref("dev")
    with cat.transaction("dev") as tx:
        tx.commit_table("new", _mk(spark, 2))
        tx.drop_table("old")
    actions = cat.merge_ref("main", "dev")
    assert actions == {"new": "add_ref", "old": "drop_ref"}
    assert "old" not in cat.tables()
    assert len(_vals(cat.read(spark, "new"))) == 2
    # re-merging the already-merged ref publishes nothing: every table
    # resolves 'same' (identical pins) and the snapshot seq holds
    before = cat.snapshot()["seq"]
    again = cat.merge_ref("main", "dev")
    assert set(again.values()) <= {"same", "keep_into"}
    assert cat.snapshot()["seq"] == before
