"""Incremental materialized-view maintenance (operators/matview.py):
the view advanced by refresh() must always equal the full GROUP BY
recomputed over the base's live snapshot — through appends (fast path),
MoR deletes and rewrites (differential path) — and the append fast path
must provably scan only the delta files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_etl_spark.operators import matview
from airflow_etl_spark.sources import txn


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, id long")


def _full(spark, base):
    return (
        txn.read(spark, base)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("mv_n"),
            F.sum(F.coalesce("v", F.lit(0))).alias("sum_v"),
        )
    )


def _eq(a, b):
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb, f"{ka} != {kb}"


@pytest.fixture()
def paths(tmp_path):
    root = str(tmp_path / "mv_test")
    return root + "/base", root + "/mv"


def test_create_then_append_fast_path(spark, paths):
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1), ("a", 2, 2), ("b", 3, 3)]), base)
    matview.create(spark, base, mv, ["k"], {"sum_v": "v"})
    _eq(txn.read(spark, mv), _full(spark, base))

    txn.append_files(_mk(spark, [("a", 10, 4), ("c", 5, 5)]), base)
    info = matview.refresh(spark, mv)
    assert info["mode"] == "append"
    _eq(txn.read(spark, mv), _full(spark, base))


def test_delta_between_pins_new_version_not_live_pointer(spark, paths):
    """A commit landing between a caller's pointer read and the delta
    scan must NOT leak into the delta (advisor r8: refresh pins state to
    the pointer it read, so delta_between diffing against the then-live
    pointer would absorb rows the state write doesn't record — the next
    refresh re-applies them and double-counts). Simulated
    deterministically: pin v2 as new_version, then land v3 before the
    delta is consumed."""
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1)]), base, keep_versions=5)   # v1
    v1 = txn._read_pointer(base)
    txn.append_files(_mk(spark, [("b", 2, 2)]), base, keep_versions=5)  # v2
    v2 = txn._read_pointer(base)
    # v3 = the "racing" commit that lands after the caller pinned v2
    txn.append_files(_mk(spark, [("c", 3, 3)]), base, keep_versions=5)
    ins, dels, mode, _ = matview.delta_between(spark, base, v1, new_version=v2)
    assert mode == "append" and dels is None
    assert sorted(r.k for r in ins.collect()) == ["b"]  # v3's "c" excluded
    # and the diff path pins too: retract from v2's view of the world
    old_rows = {tuple(r) for r in
                txn.read_named_version(spark, base, v2).collect()}
    live_rows = {tuple(r) for r in txn.read(spark, base).collect()}
    assert old_rows < live_rows  # v3 really is ahead


def test_refresh_then_refresh_never_double_counts(spark, paths):
    """Two sequential refreshes with commits in between must equal the
    full recompute — the invariant the version-pinning protects."""
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1), ("b", 2, 2)]), base)
    matview.create(spark, base, mv, ["k"], {"sum_v": "v"})
    txn.append_files(_mk(spark, [("a", 10, 3)]), base)
    matview.refresh(spark, mv)
    txn.append_files(_mk(spark, [("b", 20, 4), ("c", 5, 5)]), base)
    matview.refresh(spark, mv)
    _eq(txn.read(spark, mv), _full(spark, base))


def _full_mm(spark, base):
    return (
        txn.read(spark, base)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("mv_n"),
            F.sum(F.coalesce("v", F.lit(0))).alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


def test_minmax_append_path_stays_o_delta(spark, paths):
    """MIN/MAX views still take the append fast path: inserts merge via
    least/greatest with no base re-read (VERDICT r7 #4)."""
    base, mv = paths
    txn.commit(_mk(spark, [("a", 5, 1), ("a", 9, 2), ("b", 3, 3)]), base)
    matview.create(
        spark, base, mv, ["k"], {"sum_v": "v"},
        mins={"min_v": "v"}, maxs={"max_v": "v"},
    )
    _eq_n(txn.read(spark, mv), _full_mm(spark, base))
    txn.append_files(_mk(spark, [("a", 1, 4), ("c", 7, 5)]), base)
    info = matview.refresh(spark, mv)
    assert info["mode"] == "append"
    _eq_n(txn.read(spark, mv), _full_mm(spark, base))


def test_minmax_interior_delete_skips_reagg_touched_reaggs(spark, paths):
    """The touch rule: deleting a value strictly inside (min, max) must
    not disturb the extremes; deleting the current min must re-derive it
    from the base — both through the same MoR-delete refresh. The final
    view always equals the full recompute."""
    base, mv = paths
    rows = [("a", 1, 1), ("a", 5, 2), ("a", 9, 3),
            ("b", 2, 4), ("b", 6, 5), ("b", 8, 6)]
    txn.commit(_mk(spark, rows), base, keep_versions=5)
    matview.create(
        spark, base, mv, ["k"], {"sum_v": "v"},
        mins={"min_v": "v"}, maxs={"max_v": "v"},
    )
    # id=2 is a's interior value (5 ∈ (1,9)); id=4 is b's MIN (2)
    txn.delete_keys(
        spark.createDataFrame([(2,), (4,)], "id long"), base, ["id"],
    )
    info = matview.refresh(spark, mv)
    assert info["mode"] == "mor"
    got = {r.k: (r.mv_n, r.sum_v, r.min_v, r.max_v)
           for r in txn.read(spark, mv).collect()}
    assert got == {"a": (2, 10, 1, 9), "b": (2, 14, 6, 8)}
    _eq_n(txn.read(spark, mv), _full_mm(spark, base))


def test_minmax_group_fully_retracted_drops(spark, paths):
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1), ("b", 2, 2)]), base, keep_versions=5)
    matview.create(
        spark, base, mv, ["k"], {"sum_v": "v"},
        mins={"min_v": "v"}, maxs={"max_v": "v"},
    )
    txn.delete_keys(spark.createDataFrame([(1,)], "id long"), base, ["id"])
    matview.refresh(spark, mv)
    got = {r.k for r in txn.read(spark, mv).collect()}
    assert got == {"b"}
    _eq_n(txn.read(spark, mv), _full_mm(spark, base))


def test_minmax_output_column_collision_raises(spark, paths):
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1)]), base)
    with pytest.raises(ValueError, match="collide"):
        matview.create(
            spark, base, mv, ["k"], {"x": "v"}, mins={"x": "v"},
        )


def test_output_column_named_after_group_key_raises(spark, paths):
    """ADVICE r8: a min/max/sum output named after a GROUP KEY would
    duplicate the column in the view and break refresh()'s key join —
    create() must refuse up front."""
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1)]), base)
    with pytest.raises(ValueError, match="collide"):
        matview.create(spark, base, mv, ["k"], {"k": "v"})
    with pytest.raises(ValueError, match="collide"):
        matview.create(
            spark, base, mv, ["k"], {"sum_v": "v"}, mins={"k": "v"}
        )


def test_refresh_noop_when_current(spark, paths):
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1)]), base)
    matview.create(spark, base, mv, ["k"], {"sum_v": "v"})
    mv_ver = txn._read_pointer(mv)
    info = matview.refresh(spark, mv)
    assert info["mode"] == "noop"
    assert txn._read_pointer(mv) == mv_ver  # no commit happened


def test_mor_delete_takes_diff_path_and_drops_empty_group(spark, paths):
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1), ("b", 3, 3), ("b", 4, 4)]), base)
    matview.create(spark, base, mv, ["k"], {"sum_v": "v"})
    txn.delete_keys(
        spark.createDataFrame([(3,), (4,)], "id long"), base, ["id"]
    )
    info = matview.refresh(spark, mv)
    assert info["mode"] == "mor"
    _eq(txn.read(spark, mv), _full(spark, base))
    assert txn.read(spark, mv).filter(F.col("k") == "b").count() == 0


def test_rewrite_update_takes_diff_path(spark, paths):
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1), ("b", 3, 3)]), base)
    matview.create(spark, base, mv, ["k"], {"sum_v": "v"})
    # copy-on-write UPDATE: rewrite v=100 where id=1
    cur = txn.read(spark, base).withColumn(
        "v", F.when(F.col("id") == 1, F.lit(100)).otherwise(F.col("v"))
    )
    txn.commit(cur, base)
    info = matview.refresh(spark, mv)
    assert info["mode"] == "diff"
    _eq(txn.read(spark, mv), _full(spark, base))


def test_append_delta_scans_only_new_files(spark, paths):
    base, _ = paths
    txn.commit(_mk(spark, [("a", 1, 1), ("b", 2, 2)]), base)
    old_ver = txn._read_pointer(base)
    old_files = set(txn.data_files(base))
    txn.append_files(_mk(spark, [("c", 9, 9)]), base)
    ins, dels, mode, scanned = matview.delta_between(spark, base, old_ver)
    assert mode == "append" and dels is None
    new_only = set(txn.data_files(base)) - old_files
    got = {f.split("://")[-1] for f in ins.inputFiles()}
    assert got == new_only  # the base's pre-existing files are NOT read
    assert scanned == len(new_only)


def test_null_measures_cancel_exactly(spark, paths):
    base, mv = paths
    rows = [("a", None, 1), ("a", 5, 2), ("b", None, 3)]
    txn.commit(_mk(spark, rows), base)
    matview.create(spark, base, mv, ["k"], {"sum_v": "v"})
    # delete the NULL-measure row: its retraction must cancel the 0 it added
    txn.delete_keys(spark.createDataFrame([(1,)], "id long"), base, ["id"])
    matview.refresh(spark, mv)
    _eq(txn.read(spark, mv), _full(spark, base))


def test_aged_out_base_version_raises(spark, paths):
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1)]), base)
    matview.create(spark, base, mv, ["k"], {"sum_v": "v"})
    # retention floor is 2 (txn._gc): two more commits age out the
    # version the view recorded
    txn.commit(_mk(spark, [("a", 1, 1), ("b", 2, 2)]), base)
    txn.commit(_mk(spark, [("a", 1, 1), ("b", 2, 2), ("c", 3, 3)]), base)
    with pytest.raises(ValueError, match="aged out"):
        matview.refresh(spark, mv)


def test_refresh_on_missing_view_raises(spark, paths):
    _, mv = paths
    with pytest.raises(FileNotFoundError, match="no materialized view"):
        matview.refresh(spark, mv)


def test_transform_join_view_tracks_full_recompute(spark, paths):
    """A view defined over transform(base) — here a join to a static
    dimension — must equal the full recompute through appends (fast
    path) and MoR deletes (differential path), with the same transform
    applied to the deltas."""
    base, mv = paths
    dim = spark.createDataFrame(
        [("a", "east"), ("b", "west")], "k string, region string"
    )

    def enrich(rel):
        return rel.join(F.broadcast(dim), "k")

    def full():
        return (
            enrich(txn.read(spark, base))
            .groupBy("region")
            .agg(
                F.count(F.lit(1)).cast("long").alias("mv_n"),
                F.sum(F.coalesce("v", F.lit(0))).alias("sum_v"),
            )
        )

    txn.commit(_mk(spark, [("a", 1, 1), ("b", 3, 3)]), base)
    matview.create(spark, base, mv, ["region"], {"sum_v": "v"}, transform=enrich)
    _eq(txn.read(spark, mv), full())
    txn.append_files(_mk(spark, [("a", 7, 4), ("b", 9, 5)]), base)
    assert matview.refresh(spark, mv, transform=enrich)["mode"] == "append"
    _eq(txn.read(spark, mv), full())
    txn.delete_keys(spark.createDataFrame([(3,), (5,)], "id long"), base, ["id"])
    assert matview.refresh(spark, mv, transform=enrich)["mode"] == "mor"
    _eq(txn.read(spark, mv), full())


def test_rebase_after_compaction_skips_recompute(spark, paths):
    """Compaction preserves content; rebase re-pins the view without the
    O(base) differential, and a subsequent append still fast-paths."""
    from airflow_etl_spark.operators import maintenance

    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1), ("b", 2, 2)]), base)
    txn.append_files(_mk(spark, [("c", 3, 3)]), base)
    matview.create(spark, base, mv, ["k"], {"sum_v": "v"})
    maintenance.compact(spark, base, 10 ** 9)
    info = matview.rebase(spark, mv)
    assert info["mode"] == "rebase"
    _eq(txn.read(spark, mv), _full(spark, base))
    assert matview.refresh(spark, mv)["mode"] == "noop"
    txn.append_files(_mk(spark, [("d", 4, 4)]), base)
    assert matview.refresh(spark, mv)["mode"] == "append"
    _eq(txn.read(spark, mv), _full(spark, base))


def test_rebase_refuses_content_change(spark, paths):
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1)]), base)
    matview.create(spark, base, mv, ["k"], {"sum_v": "v"})
    txn.append_files(_mk(spark, [("b", 2, 2)]), base)
    with pytest.raises(ValueError, match="rebase refused"):
        matview.rebase(spark, mv)


# -------------------------------------------- two-sided join IVM (r7) --
def _mk_a(spark, rows):  # fact: (ak join-key, av measure, aid id)
    return spark.createDataFrame(rows, "ak string, av long, aid long")


def _mk_b(spark, rows):  # dim: (bk join-key, grp group, bid id)
    return spark.createDataFrame(rows, "bk string, grp string, bid long")


def _full_join(spark, a, b):
    fa, fb = txn.read(spark, a), txn.read(spark, b)
    return (
        fa.join(fb, fa["ak"] == fb["bk"])
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("mv_n"),
            F.sum(F.coalesce("av", F.lit(0))).alias("sum_av"),
        )
    )


def test_join_view_tracks_both_sides(spark, paths):
    """d(A⋈B) = dA⋈B0 + A0⋈dB + dA⋈dB: exercised one side at a time and
    then both at once (the cross term), against the full recompute."""
    base, mv = paths
    a, b = base + "_a", base + "_b"
    txn.commit(_mk_a(spark, [("x", 1, 1), ("x", 2, 2), ("y", 3, 3)]), a)
    txn.commit(_mk_b(spark, [("x", "g1", 1), ("y", "g2", 2)]), b)
    matview.create_join(
        spark, a, b, mv, on=[("ak", "bk")], keys=["grp"], sums={"sum_av": "av"}
    )
    _eq(txn.read(spark, mv), _full_join(spark, a, b))

    # only A moves (append): single dA ⋈ B_old term
    txn.append_files(_mk_a(spark, [("y", 10, 4)]), a)
    info = matview.refresh_join(spark, mv)
    assert (info["a_moved"], info["b_moved"]) == (True, False)
    _eq(txn.read(spark, mv), _full_join(spark, a, b))

    # only B moves (MoR delete of the y-dim row): A_old ⋈ dB retracts
    txn.delete_keys(spark.createDataFrame([(2,)], "bid long"), b, ["bid"])
    info = matview.refresh_join(spark, mv)
    assert (info["a_moved"], info["b_moved"]) == (False, True)
    _eq(txn.read(spark, mv), _full_join(spark, a, b))
    assert txn.read(spark, mv).filter(F.col("grp") == "g2").count() == 0

    # BOTH move before one refresh: new fact rows joining a new dim row
    # exist ONLY in the dA ⋈ dB cross term
    txn.append_files(_mk_a(spark, [("z", 100, 5)]), a)
    txn.append_files(_mk_b(spark, [("z", "g3", 3)]), b)
    info = matview.refresh_join(spark, mv)
    assert (info["a_moved"], info["b_moved"]) == (True, True)
    _eq(txn.read(spark, mv), _full_join(spark, a, b))
    assert txn.read(spark, mv).filter(
        (F.col("grp") == "g3") & (F.col("sum_av") == 100)
    ).count() == 1


def test_join_view_noop_and_kind_guards(spark, paths):
    base, mv = paths
    a, b = base + "_a", base + "_b"
    txn.commit(_mk_a(spark, [("x", 1, 1)]), a)
    txn.commit(_mk_b(spark, [("x", "g1", 1)]), b)
    matview.create_join(
        spark, a, b, mv, on=[("ak", "bk")], keys=["grp"], sums={"sum_av": "av"}
    )
    assert matview.refresh_join(spark, mv)["mode"] == "noop"
    with pytest.raises(ValueError, match="use refresh_join"):
        matview.refresh(spark, mv)
    # and the single-table view rejects refresh_join
    single = base + "_single"
    txn.commit(_mk(spark, [("a", 1, 1)]), single)
    matview.create(spark, single, mv + "_s", ["k"], {"sum_v": "v"})
    with pytest.raises(ValueError, match="not a join view"):
        matview.refresh_join(spark, mv + "_s")


# ------------------------------------------------ fleet sweep (r7 s4) --
def test_discover_refresh_all_and_rebase_all(spark, paths):
    base, _ = paths
    root = base.rsplit("/", 1)[0]
    a, b = root + "/wh/fact_a", root + "/wh/dim_b"
    txn.commit(_mk(spark, [("a", 1, 1)]), a)
    txn.commit(_mk_b(spark, [("a", "g1", 1)]), b)
    matview.create(spark, a, root + "/wh/mv_a", ["k"], {"sum_v": "v"})
    matview.create_join(
        spark, a, b, root + "/wh/mv_j", on=[("k", "bk")], keys=["grp"],
        sums={"sum_v": "v"},
    )
    matview.create(
        spark, a, root + "/wh/mv_t", ["k"], {"sum_v": "v"},
        transform=lambda r: r.filter(F.col("v") > 0),
    )
    assert matview.discover(root) == sorted(
        [root + "/wh/mv_a", root + "/wh/mv_j", root + "/wh/mv_t"]
    )
    txn.append_files(_mk(spark, [("a", 5, 2)]), a)
    res = matview.refresh_all(spark, root)
    assert res[root + "/wh/mv_a"]["mode"] == "append"
    assert res[root + "/wh/mv_j"]["mode"] == "join-delta"
    assert res[root + "/wh/mv_t"]["mode"] == "skipped"
    _eq(txn.read(spark, root + "/wh/mv_a"), _full(spark, a))

    from airflow_etl_spark.operators import maintenance

    maintenance.compact(spark, a, 10 ** 9)
    res = matview.rebase_all(spark, root)
    assert res[root + "/wh/mv_a"]["mode"] == "rebase"
    assert res[root + "/wh/mv_j"]["mode"] == "skipped"
    assert matview.refresh(spark, root + "/wh/mv_a")["mode"] == "noop"


def test_refresh_refuses_forgotten_transform(spark, paths):
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1)]), base)
    matview.create(
        spark, base, mv, ["k"], {"sum_v": "v"},
        transform=lambda r: r.filter(F.col("v") > 0),
    )
    txn.append_files(_mk(spark, [("b", 2, 2)]), base)
    with pytest.raises(ValueError, match="created with a transform"):
        matview.refresh(spark, mv)


def test_housekeeping_dag_sweeps_matviews(spark, tmp_path):
    """End-to-end: the data housekeeping DAG refreshes views before
    compaction and re-pins them after it."""
    from airflow_etl_spark import housekeeping
    from airflow_etl_spark.ledger import Ledger

    root = str(tmp_path / "wh")
    base = root + "/fact"
    txn.commit(_mk(spark, [("a", 1, 1), ("b", 2, 2)]), base)
    matview.create(spark, base, root + "/mv", ["k"], {"sum_v": "v"})
    txn.append_files(_mk(spark, [("c", 3, 3)]), base)
    ledger = Ledger(spark, str(tmp_path / "lg"))
    dag = housekeeping.data_housekeeping_dag(
        spark, [base], target_file_bytes=10 ** 9, matview_root=root,
    )
    st = dag.run(ledger, "housekeeping", "2024-05-01")
    assert st["refresh_matviews"] == "success"
    assert st["rebase_matviews"] == "success"
    assert st[housekeeping.DATA_TASK_ID] == "success"
    _eq(txn.read(spark, root + "/mv"), _full(spark, base))
    assert matview.refresh(spark, root + "/mv")["mode"] == "noop"


# --------------------------------------- join-view MIN/MAX (r9, VERDICT #6) --
def _full_join_mm(spark, a, b):
    fa, fb = txn.read(spark, a), txn.read(spark, b)
    return (
        fa.join(fb, fa["ak"] == fb["bk"])
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("mv_n"),
            F.sum(F.coalesce("av", F.lit(0))).alias("sum_av"),
            F.min("av").alias("min_av"),
            F.max("av").alias("max_av"),
        )
    )


def _mm_join_view(spark, base, mv, a_rows, b_rows, keep=5):
    a, b = base + "_a", base + "_b"
    txn.commit(_mk_a(spark, a_rows), a, keep_versions=keep)
    txn.commit(_mk_b(spark, b_rows), b, keep_versions=keep)
    matview.create_join(
        spark, a, b, mv, on=[("ak", "bk")], keys=["grp"],
        sums={"sum_av": "av"}, mins={"min_av": "av"}, maxs={"max_av": "av"},
    )
    return a, b


def test_join_minmax_append_only_stays_merge_path(spark, paths):
    base, mv = paths
    a, b = _mm_join_view(
        spark, base, mv,
        [("x", 5, 1), ("x", 9, 2), ("y", 3, 3)],
        [("x", "g1", 1), ("y", "g2", 2)],
    )
    _eq_n(txn.read(spark, mv), _full_join_mm(spark, a, b))
    txn.append_files(_mk_a(spark, [("x", 1, 4), ("y", 99, 5)]), a)
    info = matview.refresh_join(spark, mv)
    assert (info["a_moved"], info["b_moved"]) == (True, False)
    _eq_n(txn.read(spark, mv), _full_join_mm(spark, a, b))


def test_join_minmax_fact_delete_touch_rule(spark, paths):
    """Deleting the fact row that carries a group's MIN must re-derive it
    from the pinned new snapshots; interior deletes must not disturb the
    extremes — both through one MoR refresh, verified vs full recompute."""
    base, mv = paths
    a, b = _mm_join_view(
        spark, base, mv,
        [("x", 1, 1), ("x", 5, 2), ("x", 9, 3), ("y", 2, 4), ("y", 6, 5)],
        [("x", "g1", 1), ("y", "g2", 2)],
    )
    # aid=1 is g1's MIN; aid=5 is g2's MAX-interior partner left alone
    txn.delete_keys(spark.createDataFrame([(1,), (2,)], "aid long"), a, ["aid"])
    info = matview.refresh_join(spark, mv)
    assert (info["a_moved"], info["b_moved"]) == (True, False)
    got = {r.grp: (r.mv_n, r.sum_av, r.min_av, r.max_av)
           for r in txn.read(spark, mv).collect()}
    assert got == {"g1": (1, 9, 9, 9), "g2": (2, 8, 2, 6)}
    _eq_n(txn.read(spark, mv), _full_join_mm(spark, a, b))


def test_join_minmax_dim_delete_drops_group(spark, paths):
    base, mv = paths
    a, b = _mm_join_view(
        spark, base, mv,
        [("x", 1, 1), ("y", 2, 2)],
        [("x", "g1", 1), ("y", "g2", 2)],
    )
    txn.delete_keys(spark.createDataFrame([(2,)], "bid long"), b, ["bid"])
    matview.refresh_join(spark, mv)
    assert {r.grp for r in txn.read(spark, mv).collect()} == {"g1"}
    _eq_n(txn.read(spark, mv), _full_join_mm(spark, a, b))


def test_join_minmax_cross_term_resurrect_guard(spark, paths):
    """Both sides delete the partners of the row carrying a group's MIN
    in the SAME refresh window: the dA⋈dB product term emits that row
    with +1 weight (retract x retract), which a naive least/greatest
    merge would resurrect — the touch rule must re-aggregate instead.
    Plus fresh inserts on both sides landing in the cross term."""
    base, mv = paths
    a, b = _mm_join_view(
        spark, base, mv,
        [("x", 1, 1), ("x", 9, 2), ("y", 4, 3)],
        [("x", "g1", 1), ("y", "g1", 2)],
    )
    # g1 spans both dims; min is av=1 via (aid=1, bid=1)
    txn.delete_keys(spark.createDataFrame([(1,)], "aid long"), a, ["aid"],
                    keep_versions=5)
    txn.delete_keys(spark.createDataFrame([(1,)], "bid long"), b, ["bid"],
                    keep_versions=5)
    # and a brand-new join pair on both sides in the same window
    txn.append_files(_mk_a(spark, [("z", 7, 10)]), a, keep_versions=5)
    txn.append_files(_mk_b(spark, [("z", "g1", 10)]), b, keep_versions=5)
    info = matview.refresh_join(spark, mv)
    assert (info["a_moved"], info["b_moved"]) == (True, True)
    got = {r.grp: (r.mv_n, r.sum_av, r.min_av, r.max_av)
           for r in txn.read(spark, mv).collect()}
    # survivors of g1: (y,4) and (z,7) — aid=2's x-partner dim row is gone
    assert got == {"g1": (2, 11, 4, 7)}
    _eq_n(txn.read(spark, mv), _full_join_mm(spark, a, b))


def test_create_join_key_collision_raises(spark, paths):
    base, mv = paths
    a, b = base + "_a", base + "_b"
    txn.commit(_mk_a(spark, [("x", 1, 1)]), a)
    txn.commit(_mk_b(spark, [("x", "g1", 1)]), b)
    with pytest.raises(ValueError, match="collide"):
        matview.create_join(
            spark, a, b, mv, on=[("ak", "bk")], keys=["grp"],
            sums={"grp": "av"},
        )


# ------------------------------- n-table chain join views (r10, VERDICT #7) --
def _mk_bmid(spark, rows):  # mid table: (bk <- fact key, ck -> dim key, bid)
    return spark.createDataFrame(rows, "bk string, ck string, bid long")


def _mk_c(spark, rows):  # dim: (ck2 join-key, grp group, cid id)
    return spark.createDataFrame(rows, "ck2 string, grp string, cid long")


def _full_chain(spark, a, b, c, mm=False):
    fa, fb, fc = txn.read(spark, a), txn.read(spark, b), txn.read(spark, c)
    j = fa.join(fb, fa["ak"] == fb["bk"]).join(fc, F.col("ck") == fc["ck2"])
    aggs = [
        F.count(F.lit(1)).cast("long").alias("mv_n"),
        F.sum(F.coalesce("av", F.lit(0))).alias("sum_av"),
    ]
    if mm:
        aggs += [F.min("av").alias("min_av"), F.max("av").alias("max_av")]
    return j.groupBy("grp").agg(*aggs)


def _chain3(spark, base, mv, a_rows, b_rows, c_rows, mm=False, keep=5):
    a, b, c = base + "_a", base + "_b", base + "_c"
    txn.commit(_mk_a(spark, a_rows), a, keep_versions=keep)
    txn.commit(_mk_bmid(spark, b_rows), b, keep_versions=keep)
    txn.commit(_mk_c(spark, c_rows), c, keep_versions=keep)
    kw = (
        dict(mins={"min_av": "av"}, maxs={"max_av": "av"}) if mm else {}
    )
    matview.create_join_chain(
        spark, [a, b, c], mv,
        on=[[("ak", "bk")], [("ck", "ck2")]],
        keys=["grp"], sums={"sum_av": "av"}, **kw,
    )
    return a, b, c


def test_join_chain3_tracks_every_side(spark, paths):
    """The 3-table product rule: each table moved singly (1 term), then
    all three in one window (7 terms incl. the triple-delta product),
    always matching the full recompute."""
    base, mv = paths
    a, b, c = _chain3(
        spark, base, mv,
        [("x", 1, 1), ("x", 5, 2), ("y", 3, 3)],
        [("x", "p", 1), ("y", "q", 2)],
        [("p", "g1", 1), ("q", "g2", 2)],
    )
    _eq(txn.read(spark, mv), _full_chain(spark, a, b, c))

    # head of the chain moves alone
    txn.append_files(_mk_a(spark, [("y", 10, 4)]), a, keep_versions=5)
    info = matview.refresh_join_chain(spark, mv)
    assert info["moved"] == [a] and info["n_terms"] == 1
    _eq(txn.read(spark, mv), _full_chain(spark, a, b, c))

    # middle moves alone (MoR delete severs g2's whole path)
    txn.delete_keys(spark.createDataFrame([(2,)], "bid long"), b, ["bid"],
                    keep_versions=5)
    info = matview.refresh_join_chain(spark, mv)
    assert info["moved"] == [b] and info["n_terms"] == 1
    _eq(txn.read(spark, mv), _full_chain(spark, a, b, c))
    assert txn.read(spark, mv).filter(F.col("grp") == "g2").count() == 0

    # tail moves alone
    txn.append_files(_mk_c(spark, [("r", "g3", 3)]), c, keep_versions=5)
    info = matview.refresh_join_chain(spark, mv)
    assert info["moved"] == [c] and info["n_terms"] == 1
    _eq(txn.read(spark, mv), _full_chain(spark, a, b, c))

    # ALL THREE move before one refresh: a brand-new (fact, mid, dim)
    # path exists ONLY in the dA ⋈ dB ⋈ dC triple product term
    txn.append_files(_mk_a(spark, [("z", 100, 5)]), a, keep_versions=5)
    txn.append_files(_mk_bmid(spark, [("z", "r", 3)]), b, keep_versions=5)
    txn.append_files(_mk_c(spark, [("s", "g4", 4)]), c, keep_versions=5)
    info = matview.refresh_join_chain(spark, mv)
    assert sorted(info["moved"]) == sorted([a, b, c])
    assert info["n_terms"] == 7
    _eq(txn.read(spark, mv), _full_chain(spark, a, b, c))
    assert txn.read(spark, mv).filter(
        (F.col("grp") == "g3") & (F.col("sum_av") == 100)
    ).count() == 1
    assert matview.refresh_join_chain(spark, mv)["mode"] == "noop"


def test_join_chain3_minmax_touch_rule_and_resurrect_guard(spark, paths):
    """MIN/MAX over the chain: (1) deleting the fact row carrying a
    group's MIN re-derives it from the pinned NEW 3-way join; (2) the
    retract x retract product rows from simultaneous multi-table deletes
    must not resurrect an extreme."""
    base, mv = paths
    a, b, c = _chain3(
        spark, base, mv,
        [("x", 1, 1), ("x", 9, 2), ("y", 4, 3)],
        [("x", "p", 1), ("y", "p", 2)],
        [("p", "g1", 1)],
        mm=True,
    )
    _eq_n(txn.read(spark, mv), _full_chain(spark, a, b, c, mm=True))
    # delete g1's MIN carrier (av=1) at the fact AND its mid-table link
    # in the same window: the dA x dB product emits (av=1) with weight
    # +1 — a naive least/greatest merge would keep min_av=1
    txn.delete_keys(spark.createDataFrame([(1,)], "aid long"), a, ["aid"],
                    keep_versions=5)
    txn.delete_keys(spark.createDataFrame([(1,)], "bid long"), b, ["bid"],
                    keep_versions=5)
    info = matview.refresh_join_chain(spark, mv)
    assert info["n_terms"] == 3
    got = {r.grp: (r.mv_n, r.sum_av, r.min_av, r.max_av)
           for r in txn.read(spark, mv).collect()}
    # only (y,4) survives: aid=2's x-link died with bid=1
    assert got == {"g1": (1, 4, 4, 4)}
    _eq_n(txn.read(spark, mv), _full_chain(spark, a, b, c, mm=True))
    # append-only afterwards: the cheap merge path, still correct
    txn.append_files(_mk_a(spark, [("y", 2, 10)]), a, keep_versions=5)
    matview.refresh_join_chain(spark, mv)
    _eq_n(txn.read(spark, mv), _full_chain(spark, a, b, c, mm=True))


def test_join_chain_guards_and_fleet_sweep(spark, paths):
    base, mv = paths
    a, b, c = base + "_a", base + "_b", base + "_c"
    txn.commit(_mk_a(spark, [("x", 1, 1)]), a)
    txn.commit(_mk_bmid(spark, [("x", "p", 1)]), b)
    txn.commit(_mk_c(spark, [("p", "g1", 1)]), c)
    with pytest.raises(ValueError, match="at least two"):
        matview.create_join_chain(
            spark, [a], mv, on=[], keys=["grp"], sums={"sum_av": "av"}
        )
    with pytest.raises(ValueError, match="steps"):
        matview.create_join_chain(
            spark, [a, b, c], mv, on=[[("ak", "bk")]], keys=["grp"],
            sums={"sum_av": "av"},
        )
    matview.create_join_chain(
        spark, [a, b, c], mv, on=[[("ak", "bk")], [("ck", "ck2")]],
        keys=["grp"], sums={"sum_av": "av"},
    )
    with pytest.raises(ValueError, match="use refresh_join"):
        matview.refresh(spark, mv)
    with pytest.raises(ValueError, match="not a join view"):
        matview.refresh_join(spark, mv)
    # refresh_all dispatches the chain kind
    root = mv.rsplit("/", 1)[0]
    txn.append_files(_mk_a(spark, [("x", 7, 2)]), a)
    res = matview.refresh_all(spark, root)
    assert res[mv]["mode"] == "join-chain-delta"
    _eq(txn.read(spark, mv), _full_chain(spark, a, b, c))
    # rebase_all skips it like the two-table join kind
    res = matview.rebase_all(spark, root)
    assert res[mv]["reason"] == "join/transform view"


# ---------------------------------------------- NULL group keys --
def _eq_n(a, b):
    """_eq for relations whose key column holds NULLs (None is not
    orderable against str — sort by repr instead)."""
    ka = sorted(map(tuple, a.collect()), key=repr)
    kb = sorted(map(tuple, b.collect()), key=repr)
    assert ka == kb, f"{ka} != {kb}"


def test_null_group_key_single_table_touch_rule(spark, paths):
    """SQL GROUP BY treats NULL as a real group, so the view's key joins
    must be null-safe (advisor r10: plain equi-joins dropped a
    NULL-keyed group at create and left its extreme stale on refresh).
    Exercises _mm_merge's full_outer, the touch-rule probe left join,
    the semi/anti affected-group restriction, and the final merge join
    — all through one create + one MoR refresh on a NULL-keyed group."""
    base, mv = paths
    rows = [("a", 1, 1), (None, 5, 2), (None, 9, 3), (None, 7, 4)]
    txn.commit(_mk(spark, rows), base, keep_versions=5)
    matview.create(
        spark, base, mv, ["k"], {"sum_v": "v"},
        mins={"min_v": "v"}, maxs={"max_v": "v"},
    )
    _eq_n(txn.read(spark, mv), _full_mm(spark, base))
    # delete the NULL group's MAX (id=3, v=9): the touch rule must reach
    # the NULL-keyed group and re-derive max_v=7 from the base
    txn.delete_keys(spark.createDataFrame([(3,)], "id long"), base, ["id"])
    matview.refresh(spark, mv)
    got = {r.k: (r.mv_n, r.sum_v, r.min_v, r.max_v)
           for r in txn.read(spark, mv).collect()}
    assert got[None] == (2, 12, 5, 7)
    _eq_n(txn.read(spark, mv), _full_mm(spark, base))


def test_null_group_key_join_view(spark, paths):
    """The two-table join view with a NULL group key (dim row whose grp
    is NULL): present at create, extreme re-derived on a fact retract."""
    base, mv = paths
    a, b = _mm_join_view(
        spark, base, mv,
        [("x", 1, 1), ("x", 9, 2), ("y", 3, 3)],
        [("x", None, 1), ("y", "g2", 2)],
    )
    _eq_n(txn.read(spark, mv), _full_join_mm(spark, a, b))
    assert txn.read(spark, mv).filter(F.col("grp").isNull()).count() == 1
    # retract the NULL group's MAX carrier (aid=2, av=9)
    txn.delete_keys(spark.createDataFrame([(2,)], "aid long"), a, ["aid"])
    matview.refresh_join(spark, mv)
    got = {r.grp: (r.mv_n, r.sum_av, r.min_av, r.max_av)
           for r in txn.read(spark, mv).collect()}
    assert got[None] == (1, 1, 1, 1)
    _eq_n(txn.read(spark, mv), _full_join_mm(spark, a, b))


def test_null_group_key_chain_view(spark, paths):
    """The N-table chain replicates the two-table tail; a NULL-keyed
    group must survive create and the touch-rule refresh there too."""
    base, mv = paths
    a, b, c = _chain3(
        spark, base, mv,
        [("x", 1, 1), ("x", 9, 2), ("y", 4, 3)],
        [("x", "p", 1), ("y", "p", 2)],
        [("p", None, 1)],
        mm=True,
    )
    _eq_n(txn.read(spark, mv), _full_chain(spark, a, b, c, mm=True))
    txn.delete_keys(spark.createDataFrame([(2,)], "aid long"), a, ["aid"],
                    keep_versions=5)
    matview.refresh_join_chain(spark, mv)
    got = {r.grp: (r.mv_n, r.sum_av, r.min_av, r.max_av)
           for r in txn.read(spark, mv).collect()}
    assert got == {None: (2, 5, 1, 4)}
    _eq_n(txn.read(spark, mv), _full_chain(spark, a, b, c, mm=True))


# -------------------------------------------- manifest-aware CDC (mor) --
def test_mor_window_mixed_append_and_delete(spark, paths):
    """A window holding BOTH an append and a MoR key delete takes the
    manifest-aware path (r11): ins = delta files, dels = old snapshot
    broadcast-semi-joined on the added delete keys — no exceptAll
    exchange — and the refreshed view equals the full re-aggregate,
    MIN/MAX touch rule included."""
    base, mv = paths
    rows = [("a", 1, 1), ("a", 9, 2), ("b", 6, 3), ("b", 8, 4)]
    txn.commit(_mk(spark, rows), base, keep_versions=5)
    matview.create(
        spark, base, mv, ["k"], {"sum_v": "v"},
        mins={"min_v": "v"}, maxs={"max_v": "v"},
    )
    txn.append_files(_mk(spark, [("a", 4, 5), ("c", 7, 6)]), base,
                     keep_versions=5)
    txn.delete_keys(spark.createDataFrame([(2,), (3,)], "id long"),
                    base, ["id"], keep_versions=5)
    info = matview.refresh(spark, mv)
    assert info["mode"] == "mor"
    got = {r.k: (r.mv_n, r.sum_v, r.min_v, r.max_v)
           for r in txn.read(spark, mv).collect()}
    # a: {1,4} (9 deleted - the MAX carrier, touch rule re-derives);
    # b: {8}; c: {7}
    assert got == {"a": (2, 5, 1, 4), "b": (1, 8, 8, 8),
                   "c": (1, 7, 7, 7)}
    _eq(txn.read(spark, mv), _full_mm(spark, base))


def test_mor_delete_then_reinsert_identical_row(spark, paths):
    """Delete a key and re-append a bit-identical row in ONE window: the
    mor delta emits a canceling (+row, -row) pair exceptAll would have
    netted out; every consumer is linear (or touch-rule conservative),
    so the view still equals the full re-aggregate."""
    base, mv = paths
    txn.commit(_mk(spark, [("a", 1, 1), ("a", 9, 2), ("b", 3, 3)]),
               base, keep_versions=5)
    matview.create(
        spark, base, mv, ["k"], {"sum_v": "v"},
        mins={"min_v": "v"}, maxs={"max_v": "v"},
    )
    txn.delete_keys(spark.createDataFrame([(2,)], "id long"), base,
                    ["id"], keep_versions=5)
    txn.append_files(_mk(spark, [("a", 9, 2)]), base, keep_versions=5)
    info = matview.refresh(spark, mv)
    assert info["mode"] == "mor"
    got = {r.k: (r.mv_n, r.sum_v, r.min_v, r.max_v)
           for r in txn.read(spark, mv).collect()}
    assert got == {"a": (2, 10, 1, 9), "b": (1, 3, 3, 3)}
    _eq(txn.read(spark, mv), _full_mm(spark, base))


def test_positional_delete_window_falls_back_to_diff(spark, paths):
    """Positional deletes address (file, ordinal), not keys — the mor
    path cannot replay them as a key semi-join, so the window must fall
    back to the exceptAll diff and still produce the right view."""
    base, mv = paths
    txn.commit(_mk(spark, [("a", 5, 1), ("a", 5, 1), ("b", 3, 2)]),
               base, keep_versions=5)
    matview.create(spark, base, mv, ["k"], {"sum_v": "v"})
    # kill ONE copy of the duplicated (a, 5, 1) row
    addressed = txn._read_with_deletes(
        spark, base, txn._load_manifest(
            base, txn._read_pointer(base, txn._fs_for(base)),
            txn._fs_for(base)),
        keep_pos=True,
    ).filter((F.col("k") == "a") & (F.col("v") == 5))
    one = addressed.select(
        F.col("__pd_file").alias("target_file"),
        F.col("__pd_pos").alias("pos"),
    ).limit(1)
    txn.delete_positions(one, base, keep_versions=5)
    info = matview.refresh(spark, mv)
    assert info["mode"] == "diff"
    got = {r.k: (r.mv_n, r.sum_v) for r in txn.read(spark, mv).collect()}
    assert got == {"a": (1, 5), "b": (1, 3)}
    _eq(txn.read(spark, mv), _full(spark, base))
