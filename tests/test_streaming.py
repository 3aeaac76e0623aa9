"""Streaming surface tests: windowed counts, session windows, and the
custom stateful operator — each driven to completion on the finite events
table and cross-checked against its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_etl_spark import catalog, streaming


def test_windowed_counts_match_batch(spark, sf_dir):
    stream = streaming.read_events_stream(spark, sf_dir)
    result = streaming.run_to_completion(
        streaming.windowed_counts(stream), "t_windowed"
    )
    batch = (
        catalog.load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {
        (str(r.window_start), r.event_type): r.n_events for r in result.collect()
    }
    want = {
        (str(r.window_start), r.event_type): r.n_events for r in batch.collect()
    }
    assert got == want


def test_session_window_stream(spark, sf_dir):
    stream = streaming.read_events_stream(spark, sf_dir)
    result = streaming.run_to_completion(
        streaming.sessionize_stream(stream), "t_sessions"
    )
    rows = result.collect()
    assert len(rows) > 0
    # session bounds are sane and event counts positive
    assert all(r.session_start <= r.session_end and r.n_events > 0 for r in rows)
    # total events across sessions == table size
    assert sum(r.n_events for r in rows) == catalog.load_table(
        spark, sf_dir, "events"
    ).count()


def test_stateful_running_totals(spark, sf_dir):
    stream = streaming.read_events_stream(spark, sf_dir)
    result = streaming.run_to_completion(
        streaming.running_user_totals(stream), "t_state", output_mode="update"
    )
    # final state per user == batch aggregate
    batch = (
        catalog.load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    want = {r.user_id: (r.n, r.v) for r in batch.collect()}
    got = {}
    for r in result.collect():  # update mode: take the last emission per user
        got[r.user_id] = (r.n_events, r.total_value)
    assert got == want


def test_foreach_batch_parquet_sink_exactly_once(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = streaming.read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "value"
    )
    streaming.write_stream_to_parquet(stream, out, ckpt)
    n_batch = catalog.load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(out).count() == n_batch

    # second run against the same checkpoint: source offsets are committed,
    # nothing re-processes, sink row count unchanged
    stream2 = streaming.read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "value"
    )
    streaming.write_stream_to_parquet(stream2, out, ckpt)
    assert spark.read.parquet(out).count() == n_batch


def test_exactly_once_sink_replay_is_idempotent(spark, tmp_path, sf_dir):
    """A replayed micro-batch must not duplicate rows: the batch-keyed
    overwrite partition makes the foreachBatch write idempotent."""
    from airflow_etl_spark import streaming

    out = str(tmp_path / "eo_out")
    ckpt = str(tmp_path / "eo_ckpt")
    stream = streaming.read_table_stream(spark, sf_dir, "region")
    streaming.write_stream_exactly_once(stream, out, ckpt)
    df = spark.read.parquet(out)
    n = df.count()
    assert n == spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # simulate the crash-replay: re-write batch 0's partition by hand with
    # the same batch content — the count must not change (materialized
    # first: the replayed writer is re-computing from SOURCE, not from the
    # sink it is about to overwrite)
    b0 = df.filter(df.batch_id == 0).drop("batch_id")
    replay = spark.createDataFrame(b0.collect(), b0.schema)
    replay.write.mode("overwrite").parquet(out + "/batch_id=0")
    assert spark.read.parquet(out).count() == n


def test_warehouse_catalog_listing(spark, tmp_path):
    from airflow_etl_spark import catalog
    from airflow_etl_spark.sources import txn

    wh = str(tmp_path / "wh_cat")
    txn.commit(spark.range(10), f"{wh}/raw_vault/hub_x")
    txn.commit(spark.range(5), f"{wh}/raw_vault/hub_x")  # second version
    spark.range(7).write.parquet(f"{wh}/staging/src__t")  # plain layout
    rows = {(r.schema_name, r.table_name): r
            for r in catalog.list_warehouse_tables(spark, wh).collect()}
    hub = rows[("raw_vault", "hub_x")]
    assert hub.layout == "versioned" and hub.n_versions == 2 and hub.n_bytes > 0
    stg = rows[("staging", "src__t")]
    assert stg.layout == "plain" and stg.n_versions == 0


def test_interval_join_matches_batch_and_bounds_state(spark, sf_dir):
    """Stream-stream interval join parity: driven to completion it must
    equal the batch interval join; the physical plan must be the
    symmetric hash join with a watermark-derived state cleanup condition
    (the property that bounds state at scale)."""
    from airflow_etl_spark import streaming

    views = streaming.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "view"
    )
    clicks = streaming.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    joined = streaming.interval_join(
        views, clicks, within="1 hour", watermark="40 days"
    )
    got = streaming.run_to_completion(
        joined, "t_ij_out", output_mode="append"
    ).select("l_event_id", "r_event_id")
    got_set = {(r.l_event_id, r.r_event_id) for r in got.collect()}

    from airflow_etl_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), F.col("user_id").alias("u"),
        F.col("ts").alias("vts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    batch = v.join(
        c,
        (F.col("u") == F.col("cu"))
        & (F.col("cts") >= F.col("vts"))
        & (F.col("cts") <= F.col("vts") + F.expr("INTERVAL 1 hour")),
    )
    batch_set = {(r.vid, r.cid) for r in batch.collect()}
    assert got_set == batch_set and len(got_set) > 0


def test_mor_sink_kill_and_resume_exactly_once(spark, tmp_path, monkeypatch):
    """Crash-recovery proof for write_stream_upsert_mor (VERDICT r4 #8):
    the stream DIES in the worst window — after a micro-batch's table
    commit, before the engine commits the source offsets — then restarts
    from the checkpoint. The replayed batch re-applies through
    upsert_mor, whose delete+insert of its own keys is a semantic no-op
    on replay, so the final table holds every key exactly once. Until
    now the exactly-once claim rested on checkpoint+txn reasoning, not a
    crash test."""
    import pytest

    from airflow_etl_spark.sources import read_table, txn

    src = str(tmp_path / "cdc_src")
    table = str(tmp_path / "mor_table")
    ckpt = str(tmp_path / "mor_ckpt")

    # three single-file micro-batches with disjoint key ranges
    for i, lo in enumerate([0, 10, 20]):
        spark.range(lo, lo + 10).selectExpr(
            "id AS k", f"id * 100 + {i} AS v"
        ).coalesce(1).write.parquet(f"{src}/f{i}")

    def read_stream():
        return (
            spark.readStream.schema("k long, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )

    # arm the crash: the FIRST upsert_mor call commits the table, then
    # the process "dies" before foreachBatch returns — i.e. before the
    # streaming engine records the batch as done
    real_upsert = txn.upsert_mor
    armed = {"on": True}

    def crash_after_commit(batch_df, path, key_cols, **kw):
        out = real_upsert(batch_df, path, key_cols, **kw)
        if armed["on"]:
            armed["on"] = False
            raise RuntimeError("injected crash after table commit")
        return out

    monkeypatch.setattr(txn, "upsert_mor", crash_after_commit)
    with pytest.raises(Exception, match="injected crash"):
        streaming.write_stream_upsert_mor(
            read_stream(), table, ["k"], ckpt, query_name="mor_kill_a"
        )
    monkeypatch.undo()

    # the crashed batch's rows ARE in the table (commit preceded the
    # crash) — the dangerous state a naive sink would double-apply
    n_mid = read_table(spark, table).count()
    assert n_mid >= 20

    # restart from the same checkpoint: the uncommitted batch replays,
    # remaining batches drain
    streaming.write_stream_upsert_mor(
        read_stream(), table, ["k"], ckpt, query_name="mor_kill_b"
    )
    rows = read_table(spark, table).collect()
    assert sorted(r["k"] for r in rows) == list(range(30))  # no dup, no loss
    by_k = {r["k"]: r["v"] for r in rows}
    assert all(by_k[k] // 100 == k for k in range(30))  # values intact


def test_windowed_psi_scores_silent_bins(spark):
    """A bin with traffic in the reference but NONE in some window must
    still surface with the eps share — silence is drift; and per-window
    shares must normalize within each window independently."""
    import math

    from airflow_etl_spark.operators import drift

    counts = spark.createDataFrame(
        [("2024-01-01", 0, 3), ("2024-01-01", 1, 1),
         ("2024-01-02", 0, 2)],
        "window_start string, bin int, n long",
    )
    ref = spark.createDataFrame(
        [(0, 0.5), (1, 0.5)], "bin int, p double"
    )
    out = {(r.window_start, r.bin): r for r in
           drift.windowed_psi(counts, ref).collect()}
    assert out[("2024-01-01", 0)].cur_share == 0.75
    assert out[("2024-01-01", 1)].cur_share == 0.25
    # day 2: bin 1 silent -> eps share, large positive psi term
    assert out[("2024-01-02", 1)].cur_share == 0.0  # rounded eps
    exp = round((1e-6 - 0.5) * math.log(1e-6 / 0.5), 6)
    assert out[("2024-01-02", 1)].psi_term == exp
    assert out[("2024-01-02", 0)].cur_share == 1.0


def test_stream_psi_monitor_equals_batch(spark, sf_dir):
    """The streaming monitor driven to completion must equal the batch
    computation of the same windows (finite-source determinism)."""
    from airflow_etl_spark import queries as Q
    from airflow_etl_spark import catalog as C
    from airflow_etl_spark.operators import drift
    from airflow_etl_spark.queries import PSI_EDGES

    got = {(r.window_start, r.bin): (r.ref_share, r.cur_share, r.psi_term)
           for r in Q.queries()["stream_psi_monitor"](spark, sf_dir).collect()}
    ev = C.load_table(spark, sf_dir, "events")
    ref = drift.bin_shares(
        ev.filter(F.col("event_type") == "view"), "value", PSI_EDGES
    )
    elit = F.array(*[F.lit(e) for e in PSI_EDGES])
    batch_counts = (
        ev.filter(F.col("event_type") == "purchase")
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"),
                          "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.size(F.filter(elit, lambda e:
                            F.col("value").cast("double") >= e)).alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    want = {(r.window_start, r.bin): (r.ref_share, r.cur_share, r.psi_term)
            for r in drift.windowed_psi(batch_counts, ref).collect()}
    assert got == want


# ------------------------------------------- continuous aggregate (r7) --
def test_ivm_sink_batch_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (crash between partition write and offset
    commit — the foreachBatch at-least-once window) must leave the view
    exactly once: the batch overwrites its own base partition and the
    refresh retracts/re-adds through the differential path."""
    from airflow_etl_spark.operators import matview
    from airflow_etl_spark.sources import txn
    from airflow_etl_spark.streaming import ivm_apply_batch

    base, mv = str(tmp_path / "base"), str(tmp_path / "mv")
    keys, sums = ["k"], {"sum_v": "v"}
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    b1 = spark.createDataFrame([("a", 10), ("c", 3)], "k string, v long")
    ivm_apply_batch(b0, 0, base, mv, keys, sums)
    ivm_apply_batch(b1, 1, base, mv, keys, sums)
    once = sorted(map(tuple, txn.read(spark, mv).collect()))
    # replay batch 1 (same id, same content), then a late batch 2
    ivm_apply_batch(b1, 1, base, mv, keys, sums)
    assert sorted(map(tuple, txn.read(spark, mv).collect())) == once
    ivm_apply_batch(
        spark.createDataFrame([("b", 5)], "k string, v long"), 2, base, mv,
        keys, sums,
    )
    got = {r["k"]: (r["mv_n"], r["sum_v"]) for r in txn.read(spark, mv).collect()}
    assert got == {"a": (2, 11), "b": (2, 7), "c": (1, 3)}
    # and the view still equals the full recompute over the base
    full = {
        r["k"]: (r["n"], r["s"])
        for r in txn.read(spark, base)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == full


def test_stream_ohlc_equals_batch_rollup(spark, sf_dir):
    """Stream/batch consistency: the watermarked streaming bars driven
    to completion must equal operators/timeseries.resample_ohlc on the
    same events — same total-order key, same combinable aggregates."""
    from pyspark.sql import functions as F

    from airflow_etl_spark import catalog, streaming
    from airflow_etl_spark.operators.timeseries import resample_ohlc

    stream = streaming.read_events_stream(spark, sf_dir)
    got = streaming.run_to_completion(
        streaming.windowed_ohlc(stream, watermark="40 days"),
        "stream_ohlc_test_out",
    )
    ev = catalog.load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )
    want = resample_ohlc(ev, "ts", "v", ["event_type"], "event_id", "day")

    def rows(df):
        return sorted(
            (r.bucket_start, r.event_type, r.open_v, r.high_v, r.low_v,
             r.close_v, r.n, r.sum_v)
            for r in df.collect()
        )

    assert rows(got) == rows(want)
