"""End-to-end pipeline lifecycle tests (SURVEY.md §7.3 minimum slice):
ledger date queue → staged source → drift check → hub/satellite load →
status rows → latest-status dedup → all-success → date marked success.
Plus workflow-runner semantics: resume-skip, branch, retry, trigger rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_etl_spark import vault
from airflow_etl_spark.ledger import Ledger
from airflow_etl_spark.workflow import DagRunner, Task


@pytest.fixture()
def ledger(spark, tmp_path):
    led = Ledger(spark, str(tmp_path / "warehouse"))
    led.seed_dates(
        [
            ("2024-01-01", 0, "success", 0),
            ("2024-01-02", 1, None, 0),      # holiday — skipped by the queue
            ("2024-01-03", 0, None, 0),      # ← next
            ("2024-01-04", 0, None, 0),
        ]
    )
    return led


def test_date_queue(ledger):
    assert ledger.next_etl_date() == "2024-01-03"
    ledger.mark_date("2024-01-03", "success")
    assert ledger.next_etl_date() == "2024-01-04"


def test_run_protocol_and_latest_status(ledger):
    rid = ledger.start_run("src_a", "2024-01-03", "master")
    ledger.finish_run(rid, "src_a", "2024-01-03", "failed")
    rid2 = ledger.start_run("src_a", "2024-01-03", "master")
    ledger.finish_run(rid2, "src_a", "2024-01-03", "success")
    latest = {
        r.source_name: r.status
        for r in ledger.latest_status_per_source("2024-01-03").collect()
    }
    assert latest == {"src_a": "success"}
    assert ledger.all_sources_green("2024-01-03")


def test_workflow_resume_skip_and_ledger(ledger):
    calls = []

    def work(ctx):
        calls.append(ctx.run_id)
        return "done"

    dag = DagRunner(
        "01__src__staging",
        [
            Task("start"),
            Task("load", fn=work, depends_on=["start"]),
            # the reference's end tasks run regardless (trigger_rule
            # all_done, C10) so a resume-skipped chain still closes out
            Task("end", depends_on=["load"], trigger_rule="all_done"),
        ],
    )
    st1 = dag.run(ledger, "src_a", "2024-01-03")
    assert st1 == {"start": "success", "load": "success", "end": "success"}
    assert len(calls) == 1

    # second run: the work task resume-skips (structural markers re-run free)
    st2 = dag.run(ledger, "src_a", "2024-01-03")
    assert st2 == {"start": "success", "load": "skipped", "end": "success"}
    assert len(calls) == 1  # resume-skip prevented re-execution
    assert ledger.all_sources_green("2024-01-03")


def test_workflow_branch_and_trigger_rules(ledger):
    hits = []

    dag = DagRunner(
        "02__src__branching",
        [
            Task("check", fn=lambda ctx: "notify", is_branch=True),
            Task("notify", fn=lambda ctx: hits.append("notify"), depends_on=["check"]),
            Task("skip_path", fn=lambda ctx: hits.append("skip"), depends_on=["check"]),
            Task("end", depends_on=["notify", "skip_path"], trigger_rule="all_done"),
        ],
    )
    st = dag.run(ledger, "src_b", "2024-01-03")
    assert st["notify"] == "success"
    assert st["skip_path"] == "skipped"
    assert st["end"] == "success"
    assert hits == ["notify"]


def test_workflow_retry_and_failure_gate(ledger):
    attempts = {"n": 0}

    def flaky(ctx):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("boom")
        return "ok"

    dag = DagRunner(
        "03__src__retry",
        [Task("flaky", fn=flaky, retries=2, retry_delay_s=0)],
    )
    st = dag.run(ledger, "src_c", "2024-01-03")
    assert st == {"flaky": "success"}
    assert attempts["n"] == 3

    def always_fail(ctx):
        raise RuntimeError("nope")

    dag2 = DagRunner(
        "04__src__fail",
        [
            Task("bad", fn=always_fail),
            Task("after", fn=lambda ctx: 1, depends_on=["bad"]),
        ],
    )
    st2 = dag2.run(ledger, "src_d", "2024-01-03")
    assert st2 == {"bad": "failed", "after": "upstream_failed"}
    assert not ledger.all_sources_green("2024-01-04")


def test_vault_minimum_slice(spark, ledger, sf_dir):
    """SURVEY §7.3: one source, one day — customer → hub + satellite."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    hub = vault.load_hub(None, customer, ["c_custkey"], "customer",
                         "2024-01-03", "tpch")
    assert hub.count() == customer.select("c_custkey").distinct().count()

    # incremental: re-load with same source adds nothing
    hub2 = vault.load_hub(hub, customer, ["c_custkey"], "customer",
                          "2024-01-04", "tpch")
    assert hub2.count() == hub.count()

    sat = vault.load_satellite(
        None, customer, ["c_custkey"], ["c_name", "c_mktsegment"], "customer",
        "2024-01-03",
    )
    assert sat.filter(F.col("load_end_date").isNotNull()).count() == 0

    # day 2: one customer changes segment → old row closed, new row open
    changed = customer.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") == 1, F.lit("CHANGED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    sat2 = vault.load_satellite(
        sat, changed, ["c_custkey"], ["c_name", "c_mktsegment"], "customer",
        "2024-01-04",
    )
    closed = sat2.filter(F.col("load_end_date").isNotNull())
    assert closed.count() == 1
    opened = sat2.filter(
        (F.col("load_date") == "2024-01-04") & F.col("load_end_date").isNull()
    )
    assert opened.count() == 1
    assert sat2.count() == sat.count() + 1


def test_task_timeout_fails_attempt(ledger):
    import time as _time

    from airflow_etl_spark.workflow import DagRunner, Task

    calls = []

    def slow(ctx):
        calls.append(1)
        _time.sleep(5)
        return "done"

    dag = DagRunner(
        "t__timeout",
        [Task("slow", fn=slow, timeout_s=0.3)],
    )
    st = dag.run(ledger, "src_t", "2024-01-09")
    assert st == {"slow": "failed"}
    assert len(calls) == 1

    # and a fast task under the same timeout succeeds
    dag2 = DagRunner(
        "t__timeout_ok", [Task("fast", fn=lambda ctx: "ok", timeout_s=5.0)]
    )
    assert dag2.run(ledger, "src_t", "2024-01-09") == {"fast": "success"}


def test_trigger_rules_after_branch(ledger):
    """C10: a join task below a deselected branch arm skips under
    none_skipped, runs under all_done, and runs under all_success when at
    least one upstream succeeded."""
    from airflow_etl_spark.workflow import DagRunner, Task

    def build(join_rule):
        return DagRunner(
            f"t__rules_{join_rule}",
            [
                Task("start"),
                Task("pick", fn=lambda ctx: "arm_a", depends_on=["start"],
                     is_branch=True),
                Task("arm_a", fn=lambda ctx: "a", depends_on=["pick"]),
                Task("arm_b", fn=lambda ctx: "b", depends_on=["pick"]),
                Task("join", fn=lambda ctx: "j", depends_on=["arm_a", "arm_b"],
                     trigger_rule=join_rule),
            ],
        )

    st = build("none_skipped").run(ledger, "src_r", "2024-09-01")
    assert st["arm_b"] == "skipped"
    assert st["join"] == "skipped"          # a skipped upstream blocks it

    st = build("all_done").run(ledger, "src_r", "2024-09-02")
    assert st["join"] == "success"          # runs regardless

    st = build("all_success").run(ledger, "src_r", "2024-09-03")
    assert st["join"] == "success"          # one success + one skip → runs


def test_branch_rerun_reapplies_selection(ledger):
    """A branch task is exempt from resume-skip: on re-run it re-applies its
    selection so a previously-chosen arm that failed gets retried."""
    from airflow_etl_spark.workflow import DagRunner, Task

    attempts = []

    def flaky(ctx):
        attempts.append(1)
        if len(attempts) == 1:
            raise RuntimeError("transient")
        return "ok"

    def build():
        return DagRunner(
            "t__branch_rerun",
            [
                Task("pick", fn=lambda ctx: "arm", is_branch=True),
                Task("arm", fn=flaky, depends_on=["pick"]),
            ],
        )

    st1 = build().run(ledger, "src_b", "2024-11-05")
    assert st1 == {"pick": "success", "arm": "failed"}

    st2 = build().run(ledger, "src_b", "2024-11-05")
    assert st2 == {"pick": "success", "arm": "success"}  # retried, not skipped
    assert len(attempts) == 2


def test_claim_next_date_is_exclusive(spark, tmp_path):
    """Concurrent claimants each get a DISTINCT date (atomic pick+mark
    under the table lock); the queue drains to None."""
    from concurrent.futures import ThreadPoolExecutor

    from airflow_etl_spark.ledger import Ledger

    lg = Ledger(spark, str(tmp_path / "claim_lg"))
    lg.seed_dates([
        ("2024-09-01", 0, None, 0), ("2024-09-02", 0, None, 0),
        ("2024-09-03", 1, None, 0),  # holiday — never claimable
        ("2024-09-04", 0, None, 0),
    ])
    with ThreadPoolExecutor(4) as pool:
        claims = list(pool.map(lambda _: lg.claim_next_date(), range(4)))
    got = sorted(c for c in claims if c is not None)
    assert got == ["2024-09-01", "2024-09-02", "2024-09-04"]
    assert claims.count(None) == 1
    assert lg.claim_next_date() is None


def test_staging_drift_absorbed_not_just_reported(spark, tmp_path):
    """VERDICT r2 next-round #4: a source that GAINS a column between two
    etl_dates must still stage (merge_schema commit absorbs the drift);
    the earlier date's rows read the new column as NULL, and drift_check
    both detects the change and folds it into the registry."""
    import os

    from airflow_etl_spark.pipeline import EntityConfig, Pipeline, SourceConfig
    from airflow_etl_spark.sources import read_table

    sf = str(tmp_path / "src")
    os.makedirs(sf)
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(f"{sf}/things.parquet")

    src = SourceConfig(
        name="erp_d", tables=["things"],
        entities=[EntityConfig("thing", "things", ["id"], ["name"])],
    )
    p = Pipeline(spark, str(tmp_path / "wh"), [src], sf)
    p.stage_table(src, "things", "2024-01-01")
    assert not p.drift_check(src, "r1", "2024-01-01")  # first run registers

    # the source gains a column (and a row) before day 2
    spark.createDataFrame(
        [(1, "a", "x@x"), (2, "b", "y@y"), (3, "c", "z@z")],
        "id long, name string, email string",
    ).write.mode("overwrite").parquet(f"{sf}/things.parquet")

    assert p.drift_check(src, "r2", "2024-01-02")  # detected (C5 branch)
    p.stage_table(src, "things", "2024-01-02")     # AND absorbed

    staged = read_table(spark, str(tmp_path / "wh/staging/erp_d__things"))
    assert set(staged.columns) == {"id", "name", "email", "etl_date", "record_source"}
    day1 = staged.filter(F.col("etl_date") == "2024-01-01")
    assert [r.email for r in day1.collect()] == [None, None]
    day2 = staged.filter(F.col("etl_date") == "2024-01-02")
    assert sorted(r.email for r in day2.collect()) == ["x@x", "y@y", "z@z"]
    # re-detection is quiet: the registry accepted the new shape
    assert not p.drift_check(src, "r3", "2024-01-03")

    # and the vault load path runs over the evolved staging table
    p._load_hub_delta("hub_thing", day2, ["id"], "thing", "2024-01-02", "erp_d")
    assert read_table(spark, str(tmp_path / "wh/raw_vault/hub_thing")).count() == 3


def test_restage_same_date_replaces_partition(spark, tmp_path):
    """Re-running a date's staging load must atomically replace exactly
    that date (the dynamic-overwrite contract, now COW through txn)."""
    import os

    from airflow_etl_spark.pipeline import EntityConfig, Pipeline, SourceConfig
    from airflow_etl_spark.sources import read_table

    sf = str(tmp_path / "src")
    os.makedirs(sf)
    spark.createDataFrame([(1,), (2,)], "id long").write.parquet(
        f"{sf}/t.parquet"
    )
    src = SourceConfig(name="s", tables=["t"],
                       entities=[EntityConfig("t", "t", ["id"], [])])
    p = Pipeline(spark, str(tmp_path / "wh"), [src], sf)
    p.stage_table(src, "t", "2024-01-01")
    p.stage_table(src, "t", "2024-01-02")
    p.stage_table(src, "t", "2024-01-02")  # re-run: replaces, not appends
    staged = read_table(spark, str(tmp_path / "wh/staging/s__t"))
    counts = {
        r.etl_date: r.n
        for r in staged.groupBy("etl_date").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"2024-01-01": 2, "2024-01-02": 2}
