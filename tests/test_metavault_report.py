"""Unit tests for the meta-vault sync and reporting layers against a small
synthetic dbt-style model tree (FIXTURES.md §5 companion fixture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_etl_spark import metavault, report


MODELS = [
    # folder, model_name, description, column_name
    ("01_Customer_Relationship", "hub_customer", "customer hub", "customer_hash_key"),
    ("01_Customer_Relationship", "hub_customer", "customer hub", "c_custkey"),
    ("01_Customer_Relationship", "hub_customer", "customer hub", "load_date"),
    ("01_Customer_Relationship", "satellite_customer", "cust sat", "customer_hash_key"),
    ("01_Customer_Relationship", "satellite_customer", "cust sat", "c_name"),
    ("01_Customer_Relationship", "satellite_customer", "cust sat", "load_end_date"),
    ("02_Sales", "hub_order", "order hub", "order_hash_key"),
    ("02_Sales", "link_customer_order", "c-o link", "customer_order_hash_key"),
    ("02_Sales", "link_customer_order", "c-o link", "customer_hash_key"),
    ("02_Sales", "link_customer_order", "c-o link", "order_hash_key"),
    ("02_Sales", "link_customer_order", "c-o link", "record_source"),
]
MODELS_SCHEMA = "folder string, model_name string, description string, column_name string"


def models_df(spark, rows=MODELS):
    return spark.createDataFrame(rows, MODELS_SCHEMA)


def rows(df, *cols):
    out = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in out.collect())


def test_concepts_and_hub_concept_sync(spark):
    m = models_df(spark)
    assert rows(metavault.concepts_from_folders(m)) == [
        ("Customer_Relationship",), ("Sales",),
    ]
    hub = spark.createDataFrame([("Sales",), ("Legacy",)], "concept_name string")
    out = metavault.sync_hub_concept(hub, m)
    assert rows(out) == [("Customer_Relationship",), ("Legacy",), ("Sales",)]


def test_entity_hub_sync_updates_description(spark):
    m = models_df(spark)
    hub = spark.createDataFrame(
        [("hub_customer", "old description")],
        "hub_name string, hub_description string",
    )
    out = metavault.sync_entity_hub(hub, m, "hub")
    assert rows(out) == [
        ("hub_customer", "customer hub"), ("hub_order", "order hub"),
    ]


def test_link_concept_entity_lifecycle(spark):
    m = models_df(spark)
    link = spark.createDataFrame(
        [
            ("Customer_Relationship", "hub_customer", 1),
            ("Legacy", "hub_gone", 1),  # vanished → deactivate
        ],
        "concept_name string, entity_name string, active_status int",
    )
    out = metavault.sync_link_concept_entity(link, m)
    got = {(r[0], r[1]): r[2] for r in out.collect()}
    assert got[("Legacy", "hub_gone")] == 0
    assert got[("Customer_Relationship", "hub_customer")] == 1
    assert got[("Customer_Relationship", "satellite_customer")] == 1
    assert got[("Sales", "link_customer_order")] == 1


def test_hash_key_relationship_inference(spark):
    m = models_df(spark)
    hub_sat = metavault.hash_key_relationships(m, "satellite", "hub")
    assert rows(hub_sat) == [("hub_customer", "satellite_customer")]
    hub_link = metavault.hash_key_relationships(m, "link", "hub")
    assert rows(hub_link) == [
        ("hub_customer", "link_customer_order"),
        ("hub_order", "link_customer_order"),
    ]


def test_relationship_link_sync(spark):
    pairs = spark.createDataFrame(
        [("hub_customer", "satellite_customer")],
        "hub_name string, satellite_name string",
    )
    tbl = spark.createDataFrame(
        [("hub_old", "satellite_old", 1)],
        "hub_name string, satellite_name string, active_status int",
    )
    out = metavault.sync_relationship_link(tbl, pairs, "hub_name", "satellite_name")
    assert rows(out) == [
        ("hub_customer", "satellite_customer", 1),
        ("hub_old", "satellite_old", 0),
    ]


def test_entity_satellite_lifecycle(spark):
    m = models_df(spark)
    sat = spark.createDataFrame(
        [
            ("hub_customer", "2024-01-01", None, 1, 1),
            ("hub_gone", "2024-01-01", None, 1, 1),
        ],
        "hub_name string, create_date string, retire_date string, "
        "active_status int, in_use int",
    )
    out = metavault.sync_entity_satellite(sat, m, "hub", "2024-02-01")
    got = {r[0]: (r[1], r[2], r[3]) for r in out.collect()}
    assert got["hub_customer"] == ("2024-01-01", None, 1)       # unchanged
    assert got["hub_gone"] == ("2024-01-01", "2024-02-01", 0)   # retired
    assert got["hub_order"] == ("2024-02-01", None, 1)          # new


def test_satellite_attribute_changes(spark):
    prev = models_df(spark)
    curr_rows = [r for r in MODELS if r[3] != "c_name"] + [
        ("01_Customer_Relationship", "satellite_customer", "cust sat", "c_phone"),
    ]
    curr = models_df(spark, curr_rows)
    out = metavault.satellite_attribute_changes(prev, curr, "2024-02-01")
    assert rows(out, "attribute_name", "change_type") == [
        ("c_name", "delete"), ("c_phone", "add"),
    ]
    # technical columns never appear as attribute changes
    assert rows(out.filter(F.col("attribute_name").isin("load_date", "load_end_date"))) == []


def test_checkpoint_rollup_and_totals(spark):
    cp = spark.createDataFrame(
        [
            ("r1", "stg_customer", "staging", "src_a", "2024-01-01", "success"),
            ("r1", "stg_customer", "staging", "src_a", "2024-01-01", "success"),  # dup name
            ("r1", "stg_orders", "staging", "src_a", "2024-01-01", "failed"),
            ("r1", "hub_customer", "raw_vault", "src_a", "2024-01-01", "success"),
        ],
        "run_id string, name string, schema_name string, source_name string, "
        "etl_date string, status string",
    )
    roll = report.checkpoint_rollup(cp)
    got = {(r.source_name, r.schema_name): (r.n_models, r.n_success) for r in roll.collect()}
    assert got == {("src_a", "staging"): (2, 1), ("src_a", "raw_vault"): (1, 1)}
    totals = {r.schema_name: (r.total_models, r.total_success)
              for r in report.rollup_totals(roll).collect()}
    assert totals == {"staging": (2, 1), "raw_vault": (1, 1)}


def test_error_details_and_html(spark):
    st = spark.createDataFrame(
        [
            ("r1", "src_a", "01__src_a__staging", "load", "failed"),
            ("r1", "src_a", "01__src_a__staging", "drift", "success"),
            ("r1", "src_a", "02__src_a__datavault", "Finance", "failed"),
        ],
        "run_id string, source_name string, dag_id string, task_id string, status string",
    )
    det = report.error_details(st)
    assert rows(det, "task_id", "layer") == [
        ("Finance", "datavault"), ("load", "staging"),
    ]
    cnt = {r.dag_id: r.n_errors for r in report.error_counts(st).collect()}
    assert cnt == {"01__src_a__staging": 1, "02__src_a__datavault": 1}

    html = report.to_html_table(det.select("task_id", "layer"))
    assert "<table" in html and "Finance" in html

    body = report.render_template(
        "<p>{{etl_date}}: {{total_staging}}</p>",
        {"etl_date": "2024-01-01", "total_staging": 2},
    )
    assert body == "<p>2024-01-01: 2</p>"

    emails = report.email_rows(
        spark, "r1", "2024-01-01", ["a@x", "b@x"], "ETL_ERROR", "subj", body
    )
    assert emails.count() == 2


# ------------------------------------------------------------- S16 ------

class _MiniSMTPServer:
    """Minimal threaded SMTP server capturing delivered messages — enough
    protocol for stdlib smtplib: greeting, EHLO/HELO, MAIL, RCPT, DATA,
    QUIT."""

    def __init__(self):
        import socket
        import threading

        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]
        self.messages: list[tuple[str, list[str], str]] = []
        self._stop = False
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            with conn:
                f = conn.makefile("rb")
                conn.sendall(b"220 mini ESMTP\r\n")
                sender, rcpts, data = "", [], []
                while True:
                    line = f.readline()
                    if not line:
                        break
                    cmd = line.decode().strip()
                    up = cmd.upper()
                    if up.startswith(("EHLO", "HELO")):
                        conn.sendall(b"250 mini\r\n")
                    elif up.startswith("MAIL FROM:"):
                        sender = cmd[10:].strip("<> ")
                        conn.sendall(b"250 OK\r\n")
                    elif up.startswith("RCPT TO:"):
                        rcpts.append(cmd[8:].strip("<> "))
                        conn.sendall(b"250 OK\r\n")
                    elif up == "DATA":
                        conn.sendall(b"354 go\r\n")
                        while True:
                            dl = f.readline()
                            if dl.rstrip(b"\r\n") == b".":
                                break
                            data.append(dl.decode())
                        self.messages.append((sender, rcpts[:], "".join(data)))
                        rcpts, data = [], []
                        conn.sendall(b"250 queued\r\n")
                    elif up == "QUIT":
                        conn.sendall(b"221 bye\r\n")
                        break
                    else:
                        conn.sendall(b"250 OK\r\n")

    def close(self):
        self._stop = True
        self.sock.close()


def test_smtp_delivery_marks_rows_sent(spark, tmp_path):
    """S16 end-to-end: pending email_notification rows deliver over REAL
    SMTP (stdlib smtplib against an in-process server) and flip to 'sent'
    atomically; a second delivery pass sends nothing."""
    from airflow_etl_spark import report
    from airflow_etl_spark.sources import read_table, txn

    path = str(tmp_path / "email_notification")
    rows = report.email_rows(
        spark, "r9", "2024-06-01", ["a@example.com", "b@example.com"],
        "ETL_COMPLETED", "Pipeline finished", "<b>done</b>",
    )
    txn.append(rows, path)

    server = _MiniSMTPServer()
    try:
        transport = report.SMTPTransport("127.0.0.1", server.port)
        n = report.deliver_pending(spark, path, transport)
        assert n == 2
        import time

        for _ in range(50):
            if len(server.messages) == 2:
                break
            time.sleep(0.1)
        rcpts = sorted(r for _, rs, _ in server.messages for r in rs)
        assert rcpts == ["a@example.com", "b@example.com"]
        assert "Pipeline finished" in server.messages[0][2]
        statuses = [r.status for r in read_table(spark, path).collect()]
        assert statuses == ["sent", "sent"]
        assert report.deliver_pending(spark, path, transport) == 0
    finally:
        server.close()
