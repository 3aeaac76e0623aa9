"""Mass-delete MoR refresh bench (r12, VERDICT r11 #8 stretch).

r11's manifest-aware CDC claim — "the last O(table) refresh term is
gone" — was measured on routine (small) delete windows. This probe
measures the WORST case: a delete window covering ~50% of the base
table, refreshed three ways:

  mor        delta_between mode 'mor' as shipped (r12: the delete-key
             broadcast is byte-gated — at this key volume the file is
             still far under the 64 MB budget, so the semi-join
             broadcasts);
  mor-shuffle the same CDC path with the byte budget forced to zero —
             the shape a TRULY table-sized delete file takes (shuffle
             semi/anti joins);
  diff       the full-width exceptAll fallback the CDC path replaced,
             replicated exactly as matview.delta_between's last branch
             computes it (new.exceptAll(old) / old.exceptAll(new)).

Each variant materializes ins+dels through the noop sink (fresh plans,
min of N runs). Run on an idle host:

    python scripts/mor_mass_delete_bench.py [--factor 10] [--runs 2]

`--factor N` unions N key-shifted copies of sf0.1 orders (1.5 M rows at
the default 10) so the diff path's table-width exchanges are visible
over job overhead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from airflow_etl_spark import get_spark
    from airflow_etl_spark.operators import core as C, matview
    from airflow_etl_spark.sources import txn

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("afes_mor_mass_delete", cpus=cpus,
                      shuffle_partitions=cpus)

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    orders = spark.read.parquet(f"{src}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    copies = spark.range(args.factor).select(F.col("id").alias("copy"))
    big = (
        orders.repartition(32)
        .crossJoin(F.broadcast(copies))  # bound: --factor literal rows
        .select(
            (F.col("o_orderkey") + F.col("copy") * F.lit(1_000_000_000))
            .alias("o_orderkey"),
            "o_custkey", "o_totalprice", "o_orderdate",
        )
    )

    root = tempfile.mkdtemp(prefix="mor_mass_")
    base = os.path.join(root, "orders")
    txn.commit(big, base, keep_versions=4)
    v0 = txn._read_pointer(base)
    n_total = txn.read(spark, base).count()

    # the mass delete: every even orderkey (~50% of the table), as ONE
    # equality-delete window — the worst case the byte gate exists for
    keys = txn.read(spark, base).filter(
        F.col("o_orderkey") % 2 == 0
    ).select("o_orderkey")
    txn.delete_keys(keys, base, ["o_orderkey"], keep_versions=4)
    fs = txn._fs_for(base)
    m = txn._load_manifest(base, txn._read_pointer(base, fs), fs)
    del_bytes = sum(d.get("bytes", 0) for d in (m.get("deletes") or []))
    print(f"# table rows: {n_total}; delete-file bytes: {del_bytes}",
          file=sys.stderr)

    def timed(label, build):
        per = []
        for _ in range(max(1, args.runs)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            ins, dels, mode, _ = build()
            ins.write.format("noop").mode("overwrite").save()
            if dels is not None:
                dels.write.format("noop").mode("overwrite").save()
            per.append(round(time.perf_counter() - t0, 3))
        print(f"# {label} (mode={mode}): min {min(per)}s of {per}",
              file=sys.stderr)
        return min(per), mode

    def mor():
        return matview.delta_between(spark, base, v0)

    def mor_shuffle():
        saved = C.BROADCAST_MAX_BYTES
        C.BROADCAST_MAX_BYTES = 0
        try:
            return matview.delta_between(spark, base, v0)
        finally:
            C.BROADCAST_MAX_BYTES = saved

    def diff():
        old = txn.read_named_version(spark, base, v0)
        new = txn.read(spark, base)
        return new.exceptAll(old), old.exceptAll(new), "diff", 0

    out = {}
    for label, build in (("mor", mor), ("mor_shuffle", mor_shuffle),
                         ("diff", diff)):
        t, mode = timed(label, build)
        out[label] = {"sec": t, "mode": mode}
    out["rows"] = n_total
    out["delete_file_bytes"] = del_bytes
    print(json.dumps(out))


if __name__ == "__main__":
    main()
