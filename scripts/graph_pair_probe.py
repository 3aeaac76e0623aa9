"""Paired probe: time the five graph lanes in THIS tree (sys.path[0]'s
package) through the noop sink, min of N fresh-plan runs — used to settle
the r12 persist-vs-recompute question with both variants run adjacently
on the same host. Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_etl_spark import get_spark  # noqa: E402
from airflow_etl_spark import queries as Q  # noqa: E402

LANES = [
    "graph_neighbor_jaccard",
    "graph_resource_allocation",
    "graph_harmonic_2hop",
    "graph_degree_assortativity",
    "graph_degree_octaves",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("PROBE_RUNS", "4"))
    spark = get_spark("graph_pair_probe", cpus=int(cpus),
                      shuffle_partitions=int(cpus))
    registry = Q.queries()
    registry["q1_pricing_summary"](spark, sf_dir).count()  # warm footers/JIT
    out: dict[str, list[float]] = {}
    for name in LANES:
        fn = registry[name]
        per = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            per.append(round(time.perf_counter() - t0, 3))
        out[name] = per
        print(f"# {name}: min {min(per)} runs {per}", file=sys.stderr)
    print(json.dumps({"tree": sys.path[0], "runs": out,
                      "mins": {k: min(v) for k, v in out.items()}}))


if __name__ == "__main__":
    main()
