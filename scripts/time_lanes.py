"""Targeted lane timer: bench.py's exact methodology (fresh-plan
executions through the noop sink, min + spread reported) for a named
subset of registry queries, bracketed by the jvm canary so readings are
normalizable against full bench runs.

Usage:
    python scripts/time_lanes.py [--runs N] <query> [<query> ...]

Prints one JSON line:
    {"jvm_canary_ratio": ..., "lanes": {name: {"steady": s, "spread_pct": p}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_etl_spark import get_spark  # noqa: E402
from airflow_etl_spark import queries as Q  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "--runs":
        n_runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("time_lanes", cpus=int(cpus),
                      shuffle_partitions=int(cpus))
    registry = Q.queries()
    canary_in = bench._jvm_canary(spark) / bench.JVM_CANARY_REF_S
    lanes: dict[str, dict[str, float]] = {}
    for name in args:
        fn = registry[name]
        runs = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"time: {name} #{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        steady = min(runs)
        lanes[name] = {
            "steady": round(steady, 3),
            "spread_pct": round((max(runs) - steady) / steady, 3),
        }
        print(f"# {name}: {lanes[name]}", file=sys.stderr)
    canary_out = bench._jvm_canary(spark) / bench.JVM_CANARY_REF_S
    print(json.dumps({
        "jvm_canary_ratio_in": round(canary_in, 3),
        "jvm_canary_ratio_out": round(canary_out, 3),
        "lanes": lanes,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
