"""Structural sweep over every bench lane: one noop execution each,
recording build/exec wall, jobs, stages, tasks. Flags serial lanes
(tasks ~= stages with non-trivial exec) and build-heavy lanes (driver
time before the first action). Wall numbers are single-run — use the
deterministic counters for decisions, bench.py for timing claims."""

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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("lane_structure_sweep", cpus=int(cpus),
                      shuffle_partitions=int(cpus))
    sc = spark.sparkContext
    registry = Q.queries()
    registry["q1_pricing_summary"](spark, sf_dir).count()
    out = {}
    for name in bench.HEADLINE + bench.EXTENDED:
        spark.catalog.clearCache()
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = registry[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        st = sc.statusTracker()
        jobs = st.getJobIdsForGroup(name)
        stages = set()
        for j in jobs:
            ji = st.getJobInfo(j)
            if ji:
                stages.update(ji.stageIds)
        tasks = 0
        for s in stages:
            si = st.getStageInfo(s)
            if si:
                tasks += si.numTasks
        out[name] = {
            "build": round(t1 - t0, 3), "exec": round(t2 - t1, 3),
            "jobs": len(jobs), "stages": len(stages), "tasks": tasks,
        }
        print(name, out[name], file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
