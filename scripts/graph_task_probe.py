"""Deterministic probe: total jobs/stages/tasks per graph-lane execution
(noop sink), plus final-plan scan/shuffle-stage counts. Task counts are
noise-free on a fixed tree + fixed SF, so they discriminate plan shapes
when wall-clock is steal-contaminated."""

from __future__ import annotations

import json
import os
import sys

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
    spark = get_spark("graph_task_probe", cpus=32, shuffle_partitions=32)
    sc = spark.sparkContext
    registry = Q.queries()
    registry["q1_pricing_summary"](spark, sf_dir).count()
    out = {}
    for name in LANES:
        spark.catalog.clearCache()
        sc.setJobGroup(name, name)
        df = registry[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        st = sc.statusTracker()
        jobs = st.getJobIdsForGroup(name)
        stages = set()
        for j in jobs:
            ji = st.getJobInfo(j)
            if ji:
                stages.update(ji.stageIds)
        tasks = 0
        nstages = 0
        for s in stages:
            si = st.getStageInfo(s)
            if si and si.numCompletedTasks > 0 or (si and si.numTasks > 0):
                nstages += 1
                tasks += si.numTasks
        out[name] = {"jobs": len(jobs), "stages": nstages, "tasks": tasks}
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
