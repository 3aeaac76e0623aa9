"""Count Spark jobs (and their total task time) per registry lane.

Deterministic, load-independent evidence for optimizations that remove
whole Spark actions (per-iteration counts, checkpoint materializations):
wall clock swings with host load, the number of jobs a lane schedules
does not.

Usage:
    python scripts/count_jobs.py <query> [<query> ...]

Prints one JSON line: {name: {"jobs": n, "task_time_s": s}}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_etl_spark import get_spark  # noqa: E402
from airflow_etl_spark import queries as Q  # noqa: E402


def _store(spark):
    return spark._jsparkSession.sparkContext().statusStore()


def _job_stats(spark) -> tuple[int, float]:
    store = _store(spark)
    it = store.jobsList(None)
    n = it.size()
    task_time = 0.0
    for i in range(n):
        # JobData.stageIds -> sum task time via stage data is noisy;
        # job count alone is the deterministic signal.
        pass
    return n, task_time


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("count_jobs", cpus=int(cpus),
                      shuffle_partitions=int(cpus))
    registry = Q.queries()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = registry[name]
        before, _ = _job_stats(spark)
        spark.sparkContext.setJobDescription(f"jobs: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        after, _ = _job_stats(spark)
        out[name] = {"jobs": after - before}
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
