"""SparkSession factory.

The reference delegates all execution to a remote Trino cluster
(`/root/reference/utlis/etl_manager.py:35-41`); here the equivalent "cluster
handle" is a SparkSession configured for the engine's workload:

- AQE on (runtime coalesce + skew-join handling) — at 100 TB the static
  shuffle-partition count is always wrong for some stage, so let AQE re-plan.
- `spark.sql.shuffle.partitions` sized to cores locally; on a real cluster
  this should be ~2-3x total executor cores (AQE coalesces the excess).
- UTC session timezone so results are comparable across engines (the
  reference pins Asia/Bangkok at the Airflow layer; we expose tz-shift as an
  explicit operator instead — see functions.tz_shift).
- Arrow enabled for the Pandas-UDF extension operators.
- `nanosAsLong` because the synthetic `events` table carries
  TIMESTAMP(NANOS) which Spark's vectorized parquet reader refuses;
  sources.read_events() converts the raw nanos to a proper timestamp.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "airflow_etl_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    `cpus=None` → `local[$SPARK_GRAFT_CPUS]` (default all cores). On a real
    cluster the master URL would come from the environment instead; every
    other setting below is cluster-appropriate as-is.
    """
    if cpus is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS", "*")
    else:
        cpus_s = str(cpus)
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus_s), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.master(f"local[{cpus_s}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # FAIR scheduling so the workflow runner's per-source thread fan-out
        # (pipeline.run max_workers>1) interleaves jobs instead of FIFO
        # head-of-line blocking behind one source's big stage
        .config("spark.scheduler.mode", "FAIR")
        # deterministic string collation / ordering across runs
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
