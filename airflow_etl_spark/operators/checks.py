"""Operational data-quality checks (SURVEY.md §5).

The reference verifies operationally: a row-count reconciliation task
(`check_num_of_records`, dag_etlpipeline__root.py:55-60 — module absent,
semantics inferred), all-success status assertions
(utlis/etl_manager.py:189,245,408), and a hard failure gate
(`check_state_of_dag` raises, :511-548). Reproduced as engine features.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def rowcounts(spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
    """One (table_name, n_rows) row per table — the reconciliation input.
    Counts run as one union-all job (parallel scans), not a driver loop."""
    if not tables:
        return spark.createDataFrame([], "table_name string, n_rows long")
    parts = [
        df.agg(
            F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for name, df in tables.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def reconcile(
    source_counts: DataFrame, target_counts: DataFrame
) -> DataFrame:
    """Row-count reconciliation: join on table_name, flag mismatches."""
    s = source_counts.withColumnRenamed("n_rows", "n_source")
    t = target_counts.withColumnRenamed("n_rows", "n_target")
    return (
        s.join(t, "table_name", "full_outer")
        .select(
            "table_name",
            F.coalesce("n_source", F.lit(0)).alias("n_source"),
            F.coalesce("n_target", F.lit(0)).alias("n_target"),
            (F.coalesce("n_source", F.lit(0)) == F.coalesce("n_target", F.lit(0)))
            .cast("int")
            .alias("is_matched"),
        )
    )


class PipelineStateError(RuntimeError):
    """Raised by assert_all_success — the check_state_of_dag analog."""


def assert_all_success(
    status_df: DataFrame,
    status_col: str = "status",
    ok_values: Sequence[str] = ("success", "skipped"),
) -> None:
    """Raise if any row has a non-OK status (check_state_of_dag semantics,
    utlis/etl_manager.py:511-548). Control-table sized — the aggregate is a
    single tiny job."""
    # NULL status (a task that never reported) is NOT ok: ~isin() is NULL
    # for NULL input and would silently drop the row from the check
    bad = (
        status_df.filter(
            ~F.col(status_col).isin(list(ok_values))
            | F.col(status_col).isNull()
        )
        .limit(1)
        .collect()
    )
    if bad:
        raise PipelineStateError(f"non-success task state found: {bad[0].asDict()}")


def all_success(status_df: DataFrame, status_col: str = "status",
                ok_values: Sequence[str] = ("success", "skipped")) -> bool:
    """Boolean form of the same check (all(status in …) at
    utlis/etl_manager.py:189)."""
    ok_flag = (
        F.col(status_col).isin(list(ok_values)) & F.col(status_col).isNotNull()
    )
    row = status_df.agg(F.min(ok_flag.cast("int")).alias("ok")).collect()[0]
    return row.ok is None or row.ok == 1  # None = empty table → vacuous true


def approx_cardinality(
    df: DataFrame, cols: Sequence[str], group_by: Sequence[str] = (),
    rsd: float = 0.05,
) -> DataFrame:
    """HyperLogLog++ approximate distinct counts — the 100 TB swap-in for
    the exact `count(distinct)` roll-ups (A2): sketch-mergeable, so the
    aggregate stays map-side combinable with O(1/rsd^2) state per group
    instead of a full distinct expand. Oracle-checked queries keep the
    exact form (approximation is nondeterministic across engines by
    construction); tests bound the relative error instead."""
    aggs = [
        F.approx_count_distinct(c, rsd=rsd).alias(f"approx_{c}") for c in cols
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def approx_quantiles(
    df: DataFrame, col: str, probabilities: Sequence[float],
    relative_error: float = 0.01,
) -> list[float]:
    """Greenwald-Khanna approximate quantiles — the scale path for the
    exact percentile queries (a6): single pass, bounded memory."""
    return df.approxQuantile(col, list(probabilities), relative_error)


def expectations(checks: list[tuple[str, DataFrame, Column]]) -> DataFrame:
    """Declarative data-quality expectations — the dbt-test analog
    (unique / not_null / relationships / accepted_values are all "count
    the rows violating a predicate"): each check is (name, frame,
    violation_condition); the result is one row per check with its
    violation count and pass flag.

    Scale shape: each check is an independent filtered count over its
    frame — map-side-combinable aggregates, no cross-check dependency;
    uniqueness checks express the violation as a groupBy-HAVING frame
    upstream (see dq_checks in queries.py), keeping every shuffle on the
    checked key itself."""
    outs = []
    for name, frame, cond in checks:
        outs.append(
            frame.where(cond).agg(
                F.count(F.lit(1)).cast("long").alias("n_violations")
            ).select(
                F.lit(name).alias("check_name"),
                "n_violations",
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def heavy_hitters(
    df: DataFrame, key_col: str, phi: float, capacity: int | None = None
) -> DataFrame:
    """EXACT frequent-key mining with bounded memory: every key whose
    count is >= ceil(phi * N), found without ever shuffling the full key
    space. Two phases:

      1. candidates — per-partition Misra-Gries summaries of `capacity`
         counters each (Arrow `mapInPandas`, vectorized per-batch
         value_counts merged into the counter set). The union of
         partition summaries provably contains every key with global
         count > N / (capacity + 1): a key absent from every summary was
         decremented away, and each decrement round subtracts its delta
         from > capacity counters at once, bounding total decrement mass
         by N / (capacity + 1). `capacity` defaults to ceil(1/phi), which
         makes that bound < ceil(phi * N) — recall is then GUARANTEED,
         so the phase-2 filter returns the exact answer, not an estimate.
      2. verify — exact counts for the candidate keys only: broadcast
         semi-join (candidate set is <= capacity x partitions keys),
         map-side-combined groupBy, threshold at ceil(phi * N).

    Why not a plain groupBy+HAVING: at 100 TB the key space (URLs,
    n-grams, session ids) can be billions of distinct keys — the full
    groupBy shuffles all of them to find the handful above threshold.
    Here the shuffle carries only candidate keys. NULL keys are ignored.
    The threshold uses ceil on the double product phi * N in BOTH engines
    (identical IEEE semantics), matching the DuckDB oracle exactly.

    Reference provenance: no frequency-mining surface in the reference —
    extension per the training-data-pipeline mandate (boilerplate
    detection, hot-key diagnosis); semantics from the public Misra-Gries
    / space-saving literature.
    """
    import math

    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    cap = capacity if capacity is not None else int(math.ceil(1.0 / phi))
    ktype = df.schema[key_col].dataType.simpleString()
    keyed = df.select(F.col(key_col).alias("k")).filter(
        F.col("k").isNotNull()
    )

    def mg(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v, c in pdf["k"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            while len(counters) > cap:
                m = min(counters.values())
                counters = {
                    k2: c2 - m for k2, c2 in counters.items() if c2 > m
                }
        yield pd.DataFrame({"k": list(counters.keys())})

    cands = keyed.mapInPandas(mg, schema=f"k {ktype}").distinct()
    total = df.select(F.count(F.lit(1)).cast("double").alias("t"))
    return (
        keyed.join(F.broadcast(cands), "k", "left_semi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("cnt")
            >= F.ceil(F.lit(float(phi)) * F.col("t")).cast("long")
        )
        .select(F.col("k").alias(key_col), "cnt")
    )
