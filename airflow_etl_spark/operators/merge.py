"""MERGE INTO upsert (SURVEY.md §2.1 S13).

The reference upserts via Trino `MERGE INTO … WHEN MATCHED THEN UPDATE /
WHEN NOT MATCHED THEN INSERT` (utlis/etl_manager.py:617-635, 687-711) on
Iceberg tables. Without a transactional table format on the classpath the
idiomatic pure-Spark rewrite is a full-outer join + coalesce, which this
module provides; the same signature can later be backed by Delta
`DeltaTable.merge` without touching callers.

Scale note: the join shuffles both sides on the merge keys. For the
reference's workload the source side is tiny (literal arrays / single-run
deltas) → broadcast. For large-table merges, AQE picks the strategy; pass
`broadcast_source=False`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    broadcast_source: bool = True,
) -> DataFrame:
    """Return the post-MERGE state of `target`:

    - matched keys: target row with `update_cols` taken from source
      (WHEN MATCHED THEN UPDATE SET col = s.col)
    - source-only keys: source row inserted (WHEN NOT MATCHED THEN INSERT)
    - target-only keys: unchanged.

    `update_cols` defaults to every non-key column the two frames share.
    Columns present only in target stay NULL for inserted rows.
    """
    keys = list(keys)
    if update_cols is None:
        update_cols = [
            c for c in source.columns if c in set(target.columns) and c not in keys
        ]
    # presence marker instead of key-nullability: the join is null-safe, so
    # a NULL business key still matches — testing s.keys[0] IS NOT NULL
    # would misclassify those rows and drop their updates
    src = source.select(keys + list(update_cols)).withColumn(
        "__s_present", F.lit(1)
    )
    if broadcast_source:
        src = F.broadcast(src)

    t = target.alias("t")
    s = src.alias("s")
    joined = t.join(s, on=[F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys], how="full_outer")

    out_cols = []
    for c in target.columns:
        if c in keys:
            # eqNullSafe match on a NULL key coalesces to NULL — correct
            out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        elif c in update_cols:
            # matched or inserted → source value; target-only → target value
            out_cols.append(
                F.when(F.col("s.__s_present").isNotNull(), F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)


def merge_into(
    spark,
    path: str,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
) -> None:
    """`MERGE INTO <table at path>` with ACID semantics on the txn layer —
    the full Trino/Iceberg S13 shape (utlis/etl_manager.py:617-635): read
    the live snapshot, apply the upsert, publish atomically. A crash at
    ANY instant leaves the table at the old or the new snapshot
    (kill-mid-merge tested); concurrent writers serialize on the table
    lock."""
    from ..sources import txn

    with txn.table_lock(path):
        target = txn.read(spark, path) if txn.table_exists(path) else None
        merged = (
            upsert(target, source, keys, update_cols)
            if target is not None
            else source
        )
        txn._commit_locked(merged, path)


def update_into(spark, path: str, condition, assignments: dict) -> None:
    """`UPDATE <table at path> SET … WHERE cond` committed atomically
    (S11, utlis/etl_manager.py:195-199)."""
    from ..sources import txn

    with txn.table_lock(path):
        txn._commit_locked(
            update_where(txn.read(spark, path), condition, assignments), path
        )


def delete_into(spark, path: str, condition) -> None:
    """`DELETE FROM <table at path> WHERE cond` committed atomically
    (S12, utlis/etl_manager.py:339-353)."""
    from ..sources import txn

    with txn.table_lock(path):
        txn._commit_locked(
            delete_where(txn.read(spark, path), condition), path
        )


def delete_where(target: DataFrame, condition) -> DataFrame:
    """`DELETE FROM … WHERE cond` (utlis/etl_manager.py:339-353) as the
    immutable-rewrite: keep the complement."""
    return target.filter(~condition)


def update_where(target: DataFrame, condition, assignments: dict) -> DataFrame:
    """`UPDATE … SET … WHERE cond` (utlis/etl_manager.py:195-199 et al.) as
    a conditional projection.

    All assignments are applied in a single select so the condition is
    evaluated against the PRE-update row (SQL UPDATE semantics) — chained
    withColumn would re-evaluate it against already-mutated columns."""
    out_cols = []
    for c in target.columns:
        if c in assignments:
            value = assignments[c]
            value_col = value if isinstance(value, Column) else F.lit(value)
            out_cols.append(F.when(condition, value_col).otherwise(F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return target.select(*out_cols)


def incremental_agg_refresh(
    mart: DataFrame | None,
    diff: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Refresh a count+sum aggregate mart from a txn.snapshot_diff change
    feed instead of recomputing it — the CDC consumer pattern: cost is
    O(changed rows), not O(table). Inserts add (+1, +value), deletes
    subtract; groups whose count reaches zero leave the mart. `mart=None`
    bootstraps from an empty mart (then the diff must be the table's full
    insert feed).

    Output schema: keys + (n_rows, sum_value) — the same shape a direct
    groupBy produces, so incremental and recomputed marts compare
    row-for-row (the oracle does exactly that)."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = diff.groupBy(*keys).agg(
        F.sum(sign).alias("_d_n"),
        F.sum(sign * F.col(value_col)).alias("_d_sum"),
    )
    if mart is None:
        base = delta.select(
            *keys,
            F.lit(0).cast("long").alias("n_rows"),
            F.lit(0.0).alias("sum_value"),
        ).limit(0)
    else:
        base = mart
    merged = base.join(delta, list(keys), "full_outer").select(
        *keys,
        (F.coalesce("n_rows", F.lit(0)) + F.coalesce("_d_n", F.lit(0)))
        .cast("long").alias("n_rows"),
        (F.coalesce("sum_value", F.lit(0.0)) + F.coalesce("_d_sum", F.lit(0.0)))
        .alias("sum_value"),
    )
    return merged.filter(F.col("n_rows") > 0)


def merge_full(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    delete_on_missing: Column | None = None,
    broadcast_source: bool = True,
) -> DataFrame:
    """THREE-branch MERGE (the full ANSI/Delta surface `upsert` leaves
    out): WHEN MATCHED → UPDATE, WHEN NOT MATCHED → INSERT, WHEN NOT
    MATCHED BY SOURCE [AND condition] → DELETE. `delete_on_missing` is
    a predicate over TARGET columns deciding which source-absent rows
    are purged (None = purge all — full sync to the source relation).

    The sync shape warehouse feeds need: 'the feed is the truth for
    finalized rows; in-flight rows survive even if absent today'.

    Same plan as `upsert`: ONE full-outer join on the keys (null-safe),
    presence markers on both sides, every branch a projection — no
    second pass, no window. Source broadcast by default (the
    delta-feed case); pass broadcast_source=False for table-sized
    sources and let AQE pick."""
    keys = list(keys)
    if update_cols is None:
        update_cols = [
            c for c in source.columns
            if c in set(target.columns) and c not in keys
        ]
    update_cols = list(update_cols)
    src_cols = [c for c in source.columns if c not in keys]
    src = source.withColumn("__s_present", F.lit(1))
    if broadcast_source:
        src = F.broadcast(src)
    tgt = target.withColumn("__t_present", F.lit(1))

    t = tgt.alias("t")
    s = src.alias("s")
    joined = t.join(
        s,
        on=[F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
        how="full_outer",
    )
    matched = F.col("s.__s_present").isNotNull() & F.col(
        "t.__t_present"
    ).isNotNull()
    s_only = F.col("t.__t_present").isNull()
    t_only = F.col("s.__s_present").isNull()

    out_cols = []
    for c in target.columns:
        if c in keys:
            expr = F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}"))
        elif c in update_cols:
            expr = (
                F.when(matched | s_only, F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
            )
        elif c in src_cols:
            expr = F.when(s_only, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
        else:
            expr = F.col(f"t.{c}")  # target-only column: NULL on inserts
        out_cols.append(expr.alias(c))

    # evaluate the delete predicate on the PROJECTED row (target-only
    # rows carry pure target values there), so callers reference plain
    # column names with no t./s. ambiguity
    projected = joined.select(*out_cols, t_only.alias("__t_only"))
    if delete_on_missing is None:
        kept = projected.filter(~F.col("__t_only"))
    else:
        kept = projected.filter(
            ~F.col("__t_only")
            | ~F.coalesce(delete_on_missing, F.lit(False))
        )
    return kept.drop("__t_only")
