"""SCD2 satellite operators (inferred dbt raw_vault layer; SURVEY.md §0,
FIXTURES.md §6).

The reference's satellites carry `load_date` / `load_end_date` (SCD2) and a
per-attribute hash-diff, loaded by absent dbt models. Two operators cover
the lifecycle:

- `scd2_compress`: given a history of observations (key, order_col, attrs),
  keep only rows where the attributes *changed* vs the previous observation
  (hash-diff), and derive validity intervals [load_date, load_end_date).
  This is the "rebuild satellite from history" path — one window shuffle on
  the key, no joins, scales linearly.
- `scd2_apply`: given the current satellite and a new snapshot for one
  load_date, close out changed/retired rows and append new versions — the
  incremental per-run path (what `dbt run` did per etl_date).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import dv_hash_key


def scd2_compress(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    attr_cols: Sequence[str],
    load_date_col: str = "load_date",
    load_end_date_col: str = "load_end_date",
) -> DataFrame:
    """Compress an observation history into SCD2 intervals.

    For each key (ordered by `order_col`): keep the first observation and
    every observation whose attribute hash differs from the previous kept
    one; `load_end_date` = next kept row's `order_col` (NULL = current).

    Note the change filter compares against the previous *observation*,
    which equals the previous *kept* row's attributes by induction (runs of
    identical attrs collapse to their first row).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    hashed = df.withColumn("__hd", dv_hash_key(*attr_cols))
    changed = hashed.withColumn("__prev_hd", F.lag("__hd").over(w)).filter(
        F.col("__prev_hd").isNull() | (F.col("__prev_hd") != F.col("__hd"))
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    out = (
        changed.withColumn(load_date_col, F.col(order_col))
        .withColumn(load_end_date_col, F.lead(F.col(order_col)).over(w2))
        .drop("__hd", "__prev_hd")
    )
    return out


def scd2_apply(
    satellite: DataFrame,
    snapshot: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    load_date,
    load_date_col: str = "load_date",
    load_end_date_col: str = "load_end_date",
) -> DataFrame:
    """Apply one snapshot (all current rows for `load_date`) to a satellite.

    - key in both, attrs changed → close current row (end date = load_date)
      and append the new version.
    - key only in snapshot → append (new entity).
    - key only in satellite → close current row (entity retired).
    - unchanged → untouched.

    Returns the new satellite. The join is on the satellite's *current* rows
    only (load_end_date IS NULL); history rows pass through untouched —
    at scale, with the satellite partitioned by key, this is one co-located
    join plus an append.
    """
    keys = list(keys)
    ld = F.lit(load_date)

    hist = satellite.filter(F.col(load_end_date_col).isNotNull())
    current = satellite.filter(F.col(load_end_date_col).isNull())

    cur_h = current.withColumn("__hd", dv_hash_key(*attr_cols))
    snap_h = snapshot.withColumn("__hd", dv_hash_key(*attr_cols))

    # null-safe key equality: with plain `on=keys` a NULL-key row never
    # matches its own snapshot counterpart and gets closed + re-opened every
    # run even when unchanged (same bug class fixed in merge.upsert)
    j = cur_h.alias("c").join(
        snap_h.alias("s"),
        on=[F.col(f"c.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
        how="full_outer",
    )
    key_cols = [
        F.coalesce(F.col(f"c.{k}"), F.col(f"s.{k}")).alias(k) for k in keys
    ]

    # rows of the existing satellite, with end-date closed where needed
    closed = (
        j.filter(F.col("c.__hd").isNotNull())
        .select(
            *key_cols,
            *[F.col(f"c.{a}").alias(a) for a in attr_cols],
            F.col(f"c.{load_date_col}").alias(load_date_col),
            F.when(
                F.col("s.__hd").isNull() | (F.col("s.__hd") != F.col("c.__hd")), ld
            )
            .otherwise(F.col(f"c.{load_end_date_col}"))
            .alias(load_end_date_col),
        )
    )

    # new versions: snapshot rows that are new keys or changed attrs
    opened = (
        j.filter(
            F.col("s.__hd").isNotNull()
            & (F.col("c.__hd").isNull() | (F.col("c.__hd") != F.col("s.__hd")))
        )
        .select(
            *key_cols,
            *[F.col(f"s.{a}").alias(a) for a in attr_cols],
            ld.alias(load_date_col),
            F.lit(None).cast(satellite.schema[load_end_date_col].dataType).alias(load_end_date_col),
        )
    )

    hist_sel = hist.select(*keys, *attr_cols, load_date_col, load_end_date_col)
    return hist_sel.unionByName(closed).unionByName(opened)
