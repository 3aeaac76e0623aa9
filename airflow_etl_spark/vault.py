"""Data Vault loaders — hubs, links, satellites (the reference's inferred
dbt raw_vault layer; SURVEY.md §0, FIXTURES.md §6).

Table shapes follow the reference's conventions exactly
(`*_hash_key`, `load_date`, `record_source`, `load_end_date` —
utlis/etl_manager.py:894,1231):

- hub_<entity>(entity_hash_key, <business keys…>, load_date, record_source)
- link_<a>_<b>(link_hash_key, a_hash_key, b_hash_key, load_date, record_source)
- satellite_<entity>(entity_hash_key, <attrs…>, load_date, load_end_date,
  record_source)  [SCD2]

Loads are incremental and idempotent: hubs/links insert only *new* hash keys
(anti-join, J3); satellites apply SCD2 via operators.scd2. At scale each
loader is one shuffle on the hash key — the key is uniformly distributed by
construction (sha2), so no skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from .functions import dv_hash_key
from .operators.core import anti_new
from .operators.scd2 import scd2_apply


def hub_snapshot(
    source: DataFrame,
    business_keys: Sequence[str],
    entity: str,
    load_date,
    record_source: str,
) -> DataFrame:
    """Distinct business keys → hub rows for one load."""
    return (
        source.select(*business_keys)
        .distinct()
        .select(
            dv_hash_key(*business_keys).alias(f"{entity}_hash_key"),
            *business_keys,
            F.lit(load_date).alias("load_date"),
            F.lit(record_source).alias("record_source"),
        )
    )


def load_hub(
    hub: DataFrame | None,
    source: DataFrame,
    business_keys: Sequence[str],
    entity: str,
    load_date,
    record_source: str,
) -> DataFrame:
    """Insert-new-keys-only hub load. `hub=None` → initial load."""
    snap = hub_snapshot(source, business_keys, entity, load_date, record_source)
    if hub is None:
        return snap
    new_rows = anti_new(snap, hub, [f"{entity}_hash_key"], broadcast_right=False)
    return hub.unionByName(new_rows)


def link_snapshot(
    source: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str],
    link_name: str,
    left_entity: str,
    right_entity: str,
    load_date,
    record_source: str,
) -> DataFrame:
    """Distinct (left, right) key pairs → link rows."""
    all_keys = list(left_keys) + list(right_keys)
    return (
        source.select(*all_keys)
        .distinct()
        .select(
            dv_hash_key(*all_keys).alias(f"{link_name}_hash_key"),
            dv_hash_key(*left_keys).alias(f"{left_entity}_hash_key"),
            dv_hash_key(*right_keys).alias(f"{right_entity}_hash_key"),
            F.lit(load_date).alias("load_date"),
            F.lit(record_source).alias("record_source"),
        )
    )


def load_link(
    link: DataFrame | None,
    source: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str],
    link_name: str,
    left_entity: str,
    right_entity: str,
    load_date,
    record_source: str,
) -> DataFrame:
    snap = link_snapshot(
        source, left_keys, right_keys, link_name, left_entity, right_entity,
        load_date, record_source,
    )
    if link is None:
        return snap
    new_rows = anti_new(snap, link, [f"{link_name}_hash_key"], broadcast_right=False)
    return link.unionByName(new_rows)


def satellite_snapshot(
    source: DataFrame,
    business_keys: Sequence[str],
    attr_cols: Sequence[str],
    entity: str,
) -> DataFrame:
    """Current descriptive attributes per entity hash key."""
    return source.select(
        dv_hash_key(*business_keys).alias(f"{entity}_hash_key"),
        *attr_cols,
    ).distinct()


def load_satellite(
    satellite: DataFrame | None,
    source: DataFrame,
    business_keys: Sequence[str],
    attr_cols: Sequence[str],
    entity: str,
    load_date,
    record_source: str = "engine",
) -> DataFrame:
    """SCD2 satellite load for one `load_date` snapshot."""
    hk = f"{entity}_hash_key"
    snap = satellite_snapshot(source, business_keys, attr_cols, entity)
    if satellite is None:
        return snap.select(
            hk,
            *attr_cols,
            F.lit(load_date).alias("load_date"),
            F.lit(None).cast("string").alias("load_end_date"),
            F.lit(record_source).alias("record_source"),
        )
    sat = satellite.drop("record_source")
    out = scd2_apply(
        sat, snap, keys=[hk], attr_cols=list(attr_cols), load_date=load_date
    )
    # record_source is immutable per-row provenance: existing versions keep
    # theirs (joined back on the (key, load_date) version identity); only
    # newly-opened versions get this load's record_source. A blanket
    # re-stamp would rewrite history's provenance on every load.
    prov = satellite.select(hk, "load_date", "record_source")
    return (
        out.join(prov, [hk, "load_date"], "left")
        .withColumn(
            "record_source",
            F.coalesce(F.col("record_source"), F.lit(record_source)),
        )
    )
