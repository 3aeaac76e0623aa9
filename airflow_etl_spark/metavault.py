"""Meta-vault sync — the reference's metadata-harvest layer
(`utlis/etl_manager.py:585-1379`, SURVEY.md §2.11 C15, FIXTURES.md §5).

The reference scans the dbt model tree (folders = business concepts, .yml
descriptors = models with columns) and maintains a "vault about the vault":

- hub_concept:           concept names (folder names minus the NN_ prefix)
- hub_hub/_link/_satellite: entity registries (name, description, notes)
- link_concept_entity:   concept ↔ entity membership with active_status
- link_hub_satellite/_hub_link/_link_satellite: relationships inferred from
  shared `*_hash_key` columns
- satellite_hub/_link/_satellite: per-entity lifecycle (create/retire dates,
  active_status, in_use)
- satellite_satellite_detail: per-attribute add/delete/reuse changes

Every sync follows the reference's J3/J4/S13 idioms: anti-join for new rows,
reverse anti-join for retirements, merge-upsert for descriptions. Inputs are
a long-form models DataFrame (from sources.read_yaml_models: folder,
model_name, description, column_name) — metadata-scale, so broadcast joins
throughout.

Hash-key relationship inference (reference `utlis/etl_manager.py:955-962`):
entity X's hash key column is `<x>_hash_key` where `<x>` = model name minus
its `hub_`/`link_`/`satellite_` prefix; model B references entity X when
B's column list contains X's hash-key column. The technical columns
load_date / load_end_date / record_source are excluded from attribute-level
harvests (reference :894, :1231).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .operators.core import anti_new, anti_retired
from .operators.merge import upsert, update_where

TECHNICAL_COLUMNS = ("load_date", "load_end_date", "record_source")


def _strip_prefix(col):
    """model name minus the leading 'hub_'/'link_'/'satellite_'."""
    return F.regexp_replace(col, "^(hub_|link_|satellite_)", "")


def concepts_from_folders(models_df: DataFrame) -> DataFrame:
    """Distinct concept names from model folders, stripping the `NN_`
    ordinal prefix (reference folder[3:], utlis/etl_manager.py:608-615)."""
    return (
        models_df.select(
            F.regexp_replace("folder", "^[0-9]{2}_", "").alias("concept_name")
        )
        .distinct()
    )


def entities(models_df: DataFrame, kind: str) -> DataFrame:
    """Distinct (entity_name, description) for one kind ('hub' | 'link' |
    'satellite') — reference harvest at utlis/etl_manager.py:645-682."""
    return (
        models_df.filter(F.col("model_name").startswith(f"{kind}_"))
        .select(
            F.col("model_name").alias(f"{kind}_name"),
            F.col("description").alias(f"{kind}_description"),
        )
        .distinct()
    )


def sync_hub_concept(hub_concept: DataFrame, models_df: DataFrame) -> DataFrame:
    """MERGE new concepts into hub_concept (reference :617-635)."""
    return upsert(hub_concept, concepts_from_folders(models_df), ["concept_name"])


def sync_entity_hub(hub_df: DataFrame, models_df: DataFrame, kind: str) -> DataFrame:
    """MERGE entity registry for one kind: insert new names, refresh
    descriptions (reference :687-711)."""
    return upsert(hub_df, entities(models_df, kind), [f"{kind}_name"])


def concept_entity_pairs(models_df: DataFrame) -> DataFrame:
    """(concept_name, entity_name) membership pairs from the model tree."""
    return (
        models_df.select(
            F.regexp_replace("folder", "^[0-9]{2}_", "").alias("concept_name"),
            F.col("model_name").alias("entity_name"),
        )
        .distinct()
    )


def sync_link_concept_entity(
    link_df: DataFrame, models_df: DataFrame
) -> DataFrame:
    """link_concept_entity lifecycle (reference :763-794 insert, :821-866
    re-activate/deactivate): new pairs insert active, vanished pairs flip to
    active_status=0, reappearing pairs flip back to 1."""
    return sync_relationship_link(
        link_df, concept_entity_pairs(models_df), "concept_name", "entity_name"
    )


def hash_key_relationships(
    models_df: DataFrame, from_kind: str, to_kind: str
) -> DataFrame:
    """Relationship pairs (<to>_name, <from>_name): model B of `from_kind`
    references entity A of `to_kind` when B's columns include A's
    `<a>_hash_key` (reference J1 join on column_name, :955-962,1018,1065).
    """
    targets = (
        models_df.filter(F.col("model_name").startswith(f"{to_kind}_"))
        .select(
            F.col("model_name").alias(f"{to_kind}_name"),
            F.concat(_strip_prefix(F.col("model_name")), F.lit("_hash_key")).alias(
                "column_name"
            ),
        )
        .distinct()
    )
    referers = (
        models_df.filter(
            F.col("model_name").startswith(f"{from_kind}_")
            & ~F.col("column_name").isin(*TECHNICAL_COLUMNS)
        )
        .select(F.col("model_name").alias(f"{from_kind}_name"), "column_name")
        .distinct()
    )
    out = referers.join(F.broadcast(targets), "column_name").select(
        f"{to_kind}_name", f"{from_kind}_name"
    )
    # guard only against a model matching itself (possible when kinds equal)
    return out.filter(
        F.col(f"{to_kind}_name") != F.col(f"{from_kind}_name")
    ).distinct()


def sync_relationship_link(
    link_df: DataFrame, pairs: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Generic active-status sync for the three relationship links
    (:925-1073): insert new pairs active, deactivate vanished, reactivate
    reappearing."""
    keys = [a_col, b_col]
    new_rows = anti_new(pairs, link_df, keys).withColumn("active_status", F.lit(1))
    present = pairs.withColumn("__present", F.lit(1))
    existing = (
        link_df.join(F.broadcast(present), on=keys, how="left")
        .withColumn(
            "active_status",
            F.when(F.col("__present").isNotNull(), F.lit(1)).otherwise(F.lit(0)),
        )
        .drop("__present")
    )
    return existing.unionByName(new_rows)


def sync_entity_satellite(
    sat_df: DataFrame, models_df: DataFrame, kind: str, run_date: str
) -> DataFrame:
    """satellite_{hub,link,satellite} lifecycle registry (:1120-1206):
    new entities insert (create_date=run_date, active, in_use); vanished
    entities retire (retire_date=run_date, inactive, out of use); retired
    entities that REAPPEAR in the tree reactivate (mirroring the
    relationship-link syncs — without this, a re-added entity stayed
    retired forever while its links flipped back active)."""
    name_col = f"{kind}_name"
    current = entities(models_df, kind).select(name_col)

    new_rows = anti_new(current, sat_df, [name_col]).select(
        F.col(name_col),
        F.lit(run_date).alias("create_date"),
        F.lit(None).cast("string").alias("retire_date"),
        F.lit(1).alias("active_status"),
        F.lit(1).alias("in_use"),
    )
    gone = anti_retired(current, sat_df, [name_col]).select(name_col)
    gone_names = [r[0] for r in gone.collect()]  # metadata-scale
    present_names = [r[0] for r in current.collect()]
    retired = update_where(
        sat_df,
        F.col(name_col).isin(gone_names) & F.col("retire_date").isNull(),
        {"retire_date": run_date, "active_status": 0, "in_use": 0},
    )
    existing = update_where(
        retired,
        F.col(name_col).isin(present_names) & F.col("retire_date").isNotNull(),
        {"retire_date": None, "active_status": 1, "in_use": 1},
    )
    return existing.unionByName(new_rows)


def satellite_attribute_changes(
    prev_models: DataFrame, curr_models: DataFrame, run_date: str,
    history: DataFrame | None = None,
) -> DataFrame:
    """satellite_satellite_detail rows (:1246-1376, FIXTURES.md §5 shape):
    per-satellite attribute add/delete between two harvests (technical
    columns excluded), with change_description. Pass the accumulated prior
    detail rows as `history` to mark re-added attributes 'reused'."""
    def attrs(df):
        return (
            df.filter(
                F.col("model_name").startswith("satellite_")
                & F.col("column_name").isNotNull()
                & ~F.col("column_name").isin(*TECHNICAL_COLUMNS)
            )
            .select(
                F.col("model_name").alias("satellite_name"),
                F.col("column_name").alias("attribute_name"),
            )
            .distinct()
        )

    prev_a, curr_a = attrs(prev_models), attrs(curr_models)
    keys = ["satellite_name", "attribute_name"]
    added = anti_new(curr_a, prev_a, keys)
    if history is not None:
        # an added attribute previously recorded as deleted is 'reused'
        prior_deleted = history.filter(F.col("change_type") == "delete").select(
            F.col("satellite_name"), F.col("attribute_name")
        ).distinct().withColumn("__was_deleted", F.lit(1))
        added = added.join(
            F.broadcast(prior_deleted), on=keys, how="left"
        ).withColumn(
            "change_type",
            F.when(F.col("__was_deleted").isNotNull(), F.lit("reused")).otherwise(
                F.lit("add")
            ),
        ).drop("__was_deleted")
    else:
        added = added.withColumn("change_type", F.lit("add"))
    deleted = anti_new(prev_a, curr_a, keys).withColumn(
        "change_type", F.lit("delete")
    )
    return added.unionByName(deleted).select(
        "satellite_name",
        F.lit(run_date).alias("satellite_change_date"),
        "attribute_name",
        "change_type",
        F.concat(
            F.lit("attribute "), F.col("change_type"), F.lit(": "),
            F.col("attribute_name"),
        ).alias("change_description"),
    )
