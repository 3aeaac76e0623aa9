"""Incremental materialized-view maintenance (IVM) over txn tables.

A materialized view here is a grouped roll-up — ``GROUP BY keys`` with a
row count and SUM measures — stored as its own txn table plus a tiny
state file recording which base snapshot it reflects. ``refresh``
advances the view to the base table's live snapshot by aggregating ONLY
the change, never re-scanning the base:

- **append fast path** — when the old manifest's file set is a subset of
  the new one and the equality-delete list is unchanged (the shape every
  ``txn.append_files`` load produces), the delta is exactly the new data
  files: read them alone, aggregate, merge. O(new data) at any base size
  — the whole point at 100 TB, where the base scan a CREATE pays is the
  thing a nightly refresh must never repeat.
- **differential path** — any other change (MoR deletes, compaction,
  UPDATE/MERGE rewrites): row-level change feed via multiset
  ``exceptAll`` between the recorded and live snapshots (the
  ``snapshot_diff`` shape), inserts aggregated with +1 weight and
  deletes with -1. O(base) worst case — the same cost as the rewrite
  that produced the change, and still one pass feeding one partial
  aggregate per side.

Merging is one union + one hash aggregate on the view keys: counts and
sums are **distributive and invertible**, so partials add (map-side
combine does most of the work before the single exchange) and groups
whose net count reaches zero drop out. MIN/MAX are deliberately NOT
offered — they are not invertible under deletes, and silently keeping a
stale max is the classic IVM bug; recompute (``create``) is the honest
answer for those.

Reference provenance: the reference rebuilds marts by re-running full
INSERT ... SELECT loads (dags/transform/*.py); there is no incremental
maintenance surface. This extends the txn/catalog layer the way Delta
Live Tables / Materialize treat the problem: views as persisted partial
aggregates advanced by the change feed.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import txn

#: sidecar (next to the view's manifest layout) recording the base
#: binding — base path, reflected base version, keys, SUM measures
STATE = "_matview"


def _state_path(mv_path: str) -> str:
    return txn._join(mv_path, STATE)


def read_state(mv_path: str, fs=None) -> dict:
    fs = fs or txn._fs_for(mv_path)
    text = fs.read_text(_state_path(mv_path))
    if not text:
        raise FileNotFoundError(f"no materialized view at {mv_path}")
    return json.loads(text)


def _write_state(mv_path: str, state: dict, fs=None) -> None:
    fs = fs or txn._fs_for(mv_path)
    fs.write_text_atomic(_state_path(mv_path), json.dumps(state))


def _partials(
    df: DataFrame, keys: list[str], sums: dict[str, str], sign: int
) -> DataFrame:
    """Signed partial aggregate: +1 rows add, -1 rows retract. NULL
    measure values count as 0 (document the view as SUM(COALESCE(x,0)))
    so insert/delete pairs always cancel exactly."""
    aggs = [F.sum(F.lit(sign)).cast("long").alias("mv_n")]
    for out, col in sums.items():
        aggs.append(
            F.sum(F.coalesce(F.col(col), F.lit(0)) * F.lit(sign)).alias(out)
        )
    return df.groupBy(*keys).agg(*aggs)


def _merge_partials(
    mv: DataFrame, delta: DataFrame, keys: list[str], sums: dict[str, str]
) -> DataFrame:
    merged = (
        mv.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("mv_n").cast("long").alias("mv_n"),
            *[F.sum(c).alias(c) for c in sums],
        )
    )
    # a group whose rows all retracted leaves the view entirely
    return merged.filter(F.col("mv_n") > 0)


def create(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    keys: list[str],
    sums: dict[str, str],
    transform=None,
) -> str:
    """Materialize ``SELECT keys, count(*) AS mv_n, SUM(COALESCE(v,0))…
    FROM transform(base) GROUP BY keys`` as a txn table bound to the
    base's current snapshot. The one full base scan the view ever pays.

    ``transform`` (optional) maps the base relation BEFORE aggregation —
    projections, filters, joins to STATIC dimensions (broadcast lookups)
    — turning the view into an enriched/join roll-up. It must be
    row-local and deterministic (each base row maps to the same output
    rows regardless of the rest of the relation): refresh applies the
    SAME function to delta rows, which is only equal to recomputing when
    per-row outputs never depend on other base rows. Callers pass the
    identical transform to every refresh (a closure cannot live in the
    state file); changing it mid-life silently corrupts the view —
    recreate instead."""
    fs = txn._fs_for(base_path)
    base_ver = txn._read_pointer(base_path, fs)
    if base_ver is None:
        raise FileNotFoundError(
            f"no versioned table at {base_path}: matview.create needs the "
            "manifest layout (txn.commit the base first)"
        )
    rel = txn.read(spark, base_path, fs)
    if transform is not None:
        rel = transform(rel)
    mv = _partials(rel, keys, sums, sign=1)
    ver = txn.commit(mv, mv_path)
    _write_state(
        mv_path,
        {
            "base": base_path,
            "base_version": base_ver,
            "keys": list(keys),
            "sums": dict(sums),
        },
    )
    return ver


def delta_between(
    spark: SparkSession, base_path: str, old_version: str, fs=None
) -> tuple[DataFrame, DataFrame | None, str, int]:
    """Change feed from ``old_version`` to the live snapshot as
    ``(inserts, deletes_or_None, mode, files_scanned)``.

    mode ``'append'``: old files ⊆ new files and the delete list is
    unchanged — inserts are exactly the delta files (read through
    ``_read_with_deletes`` so the seq rule still governs, though by
    construction no retained delete applies to newer files), deletes are
    None, and ``files_scanned`` counts only the delta files. Any other
    shape is mode ``'diff'``: full multiset exceptAll both ways."""
    fs = fs or txn._fs_for(base_path)
    if old_version not in txn._list_versions(base_path, fs):
        raise ValueError(
            f"{base_path}: snapshot {old_version!r} aged out of retention — "
            "the view can no longer be advanced incrementally; recreate it "
            "(matview.create) or raise keep_versions on the base"
        )
    cur = txn._read_pointer(base_path, fs)
    old_m = txn._load_manifest(base_path, old_version, fs)
    new_m = txn._load_manifest(base_path, cur, fs)
    old_files = {e["path"] for e in old_m["files"]}
    append_only = {e["path"] for e in old_m["files"]} <= {
        e["path"] for e in new_m["files"]
    } and (old_m.get("deletes") or []) == (new_m.get("deletes") or [])
    if append_only:
        delta_entries = [
            e for e in new_m["files"] if e["path"] not in old_files
        ]
        ins = txn._read_with_deletes(spark, base_path, new_m, delta_entries)
        return ins, None, "append", len(delta_entries)
    old = txn.read_named_version(spark, base_path, old_version, fs)
    new = txn.read(spark, base_path, fs)
    scanned = len(old_m["files"]) + len(new_m["files"])
    return new.exceptAll(old), old.exceptAll(new), "diff", scanned


def rebase(spark: SparkSession, mv_path: str) -> dict:
    """Re-pin the view to the base's live snapshot WITHOUT recomputing —
    for content-preserving rewrites only (compaction,
    rewrite_small_files, z-order re-clustering), where the differential
    path would burn an O(base) exceptAll to discover an empty delta.

    The caller asserts content preservation; the one cheap invariant
    that catches honest mistakes is still enforced: the live snapshot's
    total row count must equal the recorded snapshot's (a count over
    each side — metadata-ish next to the exceptAll it avoids; compaction
    preserves the multiset so it always passes). A count match does NOT
    prove content equality — rebase after an UPDATE that kept the row
    count silently corrupts the view, which is why `refresh` is the
    default and this is the explicitly-opt-in compaction companion."""
    fs = txn._fs_for(mv_path)
    with txn.table_lock(mv_path, fs):
        state = read_state(mv_path, fs)
        base = state["base"]
        base_fs = txn._fs_for(base)
        cur = txn._read_pointer(base, base_fs)
        if cur == state["base_version"]:
            return {"mode": "noop", "base_version": cur, "files_scanned": 0}
        old_n = txn.read_named_version(
            spark, base, state["base_version"], base_fs
        ).count()
        new_n = txn.read(spark, base, base_fs).count()
        if old_n != new_n:
            raise ValueError(
                f"rebase refused: base row count moved {old_n} -> {new_n}; "
                "the rewrite was not content-preserving — use refresh()"
            )
        _write_state(mv_path, {**state, "base_version": cur}, fs)
        return {"mode": "rebase", "base_version": cur, "files_scanned": 0}


def refresh(spark: SparkSession, mv_path: str, transform=None) -> dict:
    """Advance the view to the base's live snapshot. Returns an info dict
    ``{mode, base_version, files_scanned}`` where mode is ``'noop'``
    (already current — no job runs), ``'append'`` or ``'diff'``.
    ``transform`` must be the same row-local function the view was
    created with (see ``create``) — it is applied to the delta rows."""
    fs = txn._fs_for(mv_path)
    with txn.table_lock(mv_path, fs):
        state = read_state(mv_path, fs)
        base, keys, sums = state["base"], state["keys"], state["sums"]
        base_fs = txn._fs_for(base)
        cur = txn._read_pointer(base, base_fs)
        if cur == state["base_version"]:
            return {"mode": "noop", "base_version": cur, "files_scanned": 0}
        ins, dels, mode, scanned = delta_between(
            spark, base, state["base_version"], base_fs
        )
        if transform is not None:
            ins = transform(ins)
            dels = transform(dels) if dels is not None else None
        delta = _partials(ins, keys, sums, sign=1)
        if dels is not None:
            delta = delta.unionByName(_partials(dels, keys, sums, sign=-1))
        merged = _merge_partials(
            txn.read(spark, mv_path, fs), delta, keys, sums
        )
        # commit() is read-modify-write safe (plan pinned to the old file
        # list) but takes the same table lock — use the locked body
        txn._commit_locked(merged, mv_path, fs=fs)
        _write_state(mv_path, {**state, "base_version": cur}, fs)
        return {"mode": mode, "base_version": cur, "files_scanned": scanned}
