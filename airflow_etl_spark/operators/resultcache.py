"""Version-pinned query result cache over txn tables.

A cached result is an ordinary txn table plus a sidecar recording the
EXACT snapshot version of every dependency table the result was computed
from. ``cached`` serves the stored relation for as long as every
dependency's live pointer still equals its pinned version — the moment
any input table commits, the entry is stale and the next call recomputes
and re-pins atomically (the cache table's own commit). Correctness never
depends on TTLs or mtimes: staleness IS version inequality, the same
pointer comparison `matview.refresh` uses for its noop check.

At 100 TB this is the cheap tier of the reuse ladder: result cache
(exact repeat query, zero compute on hit) -> incremental matview
(same aggregate shape, O(delta) on change) -> recompute. A hit costs one
`_current` read per dependency — metadata-scale, no scan.

Reference provenance: the reference re-runs every mart query per DAG run
(dags/transform/*.py); Trino's per-cluster result cache is the analog.
Extension surface, no reference counterpart.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources import txn

STATE = "_resultcache"


def _state_path(cache_path: str) -> str:
    return txn._join(cache_path, STATE)


def pinned_deps(cache_path: str, fs=None) -> dict[str, str] | None:
    fs = fs or txn._fs_for(cache_path)
    text = fs.read_text(_state_path(cache_path))
    return json.loads(text) if text else None


def cached(
    spark: SparkSession,
    cache_path: str,
    deps: list[str],
    compute: Callable[[], DataFrame],
) -> tuple[DataFrame, bool]:
    """Return ``(relation, was_hit)``. On a hit the stored result is
    read back (no job beyond the cached table's scan); on a miss
    ``compute()`` runs, its result is committed to ``cache_path`` and
    the dependency versions are re-pinned. ``deps`` must list every txn
    table the computation reads — an omitted dependency makes staleness
    undetectable, so list conservatively."""
    fs = txn._fs_for(cache_path)
    with txn.table_lock(cache_path, fs):
        current = {d: txn._read_pointer(d) for d in deps}
        if None in current.values():
            missing = [d for d, v in current.items() if v is None]
            raise FileNotFoundError(
                f"result cache deps not versioned tables: {missing}"
            )
        if (
            pinned_deps(cache_path, fs) == current
            and txn._read_pointer(cache_path, fs) is not None
        ):
            return txn.read(spark, cache_path, fs), True
        df = compute()
        txn._commit_locked(df, cache_path, fs=fs)
        fs.write_text_atomic(_state_path(cache_path), json.dumps(current))
        return txn.read(spark, cache_path, fs), False


def invalidate(cache_path: str, fs=None) -> None:
    """Drop the pin sidecar — the next ``cached`` call recomputes even
    if no dependency moved (manual bust after a logic change)."""
    fs = fs or txn._fs_for(cache_path)
    fs.write_text_atomic(_state_path(cache_path), "")
