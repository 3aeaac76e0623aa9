"""Atomic table commits — manifest-pointer protocol for mutable tables.

The reference mutates Iceberg tables through Trino and gets ACID for free
(MERGE utlis/etl_manager.py:617-635, UPDATE :195-199, DELETE :340-350).
Round 1 emulated mutation with write-tmp + rename-aside swaps
(`sources.safe_overwrite`) and an rmtree→rename compaction — both with a
crash window where the table is missing or half-swapped. This module closes
that window with the standard lakehouse trick (Delta/Iceberg's core idea,
minus the format machinery):

table layout::

    table_dir/
      _current                 # text file: name of the live version dir
      _versions/
        v00000001-3fa9c1d2/    # immutable snapshot (parquet part files)
        v00000002-8be04417/
      _lock                    # cross-process writer lock (flock)

- **Readers never lock.** They read `_current` (an atomic rename target),
  then scan only that version dir. A reader mid-plan keeps a concrete
  version-dir path, so concurrent commits never yank files out from under
  an executing Spark job (GC keeps the previous version).
- **Writers**: take the flock, write the full new snapshot into a fresh
  version dir (the expensive Spark job runs while the OLD version stays
  live), fsync a tmp pointer file, `os.rename` it over `_current` (atomic
  on POSIX), fsync the dir, then GC versions beyond `keep_versions`.
- **Crash at any point** leaves either the old pointer (new dir is garbage,
  GC'd later) or the new pointer (old dirs GC'd later) — never a missing
  or torn table. This is exactly the recovery property Iceberg's
  metadata.json pointer swap provides.
- **Appends** are a single-part-file `os.rename` into the live version dir
  (complete-file rename = atomic visibility), sized for control tables
  (the only append-mode mutable tables here). Data-plane appends
  (staging partitions) stay on Spark's own committer.

Legacy plain parquet dirs read transparently (pointer absent → top-level
part files); the first `commit()` migrates them to the versioned layout.

At 100 TB: the pointer file and flock are metadata-scale (one tiny file op
per table commit, regardless of data size); snapshots are written by the
cluster, never streamed through the driver. On a real deployment the flock
moves to a lock service / conditional-put, and `keep_versions` becomes
time-travel retention — the interface here is the same.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

CURRENT = "_current"
VERSIONS = "_versions"
LOCK = "_lock"

_VER_RE = re.compile(r"^v(\d{8})-[0-9a-f]{8}$")


def _current_file(path: str) -> str:
    return os.path.join(path, CURRENT)


def _versions_dir(path: str) -> str:
    return os.path.join(path, VERSIONS)


def _read_pointer(path: str) -> str | None:
    try:
        with open(_current_file(path)) as f:
            return f.read().strip() or None
    except FileNotFoundError:
        return None


def _list_versions(path: str) -> list[str]:
    vdir = _versions_dir(path)
    if not os.path.isdir(vdir):
        return []
    return sorted(v for v in os.listdir(vdir) if _VER_RE.match(v))


def _has_plain_files(path: str) -> bool:
    """Legacy layout probe: top-level part files or key=value partitions."""
    if not os.path.isdir(path):
        return False
    for entry in os.listdir(path):
        if entry.endswith(".parquet"):
            return True
        if "=" in entry and os.path.isdir(os.path.join(path, entry)):
            return True
    return False


def resolve_data_dir(path: str) -> str | None:
    """Directory holding the live data files, or None when no table exists.

    Pointer layout wins over legacy plain files (a migrated table may keep
    stale top-level parts for one GC cycle)."""
    ver = _read_pointer(path)
    if ver is not None:
        d = os.path.join(_versions_dir(path), ver)
        return d if os.path.isdir(d) else None
    return path if _has_plain_files(path) else None


def table_exists(path: str) -> bool:
    return resolve_data_dir(path) is not None


def read(spark: SparkSession, path: str) -> DataFrame:
    d = resolve_data_dir(path)
    if d is None:
        raise FileNotFoundError(f"no table at {path}")
    return spark.read.parquet(d)


def read_version(spark: SparkSession, path: str, version_back: int = 0) -> DataFrame:
    """Time-travel read: `version_back=0` is the live snapshot, 1 the
    previous retained one, … (bounded by `keep_versions` at commit time —
    the same contract as Iceberg snapshot reads under retention). Raises
    when the requested snapshot has been GC'd."""
    vs = _list_versions(path)
    live = _read_pointer(path)
    if live is None or live not in vs:
        raise FileNotFoundError(f"no versioned table at {path}")
    idx = vs.index(live) - version_back
    if version_back < 0 or idx < 0:
        raise FileNotFoundError(
            f"version {version_back} back not retained at {path} "
            f"({len(vs)} snapshots on disk)"
        )
    return spark.read.parquet(os.path.join(_versions_dir(path), vs[idx]))


def version_log(path: str) -> list[dict]:
    """The table's metadata log (Iceberg `$metadata_log_entries` analog,
    reference utlis/clean_metadata.py:54): retained snapshots oldest-first
    with currency flags. Driver-side metadata — rows are version-count
    sized."""
    live = _read_pointer(path)
    return [
        {"version": v, "ordinal": i + 1, "is_current": v == live}
        for i, v in enumerate(_list_versions(path))
    ]


@contextmanager
def table_lock(path: str):
    """Cross-process writer lock. flock serializes both across processes and
    across fds within one process, covering the C2 thread fan-out and a
    second driver against the same warehouse."""
    os.makedirs(path, exist_ok=True)
    fd = open(os.path.join(path, LOCK), "a+")
    try:
        try:
            import fcntl

            fcntl.flock(fd.fileno(), fcntl.LOCK_EX)
        except ImportError:  # pragma: no cover - non-POSIX fallback
            pass
        yield
    finally:
        fd.close()  # close releases the flock


def _next_version(path: str) -> str:
    vs = _list_versions(path)
    n = int(vs[-1][1:9]) + 1 if vs else 1
    return f"v{n:08d}-{uuid.uuid4().hex[:8]}"


def _flip_pointer(path: str, ver: str) -> None:
    tmp = _current_file(path) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(ver)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, _current_file(path))
    dfd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _gc(path: str, keep_versions: int) -> None:
    """Drop versions beyond the newest `keep_versions`, stray pointer tmps,
    and (post-migration) superseded legacy top-level part files. Never
    touches the live version; keep_versions >= 2 so a reader that resolved
    the previous version mid-commit still finds its files."""
    keep_versions = max(2, keep_versions)
    live = _read_pointer(path)
    vs = _list_versions(path)
    keep = set(vs[-keep_versions:])
    if live:
        keep.add(live)
    for v in vs:
        if v not in keep:
            shutil.rmtree(os.path.join(_versions_dir(path), v), ignore_errors=True)
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if entry.startswith(CURRENT + ".tmp-"):
            os.remove(full)
        elif entry.startswith("_append_tmp-"):
            # Spark-path appends leave a tmp DIR; arrow-path appends a file
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            else:
                os.remove(full)
        elif live and (
            entry.endswith(".parquet")
            or entry in ("_SUCCESS",)
            or ("=" in entry and os.path.isdir(full))
        ):
            # legacy files superseded by the pointer layout
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            else:
                os.remove(full)


def commit(df: DataFrame, path: str, keep_versions: int = 2) -> str:
    """Atomically replace the table at `path` with `df`'s result.

    Safe for read-modify-write: `df` may read the table's current version —
    the plan executes against the old (still-live) version dir while the new
    snapshot is written, and only then does the pointer flip. Returns the
    new version name."""
    with table_lock(path):
        ver = _next_version(path)
        vdir = os.path.join(_versions_dir(path), ver)
        df.write.mode("overwrite").parquet(vdir)
        _flip_pointer(path, ver)
        _gc(path, keep_versions)
        return ver


def append(df: DataFrame, path: str) -> None:
    """Atomic small append: write `df` as ONE part file, rename it into the
    live version dir. Control-table scale (the ledger's 1-row appends) —
    a complete-file rename is all-or-nothing, so readers never see a torn
    row batch. First append to a missing table commits a fresh snapshot."""
    with table_lock(path):
        d = resolve_data_dir(path)
        if d is None or d == path:
            # no table yet, or legacy plain layout: migrate via full commit
            if d == path:
                spark = df.sparkSession
                merged = spark.read.parquet(d).unionByName(df)
                _commit_locked(merged, path)
            else:
                _commit_locked(df, path)
            return
        tmp = os.path.join(path, f"_append_tmp-{uuid.uuid4().hex[:8]}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        parts = [p for p in os.listdir(tmp) if p.endswith(".parquet")]
        assert len(parts) == 1, f"coalesce(1) produced {len(parts)} files"
        os.rename(
            os.path.join(tmp, parts[0]),
            os.path.join(d, f"part-append-{uuid.uuid4().hex}.parquet"),
        )
        shutil.rmtree(tmp, ignore_errors=True)


def _commit_locked(df: DataFrame, path: str, keep_versions: int = 2) -> str:
    """commit() body for callers already holding the table lock."""
    ver = _next_version(path)
    vdir = os.path.join(_versions_dir(path), ver)
    df.write.mode("overwrite").parquet(vdir)
    _flip_pointer(path, ver)
    _gc(path, keep_versions)
    return ver


def append_files(df: DataFrame, path: str, keep_versions: int = 2) -> str:
    """Data-plane atomic append: publish a new snapshot consisting of
    HARDLINKS to every current data file plus `df`'s freshly-written part
    files — O(delta) data written and one atomic pointer flip, never a
    table rewrite. This is the pure-filesystem analog of an Iceberg append
    snapshot (new manifest referencing old files); it is what makes
    insert-only tables (Data Vault hubs/links) O(new keys) per load at
    100 TB instead of O(table). Hardlinked data survives version GC (the
    inode lives until every link is gone). The delta may be any size —
    unlike `append`/`append_rows` it is written by the cluster as normal
    multi-file parquet."""
    with table_lock(path):
        d = resolve_data_dir(path)
        if d is None:
            return _commit_locked(df, path, keep_versions)
        ver = _next_version(path)
        vdir = os.path.join(_versions_dir(path), ver)
        tmp = os.path.join(path, f"_append_tmp-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(tmp)
        os.makedirs(vdir)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.link(os.path.join(d, f), os.path.join(vdir, f))
        tag = uuid.uuid4().hex[:8]
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(tmp, f),
                    os.path.join(vdir, f"delta-{tag}-{f}"),
                )
        shutil.rmtree(tmp, ignore_errors=True)
        _flip_pointer(path, ver)
        _gc(path, keep_versions)
        return ver


def append_rows(path: str, arrow_table) -> None:
    """Driver-side atomic append of a small pyarrow Table — ZERO Spark
    jobs. The control-plane fast path: a 1-row ledger append through a
    Spark write job costs ~2s of job-scheduling latency; writing the part
    file with pyarrow and renaming it into the live version dir costs
    milliseconds, with the identical all-or-nothing visibility (a complete
    file appears atomically). Timestamps must be tz-aware (UTC) so Spark
    reads them as TIMESTAMP (LTZ), matching its own written files.

    Control tables only — data-plane appends stay on the cluster."""
    import pyarrow.parquet as pq

    with table_lock(path):
        d = resolve_data_dir(path)
        fname = f"part-append-{uuid.uuid4().hex}.parquet"
        if d is None:
            # first write: create the versioned layout entirely driver-side
            ver = _next_version(path)
            vdir = os.path.join(_versions_dir(path), ver)
            os.makedirs(vdir)
            pq.write_table(arrow_table, os.path.join(vdir, fname))
            _flip_pointer(path, ver)
            return
        # legacy plain dir (d == path) or live version dir: same move —
        # write complete file to a tmp name, rename into the data dir
        tmp = os.path.join(path, f"_append_tmp-{uuid.uuid4().hex[:8]}.parquet")
        pq.write_table(arrow_table, tmp)
        os.rename(tmp, os.path.join(d, fname))
