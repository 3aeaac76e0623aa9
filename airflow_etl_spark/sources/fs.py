"""Filesystem abstraction for housekeeping ops (SURVEY.md §2.1 S4/S15).

The reference lists and deletes objects through a MinIO client
(utlis/clean_metadata.py:128-165, 398-418). Locally that's pathlib; at
100 TB it's an object store reached through the Hadoop FileSystem API —
the same interface Spark itself uses for s3a://, gs://, abfs://, hdfs://.
This module puts both behind one duck-typed surface so
`maintenance.orphan_files` / `retention_plan` / `sources.list_files` run
unchanged against either:

- `LocalFS`: pathlib — zero-dependency default, used by all local tests.
- `HadoopFS`: the JVM FileSystem reached through the active SparkSession's
  py4j gateway. Listing is a server-side recursive iterator
  (`FileSystem.listFiles(path, true)` — one round trip per page, not per
  file), which is what makes million-object housekeeping listings viable.

Housekeeping listings are control-plane (file metadata, not data), so a
driver-side iterator is the right shape; the DataFrames built from them
are tiny.
"""

from __future__ import annotations

from pathlib import Path


class LocalFS:
    """pathlib-backed filesystem (the local default)."""

    def list_files(self, root: str, suffix: str = "") -> list[tuple[str, int, float]]:
        """Recursive inventory: (path, n_bytes, mtime_epoch_s), sorted."""
        rows = []
        for f in sorted(Path(root).rglob("*")):
            if f.is_file() and str(f).endswith(suffix):
                st = f.stat()
                rows.append((str(f), st.st_size, st.st_mtime))
        return rows

    def resolve(self, path: str) -> str:
        """Canonical absolute path (symlinks resolved) — both sides of a
        prefix comparison must resolve identically or live files look
        orphaned the moment a symlink appears in the path."""
        return str(Path(path).resolve())

    def exists(self, path: str) -> bool:
        return Path(path).exists()

    def delete(self, path: str, recursive: bool = False) -> bool:
        p = Path(path)
        if not p.exists():
            return False
        if p.is_dir():
            if not recursive:
                raise IsADirectoryError(path)
            import shutil

            shutil.rmtree(p)
        else:
            p.unlink()
        return True


class HadoopFS:
    """Hadoop FileSystem reached through the SparkSession JVM — the object-
    store path (s3a://bucket/..., hdfs://...). Instantiate with the URI
    whose scheme selects the store; `file:///` exercises the same code
    path against the local disk (tested)."""

    def __init__(self, spark, base_uri: str = "file:///"):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
            self._jvm.java.net.URI(base_uri), self._conf
        )

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def list_files(self, root: str, suffix: str = "") -> list[tuple[str, int, float]]:
        it = self._fs.listFiles(self._jpath(root), True)
        rows = []
        while it.hasNext():
            st = it.next()
            p = st.getPath().toUri().getPath()
            if p.endswith(suffix):
                rows.append((p, st.getLen(), st.getModificationTime() / 1000.0))
        return sorted(rows)

    def resolve(self, path: str) -> str:
        q = self._fs.makeQualified(self._jpath(path))
        return q.toUri().getPath()

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._jpath(path))

    def delete(self, path: str, recursive: bool = False) -> bool:
        return self._fs.delete(self._jpath(path), recursive)
