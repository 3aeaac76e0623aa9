"""Warehouse-level catalog: ATOMIC MULTI-TABLE commits + named refs
(branches) — the consistency layer the reference delegates to its Nessie
catalog (Iceberg-on-Nessie, utlis/backup_nessie_postgres.py:67-75:
Nessie's whole point is a catalog-level consistent view with git-like
refs). A single pointer flip publishes a new snapshot of MANY tables at
once, so a reader that resolves table versions THROUGH the catalog can
never observe a half-committed load (hub updated, satellite not) — the
cross-table torn read per-table pointers cannot rule out.

Layout (all under <warehouse>/_catalog/ — underscore paths, invisible to
Spark file scans like every other metadata object):

    refs/<ref>                    the per-ref pointer (snapshot file name)
    snapshots/s<seq>-<id>.json    {"seq", "parent", "ref", "tables":
                                   {name: {"path": ..., "version": ...}}}

The commit protocol is the table-level one lifted a level (txn._publish/
_flip_pointer shapes): write the immutable snapshot file, then flip
refs/<ref> under the catalog lock with a parent check — a compare-and-
swap on conditional-put backends (fs.write_text_if, same duck-typed
discovery as txn), lock+verify+atomic-replace otherwise. A transaction
whose parent moved (concurrent committer, lease takeover) raises
CatalogConflict; its table snapshots stay unreferenced by the catalog
and age out through table GC.

Version pinning vs table GC: a catalog snapshot references table
versions BY NAME (txn.read_named_version). The pin is ENFORCED, not
assumed: after every ref move the catalog rewrites each table's
`_pins` file with every version pinned by any retained snapshot of any
ref, and txn._gc keeps pinned versions beyond `keep_versions` — so two
commits on a dev branch can no longer collect the version main still
pins (branch isolation holds across table GC). Pin files shrink as
catalog snapshots age out (`keep_snapshots`, default 2, per ref).
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from . import txn
from .fs import LocalFS, PreconditionFailed

REFS = "refs"
SNAPSHOTS = "snapshots"
LOCK = "_lock"
MAIN = "main"


class CatalogConflict(RuntimeError):
    """The ref moved since this transaction read its parent snapshot."""


def _join(*parts: str) -> str:
    return "/".join(p.rstrip("/") for p in parts)


class WarehouseCatalog:
    """Catalog over `<warehouse>/_catalog` — see module docstring."""

    def __init__(self, warehouse: str, fs=None, keep_snapshots: int = 2):
        self.warehouse = warehouse.rstrip("/")
        self.root = _join(self.warehouse, "_catalog")
        self.fs = fs or LocalFS()
        self.keep_snapshots = max(2, keep_snapshots)

    # ------------------------------------------------------------ refs --
    def _ref_file(self, ref: str) -> str:
        return _join(self.root, REFS, ref)

    def _snap_file(self, name: str) -> str:
        return _join(self.root, SNAPSHOTS, name)

    def _read_ref(self, ref: str) -> str | None:
        if not self.fs.exists(self._ref_file(ref)):
            return None
        text = self.fs.read_text(self._ref_file(ref)).strip()
        return text or None

    def refs(self) -> list[str]:
        base = _join(self.root, REFS)
        if not self.fs.exists(base):
            return []
        return sorted(
            p.rsplit("/", 1)[-1] for p in self.fs.list_dir(base)
        )

    def _load_snap(self, name: str) -> dict | None:
        """Parsed snapshot file, or None if GC removed it. fs.read_text
        returns None for missing files (it never raises), so every
        snapshot load goes through this check — json.loads(None) was a
        TypeError on any GC-trimmed chain."""
        text = self.fs.read_text(self._snap_file(name))
        return None if text is None else json.loads(text)

    def snapshot(self, ref: str = MAIN) -> dict | None:
        """The ref's current catalog snapshot dict (None = empty ref)."""
        name = self._read_ref(ref)
        if name is None:
            return None
        snap = self._load_snap(name)
        if snap is None:  # head is always GC-retained; missing = damage
            raise FileNotFoundError(
                f"ref {ref!r} points at missing snapshot {name!r}"
            )
        return snap

    def history(self, ref: str = MAIN) -> list[dict]:
        """Newest-first snapshot chain of `ref` (bounded by snapshot
        retention) — the catalog's metadata log, the warehouse-level
        analog of a table's version_log. The walk ends at the first
        GC-trimmed parent."""
        out: list[dict] = []
        node = self._read_ref(ref)
        while node is not None:
            snap = self._load_snap(node)
            if snap is None:  # GC'd tail
                break
            out.append(snap)
            node = snap.get("parent")
        return out

    def snapshot_at(self, seq: int, ref: str = MAIN) -> dict | None:
        """The ref's snapshot with sequence number `seq` (catalog time
        travel, bounded by snapshot retention); None if not retained."""
        for snap in self.history(ref):
            if snap["seq"] == seq:
                return snap
        return None

    def read_at(
        self, spark: SparkSession, table: str, seq: int, ref: str = MAIN
    ) -> DataFrame:
        """Time-travel read: the version of `table` pinned by catalog
        snapshot `seq` — consistent CROSS-TABLE time travel (any two
        read_at calls with the same seq observe one atomic commit),
        which per-table version_back time travel cannot give."""
        snap = self.snapshot_at(seq, ref)
        if snap is None or table not in snap["tables"]:
            raise FileNotFoundError(
                f"table {table!r} not in retained snapshot seq={seq} "
                f"on ref {ref!r}"
            )
        pin = snap["tables"][table]
        return txn.read_named_version(spark, pin["path"], pin["version"])

    def create_ref(self, name: str, from_ref: str = MAIN) -> None:
        """Branch: a new ref pointing at `from_ref`'s current snapshot —
        O(1) metadata, no data copied (the git-like Nessie move). Commits
        to either ref diverge from there; a create over an existing ref
        raises."""
        if self._read_ref(name) is not None:
            raise ValueError(f"ref {name!r} already exists")
        src = self._read_ref(from_ref)
        if src is None:
            raise FileNotFoundError(f"ref {from_ref!r} is empty")
        if not self.fs.create_new(self._ref_file(name), src.encode()):
            raise ValueError(f"ref {name!r} already exists")

    def delete_ref(self, name: str) -> None:
        """Delete a branch pointer (the git-like branch cleanup; Nessie
        exposes exactly this). `main` is protected. The ref's snapshots
        stay on disk until catalog GC trims them through other refs'
        retention walks; its table-version pins drop at the next
        `_sync_table_pins` — so deleting a stale dev branch RELEASES the
        old versions it pinned (without this, every abandoned branch
        pins table versions forever: a real storage leak at warehouse
        scale)."""
        if name == MAIN:
            raise ValueError("refusing to delete ref 'main'")
        with self.fs.lock(_join(self.root, LOCK)):
            if self._read_ref(name) is None:
                raise FileNotFoundError(f"ref {name!r} does not exist")
            self.fs.delete(self._ref_file(name))
            self._sync_table_pins()

    def fast_forward(self, into: str, ref: str) -> None:
        """Merge `ref` into `into` iff `into` has not advanced since the
        fork point (its snapshot is an ancestor of ref's) — the safe
        no-conflict merge. Anything else raises CatalogConflict: this
        layer does not invent table-level merge semantics."""
        with self.fs.lock(_join(self.root, LOCK)):
            target = self._read_ref(ref)
            if target is None:
                raise FileNotFoundError(f"ref {ref!r} is empty")
            cur = self._read_ref(into)
            # walk ref's ancestry back to `cur`
            node = target
            while node is not None:
                if node == cur:
                    self.fs.write_text_atomic(self._ref_file(into), target)
                    self._sync_table_pins()
                    return
                snap = self._load_snap(node)
                if snap is None:
                    # ancestry GC-trimmed before reaching `into`'s head:
                    # fast-forward safety cannot be proven
                    break
                node = snap.get("parent")
            raise CatalogConflict(
                f"{into!r} advanced since {ref!r} forked — not a "
                "fast-forward; rebase the branch"
            )

    def merge_ref(self, into: str, ref: str) -> dict[str, str]:
        """Three-way (Nessie-style) merge of `ref` into `into`: find the
        fork-point snapshot (first common ancestor of both chains) and
        decide per TABLE against it —

        - unchanged on `ref` since the fork → keep `into`'s pin
          (``keep_into``; covers tables only `into` added or changed)
        - changed/added on `ref` only → take `ref`'s pin (``take_ref``
          / ``add_ref``); dropped on `ref` only → drop (``drop_ref``)
        - identical pins on both sides → ``same``
        - changed on BOTH sides to different pins → ``CatalogConflict``
          listing every conflicted table; nothing is written

        Version pins are opaque here — "changed" means the pin moved,
        never a row-level diff: row-level reconciliation belongs to
        operators/recon + merge, not the catalog (Nessie draws the same
        line). The merged state publishes as ONE snapshot on `into`
        via the normal CAS path, so a racing committer surfaces as the
        usual CatalogConflict, and snapshot retention must still cover
        the fork point (a GC-trimmed ancestor refuses loudly rather
        than guessing). Returns {table: action}."""
        with self.fs.lock(_join(self.root, LOCK)):
            into_head = self._read_ref(into)
            ref_head = self._read_ref(ref)
            if into_head is None or ref_head is None:
                raise FileNotFoundError(
                    f"merge_ref needs both refs non-empty "
                    f"({into!r}={into_head}, {ref!r}={ref_head})"
                )
            into_chain: list[str] = []
            node = into_head
            while node is not None:
                into_chain.append(node)
                snap = self._load_snap(node)
                if snap is None:
                    break
                node = snap.get("parent")
            ancestor = None
            node = ref_head
            while node is not None:
                if node in into_chain:
                    ancestor = node
                    break
                snap = self._load_snap(node)
                if snap is None:
                    break
                node = snap.get("parent")
            if ancestor is None:
                raise CatalogConflict(
                    f"no retained common ancestor of {into!r} and "
                    f"{ref!r} — fork point aged out of snapshot "
                    "retention; raise keep_snapshots or rebase"
                )
            if ancestor == ref_head:
                return {}  # ref brings nothing new
            base_t = (self._load_snap(ancestor) or {}).get("tables", {})
            into_t = (self._load_snap(into_head) or {}).get("tables", {})
            ref_t = (self._load_snap(ref_head) or {}).get("tables", {})

            def pin(m, k):
                e = m.get(k)
                return (e["path"], e["version"]) if e else None

            actions: dict[str, str] = {}
            staged: dict[str, dict] = {}
            dropped: set[str] = set()
            conflicts: list[str] = []
            for t in sorted(set(base_t) | set(into_t) | set(ref_t)):
                b, i, r = pin(base_t, t), pin(into_t, t), pin(ref_t, t)
                if r == b:
                    actions[t] = "keep_into"
                elif i == b:
                    if r is None:
                        dropped.add(t)
                        actions[t] = "drop_ref"
                    else:
                        staged[t] = dict(ref_t[t])
                        actions[t] = "take_ref" if b else "add_ref"
                elif i == r:
                    actions[t] = "same"
                else:
                    conflicts.append(t)
            if conflicts:
                raise CatalogConflict(
                    f"merge {ref!r} -> {into!r}: tables changed on both "
                    f"sides since the fork: {conflicts}"
                )
        # publish OUTSIDE the lock (_publish takes it again); the CAS
        # parent check catches any ref movement in between
        if staged or dropped:
            tx = self.transaction(into)
            # pin the parent to the head the decisions were computed
            # against — a ref moved in the gap must fail the CAS, not
            # merge against a stale table map
            tx.parent = into_head
            tx.staged = staged
            tx.dropped = dropped
            tx.meta = {"merge_of": ref, "ancestor": ancestor}
            with tx:
                pass
        return actions

    # ----------------------------------------------------------- reads --
    def table_pin(self, table: str, ref: str = MAIN) -> tuple[str, str]:
        """(path, version) the catalog pins for `table` on `ref`."""
        snap = self.snapshot(ref)
        if snap is None or table not in snap["tables"]:
            raise FileNotFoundError(f"table {table!r} not on ref {ref!r}")
        t = snap["tables"][table]
        return t["path"], t["version"]

    def read(self, spark: SparkSession, table: str, ref: str = MAIN) -> DataFrame:
        """Catalog-consistent read: resolve the version pin, read THAT
        snapshot (not the per-table live pointer) — two reads inside one
        catalog snapshot can never mix commits."""
        path, version = self.table_pin(table, ref)
        return txn.read_named_version(spark, path, version)

    def tables(self, ref: str = MAIN) -> dict[str, dict]:
        snap = self.snapshot(ref)
        return dict(snap["tables"]) if snap else {}

    # --------------------------------------------------------- commits --
    def transaction(self, ref: str = MAIN) -> "CatalogTransaction":
        return CatalogTransaction(self, ref)

    def publish_warehouse_state(
        self, ref: str = MAIN, meta: dict | None = None, retries: int = 3
    ) -> str:
        """Publish ONE catalog snapshot pinning the CURRENT live version
        of every versioned table under the warehouse — the end-of-run
        publication pattern (commit/tag the whole warehouse when a
        pipeline run goes green; Nessie users do exactly this from their
        orchestrator). Readers through the snapshot get a run-consistent
        view of all tables. Metadata-scale walk (one file listing);
        CAS-retried on a concurrent committer, re-resolving fresh
        pointers each try. A warehouse with no versioned tables still
        publishes an (empty) snapshot — every green run produces a
        catalog commit, so Pipeline.run's 'published' claim is always
        backed by a snapshot name."""
        last: Exception | None = None
        for _ in range(max(1, retries)):
            staged: dict[str, dict] = {}
            prefix = self.warehouse + "/"
            for fp, _n, _m in self.fs.list_files(
                self.warehouse, "/" + txn.CURRENT
            ):
                tpath = fp[: -len("/" + txn.CURRENT)]
                rel = tpath[len(prefix):] if tpath.startswith(prefix) else tpath
                if rel.startswith("_catalog"):
                    continue
                ver = txn._read_pointer(tpath, self.fs)
                if ver:
                    staged[rel] = {"path": tpath, "version": ver}
            tx = self.transaction(ref)
            tx.staged = staged
            tx.allow_empty = True
            if meta:
                tx.meta = dict(meta)
            try:
                tx.__exit__(None, None, None)
                return tx.snapshot_name
            except CatalogConflict as e:  # pragma: no cover - racing run
                last = e
        raise last  # pragma: no cover - persistent contention

    def _publish(
        self,
        ref: str,
        staged: dict[str, dict],
        parent: str | None,
        meta: dict | None = None,
        dropped: set[str] | None = None,
    ) -> str:
        """Write the snapshot file, flip the ref under the catalog lock
        with a parent check (CAS when the backend has one)."""
        with self.fs.lock(_join(self.root, LOCK)):
            ref_file = self._ref_file(ref)
            if hasattr(self.fs, "read_text_versioned"):
                text, etag = self.fs.read_text_versioned(ref_file)
                observed = (text.strip() or None) if text is not None else None
            else:
                observed, etag = self._read_ref(ref), None
            if observed != parent:
                raise CatalogConflict(
                    f"ref {ref!r} moved {parent!r} -> {observed!r} since "
                    "this transaction started"
                )
            parent_snap = self._load_snap(observed) if observed else None
            if observed and parent_snap is None:
                raise FileNotFoundError(
                    f"ref {ref!r} points at missing snapshot {observed!r}"
                )
            seq = (parent_snap["seq"] + 1) if parent_snap else 1
            tables = dict(parent_snap["tables"]) if parent_snap else {}
            for n in dropped or ():
                tables.pop(n, None)
            tables.update(staged)
            name = f"s{seq:08d}-{uuid.uuid4().hex[:8]}.json"
            snap = {
                "seq": seq,
                "parent": observed,
                "ref": ref,
                "committed_at": time.time(),
                "tables": tables,
            }
            if meta:
                snap["meta"] = meta
            self.fs.mkdirs(_join(self.root, SNAPSHOTS))
            self.fs.write_text_atomic(self._snap_file(name), json.dumps(snap))
            # OVER-PIN the staged versions BEFORE the ref flip: txn._gc
            # reads `_pins` under the per-table lock, and nothing orders
            # that against this commit — a table commit racing between
            # the flip and a post-flip pin write could collect a version
            # this snapshot pins (most plausible in
            # publish_warehouse_state, which read the pinned version
            # from the live pointer earlier). Pins are a keep-set, so
            # briefly pinning too much is safe; _sync_table_pins prunes
            # to the retained set after the flip.
            for t in staged.values():
                cur_pins = txn.read_pins(t["path"], self.fs)
                if t["version"] not in cur_pins:
                    txn.write_pins(
                        t["path"], cur_pins | {t["version"]}, self.fs
                    )
            try:
                if hasattr(self.fs, "write_text_if"):
                    if observed is None:
                        self.fs.write_text_if(ref_file, name, if_none_match=True)
                    else:
                        self.fs.write_text_if(ref_file, name, if_match=etag)
                else:
                    self.fs.mkdirs(_join(self.root, REFS))
                    self.fs.write_text_atomic(ref_file, name)
            except PreconditionFailed as e:  # pragma: no cover - CAS race
                raise CatalogConflict(
                    f"ref {ref!r}: pointer CAS lost to a racing committer"
                ) from e
            self._gc(ref)
            self._sync_table_pins()
            return name

    def _gc(self, ref: str) -> None:
        """Retain the newest keep_snapshots snapshot files per ref chain;
        older ones delete (their table-version pins expire with them —
        table GC then collects the unpinned versions, see
        _sync_table_pins)."""
        live: set[str] = set()
        for r in self.refs():
            node, kept = self._read_ref(r), 0
            while node is not None and kept < self.keep_snapshots:
                live.add(node)
                kept += 1
                snap = self._load_snap(node)
                if snap is None:  # pragma: no cover - racing GC
                    break
                node = snap.get("parent")
        base = _join(self.root, SNAPSHOTS)
        if not self.fs.exists(base):
            return
        # list_dir returns child NAMES — join before deleting, or the
        # delete targets a relative path and silently no-ops
        for p in self.fs.list_dir(base):
            if p.rsplit("/", 1)[-1] not in live:
                self.fs.delete(_join(base, p))

    def pinned_versions(self) -> dict[str, set[str]]:
        """{table path -> versions} pinned by any RETAINED snapshot of
        any ref — the set table GC must keep beyond keep_versions so no
        catalog read (current or time-travel) ever dangles. Bounded by
        keep_snapshots x refs x tables: metadata scale."""
        pins: dict[str, set[str]] = {}
        for r in self.refs():
            node, kept = self._read_ref(r), 0
            while node is not None and kept < self.keep_snapshots:
                snap = self._load_snap(node)
                if snap is None:
                    break
                for t in snap["tables"].values():
                    pins.setdefault(t["path"], set()).add(t["version"])
                kept += 1
                node = snap.get("parent")
        return pins

    def _sync_table_pins(self) -> None:
        """Write each cataloged table's `_pins` file (txn GC's extra
        keep-set) to the current pin map. Runs after every ref move —
        commit, fast-forward — so a dev-branch commit can never GC the
        version main still pins. The catalog tracks which table paths
        it last pinned (`_pinned_tables` at the catalog root, read and
        rewritten under the catalog lock): a table that leaves every
        retained snapshot gets its pin file cleared to the empty set on
        the next sync, so txn GC resumes normal retention instead of
        keeping stale pinned versions forever."""
        pins = self.pinned_versions()
        tracked_file = _join(self.root, "_pinned_tables")
        text = self.fs.read_text(tracked_file)
        try:
            old_paths: set[str] = set(json.loads(text)) if text else set()
        except ValueError:  # pragma: no cover - corrupt tracking file
            old_paths = set()
        for path, vers in pins.items():
            txn.write_pins(path, vers, self.fs)
        for path in old_paths - set(pins):
            txn.write_pins(path, set(), self.fs)
        if set(pins) != old_paths:
            self.fs.write_text_atomic(
                tracked_file, json.dumps(sorted(pins))
            )


class CatalogTransaction:
    """Stage table versions, publish them as ONE catalog commit.

    Use as a context manager: table writes inside the block go through
    `commit_table` (txn.commit under the hood — per-table pointers move
    immediately, as in any Iceberg warehouse), and the __exit__ publishes
    the catalog snapshot binding ALL staged versions atomically. A crash
    (or exception) before exit leaves the catalog untouched: catalog
    readers keep seeing the parent snapshot's version pins for every
    table — the multi-table atomicity the reference buys from Nessie.
    """

    def __init__(self, catalog: WarehouseCatalog, ref: str = MAIN):
        self.catalog = catalog
        self.ref = ref
        self.parent = catalog._read_ref(ref)
        self.staged: dict[str, dict] = {}
        self.dropped: set[str] = set()
        self.meta: dict | None = None
        self.snapshot_name: str | None = None
        #: publish even with nothing staged (an empty snapshot inherits
        #: the parent's table pins) — publish_warehouse_state sets this
        #: so every green run yields a catalog commit
        self.allow_empty = False

    # -- staging -----------------------------------------------------------
    def commit_table(
        self, name: str, df: DataFrame, subdir: str | None = None, **kw
    ) -> str:
        """txn.commit the frame and stage the resulting version."""
        path = _join(self.catalog.warehouse, subdir or name)
        ver = txn.commit(df, path, **kw)
        self.stage(name, path, ver)
        return ver

    def append_table(
        self, name: str, df: DataFrame, subdir: str | None = None, **kw
    ) -> str:
        """txn.append_files the frame and stage the resulting version."""
        path = _join(self.catalog.warehouse, subdir or name)
        ver = txn.append_files(df, path, **kw)
        self.stage(name, path, ver)
        return ver

    def stage(self, name: str, path: str, version: str) -> None:
        self.staged[name] = {"path": path, "version": version}

    def drop_table(self, name: str) -> None:
        """Stage a table REMOVAL: the published snapshot no longer maps
        `name` (older snapshots still resolve it — catalog time travel
        is unaffected). Once every retained snapshot of every ref has
        aged past the drop, `_sync_table_pins` clears the table's pin
        file and table GC resumes normal retention on its versions."""
        self.dropped.add(name)
        self.staged.pop(name, None)

    # -- context manager ---------------------------------------------------
    def __enter__(self) -> "CatalogTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None and (
            self.staged or self.dropped or self.allow_empty
        ):
            self.snapshot_name = self.catalog._publish(
                self.ref, self.staged, self.parent, self.meta,
                dropped=self.dropped,
            )
        return False
