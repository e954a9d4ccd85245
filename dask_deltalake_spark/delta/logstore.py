"""Pluggable log store: every driver-side byte of `_delta_log` (and
table-directory maintenance) I/O goes through this seam.

The reference reads S3-hosted tables end-to-end by constructing an
`s3fs.S3FileSystem` client-side (reference core.py:59-70,
writer.py:202-220). In the Spark-first split, the two halves of table
I/O want DIFFERENT transports:

- **data files** (the 100 TB side) are read/written by EXECUTORS
  through the Hadoop FileSystem layer — `storage_options` map to
  `fs.s3a.*` conf (delta/filesystem.py) and Spark scans `s3a://...`
  paths natively; no Python in that path, ever.
- **the transaction log** (the metadata side) is read/written by the
  DRIVER: listing versions, reading commit JSON, put-if-absent commit
  publication, checkpoint parquet. That is this module. delta-spark
  draws exactly this line (its `LogStore` API); so does delta-rs.

Implementations:

- ``LocalLogStore`` — plain os I/O; put-if-absent via hard-link (the
  same atomicity the local writer always used).
- ``PrefixLogStore`` — maps ``<scheme>:/abs/path`` onto a local root.
  Registered under ``mock:`` as the permanent test double for
  object-store semantics (the delta-spark ``FakeFileSystem`` testing
  pattern): every byte still lands on local disk, but any code path
  that bypasses the seam — a raw ``open()``/``os.*`` call on an
  unresolved path — fails loudly on the scheme prefix. The mapping is
  deterministic (no registration state), so executor-side Python
  helpers resolve it by construction.
- ``FsspecLogStore`` — any fsspec-registered filesystem (s3/gcs/azure
  /memory/...), constructed lazily for unknown schemes. Requires the
  optional ``fsspec`` dependency; without it, unknown schemes raise
  ``NotImplementedError`` naming exactly that. ``put_if_absent`` uses
  exclusive-create where the backend supports it and is documented
  best-effort where object-store semantics cannot provide it (the
  same caveat delta-rs documents for plain S3 without a lock client).
"""

from __future__ import annotations

import os
import re
import uuid
import warnings
from typing import Iterator, Optional

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://?")


def path_scheme(path: str) -> str:
    """URI scheme of ``path`` ('' for plain local paths)."""
    m = _SCHEME_RE.match(str(path))
    return m.group(1).lower() if m else ""


class LogStore:
    """Driver-side metadata I/O over string paths (scheme included)."""

    def local_path(self, path: str) -> Optional[str]:
        """os-level path when this store is locally accessible (then
        executors / the JVM can use it directly), else None."""
        return None

    def spark_path(self, path: str) -> str:
        """Path handed to the JVM / executors for DATA file I/O.
        Default: the local mapping when one exists, else the path
        unchanged (real object-store schemes resolve through Hadoop
        FS conf on the executors — s3a:// etc.). Stores whose scheme
        the JVM does not understand natively override this (the
        S3-on-Hadoop split: Python metadata I/O through this store,
        bulk data I/O through a DIFFERENT JVM-side scheme mapping)."""
        lp = self.local_path(path)
        return lp if lp is not None else path

    # each op takes the FULL path (scheme and all)
    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        """Entry NAMES (not paths) of a directory; [] if absent."""
        raise NotImplementedError

    def walk_files(self, root: str) -> Iterator[str]:
        """All file paths under root, RELATIVE to it (for vacuum)."""
        raise NotImplementedError

    def walk_files_stats(self, root: str) -> Iterator[tuple]:
        """``(relative path, size, mtime)`` of every file under root,
        in ONE listing pass where the backend supports it. Default
        composes walk_files + two per-file metadata calls so custom
        stores stay source-compatible; the local and fsspec stores
        override with single-pass listings — CONVERT TO DELTA on a
        100k-file object-store lake must not issue 200k HEAD
        requests."""
        for rel in self.walk_files(root):
            p = os.path.join(root, rel)
            yield rel, self.size(p), self.mtime(p)

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def open_input(self, path: str):
        """Random-access binary file-like (pyarrow-compatible)."""
        raise NotImplementedError

    def write_bytes(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def put_if_absent(self, path: str, data: bytes) -> None:
        """Atomic create; raises FileExistsError if ``path`` exists —
        the Delta protocol's single atomicity requirement."""
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError


class LocalLogStore(LogStore):
    def _p(self, path: str) -> str:
        return path

    def local_path(self, path: str) -> Optional[str]:
        return self._p(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(self._p(path))

    def list_dir(self, path: str) -> list[str]:
        p = self._p(path)
        return os.listdir(p) if os.path.isdir(p) else []

    def walk_files(self, root: str) -> Iterator[str]:
        r = self._p(root)
        for dirpath, _dirs, files in os.walk(r):
            for f in files:
                yield os.path.relpath(os.path.join(dirpath, f), r)

    def walk_files_stats(self, root: str) -> Iterator[tuple]:
        # scandir recursion: one stat per entry, straight off the
        # directory read — half the syscalls of walk + getsize + getmtime
        r = self._p(root)
        stack = [r]
        while stack:
            d = stack.pop()
            try:
                entries = os.scandir(d)
            except FileNotFoundError:
                continue
            with entries:
                for e in entries:
                    if e.is_dir(follow_symlinks=False):
                        stack.append(e.path)
                        continue
                    if e.is_dir():
                        # symlink to a directory: os.walk-based
                        # walk_files lists it in dirnames and never
                        # yields it — keep the two seam methods
                        # reporting the same file set
                        continue
                    try:
                        st = e.stat()
                    except FileNotFoundError:
                        # dangling symlink: walk_files yields it, so
                        # this walk must too — with the link's own
                        # stat rather than crashing the whole listing
                        st = e.stat(follow_symlinks=False)
                    yield (
                        os.path.relpath(e.path, r),
                        st.st_size,
                        st.st_mtime,
                    )

    def read_bytes(self, path: str) -> bytes:
        with open(self._p(path), "rb") as f:
            return f.read()

    def open_input(self, path: str):
        return open(self._p(path), "rb")

    def write_bytes(self, path: str, data: bytes) -> None:
        p = self._p(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)

    def put_if_absent(self, path: str, data: bytes) -> None:
        final = self._p(path)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = os.path.join(
            os.path.dirname(final), f".tmp-{uuid.uuid4().hex}.json"
        )
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, final)  # hard-link put-if-absent (atomic)
        finally:
            os.unlink(tmp)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(self._p(path))

    def size(self, path: str) -> int:
        return os.path.getsize(self._p(path))

    def delete(self, path: str) -> None:
        os.remove(self._p(path))

    def makedirs(self, path: str) -> None:
        os.makedirs(self._p(path), exist_ok=True)

    def rename(self, src: str, dst: str) -> None:
        d = self._p(dst)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        os.rename(self._p(src), d)


class PrefixLogStore(LocalLogStore):
    """``<scheme>:/abs/path`` (or ``<scheme>:///abs/path``) → local
    ``/abs/path`` under an optional root. Deterministic by design."""

    def __init__(self, scheme: str, root: str = ""):
        self.scheme = scheme
        self.root = root.rstrip("/")

    def _p(self, path: str) -> str:
        p = str(path)
        pre = f"{self.scheme}:"
        if p.lower().startswith(pre):
            p = p[len(pre):]
            if p.startswith("//"):  # scheme://host/abs → drop authority
                p = p[2:]
                p = p[p.index("/"):] if "/" in p else "/"
        return self.root + p if self.root else p


class LockClient:
    """Commit-lock seam for stores with NO atomic put-if-absent (the
    delta-rs DynamoDB lock-client / delta-spark S3DynamoDBLogStore
    analog): serialize the existence-check + write of a commit file
    behind an external mutual-exclusion service. Implementations must
    provide cross-writer mutual exclusion per key."""

    def acquire(self, key: str):
        """Block until the lock for ``key`` is held; returns a token
        to pass to release()."""
        raise NotImplementedError

    def release(self, token) -> None:
        raise NotImplementedError


class InProcessLockClient(LockClient):
    """Single-driver lock client (threading): correct when every
    writer to the table shares this process — multi-thread commit
    races in one Spark driver. Cross-process/cross-host writers need
    a distributed implementation (DynamoDB et al.) behind the same
    two methods."""

    def __init__(self):
        import threading

        self._guard = threading.Lock()
        # key -> [lock, refcount]; the refcount prunes entries when
        # the last holder releases — commit keys are one-shot
        # ({v}.json), so an unpruned map grows one entry per commit
        # for the process lifetime
        self._locks: dict = {}

    def acquire(self, key: str):
        import threading

        with self._guard:
            entry = self._locks.setdefault(key, [threading.Lock(), 0])
            entry[1] += 1
        entry[0].acquire()
        return (key, entry)

    def release(self, token) -> None:
        key, entry = token
        entry[0].release()
        with self._guard:
            entry[1] -= 1
            if entry[1] == 0 and self._locks.get(key) is entry:
                del self._locks[key]


def _is_precondition_failure(exc: BaseException) -> bool:
    """Did a conditional PUT lose the race? Backend-agnostic by
    message sniffing: S3 412 PreconditionFailed, GCS conditionNotMet,
    Azure BlobAlreadyExists, generic 'already exists'."""
    if isinstance(exc, FileExistsError):
        return True
    s = f"{type(exc).__name__}: {exc}"
    return any(
        m in s
        for m in (
            "PreconditionFailed",
            "412",
            "conditionNotMet",
            "ConditionNotMet",
            "BlobAlreadyExists",
            "AlreadyExists",
            "already exists",
        )
    )


def _is_unsupported_mode_error(exc: BaseException) -> bool:
    """Does this error mean the backend doesn't implement exclusive
    'xb' create (→ safe to fall down the ladder), as opposed to a
    transient I/O failure (network hiccup, throttle, permission)
    during an open the backend DOES support? The distinction matters:
    falling through on a transient error would end at the blind
    pipe_file and turn an atomic commit into an unconditional
    overwrite that can clobber a concurrent winner."""
    s = f"{type(exc).__name__}: {exc}".lower()
    return any(
        m in s
        for m in (
            "not supported",
            "unsupported",
            "not implemented",
            "invalid mode",
            "unacceptable mode",
            "mode not",
            "no such mode",
        )
    )


# per-scheme kwargs that turn pipe_file into an atomic create-only PUT
# (server-side compare-and-swap): S3 If-None-Match:* (supported by AWS
# since 2024-08 and by MinIO/R2), GCS generation-0 precondition, Azure
# overwrite=False. Extendable via register_conditional_put_kwargs.
_CONDITIONAL_PUT_KWARGS: dict[str, dict] = {
    "s3": {"IfNoneMatch": "*"},
    "s3a": {"IfNoneMatch": "*"},
    "gs": {"if_generation_match": 0},
    "gcs": {"if_generation_match": 0},
    "abfs": {"overwrite": False},
    "az": {"overwrite": False},
}


def register_conditional_put_kwargs(scheme: str, kwargs: dict) -> None:
    _CONDITIONAL_PUT_KWARGS[scheme.lower()] = dict(kwargs)


class NoLocalPrefixStore(PrefixLogStore):
    """``PrefixLogStore`` that HIDES its local mapping: seam
    (metadata) ops still land on local disk, but ``local_path`` is
    None, so every rewrite/maintenance path must take the object-store
    route — JVM-native staging + seam rename, DV bytes through the
    store, vacuum deletes through the store — exactly as on S3/GCS.
    ``spark_path`` supplies the JVM's view of the data files (the
    s3a:// analog of an s3:// log path). Registered under ``mocknl:``
    as the permanent object-store-semantics test double (used by
    d40_objectstore_dml and tests/test_logstore_dml.py)."""

    def local_path(self, path: str) -> Optional[str]:
        return None

    def spark_path(self, path: str) -> str:
        return self._p(path)


class FsspecLogStore(LogStore):
    """Object-store log I/O through fsspec (requires the optional
    dependency; constructed only for schemes with no registered
    store).

    ``put_if_absent`` — the Delta protocol's one atomicity
    requirement — resolves through a capability ladder:

    1. exclusive-create ``open(path, "xb")`` where the backend
       supports it;
    2. a CONDITIONAL PUT (``pipe_file`` + per-scheme compare-and-swap
       kwargs: S3 ``If-None-Match: *``, GCS ``if_generation_match=0``,
       Azure ``overwrite=False``) — a losing race surfaces as the
       backend's precondition failure and is re-raised as
       ``FileExistsError``;
    3. a registered ``LockClient`` (the delta-rs DynamoDB-lock /
       delta-spark S3DynamoDBLogStore seam) serializing
       check-then-write;
    4. blind ``pipe_file`` — ONLY when none of the above apply,
       preserving delta-rs's documented plain-S3-without-lock caveat.
    """

    def __init__(self, scheme: str, fs=None, lock_client: Optional[LockClient] = None, **fs_options):
        if fs is None:
            import fsspec

            fs = fsspec.filesystem(scheme, **fs_options)
        self.scheme = scheme
        self.fs = fs
        self.lock_client = lock_client

    def exists(self, path: str) -> bool:
        return self.fs.exists(path)

    def is_dir(self, path: str) -> bool:
        return self.fs.isdir(path)

    def list_dir(self, path: str) -> list[str]:
        if not self.fs.isdir(path):
            return []
        return [p.rstrip("/").rsplit("/", 1)[-1] for p in self.fs.ls(path, detail=False)]

    def walk_files(self, root: str) -> Iterator[str]:
        base = self.fs._strip_protocol(root).rstrip("/")
        for p in self.fs.find(root):
            sp = self.fs._strip_protocol(p)
            yield sp[len(base) + 1:]

    def walk_files_stats(self, root: str) -> Iterator[tuple]:
        # one LIST pass: find(detail=True) already carries size and
        # modification time in the listing response — zero HEADs.
        # mtime keys and types vary per backend (s3fs LastModified
        # datetime, gcsfs 'updated' ISO string, ...): anything not
        # directly float-able falls back to ONE per-file mtime() seam
        # call, which normalizes per backend — correctness first, the
        # listing fast path for the common backends.
        base = self.fs._strip_protocol(root).rstrip("/")
        for p, info in sorted(self.fs.find(root, detail=True).items()):
            sp = self.fs._strip_protocol(p)
            mt = (
                info.get("mtime")
                or info.get("LastModified")
                or info.get("last_modified")
                or info.get("updated")
            )
            if hasattr(mt, "timestamp"):  # datetime from s3fs et al.
                mt = mt.timestamp()
            try:
                mt = float(mt)
            except (TypeError, ValueError):
                try:
                    mt = float(self.mtime(p))
                except Exception:
                    # Double fallback failed (listing mtime unparseable
                    # AND the per-file seam errored). Use NOW, not 0.0
                    # (ADVICE r9): CONVERT TO DELTA records this value
                    # as the add's modificationTime, which full-mode
                    # vacuum and the replay RESTORE-shape tombstone
                    # treat as a logical time — a 0 looks infinitely
                    # old and would make the file instantly
                    # reclaimable; NOW is conservative for retention
                    # (the file merely waits one extra window).
                    import time as _time

                    warnings.warn(
                        f"walk_files_stats: no parseable mtime for "
                        f"{p!r}; recording current time "
                        "(conservative for retention)",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    mt = _time.time()
            yield sp[len(base) + 1:], int(info.get("size") or 0), mt

    def read_bytes(self, path: str) -> bytes:
        return self.fs.cat_file(path)

    def open_input(self, path: str):
        return self.fs.open(path, "rb")

    def write_bytes(self, path: str, data: bytes) -> None:
        self.fs.pipe_file(path, data)

    def put_if_absent(self, path: str, data: bytes) -> None:
        if self.fs.exists(path):  # cheap fast-fail; atomicity below
            raise FileExistsError(path)
        # 1) conditional PUT (server-side compare-and-swap) — FIRST
        # for schemes with registered CAS kwargs: on object stores,
        # fsspec's generic "xb" mode is typically EMULATED as a
        # non-atomic exists()-then-write, which would "succeed" here
        # and leave the genuinely atomic PUT unreachable — a silent
        # lost-commit window. The server-side precondition is the only
        # arbitration these stores actually guarantee.
        cond = _CONDITIONAL_PUT_KWARGS.get(self.scheme.lower())
        if cond is not None:
            try:
                self.fs.pipe_file(path, data, **cond)
                return
            except TypeError:
                pass  # backend build doesn't accept the kwargs
            except Exception as e:  # backend precondition failure
                if _is_precondition_failure(e):
                    raise FileExistsError(path) from e
                raise
        # 2) exclusive create (local-like backends, where "x" is a
        # real O_EXCL)
        try:
            with self.fs.open(path, "xb") as f:
                f.write(data)
            return
        except FileExistsError:
            raise
        except (ValueError, NotImplementedError) as e:
            if _is_precondition_failure(e):
                raise FileExistsError(path) from e
            # mode unsupported — fall through the ladder
        except OSError as e:
            if _is_precondition_failure(e):
                raise FileExistsError(path) from e
            if not _is_unsupported_mode_error(e) and not isinstance(
                e, FileNotFoundError
            ):
                # transient I/O failure during a SUPPORTED exclusive
                # create (network hiccup, throttle, permission):
                # re-raise to the caller — degrading to the blind
                # pipe_file at the ladder's end could overwrite a
                # concurrent winner's commit file. FileNotFoundError
                # is exempt: it means the PARENT is missing (the
                # target cannot exist, so nothing can be clobbered)
                # and pipe_file/auto-mkdir backends handle it — the
                # pre-narrowing behavior.
                raise
            # backend signals 'xb' itself is unsupported — fall through
        # 3) external lock client (DynamoDB-lock seam)
        if self.lock_client is not None:
            token = self.lock_client.acquire(path)
            try:
                if self.fs.exists(path):
                    raise FileExistsError(path)
                self.fs.pipe_file(path, data)
                return
            finally:
                self.lock_client.release(token)
        # 4) best-effort blind write (documented delta-rs caveat)
        self.fs.pipe_file(path, data)

    def mtime(self, path: str) -> float:
        try:
            m = self.fs.modified(path)
            return m.timestamp()
        except Exception:
            info = self.fs.info(path)
            m = info.get("mtime") or info.get("LastModified") or 0
            return m.timestamp() if hasattr(m, "timestamp") else float(m)

    def size(self, path: str) -> int:
        return int(self.fs.size(path))

    def delete(self, path: str) -> None:
        self.fs.rm_file(path)

    def makedirs(self, path: str) -> None:
        self.fs.makedirs(path, exist_ok=True)

    def rename(self, src: str, dst: str) -> None:
        self.fs.mv(src, dst)


_LOCAL = LocalLogStore()
_REGISTRY: dict[str, LogStore] = {
    "": _LOCAL,
    "file": _LOCAL,
    "mock": PrefixLogStore("mock"),
    "mocknl": NoLocalPrefixStore("mocknl"),
}


def register_log_store(scheme: str, store: LogStore) -> None:
    _REGISTRY[scheme.lower()] = store


def store_for(path: str) -> LogStore:
    """The LogStore for a path's scheme. Unknown schemes fall back to
    fsspec; without fsspec installed they raise NotImplementedError
    naming the missing dependency (the narrowed S16 gate)."""
    scheme = path_scheme(path)
    if scheme in _REGISTRY:
        return _REGISTRY[scheme]
    try:
        import fsspec  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"Transaction-log I/O over {scheme}:// requires the optional "
            "fsspec dependency (not installed). Data-file I/O alone can "
            "use Hadoop FS via storage_options; for the log, install "
            "fsspec or register_log_store() a custom store."
        )
    store = FsspecLogStore(scheme)
    _REGISTRY[scheme] = store
    return store


def resolve_spark_path(path: str) -> str:
    """Path handed to the JVM / executors for DATA file I/O: the local
    mapping when the store has one (mock:, file:), otherwise the
    store's ``spark_path`` mapping (unchanged by default — real
    object-store schemes resolve through Hadoop FS conf, never
    through Python)."""
    return store_for(path).spark_path(path)
