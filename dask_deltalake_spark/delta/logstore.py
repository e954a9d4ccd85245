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


class FsspecLogStore(LogStore):
    """Object-store log I/O through fsspec (requires the optional
    dependency; constructed only for schemes with no registered
    store). put_if_absent is exclusive-create where the backend
    supports it — on eventually-consistent stores without it, commit
    races are best-effort detected (delta-rs documents the same
    caveat for S3 without a lock client)."""

    def __init__(self, scheme: str, **fs_options):
        import fsspec

        self.scheme = scheme
        self.fs = fsspec.filesystem(scheme, **fs_options)

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

    def read_bytes(self, path: str) -> bytes:
        return self.fs.cat_file(path)

    def open_input(self, path: str):
        return self.fs.open(path, "rb")

    def write_bytes(self, path: str, data: bytes) -> None:
        self.fs.pipe_file(path, data)

    def put_if_absent(self, path: str, data: bytes) -> None:
        if self.fs.exists(path):
            raise FileExistsError(path)
        try:
            with self.fs.open(path, "xb") as f:  # exclusive where supported
                f.write(data)
        except (ValueError, NotImplementedError):
            self.fs.pipe_file(path, data)  # best-effort (documented)

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
