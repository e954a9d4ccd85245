"""FsspecLogStore against the REAL fsspec interface shape (VERDICT r7
"What's missing #1" / next-round #5).

fsspec is not installed in the CI sandbox, so until now FsspecLogStore
ran only against duck-typed fakes whose method signatures could drift
from ``fsspec.AbstractFileSystem``. The ``VendoredLocalFS`` here pins
the EXACT upstream signatures (names, positional order, defaults —
``ls(path, detail=True)``, ``pipe_file(path, value, **kwargs)``,
``open(path, mode="rb", ...)``, ``find`` returning protocol-stripped
absolute paths, classmethod-style ``_strip_protocol``) over local
disk, and the full d35/d40-style table lifecycle drives every
FsspecLogStore call through it. A call-shape drift (wrong kwarg,
name-vs-path return, detail default) now fails loudly in-sandbox.

``test_real_fsspec_memory_filesystem`` additionally runs the log-op
surface against fsspec's own MemoryFileSystem wherever fsspec IS
installed (pytest.importorskip).
"""

from __future__ import annotations

import datetime
import io
import os
import shutil
import threading

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.logstore import (
    FsspecLogStore,
    _REGISTRY,
    register_conditional_put_kwargs,
    register_log_store,
)
from dask_deltalake_spark.delta.maintenance import optimize, vacuum
from dask_deltalake_spark.delta.mutate import delete_where, update_where
from dask_deltalake_spark.delta.protocol import ConcurrentCommitError
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta, write_commit


class VendoredLocalFS:
    """fsspec.AbstractFileSystem-conformant filesystem over local disk
    (protocol ``vfs``). Method signatures mirror fsspec upstream
    exactly — that conformance IS the test subject."""

    protocol = "vfs"

    @classmethod
    def _strip_protocol(cls, path):
        path = str(path)
        for pre in (f"{cls.protocol}://", f"{cls.protocol}:"):
            if path.startswith(pre):
                path = path[len(pre):]
                break
        return path or "/"

    # --- fsspec surface (upstream signatures) --------------------------
    def exists(self, path, **kwargs):
        return os.path.lexists(self._strip_protocol(path))

    def isdir(self, path):
        return os.path.isdir(self._strip_protocol(path))

    def ls(self, path, detail=True, **kwargs):
        p = self._strip_protocol(path)
        out = sorted(os.path.join(p, f) for f in os.listdir(p))
        if detail:
            return [self.info(x) for x in out]
        return out

    def find(self, path, maxdepth=None, withdirs=False, detail=False, **kwargs):
        p = self._strip_protocol(path)
        out = []
        for dirpath, _dirs, files in os.walk(p):
            for f in files:
                out.append(os.path.join(dirpath, f))
        out.sort()
        if detail:
            return {x: self.info(x) for x in out}
        return out

    def info(self, path, **kwargs):
        p = self._strip_protocol(path)
        st = os.stat(p)
        return {
            "name": p,
            "size": st.st_size,
            "type": "directory" if os.path.isdir(p) else "file",
            "mtime": st.st_mtime,
        }

    def cat_file(self, path, start=None, end=None, **kwargs):
        with open(self._strip_protocol(path), "rb") as f:
            data = f.read()
        return data[start:end] if (start or end) else data

    def open(self, path, mode="rb", block_size=None, cache_options=None,
             compression=None, **kwargs):
        p = self._strip_protocol(path)
        if any(m in mode for m in "wxa"):
            # fsspec LocalFileSystem default: auto_mkdir on write opens
            os.makedirs(os.path.dirname(p), exist_ok=True)
        return open(p, mode)

    def pipe_file(self, path, value, **kwargs):
        if kwargs:
            # a plain local backend takes no PUT preconditions — the
            # TypeError is what real fsspec raises for unknown kwargs
            raise TypeError(f"unexpected keyword arguments {kwargs}")
        p = self._strip_protocol(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(value)

    def modified(self, path):
        return datetime.datetime.fromtimestamp(
            os.stat(self._strip_protocol(path)).st_mtime,
            tz=datetime.timezone.utc,
        )

    def size(self, path):
        return os.stat(self._strip_protocol(path)).st_size

    def rm_file(self, path):
        os.remove(self._strip_protocol(path))

    def makedirs(self, path, exist_ok=False):
        os.makedirs(self._strip_protocol(path), exist_ok=exist_ok)

    def mv(self, path1, path2, recursive=False, maxdepth=None, **kwargs):
        p1, p2 = self._strip_protocol(path1), self._strip_protocol(path2)
        os.makedirs(os.path.dirname(p2), exist_ok=True)
        shutil.move(p1, p2)


class VendoredCASFS(VendoredLocalFS):
    """Object-store shape: no exclusive-create open mode, pipe_file
    with ``IfNoneMatch='*'`` is an atomic server-side create-only PUT
    (the post-2024 S3 semantics) — ladder step 1."""

    protocol = "vcas"
    _srv = threading.Lock()

    def open(self, path, mode="rb", block_size=None, cache_options=None,
             compression=None, **kwargs):
        if "x" in mode:
            raise ValueError(f"mode {mode!r} not supported")
        return super().open(path, mode, block_size, cache_options,
                            compression, **kwargs)

    def pipe_file(self, path, value, **kwargs):
        cond = kwargs.pop("IfNoneMatch", None)
        if kwargs:
            raise TypeError(f"unexpected keyword arguments {kwargs}")
        p = self._strip_protocol(path)
        if cond == "*":
            with self._srv:  # models server-side atomicity
                if os.path.exists(p):
                    raise OSError(
                        "An error occurred (PreconditionFailed) when "
                        "calling the PutObject operation: 412"
                    )
                os.makedirs(os.path.dirname(p), exist_ok=True)
                with open(p, "wb") as f:
                    f.write(value)
            return
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(value)


class _VfsStore(FsspecLogStore):
    """FsspecLogStore whose JVM view strips the scheme (the s3://
    metadata vs s3a:// data split, collapsed onto local disk for the
    test). local_path stays None, so every DML/OPTIMIZE path takes the
    object-store route — staging + seam rename THROUGH the fs."""

    def spark_path(self, path):
        return self.fs._strip_protocol(path)


@pytest.fixture()
def vfs_table(tmp_path):
    register_log_store("vfs", _VfsStore("vfs", fs=VendoredLocalFS()))
    yield f"vfs:{tmp_path}/tbl"
    _REGISTRY.pop("vfs", None)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("p"),
        (F.col("id") * 10).alias("v"),
    )


def test_vendored_fs_full_lifecycle(spark, vfs_table, tmp_path):
    """d35/d40-style lifecycle with EVERY metadata op routed through
    the exact fsspec call shapes: partitioned write (JVM staging +
    fs.mv rename), commit race via the ladder, overwrite, CoW delete,
    update, optimize, vacuum walk/delete via fs.find/fs.rm_file,
    pruned read."""
    to_delta(_df(spark, 0, 90), vfs_table, partition_by=["p"])
    with pytest.raises(ConcurrentCommitError):
        write_commit(vfs_table, 0, [{"commitInfo": {"timestamp": 1}}])
    to_delta(_df(spark, 0, 60), vfs_table, mode="overwrite")
    delete_where(vfs_table, [("k", "<", 6)], spark=spark)
    update_where(vfs_table, [("k", ">=", 57)], {"v": 0}, spark=spark)
    optimize(vfs_table, spark=spark)
    vacuum(vfs_table, retention_hours=0, dry_run=False, spark=spark)
    assert vacuum(vfs_table, retention_hours=0, dry_run=True) == []
    got = read_delta(vfs_table, spark=spark)
    assert got.count() == 54
    assert got.filter("v = 0").count() == 3
    pruned = read_delta(
        vfs_table, filter=[("p", "==", 1)], columns=["k"], spark=spark
    )
    assert pruned.count() == 18
    # nothing bypassed the seam into a junk relative 'vfs:' directory
    assert not os.path.exists("vfs:")
    assert os.path.isdir(f"{tmp_path}/tbl/_delta_log")


def test_vendored_fs_exclusive_create_race(tmp_path):
    """Ladder step 2 (exclusive 'xb' create) through the exact fsspec
    open() signature: two racing writers, exactly one winner."""
    store = _VfsStore("vfs", fs=VendoredLocalFS())
    key = f"vfs:{tmp_path}/log/0.json"
    results = []
    barrier = threading.Barrier(2)

    def run(tag):
        barrier.wait()
        try:
            store.put_if_absent(key, tag)
            results.append("ok")
        except FileExistsError:
            results.append("lost")

    ts = [threading.Thread(target=run, args=(t,)) for t in (b"a", b"b")]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(results) == ["lost", "ok"]


def test_vendored_cas_fs_conditional_put(tmp_path):
    """Ladder step 1 (conditional PUT) through the exact fsspec
    pipe_file(path, value, **kwargs) signature: IfNoneMatch='*'
    arbitrates, the loser surfaces as FileExistsError, and the blind
    fallback is never reached."""
    register_conditional_put_kwargs("vcas", {"IfNoneMatch": "*"})
    store = FsspecLogStore("vcas", fs=VendoredCASFS())
    key = f"vcas:{tmp_path}/log/0.json"
    store.put_if_absent(key, b"first")
    with pytest.raises(FileExistsError):
        store.put_if_absent(key, b"second")
    with open(f"{tmp_path}/log/0.json", "rb") as f:
        assert f.read() == b"first"


def test_real_fsspec_memory_filesystem():
    """Where fsspec IS installed, the same log-op surface runs against
    fsspec's own MemoryFileSystem — the genuine-article check the
    sandbox can't run (skipped there)."""
    fsspec = pytest.importorskip("fsspec")
    fs = fsspec.filesystem("memory")
    store = FsspecLogStore("memory", fs=fs)
    base = "memory://vfy/_delta_log"
    store.makedirs(base)
    store.put_if_absent(f"{base}/0.json", b"v0")
    with pytest.raises(FileExistsError):
        store.put_if_absent(f"{base}/0.json", b"again")
    assert store.read_bytes(f"{base}/0.json") == b"v0"
    assert store.list_dir(base) == ["0.json"]
    assert store.size(f"{base}/0.json") == 2
    store.write_bytes(f"{base}/1.json.tmp", b"v1")
    store.rename(f"{base}/1.json.tmp", f"{base}/1.json")
    assert sorted(store.list_dir(base)) == ["0.json", "1.json"]
    assert store.mtime(f"{base}/1.json") > 0
    assert list(store.walk_files("memory://vfy")) == [
        "_delta_log/0.json",
        "_delta_log/1.json",
    ]
    store.delete(f"{base}/1.json")
    assert store.list_dir(base) == ["0.json"]


def test_vendored_fs_convert_walk_files_stats(spark, vfs_table, tmp_path):
    """CONVERT TO DELTA discovery over FsspecLogStore: one
    find(detail=True) listing supplies (rel, size, mtime) — zero
    per-file HEADs on the fast path — and a backend whose listing
    mtime is an un-float-able ISO string degrades to the per-file
    mtime seam call (or 0.0) instead of crashing the conversion."""
    from dask_deltalake_spark.delta.convert import convert_to_delta
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.logstore import store_for

    src_local = f"{tmp_path}/plainlake"
    (
        spark.range(0, 30)
        .withColumn("p", (F.col("id") % 3).cast("int"))
        .write.partitionBy("p")
        .parquet(src_local)
    )
    seam = f"vfs:{src_local}"
    store = store_for(seam)
    # the RAW seam listing includes _SUCCESS/.crc debris (convert's
    # _discover_files applies the hidden-segment filter) — check the
    # data files it will actually keep
    stats = [
        t
        for t in store.walk_files_stats(seam)
        if t[0].endswith(".parquet")
        and not any(s.startswith((".", "_")) for s in t[0].split("/"))
    ]
    assert stats and all(sz > 0 and mt > 0 for _r, sz, mt in stats)
    # listing-only conversion: the distributed stats pass ships the
    # store to executors, which requires the store CLASS importable
    # there — true for real deployments (installed modules), not for
    # this test-local fake (convert.py:_collect_stats documents it)
    assert convert_to_delta(seam, spark=spark, collect_stats=False) == 0
    assert read_delta(seam, spark=spark).count() == 30
    snap = DeltaLog(seam).snapshot()
    assert all(
        a.size > 0 and a.modification_time > 0 for a in snap.add_actions
    )
    # ISO-string listing mtime: no crash, a float comes back
    fs = store.fs
    orig_info = fs.info
    def iso_info(path, **kw):
        d = dict(orig_info(path, **kw))
        d["mtime"] = "2024-01-01T00:00:00Z"
        return d
    fs.info = iso_info
    try:
        stats2 = list(store.walk_files_stats(seam))
    finally:
        fs.info = orig_info
    assert stats2 and all(isinstance(mt, float) for _r, _s, mt in stats2)


def test_walk_files_stats_double_fallback_uses_now(vfs_table, tmp_path):
    """ADVICE r9: when the listing mtime is unparseable AND the
    per-file mtime seam also fails, walk_files_stats records CURRENT
    time (conservative for retention — the file waits one extra
    window), never 0.0 (which CONVERT would persist as
    modificationTime and vacuum would read as infinitely old),
    and warns once per file."""
    import time

    from dask_deltalake_spark.delta.logstore import store_for

    src = f"{tmp_path}/lake"
    os.makedirs(src)
    with open(f"{src}/a.parquet", "wb") as fh:
        fh.write(b"x" * 8)
    seam = f"vfs:{src}"
    store = store_for(seam)
    fs = store.fs
    orig_find = fs.find

    def bad_find(path, **kw):
        out = orig_find(path, **kw)
        if kw.get("detail"):
            return {
                p: {**info, "mtime": "not-a-time"}
                for p, info in out.items()
            }
        return out

    def bad_mtime(path):
        raise OSError("HEAD failed")

    fs.find = bad_find
    orig_mtime = store.mtime
    store.mtime = bad_mtime
    t0 = time.time()
    try:
        with pytest.warns(RuntimeWarning, match="no parseable mtime"):
            stats = list(store.walk_files_stats(seam))
    finally:
        fs.find = orig_find
        store.mtime = orig_mtime
    assert stats
    for _rel, _size, mt in stats:
        assert t0 - 5 <= mt <= time.time() + 5, (
            "double fallback must record NOW, not 0.0"
        )
