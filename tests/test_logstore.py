"""LogStore seam (delta/logstore.py): end-to-end table lifecycle over
a NON-LOCAL path scheme.

The ``mock:`` scheme maps ``mock:/abs/path`` onto the local
filesystem — the delta-spark ``FakeFileSystem`` testing pattern: every
byte still lands on disk, but any code path that bypasses the seam
(a raw ``open()``/``os.*`` call on an unresolved path) fails loudly on
the scheme prefix. This is the S16 driver-side completion called out
in VERDICT r5 (#3): read_delta → to_delta → vacuum round-trip on a
scheme'd path, put-if-absent semantics through the store, and the
fsspec gate narrowed to "fsspec not installed"."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.logstore import (
    LocalLogStore,
    PrefixLogStore,
    path_scheme,
    resolve_spark_path,
    store_for,
)
from dask_deltalake_spark.delta.maintenance import (
    cleanup_metadata,
    create_checkpoint,
    read_delta_history,
    restore,
    vacuum,
)
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("p"),
        (F.col("id") * 10).alias("v"),
    )


def test_scheme_parsing_and_resolution(tmp_path):
    assert path_scheme("/a/b") == ""
    assert path_scheme("file:///a") == "file"
    assert path_scheme("mock:/a/b") == "mock"
    assert path_scheme("s3://bucket/k") == "s3"
    assert isinstance(store_for("/a/b"), LocalLogStore)
    st = store_for("mock:/a/b")
    assert isinstance(st, PrefixLogStore)
    assert st.local_path("mock:/x/y") == "/x/y"
    assert st.local_path("mock:///x/y") == "/x/y"
    assert resolve_spark_path(f"mock:{tmp_path}/f") == f"{tmp_path}/f"
    # real object-store schemes pass through unchanged for the JVM
    # (Hadoop FS serves them) but have no LOCAL mapping


def test_unknown_scheme_gate_names_fsspec():
    with pytest.raises(NotImplementedError, match="fsspec"):
        DeltaLog("s3://bucket/table")


def test_put_if_absent_race(tmp_path):
    st = store_for(f"mock:{tmp_path}")
    p = f"mock:{tmp_path}/00000000000000000000.json"
    st.put_if_absent(p, b"winner\n")
    with pytest.raises(FileExistsError):
        st.put_if_absent(p, b"loser\n")
    assert st.read_bytes(p) == b"winner\n"


def test_mock_scheme_full_lifecycle(spark, tmp_path):
    """to_delta → append → read (pruned) → time travel → history →
    checkpoint → vacuum → restore → log cleanup, all addressed through
    the mock: scheme; nothing in the driver path may touch the
    unresolved path directly."""
    path = f"mock:{tmp_path}/t"
    to_delta(_df(spark, 0, 30), path, partition_by=["p"])
    to_delta(_df(spark, 30, 60), path, mode="append")

    # read through the scheme, with projection + partition pruning
    df = read_delta(path, filter=[("p", "==", 1)], columns=["k", "v"], spark=spark)
    assert df.columns == ["k", "v"]
    assert df.count() == 20

    # time travel + datetime-travel plumbing (mtime via the store)
    assert read_delta(path, version=0, spark=spark).count() == 30
    assert len(DeltaLog(path).version_timestamps()) == 2

    # history (commitInfo read through the store)
    h = read_delta_history(path)
    assert len(h) == 2 and h["operation"].tolist() == ["WRITE", "WRITE"]

    # checkpoint written + replayed through the store
    create_checkpoint(path)
    snap = DeltaLog(path).snapshot()
    assert snap.version == 1
    assert DeltaLog(path).checkpoint_versions() == [1]
    # force checkpoint-started replay path
    to_delta(_df(spark, 60, 70), path, mode="append")
    assert read_delta(path, spark=spark).count() == 70

    # overwrite tombstones everything, vacuum(0h) deletes via the store
    to_delta(_df(spark, 0, 9), path, mode="overwrite")
    doomed = vacuum(path, retention_hours=0, dry_run=True)
    assert len(doomed) > 0
    vacuum(path, retention_hours=0, dry_run=False, spark=spark)
    assert vacuum(path, retention_hours=0, dry_run=True) == []
    assert read_delta(path, spark=spark).count() == 9

    # restore (existence checks through the store) — files vacuumed
    # away must be detected...
    with pytest.raises(FileNotFoundError):
        restore(path, version=1, spark=spark)
    # ...and a restorable version restores
    to_delta(_df(spark, 9, 12), path, mode="append")
    restore(path, version=3, spark=spark)
    assert read_delta(path, spark=spark).count() == 9

    # log retention cleanup lists/deletes through the store
    assert cleanup_metadata(path, dry_run=True) == []  # nothing expired


def test_mock_scheme_arrow_engine_and_partition_dirs(spark, tmp_path):
    """The Arrow write engine resolves the local mapping for its
    Python-worker file I/O; hive dirs and stats land identically."""
    path = f"mock:{tmp_path}/t"
    to_delta(_df(spark, 0, 30), path, partition_by=["p"], engine="arrow")
    snap = DeltaLog(path).snapshot()
    assert all(a.partition_values.get("p") in {"0", "1", "2"}
               for a in snap.add_actions)
    assert all(json.loads(a.stats)["numRecords"] > 0 for a in snap.add_actions)
    # the data really lives under the RESOLVED root with hive layout
    assert os.path.isdir(os.path.join(str(tmp_path), "t", "p=1"))
    assert read_delta(path, spark=spark).count() == 30


def test_concurrent_commit_detected_through_store(spark, tmp_path):
    from dask_deltalake_spark.delta.protocol import ConcurrentCommitError
    from dask_deltalake_spark.delta.writer import write_commit

    path = f"mock:{tmp_path}/t"
    to_delta(_df(spark, 0, 5), path)
    with pytest.raises(ConcurrentCommitError):
        write_commit(path, 0, [{"commitInfo": {"timestamp": 1}}])


def test_mock_scheme_dml_and_cdc(spark, tmp_path):
    """DML rewrites, deletion vectors, and CDC reads all route through
    the seam on a scheme'd table — a bypassed path would write into a
    junk relative directory while the commit still published."""
    from dask_deltalake_spark.delta.cdc import read_delta_changes
    from dask_deltalake_spark.delta.mutate import delete_where, update_where

    path = f"mock:{tmp_path}/t"
    to_delta(_df(spark, 0, 30), path)
    delete_where(path, [("k", "<", 5)], spark=spark)  # COW rewrite
    assert read_delta(path, spark=spark).count() == 25
    update_where(path, [("k", ">=", 25)], {"v": 0}, spark=spark)
    got = read_delta(path, spark=spark)
    assert got.filter("v = 0").count() == 5
    # merge-on-read writes a deletion vector THROUGH the seam
    delete_where(
        path, [("k", "==", 10)], spark=spark, strategy="merge-on-read"
    )
    assert read_delta(path, spark=spark).count() == 24
    # no junk 'mock:' directory ever appeared under the CWD
    assert not os.path.exists("mock:")
    # CDC over the whole history reads through resolved paths
    ch = read_delta_changes(path, starting_version=-1, spark=spark)
    assert ch.filter("_change_type = 'insert'").count() >= 30
    assert ch.filter("_change_type = 'delete'").count() >= 5


# ---------------------------------------------------------------------------
# put-if-absent capability ladder (VERDICT r6 "What's missing #2")
# ---------------------------------------------------------------------------


class _FakeClientError(Exception):
    pass


class _CondPutOnlyFS:
    """Fake object store that supports ONLY conditional PUT (the
    post-2024 S3 shape): no exclusive-create open mode, pipe_file with
    IfNoneMatch='*' is an atomic server-side compare-and-swap."""

    def __init__(self):
        import threading

        self.objs = {}
        self._srv = threading.Lock()  # models server-side atomicity
        self.blind_puts = 0

    def exists(self, p):
        return p in self.objs

    def open(self, p, mode="rb"):
        if "x" in mode:
            raise ValueError("mode 'xb' not supported")
        if "r" in mode:
            import io

            return io.BytesIO(self.objs[p])
        raise ValueError(mode)

    def pipe_file(self, p, data, **kw):
        if kw.get("IfNoneMatch") == "*":
            with self._srv:
                if p in self.objs:
                    raise _FakeClientError(
                        "An error occurred (PreconditionFailed) when "
                        "calling the PutObject operation: 412"
                    )
                self.objs[p] = data
        else:
            self.blind_puts += 1
            self.objs[p] = data


class _DumbFS(_CondPutOnlyFS):
    """No exclusive create AND no conditional PUT — the plain-S3
    legacy shape that needs a lock client."""

    def pipe_file(self, p, data, **kw):
        if kw:
            raise TypeError("unexpected keyword arguments")
        self.blind_puts += 1
        self.objs[p] = data


def test_conditional_put_exactly_one_winner():
    import threading

    from dask_deltalake_spark.delta.logstore import FsspecLogStore

    fs = _CondPutOnlyFS()
    store = FsspecLogStore("s3", fs=fs)
    results = []

    def commit(tag):
        try:
            store.put_if_absent("bucket/_delta_log/0.json", tag)
            results.append(("ok", tag))
        except FileExistsError:
            results.append(("lost", tag))

    # start both past the exists() fast-fail window: neither sees the
    # object yet, only the conditional PUT can arbitrate
    barrier = threading.Barrier(2)

    def run(tag):
        barrier.wait()
        commit(tag)

    ts = [threading.Thread(target=run, args=(t,)) for t in (b"a", b"b")]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(r[0] for r in results) == ["lost", "ok"]
    winner = [tag for st, tag in results if st == "ok"][0]
    assert fs.objs["bucket/_delta_log/0.json"] == winner
    assert fs.blind_puts == 0, "must never fall through to blind PUT"


def test_conditional_put_sequential_loser_raises():
    from dask_deltalake_spark.delta.logstore import FsspecLogStore

    fs = _CondPutOnlyFS()
    store = FsspecLogStore("s3", fs=fs)
    store.put_if_absent("k", b"first")
    with pytest.raises(FileExistsError):
        store.put_if_absent("k", b"second")
    assert fs.objs["k"] == b"first"


def test_lock_client_ladder_step():
    import threading

    from dask_deltalake_spark.delta.logstore import (
        FsspecLogStore,
        InProcessLockClient,
    )

    fs = _DumbFS()
    store = FsspecLogStore("dumb", fs=fs, lock_client=InProcessLockClient())
    barrier = threading.Barrier(2)
    results = []

    def run(tag):
        barrier.wait()
        try:
            store.put_if_absent("log/0.json", tag)
            results.append("ok")
        except FileExistsError:
            results.append("lost")

    ts = [threading.Thread(target=run, args=(t,)) for t in (b"a", b"b")]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(results) == ["lost", "ok"]


def test_no_capability_falls_back_blind():
    from dask_deltalake_spark.delta.logstore import FsspecLogStore

    fs = _DumbFS()
    store = FsspecLogStore("dumb", fs=fs)  # no lock client either
    store.put_if_absent("k", b"v")  # documented best-effort path
    assert fs.blind_puts == 1


def test_transient_oserror_does_not_degrade_to_blind_put():
    """A transient I/O failure (network hiccup, throttle) during a
    SUPPORTED exclusive create must re-raise — falling down the
    ladder would end at the blind pipe_file and let this writer
    overwrite a concurrent winner's commit file (r7 ADVICE)."""
    from dask_deltalake_spark.delta.logstore import FsspecLogStore

    class _FlakyFS(_DumbFS):
        def open(self, p, mode="rb"):
            if "x" in mode:
                raise OSError("Connection reset by peer")
            return super().open(p, mode)

    fs = _FlakyFS()
    store = FsspecLogStore("dumb", fs=fs)
    with pytest.raises(OSError, match="Connection reset"):
        store.put_if_absent("k", b"v")
    assert fs.blind_puts == 0, "transient error must not blind-write"
    assert "k" not in fs.objs


def test_unsupported_mode_oserror_still_falls_through():
    """Backends that signal missing 'xb' support via OSError (not
    ValueError) keep the documented ladder fallback."""
    from dask_deltalake_spark.delta.logstore import FsspecLogStore

    class _ModeErrFS(_DumbFS):
        def open(self, p, mode="rb"):
            if "x" in mode:
                raise OSError("mode 'xb' not supported by this backend")
            return super().open(p, mode)

    fs = _ModeErrFS()
    store = FsspecLogStore("dumb", fs=fs)
    store.put_if_absent("k", b"v")  # best-effort blind path, documented
    assert fs.blind_puts == 1
    assert fs.objs["k"] == b"v"
