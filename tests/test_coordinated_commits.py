"""Coordinated commits (delta/coordinated.py): commit arbitration via
a registered commit coordinator instead of filesystem put-if-absent.

Covers: enablement (properties + writer feature), commit routing
through staged files, single-winner arbitration under a thread race,
deferred backfill with reader-side staged-tail merge, backfill
catch-up, the unknown-coordinator refusal, and interop (backfilled
log remains classic — history/time travel work).
"""

from __future__ import annotations

import os
import threading

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.coordinated import (
    COORDINATOR_PROP,
    InProcessCommitCoordinator,
    STAGED_DIR,
    backfill_commits,
    enable_coordinated_commits,
    register_commit_coordinator,
)
from dask_deltalake_spark.delta.log import DeltaLog, _SNAPSHOT_CACHE
from dask_deltalake_spark.delta.protocol import ConcurrentCommitError
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta, write_commit


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_enable_sets_properties_and_feature(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "in-process")
    snap = DeltaLog(path).snapshot()
    assert snap.metadata.configuration[COORDINATOR_PROP] == "in-process"
    assert "coordinatedCommits" in (snap.protocol.writer_features or [])
    # post-enablement commits are staged, then (at interval 1)
    # immediately backfilled: the classic file exists and the staged
    # original is cleaned up
    to_delta(_df(spark, 10, 20), path, mode="append")
    assert os.listdir(os.path.join(path, "_delta_log", STAGED_DIR)) == []
    assert os.path.exists(
        os.path.join(path, "_delta_log", f"{2:020d}.json")
    )
    assert read_delta(path, spark=spark).count() == 20


def test_coordinator_single_winner_race(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "in-process")
    version = DeltaLog(path).snapshot().version + 1
    results = []
    barrier = threading.Barrier(2)

    def run(tag):
        barrier.wait()
        try:
            write_commit(
                path, version,
                [{"commitInfo": {"timestamp": 1, "operation": tag}}],
            )
            results.append("ok")
        except ConcurrentCommitError:
            results.append("lost")

    ts = [threading.Thread(target=run, args=(t,)) for t in ("a", "b")]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(results) == ["lost", "ok"]


def test_deferred_backfill_reader_merges_staged_tail(spark, tmp_path):
    co = InProcessCommitCoordinator()
    register_commit_coordinator("test-deferred", co)
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(
        path, "test-deferred", backfill_interval=1000
    )
    to_delta(_df(spark, 10, 20), path, mode="append")  # staged only
    assert not os.path.exists(
        os.path.join(path, "_delta_log", f"{2:020d}.json")
    ), "interval defers the classic file"
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    assert snap.version == 2, "reader merges the staged tail"
    assert read_delta(path, spark=spark).count() == 20
    # another staged commit on top of a staged tail: versions chain
    to_delta(_df(spark, 20, 30), path, mode="append")
    _SNAPSHOT_CACHE.clear()
    assert DeltaLog(path).snapshot().version == 3
    assert read_delta(path, spark=spark).count() == 30
    # catch-up backfill materializes the classic files
    done = backfill_commits(path)
    assert done == [2, 3]
    for v in (2, 3):
        assert os.path.exists(
            os.path.join(path, "_delta_log", f"{v:020d}.json")
        )
    tid = DeltaLog(path).snapshot().metadata.id
    assert co.get_commits(tid, 0) == [], "ledger drained after backfill"
    _SNAPSHOT_CACHE.clear()
    assert DeltaLog(path).snapshot().version == 3
    assert read_delta(path, spark=spark).count() == 30


def test_unknown_coordinator_refuses_reads_and_writes(spark, tmp_path):
    co = InProcessCommitCoordinator()
    register_commit_coordinator("test-vanishing", co)
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "test-vanishing")
    from dask_deltalake_spark.delta import coordinated

    del coordinated._COORDINATORS["test-vanishing"]
    try:
        _SNAPSHOT_CACHE.clear()
        with pytest.raises(ValueError, match="coordinator"):
            DeltaLog(path).snapshot()
        with pytest.raises(ValueError, match="coordinator"):
            to_delta(_df(spark, 10, 20), path, mode="append")
    finally:
        coordinated._COORDINATORS["test-vanishing"] = co


def test_backfilled_history_stays_classic(spark, tmp_path):
    from dask_deltalake_spark.delta.maintenance import read_delta_history

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "in-process")
    to_delta(_df(spark, 10, 20), path, mode="append")
    to_delta(_df(spark, 0, 5), path, mode="overwrite")
    hist = read_delta_history(path)
    assert len(hist) == 4  # create, enable, append, overwrite
    assert read_delta(path, version=2, spark=spark).count() == 20
    assert read_delta(path, spark=spark).count() == 5


# --- r7 self-review regression pins ---------------------------------------


def test_reenable_preserves_accepted_commits(spark, tmp_path):
    """Re-enablement must NOT wipe the coordinator's ledger: a staged-
    only commit stays visible across a second enable (conf change)."""
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "in-process", backfill_interval=1000)
    to_delta(_df(spark, 10, 20), path, mode="append")  # v2 staged-only
    enable_coordinated_commits(path, "in-process", backfill_interval=1)
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    assert snap.version == 3  # v2 (staged) + v3 (settings) both visible
    assert read_delta(path, spark=spark).count() == 20
    assert backfill_commits(path) != None  # noqa: E711 — flush remainder
    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == 20


def test_recreated_table_does_not_inherit_ledger(spark, tmp_path):
    """The ledger is keyed by table GUID: a re-created table at the
    same path starts clean (no phantom version conflicts)."""
    import shutil

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "in-process", backfill_interval=1000)
    to_delta(_df(spark, 10, 20), path, mode="append")  # staged v2
    shutil.rmtree(path)
    _SNAPSHOT_CACHE.clear()
    to_delta(_df(spark, 0, 5), path)
    enable_coordinated_commits(path, "in-process", backfill_interval=1000)
    to_delta(_df(spark, 5, 8), path, mode="append")  # would be v2 again
    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == 8


def test_ict_chain_survives_staged_only_predecessor(spark, tmp_path):
    """ICT stamping must read a staged-only predecessor's clock
    through the coordinator — the monotonic chain cannot break at an
    unbackfilled commit."""
    from dask_deltalake_spark.delta.coordinated import staged_commit_path
    from dask_deltalake_spark.delta.ict import enable_in_commit_timestamps

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_in_commit_timestamps(path)
    enable_coordinated_commits(path, "in-process", backfill_interval=1000)
    to_delta(_df(spark, 10, 20), path, mode="append")  # v3 staged-only
    to_delta(_df(spark, 20, 30), path, mode="append")  # v4 staged-only
    _SNAPSHOT_CACHE.clear()
    log = DeltaLog(path)
    snap = log.snapshot()
    assert snap.version == 4
    co_meta = snap.metadata
    from dask_deltalake_spark.delta.coordinated import (
        coordinator_from_metadata,
    )
    import json as _json

    impl, _ = coordinator_from_metadata(co_meta)
    icts = {}
    for sv, sname in impl.get_commits(co_meta.id, 0):
        raw = open(staged_commit_path(log.log_path, sv, sname)).read()
        for line in raw.splitlines():
            a = _json.loads(line)
            if "commitInfo" in a:
                icts[sv] = a["commitInfo"].get("inCommitTimestamp")
                break
    assert icts.get(3) is not None and icts.get(4) is not None
    assert icts[4] > icts[3], "monotonic chain across staged-only commits"


def test_backfill_removes_staged_files(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "in-process", backfill_interval=1000)
    to_delta(_df(spark, 10, 20), path, mode="append")
    sd = os.path.join(path, "_delta_log", STAGED_DIR)
    assert len(os.listdir(sd)) == 1
    backfill_commits(path)
    assert os.listdir(sd) == [], "backfilled staged files are deleted"
    # immediate-backfill mode cleans as it goes
    path2 = str(tmp_path / "t2")
    to_delta(_df(spark, 0, 10), path2)
    enable_coordinated_commits(path2, "in-process", backfill_interval=1)
    to_delta(_df(spark, 10, 20), path2, mode="append")
    assert os.listdir(os.path.join(path2, "_delta_log", STAGED_DIR)) == []


def test_history_and_cdc_see_staged_tail(spark, tmp_path):
    from dask_deltalake_spark.delta.cdc import read_delta_changes
    from dask_deltalake_spark.delta.maintenance import read_delta_history
    from dask_deltalake_spark.delta.mutate import delete_where

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "in-process", backfill_interval=1000)
    delete_where(path, [("k", "<", 3)], spark=spark)  # v2 staged-only
    _SNAPSHOT_CACHE.clear()
    hist = read_delta_history(path)
    assert len(hist) == 3, "history merges the staged tail"
    assert hist.iloc[0]["operation"] == "DELETE"
    # CDC performs the reader-side backfill catch-up, then sees all
    ch = read_delta_changes(path, starting_version=1, spark=spark)
    assert ch.filter("_change_type = 'delete'").count() == 3
    assert os.path.exists(
        os.path.join(path, "_delta_log", f"{2:020d}.json")
    ), "CDC catch-up backfilled the classic file"


def test_cleanup_expires_staged_orphans(spark, tmp_path):
    import time as _time

    from dask_deltalake_spark.delta.maintenance import (
        cleanup_metadata,
        create_checkpoint,
    )

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    to_delta(_df(spark, 10, 20), path, mode="append")
    to_delta(_df(spark, 20, 30), path, mode="append")
    # plant an orphan staged file (a lost race's leftover) below the
    # future boundary
    sd = os.path.join(path, "_delta_log", STAGED_DIR)
    os.makedirs(sd, exist_ok=True)
    orphan = os.path.join(sd, f"{1:020d}.deadbeef.json")
    with open(orphan, "w") as f:
        f.write("{}\n")
    create_checkpoint(path, version=2)
    old = _time.time() - 100 * 24 * 3600
    for v in (0, 1):
        os.utime(
            os.path.join(path, "_delta_log", f"{v:020d}.json"), (old, old)
        )
    doomed = cleanup_metadata(path)
    assert os.path.join(STAGED_DIR, f"{1:020d}.deadbeef.json") in doomed
    assert not os.path.exists(orphan)


def test_backfilled_version_cannot_be_recommitted(spark, tmp_path):
    """The arbitration bug the full-suite race caught: after backfill
    drops a version from the unbackfilled ledger, a late writer
    re-submitting that version must STILL lose (high-water mark), or
    the log forks — one winner via coordinator, one via the classic
    path."""
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "in-process")  # interval 1
    to_delta(_df(spark, 10, 20), path, mode="append")  # v2, backfilled
    with pytest.raises(ConcurrentCommitError):
        write_commit(
            path, 2, [{"commitInfo": {"timestamp": 1, "operation": "X"}}]
        )
    # and a version AHEAD of the chain is rejected too
    with pytest.raises(ConcurrentCommitError):
        write_commit(
            path, 9, [{"commitInfo": {"timestamp": 1, "operation": "X"}}]
        )
    assert read_delta(path, spark=spark).count() == 20


def test_disable_returns_to_classic_commits(spark, tmp_path):
    from dask_deltalake_spark.delta.coordinated import (
        disable_coordinated_commits,
    )

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "in-process", backfill_interval=1000)
    to_delta(_df(spark, 10, 20), path, mode="append")  # staged-only v2
    v = disable_coordinated_commits(path)
    assert v == 3
    # everything classic: staged flushed, removal commit backfilled
    for ver in (2, 3):
        assert os.path.exists(
            os.path.join(path, "_delta_log", f"{ver:020d}.json")
        )
    assert os.listdir(os.path.join(path, "_delta_log", STAGED_DIR)) == []
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    assert COORDINATOR_PROP not in snap.metadata.configuration
    # subsequent commits are classic put-if-absent (no staged file)
    to_delta(_df(spark, 20, 30), path, mode="append")
    assert os.listdir(os.path.join(path, "_delta_log", STAGED_DIR)) == []
    assert read_delta(path, spark=spark).count() == 30
    # idempotent
    assert disable_coordinated_commits(path) == 4


# --- r8 ADVICE regression pins (stale-checkpoint corruption class) ---------


def test_auto_checkpoint_skips_staged_only_version(spark, tmp_path):
    """Deferred backfill + checkpointInterval crossing: the auto-
    checkpoint hook must SKIP a staged-only version — a checkpoint
    labeled past the classic latest would anchor later replays on
    state that silently lost the staged tail (r7 ADVICE, high)."""
    import glob

    path = str(tmp_path / "t")
    to_delta(
        _df(spark, 0, 10),
        path,
        configuration={"delta.checkpointInterval": "2"},
    )
    enable_coordinated_commits(path, "in-process", backfill_interval=1000)
    to_delta(_df(spark, 10, 20), path, mode="append")  # v2 staged-only
    assert glob.glob(os.path.join(path, "_delta_log", "*.checkpoint*")) == []
    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == 20
    # after backfill the same version checkpoints fine
    backfill_commits(path)
    from dask_deltalake_spark.delta.maintenance import create_checkpoint

    create_checkpoint(path, version=2)
    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == 20


def test_create_checkpoint_refuses_staged_only_version(spark, tmp_path):
    from dask_deltalake_spark.delta.maintenance import create_checkpoint

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "in-process", backfill_interval=1000)
    to_delta(_df(spark, 10, 20), path, mode="append")  # v2 staged-only
    with pytest.raises(ValueError, match="backfill_commits"):
        create_checkpoint(path, version=2)


def test_cleanup_boundary_capped_at_classic_latest(spark, tmp_path):
    """A latest-mode checkpoint on a deferred-backfill table sits at a
    staged-merged version PAST the classic log; a cleanup boundary
    anchored there would delete the whole classic log and the only
    copy of the accepted staged tail (r7 ADVICE, medium)."""
    from dask_deltalake_spark.delta.maintenance import (
        cleanup_metadata,
        create_checkpoint,
    )

    path = str(tmp_path / "t")
    to_delta(
        _df(spark, 0, 10),
        path,
        configuration={"delta.logRetentionDuration": "interval 1 hours"},
    )
    enable_coordinated_commits(path, "in-process", backfill_interval=1000)
    to_delta(_df(spark, 10, 20), path, mode="append")  # v2 staged-only
    to_delta(_df(spark, 20, 30), path, mode="append")  # v3 staged-only
    create_checkpoint(path)  # staged-merged state, labeled v3
    # age every classic commit far past retention
    import time

    old = time.time() - 100 * 24 * 3600
    for v in (0, 1):
        os.utime(os.path.join(path, "_delta_log", f"{v:020d}.json"), (old, old))
    doomed = cleanup_metadata(path)
    # boundary capped at classic latest (1): the classic log survives
    assert os.path.exists(os.path.join(path, "_delta_log", f"{1:020d}.json"))
    sd = os.path.join(path, "_delta_log", STAGED_DIR)
    assert len(os.listdir(sd)) == 2, "accepted staged tail survives"
    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == 30
    assert backfill_commits(path) == [2, 3]
    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == 30
    assert f"{3:020d}.json" not in doomed


def test_crash_recovery_refuses_then_recovers(spark, tmp_path):
    """Coordinator loss (driver restart): staged-but-unbackfilled
    commits persist while a FRESH coordinator has no ledger. Reads
    must refuse (never silently drop the staged tail), and
    recover_staged_commits must re-adopt the chain (VERDICT r7 #8)."""
    from dask_deltalake_spark.delta.coordinated import (
        OrphanedStagedCommitsError,
        recover_staged_commits,
    )

    co = InProcessCommitCoordinator()
    register_commit_coordinator("test-crash", co)
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "test-crash", backfill_interval=1000)
    to_delta(_df(spark, 10, 20), path, mode="append")  # v2 staged-only
    to_delta(_df(spark, 20, 30), path, mode="append")  # v3 staged-only
    # simulate the crash: a fresh coordinator instance under the name
    fresh = InProcessCommitCoordinator()
    register_commit_coordinator("test-crash", fresh)
    try:
        _SNAPSHOT_CACHE.clear()
        with pytest.raises(OrphanedStagedCommitsError, match="recover"):
            DeltaLog(path).snapshot()
        # writes refuse too (a re-issued v2 would fork the log)
        with pytest.raises(OrphanedStagedCommitsError):
            to_delta(_df(spark, 30, 40), path, mode="append")
        assert recover_staged_commits(path) == [2, 3]
        _SNAPSHOT_CACHE.clear()
        assert DeltaLog(path).snapshot().version == 3
        assert read_delta(path, spark=spark).count() == 30
        # adopted tail backfills normally
        assert backfill_commits(path) == [2, 3]
        for v in (2, 3):
            assert os.path.exists(
                os.path.join(path, "_delta_log", f"{v:020d}.json")
            )
    finally:
        register_commit_coordinator("test-crash", co)


def test_fresh_coordinator_clean_table_reads_fine(spark, tmp_path):
    """No orphans (everything backfilled) → a fresh coordinator reads
    the table without refusal: the orphan check is a crash gate, not
    a restart tax."""
    co = InProcessCommitCoordinator()
    register_commit_coordinator("test-crash2", co)
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "test-crash2", backfill_interval=1000)
    to_delta(_df(spark, 10, 20), path, mode="append")
    backfill_commits(path)
    fresh = InProcessCommitCoordinator()
    register_commit_coordinator("test-crash2", fresh)
    try:
        _SNAPSHOT_CACHE.clear()
        assert read_delta(path, spark=spark).count() == 20
        to_delta(_df(spark, 20, 25), path, mode="append")
        _SNAPSHOT_CACHE.clear()
        assert read_delta(path, spark=spark).count() == 25
    finally:
        register_commit_coordinator("test-crash2", co)


def test_explicit_version_read_cannot_bypass_orphan_gate(spark, tmp_path):
    """An explicit-version snapshot at the classic latest must NOT
    warm the cache on a coordinated table: pre-fix it did, and the
    next latest read consumed the cached entry, skipped the
    orphaned-staged-commit gate, and silently served state missing
    the accepted staged tail (self-review r8 — the exact data-loss
    class the gate exists to refuse)."""
    from dask_deltalake_spark.delta.coordinated import (
        OrphanedStagedCommitsError,
    )

    co = InProcessCommitCoordinator()
    register_commit_coordinator("test-crash3", co)
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    enable_coordinated_commits(path, "test-crash3", backfill_interval=1000)
    to_delta(_df(spark, 10, 20), path, mode="append")  # v2 staged-only
    classic_latest = 1  # v0 create + v1 enable commit
    fresh = InProcessCommitCoordinator()
    register_commit_coordinator("test-crash3", fresh)
    try:
        _SNAPSHOT_CACHE.clear()
        # explicit-version time travel on classic history is legal...
        snap = DeltaLog(path).snapshot(version=classic_latest)
        assert snap.version == classic_latest
        # ...but must not have warmed the cache: the latest read still
        # refuses on the orphaned staged tail
        with pytest.raises(OrphanedStagedCommitsError):
            DeltaLog(path).snapshot()
    finally:
        register_commit_coordinator("test-crash3", co)
