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
    # post-enablement commits are staged (and, at interval 1,
    # immediately backfilled: classic file exists too)
    to_delta(_df(spark, 10, 20), path, mode="append")
    staged = os.listdir(os.path.join(path, "_delta_log", STAGED_DIR))
    assert any(s.startswith(f"{2:020d}.") for s in staged)
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
    assert co.get_commits(path, 0) == []
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
