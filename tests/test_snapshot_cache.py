"""Incremental snapshot cache (delta-spark SnapshotManagement.update
parity, delta/log.py): latest-snapshot replay is O(new commits), the
cache survives appends/DML, and a table recreated in place (rmtree +
rewrite) is detected via the anchor commit's mtime."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS k", "id * 2 AS v")


def test_incremental_replay_and_staleness(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10).coalesce(1), path)
    log = DeltaLog(path)
    s0 = log.snapshot()
    assert log.table_path in _SNAPSHOT_CACHE
    # appends replay incrementally on top of the cached state
    to_delta(_df(spark, 10, 15).coalesce(1), path, mode="append")
    s1 = DeltaLog(path).snapshot()
    assert s1.version == 1 and len(s1.files) == len(s0.files) + 1
    assert read_delta(path, spark=spark).count() == 15
    # overwrite: removes flow through the incremental path too
    to_delta(_df(spark, 0, 3).coalesce(1), path, mode="overwrite")
    s2 = DeltaLog(path).snapshot()
    assert len(s2.files) == 1 and len(s2.tombstones) == 2
    # cached state must not alias the returned snapshot's dicts
    s2.files.clear()
    assert len(DeltaLog(path).snapshot().files) == 1

    # time travel ignores the cache (exact historical replay)
    assert len(DeltaLog(path).snapshot(version=0).files) == 1
    assert read_delta(path, version=1, spark=spark).count() == 15

    # recreate the table IN PLACE: same path, fresh log -> the stale
    # anchor mtime invalidates the entry and replay starts clean
    shutil.rmtree(path)
    to_delta(_df(spark, 0, 4).coalesce(1), path)
    s_new = DeltaLog(path).snapshot()
    assert s_new.version == 0 and len(s_new.files) == 1
    assert read_delta(path, spark=spark).count() == 4
