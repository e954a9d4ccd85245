"""deep_clone + restore-to-timestamp (r8)."""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.clone import deep_clone
from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
from dask_deltalake_spark.delta.mutate import delete_where
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def test_deep_clone_independent_copy(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    df = spark.range(0, 100).withColumn("part", (F.col("id") % 2).cast("int"))
    to_delta(df, src, partition_by=["part"])
    deep_clone(src, tgt, spark=spark)
    snap = DeltaLog(tgt).snapshot()
    # every add is a RELATIVE path whose file exists under the clone
    for a in snap.add_actions:
        assert not a.path.startswith("/")
        assert os.path.exists(os.path.join(tgt, a.path))
    assert read_delta(tgt, spark=spark).count() == 100
    # divergence: append to clone only
    to_delta(
        spark.range(500, 510).withColumn("part", F.lit(0)), tgt,
        mode="append",
    )
    assert read_delta(tgt, spark=spark).count() == 110
    assert read_delta(src, spark=spark).count() == 100
    # source destruction cannot touch the clone
    shutil.rmtree(src)
    _SNAPSHOT_CACHE.clear()
    assert read_delta(tgt, spark=spark).count() == 110


def test_deep_clone_carries_deletion_vectors(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    to_delta(spark.range(0, 200).repartition(4), src)
    delete_where(src, [("id", "<", 50)], spark=spark,
                 strategy="merge-on-read")
    deep_clone(src, tgt, spark=spark)
    snap = DeltaLog(tgt).snapshot()
    assert any(a.deletion_vector for a in snap.add_actions)
    shutil.rmtree(src)
    _SNAPSHOT_CACHE.clear()
    got = read_delta(tgt, spark=spark)
    assert got.count() == 150
    assert got.agg(F.min("id")).first()[0] == 50


def test_deep_clone_flattens_shallow_chain(spark, tmp_path):
    from dask_deltalake_spark.delta.clone import shallow_clone

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    c = str(tmp_path / "c")
    to_delta(spark.range(0, 30), a)
    shallow_clone(a, b)
    deep_clone(b, c, spark=spark)
    shutil.rmtree(a)
    shutil.rmtree(b)
    _SNAPSHOT_CACHE.clear()
    assert read_delta(c, spark=spark).count() == 30


def test_deep_clone_at_version_and_refusals(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    to_delta(spark.range(0, 10), src)
    to_delta(spark.range(10, 20), src, mode="append")
    deep_clone(src, tgt, spark=spark, version=0)
    assert read_delta(tgt, spark=spark).count() == 10
    with pytest.raises(ValueError, match="already exists"):
        deep_clone(src, tgt, spark=spark)


def test_deep_clone_strips_source_anchored_config(spark, tmp_path):
    from dask_deltalake_spark.delta.ict import enable_in_commit_timestamps

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    to_delta(spark.range(0, 10), src, configuration={"team": "data"})
    enable_in_commit_timestamps(src)
    deep_clone(src, tgt, spark=spark)
    cfg = DeltaLog(tgt).snapshot().metadata.configuration
    assert cfg.get("team") == "data"
    assert "delta.enableInCommitTimestamps" not in cfg
    assert "delta.inCommitTimestampEnablementVersion" not in cfg


def test_restore_to_timestamp(spark, tmp_path):
    import datetime as dt
    import time

    from dask_deltalake_spark.delta.maintenance import restore

    path = str(tmp_path / "t")
    to_delta(spark.range(0, 10), path)
    # give v0 and v1 distinct mtimes
    log = os.path.join(path, "_delta_log")
    t0 = time.time() - 3600
    os.utime(os.path.join(log, f"{0:020d}.json"), (t0, t0))
    to_delta(spark.range(10, 30), path, mode="append")
    between = dt.datetime.fromtimestamp(
        t0 + 60, dt.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%S%z")
    res = restore(path, spark=spark, timestamp=between)
    assert res["version"] >= 2  # the restore commit
    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == 10
    with pytest.raises(ValueError, match="exactly one"):
        restore(path)
    with pytest.raises(ValueError, match="exactly one"):
        restore(path, version=0, timestamp=between)


def test_deep_clone_detects_cross_root_rel_collision(spark, tmp_path):
    """Two adds from DIFFERENT base roots flattening to the same
    relative path must refuse — the guard keys on the ASSIGNED rel
    (self-review r8: keying on the add's original path never fired,
    silently letting one copy clobber the other)."""
    import shutil as _sh

    from dask_deltalake_spark.delta.clone import shallow_clone
    from dask_deltalake_spark.delta.protocol import (
        AddAction,
        DeltaProtocolError,
    )
    from dask_deltalake_spark.delta.writer import write_commit
    from dask_deltalake_spark.delta.protocol import now_ms

    a = str(tmp_path / "a")
    c = str(tmp_path / "c")
    to_delta(spark.range(0, 10).coalesce(1), a)
    shallow_clone(a, c)
    src_snap = DeltaLog(a).snapshot()
    (fn,) = [x.path for x in src_snap.add_actions]
    # give the clone a LOCAL file with the same relative name the
    # source add flattens to
    _sh.copyfile(os.path.join(a, fn), os.path.join(c, fn))
    st = os.stat(os.path.join(c, fn))
    write_commit(
        c,
        1,
        [
            {
                "commitInfo": {
                    "timestamp": now_ms(),
                    "operation": "WRITE",
                    "operationParameters": {},
                    "engineInfo": "test",
                }
            },
            AddAction(
                path=fn,
                size=int(st.st_size),
                partition_values={},
                modification_time=int(st.st_mtime * 1000),
                data_change=True,
            ).to_json(),
        ],
    )
    _SNAPSHOT_CACHE.clear()
    with pytest.raises(DeltaProtocolError, match="collision"):
        deep_clone(c, str(tmp_path / "d"), spark=spark)
