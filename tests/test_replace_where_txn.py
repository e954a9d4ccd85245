"""replace_where (partition-region overwrite) and txn idempotent
writes (SetTransaction): region exactness, row validation, skip/no-op
semantics, atomicity with the data commit, checkpoint survival."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.maintenance import create_checkpoint
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _pdf(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 3 AS BIGINT) AS p", "id * 2 AS v"
    )


def _df(spark, lo, hi, g=None):
    d = spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("g")
    )
    return d.withColumn("g", F.lit(g).cast("int")) if g is not None else d


def test_replace_where_replaces_only_the_region(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 12), path, partition_by=["g"])
    to_delta(
        _df(spark, 100, 102, g=1),
        path,
        mode="overwrite",
        replace_where=[("g", "==", 1)],
    )
    df = read_delta(path, spark=spark)
    # g==1 region fully replaced (4 old rows -> 2 new); others intact
    assert df.filter(F.col("g") == 1).count() == 2
    assert sorted(
        r["k"] for r in df.filter(F.col("g") == 1).collect()
    ) == [100, 101]
    assert df.filter(F.col("g") == 0).count() == 4
    assert df.filter(F.col("g") == 2).count() == 4
    # time travel still sees the old region
    assert (
        read_delta(path, version=0, spark=spark)
        .filter(F.col("g") == 1)
        .count()
        == 4
    )


def test_replace_where_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 12), path, partition_by=["g"])
    v_before = DeltaLog(path).snapshot().version
    with pytest.raises(ValueError, match="OUTSIDE the replaced region"):
        to_delta(
            _df(spark, 100, 104),  # g spans 0..2, region is g==1
            path,
            mode="overwrite",
            replace_where=[("g", "==", 1)],
        )
    assert DeltaLog(path).snapshot().version == v_before  # atomic reject
    with pytest.raises(ValueError, match="not partition columns"):
        to_delta(
            _df(spark, 100, 101, g=1),
            path,
            mode="overwrite",
            replace_where=[("k", "<", 5)],
        )
    with pytest.raises(ValueError, match="requires mode='overwrite'"):
        to_delta(
            _df(spark, 100, 101, g=1),
            path,
            mode="append",
            replace_where=[("g", "==", 1)],
        )


def test_txn_idempotent_write(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3), path, txn_app_id="job", txn_version=0)
    to_delta(
        _df(spark, 3, 6), path, mode="append", txn_app_id="job", txn_version=1
    )
    # re-delivery of batch 1 is a detected NO-OP
    to_delta(
        _df(spark, 3, 6), path, mode="append", txn_app_id="job", txn_version=1
    )
    # ...and of anything at or below the high water mark
    to_delta(
        _df(spark, 0, 3), path, mode="append", txn_app_id="job", txn_version=0
    )
    df = read_delta(path, spark=spark)
    assert df.count() == 6
    snap = DeltaLog(path).snapshot()
    assert snap.version == 1  # no empty commits from the skips
    assert snap.transactions == {"job": 1}
    # a DIFFERENT app is independent
    to_delta(
        _df(spark, 6, 8), path, mode="append", txn_app_id="other", txn_version=0
    )
    assert read_delta(path, spark=spark).count() == 8
    assert DeltaLog(path).snapshot().transactions == {"job": 1, "other": 0}


def test_txn_survives_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3), path, txn_app_id="job", txn_version=7)
    create_checkpoint(path)
    to_delta(_df(spark, 3, 4), path, mode="append")
    assert DeltaLog(path).snapshot().transactions == {"job": 7}
    # skip still applies on a checkpoint-started replay
    to_delta(
        _df(spark, 90, 99), path, mode="append", txn_app_id="job", txn_version=7
    )
    assert read_delta(path, spark=spark).count() == 4


def test_txn_args_must_pair(spark, tmp_path):
    with pytest.raises(ValueError, match="together"):
        to_delta(_df(spark, 0, 1), str(tmp_path / "t"), txn_app_id="job")


def _competitor_add(table_path, src_rel, dst_dir, pval):
    """Hard-link an existing live file into a new hive dir and return
    its add action — a minimal real 'concurrent writer' commit."""
    import json as _json

    from dask_deltalake_spark.delta.protocol import AddAction, now_ms

    src = os.path.join(table_path, src_rel)
    os.makedirs(os.path.join(table_path, dst_dir), exist_ok=True)
    dst_rel = f"{dst_dir}/part-competitor.snappy.parquet"
    os.link(src, os.path.join(table_path, dst_rel))
    return AddAction(
        path=dst_rel,
        size=os.path.getsize(src),
        partition_values={"p": pval},
        modification_time=now_ms(),
        data_change=True,
        stats=_json.dumps({"numRecords": 1, "minValues": {},
                           "maxValues": {}, "nullCount": {}}),
    )


def _race_once(monkeypatch, competitor_actions):
    """Patch the commit choke point so the FIRST commit attempt loses
    the version race to ``competitor_actions``."""
    import dask_deltalake_spark.delta.writer as W

    real = W.write_commit
    state = {"raced": False}

    def racy(table_path, version, actions):
        if not state["raced"]:
            state["raced"] = True
            real(table_path, version, competitor_actions)
        return real(table_path, version, actions)

    monkeypatch.setattr(W, "write_commit", racy)
    return state


def test_replace_where_disjoint_region_race_retries(
    spark, tmp_path, monkeypatch
):
    """Two loaders re-materializing DISJOINT partition regions must
    BOTH commit (delta-spark WriteSerializable): the loser re-validates
    that the winners never touched its region and retries."""
    path = str(tmp_path / "t")
    to_delta(_pdf(spark, 0, 30), path, partition_by=["p"])
    snap = DeltaLog(path).snapshot()
    src_rel = next(iter(snap.files))
    add = _competitor_add(path, src_rel, "p=9", "9")
    competitor = [
        {"commitInfo": {"timestamp": 1, "operation": "WRITE"}},
        add.to_json(),
    ]
    state = _race_once(monkeypatch, competitor)

    new_region = (
        spark.range(100, 110)
        .selectExpr("id AS k", "CAST(1 AS BIGINT) AS p", "id * 2 AS v")
    )
    to_delta(new_region, path, mode="overwrite", replace_where=[("p", "==", 1)])
    assert state["raced"]
    snap2 = DeltaLog(path).snapshot()
    assert snap2.version == 2  # competitor at v1, our retry at v2
    df = read_delta(path, spark=spark)
    assert df.filter("p = 1").count() == 10  # region replaced
    assert df.filter("p = 9").count() > 0  # competitor's region intact
    assert df.filter("p = 0").count() == 10  # untouched region intact


def test_replace_where_same_region_race_aborts(spark, tmp_path, monkeypatch):
    """A winner that wrote INTO the replaced region is a true conflict
    (serial re-execution would delete its rows) and must abort."""
    from dask_deltalake_spark.delta.protocol import ConcurrentCommitError

    path = str(tmp_path / "t")
    to_delta(_pdf(spark, 0, 30), path, partition_by=["p"])
    snap = DeltaLog(path).snapshot()
    src_rel = next(iter(snap.files))
    add = _competitor_add(path, src_rel, "p=1", "1")  # INSIDE the region
    # competitor's file lands under the existing p=1 dir with a distinct name
    competitor = [
        {"commitInfo": {"timestamp": 1, "operation": "WRITE"}},
        add.to_json(),
    ]
    state = _race_once(monkeypatch, competitor)
    new_region = (
        spark.range(100, 110)
        .selectExpr("id AS k", "CAST(1 AS BIGINT) AS p", "id * 2 AS v")
    )
    with pytest.raises(ConcurrentCommitError, match="region"):
        to_delta(
            new_region, path, mode="overwrite",
            replace_where=[("p", "==", 1)],
        )
    assert state["raced"]
