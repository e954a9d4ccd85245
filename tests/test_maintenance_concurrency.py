"""OPTIMIZE-vs-append concurrency (the streaming-sink + background-
compaction steady state) and VACUUM LITE (log-derived candidates, no
directory walk)."""

from __future__ import annotations

import json
import os

import pytest

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.maintenance import optimize, vacuum
from dask_deltalake_spark.delta.protocol import (
    AddAction,
    ConcurrentCommitError,
    RemoveAction,
    now_ms,
)
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS k", "id * 2 AS v")


def _competitor_append_action(table_path):
    """Hard-link a live file under a new name: a minimal real
    concurrent blind append."""
    snap = DeltaLog(table_path).snapshot()
    src_rel = next(iter(snap.files))
    dst_rel = "part-competitor.snappy.parquet"
    os.link(
        os.path.join(table_path, src_rel),
        os.path.join(table_path, dst_rel),
    )
    a = snap.files[src_rel]
    return AddAction(
        path=dst_rel,
        size=a.size,
        partition_values={},
        modification_time=now_ms(),
        data_change=True,
        stats=a.stats,
    )


def _race_once(monkeypatch, make_competitor_actions):
    import dask_deltalake_spark.delta.writer as W
    import dask_deltalake_spark.delta.maintenance as M

    real = W.write_commit
    state = {"raced": False}

    def racy(table_path, version, actions):
        if not state["raced"]:
            state["raced"] = True
            real(table_path, version, make_competitor_actions())
        return real(table_path, version, actions)

    monkeypatch.setattr(W, "write_commit", racy)
    monkeypatch.setattr(M, "write_commit", racy)
    return state


def test_optimize_retries_past_concurrent_append(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 20).repartition(4), path)
    n_before = read_delta(path, spark=spark).count()

    def competitor():
        return [
            {"commitInfo": {"timestamp": 1, "operation": "WRITE"}},
            _competitor_append_action(path).to_json(),
        ]

    state = _race_once(monkeypatch, competitor)
    res = optimize(path, spark=spark)
    assert state["raced"]
    assert res["version"] == 2  # competitor won v1, compaction at v2
    snap = DeltaLog(path).snapshot()
    assert "part-competitor.snappy.parquet" in snap.files  # append survived
    comp_rows = json.loads(
        snap.files["part-competitor.snappy.parquet"].stats
    )["numRecords"]
    df = read_delta(path, spark=spark)
    # compaction kept every pre-existing row AND the winner's rows
    assert comp_rows > 0
    assert df.count() == n_before + comp_rows


def test_optimize_aborts_when_compacted_file_removed(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 20).repartition(4), path)
    doomed = next(iter(DeltaLog(path).snapshot().files))

    def competitor():
        return [
            {"commitInfo": {"timestamp": 1, "operation": "DELETE"}},
            RemoveAction(
                path=doomed, deletion_timestamp=now_ms(), data_change=True
            ).to_json(),
        ]

    _race_once(monkeypatch, competitor)
    with pytest.raises(ConcurrentCommitError, match="compacting"):
        optimize(path, spark=spark)


def test_vacuum_lite_uses_log_not_listing(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10).coalesce(1), path)
    to_delta(_df(spark, 10, 20).coalesce(1), path, mode="overwrite")
    # an ORPHAN (crashed-writer debris): never logged
    orphan = os.path.join(path, "orphan-debris.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    # backdate past the cutoff millisecond (mtime granularity)
    import time

    os.utime(orphan, (time.time() - 10, time.time() - 10))

    # retention 0 is a knife-edge at millisecond granularity: a
    # tombstone stamped in the same ms as the cutoff is (correctly)
    # retained, and the run flakes. Step past the boundary.
    time.sleep(0.005)

    lite = sorted(vacuum(path, retention_hours=0, dry_run=True, mode="lite"))
    full = sorted(vacuum(path, retention_hours=0, dry_run=True, mode="full"))
    snap = DeltaLog(path).snapshot()
    # lite = exactly the logged tombstones; full = tombstones + orphan
    assert lite == sorted(snap.tombstones)
    assert set(full) == set(lite) | {"orphan-debris.parquet"}

    vacuum(path, retention_hours=0, dry_run=False, mode="lite", spark=spark)
    for rel in lite:
        assert not os.path.exists(os.path.join(path, rel))
    assert os.path.exists(orphan)  # lite never lists, never touches it
    assert read_delta(path, spark=spark).count() == 10  # table intact
    # retention respected: fresh tombstones survive a default-retention lite
    to_delta(_df(spark, 0, 5).coalesce(1), path, mode="overwrite")
    assert vacuum(path, retention_hours=168, dry_run=True, mode="lite") == []


def test_set_table_properties_and_detail(spark, tmp_path):
    from dask_deltalake_spark.delta.maintenance import (
        set_table_properties,
        table_detail,
    )
    from dask_deltalake_spark.delta.protocol import DeltaProtocolError

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10).coalesce(1), path, name="facts",
             configuration={"team": "data"})
    v = set_table_properties(
        path, {"delta.logRetentionDuration": "interval 7 days",
               "owner": "pipeline"},
        unset=["team"],
    )
    assert v == 1
    d = table_detail(path)
    assert d["properties"]["owner"] == "pipeline"
    assert d["properties"]["delta.logRetentionDuration"] == "interval 7 days"
    assert "team" not in d["properties"]
    assert d["name"] == "facts" and d["numFiles"] == 1 and d["version"] == 1
    assert d["sizeInBytes"] > 0 and d["partitionColumns"] == []
    # data untouched by the metadata-only commit
    assert read_delta(path, spark=spark).count() == 10
    # feature-controlling properties are refused with a pointer
    with pytest.raises(DeltaProtocolError, match="dedicated"):
        set_table_properties(path, {"delta.enableRowTracking": "true"})


def _competitor_append_with_stats(spark, table_path, k_min, k_max):
    """A REAL appended file whose rows (and therefore stats) cover
    [k_min, k_max): written through a side table, hard-linked into the
    target, its genuine add action re-pathed — so predicate pruning
    classifies it during conflict checks AND the data matches."""
    side = table_path + f"__side{k_min}"
    to_delta(_df(spark, k_min, k_max).coalesce(1), side, mode="overwrite")
    side_snap = DeltaLog(side).snapshot()
    (src_rel,) = side_snap.files
    a = side_snap.files[src_rel]
    dst_rel = f"part-competitor-{k_min}.snappy.parquet"
    os.link(
        os.path.join(side, src_rel), os.path.join(table_path, dst_rel)
    )
    return AddAction(
        path=dst_rel,
        size=a.size,
        partition_values={},
        modification_time=now_ms(),
        data_change=True,
        stats=a.stats,
    )


def test_delete_retries_past_disjoint_append(spark, tmp_path, monkeypatch):
    """Streaming appends elsewhere + a DELETE on old rows both commit
    (delta-spark WriteSerializable): the delete's predicate provably
    cannot match the winner's added file (stats-pruned), so the loser
    retries."""
    from dask_deltalake_spark.delta.mutate import delete_where

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 20).repartition(2), path)

    def competitor():
        return [
            {"commitInfo": {"timestamp": 1, "operation": "WRITE"}},
            _competitor_append_with_stats(spark, path, 1000, 1100).to_json(),
        ]

    state = _race_once(monkeypatch, competitor)
    res = delete_where(path, [("k", "<", 5)], spark=spark)
    assert state["raced"]
    assert res["version"] == 2  # competitor v1, delete retried at v2
    snap = DeltaLog(path).snapshot()
    assert any("competitor" in p for p in snap.files)  # append survived
    df = read_delta(path, spark=spark)
    assert df.filter("k < 5").count() == 0  # delete applied
    assert df.filter("k >= 1000").count() == 100  # winner rows intact


def test_delete_aborts_on_append_into_predicate_range(
    spark, tmp_path, monkeypatch
):
    from dask_deltalake_spark.delta.mutate import delete_where

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 20).repartition(2), path)

    def competitor():
        return [
            {"commitInfo": {"timestamp": 1, "operation": "WRITE"}},
            _competitor_append_with_stats(spark, path, 0, 4).to_json(),  # overlaps
        ]

    _race_once(monkeypatch, competitor)
    with pytest.raises(ConcurrentCommitError, match="ConcurrentAppend"):
        delete_where(path, [("k", "<", 5)], spark=spark)


def test_delete_aborts_when_read_file_removed(spark, tmp_path, monkeypatch):
    from dask_deltalake_spark.delta.mutate import delete_where

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 20).repartition(2), path)
    doomed = next(iter(DeltaLog(path).snapshot().files))

    def competitor():
        return [
            {"commitInfo": {"timestamp": 1, "operation": "DELETE"}},
            RemoveAction(
                path=doomed, deletion_timestamp=now_ms(), data_change=True
            ).to_json(),
        ]

    _race_once(monkeypatch, competitor)
    with pytest.raises(ConcurrentCommitError, match="ConcurrentDeleteRead"):
        delete_where(path, [("k", ">=", 0)], spark=spark)


def test_mor_delete_retries_past_disjoint_append(spark, tmp_path, monkeypatch):
    from dask_deltalake_spark.delta.mutate import delete_where

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 20).repartition(2), path)

    def competitor():
        return [
            {"commitInfo": {"timestamp": 1, "operation": "WRITE"}},
            _competitor_append_with_stats(spark, path, 1000, 1100).to_json(),
        ]

    state = _race_once(monkeypatch, competitor)
    res = delete_where(
        path, [("k", "<", 5)], spark=spark, strategy="merge-on-read"
    )
    assert state["raced"]
    assert res["numDeletedRows"] == 5
    assert res["version"] == 2


def test_clustered_append_race_retries(spark, tmp_path, monkeypatch):
    """The retry path must accept every feature the initial gate
    accepted: a blind append to a CLUSTERED (v7 clustering +
    domainMetadata) table that loses the race retries instead of
    aborting with a spurious protocol error."""
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10).coalesce(1), path, cluster_by=["k"])

    def competitor():
        return [
            {"commitInfo": {"timestamp": 1, "operation": "TXN"}},
            {"txn": {"appId": "other", "version": 1}},
        ]

    state = _race_once(monkeypatch, competitor)
    to_delta(_df(spark, 10, 15).coalesce(1), path, mode="append")
    assert state["raced"]
    snap = DeltaLog(path).snapshot()
    assert snap.version == 2  # competitor v1, retried append v2
    assert read_delta(path, spark=spark).count() == 15
