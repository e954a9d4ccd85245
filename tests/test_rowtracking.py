"""Row tracking (delta/rowtracking.py): retroactive enable, tracked
appends with same-commit high-water-mark advance, row-id
reconstruction on read, checkpoint survival, and the writer-feature
gate refusing rewrite paths that cannot preserve ids."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.maintenance import create_checkpoint, optimize
from dask_deltalake_spark.delta.mutate import delete_where
from dask_deltalake_spark.delta.protocol import DeltaProtocolError
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.rowtracking import (
    enable_row_tracking,
    row_id_high_water_mark,
    row_tracking_enabled,
)
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _ids(df):
    return sorted(r["_row_id"] for r in df.collect())


def test_enable_and_read_row_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10).repartition(3), path)
    v = enable_row_tracking(path)
    assert v == 1
    assert enable_row_tracking(path) == 1  # idempotent
    snap = DeltaLog(path).snapshot()
    assert row_tracking_enabled(snap.metadata)
    assert snap.protocol.min_writer_version == 7
    assert "rowTracking" in snap.protocol.writer_features
    assert "domainMetadata" in snap.protocol.writer_features
    assert row_id_high_water_mark(snap) == 9
    df = read_delta(path, spark=spark, with_row_ids=True)
    assert _ids(df) == list(range(10))  # dense, unique, 0-based
    assert {r["_row_commit_version"] for r in df.collect()} == {1}


def test_tracked_append_continues_past_hwm(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 6).repartition(2), path)
    enable_row_tracking(path)
    to_delta(_df(spark, 6, 10).repartition(2), path, mode="append")
    snap = DeltaLog(path).snapshot()
    assert row_id_high_water_mark(snap) == 9
    df = read_delta(path, spark=spark, with_row_ids=True)
    assert _ids(df) == list(range(10))
    # the appended rows carry the append's commit version
    vers = {
        r["_row_id"]: r["_row_commit_version"] for r in df.collect()
    }
    assert sorted(v for v in vers.values()) == [1] * 6 + [2] * 4
    # domainMetadata advanced in the SAME commit as the adds
    acts = DeltaLog(path).read_commit_actions(2)
    assert any("domainMetadata" in a for a in acts)
    assert any("add" in a for a in acts)


def test_create_with_row_tracking(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(
        _df(spark, 0, 5),
        path,
        configuration={"delta.enableRowTracking": "true"},
    )
    snap = DeltaLog(path).snapshot()
    assert snap.protocol.min_writer_version == 7
    assert row_id_high_water_mark(snap) == 4
    assert _ids(read_delta(path, spark=spark, with_row_ids=True)) == list(
        range(5)
    )


def test_row_ids_survive_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 5).repartition(2), path)
    enable_row_tracking(path)
    to_delta(_df(spark, 5, 8), path, mode="append")
    create_checkpoint(path)
    # force checkpoint-started replay: later commit + fresh log
    to_delta(_df(spark, 8, 9), path, mode="append")
    snap = DeltaLog(path).snapshot()
    assert row_id_high_water_mark(snap) == 8
    assert all(a.base_row_id is not None for a in snap.add_actions)
    assert _ids(read_delta(path, spark=spark, with_row_ids=True)) == list(
        range(9)
    )


def test_dml_rewrite_paths_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 6), path)
    enable_row_tracking(path)
    with pytest.raises(DeltaProtocolError, match="rowTracking|features"):
        delete_where(path, [("k", "<", 2)], spark=spark)


def test_optimize_materializes_row_ids(spark, tmp_path):
    from dask_deltalake_spark.delta.rowtracking import (
        materialized_column_names,
    )

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 6).repartition(3), path)
    enable_row_tracking(path)
    to_delta(_df(spark, 6, 9), path, mode="append")
    before = {
        r["_row_id"]: (r["k"], r["_row_commit_version"])
        for r in read_delta(path, spark=spark, with_row_ids=True).collect()
    }
    res = optimize(path, spark=spark)
    assert res["numFilesAdded"] == 1
    after = {
        r["_row_id"]: (r["k"], r["_row_commit_version"])
        for r in read_delta(path, spark=spark, with_row_ids=True).collect()
    }
    assert after == before  # ids AND commit versions survive compaction
    # the compacted parquet really carries the hidden columns...
    import pyarrow.parquet as pq

    snap = DeltaLog(path).snapshot()
    rid_col, rcv_col = materialized_column_names(snap.metadata)
    (only_file,) = snap.add_actions
    names = pq.read_schema(f"{path}/{only_file.path}").names
    assert rid_col in names and rcv_col in names
    # ...fresh base ids were still allocated past the old mark
    assert only_file.base_row_id == 9
    # ...and a PLAIN read never leaks them
    assert read_delta(path, spark=spark).columns == ["k", "v"]
    # appends after compaction keep extending the id space
    to_delta(_df(spark, 9, 11), path, mode="append")
    ids = _ids(read_delta(path, spark=spark, with_row_ids=True))
    assert len(ids) == 11 and len(set(ids)) == 11
    assert min(ids) == 0


def test_plain_read_unaffected_and_opt_in_required(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 4), path)
    with pytest.raises(DeltaProtocolError, match="without row tracking"):
        read_delta(path, spark=spark, with_row_ids=True)
    enable_row_tracking(path)
    df = read_delta(path, spark=spark)
    assert df.columns == ["k", "v"]  # no opt-in -> no extra columns
    proj = read_delta(path, spark=spark, with_row_ids=True, columns=["v"])
    assert proj.columns == ["v", "_row_id", "_row_commit_version"]


def test_restore_keeps_row_id_high_water_mark(spark, tmp_path):
    """RESTORE on a row-tracked table: re-added files keep their
    original baseRowIds and the high water mark stays MONOTONIC (never
    reverted), so post-restore appends can never reuse an id."""
    from dask_deltalake_spark.delta.maintenance import restore
    from dask_deltalake_spark.delta.rowtracking import (
        row_id_high_water_mark,
    )

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 4).coalesce(1), path)
    enable_row_tracking(path)  # v1: ids 0..3, hwm 3
    to_delta(_df(spark, 4, 7).coalesce(1), path, mode="append")  # hwm 6
    restore(path, version=1, spark=spark)
    snap = DeltaLog(path).snapshot()
    assert row_id_high_water_mark(snap) == 6  # NOT reverted
    assert _ids(read_delta(path, spark=spark, with_row_ids=True)) == [
        0, 1, 2, 3,
    ]
    to_delta(_df(spark, 7, 9).coalesce(1), path, mode="append")
    ids = _ids(read_delta(path, spark=spark, with_row_ids=True))
    assert ids == [0, 1, 2, 3, 7, 8]  # fresh range past the kept mark


def test_restore_after_optimize_keeps_base_row_ids(spark, tmp_path):
    """RESTORE that RE-ADDS files (the pre-OPTIMIZE ones) must carry
    their original baseRowId/defaultRowCommitVersion through — the spec
    requires every add on a tracked table to carry them, and a re-add
    without them corrupts the table for with_row_ids reads."""
    from dask_deltalake_spark.delta.maintenance import restore

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 6).repartition(2), path)
    enable_row_tracking(path)  # v1
    before = {
        r["_row_id"]: (r["k"], r["_row_commit_version"])
        for r in read_delta(path, spark=spark, with_row_ids=True).collect()
    }
    optimize(path, spark=spark)  # v2: rewrites every file
    restore(path, version=1, spark=spark)  # re-adds the v1 files
    snap = DeltaLog(path).snapshot()
    assert all(a.base_row_id is not None for a in snap.add_actions)
    assert all(
        a.default_row_commit_version is not None for a in snap.add_actions
    )
    after = {
        r["_row_id"]: (r["k"], r["_row_commit_version"])
        for r in read_delta(path, spark=spark, with_row_ids=True).collect()
    }
    assert after == before  # ids and commit versions fully restored
