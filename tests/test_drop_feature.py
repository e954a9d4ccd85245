"""DROP FEATURE / REORG PURGE lifecycle (delta/features.py).

Reference parity note: the reference (core.py:34-118) refuses
feature-protocol tables outright; these tests pin the beyond-reference
drop semantics against the Delta protocol spec's feature-removal
section (purge-before-drop, checkpoint protection, no-active-use
validators for writer features).
"""

import os

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.features import (
    CHECKPOINT_PROTECTION_KEY,
    drop_feature,
    reorg_purge,
)
from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
from dask_deltalake_spark.delta.mutate import delete_where
from dask_deltalake_spark.delta.protocol import DeltaProtocolError
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _dv_table(spark, path, n=200):
    df = spark.range(0, n).withColumn("val", F.col("id") * 10)
    to_delta(df.repartition(4), path)
    delete_where(
        path, [("id", "<", 50)], spark=spark, strategy="merge-on-read"
    )


def test_purge_rewrites_only_dv_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _dv_table(spark, path)
    snap = DeltaLog(path).snapshot()
    dv_paths = {a.path for a in snap.add_actions if a.deletion_vector}
    clean_paths = {a.path for a in snap.add_actions if not a.deletion_vector}
    assert dv_paths, "fixture must produce DVs"
    res = reorg_purge(path, spark=spark)
    assert res["numFilesRewritten"] == len(dv_paths)
    _SNAPSHOT_CACHE.clear()
    snap2 = DeltaLog(path).snapshot()
    # clean files survive untouched; no add carries a DV anymore
    assert clean_paths <= set(snap2.files)
    assert not any(a.deletion_vector for a in snap2.add_actions)
    got = read_delta(path, spark=spark)
    assert got.count() == 150
    assert got.agg(F.min("id")).first()[0] == 50


def test_purge_noop_without_dvs(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(spark.range(10), path)
    v = DeltaLog(path).latest_version()
    res = reorg_purge(path, spark=spark)
    assert res["numFilesRewritten"] == 0
    assert DeltaLog(path).latest_version() == v  # no commit written


def test_drop_dv_purges_demotes_and_protects(spark, tmp_path):
    path = str(tmp_path / "t")
    _dv_table(spark, path)
    v = drop_feature(path, "deletionVectors", spark=spark)
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    proto = snap.protocol
    assert proto.min_reader_version == 1
    assert "deletionVectors" not in (proto.writer_features or [])
    assert proto.reader_features is None
    assert "checkpointProtection" in proto.writer_features
    assert snap.metadata.configuration[CHECKPOINT_PROTECTION_KEY] == str(v)
    assert os.path.exists(
        os.path.join(path, "_delta_log", f"{v:020d}.checkpoint.parquet")
    )
    assert read_delta(path, spark=spark).count() == 150
    # appends keep working against the demoted protocol
    to_delta(spark.range(1000, 1010).withColumn("val", F.lit(0).cast("long")), path,
             mode="append")
    assert read_delta(path, spark=spark).count() == 160


def test_drop_dv_refuses_without_purge(spark, tmp_path):
    path = str(tmp_path / "t")
    _dv_table(spark, path)
    with pytest.raises(DeltaProtocolError, match="reorg_purge"):
        drop_feature(path, "deletionVectors", spark=spark, purge=False)


def test_drop_dv_on_column_mapped_table_keeps_reader_v3(spark, tmp_path):
    from dask_deltalake_spark.delta.column_mapping import (
        upgrade_to_column_mapping,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 100).withColumn("val", F.col("id") * 2)
    to_delta(df.repartition(2), path)
    upgrade_to_column_mapping(path)
    delete_where(
        path, [("id", "<", 20)], spark=spark, strategy="merge-on-read"
    )
    drop_feature(path, "deletionVectors", spark=spark)
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    assert snap.protocol.min_reader_version == 3
    assert snap.protocol.reader_features == ["columnMapping"]
    assert read_delta(path, spark=spark).count() == 80


def test_drop_writer_feature_requires_no_active_use(spark, tmp_path):
    from dask_deltalake_spark.delta.constraints import (
        add_constraint,
        drop_constraint,
    )

    path = str(tmp_path / "t")
    to_delta(spark.range(10).withColumn("k", F.col("id")), path)
    add_constraint(path, "pos", "k >= 0", spark=spark)
    with pytest.raises(DeltaProtocolError, match="still declares"):
        drop_feature(path, "checkConstraints", spark=spark)
    drop_constraint(path, "pos", spark=spark)
    drop_feature(path, "checkConstraints", spark=spark)
    _SNAPSHOT_CACHE.clear()
    proto = DeltaLog(path).snapshot().protocol
    assert "checkConstraints" not in (proto.writer_features or [])


def test_drop_refusals(spark, tmp_path):
    path = str(tmp_path / "t")
    _dv_table(spark, path)
    # not carried at all
    with pytest.raises(DeltaProtocolError, match="does not carry"):
        drop_feature(path, "v2Checkpoint", spark=spark)
    drop_feature(path, "deletionVectors", spark=spark)
    # the protection marker itself is permanent
    with pytest.raises(DeltaProtocolError, match="cannot be removed"):
        drop_feature(path, "checkpointProtection", spark=spark)


def test_cleanup_after_drop_keeps_replayability(spark, tmp_path):
    """checkpointProtection's actual obligation: metadata cleanup on a
    post-drop table must leave every remaining version replayable from
    a checkpoint-anchored boundary — post-drop readers never decode a
    DV action."""
    from dask_deltalake_spark.delta.maintenance import cleanup_metadata

    path = str(tmp_path / "t")
    _dv_table(spark, path)
    drop_feature(path, "deletionVectors", spark=spark)
    for i in range(2):
        to_delta(
            spark.range(1000 + i, 1001 + i).withColumn("val", F.lit(0).cast("long")),
            path,
            mode="append",
        )
    log_dir = os.path.join(path, "_delta_log")
    for f in os.listdir(log_dir):
        if f.endswith(".json"):
            os.utime(os.path.join(log_dir, f), (1_000_000, 1_000_000))
    cleanup_metadata(path)
    _SNAPSHOT_CACHE.clear()
    got = read_delta(path, spark=spark)
    assert got.count() == 152
    assert not any(
        a.deletion_vector for a in DeltaLog(path).snapshot().add_actions
    )


def test_drop_refuses_unknown_writer_feature(spark, tmp_path):
    """drop_feature rewrites the protocol, so a table carrying an
    UNRELATED writer feature this engine does not support must refuse
    the drop like every sibling mutation (self-review r8)."""
    from dask_deltalake_spark.delta.protocol import Protocol
    from dask_deltalake_spark.delta.writer import write_commit

    path = str(tmp_path / "t")
    to_delta(spark.range(0, 10).coalesce(1), path)
    write_commit(
        path,
        1,
        [
            {"commitInfo": {"timestamp": 0, "operation": "UPGRADE"}},
            Protocol(
                min_writer_version=7,
                writer_features=["checkConstraints", "someFutureFeature"],
            ).to_json(),
        ],
    )
    _SNAPSHOT_CACHE.clear()
    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        drop_feature(path, "checkConstraints")
