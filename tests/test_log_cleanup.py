"""Log retention cleanup (maintenance.cleanup_metadata): expired
commits below a checkpoint-anchored boundary are deleted, every
remaining version stays replayable, and time travel below the
boundary raises a clear error."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.maintenance import (
    cleanup_metadata,
    create_checkpoint,
)
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _age_log(path, versions, age_s=100 * 24 * 3600):
    """Backdate the given commits' mtimes far past any retention."""
    import time

    old = time.time() - age_s
    for v in versions:
        p = os.path.join(path, "_delta_log", f"{v:020d}.json")
        os.utime(p, (old, old))


def test_cleanup_prefix_below_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(6):  # v0..v5
        to_delta(
            _df(spark, i * 5, i * 5 + 5).coalesce(1),
            path,
            mode="append" if i else "error",
        )
    create_checkpoint(path, version=3)
    # nothing expired yet -> nothing deleted
    assert cleanup_metadata(path) == []
    _age_log(path, [0, 1, 2])
    doomed = cleanup_metadata(path, dry_run=True)
    # commits AND their .crc version-checksum sidecars expire together
    assert doomed == sorted(
        f"{v:020d}.{ext}" for v in (0, 1, 2) for ext in ("crc", "json")
    )
    cleanup_metadata(path)
    assert DeltaLog(path).versions() == [3, 4, 5]
    # everything remaining replays (v3 anchors at its checkpoint)
    assert read_delta(path, version=3, spark=spark).count() == 20
    assert read_delta(path, spark=spark).count() == 30
    with pytest.raises(ValueError, match="log retention"):
        read_delta(path, version=1, spark=spark)


def test_cleanup_requires_fully_expired_prefix(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(5):
        to_delta(
            _df(spark, i, i + 1).coalesce(1),
            path,
            mode="append" if i else "error",
        )
    create_checkpoint(path, version=3)
    _age_log(path, [0, 2])  # v1 is NOT expired -> boundary stays 0
    assert cleanup_metadata(path) == []
    assert DeltaLog(path).versions() == [0, 1, 2, 3, 4]


def test_cleanup_without_checkpoint_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3), path)
    _age_log(path, [0])
    assert cleanup_metadata(path) == []
    assert read_delta(path, spark=spark).count() == 3


def test_cleanup_honors_configured_retention(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(
        _df(spark, 0, 3).coalesce(1),
        path,
        configuration={"delta.logRetentionDuration": "interval 1 hours"},
    )
    to_delta(_df(spark, 3, 6).coalesce(1), path, mode="append")
    create_checkpoint(path, version=1)
    _age_log(path, [0], age_s=2 * 3600)  # 2h old > 1h retention
    assert cleanup_metadata(path, dry_run=True) == [
        "0" * 19 + "0.crc",
        "0" * 19 + "0.json",
    ]


def test_multipart_checkpoint_roundtrip(spark, tmp_path, monkeypatch):
    """Above the part threshold the checkpoint splits into the spec's
    %020d.checkpoint.%010d.%010d.parquet parts and replays
    identically (checkpoint_versions + _load_checkpoint read both
    shapes)."""
    import glob

    import dask_deltalake_spark.delta.maintenance as M

    monkeypatch.setattr(M, "_CHECKPOINT_PART_ROWS", 4)
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 20).repartition(8), path)  # 8 adds + meta rows
    create_checkpoint(path)
    parts = glob.glob(os.path.join(path, "_delta_log", "*.checkpoint.*.parquet"))
    assert len(parts) >= 2  # genuinely multi-part
    import json as _json

    last = _json.load(open(os.path.join(path, "_delta_log", "_last_checkpoint")))
    assert last["parts"] == len(parts)
    # checkpoint-started replay: delete nothing, just force cp usage
    to_delta(_df(spark, 20, 25).coalesce(1), path, mode="append")
    snap = DeltaLog(path).snapshot()
    assert len(snap.files) == 9
    assert read_delta(path, spark=spark).count() == 25
    # a later multi-part checkpoint anchors cleanup of the v0 prefix
    # (the v0 multi-part checkpoint files go with it)
    create_checkpoint(path)  # at v1
    _age_log(path, [0])
    doomed = cleanup_metadata(path)
    assert f"{0:020d}.json" in doomed
    assert sum(".checkpoint." in f for f in doomed) == len(parts)
    assert read_delta(path, spark=spark).count() == 25


def test_vacuum_protocol_gate(spark, tmp_path):
    """vacuumProtocolCheck semantics: vacuum validates the protocol
    before deleting anything — a table requiring a feature vacuum
    doesn't understand is refused, never silently pruned."""
    import json as _json

    from dask_deltalake_spark.delta.maintenance import vacuum
    from dask_deltalake_spark.delta.protocol import (
        DeltaProtocolError,
        Protocol,
    )
    from dask_deltalake_spark.delta.writer import write_commit

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3).coalesce(1), path)
    # vacuum on a table declaring vacuumProtocolCheck itself: fine
    write_commit(
        path,
        1,
        [
            {"commitInfo": {"timestamp": 0, "operation": "UPGRADE"}},
            Protocol(
                min_writer_version=7,
                writer_features=["appendOnly", "invariants",
                                 "vacuumProtocolCheck"],
            ).to_json(),
        ],
    )
    assert vacuum(path, retention_hours=0, dry_run=True) == []
    # ...but an UNKNOWN feature refuses the vacuum outright
    write_commit(
        path,
        2,
        [
            {"commitInfo": {"timestamp": 0, "operation": "UPGRADE"}},
            Protocol(
                min_writer_version=7,
                writer_features=["someFutureFeature"],
            ).to_json(),
        ],
    )
    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        vacuum(path, retention_hours=0, dry_run=True)


def test_snapshot_raises_on_missing_commit_above_checkpoint(spark, tmp_path):
    """A gap ABOVE the replay start is corruption (legit cleanup only
    deletes what a checkpoint/compaction covers) — silently skipping
    it would serve data-loss state as a valid snapshot (r7 ADVICE)."""
    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 2).coalesce(1), path)
    for lo in range(2, 12, 2):
        to_delta(_df(spark, lo, lo + 2).coalesce(1), path, mode="append")
    create_checkpoint(path, version=3)
    os.remove(os.path.join(path, "_delta_log", f"{4:020d}.json"))
    _SNAPSHOT_CACHE.clear()
    with pytest.raises(ValueError, match="Missing commit 4"):
        DeltaLog(path).snapshot()
    with pytest.raises(ValueError, match="Missing commit 4"):
        DeltaLog(path).snapshot(version=5)
    # replay at or below the checkpoint still works
    assert DeltaLog(path).snapshot(version=3).version == 3
