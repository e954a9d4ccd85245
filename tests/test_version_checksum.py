"""Version checksums (delta-spark .crc sidecars, writer.py
_maybe_write_version_checksum + maintenance.validate_version_checksum):
written best-effort after every commit path, validated against replay,
tamper-detected, and cleaned with their commits."""

from __future__ import annotations

import json
import os

import pytest

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.maintenance import (
    optimize,
    validate_version_checksum,
)
from dask_deltalake_spark.delta.mutate import delete_where
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS k", "id * 2 AS v")


def test_checksum_written_and_validates_across_paths(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10).repartition(2), path)        # v0 write
    to_delta(_df(spark, 10, 15).coalesce(1), path, mode="append")  # v1
    delete_where(path, [("k", "<", 3)], spark=spark)        # v2 DML
    optimize(path, spark=spark)                             # v3 compaction
    log_dir = os.path.join(path, "_delta_log")
    for v in range(4):
        assert os.path.exists(os.path.join(log_dir, f"{v:020d}.crc")), v
        res = validate_version_checksum(path, version=v)
        assert res["valid"], res
    # latest by default
    assert validate_version_checksum(path)["version"] == 3


def test_checksum_detects_tampering(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10).coalesce(1), path)
    crc = os.path.join(path, "_delta_log", f"{0:020d}.crc")
    rec = json.loads(open(crc).read())
    rec["numFiles"] = 99
    open(crc, "w").write(json.dumps(rec))
    res = validate_version_checksum(path)
    assert not res["valid"]
    assert "numFiles" in res["mismatches"]


def test_missing_checksum_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 4).coalesce(1), path)
    os.remove(os.path.join(path, "_delta_log", f"{0:020d}.crc"))
    with pytest.raises(FileNotFoundError, match="checksum"):
        validate_version_checksum(path)


def test_cleanup_removes_expired_checksums(spark, tmp_path):
    import time

    from dask_deltalake_spark.delta.maintenance import (
        cleanup_metadata,
        create_checkpoint,
        set_table_properties,
    )

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 4).coalesce(1), path)
    to_delta(_df(spark, 4, 6).coalesce(1), path, mode="append")
    create_checkpoint(path)
    set_table_properties(
        path, {"delta.logRetentionDuration": "interval 1 minute"}
    )
    log_dir = os.path.join(path, "_delta_log")
    old = time.time() - 3600
    for f in os.listdir(log_dir):
        if f.endswith(".json"):
            os.utime(os.path.join(log_dir, f), (old, old))
    doomed = cleanup_metadata(path)
    assert f"{0:020d}.crc" in doomed
    assert not os.path.exists(os.path.join(log_dir, f"{0:020d}.crc"))


def test_checksum_all_files_identity(spark, tmp_path):
    """allFiles (delta-spark parity, r14): small snapshots (<=50
    files) ride the full add list in the .crc, upgrading the check
    from counts to exact file-set identity — an equal-size file swap
    is invisible to tableSizeBytes/numFiles but caught here. Foreign
    stats/tags spellings stay out of the identity (path, size, dv id,
    partitionValues only)."""
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10).repartition(2), path)
    log_dir = os.path.join(path, "_delta_log")
    crc_path = os.path.join(log_dir, f"{0:020d}.crc")
    rec = json.loads(open(crc_path).read())
    assert isinstance(rec.get("allFiles"), list) and len(
        rec["allFiles"]
    ) == 2
    assert validate_version_checksum(path)["valid"]

    # equal-size swap: counts and byte totals unchanged, identity not
    swapped = dict(rec)
    swapped["allFiles"] = [dict(f) for f in rec["allFiles"]]
    swapped["allFiles"][0]["path"] = "part-swapped.snappy.parquet"
    with open(crc_path, "w") as fh:
        fh.write(json.dumps(swapped))
    res = validate_version_checksum(path)
    assert not res["valid"] and "allFiles" in res["mismatches"]
    assert res["mismatches"]["allFiles"]["recorded_only"] == [
        "part-swapped.snappy.parquet"
    ]

    # a foreign checksum WITHOUT allFiles still validates on the
    # count/size/protocol/metadata surface
    nofiles = {k: v for k, v in rec.items() if k != "allFiles"}
    with open(crc_path, "w") as fh:
        fh.write(json.dumps(nofiles))
    assert validate_version_checksum(path)["valid"]
