"""replace_where (partition-region overwrite) and txn idempotent
writes (SetTransaction): region exactness, row validation, skip/no-op
semantics, atomicity with the data commit, checkpoint survival."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.maintenance import create_checkpoint
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


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
