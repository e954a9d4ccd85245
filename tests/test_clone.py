"""Shallow clone (delta/clone.py): zero-copy metadata fork, absolute
add paths, independent evolution, localization through COW/OPTIMIZE,
and vacuum isolation (a clone's vacuum must never touch the source)."""

from __future__ import annotations

import glob
import os
import time

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.clone import shallow_clone
from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.maintenance import optimize, vacuum
from dask_deltalake_spark.delta.mutate import delete_where, update_where
from dask_deltalake_spark.delta.protocol import DeltaProtocolError
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("g")
    )


def _data_files(path):
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if "_delta_log" not in f
    ]


def test_clone_is_zero_copy_and_reads_identically(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    to_delta(_df(spark, 0, 20).repartition(3), src)
    shallow_clone(src, tgt)
    assert _data_files(tgt) == []  # ZERO data files copied
    assert sorted(r["k"] for r in read_delta(tgt, spark=spark).collect()) == list(
        range(20)
    )
    # fresh table identity, same schema/protocol
    s_src, s_tgt = DeltaLog(src).snapshot(), DeltaLog(tgt).snapshot()
    assert s_src.metadata.id != s_tgt.metadata.id
    assert s_src.metadata.schema_string == s_tgt.metadata.schema_string
    with pytest.raises(ValueError, match="already exists"):
        shallow_clone(src, tgt)


def test_clone_at_version_and_partitioned_source(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    to_delta(_df(spark, 0, 12), src, partition_by=["g"])
    to_delta(_df(spark, 12, 24), src, mode="append")
    shallow_clone(src, tgt, version=0)  # clone + time travel
    df = read_delta(tgt, spark=spark)
    assert df.count() == 12
    # hive partition column resolves through the SOURCE root
    assert (
        df.filter(F.col("g") == 1).count()
        == sum(1 for k in range(12) if k % 3 == 1)
    )
    # pruning on the partition column still works on the clone
    assert (
        read_delta(tgt, filter=[("g", "==", 0)], spark=spark).count()
        == sum(1 for k in range(12) if k % 3 == 0)
    )


def test_clone_evolves_independently(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    to_delta(_df(spark, 0, 10).coalesce(1), src)
    shallow_clone(src, tgt)
    to_delta(_df(spark, 10, 15).coalesce(1), tgt, mode="append")
    assert read_delta(tgt, spark=spark).count() == 15
    assert read_delta(src, spark=spark).count() == 10  # source untouched
    # COW delete on the clone rewrites touched rows LOCALLY
    delete_where(tgt, [("k", "<", 3)], spark=spark)
    assert read_delta(tgt, spark=spark).count() == 12
    assert read_delta(src, spark=spark).count() == 10
    assert len(_data_files(tgt)) > 0  # rewrite materialized locally
    # UPDATE through the mixed-root scan
    update_where(tgt, [("k", "==", 14)], {"g": F.lit(9)}, spark=spark)
    assert (
        read_delta(tgt, spark=spark).filter(F.col("g") == 9).count() == 1
    )


def test_optimize_localizes_clone_and_vacuum_is_isolated(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    to_delta(_df(spark, 0, 10).repartition(2), src)
    n_src_files = len(_data_files(src))
    shallow_clone(src, tgt)
    optimize(tgt, spark=spark)
    snap = DeltaLog(tgt).snapshot()
    assert all(not a.path.startswith("/") for a in snap.add_actions)
    # clone's vacuum removes NOTHING from the source (tombstones point
    # at absolute source files, which vacuum never walks)
    time.sleep(0.02)
    vacuum(tgt, retention_hours=0, dry_run=False, spark=spark)
    assert len(_data_files(src)) == n_src_files
    assert read_delta(src, spark=spark).count() == 10
    assert read_delta(tgt, spark=spark).count() == 10


def test_clone_refuses_dv_source(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    to_delta(_df(spark, 0, 10).coalesce(1), src)
    delete_where(src, [("k", "==", 1)], spark=spark, strategy="merge-on-read")
    with pytest.raises(DeltaProtocolError, match="deletion vectors"):
        shallow_clone(src, tgt)
