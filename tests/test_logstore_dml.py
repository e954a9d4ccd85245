"""Object-store DML / OPTIMIZE / DV purge through the LogStore seam
(VERDICT r6 "What's missing #1").

The ``mocknl:`` scheme registered here models a REAL object store more
faithfully than ``mock:``: seam (metadata) I/O works — backed by local
disk for the test — but ``local_path()`` returns None, so every rewrite
path that used to shortcut through Python-worker local file I/O must
take the JVM-native staging + seam-rename route instead (the same split
``to_delta(engine="native")`` already uses). ``spark_path()`` supplies
the JVM's view of the data files (the s3a:// analog of an s3:// log
path).

Covered end-to-end on a table whose store has NO local mapping:
write → read → delete_where (copy-on-write) → delete_where
(merge-on-read: DV bin written through the seam) → optimize (compaction
doubles as DV purge) → vacuum of the tombstoned files.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.maintenance import optimize, vacuum
from dask_deltalake_spark.delta.mutate import delete_where
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta

# the mocknl: NoLocalPrefixStore (delta/logstore.py) is registered by
# default: seam ops land on local disk, local_path is None, spark_path
# supplies the JVM's view — the permanent object-store test double


@pytest.fixture()
def nl_table(tmp_path):
    return f"mocknl:{tmp_path}/tbl"


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("p"),
        (F.col("id") * 10).alias("v"),
    )


def test_no_local_path_write_read_roundtrip(spark, nl_table, tmp_path):
    to_delta(_df(spark, 0, 100), nl_table, partition_by=["p"])
    got = read_delta(nl_table, spark=spark)
    assert got.count() == 100
    # the data files really live under the mapped root, written by the
    # JVM through spark_path, never through a local_path shortcut
    assert os.path.isdir(f"{tmp_path}/tbl/_delta_log")


def test_no_local_path_cow_delete(spark, nl_table):
    to_delta(_df(spark, 0, 100), nl_table, partition_by=["p"])
    res = delete_where(nl_table, [("k", "<", 10)], spark=spark)
    assert res["numFilesRewritten"] >= 1
    got = read_delta(nl_table, spark=spark)
    assert got.count() == 90
    assert got.agg(F.min("k")).collect()[0][0] == 10


def test_no_local_path_mor_delete_optimize_purge_vacuum(
    spark, nl_table, tmp_path
):
    to_delta(_df(spark, 0, 100), nl_table)
    # merge-on-read: the deletion-vector .bin goes through the seam
    res = delete_where(
        nl_table, [("k", ">=", 90)], strategy="merge-on-read", spark=spark
    )
    assert res["numFilesWithNewVectors"] >= 1
    bins = [
        f
        for f in os.listdir(f"{tmp_path}/tbl")
        if f.startswith("deletion_vector_")
    ]
    assert bins, "DV bin must exist under the mapped root"
    assert read_delta(nl_table, spark=spark).count() == 90

    # OPTIMIZE = compaction + DV purge, via JVM staging + seam rename
    out = optimize(nl_table, spark=spark)
    assert out["numFilesRemoved"] >= 1
    snap_rows = read_delta(nl_table, spark=spark)
    assert snap_rows.count() == 90
    assert (
        snap_rows.agg(F.sum("v")).collect()[0][0]
        == sum(i * 10 for i in range(90))
    )

    # vacuum deletes the tombstoned originals + the purged DV bin
    # through the seam
    removed = vacuum(nl_table, retention_hours=0, dry_run=False, spark=spark)
    assert removed is None
    assert vacuum(nl_table, retention_hours=0, dry_run=True) == []
    assert not [
        f
        for f in os.listdir(f"{tmp_path}/tbl")
        if f.startswith("deletion_vector_")
    ], "purged DV bin should be vacuumed"


def test_no_local_path_mor_update(spark, nl_table):
    from dask_deltalake_spark.delta.mutate import update_where

    to_delta(_df(spark, 0, 50), nl_table)
    update_where(
        nl_table,
        [("k", "<", 5)],
        {"v": F.lit(-1)},
        strategy="merge-on-read",
        spark=spark,
    )
    got = read_delta(nl_table, spark=spark)
    assert got.filter(F.col("v") == -1).count() == 5
    assert got.count() == 50
