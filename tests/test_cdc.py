"""File-level CDC reads (delta/cdc.py): insert/delete change sets per
commit, exclusive starting_version resume semantics, dataChange=false
invisibility."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.cdc import read_delta_changes
from dask_deltalake_spark.delta.maintenance import optimize
from dask_deltalake_spark.delta.mutate import delete_where
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 10)
    )


def test_appends_surface_as_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path)          # v0
    to_delta(_df(spark, 100, 130), path, mode="append")  # v1
    ch = read_delta_changes(path, starting_version=0, spark=spark)
    rows = ch.groupBy("_change_type", "_commit_version").count().collect()
    assert {(r["_change_type"], r["_commit_version"], r["count"]) for r in rows} == {
        ("insert", 1, 30)
    }
    # from table start (-1): v0's initial snapshot is an insert set too
    all_ch = read_delta_changes(path, starting_version=-1, spark=spark)
    n = {
        (r["_change_type"], r["_commit_version"]): r["count"]
        for r in all_ch.groupBy("_change_type", "_commit_version").count().collect()
    }
    assert n == {("insert", 0): 100, ("insert", 1): 30}


def test_partition_delete_surfaces_as_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 100), path, partition_by=["part"])  # v0
    delete_where(path, [("part", "==", 1)], spark=spark)       # v1
    ch = read_delta_changes(path, starting_version=0, spark=spark)
    assert ch.filter("_change_type = 'delete'").count() == 50
    assert ch.filter("_change_type = 'insert'").count() == 0
    # deleted rows carry their data (consumers need the old image)
    assert (
        ch.filter("_change_type = 'delete'").agg(F.min("part")).first()[0] == 1
    )


def test_optimize_is_invisible(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 50).repartition(4), path)  # v0, several files
    optimize(path, spark=spark)                        # v1, dataChange=false
    ch = read_delta_changes(path, starting_version=0, spark=spark)
    assert ch.count() == 0
    # schema is still the full change schema on the empty frame
    assert ch.columns[-2:] == ["_change_type", "_commit_version"]


def test_bad_ending_version_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    with pytest.raises(ValueError, match="beyond latest"):
        read_delta_changes(path, starting_version=0, ending_version=5, spark=spark)
