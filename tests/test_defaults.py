"""Column DEFAULT values (delta/defaults.py + add_column default=):
write-time materialization, NULL for pre-existing rows, protocol
feature, interplay with explicit values."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.column_mapping import add_column
from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_write_time_default_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 3), path)
    add_column(path, "tier", "string", default="'std'", spark=spark)
    snap = DeltaLog(path).snapshot()
    assert snap.protocol.min_writer_version == 7
    assert "allowColumnDefaults" in snap.protocol.writer_features
    # a frame OMITTING the column gets the default materialized...
    to_delta(_df(spark, 3, 5), path, mode="append")
    rows = {r["k"]: r["tier"] for r in read_delta(path, spark=spark).collect()}
    # ...pre-existing rows keep reading NULL (write-time, not read-time)
    assert rows[0] is None and rows[1] is None
    assert rows[3] == "std" and rows[4] == "std"
    # an explicit value always wins over the default
    to_delta(
        _df(spark, 5, 6).withColumn("tier", F.lit("gold")),
        path,
        mode="append",
    )
    assert {
        r["tier"]
        for r in read_delta(path, spark=spark)
        .filter(F.col("k") == 5)
        .collect()
    } == {"gold"}


def test_default_expression_and_dml(spark, tmp_path):
    from dask_deltalake_spark.delta.mutate import update_where

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 2), path)
    add_column(path, "score", "bigint", default="10 * 5", spark=spark)
    to_delta(_df(spark, 2, 4), path, mode="append")
    df = read_delta(path, spark=spark)
    assert {r["score"] for r in df.filter(F.col("k") >= 2).collect()} == {50}
    # DML on a defaults table still works (rewrites existing rows)
    update_where(path, [("k", "==", 2)], {"score": F.lit(7)}, spark=spark)
    got = {
        r["k"]: r["score"] for r in read_delta(path, spark=spark).collect()
    }
    assert got[2] == 7 and got[3] == 50 and got[0] is None
