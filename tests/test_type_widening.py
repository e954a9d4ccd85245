"""Type widening in schema_mode='merge' (writer.py:_WIDENING +
protocol typeWidening feature): narrower frames up-cast on write,
wider frames widen the table type in one commit when enabled, every
read path up-casts older narrow files."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _int_df(spark, lo, hi, t="int"):
    return spark.range(lo, hi).select(
        F.col("id").cast(t).alias("k"), (F.col("id") * 10).alias("v")
    )


def test_narrower_frame_upcast_on_write(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_int_df(spark, 0, 3, "bigint"), path)  # table: k bigint
    to_delta(
        _int_df(spark, 3, 6, "int"), path, mode="append", schema_mode="merge"
    )
    snap = DeltaLog(path).snapshot()
    fields = {f["name"]: f["type"] for f in json.loads(snap.metadata.schema_string)["fields"]}
    assert fields["k"] == "long"  # table type unchanged
    df = read_delta(path, spark=spark)
    assert dict(df.dtypes)["k"] == "bigint"
    assert df.count() == 6
    # no metaData action was re-committed (nothing changed)
    assert snap.version == 1


def test_wider_frame_requires_property(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_int_df(spark, 0, 3, "int"), path)
    with pytest.raises(ValueError, match="enableTypeWidening"):
        to_delta(
            _int_df(spark, 3, 6, "bigint"),
            path,
            mode="append",
            schema_mode="merge",
        )


def test_widening_commit_and_old_file_upcast(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(
        _int_df(spark, 0, 3, "int"),
        path,
        configuration={"delta.enableTypeWidening": "true"},
    )
    to_delta(
        _int_df(spark, 3, 6, "bigint"),
        path,
        mode="append",
        schema_mode="merge",
    )
    snap = DeltaLog(path).snapshot()
    fields = {f["name"]: f["type"] for f in json.loads(snap.metadata.schema_string)["fields"]}
    assert fields["k"] == "long"  # table widened int -> long
    assert snap.protocol.min_reader_version == 3
    assert "typeWidening" in snap.protocol.reader_features
    assert "typeWidening" in snap.protocol.writer_features
    df = read_delta(path, spark=spark)
    assert dict(df.dtypes)["k"] == "bigint"
    # OLD narrow files read up-cast; values intact across both eras
    assert sorted(r["k"] for r in df.collect()) == list(range(6))
    # subsequent plain appends write at the widened type
    to_delta(_int_df(spark, 6, 8, "bigint"), path, mode="append")
    assert read_delta(path, spark=spark).count() == 8
    # float -> double too
    p2 = str(tmp_path / "t2")
    to_delta(
        spark.range(3).select(F.col("id").cast("float").alias("x")),
        p2,
        configuration={"delta.enableTypeWidening": "true"},
    )
    to_delta(
        spark.range(3, 6).select(F.col("id").cast("double").alias("x")),
        p2,
        mode="append",
        schema_mode="merge",
    )
    assert dict(read_delta(p2, spark=spark).dtypes)["x"] == "double"
    assert read_delta(p2, spark=spark).count() == 6


def test_incompatible_change_still_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(
        _int_df(spark, 0, 3, "bigint"),
        path,
        configuration={"delta.enableTypeWidening": "true"},
    )
    bad = spark.range(3).select(
        F.col("id").cast("string").alias("k"), (F.col("id") * 10).alias("v")
    )
    with pytest.raises(ValueError, match="not merged"):
        to_delta(bad, path, mode="append", schema_mode="merge")


def test_python_source_reads_widened_table(spark, tmp_path):
    from dask_deltalake_spark.sources import register_python_datasource

    register_python_datasource(spark)
    path = str(tmp_path / "t")
    to_delta(
        _int_df(spark, 0, 3, "int"),
        path,
        configuration={"delta.enableTypeWidening": "true"},
    )
    to_delta(
        _int_df(spark, 3, 6, "bigint"),
        path,
        mode="append",
        schema_mode="merge",
    )
    df = spark.read.format("delta_py").option("path", path).load()
    assert dict(df.dtypes)["k"] == "bigint"
    assert sorted(r["k"] for r in df.collect()) == list(range(6))
