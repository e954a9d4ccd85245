"""Spark 4 Python Data Source (format 'delta_py') behavior."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import dask_deltalake_spark as ddl
from dask_deltalake_spark.sources import register_python_datasource


@pytest.fixture()
def source_table(spark, tmp_path):
    register_python_datasource(spark)
    path = str(tmp_path / "t")
    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 4).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    ddl.to_delta(df, path, partition_by=["k"])
    return path


def _read(spark, path, **opts):
    r = spark.read.format("delta_py").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_matches_read_delta(spark, source_table):
    via_source = _read(spark, source_table).orderBy("id").collect()
    via_native = ddl.read_delta(source_table, spark=spark).orderBy("id").collect()
    assert via_source == via_native


def test_partition_column_typed(spark, source_table):
    df = _read(spark, source_table)
    assert dict(df.dtypes)["k"] == "bigint"
    assert df.filter(F.col("k") == 3).count() == 125


def test_filter_pushdown_and_residual(spark, source_table):
    df = _read(spark, source_table).filter((F.col("k") == 1) & (F.col("id") < 100))
    got = sorted(r.id for r in df.collect())
    assert got == [i for i in range(100) if i % 4 == 1]


def test_version_option(spark, source_table):
    first = ddl.read_delta(source_table, spark=spark)
    ddl.to_delta(first.limit(10), source_table, mode="overwrite")
    assert _read(spark, source_table, version="0").count() == 500
    assert _read(spark, source_table).count() == 10


def test_streaming_source_incremental(spark, tmp_path):
    register_python_datasource(spark)
    tbl = str(tmp_path / "stbl")
    out = str(tmp_path / "sout")
    ck = str(tmp_path / "sck")
    df = spark.range(50).select(F.col("id"), (F.col("id") % 2).alias("k"))
    ddl.to_delta(df, tbl, partition_by=["k"])

    def drain():
        q = (
            spark.readStream.format("delta_py").option("path", tbl).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 50
    ddl.to_delta(df.withColumn("id", F.col("id") + 50), tbl, mode="append")
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 100  # second run emitted only the new commit
    assert got.select("id").distinct().count() == 100
