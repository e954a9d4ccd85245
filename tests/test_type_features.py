"""Type-triggered protocol features (delta/writer.py _type_features):
TIMESTAMP_NTZ -> timestampNtz, VARIANT -> variantType, declared as
reader+writer features at create (and on schema-merge evolution);
VARIANT survives the footer harvest via the Spark count fallback."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def test_ntz_create_declares_feature(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(5).select(
        F.col("id").alias("k"),
        F.expr("TIMESTAMP_NTZ '2024-01-01 12:00:00'").alias("tn"),
    )
    to_delta(df.coalesce(1), path)
    snap = DeltaLog(path).snapshot()
    assert snap.protocol.min_reader_version == 3
    assert snap.protocol.min_writer_version == 7
    assert "timestampNtz" in snap.protocol.reader_features
    assert "timestampNtz" in snap.protocol.writer_features
    got = read_delta(path, spark=spark)
    assert dict(got.dtypes)["tn"] == "timestamp_ntz"
    assert got.count() == 5
    to_delta(df.coalesce(1), path, mode="append")
    assert read_delta(path, spark=spark).count() == 10


def test_variant_create_roundtrip_and_stats_fallback(spark, tmp_path):
    import json

    path = str(tmp_path / "t")
    df = spark.range(6).select(
        F.col("id").alias("k"),
        F.parse_json(
            F.concat(F.lit('{"a": '), F.col("id").cast("string"), F.lit("}"))
        ).alias("v"),
    )
    to_delta(df.coalesce(2), path)
    snap = DeltaLog(path).snapshot()
    assert "variantType" in (snap.protocol.reader_features or [])
    assert "variantType" in (snap.protocol.writer_features or [])
    # row counts recovered through the Spark fallback, stats omitted
    total = sum(
        json.loads(a.stats)["numRecords"] if a.stats else 0
        for a in snap.add_actions
    )
    ops = DeltaLog(path).read_commit_actions(0)
    metrics = next(a for a in ops if "commitInfo" in a)["commitInfo"][
        "operationMetrics"
    ]
    assert metrics["numOutputRows"] == "6"
    got = read_delta(path, spark=spark)
    assert got.count() == 6
    vals = sorted(
        r["a"] for r in got.select(
            F.try_variant_get("v", "$.a", "bigint").alias("a")
        ).collect()
    )
    assert vals == list(range(6))


def test_merge_in_ntz_column_upgrades_protocol(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.range(4).selectExpr("id AS k")
    to_delta(base.coalesce(1), path)
    assert DeltaLog(path).snapshot().protocol.min_reader_version == 1
    evolved = spark.range(4, 6).select(
        F.col("id").alias("k"),
        F.expr("TIMESTAMP_NTZ '2024-06-01 00:00:00'").alias("tn"),
    )
    to_delta(evolved.coalesce(1), path, mode="append", schema_mode="merge")
    snap = DeltaLog(path).snapshot()
    assert "timestampNtz" in (snap.protocol.reader_features or [])
    got = read_delta(path, spark=spark)
    assert got.count() == 6
    assert got.filter(F.col("tn").isNull()).count() == 4


def test_delta_py_source_refuses_variant_tables(spark, tmp_path):
    """The Python DataSource path reads files with pyarrow, which
    cannot parse the VARIANT logical type — the reader gate must
    REFUSE variantType tables (loud, before any wrong/failed read)
    while the native scan path accepts them."""
    from dask_deltalake_spark.delta.protocol import DeltaProtocolError
    from dask_deltalake_spark.sources import register_python_datasource

    path = str(tmp_path / "t")
    df = spark.range(3).select(
        F.col("id").alias("k"),
        F.parse_json(F.lit('{"a": 1}')).alias("v"),
    )
    to_delta(df.coalesce(1), path)
    register_python_datasource(spark)
    with pytest.raises(Exception, match="variantType"):
        spark.read.format("delta_py").option("path", path).load().collect()
    assert read_delta(path, spark=spark).count() == 3  # native path fine
