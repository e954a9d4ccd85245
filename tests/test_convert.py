"""CONVERT TO DELTA (delta/convert.py) — in-place parquet conversion.

Reference parity note: the reference (core.py) has no conversion
surface; semantics modeled on delta-spark ``CONVERT TO DELTA`` and
delta-rs ``convert_to_deltalake``.
"""

import json
import os

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.convert import ConvertError, convert_to_delta
from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.protocol import normalize_dnf, prune_by_stats
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def test_convert_flat_dir_roundtrip(spark, tmp_path):
    src = str(tmp_path / "flat")
    df = spark.range(0, 100).withColumn("val", F.col("id") * 3)
    df.repartition(4).write.parquet(src)
    v = convert_to_delta(src, spark=spark)
    assert v == 0
    snap = DeltaLog(src).snapshot()
    assert snap.protocol.min_reader_version == 1
    assert snap.protocol.min_writer_version == 2
    assert snap.metadata.partition_columns == []
    # every add: relative path, real size, protocol-shaped stats
    total = 0
    for a in snap.add_actions:
        assert not a.path.startswith("/")
        assert a.size == os.path.getsize(os.path.join(src, a.path))
        st = json.loads(a.stats)
        assert set(st) == {"numRecords", "minValues", "maxValues", "nullCount"}
        total += st["numRecords"]
    assert total == 100
    got = read_delta(src, spark=spark)
    assert got.count() == 100
    assert got.agg(F.sum("val")).first()[0] == sum(3 * i for i in range(100))


def test_convert_partitioned_discovery_and_null(spark, tmp_path):
    src = str(tmp_path / "part")
    df = spark.range(0, 60).select(
        "id",
        F.when(F.col("id") % 3 == 0, None)
        .otherwise((F.col("id") % 3).cast("string"))
        .alias("grp"),
    )
    df.write.partitionBy("grp").parquet(src)
    convert_to_delta(src, spark=spark)
    snap = DeltaLog(src).snapshot()
    assert snap.metadata.partition_columns == ["grp"]
    vals = {a.partition_values["grp"] for a in snap.add_actions}
    assert None in vals and {"1", "2"} <= vals
    assert read_delta(src, spark=spark).count() == 60
    one = read_delta(src, filter=[("grp", "==", "1")], spark=spark)
    assert one.count() == 20
    nulls = read_delta(src, spark=spark).filter(F.col("grp").isNull())
    assert nulls.count() == 20


def test_convert_stats_enable_skipping(spark, tmp_path):
    src = str(tmp_path / "skip")
    # two disjoint id ranges in two files -> a stats filter must prune
    spark.range(0, 50).coalesce(1).write.parquet(src)
    spark.range(1000, 1050).coalesce(1).write.mode("append").parquet(src)
    convert_to_delta(src, spark=spark)
    adds = DeltaLog(src).snapshot().add_actions
    kept = prune_by_stats(adds, normalize_dnf([("id", ">", 900)]))
    assert len(kept) == 1
    assert read_delta(
        src, filter=[("id", ">", 900)], spark=spark
    ).count() == 50


def test_convert_no_stats_mode(spark, tmp_path):
    src = str(tmp_path / "nostats")
    spark.range(0, 10).write.parquet(src)
    convert_to_delta(src, spark=spark, collect_stats=False)
    adds = DeltaLog(src).snapshot().add_actions
    assert all(a.stats is None for a in adds)
    assert read_delta(src, spark=spark).count() == 10


def test_converted_table_is_transactional(spark, tmp_path):
    src = str(tmp_path / "txn")
    spark.range(0, 20).write.parquet(src)
    convert_to_delta(src, spark=spark)
    to_delta(spark.range(100, 110), src, mode="append")
    assert read_delta(src, spark=spark).count() == 30
    # time travel to the conversion commit sees only the converted set
    assert read_delta(src, version=0, spark=spark).count() == 20


def test_convert_refusals(spark, tmp_path):
    # already a Delta table
    t = str(tmp_path / "delta")
    to_delta(spark.range(5), t)
    with pytest.raises(ConvertError, match="already has a _delta_log"):
        convert_to_delta(t, spark=spark)
    # empty directory
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(ConvertError, match="no parquet files"):
        convert_to_delta(empty, spark=spark)
    # mixed hive / non-hive layout
    mixed = str(tmp_path / "mixed")
    spark.range(5).coalesce(1).write.parquet(os.path.join(mixed, "grp=1"))
    spark.range(5).coalesce(1).write.parquet(os.path.join(mixed, "stray"))
    with pytest.raises(ConvertError, match="non-hive|layout"):
        convert_to_delta(mixed, spark=spark)


def test_convert_on_object_store_seam(spark, tmp_path):
    """VERDICT r8 #5: CONVERT TO DELTA on a store with NO local mapping
    — discovery walks, per-file size/mtime, the distributed stats pass
    (executors open files through the shipped store), and the commit
    all route through the LogStore seam, the same d40 pattern the DML
    paths use. The old locally-mapped refusal is gone."""
    src_local = str(tmp_path / "objconv")
    df = spark.range(0, 60).withColumn("part", (F.col("id") % 3).cast("int"))
    df.write.partitionBy("part").parquet(src_local)
    seam = "mocknl:" + src_local
    assert convert_to_delta(seam, spark=spark) == 0
    out = read_delta(seam, spark=spark)
    assert out.count() == 60
    # hive-partition discovery + pruning work through the seam
    assert (
        read_delta(seam, filter=[("part", "==", 1)], spark=spark).count()
        == 20
    )
    snap = DeltaLog(seam).snapshot()
    assert all(a.stats for a in snap.add_actions), "seam stats pass ran"
    assert all(a.size > 0 for a in snap.add_actions)
    # converted table is transactional on the same seam
    to_delta(
        spark.range(100, 110).withColumn("part", F.lit(0).cast("int")),
        seam,
        mode="append",
    )
    assert read_delta(seam, spark=spark).count() == 70
    assert read_delta(seam, version=0, spark=spark).count() == 60
    # idempotence refusal still fires through the seam
    with pytest.raises(ConvertError, match="already has a _delta_log"):
        convert_to_delta(seam, spark=spark)
