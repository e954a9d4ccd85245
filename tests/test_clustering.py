"""Clustered tables (delta/clustering.py + writer cluster_by +
optimize default clustering): protocol shape, domain round-trip
through appends and checkpoints, OPTIMIZE clustering by the declared
columns, and stats-based skipping on the clustered layout."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.clustering import clustering_columns
from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.maintenance import create_checkpoint, optimize
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, n=4096):
    return spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    ).orderBy(F.xxhash64("id"))  # write order correlated with neither


def test_create_clustered_table_protocol_and_domain(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark).repartition(4), path, cluster_by=["x", "y"])
    snap = DeltaLog(path).snapshot()
    assert snap.protocol.min_writer_version == 7
    assert "clustering" in snap.protocol.writer_features
    assert "domainMetadata" in snap.protocol.writer_features
    assert clustering_columns(snap) == ["x", "y"]
    # spec shape: nested-name path arrays in the domain configuration
    cfg = json.loads(snap.domain_metadata["delta.clustering"])
    assert cfg["clusteringColumns"] == [["x"], ["y"]]

    # appends preserve the domain; checkpoint-started replay keeps it
    to_delta(_df(spark, 100).coalesce(1), path, mode="append")
    create_checkpoint(path)
    to_delta(_df(spark, 50).coalesce(1), path, mode="append")
    assert clustering_columns(DeltaLog(path).snapshot()) == ["x", "y"]

    with pytest.raises(ValueError, match="mutually exclusive"):
        to_delta(_df(spark), str(tmp_path / "t2"),
                 cluster_by=["x"], partition_by=["y"])
    with pytest.raises(ValueError, match="CREATE-only"):
        to_delta(_df(spark), path, mode="append", cluster_by=["x"])


def test_optimize_clusters_by_declared_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    to_delta(_df(spark).repartition(8), path, cluster_by=["x", "y"])
    res = optimize(path, target_file_size=2_200, spark=spark)
    assert res["numFilesAdded"] >= 8
    snap = DeltaLog(path).snapshot()

    def avg_span(col):
        spans = []
        for a in snap.add_actions:
            st = json.loads(a.stats)
            spans.append(st["maxValues"][col] - st["minValues"][col])
        return sum(spans) / len(spans)

    # same bound as test_zorder: ideal per-file span 64/sqrt(16)=16
    assert avg_span("x") < 22 and avg_span("y") < 22
    assert read_delta(path, spark=spark).count() == 4096
    # stats skipping now prunes on BOTH clustered columns
    probe = read_delta(path, filter=[("x", "==", 7)], spark=spark)
    assert len(probe.inputFiles()) < len(snap.add_actions)


def test_optimize_clusters_non_numeric_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(2000).select(
        F.concat(F.lit("cat_"), (F.col("id") % 20).cast("string")).alias("c"),
        F.col("id").alias("v"),
    ).orderBy(F.xxhash64("id"))
    to_delta(df.repartition(6), path, cluster_by=["c"])
    optimize(path, target_file_size=3_000, spark=spark)
    snap = DeltaLog(path).snapshot()
    assert len(snap.add_actions) >= 3
    # lexicographic clustering: most files cover few distinct prefixes
    # -> an equality probe skips most files via min/max stats
    probe = read_delta(path, filter=[("c", "==", "cat_7")], spark=spark)
    assert probe.count() == 100
    assert len(probe.inputFiles()) < len(snap.add_actions)
