"""Delta-engine queries for the driver harness.

These exercise the actual Delta protocol implementation (write → log
commit → replay → pruned read) inside the DuckDB-oracle correctness
gate: the oracle computes the same answer straight from the source
parquet, so a hash match proves the Delta round-trip is lossless.
Tables are written under /tmp (mode=overwrite, per-SF paths) so runs
are idempotent.
"""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta
from dask_deltalake_spark.tables import load_table

REGISTRY: dict = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def _tmp_table(sf_dir: str, name: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/ddl_spark_tables/{tag}/{name}"


@query(
    "d01_delta_roundtrip",
    """
    SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def d01_delta_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → to_delta → read_delta → aggregate; hash-matches the
    oracle aggregating the source parquet directly iff the Delta
    write+replay is lossless."""
    path = _tmp_table(sf_dir, "lineitem_delta")
    l = load_table(spark, sf_dir, "lineitem")
    to_delta(l, path, mode="overwrite") if os.path.exists(path) else to_delta(l, path)
    return (
        read_delta(path, spark=spark)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "d02_delta_time_travel",
    """
    SELECT (SELECT COUNT(*) FROM orders)                            AS v0_rows,
           (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'F')  AS v1_rows
    """,
)
def d02_delta_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write v0 (all orders), overwrite with only status-F orders
    (v1), then read both versions — proving log replay + overwrite
    tombstoning. Table is recreated from scratch each run so the
    version numbers are stable."""
    import shutil

    path = _tmp_table(sf_dir, "orders_tt")
    shutil.rmtree(path, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    to_delta(o, path)
    to_delta(o.filter(F.col("o_orderstatus") == "F"), path, mode="overwrite")
    v0 = read_delta(path, version=0, spark=spark).count()
    v1 = read_delta(path, version=1, spark=spark).count()
    return spark.createDataFrame([(v0, v1)], "v0_rows bigint, v1_rows bigint")


@query(
    "d03_delta_partition_prune",
    """
    SELECT o_orderpriority, COUNT(*) AS n, ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def d03_delta_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned Delta write + DNF partition pruning on read:
    only o_orderstatus=O files enter the Spark scan (metadata-level
    file skipping, same as at 100 TB)."""
    path = _tmp_table(sf_dir, "orders_part")
    o = load_table(spark, sf_dir, "orders")
    if os.path.exists(os.path.join(path, "_delta_log")):
        to_delta(o, path, mode="overwrite")
    else:
        to_delta(o, path, partition_by=["o_orderstatus"])
    return (
        read_delta(path, filter=[("o_orderstatus", "==", "O")], spark=spark)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )
