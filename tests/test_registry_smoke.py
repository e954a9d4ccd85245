"""Every registered query must plan and execute at sf0.001.

The DuckDB oracle gate (tools/check_oracle.py, driver t2) checks value
correctness at sf0.01; this smoke keeps the whole registry executable
from pytest — schema stays resolvable and each query returns rows
without error at the smallest scale factor.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _registry():
    from dask_deltalake_spark.operators import REGISTRY

    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _registry())
def test_query_runs(spark, name):
    from dask_deltalake_spark.operators import REGISTRY

    fn, oracle = REGISTRY[name]
    df = fn(spark, SF_DIR)
    assert df.columns, f"{name} returned no columns"
    rows = df.limit(5).collect()
    assert rows is not None
    if oracle is not None:
        assert oracle.strip().upper().startswith(("SELECT", "WITH")), name


def test_q47_lateral_matches_window_reference(spark):
    """q47 (r10 debut): the LATERAL top-N-per-group subquery must
    agree row-for-row with the independent window-function phrasing
    on the same data — the local stand-in for the DuckDB oracle it
    registers with in r10."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from dask_deltalake_spark.operators.relational import (
        q47_lateral_topn_per_group,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = q47_lateral_topn_per_group(spark, sf_dir)
    assert set(got.columns) == {"c_custkey", "o_orderkey", "top_price"}
    from dask_deltalake_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ref = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("top_price"),
        )
    )
    assert got.count() == ref.count() > 0
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
