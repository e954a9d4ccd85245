"""Plan-quality regression tests: the scale claims in ARCHITECTURE.md
as assertions over the executed physical plans."""

from __future__ import annotations

import os

import pytest

from dask_deltalake_spark.operators import REGISTRY
from dask_deltalake_spark.plans import (
    exchanges_below_first_join,
    join_strategies,
    scan_info,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _q(spark, name):
    fn, _ = REGISTRY[name]
    return fn(spark, SF_DIR)


def test_q01_filter_and_projection_reach_scan(spark):
    scans = scan_info(_q(spark, "q01_pricing_summary"))
    assert scans, "no FileScan found"
    s = scans[0]
    # the shipdate filter is pushed and the read schema is pruned to
    # the 7 referenced columns (no l_orderkey/l_partkey/... in schema)
    assert "l_shipdate" in s["pushed_filters"] or "l_shipdate" in s["data_filters"]
    assert "l_returnflag" in s["read_schema"]
    assert "l_orderkey" not in s["read_schema"]


def test_q05_star_join_all_broadcast(spark):
    strategies = join_strategies(_q(spark, "q05_join_multiway"))
    assert strategies, "no joins found"
    assert set(strategies) == {"BroadcastHashJoin"}, strategies


def test_q34_bucketed_join_no_prejoin_exchange(spark):
    df = _q(spark, "q34_bucketed_join")
    assert "SortMergeJoin" in join_strategies(df)
    assert exchanges_below_first_join(df) == 0


def test_q07_semi_join_strategy(spark):
    plan_joins = join_strategies(_q(spark, "q07_join_semi"))
    assert plan_joins, "no joins found"


def test_delta_read_partition_prune_is_metadata_level(spark):
    """read_delta with a partition filter hands Spark ONLY the matching
    files — the scan's input paths are already pruned driver-side."""
    import dask_deltalake_spark as ddl
    from dask_deltalake_spark.tables import load_table

    path = str("/tmp/ddl_plan_quality_part")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    o = load_table(spark, SF_DIR, "orders")
    ddl.to_delta(o, path, partition_by=["o_orderstatus"])
    df = ddl.read_delta(path, filter=[("o_orderstatus", "==", "O")], spark=spark)
    from dask_deltalake_spark.plans import executed_plan

    plan = executed_plan(df)
    assert "o_orderstatus=O" in plan
    assert "o_orderstatus=F" not in plan


def test_q39_range_join_is_equi_not_nested_loop(spark):
    """The binned rewrite must execute the interval join as an equi
    join — a BroadcastNestedLoopJoin/CartesianProduct here means the
    rewrite regressed to the O(n·m)-per-user theta topology."""
    strategies = join_strategies(_q(spark, "q39_range_join_binned"))
    assert strategies, "no joins found"
    assert not any(
        "NestedLoop" in s or "Cartesian" in s for s in strategies
    ), strategies


def test_x21_decontaminate_broadcasts_benchmark_side(spark):
    from dask_deltalake_spark.functions.curation import x21_decontaminate

    strategies = join_strategies(x21_decontaminate(spark, SF_DIR))
    assert "BroadcastHashJoin" in strategies, strategies
