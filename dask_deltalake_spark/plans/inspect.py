"""Physical-plan inspection utilities.

The scale posture of this engine (ARCHITECTURE.md) makes claims about
plan shape — filters reach the scan, projections prune the read
schema, dim joins broadcast, bucketed joins need no exchange. These
helpers turn those claims into assertions so tests catch plan-quality
regressions, not just wrong answers.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def scan_info(df: DataFrame) -> list[dict]:
    """Per-FileScan details: pushed filters, partition filters, and the
    read schema — the three signals that pruning reached the reader."""
    plan = executed_plan(df)
    scans = []
    for m in re.finditer(r"FileScan parquet[^\n]*", plan):
        seg = m.group(0)  # FileScan details are one (very long) line
        scans.append(
            {
                "pushed_filters": _extract(seg, "PushedFilters"),
                "partition_filters": _extract(seg, "PartitionFilters"),
                "read_schema": _extract(seg, "ReadSchema"),
                "data_filters": _extract(seg, "DataFilters"),
            }
        )
    return scans


def _extract(segment: str, key: str) -> str:
    # struct<...> may be truncated with "..." by the plan printer, so
    # capture to the next whitespace rather than a closing bracket
    m = re.search(rf"{key}: (\[[^\]]*\]|struct<\S*)", segment)
    return m.group(1) if m else ""


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in plan order (BroadcastHashJoin,
    SortMergeJoin, ShuffledHashJoin, BroadcastNestedLoopJoin...)."""
    plan = executed_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def exchanges_below_first_join(df: DataFrame) -> int:
    """Count shuffle Exchanges below the first join operator — 0 means
    the join consumes its inputs' existing distribution (broadcast or
    bucketed co-location)."""
    plan = executed_plan(df)
    m = re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan
    )
    if not m:
        return -1
    below = plan[m.end():]
    return len(re.findall(r"Exchange (?:hash|range|RoundRobin)", below))
