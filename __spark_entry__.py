"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke on sf0.001.
``queries()`` — one named query per operator from SURVEY.md §2
(relational surface, Delta engine round-trips, LLM-pipeline
extensions), each a callable ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — the DuckDB-equivalent ANSI SQL for every query
that is exactly SQL-expressible; approximate/hash-specific or
iterative-data-dependent operators (approx_count_distinct,
MinHash/SimHash/LSH, BPE merge learning and its encode application)
are intentionally omitted → rows-only check, each bounded by a
quantitative pytest invariant.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from dask_deltalake_spark.session import ensure_engine_conf
    from dask_deltalake_spark.operators.relational import q01_pricing_summary

    ensure_engine_conf(spark)
    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dask_deltalake_spark.session import ensure_engine_conf

        ensure_engine_conf(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dask_deltalake_spark.operators import REGISTRY

    return {name: _wrap(fn) for name, (fn, _oracle) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from dask_deltalake_spark.operators import REGISTRY

    return {
        name: oracle
        for name, (_fn, oracle) in REGISTRY.items()
        if oracle is not None
    }
