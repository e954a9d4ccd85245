"""Relational + extension operator registry.

Every operator category from SURVEY.md §2.2/§2.3 is exposed as a named
query: ``REGISTRY[name] = (spark_fn, oracle_sql | None)`` where
``spark_fn(spark, sf_dir) -> DataFrame`` and the oracle is equivalent
ANSI SQL for DuckDB over the same parquet tables.
"""

from dask_deltalake_spark.operators.relational import REGISTRY as _RELATIONAL
from dask_deltalake_spark.operators.delta_ops import REGISTRY as _DELTA
from dask_deltalake_spark.functions.llmops import REGISTRY as _LLMOPS
from dask_deltalake_spark.functions.curation import REGISTRY as _CURATION
from dask_deltalake_spark.streaming import REGISTRY as _STREAMING

REGISTRY: dict = {}
REGISTRY.update(_RELATIONAL)
REGISTRY.update(_DELTA)
REGISTRY.update(_LLMOPS)
REGISTRY.update(_CURATION)
REGISTRY.update(_STREAMING)

__all__ = ["REGISTRY"]
