"""dask_deltalake_spark — a PySpark-native analytics engine with the
capabilities of the reference `hayesgb/dask_deltalake` connector.

The reference (see /root/reference, SURVEY.md) is a Dask connector for
Delta Lake: log-replay reads with projection/filter pushdown + partition
pruning + time travel, transactional two-phase writes, history and
vacuum maintenance. Here the same surface is re-expressed Spark-first:

- ``read_delta`` / ``to_delta`` / ``read_delta_history`` / ``vacuum``
  mirror the reference public API (reference ``core.py:158-265``,
  ``writer.py:134-313``, ``core.py:268-293``, ``core.py:296-324``) but
  return/consume ``pyspark.sql.DataFrame`` and execute all data I/O on
  Spark executors. The Delta transaction-log protocol (log replay,
  checkpoints, atomic commits) is implemented in pure Python from the
  public Delta protocol spec, since all relational computation is
  Catalyst's job.
- The relational operator surface the reference inherits from Dask is
  exposed through Spark SQL / DataFrame queries (see ``operators``).
- LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal plumbing) live in ``functions``.
"""

# PEP 562 LAZY exports: importing any submodule of this package (which
# Python's import machinery routes through this __init__) must NOT pay
# for the whole engine. The cost is real and measured: Spark's Python
# DataSource spawns a fresh worker process per streaming query (the
# planner runner) and per batch-source plan, and each spawn imports
# `sources.delta_source` — with eager exports that pulled mutate +
# maintenance + pandas (~0.35 s extra per spawn, ×2 spawns per
# streaming query). The public surface is unchanged: every name in
# __all__ resolves on first attribute access.
_EXPORTS = {
    "read_delta": "dask_deltalake_spark.delta.reader",
    "to_delta": "dask_deltalake_spark.delta.writer",
    "cleanup_metadata": "dask_deltalake_spark.delta.maintenance",
    "compact_log": "dask_deltalake_spark.delta.maintenance",
    "enable_coordinated_commits": "dask_deltalake_spark.delta.coordinated",
    "disable_coordinated_commits": "dask_deltalake_spark.delta.coordinated",
    "backfill_commits": "dask_deltalake_spark.delta.coordinated",
    "register_commit_coordinator": "dask_deltalake_spark.delta.coordinated",
    "create_checkpoint": "dask_deltalake_spark.delta.maintenance",
    "recompute_statistics": "dask_deltalake_spark.delta.maintenance",
    "fsck_repair": "dask_deltalake_spark.delta.maintenance",
    "generate_symlink_manifest": "dask_deltalake_spark.delta.maintenance",
    "optimize": "dask_deltalake_spark.delta.maintenance",
    "read_delta_history": "dask_deltalake_spark.delta.maintenance",
    "enable_v2_checkpoints": "dask_deltalake_spark.delta.maintenance",
    "restore": "dask_deltalake_spark.delta.maintenance",
    "set_table_properties": "dask_deltalake_spark.delta.maintenance",
    "table_detail": "dask_deltalake_spark.delta.maintenance",
    "vacuum": "dask_deltalake_spark.delta.maintenance",
    "validate_version_checksum": "dask_deltalake_spark.delta.maintenance",
    "clustering_columns": "dask_deltalake_spark.delta.clustering",
    "register_log_store": "dask_deltalake_spark.delta.logstore",
    "resolve_spark_path": "dask_deltalake_spark.delta.logstore",
    "drain_available_now": "dask_deltalake_spark.streaming.availablenow",
    "read_delta_changes": "dask_deltalake_spark.delta.cdc",
    "add_column": "dask_deltalake_spark.delta.column_mapping",
    "drop_column": "dask_deltalake_spark.delta.column_mapping",
    "rename_column": "dask_deltalake_spark.delta.column_mapping",
    "upgrade_to_column_mapping": "dask_deltalake_spark.delta.column_mapping",
    "add_constraint": "dask_deltalake_spark.delta.constraints",
    "drop_constraint": "dask_deltalake_spark.delta.constraints",
    "GeneratedColumnViolationError": "dask_deltalake_spark.delta.generated",
    "generated_columns": "dask_deltalake_spark.delta.generated",
    "IdentityColumnError": "dask_deltalake_spark.delta.identity",
    "identity_columns": "dask_deltalake_spark.delta.identity",
    "shallow_clone": "dask_deltalake_spark.delta.clone",
    "deep_clone": "dask_deltalake_spark.delta.clone",
    "enable_in_commit_timestamps": "dask_deltalake_spark.delta.ict",
    "convert_to_delta": "dask_deltalake_spark.delta.convert",
    "drop_feature": "dask_deltalake_spark.delta.features",
    "reorg_purge": "dask_deltalake_spark.delta.features",
    "delete_where": "dask_deltalake_spark.delta.mutate",
    "merge_into": "dask_deltalake_spark.delta.mutate",
    "update_where": "dask_deltalake_spark.delta.mutate",
    "enable_row_tracking": "dask_deltalake_spark.delta.rowtracking",
    "get_spark": "dask_deltalake_spark.session",
}


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(
            f"module 'dask_deltalake_spark' has no attribute {name!r}"
        )
    import importlib

    val = getattr(importlib.import_module(mod), name)
    globals()[name] = val  # cache: next access skips __getattr__
    return val


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))

__all__ = [
    "read_delta",
    "to_delta",
    "read_delta_changes",
    "read_delta_history",
    "vacuum",
    "optimize",
    "generate_symlink_manifest",
    "create_checkpoint",
    "cleanup_metadata",
    "compact_log",
    "enable_coordinated_commits",
    "disable_coordinated_commits",
    "backfill_commits",
    "register_commit_coordinator",
    "restore",
    "merge_into",
    "delete_where",
    "update_where",
    "rename_column",
    "add_column",
    "drop_column",
    "add_constraint",
    "drop_constraint",
    "generated_columns",
    "GeneratedColumnViolationError",
    "identity_columns",
    "IdentityColumnError",
    "upgrade_to_column_mapping",
    "enable_row_tracking",
    "enable_in_commit_timestamps",
    "shallow_clone",
    "enable_v2_checkpoints",
    "set_table_properties",
    "table_detail",
    "validate_version_checksum",
    "clustering_columns",
    "register_log_store",
    "resolve_spark_path",
    "drain_available_now",
    "get_spark",
]

__version__ = "0.1.0"
