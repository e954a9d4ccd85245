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

from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta
from dask_deltalake_spark.delta.maintenance import (
    cleanup_metadata,
    create_checkpoint,
    optimize,
    read_delta_history,
    enable_v2_checkpoints,
    restore,
    set_table_properties,
    table_detail,
    vacuum,
    validate_version_checksum,
)
from dask_deltalake_spark.delta.clustering import clustering_columns
from dask_deltalake_spark.delta.logstore import (
    register_log_store,
    resolve_spark_path,
)
from dask_deltalake_spark.streaming.availablenow import drain_available_now
from dask_deltalake_spark.delta.cdc import read_delta_changes
from dask_deltalake_spark.delta.column_mapping import (
    add_column,
    drop_column,
    rename_column,
    upgrade_to_column_mapping,
)
from dask_deltalake_spark.delta.constraints import (
    add_constraint,
    drop_constraint,
)
from dask_deltalake_spark.delta.generated import (
    GeneratedColumnViolationError,
    generated_columns,
)
from dask_deltalake_spark.delta.identity import (
    IdentityColumnError,
    identity_columns,
)
from dask_deltalake_spark.delta.clone import shallow_clone
from dask_deltalake_spark.delta.ict import enable_in_commit_timestamps
from dask_deltalake_spark.delta.mutate import delete_where, merge_into, update_where
from dask_deltalake_spark.delta.rowtracking import enable_row_tracking
from dask_deltalake_spark.session import get_spark

__all__ = [
    "read_delta",
    "to_delta",
    "read_delta_changes",
    "read_delta_history",
    "vacuum",
    "optimize",
    "create_checkpoint",
    "cleanup_metadata",
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
