"""Pure-Python Delta Lake transaction-log protocol + Spark I/O.

Implements the public Delta Lake protocol (delta.io PROTOCOL.md): JSON
commit actions, parquet checkpoints, log replay, optimistic atomic
commits. Metadata work (log replay, pruning, commit) happens on the
driver — exactly as in delta-spark and delta-rs — while all data I/O
runs on Spark executors.
"""

from dask_deltalake_spark.delta.log import DeltaLog, Snapshot
from dask_deltalake_spark.delta.mutate import delete_where, merge_into, update_where
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta

__all__ = [
    "DeltaLog",
    "Snapshot",
    "read_delta",
    "to_delta",
    "merge_into",
    "delete_where",
    "update_where",
]
