"""Row-level mutations: MERGE (upsert), UPDATE, DELETE — copy-on-write.

Neither exists in the reference (delta-rs 0.6 had no merge either) —
delta-spark's MERGE INTO / DELETE FROM are part of the "distributed
read/write/compaction" capability this engine targets. The algorithm
is delta-spark's copy-on-write:

1. **Prune**: use partition values + per-file min/max stats to find
   the files that might contain affected rows (`prune_partitions` /
   `prune_by_stats` — the same data-skipping machinery reads use).
   Untouched files carry over into the new version for free.
2. **Rewrite**: read only the touched files; drop/replace the affected
   rows; write replacement files on executors (same Arrow writer path
   as `to_delta`).
3. **Commit**: one atomic commit with adds for the rewritten files and
   removes for the touched ones.

At 100 TB the prune step is what makes this viable: a merge keyed on a
clustered/partitioned column rewrites a handful of files, not the
table. (Deletion vectors — merge-on-read — are the protocol's newer
alternative; out of scope at writer protocol v2.)
"""

from __future__ import annotations

import json
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.protocol import (
    AddAction,
    RemoveAction,
    check_read_protocol,
    normalize_dnf,
    now_ms,
    prune_by_stats,
    prune_partitions,
)


def _rewrite_and_commit(
    spark: SparkSession,
    table_path: str,
    snap,
    touched,
    untouched,
    new_data: DataFrame,
    operation: str,
    op_params: dict,
) -> dict:
    """Write `new_data` as replacement files for `touched` and commit
    adds+removes atomically. Shared tail of MERGE and DELETE."""
    from dask_deltalake_spark.delta.writer import (
        _ADD_ROW_SCHEMA,
        _spark_to_arrow_schema,
        _write_partition_factory,
        write_commit,
    )

    partition_by = snap.metadata.partition_columns
    schema_bytes = (
        _spark_to_arrow_schema(new_data.schema).serialize().to_pybytes()
    )
    fn = _write_partition_factory(table_path, partition_by, schema_bytes)
    add_rows = new_data.mapInPandas(fn, schema=_ADD_ROW_SCHEMA).collect()

    ts = now_ms()
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": ts,
                "operation": operation,
                "operationParameters": op_params,
                "readVersion": snap.version,
                "isBlindAppend": False,
                "operationMetrics": {
                    "numTargetFilesRemoved": str(len(touched)),
                    "numTargetFilesAdded": str(len(add_rows)),
                },
                "engineInfo": "dask_deltalake_spark/0.1.0",
            }
        }
    ]
    for r in add_rows:
        actions.append(
            AddAction(
                path=r.path,
                size=r.size,
                partition_values=json.loads(r.partition_json),
                modification_time=ts,
                data_change=True,
                stats=r.stats,
            ).to_json()
        )
    for a in touched:
        actions.append(
            RemoveAction(
                path=a.path, deletion_timestamp=ts, data_change=True
            ).to_json()
        )
    write_commit(table_path, snap.version + 1, actions)
    return {
        "version": snap.version + 1,
        "numFilesRewritten": len(touched),
        "numFilesAdded": len(add_rows),
        "numFilesUntouched": len(untouched),
    }


def _read_files(spark: SparkSession, snap, adds, schema: StructType) -> DataFrame:
    if not adds:
        return spark.createDataFrame([], schema)
    files = [f"{snap.path}/{a.path}" for a in adds]
    return (
        spark.read.schema(schema)
        .option("basePath", snap.path)
        .parquet(*files)
    )


def merge_into(
    path: str,
    source: DataFrame,
    keys: list[str] | str,
    spark: Optional[SparkSession] = None,
) -> dict:
    """Upsert: target rows whose key equals a source row's key are
    replaced by the source row; source rows with no match are
    inserted. Source schema must match the table schema."""
    from dask_deltalake_spark.delta.reader import snapshot_schema

    spark = spark or source.sparkSession
    table_path = str(path).rstrip("/")
    if isinstance(keys, str):
        keys = [keys]
    log = DeltaLog(table_path)
    snap = log.snapshot()
    check_read_protocol(snap.protocol)  # copy-on-write READS files
    schema = snapshot_schema(snap)
    if set(source.columns) != set(schema.fieldNames()):
        raise ValueError(
            f"MERGE source columns {sorted(source.columns)} != table "
            f"columns {sorted(schema.fieldNames())}"
        )

    # Conservative file pruning. Preferred: the exact distinct key set
    # as an IN-list (a bimodal source's min/max range would span — and
    # touch — the whole table). Falls back to per-key [min,max] ranges
    # when the key set is too large to hold driver-side; a file whose
    # stats range is disjoint on ANY key column cannot contain an
    # equality match either way.
    _IN_LIST_CAP = 10_000
    dnf: list = []
    small_key_set = False
    if len(keys) == 1:
        key_rows = (
            source.select(keys[0]).distinct().limit(_IN_LIST_CAP + 1).collect()
        )
        if len(key_rows) <= _IN_LIST_CAP:
            dnf = normalize_dnf([[(keys[0], "in", [r[0] for r in key_rows])]])
            small_key_set = True
    if not dnf:
        bounds = source.agg(
            *[F.min(k).alias(f"mn_{k}") for k in keys],
            *[F.max(k).alias(f"mx_{k}") for k in keys],
        ).first()
        conj = []
        for k in keys:
            mn, mx = bounds[f"mn_{k}"], bounds[f"mx_{k}"]
            if mn is not None:
                conj.append((k, ">=", mn))
            if mx is not None:
                conj.append((k, "<=", mx))
        dnf = normalize_dnf([conj]) if conj else []
    adds = snap.add_actions
    touched = prune_by_stats(prune_partitions(adds, dnf), dnf)
    touched_paths = {a.path for a in touched}
    untouched = [a for a in adds if a.path not in touched_paths]

    # Broadcast the deduplicated key set only when the IN-list probe
    # proved it small (≤10k keys). A 100 GB merge source would OOM the
    # driver under an unconditional hint; for large/multi-key sources
    # let AQE / autoBroadcastJoinThreshold pick the join strategy.
    source_keys = source.select(*keys).dropDuplicates(keys)
    if small_key_set:
        source_keys = F.broadcast(source_keys)
    keep = _read_files(spark, snap, touched, schema).join(
        source_keys, keys, "left_anti"
    )
    new_data = keep.unionByName(source.select(*schema.fieldNames()))
    return _rewrite_and_commit(
        spark,
        table_path,
        snap,
        touched,
        untouched,
        new_data,
        "MERGE",
        {"matchedPredicates": json.dumps(keys)},
    )


def delete_where(
    path: str,
    filter: list,
    spark: Optional[SparkSession] = None,
) -> dict:
    """DELETE FROM table WHERE <DNF filter> (reference filter syntax:
    list of tuples = AND, list of lists = OR-of-ANDs)."""
    from dask_deltalake_spark.delta.reader import dnf_to_column, snapshot_schema

    spark = spark or SparkSession.getActiveSession()
    table_path = str(path).rstrip("/")
    log = DeltaLog(table_path)
    snap = log.snapshot()
    check_read_protocol(snap.protocol)  # copy-on-write READS files
    schema = snapshot_schema(snap)
    dnf = normalize_dnf(filter)

    adds = snap.add_actions
    touched = prune_by_stats(prune_partitions(adds, dnf), dnf)
    touched_paths = {a.path for a in touched}
    untouched = [a for a in adds if a.path not in touched_paths]

    cond = dnf_to_column(dnf)
    new_data = _read_files(spark, snap, touched, schema)
    if cond is not None:
        # SQL DELETE removes only rows where the predicate is TRUE.
        # A bare ~cond is NULL (row dropped!) when cond is NULL — e.g.
        # DELETE WHERE x > 5 must KEEP rows with x IS NULL.
        new_data = new_data.filter(~F.coalesce(cond, F.lit(False)))
    return _rewrite_and_commit(
        spark,
        table_path,
        snap,
        touched,
        untouched,
        new_data,
        "DELETE",
        {"predicate": json.dumps([str(c) for c in (filter or [])])},
    )


def update_where(
    path: str,
    filter: list,
    set: dict,
    spark: Optional[SparkSession] = None,
) -> dict:
    """UPDATE table SET col=expr WHERE <DNF filter>. ``set`` maps
    column name → Column expression (or literal), applied only to rows
    matching the filter; same pruned copy-on-write as delete_where."""
    from dask_deltalake_spark.delta.reader import dnf_to_column, snapshot_schema

    spark = spark or SparkSession.getActiveSession()
    table_path = str(path).rstrip("/")
    log = DeltaLog(table_path)
    snap = log.snapshot()
    check_read_protocol(snap.protocol)  # copy-on-write READS files
    schema = snapshot_schema(snap)
    bad = [c for c in set if c not in schema.fieldNames()]
    if bad:
        raise ValueError(f"UPDATE of unknown columns: {bad}")
    dnf = normalize_dnf(filter)

    adds = snap.add_actions
    touched = prune_by_stats(prune_partitions(adds, dnf), dnf)
    touched_paths = {a.path for a in touched}
    untouched = [a for a in adds if a.path not in touched_paths]

    cond = dnf_to_column(dnf)
    new_data = _read_files(spark, snap, touched, schema)
    for col, expr in set.items():
        val = expr if hasattr(expr, "cast") else F.lit(expr)
        val = val.cast(schema[col].dataType)
        new_data = new_data.withColumn(
            col, F.when(cond, val).otherwise(F.col(col)) if cond is not None else val
        )
    return _rewrite_and_commit(
        spark,
        table_path,
        snap,
        touched,
        untouched,
        new_data,
        "UPDATE",
        {"predicate": json.dumps([str(c) for c in (filter or [])])},
    )
