"""Delta table → Spark DataFrame (reference `read_delta`, core.py:158-265).

Unlike the reference — which materializes every Arrow record batch on
the client at graph-construction time (reference core.py:77-78, flagged
in SURVEY.md §3.1 as the design flaw to avoid) — this reader does only
metadata work on the driver: log replay, partition pruning against
`add.partitionValues`, and min/max stats skipping. The surviving file
list becomes a Spark parquet scan, so all data I/O happens on
executors and Catalyst still applies row-group pushdown, column
pruning, and whole-stage codegen on top.

At 100 TB / millions of files the driver cost stays O(#files) dict
operations; the scan itself is planned by Spark's FileSourceStrategy
with size-based split packing.
"""

from __future__ import annotations

import json
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import StructType

from dask_deltalake_spark.delta.log import DeltaLog, Snapshot
from dask_deltalake_spark.delta.protocol import (
    DeltaProtocolError,
    check_read_protocol,
    normalize_dnf,
    prune_by_stats,
    prune_partitions,
)


def snapshot_schema(snap: Snapshot) -> StructType:
    """The version's schema: Delta's `schemaString` *is* Spark
    StructType JSON (SURVEY.md §1.5), so this is a direct parse —
    schema evolution across versions comes for free."""
    return StructType.fromJson(json.loads(snap.metadata.schema_string))


def dnf_to_column(dnf: list[list[tuple]]) -> Optional[Column]:
    """Reference DNF filter tuples → one Catalyst boolean Column.

    Expressing the filter declaratively lets Catalyst push it into the
    FileScan (PushedFilters) for row-group skipping — the Spark-native
    analog of the reference's `pq.filters_to_expression` pushdown
    (reference core.py:75-77).
    """
    if not dnf:
        return None
    ors: Optional[Column] = None
    for conj in dnf:
        ands: Optional[Column] = None
        for col, op, val in conj:
            c = F.col(col)
            if op == "==":
                expr = c == F.lit(val)
            elif op == "!=":
                expr = c != F.lit(val)
            elif op == "<":
                expr = c < F.lit(val)
            elif op == ">":
                expr = c > F.lit(val)
            elif op == "<=":
                expr = c <= F.lit(val)
            elif op == ">=":
                expr = c >= F.lit(val)
            elif op == "in":
                expr = c.isin(list(val))
            elif op == "not in":
                expr = ~c.isin(list(val))
            else:
                raise ValueError(f"Unsupported filter op: {op!r}")
            ands = expr if ands is None else (ands & expr)
        ors = ands if ors is None else (ors | ands)
    return ors


def read_delta(
    path: Optional[str] = None,
    table_name: str = None,
    version: Optional[int] = None,
    columns: Optional[list[str]] = None,
    filter: Optional[list] = None,
    storage_options: Optional[dict] = None,
    datetime: Optional[str] = None,
    spark: Optional[SparkSession] = None,
    with_row_ids: bool = False,
    **kwargs,
) -> DataFrame:
    """Read a Delta table into a Spark DataFrame.

    Signature mirrors the reference `read_delta` (core.py:158-235):
    `version`/`datetime` time travel, `columns` projection, DNF
    `filter` (both row filter and partition pruning, incl. the
    list-of-lists OR form), per-version schema evolution. `table_name`
    and `storage_options` are accepted for API parity (local + any
    Hadoop-configured FS; storage creds belong in Hadoop conf on
    Spark).

    ``with_row_ids=True`` (row-tracked tables only,
    delta/rowtracking.py) appends ``_row_id`` and
    ``_row_commit_version`` columns reconstructed scan-side as
    ``baseRowId + _metadata.row_index`` — stable fresh row ids with no
    shuffle and no data-side join.
    """
    if path is None:
        raise ValueError("Please Provide Delta Table path")
    if kwargs:
        import warnings

        # Reference parity note (core.py:163,220): the reference accepts
        # `arrow_options` and forwards it to pyarrow `to_batches`; Spark's
        # native parquet scan has no equivalent knob, so it (and any other
        # unknown kwarg) is ignored — loudly, not silently.
        warnings.warn(
            "read_delta: ignoring unsupported kwargs "
            f"{sorted(kwargs)} (no Spark-scan equivalent)",
            stacklevel=2,
        )
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("No active SparkSession; pass spark=...")

    if storage_options:
        from dask_deltalake_spark.delta.filesystem import apply_storage_options

        apply_storage_options(spark, storage_options)

    snap = DeltaLog(path).snapshot(version=version, datetime_string=datetime)
    check_read_protocol(
        snap.protocol,
        metadata=snap.metadata,
        # variantType: the native Spark scan decodes VARIANT; the
        # Python-source path (delta_py) does NOT claim it (pyarrow
        # cannot parse the logical type) and refuses such tables
        features={"columnMapping", "deletionVectors", "variantType"},
    )
    schema = snapshot_schema(snap)
    dnf = normalize_dnf(filter)

    # Column mapping (reader v2, delta/column_mapping.py): the scan
    # runs against PHYSICAL parquet names — hive dirs, partitionValues
    # keys, and file stats all carry physical names — and a final toDF
    # restores the logical schema. Pruning therefore needs the DNF
    # translated to physical; the row-level filter and the `columns`
    # projection stay logical (applied after the rename).
    from dask_deltalake_spark.delta.column_mapping import (
        logical_to_physical,
        scan_schema_for,
        translate_dnf,
    )
    from dask_deltalake_spark.delta.protocol import column_mapping_mode

    mode = column_mapping_mode(snap.metadata)
    scan_schema = scan_schema_for(snap.metadata, schema)
    # Derived partition pruning (delta/generated.py): predicates on
    # the SOURCE of a generated partition column imply predicates on
    # the partition column itself (e.g. ts range -> event_date range
    # for event_date = CAST(ts AS DATE)) — delta-spark's
    # OptimizeGeneratedColumn. Pruning-only: the row-level filter
    # below stays exactly the user's DNF.
    from dask_deltalake_spark.delta.generated import (
        infer_partition_predicates,
    )

    prune_src = infer_partition_predicates(dnf, snap.metadata)
    prune_dnf = (
        prune_src
        if mode == "none"
        else translate_dnf(prune_src, logical_to_physical(schema))
    )

    # Driver-side metadata pruning: partitions first (exact), then
    # per-file min/max stats (conservative).
    adds = prune_partitions(snap.add_actions, prune_dnf)
    adds = prune_by_stats(adds, prune_dnf)

    if columns:
        missing = [c for c in columns if c not in schema.fieldNames()]
        if missing:
            raise ValueError(f"Columns not in table schema: {missing}")

    # logical -> physical name map for partition-column handling in
    # the scan (identity when column mapping is off)
    _l2p_scan = logical_to_physical(schema) if mode != "none" else {}

    rt_cols: list = []
    out_field_names = scan_schema.fieldNames()
    if with_row_ids:
        from pyspark.sql.types import LongType, StructField

        from dask_deltalake_spark.delta.rowtracking import (
            materialized_column_names,
            row_id_columns,
            row_tracking_enabled,
        )

        if not row_tracking_enabled(snap.metadata):
            raise DeltaProtocolError(
                "with_row_ids=True on a table without row tracking; "
                "enable it first (delta.enableRowTracking)."
            )
        rt_cols = list(row_id_columns(spark, snap))
        # the HIDDEN materialized-id columns (written by OPTIMIZE) join
        # the scan schema so files carrying them yield values and all
        # others yield NULL for the coalesce — but never the output
        for hidden in materialized_column_names(snap.metadata):
            if hidden:
                scan_schema = StructType(
                    scan_schema.fields
                    + [StructField(hidden, LongType(), True)]
                )

    if not adds:
        empty = spark.createDataFrame([], schema)
        if rt_cols:
            empty = empty.withColumns(
                {
                    "_row_id": F.lit(None).cast("long"),
                    "_row_commit_version": F.lit(None).cast("long"),
                }
            )
        return empty.select(*columns) if columns else empty

    def _scan(file_adds: list, project: bool = True) -> DataFrame:
        # basePath + explicit user schema: partition columns (hive
        # dirs) are resolved from directory names and cast per the
        # Delta schema; files written before a schema-evolution commit
        # yield nulls for added columns — matching the reference's
        # per-version schema semantics. The final select restores the
        # Delta metaData column order (Spark's partition discovery
        # appends hive columns last regardless of the supplied schema).
        # Row-id columns are computed HERE, while _metadata is in
        # scope (they are per-file + per-position by construction).
        # Files group by their base root: a shallow clone's adds are
        # ABSOLUTE paths into the source table, whose hive partition
        # dirs anchor at the SOURCE root — one scan per root (2 in
        # practice: local + source), unioned. Same plan shape either
        # way; partition discovery stays correct per group.
        from dask_deltalake_spark.delta.logstore import resolve_spark_path
        from dask_deltalake_spark.delta.protocol import (
            file_base_root,
            resolve_file_path,
        )

        # Partition columns come from Hive directory discovery on the
        # FAST path — valid for every file whose path actually carries
        # `<col>=` segments for all partition columns (our writer
        # always does; so do delta-spark and delta-rs). The spec,
        # however, makes `add.partitionValues` authoritative and
        # allows ARBITRARY file paths, so files that are NOT
        # Hive-parseable (a foreign/converted layout) take a stamping
        # fallback: grouped by their partitionValues tuple, read with
        # the data-only schema, partition columns attached as typed
        # literals from the ACTION — the same contract the cdc-action
        # read and the Python datasource follow. Zero cost and zero
        # plan change for Hive-laid-out tables (one driver-side
        # substring check per file). Scale bound of the fallback: one
        # scan node per DISTINCT partition tuple among the non-Hive
        # files that SURVIVED pruning — driver-side partition pruning
        # ran before _scan, so a selective query touches few tuples;
        # a full-table scan of a foreign flat layout with extreme
        # partition cardinality would want a single-scan variant
        # (broadcast file->values map joined on _metadata.file_path),
        # noted as the upgrade path.
        phys_parts = [
            _l2p_scan.get(c, c) for c in snap.metadata.partition_columns
        ]

        def _hive_parseable(rel: str) -> bool:
            probe = "/" + rel
            return all(f"/{p}=" in probe for p in phys_parts)

        groups: dict = {}
        alien: dict = {}
        for a in file_adds:
            root = resolve_spark_path(file_base_root(snap.path, a))
            fpath = resolve_spark_path(resolve_file_path(snap.path, a.path))
            if not phys_parts or _hive_parseable(a.path):
                groups.setdefault(root, []).append(fpath)
            else:
                key = (root, json.dumps(
                    a.partition_values or {}, sort_keys=True
                ))
                alien.setdefault(key, []).append(fpath)
        if not project and len(groups) + len(alien) > 1:
            raise DeltaProtocolError(
                "Deletion vectors on a mixed-root (shallow-cloned) "
                "table are not supported; run optimize() to localize "
                "the files first."
            )
        parts = []
        for root, paths in sorted(groups.items()):
            d = (
                spark.read.schema(scan_schema)
                .option("basePath", root)
                .parquet(*paths)
            )
            # project PER GROUP, before any union: the _metadata
            # pseudo-column (row-id reconstruction) resolves only
            # directly above a file scan, never across a union
            if project and rt_cols:
                d = d.select(*out_field_names, *rt_cols)
            elif project and d.columns != scan_schema.fieldNames():
                d = d.select(*scan_schema.fieldNames())
            parts.append(d)
        if alien:
            part_set = set(phys_parts)
            data_only = StructType(
                [f for f in scan_schema.fields if f.name not in part_set]
            )
            by_name = {f.name: f for f in scan_schema.fields}
            for (_root, pv_json), paths in sorted(alien.items()):
                pvals = json.loads(pv_json)
                d = spark.read.schema(data_only).parquet(*paths)
                for p in phys_parts:
                    raw = pvals.get(p)
                    if raw == "__HIVE_DEFAULT_PARTITION__":
                        raw = None
                    d = d.withColumn(
                        p, F.lit(raw).cast(by_name[p].dataType)
                    )
                if project and rt_cols:
                    d = d.select(*out_field_names, *rt_cols)
                else:
                    d = d.select(*scan_schema.fieldNames())
                parts.append(d)
        d = parts[0]
        for extra in parts[1:]:
            d = d.unionByName(extra)
        return d

    # Deletion vectors (delta/dv.py): files with a DV scan separately,
    # keeping `_metadata.row_index`, and drop deleted positions with a
    # vectorized Arrow-batch predicate over broadcast bitmap bytes —
    # NO join, NO shuffle; clean files bypass the predicate entirely.
    # At 100 TB the extra cost is one numpy membership test on exactly
    # the files that have deletes.
    dv_adds = [a for a in adds if a.deletion_vector]
    clean_adds = [a for a in adds if not a.deletion_vector]
    frames = []
    if clean_adds:
        frames.append(_scan(clean_adds))
    if dv_adds:
        from dask_deltalake_spark.delta.dv import dv_keep_predicate

        raw = _scan(dv_adds, project=False)
        keep = dv_keep_predicate(spark, snap.path, dv_adds)
        # surviving rows keep their ORIGINAL positions, so row ids
        # computed from _metadata.row_index stay stable under deletes
        frames.append(
            raw.filter(
                keep(F.col("_metadata.file_path"), F.col("_metadata.row_index"))
            ).select(*out_field_names, *rt_cols)
        )
    df = frames[0]
    for extra in frames[1:]:
        df = df.unionByName(extra)
    if mode != "none":
        df = df.toDF(
            *schema.fieldNames(),
            *(["_row_id", "_row_commit_version"] if rt_cols else []),
        )
    cond = dnf_to_column(dnf)
    if cond is not None:
        df = df.filter(cond)
    if columns:
        df = df.select(
            *columns,
            *(["_row_id", "_row_commit_version"] if rt_cols else []),
        )
    return df
