"""CONVERT TO DELTA — in-place conversion of a parquet directory.

delta-spark's ``CONVERT TO DELTA parquet.`/path/``` (and delta-rs's
``convert_to_deltalake``): an existing plain-parquet dataset — flat or
hive-partitioned — becomes a Delta table by writing a v0 commit that
REFERENCES the files where they already sit. Zero bytes of data move:
at 100 TB the conversion cost is one file listing plus (optionally)
one distributed stats pass, never a rewrite. The reference
(hayesgb/dask_deltalake, core.py) has no conversion surface.

Layout discovered, not trusted: partition columns come from the
``col=value`` directory segments (names validated against every file's
path), partition VALUES are parsed per file exactly as the protocol
stores them (URL-decoded strings, ``__HIVE_DEFAULT_PARTITION__`` →
null), and the table schema is Spark's own unified parquet+partition
schema so later reads agree with what a plain ``spark.read.parquet``
saw before the conversion.

Statistics: ``collect_stats=True`` (default) runs ONE distributed
Spark job — executors read their files Arrow-batched and fold
``StatsAccumulator``-compatible {numRecords, minValues, maxValues,
nullCount} JSON per file — so data skipping works from commit v0
with byte-compatible stat shapes (the same delta-spark trade: stats
at convert time cost a scan). ``collect_stats=False`` is the
listing-only O(#files) path; adds legally carry no stats and skipping
starts with the first post-convert OPTIMIZE/rewrite.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Optional
from urllib.parse import unquote

from pyspark.sql import SparkSession

from dask_deltalake_spark.delta.protocol import (
    LOG_DIR,
    AddAction,
    Metadata,
    Protocol,
    now_ms,
)

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class ConvertError(Exception):
    pass


def _discover_files(store, root: str) -> list[tuple]:
    """``(relative path, size, mtime)`` of every data parquet file
    under ``root``, discovered THROUGH the LogStore seam in one
    listing pass (walk_files_stats: the listing response already
    carries size/mtime, so a 100k-file lake costs one LIST, not 200k
    HEADs). Hidden/underscore segments are skipped, so _delta_log and
    temp staging are excluded. Same d40 seam pattern the DML paths
    use — conversion works on S3/GCS-class stores, not just local
    disk."""
    out = []
    for rel, size, mtime in store.walk_files_stats(root):
        rel = rel.replace(os.sep, "/")
        segs = rel.split("/")
        if any(s.startswith((".", "_")) for s in segs):
            continue
        if not segs[-1].endswith(".parquet"):
            continue
        out.append((rel, size, mtime))
    return sorted(out)


def _partition_values(relpath: str, cols: list[str]) -> dict:
    """Parse ``col=value`` segments of one file's relative path into
    protocol partitionValues; validates the layout is uniform."""
    segs = relpath.split("/")[:-1]
    kv = []
    for s in segs:
        if "=" not in s:
            raise ConvertError(
                f"non-hive directory segment {s!r} in {relpath!r}; "
                "CONVERT requires a flat or uniformly hive-partitioned "
                "layout"
            )
        k, _, v = s.partition("=")
        kv.append((k, None if v == _HIVE_NULL else unquote(v)))
    if [k for k, _ in kv] != cols:
        raise ConvertError(
            f"file {relpath!r} has partition segments "
            f"{[k for k, _ in kv]} but the dataset's layout is {cols}"
        )
    return dict(kv)


def convert_to_delta(
    path: str,
    spark: Optional[SparkSession] = None,
    collect_stats: bool = True,
    name: str = "",
    description: str = "",
    configuration: Optional[dict] = None,
) -> int:
    """Convert the parquet directory at ``path`` into a Delta table
    in place (commit v0 referencing the existing files). Returns the
    committed version (0). Refuses when a ``_delta_log`` already
    exists, when the directory holds no parquet files, or when the
    layout mixes hive and non-hive segments."""
    from dask_deltalake_spark.delta.logstore import (
        resolve_spark_path,
        store_for,
    )
    from dask_deltalake_spark.delta.writer import write_commit

    if spark is None:
        spark = SparkSession.active()
    table_path = str(path).rstrip("/")
    store = store_for(table_path)
    local_root = store.local_path(table_path)
    if store.is_dir(os.path.join(table_path, LOG_DIR)):
        raise ConvertError(
            f"{table_path} already has a _delta_log; refusing to "
            "re-convert (idempotence: the first conversion won)."
        )
    listed = _discover_files(store, table_path)
    if not listed:
        raise ConvertError(f"no parquet files under {table_path}")
    files = [rel for rel, _sz, _mt in listed]
    meta = {rel: (sz, mt) for rel, sz, mt in listed}
    # partition columns from the first file's directory chain; every
    # other file is validated against them in _partition_values
    part_cols = [
        s.partition("=")[0]
        for s in files[0].split("/")[:-1]
        if "=" in s
    ]
    parts = {f: _partition_values(f, part_cols) for f in files}
    # Spark's own unified schema (data + discovered partition types),
    # so post-convert reads see exactly the pre-convert frame
    schema = (
        spark.read.option("basePath", resolve_spark_path(table_path))
        .parquet(resolve_spark_path(table_path))
        .schema
    )
    stats: dict[str, Optional[str]] = {f: None for f in files}
    if collect_stats:
        from dask_deltalake_spark.delta.protocol import stats_column_spec

        # the requested table configuration governs convert-time stats
        # exactly like write-time stats; the INFERRED schema is passed
        # so a typo in dataSkippingStatsColumns warns here too instead
        # of silently collecting nothing (a fresh conversion's names
        # are physical by construction — the translation is identity)
        stats = _collect_stats(
            spark,
            store,
            table_path,
            local_root,
            files,
            part_cols,
            stats_spec=stats_column_spec(configuration, schema=schema),
        )
    ts = now_ms()
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": ts,
                "operation": "CONVERT",
                "operationParameters": {
                    "numFiles": str(len(files)),
                    "partitionedBy": json.dumps(part_cols),
                    "collectStats": json.dumps(bool(collect_stats)),
                },
                "engineInfo": "dask_deltalake_spark/0.1.0",
            }
        },
        Protocol(min_reader_version=1, min_writer_version=2).to_json(),
        Metadata(
            id=uuid.uuid4().hex,
            schema_string=json.dumps(schema.jsonValue()),
            partition_columns=part_cols,
            configuration=dict(configuration or {}),
            name=name,
            description=description,
            created_time=ts,
        ).to_json(),
    ]
    for f in files:
        # size/mtime came with the discovery listing — no per-file
        # metadata round-trips here
        sz, mt = meta[f]
        actions.append(
            AddAction(
                path=f,
                size=int(sz),
                partition_values=parts[f],
                modification_time=int(mt * 1000),
                data_change=True,
                stats=stats.get(f),
            ).to_json()
        )
    write_commit(table_path, 0, actions)
    return 0


def _collect_stats(
    spark: SparkSession,
    store,
    table_path: str,
    local_root: Optional[str],
    files: list[str],
    part_cols: list,
    stats_spec: tuple = (32, None),
) -> dict:
    """One distributed pass folding per-file protocol stats JSON —
    shared with COMPUTE STATISTICS via protocol.fold_file_stats, so
    convert-time and recomputed stats can never diverge. Locally
    mapped stores hand pyarrow plain paths; object stores ship the
    (picklable) store to executors so each file opens through
    ``store.open_input`` — the seam route, no local mapping needed.
    The store CLASS must be importable on executors (true for any
    installed module; a driver-only class can still convert with
    ``collect_stats=False``)."""
    from dask_deltalake_spark.delta.protocol import fold_file_stats

    if local_root is not None:
        return fold_file_stats(
            spark,
            [(f, os.path.join(local_root, f)) for f in files],
            part_cols,
            stats_spec=stats_spec,
        )
    return fold_file_stats(
        spark,
        [(f, os.path.join(table_path, f)) for f in files],
        part_cols,
        store=store,
        stats_spec=stats_spec,
    )
