"""Shallow clone: a zero-copy metadata fork of a Delta table.

``shallow_clone(source, target)`` commits a brand-new table whose
add actions are ABSOLUTE paths into the source table's data files
(the spec explicitly allows absolute add paths — this is delta-spark's
``CREATE TABLE ... SHALLOW CLONE``). No data moves: cloning a 100 TB
table is one O(#files) metadata commit. The clone then evolves
independently — appends land locally, copy-on-write DML and OPTIMIZE
materialize touched rows into local files (mixed-root scans group by
base root, reader.py/mutate.py), and the clone's vacuum can never
touch source files (it only walks the clone's own directory).

Caveats carried as refusals, not silent corruption: a source with
live DELETION VECTORS is refused (its vector files are source-relative
and a clone-side MoR write could not maintain them), and vacuuming the
SOURCE can break clones that still reference un-compacted source files
— same contract as delta-spark shallow clones.

The reference has nothing comparable (one table per read path,
core.py:158-235); this is Spark-side extension surface.
"""

from __future__ import annotations

import json
import uuid
from typing import Optional

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.protocol import (
    DeltaProtocolError,
    Metadata,
    now_ms,
    resolve_file_path,
)
from dask_deltalake_spark.delta.writer import write_commit


def shallow_clone(
    source_path: str,
    target_path: str,
    version: Optional[int] = None,
) -> int:
    """Create ``target_path`` as a shallow clone of ``source_path``
    (optionally at a past ``version`` — clone + time travel in one
    step). Returns the clone's committed version (always 0)."""
    src_log = DeltaLog(source_path)
    snap = src_log.snapshot(version=version)
    tgt_log = DeltaLog(target_path)
    if tgt_log.exists():
        raise ValueError(f"Target already exists: {target_path}")
    dv_files = [a.path for a in snap.add_actions if a.deletion_vector]
    if dv_files:
        raise DeltaProtocolError(
            "shallow_clone: source has live deletion vectors "
            f"(e.g. on {dv_files[0]!r}); purge them first "
            "(optimize() on the source) — a clone could not maintain "
            "source-relative vector files."
        )

    ts = now_ms()
    meta = snap.metadata
    actions = [
        {
            "commitInfo": {
                "timestamp": ts,
                "operation": "CLONE",
                "operationParameters": {
                    "source": src_log.table_path,
                    "sourceVersion": str(snap.version),
                },
                "operationMetrics": {
                    "sourceNumOfFiles": str(len(snap.files)),
                    "numCopiedFiles": "0",
                },
                "engineInfo": "dask_deltalake_spark/0.1.0",
            }
        },
        snap.protocol.to_json(),
        # fresh table id — a clone is a NEW table (delta-spark
        # semantics); schema/partitioning/configuration carry over
        Metadata(
            id=str(uuid.uuid4()),
            schema_string=meta.schema_string,
            partition_columns=meta.partition_columns,
            configuration=dict(meta.configuration),
            name=meta.name,
            description=meta.description,
            created_time=ts,
        ).to_json(),
    ]
    from urllib.parse import quote

    for a in snap.add_actions:
        d = a.to_json()["add"]
        # absolutize against the SOURCE root (an already-absolute path
        # — a clone of a clone — resolves through unchanged); the log
        # carries URL-encoded paths, '/' kept
        d["path"] = quote(resolve_file_path(src_log.table_path, a.path))
        actions.append({"add": d})
    # row-tracking domain metadata (the id high water mark) carries
    # over so a tracked clone keeps allocating non-overlapping ranges
    for domain, conf in snap.domain_metadata.items():
        actions.append(
            {
                "domainMetadata": {
                    "domain": domain,
                    "configuration": conf,
                    "removed": False,
                }
            }
        )
    write_commit(tgt_log.table_path, 0, actions)
    return 0
