"""ALTER TABLE ... DROP FEATURE — protocol feature removal.

The inverse of the feature upgrades scattered through this package
(merge-on-read DML enables ``deletionVectors``, constraints enable
``checkConstraints``, ...): remove a table feature from the protocol
so lower-capability engines can use the table again. Reference parity:
the reference (a thin delta-rs 0.6 wrapper, ``core.py:34-118``) has no
feature surface at all — it refuses feature-protocol tables outright —
so this module, like the upgrades, is beyond-reference protocol work
modeled on the Delta protocol spec's "Removing table features" section
and delta-spark's ``ALTER TABLE ... DROP FEATURE`` / ``REORG TABLE ...
APPLY (PURGE)`` pair.

Two halves:

- ``reorg_purge`` rewrites exactly the files that carry deletion
  vectors, materializing the survivors and dropping the DV
  descriptors (``REORG TABLE ... APPLY (PURGE)``). Untouched files
  are untouched: at 100 TB the rewrite cost is proportional to the
  DV'd fraction, never the table. The rewrite runs through the same
  ``_rewrite_and_commit`` tail as MERGE/DELETE (conflict-aware
  retry, object-store staging, column-mapping translation).
- ``drop_feature`` removes the feature from the protocol action once
  no data depends on it. Dropping the READER feature
  ``deletionVectors`` additionally (a) auto-purges when asked, and
  (b) applies the spec's history-protection rule: versions BELOW the
  drop still contain DV commits a post-drop reader cannot interpret,
  so the drop commit writes a checkpoint at its own version, stamps
  ``delta.requireCheckpointProtectionBeforeVersion`` and adds the
  ``checkpointProtection`` writer feature — replays of the CURRENT
  table anchor at (or above) the protected checkpoint, and metadata
  cleanup keeps the boundary checkpoint-anchored (which
  ``cleanup_metadata`` guarantees for every boundary already).

Writer-feature drops are validated structurally: a feature is
removable only when the table carries no active use of it (no
constraint keys for ``checkConstraints``, no generation expressions
for ``generatedColumns``, ...) — mirroring delta-spark's
``DELTA_FEATURE_DROP_*`` error ladder.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import SparkSession
import pyspark.sql.functions as F

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.protocol import (
    DeltaProtocolError,
    Metadata,
    Protocol,
    check_read_protocol,
    check_write_protocol,
    column_mapping_mode,
    now_ms,
)

CHECKPOINT_PROTECTION_KEY = "delta.requireCheckpointProtectionBeforeVersion"

# writer features whose "no active use" validator is a metadata
# predicate; each returns None when droppable, else the reason
def _no_constraints(meta: Metadata) -> Optional[str]:
    active = [
        k for k in meta.configuration if k.startswith("delta.constraints.")
    ]
    return (
        f"table still declares CHECK constraints {sorted(active)}; "
        "drop_constraint them first" if active else None
    )


def _no_append_only(meta: Metadata) -> Optional[str]:
    if meta.configuration.get("delta.appendOnly", "").lower() == "true":
        return "delta.appendOnly is still true; unset the property first"
    return None


def _no_cdf(meta: Metadata) -> Optional[str]:
    if (
        meta.configuration.get("delta.enableChangeDataFeed", "").lower()
        == "true"
    ):
        return (
            "delta.enableChangeDataFeed is still true; unset the "
            "property first"
        )
    return None


def _no_generated(meta: Metadata) -> Optional[str]:
    if '"delta.generationExpression"' in (meta.schema_string or ""):
        return "schema still carries generation expressions"
    return None


def _no_identity(meta: Metadata) -> Optional[str]:
    if '"delta.identity.start"' in (meta.schema_string or ""):
        return "schema still carries identity column metadata"
    return None


def _no_invariants(meta: Metadata) -> Optional[str]:
    if '"delta.invariants"' in (meta.schema_string or ""):
        return "schema still carries column invariants"
    return None


_WRITER_DROPPABLE = {
    "checkConstraints": _no_constraints,
    "appendOnly": _no_append_only,
    "changeDataFeed": _no_cdf,
    "generatedColumns": _no_generated,
    "identityColumns": _no_identity,
    "invariants": _no_invariants,
}


def reorg_purge(path: str, spark: Optional[SparkSession] = None) -> dict:
    """``REORG TABLE ... APPLY (PURGE)``: rewrite every file carrying
    a deletion vector into a clean file containing only surviving
    rows, in one commit. Files without DVs are not touched or
    rewritten — cost is O(DV'd bytes). No-op (no commit) when the
    snapshot carries no DVs. Returns the DML-style metrics dict."""
    from dask_deltalake_spark.delta.mutate import (
        _read_files,
        _rewrite_and_commit,
    )
    from dask_deltalake_spark.delta.reader import snapshot_schema
    from dask_deltalake_spark.delta.dv import dv_keep_predicate

    if spark is None:
        spark = SparkSession.active()
    log = DeltaLog(path)
    snap = log.snapshot()
    check_read_protocol(
        snap.protocol,
        snap.metadata,
        features={"columnMapping", "deletionVectors"},
    )
    check_write_protocol(
        snap.protocol,
        snap.metadata,
        features={
            "columnMapping",
            "deletionVectors",
            "generatedColumns",
            "identityColumns",
            "rowTracking",
            # changeDataFeed: the purge rewrite changes no logical
            # rows and commits dataChange=false (delta-spark REORG
            # parity) — invisible to the feed and to streams
            "changeDataFeed",
        },
    )
    touched = [a for a in snap.add_actions if a.deletion_vector]
    untouched = [a for a in snap.add_actions if not a.deletion_vector]
    if not touched:
        return {"version": snap.version, "numFilesRewritten": 0}
    schema = snapshot_schema(snap)
    raw = _read_files(spark, snap, touched, schema, with_metadata=True)
    keep = dv_keep_predicate(spark, snap.path, touched)
    survivors = raw.filter(
        keep(F.col("_metadata.file_path"), F.col("_metadata.row_index"))
    ).select(*schema.fieldNames())
    # logical names in, logical names out — _rewrite_and_commit owns
    # the physical translation on column-mapped tables
    return _rewrite_and_commit(
        spark,
        log.table_path,
        snap,
        touched,
        untouched,
        survivors,
        "REORG",
        {"applyPurge": "true"},
        # pure housekeeping: no logical row changes — dataChange=false
        # (delta-spark REORG/OPTIMIZE parity), so the commit is
        # invisible to CDF reconstruction and streaming sources
        data_change=False,
    )


def drop_feature(
    path: str,
    feature: str,
    spark: Optional[SparkSession] = None,
    purge: bool = True,
    truncate_history: bool = True,
) -> int:
    """Remove ``feature`` from the table's protocol (delta-spark's
    ``ALTER TABLE ... DROP FEATURE``). Returns the committed version.

    - ``deletionVectors``: with ``purge=True`` any remaining DVs are
      purged first (``reorg_purge``, its own commit); with False and
      DVs present the drop refuses (delta-spark's
      ``DELTA_FEATURE_DROP_WAIT_FOR_RETENTION`` shape). The feature
      is removed from BOTH feature lists, ``delta.enableDeletionVectors``
      is cleared, and with ``truncate_history=True`` the drop commit
      is checkpoint-protected: a checkpoint is written at the drop
      version and ``delta.requireCheckpointProtectionBeforeVersion``
      marks it, so post-drop readers replay from purged state and
      never decode a DV action (history below remains readable by
      DV-capable engines until metadata cleanup ages it out).
    - writer-only features (checkConstraints, appendOnly,
      changeDataFeed, generatedColumns, identityColumns, invariants):
      dropped after their no-active-use validator passes.
    - everything else refuses with a clear error (coordinatedCommits
      has its own ``disable_coordinated_commits``;
      ``checkpointProtection`` itself is permanent by design — it is
      the marker that makes earlier drops safe)."""
    from dask_deltalake_spark.delta.writer import write_commit

    log = DeltaLog(path)
    snap = log.snapshot()
    proto = snap.protocol
    # writer-feature gate: the drop commits a protocol/metadata
    # rewrite, so a table carrying OTHER writer features this engine
    # does not support must refuse here like every sibling mutation
    # (the purge step alone is gated inside reorg_purge, which a
    # DV-less drop never reaches)
    check_write_protocol(
        proto,
        metadata=snap.metadata,
        features={
            "columnMapping",
            "deletionVectors",
            "generatedColumns",
            "identityColumns",
            "rowTracking",
            "domainMetadata",
            "clustering",
            # changeDataFeed: the drop is a protocol/metadata commit
            # (no file actions); dropping changeDataFeed itself
            # additionally requires the property unset (_no_cdf)
            "changeDataFeed",
        },
    )
    # legacy version-ladder protocols carry features IMPLICITLY; the
    # drop normalizes to the feature-list form first (same implied
    # table as protocol_with_features — the spec's upgrade rule)
    rf = set(proto.reader_features or [])
    wf = set(proto.writer_features or [])
    if proto.min_writer_version < 7 and proto.writer_features is None:
        implied = {
            2: {"appendOnly", "invariants"},
            3: {"checkConstraints"},
            4: {"changeDataFeed", "generatedColumns"},
            5: {"columnMapping"},
            6: {"identityColumns"},
        }
        for v_, feats in implied.items():
            if proto.min_writer_version >= v_:
                wf |= feats
    if proto.min_reader_version == 2 and proto.reader_features is None:
        rf |= {"columnMapping"}
    if feature not in rf | wf:
        raise DeltaProtocolError(
            f"DROP FEATURE {feature!r}: the table's protocol does not "
            f"carry it (readerFeatures={sorted(rf)}, "
            f"writerFeatures={sorted(wf)})."
        )
    config = dict(snap.metadata.configuration)

    if feature == "deletionVectors":
        dv_adds = [a for a in snap.add_actions if a.deletion_vector]
        if dv_adds and not purge:
            raise DeltaProtocolError(
                f"DROP FEATURE deletionVectors: {len(dv_adds)} data "
                "files still carry deletion vectors; run reorg_purge "
                "(or pass purge=True) first."
            )
        if dv_adds:
            reorg_purge(path, spark=spark)
            snap = log.snapshot()
        config.pop("delta.enableDeletionVectors", None)
    elif feature == "coordinatedCommits":
        raise DeltaProtocolError(
            "DROP FEATURE coordinatedCommits: use "
            "disable_coordinated_commits(), which backfills the staged "
            "tail before handing arbitration back to the filesystem."
        )
    elif feature == "checkpointProtection":
        raise DeltaProtocolError(
            "DROP FEATURE checkpointProtection: the protection marker "
            "is what keeps earlier feature drops sound; it cannot be "
            "removed."
        )
    elif feature in _WRITER_DROPPABLE and feature not in rf:
        reason = _WRITER_DROPPABLE[feature](snap.metadata)
        if reason:
            raise DeltaProtocolError(
                f"DROP FEATURE {feature}: {reason}."
            )
    else:
        raise DeltaProtocolError(
            f"DROP FEATURE {feature!r}: dropping this feature is not "
            "supported (reader features other than deletionVectors "
            "would leave current data files uninterpretable)."
        )

    new_rf = rf - {feature}
    new_wf = wf - {feature}
    protect = truncate_history and feature in rf
    if protect:
        new_wf.add("checkpointProtection")
        config[CHECKPOINT_PROTECTION_KEY] = str(snap.version + 1)
    # reader version: 3 iff a feature list remains, else the legacy
    # version the surviving capabilities imply
    if new_rf:
        reader_v = 3
    elif column_mapping_mode(snap.metadata) != "none":
        reader_v = 2
    else:
        reader_v = 1
    actions = [
        {
            "commitInfo": {
                "timestamp": now_ms(),
                "operation": "DROP FEATURE",
                "operationParameters": {
                    "feature": feature,
                    "truncateHistory": json.dumps(bool(protect)),
                },
                "readVersion": snap.version,
                "engineInfo": "dask_deltalake_spark/0.1.0",
            }
        },
        Protocol(
            min_reader_version=reader_v,
            min_writer_version=7,
            reader_features=sorted(new_rf) if reader_v >= 3 else None,
            writer_features=sorted(new_wf),
        ).to_json(),
        Metadata(
            id=snap.metadata.id,
            schema_string=snap.metadata.schema_string,
            partition_columns=snap.metadata.partition_columns,
            configuration=config,
            name=snap.metadata.name,
            description=snap.metadata.description,
            created_time=snap.metadata.created_time,
        ).to_json(),
    ]
    version = snap.version + 1
    write_commit(log.table_path, version, actions)
    if protect:
        from dask_deltalake_spark.delta.maintenance import create_checkpoint

        create_checkpoint(log.table_path, version=version)
    return version
