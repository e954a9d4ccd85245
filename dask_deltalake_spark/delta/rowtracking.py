"""Row tracking (Delta writer feature ``rowTracking`` +
``domainMetadata``): stable fresh row IDs for every row.

Protocol shape (public Delta spec):
- table property ``delta.enableRowTracking=true`` + writer v7 with
  ``writerFeatures`` ⊇ {rowTracking, domainMetadata};
- every add action carries ``baseRowId`` (row *i* of the file has
  fresh row id ``baseRowId + i``) and ``defaultRowCommitVersion``;
- the allocation high water mark lives in a ``domainMetadata`` action
  for domain ``delta.rowTracking`` and advances IN THE SAME COMMIT as
  the adds, so two sequential commits can never hand out overlapping
  id ranges and crash recovery never reuses one.

Row tracking is a WRITER feature — plain reads are unaffected; reads
that want the ids opt in (``read_delta(..., with_row_ids=True)``) and
reconstruct them scan-side as ``baseRowId + _metadata.row_index``
with a broadcast per-file map: no shuffle, no join against data, cost
O(#files) driver-side exactly like the rest of the planning path.
Rewrite paths that cannot preserve ids (DML, OPTIMIZE) do not declare
the feature and are refused by the writer-protocol gate rather than
silently re-assigning — the reference
(dask_deltalake) has no row-identity concept at all (core.py reads
are positionless), so this whole module is Spark-side extension
surface.
"""

from __future__ import annotations

import json
from typing import Optional

from dask_deltalake_spark.delta.log import DeltaLog, Snapshot
from dask_deltalake_spark.delta.protocol import (
    DeltaProtocolError,
    Metadata,
    now_ms,
)
from dask_deltalake_spark.delta.writer import write_commit

ROW_TRACKING_DOMAIN = "delta.rowTracking"
ENABLE_ROW_TRACKING_KEY = "delta.enableRowTracking"
ROW_TRACKING_FEATURES = ("rowTracking", "domainMetadata")
# hidden-column names (per-table uuid suffix, so a user column can
# never collide): rewrites MATERIALIZE each row's id/commit-version
# into these parquet columns, which readers prefer over
# baseRowId + row_index — that is how ids stay stable through
# OPTIMIZE (the spec's materialized-row-id mechanism)
MATERIALIZED_RID_KEY = "delta.rowTracking.materializedRowIdColumnName"
MATERIALIZED_RCV_KEY = (
    "delta.rowTracking.materializedRowCommitVersionColumnName"
)


def materialized_column_names(metadata):
    """(row-id column, commit-version column) or (None, None)."""
    conf = metadata.configuration or {}
    return conf.get(MATERIALIZED_RID_KEY), conf.get(MATERIALIZED_RCV_KEY)


def row_tracking_enabled(metadata) -> bool:
    return (
        str(
            (metadata.configuration or {}).get(ENABLE_ROW_TRACKING_KEY, "")
        ).lower()
        == "true"
    )


def row_id_high_water_mark(snap: Snapshot) -> int:
    """Highest assigned fresh row id, -1 when none assigned yet."""
    conf = snap.domain_metadata.get(ROW_TRACKING_DOMAIN)
    if not conf:
        return -1
    return int(json.loads(conf).get("rowIdHighWaterMark", -1))


def hwm_domain_action(high_water_mark: int) -> dict:
    return {
        "domainMetadata": {
            "domain": ROW_TRACKING_DOMAIN,
            "configuration": json.dumps(
                {"rowIdHighWaterMark": int(high_water_mark)}
            ),
            "removed": False,
        }
    }


def _num_records(add) -> int:
    if not add.stats:
        raise DeltaProtocolError(
            f"enable_row_tracking: file {add.path!r} has no stats "
            "(numRecords needed to allocate its row-id range)."
        )
    return int(json.loads(add.stats)["numRecords"])


def enable_row_tracking(path: str) -> int:
    """Enable row tracking on an existing table in ONE metadata-only
    commit: the protocol upgrades to writer v7 (+features, existing
    features preserved), every live file is re-committed
    (dataChange=false) with its assigned ``baseRowId`` range, and the
    high water mark lands as domain metadata. Existing rows get ids in
    snapshot file order — O(#files) driver work, no data rewritten.
    Idempotent."""
    log = DeltaLog(path)
    snap = log.snapshot()
    if row_tracking_enabled(snap.metadata):
        return snap.version  # idempotent
    from dask_deltalake_spark.delta.protocol import (
        METADATA_ONLY_FEATURES,
        check_write_protocol,
    )

    # writer gate (the enable_change_data_feed class, r16): a
    # metadata-only upgrade must still honor the table's existing
    # writer obligations — an unknown foreign feature refuses
    check_write_protocol(
        snap.protocol,
        metadata=snap.metadata,
        features=METADATA_ONLY_FEATURES | {"rowTracking"},
    )

    from dask_deltalake_spark.delta.protocol import protocol_with_features

    new_proto = protocol_with_features(
        snap.protocol, writer_features=ROW_TRACKING_FEATURES
    )

    hwm = -1
    add_actions = []
    for a in snap.add_actions:
        n = _num_records(a)
        a.base_row_id = hwm + 1
        a.default_row_commit_version = snap.version + 1
        hwm += n
        a.data_change = False
        add_actions.append(a.to_json())

    import uuid as _uuid

    meta = snap.metadata
    config = dict(meta.configuration)
    config[ENABLE_ROW_TRACKING_KEY] = "true"
    tag = _uuid.uuid4().hex[:8]
    config.setdefault(MATERIALIZED_RID_KEY, f"_row_id_col_{tag}")
    config.setdefault(
        MATERIALIZED_RCV_KEY, f"_row_commit_version_col_{tag}"
    )
    actions = [
        {
            "commitInfo": {
                "timestamp": now_ms(),
                "operation": "UPGRADE ROW TRACKING",
                "operationParameters": {},
                "readVersion": snap.version,
                "engineInfo": "dask_deltalake_spark/0.1.0",
            }
        },
        new_proto.to_json(),
        Metadata(
            id=meta.id,
            schema_string=meta.schema_string,
            partition_columns=meta.partition_columns,
            configuration=config,
            name=meta.name,
            description=meta.description,
            created_time=meta.created_time,
        ).to_json(),
        *add_actions,
        hwm_domain_action(hwm),
    ]
    write_commit(log.table_path, snap.version + 1, actions)
    return snap.version + 1


def assign_base_row_ids(
    adds: list, num_records: list[int], hwm: int, commit_version: int
) -> dict:
    """Stamp ``base_row_id``/``default_row_commit_version`` onto fresh
    adds (in commit order, continuing past ``hwm``) and return the
    domainMetadata action advancing the high water mark. Called by the
    committing writer with the row counts it already harvested from
    file stats."""
    for a, n in zip(adds, num_records):
        a.base_row_id = hwm + 1
        a.default_row_commit_version = commit_version
        hwm += int(n)
    return hwm_domain_action(hwm)


def row_id_columns(spark, snap: Snapshot):
    """(file-keyed expressions) ``_row_id`` and ``_row_commit_version``
    for a scan of this snapshot: broadcast map of absolute file path →
    (baseRowId, defaultRowCommitVersion), applied as
    ``baseRowId + _metadata.row_index``. Files that carry MATERIALIZED
    id columns (written by OPTIMIZE to preserve ids through the
    rewrite) take precedence via coalesce — the fresh-id expression is
    only the fallback for files whose rows still own their original
    ids. Metadata-scale (O(#files) literals); for multi-million-file
    tables, register the map as a broadcast-joined frame instead —
    semantics identical."""
    import pyspark.sql.functions as F

    missing = [
        a.path for a in snap.add_actions if a.base_row_id is None
    ]
    if missing:
        raise DeltaProtocolError(
            "Row-tracked table has files without baseRowId "
            f"(e.g. {missing[0]!r}); the table is corrupt or was "
            "written by a non-compliant writer."
        )
    from dask_deltalake_spark.delta.protocol import resolve_file_path

    base_pairs = []
    ver_pairs = []
    for a in snap.add_actions:
        key = F.lit(resolve_file_path(snap.path, a.path))
        base_pairs += [key, F.lit(int(a.base_row_id))]
        ver_pairs += [
            key,
            F.lit(int(a.default_row_commit_version or 0)),
        ]
    base_map = F.create_map(*base_pairs)
    ver_map = F.create_map(*ver_pairs)
    # _metadata.file_path is a URI (file:///x); normalize to the plain
    # absolute path the add actions are keyed by
    norm = F.regexp_replace(
        F.regexp_replace(F.col("_metadata.file_path"), "^file:", ""),
        "^/+",
        "/",
    )
    row_id = F.element_at(base_map, norm) + F.col("_metadata.row_index")
    row_ver = F.element_at(ver_map, norm)
    rid_col, rcv_col = materialized_column_names(snap.metadata)
    if rid_col:
        row_id = F.coalesce(F.col(rid_col), row_id)
    if rcv_col:
        row_ver = F.coalesce(F.col(rcv_col), row_ver)
    return row_id.alias("_row_id"), row_ver.alias("_row_commit_version")
