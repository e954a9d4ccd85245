"""In-commit timestamps (writer feature ``inCommitTimestamp``).

A monotonic commit clock stored INSIDE each commit's commitInfo
(``inCommitTimestamp = max(wall clock, prev + 1)``) instead of
trusting log-file modification times — which object stores rewrite on
copy/restore/replication, silently re-dating history. With the
feature on, datetime time travel and history report the in-commit
clock; commits from before enablement keep resolving by mtime (the
spec's mixed-history rule, tracked by the enablement version/time
properties). Stamping happens centrally in ``write_commit``
(writer.py:_stamp_in_commit_timestamp), so every write path maintains
the feature. The reference has no commit clock at all — its datetime
travel trusts mtimes (reference tests reset fixture mtimes to make
that deterministic, tests/test_core.py:173-199)."""

from __future__ import annotations

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.protocol import (
    Metadata,
    now_ms,
)
from dask_deltalake_spark.delta.writer import write_commit

ICT_ENABLE_KEY = "delta.enableInCommitTimestamps"
ICT_ENABLEMENT_VERSION_KEY = "delta.inCommitTimestampEnablementVersion"
ICT_ENABLEMENT_TS_KEY = "delta.inCommitTimestampEnablementTimestamp"


def enable_in_commit_timestamps(path: str) -> int:
    """Enable the in-commit clock in one metadata-only commit: the
    protocol upgrades to writer v7 (existing features preserved), the
    property + enablement version/timestamp land in the table config,
    and — because the metaData already declares the property — the
    enable commit itself is the first stamped one. Idempotent."""
    log = DeltaLog(path)
    snap = log.snapshot()
    if str(
        snap.metadata.configuration.get(ICT_ENABLE_KEY, "")
    ).lower() == "true":
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
        features=METADATA_ONLY_FEATURES | {"inCommitTimestamp"},
    )

    from dask_deltalake_spark.delta.protocol import protocol_with_features

    new_proto = protocol_with_features(
        snap.protocol, writer_features=("inCommitTimestamp",)
    )

    ts = now_ms()
    meta = snap.metadata
    config = dict(meta.configuration)
    config[ICT_ENABLE_KEY] = "true"
    config[ICT_ENABLEMENT_VERSION_KEY] = str(snap.version + 1)
    config[ICT_ENABLEMENT_TS_KEY] = str(ts)
    actions = [
        {
            "commitInfo": {
                "timestamp": ts,
                "operation": "UPGRADE IN-COMMIT TIMESTAMPS",
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
    ]
    write_commit(log.table_path, snap.version + 1, actions)
    return snap.version + 1
