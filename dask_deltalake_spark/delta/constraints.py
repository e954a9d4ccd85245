"""CHECK constraints (writer protocol v3 / table feature
``checkConstraints``) — delta-spark's ``ALTER TABLE ADD CONSTRAINT``
per the public spec: a constraint is a SQL boolean expression stored
in the table configuration as ``delta.constraints.<name>`` that every
writer must verify against the rows it is about to commit.

This engine ENFORCES constraints on every write path (appends,
overwrites, copy-on-write rewrites, merge-on-read update images): the
rows headed for files are checked with one aggregate
(``count(violations)``) before any commit — a violating write fails
atomically with an example row, and nothing lands in the log. Rows a
write does not touch are never re-validated (same contract as
delta-spark; ``add_constraint`` itself validates the full existing
table once, so the invariant holds inductively).

Scale: validation is one extra filter+count over data that is already
in memory for the write — map-side only, no shuffle, and it shares
the scan Catalyst plans for the write itself at whole-stage-codegen
speed. At 100 TB the cost is a second pass over the WRITTEN slice,
never the table.
"""

from __future__ import annotations

import json
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.protocol import (
    Metadata,
    Protocol,
    now_ms,
)

CONSTRAINT_PREFIX = "delta.constraints."


class ConstraintViolationError(Exception):
    """A write contained rows violating a CHECK constraint."""


def table_constraints(metadata) -> dict:
    """{name: sql_expression} from the table configuration."""
    return {
        k[len(CONSTRAINT_PREFIX):]: v
        for k, v in (metadata.configuration or {}).items()
        if k.startswith(CONSTRAINT_PREFIX)
    }


def enforce_constraints(df: DataFrame, metadata, operation: str) -> None:
    """Verify every CHECK constraint over the rows about to be
    written; raise with a sample violating row otherwise. NULL results
    count as violations (the spec requires the expression to evaluate
    TRUE)."""
    for name, expr_sql in table_constraints(metadata).items():
        expr = F.expr(expr_sql)
        violations = df.filter(~F.coalesce(expr, F.lit(False)))
        sample = violations.limit(1).collect()
        if sample:
            raise ConstraintViolationError(
                f"{operation} violates CHECK constraint {name!r} "
                f"({expr_sql}); example row: {sample[0].asDict()}"
            )


def add_constraint(
    path: str, name: str, expression: str, spark: Optional[SparkSession] = None
) -> int:
    """ALTER TABLE ADD CONSTRAINT: validates the expression against
    every EXISTING row first (one filter+count scan), then commits the
    configuration entry — raising the writer protocol to v3 (or
    adding ``checkConstraints`` to a v7 feature list) so that any
    compliant writer must enforce it from now on."""
    from dask_deltalake_spark.delta.reader import read_delta
    from dask_deltalake_spark.delta.writer import write_commit

    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("No active SparkSession; pass spark=...")
    name = name.strip().lower()
    if not name.isidentifier():
        raise ValueError(f"Invalid constraint name {name!r}")
    log = DeltaLog(path)
    snap = log.snapshot()
    key = CONSTRAINT_PREFIX + name
    if key in snap.metadata.configuration:
        raise ValueError(f"Constraint {name!r} already exists")
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
        features=METADATA_ONLY_FEATURES | {"checkConstraints"},
    )
    existing = read_delta(log.table_path, spark=spark)
    bad = existing.filter(
        ~F.coalesce(F.expr(expression), F.lit(False))
    ).limit(1).collect()
    if bad:
        raise ConstraintViolationError(
            f"Cannot add CHECK constraint {name!r} ({expression}): "
            f"existing row violates it: {bad[0].asDict()}"
        )

    meta = snap.metadata
    config = dict(meta.configuration)
    config[key] = expression
    actions: list = [
        {
            "commitInfo": {
                "timestamp": now_ms(),
                "operation": "ADD CONSTRAINT",
                "operationParameters": {"name": name, "expr": expression},
                "readVersion": snap.version,
                "engineInfo": "dask_deltalake_spark/0.1.0",
            }
        }
    ]
    proto = snap.protocol
    if proto.min_writer_version == 7:
        feats = list(proto.writer_features or [])
        if "checkConstraints" not in feats:
            actions.append(
                Protocol(
                    min_reader_version=proto.min_reader_version,
                    min_writer_version=7,
                    reader_features=proto.reader_features,
                    writer_features=feats + ["checkConstraints"],
                ).to_json()
            )
    elif proto.min_writer_version < 3:
        actions.append(
            Protocol(
                min_reader_version=proto.min_reader_version,
                min_writer_version=3,
            ).to_json()
        )
    # writer v3..v5 already imply checkConstraints capability
    actions.append(
        Metadata(
            id=meta.id,
            schema_string=meta.schema_string,
            partition_columns=meta.partition_columns,
            configuration=config,
            name=meta.name,
            description=meta.description,
            created_time=meta.created_time,
        ).to_json()
    )
    write_commit(log.table_path, snap.version + 1, actions)
    return snap.version + 1


def drop_constraint(
    path: str, name: str, spark: Optional[SparkSession] = None
) -> int:
    """ALTER TABLE DROP CONSTRAINT (metadata-only; the protocol stays
    elevated, matching delta-spark)."""
    from dask_deltalake_spark.delta.writer import write_commit

    log = DeltaLog(path)
    snap = log.snapshot()
    key = CONSTRAINT_PREFIX + name.strip().lower()
    if key not in snap.metadata.configuration:
        raise ValueError(f"Constraint {name!r} does not exist")
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
        features=METADATA_ONLY_FEATURES | {"checkConstraints"},
    )
    meta = snap.metadata
    config = {k: v for k, v in meta.configuration.items() if k != key}
    actions = [
        {
            "commitInfo": {
                "timestamp": now_ms(),
                "operation": "DROP CONSTRAINT",
                "operationParameters": {"name": name},
                "readVersion": snap.version,
                "engineInfo": "dask_deltalake_spark/0.1.0",
            }
        },
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
