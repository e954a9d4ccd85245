"""Column mapping (Delta reader v2 / writer v5) — logical↔physical
column-name indirection per the public Delta protocol spec
(PROTOCOL.md §column-mapping). The reference connector has no support
at all for mapped tables (it would read renamed columns as nulls);
delta-spark and delta-rs both implement exactly this translation.

With mapping enabled, the table's LOGICAL schema (what users see) is
decoupled from the PHYSICAL parquet column names via per-field
metadata:

    {"name": "account_balance", "type": "double", "metadata": {
        "delta.columnMapping.id": 6,
        "delta.columnMapping.physicalName": "c_acctbal"}}

which is what makes RENAME COLUMN a metadata-only commit — no data
rewrite at any scale. Hive partition directories, ``partitionValues``
keys, and per-file stats all use PHYSICAL names; ``metaData.
partitionColumns`` and the schemaString field names are LOGICAL.

Scale: the upgrade and every rename are single metadata commits
(O(schema) JSON); reads add only a driver-side name translation and a
final ``toDF`` projection — the executor scan plan is unchanged.

``mode='name'`` is fully supported. ``mode='id'`` tables are readable
when their fields also carry ``physicalName`` (delta-spark always
writes both); pure field-id resolution without physical names is
refused by the read path rather than guessed.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, MapType, StructField, StructType

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.protocol import (
    COLUMN_ID_KEY,
    COLUMN_MAPPING_MAX_ID_KEY,
    COLUMN_MAPPING_MODE_KEY,
    PHYSICAL_NAME_KEY,
    Metadata,
    Protocol,
    column_mapping_mode,
    now_ms,
)
from dask_deltalake_spark.delta.writer import write_commit


def _physical_name(field: StructField) -> str:
    return (field.metadata or {}).get(PHYSICAL_NAME_KEY, field.name)


def _map_type(dt):
    """Recurse into nested struct fields (arrays/maps of structs)."""
    if isinstance(dt, StructType):
        return StructType([_map_field(f) for f in dt.fields])
    if isinstance(dt, ArrayType):
        return ArrayType(_map_type(dt.elementType), dt.containsNull)
    if isinstance(dt, MapType):
        return MapType(
            _map_type(dt.keyType), _map_type(dt.valueType), dt.valueContainsNull
        )
    return dt


def _map_field(field: StructField) -> StructField:
    return StructField(
        _physical_name(field), _map_type(field.dataType), field.nullable
    )


def physical_schema(schema: StructType) -> StructType:
    """Logical Spark schema → schema with physical parquet names
    (recursively; field metadata is dropped — the physical schema is
    only used to drive the file scan)."""
    return StructType([_map_field(f) for f in schema.fields])


def logical_to_physical(schema: StructType) -> dict:
    """Top-level logical → physical name map."""
    return {f.name: _physical_name(f) for f in schema.fields}


def _any_field_missing_physical(dt) -> bool:
    """True if any struct field at ANY nesting depth lacks
    physicalName metadata — the guard must recurse exactly as far as
    _map_type maps, or an id-mode table whose NESTED struct field
    lacks the metadata passes a top-level-only guard and is silently
    scanned under its logical name, reading nulls (ADVICE r12)."""
    if isinstance(dt, StructType):
        return any(
            PHYSICAL_NAME_KEY not in (f.metadata or {})
            or _any_field_missing_physical(f.dataType)
            for f in dt.fields
        )
    if isinstance(dt, ArrayType):
        return _any_field_missing_physical(dt.elementType)
    if isinstance(dt, MapType):
        return _any_field_missing_physical(
            dt.keyType
        ) or _any_field_missing_physical(dt.valueType)
    return False


def scan_schema_for(metadata, schema: StructType) -> StructType:
    """The schema a parquet FILE SCAN of this table must use: the
    logical schema when column mapping is off, the physical-name
    schema otherwise — with the shared id-mode guard (pure
    parquet-field-id resolution, i.e. id mode without physicalName
    metadata at ANY nesting depth, is unsupported — the guard
    recurses like _map_type does, ADVICE r12). Single-sourced for
    every scan path (reader.py, cdc.py — review r12: the guard +
    selection were duplicated and could drift)."""
    from dask_deltalake_spark.delta.protocol import DeltaProtocolError

    mode = column_mapping_mode(metadata)
    if mode == "id" and _any_field_missing_physical(schema):
        raise DeltaProtocolError(
            "id-mode column mapping without physicalName metadata "
            "(pure parquet-field-id resolution) is not supported."
        )
    return schema if mode == "none" else physical_schema(schema)


def translate_dnf(dnf: list, mapping: dict) -> list:
    """Rewrite DNF filter column names logical → physical so partition
    pruning (physical ``partitionValues`` keys) and stats skipping
    (physical stats keys) see the names the log actually carries."""
    return [
        [(mapping.get(col, col), op, val) for col, op, val in conj]
        for conj in dnf
    ]


def _with_field_meta(field: StructField, col_id: int) -> dict:
    """schemaString JSON for one field with mapping metadata attached
    (physicalName = the CURRENT name: the delta-spark upgrade contract,
    existing parquet files already use it)."""
    d = json.loads(StructType([field]).json())["fields"][0]
    meta = dict(d.get("metadata") or {})
    meta[COLUMN_ID_KEY] = col_id
    meta[PHYSICAL_NAME_KEY] = field.name
    d["metadata"] = meta
    return d


def upgrade_to_column_mapping(
    path: str, mode: str = "name", spark: Optional[SparkSession] = None
) -> int:
    """Enable column mapping on an existing table — a METADATA-ONLY
    commit (the delta-spark ``ALTER TABLE ... SET TBLPROPERTIES
    ('delta.columnMapping.mode'='name')`` upgrade): every field gets
    ``delta.columnMapping.id`` + ``physicalName`` equal to its current
    name (existing files keep reading untouched), the configuration
    gains the mode + maxColumnId, and the protocol is raised to
    reader v2 / writer v5. Returns the committed version."""
    if mode != "name":
        raise ValueError(f"Only mode='name' upgrades are supported, got {mode!r}")
    log = DeltaLog(path)
    snap = log.snapshot()
    if column_mapping_mode(snap.metadata) != "none":
        return snap.version  # already mapped — idempotent
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
        features=METADATA_ONLY_FEATURES | {"columnMapping"},
    )
    schema = StructType.fromJson(json.loads(snap.metadata.schema_string))
    fields = [
        _with_field_meta(f, i + 1) for i, f in enumerate(schema.fields)
    ]
    new_schema_string = json.dumps(
        {"type": "struct", "fields": fields}, separators=(",", ":")
    )
    meta = snap.metadata
    config = dict(meta.configuration)
    config[COLUMN_MAPPING_MODE_KEY] = mode
    config[COLUMN_MAPPING_MAX_ID_KEY] = str(len(fields))
    actions = [
        {
            "commitInfo": {
                "timestamp": now_ms(),
                "operation": "UPGRADE COLUMN MAPPING",
                "operationParameters": {"mode": mode},
                "readVersion": snap.version,
                "engineInfo": "dask_deltalake_spark/0.1.0",
            }
        },
        Protocol(min_reader_version=2, min_writer_version=5).to_json(),
        Metadata(
            id=meta.id,
            schema_string=new_schema_string,
            partition_columns=meta.partition_columns,
            configuration=config,
            name=meta.name,
            description=meta.description,
            created_time=meta.created_time,
        ).to_json(),
    ]
    write_commit(log.table_path, snap.version + 1, actions)
    return snap.version + 1


def _commit_schema_change(
    log: DeltaLog, snap, schema_d: dict, operation: str, params: dict,
    partition_columns: Optional[list] = None, extra_config: Optional[dict] = None,
    extra_actions: Optional[list] = None,
) -> int:
    meta = snap.metadata
    config = dict(meta.configuration)
    if extra_config:
        config.update(extra_config)
    actions = [
        {
            "commitInfo": {
                "timestamp": now_ms(),
                "operation": operation,
                "operationParameters": params,
                "readVersion": snap.version,
                "engineInfo": "dask_deltalake_spark/0.1.0",
            }
        },
        # commitInfo stays FIRST (the in-commit-timestamp stamp reads
        # only the leading action); protocol upgrades land before the
        # metadata they govern
        *(extra_actions or []),
        Metadata(
            id=meta.id,
            schema_string=json.dumps(schema_d, separators=(",", ":")),
            partition_columns=(
                meta.partition_columns
                if partition_columns is None
                else partition_columns
            ),
            configuration=config,
            name=meta.name,
            description=meta.description,
            created_time=meta.created_time,
        ).to_json(),
    ]
    write_commit(log.table_path, snap.version + 1, actions)
    return snap.version + 1


def add_column(
    path: str,
    name: str,
    data_type: str,
    nullable: bool = True,
    spark: Optional[SparkSession] = None,
    default: Optional[str] = None,
) -> int:
    """ALTER TABLE ADD COLUMN as a metadata-only commit (requires — or
    first performs — the column-mapping upgrade). The new field gets a
    fresh mapping id and a ``col-<uuid>`` physical name no existing
    file contains, so every pre-existing row reads back NULL for it;
    subsequent appends write it under the physical name.
    ``data_type`` is a Spark DDL type string (``"double"``,
    ``"array<string>"``, ...).

    ``default`` (ADD COLUMN ... DEFAULT — writer feature
    allowColumnDefaults): a SQL expression stored in the field's
    ``CURRENT_DEFAULT`` metadata. Delta's WRITE-TIME default
    semantics: pre-existing rows keep reading NULL, but every future
    write that OMITS the column materializes the default into its
    files (delta/defaults.py applies it in to_delta). The protocol
    upgrades to writer v7 with the feature in the same commit."""
    import uuid as _uuid

    from pyspark.sql.types import _parse_datatype_string

    dt = _parse_datatype_string(data_type)  # validate + canonicalize
    log = DeltaLog(path)
    snap = log.snapshot()
    if column_mapping_mode(snap.metadata) == "none":
        upgrade_to_column_mapping(path, spark=spark)
        snap = log.snapshot()
    schema_d = json.loads(snap.metadata.schema_string)
    if name in [f["name"] for f in schema_d["fields"]]:
        raise ValueError(f"Column {name!r} already exists")
    max_id = int(
        snap.metadata.configuration.get(COLUMN_MAPPING_MAX_ID_KEY, "0")
    )
    new_field = json.loads(StructType([StructField(name, dt, nullable)]).json())[
        "fields"
    ][0]
    new_field["metadata"] = {
        COLUMN_ID_KEY: max_id + 1,
        PHYSICAL_NAME_KEY: f"col-{_uuid.uuid4()}",
    }
    extra_actions = None
    params = {"columns": json.dumps([{"name": name, "type": data_type}])}
    if default is not None:
        from dask_deltalake_spark.delta.defaults import CURRENT_DEFAULT_KEY
        from dask_deltalake_spark.delta.protocol import (
            protocol_with_features,
        )

        new_field["metadata"][CURRENT_DEFAULT_KEY] = default
        extra_actions = [
            protocol_with_features(
                snap.protocol, writer_features=("allowColumnDefaults",)
            ).to_json()
        ]
        params["default"] = default
    schema_d["fields"].append(new_field)
    return _commit_schema_change(
        log,
        snap,
        schema_d,
        "ADD COLUMNS",
        params,
        extra_config={COLUMN_MAPPING_MAX_ID_KEY: str(max_id + 1)},
        extra_actions=extra_actions,
    )


def drop_column(
    path: str, name: str, spark: Optional[SparkSession] = None
) -> int:
    """ALTER TABLE DROP COLUMN as a metadata-only commit (requires —
    or first performs — the column-mapping upgrade, which is exactly
    why the spec gates DROP on mapping: the physical data stays in the
    files, the logical schema simply stops referencing it, and a later
    ``add_column`` with the same logical name gets a FRESH physical
    name so the dropped values can never resurface). Partition columns
    cannot be dropped."""
    log = DeltaLog(path)
    snap = log.snapshot()
    if column_mapping_mode(snap.metadata) == "none":
        upgrade_to_column_mapping(path, spark=spark)
        snap = log.snapshot()
    if name in snap.metadata.partition_columns:
        raise ValueError(f"Cannot drop partition column {name!r}")
    schema_d = json.loads(snap.metadata.schema_string)
    names = [f["name"] for f in schema_d["fields"]]
    if name not in names:
        raise ValueError(f"Column {name!r} not found (have {names})")
    if len(names) == 1:
        raise ValueError("Cannot drop the only column of a table")
    schema_d["fields"] = [f for f in schema_d["fields"] if f["name"] != name]
    return _commit_schema_change(
        log, snap, schema_d, "DROP COLUMNS",
        {"columns": json.dumps([name])},
    )


def rename_column(
    path: str, existing: str, new: str, spark: Optional[SparkSession] = None
) -> int:
    """RENAME COLUMN as a metadata-only commit. Requires (or first
    performs) the column-mapping upgrade: the field keeps its physical
    name and id, only the logical name in schemaString changes — and
    ``partitionColumns`` follows when a partition column is renamed
    (that list is logical per the spec; ``partitionValues`` keys stay
    physical). Top-level columns only."""
    log = DeltaLog(path)
    snap = log.snapshot()
    if column_mapping_mode(snap.metadata) == "none":
        upgrade_to_column_mapping(path, spark=spark)
        snap = log.snapshot()
    schema_d = json.loads(snap.metadata.schema_string)
    names = [f["name"] for f in schema_d["fields"]]
    if existing not in names:
        raise ValueError(f"Column {existing!r} not found (have {names})")
    if new in names:
        raise ValueError(f"Column {new!r} already exists")
    for f in schema_d["fields"]:
        if f["name"] == existing:
            f["name"] = new
    meta = snap.metadata
    actions = [
        {
            "commitInfo": {
                "timestamp": now_ms(),
                "operation": "RENAME COLUMN",
                "operationParameters": {"from": existing, "to": new},
                "readVersion": snap.version,
                "engineInfo": "dask_deltalake_spark/0.1.0",
            }
        },
        Metadata(
            id=meta.id,
            schema_string=json.dumps(schema_d, separators=(",", ":")),
            partition_columns=[
                new if c == existing else c for c in meta.partition_columns
            ],
            configuration=meta.configuration,
            name=meta.name,
            description=meta.description,
            created_time=meta.created_time,
        ).to_json(),
    ]
    write_commit(log.table_path, snap.version + 1, actions)
    return snap.version + 1
