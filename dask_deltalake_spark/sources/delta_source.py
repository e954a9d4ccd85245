"""Spark 4 Python Data Source exposing Delta tables as
``spark.read.format("delta_py")``.

`read_delta` (delta/reader.py) is the engine's primary read path — it
hands Spark a pruned parquet file list so the scan uses the native
vectorized reader. This source exists for the `format(...)` ecosystem
surface (the way delta-spark integrates) and demonstrates the full
DataSource V2 contract in Python:

- ``schema()``: log replay → the snapshot's Spark schema (the Delta
  schemaString IS Spark's StructType JSON).
- ``pushFilters()``: supported comparisons translate to the engine's
  DNF form and drive partition + stats file pruning; every filter is
  also returned to Spark so residual row-level evaluation still
  happens (pruning is conservative, correctness never depends on it).
- ``partitions()``: one InputPartition per surviving data file — the
  task-per-file parallelism unit (the reference's partition-per-batch
  analog, reference core.py:77-78, but planned driver-side from
  metadata only; no data touches the driver).
- ``read()``: executor-side pyarrow parquet read, yielding Arrow
  record batches with hive partition values attached as typed constant
  columns.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:
    import pyarrow as pa


@dataclass
class DeltaFilePartition(InputPartition):
    abs_path: str
    partition_json: str  # {"col": "string-value" | null}
    dv_blob: Optional[bytes] = None  # serialized deletion-vector bitmap
    # 'drop' = exclude rows at bitmap positions (DV read semantics);
    # 'only' = emit ONLY those rows (CDF change-image extraction)
    pos_mode: str = "drop"


@dataclass
class DeltaFilesPartition(InputPartition):
    """A bin-packed group of data files read by ONE task. Python
    data-source tasks carry real per-task overhead (worker dispatch +
    Arrow pipe); a task per tiny file turns a many-small-files table
    into pure overhead, so files are coalesced into ~target-byte bins
    first — the Python-source analog of Spark's own
    files.maxPartitionBytes coalescing."""

    files: tuple  # of (abs_path, partition_json, dv_blob | None)


_TARGET_BIN_BYTES = 128 * 1024 * 1024


def _require_commit_range(log, lo: int, hi: int) -> None:
    """The delta_py stream and CDF sources are COMMIT-backed: every
    version in a planned batch range must still have its JSON commit.
    Retention cleanup keeps the table replayable through checkpoints/
    compactions, but those carry reconciled state, not per-commit
    change granularity — a stream planning through a cleaned range
    must fail with a CLEAR range error naming the missing commits and
    the resume options (the r13 read_delta_changes precedent), not a
    FileNotFoundError from the middle of partition planning."""
    if lo > hi:
        return
    have = set(log.versions())
    missing = [v for v in range(lo, hi + 1) if v not in have]
    if missing:
        raise ValueError(
            f"Streaming commit range {lo}..{hi} of {log.table_path} "
            f"is not available: commit(s) {missing[:5]} were removed "
            "by log retention cleanup (checkpoints/compactions "
            "preserve snapshot replayability, not per-commit change "
            "granularity); earliest retained commit: "
            f"{min(have) if have else 'none (checkpoint-only log)'} — "
            "resume from a retained version via startingVersion, or "
            "read the current snapshot with the batch reader."
        )


def _bin_pack_files(entries: list[tuple]) -> list:
    """(abs_path, partition_json, size, dv_blob|None) → DeltaFilesPartition bins of
    ~_TARGET_BIN_BYTES (first-fit-decreasing; any single file larger
    than the target gets its own bin). Only OPEN bins — residual >=
    the smallest remaining file — are scan candidates; a bin that can
    never fit anything again is dropped from the candidate list. On
    the normal large-table shape (most files at or above the target)
    every bin closes immediately and planning is O(n), not O(n²) —
    at the 100k+-file scale this module targets, the quadratic scan
    would cost minutes of driver time."""
    ordered = sorted(entries, key=lambda e: -e[2])  # by size
    min_size = ordered[-1][2] if ordered else 0
    bins: list[list] = []
    bin_bytes: list[int] = []
    open_bins: list[int] = []  # indices of bins with residual >= min_size
    for path, pjson, size, dv_blob in ordered:
        placed = False
        for j, i in enumerate(open_bins):
            if bin_bytes[i] + size <= _TARGET_BIN_BYTES:
                bins[i].append((path, pjson, dv_blob))
                bin_bytes[i] += size
                if _TARGET_BIN_BYTES - bin_bytes[i] < min_size:
                    open_bins.pop(j)
                placed = True
                break
        if not placed:
            bins.append([(path, pjson, dv_blob)])
            bin_bytes.append(size)
            if _TARGET_BIN_BYTES - size >= min_size:
                open_bins.append(len(bins) - 1)
    return [DeltaFilesPartition(files=tuple(b)) for b in bins]


def _filter_to_dnf_clause(f):
    """Translate a pushable Filter to a (col, op, val) tuple, or None.
    Only top-level columns (no nested paths) participate in pruning."""
    def col(attr):
        return attr[0] if len(attr) == 1 else None

    if isinstance(f, EqualTo):
        c = col(f.attribute)
        return (c, "==", f.value) if c else None
    if isinstance(f, GreaterThan):
        c = col(f.attribute)
        return (c, ">", f.value) if c else None
    if isinstance(f, GreaterThanOrEqual):
        c = col(f.attribute)
        return (c, ">=", f.value) if c else None
    if isinstance(f, LessThan):
        c = col(f.attribute)
        return (c, "<", f.value) if c else None
    if isinstance(f, LessThanOrEqual):
        c = col(f.attribute)
        return (c, "<=", f.value) if c else None
    if isinstance(f, In):
        c = col(f.attribute)
        return (c, "in", list(f.values)) if c else None
    if isinstance(f, (IsNull, IsNotNull)):
        return None  # stats carry nullCount but keep pruning simple
    return None


class DeltaPyReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        from dask_deltalake_spark.delta.column_mapping import (
            logical_to_physical,
        )
        from dask_deltalake_spark.delta.log import DeltaLog
        from dask_deltalake_spark.delta.protocol import (
            check_read_protocol,
            column_mapping_mode,
        )
        from dask_deltalake_spark.delta.reader import snapshot_schema

        self._schema = schema
        path = options.get("path")
        if not path:
            raise ValueError("delta_py requires .option('path', ...) or load(path)")
        version = options.get("version", options.get("versionAsOf"))
        ts = options.get("timestampasof", options.get("timestampAsOf"))
        if version is not None and ts is not None:
            raise ValueError(
                "versionAsOf and timestampAsOf are mutually exclusive"
            )
        self._snap = DeltaLog(path).snapshot(
            version=int(version) if version is not None else None,
            datetime_string=ts,
        )
        check_read_protocol(
            self._snap.protocol,
            metadata=self._snap.metadata,
            features={"columnMapping", "deletionVectors"},
        )
        # logical → physical parquet-name map ({} = identity): built
        # from the TABLE schema so a projected `schema` still resolves
        self._l2p = (
            logical_to_physical(snapshot_schema(self._snap))
            if column_mapping_mode(self._snap.metadata) != "none"
            else {}
        )
        self._dnf_conj: list[tuple] = []

    def pushFilters(self, filters):
        for f in filters:
            clause = _filter_to_dnf_clause(f)
            if clause is not None:
                col, op, val = clause
                # pruning runs against PHYSICAL partitionValues/stats
                self._dnf_conj.append((self._l2p.get(col, col), op, val))
        # return ALL filters: Spark re-applies them row-level; our use
        # of the pushed set is metadata file pruning only
        return filters

    def partitions(self):
        from dask_deltalake_spark.delta.dv import read_dv_bytes
        from dask_deltalake_spark.delta.protocol import (
            normalize_dnf,
            prune_by_stats,
            prune_partitions,
        )

        adds = self._snap.add_actions
        if self._dnf_conj:
            dnf = normalize_dnf(self._dnf_conj)
            adds = prune_by_stats(prune_partitions(adds, dnf), dnf)
        if not adds:
            return [DeltaFilesPartition(files=())]
        from dask_deltalake_spark.delta.protocol import resolve_file_path

        return _bin_pack_files(
            [
                (
                    resolve_file_path(self._snap.path, a.path),
                    json.dumps(a.partition_values or {}),
                    int(a.size or 0),
                    (
                        read_dv_bytes(self._snap.path, a.deletion_vector)
                        if a.deletion_vector
                        else None
                    ),
                )
                for a in adds
            ]
        )

    def read(self, partition: DeltaFilesPartition) -> Iterator["pa.RecordBatch"]:
        for abs_path, pjson, dv_blob in partition.files:
            yield from _read_file_as_batches(
                self._schema,
                DeltaFilePartition(abs_path, pjson, dv_blob),
                self._l2p,
            )


def _read_file_as_batches(
    schema: StructType,
    partition: DeltaFilePartition,
    l2p: Optional[dict] = None,
) -> Iterator["pa.RecordBatch"]:
    """Executor-side: one parquet file → Arrow batches in table-schema
    order, hive partition values attached as typed constants. With
    ``l2p`` the parquet file and partition values carry PHYSICAL names
    and the output batches are renamed to the logical schema; with a
    deletion-vector blob, rows at dead positions are dropped via one
    boolean mask over the whole-file row index."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    l2p = l2p or {}
    target = to_arrow_schema(schema)
    if not partition.abs_path:  # empty table / empty batch
        return
    pvals = json.loads(partition.partition_json)  # PHYSICAL-keyed
    phys_names = [l2p.get(n, n) for n in target.names]
    table = pq.read_table(
        partition.abs_path,
        columns=[p for p in phys_names if p not in pvals],
    )
    if partition.dv_blob is not None:
        import numpy as np

        from dask_deltalake_spark.delta.dv import deserialize_positions

        marked = deserialize_positions(partition.dv_blob)
        only = partition.pos_mode == "only"
        # drop: keep everything except marked; only: keep just marked
        mask = np.full(table.num_rows, not only, dtype=bool)
        in_range = marked[marked < table.num_rows].astype(np.int64)
        mask[in_range] = only
        table = table.filter(pa.array(mask))
    n = table.num_rows
    cols = []
    for field, phys in zip(target, phys_names):
        if phys in pvals:
            raw = pvals[phys]
            arr = pa.array([raw] * n, type=pa.string()).cast(field.type)
        else:
            arr = table.column(phys).cast(field.type)
        cols.append(arr)
    out = pa.table(dict(zip(target.names, cols)), schema=target)
    yield from out.to_batches(max_chunksize=64 * 1024)


class DeltaPyStreamReader(DataSourceStreamReader):
    """Incremental Delta streaming source: offsets are table versions;
    each micro-batch reads the data-changing add-actions of the commit
    range (start, end]. Removes are ignored — i.e. delta-spark's
    ``ignoreDeletes``/``ignoreChanges`` posture: appends stream
    exactly-once; overwrite/merge rewrites re-emit their added files
    (a deletion-vector re-add emits only its LIVE rows). State per
    query is just the last committed version. A protocol-upgrade
    commit arriving mid-range is re-checked before planning."""

    def __init__(self, schema: StructType, options):
        from dask_deltalake_spark.delta.column_mapping import (
            logical_to_physical,
        )
        from dask_deltalake_spark.delta.log import DeltaLog
        from dask_deltalake_spark.delta.protocol import (
            check_read_protocol,
            column_mapping_mode,
        )
        from dask_deltalake_spark.delta.reader import snapshot_schema

        self._schema = schema
        path = options.get("path")
        if not path:
            raise ValueError("delta_py requires .option('path', ...)")
        self._log = DeltaLog(path)
        self._table_path = self._log.table_path
        snap = self._log.snapshot()
        check_read_protocol(
            snap.protocol,
            metadata=snap.metadata,
            features={"columnMapping", "deletionVectors"},
        )
        self._l2p = (
            logical_to_physical(snapshot_schema(snap))
            if column_mapping_mode(snap.metadata) != "none"
            else {}
        )
        # Admission control (delta-spark's maxFilesPerTrigger /
        # maxBytesPerTrigger): cap how much backlog one micro-batch
        # plans, at COMMIT granularity — a batch always advances at
        # least one full commit, offsets stay plain versions, and
        # replays stay exactly-once. This is what keeps a streaming
        # read of a large table tractable: without it one trigger
        # plans every pending commit as a single batch. The planned
        # position is tracked reader-side because the simple Python
        # source API passes no start offset to latestOffset();
        # KNOWN LIMIT (measured, not guessed): Spark calls
        # latestOffset BEFORE initialOffset on a fresh query and
        # never reveals a restored checkpoint offset outside
        # partitions(), so the FIRST batch of each run is unbounded —
        # admission takes effect from the second trigger, once
        # partitions() has revealed the true position. Returning a
        # guessed bounded offset instead would risk offset-log
        # REGRESSION after a restart (Spark would re-plan from the
        # regressed offset → duplicate emission), which is strictly
        # worse than one oversized batch.
        mf = options.get("maxFilesPerTrigger")
        mb = options.get("maxBytesPerTrigger")
        self._max_files = int(mf) if mf else None
        self._max_bytes = int(mb) if mb else None
        # AvailableNow semantics, Python-side (Spark 4.1's JVM wrapper
        # PythonMicroBatchStream implements neither
        # SupportsTriggerAvailableNow nor SupportsAdmissionControl —
        # verified via javap — so .trigger(availableNow=True) always
        # logs a fallback to one unbounded batch). Instead the drain
        # helper (streaming/availablenow.py) resolves the table's
        # latest version driver-side and passes it as
        # ``endOffsetVersion``: latestOffset() never advances past it,
        # which is exactly the capture-once contract
        # prepareForTriggerAvailableNow would give us.
        eo = options.get("endOffsetVersion")
        self._end_cap = int(eo) if eo is not None else None
        # ``startOffsetHint``: the drain helper reads the query's OWN
        # checkpoint (latest entry of <ckpt>/offsets) and seeds the
        # admission tracker with the last PLANNED offset — closing the
        # measured first-batch-unbounded gap (latestOffset is called
        # before partitions() reveals the restored position). Safe by
        # construction: the hint comes from Spark's offset log itself,
        # so it can never regress the stream; a missing/unreadable
        # checkpoint sends no hint and keeps the conservative
        # unbounded-first-batch behavior.
        sh = options.get("startOffsetHint")
        self._last_planned: Optional[int] = (
            int(sh) if sh is not None else None
        )
        # startingVersion (delta-spark streaming parity): a FRESH
        # query begins at this version INCLUSIVE instead of the table
        # start; checkpointed queries ignore it (their position wins).
        # The literal "latest" (delta-spark) = only commits arriving
        # AFTER stream start — resolved once, here, to latest+1.
        sv = options.get("startingversion", options.get("startingVersion"))
        if sv is not None and str(sv).strip().lower() == "latest":
            self._starting_version: Optional[int] = (
                self._log.latest_version() + 1
            )
        else:
            self._starting_version = int(sv) if sv is not None else None
        # Non-append commits (delta-spark streaming parity): the plain
        # delta_py stream emits APPENDS; a commit carrying dataChange
        # removes (DML rewrite, delete) would silently re-emit
        # rewritten files as DUPLICATE rows downstream. Default is
        # delta-spark's: refuse with the option menu. ignoreDeletes
        # tolerates delete-ONLY commits; ignoreChanges re-emits the
        # rewritten files (documented duplicate semantics, implies
        # ignoreDeletes); skipChangeCommits skips such commits
        # entirely (the modern recommended option).
        def _flag(name: str) -> bool:
            v = options.get(name.lower(), options.get(name))
            return str(v).strip().lower() == "true" if v is not None else False

        self._ignore_deletes = _flag("ignoreDeletes")
        self._ignore_changes = _flag("ignoreChanges")
        self._skip_change_commits = _flag("skipChangeCommits")

    def initialOffset(self) -> dict:
        start = (
            self._starting_version - 1
            if self._starting_version is not None
            else -1
        )
        self._last_planned = start
        return {"version": start}

    def _commit_add_footprint(self, version: int) -> tuple:
        """(#data-change add files, total bytes) of one commit."""
        n = b = 0
        for action in self._log.read_commit_actions(version):
            add = action.get("add")
            if add and add.get("dataChange", True):
                n += 1
                b += int(add.get("size") or 0)
        return n, b

    def latestOffset(self) -> dict:
        latest = self._log.latest_version()
        if self._end_cap is not None:
            latest = min(latest, self._end_cap)
        if self._last_planned is not None and latest < self._last_planned:
            # capped below the stream position (end cap reached, or a
            # stale hint): report the position itself — never regress
            return {"version": self._last_planned}
        if self._last_planned is None or not (
            self._max_files or self._max_bytes
        ):
            self._last_planned = latest
            return {"version": latest}
        start = self._last_planned
        # the admission walk reads per-commit footprints below — fail
        # the cleaned-range shape with the clear error here too, not
        # a FileNotFoundError from the budget scan
        _require_commit_range(self._log, start + 1, latest)
        files = nbytes = 0
        end = start
        for v in range(start + 1, latest + 1):
            nf, nb = self._commit_add_footprint(v)
            over = (
                self._max_files is not None and files + nf > self._max_files
            ) or (
                self._max_bytes is not None and nbytes + nb > self._max_bytes
            )
            if end > start and over:
                break  # budget spent — later commits wait for the next trigger
            files += nf
            nbytes += nb
            end = v
            if (
                self._max_files is not None and files >= self._max_files
            ) or (
                self._max_bytes is not None and nbytes >= self._max_bytes
            ):
                break
        self._last_planned = end
        return {"version": end}

    def partitions(self, start: dict, end: dict):
        from urllib.parse import unquote

        from dask_deltalake_spark.delta.dv import read_dv_bytes
        from dask_deltalake_spark.delta.protocol import (
            Protocol,
            check_read_protocol,
        )

        # reveal the true stream position to the admission tracker (on
        # a checkpoint restart, latestOffset never sees the restored
        # offset — this is the first place it appears)
        if self._last_planned is None or self._last_planned < int(
            end["version"]
        ):
            self._last_planned = int(end["version"])
        _require_commit_range(
            self._log, int(start["version"]) + 1, int(end["version"])
        )
        entries = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            actions = self._log.read_commit_actions(v)
            dc_adds = []
            dc_removes = []
            for action in actions:
                # A protocol-upgrade commit arriving mid-stream (e.g.
                # minReaderVersion 3 for deletion vectors / column
                # mapping) changes how every LATER add file must be
                # interpreted; the init-time gate can't see it, so
                # re-check here before planning this batch — otherwise
                # the batch silently emits wrong rows, the exact
                # failure check_read_protocol exists to prevent.
                proto = action.get("protocol")
                if proto is not None:
                    rf = proto.get("readerFeatures")
                    check_read_protocol(
                        Protocol(
                            min_reader_version=int(
                                proto.get("minReaderVersion", 1)
                            ),
                            min_writer_version=int(
                                proto.get("minWriterVersion", 1)
                            ),
                            reader_features=(
                                list(rf) if rf is not None else None
                            ),
                        ),
                        features={"columnMapping", "deletionVectors"},
                    )
                add = action.get("add")
                if add and add.get("dataChange", True):
                    dc_adds.append(add)
                rem = action.get("remove")
                if rem and rem.get("dataChange", True):
                    dc_removes.append(rem)
            if dc_removes:
                # Non-append commit (delta-spark streaming semantics):
                # the plain stream emits appends; silently re-emitting
                # a DML rewrite's files duplicates every surviving row
                # downstream. dataChange=false commits (OPTIMIZE)
                # never land here — their adds AND removes carry
                # dataChange=false.
                if self._skip_change_commits:
                    continue
                if not self._ignore_changes:
                    if dc_adds or not self._ignore_deletes:
                        kind = (
                            "a data update" if dc_adds else "deleted data"
                        )
                        fix = (
                            "set 'skipChangeCommits' to 'true' to skip "
                            "such commits, or 'ignoreChanges' to "
                            "re-emit the rewritten files (downstream "
                            "must tolerate duplicate rows)"
                            if dc_adds
                            else "set 'ignoreDeletes' to 'true' to "
                            "ignore delete-only commits, or "
                            "'skipChangeCommits' to skip any "
                            "data-changing commit"
                        )
                        raise ValueError(
                            f"delta_py streaming source: detected "
                            f"{kind} (for example "
                            f"{unquote(dc_removes[0].get('path') or '')}"
                            f") in the source table at version {v}. "
                            "The plain stream emits APPENDS only; "
                            f"{fix}; for row-level change semantics "
                            "use the change feed source "
                            "(format 'delta_py_cdf')."
                        )
                    # delete-only commit + ignoreDeletes: emit nothing
                    continue
            from dask_deltalake_spark.delta.protocol import (
                resolve_file_path,
            )

            for add in dc_adds:
                dv = add.get("deletionVector")
                entries.append(
                    (
                        resolve_file_path(
                            self._table_path, unquote(add["path"])
                        ),
                        json.dumps(add.get("partitionValues") or {}),
                        int(add.get("size") or 0),
                        (
                            read_dv_bytes(self._table_path, dv)
                            if dv
                            else None
                        ),
                    )
                )
        if not entries:
            return [DeltaFilesPartition(files=())]
        # same small-file coalescing as the batch reader: a micro-batch
        # spanning many small commits must not become a task per file
        return _bin_pack_files(entries)

    def read(self, partition: DeltaFilesPartition):
        for abs_path, pjson, dv_blob in partition.files:
            yield from _read_file_as_batches(
                self._schema,
                DeltaFilePartition(abs_path, pjson, dv_blob),
                self._l2p,
            )

    def commit(self, end: dict) -> None:
        pass


class DeltaPyDataSource(DataSource):
    """``spark.read.format("delta_py").option("path", p).load()``."""

    @classmethod
    def name(cls) -> str:
        return "delta_py"

    def schema(self) -> StructType:
        from dask_deltalake_spark.delta.log import DeltaLog
        from dask_deltalake_spark.delta.reader import snapshot_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("delta_py requires .option('path', ...) or load(path)")
        version = self.options.get("version")
        snap = DeltaLog(path).snapshot(
            version=int(version) if version is not None else None
        )
        return snapshot_schema(snap)

    def reader(self, schema: StructType) -> DeltaPyReader:
        return DeltaPyReader(schema, self.options)

    def streamReader(self, schema: StructType) -> DeltaPyStreamReader:
        return DeltaPyStreamReader(schema, self.options)


# ---------------------------------------------------------------------------
# Change-data-feed source: spark.read/readStream.format("delta_py_cdf")
# ---------------------------------------------------------------------------


@dataclass
class DeltaCdfPartition(InputPartition):
    abs_path: str
    partition_json: str
    change_type: str  # 'insert' | 'delete'
    commit_version: int
    dv_blob: Optional[bytes] = None
    pos_mode: str = "drop"


def _plan_cdf_partitions(log, state: dict, start_v: int, end_v: int) -> list:
    """Plan per-commit change partitions for versions (start_v, end_v]
    — the datasource analog of delta/cdc.py's classification, at the
    file level: pure adds emit their live rows as inserts, pure
    removes their prior-live rows as deletes, and a vector re-add
    emits exactly the NEWLY dead positions as deletes. ``state`` maps
    live path → (partition_json, dv_descriptor) as of start_v (remove
    actions carry no partitionValues, so the prior add's must be
    remembered) and is rolled forward in place, across
    dataChange=false housekeeping too."""
    import numpy as np
    from urllib.parse import unquote

    from dask_deltalake_spark.delta.dv import (
        deserialize_positions,
        read_dv_bytes,
        serialize_positions,
    )
    from dask_deltalake_spark.delta.protocol import (
        Protocol,
        check_read_protocol,
    )

    out: list = []
    for v in range(start_v + 1, end_v + 1):
        adds_v: dict = {}
        removes_v: dict = {}
        cdc_v: list = []
        for action in log.read_commit_actions(v):
            proto = action.get("protocol")
            if proto is not None:
                check_read_protocol(
                    Protocol.from_json(proto),
                    features={"columnMapping", "deletionVectors"},
                )
            if action.get("add") is not None:
                adds_v[unquote(action["add"]["path"])] = action["add"]
            if action.get("remove") is not None:
                removes_v[unquote(action["remove"]["path"])] = action["remove"]
            if action.get("cdc") is not None:
                cdc_v.append(action["cdc"])

        if cdc_v:
            # Foreign-writer cdc actions (r15 interop; same contract
            # as delta/cdc.py): the _change_data files carry ALL of
            # this version's change rows with their own physical
            # _change_type column — emit one partition per cdc file
            # in file-carried mode (pos_mode='cdc') and skip
            # add/remove reconstruction, which would double-report
            # copied rows. State still rolls forward below.
            for c in cdc_v:
                out.append(
                    DeltaCdfPartition(
                        abs_path=f"{log.table_path}/{unquote(c['path'])}",
                        partition_json=json.dumps(
                            c.get("partitionValues") or {}
                        ),
                        change_type="",
                        commit_version=v,
                        dv_blob=None,
                        pos_mode="cdc",
                    )
                )
            for p, add in adds_v.items():
                state[p] = (
                    json.dumps(add.get("partitionValues") or {}),
                    add.get("deletionVector"),
                )
            for p in removes_v:
                if p not in adds_v:
                    state.pop(p, None)
            continue

        def emit(path, pvals_json, ctype, blob, mode):
            out.append(
                DeltaCdfPartition(
                    abs_path=f"{log.table_path}/{path}",
                    partition_json=pvals_json,
                    change_type=ctype,
                    commit_version=v,
                    dv_blob=blob,
                    pos_mode=mode,
                )
            )

        def add_pv(add):
            return json.dumps(add.get("partitionValues") or {})

        paired = {
            p
            for p in adds_v.keys() & removes_v.keys()
            if adds_v[p].get("dataChange", True)
            and removes_v[p].get("dataChange", True)
        }
        for p, add in adds_v.items():
            if not add.get("dataChange", True) or p in paired:
                continue
            dv = add.get("deletionVector")
            emit(
                p, add_pv(add), "insert",
                read_dv_bytes(log.table_path, dv) if dv else None, "drop",
            )
        for p, rem in removes_v.items():
            if not rem.get("dataChange", True) or p in paired:
                continue
            prior_pv, prior_dv = state.get(p, ("{}", None))
            emit(
                p, prior_pv, "delete",
                read_dv_bytes(log.table_path, prior_dv) if prior_dv else None,
                "drop",
            )
        for p in paired:
            add = adds_v[p]
            new_dv = add.get("deletionVector")
            _prior_pv, prior_dv = state.get(p, ("{}", None))
            old_pos = (
                deserialize_positions(read_dv_bytes(log.table_path, prior_dv))
                if prior_dv
                else np.empty(0, dtype=np.uint64)
            )
            if new_dv is None:
                # same-path rewrite without a vector (foreign writer):
                # conservative delete(old live) + insert(new)
                emit(
                    p, add_pv(add), "delete",
                    serialize_positions(old_pos) if len(old_pos) else None,
                    "drop",
                )
                emit(p, add_pv(add), "insert", None, "drop")
                continue
            new_pos = deserialize_positions(
                read_dv_bytes(log.table_path, new_dv)
            )
            delta = np.setdiff1d(new_pos, old_pos)
            if len(delta):
                emit(p, add_pv(add), "delete", serialize_positions(delta), "only")
        # roll the state, including dataChange=false housekeeping
        for p, add in adds_v.items():
            state[p] = (add_pv(add), add.get("deletionVector"))
        for p in removes_v:
            if p not in adds_v:
                state.pop(p, None)
    return out


def _cdf_read_partition(
    table_schema: StructType, l2p: dict, partition: DeltaCdfPartition
) -> Iterator["pa.RecordBatch"]:
    """Executor-side: table-schema rows of one change partition plus
    the _change_type / _commit_version columns. In file-carried mode
    (pos_mode='cdc': a foreign writer's _change_data file) the
    _change_type column is read FROM the parquet instead of stamped
    as a partition constant."""
    import pyarrow as pa

    from pyspark.sql.types import StringType, StructField, StructType

    file_carried = partition.pos_mode == "cdc"
    read_schema = (
        StructType(
            list(table_schema.fields)
            + [StructField("_change_type", StringType(), True)]
        )
        if file_carried
        else table_schema
    )
    for batch in _read_file_as_batches(
        read_schema,
        DeltaFilePartition(
            partition.abs_path,
            partition.partition_json,
            None if file_carried else partition.dv_blob,
            "drop" if file_carried else partition.pos_mode,
        ),
        l2p,
    ):
        n = batch.num_rows
        arrays = list(batch.columns) + (
            [] if file_carried
            else [pa.array([partition.change_type] * n, type=pa.string())]
        ) + [
            pa.array([partition.commit_version] * n, type=pa.int64()),
        ]
        names = (
            list(batch.schema.names)
            + ([] if file_carried else ["_change_type"])
            + ["_commit_version"]
        )
        yield pa.RecordBatch.from_arrays(arrays, names=names)


class _CdfBase:
    def _init_common(self, options):
        from dask_deltalake_spark.delta.column_mapping import (
            logical_to_physical,
        )
        from dask_deltalake_spark.delta.log import DeltaLog
        from dask_deltalake_spark.delta.protocol import (
            check_read_protocol,
            column_mapping_mode,
        )
        from dask_deltalake_spark.delta.reader import snapshot_schema

        path = options.get("path")
        if not path:
            raise ValueError("delta_py_cdf requires .option('path', ...)")
        self._log = DeltaLog(path)
        snap = self._log.snapshot()
        check_read_protocol(
            snap.protocol,
            metadata=snap.metadata,
            features={"columnMapping", "deletionVectors"},
        )
        self._table_schema = snapshot_schema(snap)
        self._l2p = (
            logical_to_physical(self._table_schema)
            if column_mapping_mode(snap.metadata) != "none"
            else {}
        )

    def _dv_state_at(self, version: int) -> dict:
        if version < 0:
            return {}
        snap = self._log.snapshot(version=version)
        return {
            p: (json.dumps(a.partition_values or {}), a.deletion_vector)
            for p, a in snap.files.items()
        }


class DeltaPyCdfReader(DataSourceReader, _CdfBase):
    """Batch change feed: ``option('startingVersion', N)`` (exclusive,
    default -1 = from table start) .. ``option('endingVersion', M)``
    (default latest); or the timestamp twins
    ``startingTimestamp``/``endingTimestamp`` (delta-spark CDF
    semantics: first commit at/after resp. last commit at/before,
    resolved against the in-commit clock when stamped)."""

    def __init__(self, schema: StructType, options):
        self._init_common(options)
        sts = options.get("startingtimestamp", options.get("startingTimestamp"))
        ets = options.get("endingtimestamp", options.get("endingTimestamp"))
        if sts is not None:
            self._start = self._log.resolve_starting_timestamp(sts) - 1
        else:
            self._start = int(
                options.get("startingversion", options.get("startingVersion", -1))
            )
        if ets is not None:
            self._end = self._log.resolve_datetime(ets)
        else:
            end = options.get("endingversion", options.get("endingVersion"))
            self._end = (
                int(end) if end is not None else self._log.latest_version()
            )

    def partitions(self):
        _require_commit_range(self._log, self._start + 1, self._end)
        dv_state = self._dv_state_at(self._start)
        parts = _plan_cdf_partitions(
            self._log, dv_state, self._start, self._end
        )
        return parts or [DeltaCdfPartition("", "{}", "insert", 0)]

    def read(self, partition: DeltaCdfPartition):
        yield from _cdf_read_partition(self._table_schema, self._l2p, partition)


class DeltaPyCdfStreamReader(DataSourceStreamReader, _CdfBase):
    """Streaming change feed: offsets are table versions; each
    micro-batch emits the change rows of its commit range — inserts
    for appends, deletes (with row images) for removes and vector
    deltas. The per-path vector state is re-derived from the snapshot
    at the batch's start version, so recovery from any checkpointed
    offset is consistent."""

    def __init__(self, schema: StructType, options):
        self._init_common(options)
        eo = options.get("endOffsetVersion")
        self._end_cap = int(eo) if eo is not None else None
        # the literal "latest" resolves exactly as the plain stream's
        # (r15, ADVICE): delta-spark accepts it for streaming reads
        # generally, and int(sv) raised a bare ValueError here
        sv = options.get("startingversion", options.get("startingVersion"))
        if sv is not None and str(sv).strip().lower() == "latest":
            self._starting_version: Optional[int] = (
                self._log.latest_version() + 1
            )
        else:
            self._starting_version = int(sv) if sv is not None else None

    def initialOffset(self) -> dict:
        if self._starting_version is not None:
            return {"version": self._starting_version - 1}
        return {"version": -1}

    def latestOffset(self) -> dict:
        # endOffsetVersion: the drain helper's capture-once cap (see
        # DeltaPyStreamReader) — availableNow semantics without JVM
        # SupportsTriggerAvailableNow support
        latest = self._log.latest_version()
        if self._end_cap is not None:
            latest = min(latest, self._end_cap)
        return {"version": latest}

    def partitions(self, start: dict, end: dict):
        start_v, end_v = int(start["version"]), int(end["version"])
        _require_commit_range(self._log, start_v + 1, end_v)
        dv_state = self._dv_state_at(start_v)
        parts = _plan_cdf_partitions(self._log, dv_state, start_v, end_v)
        return parts or [DeltaCdfPartition("", "{}", "insert", 0)]

    def read(self, partition: DeltaCdfPartition):
        yield from _cdf_read_partition(self._table_schema, self._l2p, partition)

    def commit(self, end: dict) -> None:
        pass


class DeltaPyCdfDataSource(DataSource):
    """``spark.read/readStream.format("delta_py_cdf")`` — the
    delta-spark ``readChangeFeed`` surface over this engine's log
    replay: table columns + ``_change_type`` + ``_commit_version``,
    batch and streaming, no ``_change_data`` files required."""

    @classmethod
    def name(cls) -> str:
        return "delta_py_cdf"

    def schema(self) -> StructType:
        from pyspark.sql.types import LongType, StringType, StructField

        from dask_deltalake_spark.delta.log import DeltaLog
        from dask_deltalake_spark.delta.reader import snapshot_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("delta_py_cdf requires .option('path', ...)")
        base = snapshot_schema(DeltaLog(path).snapshot())
        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_version", LongType(), False),
            ]
        )

    def reader(self, schema: StructType) -> DeltaPyCdfReader:
        return DeltaPyCdfReader(schema, self.options)

    def streamReader(self, schema: StructType) -> DeltaPyCdfStreamReader:
        return DeltaPyCdfStreamReader(schema, self.options)


def register_python_datasource(spark) -> None:
    """Idempotently register the delta_py + delta_py_cdf formats."""
    spark.dataSource.register(DeltaPyDataSource)
    spark.dataSource.register(DeltaPyCdfDataSource)
