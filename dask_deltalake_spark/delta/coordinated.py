"""Coordinated commits (Delta 4.0's catalog-managed commit protocol,
spec section "Coordinated Commits" — the `coordinatedCommits` writer
table feature).

Classic Delta arbitrates commit races with filesystem put-if-absent on
`_delta_log/{v}.json`. On stores without an atomic create that race is
only best-effort (see logstore.py's conditional-put ladder), and a
catalog (Unity, Glue, a database) often wants commit ownership anyway
— for cross-table transactions, auditing, or stores with no CAS at
all. Coordinated commits move the arbitration into a COMMIT
COORDINATOR:

1. the writer stages the commit under a race-free unique name,
   ``_delta_log/_staged_commits/{v:020d}.{uuid}.json`` (UUID names
   cannot collide, so plain write_bytes suffices);
2. the coordinator — the single arbiter — accepts exactly ONE staged
   file per version (the loser gets the same retry semantics as a
   lost put-if-absent);
3. accepted commits are BACKFILLED (copied to the classic
   ``{v:020d}.json``) so coordinator-unaware readers and the existing
   checkpoint/retention machinery keep working; until backfill,
   coordinator-aware readers merge the staged tail from
   ``get_commits`` on top of the backfilled replay (delta/log.py).

Scale notes: the coordinator handles O(1) metadata per commit (a
version→name mapping), never data; staged files live next to the log
so backfill is a same-store copy; and a busy table's commit hot path
drops the read-modify-check cycle on object stores that delta-rs's
lock-client needs. The in-process implementation below is the
single-driver arbiter (multi-thread writers in one Spark driver — the
steady state for a streaming sink + maintenance loop); a production
deployment implements the same four methods against its catalog
service.

Table properties (spec preview names):

- ``delta.coordinatedCommits.commitCoordinator-preview`` — registered
  coordinator name;
- ``delta.coordinatedCommits.commitCoordinatorConf-preview`` — JSON
  coordinator conf (here: ``backfill_interval``, 1 = backfill every
  commit).

Crash recovery (in-process coordinator): the ledger dies with the
driver while accepted-but-unbackfilled staged files persist on disk.
A fresh coordinator instance has no memory of the table, so a naive
read would silently drop the staged tail and a naive write would
re-issue its versions and FORK the log. Instead, a latest-mode read
whose coordinator answers ``knows_table() == False`` scans
``_staged_commits/`` once and REFUSES (OrphanedStagedCommitsError)
when files exist above the acknowledged tail. The runbook:

1. ``recover_staged_commits(path)`` — re-adopts the contiguous
   orphan chain into the fresh coordinator (raises on ambiguity:
   two differing payloads for one version, or junk beyond a gap —
   resolve those manually, then re-run);
2. ``backfill_commits(path)`` — flushes the adopted tail to classic
   files; or ``disable_coordinated_commits(path)`` to do that AND
   hand arbitration back to the filesystem.

Durable catalog coordinators never enter this state (``knows_table``
defaults to True), so steady-state reads pay no staged-dir LIST.
"""

from __future__ import annotations

import json
import os
import threading
import uuid as _uuid
from typing import Optional

COORDINATOR_PROP = "delta.coordinatedCommits.commitCoordinator-preview"
COORDINATOR_CONF_PROP = (
    "delta.coordinatedCommits.commitCoordinatorConf-preview"
)
STAGED_DIR = "_staged_commits"


class CoordinatedCommitConflict(Exception):
    """Another writer's staged commit won this version."""


class OrphanedStagedCommitsError(RuntimeError):
    """Staged commit files exist ABOVE the coordinator-acknowledged
    tail while the coordinator has no memory of the table — the
    crash-recovery state (module docstring, Crash recovery). Reading
    past them could silently drop accepted commits; run
    ``recover_staged_commits`` (adopt) or delete the junk files."""


def list_staged_versions(store, log_path: str) -> list:
    """(version, name) for every ``_staged_commits`` file, ascending
    by version. [] when the directory is absent."""
    out = []
    for f in store.list_dir(os.path.join(log_path, STAGED_DIR)):
        head = f.split(".", 1)[0]
        if head.isdigit() and f.endswith(".json"):
            out.append((int(head), f))
    return sorted(out)


class CommitCoordinator:
    """The four-method arbiter seam. The ledger is keyed by
    ``table_id`` — the table's metadata GUID — NOT by path: path
    spellings differ between callers (``/x/t`` vs ``file:///x/t``)
    while the GUID is the table's identity, and a re-created table at
    the same path gets a fresh GUID, so stale arbitration state can
    never leak across incarnations. Implementations must be safe
    under concurrent writers."""

    def register_table(self, table_id: str, conf: dict) -> None:
        """Called at enablement; conf is the parsed coordinator conf
        property. MUST be non-destructive for an already-registered
        id (re-enablement must not wipe accepted commits)."""
        raise NotImplementedError

    def commit(
        self, table_id: str, version: int, staged_name: str
    ) -> None:
        """Accept ``staged_name`` as THE commit for ``version`` or
        raise CoordinatedCommitConflict if the version is taken."""
        raise NotImplementedError

    def get_commits(
        self, table_id: str, start_version: int
    ) -> list[tuple[int, str]]:
        """Accepted-but-unbackfilled (version, staged_name) pairs at or
        above ``start_version``, ascending."""
        raise NotImplementedError

    def backfilled(self, table_id: str, version: int) -> None:
        """All versions <= ``version`` now exist as classic commit
        files; the coordinator may drop its tracking for them."""
        raise NotImplementedError

    def knows_table(self, table_id: str) -> bool:
        """Has this coordinator instance EVER seen ``table_id``
        (registered or committed)? A durable catalog coordinator
        returns True for every table it coordinates; an in-process
        coordinator answers False after a process restart — the
        signal the reader uses to run the orphaned-staged-commit
        check (see module docstring, Crash recovery). Default True:
        a coordinator that cannot lose state never needs the check."""
        return True


class InProcessCommitCoordinator(CommitCoordinator):
    """Single-driver arbiter: correct whenever every writer to the
    table shares this process (threaded writers in one Spark driver).
    The catalog-backed production twin implements the same methods
    against a service. Ledger keyed by table GUID (see base class) —
    re-registration is a no-op for a known id, and a re-created table
    at the same path arrives with a fresh id and an empty ledger."""

    def __init__(self):
        self._lock = threading.Lock()
        self._tables: dict[str, dict[int, str]] = {}
        # accepted high-water mark per table id. The unbackfilled
        # ledger alone is NOT enough to arbitrate: once an accepted
        # version is backfilled and dropped from the ledger, a late
        # writer re-submitting that version would be accepted again —
        # a log fork (caught by the thread-race pytest under full-
        # suite timing). Sequencing against the mark (accept exactly
        # max+1) closes it.
        self._max: dict[str, int] = {}

    def register_table(self, table_id: str, conf: dict) -> None:
        with self._lock:
            self._tables.setdefault(table_id, {})

    def commit(self, table_id: str, version: int, staged_name: str) -> None:
        with self._lock:
            t = self._tables.setdefault(table_id, {})
            # lazy mark init: an unknown id (fresh process) trusts the
            # first writer's snapshot-derived version — its predecessor
            # is the backfilled latest by construction
            m = self._max.get(table_id, version - 1)
            if version != m + 1:
                raise CoordinatedCommitConflict(
                    f"Version {version} of table {table_id} rejected: "
                    f"accepted high-water mark is {m}"
                )
            self._max[table_id] = version
            t[version] = staged_name

    def get_commits(
        self, table_id: str, start_version: int
    ) -> list[tuple[int, str]]:
        with self._lock:
            t = self._tables.get(table_id, {})
            return sorted(
                (v, n) for v, n in t.items() if v >= start_version
            )

    def backfilled(self, table_id: str, version: int) -> None:
        # drops only the unbackfilled LEDGER entries — the accepted
        # high-water mark survives, so a re-submitted old version
        # still loses
        with self._lock:
            t = self._tables.get(table_id, {})
            for v in [v for v in t if v <= version]:
                del t[v]

    def knows_table(self, table_id: str) -> bool:
        with self._lock:
            return table_id in self._tables or table_id in self._max


_COORDINATORS: dict[str, CommitCoordinator] = {
    "in-process": InProcessCommitCoordinator(),
}


def register_commit_coordinator(name: str, impl: CommitCoordinator) -> None:
    _COORDINATORS[name] = impl


def coordinator_from_metadata(metadata) -> Optional[tuple]:
    """(impl, conf dict) when the table's metadata names a coordinator,
    else None. Unknown names raise — a coordinated table MUST NOT be
    read or written past the coordinator (the staged tail would be
    silently invisible)."""
    if metadata is None:
        return None
    conf = getattr(metadata, "configuration", None) or {}
    name = conf.get(COORDINATOR_PROP)
    if not name:
        return None
    impl = _COORDINATORS.get(name)
    if impl is None:
        raise ValueError(
            f"Table names commit coordinator {name!r} but no such "
            "coordinator is registered "
            "(register_commit_coordinator); reading or writing past "
            "the coordinator could miss accepted commits."
        )
    cconf = {}
    raw = conf.get(COORDINATOR_CONF_PROP)
    if raw:
        try:
            cconf = json.loads(raw)
        except ValueError:
            cconf = {}
    return impl, cconf


def staged_commit_path(log_dir: str, version: int, name: str) -> str:
    return os.path.join(log_dir, STAGED_DIR, name)


def read_staged_commit_actions(
    store, log_path: str, version: int, name: str,
    classic_fallback: bool = True,
) -> list:
    """Parse a staged commit's action list. With ``classic_fallback``
    (the default), a staged file deleted by a concurrent backfill is
    served from the classic ``{v}.json`` that backfill just wrote —
    the ONE uniform race policy for every staged-read site (snapshot
    merge, history merge, ICT predecessor lookup, retry scans)."""
    from dask_deltalake_spark.delta.protocol import commit_filename

    try:
        raw = store.read_bytes(os.path.join(log_path, STAGED_DIR, name))
    except OSError:
        if not classic_fallback:
            raise
        raw = store.read_bytes(
            os.path.join(log_path, commit_filename(version))
        )
    return [
        json.loads(line)
        for line in raw.decode("utf-8").splitlines()
        if line.strip()
    ]


def write_staged_commit(
    store, log_dir: str, version: int, payload: bytes
) -> str:
    """Stage the payload under a race-free unique name; returns the
    staged file NAME (coordinator currency)."""
    name = f"{version:020d}.{_uuid.uuid4().hex}.json"
    store.write_bytes(os.path.join(log_dir, STAGED_DIR, name), payload)
    return name


def enable_coordinated_commits(
    path: str,
    coordinator: str = "in-process",
    backfill_interval: int = 1,
) -> int:
    """Commit the coordinator table properties + the writer feature
    upgrade (one atomic commit, still via filesystem put-if-absent —
    enablement itself PRECEDES coordination). Returns the committed
    version."""
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.protocol import Protocol, now_ms
    from dask_deltalake_spark.delta.writer import write_commit

    if coordinator not in _COORDINATORS:
        raise ValueError(f"Unknown commit coordinator {coordinator!r}")
    log = DeltaLog(path)
    snap = log.snapshot()
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
        features=METADATA_ONLY_FEATURES | {"coordinatedCommits"},
    )
    md = snap.metadata.to_json()["metaData"]
    conf = dict(md["configuration"])
    conf[COORDINATOR_PROP] = coordinator
    conf[COORDINATOR_CONF_PROP] = json.dumps(
        {"backfill_interval": int(backfill_interval)}
    )
    md["configuration"] = conf
    proto = snap.protocol
    wf = set(proto.writer_features or [])
    actions = [
        {
            "commitInfo": {
                "timestamp": now_ms(),
                "operation": "SET TBLPROPERTIES",
                "operationParameters": {
                    "properties": json.dumps(
                        {COORDINATOR_PROP: coordinator}
                    )
                },
                "readVersion": snap.version,
                "engineInfo": "dask_deltalake_spark/0.1.0",
            }
        }
    ]
    if "coordinatedCommits" not in wf:
        actions.append(
            Protocol(
                min_reader_version=max(proto.min_reader_version, 1),
                min_writer_version=7,
                reader_features=(
                    proto.reader_features
                    if proto.min_reader_version >= 3
                    else None
                ),
                writer_features=sorted(
                    wf | {"appendOnly", "invariants", "coordinatedCommits"}
                ),
            ).to_json()
        )
    actions.append({"metaData": md})
    # Ledger identity = the table GUID; register BEFORE the settings
    # commit so a commit routed through the coordinator (when the
    # table was ALREADY coordinated — re-enablement / conf change)
    # lands in a registered ledger. register_table is non-destructive
    # for a known id, so re-enablement never wipes accepted commits.
    impl = _COORDINATORS[coordinator]
    impl.register_table(md["id"], {"backfill_interval": backfill_interval})
    prev = coordinator_from_metadata(snap.metadata)
    version = snap.version + 1
    write_commit(path, version, actions)
    if prev is not None:
        # the settings commit itself routed through the PREVIOUS
        # coordinator (pre-state rules); flush its ledger so a
        # coordinator migration strands nothing
        backfill_commits(path, impl=prev[0], table_id=md["id"])
    return version


def backfill_commits(
    path: str, impl: Optional[CommitCoordinator] = None,
    table_id: Optional[str] = None,
) -> list[int]:
    """Copy every accepted-but-unbackfilled staged commit to its
    classic ``{v:020d}.json`` name (put-if-absent; a concurrent
    backfiller is benign), notify the coordinator, and DELETE the
    staged originals (the classic file now holds the bytes —
    without this the staged dir grows one file per commit forever).
    Returns the backfilled versions. ``impl``/``table_id`` override
    the metadata-derived coordinator (coordinator-migration flush)."""
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.protocol import commit_filename

    table_path = str(path).rstrip("/")
    log = DeltaLog(table_path)
    if impl is None or table_id is None:
        metadata = log.snapshot().metadata
        co = coordinator_from_metadata(metadata)
        if co is None:
            return []
        impl = impl or co[0]
        table_id = table_id or metadata.id
    backfilled_latest = log.versions()[-1] if log.versions() else -1
    done = []
    for v, name in impl.get_commits(table_id, backfilled_latest + 1):
        staged = staged_commit_path(log.log_path, v, name)
        try:
            payload = log.store.read_bytes(staged)
        except OSError:
            # a concurrent backfiller copied AND deleted this staged
            # file between our get_commits and the read — the classic
            # file must exist; count it done so the coordinator still
            # gets notified (a commit that already succeeded must
            # never surface as a failure here)
            if log.store.exists(
                os.path.join(log.log_path, commit_filename(v))
            ):
                done.append(v)
                continue
            raise
        try:
            log.store.put_if_absent(
                os.path.join(log.log_path, commit_filename(v)), payload
            )
        except FileExistsError:
            pass  # another backfiller got there first — same bytes
        try:
            log.store.delete(staged)
        except OSError:
            pass
        done.append(v)
    if done:
        impl.backfilled(table_id, max(done))
    return done


def recover_staged_commits(
    path: str,
    impl: Optional[CommitCoordinator] = None,
    table_id: Optional[str] = None,
) -> list[int]:
    """Crash recovery (module docstring, Crash recovery): re-adopt
    orphaned staged commits into a FRESH coordinator instance after
    the previous one died with accepted-but-unbackfilled commits on
    disk. Adopts the contiguous chain starting at classic-latest + 1
    (commit acceptance is sequential, so files beyond a gap cannot be
    accepted commits) and returns the adopted versions; raises
    OrphanedStagedCommitsError when a version has two staged
    candidates with DIFFERENT payloads (the accepted one is unknowable
    from the filesystem — resolve manually) or when junk files remain
    beyond the chain (delete them, then reads proceed). After
    adoption, ``backfill_commits`` flushes the tail to classic files.

    Caveat: a file staged by a writer that crashed BEFORE coordinator
    acceptance is indistinguishable from an accepted orphan — adoption
    treats it as accepted (its payload is a complete, valid commit;
    the spec's catalog coordinators avoid the ambiguity by being
    durable)."""
    from dask_deltalake_spark.delta.log import DeltaLog

    table_path = str(path).rstrip("/")
    log = DeltaLog(table_path)
    classic_latest = log.versions()[-1]
    # explicit-version snapshot: resolves against the CLASSIC log only,
    # so it cannot itself trip the orphan refusal we are here to clear
    snap = log.snapshot(version=classic_latest)
    co = coordinator_from_metadata(snap.metadata)
    if co is None:
        raise ValueError(f"{table_path} is not a coordinated table")
    impl = impl or co[0]
    table_id = table_id or snap.metadata.id
    acked = {v for v, _ in impl.get_commits(table_id, 0)}
    by_ver: dict[int, list[str]] = {}
    for v, name in list_staged_versions(log.store, log.log_path):
        if v <= classic_latest or v in acked:
            continue  # backfilled leftover / lost-race junk / known
        by_ver.setdefault(v, []).append(name)
    adopted: list[int] = []
    expect = max([classic_latest, *acked]) + 1
    for v in sorted(by_ver):
        if v != expect:
            break  # gap: everything beyond is junk, handled below
        names = sorted(by_ver[v])
        if len(names) > 1:
            payloads = {
                log.store.read_bytes(
                    staged_commit_path(log.log_path, v, n)
                )
                for n in names
            }
            if len(payloads) > 1:
                raise OrphanedStagedCommitsError(
                    f"Version {v} of {table_path} has "
                    f"{len(names)} staged candidates with differing "
                    "payloads; the accepted one is unknowable from "
                    "the filesystem — delete the losers, then re-run "
                    "recover_staged_commits."
                )
        impl.commit(table_id, v, names[0])
        adopted.append(v)
        expect = v + 1
    junk = [v for v in sorted(by_ver) if v >= expect]
    if junk:
        raise OrphanedStagedCommitsError(
            f"Adopted staged versions {adopted} of {table_path}, but "
            f"staged files at non-contiguous versions {junk} remain — "
            "they cannot be accepted commits (acceptance is "
            "sequential); delete them to unblock reads."
        )
    return adopted


def disable_coordinated_commits(path: str) -> int:
    """Hand commit arbitration BACK to the filesystem: flush every
    staged commit, then commit a metadata update removing the
    coordinator properties (the removal commit itself still routes
    through the coordinator — pre-state rules — and is force-
    backfilled so the classic log is complete the moment coordination
    ends). The ``coordinatedCommits`` writer feature stays declared
    (feature REMOVAL is a protocol downgrade with its own machinery;
    delta-spark leaves it too) — write_commit keys off the property,
    so subsequent commits use classic put-if-absent. Returns the
    committed version."""
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.protocol import now_ms
    from dask_deltalake_spark.delta.writer import write_commit

    table_path = str(path).rstrip("/")
    log = DeltaLog(table_path)
    snap = log.snapshot()
    co = coordinator_from_metadata(snap.metadata)
    if co is None:
        return snap.version  # already classic — nothing to do
    backfill_commits(table_path)  # complete the classic log first
    snap = log.snapshot()
    md = snap.metadata.to_json()["metaData"]
    conf = dict(md["configuration"])
    conf.pop(COORDINATOR_PROP, None)
    conf.pop(COORDINATOR_CONF_PROP, None)
    md["configuration"] = conf
    version = snap.version + 1
    write_commit(
        table_path,
        version,
        [
            {
                "commitInfo": {
                    "timestamp": now_ms(),
                    "operation": "UNSET TBLPROPERTIES",
                    "operationParameters": {
                        "properties": json.dumps(
                            [COORDINATOR_PROP, COORDINATOR_CONF_PROP]
                        )
                    },
                    "readVersion": snap.version,
                    "engineInfo": "dask_deltalake_spark/0.1.0",
                }
            },
            {"metaData": md},
        ],
    )
    # the removal commit routed through the (old) coordinator; flush
    # it so the classic log is complete with coordination over
    backfill_commits(table_path, impl=co[0], table_id=md["id"])
    return version
