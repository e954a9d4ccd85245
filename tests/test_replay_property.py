"""Property test for log-replay action reconciliation (log.py:_apply,
the (path, dvId)-keyed tombstone machinery) — no Spark, pure driver
metadata, so hypothesis can run hundreds of histories.

Invariant: CHECKPOINT-SPLIT INVARIANCE. For any random action history
H and any split point k, replaying H in full must produce exactly the
same table state (live adds AND the (path, dvId) tombstone set) as
writing the same history with a checkpoint at version k and replaying
from it — i.e. checkpoints are semantics-free acceleration, for every
add/remove interleaving a writer can produce, including same-commit
add-before-remove orderings, vector supersession, and resurrected
paths."""

from __future__ import annotations

import json
import tempfile
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
from dask_deltalake_spark.delta.maintenance import create_checkpoint
from dask_deltalake_spark.delta.protocol import (
    AddAction,
    Metadata,
    Protocol,
    RemoveAction,
    dv_unique_id,
)
from dask_deltalake_spark.delta.writer import write_commit

_PATHS = ["a.parquet", "b.parquet", "c.parquet"]
_DVS = [
    None,
    {"storageType": "i", "pathOrInlineDv": "dv-one", "cardinality": 1},
    {"storageType": "i", "pathOrInlineDv": "dv-two", "cardinality": 2},
]

_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {},
            }
        ],
    }
)

# domain/txn kinds ride the same (kind, i, j) triple shape: for
# "domain", i indexes _DOMAINS and j==2 means a removal tombstone
# (else live with config c{j}); for "txn", i indexes _APPS and j is
# the transaction version (reconciliation is latest-wins, per spec). The reference
# file-reconciler filters on kind, so meta actions are transparent to
# it; the split/only invariance tests compare them via _state().
_DOMAINS = ["delta.liquid", "app.one", "app.two"]
_APPS = ["stream-a", "stream-b"]
# "meta" re-declares table metadata (pi picks a schema variant, di a
# configuration variant) and "proto" re-declares the protocol (pi
# picks a writerFeatures variant; every variant keeps deletionVectors
# so replay legality never changes mid-history) — latest-wins for
# both, which the checkpoint must carry. With these, EVERY Delta
# action kind rides the generated histories (commitInfo is ignored by
# replay; sidecar is v2-checkpoint-internal).
_META_SCHEMAS = [
    _SCHEMA,
    json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    }),
]
# every variant keeps deletionVectors AND v2Checkpoint so replay
# legality and v2-checkpoint writability never change mid-history
_PROTO_FEATURES = [
    ["deletionVectors", "v2Checkpoint"],
    ["deletionVectors", "v2Checkpoint", "domainMetadata"],
    ["deletionVectors", "v2Checkpoint", "appendOnly"],
]
_action = st.tuples(
    st.sampled_from(
        ["add", "remove", "domain", "txn", "meta", "proto", "cdc"]
    ),
    st.sampled_from(range(len(_PATHS))),
    st.sampled_from(range(len(_DVS))),
)
_history = st.lists(
    st.lists(_action, min_size=1, max_size=3), min_size=1, max_size=6
)


def _to_json(kind: str, pi: int, di: int, ts: int) -> dict:
    if kind == "meta":
        return Metadata(
            id="fixed-table-id",
            schema_string=_META_SCHEMAS[pi % len(_META_SCHEMAS)],
            configuration={
                "delta.deletedFileRetentionDuration":
                    "interval 876000 hours",
                "custom.knob": f"k{di}",
            },
        ).to_json()
    if kind == "proto":
        return Protocol(
            min_reader_version=3,
            min_writer_version=7,
            reader_features=["deletionVectors", "v2Checkpoint"],
            writer_features=_PROTO_FEATURES[pi % len(_PROTO_FEATURES)],
        ).to_json()
    if kind == "domain":
        return {
            "domainMetadata": {
                "domain": _DOMAINS[pi],
                "configuration": "" if di == 2 else f"c{di}",
                "removed": di == 2,
            }
        }
    if kind == "txn":
        return {
            "txn": {
                "appId": _APPS[pi % len(_APPS)],
                "version": di,
                "lastUpdated": ts,
            }
        }
    if kind == "cdc":
        # an Add CDC File action (r15: the foreign-writer change-feed
        # line our CDF readers consume) — STATE-TRANSPARENT by spec:
        # replay, checkpoints, and compaction must all ignore it, so
        # every invariance in this module must hold with cdc lines
        # interleaved anywhere in the history. The referenced file
        # need not exist for state replay.
        return {
            "cdc": {
                "path": f"_change_data/cdc-{pi}-{di}.parquet",
                "partitionValues": {},
                "size": 100 + di,
                "dataChange": False,
            }
        }
    if kind == "add":
        return AddAction(
            path=_PATHS[pi],
            size=10,
            partition_values={},
            modification_time=ts,
            data_change=True,
            deletion_vector=_DVS[di],
        ).to_json()
    return RemoveAction(
        path=_PATHS[pi],
        deletion_timestamp=ts,
        data_change=True,
        deletion_vector=_DVS[di],
    ).to_json()


def _write_table(base: str, history: list) -> str:
    tbl = f"{base}/t-{uuid.uuid4().hex[:8]}"
    meta = Metadata(
        id=uuid.uuid4().hex,
        schema_string=_SCHEMA,
        configuration={
            # DV protocol features so replay accepts the descriptors;
            # NO tombstone expiry (huge retention) so the comparison
            # is over the full sets
            "delta.deletedFileRetentionDuration": "interval 876000 hours",
        },
    ).to_json()
    proto = Protocol(
        min_reader_version=3,
        min_writer_version=7,
        reader_features=["deletionVectors", "v2Checkpoint"],
        writer_features=["deletionVectors", "v2Checkpoint"],
    ).to_json()
    write_commit(tbl, 0, [proto, meta] + [
        _to_json(k, p, d, 1_000) for (k, p, d) in history[0]
    ])
    for v, commit in enumerate(history[1:], start=1):
        write_commit(
            tbl, v, [_to_json(k, p, d, 1_000 + v) for (k, p, d) in commit]
        )
    return tbl


def _state(tbl: str):
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(tbl).snapshot()
    files = {
        (p, dv_unique_id(a.deletion_vector)) for p, a in snap.files.items()
    }
    tombs = {
        (r.path, dv_unique_id(r.deletion_vector), r.deletion_timestamp)
        for r in snap.tombstones_all
    }
    pub = {
        (p, r.deletion_timestamp) for p, r in snap.tombstones.items()
    }
    doms = tuple(sorted(snap.domain_metadata.items()))
    txns = tuple(sorted(snap.transactions.items()))
    meta = (
        snap.metadata.schema_string,
        tuple(sorted(snap.metadata.configuration.items())),
    )
    proto = (
        snap.protocol.min_reader_version,
        snap.protocol.min_writer_version,
        tuple(sorted(snap.protocol.reader_features or [])),
        tuple(sorted(snap.protocol.writer_features or [])),
    )
    return files, tombs, pub, doms, txns, meta, proto


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(history=_history, data=st.data())
def test_replay_checkpoint_split_invariance(history, data):
    with tempfile.TemporaryDirectory(prefix="replay_prop_") as base:
        plain = _write_table(base, history)
        want = _state(plain)

        k = data.draw(
            st.integers(min_value=0, max_value=len(history) - 1),
            label="checkpoint version",
        )
        fmt = data.draw(
            st.sampled_from(["classic", "v2"]), label="checkpoint format"
        )
        # same history in a sibling table, checkpoint written
        # mid-stream at version k, then the tail commits — in BOTH
        # checkpoint formats (v2 = manifest + sidecars, its own parse
        # and reuse machinery)
        tail = history[k + 1:]
        tbl = _write_table(base, history[: k + 1])
        _SNAPSHOT_CACHE.clear()
        create_checkpoint(tbl, format=fmt)
        for v, commit in enumerate(tail, start=k + 1):
            write_commit(
                tbl, v, [_to_json(kk, p, d, 1_000 + v) for (kk, p, d) in commit]
            )
        got = _state(tbl)
        assert got == want, (history, k, got, want)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(history=_history, data=st.data())
def test_replay_checkpoint_only_invariance(history, data):
    """Checkpoint-ONLY logs (r13): checkpoint the full history at the
    latest version, then delete EVERY JSON commit — the spec-valid
    shape a foreign engine's metadata cleanup produces on an idle
    table. The snapshot replayed from the bare checkpoint must equal
    the plain full-JSON replay for every generated history (files,
    keyed tombstone set, public tombstone view). Before r13, this
    shape raised DeltaTableNotFoundError."""
    import glob
    import os

    with tempfile.TemporaryDirectory(prefix="replay_prop_") as base:
        plain = _write_table(base, history)
        want = _state(plain)

        tbl = _write_table(os.path.join(base, "cponly"), history)
        _SNAPSHOT_CACHE.clear()
        create_checkpoint(
            tbl,
            format=data.draw(
                st.sampled_from(["classic", "v2"]),
                label="checkpoint format",
            ),
        )
        for j in glob.glob(os.path.join(tbl, "_delta_log", "*.json")):
            os.remove(j)
        got = _state(tbl)
        assert got == want, (history, got, want)
        # and the snapshot's version label is the checkpoint version
        _SNAPSHOT_CACHE.clear()
        assert DeltaLog(tbl).snapshot().version == len(history) - 1


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(history=_history, data=st.data())
def test_replay_compaction_substitution_invariance(history, data):
    """COMPACTION-SUBSTITUTION INVARIANCE (r13): for any history and
    any aligned range [i..j], replaying with the compacted file
    substituted for the range — including with the range's interior
    JSON commits DELETED, the retention scenario compaction exists
    for — must equal the plain full-JSON replay across the full
    state tuple (files, keyed tombstones, public tombstones, domains,
    txns, metadata, protocol). The compactor derives its content from
    the two boundary snapshots, so this pins compaction to the same
    reconciliation the replay itself performs — the net that caught
    the path-keyed netting and max-txn divergences."""
    import os

    from dask_deltalake_spark.delta.maintenance import compact_log

    with tempfile.TemporaryDirectory(prefix="replay_prop_") as base:
        plain = _write_table(base, history)
        want = _state(plain)

        n = len(history)
        i = data.draw(st.integers(min_value=0, max_value=n - 1), label="i")
        j = data.draw(st.integers(min_value=i, max_value=n - 1), label="j")
        tbl = _write_table(base, history)
        _SNAPSHOT_CACHE.clear()
        compact_log(tbl, start_version=i, end_version=j)
        _SNAPSHOT_CACHE.clear()
        assert _state(tbl) == want, ("substitution", history, i, j)

        # a second ADJACENT range when room remains — multi-link
        # compaction chains exercise the anchor's chain walk beyond
        # one link
        k = None
        if j + 1 <= n - 1:
            k = data.draw(
                st.integers(min_value=j + 1, max_value=n - 1), label="k"
            )
            compact_log(tbl, start_version=j + 1, end_version=k)
            _SNAPSHOT_CACHE.clear()
            assert _state(tbl) == want, ("chain", history, i, j, k)

        # force the substitution: delete the ranges' JSON commits,
        # keeping the log's FINAL commit (latest-version discovery is
        # anchored on it in real retention too)
        for v in range(i, (k if k is not None else j) + 1):
            if v == n - 1:
                continue
            os.remove(
                os.path.join(tbl, "_delta_log", f"{v:020d}.json")
            )
        _SNAPSHOT_CACHE.clear()
        assert _state(tbl) == want, ("forced", history, i, j, k)


# ---------------------------------------------------------------------------
# Kernel conformance + order insensitivity
# ---------------------------------------------------------------------------
#
# The split-invariance test above cannot catch a reconciliation bug
# that affects both replays identically. This half checks _apply
# against an INDEPENDENT declarative reconciler written straight from
# the intended spec, and checks that within-commit action order does
# not matter (the Delta protocol's reconciliation is set-based per
# (path, dvId); a commit never contains two file actions with the
# same identity — the generator enforces that legality).


def _uid(di: int) -> str:
    return dv_unique_id(_DVS[di])


def _ref_replay(history: list):
    """Declarative spec: per commit, removes apply against the
    PRE-commit live state (popping on exact (path, dvId) identity, or
    on ANY identity for descriptor-less legacy removes — which then
    archive the popped vector), then adds define the post-commit state
    (superseding a surviving different-vector add archives its
    descriptor at max(modification times); an add cancels its own
    identity's tombstone). The legacy descriptor-less branch is GATED
    (VERDICT r10 #4): it applies only while the PRE-commit tombstone
    state holds no WRITER-STAMPED descriptor-carrying remove —
    replay-synthesized archives don't count (they'd disarm a
    pre-descriptor log's own heuristic at its first supersession).
    All timestamps are 1000+version by construction of the
    generator."""
    live: dict[str, int] = {}  # path -> dv index
    live_mt: dict[str, int] = {}
    tombs: dict[tuple, int] = {}  # (path, uid) -> ts
    stamped: set = set()  # keys whose CURRENT value is writer-stamped
    for v, commit in enumerate(history):
        ts = 1_000 + v if v else 1_000
        armed = not stamped  # evaluated against PRE-commit state
        removes = [(p, d) for (k, p, d) in commit if k == "remove"]
        adds = [(p, d) for (k, p, d) in commit if k == "add"]
        for pi, di in removes:
            p = _PATHS[pi]
            if p in live:
                lived = live[p]
                if _uid(lived) == _uid(di):
                    live.pop(p)
                    live_mt.pop(p)
                elif (
                    _DVS[di] is None
                    and _DVS[lived] is not None
                    and armed
                ):
                    live.pop(p)
                    live_mt.pop(p)
                    tombs[(p, _uid(lived))] = ts
                    stamped.discard((p, _uid(lived)))  # synthesized
            tombs[(p, _uid(di))] = ts
            if _DVS[di] is not None:
                stamped.add((p, _uid(di)))
            else:
                stamped.discard((p, _uid(di)))
        for pi, di in adds:
            p = _PATHS[pi]
            if p in live and _uid(live[p]) != _uid(di):
                old = live[p]
                if _DVS[old] is not None and (p, _uid(old)) not in tombs:
                    # synthesized archive — never writer-stamped
                    tombs[(p, _uid(old))] = max(ts, live_mt[p])
            live[p] = di
            live_mt[p] = ts
            tombs.pop((p, _uid(di)), None)
            stamped.discard((p, _uid(di)))
    files = {(p, _uid(d)) for p, d in live.items()}
    tset = {(p, u, ts) for (p, u), ts in tombs.items()}
    return files, tset


def _legalize(history: list) -> list:
    """Enforce per-commit legality: at most one add per path, and no
    (path, dvId) both added and removed in one commit (the protocol
    forbids duplicate file-action identities per version)."""
    out = []
    for commit in history:
        add_ids = {
            (p, _uid(d)) for (k, p, d) in commit if k == "add"
        }
        acts = []
        emitted_adds: set = set()
        for k, p, d in commit:
            if k in ("domain", "txn", "meta", "proto", "cdc"):
                # meta actions are always per-commit legal (p/d index
                # domain/app pools, not file identities)
                acts.append((k, p, d))
            elif k == "add":
                if p in emitted_adds:
                    continue
                emitted_adds.add(p)
                acts.append((k, p, d))
            elif (p, _uid(d)) not in add_ids:
                acts.append((k, p, d))
        if acts:
            out.append(acts)
    return out or [[("add", 0, 0)]]


@settings(
    max_examples=150,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(history=_history)
def test_replay_matches_reference_and_order_insensitive(history):
    history = _legalize(history)
    with tempfile.TemporaryDirectory(prefix="replay_ref_") as base:
        fwd = _write_table(base, history)
        files_f, tombs_f, *_meta_f = _state(fwd)
        # within-commit order reversed: reconciliation must not care
        rev = _write_table(
            base, [list(reversed(c)) for c in history]
        )
        files_r, tombs_r, *_meta_r = _state(rev)
        assert (files_f, tombs_f) == (files_r, tombs_r), (
            "within-commit order changed the replayed state",
            history,
        )
        ref_files, ref_tombs = _ref_replay(history)
        assert files_f == ref_files, (history, files_f, ref_files)
        assert tombs_f == ref_tombs, (history, tombs_f, ref_tombs)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(history=_history, data=st.data())
def test_replay_compacted_file_order_insensitive(history, data):
    """FOREIGN-ORDERING INVARIANCE (r14, generalizing the
    test_interop foreign-minor-compaction example): a compacted file
    is a reconciliation UNIT — per the spec its action order must not
    matter, and a foreign engine may emit commitInfo lines and order
    removes BEFORE adds (the reverse of our adds-first emission).
    Property: take our own compactor's file for a random aligned
    range, rewrite it foreign-style (commitInfo prepended, removes
    first, remaining actions in original relative order), delete the
    range's interior JSON commits, and the replayed state must equal
    the plain full-JSON replay. This is the net over the shield
    re-add + add_seq machinery: with removes first, a descriptor-less
    remove applies against the PRE-state add (add_seq < commit_seq,
    heuristic live) and the shield re-add must restore the file.

    SCOPE (r15): units carrying a MIRROR pair — the same (path, dvId)
    as both an add and a remove, the compactor's sequential
    replay-mirror for vanishing-trace cancel/supersede shapes — are
    order-significant BY NECESSITY: Delta's action vocabulary cannot
    cancel a tombstone without an add, and the protocol forbids
    same-identity duplicate file actions inside one unit, so a
    CONFORMING foreign engine can never emit such a pair unordered
    either; replay of a compacted file is sequential in file order
    (ours and delta-spark's both). Those units are assumed out of the
    reorder property (hypothesis.assume) and their file-order
    correctness is pinned by the substitution property above plus the
    explicit regressions in test_log_compaction.py."""
    import json as _json
    import os

    from dask_deltalake_spark.delta.maintenance import compact_log

    with tempfile.TemporaryDirectory(prefix="replay_prop_") as base:
        plain = _write_table(base, history)
        want = _state(plain)

        n = len(history)
        i = data.draw(st.integers(min_value=0, max_value=n - 1), label="i")
        j = data.draw(st.integers(min_value=i, max_value=n - 1), label="j")
        tbl = _write_table(os.path.join(base, "reord"), history)
        _SNAPSHOT_CACHE.clear()
        compact_log(tbl, start_version=i, end_version=j)
        cpath = os.path.join(
            tbl, "_delta_log", f"{i:020d}.{j:020d}.compacted.json"
        )
        actions = [
            _json.loads(ln)
            for ln in open(cpath, encoding="utf-8")
            if ln.strip()
        ]
        removes = [a for a in actions if "remove" in a]
        rest = [a for a in actions if "remove" not in a]
        from hypothesis import assume

        from dask_deltalake_spark.delta.protocol import (
            dv_unique_id as _uid_of,
        )

        def _ids(acts, key):
            out = set()
            for a in acts:
                d = a.get(key)
                if d:
                    out.add((d["path"], _uid_of(d.get("deletionVector"))))
            return out

        assume(not (_ids(actions, "add") & _ids(actions, "remove")))
        foreign = (
            [{"commitInfo": {"timestamp": 1, "operation": "COMPACTION",
                             "engineInfo": "foreign/1.0"}}]
            + removes
            + rest
        )
        with open(cpath, "w", encoding="utf-8") as fh:
            for a in foreign:
                fh.write(_json.dumps(a) + "\n")
        # retention deletes the covered commits (keep the tail anchor)
        for v in range(i, j + 1):
            if v == n - 1:
                continue
            os.remove(os.path.join(tbl, "_delta_log", f"{v:020d}.json"))
        _SNAPSHOT_CACHE.clear()
        assert _state(tbl) == want, ("reordered", history, i, j)
