"""Log compaction files (Delta spec "Log Compaction Files"):
``{x:020d}.{y:020d}.compacted.json`` = action-reconciled commits x..y.

Covers: replay equality with and without the compacted file, reader
preference for an aligned range (proven by replaying THROUGH deleted
commits), reconciliation semantics (add+remove netting, txn max,
domain-removal markers preserved), checkpoint interplay (range
starting at cp+1), and retention cleanup of expired compactions.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from dask_deltalake_spark.delta.log import DeltaLog, _SNAPSHOT_CACHE
from dask_deltalake_spark.delta.maintenance import (
    cleanup_metadata,
    compact_log,
    create_checkpoint,
)
from dask_deltalake_spark.delta.mutate import delete_where
from dask_deltalake_spark.delta.reader import read_delta
from dask_deltalake_spark.delta.writer import to_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _build(spark, path):
    """v0 create, v1 append, v2 delete (removes), v3 append."""
    to_delta(_df(spark, 0, 10), path)
    to_delta(_df(spark, 10, 20), path, mode="append")
    delete_where(path, [("k", "<", 5)], spark=spark)
    to_delta(_df(spark, 20, 30), path, mode="append")


def _state(snap):
    return (
        set(snap.files),
        set(snap.tombstones),
        snap.metadata.schema_string,
        dict(snap.transactions),
        dict(snap.domain_metadata),
    )


def test_compacted_replay_equals_commit_replay(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path)
    before = _state(DeltaLog(path).snapshot())
    name = compact_log(path)
    assert name == f"{0:020d}.{3:020d}.compacted.json"
    _SNAPSHOT_CACHE.clear()
    after = _state(DeltaLog(path).snapshot())
    assert after == before
    got = read_delta(path, spark=spark)
    assert got.count() == 25
    assert got.agg(F.min("k")).collect()[0][0] == 5


def test_reader_uses_compaction_through_deleted_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path)
    before = _state(DeltaLog(path).snapshot())
    compact_log(path)
    # delete the covered mid-range commits: without the compacted file
    # replay MUST fail, with it the snapshot is identical
    for v in (1, 2):
        os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))
    _SNAPSHOT_CACHE.clear()
    assert _state(DeltaLog(path).snapshot()) == before
    cp = os.path.join(
        path, "_delta_log", f"{0:020d}.{3:020d}.compacted.json"
    )
    os.rename(cp, cp + ".bak")
    _SNAPSHOT_CACHE.clear()
    with pytest.raises(ValueError, match="Missing commit"):
        DeltaLog(path).snapshot()
    os.rename(cp + ".bak", cp)


def test_partial_range_and_checkpoint_alignment(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path)
    create_checkpoint(path, version=1)
    before = _state(DeltaLog(path).snapshot())
    # post-checkpoint default range: starts at cp+1
    name = compact_log(path)
    assert name == f"{2:020d}.{3:020d}.compacted.json"
    # delete the mid commit only (the tail commit anchors latest-
    # version discovery, as it always does in real retention): replay
    # from the checkpoint must route through the compacted range
    os.remove(os.path.join(path, "_delta_log", f"{2:020d}.json"))
    _SNAPSHOT_CACHE.clear()
    assert _state(DeltaLog(path).snapshot()) == before


def test_reconciliation_semantics(spark, tmp_path):
    from dask_deltalake_spark.delta.writer import write_commit

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path, txn_app_id="app", txn_version=1)
    to_delta(
        _df(spark, 10, 20), path, mode="append",
        txn_app_id="app", txn_version=7,
    )
    log = DeltaLog(path)
    v = log.latest_version() + 1
    write_commit(
        path,
        v,
        [
            {"commitInfo": {"timestamp": 1, "operation": "TEST"}},
            {"domainMetadata": {"domain": "d1", "configuration": "x"}},
            {"domainMetadata": {"domain": "d2", "configuration": "y"}},
        ],
    )
    write_commit(
        path,
        v + 1,
        [{"domainMetadata": {"domain": "d2", "removed": True}}],
    )
    compact_log(path)
    actions = log.read_compacted_actions(0, v + 1)
    kinds = [next(iter(a)) for a in actions]
    assert "commitInfo" not in kinds  # dropped like checkpoints drop it
    txn = [a["txn"] for a in actions if "txn" in a]
    assert len(txn) == 1 and txn[0]["version"] == 7  # latest per appId
    doms = {
        a["domainMetadata"]["domain"]: a["domainMetadata"]
        for a in actions
        if "domainMetadata" in a
    }
    assert not doms["d1"].get("removed")  # live (absent or False)
    # d2 was added AND removed inside this start=0 range: the state
    # diff nets it away entirely — the compaction substitutes only at
    # position 0 (empty pre-state), so there is nothing to resurrect
    # and no tombstone to carry (r13 state-diff derivation)
    assert "d2" not in doms
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    assert snap.transactions == {"app": 7}
    assert "d1" in snap.domain_metadata and "d2" not in snap.domain_metadata

    # a MID-log range whose pre-state holds the domain MUST preserve
    # the removal marker — replay from the pre-range state would
    # otherwise resurrect it
    compact_log(path, start_version=v + 1, end_version=v + 1)
    mid = log.read_compacted_actions(v + 1, v + 1)
    mid_doms = {
        a["domainMetadata"]["domain"]: a["domainMetadata"]
        for a in mid
        if "domainMetadata" in a
    }
    assert mid_doms["d2"]["removed"] is True


def test_add_remove_netting(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path)  # v2's delete removed+re-added rewritten files
    log = DeltaLog(path)
    compact_log(path)
    actions = log.read_compacted_actions(0, 3)
    added = {a["add"]["path"] for a in actions if "add" in a}
    removed = {a["remove"]["path"] for a in actions if "remove" in a}
    assert not (added & removed), "net state only: no path on both sides"
    snap = log.snapshot()
    assert added == set(snap.files)
    assert removed == set(snap.tombstones)


def test_cleanup_deletes_expired_compactions(spark, tmp_path):
    import time as _time

    path = str(tmp_path / "t")
    _build(spark, path)
    compact_log(path, 0, 1)  # range starting below the future boundary
    create_checkpoint(path, version=2)
    old = _time.time() - 100 * 24 * 3600
    for v in (0, 1):
        os.utime(
            os.path.join(path, "_delta_log", f"{v:020d}.json"), (old, old)
        )
    doomed = cleanup_metadata(path)
    assert f"{0:020d}.{1:020d}.compacted.json" in doomed
    _SNAPSHOT_CACHE.clear()
    assert DeltaLog(path).snapshot().version == 3


def test_compact_checkpoint_only_log_raises_clearly(spark, tmp_path):
    import glob

    from dask_deltalake_spark.delta.maintenance import create_checkpoint

    path = str(tmp_path / "t")
    to_delta(_df(spark, 0, 10), path)
    create_checkpoint(path)
    for j in glob.glob(os.path.join(path, "_delta_log", "*.json")):
        os.remove(j)
    _SNAPSHOT_CACHE.clear()
    with pytest.raises(ValueError, match="no JSON commits"):
        compact_log(path)


def test_compact_range_straddling_checkpoint_raises(spark, tmp_path):
    """A range containing a checkpoint version is dead weight — replay
    anchors at the checkpoint and starts at cp+1, so the range start
    could never align with a replay position (ADVICE r13). compact_log
    refuses instead of silently writing a file no reader substitutes,
    and names the aligned range to use instead."""
    path = str(tmp_path / "t")
    _build(spark, path)  # v0..v3
    create_checkpoint(path, version=2)
    with pytest.raises(ValueError, match=r"checkpoint version\(s\) \[2\]"):
        compact_log(path, 0, 3)
    with pytest.raises(ValueError, match="3..3 instead"):
        compact_log(path, 2, 3)  # cp at the range START is dead too
    # the aligned post-checkpoint range still writes
    assert compact_log(path, 3, 3) == f"{3:020d}.{3:020d}.compacted.json"
    # and the default range starts at cp+1 (never straddles)
    assert compact_log(path) == f"{3:020d}.{3:020d}.compacted.json"


def test_prefix_coverage_bounded_at_requested_version(spark, tmp_path):
    """Time travel INTO a compaction chain that ends below the
    earliest retained JSON commit (ADVICE r13): versions=[..tail..],
    compaction 0..2, snapshot(version=2) must replay by substituting
    the chain — the prefix-coverage walk only needs coverage up to the
    REQUESTED version, not up to versions[0]. Versions the chain does
    NOT cover still raise the clear retention error."""
    path = str(tmp_path / "t")
    _build(spark, path)  # v0..v3
    want_v2 = _state(DeltaLog(path).snapshot(version=2))
    compact_log(path, 0, 2)
    # retention-style prefix deletion: v0..v2 JSONs gone, tail remains
    for v in (0, 1, 2):
        os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))
    _SNAPSHOT_CACHE.clear()
    log = DeltaLog(path)
    assert log.versions() == [3]
    snap = log.snapshot(version=2)
    assert snap.version == 2
    assert _state(snap) == want_v2
    # a version BELOW the chain's end but not at a range boundary:
    # the chain only substitutes whole ranges, so v1 is unreachable
    with pytest.raises(ValueError, match="retained log history"):
        log.snapshot(version=1)
    # and the latest snapshot routes through the chain as before
    assert DeltaLog(path).snapshot().version == 3


def test_compaction_emits_canceling_add_for_vanished_tombstone(
    spark, tmp_path
):
    """Regression (r14, found by the substitution property's random
    exploration): commit sequence add(p) / remove(p) / [add(p),
    add(p, dv)] — the final commit's first add CANCELS the
    descriptor-less tombstone and its second add supersedes WITHOUT
    re-archiving (no vector on the superseded add). Compacting just
    that final commit must emit the intermediate canceling add, or
    the substituted replay resurrects the tombstone that plain
    replay canceled."""
    import json as _json

    from dask_deltalake_spark.delta.protocol import (
        AddAction,
        Metadata,
        Protocol,
        RemoveAction,
    )
    from dask_deltalake_spark.delta.writer import write_commit

    path = str(tmp_path / "t")
    meta = Metadata(
        id="fixed", schema_string=_json.dumps({
            "type": "struct",
            "fields": [{"name": "id", "type": "long",
                        "nullable": True, "metadata": {}}],
        }),
        configuration={
            "delta.deletedFileRetentionDuration": "interval 876000 hours",
        },
    ).to_json()
    proto = Protocol(
        min_reader_version=3, min_writer_version=7,
        reader_features=["deletionVectors"],
        writer_features=["deletionVectors"],
    ).to_json()
    dv = {"storageType": "i", "pathOrInlineDv": "dv-one",
          "cardinality": 1}

    def add(d, ts):
        return AddAction(
            path="a.parquet", size=10, partition_values={},
            modification_time=ts, data_change=True, deletion_vector=d,
        ).to_json()

    write_commit(path, 0, [proto, meta, add(None, 1000)])
    write_commit(path, 1, [RemoveAction(
        path="a.parquet", deletion_timestamp=1001, data_change=True,
    ).to_json()])
    write_commit(path, 2, [add(None, 1002), add(dv, 1002)])

    _SNAPSHOT_CACHE.clear()
    want = _state(DeltaLog(path).snapshot())
    assert want[1] == set(), "plain replay canceled the tombstone"

    compact_log(path, start_version=2, end_version=2)
    actions = DeltaLog(path).read_compacted_actions(2, 2)
    cancel = [
        a for a in actions
        if "add" in a and a["add"].get("deletionVector") is None
    ]
    final = [
        a for a in actions
        if "add" in a and a["add"].get("deletionVector") is not None
    ]
    assert cancel and final, "both the canceling and final add emit"
    assert actions.index(cancel[0]) < actions.index(final[0])

    # the substituted replay (commit 2's JSON deleted... kept as tail
    # anchor — force the substitution by removing only v1? v1 is
    # below the range; instead verify state equality directly, which
    # exercises the reader's preference for the aligned range)
    _SNAPSHOT_CACHE.clear()
    assert _state(DeltaLog(path).snapshot()) == want


def _keyed_state(path):
    """(live (path, uid) set, tombstone (path, uid, ts) set) — the
    full keyed tuple the substitution property compares (the public
    path-keyed view can hide a resurrected identity behind a newer
    tombstone on the same path)."""
    from dask_deltalake_spark.delta.protocol import dv_unique_id

    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    return (
        {(p, dv_unique_id(a.deletion_vector))
         for p, a in snap.files.items()},
        {(r.path, dv_unique_id(r.deletion_vector), r.deletion_timestamp)
         for r in snap.tombstones_all},
    )


def _write_cancel_history(path, commits):
    """Shared scaffolding for the vanished-trace regressions: a
    DV-featured table whose commits are raw action lists."""
    import json as _json

    from dask_deltalake_spark.delta.protocol import Metadata, Protocol
    from dask_deltalake_spark.delta.writer import write_commit

    meta = Metadata(
        id="fixed", schema_string=_json.dumps({
            "type": "struct",
            "fields": [{"name": "id", "type": "long",
                        "nullable": True, "metadata": {}}],
        }),
        configuration={
            "delta.deletedFileRetentionDuration": "interval 876000 hours",
        },
    ).to_json()
    proto = Protocol(
        min_reader_version=3, min_writer_version=7,
        reader_features=["deletionVectors"],
        writer_features=["deletionVectors"],
    ).to_json()
    write_commit(path, 0, [proto, meta] + commits[0])
    for v, acts in enumerate(commits[1:], start=1):
        write_commit(path, v, acts)


_DV1 = {"storageType": "i", "pathOrInlineDv": "dv-one", "cardinality": 1}


def _add(d, ts):
    from dask_deltalake_spark.delta.protocol import AddAction

    return AddAction(
        path="a.parquet", size=10, partition_values={},
        modification_time=ts, data_change=True, deletion_vector=d,
    ).to_json()


def _rem(d, ts):
    from dask_deltalake_spark.delta.protocol import RemoveAction

    return RemoveAction(
        path="a.parquet", deletion_timestamp=ts, data_change=True,
        deletion_vector=d,
    ).to_json()


def test_compaction_mirrors_canceled_superseded_removed_tombstone(
    spark, tmp_path
):
    """Regression (r15, ADVICE): add(p) / remove(p) / [add(p),
    add(p, dv)] / remove(p, dv) — the r14 canceling-add fix's `a is
    None` branch was commented unreachable, but this shape reaches it:
    the vanished ('' ) tombstone has NO end live add (the superseding
    add was itself removed). The compactor must source the superseding
    identity from the path's end tombstone and emit the canceling +
    superseding add pair before the removes, or substituted replay of
    [2..3] resurrects the ('' ) tombstone plain replay canceled."""
    path = str(tmp_path / "t")
    _write_cancel_history(path, [
        [_add(None, 1000)],
        [_rem(None, 1001)],
        [_add(None, 1002), _add(_DV1, 1002)],
        [_rem(_DV1, 1003)],
    ])
    want = _keyed_state(path)
    assert want == (set(), {("a.parquet", "idv-one", 1003)}) or want[0] == set()

    compact_log(path, start_version=2, end_version=3)
    # force the substitution: delete the range's interior JSON (keep
    # the final commit as the latest-version anchor)
    os.remove(os.path.join(path, "_delta_log", f"{2:020d}.json"))
    assert _keyed_state(path) == want, (
        "substituted replay resurrected the canceled tombstone"
    )
    # and the compacted unit carries the mirror pair, cancel first
    actions = DeltaLog(path).read_compacted_actions(2, 3)
    adds = [a["add"] for a in actions if "add" in a]
    assert [a.get("deletionVector") is None for a in adds] == [True, False]


def test_compaction_mirrors_evicted_live_add_with_canceled_tombstone(
    spark, tmp_path
):
    """Regression (r15, found widening the ADVICE shape's matrix —
    the DUAL of the vanished tombstone): start state has a LIVE
    descriptor-less add; the range evicts it (remove(p)), cancels the
    eviction tombstone (add(p)), supersedes (add(p, dv)) and removes
    the superseder — so the diff's only remove is a stale-identity
    no-pop against the pre-range live add, and substituted replay
    kept LIVE a file plain replay evicted (phantom rows at any
    scale). The compactor must emit a superseding transient add the
    emitted remove then pops."""
    path = str(tmp_path / "t")
    _write_cancel_history(path, [
        [_add(None, 1000)],
        [_rem(None, 1001), _add(None, 1001), _add(_DV1, 1001)],
        [_rem(_DV1, 1002)],
    ])
    want = _keyed_state(path)
    assert want[0] == set(), "plain replay evicted the live add"

    compact_log(path, start_version=1, end_version=2)
    os.remove(os.path.join(path, "_delta_log", f"{1:020d}.json"))
    got = _keyed_state(path)
    assert got == want, (
        "substituted replay kept a file live that plain replay evicted"
    )
