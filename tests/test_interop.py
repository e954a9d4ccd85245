"""Foreign-engine interop: hand-written delta-spark-style commits and
checkpoints are parsed, honored, and re-serialized WITHOUT silently
stripping or mangling what the other engine wrote (VERDICT r12 #3 —
the thread the r12 foreign-remove round-trip opened; reference parity:
the reference delegates all of this to delta-rs, so the contract under
test is the public Delta protocol spec itself).

Covers the r13 additions:
- one-field-only extendedFileMetadata removes round-trip the present
  field un-gated instead of dropping it (ADVICE r12 #2);
- tags-only tombstones whose path is still live get partitionValues/
  size backfilled at checkpoint time so extendedFileMetadata is
  legitimately claimable (ADVICE r12 #1);
- foreign add `tags` survive parse → re-checkpoint → replay
  (the same silent-strip class as the r12 remove fix);
- nested-struct stats JSON from a foreign writer neither breaks
  data skipping nor is altered by our re-serialization.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow.parquet as pq
import pytest

from urllib.parse import unquote

from dask_deltalake_spark import read_delta, to_delta
from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
from dask_deltalake_spark.delta.maintenance import create_checkpoint
from dask_deltalake_spark.delta.protocol import AddAction, RemoveAction


def _now_ms() -> int:
    return int(time.time() * 1000)


def _append_foreign_commit(table_path: str, version: int, actions: list):
    """Write a commit json the way a foreign engine would (no helper
    from our writer — the point is the bytes, not our serializer)."""
    log_dir = os.path.join(table_path, "_delta_log")
    commit_info = {
        "commitInfo": {
            "timestamp": _now_ms(),
            "operation": "WRITE",
            "engineInfo": "Apache-Spark/3.5.0 Delta-Lake/3.1.0",
        }
    }
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        fh.write(json.dumps(commit_info) + "\n")
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _v0_adds(table_path: str) -> list:
    log_dir = os.path.join(table_path, "_delta_log")
    return [
        json.loads(line)["add"]
        for line in open(os.path.join(log_dir, f"{0:020d}.json"))
        if '"add"' in line
    ]


# ---------------------------------------------------------------------------
# One-field-only extendedFileMetadata removes (ADVICE r12 #2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("present", ["size", "partitionValues"])
def test_one_field_extended_remove_round_trips_ungated(present):
    """A foreign remove with extendedFileMetadata=true but only ONE of
    partitionValues/size present (an asymmetric foreign shape): the
    pre-r13 to_json dropped the present field entirely; now it is
    re-emitted UN-GATED — the flag is not re-claimed (flag-true with
    a null partitionValues is the spec-malformed shape strict engines
    NPE on), but the field a foreign engine wrote survives OUR
    round trip."""
    d = {
        "path": "part-0001.parquet",
        "deletionTimestamp": 123,
        "dataChange": True,
        "extendedFileMetadata": True,
    }
    if present == "size":
        d["size"] = 4567
    else:
        d["partitionValues"] = {"p": "1"}

    r = RemoveAction.from_json(d)
    out = r.to_json()["remove"]
    assert "extendedFileMetadata" not in out  # not re-claimable
    if present == "size":
        assert out["size"] == 4567
        assert "partitionValues" not in out
    else:
        assert out["partitionValues"] == {"p": "1"}
        assert "size" not in out
    # and the un-gated emission itself round-trips stably (fixpoint)
    r2 = RemoveAction.from_json(out)
    assert r2.to_json()["remove"] == out


def test_one_field_remove_survives_recheckpoint(spark, tmp_path):
    """End-to-end: the asymmetric foreign remove above, applied to a
    real table, keeps its size field through OUR checkpoint (un-gated,
    flag false) when the removed path is gone (nothing to backfill
    partitionValues from)."""
    path = str(tmp_path / "t")
    df = spark.range(10).selectExpr("id")
    to_delta(df, path)  # v0
    victim = _v0_adds(path)[0]
    _append_foreign_commit(
        path,
        1,
        [
            {
                "remove": {
                    "path": victim["path"],
                    "deletionTimestamp": _now_ms(),
                    "dataChange": True,
                    "extendedFileMetadata": True,
                    # size only — no partitionValues
                    "size": victim["size"],
                }
            }
        ],
    )
    cp = create_checkpoint(path)
    rem = [
        r["remove"]
        for r in pq.read_table(cp).to_pylist()
        if r.get("remove") and r["remove"].get("path")
    ]
    mine = [
        r
        for r in rem
        if unquote(r["path"]) == unquote(victim["path"])
    ]
    assert mine, "the foreign tombstone must survive our checkpoint"
    r = mine[0]
    assert r["size"] == victim["size"]  # the present field survives
    # the flag is not re-claimed without partitionValues (an
    # unpartitioned table's add DOES carry partitionValues={}, so the
    # only un-backfillable shape is a dead path — which this is)
    assert not r["extendedFileMetadata"]
    assert r["partitionValues"] is None


# ---------------------------------------------------------------------------
# Tags-only tombstone backfill at checkpoint time (ADVICE r12 #1)
# ---------------------------------------------------------------------------


def test_tags_only_tombstone_backfilled_at_checkpoint(spark, tmp_path):
    """A tags-only tombstone (e.g. a replay-archive remove parsed from
    a pre-r12 checkpoint: deletionVector identity + tags, no
    partitionValues/size) whose PATH is still live — the
    superseded-vector shape, where the live add describes the same
    physical parquet file. The checkpoint writer backfills
    partitionValues/size from that add, so extendedFileMetadata is
    legitimately claimed and a strict foreign engine re-serializing
    our checkpoint keeps the tags instead of dropping un-gated
    fields."""
    path = str(tmp_path / "t")
    df = spark.range(20).selectExpr("id", "CAST(id % 2 AS INT) AS p")
    to_delta(df, path, partition_by=["p"])  # v0
    victim = next(
        a for a in _v0_adds(path) if a["partitionValues"] == {"p": "1"}
    )
    # foreign remove of a STALE vector identity on the live path:
    # reconciliation is (path, dvId)-keyed, so the plain add survives
    # and the remove lands in the tombstone set — tags-only
    _append_foreign_commit(
        path,
        1,
        [
            {
                "remove": {
                    "path": victim["path"],
                    "deletionTimestamp": _now_ms(),
                    "dataChange": True,
                    "deletionVector": {
                        "storageType": "u",
                        "pathOrInlineDv": "ab^-aqEH.-t@S}K{vb[*k^",
                        "offset": 4,
                        "sizeInBytes": 40,
                        "cardinality": 6,
                    },
                    "tags": {"foreignMarker": "keep-me"},
                }
            }
        ],
    )
    # the live add is untouched (stale-vector remove, different dvId)
    assert read_delta(path, spark=spark).count() == 20

    cp = create_checkpoint(path)
    rem = [
        r["remove"]
        for r in pq.read_table(cp).to_pylist()
        if r.get("remove") and r["remove"].get("path")
    ]
    mine = [
        r
        for r in rem
        if unquote(r["path"]) == unquote(victim["path"])
    ]
    assert mine, "the tags-only tombstone must survive our checkpoint"
    r = mine[0]
    # backfilled from the live add with the same path → flag claimed
    assert r["extendedFileMetadata"] is True
    assert dict(r["partitionValues"]) == victim["partitionValues"]
    assert r["size"] == victim["size"]
    assert dict(r["tags"]) == {"foreignMarker": "keep-me"}

    # a CHECKPOINT-ANCHORED replay parses the backfilled tombstone
    # with the fields and flag intact (drive the loader directly —
    # the session-cached snapshot replays the JSON tail, where the
    # tombstone is legitimately still tags-only)
    log = DeltaLog(path)
    _, cp_removes, *_ = log._load_checkpoint(1)
    parsed = [
        t
        for t in cp_removes.values()
        if t.path == unquote(victim["path"])
    ]
    assert parsed and parsed[0].tags == {"foreignMarker": "keep-me"}
    assert parsed[0].partition_values == victim["partitionValues"]
    assert parsed[0].size == victim["size"]
    assert parsed[0].extended_file_metadata is True
    # and the live table is unchanged
    assert read_delta(path, spark=spark).count() == 20


# ---------------------------------------------------------------------------
# Foreign add tags (VERDICT r12 #3 — same class as the remove fix)
# ---------------------------------------------------------------------------


def test_foreign_add_tags_survive_parse_and_recheckpoint(spark, tmp_path):
    """A foreign commit whose add carries spec `tags` (delta-spark
    stamps OPTIMIZE ZCube ids there): before r13 the parse dropped
    them, so our checkpoint silently stripped what the foreign engine
    wrote. Now: JSON parse keeps them, our checkpoint carries them,
    a checkpoint-anchored replay still sees them, and a second
    re-checkpoint is a fixpoint."""
    path = str(tmp_path / "t")
    to_delta(spark.range(10).coalesce(1).selectExpr("id"), path)  # v0
    # foreign append: a second data file with tags (reuse v0's file
    # bytes under a new name so the scan stays real)
    v0 = _v0_adds(path)[0]
    src = os.path.join(path, v0["path"])
    newname = "part-ffff-foreign.snappy.parquet"
    import shutil

    shutil.copyfile(src, os.path.join(path, newname))
    foreign_add = {
        "add": {
            "path": newname,
            "partitionValues": {},
            "size": v0["size"],
            "modificationTime": _now_ms(),
            "dataChange": True,
            "stats": v0.get("stats"),
            "tags": {"ZCUBE_ID": "zc-123", "INSERTION_TIME": "170000"},
        }
    }
    _append_foreign_commit(path, 1, [foreign_add])

    # parse keeps the tags
    log = DeltaLog(path)
    snap = log.snapshot()
    a = snap.add_actions_by_path[newname] if hasattr(
        snap, "add_actions_by_path"
    ) else next(x for x in snap.add_actions if x.path == newname)
    assert a.tags == {"ZCUBE_ID": "zc-123", "INSERTION_TIME": "170000"}
    assert read_delta(path, spark=spark).count() == 20

    # checkpoint carries them
    cp = create_checkpoint(path)
    rows = pq.read_table(cp).to_pylist()
    cp_add = next(
        r["add"]
        for r in rows
        if r.get("add") and r["add"].get("path") == newname
    )
    assert dict(cp_add["tags"]) == {
        "ZCUBE_ID": "zc-123",
        "INSERTION_TIME": "170000",
    }
    # our own adds carry no tags — null, not empty map
    own = next(
        r["add"]
        for r in rows
        if r.get("add") and r["add"].get("path") == v0["path"]
    )
    assert own["tags"] is None

    # checkpoint-anchored replay sees them (fresh log, replay from cp)
    snap2 = DeltaLog(path).snapshot()
    a2 = next(x for x in snap2.add_actions if x.path == newname)
    assert a2.tags == {"ZCUBE_ID": "zc-123", "INSERTION_TIME": "170000"}

    # and re-checkpointing from the checkpoint-anchored state is a
    # fixpoint for the tags
    to_delta(spark.range(5).selectExpr("id"), path, mode="append")
    cp2 = create_checkpoint(path)
    cp2_add = next(
        r["add"]
        for r in pq.read_table(cp2).to_pylist()
        if r.get("add") and r["add"].get("path") == newname
    )
    assert dict(cp2_add["tags"]) == {
        "ZCUBE_ID": "zc-123",
        "INSERTION_TIME": "170000",
    }


def test_add_tags_round_trip_unit():
    """AddAction JSON round-trip: tags preserved verbatim; absent tags
    stay absent (no empty-map pollution of our own commits)."""
    d = {
        "path": "f.parquet",
        "partitionValues": {},
        "size": 1,
        "modificationTime": 2,
        "dataChange": True,
        "tags": {"k": "v"},
    }
    a = AddAction.from_json(d)
    assert a.tags == {"k": "v"}
    assert a.to_json()["add"]["tags"] == {"k": "v"}
    d.pop("tags")
    a2 = AddAction.from_json(d)
    assert a2.tags is None
    assert "tags" not in a2.to_json()["add"]


# ---------------------------------------------------------------------------
# Nested-struct stats JSON (VERDICT r12 #3)
# ---------------------------------------------------------------------------


def test_nested_struct_stats_neither_break_skipping_nor_mutate(
    spark, tmp_path
):
    """A foreign add whose stats JSON has NESTED struct minValues/
    maxValues (delta-spark writes stats for struct columns this way):
    our data skipping must stay conservative (keep the file — a dict
    is not comparable to a scalar), the filtered read must still be
    correct, and our checkpoint must carry the stats string VERBATIM
    (stats are opaque JSON to re-serialization — rewriting them is
    how engines corrupt each other's skipping)."""
    path = str(tmp_path / "t")
    to_delta(spark.range(10).coalesce(1).selectExpr("id"), path)  # v0
    v0 = _v0_adds(path)[0]
    src = os.path.join(path, v0["path"])
    newname = "part-eeee-foreign.snappy.parquet"
    import shutil

    shutil.copyfile(src, os.path.join(path, newname))
    nested_stats = json.dumps(
        {
            "numRecords": 10,
            "minValues": {"id": 0, "nested": {"a": 1, "b": {"c": 2}}},
            "maxValues": {"id": 9, "nested": {"a": 5, "b": {"c": 7}}},
            "nullCount": {"id": 0, "nested": {"a": 0, "b": {"c": 0}}},
        }
    )
    _append_foreign_commit(
        path,
        1,
        [
            {
                "add": {
                    "path": newname,
                    "partitionValues": {},
                    "size": v0["size"],
                    "modificationTime": _now_ms(),
                    "dataChange": True,
                    "stats": nested_stats,
                }
            }
        ],
    )
    # filtered read over the table with the foreign-stats file: the
    # id range [0,9] matches id==3, so BOTH files' rows must appear
    got = (
        read_delta(path, filter=[("id", "==", 3)], spark=spark)
        .count()
    )
    assert got == 2  # one row per physical file
    # a filter OUTSIDE both files' id range skips both (stats skipping
    # still works on the top-level keys of the nested stats JSON)
    assert (
        read_delta(path, filter=[("id", "==", 99)], spark=spark).count()
        == 0
    )
    # checkpoint carries the stats string VERBATIM
    cp = create_checkpoint(path)
    cp_add = next(
        r["add"]
        for r in pq.read_table(cp).to_pylist()
        if r.get("add") and r["add"].get("path") == newname
    )
    assert cp_add["stats"] == nested_stats


def test_foreign_checkpoint_with_unknown_columns_replays(spark, tmp_path):
    """A foreign engine's checkpoint carrying columns and struct
    subfields we never write (delta-spark's `stats_parsed` sibling
    struct, commitInfo-in-checkpoint, per-add custom subfields): our
    replay must read the actions it understands and IGNORE the rest —
    a reader that chokes on unknown checkpoint columns bricks every
    table checkpointed by a newer engine. The spec explicitly allows
    readers to ignore unrecognized fields."""
    import pyarrow as pa

    path = str(tmp_path / "t")
    to_delta(spark.range(10).coalesce(1).selectExpr("id"), path)  # v0
    v0 = _v0_adds(path)[0]

    # hand-build a FOREIGN checkpoint at version 0: the three known
    # actions plus (a) an unknown top-level column, (b) unknown
    # subfields inside add
    log_dir = os.path.join(path, "_delta_log")
    meta_line = next(
        json.loads(line)["metaData"]
        for line in open(os.path.join(log_dir, f"{0:020d}.json"))
        if '"metaData"' in line
    )
    proto_line = next(
        json.loads(line)["protocol"]
        for line in open(os.path.join(log_dir, f"{0:020d}.json"))
        if '"protocol"' in line
    )
    rows = [
        {"protocol": proto_line, "metaData": None, "add": None,
         "commitInfo": None},
        {"protocol": None, "metaData": {
            "id": meta_line["id"],
            "schemaString": meta_line["schemaString"],
            "partitionColumns": [],
            "configuration": [],
            "createdTime": meta_line.get("createdTime"),
            "format": {"provider": "parquet"},
        }, "add": None, "commitInfo": None},
        {"protocol": None, "metaData": None, "add": {
            "path": v0["path"],
            "partitionValues": [],
            "size": v0["size"],
            "modificationTime": v0["modificationTime"],
            "dataChange": False,
            "stats": v0.get("stats"),
            # unknown subfields a newer engine might write
            "stats_parsed": {"numRecords": 10},
            "clusteringProvider": "liquid",
        }, "commitInfo": None},
        # unknown top-level action column (delta-spark checkpoints can
        # carry commitInfo rows)
        {"protocol": None, "metaData": None, "add": None,
         "commitInfo": {"operation": "WRITE", "engineInfo": "foreign"}},
    ]
    schema = pa.schema(
        [
            pa.field("protocol", pa.struct(
                [("minReaderVersion", pa.int32()),
                 ("minWriterVersion", pa.int32())])),
            pa.field("metaData", pa.struct(
                [("id", pa.string()),
                 ("schemaString", pa.string()),
                 ("partitionColumns", pa.list_(pa.string())),
                 ("configuration", pa.map_(pa.string(), pa.string())),
                 ("createdTime", pa.int64()),
                 ("format", pa.struct([("provider", pa.string())]))])),
            pa.field("add", pa.struct(
                [("path", pa.string()),
                 ("partitionValues", pa.map_(pa.string(), pa.string())),
                 ("size", pa.int64()),
                 ("modificationTime", pa.int64()),
                 ("dataChange", pa.bool_()),
                 ("stats", pa.string()),
                 ("stats_parsed", pa.struct([("numRecords", pa.int64())])),
                 ("clusteringProvider", pa.string())])),
            pa.field("commitInfo", pa.struct(
                [("operation", pa.string()),
                 ("engineInfo", pa.string())])),
        ]
    )
    tbl = pa.Table.from_pylist(rows, schema=schema)
    import pyarrow.parquet as _pq

    cp_path = os.path.join(log_dir, f"{0:020d}.checkpoint.parquet")
    _pq.write_table(tbl, cp_path)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 0, "size": len(rows)}))

    # replay anchors on the foreign checkpoint and ignores the
    # unknown column + subfields. Clear the in-process snapshot cache
    # first: a foreign engine's checkpoint lands out-of-band, and the
    # cached to_delta-time state would otherwise serve the read
    # without ever parsing the foreign file (r13 review finding: this
    # test previously passed via the cache, i.e. the tolerance claim
    # was not actually exercised).
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    assert len(snap.add_actions) == 1
    assert snap.add_actions[0].path == unquote(v0["path"])
    assert read_delta(path, spark=spark).count() == 10

    # and appending on top of the foreign checkpoint works
    to_delta(spark.range(5).selectExpr("id"), path, mode="append")
    assert read_delta(path, spark=spark).count() == 15


# ---------------------------------------------------------------------------
# Foreign domainMetadata removal tombstones in checkpoints (r13)
# ---------------------------------------------------------------------------


def test_foreign_checkpoint_domain_removal_tombstone_not_resurrected(
    spark, tmp_path
):
    """delta-spark retains domainMetadata removal tombstones
    (removed=true) in its checkpoints. Before r13 our checkpoint
    parser read ANY domainMetadata row as a live domain — the JSON
    commit path dropped removed ones but the checkpoint path
    resurrected them, so the same logical state replayed differently
    depending on whether a checkpoint happened to anchor it. Pin:
    a foreign checkpoint carrying one live domain and one removal
    tombstone yields a snapshot with ONLY the live domain, and our
    re-checkpoint does not re-emit the removed one."""
    import pyarrow as pa

    path = str(tmp_path / "t")
    to_delta(spark.range(10).coalesce(1).selectExpr("id"), path)  # v0
    v0 = _v0_adds(path)[0]
    log_dir = os.path.join(path, "_delta_log")
    meta_line = next(
        json.loads(line)["metaData"]
        for line in open(os.path.join(log_dir, f"{0:020d}.json"))
        if '"metaData"' in line
    )
    proto_line = next(
        json.loads(line)["protocol"]
        for line in open(os.path.join(log_dir, f"{0:020d}.json"))
        if '"protocol"' in line
    )
    rows = [
        {"protocol": proto_line},
        {"metaData": {
            "id": meta_line["id"],
            "schemaString": meta_line["schemaString"],
            "partitionColumns": [],
            "configuration": [],
            "createdTime": meta_line.get("createdTime"),
            "format": {"provider": "parquet"},
        }},
        {"add": {
            "path": v0["path"],
            "partitionValues": [],
            "size": v0["size"],
            "modificationTime": v0["modificationTime"],
            "dataChange": False,
            "stats": v0.get("stats"),
        }},
        {"domainMetadata": {
            "domain": "delta.liquid",
            "configuration": '{"clusteringColumns":[]}',
            "removed": False,
        }},
        # the removal tombstone a foreign engine checkpoints
        {"domainMetadata": {
            "domain": "app.retired",
            "configuration": "",
            "removed": True,
        }},
    ]
    schema = pa.schema(
        [
            pa.field("protocol", pa.struct(
                [("minReaderVersion", pa.int32()),
                 ("minWriterVersion", pa.int32())])),
            pa.field("metaData", pa.struct(
                [("id", pa.string()),
                 ("schemaString", pa.string()),
                 ("partitionColumns", pa.list_(pa.string())),
                 ("configuration", pa.map_(pa.string(), pa.string())),
                 ("createdTime", pa.int64()),
                 ("format", pa.struct([("provider", pa.string())]))])),
            pa.field("add", pa.struct(
                [("path", pa.string()),
                 ("partitionValues", pa.map_(pa.string(), pa.string())),
                 ("size", pa.int64()),
                 ("modificationTime", pa.int64()),
                 ("dataChange", pa.bool_()),
                 ("stats", pa.string())])),
            pa.field("domainMetadata", pa.struct(
                [("domain", pa.string()),
                 ("configuration", pa.string()),
                 ("removed", pa.bool_())])),
        ]
    )
    norm = [{f.name: r.get(f.name) for f in schema} for r in rows]
    cp_path = os.path.join(log_dir, f"{0:020d}.checkpoint.parquet")
    pq.write_table(pa.Table.from_pylist(norm, schema=schema), cp_path)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 0, "size": len(rows)}))

    _SNAPSHOT_CACHE.clear()  # the foreign checkpoint landed out-of-band
    snap = DeltaLog(path).snapshot()
    assert snap.domain_metadata == {
        "delta.liquid": '{"clusteringColumns":[]}'
    }, "removed domain must not resurrect; live domain must survive"

    # our re-checkpoint (forced at a new version) keeps the live
    # domain and does not re-emit the removed one
    to_delta(spark.range(5).selectExpr("id"), path, mode="append")  # v1
    cp = create_checkpoint(path)
    doms = {
        r["domainMetadata"]["domain"]: r["domainMetadata"]
        for r in pq.read_table(cp).to_pylist()
        if r.get("domainMetadata") and r["domainMetadata"].get("domain")
    }
    assert "delta.liquid" in doms and not doms["delta.liquid"]["removed"]
    assert "app.retired" not in doms


def test_foreign_txn_high_water_mark_survives_recheckpoint(spark, tmp_path):
    """A foreign engine's `txn` action (SetTransaction — streaming
    idempotence high-water mark) must survive our re-checkpoint: if a
    checkpoint drops it, the foreign stream's re-delivered batch
    slips through as a duplicate after OUR maintenance ran. Pin the
    full path: foreign JSON commit -> our snapshot -> our checkpoint
    -> checkpoint-anchored replay, and our own idempotent-write gate
    honors the foreign mark."""
    path = str(tmp_path / "t")
    to_delta(spark.range(10).selectExpr("id"), path)  # v0
    _append_foreign_commit(
        path,
        1,
        [{"txn": {"appId": "foreign-stream-7", "version": 41,
                  "lastUpdated": _now_ms()}}],
    )
    snap = DeltaLog(path).snapshot()
    assert snap.transactions.get("foreign-stream-7") == 41

    cp = create_checkpoint(path)
    txns = [
        r["txn"]
        for r in pq.read_table(cp).to_pylist()
        if r.get("txn") and r["txn"].get("appId")
    ]
    assert {(t["appId"], t["version"]) for t in txns} == {
        ("foreign-stream-7", 41)
    }

    # checkpoint-anchored replay sees it (remove the JSON commits —
    # exactly what log cleanup does after a checkpoint — so the
    # checkpoint is the only carrier)
    os.remove(os.path.join(path, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(path, "_delta_log", f"{1:020d}.json"))
    _SNAPSHOT_CACHE.clear()
    snap2 = DeltaLog(path).snapshot()
    assert snap2.transactions.get("foreign-stream-7") == 41

    # and our idempotent-write gate skips a stale foreign version
    to_delta(
        spark.range(5).selectExpr("id"), path, mode="append",
        txn_app_id="foreign-stream-7", txn_version=41,
    )
    assert read_delta(path, spark=spark).count() == 10  # skipped
    to_delta(
        spark.range(5).selectExpr("id"), path, mode="append",
        txn_app_id="foreign-stream-7", txn_version=42,
    )
    assert read_delta(path, spark=spark).count() == 15  # advanced


def test_checkpoint_only_history_and_time_travel_shapes(spark, tmp_path):
    """On a checkpoint-only log (pure: zero JSON commits survive),
    history — which is commit-backed — returns the EMPTY 9-column
    frame (not a sort KeyError), and time travel below the checkpoint
    raises the same retention error as any cleaned-up log."""
    import glob

    from dask_deltalake_spark import read_delta_history
    from dask_deltalake_spark.delta.maintenance import HISTORY_COLUMNS

    path = str(tmp_path / "t")
    to_delta(spark.range(10).selectExpr("id"), path)  # v0
    to_delta(spark.range(5).selectExpr("id"), path, mode="append")  # v1
    create_checkpoint(path)
    for j in glob.glob(os.path.join(path, "_delta_log", "*.json")):
        os.remove(j)
    _SNAPSHOT_CACHE.clear()

    h = read_delta_history(path)
    assert h.shape == (0, len(HISTORY_COLUMNS))
    assert list(h.columns) == list(HISTORY_COLUMNS)

    with pytest.raises(ValueError, match="retained log history"):
        DeltaLog(path).snapshot(version=0)
    # the checkpoint version itself still reads
    assert DeltaLog(path).snapshot(version=1).version == 1
    assert read_delta(path, spark=spark).count() == 15


def test_txn_version_reset_is_latest_wins(spark, tmp_path):
    """SetTransaction reconciliation is LATEST-wins (spec rule;
    delta-spark and delta-rs both overwrite), not max: an application
    that legitimately resets its version (streaming checkpoint reset
    reusing the appId at 0, stamped by a foreign engine) must unpin
    the high-water mark, or every post-reset idempotent batch is
    silently skipped forever. Pinned through JSON replay, our
    checkpoint, and the checkpoint-anchored replay."""
    path = str(tmp_path / "t")
    to_delta(spark.range(10).selectExpr("id"), path,
             txn_app_id="app-x", txn_version=41)  # v0, mark 41
    # the foreign reset commit: same appId, LOWER version
    _append_foreign_commit(
        path, 1, [{"txn": {"appId": "app-x", "version": 0,
                           "lastUpdated": _now_ms()}}],
    )
    _SNAPSHOT_CACHE.clear()
    assert DeltaLog(path).snapshot().transactions["app-x"] == 0

    # post-reset batch 1 is admitted (max-reconciliation would skip)
    to_delta(spark.range(5).selectExpr("id"), path, mode="append",
             txn_app_id="app-x", txn_version=1)
    assert read_delta(path, spark=spark).count() == 15

    # and the reset survives our checkpoint + anchored replay
    cp = create_checkpoint(path)
    txns = [r["txn"] for r in pq.read_table(cp).to_pylist()
            if r.get("txn") and r["txn"].get("appId")]
    assert {(t["appId"], t["version"]) for t in txns} == {("app-x", 1)}


# ---------------------------------------------------------------------------
# Foreign minor compaction files consumed by the anchor chain walk (r14 —
# the VERDICT r13 #5 seam)
# ---------------------------------------------------------------------------


def test_foreign_minor_compaction_chain_replays_and_time_travels(
    spark, tmp_path
):
    """A FOREIGN engine's log compaction files — shapes our own
    compactor never writes: a commitInfo line kept at the top, removes
    emitted BEFORE adds, and a mid-log range with NO metaData/protocol
    re-declaration (the spec only requires the range's reconciled
    actions; ours re-declares unconditionally) — must substitute in
    the replay loop and chain through the prefix-coverage anchor walk
    exactly like our own. Pins three consumers at once: the chain walk
    over two foreign links after retention deleted the covered JSONs,
    time travel INTO the chain (version = a link's end, below the
    earliest retained JSON — the r14 walk-bound fix), and the clear
    retention error for a version no link boundary exposes."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.delta.mutate import delete_where

    path = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    to_delta(df, path)                                        # v0
    to_delta(df.withColumn("k", F.col("k") + 10), path,
             mode="append", txn_app_id="foreign-app",
             txn_version=3)                                   # v1 (+txn)
    delete_where(path, [("k", "<", 3)], spark=spark)          # v2 (COW)
    to_delta(df.withColumn("k", F.col("k") + 20), path,
             mode="append")                                   # v3

    log = DeltaLog(path)
    want = DeltaLog(path).snapshot()
    want_state = (
        dict((p, a.to_json()) for p, a in want.files.items()),
        sorted(t.to_json()["remove"]["path"] for t in want.tombstones_all),
        want.transactions,
    )
    want_v1_files = set(DeltaLog(path).snapshot(version=1).files)

    log_dir = os.path.join(path, "_delta_log")

    def _actions(v):
        return [
            json.loads(line)
            for line in open(os.path.join(log_dir, f"{v:020d}.json"))
            if line.strip()
        ]

    # foreign link 0..1: commitInfo kept (delta-spark keeps one),
    # protocol/metaData from v0, then the adds of v0+v1 and v1's txn
    a01 = [a for v in (0, 1) for a in _actions(v)]
    link1 = (
        [{"commitInfo": {"timestamp": _now_ms(),
                         "operation": "COMPACTION",
                         "engineInfo": "Apache-Spark/3.5.3 Delta-Lake/3.3.0"}}]
        + [a for a in a01 if "protocol" in a]
        + [a for a in a01 if "metaData" in a]
        + [a for a in a01 if "txn" in a]
        + [a for a in a01 if "add" in a]
    )
    # foreign link 2..3: NO metaData/protocol (unchanged in range),
    # REMOVES FIRST then adds — the reverse of our compactor's order
    a23 = [a for v in (2, 3) for a in _actions(v)]
    link2 = (
        [{"commitInfo": {"timestamp": _now_ms(),
                         "operation": "COMPACTION",
                         "engineInfo": "Apache-Spark/3.5.3 Delta-Lake/3.3.0"}}]
        + [a for a in a23 if "remove" in a]
        + [a for a in a23 if "add" in a]
    )
    for (s, e), acts in (((0, 1), link1), ((2, 3), link2)):
        with open(
            os.path.join(log_dir, f"{s:020d}.{e:020d}.compacted.json"), "w"
        ) as fh:
            for a in acts:
                fh.write(json.dumps(a) + "\n")

    # retention deletes everything the chain covers except the tail
    for v in (0, 1, 2):
        os.remove(os.path.join(log_dir, f"{v:020d}.json"))
    _SNAPSHOT_CACHE.clear()

    snap = DeltaLog(path).snapshot()
    got_state = (
        dict((p, a.to_json()) for p, a in snap.files.items()),
        sorted(t.to_json()["remove"]["path"] for t in snap.tombstones_all),
        snap.transactions,
    )
    assert got_state == want_state
    assert snap.transactions["foreign-app"] == 3
    assert read_delta(path, spark=spark).count() == 27  # 30 - 3 deleted

    # time travel INTO the chain: version 1 is a link boundary below
    # the earliest retained JSON (r14 prefix-walk bound)
    _SNAPSHOT_CACHE.clear()
    v1 = DeltaLog(path).snapshot(version=1)
    assert set(v1.files) == want_v1_files
    assert v1.transactions["foreign-app"] == 3

    # a version INSIDE a link (no boundary exposes it) stays a clear
    # retention error, not a file-not-found
    with pytest.raises(ValueError, match="retained log history"):
        DeltaLog(path).snapshot(version=2)


def test_foreign_version_checksum_validates_order_insensitively(
    spark, tmp_path
):
    """A FOREIGN .crc (delta-spark VersionChecksum) carries extra
    fields we never write (txnId, setTransactions, histogramOpt,
    numDeletedRecordsOpt) and emits readerFeatures/writerFeatures in
    ITS order — the spec says those are sets, so
    validate_version_checksum must not false-flag a foreign checksum
    over list ordering or over explicit-null-vs-absent fields. A REAL
    divergence (wrong file count) must still flag."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.delta.maintenance import (
        validate_version_checksum,
    )

    path = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    to_delta(df, path, configuration={
        "delta.columnMapping.mode": "name",
        "delta.enableRowTracking": "true",
    })
    snap = DeltaLog(path).snapshot()
    proto = dict(snap.protocol.to_json()["protocol"])
    assert isinstance(proto.get("writerFeatures"), list)  # fixture real
    for k in ("readerFeatures", "writerFeatures"):
        if isinstance(proto.get(k), list):
            proto[k] = list(reversed(proto[k]))
    meta = dict(snap.metadata.to_json()["metaData"])
    meta["description"] = None  # explicit null where we omit
    # nested explicit null where we OMIT (r15, ADVICE): the
    # "null == absent" rule must hold at EVERY depth, not just the
    # top level of the metadata block
    fmt = dict(meta.get("format") or {"provider": "parquet"})
    fmt["sortColumns"] = None  # a nested field we never write
    meta["format"] = fmt
    crc = {
        "txnId": "0f0e0d0c-1111-2222-3333-444455556666",
        "tableSizeBytes": sum(a.size for a in snap.add_actions),
        "numFiles": len(snap.files),
        "numMetadata": 1,
        "numProtocol": 1,
        "numDeletedRecordsOpt": 0,
        "numDeletionVectorsOpt": 0,
        "setTransactions": [],
        "domainMetadata": [],
        "histogramOpt": {
            "sortedBinBoundaries": [0],
            "fileCounts": [1],
            "totalBytes": [123],
        },
        "metadata": meta,
        "protocol": proto,
    }
    crc_path = os.path.join(
        path, "_delta_log", f"{snap.version:020d}.crc"
    )
    with open(crc_path, "w") as fh:
        fh.write(json.dumps(crc))
    res = validate_version_checksum(path)
    assert res["valid"], res["mismatches"]

    # real divergence still flags
    crc["numFiles"] = 999
    with open(crc_path, "w") as fh:
        fh.write(json.dumps(crc))
    res = validate_version_checksum(path)
    assert not res["valid"] and "numFiles" in res["mismatches"]


def test_foreign_last_checkpoint_hints_are_tolerated(spark, tmp_path):
    """A FOREIGN _last_checkpoint may carry fields we never write —
    sizeInBytes, numOfAddFiles, parts hints, checkpointSchema, v2
    metadata, checksum tags — or even be stale/garbage. Our reader
    discovers checkpoints by LISTING (never trusts the pointer), so
    replay must be byte-for-byte indifferent to its content; our next
    create_checkpoint then overwrites it with a valid pointer."""
    import pyspark.sql.functions as F

    path = str(tmp_path / "t")
    df = spark.range(20).select(F.col("id").alias("k"))
    to_delta(df, path)
    to_delta(df, path, mode="append")
    create_checkpoint(path)
    lc = os.path.join(path, "_delta_log", "_last_checkpoint")
    want = read_delta(path, spark=spark).count()

    # delta-spark-style extended pointer
    with open(lc, "w") as fh:
        fh.write(json.dumps({
            "version": 1, "size": 5, "sizeInBytes": 123456,
            "numOfAddFiles": 2, "parts": None,
            "checkpointSchema": {"type": "struct", "fields": []},
            "checksum": "abc123", "tags": {"engine": "foreign"},
            "v2Checkpoint": {"path": "nonexistent.parquet"},
        }))
    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == want

    # garbage pointer: still listing-driven, still reads
    with open(lc, "w") as fh:
        fh.write("{not json")
    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == want

    # our next checkpoint rewrites a valid pointer
    to_delta(df, path, mode="append")
    create_checkpoint(path)
    ptr = json.loads(open(lc).read())
    assert ptr["version"] == 2 and "size" in ptr


def test_foreign_struct_only_stats_checkpoint_keeps_skipping(
    spark, tmp_path
):
    """delta-spark `delta.checkpoint.writeStatsAsStruct=true` +
    `writeStatsAsJson=false`: the checkpoint carries ONLY a typed
    `stats_parsed` struct — no JSON `stats` at all. Reading `stats`
    alone silently degrades data skipping on every such foreign table
    (correct results, 100% file false-keep rate). The parser now
    re-serializes the struct to the JSON stats shape (dates
    isoformatted, None leaves dropped), so prune_by_stats keeps
    skipping; rows without stats surface as all-null structs and are
    gated on numRecords."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from dask_deltalake_spark.delta.protocol import prune_by_stats

    path = str(tmp_path / "t")
    to_delta(spark.range(10).coalesce(1).selectExpr("id"), path)  # v0
    v0 = _v0_adds(path)[0]
    log_dir = os.path.join(path, "_delta_log")
    meta_line = next(
        json.loads(line)["metaData"]
        for line in open(os.path.join(log_dir, f"{0:020d}.json"))
        if '"metaData"' in line
    )
    proto_line = next(
        json.loads(line)["protocol"]
        for line in open(os.path.join(log_dir, f"{0:020d}.json"))
        if '"protocol"' in line
    )
    import datetime

    sp = pa.struct(
        [
            ("numRecords", pa.int64()),
            ("minValues", pa.struct(
                [("id", pa.int64()), ("d", pa.date32())])),
            ("maxValues", pa.struct(
                [("id", pa.int64()), ("d", pa.date32())])),
            ("nullCount", pa.struct(
                [("id", pa.int64()), ("d", pa.int64())])),
        ]
    )
    rows = [
        {"protocol": proto_line, "metaData": None, "add": None},
        {"protocol": None, "metaData": {
            "id": meta_line["id"],
            "schemaString": meta_line["schemaString"],
            "partitionColumns": [],
            "configuration": [],
            "createdTime": meta_line.get("createdTime"),
            "format": {"provider": "parquet"},
        }, "add": None},
        {"protocol": None, "metaData": None, "add": {
            "path": v0["path"],
            "partitionValues": [],
            "size": v0["size"],
            "modificationTime": v0["modificationTime"],
            "dataChange": False,
            "stats": None,  # writeStatsAsJson=false
            "stats_parsed": {
                "numRecords": 10,
                "minValues": {"id": 0,
                              "d": datetime.date(2021, 1, 1)},
                "maxValues": {"id": 9,
                              "d": datetime.date(2021, 1, 9)},
                "nullCount": {"id": 0, "d": None},
            },
        }},
    ]
    schema = pa.schema(
        [
            pa.field("protocol", pa.struct(
                [("minReaderVersion", pa.int32()),
                 ("minWriterVersion", pa.int32())])),
            pa.field("metaData", pa.struct(
                [("id", pa.string()),
                 ("schemaString", pa.string()),
                 ("partitionColumns", pa.list_(pa.string())),
                 ("configuration", pa.map_(pa.string(), pa.string())),
                 ("createdTime", pa.int64()),
                 ("format", pa.struct([("provider", pa.string())]))])),
            pa.field("add", pa.struct(
                [("path", pa.string()),
                 ("partitionValues", pa.map_(pa.string(), pa.string())),
                 ("size", pa.int64()),
                 ("modificationTime", pa.int64()),
                 ("dataChange", pa.bool_()),
                 ("stats", pa.string()),
                 ("stats_parsed", sp)])),
        ]
    )
    _pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        os.path.join(log_dir, f"{0:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 0, "size": len(rows)}))

    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    a = snap.add_actions[0]
    blob = json.loads(a.stats)
    assert blob["numRecords"] == 10
    assert blob["minValues"] == {"id": 0, "d": "2021-01-01"}
    assert blob["maxValues"] == {"id": 9, "d": "2021-01-09"}
    assert blob["nullCount"] == {"id": 0}  # None leaf dropped
    # data skipping actually works off the re-serialized stats
    assert prune_by_stats([a], [[("id", ">", 100)]]) == []
    assert prune_by_stats([a], [[("id", "<=", 3)]]) == [a]
    assert read_delta(path, spark=spark).count() == 10


def test_foreign_cdc_actions_read_instead_of_reconstruction(
    spark, tmp_path
):
    """delta-spark `delta.enableChangeDataFeed=true` interop (r15):
    a DML commit carries `cdc` actions pointing at _change_data/
    parquet files that hold ALL of the version's change rows with
    their own _change_type column. Per the spec's Add CDC File
    contract, readers must use those files INSTEAD of reconstructing
    from add/remove — reconstruction double-reports every row the
    rewrite merely COPIED as a spurious delete+insert pair. Both the
    batch reader (read_delta_changes) and the Python-datasource CDF
    stream must honor the cdc path, while commits WITHOUT cdc
    actions keep exact reconstruction."""
    import pyarrow as pa

    from dask_deltalake_spark.delta.cdc import read_delta_changes
    from dask_deltalake_spark.delta.protocol import Metadata, Protocol
    from dask_deltalake_spark.delta.writer import write_commit
    from dask_deltalake_spark.sources import register_python_datasource

    path = str(tmp_path / "t")
    os.makedirs(os.path.join(path, "_change_data"))

    def _write_pq(rel, ids, vals, change_types=None):
        cols = {"id": pa.array(ids, pa.int64()),
                "val": pa.array(vals, pa.int64())}
        if change_types is not None:
            cols["_change_type"] = pa.array(change_types, pa.string())
        pq.write_table(pa.table(cols), os.path.join(path, rel))
        return os.path.getsize(os.path.join(path, rel))

    schema_str = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "val", "type": "long", "nullable": True,
             "metadata": {}},
        ],
    })
    # v0: blind append of one file — NO cdc action (delta-spark only
    # writes cdc for commits whose changes aren't pure add-derived)
    sz_a = _write_pq("a.parquet", list(range(10)),
                     [i * 10 for i in range(10)])
    write_commit(path, 0, [
        Protocol(min_reader_version=1, min_writer_version=4).to_json(),
        Metadata(
            id="cdc-interop", schema_string=schema_str,
            configuration={"delta.enableChangeDataFeed": "true"},
        ).to_json(),
        {"add": {"path": "a.parquet", "partitionValues": {},
                 "size": sz_a, "modificationTime": 1000,
                 "dataChange": True}},
    ])
    # v1: delta-spark UPDATE shape — rewrite a.parquet -> a2.parquet
    # changing rows id in {3, 7} (8 rows merely copied), cdc file
    # carries exactly the 2 pre + 2 post images
    sz_a2 = _write_pq(
        "a2.parquet", list(range(10)),
        [i * 10 if i not in (3, 7) else i * 10 + 1 for i in range(10)],
    )
    sz_c = _write_pq(
        "_change_data/cdc-0001.parquet",
        [3, 7, 3, 7],
        [30, 70, 31, 71],
        ["update_preimage", "update_preimage",
         "update_postimage", "update_postimage"],
    )
    write_commit(path, 1, [
        {"commitInfo": {"timestamp": 2000, "operation": "UPDATE",
                        "engineInfo": "Apache-Spark/3.5.0 Delta-Lake/3.2.0"}},
        {"remove": {"path": "a.parquet", "deletionTimestamp": 2000,
                    "dataChange": True}},
        {"add": {"path": "a2.parquet", "partitionValues": {},
                 "size": sz_a2, "modificationTime": 2000,
                 "dataChange": True}},
        {"cdc": {"path": "_change_data/cdc-0001.parquet",
                 "partitionValues": {}, "size": sz_c,
                 "dataChange": False}},
    ])

    # ---- batch reader: v1 yields EXACTLY the cdc rows (4), not the
    # 10-delete + 10-insert reconstruction
    ch = read_delta_changes(path, starting_version=-1, spark=spark)
    rows = [(r["id"], r["val"], r["_change_type"], r["_commit_version"])
            for r in ch.collect()]
    v0 = sorted(r for r in rows if r[3] == 0)
    v1 = sorted(r for r in rows if r[3] == 1)
    assert len(v0) == 10 and {r[2] for r in v0} == {"insert"}
    assert v1 == [
        (3, 30, "update_preimage", 1),
        (3, 31, "update_postimage", 1),
        (7, 70, "update_preimage", 1),
        (7, 71, "update_postimage", 1),
    ], v1
    # the live table itself reads through the rewrite
    assert read_delta(path, spark=spark).count() == 10

    # ---- streaming CDF source: same contract through the Python
    # datasource planner/executor path
    register_python_datasource(spark)
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("delta_py_cdf")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [(r["id"], r["val"], r["_change_type"], r["_commit_version"])
           for r in spark.read.parquet(out_dir).collect()]
    s_v1 = sorted(r for r in got if r[3] == 1)
    assert s_v1 == v1, s_v1
    assert len([r for r in got if r[3] == 0]) == 10

    # and VACUUM never treats foreign _change_data files as orphans
    # (the walk prunes '_'-prefixed segments — the safe direction:
    # a cdc file deleted inside retention would break CDF reads)
    from dask_deltalake_spark.delta.maintenance import vacuum

    cands = vacuum(path, retention_hours=0, dry_run=True)
    assert not any(c.startswith("_change_data") for c in cands), cands


def test_foreign_checkpoint_stats_json_wins_over_disagreeing_struct(
    spark, tmp_path
):
    """Foreign checkpoint carrying BOTH `stats` (JSON) and
    `stats_parsed` (struct) that DISAGREE (a buggy or stale foreign
    writer — delta-spark writes both when writeStatsAsJson and
    writeStatsAsStruct are both true, normally in agreement; r15,
    VERDICT #4's named seam): the canonical protocol field is
    `stats`, so the JSON must win deterministically — the struct
    fallback applies ONLY when JSON is absent (the r14 struct-only
    fix). Pins the preference so skipping decisions can never flap
    between the two encodings."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from dask_deltalake_spark.delta.protocol import prune_by_stats

    path = str(tmp_path / "t")
    to_delta(spark.range(10).coalesce(1).selectExpr("id"), path)  # v0
    v0 = _v0_adds(path)[0]
    log_dir = os.path.join(path, "_delta_log")
    meta_line = next(
        json.loads(line)["metaData"]
        for line in open(os.path.join(log_dir, f"{0:020d}.json"))
        if '"metaData"' in line
    )
    proto_line = next(
        json.loads(line)["protocol"]
        for line in open(os.path.join(log_dir, f"{0:020d}.json"))
        if '"protocol"' in line
    )
    sp = pa.struct(
        [
            ("numRecords", pa.int64()),
            ("minValues", pa.struct([("id", pa.int64())])),
            ("maxValues", pa.struct([("id", pa.int64())])),
            ("nullCount", pa.struct([("id", pa.int64())])),
        ]
    )
    json_stats = json.dumps({
        "numRecords": 10,
        "minValues": {"id": 0}, "maxValues": {"id": 9},
        "nullCount": {"id": 0},
    })
    rows = [
        {"protocol": proto_line, "metaData": None, "add": None},
        {"protocol": None, "metaData": {
            "id": meta_line["id"],
            "schemaString": meta_line["schemaString"],
            "partitionColumns": [],
            "configuration": [],
            "createdTime": meta_line.get("createdTime"),
            "format": {"provider": "parquet"},
        }, "add": None},
        {"protocol": None, "metaData": None, "add": {
            "path": v0["path"],
            "partitionValues": [],
            "size": v0["size"],
            "modificationTime": v0["modificationTime"],
            "dataChange": False,
            "stats": json_stats,  # the truth
            "stats_parsed": {     # stale/buggy: claims id in [100,900]
                "numRecords": 10,
                "minValues": {"id": 100},
                "maxValues": {"id": 900},
                "nullCount": {"id": 0},
            },
        }},
    ]
    schema = pa.schema(
        [
            pa.field("protocol", pa.struct(
                [("minReaderVersion", pa.int32()),
                 ("minWriterVersion", pa.int32())])),
            pa.field("metaData", pa.struct(
                [("id", pa.string()),
                 ("schemaString", pa.string()),
                 ("partitionColumns", pa.list_(pa.string())),
                 ("configuration", pa.map_(pa.string(), pa.string())),
                 ("createdTime", pa.int64()),
                 ("format", pa.struct([("provider", pa.string())]))])),
            pa.field("add", pa.struct(
                [("path", pa.string()),
                 ("partitionValues", pa.map_(pa.string(), pa.string())),
                 ("size", pa.int64()),
                 ("modificationTime", pa.int64()),
                 ("dataChange", pa.bool_()),
                 ("stats", pa.string()),
                 ("stats_parsed", sp)])),
        ]
    )
    _pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        os.path.join(log_dir, f"{0:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 0, "size": len(rows)}))

    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    a = snap.add_actions[0]
    assert json.loads(a.stats) == json.loads(json_stats)
    # skipping decisions follow the JSON: id<=3 keeps the file (JSON
    # min 0), id>100 prunes it (JSON max 9) — the struct would say
    # the exact opposite
    assert prune_by_stats([a], [[("id", "<=", 3)]]) == [a]
    assert prune_by_stats([a], [[("id", ">", 100)]]) == []
    assert read_delta(path, spark=spark).count() == 10


def test_foreign_v2_checkpoint_inline_actions_and_split_sidecars(
    spark, tmp_path
):
    """Foreign v2 checkpoints exercising the spec surface our own
    writer never produces (r15, VERDICT #4's remaining named seam):
    (a) file actions INLINE in the manifest with no sidecars at all
    (the spec allows either placement), and (b) sidecars splitting a
    path's REMOVE away from its ADD into different files, interleaved
    with unrelated actions — checkpoint state is already reconciled,
    so distribution across sidecars must be irrelevant. Both shapes
    must replay (including a post-checkpoint commit on top) with the
    tombstone honored."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from dask_deltalake_spark.delta.log import SIDECAR_DIR
    from dask_deltalake_spark.delta.writer import write_commit

    def _mk_table(tag):
        path = str(tmp_path / tag)
        to_delta(
            spark.range(30).selectExpr("id", "id * 2 AS v").repartition(3),
            path,
        )
        return path, _v0_adds(path)

    def _meta_proto(path):
        log_dir = os.path.join(path, "_delta_log")
        meta = next(
            json.loads(line)["metaData"]
            for line in open(os.path.join(log_dir, f"{0:020d}.json"))
            if '"metaData"' in line
        )
        proto = {"minReaderVersion": 3, "minWriterVersion": 7,
                 "readerFeatures": ["v2Checkpoint"],
                 "writerFeatures": ["v2Checkpoint"]}
        return meta, proto

    _add_struct = pa.struct(
        [("path", pa.string()),
         ("partitionValues", pa.map_(pa.string(), pa.string())),
         ("size", pa.int64()),
         ("modificationTime", pa.int64()),
         ("dataChange", pa.bool_()),
         ("stats", pa.string())]
    )
    _dv_struct = pa.struct(
        [("storageType", pa.string()),
         ("pathOrInlineDv", pa.string()),
         ("offset", pa.int32()),
         ("sizeInBytes", pa.int32()),
         ("cardinality", pa.int64())]
    )
    _rem_struct = pa.struct(
        [("path", pa.string()),
         ("deletionTimestamp", pa.int64()),
         ("dataChange", pa.bool_()),
         ("deletionVector", _dv_struct)]
    )
    _meta_struct = pa.struct(
        [("id", pa.string()),
         ("schemaString", pa.string()),
         ("partitionColumns", pa.list_(pa.string())),
         ("configuration", pa.map_(pa.string(), pa.string())),
         ("createdTime", pa.int64()),
         ("format", pa.struct([("provider", pa.string())]))]
    )
    _proto_struct = pa.struct(
        [("minReaderVersion", pa.int32()),
         ("minWriterVersion", pa.int32()),
         ("readerFeatures", pa.list_(pa.string())),
         ("writerFeatures", pa.list_(pa.string()))]
    )
    _cpm_struct = pa.struct([("version", pa.int64())])
    _sc_struct = pa.struct(
        [("path", pa.string()), ("sizeInBytes", pa.int64()),
         ("modificationTime", pa.int64())]
    )
    manifest_schema = pa.schema(
        [pa.field("protocol", _proto_struct),
         pa.field("metaData", _meta_struct),
         pa.field("add", _add_struct),
         pa.field("remove", _rem_struct),
         pa.field("checkpointMetadata", _cpm_struct),
         pa.field("sidecar", _sc_struct)]
    )
    sidecar_schema = pa.schema(
        [pa.field("add", _add_struct), pa.field("remove", _rem_struct)]
    )

    def _row(**kw):
        base = {"protocol": None, "metaData": None, "add": None,
                "remove": None, "checkpointMetadata": None,
                "sidecar": None}
        base.update(kw)
        return base

    def _meta_row(meta):
        return {
            "id": meta["id"], "schemaString": meta["schemaString"],
            "partitionColumns": [], "configuration": [],
            "createdTime": meta.get("createdTime"),
            "format": {"provider": "parquet"},
        }

    def _add_row(a):
        return {"path": a["path"], "partitionValues": [],
                "size": a["size"],
                "modificationTime": a["modificationTime"],
                "dataChange": False, "stats": a.get("stats")}

    # ---- (a) inline-actions manifest, zero sidecars, one add
    # tombstoned inline
    path, adds = _mk_table("inline")
    meta, proto = _meta_proto(path)
    victim, keep = adds[0], adds[1:]
    rows = (
        [_row(protocol=proto), _row(metaData=_meta_row(meta)),
         _row(checkpointMetadata={"version": 0})]
        + [_row(add=_add_row(a)) for a in keep]
        + [_row(remove={"path": victim["path"],
                        "deletionTimestamp": 1234,
                        "dataChange": False,
                        "deletionVector": None})]
    )
    log_dir = os.path.join(path, "_delta_log")
    _pq.write_table(
        pa.Table.from_pylist(rows, schema=manifest_schema),
        os.path.join(log_dir, "00000000000000000000.checkpoint."
                              "0f0e0d0c0b0a09080706050403020100.parquet"),
    )
    os.remove(os.path.join(log_dir, f"{0:020d}.json"))
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    assert set(snap.files) == {unquote(a["path"]) for a in keep}
    assert [t.path for t in snap.tombstones_all] == [
        unquote(victim["path"])
    ]
    n_keep = read_delta(path, spark=spark).count()
    assert 0 < n_keep < 30
    # a post-checkpoint commit replays on top of the inline state
    write_commit(path, 1, [{
        "add": {"path": victim["path"], "partitionValues": {},
                "size": victim["size"],
                "modificationTime": victim["modificationTime"],
                "dataChange": True},
    }])
    _SNAPSHOT_CACHE.clear()
    assert read_delta(path, spark=spark).count() == 30

    # ---- (b) sidecar distribution + same-path DIFFERENT-identity
    # coexistence: adds split across sidecars; a tombstone whose
    # path's add sits in the OTHER sidecar is only legal under a
    # DIFFERENT (path, dvId) identity (a checkpoint is reconciled
    # state — the same identity can never be both live and removed),
    # e.g. a superseded-vector tombstone still inside retention while
    # the descriptor-less re-add is live. Distribution across
    # sidecars must be irrelevant to all of it.
    path2, adds2 = _mk_table("split")
    meta2, proto2 = _meta_proto(path2)
    proto2["readerFeatures"] = ["v2Checkpoint", "deletionVectors"]
    proto2["writerFeatures"] = ["v2Checkpoint", "deletionVectors"]
    victim2, keep2 = adds2[0], adds2[1:]
    dv1 = {"storageType": "u", "pathOrInlineDv": "ab^-aqEH.-t@S}K{vb[*k^",
           "offset": 4, "sizeInBytes": 40, "cardinality": 6}
    log_dir2 = os.path.join(path2, "_delta_log")
    os.makedirs(os.path.join(log_dir2, SIDECAR_DIR), exist_ok=True)
    sc1_rows = [
        {"add": _add_row(keep2[0]), "remove": None},
        {"add": _add_row(keep2[1]), "remove": None},
    ]
    sc2_rows = [
        # victim2's tombstone — its add appears in NO sidecar
        {"add": None, "remove": {"path": victim2["path"],
                                 "deletionTimestamp": 1234,
                                 "dataChange": False,
                                 "deletionVector": None}},
        # superseded-vector tombstone for a path whose ('' ) add
        # lives in the OTHER sidecar — different identity, legal
        {"add": None, "remove": {"path": keep2[1]["path"],
                                 "deletionTimestamp": 1234,
                                 "dataChange": False,
                                 "deletionVector": dv1}},
    ]
    for name, rws in (("sc-1.parquet", sc1_rows),
                      ("sc-2.parquet", sc2_rows)):
        _pq.write_table(
            pa.Table.from_pylist(rws, schema=sidecar_schema),
            os.path.join(log_dir2, SIDECAR_DIR, name),
        )
    man_rows = [
        _row(protocol=proto2), _row(metaData=_meta_row(meta2)),
        _row(checkpointMetadata={"version": 0}),
        _row(sidecar={"path": "sc-1.parquet", "sizeInBytes": 1,
                      "modificationTime": 1}),
        _row(sidecar={"path": "sc-2.parquet", "sizeInBytes": 1,
                      "modificationTime": 1}),
    ]
    _pq.write_table(
        pa.Table.from_pylist(man_rows, schema=manifest_schema),
        os.path.join(log_dir2, "00000000000000000000.checkpoint."
                               "aaaabbbbccccddddeeeeffff00001111.parquet"),
    )
    os.remove(os.path.join(log_dir2, f"{0:020d}.json"))
    _SNAPSHOT_CACHE.clear()
    snap2 = DeltaLog(path2).snapshot()
    assert set(snap2.files) == {unquote(a["path"]) for a in keep2}
    keyed = {(t.path, bool(t.deletion_vector))
             for t in snap2.tombstones_all}
    assert keyed == {
        (unquote(victim2["path"]), False),
        (unquote(keep2[1]["path"]), True),
    }
    assert read_delta(path2, spark=spark).count() < 30


def test_foreign_commit_info_only_commit_is_a_noop_version(
    spark, tmp_path
):
    """A foreign commit containing ONLY commitInfo (delta-spark can
    produce these — e.g. an UPDATE matching zero files on a non-CDF
    table, or a metadata no-op): replay must treat it as a version
    bump with unchanged state, time travel to it must work, the CDF
    feed must report zero changes for it, and a stream must pass
    through it without refusing or emitting."""
    from dask_deltalake_spark.delta.cdc import read_delta_changes
    from dask_deltalake_spark.sources import register_python_datasource

    path = str(tmp_path / "t")
    to_delta(spark.range(10).selectExpr("id"), path)  # v0
    _append_foreign_commit(path, 1, [])               # commitInfo only
    to_delta(spark.range(10, 15).selectExpr("id"), path,
             mode="append")                           # v2

    _SNAPSHOT_CACHE.clear()
    assert DeltaLog(path).snapshot().version == 2
    assert read_delta(path, spark=spark).count() == 15
    assert read_delta(path, version=1, spark=spark).count() == 10

    ch = read_delta_changes(path, starting_version=-1, spark=spark)
    per_v = {r["_commit_version"] for r in ch.collect()}
    assert per_v == {0, 2}  # v1 contributes zero change rows

    register_python_datasource(spark)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("delta_py")
        .option("path", path).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 15


def test_foreign_identity_high_water_mark_interop(spark, tmp_path):
    """delta-spark identity-column interop (VERDICT r15 #4): a
    hand-built foreign table — writer v6, `GENERATED ALWAYS AS
    IDENTITY (START WITH 100 INCREMENT BY 10)` encoded exactly as
    delta-spark does (delta.identity.* column-metadata keys with
    highWaterMark=150) — appended through OUR writer must (a) assign
    fresh values STRICTLY above the foreign high-water mark along the
    declared step, (b) advance delta.identity.highWaterMark in the
    committed metadata so a returning delta-spark writer cannot
    collide, and (c) leave start/step/allowExplicitInsert untouched."""
    import pyarrow as pa

    from dask_deltalake_spark.delta.identity import identity_columns

    path = str(tmp_path / "foreign_identity")
    os.makedirs(os.path.join(path, "_delta_log"))
    pq.write_table(
        pa.table({
            "id": pa.array([100, 110, 120, 130, 140, 150], pa.int64()),
            "val": pa.array(list("abcdef"), pa.string()),
        }),
        os.path.join(path, "f0.parquet"),
    )
    schema_str = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": False,
             "metadata": {
                 "delta.identity.start": 100,
                 "delta.identity.step": 10,
                 "delta.identity.highWaterMark": 150,
                 "delta.identity.allowExplicitInsert": False,
             }},
            {"name": "val", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    _append_foreign_commit(path, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 6}},
        {"metaData": {
            "id": "foreign-identity", "format": {
                "provider": "parquet", "options": {}},
            "schemaString": schema_str, "partitionColumns": [],
            "configuration": {}, "createdTime": _now_ms(),
        }},
        {"add": {
            "path": "f0.parquet", "partitionValues": {},
            "size": os.path.getsize(os.path.join(path, "f0.parquet")),
            "modificationTime": _now_ms(), "dataChange": True,
        }},
    ])

    # OUR append: the identity column is omitted — we must assign it
    new = spark.createDataFrame([("g",), ("h",), ("i",)], "val string")
    to_delta(new, path, mode="append")

    _SNAPSHOT_CACHE.clear()
    got = read_delta(path, spark=spark)
    ids = sorted(r["id"] for r in got.collect())
    assert ids[:6] == [100, 110, 120, 130, 140, 150]  # foreign rows
    fresh = ids[6:]
    assert len(fresh) == 3
    assert all(v > 150 for v in fresh)                 # (a) above HWM
    assert all((v - 100) % 10 == 0 for v in fresh)     # on the lattice
    assert len(set(fresh)) == 3

    decl = identity_columns(DeltaLog(path).snapshot().metadata)["id"]
    assert decl["high_water_mark"] == max(fresh)       # (b) advanced
    assert decl["start"] == 100 and decl["step"] == 10 # (c) untouched
    assert decl["allow_explicit"] is False


def test_foreign_ict_table_redated_mtimes_resolution(spark, tmp_path):
    """Foreign in-commit-timestamp interop (VERDICT r15 #4): a
    delta-spark-style table that enabled the in-commit clock mid-life
    (enablementVersion/Timestamp properties, commitInfo
    inCommitTimestamp fields) whose PRE-enablement log file was
    re-dated by the object store to AFTER every in-commit timestamp —
    the exact failure the feature exists for. Timestamp resolution
    must honor the spec's mixed-history rule: a target at/after the
    enablement timestamp searches ONLY the in-commit range, so the
    re-dated mtime can no longer hijack ascending-order resolution
    (startingTimestamp previously returned version 0 here,
    over-reporting the change feed)."""
    import pyarrow as pa

    from datetime import datetime, timezone

    from dask_deltalake_spark.delta.cdc import read_delta_changes

    path = str(tmp_path / "foreign_ict")
    os.makedirs(os.path.join(path, "_delta_log"))

    def _file(rel, ks):
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64())}),
            os.path.join(path, rel),
        )
        return os.path.getsize(os.path.join(path, rel))

    schema_str = json.dumps({
        "type": "struct",
        "fields": [{"name": "k", "type": "long", "nullable": True,
                    "metadata": {}}],
    })
    now = _now_ms()
    t1 = now - 100_000          # enablement clock
    t2 = now - 50_000           # second in-commit tick

    sz0 = _file("f0.parquet", [1, 2, 3])
    _append_foreign_commit(path, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "foreign-ict", "format": {
                "provider": "parquet", "options": {}},
            "schemaString": schema_str, "partitionColumns": [],
            "configuration": {}, "createdTime": now - 500_000,
        }},
        {"add": {"path": "f0.parquet", "partitionValues": {},
                 "size": sz0, "modificationTime": now - 500_000,
                 "dataChange": True}},
    ])
    log_dir = os.path.join(path, "_delta_log")
    with open(os.path.join(log_dir, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {
            "timestamp": t1, "inCommitTimestamp": t1,
            "operation": "SET TBLPROPERTIES",
            "engineInfo": "Apache-Spark/3.5.0 Delta-Lake/3.2.0",
        }}) + "\n")
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["inCommitTimestamp"],
        }}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": "foreign-ict", "format": {
                "provider": "parquet", "options": {}},
            "schemaString": schema_str, "partitionColumns": [],
            "configuration": {
                "delta.enableInCommitTimestamps": "true",
                "delta.inCommitTimestampEnablementVersion": "1",
                "delta.inCommitTimestampEnablementTimestamp": str(t1),
            },
            "createdTime": now - 500_000,
        }}) + "\n")
    sz1 = _file("f1.parquet", [4, 5])
    with open(os.path.join(log_dir, f"{2:020d}.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {
            "timestamp": t2, "inCommitTimestamp": t2,
            "operation": "WRITE",
            "engineInfo": "Apache-Spark/3.5.0 Delta-Lake/3.2.0",
        }}) + "\n")
        fh.write(json.dumps({"add": {
            "path": "f1.parquet", "partitionValues": {}, "size": sz1,
            "modificationTime": t2, "dataChange": True}}) + "\n")

    # the object store re-dates v0's log file to AFTER every ICT
    redated = (now + 1_000_000) / 1000.0
    os.utime(os.path.join(log_dir, f"{0:020d}.json"),
             (redated, redated))
    _SNAPSHOT_CACHE.clear()

    log = DeltaLog(path)

    def iso(ms):
        return datetime.fromtimestamp(
            ms / 1000.0, tz=timezone.utc
        ).isoformat()

    mid = iso((t1 + t2) // 2)   # between the two in-commit ticks
    # startingTimestamp: first ICT version at/after mid = v2
    # (previously v0's re-dated mtime >= mid returned version 0)
    assert log.resolve_starting_timestamp(mid) == 2
    # datetime travel: latest ICT version at/before mid = v1
    assert log.resolve_datetime(mid) == 1
    assert log.resolve_datetime(iso(t2 + 1000)) == 2
    # CDF by timestamp sees ONLY v2's insert
    feed = read_delta_changes(path, starting_timestamp=mid, spark=spark)
    rows = {(r["k"], r["_change_type"], r["_commit_version"])
            for r in feed.collect()}
    assert rows == {(4, "insert", 2), (5, "insert", 2)}
    # the table itself still reads fully
    assert read_delta(path, spark=spark).count() == 5


def test_foreign_domain_survives_optimize_checkpoint_compaction(
    spark, tmp_path
):
    """Foreign domainMetadata round-trip through OUR maintenance ops
    (VERDICT r15 #4's first named candidate): a delta-spark-style
    commit attaches a live domain to one of our tables; OPTIMIZE,
    checkpoint, log compaction, retention cleanup, and a DML rewrite
    must all carry it — replay from any of those artifacts yields the
    domain verbatim (no silent strip at any re-serialization
    boundary)."""
    from dask_deltalake_spark.delta.maintenance import (
        compact_log,
        create_checkpoint,
        optimize,
    )
    from dask_deltalake_spark.delta.mutate import delete_where

    path = str(tmp_path / "t")
    df = spark.range(0, 40).selectExpr("id", "id * 2 AS val")
    to_delta(df.repartition(4), path)                           # v0
    dom = {
        "domain": "app.pipeline",
        "configuration": '{"owner":"teamX","watermark":123}',
        "removed": False,
    }
    _append_foreign_commit(path, 1, [{"domainMetadata": dom}])  # v1

    optimize(path, spark=spark)                                 # v2
    delete_where(path, [("id", "<", 5)], spark=spark)           # v3
    _SNAPSHOT_CACHE.clear()
    assert DeltaLog(path).snapshot().domain_metadata == {
        "app.pipeline": dom["configuration"]
    }

    compact_log(path, 1, 3)
    create_checkpoint(path)
    _SNAPSHOT_CACHE.clear()
    assert DeltaLog(path).snapshot().domain_metadata == {
        "app.pipeline": dom["configuration"]
    }

    # replay THROUGH the checkpoint alone (JSONs dropped — the exact
    # state retention cleanup produces)
    import glob

    for j in glob.glob(os.path.join(path, "_delta_log", "*.json")):
        os.remove(j)
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    assert snap.domain_metadata == {
        "app.pipeline": dom["configuration"]
    }
    assert read_delta(path, spark=spark).count() == 35


def test_foreign_non_hive_layout_partition_values_authoritative(
    spark, tmp_path
):
    """Main-scan dual of the r16 cdc-action fix: the spec allows
    ARBITRARY data file paths and makes add.partitionValues
    authoritative, but partition columns were resolved by Hive
    directory discovery alone — a foreign/converted table with FLAT
    file names read NULL partition columns. Such files now take the
    stamping fallback (grouped by partitionValues, typed literals
    from the action); Hive-laid-out files keep the fast path — this
    table mixes both shapes in one snapshot."""
    import pyarrow as pa

    path = str(tmp_path / "foreign_flat")
    os.makedirs(os.path.join(path, "_delta_log"))
    os.makedirs(os.path.join(path, "part=a"))

    def _file(rel, ks):
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64())}),
            os.path.join(path, rel),
        )
        return os.path.getsize(os.path.join(path, rel))

    schema_str = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "part", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    sz_flat = _file("data-0001.parquet", [1, 2])        # flat: part=b
    sz_flat2 = _file("data-0002.parquet", [5])          # flat: part IS NULL
    sz_hive = _file("part=a/f0.parquet", [3, 4])        # hive: part=a
    _append_foreign_commit(path, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "foreign-flat", "format": {
                "provider": "parquet", "options": {}},
            "schemaString": schema_str, "partitionColumns": ["part"],
            "configuration": {}, "createdTime": _now_ms(),
        }},
        {"add": {"path": "data-0001.parquet",
                 "partitionValues": {"part": "b"}, "size": sz_flat,
                 "modificationTime": _now_ms(), "dataChange": True}},
        {"add": {"path": "data-0002.parquet",
                 "partitionValues": {"part": None}, "size": sz_flat2,
                 "modificationTime": _now_ms(), "dataChange": True}},
        {"add": {"path": "part=a/f0.parquet",
                 "partitionValues": {"part": "a"}, "size": sz_hive,
                 "modificationTime": _now_ms(), "dataChange": True}},
    ])

    got = {(r["k"], r["part"])
           for r in read_delta(path, spark=spark).collect()}
    assert got == {(1, "b"), (2, "b"), (3, "a"), (4, "a"), (5, None)}
    # partition filtering works on both shapes (pruning is
    # action-driven; the row filter sees the stamped literals)
    assert read_delta(
        path, filter=[("part", "==", "b")], spark=spark
    ).count() == 2
    assert read_delta(
        path, filter=[("part", "==", "a")], spark=spark
    ).count() == 2


@pytest.mark.parametrize("enable", [
    "add_constraint", "drop_constraint", "enable_in_commit_timestamps",
    "enable_row_tracking", "enable_v2_checkpoints",
    "enable_coordinated_commits", "upgrade_to_column_mapping",
    "enable_change_data_feed",
])
def test_every_enable_path_refuses_unknown_writer_feature(
    spark, tmp_path, enable
):
    """The enable_change_data_feed gate's dual, closed across the
    whole family (r16): EVERY dedicated metadata-only upgrade path
    must run the writer-protocol gate first — a table carrying an
    unknown foreign writer feature refuses the upgrade commit, per
    the spec's writer-version contract. Before this round, none of
    the seven siblings gated."""
    from dask_deltalake_spark.delta.protocol import (
        DeltaProtocolError,
        Protocol,
    )
    from dask_deltalake_spark.delta.writer import write_commit

    path = str(tmp_path / "t")
    to_delta(spark.range(5).selectExpr("id", "id AS val"), path)
    meta = DeltaLog(path).snapshot().metadata
    config = dict(meta.configuration)
    if enable == "drop_constraint":
        # give the drop path a real constraint so it reaches the gate
        # (its not-found check runs first by design)
        config["delta.constraints.c1"] = "id >= 0"
    from dask_deltalake_spark.delta.protocol import Metadata as _Meta

    write_commit(path, 1, [
        {"commitInfo": {"timestamp": 0, "operation": "UPGRADE"}},
        Protocol(
            min_writer_version=7,
            writer_features=["someFutureFeature"],
        ).to_json(),
        _Meta(
            id=meta.id, schema_string=meta.schema_string,
            partition_columns=meta.partition_columns,
            configuration=config,
        ).to_json(),
    ])

    import dask_deltalake_spark.delta.cdc as cdc
    import dask_deltalake_spark.delta.column_mapping as cm
    import dask_deltalake_spark.delta.constraints as cons
    import dask_deltalake_spark.delta.coordinated as coord
    import dask_deltalake_spark.delta.ict as ict
    import dask_deltalake_spark.delta.maintenance as mnt
    import dask_deltalake_spark.delta.rowtracking as rt

    calls = {
        "add_constraint": lambda: cons.add_constraint(
            path, "c1", "id >= 0", spark=spark),
        "drop_constraint": lambda: cons.drop_constraint(path, "c1"),
        "enable_in_commit_timestamps":
            lambda: ict.enable_in_commit_timestamps(path),
        "enable_row_tracking": lambda: rt.enable_row_tracking(path),
        "enable_v2_checkpoints": lambda: mnt.enable_v2_checkpoints(path),
        "enable_coordinated_commits":
            lambda: coord.enable_coordinated_commits(path),
        "upgrade_to_column_mapping":
            lambda: cm.upgrade_to_column_mapping(path),
        "enable_change_data_feed":
            lambda: cdc.enable_change_data_feed(path),
    }
    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        calls[enable]()
