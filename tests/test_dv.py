"""Deletion vectors (delta/dv.py + merge-on-read DELETE): wire-format
round-trips, file layout, read-side filtering, vector merging,
full-file drops, vacuum protection, and per-path protocol gating."""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dask_deltalake_spark.delta.dv import (
    deserialize_positions,
    dv_absolute_path,
    read_dv_bytes,
    serialize_positions,
    write_dv_file,
    z85_decode,
    z85_encode,
)


# -- wire formats (no Spark) ------------------------------------------------


def test_z85_spec_vector():
    # the reference vector from the ZeroMQ z85 spec
    raw = b"\x86\x4f\xd2\x6f\xb5\x59\xf7\x5b"
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 33)), max_size=4000
    )
)
def test_roaring_roundtrip_property(vals):
    arr = np.unique(np.asarray(vals, dtype=np.uint64))
    out = deserialize_positions(serialize_positions(arr))
    assert np.array_equal(out, arr)


def test_roaring_bitmap_container():
    # >4096 values in one 16-bit key block forces a bitmap container
    vals = np.arange(0, 60000, 7, dtype=np.uint64)
    out = deserialize_positions(serialize_positions(vals))
    assert np.array_equal(out, vals)


def test_dv_file_layout_and_crc(tmp_path):
    blobs = [serialize_positions([1, 5, 9]), serialize_positions(range(100))]
    rel, descs = write_dv_file(str(tmp_path), blobs)
    assert rel.startswith("deletion_vector_") and rel.endswith(".bin")
    for blob, desc in zip(blobs, descs):
        assert desc["storageType"] == "u"
        assert read_dv_bytes(str(tmp_path), desc) == blob
    # descriptor path decodes back to the file we wrote
    assert dv_absolute_path(str(tmp_path), descs[0]) == str(tmp_path / rel)
    # corrupting a byte must fail the CRC
    p = tmp_path / rel
    data = bytearray(p.read_bytes())
    data[descs[0]["offset"] + 4] ^= 0xFF
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="checksum|length"):
        read_dv_bytes(str(tmp_path), descs[0])


def test_inline_dv_descriptor(tmp_path):
    blob = serialize_positions([2, 4, 6])
    pad = (-len(blob)) % 4
    desc = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(blob + b"\x00" * pad),
    }
    got = read_dv_bytes(str(tmp_path), desc)
    assert np.array_equal(
        deserialize_positions(got[: len(blob)]), np.array([2, 4, 6], dtype=np.uint64)
    )


# -- engine behavior --------------------------------------------------------


def _table(spark, path, n=400):
    from dask_deltalake_spark.delta.writer import to_delta

    df = (
        spark.range(0, n)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 10)
    )
    to_delta(df, path, partition_by=["part"])
    return df


def test_mor_delete_and_read(spark, tmp_path):
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    _table(spark, path)
    before = {
        f
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    }
    # spark.range slices are contiguous per task, so id<30 touches the
    # first task's files PARTIALLY — vectors, not full-file drops
    res = delete_where(
        path, [("id", "<", 30)], spark=spark, strategy="merge-on-read"
    )
    assert res["numDeletedRows"] == 30 and res["numFilesDropped"] == 0
    after = {
        f
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    }
    assert after == before  # ZERO files rewritten
    out = read_delta(path, spark=spark)
    assert out.count() == 370
    assert out.agg(F.min("id")).first()[0] == 30
    # deleted rows stay gone under projection/filter pushdown
    assert read_delta(path, columns=["val"], spark=spark).count() == 370
    assert (
        read_delta(path, filter=[("part", "==", 1)], spark=spark).count()
        == 185
    )
    # time travel to v0 resurfaces them (the vector is v1 state)
    assert read_delta(path, version=0, spark=spark).count() == 400


def test_mor_second_delete_merges_vectors(spark, tmp_path):
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    _table(spark, path)
    delete_where(path, [("id", "<", 30)], spark=spark, strategy="merge-on-read")
    res = delete_where(
        path, [("id", "<", 45)], spark=spark, strategy="merge-on-read"
    )
    assert res["numDeletedRows"] == 15  # only the NEW deletions counted
    assert read_delta(path, spark=spark).count() == 355
    # each live file carries ONE merged descriptor covering both deletes
    snap = DeltaLog(path).snapshot()
    cards = [
        a.deletion_vector["cardinality"]
        for a in snap.add_actions
        if a.deletion_vector
    ]
    assert sum(cards) == 45


def test_mor_full_file_delete_drops_file(spark, tmp_path):
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    _table(spark, path)
    res = delete_where(
        path, [("part", "==", 1)], spark=spark, strategy="merge-on-read"
    )
    assert res["numFilesDropped"] > 0
    assert read_delta(path, spark=spark).count() == 200
    snap = DeltaLog(path).snapshot()
    # dropped files are tombstoned, not carrying 100% vectors
    assert all(
        a.deletion_vector is None or a.deletion_vector["cardinality"] > 0
        for a in snap.add_actions
    )
    assert all(a.partition_values.get("part") != "1" for a in snap.add_actions)


def test_vacuum_protects_live_vectors(spark, tmp_path):
    from dask_deltalake_spark.delta.dv import dv_absolute_path
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.maintenance import vacuum
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    _table(spark, path)
    delete_where(path, [("id", "<", 10)], spark=spark, strategy="merge-on-read")
    delete_where(path, [("id", "<", 20)], spark=spark, strategy="merge-on-read")
    snap = DeltaLog(path).snapshot()
    live = {
        os.path.relpath(dv_absolute_path(path, a.deletion_vector), path)
        for a in snap.add_actions
        if a.deletion_vector
    }
    cands = set(vacuum(path, retention_hours=0, dry_run=True))
    assert live and not (live & cands)  # live vectors never listed
    stale = {
        f for f in os.listdir(path) if f.endswith(".bin")
    } - live
    assert stale <= cands  # superseded vectors are reclaimable
    vacuum(path, retention_hours=0, dry_run=False, spark=spark)
    assert read_delta(path, spark=spark).count() == 380  # still correct


def test_cow_dml_on_dv_tables_materializes_vectors(spark, tmp_path):
    """r11: copy-on-write DML on a DV table reads touched files
    THROUGH their deletion vectors (_read_files), so the rewrite
    MATERIALIZES the vector state instead of being refused (the
    pre-r11 gate) and can never resurrect vector-deleted rows —
    delta-spark parity. The rewrite's removes carry the consumed
    descriptors so the vector bins keep retention protection."""
    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
    from dask_deltalake_spark.delta.mutate import (
        delete_where,
        merge_into,
        update_where,
    )
    from dask_deltalake_spark.delta.reader import read_delta
    from dask_deltalake_spark.delta.writer import to_delta

    path = str(tmp_path / "t")
    df = _table(spark, path)
    delete_where(path, [("id", "<", 5)], spark=spark, strategy="merge-on-read")
    # COW delete on the vectored table: rows 5-8 go; rows 0-4 must
    # NOT resurrect out of the raw parquet
    delete_where(path, [("id", "<", 9)], spark=spark)
    got = {r["id"] for r in read_delta(path, spark=spark).collect()}
    assert got == set(range(9, 400))
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    assert not any(a.deletion_vector for a in snap.add_actions), (
        "the rewrite must materialize vectors into clean files"
    )
    assert any(r.deletion_vector for r in snap.tombstones_all), (
        "consumed descriptors must survive as retention tombstones"
    )
    # fresh vectors, then COW UPDATE through them
    delete_where(
        path, [("id", "<", 12)], spark=spark, strategy="merge-on-read"
    )
    update_where(path, [("id", "<", 20)], {"val": F.lit(0)}, spark=spark)
    rows = {r["id"]: r["val"] for r in read_delta(path, spark=spark).collect()}
    assert set(rows) == set(range(12, 400))
    assert all(rows[i] == 0 for i in range(12, 20))
    assert rows[20] == 200
    # fresh vectors, then MERGE through them: vector-dead source keys
    # count as NOT MATCHED and insert (they are not in the table)
    delete_where(
        path, [("id", ">=", 395)], spark=spark, strategy="merge-on-read"
    )
    merge_into(
        path,
        df.filter("id IN (396, 20)").withColumn("val", F.lit(-1)),
        keys=["id"],
        spark=spark,
    )
    rows = {r["id"]: r["val"] for r in read_delta(path, spark=spark).collect()}
    assert rows[396] == -1 and rows[20] == -1  # insert + update
    assert set(rows) == set(range(12, 395)) | {396}
    # the python datasource applies vectors too — counts agree
    from dask_deltalake_spark.sources import register_python_datasource

    register_python_datasource(spark)
    assert (
        spark.read.format("delta_py").option("path", path).load().count()
        == len(rows)
    )
    # appends remain legal on a DV table
    to_delta(
        spark.range(400, 410)
        .withColumn("part", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 10),
        path,
        mode="append",
    )
    assert read_delta(path, spark=spark).count() == len(rows) + 10


def test_mor_update(spark, tmp_path):
    from dask_deltalake_spark.delta.mutate import update_where
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    _table(spark, path)
    res = update_where(
        path, [("id", "<", 30)], {"val": F.col("val") + 1},
        spark=spark, strategy="merge-on-read",
    )
    assert res["numUpdatedRows"] == 30 and res["numFilesAdded"] > 0
    out = read_delta(path, spark=spark)
    assert out.count() == 400  # updates never change cardinality
    assert (
        out.agg(F.sum("val")).first()[0]
        == sum(i * 10 + 1 for i in range(30)) + sum(i * 10 for i in range(30, 400))
    )
    # a second MoR update over already-updated rows must not resurrect
    # the vector-deleted originals
    update_where(
        path, [("id", "<", 10)], {"val": F.col("val") + 1},
        spark=spark, strategy="merge-on-read",
    )
    out2 = read_delta(path, spark=spark)
    assert out2.count() == 400
    assert (
        out2.agg(F.sum("val")).first()[0]
        == sum(i * 10 + 2 for i in range(10))
        + sum(i * 10 + 1 for i in range(10, 30))
        + sum(i * 10 for i in range(30, 400))
    )


def test_optimize_purges_vectors(spark, tmp_path):
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.maintenance import optimize, vacuum
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    _table(spark, path)
    delete_where(path, [("id", "<", 30)], spark=spark, strategy="merge-on-read")
    optimize(path, spark=spark)
    snap = DeltaLog(path).snapshot()
    assert all(a.deletion_vector is None for a in snap.add_actions)
    out = read_delta(path, spark=spark)
    assert out.count() == 370 and out.agg(F.min("id")).first()[0] == 30
    # every vector file is now reclaimable
    vacuum(path, retention_hours=0, dry_run=False, spark=spark)
    assert not any(f.endswith(".bin") for f in os.listdir(path))
    assert read_delta(path, spark=spark).count() == 370


def test_cdc_on_dv_commits(spark, tmp_path):
    from dask_deltalake_spark.delta.cdc import read_delta_changes
    from dask_deltalake_spark.delta.maintenance import optimize
    from dask_deltalake_spark.delta.mutate import delete_where, update_where

    path = str(tmp_path / "t")
    _table(spark, path)
    delete_where(path, [("id", "<", 30)], spark=spark, strategy="merge-on-read")
    delete_where(path, [("id", "<", 45)], spark=spark, strategy="merge-on-read")
    ch = read_delta_changes(path, starting_version=0, spark=spark)
    agg = {
        (r["_change_type"], r["_commit_version"]): r["count"]
        for r in ch.groupBy("_change_type", "_commit_version").count().collect()
    }
    # vector DELTAS, not whole files: v1 = 30 dead rows, v2 = 15 more
    assert agg == {("delete", 1): 30, ("delete", 2): 15}
    assert {r["id"] for r in ch.filter("_commit_version=2").collect()} == set(
        range(30, 45)
    )
    # resume: only the second commit's delta
    assert read_delta_changes(path, starting_version=1, spark=spark).count() == 15

    # MoR UPDATE + key_columns -> per-row pre/post images
    update_where(
        path, [("id", ">=", 390)], {"val": F.col("val") + 7},
        spark=spark, strategy="merge-on-read",
    )
    ch3 = read_delta_changes(
        path, starting_version=2, spark=spark, key_columns=["id"]
    )
    by = {
        r["_change_type"]: r["count"]
        for r in ch3.groupBy("_change_type").count().collect()
    }
    assert by == {"update_preimage": 10, "update_postimage": 10}
    pre = {r["id"]: r["val"] for r in ch3.filter("_change_type='update_preimage'").collect()}
    post = {r["id"]: r["val"] for r in ch3.filter("_change_type='update_postimage'").collect()}
    assert set(pre) == set(range(390, 400))
    assert all(post[k] == pre[k] + 7 for k in pre)

    # OPTIMIZE purge is dataChange=false: CDC-invisible, but the
    # vector state must roll across it
    optimize(path, spark=spark)
    delete_where(path, [("id", "==", 100)], spark=spark, strategy="merge-on-read")
    ch4 = read_delta_changes(path, starting_version=3, spark=spark)
    assert [(r["_change_type"], r["id"]) for r in ch4.collect()] == [
        ("delete", 100)
    ]


def test_append_only_enforced(spark, tmp_path):
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.protocol import DeltaProtocolError
    from dask_deltalake_spark.delta.writer import to_delta

    path = str(tmp_path / "t")
    df = spark.range(0, 10).withColumn("val", F.col("id"))
    to_delta(df, path, configuration={"delta.appendOnly": "true"})
    to_delta(df, path, mode="append")  # appends fine
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        to_delta(df, path, mode="overwrite")
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        delete_where(path, [("id", "<", 5)], spark=spark)
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        delete_where(
            path, [("id", "<", 5)], spark=spark, strategy="merge-on-read"
        )


def test_restore_across_vector_commits(spark, tmp_path):
    """RESTORE must re-add files whose deletion vector CHANGED, not
    just files that appeared/vanished — otherwise restored rows stay
    dead under the newer vector."""
    from dask_deltalake_spark.delta.maintenance import restore
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    _table(spark, path)                                               # v0
    delete_where(path, [("id", "<", 30)], spark=spark, strategy="merge-on-read")  # v1
    delete_where(path, [("id", "<", 45)], spark=spark, strategy="merge-on-read")  # v2
    assert read_delta(path, spark=spark).count() == 355
    restore(path, 1, spark=spark)                                     # back to 370
    assert read_delta(path, spark=spark).count() == 370
    assert read_delta(path, spark=spark).agg(F.min("id")).first()[0] == 30
    restore(path, 0, spark=spark)                                     # full table
    assert read_delta(path, spark=spark).count() == 400


def test_optimize_subset_applies_vectors(spark, tmp_path):
    """ADVICE r9 (high): OPTIMIZE's subset path (where=/min_file_size=,
    the branch auto-compact always takes) must filter DV'd candidates
    through their deletion vectors exactly as reorg_purge does —
    previously it read raw parquet via _read_files, resurrecting
    merge-on-read-deleted rows into the compacted output under a
    dataChange=false commit invisible to CDC/streaming readers."""
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.maintenance import optimize
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    _table(spark, path)  # 400 rows, part = id % 2
    delete_where(
        path, [("id", "<", 100)], spark=spark, strategy="merge-on-read"
    )
    # scope to one DV'd partition: a strict subset of the snapshot's
    # adds, i.e. the _read_files branch
    optimize(path, spark=spark, where=[("part", "=", 0)])
    snap = DeltaLog(path).snapshot()
    p0 = [
        a
        for a in snap.add_actions
        if a.partition_values.get("part") == "0"
    ]
    assert p0 and all(a.deletion_vector is None for a in p0)
    out = read_delta(path, spark=spark)
    assert out.count() == 300, "deleted rows stay deleted through OPTIMIZE"
    assert out.agg(F.min("id")).first()[0] == 100


def test_vacuum_respects_dv_tombstone_retention(spark, tmp_path):
    """Self-review r9: removes carry the removed add's deletionVector
    descriptor (delta-spark parity; serialized through commits AND
    checkpoints), and vacuum ages tombstoned DV bins by their remove's
    LOGICAL deletion time instead of file mtime — a bin created 10
    days ago but tombstoned a second ago (autoCompact purging an old
    merge-on-read delete) must survive a retention-window vacuum so
    time travel to the pre-purge version keeps working."""
    import time

    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
    from dask_deltalake_spark.delta.maintenance import (
        create_checkpoint,
        optimize,
        vacuum,
    )
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    _table(spark, path)
    delete_where(
        path, [("id", "<", 30)], spark=spark, strategy="merge-on-read"
    )
    v_mor = DeltaLog(path).snapshot().version
    old = time.time() - 10 * 86400
    bins = [f for f in os.listdir(path) if f.endswith(".bin")]
    assert bins, "merge-on-read delete wrote vector bins"
    for b in bins:
        os.utime(os.path.join(path, b), (old, old))
    optimize(path, spark=spark)  # purges vectors, tombstones the adds
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    assert any(
        r.deletion_vector for r in snap.tombstones.values()
    ), "removes carry the descriptor"
    # 168 h retention: the bin was REMOVED seconds ago, so despite its
    # 10-day-old mtime it must not be a vacuum candidate
    got = vacuum(path, retention_hours=168, dry_run=True, spark=spark)
    assert not any(p.endswith(".bin") for p in got), got
    for b in bins:
        assert os.path.exists(os.path.join(path, b))
    # time travel to the merge-on-read version still applies the vector
    assert read_delta(path, version=v_mor, spark=spark).count() == 370
    # descriptor survives a checkpoint-anchored replay too
    create_checkpoint(path)
    _SNAPSHOT_CACHE.clear()
    snap2 = DeltaLog(path).snapshot()
    assert any(r.deletion_vector for r in snap2.tombstones.values())
    got2 = vacuum(path, retention_hours=168, dry_run=True, spark=spark)
    assert not any(p.endswith(".bin") for p in got2), got2
    # retention elapsed: now reclaimable
    vacuum(path, retention_hours=0, dry_run=False, spark=spark)
    assert not any(f.endswith(".bin") for f in os.listdir(path))
    assert read_delta(path, spark=spark).count() == 370


def test_vacuum_protects_superseded_vector_bins(spark, tmp_path):
    """(path, dvId) tombstone keying (delta-kernel's file-action
    identity): a SECOND merge-on-read delete re-adds the same path
    with a merged vector, so the first delete's bin is referenced by
    no current add — but time travel to the inter-delete versions
    still reads it. The remove of (path, dvA) must survive the add of
    (path, dvB) in replay, giving the old bin a LOGICAL deletion time
    for vacuum retention; and the full keyed set must survive a
    checkpoint-anchored replay."""
    import time

    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
    from dask_deltalake_spark.delta.maintenance import (
        create_checkpoint,
        vacuum,
    )
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.reader import read_delta

    path = str(tmp_path / "t")
    _table(spark, path)
    delete_where(
        path, [("id", "<", 20)], spark=spark, strategy="merge-on-read"
    )
    v1 = DeltaLog(path).snapshot().version
    bins1 = {f for f in os.listdir(path) if f.endswith(".bin")}
    assert bins1
    old = time.time() - 10 * 86400
    for b in bins1:
        os.utime(os.path.join(path, b), (old, old))
    # second delete merges vectors: same paths re-added with new bins
    delete_where(
        path, [("id", "<", 40)], spark=spark, strategy="merge-on-read"
    )
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    # the superseded descriptors live in the keyed set, not the
    # path-keyed public dict (their paths are live again)
    assert any(
        r.deletion_vector for r in snap.tombstones_all
        if r.path in snap.files
    ), "superseded-vector tombstone retained for a live path"
    got = vacuum(path, retention_hours=168, dry_run=True, spark=spark)
    assert not any(p.endswith(".bin") for p in got), got
    assert read_delta(path, version=v1, spark=spark).count() == 380
    # keyed set survives a checkpoint-anchored replay
    create_checkpoint(path)
    _SNAPSHOT_CACHE.clear()
    snap2 = DeltaLog(path).snapshot()
    assert any(
        r.deletion_vector for r in snap2.tombstones_all
        if r.path in snap2.files
    )
    got2 = vacuum(path, retention_hours=168, dry_run=True, spark=spark)
    assert not any(p.endswith(".bin") for p in got2), got2
    # after retention the old bins reclaim; the live table is intact
    vacuum(path, retention_hours=0, dry_run=False, spark=spark)
    for b in bins1:
        assert not os.path.exists(os.path.join(path, b))
    assert read_delta(path, spark=spark).count() == 360


def test_replay_remove_of_stale_vector_keeps_live_add(spark, tmp_path):
    """Review r9 #2: Delta's action reconciliation is keyed by
    (path, dvId), so a conforming writer may order add(path, dvNew)
    BEFORE remove(path, dvOld) in one merge-on-read commit — the
    remove targets the STALE vector identity and must not evict the
    just-added live file (popping by path alone vanished every
    surviving row of the file)."""
    from dask_deltalake_spark.delta.dv import serialize_positions
    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.protocol import (
        AddAction,
        RemoveAction,
        dv_unique_id,
        now_ms,
    )
    from dask_deltalake_spark.delta.reader import read_delta
    from dask_deltalake_spark.delta.writer import to_delta, write_commit

    path = str(tmp_path / "t")
    to_delta(spark.range(0, 10).coalesce(1), path)
    delete_where(
        path, [("id", "<", 2)], spark=spark, strategy="merge-on-read"
    )
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    [a] = snap.add_actions
    dv_a = a.deletion_vector
    assert dv_a
    blob = serialize_positions([0, 1, 2])
    pad = (-len(blob)) % 4
    dv_b = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(blob + b"\x00" * pad),
        "sizeInBytes": len(blob),
        "cardinality": 3,
    }
    ts = now_ms()
    write_commit(
        path,
        snap.version + 1,
        [
            AddAction(
                path=a.path,
                size=a.size,
                partition_values=a.partition_values,
                modification_time=ts,
                data_change=True,
                stats=a.stats,
                deletion_vector=dv_b,
            ).to_json(),
            RemoveAction(
                path=a.path,
                deletion_timestamp=ts,
                data_change=True,
                deletion_vector=dv_a,
            ).to_json(),
        ],
    )
    _SNAPSHOT_CACHE.clear()
    snap2 = DeltaLog(path).snapshot()
    assert a.path in snap2.files, "live add survived the stale remove"
    assert snap2.files[a.path].deletion_vector == dv_b
    assert read_delta(path, spark=spark).count() == 7
    # the stale vector keeps its own tombstone identity for retention
    assert any(
        r.deletion_vector
        and dv_unique_id(r.deletion_vector) == dv_unique_id(dv_a)
        for r in snap2.tombstones_all
    )


def test_replay_same_commit_descriptorless_remove_is_kernel_strict(
    spark, tmp_path
):
    """Review r9 #3: within ONE commit, Delta action order is
    insignificant — a descriptor-less remove serialized AFTER its
    commit's add(path, dvNew) (a foreign writer's first
    merge-on-read delete, add-first) must not evict the just-added
    file. ACROSS commits a descriptor-less legacy remove still
    targets the live add whatever its vector (pre-r9 logs)."""
    from dask_deltalake_spark.delta.dv import serialize_positions
    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.protocol import (
        AddAction,
        RemoveAction,
        now_ms,
    )
    from dask_deltalake_spark.delta.reader import read_delta
    from dask_deltalake_spark.delta.writer import to_delta, write_commit

    path = str(tmp_path / "t")
    to_delta(spark.range(0, 10).coalesce(1), path)
    delete_where(
        path, [("id", "<", 2)], spark=spark, strategy="merge-on-read"
    )
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    [a] = snap.add_actions
    blob = serialize_positions([0, 1, 2])
    pad = (-len(blob)) % 4
    dv_b = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(blob + b"\x00" * pad),
        "sizeInBytes": len(blob),
        "cardinality": 3,
    }
    ts = now_ms()
    # same-commit, add FIRST, then a descriptor-less remove
    write_commit(
        path,
        snap.version + 1,
        [
            AddAction(
                path=a.path,
                size=a.size,
                partition_values=a.partition_values,
                modification_time=ts,
                data_change=True,
                stats=a.stats,
                deletion_vector=dv_b,
            ).to_json(),
            RemoveAction(
                path=a.path, deletion_timestamp=ts, data_change=True
            ).to_json(),
        ],
    )
    _SNAPSHOT_CACHE.clear()
    snap2 = DeltaLog(path).snapshot()
    assert a.path in snap2.files, "same-commit remove must not evict"
    assert snap2.files[a.path].deletion_vector == dv_b
    assert read_delta(path, spark=spark).count() == 7
    # cross-commit legacy remove: pops the DV'd live add
    write_commit(
        path,
        snap2.version + 1,
        [
            RemoveAction(
                path=a.path, deletion_timestamp=now_ms(), data_change=True
            ).to_json()
        ],
    )
    _SNAPSHOT_CACHE.clear()
    snap3 = DeltaLog(path).snapshot()
    assert not snap3.files, "legacy cross-commit remove still applies"
    # the evicted vector kept a retention tombstone
    assert any(r.deletion_vector for r in snap3.tombstones_all)


def test_replay_descriptor_aware_log_disarms_legacy_heuristic(
    spark, tmp_path
):
    """VERDICT r10 #4: the cross-commit legacy descriptor-less-remove
    heuristic must be UNREACHABLE on a log that has ever written a
    descriptor-carrying remove (proof of a conforming DV-aware
    writer). Here the second MoR delete stamps the removed dvA
    descriptor (the current engine is conforming), so a later
    descriptor-less remove targeting the live (path, dvB) add is a
    stale-identity action: delta-kernel's (path, dvId) keying ignores
    it, and replay now does too — the add survives where the pre-gate
    heuristic evicted it. Verified through a fresh replay AND through
    a checkpoint-anchored replay (the dv_removes_seen seed from
    checkpoint tombstones), with live-row counts pinned end-to-end."""
    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
    from dask_deltalake_spark.delta.maintenance import create_checkpoint
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.protocol import RemoveAction, now_ms
    from dask_deltalake_spark.delta.reader import read_delta
    from dask_deltalake_spark.delta.writer import to_delta, write_commit

    path = str(tmp_path / "t")
    to_delta(spark.range(0, 10).coalesce(1), path)
    delete_where(
        path, [("id", "<", 2)], spark=spark, strategy="merge-on-read"
    )
    delete_where(
        path, [("id", "<", 4)], spark=spark, strategy="merge-on-read"
    )
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    [a] = snap.add_actions
    assert a.deletion_vector, "precondition: live add carries dvB"
    assert any(
        r.deletion_vector for r in snap.tombstones_all
    ), "precondition: the dvA remove carried its descriptor"
    # a descriptor-less remove from a LATER commit — on this
    # descriptor-aware log it is stale-identity noise, not a legacy
    # eviction order
    write_commit(
        path,
        snap.version + 1,
        [
            RemoveAction(
                path=a.path, deletion_timestamp=now_ms(), data_change=True
            ).to_json()
        ],
    )
    _SNAPSHOT_CACHE.clear()
    snap2 = DeltaLog(path).snapshot()
    assert a.path in snap2.files, (
        "descriptor-aware log: kernel keying must keep the DV'd add"
    )
    assert snap2.files[a.path].deletion_vector == a.deletion_vector
    assert read_delta(path, spark=spark).count() == 6
    # same contract through a checkpoint-anchored replay: the seed
    # from checkpoint tombstones must keep the heuristic disarmed
    create_checkpoint(path)
    write_commit(
        path,
        snap2.version + 1,
        [
            RemoveAction(
                path=a.path, deletion_timestamp=now_ms(), data_change=True
            ).to_json()
        ],
    )
    _SNAPSHOT_CACHE.clear()
    snap3 = DeltaLog(path).snapshot()
    assert a.path in snap3.files and read_delta(
        path, spark=spark
    ).count() == 6


def test_replay_pre_r11_checkpoint_residue_is_exactly_as_documented(
    spark, tmp_path
):
    """ARCHITECTURE.md residue (2), pinned: a checkpoint written
    BEFORE the archive tag existed carries replay-synthesized
    descriptor archives indistinguishable from writer-stamped
    removes, so a checkpoint-ANCHORED replay of a legacy log reads a
    later bare remove strictly (the DV'd add survives), while the
    full replay of the same log re-synthesizes its archives WITH the
    tag and keeps the legacy eviction. Both sides asserted — if a
    future change silently shrinks or widens the residue, this
    fails."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_deltalake_spark.delta.dv import serialize_positions
    from dask_deltalake_spark.delta.log import _SNAPSHOT_CACHE, DeltaLog
    from dask_deltalake_spark.delta.maintenance import create_checkpoint
    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.protocol import (
        AddAction,
        RemoveAction,
        now_ms,
    )
    from dask_deltalake_spark.delta.writer import to_delta, write_commit

    path = str(tmp_path / "t")
    to_delta(spark.range(0, 10).coalesce(1), path)
    delete_where(
        path, [("id", "<", 2)], spark=spark, strategy="merge-on-read"
    )
    _SNAPSHOT_CACHE.clear()
    snap = DeltaLog(path).snapshot()
    [a] = snap.add_actions
    blob = serialize_positions([0, 1, 2])
    pad = (-len(blob)) % 4
    dv_b = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(blob + b"\x00" * pad),
        "sizeInBytes": len(blob),
        "cardinality": 3,
    }
    # v2: bare supersession add — replay synthesizes a TAGGED archive
    # for the old vector
    write_commit(
        path,
        snap.version + 1,
        [
            AddAction(
                path=a.path,
                size=a.size,
                partition_values=a.partition_values,
                modification_time=now_ms(),
                data_change=True,
                stats=a.stats,
                deletion_vector=dv_b,
            ).to_json()
        ],
    )
    cp = create_checkpoint(path)
    # simulate a pre-r11 checkpoint: strip the tags column content
    t = pq.read_table(cp)
    cols = {}
    for name in t.schema.names:
        col = t.column(name)
        if name == "remove":
            rows = col.to_pylist()
            for r in rows:
                if r is not None:
                    r["tags"] = None
            col = pa.array(rows, type=t.schema.field("remove").type)
        cols[name] = col
    pq.write_table(
        pa.table(cols, schema=t.schema), cp + ".tmp"
    )
    os.replace(cp + ".tmp", cp)
    # v3: the legacy writer's bare remove
    _SNAPSHOT_CACHE.clear()
    v3 = DeltaLog(path).latest_version() + 1
    write_commit(
        path,
        v3,
        [
            RemoveAction(
                path=a.path, deletion_timestamp=now_ms(), data_change=True
            ).to_json()
        ],
    )
    # checkpoint-ANCHORED replay: the untagged archive classifies as
    # writer-stamped -> heuristic disarmed -> strict reading, add
    # survives (the documented residue)
    _SNAPSHOT_CACHE.clear()
    anchored = DeltaLog(path).snapshot()
    assert a.path in anchored.files, "residue: anchored replay is strict"
    # FULL replay of the same history (checkpoint removed): the
    # archive is re-synthesized WITH the tag -> heuristic armed ->
    # the legacy eviction applies
    log = DeltaLog(path)
    log.store.delete(cp)
    lc = os.path.join(log.log_path, "_last_checkpoint")
    if log.store.exists(lc):
        log.store.delete(lc)
    _SNAPSHOT_CACHE.clear()
    full = DeltaLog(path).snapshot()
    assert a.path not in full.files, (
        "full replay must keep the legacy writer's intent"
    )


def test_dv_unique_id_kernel_format():
    """ADVICE r9: uniqueId matches delta-kernel's format — '@offset'
    appended only when the descriptor carries one (a present offset of
    0 still stamps '@0'; an absent offset stamps nothing)."""
    from dask_deltalake_spark.delta.protocol import dv_unique_id

    assert dv_unique_id(None) == ""
    assert dv_unique_id({}) == ""
    assert (
        dv_unique_id({"storageType": "u", "pathOrInlineDv": "ab12"})
        == "uab12"
    )
    assert (
        dv_unique_id(
            {"storageType": "u", "pathOrInlineDv": "ab12", "offset": 0}
        )
        == "uab12@0"
    )
    assert (
        dv_unique_id(
            {"storageType": "i", "pathOrInlineDv": "xyz", "offset": 42}
        )
        == "ixyz@42"
    )


def test_remove_extended_file_metadata_flag():
    """ADVICE r11 + review r12: the spec gates partitionValues/size
    on removes behind extendedFileMetadata=true — without the flag a
    strict foreign engine re-serializing the log may strip them. The
    flag is claimed ONLY when partitionValues AND size are BOTH
    present: flag-true with null partitionValues is the
    spec-malformed shape strict engines reject (delta-spark's
    tombstone partition filtering NPE'd on exactly it), so a
    tags-only remove ships its tags WITHOUT the flag. Pins: the flag
    condition, the tags-only shape, and that from_json round-trips a
    foreign remove's partitionValues/size instead of dropping them."""
    from dask_deltalake_spark.delta.protocol import RemoveAction

    bare = RemoveAction(path="f.parquet", deletion_timestamp=5)
    assert "extendedFileMetadata" not in bare.to_json()["remove"]

    tagged = RemoveAction(
        path="f.parquet",
        deletion_timestamp=5,
        tags={RemoveAction.REPLAY_ARCHIVE_TAG: "true"},
    )
    d = tagged.to_json()["remove"]
    assert "extendedFileMetadata" not in d, (
        "tags-only (no partitionValues/size) must NOT claim the flag "
        "— flag-true with null partitionValues is spec-malformed"
    )
    assert "partitionValues" not in d and "size" not in d
    assert d["tags"] == {RemoveAction.REPLAY_ARCHIVE_TAG: "true"}

    full = RemoveAction(
        path="p=1/f.parquet",
        deletion_timestamp=7,
        partition_values={"p": "1"},
        size=123,
    )
    d = full.to_json()["remove"]
    assert d["extendedFileMetadata"] is True
    assert d["partitionValues"] == {"p": "1"}
    assert d["size"] == 123

    back = RemoveAction.from_json(d)
    assert back.partition_values == {"p": "1"}
    assert back.size == 123
    # and the round-trip re-serializes with the flag intact (the
    # re-checkpointing scenario the ADVICE describes)
    assert back.to_json()["remove"]["extendedFileMetadata"] is True


def test_checkpoint_remove_rows_carry_extended_file_metadata(
    spark, tmp_path
):
    """The checkpoint writer's remove rows carry the same flag +
    gated fields: a DML remove (which now records the removed add's
    partitionValues/size) must survive a checkpoint round-trip with
    extendedFileMetadata=true so a strict engine re-serializing the
    checkpoint keeps the fields."""
    import pyarrow.parquet as pq

    from dask_deltalake_spark import to_delta
    from dask_deltalake_spark.delta.maintenance import create_checkpoint
    from dask_deltalake_spark.delta.mutate import delete_where

    path = str(tmp_path / "t")
    df = spark.range(100).selectExpr(
        "id", "CAST(id % 4 AS INT) AS p"
    )
    to_delta(df, path, partition_by=["p"])
    delete_where(path, [("p", "==", 1)], spark=spark)
    cp = create_checkpoint(path)
    rows = pq.read_table(cp).to_pylist()
    rem = [r["remove"] for r in rows if r.get("remove")]
    assert rem, "the COW delete must leave a tombstone in the checkpoint"
    for r in rem:
        assert r["extendedFileMetadata"] is True
        assert r["size"] is not None and r["size"] > 0
        pv = dict(r["partitionValues"])
        assert pv == {"p": "1"}


def test_dv_column_mapping_cdf_interplay(spark, tmp_path):
    """VERDICT r11 #3: deletion vectors x COLUMN MAPPING x CDF in one
    lifecycle. The COW rewrite keys its keep-predicate by
    ``_metadata.file_path`` over a PHYSICAL-name scan — a logical
    rename between the MoR delete and the rewrite is exactly where a
    bug would silently unkey the predicate (default-to-keep =
    resurrection). Pins: (1) a COW MERGE after MoR-delete + rename
    does not resurrect vector-deleted rows and applies its clauses
    against the RENAMED logical schema; (2) folding the CDF onto any
    version-k snapshot reproduces the latest snapshot across the
    upgrade/rename metadata commits; (3) row tracking on the same
    table makes the rewrite refuse loudly instead of stripping
    baseRowId ranges."""
    from dask_deltalake_spark import read_delta, to_delta
    from dask_deltalake_spark.delta.cdc import read_delta_changes
    from dask_deltalake_spark.delta.column_mapping import rename_column
    from dask_deltalake_spark.delta.log import DeltaLog
    from dask_deltalake_spark.delta.mutate import delete_where, merge_into
    from dask_deltalake_spark.delta.protocol import DeltaProtocolError
    from dask_deltalake_spark.delta.rowtracking import enable_row_tracking

    path = str(tmp_path / "t")
    df = spark.range(40).selectExpr(
        "id", "CAST(id % 2 AS INT) AS part", "CAST(id * 10 AS INT) AS val"
    )
    to_delta(df.coalesce(2), path, partition_by=["part"])       # v0
    delete_where(
        path, [("id", "<", 8)], spark=spark, strategy="merge-on-read"
    )                                                           # v1 MoR
    rename_column(path, "val", "amount", spark=spark)           # v2+v3
    # COW MERGE over the renamed logical schema: touches DV'd files,
    # must read them THROUGH their vectors with the physical-name
    # scan + file_path keying intact across the rename
    src = spark.range(4, 14).selectExpr(
        "id", "CAST(id % 2 AS INT) AS part",
        "CAST(-1 AS INT) AS amount",
    )
    merge_into(path, src, keys="id", spark=spark)               # v4

    got = {
        (r["id"], r["amount"])
        for r in read_delta(path, spark=spark).collect()
    }
    # ids 0..3: MoR-deleted AND not in the source → must stay dead
    assert not any(i in {g[0] for g in got} for i in range(4)), (
        "COW MERGE resurrected vector-deleted rows after a rename"
    )
    # ids 4..7: MoR-deleted but re-inserted by the merge (unmatched
    # source keys — they are dead in the target, so they INSERT)
    for i in range(4, 8):
        assert (i, -1) in got
    # ids 8..13: alive and matched → updated to -1
    for i in range(8, 14):
        assert (i, -1) in got
    # ids 14..39: untouched
    for i in range(14, 40):
        assert (i, i * 10) in got
    assert len(got) == 36

    # CDF fold: any version-k snapshot + changes-since-k == latest,
    # across the MoR vector commit AND the mapping metadata commits
    # (rename renames the LOGICAL name only — fold positionally so
    # pre-rename snapshots compare against post-rename changes)
    latest = DeltaLog(path).latest_version()
    assert latest == 4

    def third(r):
        d = r.asDict()
        return d["amount"] if "amount" in d else d["val"]

    def snap(v):
        return {
            (r["id"], r["part"], third(r))
            for r in read_delta(path, version=v, spark=spark).collect()
        }

    states = {v: snap(v) for v in range(latest + 1)}
    assert states[2] == states[1] == states[3], (
        "upgrade/rename must be metadata-only (data-invisible)"
    )
    for k in range(latest):
        ch = read_delta_changes(
            path, starting_version=k, key_columns=["id"], spark=spark
        ).collect()
        folded = set(states[k])
        by_v: dict = {}
        for r in ch:
            by_v.setdefault(r["_commit_version"], []).append(r)
        for v in sorted(by_v):
            for r in by_v[v]:
                if r["_change_type"] in ("delete", "update_preimage"):
                    folded.discard((r["id"], r["part"], third(r)))
            for r in by_v[v]:
                if r["_change_type"] in ("insert", "update_postimage"):
                    folded.add((r["id"], r["part"], third(r)))
        assert folded == states[latest], (
            f"CDF fold from v{k} diverged from v{latest}"
        )

    # row tracking on the same DV'd + mapped table: the rewrite
    # cannot maintain baseRowId ranges, so it must refuse loudly
    enable_row_tracking(path)
    with pytest.raises(DeltaProtocolError, match="rowTracking|features"):
        merge_into(path, src, keys="id", spark=spark)


def test_foreign_extended_remove_survives_our_recheckpoint(
    spark, tmp_path
):
    """The ADVICE r11 interop scenario, driven end-to-end in the
    direction WE control: a foreign writer's remove carrying
    extendedFileMetadata + partitionValues + size + tags must survive
    OUR re-serialization (create_checkpoint) with the flag and every
    gated field intact — before r12, from_json dropped
    partitionValues/size on parse, so our checkpoint silently
    stripped a foreign engine's fields."""
    import json as _json
    import os

    import pyarrow.parquet as pq

    from dask_deltalake_spark import read_delta, to_delta
    from dask_deltalake_spark.delta.maintenance import create_checkpoint

    path = str(tmp_path / "t")
    df = spark.range(20).selectExpr("id", "CAST(id % 2 AS INT) AS p")
    to_delta(df, path, partition_by=["p"])                      # v0
    # foreign-style commit: remove one of v0's files the way
    # delta-spark serializes it (flag + partitionValues + size + tags)
    log_dir = os.path.join(path, "_delta_log")
    v0_adds = [
        _json.loads(line)["add"]
        for line in open(os.path.join(log_dir, f"{0:020d}.json"))
        if '"add"' in line
    ]
    victim = next(a for a in v0_adds if a["partitionValues"] == {"p": "1"})
    import time as _time

    now_ms = int(_time.time() * 1000)
    foreign_remove = {
        "remove": {
            "path": victim["path"],
            # recent timestamp: an expired tombstone is DROPPED by
            # checkpoint retention (by design), which is not the
            # preservation path under test
            "deletionTimestamp": now_ms,
            "dataChange": True,
            "extendedFileMetadata": True,
            "partitionValues": victim["partitionValues"],
            "size": victim["size"],
            "tags": {"foreignMarker": "keep-me"},
        }
    }
    commit = {
        "commitInfo": {
            "timestamp": now_ms,
            "operation": "DELETE",
            "engineInfo": "Apache-Spark/3.5.0 Delta-Lake/3.1.0",
        }
    }
    with open(os.path.join(log_dir, f"{1:020d}.json"), "w") as fh:
        fh.write(_json.dumps(commit) + "\n")
        fh.write(_json.dumps(foreign_remove) + "\n")

    # our reader honors the foreign remove
    remaining = read_delta(path, spark=spark).count()
    assert remaining < 20

    # our checkpoint preserves the foreign remove's extended fields
    cp = create_checkpoint(path)
    rem = [
        r["remove"]
        for r in pq.read_table(cp).to_pylist()
        if r.get("remove") and r["remove"].get("path")
    ]
    mine = [r for r in rem if r["path"] == victim["path"]]
    assert mine, "the foreign tombstone must survive our checkpoint"
    r = mine[0]
    assert r["extendedFileMetadata"] is True
    assert dict(r["partitionValues"]) == victim["partitionValues"]
    assert r["size"] == victim["size"]
    assert dict(r["tags"]) == {"foreignMarker": "keep-me"}

    # and a checkpoint-anchored replay still reads the same table
    assert read_delta(path, spark=spark).count() == remaining
