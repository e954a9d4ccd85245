"""MERGE / DELETE copy-on-write semantics + file-level pruning."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import dask_deltalake_spark as ddl


def _mktable(spark, path):
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("v"),
        (F.col("id") % 4).alias("grp"),
    )
    # range-partition on the merge key → per-file stats have disjoint
    # key ranges, so key-bounded mutations prune to a file subset
    ddl.to_delta(df.repartitionByRange(4, "k"), str(path))
    return df


def test_merge_updates_inserts_and_prunes(spark, tmp_path):
    path = tmp_path / "m"
    _mktable(spark, path)
    src = spark.range(50).select(
        F.col("id").alias("k"),
        F.lit(-1.0).alias("v"),
        (F.col("id") % 4).alias("grp"),
    ).union(
        spark.range(1000, 1010).select(
            F.col("id").alias("k"),
            F.lit(-2.0).alias("v"),
            (F.col("id") % 4).alias("grp"),
        )
    )
    res = ddl.merge_into(str(path), src, keys="k", spark=spark)
    out = ddl.read_delta(str(path), spark=spark)
    assert out.count() == 1010
    assert out.filter(F.col("v") == -1.0).count() == 50
    assert out.filter(F.col("v") == -2.0).count() == 10
    # keys 0-49 and 1000-1009 span the first and last key ranges only;
    # the two middle files must carry over without a rewrite
    assert res["numFilesUntouched"] >= 1
    # untouched rows intact
    assert out.filter((F.col("k") == 500) & (F.col("v") == 1000.0)).count() == 1


def test_merge_schema_mismatch_raises(spark, tmp_path):
    import pytest

    path = tmp_path / "m2"
    _mktable(spark, path)
    bad = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="MERGE source columns"):
        ddl.merge_into(str(path), bad, keys="k", spark=spark)


def test_delete_where_and_time_travel(spark, tmp_path):
    path = tmp_path / "d"
    _mktable(spark, path)
    res = ddl.delete_where(str(path), [("k", "<", 100)], spark=spark)
    out = ddl.read_delta(str(path), spark=spark)
    assert out.count() == 900
    assert out.agg(F.min("k")).first()[0] == 100
    assert res["numFilesUntouched"] >= 1  # high-key files not rewritten
    # the pre-delete version is still readable (copy-on-write)
    assert ddl.read_delta(str(path), version=0, spark=spark).count() == 1000


def test_delete_or_of_ands(spark, tmp_path):
    path = tmp_path / "d2"
    _mktable(spark, path)
    ddl.delete_where(
        str(path), [[("grp", "==", 0)], [("grp", "==", 1)]], spark=spark
    )
    out = ddl.read_delta(str(path), spark=spark)
    assert out.count() == 500
    assert set(r[0] for r in out.select("grp").distinct().collect()) == {2, 3}


def test_delete_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE removes only rows where the predicate is TRUE — rows
    where it evaluates to NULL (e.g. v IS NULL under v > 5) stay."""
    path = str(tmp_path / "dn")
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 2.0), (4, None), (5, 7.0)],
        "k long, v double",
    )
    ddl.to_delta(df, path)
    ddl.delete_where(path, [("v", ">", 5.0)], spark=spark)
    out = ddl.read_delta(path, spark=spark)
    kept = sorted(r["k"] for r in out.collect())
    assert kept == [2, 3, 4]  # NULL-v rows 2 and 4 must survive


def test_merge_large_source_no_forced_broadcast(spark, tmp_path):
    """A merge source above the IN-list cap (and above
    autoBroadcastJoinThreshold, simulated by dropping it to -1) must
    not carry a forced broadcast hint — the plan should fall back to a
    shuffle join and the merge still be correct."""
    path = str(tmp_path / "mbig")
    _mktable(spark, path)
    src = spark.range(15_000).select(  # > _IN_LIST_CAP of 10k
        F.col("id").alias("k"),
        F.lit(-9.0).alias("v"),
        (F.col("id") % 4).alias("grp"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ddl.merge_into(path, src, keys="k", spark=spark)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    out = ddl.read_delta(path, spark=spark)
    assert out.count() == 15_000
    assert out.filter(F.col("v") == -9.0).count() == 15_000


def test_restore_roundtrip_and_vacuum_guard(spark, tmp_path):
    import time

    import pytest

    path = str(tmp_path / "r")
    df = _mktable(spark, path)
    ddl.delete_where(path, [("k", "<", 500)], spark=spark)
    assert ddl.read_delta(path, spark=spark).count() == 500

    res = ddl.restore(path, version=0, spark=spark)
    assert res["version"] == 2
    assert ddl.read_delta(path, spark=spark).count() == 1000
    # intermediate deleted state still addressable
    assert ddl.read_delta(path, version=1, spark=spark).count() == 500

    # roll forward again, vacuum the v0-era files, then restore must fail
    ddl.delete_where(path, [("k", "<", 500)], spark=spark)
    time.sleep(0.02)
    ddl.vacuum(path, retention_hours=0, dry_run=False, spark=spark)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        ddl.restore(path, version=0, spark=spark)


def test_merge_on_partitioned_table(spark, tmp_path):
    path = str(tmp_path / "mp")
    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("grp"),
        (F.col("id") * 1.0).alias("v"),
    )
    ddl.to_delta(df, path, partition_by=["grp"])
    src = spark.range(20).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("grp"),
        F.lit(-5.0).alias("v"),
    )
    ddl.merge_into(path, src, keys="k", spark=spark)
    out = ddl.read_delta(path, spark=spark)
    assert out.count() == 400
    assert out.filter(F.col("v") == -5.0).count() == 20
    # hive partitioning still intact: partition filter returns only grp=1
    pruned = ddl.read_delta(path, filter=[("grp", "==", 1)], spark=spark)
    assert pruned.count() == 100
    assert pruned.filter(F.col("k") % 4 != 1).count() == 0


def test_merge_clause_semantics(spark, tmp_path):
    """delta-spark MERGE clause subsets over the key condition:
    update-only, delete-on-match, insert-only — defaults stay the
    classic upsert."""
    import pytest

    from dask_deltalake_spark.delta.mutate import merge_into
    from dask_deltalake_spark.delta.reader import read_delta
    from dask_deltalake_spark.delta.writer import to_delta

    def fresh(name):
        p = str(tmp_path / name)
        to_delta(
            spark.range(5).selectExpr("id AS k", "id * 10 AS v").coalesce(1),
            p,
        )
        return p

    src = spark.range(3, 8).selectExpr("id AS k", "id * 100 AS v")

    # update-only: matched keys 3,4 updated; 5,6,7 NOT inserted
    p = fresh("t_upd")
    merge_into(p, src, ["k"], spark=spark, when_not_matched="ignore")
    got = {r["k"]: r["v"] for r in read_delta(p, spark=spark).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 300, 4: 400}

    # delete-on-match + insert: keys 3,4 removed, 5,6,7 inserted
    p = fresh("t_del_ins")
    merge_into(p, src, ["k"], spark=spark, when_matched="delete")
    got = {r["k"]: r["v"] for r in read_delta(p, spark=spark).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 5: 500, 6: 600, 7: 700}

    # delete-only: keys 3,4 removed, nothing inserted
    p = fresh("t_del")
    merge_into(
        p, src, ["k"], spark=spark,
        when_matched="delete", when_not_matched="ignore",
    )
    got = {r["k"]: r["v"] for r in read_delta(p, spark=spark).collect()}
    assert got == {0: 0, 1: 10, 2: 20}

    # insert-only: matched rows untouched, 5,6,7 inserted
    p = fresh("t_ins")
    merge_into(p, src, ["k"], spark=spark, when_matched="ignore")
    got = {r["k"]: r["v"] for r in read_delta(p, spark=spark).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 30, 4: 40, 5: 500, 6: 600, 7: 700}

    # defaults = classic upsert (d11's hash-pinned behavior)
    p = fresh("t_upsert")
    merge_into(p, src, ["k"], spark=spark)
    got = {r["k"]: r["v"] for r in read_delta(p, spark=spark).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 300, 4: 400, 5: 500,
                   6: 600, 7: 700}

    with pytest.raises(ValueError, match="no clause"):
        merge_into(p, src, ["k"], spark=spark,
                   when_matched="ignore", when_not_matched="ignore")


@pytest.mark.parametrize(
    "pred",
    [
        [("k", "<", 7)],
        [("k", "<=", 0)],
        [("v", "==", 2)],
        [("v", "!=", 2)],
        [("k", "in", [3, 5, 44])],
        # OR-of-ANDs (list of lists)
        [[("k", "<", 3)], [("v", "==", 4), ("k", ">", 20)]],
        # null-column predicate: NULL w rows never match -> survive
        [("w", "==", 1)],
        # matches nothing
        [("k", ">", 10_000)],
        # matches everything
        [("k", ">=", 0)],
    ],
    ids=["lt", "le-edge", "eq", "ne", "in", "or-of-ands", "null-trap",
         "none", "all"],
)
def test_delete_cow_mor_equivalence(spark, tmp_path, pred):
    """Cross-strategy contract: for ANY reference-grammar predicate,
    copy-on-write (file rewrite) and merge-on-read (deletion vectors
    + Arrow position filter on read) must expose IDENTICAL visible
    data — same rows, same values, including three-valued-logic
    corners (NULL predicate columns never match a DELETE, so those
    rows survive under both strategies) and the degenerate
    nothing/everything matches."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.delta.mutate import delete_where
    from dask_deltalake_spark.delta.reader import read_delta
    from dask_deltalake_spark.delta.writer import to_delta

    df = (
        spark.range(0, 50)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 5).cast("int").alias("v"),
            F.when((F.col("id") % 3) == 0, F.col("id") % 2)
            .cast("int")
            .alias("w"),
        )
        .repartition(3)
    )
    out = {}
    for strat in ("copy-on-write", "merge-on-read"):
        path = str(tmp_path / strat)
        to_delta(df, path)
        delete_where(path, pred, spark=spark, strategy=strat)
        rows = sorted(
            (r["k"], r["v"], r["w"])
            for r in read_delta(path, spark=spark).collect()
        )
        out[strat] = rows
    assert out["copy-on-write"] == out["merge-on-read"]
    if pred == [("w", "==", 1)]:
        # NULL w rows must survive a DELETE they can't match
        assert any(w is None for (_, _, w) in out["copy-on-write"])


@pytest.mark.parametrize(
    "pred",
    [
        [("k", "<", 7)],
        [[("k", "<", 3)], [("v", "==", 4), ("k", ">", 20)]],
        [("w", "==", 1)],  # NULL w rows never match -> unchanged
        [("k", ">", 10_000)],  # no-op update
    ],
    ids=["lt", "or-of-ands", "null-trap", "none"],
)
def test_update_cow_mor_equivalence(spark, tmp_path, pred):
    """Same cross-strategy contract for UPDATE: the copy-on-write
    rewrite and the merge-on-read path must expose identical visible
    data for any predicate shape, including rows shielded by
    three-valued logic and the empty match."""
    from dask_deltalake_spark.delta.mutate import update_where
    from dask_deltalake_spark.delta.reader import read_delta
    from dask_deltalake_spark.delta.writer import to_delta

    df = (
        spark.range(0, 50)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 5).cast("int").alias("v"),
            F.when((F.col("id") % 3) == 0, F.col("id") % 2)
            .cast("int")
            .alias("w"),
        )
        .repartition(3)
    )
    out = {}
    for strat in ("copy-on-write", "merge-on-read"):
        path = str(tmp_path / strat)
        to_delta(df, path)
        update_where(
            path,
            pred,
            {"v": F.col("v") + 100},
            spark=spark,
            strategy=strat,
        )
        rows = sorted(
            (r["k"], r["v"], r["w"])
            for r in read_delta(path, spark=spark).collect()
        )
        out[strat] = rows
    assert out["copy-on-write"] == out["merge-on-read"]
    # row count is invariant under UPDATE
    assert len(out["copy-on-write"]) == 50


from hypothesis import HealthCheck as _HealthCheck
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st

_target_rows = _st.lists(
    _st.tuples(
        _st.integers(min_value=0, max_value=12),  # key
        _st.integers(min_value=-5, max_value=5),  # value
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda t: t[0],
)
_source_rows = _st.lists(
    _st.tuples(
        _st.integers(min_value=0, max_value=12),
        _st.integers(min_value=100, max_value=110),
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda t: t[0],
)
_clauses = _st.tuples(
    _st.sampled_from(["update", "delete", "ignore"]),
    _st.sampled_from(["insert", "ignore"]),
).filter(
    # ("ignore", "ignore") is a MERGE with no clause — the engine
    # rejects it loudly (pinned by the ValueError in merge_into)
    lambda c: c != ("ignore", "ignore")
)


@_settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[_HealthCheck.too_slow],
)
@_given(target=_target_rows, source=_source_rows, clauses=_clauses)
def test_merge_matches_reference_semantics_property(
    spark, tmp_path_factory, target, source, clauses
):
    """MERGE against an independent reference: for random
    (keyed-unique) target/source frames and every clause combination,
    the merged table equals the set-arithmetic spec — matched keys
    updated/deleted/kept per when_matched, unmatched source keys
    inserted/dropped per when_not_matched, untouched target rows
    byte-identical. Empty target, empty source, and full-overlap
    shapes all fall out of the generator."""
    from dask_deltalake_spark.delta.mutate import merge_into
    from dask_deltalake_spark.delta.reader import read_delta
    from dask_deltalake_spark.delta.writer import to_delta

    when_matched, when_not_matched = clauses
    base = tmp_path_factory.mktemp("merge_prop")
    path = str(base / "t")
    tgt = spark.createDataFrame(
        target or [(99999, 0)], "k long, v long"
    )
    if not target:
        tgt = tgt.filter("k < 0")  # truly empty, schema kept
    to_delta(tgt.coalesce(1), path)
    src = spark.createDataFrame(
        source or [(99999, 0)], "k long, v long"
    )
    if not source:
        src = src.filter("k < 0")
    merge_into(
        path,
        src,
        keys="k",
        spark=spark,
        when_matched=when_matched,
        when_not_matched=when_not_matched,
    )
    got = sorted(
        (r["k"], r["v"]) for r in read_delta(path, spark=spark).collect()
    )
    t, s = dict(target), dict(source)
    exp = {}
    for k, v in t.items():
        if k in s:
            if when_matched == "update":
                exp[k] = s[k]
            elif when_matched == "ignore":
                exp[k] = v
            # "delete": drop
        else:
            exp[k] = v
    if when_not_matched == "insert":
        for k, v in s.items():
            if k not in t:
                exp[k] = v
    assert got == sorted(exp.items()), (
        target, source, clauses, got, sorted(exp.items())
    )
