"""Every registered query must plan and execute at sf0.001.

The DuckDB oracle gate (tools/check_oracle.py, driver t2) checks value
correctness at sf0.01; this smoke keeps the whole registry executable
from pytest — schema stays resolvable and each query returns rows
without error at the smallest scale factor.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _registry():
    from dask_deltalake_spark.operators import REGISTRY

    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _registry())
def test_query_runs(spark, name):
    from dask_deltalake_spark.operators import REGISTRY

    fn, oracle = REGISTRY[name]
    df = fn(spark, SF_DIR)
    assert df.columns, f"{name} returned no columns"
    rows = df.limit(5).collect()
    assert rows is not None
    if oracle is not None:
        assert oracle.strip().upper().startswith(("SELECT", "WITH")), name


def test_q47_lateral_matches_window_reference(spark):
    """q47 (r10 debut): the LATERAL top-N-per-group subquery must
    agree row-for-row with the independent window-function phrasing
    on the same data — the local stand-in for the DuckDB oracle it
    registers with in r10."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from dask_deltalake_spark.operators.relational import (
        q47_lateral_topn_per_group,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = q47_lateral_topn_per_group(spark, sf_dir)
    assert set(got.columns) == {"c_custkey", "o_orderkey", "top_price"}
    from dask_deltalake_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ref = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("top_price"),
        )
    )
    assert got.count() == ref.count() > 0
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_s11_transform_with_state_matches_batch(spark):
    """s11 (staged, ENVIRONMENTALLY GATED — transformWithState,
    Spark 4's StatefulProcessor API): the streaming per-user
    (n_events, n_types) from a ValueState + MapState processor over
    RocksDB must equal the batch groupBy on the same events table,
    and the session's state-store provider conf must be RESTORED
    after the query's scoped override. The gate: transformWithState's
    Python driver worker speaks a protobuf state-server protocol
    (pyspark.sql.streaming.proto), and google.protobuf is NOT
    installed in this sandbox (pip is unavailable) — the same
    environmental class as the real-fsspec skip. This importorskip
    un-gates automatically the moment the module appears; until then
    the query stays out of the registry (a driver row would fail on
    the missing import, not on the semantics)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    import pyspark.sql.functions as F

    from dask_deltalake_spark.streaming.ops import (
        s11_stream_transform_with_state,
    )
    from dask_deltalake_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(provider_key, None)
    got = {
        r["user_id"]: (r["n_events"], r["n_types"])
        for r in s11_stream_transform_with_state(spark, sf_dir).collect()
    }
    assert spark.conf.get(provider_key, None) == before, (
        "scoped RocksDB provider conf must not leak"
    )
    ev = load_table(spark, sf_dir, "events")
    exp_rows = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(50)
        .collect()
    )
    exp = {r["user_id"]: (r["n_events"], r["n_types"]) for r in exp_rows}
    assert got == exp and len(got) > 0


def test_x42_zipf_stats_matches_duckdb_oracle(spark):
    """x42 (staged r11 debut): the Spark Zipf/token-distribution
    diagnostics must match the drafted DuckDB oracle cell-for-cell on
    the same parquet — the exact comparison the driver gate will run
    when x42 registers — plus an independent pure-pandas recomputation
    of the hapax/vocab/slope arithmetic."""
    import math

    import duckdb

    from dask_deltalake_spark.functions.llmops import (
        _X42_ORACLE,
        x42_zipf_token_stats,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = x42_zipf_token_stats(spark, sf_dir).collect()[0].asDict()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    res = con.execute(_X42_ORACLE)
    cols = [d[0] for d in res.description]
    exp = dict(zip(cols, res.fetchone()))
    assert set(got) == set(exp)
    for k in got:
        g, e = got[k], exp[k]
        assert (g == e) or (
            isinstance(g, float)
            and e is not None
            and abs(g - float(e)) < 1e-9
        ), (k, g, e)

    # independent reference: pure-python recomputation
    import collections
    import re as _re

    import pandas as pd

    texts = pd.read_parquet(f"{sf_dir}/documents.parquet")["text"]
    cnt = collections.Counter()
    for t in texts:
        # mirror tokens()/the oracle EXACTLY: lowercase, trim SPACES
        # only (not all whitespace), split on ' +', and keep the ''
        # token an empty/space-only text produces — str.strip() +
        # skip-empty would silently diverge on whitespace-edge docs
        t = (t or "").lower().strip(" ")
        cnt.update(_re.split(" +", t))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    n_tokens = sum(cnt.values())
    assert got["n_tokens"] == n_tokens
    assert got["vocab"] == len(cnt)
    assert got["hapax"] == sum(1 for _, c in cnt.items() if c == 1)
    assert got["top10_coverage"] == round(
        sum(c for _, c in ranked[:10]) / n_tokens, 4
    )
    xs = [math.log10(i + 1) for i in range(len(ranked))]
    ys = [math.log10(c) for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(got["zipf_slope"] - round(slope, 4)) <= 1e-4


def test_d49_stats_columns_matches_duckdb_oracle(spark):
    """d49 (staged r11 debut): the stats-collection-properties
    lifecycle must match its drafted DuckDB oracle cell-for-cell —
    the exact comparison the driver gate will run when d49 registers.
    (The property mechanics themselves are pinned column-by-column in
    tests/test_stats_columns.py; this pins the registered shape.)"""
    import duckdb

    from dask_deltalake_spark.operators.delta_ops import (
        _D49_ORACLE,
        d49_stats_columns,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = d49_stats_columns(spark, sf_dir).collect()[0].asDict()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW nation AS SELECT * FROM "
        f"read_parquet('{sf_dir}/nation.parquet')"
    )
    res = con.execute(_D49_ORACLE)
    exp = dict(zip([d[0] for d in res.description], res.fetchone()))
    assert got == exp
    assert got["stats_scoped"] == 1 and got["unstatsed_filter_correct"] == 1


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_q50_funnel_matches_duckdb_oracle(spark, sf_dir):
    """q50 (staged r11 debut): the single-shuffle ordered-funnel fold
    must match the MIN-cascade DuckDB oracle cell-for-cell at both
    test scales. NOTE: on this synthetic corpus every funnel user
    fully converts at BOTH scales (the four counts are equal), so the
    fold's NULL-stage branches are exercised by the dedicated
    partial-funnel fixture test below, not here — this test pins the
    driver-gate comparison shape and the conversion-delay value."""
    import duckdb

    from dask_deltalake_spark.operators.relational import (
        _Q50_ORACLE,
        q50_funnel_ordered,
    )

    if not os.path.isdir(sf_dir):
        pytest.skip("testdata scale not present")
    got = q50_funnel_ordered(spark, sf_dir).collect()[0].asDict()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    res = con.execute(_Q50_ORACLE)
    exp = dict(zip([d[0] for d in res.description], res.fetchone()))
    assert got == exp
    assert got["n_users"] >= got["n_view"] >= got["n_view_click"] >= got[
        "n_full_funnel"
    ] >= 0


def test_q50_funnel_partial_and_tie_branches(spark, tmp_path):
    """The fold's NULL-latching and strict-after branches on a
    synthetic corpus the real testdata cannot exercise (every real
    user fully converts): view-only, view+click-only, click-BEFORE-
    view, purchase-before-click, same-timestamp ties (strict > must
    reject), and a non-funnel-only user (outside the universe) — each
    hand-computed AND cross-checked against the DuckDB oracle on the
    same parquet."""
    import datetime as dt

    import duckdb

    from dask_deltalake_spark.operators.relational import (
        _Q50_ORACLE,
        q50_funnel_ordered,
    )

    t0 = dt.datetime(2024, 1, 1)

    def at(mins):
        return t0 + dt.timedelta(minutes=mins)

    rows = [
        # u1: full funnel in order
        (1, at(0), "view"), (1, at(10), "click"), (1, at(20), "purchase"),
        # u2: view only
        (2, at(0), "view"),
        # u3: view + click, no purchase
        (3, at(0), "view"), (3, at(5), "click"),
        # u4: click BEFORE view (ignored), valid click after
        (4, at(0), "click"), (4, at(1), "view"), (4, at(2), "click"),
        (4, at(3), "purchase"),
        # u5: purchase before click -> no t3
        (5, at(0), "view"), (5, at(1), "purchase"), (5, at(2), "click"),
        # u6: non-funnel events only -> outside the funnel universe
        (6, at(0), "error"), (6, at(1), "signup"),
        # u7: click at the SAME ts as view (strict > rejects), a later
        # click converts; purchase at same ts as that click rejected,
        # none later -> no t3
        (7, at(0), "view"), (7, at(0), "click"), (7, at(4), "click"),
        (7, at(4), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")
    got = q50_funnel_ordered(spark, sf_dir).collect()[0].asDict()
    # hand-computed: universe = u1-u5, u7 (6 users, all with a view);
    # clicks-after-view: u1, u3, u4, u5 (its click at minute 2 IS
    # after its view — only the purchase precedes the click), u7 (5);
    # full funnel: u1, u4 (2); delays: u1 20 min, u4 2 min -> 660 s
    assert got == {
        "n_users": 6,
        "n_view": 6,
        "n_view_click": 5,
        "n_full_funnel": 2,
        "avg_convert_secs": 660.0,
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    res = con.execute(_Q50_ORACLE)
    exp = dict(zip([d[0] for d in res.description], res.fetchone()))
    assert got == exp


def test_d50_version_checksum_matches_duckdb_oracle(spark):
    """d50 (staged r12 debut): the version-checksum lifecycle must
    match its drafted DuckDB oracle cell-for-cell — the exact
    comparison the driver gate will run when d50 registers. (The
    checksum mechanics — best-effort writes on every commit path,
    replay cross-check, tamper fields, cleanup with commits — are
    pinned in tests/test_version_checksum.py; this pins the
    registered shape: all versions valid, tamper detected, missing
    sidecar raises.)"""
    import duckdb

    from dask_deltalake_spark.operators.delta_ops import (
        _D50_ORACLE,
        d50_version_checksum,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = d50_version_checksum(spark, sf_dir).collect()[0].asDict()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW supplier AS SELECT * FROM "
        f"read_parquet('{sf_dir}/supplier.parquet')"
    )
    res = con.execute(_D50_ORACLE)
    exp = dict(zip([d[0] for d in res.description], res.fetchone()))
    assert got == exp
    assert got["all_versions_valid"] == 1
    assert got["tamper_detected"] == 1
    assert got["missing_crc_raises"] == 1


def test_q52_ignore_nulls_matches_duckdb_oracle(spark):
    """q52 (staged r12 debut): the IGNORE NULLS window family must
    match the DuckDB oracle row-for-row — the exact driver-gate
    comparison (the two engines spell IGNORE NULLS differently —
    Spark's ANSI postfix clause vs DuckDB's in-paren form — which is
    exactly why the staged pin matters). Also asserts the skipping
    is non-vacuous: the fabricated nullable column has NULLs, and at
    least one prev_open differs from a plain LAG."""
    import duckdb

    from dask_deltalake_spark.operators.relational import (
        _Q52_ORACLE,
        q52_window_ignore_nulls,
    )

    sf_dir = "/root/testdata/sf0.01"
    got = {
        r["o_orderkey"]: (
            r["prev_open"], r["next_open"], r["last_known"],
            r["second_open"],
        )
        for r in q52_window_ignore_nulls(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    exp = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(_Q52_ORACLE).fetchall()
    }
    assert got == exp and len(got) > 100
    # non-vacuous: some rows have a null-skipped predecessor
    assert any(v[0] is None for v in got.values())
    assert any(v[0] is not None for v in got.values())


def test_x43_embedding_cohesion_matches_duckdb_oracle(spark):
    """x43 (staged r12 debut): per-label embedding cohesion
    diagnostics must match the positional-UNNEST DuckDB oracle
    cell-for-cell, plus geometry sanity: cohesion to a label's own
    centroid is at least cohesion to the global centroid on a
    clustered corpus (own centroid is the mean that maximizes it)."""
    import duckdb

    from dask_deltalake_spark.functions.llmops import (
        _X43_ORACLE,
        x43_embedding_cohesion,
    )

    sf_dir = "/root/testdata/sf0.01"
    df = x43_embedding_cohesion(spark, sf_dir)
    # scale claim pinned: the per-label centroid frame joins back to
    # the corpus BROADCAST (K-row metadata side), and the global
    # centroid rides a single-row broadcast nested loop — never a
    # corpus-shuffling join
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    got = {
        r["label"]: (
            r["n_vecs"], r["avg_norm"], r["cos_to_global"],
            r["cos_to_own"],
        )
        for r in df.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    exp = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(_X43_ORACLE).fetchall()
    }
    assert got == exp and len(got) >= 2
    for lbl, (_n, _nrm, cg, co) in got.items():
        assert co >= cg - 1e-9, (lbl, co, cg)


def test_q53_null_safe_join_matches_duckdb_oracle(spark):
    """q53 (staged r12 debut): null-safe equality join — Spark's <=>
    pinned value-identical to DuckDB's IS NOT DISTINCT FROM, with the
    NULL bucket asserted non-empty (the semantics the query exists to
    exercise) and the plan asserted hash-join, never a nested loop
    (EqualNullSafe is a hashable key)."""
    import duckdb

    from dask_deltalake_spark.operators.relational import (
        _Q53_ORACLE,
        q53_null_safe_join,
    )

    sf_dir = "/root/testdata/sf0.01"
    df = q53_null_safe_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = {r["nk"]: (r["n_pairs"], r["n_cust"], r["bal_sum"])
           for r in df.collect()}
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    exp = {r[0]: (r[1], r[2], r[3])
           for r in con.execute(_Q53_ORACLE).fetchall()}
    assert got == exp
    assert None in got and got[None][0] > 0, (
        "the NULL bucket must join with itself under <=>"
    )


def test_q54_multi_distinct_filter_matches_duckdb_oracle(spark):
    """q54 (staged r12 debut): mixed multi-DISTINCT + FILTER
    aggregates pinned cell-for-cell against DuckDB, with the Expand
    rewrite plan-asserted (the physical family the query exists to
    sample) and exactly one lineitem scan."""
    import duckdb

    from dask_deltalake_spark.operators.relational import (
        _Q54_ORACLE,
        q54_multi_distinct_filter_agg,
    )

    sf_dir = "/root/testdata/sf0.01"
    df = q54_multi_distinct_filter_agg(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan, "multi-distinct must take the Expand rewrite"
    assert plan.count("FileScan parquet") <= 1, (
        "FILTER clauses must not duplicate the corpus scan"
    )
    got = {r["flag"]: (r["n_orders"], r["n_suppliers"], r["n_discounted"],
                       r["untaxed_revenue"], r["n_bulk_parts"])
           for r in df.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    exp = {r[0]: (r[1], r[2], r[3], r[4], r[5])
           for r in con.execute(_Q54_ORACLE).fetchall()}
    assert got == exp and len(got) == 3


def test_q55_full_outer_join_matches_duckdb_oracle(spark):
    """q55 (staged r13 debut): FULL OUTER join pinned cell-for-cell
    against DuckDB, with all three null-extension cohorts asserted
    populated (the semantics the query exists to exercise) and the
    plan asserted a shuffle join strategy carrying FullOuter — never
    a BroadcastNestedLoopJoin (full outer cannot broadcast; a BNLJ
    fallback would be the 100 TB killer)."""
    import duckdb

    from dask_deltalake_spark.operators.relational import (
        _Q55_ORACLE,
        q55_full_outer_join,
    )

    sf_dir = "/root/testdata/sf0.01"
    df = q55_full_outer_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan, "the join must plan as FULL OUTER"
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), (
        "full outer must take a shuffle join strategy"
    )
    got = {
        r["cohort"]: (
            r["n_customers"], r["orders_before"], r["orders_after"],
            r["revenue_delta"],
        )
        for r in df.collect()
    }
    assert set(got) == {"gained", "lost", "retained"}, (
        "all three null-extension cohorts must be populated"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    exp = {r[0]: (r[1], r[2], r[3], r[4])
           for r in con.execute(_Q55_ORACLE).fetchall()}
    assert got == exp


def test_q56_multiset_ops_matches_duckdb_oracle(spark):
    """q56 (staged r13 debut): EXCEPT ALL / INTERSECT ALL multiset
    semantics pinned cell-for-cell against DuckDB, with duplicate
    multiplicity asserted non-degenerate (ALL results differ from
    what DISTINCT semantics would give) and the plan asserted
    join-free (Catalyst's RewriteExceptAll/RewriteIntersectAll is an
    aggregate + generate replication, not a join)."""
    import duckdb

    from dask_deltalake_spark.operators.relational import (
        _Q56_ORACLE,
        q56_multiset_ops,
    )

    sf_dir = "/root/testdata/sf0.01"
    df = q56_multiset_ops(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") >= 2, (
        "EXCEPT ALL / INTERSECT ALL must take the aggregate+replicate "
        "rewrite (a Generate node per operator)"
    )
    for node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert node not in plan, f"multiset ops must not plan a {node}"
    assert plan.count("BroadcastNestedLoopJoin") == 1, (
        "the only join is the single-row x single-row result combiner"
    )
    row = df.collect()[0].asDict()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    exp = con.execute(_Q56_ORACLE).fetchdf().iloc[0].to_dict()
    assert {k: int(v) for k, v in row.items()} == {
        k: int(v) for k, v in exp.items()
    }
    # multiplicity is the signal: the EXCEPT ALL result must exceed
    # the DISTINCT except (duplicates survive), pinned via DuckDB
    n_distinct = con.execute(
        "WITH a AS (SELECT l_suppkey AS k, CAST(l_quantity AS INT) AS q "
        "FROM lineitem WHERE l_returnflag = 'R'), "
        "b AS (SELECT l_suppkey AS k, CAST(l_quantity AS INT) AS q "
        "FROM lineitem WHERE l_linestatus = 'F' AND l_returnflag <> 'N') "
        "SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)"
    ).fetchone()[0]
    assert row["n_except_all"] > n_distinct > 0, (
        "the fixture must exercise real duplicate multiplicity"
    )


def test_q57_interval_range_matches_duckdb_oracle(spark):
    """q57 (staged r14 debut): calendar-INTERVAL RANGE frames pinned
    cell-for-cell against DuckDB, with the plan asserted to carry a
    RangeFrame and exactly ONE hash-partition exchange on o_custkey —
    both trailing windows must share the single sort, or the second
    frame doubles the shuffle at scale."""
    import duckdb

    from dask_deltalake_spark.operators.relational import (
        _Q57_ORACLE,
        q57_window_interval_range,
    )

    sf_dir = "/root/testdata/sf0.01"
    df = q57_window_interval_range(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "RangeFrame" in plan, (
        "the interval boundary must plan as a RangeFrame"
    )
    assert plan.count("hashpartitioning(o_custkey") == 1, (
        "both trailing frames must share ONE exchange on o_custkey"
    )
    got = {r["o_orderkey"]: (r["n_30d"], r["rev_90d"])
           for r in df.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    exp = {r[0]: (r[1], r[2]) for r in con.execute(_Q57_ORACLE).fetchall()}
    assert got == exp and len(got) > 1000
    # the frame math is the point: some order must aggregate MORE
    # than itself (a real trailing neighbor inside 90 days)
    assert any(v[0] > 1 for v in got.values())


def test_q58_gap_fill_matches_duckdb_oracle(spark):
    """q58 (staged r14 debut): day-spine gap-fill + forward-fill
    resample pinned cell-for-cell against DuckDB, with real gaps
    asserted present AND filled (the semantics the query exists to
    exercise), and the plan asserted to expand the spine via a
    Generate (sequence+explode) with no nested-loop join."""
    import duckdb

    from dask_deltalake_spark.operators.relational import (
        _Q58_ORACLE,
        q58_gap_fill_resample,
    )

    sf_dir = "/root/testdata/sf0.01"
    df = q58_gap_fill_resample(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan and "sequence" in plan, (
        "the day spine must come from a sequence() Generate"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = {(r["user_id"], r["day"]): (r["v_filled"], r["is_gap"])
           for r in df.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    exp = {(r[0], r[1]): (r[2], r[3])
           for r in con.execute(_Q58_ORACLE).fetchall()}
    assert got == exp
    gaps = [k for k, v in got.items() if v[1]]
    assert gaps, "the fixture must contain real day gaps"
    # every gap row must carry a forward-filled value from an earlier
    # real day (the first day per user can never be a gap — the spine
    # starts at MIN(day), which is a real observation)
    assert all(got[k][0] is not None for k in gaps)


def test_q59_grouped_pandas_quantiles_matches_duckdb_oracle(spark):
    """q59 (staged r15 debut; r17: applyInPandas → applyInArrow):
    per-group Arrow quantile profile pinned cell-for-cell against
    DuckDB — integer cents make numpy linear-interpolation
    percentiles bitwise-equal to QUANTILE_CONT — with the plan
    asserted to carry the FlatMapGroupsInArrow operator (the
    physical family no registered query samples) fed by exactly ONE
    hash-partition exchange on the group key."""
    import duckdb

    from dask_deltalake_spark.operators.relational import (
        _Q59_ORACLE,
        q59_grouped_pandas_quantiles,
    )

    # the pin runs against the REGISTERED entry (r15: registration
    # landed — VERDICT r14 #2's requirement that plan assertions keep
    # covering what the driver actually grades)
    from dask_deltalake_spark.operators import REGISTRY

    assert REGISTRY["q59_grouped_pandas_quantiles"] == (
        q59_grouped_pandas_quantiles, _Q59_ORACLE,
    )
    sf_dir = "/root/testdata/sf0.01"
    df = q59_grouped_pandas_quantiles(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInArrow" in plan
    assert plan.count("hashpartitioning(o_custkey") == 1, (
        "one exchange on the group key feeds the Python worker"
    )
    got = {
        r["o_custkey"]: (
            r["n_orders"], r["q25_cents"], r["med_cents"], r["q75_cents"]
        )
        for r in df.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    exp = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(_Q59_ORACLE).fetchall()
    }
    assert got == exp
    assert len(got) > 40  # real group population at sf0.01 (cohort)
    # interpolation actually exercised (odd AND even group sizes)
    assert any(v[0] % 2 == 0 for v in got.values())
    assert any(v[0] % 2 == 1 for v in got.values())


def test_x44_token_budget_mix_matches_duckdb_oracle(spark):
    """x44 (staged r15 debut): histogram-threshold token-budget mix
    pinned cell-for-cell against DuckDB, with the plan asserted to be
    the two-level shape (corpus -> band histogram -> tiny window):
    exactly TWO hash exchanges — (source, band) for the histogram and
    source for the cutoff window — and NO per-document window (the
    window input is the post-aggregate band frame)."""
    import duckdb

    from dask_deltalake_spark.functions.curation import (
        _X44_ORACLE,
        x44_token_budget_mix,
    )

    # the pin runs against the REGISTERED entry (r15 registration)
    from dask_deltalake_spark.operators import REGISTRY

    assert REGISTRY["x44_token_budget_mix"] == (
        x44_token_budget_mix, _X44_ORACLE,
    )
    sf_dir = "/root/testdata/sf0.01"
    df = x44_token_budget_mix(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning") == 2, plan.count(
        "hashpartitioning"
    )
    # the window must consume the aggregated band frame, not the scan:
    # its partition spec is (source) and appears after the (source,
    # band) aggregate in the plan tree
    assert "Window" in plan
    got = {
        r["source"]: (
            r["n_docs_kept"], r["n_tokens_kept"],
            r["budget_tokens"], r["min_band_kept"],
        )
        for r in df.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(_X44_ORACLE).fetchall()
    }
    assert got == exp
    # non-degenerate selection: every source keeps SOME docs but not
    # all of them (the budget actually cuts)
    assert len(got) == 20
    totals = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT source, COUNT(*), 1 FROM documents GROUP BY source"
        ).fetchall()
    }
    assert all(0 < got[s][0] < totals[s][0] for s in got)


def test_q60_cogrouped_pandas_matches_duckdb_oracle(spark):
    """q60 (staged r16 debut; r17: applyInPandas → applyInArrow):
    two-source cogroup Arrow reconciliation pinned cell-for-cell
    against DuckDB (all-integer money math), with the plan asserted
    to carry the FlatMapCoGroupsInArrow operator — the two-input
    physical family q59's FlatMapGroupsInArrow does not sample — fed
    by exactly one hash-partition exchange per side."""
    import duckdb

    from dask_deltalake_spark.operators.relational import (
        _Q60_ORACLE,
        q60_cogrouped_pandas_reconcile,
    )

    sf_dir = "/root/testdata/sf0.01"
    df = q60_cogrouped_pandas_reconcile(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInArrow" in plan
    assert plan.count("hashpartitioning(o_orderkey") == 1
    assert plan.count("hashpartitioning(l_orderkey") == 1
    got = {
        r["o_orderkey"]: (
            r["order_total_cents"], r["n_lines"], r["line_rev_centipct"]
        )
        for r in df.collect()
    }
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    exp = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_Q60_ORACLE).fetchall()
    }
    assert got == exp
    assert len(got) > 40  # real cohort population at sf0.01
    # the two-sided transfer is the point: multi-line orders exist
    assert any(v[1] > 1 for v in got.values())


def test_d51_foreign_cdc_read_matches_duckdb_oracle(spark):
    """d51 (staged r16 debut): the foreign cdc-action feed as a
    graded lifecycle query — the cdc commit's images arrive VERBATIM
    (no reconstruction double-report: exactly three change classes,
    and the insert count equals the v0 cohort alone)."""
    import duckdb

    from dask_deltalake_spark.operators.delta_ops import (
        _D51_ORACLE,
        d51_foreign_cdc_read,
    )

    sf_dir = "/root/testdata/sf0.01"
    df = d51_foreign_cdc_read(spark, sf_dir)
    got = {
        r["change_type"]: (r["n_rows"], r["cents_sum"])
        for r in df.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    exp = {
        r[0]: (r[1], r[2])
        for r in con.execute(_D51_ORACLE).fetchall()
    }
    assert got == exp
    # anti-reconstruction: a reader that rebuilt v1 from add/remove
    # would emit 'delete' rows and inflate 'insert'
    assert set(got) == {"insert", "update_preimage", "update_postimage"}
    assert got["update_preimage"][0] > 0


def test_d52_cdf_write_roundtrip_matches_duckdb_oracle(spark):
    """d52 (staged r17 debut): the CDF write surface as a lifecycle
    query — per-clause images across COW UPDATE / MoR DELETE / MERGE
    pinned cell-for-cell against the DuckDB arithmetic, and every DML
    commit pinned to carry a cdc action (the images come from
    _change_data files, not reconstruction — a reconstruction of the
    COW UPDATE would double-report the copied rows and fail the
    value compare)."""
    import json
    import os

    import duckdb

    from dask_deltalake_spark.operators.delta_ops import (
        _D52_ORACLE,
        _tmp_table,
        d52_cdf_write_roundtrip,
    )

    sf_dir = "/root/testdata/sf0.01"
    df = d52_cdf_write_roundtrip(spark, sf_dir)
    got = {
        (r["change_type"], r["commit_version"]): (r["n"], r["cents_sum"])
        for r in df.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    exp = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(_D52_ORACLE).fetchall()
    }
    assert got == exp
    assert len(got) == 6  # 2 update pairs + delete + insert clauses

    # action pins: v1 is the gated enable commit (protocol v7 +
    # property); v2..v4 each carry a cdc action
    path = _tmp_table(sf_dir, "cdf_write_roundtrip")
    with open(os.path.join(path, "_delta_log",
                           f"{1:020d}.json")) as fh:
        v1 = [json.loads(line) for line in fh]
    assert any(
        a.get("protocol", {}).get("minWriterVersion") == 7 for a in v1
    )
    for v in (2, 3, 4):
        with open(os.path.join(path, "_delta_log",
                               f"{v:020d}.json")) as fh:
            acts = [json.loads(line) for line in fh]
        assert any("cdc" in a for a in acts), (v, acts)
    # v3 is merge-on-read: no data file rewritten (no add without
    # _change_data prefix), just vector descriptors
    with open(os.path.join(path, "_delta_log",
                           f"{3:020d}.json")) as fh:
        v3 = [json.loads(line) for line in fh]
    data_adds = [
        a for a in v3
        if "add" in a and not a["add"]["path"].startswith("_change_data")
    ]
    assert all(a["add"].get("deletionVector") for a in data_adds), v3
