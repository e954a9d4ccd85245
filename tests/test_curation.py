"""Curation-op invariants: split assignment is total and deterministic,
decontamination never flags the benchmark set itself, repetition stats
are integer-consistent, mix sampling respects per-source caps, and
sequence packing conserves tokens."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_x20_split_total_and_deterministic(spark):
    from dask_deltalake_spark.functions.curation import x20_hash_split
    from dask_deltalake_spark.tables import load_table

    out = {r["split"]: r for r in x20_hash_split(spark, SF_DIR).collect()}
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in out.values()) == n_docs
    # ~90/5/5: train strictly dominates and every split is non-empty
    assert out["train"]["n_docs"] > out["validation"]["n_docs"]
    assert all(r["n_docs"] > 0 for r in out.values())
    # deterministic: a second run is bit-identical
    again = {r["split"]: r for r in x20_hash_split(spark, SF_DIR).collect()}
    assert {k: v["n_docs"] for k, v in out.items()} == {
        k: v["n_docs"] for k, v in again.items()
    }


def test_x21_benchmark_docs_never_flagged(spark):
    from dask_deltalake_spark.functions.curation import x21_decontaminate

    rows = x21_decontaminate(spark, SF_DIR).collect()
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    assert all(r["n_shared"] >= 1 for r in rows)


def test_x22_repetition_integer_consistency(spark):
    from dask_deltalake_spark.functions.curation import x22_repetition_filter

    for r in x22_repetition_filter(spark, SF_DIR).collect():
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        assert 0 <= r["dup_shingles"] <= r["total_shingles"]


def test_x24_mix_caps_respected(spark):
    from dask_deltalake_spark.functions.curation import x24_source_mix

    rows = x24_source_mix(spark, SF_DIR).collect()
    assert rows, "no sources"
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_total"]
        idx = int(r["source"][3:])
        if idx % 4 == 0:
            # 100% retention sources keep everything
            assert r["n_kept"] == r["n_total"]


def test_x25_packing_conserves_tokens(spark):
    import pyspark.sql.functions as F

    from dask_deltalake_spark.functions.curation import (
        _PACK_BUDGET,
        x25_pack_sequences,
    )
    from dask_deltalake_spark.functions.llmops import tokens
    from dask_deltalake_spark.tables import load_table

    rows = x25_pack_sequences(spark, SF_DIR).collect()
    total_out = sum(r["n_tokens"] for r in rows)
    d = load_table(spark, SF_DIR, "documents")
    total_in = d.select(
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("s")
    ).first()["s"]
    assert total_out == total_in
    for r in rows:
        # bin count is at least the token lower bound and at most one
        # bin per doc
        assert r["n_bins"] >= (r["n_tokens"] + _PACK_BUDGET - 1) // _PACK_BUDGET - 1
        assert r["n_bins"] <= r["n_docs"]


def test_x23_scrub_redacts_all_digits(spark):
    from dask_deltalake_spark.functions.curation import x23_pii_scrub

    rows = x23_pii_scrub(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_affected"] <= r["n_events"]
        assert not any(ch.isdigit() for ch in r["sample_redacted"])


def test_token_budget_select_matches_band_aggregates(spark):
    """Doc-level token_budget_select must reconstruct exactly the
    band-atomic aggregates the x44 query reports (same thresholds,
    same kept doc/token counts), and its plan must keep the corpus
    unshuffled: the threshold side joins via broadcast, no
    hashpartitioning of the full docs frame beyond the tiny band
    histogram."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.functions.curation import (
        token_budget_select,
        x44_token_budget_mix,
    )
    from dask_deltalake_spark.functions.llmops import _t, tokens

    sf_dir = "/root/testdata/sf0.01"
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.least(F.col("n_chars"), F.lit(100000)).alias("band"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    budgets = d.sparkSession.createDataFrame(
        [(f"src{i}", 800 + 100 * (i % 4)) for i in range(20)],
        "source string, budget_tokens long",
    )
    sel = token_budget_select(d, budgets)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {
        r["source"]: (r["n_docs_kept"], r["n_tokens_kept"],
                      r["min_band_kept"])
        for r in sel.groupBy("source").agg(
            F.count("*").alias("n_docs_kept"),
            F.sum("n_tok").alias("n_tokens_kept"),
            F.min("band").alias("min_band_kept"),
        ).collect()
    }
    want = {
        r["source"]: (r["n_docs_kept"], r["n_tokens_kept"],
                      r["min_band_kept"])
        for r in x44_token_budget_mix(spark, sf_dir).collect()
    }
    assert got == want and len(got) == 20


def test_token_budget_select_budgets_contract(spark):
    """Budgets-frame contract (r15, ADVICE): duplicate source rows
    fail loudly (the cumulative window would silently double every
    band row), a missing budget_tokens column fails loudly, and
    stray extra columns named like the corpus's band/token columns
    are dropped rather than colliding into the window frame."""
    import pytest as _pytest
    import pyspark.sql.functions as F

    from dask_deltalake_spark.functions.curation import (
        token_budget_select,
    )

    docs = spark.createDataFrame(
        [("s1", b, 100) for b in range(10)],
        "source string, band int, n_tok long",
    )
    with _pytest.raises(ValueError, match="duplicate"):
        token_budget_select(
            docs,
            spark.createDataFrame(
                [("s1", 300), ("s1", 500)],
                "source string, budget_tokens long",
            ),
        )
    with _pytest.raises(ValueError, match="budget_tokens"):
        token_budget_select(
            docs,
            spark.createDataFrame([("s1", 300)], "source string, b long"),
        )
    # stray band/n_tok columns on the mix table: dropped, result
    # identical to the clean frame (3 bands of 100 fit in 300)
    noisy = spark.createDataFrame(
        [("s1", 300, 999, 999)],
        "source string, budget_tokens long, band int, n_tok long",
    )
    got = token_budget_select(docs, noisy)
    assert sorted(r["band"] for r in got.collect()) == [7, 8, 9]
    assert got.columns == docs.columns
