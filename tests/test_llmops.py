"""LLM-ops invariants: stop-shingle cap fan-out bound, HLL++ error
bound, and recall floors for the rows-only approximate queries
(x05 MinHash-LSH, x08 hyperplane-LSH ANN) that the driver can only
count-check."""

from __future__ import annotations

import os

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_stop_shingle_cap_bounds_fanout(spark, tmp_path):
    """One viral shingle shared by k docs must NOT fan out k² join
    rows: shingles with per-block document frequency > cap are dropped
    before the self-join, so the only surviving pair is the genuine
    near-dup one."""
    from dask_deltalake_spark.functions.llmops import (
        _STOP_SHINGLE_DF,
        _jaccard_pairs,
    )

    n_viral = _STOP_SHINGLE_DF + 16  # comfortably above the cap
    rows = []
    for i in range(n_viral):
        # every doc shares the shingle "viral spam phrase"; the rest of
        # each doc is unique, so absent the viral shingle no pair overlaps
        rows.append((i, f"viral spam phrase u{i} v{i} w{i}", "en", "web"))
    base = " ".join(f"tok{j}" for j in range(20))
    rows.append((1000, base + " enda", "en", "web"))
    rows.append((1001, base + " endb", "en", "web"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)

    out = _jaccard_pairs(spark, str(tmp_path)).collect()
    assert len(out) == 1, f"expected only the near-dup pair, got {len(out)}"
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1000, 1001)
    # 21 tokens → 19 shingles, 18 shared: j = 18 / (19 + 19 - 18)
    assert r["jaccard"] == pytest.approx(0.9, abs=1e-3)


def test_q12_within_rsd(spark):
    """approx_count_distinct is estimator-specific (rows-only at the
    driver) but must sit within a small multiple of its configured
    relative standard deviation of the exact count."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.operators import REGISTRY
    from dask_deltalake_spark.tables import load_table

    fn, _ = REGISTRY["q12_approx_count_distinct"]
    approx = {r["l_returnflag"]: r["approx_orders"] for r in fn(spark, SF_DIR).collect()}
    exact = {
        r["l_returnflag"]: r["exact"]
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        rel_err = abs(est - exact[flag]) / exact[flag]
        assert rel_err <= 5 * 0.01, f"{flag}: {est} vs {exact[flag]} ({rel_err:.3%})"


def test_x05_recall_floor(spark):
    """sf0.001 contains exactly one strong near-dup pair (jaccard
    ≈ 0.97). MinHash-LSH with 8 bands of 4 must surface it: candidate
    recall at j≈0.97 is 1 − (1 − j⁴)⁸ ≈ 1."""
    from dask_deltalake_spark.functions.llmops import x05_minhash_lsh

    row = x05_minhash_lsh(spark, SF_DIR).collect()[0]
    assert row["n_candidates"] >= 1
    assert row["n_verified"] >= 1
    assert row["max_jaccard"] >= 0.9


def test_x08_best_neighbor_floor(spark):
    """x08's banded-LSH best neighbor can never beat the exact x07
    rank-1 score, and with the fixed hyperplane seed it stays within
    80% of it for every sf0.001 query (measured: 6/8 exact, worst
    ratio 0.835)."""
    from dask_deltalake_spark.functions.llmops import x07_cosine_topk, x08_lsh_ann

    exact = {
        r["query_id"]: r["score"]
        for r in x07_cosine_topk(spark, SF_DIR).collect()
        if r["rank"] == 1
    }
    approx = x08_lsh_ann(spark, SF_DIR).collect()
    assert approx, "x08 returned no queries"
    for r in approx:
        if r["score"] is None:
            continue
        best = exact[r["query_id"]]
        assert r["score"] <= best + 1e-9
        assert r["score"] >= 0.8 * best, (
            f"query {r['query_id']}: approx {r['score']} < 0.8 × exact {best}"
        )


def test_x27_kmeans_partitions_corpus_and_descends(spark):
    """Lloyd invariants: the final clustering covers every vector
    exactly once, and total inertia never increases vs the initial
    (unrefined) assignment — refinement must help or hold."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.functions.llmops import (
        _KM_K,
        _KM_SCALE,
        _km_assign,
        x27_kmeans,
    )
    from dask_deltalake_spark.tables import load_table

    final = x27_kmeans(spark, SF_DIR).collect()
    n_vec = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_points"] for r in final) == n_vec
    assert all(r["n_points"] > 0 for r in final)

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _KM_SCALE).cast("long"),
        ).alias("q"),
    )
    cents = [
        (r["vec_id"], list(r["q"]))
        for r in e.filter(F.col("vec_id") < _KM_K).collect()
    ]
    init_inertia = _km_assign(e, cents).agg(F.sum("dist")).collect()[0][0]
    assert sum(r["inertia"] for r in final) <= init_inertia


def test_x27_kmeans_distributed_branch_matches_driver_path(
    spark, monkeypatch
):
    """r17 scale guard (VERDICT r16 #4): above the driver-state cap
    x27 keeps centroids in a broadcast frame and runs the floor-mean
    distributed — forced on here via the env cap, the branch must
    produce IDENTICAL final clusters to the literal/driver path
    (same integer distances, same floor-mean arithmetic, same
    tie-breaks)."""
    from dask_deltalake_spark.functions.llmops import x27_kmeans

    monkeypatch.delenv("SPARK_GRAFT_X27_DRIVER_K_MAX", raising=False)
    driver = sorted(
        tuple(r) for r in x27_kmeans(spark, SF_DIR).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_X27_DRIVER_K_MAX", "0")
    dist = sorted(
        tuple(r) for r in x27_kmeans(spark, SF_DIR).collect()
    )
    assert dist == driver
    # r17: the vectorized assignment kernel (integer arithmetic, same
    # argmin/tie semantics) must also equal the literal-expression path
    monkeypatch.delenv("SPARK_GRAFT_X27_DRIVER_K_MAX", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_X27_NP_ASSIGN", "0")
    expr = sorted(
        tuple(r) for r in x27_kmeans(spark, SF_DIR).collect()
    )
    assert expr == driver


def test_x31_np_kernel_matches_expression_path(spark, monkeypatch, tmp_path):
    """r17 (VERDICT r16 #5): x31's vectorized assignment + per-cell
    kernels must produce IDENTICAL rows to the expression path — on
    the real fixture AND on a constructed corpus exercising every
    arithmetic corner the replication claims to cover: NaN elements
    (NaN-greatest ordering / round(NaN) ≥ thr), NULL elements and NULL
    vectors (null fold → never dropped), ragged lengths (zip_with
    pad → null fold), zero norms (±inf / 0/0), and threshold-band
    values (HALF_UP decimal rounding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_deltalake_spark.functions.llmops import x31_semantic_dedup

    def run(gate, sf_dir):
        monkeypatch.setenv("SPARK_GRAFT_X31_NP_KERNEL", gate)
        return sorted(
            tuple(r) for r in x31_semantic_dedup(spark, sf_dir).collect()
        )

    assert run("1", SF_DIR) == run("0", SF_DIR)

    # constructed corpus: 40 vectors, dim 4, cells from the first 8
    import math as m
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        v = [round(rng.uniform(-1, 1), 3) for _ in range(4)]
        rows.append((i, v, 0))
    rows[9] = (9, [0.5, float("nan"), 0.25, -0.5], 0)   # NaN element
    rows[11] = (11, [0.5, None, 0.25, -0.5], 0)         # NULL element
    rows[13] = (13, None, 0)                            # NULL vector
    rows[15] = (15, [0.5, 0.25], 0)                     # ragged length
    rows[19] = (19, rows[3][1][:], 0)                   # exact duplicate
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    sf = tmp_path / "sfedge"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "embeddings.parquet"))
    assert run("1", str(sf)) == run("0", str(sf))

    # threshold-band rounding pin: the kernel's Decimal HALF_UP
    # replica must agree with Spark's round(x, 4) >= 0.35 on values
    # straddling the boundary (incl. the exact .34995 half case)
    import numpy as np

    from dask_deltalake_spark.functions.llmops import (
        _SEM_THR,
        _round4_ge_thr_np,
    )

    vals = [
        0.34995, 0.3499499999999999, 0.34995000000000004, 0.3500,
        0.34990, 0.35005, 0.3500499999999999, 0.349949, 0.350051,
        0.34944999999999993, 0.3489999, float("nan"), float("inf"),
        float("-inf"), 0.0, 1.0, -0.35,
    ]
    spark_res = [
        bool(r["ok"])
        for r in spark.createDataFrame(
            [(v,) for v in vals], "x double"
        ).selectExpr(f"round(x, 4) >= {_SEM_THR!r} AS ok").collect()
    ]
    got = _round4_ge_thr_np(
        np.array(vals, dtype=np.float64), float(_SEM_THR)
    )
    assert got.tolist() == spark_res

    # review r17 scale guard: above SPARK_GRAFT_X31_KERNEL_K_MAX the
    # expression path takes over (the kernel holds a batch×k matrix);
    # forced to 0 the results must stay identical, and a malformed cap
    # value falls back to the default instead of raising
    monkeypatch.setenv("SPARK_GRAFT_X31_KERNEL_K_MAX", "0")
    assert run("1", str(sf)) == run("0", str(sf))
    monkeypatch.setenv("SPARK_GRAFT_X31_KERNEL_K_MAX", "not-a-number")
    assert run("1", str(sf)) == run("0", str(sf))
    monkeypatch.delenv("SPARK_GRAFT_X31_KERNEL_K_MAX")


def _edge_embeddings(tmp_path, name, edits):
    """Write a small embeddings parquet with targeted edge rows."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(11)
    rows = []
    # dim 64 = the PQ/LSH kernels' native width (x32 slices 4×16,
    # x08's planes are 64-wide), so the fast paths actually run
    for i in range(40):
        rows.append(
            (i, [round(rng.uniform(-1, 1), 3) for _ in range(64)], 0)
        )
    for i, v in edits.items():
        rows[i] = (i, v, 0)
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    sf = tmp_path / name
    sf.mkdir()
    pq.write_table(tbl, str(sf / "embeddings.parquet"))
    return str(sf)


def test_x14_x32_x08_np_kernels_match_expression_paths(
    spark, monkeypatch, tmp_path
):
    """r17: the x14 pairwise-block, x32 PQ-encode and x08 banding
    kernels must equal their expression paths — on the fixture and on
    edge corpora (NaN elements in-kernel; NULL/ragged rows through the
    documented fallbacks/slow paths)."""
    from dask_deltalake_spark.functions.llmops import (
        x08_lsh_ann,
        x14_embedding_near_dup,
        x32_pq_ann,
    )

    cases = {
        "x14": ("SPARK_GRAFT_X14_NP_KERNEL", x14_embedding_near_dup),
        "x32": ("SPARK_GRAFT_X32_NP_KERNEL", x32_pq_ann),
        "x08": ("SPARK_GRAFT_X08_NP_KERNEL", x08_lsh_ann),
    }

    def run(env, fn, gate, sf):
        monkeypatch.setenv(env, gate)
        # repr-canonicalized: NaN != NaN under tuple equality, but the
        # paths must agree cell-for-cell including NaN placement
        return sorted(repr(tuple(r)) for r in fn(spark, sf).collect())

    for env, fn in cases.values():
        assert run(env, fn, "1", SF_DIR) == run(env, fn, "0", SF_DIR)

    # NaN stays in-kernel (Spark NaN-greatest semantics replicated);
    # edge rows sit OUTSIDE x32's first-16 codebook so the kernel
    # path (not just its fallback) is what gets compared
    nan_vec = [0.5, float("nan")] + [0.25, -0.5] * 31
    null_vec = [0.5, None] + [0.25, -0.5] * 31
    sf_nan = _edge_embeddings(tmp_path, "nan", {19: nan_vec})
    # NULL/ragged corpora exercise the slow paths / strict fallbacks
    sf_dirty = _edge_embeddings(
        tmp_path,
        "dirty",
        {19: nan_vec, 21: null_vec, 23: None, 25: [0.5, 0.25]},
    )
    for sf in (sf_nan, sf_dirty):
        for env, fn in cases.values():
            assert run(env, fn, "1", sf) == run(env, fn, "0", sf), (
                env, sf,
            )


def test_x08_ragged_pair_kernel_matches_expression(
    spark, monkeypatch, tmp_path
):
    """review r17: nrm replicates sqrt(aggregate(transform(v, x*x)))
    over v ALONE — a ragged null-free vector keeps a REAL norm in the
    kernel slow path exactly as in the expression path. Two same-length
    ragged vectors (one a query) collide on the all-zero band keys and
    re-rank with a real dot, so a nulled norm would change best_id and
    score between the gated paths."""
    from dask_deltalake_spark.functions.llmops import x08_lsh_ann

    sf = _edge_embeddings(
        tmp_path,
        "raggedpair",
        {
            5: [0.5, 0.25, -0.25],   # ragged QUERY (vec_id < 8)
            25: [0.25, 0.5, 0.125],  # ragged candidates, same length
            27: [0.5, 0.25, -0.25],
        },
    )

    def run(gate):
        monkeypatch.setenv("SPARK_GRAFT_X08_NP_KERNEL", gate)
        return sorted(
            repr(tuple(r)) for r in x08_lsh_ann(spark, sf).collect()
        )

    assert run("1") == run("0")
    # the corpus must actually exercise the divergence class: the
    # ragged query scores a REAL best pair (nrm non-null both sides)
    best5 = [
        r
        for r in x08_lsh_ann(spark, sf).collect()
        if r["query_id"] == 5
    ]
    assert best5 and best5[0]["score"] is not None


def test_zero_norm_embeddings_fail_like_expression_path(
    spark, monkeypatch, tmp_path
):
    """review r17: an all-zero embedding makes the cosine denominator
    exactly 0.0; under the session's ANSI mode the expression paths
    raise DIVIDE_BY_ZERO. The numpy kernels must not silently emit
    inf/NaN rows instead — both gates must fail on such a corpus."""
    from dask_deltalake_spark.functions.llmops import (
        x14_embedding_near_dup,
        x31_semantic_dedup,
    )

    sf = _edge_embeddings(tmp_path, "zeronorm", {25: [0.0] * 64})
    for env, fn in (
        ("SPARK_GRAFT_X31_NP_KERNEL", x31_semantic_dedup),
        ("SPARK_GRAFT_X14_NP_KERNEL", x14_embedding_near_dup),
    ):
        for gate in ("1", "0"):
            monkeypatch.setenv(env, gate)
            with pytest.raises(Exception):
                fn(spark, sf).collect()


def test_q40_within_rank_error(spark):
    """approx_percentile(accuracy=10k) guarantees rank error <= 1/10k:
    each estimate must lie between the exact percentiles at q∓eps
    (evaluated with a safety factor on eps for interpolation edges)."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.operators.relational import (
        q40_approx_percentiles,
    )
    from dask_deltalake_spark.tables import load_table

    est = {r["l_returnflag"]: r for r in q40_approx_percentiles(spark, SF_DIR).collect()}
    l = load_table(spark, SF_DIR, "lineitem")
    eps = 10.0 / 10_000  # 10x safety on the 1e-4 rank-error bound
    checks = [("price_p50", "l_extendedprice", 0.5), ("price_p90", "l_extendedprice", 0.9),
              ("price_p99", "l_extendedprice", 0.99), ("qty_median", "l_quantity", 0.5)]
    bounds = (
        l.groupBy("l_returnflag")
        .agg(*[F.expr(
            f"percentile({col}, array({max(q - eps, 0.0)}, {min(q + eps, 1.0)}))"
        ).alias(name) for name, col, q in checks])
        .collect()
    )
    for row in bounds:
        e = est[row["l_returnflag"]]
        for name, _, _ in checks:
            lo, hi = row[name]
            assert lo <= e[name] <= hi, (row["l_returnflag"], name, lo, e[name], hi)


def test_x06_hamming_tracks_jaccard(spark):
    """SimHash invariant (the one rows-only query without a bound until
    now): the fingerprint Hamming distance of the known strong near-dup
    pair (jaccard ≈ 0.97) must sit far below the background Hamming
    distance of unrelated document pairs — anti-correlation of Hamming
    with Jaccard is exactly what makes SimHash a dedup signal. Data and
    hash are fixed, so the bounds are deterministic (measured: dup
    pair = 2 bits, background mean ≈ 9.8 bits over 1770 pairs)."""
    import itertools

    from dask_deltalake_spark.functions.llmops import (
        _jaccard_pairs,
        _simhash_fingerprints,
    )

    dups = _jaccard_pairs(spark, SF_DIR).orderBy(
        "jaccard", ascending=False
    ).collect()
    assert dups, "fixture lost its near-dup pair"
    top = dups[0]
    assert top["jaccard"] >= 0.9

    fps = {
        r["doc_id"]: r["simhash"]
        for r in _simhash_fingerprints(spark, SF_DIR).collect()
    }

    def ham(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    dup_ham = ham(fps[top["doc_a"]], fps[top["doc_b"]])
    assert dup_ham <= 5, f"near-dup pair differs in {dup_ham}/32 bits"

    dup_keys = {(r["doc_a"], r["doc_b"]) for r in dups}
    ids = sorted(fps)[:60]
    background = [
        ham(fps[a], fps[b])
        for a, b in itertools.combinations(ids, 2)
        if (a, b) not in dup_keys
    ]
    mean_bg = sum(background) / len(background)
    assert mean_bg >= 7, f"background Hamming collapsed to {mean_bg}"
    assert dup_ham < mean_bg / 2


def test_jaccard_cache_persist_discipline(spark):
    """(1) After x04+x18 and clear_jaccard_cache(), NO persisted RDDs
    remain — x18 must register its pairs/edges/label frames with the
    cache instead of leaking them past the query's return. (2) An
    outside catalog.clearCache() must not poison the cache: the next
    _jaccard_pairs call detects the lost storage level and re-persists
    instead of handing out recompute-through-lineage frames."""
    from dask_deltalake_spark.functions.llmops import (
        _JACCARD_CACHE,
        _is_persisted,
        _jaccard_pairs,
        clear_jaccard_cache,
        x04_ngram_jaccard_pairs,
        x18_dedup_clusters,
    )

    clear_jaccard_cache()
    spark.catalog.clearCache()
    x04_ngram_jaccard_pairs(spark, SF_DIR).collect()
    x18_dedup_clusters(spark, SF_DIR).collect()
    clear_jaccard_cache()
    jsc = spark.sparkContext._jsc
    assert jsc.getPersistentRDDs().size() == 0, "dangling persisted RDDs"

    # defensive re-persist after an outside clearCache
    _jaccard_pairs(spark, SF_DIR).collect()
    spark.catalog.clearCache()
    out = _jaccard_pairs(spark, SF_DIR)
    entry = next(iter(_JACCARD_CACHE.values()))
    assert all(_is_persisted(f) for f in entry["persisted"])
    assert out.count() >= 1
    clear_jaccard_cache()


def test_x30_window_dedup_exact_counts(spark):
    """x30 invariant (its driver row lands in r5; this bounds it with
    exact hand-computed counts regardless): 16-token windows at stride
    8. 'en' — doc A (24 toks: w01..w24) yields windows [1..16] and
    [9..24]; doc B is exactly A's first 16 tokens, so its single
    window equals A's first -> that window has occ=2 across 2 docs
    and contributes 2 to n_cross_doc_dup; doc C is 16 unique tokens
    (negative: shares nothing). 'de' — one doc whose two windows are
    identical (intra-doc repeat): max_occurrences=2 but
    n_cross_doc_dup MUST stay 0 (same-doc repeats are not cross-doc).
    'fr' — two disjoint docs: everything distinct, zero dups."""
    from dask_deltalake_spark.functions.llmops import window_dedup_stats

    a = " ".join(f"w{i:02d}" for i in range(1, 25))        # 24 tokens
    b = " ".join(f"w{i:02d}" for i in range(1, 17))        # = A[1..16]
    c = " ".join(f"c{i:02d}" for i in range(16))           # unique
    de = " ".join(f"p{i}" for i in range(8)) + " "         # p0..p7 x3:
    de = de + de.strip() + " " + " ".join(f"p{i}" for i in range(8))
    fr1 = " ".join(f"f{i:02d}" for i in range(16))
    fr2 = " ".join(f"g{i:02d}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, "en", a),
            (2, "en", b),
            (3, "en", c),
            (4, "de", de),
            (5, "fr", fr1),
            (6, "fr", fr2),
        ],
        "doc_id long, lang string, text string",
    )
    rows = {r["lang"]: r for r in window_dedup_stats(docs).collect()}

    en = rows["en"]
    assert en["n_windows"] == 4          # 2 (A) + 1 (B) + 1 (C)
    assert en["n_distinct"] == 3         # A1==B1, A2, C1
    assert en["n_cross_doc_dup"] == 2    # both occurrences of A1==B1
    assert en["max_occurrences"] == 2

    de_r = rows["de"]
    assert de_r["n_windows"] == 2        # 24 toks -> starts 1, 9
    assert de_r["n_distinct"] == 1       # periodic: both windows equal
    assert de_r["n_cross_doc_dup"] == 0  # intra-doc repeat is NOT cross-doc
    assert de_r["max_occurrences"] == 2

    fr = rows["fr"]
    assert fr["n_windows"] == 2
    assert fr["n_distinct"] == 2
    assert fr["n_cross_doc_dup"] == 0
    assert fr["max_occurrences"] == 1


def test_x33_matches_reference_bpe(spark):
    """x33 invariant (rows-only at the driver): the distributed BPE
    loop must reproduce the merge sequence of a straightforward
    in-memory reference implementation of Sennrich-style BPE on the
    same corpus, exactly — ranks, pairs, and weighted pair counts."""
    import re
    from collections import Counter

    from dask_deltalake_spark.functions.llmops import (
        _BPE_MAX_WORD,
        _BPE_MERGES,
        x33_bpe_vocab,
    )

    texts = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))[
        "text"
    ].tolist()
    wc: Counter = Counter()
    for t in texts:
        for w in re.split(" +", t.lower().strip(" ")):
            if 2 <= len(w) <= _BPE_MAX_WORD and re.fullmatch("[a-z]+", w):
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    expected = []
    for rank in range(1, _BPE_MERGES + 1):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        expected.append((rank, a, b, a + b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in x33_bpe_vocab(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expected
    assert len(got) == _BPE_MERGES  # the corpus supports a full run


def test_derived_k_scales_with_corpus():
    """VERDICT r5 #4: cluster/codebook K must be corpus-derived — a
    fixed K means cells grow linearly and per-cell self-joins grow
    quadratically. Asserts: (a) the deterministic floor holds at the
    hash-checked oracle scale (500 vectors -> exactly the literal the
    oracle SQL embeds), (b) K grows ~linearly above it (10x rows ->
    >=5x cells), (c) expected cell size stays bounded by the target
    below the cap, (d) the caps hold."""
    from dask_deltalake_spark.functions.llmops import (
        _KM_K, _KM_K_CAP, _KM_TARGET_CELL,
        _PQ_K, _PQ_K_CAP, _PQ_TARGET,
        _SEM_K, _SEM_K_CAP, _SEM_TARGET_CELL,
        derived_k,
    )

    # (a) oracle determinism at test scale (sf0.001/sf0.01 = 500 rows)
    assert derived_k(500, _SEM_K, _SEM_TARGET_CELL, _SEM_K_CAP) == _SEM_K
    assert derived_k(500, _KM_K, _KM_TARGET_CELL, _KM_K_CAP) == _KM_K
    assert derived_k(500, _PQ_K, _PQ_TARGET, _PQ_K_CAP) == _PQ_K

    # (b) 10x corpus -> >=5x cells (once above the floor region)
    for floor, target, cap in (
        (_SEM_K, _SEM_TARGET_CELL, _SEM_K_CAP),
        (_KM_K, _KM_TARGET_CELL, _KM_K_CAP),
    ):
        n = floor * target * 4  # comfortably above the floor
        k1 = derived_k(n, floor, target, cap)
        k10 = derived_k(10 * n, floor, target, cap)
        assert k10 >= 5 * k1

    # (c) expected cell size bounded by target wherever the cap allows
    for n in (10_000, 1_000_000, 100_000_000):
        k = derived_k(n, _SEM_K, _SEM_TARGET_CELL, _SEM_K_CAP)
        if k < _SEM_K_CAP:
            assert n / k <= _SEM_TARGET_CELL + 1

    # (d) caps: PQ saturates the 8-bit codebook, SemDeDup at IVF scale
    assert derived_k(10**7, _PQ_K, _PQ_TARGET, _PQ_K_CAP) == 256
    assert derived_k(10**12, _SEM_K, _SEM_TARGET_CELL, _SEM_K_CAP) == _SEM_K_CAP


def test_two_level_ivf_assignment(spark):
    """VERDICT r6 #8: beyond the broadcast cap, centroid assignment
    must route through ~sqrt(K) super-cells with every stage bounded —
    and agree with the one-level broadcast assignment on a corpus
    whose super-cells separate at least as well as its cells.

    Synthetic corpus: G=40 orthogonal group directions (distinct basis
    vectors), vec i belongs to group i%G, centroids = first G vectors
    (the first-K convention). Forcing two_level_from below K exercises
    the two-level path at a row count ABOVE the (forced) cap; the
    orthogonal construction makes the nprobe=1 routing exact, so the
    two paths must agree vector-for-vector."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.functions.llmops import _ivf_assign

    G, PER, DIM = 40, 30, 64
    rows = []
    for i in range(G * PER):
        g = i % G
        v = [0.0] * DIM
        v[g] = 1.0 + (i % 7) * 0.1  # scale varies, direction exact
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    e = df.withColumn(
        "nrm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    )
    cent = e.filter(F.col("vec_id") < G).select(
        F.col("vec_id").alias("cell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )

    one = _ivf_assign(e, cent, G)  # default threshold -> broadcast path
    two = _ivf_assign(e, cent, G, two_level_from=8)  # force two-level

    got_one = {r["vec_id"]: r["cell"] for r in one.collect()}
    got_two = {r["vec_id"]: r["cell"] for r in two.collect()}
    assert len(got_two) == G * PER, "every vector assigned exactly once"
    assert got_two == got_one, "two-level must agree on separable cells"
    assert got_two == {i: i % G for i in range(G * PER)}

    # bounded per-cell sizes: clustering granularity holds through the
    # two-level routing
    sizes = two.groupBy("cell").count().collect()
    assert all(r["count"] == PER for r in sizes)


def test_two_level_ivf_duplicate_super_centroids_no_row_loss(spark):
    """r7 ADVICE (low): duplicate/colinear super centroids tie-break
    centroid routing away from a super-cell; with an inner candidate
    join that silently DROPPED every vector routed there. The
    self-first tie-break guarantees super-cell s always contains at
    least centroid s, so no vector can lose its candidate set.

    Construction: centroids 0 and 1 are EXACT duplicates (both super
    centroids under two_level_from=4, n_super=2) — without the
    self-preference, centroid 1 routes to super-cell 0 and super-cell
    1 is empty of centroids."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.functions.llmops import _ivf_assign

    K, PER, DIM = 6, 10, 16
    rows = []
    for i in range(K * PER):
        g = i % K
        v = [0.0] * DIM
        if g == 1:
            v[0] = 1.0  # group 1 duplicates group 0's direction
        else:
            v[g] = 1.0
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    e = df.withColumn(
        "nrm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    )
    cent = e.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cell"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    two = _ivf_assign(e, cent, K, two_level_from=4)  # n_super = 2
    got = two.collect()
    assert len(got) == K * PER, "no vector dropped by the candidate join"
    assert len({r["vec_id"] for r in got}) == K * PER
    # the duplicated direction resolves to the smaller cell id (the
    # documented asc-cell tie-break of the FINAL assignment)
    for r in got:
        expect = r["vec_id"] % K
        if expect == 1:
            expect = 0  # duplicate centroid: ties go to cell 0
        assert r["cell"] == expect


def test_super_centroid_self_routing_invariant(spark):
    """The property the no-row-loss guarantee rests on: with an EXACT
    duplicate pair of super centroids (worst-case tie), each super
    centroid still routes to ITSELF."""
    import pyspark.sql.functions as F

    from dask_deltalake_spark.functions.llmops import (
        _route_centroids_to_super,
    )

    cent = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1.0),
            (1, [1.0, 0.0], 1.0),  # exact duplicate of super 0
            (2, [0.0, 1.0], 1.0),
        ],
        "cell long, cv array<double>, cnrm double",
    )
    sup = cent.filter(F.col("cell") < 2).select(
        F.col("cell").alias("scell"),
        F.col("cv").alias("sv"),
        F.col("cnrm").alias("snrm"),
    )
    routed = {
        r["cell"]: r["scell"]
        for r in _route_centroids_to_super(cent, sup).collect()
    }
    assert routed[0] == 0 and routed[1] == 1, "self-first on exact ties"
    assert routed[2] in (0, 1)


def test_super_centroid_self_routing_survives_float_rounding(spark):
    """Self-first must be UNCONDITIONAL, not tie-only (self-review
    r8): a colinear-but-SCALED duplicate's cross similarity
    dot(c,s)/(cn*sn) and the self term dot(c,c)/cn**2 are both
    mathematically 1 but round differently — whenever the cross term
    lands an ulp higher, a tie-only preference routes the super
    centroid away from itself, empties its super-cell, and re-opens
    the silent vector-drop. With awkward irrational-ish components and
    scale factors, at least one direction of the pair historically
    rounds unequal; self-first ordering makes routing exact either
    way."""
    import math

    import pyspark.sql.functions as F

    from dask_deltalake_spark.functions.llmops import (
        _route_centroids_to_super,
    )

    base = [math.sqrt(2) / 3, math.pi / 7, math.e / 11, 0.1234567891234]
    rows = []
    for cell, scale in ((0, 1.0), (1, 3.7), (2, 0.00313)):
        v = [x * scale for x in base]
        rows.append((cell, v, math.sqrt(sum(x * x for x in v))))
    rows.append((3, [0.0, 0.0, 1.0, 0.0], 1.0))
    cent = spark.createDataFrame(
        rows, "cell long, cv array<double>, cnrm double"
    )
    sup = cent.filter(F.col("cell") < 3).select(
        F.col("cell").alias("scell"),
        F.col("cv").alias("sv"),
        F.col("cnrm").alias("snrm"),
    )
    routed = {
        r["cell"]: r["scell"]
        for r in _route_centroids_to_super(cent, sup).collect()
    }
    for s_ in (0, 1, 2):
        assert routed[s_] == s_, (
            f"super centroid {s_} must route to itself (got "
            f"{routed[s_]}) regardless of float rounding"
        )


def test_x37_chunk_dedup_reconstruction(spark):
    """Hand-built corpus with known chunk sharing: doc 0 owns chunks
    A B; doc 1 repeats A (removed — doc 0 is the global first) then
    its own C; doc 2 repeats A twice AND B (all removed), keeping
    nothing. Reconstruction must drop exactly the non-first instances
    and reassemble survivors in position order."""
    import hashlib

    from dask_deltalake_spark.functions.llmops import chunk_dedup

    A = " ".join(f"a{i}" for i in range(8))
    B = " ".join(f"b{i}" for i in range(8))
    C = " ".join(f"c{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (0, f"{A} {B}"),
            (1, f"{A} {C}"),
            (2, f"{A} {A} {B}"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in chunk_dedup(docs).collect()}
    assert (rows[0]["n_chunks"], rows[0]["n_kept"]) == (2, 2)
    assert (rows[1]["n_chunks"], rows[1]["n_kept"]) == (2, 1)
    assert (rows[2]["n_chunks"], rows[2]["n_kept"]) == (3, 0)
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert rows[0]["clean_hash"] == md5(f"{A} {B}")
    assert rows[1]["clean_hash"] == md5(C)
    assert rows[2]["clean_hash"] == md5("")
    assert rows[2]["clean_chars"] == 0
    # trailing partial chunk is its own unit: a doc ending mid-chunk
    # dedups the partial independently of the full chunk it prefixes
    docs2 = spark.createDataFrame(
        [(0, f"{A}"), (1, f"{A} a0 a1")],
        "doc_id long, text string",
    )
    rows2 = {r["doc_id"]: r for r in chunk_dedup(docs2).collect()}
    assert (rows2[1]["n_chunks"], rows2[1]["n_kept"]) == (2, 1)
    assert rows2[1]["clean_hash"] == md5("a0 a1")


def test_x38_contrastive_scores_hand_weights(spark):
    """3-doc corpus with hand-computed bucket weights (buckets
    verified collision-free at 3 hex chars): target doc = 'good good',
    raw = 'good bad' / 'bad bad'. ct(good)=2 ct('good good')=1, Nt=3;
    cr(good)=1 cr(bad)=3 cr('good bad')=1 cr('bad bad')=1, Nr=6.
    w = ct*Nr - cr*Nt: good=9, 'good good'=6, bad=-9, others=-3."""
    from dask_deltalake_spark.functions.curation import contrastive_scores

    docs = spark.createDataFrame(
        [
            (0, True, "good good"),
            (1, False, "good bad"),
            (2, False, "bad bad"),
        ],
        "doc_id long, is_t boolean, text string",
    )
    rows = {r["doc_id"]: r for r in contrastive_scores(docs).collect()}
    assert rows[0]["score"] == 9 + 9 + 6 and rows[0]["selected"] == 1
    assert rows[1]["score"] == 9 - 9 - 3 and rows[1]["selected"] == 0
    assert rows[2]["score"] == -9 - 9 - 3 and rows[2]["selected"] == 0
    assert [rows[i]["n_grams"] for i in (0, 1, 2)] == [3, 3, 3]


def test_x39_matches_reference_bpe_encoding(spark):
    """x39 invariant (rows-only at the driver): applying a rule list
    via the chained-fold encoder must reproduce a straightforward
    in-memory greedy-leftmost BPE encoder token-for-token — including
    rule interaction (later rules over earlier merges), sub-minimum /
    over-maximum / non-alpha words falling back to 1 OOV token."""
    import re

    from dask_deltalake_spark.functions.llmops import (
        _BPE_MAX_WORD,
        bpe_encode_counts,
    )

    rules = [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]

    def ref_encode(w):
        syms = list(w)
        for a, b in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    texts = [
        (0, "lower lowest low slower"),
        (1, "o lo lol 123 verylongwordbeyondcap" + "x" * _BPE_MAX_WORD),
        (2, "lower lower lower"),
    ]
    rows = {
        r["doc_id"]: r
        for r in bpe_encode_counts(
            spark.createDataFrame(texts, "doc_id long, text string"), rules
        ).collect()
    }
    for doc_id, text in texts:
        exp_ws, exp_bpe, exp_oov = 0, 0, 0
        for w in re.split(" +", text.lower().strip()):
            exp_ws += 1
            if 2 <= len(w) <= _BPE_MAX_WORD and re.fullmatch("[a-z]+", w):
                exp_bpe += len(ref_encode(w))
            else:
                exp_bpe += 1
                exp_oov += 1
        got = rows[doc_id]
        assert got["n_tokens_ws"] == exp_ws, (doc_id, got)
        assert got["n_tokens_bpe"] == exp_bpe, (doc_id, got)
        assert got["n_oov"] == exp_oov, (doc_id, got)


def test_x39_segmented_encoding_at_production_rule_counts(spark):
    """VERDICT r8 #6: at production rule counts (R ≥ 64) the encoder
    applies merge rules in SEGMENTS — the vocab frame's lineage is cut
    with localCheckpoint every ``segment_size`` rules because
    Catalyst's planning cost on one unbroken R-deep projection chain
    is superlinear (measured: R=256 6.5 s, R=512 35 s unbroken vs 12 s
    segmented; ledgered on bpe_encode_counts). Segmentation must be
    token-for-token invisible: the output matches the in-memory
    greedy-leftmost reference encoder across several lineage cuts,
    including compound rules that only fire over earlier merges."""
    import itertools
    import re

    from dask_deltalake_spark.functions.llmops import (
        _BPE_MAX_WORD,
        bpe_encode_counts,
    )

    rules = [
        (a, b) for a, b in itertools.product("etaoinshrdlu", repeat=2)
    ][:64]
    # compounds exercising rule interaction across segment boundaries
    rules += [
        ("th", "e"), ("in", "g"), ("an", "d"), ("er", "s"),
        ("the", "re"), ("and", "s"), ("ing", "s"), ("es", "t"),
    ]
    assert len(rules) == 72

    def ref_encode(w):
        syms = list(w)
        for a, b in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = [
        "there", "standing", "threads", "nothing", "handers",
        "interesting", "estates", "sandstone", "inland", "strand",
        "a", "zz9", "the", "ands", "ingest", "x" * (_BPE_MAX_WORD + 1),
    ]
    texts = [(i, " ".join(words[i::3] + words)) for i in range(3)]
    got = {
        r["doc_id"]: r
        for r in bpe_encode_counts(
            spark.createDataFrame(texts, "doc_id long, text string"),
            rules,
            segment_size=16,  # force 4 lineage cuts in-test
        ).collect()
    }
    for doc_id, text in texts:
        exp_ws = exp_bpe = exp_oov = 0
        for w in re.split(" +", text.lower().strip()):
            exp_ws += 1
            if 2 <= len(w) <= _BPE_MAX_WORD and re.fullmatch("[a-z]+", w):
                exp_bpe += len(ref_encode(w))
            else:
                exp_bpe += 1
                exp_oov += 1
        r = got[doc_id]
        assert (r["n_tokens_ws"], r["n_tokens_bpe"], r["n_oov"]) == (
            exp_ws,
            exp_bpe,
            exp_oov,
        ), (doc_id, r)


def test_exact_substring_dedup_hand_checked(spark):
    """exact_substring_dedup (Lee et al. ExactSubstr, x40 in the r10
    window): duplicated k-token spans vanish everywhere except their
    globally-first occurrence — mid-document excision, multi-span
    docs, periodic self-repetition collapsing to one period, keeper
    docs and short docs untouched. Every expectation hand-computed."""
    from dask_deltalake_spark.functions.llmops import exact_substring_dedup

    docs = [
        (0, "a b c d x1 x2 x3"),                    # keeper of "a b c d"
        (1, "y1 y2 a b c d y3 y4"),                 # mid-doc dup span
        (2, "u1 u2 u3 u4 u5"),                      # keeper of "u1..u4"
        (3, "p q r s p q r s p q r s"),             # periodic self-rep
        (4, "a b c d m1 m2 m3 u1 u2 u3 u4 m4"),     # two separate spans
        (5, "z1 z2"),                               # shorter than k
        (6, "A B C D x9"),                  # case differs: NOT a dup
        (7, "w1\na b\nc d\tw2"),            # newline/tab-wrapped dup
        (8, ""),                            # empty doc
    ]
    out = {
        r["doc_id"]: r
        for r in exact_substring_dedup(
            spark.createDataFrame(docs, "doc_id long, text string"), k=4
        ).collect()
    }
    exp = {
        0: (7, 0, 0, "a b c d x1 x2 x3"),
        1: (8, 4, 1, "y1 y2 y3 y4"),
        2: (5, 0, 0, "u1 u2 u3 u4 u5"),
        3: (12, 8, 1, "p q r s"),
        4: (12, 8, 2, "m1 m2 m3 m4"),
        5: (2, 0, 0, "z1 z2"),
        # exact means exact: case-different spans are distinct, and the
        # surviving text keeps its original bytes (no lowercasing)
        6: (5, 0, 0, "A B C D x9"),
        # \s+ tokenization aligns newline/tab-wrapped duplicates; the
        # only lossy step is clean_text's single-space rejoin
        7: (6, 4, 1, "w1 w2"),
        8: (0, 0, 0, ""),
    }
    assert len(out) == len(exp)
    for doc_id, (n, nr, ns, txt) in exp.items():
        r = out[doc_id]
        assert (
            r["n_tokens"],
            r["n_removed_tokens"],
            r["n_spans_removed"],
            r["clean_text"],
        ) == (n, nr, ns, txt), (doc_id, r)
        # reconstruction invariant: counts and text agree
        kept = len(txt.split()) if txt else 0
        assert n - nr == kept


def test_x41_direct_path_matches_histogram_at_s30(spark):
    """VERDICT r10 #6: the docstring's larger-S capacity claim as a
    tested contract. At S = 30 synthetic sources (past the histogram's
    auto threshold of 25) the DIRECT one-pass conditional-sum path
    must produce exactly the histogram path's matrix — and auto must
    pick it. Corpus: 30 sources sharing a controlled overlap pattern
    (source i shares grams with source (i+1) % 30 via a common
    sentence chunk, plus per-source unique text), so the matrix has
    both zero and non-zero cells."""
    from dask_deltalake_spark.functions.llmops import (
        source_overlap_matrix,
    )

    rows = []
    for i in range(30):
        j = min(i, (i + 1) % 30)
        shared = " ".join(f"br{j}t{k}" for k in range(6))
        rows.append(
            (f"src{i:02d}", " ".join(f"u{i}w{k}" for k in range(6)))
        )
        rows.append((f"src{i:02d}", shared))
    d = spark.createDataFrame(rows, "source string, text string")

    def canon(df):
        return sorted(
            (r["source_a"], r["source_b"], r["n_common"], r["jaccard"])
            for r in df.collect()
        )

    hist = canon(source_overlap_matrix(d, method="histogram"))
    direct = canon(source_overlap_matrix(d, method="direct"))
    auto = canon(source_overlap_matrix(d, method="auto"))
    assert len(hist) == 30 * 29 // 2
    assert direct == hist
    assert auto == hist  # auto routed to direct at S=30, same matrix
    assert any(c > 0 for (_, _, c, _) in hist)
    assert any(c == 0 for (_, _, c, _) in hist)


def test_x41_wide_mask_matches_construction_at_s70(spark):
    """Past the single-long capacity the mask widens to ceil(S/64)
    long words and the direct aggregation is unchanged — pinned
    against a constructed truth at S = 70 (no tokenizer re-
    implementation: every doc is exactly ONE 3-token gram by
    construction, so the expected matrix is set arithmetic on the
    construction itself). Source i holds grams {own_i, sh_i,
    sh_{(i-1) % 70}} — consecutive pairs (mod 70) share exactly one
    gram (Jaccard 1/5), everything else shares none. The pair
    (0, 69) crosses the word boundary (bits 0 and 5 of words 0 and
    1), the exact aliasing the ADVICE r10 finding was about."""
    from dask_deltalake_spark.functions.llmops import (
        source_overlap_matrix,
    )

    S = 70
    rows = []
    for i in range(S):
        rows.append((f"s{i:03d}", f"o{i}a o{i}b o{i}c"))
        rows.append((f"s{i:03d}", f"sh{i}a sh{i}b sh{i}c"))
        rows.append(
            (f"s{i:03d}", f"sh{(i - 1) % S}a sh{(i - 1) % S}b "
             f"sh{(i - 1) % S}c")
        )
    d = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["source_a"], r["source_b"]): (r["n_common"], r["jaccard"])
        for r in source_overlap_matrix(d, method="direct").collect()
    }
    assert len(got) == S * (S - 1) // 2
    for i in range(S):
        for j in range(i + 1, S):
            neighbors = (j == i + 1) or (i == 0 and j == S - 1)
            exp = (1, round(1 / 5, 4)) if neighbors else (0, 0.0)
            assert got[(f"s{i:03d}", f"s{j:03d}")] == exp, (i, j)
    # auto must route S=70 to the wide direct path, same matrix
    auto = {
        (r["source_a"], r["source_b"]): (r["n_common"], r["jaccard"])
        for r in source_overlap_matrix(d, method="auto").collect()
    }
    assert auto == got


def test_x41_histogram_rejects_more_than_63_sources(spark):
    """ADVICE r10: JVM shiftleft masks the shift amount to 6 bits, so
    source 64 would silently alias source 0 in the single-long
    histogram mask — explicit method='histogram' past 63 sources is
    an enforced error (auto/direct take the wide mask instead)."""
    import pytest as _pytest

    from dask_deltalake_spark.functions.llmops import (
        source_overlap_matrix,
    )

    rows = [(f"s{i:03d}", f"text {i} a b c d") for i in range(64)]
    d = spark.createDataFrame(rows, "source string, text string")
    with _pytest.raises(ValueError, match="histogram method packs one"):
        source_overlap_matrix(d, method="histogram")


def test_x41_gramless_corpus_same_shape_both_methods(spark):
    """Review r11: a corpus where every doc has fewer than 3 tokens
    produces NO grams — both methods must still return the full
    all-zero matrix (the zero-gram-sources contract), not an empty
    frame on one path and S(S-1)/2 zero rows on the other."""
    from dask_deltalake_spark.functions.llmops import (
        source_overlap_matrix,
    )

    rows = [(f"s{i}", f"a{i} b{i}") for i in range(3)]
    d = spark.createDataFrame(rows, "source string, text string")
    for method in ("histogram", "direct"):
        got = sorted(
            (r["source_a"], r["source_b"], r["n_common"], r["jaccard"])
            for r in source_overlap_matrix(d, method=method).collect()
        )
        assert got == [
            ("s0", "s1", 0, 0.0),
            ("s0", "s2", 0, 0.0),
            ("s1", "s2", 0, 0.0),
        ], (method, got)


def test_x41_unknown_method_raises(spark):
    """Review r11: a typo'd method must never fall through to the
    capacity-limited histogram path."""
    import pytest as _pytest

    from dask_deltalake_spark.functions.llmops import (
        source_overlap_matrix,
    )

    d = spark.createDataFrame(
        [("a", "x y z")], "source string, text string"
    )
    with _pytest.raises(ValueError, match="unknown method"):
        source_overlap_matrix(d, method="Histogram")


from hypothesis import HealthCheck as _HealthCheck
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st

_overlap_corpus = _st.lists(
    _st.tuples(
        _st.integers(min_value=0, max_value=5),  # source id
        _st.lists(  # token ids from a tiny shared vocab -> overlaps
            _st.integers(min_value=0, max_value=7), min_size=0, max_size=7
        ),
    ),
    min_size=1,
    max_size=10,
)


@_settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[_HealthCheck.too_slow],
)
@_given(corpus=_overlap_corpus)
def test_x41_histogram_direct_equivalence_property(spark, corpus):
    """Property over the r11 method seam: for ANY corpus the
    histogram and direct constructions are the same matrix — same
    pairs, same counts, same jaccard — including gram-less docs,
    single-source corpora, and full-overlap sources (the S=30/S=70
    pins cover specific shapes; this sweeps the seam)."""
    from dask_deltalake_spark.functions.llmops import (
        source_overlap_matrix,
    )

    rows = [
        (f"s{sid}", " ".join(f"t{t}" for t in toks))
        for sid, toks in corpus
    ]
    d = spark.createDataFrame(rows, "source string, text string")

    def canon(df):
        return sorted(
            (r["source_a"], r["source_b"], r["n_common"], r["jaccard"])
            for r in df.collect()
        )

    assert canon(source_overlap_matrix(d, method="histogram")) == canon(
        source_overlap_matrix(d, method="direct")
    )
