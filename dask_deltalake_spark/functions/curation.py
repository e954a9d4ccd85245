"""Training-data curation operators over `documents` / `events`.

The ops a 100 TB pretraining-data pipeline runs between raw crawl and
tokenizer: deterministic split assignment, benchmark decontamination,
repetition (quality) filtering, PII scrubbing, source mixing, and
sequence packing. Same design rules as functions/llmops.py: pure
Catalyst expressions in the hot path, blocked/broadcast topologies, no
O(n²) pair space, integer outputs wherever a float could flake the
oracle hash.

All are beyond-reference extensions (SURVEY.md §2.3 north-star tier);
the reference (hayesgb/dask_deltalake) has no curation surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from dask_deltalake_spark.functions.llmops import (
    _SHINGLES_SQL,
    _spread,
    _t,
    _TOKENS_SQL,
    shingles,
    tokens,
)

REGISTRY: dict = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco

# Deterministic doc hash, identical arithmetic in Spark and DuckDB:
# reduce doc_id mod a prime first so the multiply never overflows
# BIGINT even at 100 TB id ranges (id % 1e9+7 ≤ 1e9; × 2.7e9 < 2^63).
_P = 1_000_000_007


def _doc_hash_mod(col, mult: int, mod: int):
    return ((col % _P) * mult) % _P % mod


def _doc_hash_sql(col: str, mult: int, mod: int) -> str:
    return f"((({col} % {_P}) * {mult}) % {_P}) % {mod}"


_SPLIT_H = _doc_hash_sql("doc_id", 2654435761, 100)


@query(
    "x20_hash_split",
    f"""
    WITH d AS (
      SELECT CASE
               WHEN {_SPLIT_H} < 90 THEN 'train'
               WHEN {_SPLIT_H} < 95 THEN 'validation'
               ELSE 'test'
             END AS split,
             CAST(LEN({_TOKENS_SQL}) AS BIGINT) AS n_tok,
             n_chars
      FROM documents
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM d GROUP BY split ORDER BY split
    """,
)
def x20_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test assignment by stable doc-id
    hash — the reproducible alternative to random sampling: any worker
    on any cluster assigns the same doc to the same split, re-runs are
    idempotent, and no split-assignment table has to be stored or
    joined. Pure map + 3-group aggregate: zero shuffle beyond the
    final (3-row) agg at any corpus size."""
    d = _t(spark, sf_dir, "documents")
    h = _doc_hash_mod(F.col("doc_id"), 2654435761, 100)
    return (
        d.select(
            F.when(h < 90, "train")
            .when(h < 95, "validation")
            .otherwise("test")
            .alias("split"),
            F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("split")
    )


# n-gram length for decontamination. Production pipelines use 8-13
# token n-grams (long enough that a shared n-gram is evidence of
# copying); the synthetic fixture has a ~40-word vocabulary and zero
# copied documents, so n=4 is used there — the longest n that still
# produces a non-empty, selective result to verify the topology
# against the oracle. The operator is N-agnostic: change _DECON_N and
# both sides (Spark + oracle SQL) follow.
_DECON_N = 4
_DECON_NGRAMS_SQL = (
    "LIST_TRANSFORM(RANGE(1, LEN(toks) - {nm2}), i -> {concat})".format(
        nm2=_DECON_N - 2,
        concat=" || ' ' || ".join(
            f"toks[i+{j}]" if j else "toks[i]" for j in range(_DECON_N)
        ),
    )
)


def _ngrams8(tok):
    # callers pre-filter size(tok) >= 8, so no empty-array guard needed
    return F.transform(
        F.sequence(F.lit(1), F.size(tok) - (_DECON_N - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok, i + j) for j in range(_DECON_N)]
        ),
    )


@query(
    "x21_decontaminate",
    f"""
    WITH toked AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ),
    grams AS (
      SELECT doc_id, UNNEST({_DECON_NGRAMS_SQL}) AS g
      FROM toked WHERE LEN(toks) >= {_DECON_N}
    ),
    bench AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
    ),
    hits AS (
      SELECT DISTINCT t.doc_id, t.g
      FROM grams t JOIN bench b ON t.g = b.g
      WHERE t.doc_id % 97 <> 0
    )
    SELECT doc_id, COUNT(*) AS n_shared
    FROM hits GROUP BY doc_id ORDER BY doc_id
    """,
)
def x21_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    _DECON_N-token n-gram with the held-out eval set (here: docs with
    doc_id % 97 == 0 stand in for the benchmark suite). Topology is
    the one that survives 100 TB: the benchmark n-gram set is tiny by
    construction (benchmarks are MBs, not TBs) and is explicitly
    broadcast, so the training side is a map-side semi-join over its
    exploded n-grams — the corpus is scanned once, nothing about the
    corpus is ever shuffled. Output: (doc_id, n_shared distinct
    n-grams) per contaminated doc."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    # bind toks before the n-gram lambda (Catalyst does not CSE inside
    # higher-order lambdas — see llmops.x04), pre-filter on token count
    toked = (
        d.select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= _DECON_N)
        .select("doc_id", F.explode(F.array_distinct(_ngrams8(F.col("toks")))).alias("g"))
    )
    bench = toked.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    train = toked.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(F.broadcast(bench), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .orderBy("doc_id")
    )


@query(
    "x22_repetition_filter",
    """
    WITH t AS (
      SELECT lang, source, toks FROM (
        SELECT lang, source, {tokens} AS toks FROM documents
      ) WHERE LEN(toks) >= 3
    ),
    per_doc AS (
      SELECT lang, source,
             CAST(LEN({shingles}) AS BIGINT) AS sz,
             CAST(LEN(LIST_DISTINCT({shingles})) AS BIGINT) AS dsz
      FROM t
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (5 * (sz - dsz) > sz) AS n_flagged,
           CAST(SUM(sz - dsz) AS BIGINT) AS dup_shingles,
           CAST(SUM(sz) AS BIGINT) AS total_shingles
    FROM per_doc GROUP BY lang, source ORDER BY lang, source
    """.format(tokens=_TOKENS_SQL, shingles=_SHINGLES_SQL),
)
def x22_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter: per-doc duplicate
    3-gram fraction, aggregated per (lang, source) block. A doc is
    flagged when >20% of its shingles are repeats — compared in exact
    integer arithmetic (5·(sz−dsz) > sz), so no float ever enters the
    oracle hash. Pure map-side expression work (tokenize → shingle →
    size/distinct-size) plus one small aggregate: scans the corpus
    once, shuffles only (lang, source) partials."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    per_doc = (
        d.select("lang", "source", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "lang",
            "source",
            F.size(shingles(F.col("toks"))).cast("long").alias("sz"),
            F.size(F.array_distinct(shingles(F.col("toks"))))
            .cast("long")
            .alias("dsz"),
        )
    )
    flagged = (5 * (F.col("sz") - F.col("dsz")) > F.col("sz")).cast("long")
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(flagged).alias("n_flagged"),
            F.sum(F.col("sz") - F.col("dsz")).alias("dup_shingles"),
            F.sum("sz").alias("total_shingles"),
        )
        .orderBy("lang", "source")
    )


_PII_PATTERNS = [
    # (class, regex valid in BOTH Java regex and RE2/DuckDB)
    ("number", "[0-9]+"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
]


@query(
    "x23_pii_scrub",
    """
    WITH scrubbed AS (
      SELECT event_type,
             CAST(LEN(REGEXP_EXTRACT_ALL(props, '[0-9]+')) AS BIGINT)
               + CAST(LEN(REGEXP_EXTRACT_ALL(props,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
               AS n_hits,
             REGEXP_REPLACE(REGEXP_REPLACE(props,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '[0-9]+', '<NUM>', 'g') AS redacted
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(n_hits) AS BIGINT) AS n_redactions,
           COUNT(*) FILTER (n_hits > 0) AS n_affected,
           MIN(redacted) AS sample_redacted
    FROM scrubbed GROUP BY event_type ORDER BY event_type
    """,
)
def x23_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over free-text payloads (events.props): redact
    pattern classes (digit runs, emails — the fixture's payloads only
    contain digit runs; the email pattern exercises the multi-class
    plumbing) and report per-event-type redaction stats plus a
    deterministic (MIN) sample of redacted output. regexp_replace /
    regexp_count are JVM codegen expressions — the whole scrub is one
    corpus scan with a tiny per-type aggregate; patterns are chosen to
    parse identically under Java regex and RE2."""
    e = _t(spark, sf_dir, "events")
    email_re, num_re = _PII_PATTERNS[1][1], _PII_PATTERNS[0][1]
    n_hits = (
        F.regexp_count(F.col("props"), F.lit(num_re))
        + F.regexp_count(F.col("props"), F.lit(email_re))
    ).cast("long")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("props"), email_re, "<EMAIL>"),
        num_re,
        "<NUM>",
    )
    return (
        e.select("event_type", n_hits.alias("n_hits"), redacted.alias("redacted"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("n_hits").alias("n_redactions"),
            F.sum((F.col("n_hits") > 0).cast("long")).alias("n_affected"),
            F.min("redacted").alias("sample_redacted"),
        )
        .orderBy("event_type")
    )


_MIX_H = _doc_hash_sql("doc_id", 1779033703, 100)


@query(
    "x24_source_mix",
    f"""
    WITH d AS (
      SELECT source,
             {_MIX_H} AS h,
             100 - 25 * (CAST(SUBSTR(source, 4) AS BIGINT) % 4) AS cap
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (h < cap) AS n_kept
    FROM d GROUP BY source ORDER BY source
    """,
)
def x24_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mix resampling: each source gets a target
    retention rate (here 100/75/50/25% by source index mod 4, standing
    in for a curated domain-mixing table) and docs are kept when their
    stable hash falls under the source's cap — reproducible weighted
    downsampling with no shuffle at all until the per-source count
    aggregate, and no sample-membership table to store: membership is
    recomputable from the doc_id alone. Uses a different multiplier
    than x20's split hash so mix sampling is independent of split
    assignment."""
    d = _t(spark, sf_dir, "documents")
    h = _doc_hash_mod(F.col("doc_id"), 1779033703, 100)
    # substring(source, 4) with NO length cap — the oracle's
    # SUBSTR(source, 4) runs to end of string, and a 10-char cap would
    # silently truncate (then NULL-cast) source names with longer
    # numeric suffixes.
    cap = 100 - 25 * (F.expr("substring(source, 4)").cast("long") % 4)
    return (
        d.select("source", h.alias("h"), cap.alias("cap"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum((F.col("h") < F.col("cap")).cast("long")).alias("n_kept"),
        )
        .orderBy("source")
    )


_PACK_BUDGET = 2048


@query(
    "x25_pack_sequences",
    f"""
    WITH t AS (
      SELECT lang, source, doc_id,
             CAST(LEN({_TOKENS_SQL}) AS BIGINT) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT lang, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang, source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ),
    binned AS (
      SELECT lang, source, n_tok,
             CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT) AS bin
      FROM c
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           COUNT(DISTINCT bin) AS n_bins
    FROM binned GROUP BY lang, source ORDER BY lang, source
    """,
)
def x25_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: docs are packed in doc_id order
    into fixed token-budget bins (_PACK_BUDGET = 2048 tokens) via a
    running-sum bin assignment — the vectorizable approximation of
    greedy packing (a doc may straddle its bin boundary; exact
    first-fit is inherently sequential). Packing is blocked per
    (lang, source): each block sorts independently inside its window
    partition, so the global operation is one partitioned window — no
    global sort at any corpus size. Output: docs/tokens/bins per
    block."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    t = d.select(
        "lang",
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = t.select(
        "lang",
        "source",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")).cast("double") / _PACK_BUDGET)
        .cast("long")
        .alias("bin"),
    )
    return (
        binned.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.countDistinct("bin").alias("n_bins"),
        )
        .orderBy("lang", "source")
    )


_MIN_TOKENS = 10


@query(
    "x26_curation_pipeline",
    f"""
    WITH staged AS (
      SELECT doc_id, lang,
             MD5(REGEXP_REPLACE(REGEXP_REPLACE(TRIM(LOWER(text)), '[^a-z0-9 ]', '', 'g'),
                                ' +', ' ', 'g')) AS norm_hash,
             CAST(LEN(toks) AS BIGINT) AS n_tok,
             CAST(LEN({{shingles}}) AS BIGINT) AS sz,
             CAST(LEN(LIST_DISTINCT({{shingles}})) AS BIGINT) AS dsz
      FROM (SELECT doc_id, lang, text, {{tokens}} AS toks FROM documents)
      WHERE lang IN ('en', 'de')
    ),
    quality AS (
      SELECT * FROM staged
      WHERE n_tok >= {_MIN_TOKENS} AND 5 * (sz - dsz) <= sz
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, MIN(doc_id) OVER (PARTITION BY norm_hash) AS keeper
        FROM quality
      ) WHERE doc_id = keeper
    ),
    split AS (
      SELECT lang,
             CASE WHEN {_SPLIT_H} < 90 THEN 'train'
                  WHEN {_SPLIT_H} < 95 THEN 'validation'
                  ELSE 'test' END AS split,
             n_tok
      FROM deduped
    )
    SELECT lang, split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM split GROUP BY lang, split ORDER BY lang, split
    """.format(tokens=_TOKENS_SQL, shingles=_SHINGLES_SQL),
)
def x26_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation tier composed end-to-end, the way a pretraining
    data job actually runs: language filter → quality gate (length +
    repetition, integer-exact) → normalized exact dedup (keep min
    doc_id per normalized hash) → deterministic split assignment →
    per-(lang, split) corpus stats. The whole pipeline is ONE pass
    over the corpus plus exactly two shuffles — the dedup window on
    norm_hash and the final small aggregate; filters and projections
    all fold into the scan. Every stage reuses the single-op
    building blocks (x02 normalization, x22 repetition arithmetic,
    x20 split hash), so the composition is provably consistent with
    the parts."""
    d = _spread(spark, _t(spark, sf_dir, "documents")).filter(
        F.col("lang").isin("en", "de")
    )
    norm = F.regexp_replace(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), "[^a-z0-9 ]", ""),
        " +",
        " ",
    )
    # Token-count gate BEFORE the normalize/md5/shingle projection:
    # short docs never pay for the expensive derivations, and the
    # filter doubles as the projection barrier that keeps `toks` bound
    # outside the shingle lambda (see _jaccard_pairs for the measured
    # re-evaluation pathology). Filter order is semantically neutral —
    # the gates are conjunctive.
    staged = (
        d.select("doc_id", "lang", "text", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= _MIN_TOKENS)
        .select(
            "doc_id",
            "lang",
            F.md5(norm).alias("norm_hash"),
            F.size("toks").cast("long").alias("n_tok"),
            F.size(shingles(F.col("toks"))).cast("long").alias("sz"),
            F.size(F.array_distinct(shingles(F.col("toks"))))
            .cast("long")
            .alias("dsz"),
        )
        # Persist the derived 6-column frame: the downstream quality
        # filter would otherwise be PUSHED BELOW this projection, and
        # the predicate rewrite re-inlines tokenize+shingle into both
        # the filter AND the projection (measured 20s vs 2s at sf0.1).
        # The persisted frame is corpus *metadata* — fixed-width
        # columns, no text — ~1% of input bytes, so caching it is the
        # right trade at 100 TB too (production would stage it to a
        # table between passes).
        .persist()
    )
    quality = staged.filter(5 * (F.col("sz") - F.col("dsz")) <= F.col("sz"))
    w = Window.partitionBy("norm_hash")
    deduped = quality.withColumn("keeper", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("keeper")
    )
    h = _doc_hash_mod(F.col("doc_id"), 2654435761, 100)
    split = deduped.select(
        "lang",
        F.when(h < 90, "train")
        .when(h < 95, "validation")
        .otherwise("test")
        .alias("split"),
        "n_tok",
    )
    return (
        split.groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .orderBy("lang", "split")
    )


_NORM_MD5_SQL = (
    "MD5(REGEXP_REPLACE(REGEXP_REPLACE(TRIM(LOWER(text)), "
    "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)


@query(
    "x28_incremental_dedup",
    f"""
    WITH corpus AS (
      SELECT DISTINCT {_NORM_MD5_SQL} AS norm_hash
      FROM documents WHERE doc_id % 10 != 0
    ),
    batch AS (
      SELECT doc_id, lang, {_NORM_MD5_SQL} AS norm_hash
      FROM documents WHERE doc_id % 10 = 0
    ),
    flagged AS (
      SELECT b.lang,
             CASE WHEN c.norm_hash IS NULL THEN 0 ELSE 1 END AS dup
      FROM batch b LEFT JOIN corpus c ON b.norm_hash = c.norm_hash
    )
    SELECT lang,
           COUNT(*) AS n_batch,
           CAST(SUM(dup) AS BIGINT) AS n_dropped,
           CAST(COUNT(*) - SUM(dup) AS BIGINT) AS n_kept
    FROM flagged GROUP BY lang ORDER BY lang
    """,
)
def x28_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-corpus) dedup — the nightly-crawl shape:
    a NEW slice of documents is deduplicated against the already-
    ingested corpus, not against itself, so ingestion cost is
    O(batch + matched corpus keys), never a full-corpus self-dedup.
    Topology: the corpus side is reduced to DISTINCT normalized hashes
    (x02's normalization) BEFORE the join — at 100 TB the hash set is
    ~3% of corpus bytes, and the join shuffles on a uniform 128-bit
    key, so no skew is possible; a production deployment would keep
    this hash set as a materialized index table and merge-append to it
    per batch. The batch/corpus split here is deterministic
    (doc_id % 10) so the oracle can replay it."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    norm_hash = F.md5(
        F.regexp_replace(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    corpus = (
        d.filter(F.col("doc_id") % 10 != 0)
        .select(norm_hash.alias("norm_hash"))
        .distinct()
        .withColumn("dup_flag", F.lit(1))
    )
    batch = d.filter(F.col("doc_id") % 10 == 0).select(
        "lang", norm_hash.alias("norm_hash")
    )
    flagged = batch.join(corpus, "norm_hash", "left").select(
        "lang", F.coalesce("dup_flag", F.lit(0)).alias("dup")
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").alias("n_batch"),
            F.sum("dup").cast("long").alias("n_dropped"),
            (F.count("*") - F.sum("dup")).cast("long").alias("n_kept"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# x38: hashed n-gram contrastive quality scorer (DSIR / fastText-style
# importance weighting)
# ---------------------------------------------------------------------------

# 3 hex chars of md5 → 4096 feature buckets, identical in Spark and
# DuckDB (both engines' MD5 of the same UTF-8 bytes agree, unlike
# xxhash64). Production would widen to 1M+ buckets; the arithmetic
# below is bucket-count-agnostic.
_QS_BUCKET_HEX = 3


@query(
    "x38_quality_scorer",
    f"""
    WITH d AS (
      SELECT doc_id, {_doc_hash_sql("doc_id", 2654435761, 100)} < 10 AS is_t,
             {_TOKENS_SQL} AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, is_t, SUBSTR(MD5(gram), 1, {_QS_BUCKET_HEX}) AS b
      FROM d, UNNEST(LIST_CONCAT(
        toks,
        LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks), 1)),
                       i -> toks[i] || ' ' || toks[i+1])
      )) AS u(gram)
    ),
    c AS (
      SELECT b,
             SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
      FROM g GROUP BY b
    ),
    tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM c),
    w AS (SELECT b, ct * nr - cr * nt AS w FROM c, tot)
    SELECT doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(w) AS BIGINT) AS score,
           CASE WHEN SUM(w) > 0 THEN 1 ELSE 0 END AS selected
    FROM g JOIN w USING (b)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def x38_quality_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-selection importance weighting (the DSIR / fastText-filter
    family): a deterministic 10% doc-id slice stands in for the
    curated TARGET corpus (Wikipedia/books in production), every doc
    is featurized as hashed {1,2}-gram buckets, and each bucket gets a
    contrastive weight from its target-vs-raw frequency. Per-doc score
    = Σ over the doc's gram instances of the bucket weight; selected =
    score > 0.

    Integer-exact formulation: the naive-Bayes log-ratio
    Σ log(p_t(b)/p_r(b)) is replaced by the cross-multiplied linear
    form Σ (ct[b]·Nr − cr[b]·Nt) — sign-compatible per term, and pure
    BIGINT so the oracle hash can never flake on float rounding (at
    100 TB gram counts the production variant uses the double-precision
    log form; the plan shape is identical).

    Scale shape: featurize is a pure map (tokenize → gram → md5
    substring); bucket counting is an algebraic groupBy over ≤4096
    keys (map-side partials, tiny shuffle); the weight table is ≤4096
    rows and BROADCAST back onto the gram stream (plan-asserted in
    test_plan_quality.py), so scoring adds zero extra shuffle beyond
    the final uniform doc_id aggregate. Two passes over the gram
    stream (count, then score) — both streamed, nothing materialized."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    return contrastive_scores(
        d.select(
            "doc_id",
            (_doc_hash_mod(F.col("doc_id"), 2654435761, 100) < 10).alias(
                "is_t"
            ),
            "text",
        )
    )


def contrastive_scores(d: DataFrame) -> DataFrame:
    """Core of x38 over any (doc_id, is_t, text) frame — split out so
    the pytest invariant can drive it with a corpus whose bucket
    weights are computable by hand."""
    base = d.select(
        "doc_id", "is_t", tokens(F.col("text")).alias("toks")
    )
    # sequence(1, n-1) would COUNT DOWN for n=1 (Spark infers step -1
    # when start > stop) — guard exactly like shingles()
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("toks", i), F.element_at("toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = base.select(
        "doc_id",
        "is_t",
        F.explode(F.concat(F.col("toks"), bigrams)).alias("gram"),
    ).select(
        "doc_id",
        "is_t",
        F.substring(F.md5("gram"), 1, _QS_BUCKET_HEX).alias("b"),
    )
    c = g.groupBy("b").agg(
        F.sum(F.col("is_t").cast("long")).alias("ct"),
        F.sum((~F.col("is_t")).cast("long")).alias("cr"),
    )
    tot = c.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    w = c.crossJoin(F.broadcast(tot)).select(
        "b",
        (F.col("ct") * F.col("nr") - F.col("cr") * F.col("nt")).alias("w"),
    )
    return (
        g.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("w").cast("bigint").alias("score"),
            F.when(F.sum("w") > 0, 1).otherwise(0).alias("selected"),
        )
        .orderBy("doc_id")
    )


# Staged in r14 alongside q59 (see the note there); REGISTERED r15
# with sf0.1 pre-measurements cold 9.87 s / warm 1.15 s (COVERAGE.md).
_X44_BUDGET_SQL = (
    "800 + 100 * (CAST(SUBSTR(source, 4) AS BIGINT) % 4)"
)
_X44_ORACLE = f"""
WITH scored AS (
  SELECT source,
         LEAST(n_chars, 100000) AS band,
         CAST(LEN({_TOKENS_SQL}) AS BIGINT) AS n_tok
  FROM documents
),
bands AS (
  SELECT source, band,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS tok
  FROM scored GROUP BY source, band
),
cum AS (
  SELECT source, band, n_docs, tok,
         SUM(tok) OVER (
           PARTITION BY source ORDER BY band DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_tok,
         {_X44_BUDGET_SQL} AS budget
  FROM bands
)
SELECT source,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs_kept,
       CAST(SUM(tok) AS BIGINT) AS n_tokens_kept,
       CAST(MIN(budget) AS BIGINT) AS budget_tokens,
       CAST(MIN(band) AS BIGINT) AS min_band_kept
FROM cum WHERE cum_tok <= budget
GROUP BY source ORDER BY source
"""


@query("x44_token_budget_mix", _X44_ORACLE)
def x44_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: fill each source's training-token
    budget with its highest-quality documents — THE mixture-design
    primitive of a pretraining pipeline ("give me 60B tokens of web,
    30B of code, best-first"). x24 samples by RATE (hash under a
    per-source cap); this selects under an absolute TOKEN budget with
    a quality ordering, which is how real mixes are specified.

    Scale design — histogram-threshold, NOT a per-doc window: a
    per-source ORDER BY quality cumulative sum over documents is a
    single-reducer sort per source (the classic skew wall — a 100 TB
    web source funnels through one partition). Instead: (1) one
    algebraic groupBy collapses the corpus to (source, quality-band)
    token histograms — the band domain is capped (LEAST(n_chars,
    100000), a stand-in for any bounded quality score), so the
    histogram is O(sources x bands) REGARDLESS of corpus size; (2)
    the budget cutoff runs as a window over that tiny frame (same
    two-level shape as x42's rank window); (3) whole bands at or
    above the cutoff are kept — band-atomic selection is what makes
    the result deterministic and join-free (the doc-level variant is
    one broadcast of the per-source thresholds back onto the scan).
    Budgets are per-source constants here; a real mix table is a
    <=thousands-row broadcast, never a shuffle side.
    Output is integer-only (doc/token counts, budget, threshold band)
    for a stable oracle hash."""
    d = _t(spark, sf_dir, "documents")
    budget = (
        F.lit(800)
        + F.lit(100)
        * (F.expr("substring(source, 4)").cast("long") % 4)
    ).cast("long")
    bands = (
        d.select(
            "source",
            F.least(F.col("n_chars"), F.lit(100000)).alias("band"),
            F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        )
        .groupBy("source", "band")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("tok"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("band").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bands.withColumn("cum_tok", F.sum("tok").over(w)).withColumn(
        "budget", budget
    )
    return (
        cum.filter(F.col("cum_tok") <= F.col("budget"))
        .groupBy("source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs_kept"),
            F.sum("tok").cast("long").alias("n_tokens_kept"),
            F.min("budget").cast("long").alias("budget_tokens"),
            F.min("band").cast("long").alias("min_band_kept"),
        )
        .orderBy("source")
    )


def token_budget_select(
    docs: DataFrame,
    budgets: DataFrame,
    *,
    band_col: str = "band",
    token_col: str = "n_tok",
    source_col: str = "source",
) -> DataFrame:
    """Doc-level companion to x44's histogram-threshold mix: return
    the SELECTED documents (every input column) for per-source token
    ``budgets`` (columns: source, budget_tokens), using the same
    band-atomic semantics — whole quality bands are taken best-first
    while the source's cumulative tokens stay within budget.

    Scale shape: the corpus is touched exactly TWICE and never sorted
    per-source at document granularity — (1) one algebraic groupBy
    collapses it to (source, band) token histograms; (2) the budget
    cutoff runs as a window over that tiny frame joined to the
    broadcast ``budgets`` (a real mix table is <= thousands of rows);
    (3) the per-source minimum kept band — a SOURCES-row frame — is
    broadcast back onto the corpus scan as a `band >= threshold`
    semi-filter. No per-doc window, no skew funnel, no shuffle of the
    corpus at all: the only corpus-wide operations are the map-side
    partial aggregate and the final broadcast-join filter."""
    # Budgets contract (r15, ADVICE): a user-supplied mix table with
    # duplicate source rows would run the cumulative window over
    # duplicated band rows and silently mis-compute every threshold —
    # fail loudly instead (it is a spec error in the mix, not data
    # skew to tolerate). Extra columns are dropped so a stray column
    # named like band/tok can never collide into the window frame.
    # Both checks are metadata-sized: the mix table is <= thousands
    # of rows by contract.
    if "budget_tokens" not in budgets.columns:
        raise ValueError(
            "budgets must carry a 'budget_tokens' column; got "
            f"{budgets.columns}"
        )
    budgets = budgets.select(source_col, "budget_tokens")
    dup = (
        budgets.groupBy(source_col).count().filter(F.col("count") > 1)
        .limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"budgets has duplicate rows for source "
            f"{dup[0][source_col]!r}; one budget per source"
        )
    bands = (
        docs.select(source_col, band_col, token_col)
        .groupBy(source_col, band_col)
        .agg(F.sum(token_col).alias("tok"))
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.col(band_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    thresholds = (
        bands.join(F.broadcast(budgets), source_col)
        .withColumn("cum_tok", F.sum("tok").over(w))
        .filter(F.col("cum_tok") <= F.col("budget_tokens"))
        .groupBy(source_col)
        .agg(F.min(band_col).alias("_min_band_kept"))
    )
    return docs.join(F.broadcast(thresholds), source_col).filter(
        F.col(band_col) >= F.col("_min_band_kept")
    ).drop("_min_band_kept")
