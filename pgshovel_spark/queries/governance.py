"""Corpus-governance operators (round 6): blocklist scrubbing,
RAG-style chunking, and deterministic train/eval splitting — the
data-release side of a training-data pipeline (what runs between
curation and shipping a corpus).

All three are exact/deterministic by construction (integer arithmetic,
substring emission, multiplicative-hash buckets shared verbatim with
``q_sample_token_budget``), so each is a full H query with a DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgshovel_spark.functions.determinism import iratio
from pgshovel_spark.functions.textfns import tokens
from pgshovel_spark.queries.training import _KNUTH, _TOKS
from pgshovel_spark.functions.determinism import knuth_bucket
from pgshovel_spark.sources.tables import load_table

#: Blocklist for the scrub op: terms whose presence flags a document
#: for review/redaction.  (Fixture corpus is synthetic warehouse
#: vocabulary — in production this is the PII/unsafe-term lexicon; the
#: OPERATOR is term-set matching + redaction either way.)
_BLOCKLIST = ("customer", "secret", "query")

#: Flag threshold: docs with more than this many blocklisted token
#: occurrences get routed to the redaction path.
_FLAG_MIN = 5

#: Chunking geometry: fixed window of tokens with overlap (the
#: retrieval-indexing shape — stride < width so context never splits
#: across a hard boundary).
_CHUNK_W = 50
_CHUNK_STRIDE = 40


def q_text_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist scrub report per document: occurrence count, distinct
    blocklisted terms, review flag, and a redacted PREVIEW (first 80
    chars with blocklisted tokens replaced) — one map-side pass, no
    shuffle at all (the plan is scan -> project).

    Counting is token-exact (whitespace tokens equal to a blocklist
    term), not substring-based, so 'customers' never counts as
    'customer'; the preview redaction is the word-boundary regex both
    engines implement identically."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(tokens("text"), lambda t: t != "")
    hits = F.filter(toks, lambda t: t.isin(*_BLOCKLIST))
    pat = r"\b(" + "|".join(_BLOCKLIST) + r")\b"
    return d.select(
        "doc_id",
        "lang",
        F.size(hits).cast("long").alias("n_hits"),
        F.size(F.array_distinct(hits)).cast("long").alias("n_terms"),
        (F.size(hits) >= _FLAG_MIN).alias("flagged"),
        F.regexp_replace(
            F.substring(F.lower("text"), 1, 80), pat, "[X]"
        ).alias("preview_redacted"),
    )


_TEXT_BLOCKLIST_SQL = f"""
SELECT doc_id, lang,
       CAST(len(list_filter({_TOKS},
            x -> list_contains({list(_BLOCKLIST)}, x))) AS BIGINT) AS n_hits,
       CAST(len(list_distinct(list_filter({_TOKS},
            x -> list_contains({list(_BLOCKLIST)}, x)))) AS BIGINT) AS n_terms,
       len(list_filter({_TOKS},
            x -> list_contains({list(_BLOCKLIST)}, x))) >= {_FLAG_MIN} AS flagged,
       regexp_replace(substring(lower(text), 1, 80),
                      '\\b({"|".join(_BLOCKLIST)})\\b', '[X]', 'g')
         AS preview_redacted
FROM documents
"""


def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: overlapping {_CHUNK_W}-token
    windows at stride {_CHUNK_STRIDE}, one output row per chunk with
    its token span and boundary tokens (first/last) pinning content.

    Row-local end-to-end: the chunk index sequence and the token
    slices are array expressions inside the scan projection — the
    explode is the only row multiplier and there is NO shuffle.  At
    100 TB chunking is exactly this map-only pass writing back to
    storage."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(tokens("text"), lambda t: t != "")
    d = d.select("doc_id", "lang", toks.alias("a")).filter(F.size("a") >= 1)
    n = F.size("a")
    # chunk starts: 0, stride, 2*stride, ... while start < n
    n_chunks = F.floor((n - 1) / _CHUNK_STRIDE).cast("int") + 1
    d = d.select(
        "doc_id",
        "lang",
        "a",
        n.alias("n_toks"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_c"),
    )
    start = F.col("chunk_idx") * _CHUNK_STRIDE
    width = F.least(F.lit(_CHUNK_W), F.col("n_toks") - start)
    return d.select(
        "doc_id",
        "lang",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("tok_start"),
        width.cast("long").alias("n_chunk_toks"),
        F.element_at("a", start + 1).alias("first_tok"),
        F.element_at("a", start + width).alias("last_tok"),
    )


_TEXT_CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, {_TOKS} AS a FROM documents
), d AS (
  SELECT doc_id, lang, a, len(a) AS n_toks,
         CAST(FLOOR((len(a) - 1) / {_CHUNK_STRIDE}) AS INT) + 1 AS n_chunks
  FROM t WHERE len(a) >= 1
)
SELECT doc_id, lang,
       CAST(ci AS BIGINT) AS chunk_idx,
       CAST(ci * {_CHUNK_STRIDE} AS BIGINT) AS tok_start,
       CAST(LEAST({_CHUNK_W}, n_toks - ci * {_CHUNK_STRIDE}) AS BIGINT)
         AS n_chunk_toks,
       a[ci * {_CHUNK_STRIDE} + 1] AS first_tok,
       a[ci * {_CHUNK_STRIDE}
         + LEAST({_CHUNK_W}, n_toks - ci * {_CHUNK_STRIDE})] AS last_tok
FROM d, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS ci)
"""


#: train/val/test bucket bounds in permille over the Knuth bucket
#: (identical hash scheme as q_sample_token_budget — deterministic,
#: engine-independent, and stable as the corpus grows).
_SPLIT_TRAIN, _SPLIT_VAL = 900, 950


def q_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus split report: each doc lands in
    train/val/test by multiplicative hash of its id (bucket < 900 /
    < 950 / rest), and the report aggregates docs + token mass per
    (lang, split) with each split's share of the language's tokens —
    the leakage-proof split manifest shipped next to a training
    corpus.  One groupBy; the split assignment is a row-local integer
    expression."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(tokens("text"), lambda t: t != "")
    bucket = knuth_bucket("doc_id", 1000)
    split = (
        F.when(bucket < _SPLIT_TRAIN, F.lit("train"))
        .when(bucket < _SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per = d.select(
        "lang", split.alias("split"), F.size(toks).cast("long").alias("n_toks")
    ).groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )
    lang_tot = F.sum("n_tokens").over(Window.partitionBy("lang"))
    return per.select(
        "lang",
        "split",
        "n_docs",
        "n_tokens",
        iratio("n_tokens", lang_tot, 4).alias("token_share"),
    )


_SPLIT_TRAIN_EVAL_SQL = f"""
WITH d AS (
  SELECT lang,
         CASE
           WHEN ((doc_id % 2147483648) * {_KNUTH}) % 4294967296 % 1000
                < {_SPLIT_TRAIN} THEN 'train'
           WHEN ((doc_id % 2147483648) * {_KNUTH}) % 4294967296 % 1000
                < {_SPLIT_VAL} THEN 'val'
           ELSE 'test'
         END AS split,
         CAST(len({_TOKS}) AS BIGINT) AS n_toks
  FROM documents
), per AS (
  SELECT lang, split, COUNT(*) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens
  FROM d GROUP BY lang, split
)
SELECT lang, split, n_docs, n_tokens,
       CAST((n_tokens * 20000 + SUM(n_tokens) OVER (PARTITION BY lang))
            // (SUM(n_tokens) OVER (PARTITION BY lang) * 2) AS DOUBLE)
         / 10000.0 AS token_share
FROM per
"""


#: non-overlapping dedup-chunk width (tokens) — the "paragraph" unit
#: of the RefinedWeb/CCNet-style repeated-passage scrub, applied to
#: the fixture's flat token streams.
_DCHUNK_W = 25


def q_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level cross-document dedup triage (the paragraph-dedup
    report): split each doc into NON-overlapping {_DCHUNK_W}-token
    chunks, and per document report how many of its chunks also occur
    verbatim in at least one OTHER document — the metric that decides
    which docs enter a repeated-passage scrub.

    Engine plan: chunk strings are row-local array slices (the
    q_text_chunk machinery, no shuffle), reduced to 8-byte xxhash64
    keys before the two aggregates — chunk-frequency groupBy, then the
    h-keyed join back and a per-doc rollup (the q_text_crossdup
    shape one level up).  The oracle joins raw chunk STRINGS (same
    documented ~2^-64 collision trade as q_dedup_exact).

    Scale: chunk table is corpus-token-linear / {_DCHUNK_W}; both
    shuffles carry (8-byte hash, doc_id) rows; nothing quadratic —
    duplicate-chunk detection is frequency counting, never pairing.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(tokens("text"), lambda t: t != "")
    d = d.select("doc_id", toks.alias("a")).filter(F.size("a") >= 1)
    n = F.size("a")
    nch = F.floor((n - 1) / _DCHUNK_W).cast("int") + 1
    chunks = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), nch - 1),
                lambda i: F.array_join(
                    F.slice(F.col("a"), i * _DCHUNK_W + 1, _DCHUNK_W), " "
                ),
            )
        ).alias("chunk"),
    ).select("doc_id", F.xxhash64("chunk").alias("h"))
    # "occurs in at least one OTHER doc" needs only min != max of
    # doc_id within the chunk-hash group, so the frequency table folds
    # into two window aggregates over ONE h-partitioned shuffle — no
    # groupBy + join-back (which planned the tokenize+chunk scan twice
    # under DeduplicateRelations + the AQE stage-dedup miss;
    # tools/selfref_audit.py), and no windowed COUNT DISTINCT needed.
    wh = Window.partitionBy("h")
    dup = F.min("doc_id").over(wh) != F.max("doc_id").over(wh)
    return (
        chunks.select("doc_id", dup.alias("is_dup"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            iratio("n_dup_chunks", "n_chunks", 4).alias("dup_ratio"),
        )
    )


_DEDUP_CHUNKS_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS a FROM documents
), d AS (
  SELECT doc_id, a, CAST(FLOOR((len(a) - 1) / {_DCHUNK_W}) AS INT) + 1 AS nch
  FROM t WHERE len(a) >= 1
), chunks AS (
  SELECT doc_id,
         array_to_string(a[ci * {_DCHUNK_W} + 1 :
                           LEAST(len(a), (ci + 1) * {_DCHUNK_W})], ' ') AS chunk
  FROM d, LATERAL (SELECT unnest(generate_series(0, nch - 1)) AS ci)
), freq AS (
  SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY chunk
)
SELECT doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       CAST((SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 20000 + COUNT(*))
            // (COUNT(*) * 2) AS DOUBLE) / 10000.0 AS dup_ratio
FROM chunks JOIN freq USING (chunk)
GROUP BY doc_id
"""


QUERIES = {
    "q_text_blocklist": q_text_blocklist,
    "q_text_chunk": q_text_chunk,
    "q_split_train_eval": q_split_train_eval,
    "q_dedup_chunks": q_dedup_chunks,
}
ORACLES = {
    "q_text_blocklist": _TEXT_BLOCKLIST_SQL,
    "q_text_chunk": _TEXT_CHUNK_SQL,
    "q_split_train_eval": _SPLIT_TRAIN_EVAL_SQL,
    "q_dedup_chunks": _DEDUP_CHUNKS_SQL,
}
