"""Corpus-curation operators (round-2, second batch): BPE-style
pre-tokenization statistics, int8 embedding quantization,
incremental-batch dedup against an existing corpus, and cross-document
duplicate-trigram coverage — the remaining pieces of a production
training-data pipeline (tokenizer prep, vector compaction, daily-crawl
ingest dedup, exact-substring-dedup triage).

Registered AFTER the driver's ~50-entry correctness window on purpose
(see queries/__init__.py): the window stays aimed at this round's
changed families; these four are hash-checked by tools/selfcheck.py
and tests/test_oracle_parity.py instead.

Determinism: integer outputs wherever possible (quantized levels,
counts, milli-scaled floors); the only floats are ROUND()ed ratios of
exact BIGINT sums, and all per-element arithmetic casts FLOAT->DOUBLE
first so Spark and DuckDB fold identical IEEE doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgshovel_spark.functions.textfns import norm_text, tokens
from pgshovel_spark.sources.tables import load_table


def _docs_parallel(spark, sf_dir):
    """documents spread across cores before tokenize/explode work (the
    single-file fixture scans as one task otherwise; no-op at scale)."""
    d = load_table(spark, sf_dir, "documents")
    return d.repartition(spark.sparkContext.defaultParallelism, "doc_id")


# ------------------------------------------------- BPE pre-tokenization

#: GPT-2-style pre-tokenizer, restricted to constructs Java regex and
#: RE2 (DuckDB) treat identically: leftmost-first alternation, greedy
#: classes, no lookaround (RE2 has none).  Contraction suffixes split
#: first, then space-prefixed letter runs / digit runs / punctuation
#: runs.  Whitespace itself is never emitted as a piece.
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def q_text_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language pre-tokenizer statistics: piece count, distinct
    pieces (the BPE alphabet-size driver), pieces per doc, mean piece
    length — the corpus pass a tokenizer trainer runs first.

    Scale shape: regexp_extract_all + explode are map-side inside the
    scan task; the shuffle carries (lang, piece-hash-sized) rows into
    one partial+final agg per lang.  Distinct-piece counting uses the
    exact two-level aggregate Spark plans for countDistinct (partial
    distinct inside the map task), not a global collect.
    """
    d = _docs_parallel(spark, sf_dir)
    pieces = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PAT), F.lit(0))
        ).alias("piece"),
    )
    return (
        pieces.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pieces"),
            F.countDistinct("piece").alias("n_distinct_pieces"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(F.length("piece")).alias("piece_chars"),
        )
        .select(
            "lang",
            "n_pieces",
            "n_distinct_pieces",
            "n_docs",
            F.round(F.col("n_pieces") / F.col("n_docs"), 2).alias("pieces_per_doc"),
            F.round(F.col("piece_chars") / F.col("n_pieces"), 4).alias("avg_piece_len"),
        )
    )


# DuckDB RE2: '' escapes the quote; \s inside a standard (non-E'')
# string is passed through verbatim to the regex engine.
_BPE_PRETOKENIZE_SQL = r"""
WITH p AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text),
                '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+'))
           AS piece
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_pieces,
       COUNT(DISTINCT piece) AS n_distinct_pieces,
       COUNT(DISTINCT doc_id) AS n_docs,
       ROUND(COUNT(*) / CAST(COUNT(DISTINCT doc_id) AS DOUBLE), 2)
         AS pieces_per_doc,
       ROUND(SUM(length(piece)) / CAST(COUNT(*) AS DOUBLE), 4)
         AS avg_piece_len
FROM p
GROUP BY lang
"""


# ------------------------------------------------- int8 quantization


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of every embedding: per-vector scale
    = max|x|/127, levels q_i = round(x_i*127/max|x|) — the compaction
    step before shipping vectors to an ANN index.  Emits integer-only
    per-vector stats (scale in milli-units, L1 mass of levels, zeroed
    and saturated dims) so the hash check is exact.

    Scale shape: pure per-row higher-order expressions (transform /
    aggregate / filter) — no shuffle at all; whole-stage codegen keeps
    it JVM-side.  FLOAT widens to DOUBLE before any arithmetic so both
    engines fold identical IEEE values.
    """
    e = load_table(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda x: x.cast("double"))
    e = e.select(
        "vec_id",
        "label",
        xd.alias("xd"),
        F.array_max(F.transform(xd, F.abs)).alias("maxabs"),
    )
    q = F.transform(
        "xd",
        lambda x: F.when(F.col("maxabs") == 0.0, F.lit(0).cast("long")).otherwise(
            F.round(x * F.lit(127.0) / F.col("maxabs"), 0).cast("long")
        ),
    )
    e = e.select("vec_id", "label", "maxabs", q.alias("q"))
    zero = F.lit(0).cast("long")
    return e.select(
        "vec_id",
        "label",
        F.size("q").alias("dims"),
        F.floor(F.col("maxabs") * 1000).cast("long").alias("scale_milli"),
        F.aggregate("q", zero, lambda a, x: a + F.abs(x)).alias("q_l1"),
        F.size(F.filter("q", lambda x: x == 0)).alias("n_zero"),
        F.size(F.filter("q", lambda x: F.abs(x) == 127)).alias("n_sat"),
    )


_EMBED_QUANTIZE_SQL = """
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS xd,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS maxabs
  FROM embeddings
), lv AS (
  SELECT vec_id, label, maxabs,
         list_transform(xd, x -> CASE WHEN maxabs = 0 THEN CAST(0 AS BIGINT)
           ELSE CAST(round(x * 127 / maxabs, 0) AS BIGINT) END) AS q,
         len(xd) AS dims
  FROM v
)
SELECT vec_id, label, dims,
       CAST(floor(maxabs * 1000) AS BIGINT) AS scale_milli,
       CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
       len(list_filter(q, x -> x = 0)) AS n_zero,
       len(list_filter(q, x -> abs(x) = 127)) AS n_sat
FROM lv
"""


# --------------------------------------------- incremental batch dedup


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: a deterministic 20% slice of the
    corpus (doc_id % 5 = 0) plays the role of today's crawl batch; the
    other 80% is the already-ingested corpus.  Every batch doc is
    flagged against BOTH the corpus (is_corpus_dup + the surviving
    dup_of id) and the batch itself (is_batch_dup: an earlier batch doc
    has the same normalized text) — the exact decision table a daily
    ingest job needs.

    Scale shape: the corpus side reduces to (xxhash64(norm), min id)
    16-byte fingerprint rows before the join — the incremental-dedup
    state table you would persist between runs; the batch side is one
    groupBy over the (small) batch.  Both joins are plain equi-joins on
    the 8-byte hash, never on document text (same documented ~1e-8
    collision trade as q_dedup_exact; the oracle joins raw normalized
    strings).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.xxhash64(norm_text("text")).alias("h")
    )
    batch = d.filter(F.col("doc_id") % 5 == 0)
    corpus = (
        d.filter(F.col("doc_id") % 5 != 0)
        .groupBy("h")
        .agg(F.min("doc_id").alias("dup_of"))
    )
    keeper = batch.groupBy("h").agg(F.min("doc_id").alias("batch_keeper"))
    return (
        batch.join(corpus, "h", "left")
        .join(keeper, "h", "inner")
        .select(
            "doc_id",
            F.col("dup_of").isNotNull().cast("int").alias("is_corpus_dup"),
            "dup_of",
            (F.col("doc_id") > F.col("batch_keeper")).cast("int").alias("is_batch_dup"),
        )
    )


_DEDUP_INCREMENTAL_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
  FROM documents
), corpus AS (
  SELECT norm, MIN(doc_id) AS dup_of FROM d WHERE doc_id % 5 <> 0 GROUP BY norm
), batch AS (
  SELECT doc_id, norm FROM d WHERE doc_id % 5 = 0
), keeper AS (
  SELECT norm, MIN(doc_id) AS batch_keeper FROM batch GROUP BY norm
)
SELECT b.doc_id,
       CAST(c.dup_of IS NOT NULL AS INT) AS is_corpus_dup,
       c.dup_of,
       CAST(b.doc_id > k.batch_keeper AS INT) AS is_batch_dup
FROM batch b
LEFT JOIN corpus c USING (norm)
JOIN keeper k USING (norm)
"""


# ------------------------------------- cross-doc duplicate-trigram coverage


def q_text_crossdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-corpus duplication coverage: the fraction of
    a doc's distinct trigrams that also occur in at least one OTHER
    same-language doc — the triage metric exact-substring dedup
    pipelines compute to pick which documents to suffix-array scan.
    Docs with fewer than 3 tokens have no trigrams and are excluded
    (both engines drop them in the explode/unnest).

    Scale shape: trigram enumeration + array_distinct are map-side;
    the shuffle carries (lang, trigram-hash, doc_id) distinct rows into
    a doc-frequency agg, then one equi-join on the 8-byte hash brings
    the frequency back to each (doc, trigram) row (the oracle joins raw
    strings — same collision trade as q_dedup_exact).  At 100 TB the
    doc-frequency table is the shared artifact q_text_decontaminate
    already builds; a real pipeline computes it once.
    """
    d = _docs_parallel(spark, sf_dir).select(
        "doc_id", "lang", F.filter(tokens("text"), lambda t: t != "").alias("a")
    )
    tri = F.expr(
        "transform(sequence(0, size(a)-3), i -> concat_ws(' ', a[i], a[i+1], a[i+2]))"
    )
    dt = d.filter(F.size("a") >= 3).select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(tri)).alias("tri"),
    )
    dt = dt.select("doc_id", "lang", F.xxhash64("lang", "tri").alias("th"))
    freq = dt.groupBy("th").agg(F.count(F.lit(1)).alias("tri_docs"))
    return (
        dt.join(freq, "th")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.sum((F.col("tri_docs") >= 2).cast("long")).alias("n_shared"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tri",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_tri"), 4).alias("shared_ratio"),
        )
    )


_TEXT_CROSSDUP_SQL = r"""
WITH d AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS a
  FROM documents
), dt AS (
  SELECT DISTINCT doc_id, lang, tri
  FROM (
    SELECT doc_id, lang,
           unnest(list_transform(generate_series(1, len(a)-2),
                  i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS tri
    FROM d WHERE len(a) >= 3
  )
), freq AS (
  SELECT lang, tri, COUNT(*) AS tri_docs FROM dt GROUP BY lang, tri
)
SELECT dt.doc_id, dt.lang,
       COUNT(*) AS n_tri,
       CAST(SUM(CASE WHEN f.tri_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       ROUND(SUM(CASE WHEN f.tri_docs >= 2 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS shared_ratio
FROM dt JOIN freq f ON dt.lang = f.lang AND dt.tri = f.tri
GROUP BY dt.doc_id, dt.lang
"""


QUERIES = {
    "q_text_bpe_pretokenize": q_text_bpe_pretokenize,
    "q_embed_quantize": q_embed_quantize,
    "q_dedup_incremental": q_dedup_incremental,
    "q_text_crossdup": q_text_crossdup,
}

ORACLES = {
    "q_text_bpe_pretokenize": _BPE_PRETOKENIZE_SQL,
    "q_embed_quantize": _EMBED_QUANTIZE_SQL,
    "q_dedup_incremental": _DEDUP_INCREMENTAL_SQL,
    "q_text_crossdup": _TEXT_CROSSDUP_SQL,
}
