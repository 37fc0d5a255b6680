"""Text-analysis operators over the documents corpus (SURVEY.md §2.G
plus the training-data-pipeline surface: language ID, quality scoring,
token counting, fingerprinting).

All tokenization is JVM-side (split/explode) — no Python in the hot
path.  At 100 TB the explode is map-side only; every aggregation
shuffles pre-reduced (token, count) pairs, not raw tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgshovel_spark.functions.textfns import norm_text, tokens
from pgshovel_spark.functions.determinism import KNUTH, knuth_bucket
from pgshovel_spark.operators.scratch import materialize
from pgshovel_spark.sources.tables import load_table, table_rowcount
from pgshovel_spark.sources.tables import docs_parallel as _docs_parallel


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: keep min(doc_id) per normalized
    form, emit survivors + group size.

    Shuffle-width reduction: the groupBy key is xxhash64(norm), so only
    (hash, len) 16-byte rows cross the wire instead of full document
    texts — THE difference between shuffling ~100 TB and ~2 TB on a real
    corpus.  The oracle groups by the raw normalized string; a same-key
    64-bit collision (~1e-8 at 1e5 docs, birthday bound) would merge two
    distinct groups — the same documented trade as q_sim_ngram's hashed
    shingle join.  No pre-repartition: norm+hash are codegen'd
    expressions computed inside the (parallel-at-scale) scan task.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.xxhash64(norm_text("text")).alias("h"),
            F.length(norm_text("text")).alias("norm_len"),
        )
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_dupes"),
            F.min("norm_len").alias("norm_len"),
        )
        .select("keeper_doc_id", "n_dupes", "norm_len")
    )


_DEDUP_EXACT_SQL = """
SELECT
  MIN(doc_id) AS keeper_doc_id,
  COUNT(*) AS n_dupes,
  CAST(length(norm) AS BIGINT) AS norm_len
FROM (
  SELECT doc_id, trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS norm
  FROM documents
)
GROUP BY norm
"""


def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic wordcount, top-20 under a total order (count DESC,
    word ASC)."""
    # Reuses the session-shared (lang, t, cnt) token-count artifact
    # (sketches._token_counts — built once per corpus, its own timed
    # bench row): per-word totals fold over the vocabulary-sized
    # parquet scan instead of re-tokenizing the corpus.  Identical
    # token multiset (same tokens() + non-empty filter), so the counts
    # are integer-identical.
    from pgshovel_spark.queries.sketches import _token_counts

    return (
        _token_counts(spark, sf_dir)
        .groupBy(F.col("t").alias("word"))
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


_TEXT_WORDCOUNT_SQL = """
SELECT word, COUNT(*) AS n
FROM (
  SELECT unnest(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word ASC
LIMIT 20
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per language (n_chars is integer -> exact avg).
    No tokenization here, so the plain (single-task) scan is cheapest."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("n_chars").cast("double") / F.count("n_chars"), 2).alias(
            "avg_chars"
        ),
        F.countDistinct("source").alias("n_sources"),
    )


_TEXT_STATS_SQL = """
SELECT
  lang,
  COUNT(*) AS n_docs,
  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars), 2) AS avg_chars,
  COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
"""


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF, top term per document.

    tf = term_count / doc_len (exact integer division in double),
    idf = ln(N / df); winner per doc by (tfidf DESC, term ASC).

    Plan shape (round 8, 7 -> 5 jobs): term_counts aggregates on the
    doc_id clustering _docs_parallel already provides (groupBy on a
    SUPERSET of the partition keys needs no exchange), the
    document-frequency table is a vocabulary-bounded BROADCAST
    aggregate joined back onto the still-doc_id-clustered counts (the
    q_sim_jaccard_prefix dfreq precedent — replaces the old window-
    over-term, which round-tripped the posting table term -> doc_id
    through two exchanges), and both doc_id windows (doc length, top-1
    rank) then run exchange-free.  N comes from catalog statistics
    (table_rowcount — parquet footer, constant-folded literal), not a
    broadcast 1-row aggregate.  A web-scale vocabulary that outgrows
    the broadcast limit drops the hint and AQE falls back to a shuffle
    join on runtime sizes.
    """
    d = _docs_parallel(spark, sf_dir)
    tok = d.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    # term_counts is SELF-REFERENCED (the df broadcast derives from it
    # and joins back), which AQE re-plans as two whole subtrees after
    # DeduplicateRelations — two corpus scans, two tokenize passes
    # (plan-measured; EXPERIMENTS.md round 8).  Lazily cached: the
    # consumers are strictly sequential (the probe waits on the df
    # broadcast), so the build populates with no race and the corpus
    # is tokenized once.  Posting-table-sized with disk spill — the
    # same bound as the jaccard family's kept cache.
    term_counts = materialize(
        tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tc"))
    )
    n_docs = float(table_rowcount(sf_dir, "documents"))
    df_tab = term_counts.groupBy(F.col("term").alias("dft")).agg(
        F.count(F.lit(1)).alias("df")
    )
    w_doc = Window.partitionBy("doc_id")
    scored = (
        term_counts.join(F.broadcast(df_tab), F.col("term") == F.col("dft"))
        .select(
            "doc_id",
            "term",
            (
                (F.col("tc").cast("double") / F.sum("tc").over(w_doc))
                * F.log(F.lit(n_docs) / F.col("df"))
            ).alias("tfidf_raw"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_raw").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("tfidf_raw", 4).alias("tfidf"))
    )


_TEXT_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS term
  FROM documents
), tok2 AS (
  SELECT * FROM tok WHERE term <> ''
), term_counts AS (
  SELECT doc_id, term, COUNT(*) AS tc FROM tok2 GROUP BY doc_id, term
), doc_lens AS (
  SELECT doc_id, COUNT(*) AS doc_len FROM tok2 GROUP BY doc_id
), df_counts AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM term_counts GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tc.doc_id, tc.term,
         (CAST(tc.tc AS DOUBLE) / dl.doc_len)
           * LN(CAST((SELECT n_docs FROM n) AS DOUBLE) / dfc.df) AS tfidf_raw
  FROM term_counts tc
  JOIN doc_lens dl ON tc.doc_id = dl.doc_id
  JOIN df_counts dfc ON tc.term = dfc.term
)
SELECT doc_id, term AS top_term, ROUND(tfidf_raw, 4) AS tfidf
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_raw DESC, term ASC) AS rn
  FROM scored
)
WHERE rn = 1
"""


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per document: whitespace tokens plus a BPE-ish
    proxy (ceil of chars/4 over non-space chars) — the standard quick
    estimate for LLM token budgeting."""
    d = _docs_parallel(spark, sf_dir)
    n_ws = F.size(F.filter(tokens("text"), lambda t: t != ""))
    n_nonspace = F.length(F.regexp_replace("text", r"\s+", ""))
    return d.select(
        "doc_id",
        "lang",
        n_ws.cast("long").alias("n_tokens_ws"),
        F.ceil(n_nonspace / F.lit(4.0)).cast("long").alias("n_tokens_bpe_est"),
        (n_nonspace.cast("double") / n_ws).alias("raw_ratio"),
    ).select(
        "doc_id",
        "lang",
        "n_tokens_ws",
        "n_tokens_bpe_est",
        F.round("raw_ratio", 4).alias("chars_per_token"),
    )


_TEXT_TOKENS_SQL = """
SELECT
  doc_id,
  lang,
  CAST(len(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')) AS BIGINT) AS n_tokens_ws,
  CAST(CEIL(length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) / 4.0) AS BIGINT) AS n_tokens_bpe_est,
  ROUND(CAST(length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) AS DOUBLE)
        / len(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')), 4) AS chars_per_token
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length, mean word length, stopword
    ratio, unique-token ratio — the standard cheap filters applied
    before expensive model-based scoring in a training-data pipeline."""
    d = _docs_parallel(spark, sf_dir)
    toks = F.filter(tokens("text"), lambda t: t != "")
    stop = F.array(*[F.lit(s) for s in ("the", "a", "of", "and", "to", "in", "is")])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_uniq = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        "lang",
        n_tok.cast("long").alias("n_tokens"),
        F.round(F.col("n_chars").cast("double") / n_tok, 4).alias("mean_word_len"),
        F.round(n_stop.cast("double") / n_tok, 4).alias("stopword_ratio"),
        F.round(n_uniq.cast("double") / n_tok, 4).alias("unique_ratio"),
        (
            (n_tok >= 10) & (n_uniq.cast("double") / n_tok > 0.3)
        ).alias("passes_quality"),
    )


_TEXT_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, lang, n_chars,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS toks
  FROM documents
)
SELECT
  doc_id,
  lang,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  ROUND(CAST(n_chars AS DOUBLE) / len(toks), 4) AS mean_word_len,
  ROUND(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        / len(toks), 4) AS stopword_ratio,
  ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS unique_ratio,
  len(toks) >= 10 AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.3 AS passes_quality
FROM t
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID from marker-token hits (deterministic
    CASE logic — a stand-in for n-gram models, exercising the same
    plan shape: per-doc token-set membership tests).  Emits predicted
    vs labeled lang + agreement flag."""
    d = _docs_parallel(spark, sf_dir)
    toks = F.array_distinct(F.filter(tokens("text"), lambda t: t != ""))
    markers = {
        "en": ("the", "and", "of"),
        "de": ("der", "und", "die"),
        "es": ("el", "los", "que"),
        "fr": ("le", "les", "et"),
    }
    hits = {
        lang: F.size(
            F.filter(toks, lambda t: F.array_contains(F.array(*[F.lit(m) for m in ms]), t))
        )
        for lang, ms in markers.items()
    }
    pred = (
        F.when(hits["en"] >= 2, "en")
        .when(hits["de"] >= 2, "de")
        .when(hits["es"] >= 2, "es")
        .when(hits["fr"] >= 2, "fr")
        .otherwise("unknown")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("agree"),
    )


_TEXT_LANGID_SQL = """
WITH t AS (
  SELECT doc_id, lang,
         list_distinct(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) AS toks
  FROM documents
), scored AS (
  SELECT doc_id, lang,
    CASE WHEN len(list_filter(toks, x -> x IN ('the','and','of'))) >= 2 THEN 'en'
         WHEN len(list_filter(toks, x -> x IN ('der','und','die'))) >= 2 THEN 'de'
         WHEN len(list_filter(toks, x -> x IN ('el','los','que'))) >= 2 THEN 'es'
         WHEN len(list_filter(toks, x -> x IN ('le','les','et'))) >= 2 THEN 'fr'
         ELSE 'unknown' END AS predicted_lang
  FROM t
)
SELECT doc_id, lang AS labeled_lang, predicted_lang, predicted_lang = lang AS agree
FROM scored
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: order-insensitive 64-bit-ish signature
    = sum over distinct tokens of a polynomial token hash, mod 2^31-1.
    Same integer arithmetic on both engines => hash-checkable; the
    plan shape (explode -> per-token scalar hash -> per-doc sum) is
    identical to a real rolling-hash fingerprint at scale."""
    # Round 13 A/B kept THIS form: consuming the shared tok_distinct
    # posting artifact instead was measured SLOWER (0.42-0.91 s vs
    # 0.23-0.43 s solo) — the artifact scan is not doc_id-clustered,
    # so the per-doc aggregate pays a posting-table exchange, while
    # this form aggregates exchange-free on the doc_id clustering
    # _docs_parallel already provides (groupBy on a superset of the
    # partition keys) and tokenizes in the same stage.
    d = _docs_parallel(spark, sf_dir)
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("t")
    ).filter(F.col("t") != "")
    # token hash: len*31 + ascii(first)*17 + ascii(last)*7 (+ len^2)
    th = (
        F.length("t") * 31
        + F.ascii(F.substring("t", 1, 1)) * 17
        + F.ascii(F.substring("t", -1, 1)) * 7
        + F.length("t") * F.length("t")
    ).cast("long")
    return tok.select("doc_id", th.alias("th")).groupBy("doc_id").agg(
        (F.sum("th").cast("long") % 2147483647).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
    )


_TEXT_FINGERPRINT_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
           string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> ''))) AS t
  FROM documents
)
SELECT doc_id,
       CAST(SUM(CAST(length(t) * 31
                + ascii(substring(t, 1, 1)) * 17
                + ascii(substring(t, -1, 1)) * 7
                + length(t) * length(t) AS BIGINT)) AS BIGINT) % 2147483647 AS fingerprint,
       COUNT(*) AS n_distinct_tokens
FROM tok
GROUP BY doc_id
"""


def q_text_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token span annotation via a real Spark 4 Python UDTF: each doc
    expands to (token_idx, token, start_off, end_off) rows with exact
    character offsets — the table-function shape used for span-level
    labeling (NER pre-annotation, quality-span extraction) in training
    -data pipelines.

    A UDTF (not explode) because offsets need a running scan of the raw
    string — a genuinely one-to-many generator per row.  Arrow-batched
    (``useArrow``) so rows cross the Python boundary in columnar
    batches.  Capped to doc_id % 10 == 0 to bound the Python-side work
    in the bench; the operator itself streams per-partition and scales
    with executors.
    """
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "token_idx bigint, token string, start_off bigint, end_off bigint"
        ),
        useArrow=True,
    )
    class TokenSpans:
        def __init__(self):  # heavyweight init once per task (guide §4.5),
            import re  # not per row: eval() runs per input row

            self._find = re.compile(r"\S+").finditer

        def eval(self, doc_id, text):  # noqa: ANN001 — Spark-inferred
            for i, m in enumerate(self._find(text or ""), start=1):
                yield i, m.group(0).lower(), m.start(), m.end()

    import uuid

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    # unique per-call names: a fixed view/function name is session-global
    # state, and a concurrent caller would silently swap the input out
    # from under this (lazily evaluated) DataFrame
    tag = uuid.uuid4().hex[:12]
    view, fn = f"__docs_for_spans_{tag}", f"token_spans_{tag}"
    d.createOrReplaceTempView(view)
    spark.udtf.register(fn, TokenSpans)
    out = spark.sql(
        f"""
        SELECT d.doc_id, s.token_idx, s.token, s.start_off, s.end_off
        FROM {view} d,
             LATERAL {fn}(d.doc_id, d.text) s
        """
    )
    # spark.sql analyzes EAGERLY, so the names are already bound into
    # the plan — drop them now or every invocation leaks one temp view
    # + one temp function into the session catalog
    spark.catalog.dropTempView(view)
    spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {fn}")
    return out


#: The fixture text is single-space separated, so offsets follow from a
#: running sum of token lengths + separators; the UDTF computes them by
#: scanning the raw string, which agrees on any whitespace layout the
#: cumulative form can also express.
_TEXT_TOKEN_SPANS_SQL = """
WITH tok AS (
  SELECT doc_id, i, arr[i] AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS arr
        FROM documents WHERE doc_id % 10 = 0),
       LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) t
)
SELECT doc_id,
       CAST(i AS BIGINT) AS token_idx,
       lower(token) AS token,
       CAST(COALESCE(SUM(length(token) + 1) OVER (
         PARTITION BY doc_id ORDER BY i
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS start_off,
       CAST(COALESCE(SUM(length(token) + 1) OVER (
         PARTITION BY doc_id ORDER BY i
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + length(token) AS BIGINT) AS end_off
FROM tok
"""


#: per-language keep-rates (percent) for the stratified sample — the
#: "rebalance the corpus mix" step of training-data curation.
_SAMPLE_RATES = {"en": 50, "de": 30, "fr": 30}
_SAMPLE_DEFAULT_RATE = 10
_KNUTH = KNUTH  # canonical constant lives in functions/determinism.py


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified (per-language) downsampling.

    Sampling at 100 TB must be reproducible and shuffle-free: a keyed
    HASH THRESHOLD (Knuth multiplicative hash of doc_id, bucket 0-99 <
    stratum rate) decides membership row-locally — no orderBy, no
    rand(), re-runs and retried tasks agree.  The hash is explicit
    BIGINT arithmetic, identical in the oracle SQL, so the sample is
    hash-checked exactly (engine-native hash/rand functions would force
    a rows-only check).
    """
    d = load_table(spark, sf_dir, "documents")
    # doc_id is reduced mod 2^31 BEFORE the multiply so the product
    # stays under 2^63 for ANY 64-bit id (otherwise ANSI mode throws
    # ARITHMETIC_OVERFLOW at exactly the id ranges a 100 TB corpus has).
    bucket = knuth_bucket("doc_id", 100)
    rate = F.lit(_SAMPLE_DEFAULT_RATE)
    for lang, r in sorted(_SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            bucket.cast("long").alias("h_bucket"),
            rate.cast("long").alias("keep_rate"),
        )
        .filter(F.col("h_bucket") < F.col("keep_rate"))
    )


_SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source, h_bucket, keep_rate
FROM (
  SELECT doc_id, lang, source,
         CAST(((doc_id % 2147483648) * {_KNUTH}) % 4294967296 % 100 AS BIGINT) AS h_bucket,
         CAST(CASE lang
                WHEN 'en' THEN 50 WHEN 'de' THEN 30 WHEN 'fr' THEN 30
                ELSE 10 END AS BIGINT) AS keep_rate
  FROM documents
)
WHERE h_bucket < keep_rate
"""


def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (bits/char) — the
    gibberish/boilerplate quality signal (low entropy = repeated
    filler, high = random noise; used alongside the Gopher-style
    ratio filters in q_text_quality).

    H = log(n)/log2 - (sum c*log c)/(n*log2) over per-char counts c.

    Determinism: the per-doc char counts are exact integers; the
    floating sum Σ c*ln(c) is computed as a SEQUENTIAL LEFT FOLD over
    the SORTED count array (Spark ``aggregate`` over ``sort_array``,
    DuckDB ``list_reduce`` over ``list_sort``) — identical operand
    order, hence identical doubles, where a plain SUM() aggregate
    would be partial-aggregation-order-dependent.  The ln itself
    follows q_text_tfidf's cross-engine log precedent (rounded 4dp).

    Scale shape: explode chars -> (doc, char) count -> per-doc fold;
    two map-side-combining shuffles on doc_id, all row-local after.
    """
    d = _docs_parallel(spark, sf_dir)
    chars = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("distinct_chars"),
        F.sort_array(F.collect_list("cnt")).alias("arr"),
    )
    ln2 = F.lit(0.6931471805599453)
    fold = F.aggregate(
        "arr",
        F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log(c.cast("double")),
    )
    return per_doc.select(
        "doc_id",
        F.col("n").cast("long").alias("n_chars_counted"),
        "distinct_chars",
        F.round(
            F.log(F.col("n").cast("double")) / ln2
            - fold / (F.col("n").cast("double") * ln2),
            4,
        ).alias("entropy_bits"),
    )


_TEXT_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
), counts AS (
  SELECT doc_id, ch, COUNT(*) AS cnt FROM chars WHERE ch <> ''
  GROUP BY doc_id, ch
), per_doc AS (
  SELECT doc_id,
         SUM(cnt) AS n,
         COUNT(*) AS distinct_chars,
         list_sort(list(cnt)) AS arr
  FROM counts GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_chars_counted,
       distinct_chars,
       ROUND(ln(CAST(n AS DOUBLE)) / 0.6931471805599453
             - list_reduce(list_transform(arr,
                 c -> CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))), (a, b) -> a + b)
               / (CAST(n AS DOUBLE) * 0.6931471805599453),
             4) AS entropy_bits
FROM per_doc
"""


def q_text_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary-richness report: type count, token
    mass, hapax legomena (types occurring exactly once), hapax share
    of the vocabulary, and type-token ratio — the corpus-linguistics
    health panel (a bot-flooded or template-heavy crawl collapses TTR
    and hapax share; natural text holds them up).  Complements
    q_text_zipf's corpus-wide octave spectrum with the per-language
    split quality dashboards segment by.

    Scale: one (lang, token) aggregate (map-side combined — shuffle is
    vocabulary-sized, not token-sized) then a #langs-row aggregate;
    ratios in exact integer arithmetic (iratio).
    """
    from pgshovel_spark.functions.determinism import iratio

    # The (lang, t, cnt) vocabulary table IS the session-shared
    # token-count artifact (sketches._token_counts, one tokenize pass
    # per corpus billed to its own bench row) — consume it instead of
    # re-deriving it with a second corpus tokenize + explode + shuffle.
    from pgshovel_spark.queries.sketches import _token_counts

    vocab = _token_counts(spark, sf_dir)
    return (
        vocab.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("cnt").alias("n_tokens"),
            F.sum((F.col("cnt") == 1).cast("long")).alias("n_hapax"),
        )
        .select(
            "lang",
            "n_types",
            "n_tokens",
            "n_hapax",
            iratio("n_hapax", "n_types", 4).alias("hapax_share"),
            iratio("n_types", "n_tokens", 4).alias("type_token_ratio"),
        )
    )


_TEXT_HAPAX_SQL = r"""
WITH tok AS (
  SELECT lang, unnest(list_filter(
           string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
           x -> x <> '')) AS t
  FROM documents
), vocab AS (
  SELECT lang, t, COUNT(*) AS cnt FROM tok GROUP BY lang, t
)
SELECT lang,
       COUNT(*) AS n_types,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST((SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 20000 + COUNT(*))
            // (COUNT(*) * 2) AS DOUBLE) / 10000.0 AS hapax_share,
       CAST((COUNT(*) * 20000 + SUM(cnt)) // (SUM(cnt) * 2) AS DOUBLE)
         / 10000.0 AS type_token_ratio
FROM vocab
GROUP BY lang
"""


QUERIES = {
    "q_text_hapax": q_text_hapax,
    "q_dedup_exact": q_dedup_exact,
    "q_text_entropy": q_text_entropy,
    "q_text_wordcount": q_text_wordcount,
    "q_text_stats": q_text_stats,
    "q_text_tfidf": q_text_tfidf,
    "q_text_tokens": q_text_tokens,
    "q_text_quality": q_text_quality,
    "q_text_langid": q_text_langid,
    "q_text_fingerprint": q_text_fingerprint,
    "q_text_token_spans": q_text_token_spans,
    "q_sample_stratified": q_sample_stratified,
}

ORACLES = {
    "q_text_hapax": _TEXT_HAPAX_SQL,
    "q_dedup_exact": _DEDUP_EXACT_SQL,
    "q_text_entropy": _TEXT_ENTROPY_SQL,
    "q_text_wordcount": _TEXT_WORDCOUNT_SQL,
    "q_text_stats": _TEXT_STATS_SQL,
    "q_text_tfidf": _TEXT_TFIDF_SQL,
    "q_text_tokens": _TEXT_TOKENS_SQL,
    "q_text_quality": _TEXT_QUALITY_SQL,
    "q_text_langid": _TEXT_LANGID_SQL,
    "q_text_fingerprint": _TEXT_FINGERPRINT_SQL,
    "q_text_token_spans": _TEXT_TOKEN_SPANS_SQL,
    "q_sample_stratified": _SAMPLE_STRATIFIED_SQL,
}
