"""Invariant tests for the training-data curation operators
(queries/training.py) — the oracle-parity hash gate proves the values;
these pin the *semantics* (conservation laws, bounds, exclusions) and
the plan properties that must survive a 100x scale-up.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import training

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pack_sequences_contiguous(spark):
    """Per language: docs tile the token stream with no gaps/overlaps,
    and chunk ids are consistent with the 2048 capacity."""
    pdf = (
        training.q_pack_sequences(spark, SF)
        .toPandas()
        .sort_values(["lang", "doc_id"])
    )
    for _, g in pdf.groupby("lang"):
        expect = 0
        for row in g.itertuples():
            assert row.start_off == expect, "gap/overlap in packed stream"
            expect = row.start_off + row.n_tokens
            assert row.first_chunk == row.start_off // 2048
            assert row.last_chunk == (row.start_off + row.n_tokens - 1) // 2048
            assert row.n_chunks == row.last_chunk - row.first_chunk + 1 >= 1


def test_repetition_bounds_and_locality(spark):
    df = training.q_text_repetition(spark, SF)
    pdf = df.toPandas()
    assert (pdf.n_unique_trigrams <= pdf.n_trigrams).all()
    assert ((pdf.dup_ratio >= 0) & (pdf.dup_ratio <= 1)).all()
    # row-local op: the only exchange is _docs_toks' deliberate
    # REPARTITION_BY_NUM spread of the single-file fixture scan; the
    # trigram stats themselves demand no shuffle (no
    # ENSURE_REQUIREMENTS exchange), aggregation, or join
    plan = _plan(df)
    assert "ENSURE_REQUIREMENTS" not in plan
    assert "HashAggregate" not in plan and "Join" not in plan


def test_rhp_bucket_sizes_consistent(spark):
    pdf = training.q_dedup_rhp(spark, SF).toPandas()
    assert ((pdf.sig >= 0) & (pdf.sig < 2**16)).all()
    sizes = pdf.groupby("sig")["vec_id"].count()
    for row in pdf.itertuples():
        assert row.bucket_size == sizes[row.sig]


def test_rhp_same_vector_same_bucket(spark):
    """Identical embeddings must collide (the property LSH dedup
    relies on): check via duplicated signatures of self-pairs."""
    pdf = training.q_dedup_rhp(spark, SF).toPandas()
    # deterministic: re-running yields identical signatures
    pdf2 = training.q_dedup_rhp(spark, SF).toPandas()
    m = pdf.set_index("vec_id").sig
    m2 = pdf2.set_index("vec_id").sig
    assert (m.sort_index() == m2.sort_index()).all()


def test_decontaminate_excludes_eval_and_bounds(spark):
    df = training.q_text_decontaminate(spark, SF)
    pdf = df.toPandas()
    assert (pdf.n_shared <= pdf.n_shingles).all()
    # the held-out slice itself never appears as a training doc
    from pgshovel_spark.sources.tables import load_table

    ev_ids = {
        r.doc_id
        for r in load_table(spark, SF, "documents")
        .filter("source = 'src0'")
        .select("doc_id")
        .collect()
    }
    assert not (set(pdf.doc_id) & ev_ids)
    # eval shingle set is broadcast: membership probe must not shuffle
    # the training side on the join key
    assert "BroadcastHashJoin" in _plan(df)


def test_pmi_min_count(spark):
    pdf = training.q_text_ngram_pmi(spark, SF).toPandas()
    assert (pdf.c_xy >= 5).all()
    assert len(pdf) > 0


def test_token_budget_rates_and_mix(spark):
    """Budget sampling: rates bounded, every weighted lang present,
    realized token mass per lang <= its full mass, and the summed
    realized tokens land at or under ~the budget (hash sampling is
    only rate-exact in expectation, so allow slack above, none of the
    invariants below are statistical)."""
    from pgshovel_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    pdf = training.q_sample_token_budget(spark, SF).toPandas()
    assert set(pdf.lang) == set(training._MIX_WEIGHTS)
    assert ((pdf.rate_milli >= 0) & (pdf.rate_milli <= 1000)).all()
    assert (
        pdf.set_index("lang").weight_milli.to_dict() == training._MIX_WEIGHTS
    )
    full = (
        training._docs_toks(spark, SF)
        .groupBy("lang")
        .agg(F.sum(F.size("a")).alias("t"))
        .toPandas()
        .set_index("lang")
        .t
    )
    for row in pdf.itertuples():
        assert row.n_tokens <= full[row.lang]
        # a lang at rate 1000 keeps everything deterministically
        if row.rate_milli == 1000:
            n_docs_full = (
                load_table(spark, SF, "documents")
                .filter(F.col("lang") == row.lang)
                .count()
            )
            assert row.n_docs == n_docs_full


def test_token_budget_deterministic(spark):
    a = training.q_sample_token_budget(spark, SF).toPandas().sort_values("lang")
    b = training.q_sample_token_budget(spark, SF).toPandas().sort_values("lang")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_pipeline_curate_composes_stage_semantics(spark):
    """Every pipeline survivor must individually pass each composed
    stage's published gate, and the packed stream must tile each
    language contiguously (same law as q_pack_sequences)."""
    from pgshovel_spark.queries import pipeline, text

    out = pipeline.q_pipeline_curate(spark, SF).toPandas()
    keepers = set(
        text.q_dedup_exact(spark, SF).toPandas().keeper_doc_id
    )
    rep = (
        training.q_text_repetition(spark, SF)
        .toPandas()
        .set_index("doc_id")
    )
    assert set(out.doc_id) <= keepers, "non-keeper leaked past dedup stage"
    assert (out.n_tokens >= pipeline._MIN_TOKS).all()
    for doc in out.doc_id:
        assert not rep.loc[doc].is_repetitive
    for _, g in out.sort_values(["lang", "doc_id"]).groupby("lang"):
        expect = 0
        for row in g.itertuples():
            assert row.start_off == expect, "gap/overlap in packed stream"
            expect = row.start_off + row.n_tokens
