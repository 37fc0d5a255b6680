"""Collision audits for the 64-bit hash join keys.

q_sim_ngram joins shingles on xxhash64(lang, shingle) and q_dedup_exact
groups on xxhash64(normalized text) while their oracles use the raw
strings — deliberate shuffle-width trades documented at the call sites.
These audits prove the trade is vacuous on the fixture corpora: zero
distinct strings share a hash, so the hashed plans are value-identical
to the string plans, not merely probably-identical.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pgshovel_spark.functions.textfns import norm_text, tokens
from pgshovel_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_ngram_shingle_hash_collision_free(spark):
    d = load_table(spark, SF_DIR, "documents")
    toks = F.filter(tokens("text"), lambda t: t != "")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )
    sh = (
        d.filter(F.size(toks) >= 2)
        .select("lang", F.explode(shingles).alias("s"))
        .select("lang", "s", F.xxhash64("lang", "s").alias("h"))
        .distinct()
    )
    collisions = (
        sh.groupBy("h")
        .agg(F.countDistinct("lang", "s").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert collisions == 0


def test_dedup_exact_norm_hash_collision_free(spark):
    d = load_table(spark, SF_DIR, "documents")
    n = d.select(norm_text("text").alias("norm")).distinct()
    collisions = (
        n.select("norm", F.xxhash64("norm").alias("h"))
        .groupBy("h")
        .agg(F.countDistinct("norm").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert collisions == 0


def test_crossdup_trigram_hash_collision_free(spark):
    """q_text_crossdup joins doc-frequency back on xxhash64(lang, tri);
    zero distinct (lang, trigram) pairs may share a hash."""
    d = load_table(spark, SF_DIR, "documents")
    a = F.filter(tokens("text"), lambda t: t != "")
    base = d.select("doc_id", "lang", a.alias("a")).filter(F.size("a") >= 3)
    tri = F.expr(
        "transform(sequence(0, size(a)-3), i -> concat_ws(' ', a[i], a[i+1], a[i+2]))"
    )
    dt = (
        base.select("lang", F.explode(F.array_distinct(tri)).alias("tri"))
        .distinct()
        .select("lang", "tri", F.xxhash64("lang", "tri").alias("h"))
    )
    collisions = (
        dt.groupBy("h")
        .agg(F.countDistinct("lang", "tri").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert collisions == 0


def test_incremental_dedup_norm_hash_collision_free(spark):
    """q_dedup_incremental joins batch and corpus on xxhash64(norm);
    zero distinct normalized texts may share a hash."""
    d = load_table(spark, SF_DIR, "documents")
    n = (
        d.select(norm_text("text").alias("norm"))
        .distinct()
        .select("norm", F.xxhash64("norm").alias("h"))
    )
    collisions = (
        n.groupBy("h")
        .agg(F.countDistinct("norm").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert collisions == 0
