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
