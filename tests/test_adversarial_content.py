"""Engine-divergence regression tests on adversarial document content.

Two classes of corpus content diverge silently between Spark (Java
semantics) and the DuckDB oracle unless the queries guard against
them:

- BIGINT overflow in the Knuth-spread shingle hash: a token longer
  than ~120 chars pushes the polynomial hash past 2^31.5, and
  ``hash * 2654435761`` then exceeds 2^63 — Spark wraps silently,
  DuckDB raises OutOfRangeException.  The fix reduces the hash mod
  2^31 before the multiply on BOTH engines (ADVICE r2).
- Java regex ``\\s`` includes U+000B (vertical tab); RE2's does not.
  The BPE pre-tokenizer spells whitespace as an explicit character
  class so both engines split identically (ADVICE r2).

These tests build a tiny adversarial documents.parquet (long tokens,
vertical tabs, plus enough normal docs for the window/band logic) and
assert full canonical-hash parity between the Spark query and its
DuckDB oracle on that corpus.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgshovel_spark.queries import all_oracles, all_queries
from tools.selfcheck import canonical

_QUERIES = all_queries()
_ORACLES = all_oracles()

# One token of 200 chars: raw polynomial hash ~ 200 * 31^5 ~ 5.7e9
# > 2^31, so the unreduced spread multiply would overflow BIGINT.
_LONG_TOKEN = "x" * 200
_VTAB_TEXT = "alpha\x0bbeta gamma\x0b\x0bdelta epsilon's run 42"


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_sf")
    texts = [
        # long-token docs (shingle hash overflow without the mod-2^31)
        f"start {_LONG_TOKEN} middle {_LONG_TOKEN}y end",
        f"start {_LONG_TOKEN} middle {_LONG_TOKEN}z end",
        # vertical-tab docs (Java \s vs RE2 \s divergence)
        _VTAB_TEXT,
        _VTAB_TEXT + " extra tail tokens here",
    ] + [
        # normal filler so winnowing windows / simhash bands have data
        f"the quick brown fox number {i} jumps over the lazy dog and "
        f"keeps running towards hill {i % 3} every single morning"
        for i in range(12)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en", "de", "fr", "en"] * 4, pa.string()),
            "source": pa.array(["adv"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def adversarial_con(adversarial_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{adversarial_dir}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize(
    "name",
    [
        "q_simhash_pairs",
        "q_text_winnowing",
        "q_text_bpe_pretokenize",
        "q_dedup_exact",
        # round-3 text ops: entropy's sorted fold, the unigram LM fold,
        # and the prefix join must survive long tokens + vertical tabs
        "q_text_entropy",
        "q_text_unigram_ppl",
        "q_sim_jaccard_prefix",
        "q_sim_editdist",
        # round-6 governance ops: blocklist word-boundary regex and
        # chunk slicing must survive long tokens + vertical tabs
        "q_text_blocklist",
        "q_text_chunk",
        "q_split_train_eval",
        "q_text_crossdup",
        # round-6 second wave: chunk-hash dedup and the A-ES sampler
        # (ln of a hash-derived uniform; weight = n_chars of weird text)
        "q_dedup_chunks",
        "q_sample_weighted",
    ],
)
def test_adversarial_parity(spark, adversarial_con, name, adversarial_dir):
    sdf = _QUERIES[name](spark, adversarial_dir).toPandas()
    odf = adversarial_con.sql(_ORACLES[name]).df()
    assert canonical(sdf) == canonical(odf)


def test_embeddings_fixture_is_64d():
    """q_embed_* oracles derive dims per row now, but the IVF index and
    quantizer still assume a uniform dimensionality — assert it."""
    n_bad = duckdb.sql(
        "SELECT COUNT(*) FROM read_parquet("
        "'/root/testdata/sf0.001/embeddings.parquet') WHERE len(embedding) <> 64"
    ).fetchone()[0]
    assert n_bad == 0


def test_norm_text_edge_whitespace_types_dedup_equal(spark):
    """Texts differing only in edge-whitespace TYPE normalize equal:
    collapse-first then trim (trim alone strips only ASCII spaces, so
    a leading tab used to survive as a leading space)."""
    from pgshovel_spark.functions.textfns import norm_text

    rows = [("a b",), ("\ta b",), ("a b\n",), ("  a\tb  ",)]
    df = spark.createDataFrame(rows, "text string")
    got = {r[0] for r in df.select(norm_text("text")).collect()}
    assert got == {"a b"}
