"""LSH banding machinery — ONE layout contract for the near-dup family.

MinHash signatures, band keys, the banded incidence list, the bucket
cap and the capped band self-join (queries/similarity.py's minhash ->
bands -> pairs / clusters / estimator chain) and SimHash pigeonhole
banding (queries/curation.py's q_simhash_pairs) all read their shared
machinery from here, so the Python plans and the SQL oracle mirrors
cannot drift apart.  Definitions moved VERBATIM from
queries/similarity.py and queries/curation.py in round 12 (round-11
verdict ask #6) — no hash arithmetic changed; the SQL fragment
builders render the exact strings the oracles rendered before.

Reference behavior (SURVEY.md §2.G [recalled]): banded MinHash/SimHash
candidate generation — candidates only from equal (band, key) buckets,
never all-pairs; the shape that keeps near-dup detection linear-ish at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgshovel_spark.functions.hashing import (
    MINHASH_COEFS,
    MINHASH_P,
    TOKEN_HASH_SQL,
    token_hash,
)

__all__ = [
    "N_BANDS",
    "BUCKET_CAP",
    "band_key",
    "bands_long",
    "BANDS_LONG_SQL",
    "minhash_sigs",
    "minhash_sigs_sql",
    "anti_cap",
    "band_self_join",
    "pigeonhole_candidates",
]

#: number of LSH bands (8 minhashes as N_BANDS x 4 rows).  Referenced by
#: every Python AND SQL site — change it in one place only.
N_BANDS = 2

#: Band-bucket size cap for PAIR EMISSION: a bucket of m near-identical
#: docs emits m^2/2 pairs — the round-3 10x rehearsal measured the
#: uncapped form output-quadratic on a dup-dense corpus (>30 min at
#: 10x).  Buckets larger than the cap are boilerplate-duplicate
#: cliques: the pair LIST for them is not actionable (the cluster path
#: — star reduction, linear — is), so both engines drop them from
#: emission, bounding any bucket's output at cap^2/2.  No-op at the
#: sf0.01 correctness fixture (max bucket 243, measured).
BUCKET_CAP = 1000


def band_key(i: int):
    """Band-i LSH key: the 31-polynomial mix of minhashes 4i..4i+3 —
    THE banding layout contract between signatures, pairs, clusters,
    and the estimator audit.  One definition; the SQL mirrors render
    the same ((mh*31+mh)*31+mh)*31+mh expression inline."""
    cols = [F.col(f"mh{4 * i + j}") for j in range(4)]
    k = cols[0]
    for c in cols[1:]:
        k = k * 31 + c
    return k.alias(f"band{i}")


def bands_long(sigs: DataFrame, payload_cols: list | None = None) -> DataFrame:
    """(doc_id, band_idx, key[, payload...]) incidence list from a
    signature frame — the single definition of the banding layout
    shared by the pairs, clustering and estimator queries.
    ``payload_cols`` carries extra per-doc columns through the band
    expansion (q_sim_minhash_est rides its verify payload on the
    banding join instead of joining back)."""
    payload = list(payload_cols or [])
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"), F.col(f"band{i}").alias("key")
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("b"),
        *payload,
    ).select("doc_id", "b.band_idx", "b.key", *payload)


BANDS_LONG_SQL = "\n  UNION ALL ".join(
    f"SELECT doc_id, {i} AS band_idx, band{i} AS key FROM sigs"
    for i in range(N_BANDS)
)


def minhash_sigs(tok: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-doc 8-hash MinHash signature over the polynomial token hash
    of a distinct-token posting table ``(id_col, t)``."""
    th = token_hash(F.col("t"))
    aggs = [
        F.min((th * a + b) % MINHASH_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_COEFS)
    ]
    return tok.groupBy(id_col).agg(*aggs)


def minhash_sigs_sql(tok_sql: str) -> str:
    """The oracle mirror of :func:`minhash_sigs`, given the SQL of the
    distinct-token posting table (columns doc_id, t)."""
    return f"""
  SELECT doc_id,
         {", ".join(
             f"MIN(({TOKEN_HASH_SQL.format(t='t')} * {a} + {b}) % {MINHASH_P}) AS mh{i}"
             for i, (a, b) in enumerate(MINHASH_COEFS)
         )}
  FROM ({tok_sql}) tok
  GROUP BY doc_id
"""


def anti_cap(long_: DataFrame, cap: int = BUCKET_CAP) -> DataFrame:
    """Drop rows in over-cap band buckets.  OVER-cap buckets are the
    rare pathological cliques — a small set by construction — so they
    broadcast as an ANTI join: the capped bucket table is then a
    map-side filter of the (cached) signature expansion instead of a
    keep-list shuffle join that re-executes the subtree per consumer
    (the round-5 job-count fix, same as _capped_pair_counts)."""
    big = (
        long_.groupBy("band_idx", "key")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") > cap)
        .select("band_idx", "key")
    )
    return long_.join(F.broadcast(big), ["band_idx", "key"], "anti")


def band_self_join(long_: DataFrame) -> DataFrame:
    """The banded candidate join: rows of ``long_`` against themselves
    on (band_idx, key) with doc_id< ordering, aliased ``a``/``b``.

    TRUE self-join (alias, not column-renamed sides): the children are
    canonically identical (sameResult), so when the incidence table
    outgrows the broadcast threshold and this plans as a shuffle join,
    the static ReuseExchange rule feeds both sides from ONE shuffle
    (plan-verified with AQE off; AQE's stage-level dedup currently
    misses the pattern — see EXPERIMENTS.md round 8 — but locally AQE
    broadcasts the small side anyway).  Column-renamed sides could
    never reuse under either planner."""
    a = long_.alias("a")
    b = long_.alias("b")
    return a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )


def pigeonhole_candidates(
    sigs: DataFrame, n_bands: int = 4, bits: int = 8
) -> DataFrame:
    """SimHash pigeonhole banding: from ``(doc_id, sig)`` signatures,
    candidate pairs ``(id1, id2, s1, s2)`` sharing at least one
    bit-identical ``bits``-wide band — Hamming <= (n_bands - 1) over
    n_bands bands guarantees at least one band matches, so candidates
    come from an equi-join on (band_idx, band_value) buckets, never
    all-pairs.  The distinct dedups multi-band agreements before the
    caller's exact bit_count filter."""
    bands = F.array(
        *[
            (F.shiftright(F.col("sig"), bits * b) % (1 << bits)).cast("int")
            for b in range(n_bands)
        ]
    )
    c = sigs.select(
        "doc_id", "sig", F.posexplode(bands).alias("band_idx", "band_val")
    )
    a = c.select(
        F.col("doc_id").alias("id1"), F.col("sig").alias("s1"),
        "band_idx", "band_val",
    )
    b = c.select(
        F.col("doc_id").alias("id2"), F.col("sig").alias("s2"),
        "band_idx", "band_val",
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "s1", "s2")
        .distinct()
    )
