"""Shared cross-engine hash primitives for the similarity / dedup /
sketch families — ONE definition each (round-11 consolidation; these
had accreted per-module copies that an edit could desynchronize, the
same hazard knuth_bucket's unification fixed in determinism.py).

Every primitive here exists in TWO renderings that must stay
arithmetically identical: a Spark Column expression and a DuckDB SQL
fragment the oracles interpolate.  Change them TOGETHER or the hash
gate catches you.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Polynomial token hash shared by minhash/simhash/winnowing/zipf.
#: Horner polynomial over length + first 4 chars + last char: ~2.8e8
#: distinct values for ASCII words, enough entropy that LSH band
#: buckets only collide for genuinely similar docs (a low-entropy hash
#: makes the band self-join quadratic in the bucket size — measured 4x
#: over the bench budget before this).  ascii(substring(t, i, 1)) is 0
#: past the end on both engines.
TOKEN_HASH_SQL = (
    "CAST((((((length({t}) * 31 + ascii(substring({t}, 1, 1))) * 31"
    " + ascii(substring({t}, 2, 1))) * 31 + ascii(substring({t}, 3, 1))) * 31"
    " + ascii(substring({t}, 4, 1))) * 31 + ascii(substring({t}, -1, 1))) AS BIGINT)"
)


def token_hash(t) -> Column:
    """Spark rendering of :data:`TOKEN_HASH_SQL` (identical arithmetic)."""
    h = F.length(t).cast("long")
    for i in (1, 2, 3, 4):
        h = h * 31 + F.ascii(F.substring(t, i, 1))
    return (h * 31 + F.ascii(F.substring(t, -1, 1))).cast("long")


#: Knuth multiplicative spread of the polynomial hash: the raw hash
#: tops out around 2^28 on this corpus, so its high bits are constant
#: and any band over them would bucket the whole corpus together
#: (quadratic blow-up).  The hash is reduced mod 2^31 BEFORE the
#: multiply so the product is bounded by 2^31 * 2654435761 < 2^63 for
#: ANY input length — without the reduction a shingle longer than
#: ~120 chars overflows BIGINT, which Spark wraps silently while
#: DuckDB raises OutOfRangeException (engine divergence).  The mod is
#: a no-op at raw hash < 2^31, so fixture results are unchanged.
SPREAD_MUL = 2654435761
SPREAD_MOD = 4294967296
SPREAD_RED = 2147483648  # 2^31 pre-multiply reduction, both engines

SPREAD_SQL = "((({h}) % 2147483648) * 2654435761) % 4294967296"


def spread(h) -> Column:
    """Overflow-proof Knuth spread: ((h % 2^31) * mul) % 2^32."""
    return ((h % SPREAD_RED) * SPREAD_MUL) % SPREAD_MOD


#: The spread applied to the token hash of a column named by ``t`` —
#: the exact feature-hash fragment the SimHash/winnowing oracles embed.
def spread_token_hash_sql(t: str) -> str:
    return SPREAD_SQL.format(h=TOKEN_HASH_SQL.format(t=t))


#: (a, b) coefficients for the MinHash linear permutations
#: h_i(x) = (a*x + b) mod P.
MINHASH_COEFS = [(2971, 1049), (3413, 2221), (4021, 367), (4519, 1559),
                 (5003, 2897), (5519, 733), (6037, 1973), (6553, 3181)]
MINHASH_P = 2147483647
