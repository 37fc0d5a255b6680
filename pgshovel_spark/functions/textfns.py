"""Text helpers for the LLM-pipeline operators.

The ``documents.text`` fixture is space-separated lowercase ASCII, but
these helpers implement the general contract (lower -> trim -> collapse
whitespace) so they behave on arbitrary corpora too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text(c: Column | str) -> Column:
    """Normalization used by exact dedup: lower, trim, collapse ``\\s+``.

    Oracle SQL: ``regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')``.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization of lowercased text -> array<string>.

    Oracle SQL: ``string_split_regex(lower(text), '\\s+')`` (DuckDB).
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.split(F.lower(c), r"\s+")
