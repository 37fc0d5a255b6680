"""Text helpers for the LLM-pipeline operators.

The ``documents.text`` fixture is space-separated lowercase ASCII, but
these helpers implement the general contract (lower -> trim -> collapse
whitespace) so they behave on arbitrary corpora too.

Whitespace is an EXPLICIT character class, never ``\\s``: Java regex
``\\s`` is ``[ \\t\\n\\x0B\\f\\r]`` but RE2 (DuckDB) omits vertical tab
(U+000B), so a corpus containing one would tokenize differently per
engine.  Every oracle SQL must use the same class — ``WS_SQL`` below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Java-\s-equivalent whitespace class, identical semantics in RE2.
WS = r"[ \t\n\x0B\f\r]"
#: The same class for embedding into oracle SQL strings (the SQL
#: modules are non-raw Python strings, so the escapes arrive at the
#: regex engine as intended when interpolated verbatim).
WS_SQL = "[ \\t\\n\\x0B\\f\\r]"


def norm_text(c: Column | str) -> Column:
    """Normalization used by exact dedup: lower, collapse runs of
    whitespace, THEN trim — collapse-first, because ``trim`` strips
    only ASCII spaces: trimming before the collapse left a leading/
    trailing tab or newline alive as an edge SPACE, so two texts
    differing only in edge-whitespace TYPE failed to dedup.

    Oracle SQL: ``trim(regexp_replace(lower(text),
    '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))``.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(c), WS + "+", " "))


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization of lowercased text -> array<string>.

    Oracle SQL: ``string_split_regex(lower(text),
    '[ \\t\\n\\x0B\\f\\r]+')`` (DuckDB).
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.split(F.lower(c), WS + "+")
