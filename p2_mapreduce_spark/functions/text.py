"""Tokenization primitives — the reference's only scalar functions.

Contract (reference mapreduce/functions/wordcount.go:20-37): split the text
on every rune that is neither a Unicode letter nor a Unicode digit
(``unicode.IsLetter`` / ``unicode.IsNumber``), lowercase each token, drop
empties.  Go's rune classes map exactly to the regex classes ``\\p{L}`` and
``\\p{N}`` (both cover L*/N* general categories), which Java regex (Spark)
and RE2 (DuckDB oracle) share — so the same pattern is usable on both sides
of the correctness gate.

Order of operations matters for exotic scripts: the reference splits FIRST
and lowercases each token after; lowering first could change letter-ness
(e.g. Turkish dotted-I decompositions). We split-then-lower to match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Split on runs of non-letter/non-digit, Unicode-aware (wordcount.go:22-25).
TOKEN_SPLIT_REGEX = r"[^\p{L}\p{N}]+"


def tokens_array(text: Column | str) -> Column:
    """``array<string>`` of lowercased tokens, empties removed.

    Pure built-in expression chain (split → transform → filter): stays in
    whole-stage codegen, no Python involved — the 100 TB hot path.
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(col, TOKEN_SPLIT_REGEX)
    toks = F.transform(toks, F.lower)
    return F.filter(toks, lambda t: t != F.lit(""))


def tokenize_column(text: Column | str) -> Column:
    """Exploded token column (one row per token) — the map half of word
    count (reference M1+M2). Use ``F.explode(tokens_array(c))`` inline when
    composing; provided for readability."""
    return F.explode(tokens_array(text))
