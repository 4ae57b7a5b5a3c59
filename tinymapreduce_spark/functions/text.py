"""Text scalar functions — all JVM-side (`pyspark.sql.functions`), no UDFs.

Tokenizer parity note (SURVEY.md §7.5 item 2): the reference word-count
splits on runs of non-letters via ``unicode.IsLetter``
(``/root/reference/src/mrapps/wc.go:23``). We pin the ASCII regex form
``[^A-Za-z]+`` in BOTH the engine and the DuckDB oracle so they always
agree with each other (the reference corpus is ASCII-dominant anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pinned in engine AND oracle. Splitting on this regex == keeping maximal
# runs of ASCII letters, the reference's token definition.
TOKEN_SPLIT_RE = "[^A-Za-z]+"


def tokens(col: Column | str) -> Column:
    """``array<string>`` of letter-run tokens, empty strings removed.

    Whole expression stays inside WholeStageCodegen — split + filter are
    Catalyst expressions, so tokenization of 100 TB of text never leaves
    the JVM.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def words(df: DataFrame, text_col: str = "contents", out_col: str = "word") -> DataFrame:
    """Explode a text column into one row per token (the Map side of Q1/Q2)."""
    return df.withColumn(out_col, F.explode(tokens(text_col)))


def normalized_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace — canonical form for exact dedup
    and fingerprinting. Mirrors the oracle's
    ``lower(regexp_replace(text, '\\s+', ' ', 'g'))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
