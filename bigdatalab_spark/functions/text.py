"""Text scalar functions (SURVEY §2.7 + scale-extension primitives).

All pure Column expressions — they stay JVM-side inside whole-stage
codegen; nothing here drops to Python per row. Queries and the scale/
operators (dedup, text analysis) compose these.

Reference parity: tokenization on single spaces (301-solutions.scala:11,
WordCount.java:27-31), lower-casing (TestSpark.scala:49), empty-token
filtering (301-solutions.scala:44).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Lower-case and collapse whitespace — shared by dedup/fingerprint."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokenize(col: Column | str, pattern: str = r"\s+") -> Column:
    """Split into words, dropping empty tokens (array<string>).

    Mirrors ``line.split(" ")`` + non-empty filter
    (301-solutions.scala:11,44; WordCount.java:27-31).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, pattern), lambda t: t != "")


def token_count(col: Column | str, pattern: str = r"\s+") -> Column:
    """Number of non-empty whitespace tokens."""
    return F.size(tokenize(col, pattern))


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """n-gram word shingles from a token array (array<string>).

    ``transform`` over a ``sequence`` of start offsets; entirely JVM-side.
    Used by MinHash/Jaccard dedup.

    PERF: pass a *materialized column* (select the token array into its
    own column first), not an inline ``split(...)`` expression — higher-
    order functions defeat subexpression elimination, so an inline
    tokenizer re-splits the string for every shingle position (O(len²)).
    Per-position ``element_at`` (O(1)) instead of ``slice`` (O(len))
    keeps the whole shingling linear in document length.
    """
    return F.when(F.size(tokens) < n, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens, i + k + 1) for k in range(n)]
            ),
        )
    )


def char_shingles(col: Column | str, n: int = 8) -> Column:
    """Character n-gram shingles of a string (array<string>).

    Basis of the rolling-hash document fingerprint: hash each window,
    take min — a winnowing-style signature.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) < n, F.array(c)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(c) - n + 1),
            lambda i: c.substr(i, F.lit(n)),
        )
    )
