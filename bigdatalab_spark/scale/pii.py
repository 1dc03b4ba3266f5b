"""PII detection and redaction (scale extension).

Scrubbing personally identifiable information is a mandatory pass in
any web-scale training-data pipeline. This module implements the
regex tier — emails, IPv4 addresses, phone-shaped number runs — as
pure Column expressions (``regexp_count`` / ``regexp_replace``), so
the scrub runs inside whole-stage codegen at scan speed: narrow,
shuffle-free, 100 TB-safe by construction.

The patterns are deliberately written in the common subset of Java
regex (Spark) and RE2 (DuckDB): character classes, bounded repeats,
``\\d``, word boundaries — no backreferences, no lookaround — so the
correctness gate can replay the exact redaction in SQL. Redaction is
applied in a fixed order (email, then IPv4, then phone) and each
pattern is counted on the text as it looked *before* that pattern's
own replacement, making counts well-defined and order-reproducible.

NER-tier PII (names, addresses) needs a model; that slot is documented
as out of scope for this engine the same way the multimodal codec slot
is — the regex tier here is the real, load-bearing scrub.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: pattern table: (kind, regex, replacement token). Order matters and is
#: part of the contract — earlier patterns must not produce text that
#: later patterns match (replacement tokens contain no digits or '@').
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # grouped shape (optional +cc, optional 3-digit group, 3+4 core) so
    # date-like digit runs (2024-01-02, 2020-2024, 1.2.3) can never
    # align — the naive \d[\d -]{6,}\d redacts every ISO date in a
    # corpus as a phone number
    ("phone", r"(\+\d{1,3}[ -])?\b(\d{3}[ -])?\d{3}[ -]\d{4}\b", "<PHONE>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """Add ``out_col`` (scrubbed text) and one ``n_<kind>`` count column
    per pattern in :data:`PII_PATTERNS`.

    Counts are per-document match counts at the moment the pattern runs
    (i.e. after earlier patterns' replacements), so
    ``sum(n_*)`` == number of replacement tokens inserted. All columns
    are codegen'd expressions — the scrub adds zero shuffles and
    preserves input partitioning.
    """
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for kind, pattern, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(cur, F.lit(pattern)).cast("long").alias(f"n_{kind}")
        )
        cur = F.regexp_replace(cur, pattern, token)
    return df.select("*", *counts, cur.alias(out_col))


def redact_pii_sql(text_expr: str) -> tuple[list[str], str]:
    """DuckDB oracle twin of :func:`redact_pii`: returns the per-kind
    count select-list fragments and the fully-redacted text expression,
    computed with the exact same pattern order."""
    frags: list[str] = []
    cur = text_expr
    for kind, pattern, token in PII_PATTERNS:
        sql_pat = pattern.replace("'", "''")
        frags.append(
            f"CAST(len(regexp_extract_all({cur}, '{sql_pat}')) AS BIGINT) AS n_{kind}"
        )
        cur = f"regexp_replace({cur}, '{sql_pat}', '{token}', 'g')"
    return frags, cur
