"""Python UDTFs (Spark 3.5+/4 table-function extension point).

Companion to the Python DataSource (sources/pyds.py): where a UDF maps
rows 1:1 and a DataSource produces a table from storage, a UDTF turns
each input row into MANY output rows from arbitrary Python — callable
from SQL as a table function, including correlated
``LATERAL udtf(t.col)`` over another table's rows.

POLICY (SURVEY §2.9): like row-at-a-time UDFs, a UDTF executes Python
per input row — it is the EXTENSIBILITY showcase, not a hot-path
operator. Every shipped UDTF here has a pure-column-expression twin
that production paths use (``doc_spans`` ≡ the sequence/slice pipeline
inside :func:`bigdatalab_spark.scale.dedup.span_dedup` and
:func:`bigdatalab_spark.scale.textqa.chunk_documents`), and the parity
is oracle-tested so the two can never drift.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos bigint, span_text string, n_tokens int")
class DocSpans:
    """Non-overlapping token spans of a document: one output row per
    ``span`` of ``n`` whitespace tokens — the span_dedup/chunking unit
    as a SQL-callable table function."""

    def eval(self, text: str, n: int):  # noqa: D102 - UDTF contract
        if n is None or n <= 0:
            raise ValueError("span size must be positive")
        toks = [t for t in (text or "").split() if t]
        for i in range(0, len(toks), n):
            chunk = toks[i : i + n]
            yield (i // n, " ".join(chunk), len(chunk))


def register_udtfs(spark) -> None:
    """Register every shipped UDTF for SQL use (idempotent)."""
    spark.udtf.register("doc_spans", DocSpans)
