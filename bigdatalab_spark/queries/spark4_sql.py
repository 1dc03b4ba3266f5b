"""Spark 4 SQL language surfaces: recursive CTEs, pipe syntax, collation.

The reference's SQL lab teaches the ``spark.sql`` entry point over temp
views (303-spark-sql/README.md:89-113); these queries exercise the three
SQL-language extensions Spark 4 added on top of that surface, each with
a strict DuckDB oracle (DuckDB shares the recursive-CTE semantics; pipe
syntax and collation are re-stated in ANSI form on the oracle side).

Scale notes: the recursive CTE here generates a bounded calendar spine
(days of a quarter — recursion depth 90, rows 90) and joins the fact
table to it; recursion never touches data-sized frames. Pipe syntax is
pure sugar — Catalyst plans it identically to the ANSI form (asserted by
the oracle match). Collation comparisons evaluate JVM-side per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.queries.tpch import dsum
from bigdatalab_spark.sources import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


@query(
    "recursive_calendar_orders",
    ids=("J7", "A9", "O1"),
    oracle="""
        WITH RECURSIVE cal(day) AS (
            SELECT DATE '1996-01-01'
            UNION ALL
            SELECT day + INTERVAL 1 DAY FROM cal
            WHERE day < DATE '1996-03-31'
        )
        SELECT CAST(day AS VARCHAR) AS day, count(o_orderkey) AS n_orders
        FROM cal LEFT JOIN orders ON CAST(o_orderdate AS DATE) = day
        GROUP BY day
        ORDER BY day
    """,
)
def recursive_calendar_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): generate a Q1-1996 calendar spine by
    recursion and zero-fill daily order counts against it — the
    warehouse gap-filling pattern, declarative end to end.

    The recursion is bounded (90 rows) and data-independent; orders
    joins the spine broadcast-side. count(o_orderkey) counts matches
    only, so empty days report 0 instead of disappearing.
    """
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE cal(day) AS (
            SELECT DATE '1996-01-01'
            UNION ALL
            SELECT day + INTERVAL 1 DAY FROM cal
            WHERE day < DATE '1996-03-31'
        )
        SELECT CAST(day AS STRING) AS day, count(o_orderkey) AS n_orders
        FROM cal LEFT JOIN orders ON CAST(o_orderdate AS DATE) = day
        GROUP BY day
        ORDER BY day
        """
    )


@query(
    "pipe_syntax_returnflag_revenue",
    ids=("A4", "A8", "P3", "O1"),
    oracle=f"""
        SELECT l_returnflag,
               {dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def pipe_syntax_returnflag_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): the filter→aggregate→order flow
    written as ``|>`` stages. Catalyst lowers it to the identical plan
    as the ANSI form — the strict oracle match proves the equivalence,
    and the exact-decimal revenue sum carries over unchanged.
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1997-01-01'
        |> AGGREGATE
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
               count(*) AS n_lines
           GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )


@query(
    "collated_segment_match",
    ids=("P3", "A9", "O1"),
    oracle="""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE lower(c_mktsegment) IN ('building', 'machinery')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
)
def collated_segment_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collation (Spark 4): case-insensitive segment matching via
    ``COLLATE UTF8_LCASE`` instead of wrapping every comparison in
    ``lower()`` — the collation travels with the expression, so the
    grouping key keeps its original bytes while the filter compares
    case-insensitively. Oracle states the ``lower()`` equivalent.
    """
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE c_mktsegment COLLATE UTF8_LCASE IN ('Building', 'MACHINERY')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )
