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


@query(
    "variant_props_stats",
    ids=("S6",),
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               count(*) - count(json_extract_string(props, '$.j'))
                   AS n_missing_j
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT type (Spark 4): semi-structured data stored as a real
    engine type instead of a string. ``parse_json`` builds the VARIANT
    column once (binary-encoded, shredding-ready — at 100 TB this is
    what you'd persist so extraction skips per-query JSON parsing);
    ``try_variant_get`` extracts typed fields, yielding NULL — not an
    error — for a missing path ($.j probes exactly that). Contrast
    with `event_props_json`, which re-parses the string per extraction
    via get_json_object. Oracle restates both paths over DuckDB's JSON
    extraction."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("vp"))
    extracted = v.select(
        "event_type",
        F.try_variant_get("vp", "$.k", "bigint").alias("k"),
        F.try_variant_get("vp", "$.j", "bigint").alias("j"),
    )
    return (
        extracted.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            (F.count(F.lit(1)) - F.count("j")).alias("n_missing_j"),
        )
        .orderBy("event_type")
    )


@query(
    "unpivot_order_metrics",
    ids=("A7", "P6"),
    oracle="""
        WITH wide AS (
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
            FROM orders
            GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, metric, value FROM (
            SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value
            FROM wide
            UNION ALL
            SELECT o_orderpriority, 'n_customers', n_customers FROM wide
        )
        ORDER BY o_orderpriority, metric
    """,
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``unpivot``/``melt`` — the inverse of the pivot surface
    (`pivot_status_by_segment`): a wide per-priority metric frame
    melts to long (priority, metric, value) form, the shape metric
    stores and chart layers want. The unpivot itself is a zero-shuffle
    local expansion (each row emits one row per value column in
    place); only the upstream aggregate exchanges. Oracle restates as
    UNION ALL, which is exactly Spark's logical expansion of Unpivot."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
    return (
        wide.unpivot(
            ["o_orderpriority"],
            ["n_orders", "n_customers"],
            "metric",
            "value",
        )
        .orderBy("o_orderpriority", "metric")
    )


@query(
    "group_by_all_revenue",
    ids=("A7", "A8"),
    oracle="""
        SELECT o_orderpriority, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(sum(o_totalprice) AS DECIMAL(38,2)) AS VARCHAR)
                   AS total_price
        FROM orders
        GROUP BY ALL
        ORDER BY o_orderpriority, o_orderstatus
    """,
)
def group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (Spark 4 / modern-SQL convenience shared with
    DuckDB — the oracle literally runs the same clause): every
    non-aggregate select item becomes a grouping key, so adding a
    dimension can't silently desync the SELECT list from the GROUP BY.
    Money sum renders via the string path (decimal-exact, engine- and
    magnitude-proof)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n,
               CAST(CAST(sum(o_totalprice) AS DECIMAL(38,2)) AS STRING)
                   AS total_price
        FROM orders
        GROUP BY ALL
        ORDER BY o_orderpriority, o_orderstatus
        """
    )


@query(
    "parameterized_sql_revenue",
    ids=("J4", "A4"),
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_high_value
        FROM orders
        WHERE o_totalprice > 150000.0
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def parameterized_sql_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 ``spark.sql(query, args=...)``) with
    the ``IDENTIFIER()`` clause: the table NAME binds through an
    identifier parameter and the threshold through a value parameter —
    the injection-safe templating surface (string-concatenated SQL is
    the anti-pattern this replaces; a value param can never escape
    into syntax, an IDENTIFIER param can never smuggle a subquery).
    Plans identically to the literal form — the strict oracle is that
    literal form."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_high_value
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :threshold
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"tbl": "orders", "threshold": 150000.0},
    )


@query(
    "listagg_order_priorities",
    ids=("A6", "A8"),
    oracle="""
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, ','
                          ORDER BY o_orderpriority) AS priorities,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def listagg_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``listagg`` (Spark 4 / SQL:2016): ordered string aggregation as
    a FIRST-CLASS aggregate — the report-surface twin of the inverted
    index's collect_list+sort_array+array_join composition, but
    deterministic by declaration (``WITHIN GROUP (ORDER BY ...)``) and
    deduplicated in-aggregate (DISTINCT). Scale shape: DISTINCT
    collapses each group to its unique priority values (5) BEFORE any
    string concatenation, so the shuffle carries (status, priority)
    pairs, never row-sized strings."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               listagg(DISTINCT o_orderpriority, ',')
                   WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@query(
    "bitmap_distinct_users",
    ids=("A11", "A12"),
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-aggregate EXACT distinct (Spark 4 ``bitmap_*`` family) —
    the third point on the distinct-count spectrum beside exact
    count(DISTINCT) (A11) and HLL++ (A12): exact like the former,
    fixed-size-state like the latter. Each (event_type, id-bucket)
    group folds its user ids into one 4 KB bitmap
    (``bitmap_construct_agg(bitmap_bit_position(id))`` — partial
    aggregation merges bitmaps map-side), then ``bitmap_count`` pops
    each bitmap and a plain sum stacks the disjoint buckets. At 100 TB
    the shuffle carries one bitmap per (group, 32k-id bucket) instead
    of every distinct id — and the bucket bitmaps are the PERSISTABLE
    pre-aggregate: daily bitmaps OR-merge (``bitmap_or_agg``) into
    monthly exact distincts without touching raw ids again, which
    count(DISTINCT) can never do. Oracle replays the plain A11 form."""
    _views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_type,
               sum(bitmap_count(bm)) AS n_users
        FROM (
            SELECT event_type,
                   bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
            FROM events
            GROUP BY event_type, bitmap_bucket_number(user_id)
        )
        GROUP BY event_type
        ORDER BY event_type
        """
    )


@query(
    "pivot_order_status_matrix",
    ids=("A7", "A8", "O1"),
    oracle="""
        SELECT o_orderpriority,
               CAST(count(CASE WHEN o_orderstatus = 'O' THEN o_orderkey END) AS BIGINT) AS open_n,
               CAST(CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(28,6)) END) AS STRING) AS DOUBLE) AS open_rev,
               CAST(count(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END) AS BIGINT) AS filled_n,
               CAST(CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(28,6)) END) AS STRING) AS DOUBLE) AS filled_rev,
               CAST(count(CASE WHEN o_orderstatus = 'P' THEN o_orderkey END) AS BIGINT) AS pending_n,
               CAST(CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(28,6)) END) AS STRING) AS DOUBLE) AS pending_rev
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def pivot_order_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ``PIVOT`` (wide crosstab): order count and exact-decimal
    revenue per priority × status, one output column pair per pivoted
    status value — the declarative form of the reference's manual
    matrix queries (303-spark-sql/README.md:89-113 teaches the
    spark.sql surface; the conditional-aggregation lowering is what
    the oracle states explicitly). Catalyst rewrites PIVOT into one
    hash aggregate over CASE-projected columns — a single scan and a
    single shuffle regardless of how many status values are pivoted,
    identical to the hand-written form at any scale. The revenue cells
    go through the string-decimal path (dsum) so both engines
    accumulate in DECIMAL(28,6) and render identically; empty cells
    are NULL rev / 0 n in both lowerings."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT * FROM (
            SELECT o_orderpriority, o_orderstatus, o_orderkey, o_totalprice
            FROM orders
        ) PIVOT (
            CAST(count(o_orderkey) AS BIGINT) AS n,
            CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS rev
            FOR o_orderstatus IN ('O' AS open, 'F' AS filled, 'P' AS pending)
        )
        ORDER BY o_orderpriority
        """
    )


@query(
    "pipe_syntax_order_stats",
    ids=("A7", "A8", "O1"),
    oracle=f"""
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               {dsum('o_totalprice')} AS revenue
        FROM orders
        WHERE o_totalprice > 50000
        GROUP BY o_orderstatus, o_orderpriority
        HAVING count(*) > 5
        ORDER BY o_orderstatus, o_orderpriority
    """,
)
def pipe_syntax_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax, multi-stage composition (extends the round-4
    ``pipe_syntax_returnflag_revenue`` basic flow): source |> filter
    |> aggregate |> POST-AGGREGATE filter |> projection |> order — the
    post-aggregate ``|> WHERE`` references an aggregate ALIAS (the
    pipe form of HAVING, impossible to misplace) and the late ``|>
    SELECT`` reshapes after filtering, which is where nested standard
    SQL needs a subquery. The DuckDB oracle IS that standard nested
    form (HAVING + ordered projection), so strict equality proves the
    lowering of the full stage algebra, not just parseability. Money
    via the string-decimal path (dsum) like every revenue oracle."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        FROM orders
        |> WHERE o_totalprice > 50000
        |> AGGREGATE count(*) AS n_orders,
                     {dsum('o_totalprice')} AS revenue
           GROUP BY o_orderstatus, o_orderpriority
        |> WHERE n_orders > 5
        |> SELECT o_orderstatus, o_orderpriority,
                  CAST(n_orders AS BIGINT) AS n_orders, revenue
        |> ORDER BY o_orderstatus, o_orderpriority
        """
    )


@query(
    "sql_scripting_threshold",
    ids=("§2.7", "A4"),
    oracle="""
        WITH t0 AS (
            SELECT CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   / count(*) AS t FROM events
        ),
        t1 AS (
            SELECT CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   / count(*) AS t FROM events, t0 WHERE value <= t0.t
        ),
        t2 AS (
            SELECT CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   / count(*) AS t FROM events, t1 WHERE value <= t1.t
        ),
        t3 AS (
            SELECT CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   / count(*) AS t FROM events, t2 WHERE value <= t2.t
        )
        SELECT t3.t AS threshold,
               (SELECT count(*) FROM events, t3 WHERE value <= t3.t)
                   AS n_below
        FROM t3
    """,
)
def sql_scripting_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4, SQL/PSM): an ITERATIVE computation in
    pure SQL — BEGIN/END block, DECLAREd variables, a WHILE loop
    refining a trimmed-mean threshold (t_{k+1} = mean of values <= t_k,
    three contractions), no driver-side Python between iterations.

    This is the control-flow surface 100 TB maintenance jobs want in
    the warehouse instead of orchestration glue: each loop body is a
    full Catalyst-planned aggregate over the table, and only the scalar
    threshold crosses iterations. Determinism discipline: every mean is
    an exact DECIMAL sum cast to DOUBLE then divided, so the float is a
    pure function of the value set, never of partitioning or engine
    accumulation order — which is what lets the DuckDB oracle replay
    the loop as unrolled CTEs and match bit-for-bit.
    """
    _views(spark, sf_dir, "events")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE t DOUBLE;
          DECLARE k INT DEFAULT 0;
          SET t = (SELECT CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                          / count(*) FROM events);
          WHILE k < 3 DO
            SET t = (SELECT CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                            / count(*) FROM events WHERE value <= t);
            SET k = k + 1;
          END WHILE;
          SELECT t AS threshold,
                 (SELECT count(*) FROM events WHERE value <= t) AS n_below;
        END
        """
    )
