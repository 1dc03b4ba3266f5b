"""Core relational queries over the synthetic TPC-H-ish warehouse.

These exercise the reference's aggregate/filter/project operators
(SURVEY §2.2, §2.4, §2.5) on the driver's tables. Each query is written
declaratively so Catalyst pushes filters/columns into the parquet scan
and AQE sizes the shuffles; at 100 TB the same shapes hold because the
only shuffles are on the grouping keys and every ORDER BY follows a
reduction to a small result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.operators import money_sum, stable_avg
from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.sources import load_table

# Oracle-side mirror of operators.aggregates: exact decimal accumulation,
# then double arithmetic — bit-identical to Spark's money_sum/stable_avg.
# No rounding: round(double) itself diverges between engines (Spark uses
# the shortest-decimal-string value, DuckDB the binary value).
#
# The final decimal->double render goes THROUGH A STRING: DuckDB's direct
# decimal->double cast converts the 128-bit unscaled integer to double and
# then divides by 10^scale — two roundings, 1 ULP off correct once the
# unscaled sum exceeds 2^53 (measured at the x100 decade: sum_charge
# 2.8e11 at scale 6 -> unscaled 2.8e17; SCALE_NOTES round-5). The
# string parse is correctly rounded at every magnitude, matching Spark's
# Decimal.toDouble (which string-parses beyond its own 2^52 fast path),
# so the oracle stays bit-identical at ANY data scale. Below 2^53 both
# paths are exact, so gate-scale results are unchanged.
DSUM = "CAST(CAST(sum(CAST({x} AS DECIMAL(28,6))) AS STRING) AS DOUBLE)"


def dsum(x: str, scale: int | None = None) -> str:
    return DSUM.format(x=x)


def davg(x: str, scale: int | None = None) -> str:
    return f"({DSUM.format(x=x)} / count({x}))"


@query(
    "pricing_summary",
    ids=("A4", "A5", "A7", "A8", "O1", "P3"),
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {dsum('l_quantity')}                                         AS sum_qty,
               {dsum('l_extendedprice')}                                    AS sum_base_price,
               {dsum('l_extendedprice * (1 - l_discount)')}                 AS sum_disc_price,
               {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}   AS sum_charge,
               {davg('l_quantity')}                                         AS avg_qty,
               {davg('l_extendedprice')}                                    AS avg_price,
               {davg('l_discount')}                                         AS avg_disc,
               count(*)                                                     AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the engine's flagship query.

    Grouped sum/avg/count with computed expressions; the hand-built
    (sum,count) average buffer of the reference
    (ExampleWeather2.scala:31-33, Ex4AverageWordLengthWithCombiner.java:68-108)
    is Spark's internal partial/final HashAggregate here.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            stable_avg("l_quantity").alias("avg_qty"),
            stable_avg("l_extendedprice").alias("avg_price"),
            stable_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "order_priority_count",
    ids=("A9", "P3"),
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + count(*) group by (303-spark-sql/README.md:89-90 shape)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter("o_orderstatus = 'F'")  # SQL-string filter form (P3)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "high_value_orders",
    ids=("P3", "P4", "P5", "P6", "O3"),
    oracle="""
        SELECT o_orderkey AS orderkey, o_custkey,
               o_totalprice * 1.2 AS price_eur,
               year(o_orderdate) AS order_year
        FROM orders
        WHERE o_totalprice > 400000
        ORDER BY price_eur DESC, orderkey
    """,
)
def high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + computed column via SQL expr + desc sort.

    Mirrors the real-estate query shape round(avg(price*1.2),2)
    (303-solutions.scala:4) and withColumnRenamed/expr usage
    (303-solutions.scala:18-29).
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .withColumnRenamed("o_orderkey", "orderkey")
        .withColumn("price_eur", F.expr("o_totalprice * 1.2"))
        .withColumn("order_year", F.year("o_orderdate"))
        .drop("o_totalprice", "o_orderdate")
        .orderBy(F.desc("price_eur"), F.asc("orderkey"))
    )


@query(
    "part_type_stats",
    ids=("A3", "A4", "A7"),
    oracle=f"""
        SELECT p_type, p_brand,
               max(p_retailprice)          AS max_price,
               {davg('p_retailprice')}     AS avg_price,
               max(p_size)                 AS max_size
        FROM part
        GROUP BY p_type, p_brand
        ORDER BY p_type, p_brand
    """,
)
def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column grouping with max+avg (303-solutions.scala:11-13 shape;
    grouped max = MaxTemperatureReducer.java:15-22 semantics)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_type", "p_brand")
        .agg(
            F.max("p_retailprice").alias("max_price"),
            stable_avg("p_retailprice").alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
        .orderBy("p_type", "p_brand")
    )


_REVENUE_SQL = f"""
        SELECT n_name,
               {dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
"""


@query(
    "sql_entrypoint_revenue",
    ids=("J4", "A7", "A8"),
    # Same ANSI SQL text runs in both engines — the oracle IS the query.
    oracle=_REVENUE_SQL,
)
def sql_entrypoint_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``spark.sql`` entry point with implicit-join SQL syntax —
    exactly the lab's `select w.*, s.* from weather w, station s where ...`
    form (303-spark-sql/README.md:101). Catalyst turns the conjunctive
    WHERE into equi-joins and broadcast-plans the small nation side."""
    for name in ("customer", "orders", "lineitem", "nation"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_REVENUE_SQL)


@query(
    "revenue_forecast_filter",
    ids=("P3", "A4"),
    oracle=f"""
        SELECT {dsum('l_extendedprice * l_discount')} AS revenue_delta,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.04 AND 0.07
          AND l_quantity < 24
    """,
)
def revenue_forecast_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — every predicate
    pushes into the parquet scan, zero joins, one partial/final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.04, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "shipping_priority",
    ids=("J1", "J6", "A7", "O2", "O4"),
    oracle=f"""
        SELECT l_orderkey,
               {dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
               CAST(o_orderdate AS VARCHAR) AS orderdate,
               o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1995-06-30'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> grouped revenue ->
    top-10 (limit after a total order; the sort input is already reduced
    to one row per order)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        "c_mktsegment = 'BUILDING'"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-06-30").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "priority_shipmode_matrix",
    ids=("A7", "A9", "P6"),
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def priority_shipmode_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional-count pivot via CASE aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "promo_revenue_share",
    ids=("J1", "A4", "P6"),
    oracle=f"""
        SELECT
            100.0 * {dsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
                  / {dsum('l_extendedprice * (1 - l_discount)')} AS promo_share
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio over a broadcast join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (100.0 * money_sum(promo) / money_sum(rev)).alias("promo_share")
        )
    )


@query(
    "large_volume_customers",
    ids=("J6", "A4", "O2"),
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey, sum(l_quantity) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(l_quantity) > 150
        )
        SELECT c_custkey, c_name, o_orderkey, total_qty,
               o_totalprice
        FROM big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate as the join's left
    side (another aggregate-below-join authoring)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "total_qty", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "exists_returned_orders",
    ids=("J4", "A9"),
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def exists_returned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped correlated EXISTS: orders in a date window with at
    least one returned lineitem, counted per priority. Written as SQL so
    Catalyst's subquery decorrelation (RewritePredicateSubquery -> left
    semi join) is under test; the date filter prunes the probe side
    before the semi join at 100 TB, and the semi join stops at first
    match instead of multiplying rows."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# exact-decimal per-part average (see DSUM note above): both engines
# accumulate the same DECIMAL sum, so the 0.2*avg threshold is
# bit-identical and borderline rows cannot flip between them
_PART_AVG = (
    "0.2 * (CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS STRING)"
    " AS DOUBLE) / count(*))"
)


@query(
    "small_quantity_revenue",
    ids=("J1", "A4"),
    oracle=f"""
        WITH thresholds AS (
            SELECT l_partkey AS t_partkey, {_PART_AVG} AS max_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT {dsum('l_extendedprice')} / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN thresholds ON t_partkey = l_partkey
        WHERE p_brand = 'Brand#23' AND l_quantity < max_qty
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated scalar subquery: revenue from orders
    below 20% of the part's average quantity. Written as SQL with the
    correlated aggregate subquery so Catalyst's decorrelation
    (RewriteCorrelatedScalarSubquery -> aggregate + join) is exercised;
    the oracle states the decorrelated form explicitly. At scale the
    per-part aggregate shuffles once on l_partkey — the same key the
    join needs, so the exchange is reused — and the brand filter
    broadcasts the pruned part side."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        f"""
        SELECT {dsum('l_extendedprice')} / 7.0 AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#23'
          AND l_quantity < (
              SELECT {_PART_AVG}
              FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
        """
    )


@query(
    "cube_order_stats",
    ids=("A7", "A9"),
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n_orders,
               {dsum('o_totalprice')} AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate with grouping_id over (status, priority): all four
    grouping sets in ONE pass (Spark expands the cube in the Expand
    operator before a single hash aggregate — no second scan of a
    100 TB fact table per grouping set)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "sum_price")
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "sql_udf_revenue",
    ids=("J4", "A4"),
    oracle=f"""
        SELECT l_returnflag,
               {dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDF (CREATE FUNCTION ... RETURN expr, Spark 4): a named,
    catalog-registered scalar function whose BODY is SQL — it inlines
    into the plan at analysis time, so unlike Python UDFs it costs
    nothing (stays inside whole-stage codegen, pushdown still works).
    The oracle states the inlined expression directly, proving the
    function call is pure sugar."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    return spark.sql(
        f"""
        SELECT l_returnflag,
               {dsum('disc_price(l_extendedprice, l_discount)')} AS revenue
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "important_part_types",
    ids=("A7", "A8", "J4"),
    oracle=f"""
        SELECT p_type,
               {dsum('l_extendedprice * (1 - l_discount)')} AS type_revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_type
        HAVING {dsum('l_extendedprice * (1 - l_discount)')} > (
            SELECT 0.02 * {dsum('l_extendedprice * (1 - l_discount)')}
            FROM lineitem
        )
        ORDER BY type_revenue DESC, p_type
    """,
)
def important_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped HAVING with a global scalar subquery: part types
    whose revenue exceeds 2% of TOTAL revenue. Catalyst evaluates the
    uncorrelated subquery once (a separate tiny job whose single row
    embeds into the filter), so the fact table is scanned twice — once
    per aggregate — but never joined against itself row-wise; at 100 TB
    you'd cache the joined+discounted frame across the two scans. The
    threshold arithmetic is DECIMAL-exact on both engines, so boundary
    types cannot flip."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        f"""
        SELECT p_type,
               {dsum('l_extendedprice * (1 - l_discount)')} AS type_revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_type
        HAVING {dsum('l_extendedprice * (1 - l_discount)')} > (
            SELECT 0.02 * {dsum('l_extendedprice * (1 - l_discount)')}
            FROM lineitem
        )
        ORDER BY type_revenue DESC, p_type
        """
    )


@query(
    "orders_price_bands",
    ids=("J1", "A7"),
    oracle=f"""
        WITH bands(band, lo, hi) AS (VALUES
            ('budget',   0.0,      150000.0),
            ('mid',      150000.0, 300000.0),
            ('premium',  300000.0, 450000.0),
            ('luxury',   450000.0, 1e18)
        )
        SELECT band, count(*) AS n_orders,
               {dsum('o_totalprice')} AS band_revenue
        FROM orders JOIN bands
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
        ORDER BY band
    """,
)
def orders_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a band dimension — the non-equi join
    family the reference never exercises. The band table is rows-few by
    construction, so Catalyst plans a broadcast nested-loop join: each
    fact row tests 4 intervals in place, no shuffle, no row explosion
    beyond the single matching band (bands are disjoint). At 100 TB a
    non-broadcastable range join would instead bucket the fact side by
    a quantized band key first — the zorder/bucketing story."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("budget", 0.0, 150000.0),
            ("mid", 150000.0, 300000.0),
            ("premium", 300000.0, 450000.0),
            ("luxury", 450000.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("band_revenue"),
        )
        .orderBy("band")
    )


# ONE statement for both engines: the SQL is dialect-common, so oracle
# and Spark interpolate the same constant — an edit cannot drift them
_GROUPING_SETS_SQL = f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               {dsum('o_totalprice')} AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@query("grouping_sets_revenue", ids=("A7",), oracle=_GROUPING_SETS_SQL)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — arbitrary grouping combinations beyond
    cube/rollup's fixed lattices (here: per-status and per-priority
    totals in ONE pass, no ALL-pairs cell). Same Expand-then-single-
    aggregate plan as cube_order_stats: grouping sets never mean
    re-scanning the fact table per set."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)


_LATERAL_TOP_ORDER_SQL = """
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice
             FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 1) o
    ORDER BY c.c_custkey
"""


@query(
    "lateral_top_order_per_customer",
    ids=("J4", "O5"),
    oracle=_LATERAL_TOP_ORDER_SQL,
)
def lateral_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:2016 lateral derived table,
    Spark 4): each customer's single most expensive order, written as
    the per-row subquery users port from OLTP SQL. Catalyst
    DECORRELATES it into the same ranked-window/aggregate shape as the
    explicit top-N-per-group query (top_parts_per_year) — no
    per-customer re-execution — so the declarative form costs what the
    hand-rewritten one does. The oracle runs the IDENTICAL SQL in
    DuckDB; customers with no orders drop out (inner lateral join),
    and ties break on o_orderkey for determinism."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_TOP_ORDER_SQL)
