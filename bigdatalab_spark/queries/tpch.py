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
DSUM = "CAST(sum(CAST({x} AS DECIMAL(28,6))) AS DOUBLE)"


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
