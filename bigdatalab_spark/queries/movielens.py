"""Top-N-per-group — the MovieLens capstone shape (SURVEY §2.5 O5).

The reference's hardest batch job (Exercise.scala:288-344,
ExerciseComplete.scala:354-379): average rating per (movie, year),
top-10 per year, enriched from broadcast dimension maps. Re-expressed
on the warehouse: average revenue per (part, ship-year) from lineitem,
top-5 parts per year, enriched with part attributes via broadcast join.

This is the reference's only window-function-shaped computation; the
groupByKey+sortBy-per-group it hand-codes becomes ``row_number()`` over
a partitioned window — which shuffles once on the window key instead of
materializing whole groups in executor memory (no OOM on skewed groups
at 100 TB; Spark's window exec spills).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdatalab_spark.operators import money_sum, stable_avg
from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.queries.tpch import davg, dsum
from bigdatalab_spark.sources import load_table


@query(
    "top_parts_per_year",
    ids=("O5", "J3", "J7", "A4", "A7"),
    oracle=f"""
        WITH agg AS (
            SELECT year(l_shipdate) AS ship_year, l_partkey,
                   {davg('l_extendedprice')} AS avg_price,
                   count(*) AS n_lines
            FROM lineitem
            GROUP BY ship_year, l_partkey
        ), ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY ship_year
                       ORDER BY avg_price DESC, l_partkey) AS rank
            FROM agg
        )
        SELECT ship_year, rank, l_partkey, p_name, p_brand, avg_price, n_lines
        FROM ranked JOIN part ON l_partkey = p_partkey
        WHERE rank <= 5
        ORDER BY ship_year, rank
    """,
)
def top_parts_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregate -> rank within year -> broadcast-enrich.

    Order of operations mirrors the reference's optimized solution
    (ExerciseComplete.scala:364-369): aggregate FIRST (shrinks the fact
    table to |parts|x|years| rows), rank, and only then join the
    dimension — onto the tiny ranked result, not the fact table.
    Deterministic tie-break on l_partkey (SURVEY §7.4.4).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    agg = (
        li.groupBy(F.year("l_shipdate").alias("ship_year"), "l_partkey")
        .agg(
            stable_avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    w = Window.partitionBy("ship_year").orderBy(
        F.desc("avg_price"), F.asc("l_partkey")
    )
    ranked = agg.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
    return (
        ranked.join(F.broadcast(part), ranked.l_partkey == part.p_partkey)
        .select(
            "ship_year", "rank", "l_partkey", "p_name", "p_brand", "avg_price", "n_lines"
        )
        .orderBy("ship_year", "rank")
    )


@query(
    "top_customers_per_segment",
    ids=("O5", "O2", "A4"),
    oracle=f"""
        WITH spend AS (
            SELECT c_mktsegment, c_custkey, c_name,
                   {dsum('o_totalprice')} AS total_spent
            FROM customer JOIN orders ON o_custkey = c_custkey
            GROUP BY c_mktsegment, c_custkey, c_name
        )
        SELECT c_mktsegment, rnk, c_custkey, c_name, total_spent
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY total_spent DESC, c_custkey) AS rnk
            FROM spend
        )
        WHERE rnk <= 3
        ORDER BY c_mktsegment, rnk
    """,
)
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second top-N variant: top spenders per market segment."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(money_sum("o_totalprice").alias("total_spent"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total_spent"), F.asc("c_custkey")
    )
    return (
        spend.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "c_custkey", "c_name", "total_spent")
        .orderBy("c_mktsegment", "rnk")
    )
