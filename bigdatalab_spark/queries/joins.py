"""Join queries (SURVEY §2.3 J1-J7) over the synthetic warehouse.

Each reference join strategy re-expressed declaratively:

- J1/J2 shuffle equi-join on a composite key -> Catalyst picks
  sort-merge / shuffled-hash; AQE re-plans at runtime. The reference's
  manual ``HashPartitioner(8)`` co-partitioning (Exercise.scala:137-143)
  is ``EnsureRequirements`` reusing output partitioning.
- J3/J5 broadcast join -> ``F.broadcast`` replaces the hand-rolled
  ``sc.broadcast(collectAsMap)`` (ExerciseComplete.scala:240-248).
- J6 multi-way join -> chained joins, Catalyst reorders.
- J7 left-outer enrichment of an aggregate onto broadcast dims
  (ExerciseComplete.scala:354-369).

Plus the reference's hand-taught plan rewrite the optimizer does NOT do
(303-solutions.scala:45 "Catalyst does not push down aggregations"):
``preagg_revenue_join`` keeps the pre-aggregate-then-join shape in the
query text itself. At 100 TB this is the difference between shuffling
the fact table and shuffling one row per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.operators import money_sum, stable_avg
from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.queries.tpch import davg, dsum
from bigdatalab_spark.sources import load_table


@query(
    "customer_nation_region",
    ids=("J1", "J3", "J5", "J6", "A7"),
    oracle=f"""
        SELECT r_name, n_name,
               count(*) AS n_customers,
               {davg('c_acctbal')} AS avg_balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
)
def customer_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ two broadcast dims, then grouped avg. nation/region are tiny
    at any scale factor — broadcast them explicitly so zero shuffles of
    the customer side happen before aggregation."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            stable_avg("c_acctbal").alias("avg_balance"),
        )
        .orderBy("r_name", "n_name")
    )


@query(
    "lineitem_part_supplier",
    ids=("J1", "J6", "A7"),
    oracle=f"""
        SELECT p_brand, s_name,
               {dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
               sum(l_quantity) AS total_qty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY p_brand, s_name
        ORDER BY p_brand, s_name
    """,
)
def lineitem_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way fact-to-dim join (J6 shape, Exercise.scala:316-321).

    part/supplier stay dimension-sized relative to lineitem at every
    scale factor, so both joins broadcast; the only shuffle is the final
    group-by on (p_brand, s_name). total_qty stays a plain double sum:
    quantities are small integers, exactly representable, so the sum is
    order-independent already.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.sum("l_quantity").alias("total_qty"),
        )
        .orderBy("p_brand", "s_name")
    )


@query(
    "preagg_revenue_join",
    ids=("J3", "J7", "A4"),
    oracle=f"""
        SELECT c_custkey, c_name, n_name, agg.revenue, agg.n_orders
        FROM (
            SELECT o_custkey,
                   {dsum('o_totalprice')} AS revenue,
                   count(*) AS n_orders
            FROM orders
            GROUP BY o_custkey
        ) agg
        JOIN customer ON c_custkey = agg.o_custkey
        JOIN nation ON c_nationkey = n_nationkey
        ORDER BY revenue DESC, c_custkey
    """,
)
def preagg_revenue_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation pushdown below join, done BY HAND in the query shape —
    the one rewrite Catalyst won't do (303-solutions.scala:45,
    ExerciseComplete.scala:281-294 rdd6c/rdd6d). Aggregate orders down to
    one row per customer FIRST, then join; at 100 TB the join input
    shrinks from billions of orders to |customers| rows."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = orders.groupBy("o_custkey").agg(
        money_sum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        agg.join(customer, agg.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue", "n_orders")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
    )


@query(
    "customer_order_counts_outer",
    ids=("J7",),
    oracle=f"""
        SELECT c_custkey, c_mktsegment,
               coalesce(agg.n_orders, 0) AS n_orders,
               coalesce(agg.total_spent, 0.0) AS total_spent
        FROM customer
        LEFT JOIN (
            SELECT o_custkey, count(*) AS n_orders,
                   {dsum('o_totalprice')} AS total_spent
            FROM orders GROUP BY o_custkey
        ) agg ON c_custkey = agg.o_custkey
        ORDER BY c_custkey
    """,
)
def customer_order_counts_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer enrichment keeping no-match rows — the Option/None path
    of the reference's broadcast-map lookup (ExerciseComplete.scala:368-369
    keeps None when a movie has no tags). Customers without orders
    surface with 0 counts instead of being dropped."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders_raw"),
        money_sum("o_totalprice").alias("total_spent_raw"),
    )
    return (
        customer.join(agg, customer.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("n_orders_raw", F.lit(0)).alias("n_orders"),
            F.coalesce("total_spent_raw", F.lit(0.0)).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "uk_style_filtered_join",
    ids=("J1", "P3", "A3", "O2"),
    oracle="""
        SELECT n_name, c_mktsegment,
               max(c_acctbal) AS max_balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY n_name, c_mktsegment
        ORDER BY max_balance DESC, n_name, c_mktsegment
    """,
)
def uk_style_filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 302 'UK max temperature' shape (ExerciseComplete.scala:151-153,
    267-278): filter the dim side BEFORE the join (predicate pushdown done
    in the query, as rdd6b teaches), join, grouped max, sort desc."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.max("c_acctbal").alias("max_balance"))
        .orderBy(F.desc("max_balance"), F.asc("n_name"), F.asc("c_mktsegment"))
    )


@query(
    "semi_join_ordered_customers",
    ids=("J1", "§2.6"),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey
    """,
)
def semi_join_ordered_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (TPC-H Q4's EXISTS shape): customers with at least
    one big order — emits each match once, never duplicates, and Spark
    stops probing per key at first hit."""
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        customer.join(
            big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "anti_join_idle_customers",
    ids=("J1", "§2.6"),
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey
    """,
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (TPC-H Q22's NOT EXISTS shape): customers with no
    high-value order — the complement of the semi join, one shuffle on
    the key. (Filtered to high-value orders so the result is non-empty
    at every scale factor: every synthetic customer has SOME order.)"""
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        customer.join(
            big_orders, customer.c_custkey == big_orders.o_custkey, "left_anti"
        )
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")
    )


@query(
    "below_avg_quantity_revenue",
    ids=("J1", "A4"),
    oracle=f"""
        SELECT {dsum('l_extendedprice')} AS total_price, count(*) AS n_lines
        FROM lineitem
        WHERE l_quantity < (
            SELECT 0.5 * avg(l_quantity)
            FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey
        )
    """,
)
def below_avg_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): lineitems below half
    their part's average quantity. Catalyst decorrelates this into an
    aggregate + join — the per-part average is computed ONCE, not per
    row (the plan a hand-rolled SQL engine would need a rewrite pass
    for). Note: double avg per part is safe unrounded here because the
    filter compares, not emits, the average — and counts/sums of the
    surviving integer-quantity rows are representation-stable."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS total_price,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_quantity < (
            SELECT 0.5 * avg(l_quantity)
            FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey
        )
        """
    )


@query(
    "multi_distinct_agg",
    ids=("A7", "A11"),
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               sum(l_quantity) AS total_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def multi_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates + a plain aggregate in one groupBy —
    Catalyst's Expand-based rewrite (each distinct column gets its own
    grouping replica); absent from the reference (SURVEY §2.4 note),
    declared here."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.sum("l_quantity").alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )
