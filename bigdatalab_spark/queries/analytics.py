"""Distinct counts, global indexing, set operations (SURVEY §2.4 A10-A11,
§2.2 P10, §2.6).

Set operations are absent from the reference but free DataFrame built-ins
(SURVEY §2.6); registered here so the capability is declared and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.sources import load_table


@query(
    "distinct_users_per_type",
    ids=("A11",),
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count (agg(countDistinct(...)) form,
    304-streaming/spark/README.md:187-188)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "event_row_number",
    ids=("P10",),
    oracle="""
        SELECT idx, event_id, user_id
        FROM (
            SELECT row_number() OVER (ORDER BY event_id) - 1 AS idx,
                   event_id, user_id
            FROM events
        )
        WHERE idx < 100
        ORDER BY idx
    """,
)
def event_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zipWithIndex (301-solutions.scala:56) as row_number over an explicit
    total order — deterministic under any partitioning, unlike
    monotonically_increasing_id (SURVEY §7.4.6).

    NOTE the scale tradeoff: a global row_number over an un-partitioned
    window funnels through one task. At 100 TB you'd zipWithIndex via
    per-partition offsets or use the file offset itself; we cap the
    output at 100 rows so the single-task sort stays tiny.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id")
    return (
        events.select(
            (F.row_number().over(w) - 1).alias("idx"), "event_id", "user_id"
        )
        .filter(F.col("idx") < 100)
        .orderBy("idx")
    )


@query(
    "segment_set_ops",
    ids=("§2.6",),
    oracle="""
        WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        SELECT
            (SELECT count(*) FROM (SELECT * FROM building UNION SELECT * FROM rich))        AS n_union,
            (SELECT count(*) FROM (SELECT * FROM building INTERSECT SELECT * FROM rich))    AS n_intersect,
            (SELECT count(*) FROM (SELECT * FROM building EXCEPT SELECT * FROM rich))       AS n_except
    """,
)
def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except over customer key sets."""
    customer = load_table(spark, sf_dir, "customer")
    building = customer.filter("c_mktsegment = 'BUILDING'").select("c_custkey")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return spark.createDataFrame(
        [
            (
                building.union(rich).distinct().count(),
                building.intersect(rich).count(),
                building.exceptAll(rich).distinct().count(),
            )
        ],
        "n_union long, n_intersect long, n_except long",
    )


@query(
    "sampled_count_bounds",
    ids=("P11",),
    oracle=None,  # sampling is engine-specific; rows-only check
)
def sampled_count_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sample(0.1) (Exercise.scala:168) with a fixed seed; no oracle since
    Bernoulli sampling RNG is engine-specific. Returns the sampled count
    plus expected bounds so the rows-only check still carries signal."""
    li = load_table(spark, sf_dir, "lineitem")
    total = li.count()
    sampled = li.sample(fraction=0.1, seed=42).count()
    return spark.createDataFrame(
        [(total, sampled, int(total * 0.05), int(total * 0.15))],
        "n_total long, n_sampled long, lower long, upper long",
    )
