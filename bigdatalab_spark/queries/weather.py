"""Weather-shaped queries on the ``events`` table (SURVEY §2.4 A3/A4).

The reference's temperature jobs — max per period with a
missing-sentinel filter (MaxTemperatureMapper.java:22 ``!= 9999``,
Exercise.scala:58 ``< 999``) and (sum,count)-buffer averages
(ExampleWeather2.scala:31-33) — mapped onto the events stream table.
The actual fixed-width ISD parse adapter is exercised in
tests/test_sources.py against reference-format fixture lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.operators import money_sum, stable_avg
from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.queries.tpch import davg, dsum
from bigdatalab_spark.sources import load_table


@query(
    "max_value_per_month",
    ids=("A3", "P3", "O1"),
    oracle="""
        SELECT year(ts) AS y, month(ts) AS m,
               max(value) AS max_value
        FROM events
        WHERE value < 999
        GROUP BY y, m
        ORDER BY y, m
    """,
)
def max_value_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped max with sentinel filter + sort by key — the
    MaxTemperature job shape."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("value") < 999)
        .groupBy(F.year("ts").alias("y"), F.month("ts").alias("m"))
        .agg(F.max("value").alias("max_value"))
        .orderBy("y", "m")
    )


@query(
    "avg_value_per_type",
    ids=("A4", "A5", "O2"),
    oracle=f"""
        SELECT event_type,
               {davg('value')} AS avg_value,
               {dsum('value', 4)} AS sum_value,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY avg_value DESC, event_type
    """,
)
def avg_value_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped average sorted by value descending — the avg-temperature
    job plus the swap-then-sort trick (301-solutions.scala:68), which at
    DataFrame level is just orderBy on the aggregate column."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            stable_avg("value").alias("avg_value"),
            money_sum("value").alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.desc("avg_value"), F.asc("event_type"))
    )


@query(
    "event_props_json",
    ids=("S6",),
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE)
                   / count(json_extract_string(props, '$.k')) AS avg_k,
               max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column extraction (the 303 JSON-source
    capability applied to an embedded JSON string column)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.groupBy("event_type")
        .agg(
            (F.sum(k).cast("double") / F.count(k)).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "event_attrs_xml",
    ids=("S6",),
    oracle="""
        SELECT event_id, event_type, value, user_id
        FROM events
        WHERE event_id < 200
        ORDER BY event_id
    """,
)
def event_attrs_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML column round-trip (Spark 4 native ``to_xml``/``from_xml`` —
    the spark-xml package folded into core): typed event attributes
    serialize to an XML fragment and parse back to the same types.
    The oracle selects the base columns directly, so any fidelity loss
    in either direction (double formatting, NULL element omission)
    breaks the value hash. File-level XML scan is
    :func:`bigdatalab_spark.sources.readers.read_xml` (pytest)."""
    events = load_table(spark, sf_dir, "events").filter("event_id < 200")
    xml = events.select(
        "event_id",
        F.to_xml(F.struct("event_type", "value", "user_id")).alias("x"),
    )
    return (
        xml.select(
            "event_id",
            F.from_xml(
                "x", "event_type STRING, value DOUBLE, user_id BIGINT"
            ).alias("s"),
        )
        .select("event_id", "s.event_type", "s.value", "s.user_id")
        .orderBy("event_id")
    )
