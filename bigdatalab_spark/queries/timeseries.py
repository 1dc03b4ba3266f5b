"""Hypertable-style multi-resolution rollups over the events table —
the continuous-aggregate shape time-series stores maintain (beyond the
reference's surface; registered after the SURVEY-core top-50).

The defining property: each coarser resolution re-aggregates the next
finer level's PARTIALS (count/decimal-sum/max are algebraic), so the
raw table is scanned once and the hour->day->month cascade operates on
aggregate-sized data. At 100 TB that is the difference between one scan
plus two tiny re-groups and three full scans; Catalyst expresses it as
a ReusedExchange of the hourly aggregation subtree across the union
branches (pinned in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.operators.aggregates import DECIMAL
from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.sources import load_table

# decimal kept through every level; rendered to double only at the end
# via the string path (correctly rounded at any magnitude in BOTH
# engines — see queries/tpch.py DSUM note)
_RENDER = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"


@query(
    "multires_event_rollup",
    ids=("SCALE-ROLLUP", "A4", "A5"),
    oracle=f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS bucket,
                   count(*) AS n_events,
                   sum(CAST(value AS DECIMAL(28,6))) AS sv,
                   max(value) AS max_value
            FROM events
            GROUP BY bucket
        ),
        daily AS (
            -- date_trunc('day'/'month') returns DATE in DuckDB but
            -- TIMESTAMP in Spark; cast back so bucket_ts renders alike
            SELECT CAST(date_trunc('day', bucket) AS TIMESTAMP) AS bucket,
                   CAST(sum(n_events) AS BIGINT) AS n_events,
                   sum(sv) AS sv,
                   max(max_value) AS max_value
            FROM hourly
            GROUP BY 1
        ),
        monthly AS (
            SELECT CAST(date_trunc('month', bucket) AS TIMESTAMP) AS bucket,
                   CAST(sum(n_events) AS BIGINT) AS n_events,
                   sum(sv) AS sv,
                   max(max_value) AS max_value
            FROM daily
            GROUP BY 1
        )
        SELECT resolution, bucket_ts, n_events, sum_value, max_value
        FROM (
            SELECT 'hour' AS resolution, CAST(bucket AS VARCHAR) AS bucket_ts,
                   n_events, {_RENDER.format(x='sv')} AS sum_value, max_value
            FROM hourly
            UNION ALL
            SELECT 'day', CAST(bucket AS VARCHAR), n_events,
                   {_RENDER.format(x='sv')}, max_value
            FROM daily
            UNION ALL
            SELECT 'month', CAST(bucket AS VARCHAR), n_events,
                   {_RENDER.format(x='sv')}, max_value
            FROM monthly
        )
        ORDER BY resolution, bucket_ts
    """,
)
def multires_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour/day/month event rollup where day is computed FROM the hourly
    partials and month FROM the daily ones (count, exact decimal sum,
    max are all algebraic): one scan of events, re-grouped twice at
    aggregate size. The union's shared hourly subtree dedupes to a
    ReusedExchange, so the scan really does happen once."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DECIMAL)).alias("sv"),
        F.max("value").alias("max_value"),
    )

    def up(df: DataFrame, level: str) -> DataFrame:
        return df.groupBy(F.date_trunc(level, F.col("bucket")).alias("bucket")).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sv").alias("sv"),
            F.max("max_value").alias("max_value"),
        )

    daily = up(hourly, "day")
    monthly = up(daily, "month")

    def fin(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.lit(tag).alias("resolution"),
            F.col("bucket").cast("string").alias("bucket_ts"),
            "n_events",
            F.col("sv").cast("double").alias("sum_value"),
            "max_value",
        )

    return (
        fin(hourly, "hour")
        .unionByName(fin(daily, "day"))
        .unionByName(fin(monthly, "month"))
        .orderBy("resolution", "bucket_ts")
    )


_QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
_ACC = 100_000  # rank error 1/_ACC; exceeds per-group cardinality at
# every test sf, so the sketch answer is rank-EXACT here (strict
# oracle); at 100 TB dial accuracy to ~10^4 and accept 10^-4 rank error


@query(
    "approx_value_quantiles",
    ids=("SCALE-SKETCH", "A12"),
    oracle=f"""
        SELECT event_type,
               {", ".join(
                   f"quantile_disc(value, {p}) AS q{int(p * 100)}"
                   for p in _QS
               )},
               CAST(count(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series value quantiles via the mergeable GK quantile sketch
    (``percentile_approx``) — the fourth sketch beside HLL / Bloom /
    Count-Min: one pass, partial-aggregated map-side (sketches merge,
    so the shuffle carries one sketch per (partition, group), never the
    values), no sort. Discrete percentiles return an actual data
    element, which is what makes the DuckDB ``quantile_disc`` replay
    strict: with accuracy above the group cardinality the rank is
    exact, so both engines pick the identical element bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    qs = ev.groupBy("event_type").agg(
        F.percentile_approx("value", list(_QS), _ACC).alias("qs"),
        F.count(F.lit(1)).alias("n"),
    )
    return qs.select(
        "event_type",
        *[
            F.element_at("qs", i + 1).alias(f"q{int(p * 100)}")
            for i, p in enumerate(_QS)
        ],
        "n",
    ).orderBy("event_type")
