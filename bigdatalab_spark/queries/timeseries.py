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


@query(
    "cogroup_click_attribution",
    ids=("SCALE-COGROUP", "UDF-COGROUP"),
    oracle="""
        WITH p AS (
            SELECT event_id, user_id, ts,
                   CAST(round(value * 100) AS BIGINT) AS purchase_cents
            FROM events WHERE event_type = 'purchase'
        ), c AS (
            SELECT user_id, ts,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, p.purchase_cents,
               count(c.ts) AS clicks_before,
               CAST(coalesce(sum(c.cents), 0) AS BIGINT)
                   AS click_cents_before
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id AND c.ts < p.ts
        GROUP BY 1, 2, 3
        ORDER BY p.event_id
    """,
)
def cogroup_click_attribution_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-purchase attribution over the user's earlier clicks via the
    cogrouped-Arrow surface (operators/cogroup.py ``applyInArrow``):
    both event streams are hash-partitioned once on user_id, and a
    ``searchsorted``/``cumsum`` numpy kernel answers every purchase in
    O(log m) against that user's sorted click history — the per-key
    ALGORITHMIC merge the cogroup API exists for. Arrow-native batches
    (guide §4.2): the kernel is invoked once per user key, and skipping
    the per-key Arrow→pandas→Arrow conversion of the ``applyInPandas``
    twin measured 6× on 1,500 keys (6.8 → 1.1 s at sf0.1) with
    byte-identical answers — the pandas twin stays in
    operators/cogroup.py, equality-pinned by test. The oracle replays
    it relationally (LEFT JOIN + GROUP BY, which materializes the
    quadratic pairs the kernel never builds); integer-cents arithmetic
    keeps both engines bit-identical."""
    from bigdatalab_spark.operators.cogroup import (
        cogroup_click_attribution_arrow,
    )

    ev = load_table(spark, sf_dir, "events")
    return cogroup_click_attribution_arrow(ev).orderBy("event_id")


def _hist_oracle() -> str:
    from bigdatalab_spark.scale.quantiles import _bin_expr, _mid_expr

    b = _bin_expr("c", 16)
    return f"""
        WITH cents AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        daily AS (
            SELECT event_type, day, {b} AS bin, count(*) AS cnt
            FROM cents GROUP BY 1, 2, 3
        ),
        merged AS (
            SELECT event_type, bin, sum(cnt) AS cnt
            FROM daily GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, bin,
                   sum(cnt) OVER (PARTITION BY event_type
                                  ORDER BY bin) AS cum,
                   sum(cnt) OVER (PARTITION BY event_type) AS n
            FROM merged
        ),
        picked AS (
            SELECT event_type, CAST(max(n) AS BIGINT) AS n,
                   min(CASE WHEN cum * 100 >= 50 * n THEN bin END) AS b50,
                   min(CASE WHEN cum * 100 >= 95 * n THEN bin END) AS b95,
                   min(CASE WHEN cum * 100 >= 99 * n THEN bin END) AS b99
            FROM cum GROUP BY event_type
        )
        SELECT event_type, n,
               {_mid_expr("b50", 16)} AS p50_est,
               {_mid_expr("b95", 16)} AS p95_est,
               {_mid_expr("b99", 16)} AS p99_est
        FROM picked
        ORDER BY event_type
    """


@query(
    "histogram_value_quantiles",
    ids=("SCALE-SKETCH", "A12", "A5"),
    oracle=_hist_oracle(),
)
def histogram_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from the PERSISTABLE log-histogram pre-aggregate
    (scale/quantiles.py) — the percentile twin of the bitmap
    exact-distinct: daily ``(group, bin, cnt)`` histograms are plain
    data, so they land in parquet and MERGE by summing counts; p50/p95/
    p99 for any day range are then answered from a few hundred bin rows
    per group, never re-reading raw values — which percentile_approx's
    buffer-bound GK sketch cannot do. Exact integer binning (length of
    the base-2 string, integer-safe sub-bin division) keeps the DuckDB
    replay of the full pipeline — daily bins -> merge -> rank pick —
    bit-identical, including the double midpoint arithmetic."""
    from bigdatalab_spark.scale.quantiles import (
        histogram_bins,
        merge_histograms,
        quantiles_from_histogram,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = histogram_bins(ev, "value", ["event_type", "day"])
    merged = merge_histograms(daily, ["event_type"])
    res = quantiles_from_histogram(
        merged, ["event_type"], [0.5, 0.95, 0.99]
    )
    return res.orderBy("event_type")
