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
    """zipWithIndex (301-solutions.scala:56) — deterministic global index
    by event_id, via the scale-safe per-partition-offset operator
    (:func:`bigdatalab_spark.operators.zip_with_index`): range partition,
    per-partition counts -> cumulative offsets, windowed rank WITHIN each
    partition. No single-task global sort anywhere in the plan (round 1
    used an un-partitioned row_number window, which funnels the whole
    table through one task at scale)."""
    from bigdatalab_spark.operators import zip_with_index

    events = load_table(spark, sf_dir, "events")
    indexed = zip_with_index(
        events.select("event_id", "user_id"), "event_id"
    )
    return (
        indexed.select("idx", "event_id", "user_id")
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


@query(
    "salted_skew_agg",
    ids=("A4", "A5", "§2.10"),
    oracle="""
        SELECT l_returnflag,
               sum(l_quantity) AS total_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation over a 3-value (maximally
    skewed) key — result identical to the direct groupBy, structure
    splits each hot key across 16 salt subkeys first."""
    from bigdatalab_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        ["l_returnflag"],
        partial_aggs=[
            F.sum("l_quantity").alias("s"),
            F.count(F.lit(1)).alias("c"),
        ],
        merge_aggs=[
            F.sum("s").alias("total_qty"),
            F.sum("c").alias("n"),
        ],
    ).orderBy("l_returnflag")


@query(
    "table_profile",
    ids=("A3", "A4", "A10", "A11"),
    oracle="""
        SELECT 'o_totalprice' AS col, count(*) AS n_rows,
               count(o_totalprice) AS n_non_null,
               count(DISTINCT o_totalprice) AS n_distinct,
               CAST(min(o_totalprice) AS VARCHAR) AS min_val,
               CAST(max(o_totalprice) AS VARCHAR) AS max_val
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*), count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               CAST(min(o_orderpriority) AS VARCHAR),
               CAST(max(o_orderpriority) AS VARCHAR)
        FROM orders
        ORDER BY col
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (count / nulls / distinct / min / max) — the
    data-quality sweep a training pipeline runs before ingestion; one
    pass per profiled column set via a single multi-agg projection."""
    orders = load_table(spark, sf_dir, "orders")
    profiles = []
    for c in ("o_totalprice", "o_orderpriority"):
        profiles.append(
            orders.agg(
                F.lit(c).alias("col"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count(c).alias("n_non_null"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_val"),
                F.max(c).cast("string").alias("max_val"),
            )
        )
    out = profiles[0]
    for p in profiles[1:]:
        out = out.union(p)
    return out.orderBy("col")


@query(
    "rollup_revenue",
    ids=("A7", "§2.6"),
    oracle="""
        SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
               CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
               count(*) AS n,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP — beyond the reference's surface
    (SURVEY §2.4 notes no grouping sets) but a free Catalyst built-in the
    engine declares. Subtotal rows are labeled 'ALL' via grouping() —
    NOT via coalesce(col, 'ALL'), which would merge genuine NULL data
    values into the subtotal label on a corpus with nullable keys."""
    from bigdatalab_spark.operators import money_sum

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("o_totalprice").alias("revenue"),
            # grouping() is only resolvable inside the rollup aggregate
            F.grouping("o_orderstatus").alias("_g_status"),
            F.grouping("o_orderpriority").alias("_g_priority"),
        )
        .select(
            F.when(F.col("_g_status") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            F.when(F.col("_g_priority") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            "n",
            "revenue",
        )
        .orderBy("status", "priority")
    )


@query(
    "pivot_status_by_segment",
    ids=("A7", "A9"),
    oracle="""
        SELECT c_mktsegment,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with pinned pivot values (pinning avoids the
    extra distinct-values job AND keeps the output schema stable at any
    scale)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "user_running_stats",
    ids=("O5", "SCALE-CURATION"),
    oracle="""
        SELECT event_id, user_id,
               CAST(CAST(sum(CAST(value AS DECIMAL(28,6)))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS STRING) AS DOUBLE) AS running_value,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS BIGINT) AS seq_no,
               CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS INT) AS time_quartile,
               percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id)
                   AS value_pct_rank
        FROM events
        ORDER BY user_id, seq_no
    """,
)
def user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user analytic-window family: running sum, sequence number,
    ntile quartile, percent_rank — the remaining ranking/running window
    shapes beyond top-N (O5) and lag (event_gap_stats). One hash
    exchange on user_id serves all four functions (same partition spec);
    the running sum accumulates in DECIMAL because engines disagree on
    windowed double addition order (DuckDB uses a segment tree, Spark a
    sequential prefix — exact decimal makes the oracle order-proof)."""
    ev = load_table(spark, sf_dir, "events")
    wt = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wv = Window.partitionBy("user_id").orderBy("value", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.sum(F.col("value").cast("decimal(28,6)"))
            .over(wt)
            .cast("double")
            .alias("running_value"),
            F.row_number().over(wt).cast("bigint").alias("seq_no"),
            F.ntile(4).over(wt).alias("time_quartile"),
            F.percent_rank().over(wv).alias("value_pct_rank"),
        )
        .orderBy("user_id", "seq_no")
    )


@query(
    "event_type_crosstab",
    ids=("A9", "A7"),
    oracle="""
        WITH pairs AS (
            SELECT e.event_type, c.c_mktsegment
            FROM events e
            JOIN customer c ON c.c_custkey = e.user_id % 1500
        )
        SELECT event_type AS event_type_c_mktsegment,
               count(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS "AUTOMOBILE",
               count(*) FILTER (c_mktsegment = 'BUILDING')   AS "BUILDING",
               count(*) FILTER (c_mktsegment = 'FURNITURE')  AS "FURNITURE",
               count(*) FILTER (c_mktsegment = 'HOUSEHOLD')  AS "HOUSEHOLD",
               count(*) FILTER (c_mktsegment = 'MACHINERY')  AS "MACHINERY"
        FROM pairs
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def event_type_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via ``stat.crosstab`` — the DataFrameStat
    surface the sketches module doesn't cover. Crosstab is exact (a
    pivoted count(*) — one hash aggregate over both columns, then the
    tiny distinct-value pivot), so unlike freqItems it oracles
    strictly. The user_id%1500 join key maps events onto the customer
    dim so the table is a genuine two-table contingency."""
    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    pairs = ev.join(
        cust, cust["c_custkey"] == ev["user_id"] % 1500
    ).select("event_type", "c_mktsegment")
    ct = pairs.stat.crosstab("event_type", "c_mktsegment")
    # crosstab emits columns only for OBSERVED values; pad to the fixed
    # TPC-H segment domain so the schema is sf-invariant
    out = ct.select(
        "event_type_c_mktsegment",
        *[
            (F.col(s) if s in ct.columns else F.lit(0)).cast("bigint").alias(s)
            for s in segments
        ],
    ).orderBy("event_type_c_mktsegment")
    return out


_Z_BITS = 6


def _z_sql() -> str:
    terms = []
    for j in range(_Z_BITS):
        terms.append(f"(((x >> {j}) & 1) << {2 * j})")
        terms.append(f"(((y >> {j}) & 1) << {2 * j + 1})")
    return " + ".join(terms)


@query(
    "zorder_clustering_key",
    ids=("P6", "O1"),
    oracle=f"""
        WITH dims AS (
            SELECT event_id,
                   CAST(user_id % 64 AS BIGINT) AS x,
                   CAST(day(ts) % 64 AS BIGINT) AS y
            FROM events
        )
        SELECT event_id, x, y,
               CAST({_z_sql()} AS BIGINT) AS z_key
        FROM dims
        ORDER BY z_key, event_id
    """,
)
def zorder_clustering_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: interleave the bits of two
    dimension columns so sorting by ONE key co-locates rows that are
    close in BOTH — the multi-dimensional data-skipping layout (what
    lakehouse OPTIMIZE ZORDER BY computes before a sorted write). Rows
    near each other in (user bucket, day) land in the same file, so
    min/max row-group stats prune scans filtered on EITHER dimension,
    not just the leading sort column. Pure bit arithmetic, codegen'd,
    bit-identical in the oracle."""
    from bigdatalab_spark.operators.zorder import zorder_key

    ev = load_table(spark, sf_dir, "events")
    x = (F.col("user_id") % 64).cast("bigint")
    y = (F.dayofmonth("ts") % 64).cast("bigint")
    dims = ev.select("event_id", x.alias("x"), y.alias("y"))
    return dims.select(
        "event_id",
        "x",
        "y",
        zorder_key(F.col("x"), F.col("y"), bits=_Z_BITS).alias("z_key"),
    ).orderBy("z_key", "event_id")


@query(
    "purchases_in_busy_windows",
    ids=("SCALE-RANGEJOIN",),
    oracle="""
        WITH bounds AS (SELECT min(ts) AS tmin, max(ts) AS tmax FROM events),
        grid AS (
            SELECT make_timestamp(s * 1000000) AS w_start
            FROM bounds,
                 UNNEST(generate_series(
                     CAST(floor(epoch(tmin) / 7200) * 7200 - 14400 AS BIGINT),
                     CAST(epoch(tmax) AS BIGINT),
                     7200)) AS t(s)
        ),
        busy AS (
            SELECT w_start, count(*) AS n_events
            FROM grid
            JOIN events e ON e.ts >= w_start
                         AND e.ts < w_start + INTERVAL 6 HOUR
            GROUP BY w_start
            HAVING count(*) >= 95
        )
        SELECT e.event_id,
               CAST(b.w_start AS VARCHAR) AS window_start,
               b.n_events
        FROM events e
        JOIN busy b ON e.ts >= b.w_start
                   AND e.ts < b.w_start + INTERVAL 6 HOUR
        WHERE e.event_type = 'purchase'
        ORDER BY e.event_id, window_start
    """,
)
def purchases_in_busy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval attribution via the binned range join
    (:mod:`bigdatalab_spark.operators.rangejoin`): sliding 6h/2h
    windows with >= 95 events form the interval table; each purchase
    event joins every busy window containing it as an EQUI-join on 2h
    bins — no BroadcastNestedLoopJoin/CartesianProduct (plan-asserted
    in tests), so the join survives interval tables too big to
    broadcast. The oracle builds the same epoch-aligned window grid
    and replays the containment join naively."""
    from bigdatalab_spark.operators.rangejoin import bin_range_join

    events = load_table(spark, sf_dir, "events")
    busy = (
        events.groupBy(F.window("ts", "6 hours", "2 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= 95)
        .select(
            F.unix_micros("w.start").alias("w_lo"),
            F.unix_micros("w.end").alias("w_hi"),
            F.col("w.start").cast("string").alias("window_start"),
            "n_events",
        )
    )
    purchases = events.filter("event_type = 'purchase'").select(
        "event_id", F.unix_micros("ts").alias("p_us")
    )
    joined = bin_range_join(
        purchases, busy, "p_us", "w_lo", "w_hi", bin_width=2 * 3600 * 1_000_000
    )
    return joined.select("event_id", "window_start", "n_events").orderBy(
        "event_id", "window_start"
    )


@query(
    "user_spans_in_busy_windows",
    ids=("SCALE-RANGEJOIN", "A3", "J1", "O1"),
    oracle="""
        WITH bounds AS (SELECT min(ts) AS tmin, max(ts) AS tmax FROM events),
        grid AS (
            SELECT make_timestamp(s * 1000000) AS w_start
            FROM bounds,
                 UNNEST(generate_series(
                     CAST(floor(epoch(tmin) / 7200) * 7200 - 14400 AS BIGINT),
                     CAST(epoch(tmax) AS BIGINT),
                     7200)) AS t(s)
        ),
        busy AS (
            SELECT w_start, count(*) AS n_events
            FROM grid
            JOIN events e ON e.ts >= w_start
                         AND e.ts < w_start + INTERVAL 6 HOUR
            GROUP BY w_start
            HAVING count(*) >= 95
        ),
        spans AS (
            SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                   min(ts) AS span_lo,
                   max(ts) + INTERVAL 1 MICROSECOND AS span_hi
            FROM events
            GROUP BY user_id, CAST(CAST(ts AS DATE) AS VARCHAR)
        )
        SELECT s.user_id, s.day,
               CAST(b.w_start AS VARCHAR) AS window_start, b.n_events
        FROM spans s
        JOIN busy b ON s.span_lo < b.w_start + INTERVAL 6 HOUR
                   AND b.w_start < s.span_hi
        ORDER BY s.user_id, s.day, window_start
    """,
)
def user_spans_in_busy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap attribution via the two-sided binned
    range join (:func:`bigdatalab_spark.operators.rangejoin.
    bin_interval_overlap_join`): each user's daily activity span
    [first event, last event] against the 6h/2h busy windows — which
    users were active WHILE the store was busy. Both interval tables
    explode to 2h bins and meet as an equi-join with the overlap
    predicate residual; the canonical-first-bin filter yields exactly
    one row per overlapping pair. The oracle replays the naive overlap
    join."""
    from bigdatalab_spark.operators.rangejoin import bin_interval_overlap_join

    events = load_table(spark, sf_dir, "events")
    busy = (
        events.groupBy(F.window("ts", "6 hours", "2 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= 95)
        .select(
            F.unix_micros("w.start").alias("w_lo"),
            F.unix_micros("w.end").alias("w_hi"),
            F.col("w.start").cast("string").alias("window_start"),
            "n_events",
        )
    )
    spans = (
        events.groupBy(
            "user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.min(F.unix_micros("ts")).alias("span_lo"),
            (F.max(F.unix_micros("ts")) + 1).alias("span_hi"),
        )
    )
    joined = bin_interval_overlap_join(
        spans, busy, "span_lo", "span_hi", "w_lo", "w_hi",
        bin_width=2 * 3600 * 1_000_000,
    )
    return joined.select("user_id", "day", "window_start", "n_events").orderBy(
        "user_id", "day", "window_start"
    )


@query(
    "order_value_histogram",
    ids=("A9", "P6", "O1"),
    oracle="""
        SELECT CASE WHEN o_totalprice < 0 THEN 0
                    WHEN o_totalprice >= 600000 THEN 13
                    ELSE CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) + 1
               END AS bucket,
               count(*) AS n_orders,
               min(o_totalprice) AS lo,
               max(o_totalprice) AS hi
        FROM orders
        GROUP BY bucket
        ORDER BY bucket
    """,
)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via the SQL-standard ``width_bucket``:
    one pass, one tiny shuffle — how a 100 TB distribution gets
    profiled without sorting anything. DuckDB has no width_bucket, so
    the oracle states the equivalent floor arithmetic (the 600000/12
    width is the exact double 50000.0, so the two formulations agree
    bit for bit, including the 0 / n+1 out-of-range buckets)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "safe_ratio_metrics",
    ids=("P6", "A4", "O1"),
    oracle="""
        SELECT l_returnflag,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS STRING) AS DOUBLE)
                 / nullif(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,6)))
                               AS STRING) AS DOUBLE), 0.0) AS price_per_unit,
               count(*) AS n_lines
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def safe_ratio_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe arithmetic surface: ``try_divide`` returns NULL on
    a zero denominator instead of failing the job — the guard every
    derived-metric pipeline needs once ANSI mode (Spark 4 default)
    turns division errors fatal. Oracle states the NULLIF equivalent;
    numerator/denominator are exact-decimal so the ratio replays."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.try_divide(
                F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double"),
                F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double"),
            ).alias("price_per_unit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "range_window_revenue",
    ids=("A8", "O1", "P3"),
    oracle="""
        SELECT o_orderkey,
               o_orderpriority,
               CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INT) AS day,
               CAST(count(*) OVER w AS BIGINT) AS w_cnt,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) OVER w AS STRING) AS DOUBLE) AS w_rev
        FROM orders
        WINDOW w AS (
            PARTITION BY o_orderpriority
            ORDER BY datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
            RANGE BETWEEN 7 PRECEDING AND 7 FOLLOWING
        )
        ORDER BY o_orderkey
    """,
)
def range_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE window frame — the frame family the ROWS
    queries can't stand in for: per priority class, each order sees
    the count and exact-decimal revenue of all orders within ±7
    CALENDAR DAYS of its own date (``rangeBetween(-7, 7)`` over an
    epoch-day integer), not ±N rows. The distinction is what makes
    the result deterministic here: many orders share a day, so any
    ROWS frame over this ordering would depend on tie order, while the
    RANGE frame includes peers BY VALUE — ties cannot change it. Same
    per-partition sort-shuffle as every window; the frame is a
    sliding-bounds pass over the sorted run, O(n) per partition.
    Revenue accumulates in DECIMAL(28,6) (order-independent), rendered
    through the string-decimal path on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rangeBetween(-7, 7)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            day.cast("int").alias("day"),
            "o_totalprice",
        )
        .withColumn("w_cnt", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn(
            "w_rev",
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .over(w)
            .cast("string")
            .cast("double"),
        )
        .drop("o_totalprice")
        .orderBy("o_orderkey")
    )
