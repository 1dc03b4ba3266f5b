"""Sketch-backed queries (SURVEY §2.4 A12-A14).

Oracles are the EXACT equivalents: the sketch parameters are sized so
the approximate answers are provably exact at gate scale (HLL++ stays
in sparse/exact mode below its precision threshold; CMS with eps=0.01
has 272x5 counters vs 5 distinct keys — a cross-row collision on every
sketch row is a ~1e-7 event; Bloom at ~16 Kbit over tens of member
keys makes a false positive a ~1e-10 event). The knobs themselves are
the lab's (rsd {0.05,0.1,0.01}; eps/conf/seed 0.01/0.99/10;
README:192-243).

Probes run IN-PLAN: membership and frequency are column expressions
over the portable sketches (scale/dedup.py, scale/cms.py), so the
probe set can be data-sized — no driver-side collect-and-loop. The
JVM ``stat.bloomFilter``/``stat.countMinSketch`` bridge the lab
exercises from Scala stays available (operators/sketches.py, with
serialization round-trips) and is pytest-covered; the portable twins
compute the same answers as replayable data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.scale.cms import build_portable_cms, cms_estimate
from bigdatalab_spark.scale.dedup import bloom_might_contain, build_portable_bloom
from bigdatalab_spark.sources import load_table


@query(
    "hll_distinct_users",
    ids=("A11", "A12"),
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS exact_users,
               true AS within_rsd_bound
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) at rsd=0.01 — the estimator
    the lab compares at rsd {0.05 default, 0.1, 0.01} (README:192-194) —
    next to the exact countDistinct (A11). The oracle gates the exact
    count plus HLL's accuracy contract (|approx-exact| <= 3*rsd*exact),
    since the estimate itself is implementation-specific."""
    events = load_table(spark, sf_dir, "events")
    rsd = 0.01
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=rsd).alias("approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx") - F.col("exact_users"))
                <= F.greatest(3 * rsd * F.col("exact_users"), F.lit(2.0))
            ).alias("within_rsd_bound"),
        )
        .orderBy("event_type")
    )


@query(
    "bloom_membership",
    ids=("A13",),
    oracle="""
        SELECT s.source,
               CASE WHEN t.source IS NOT NULL THEN true ELSE false END AS might_contain
        FROM (SELECT DISTINCT source FROM documents) s
        LEFT JOIN (SELECT DISTINCT source FROM documents WHERE doc_id % 2 = 0) t
          ON s.source = t.source
        ORDER BY s.source
    """,
)
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a Bloom filter on sources of even-numbered docs, probe every
    distinct source (the `#vaccino` membership probe, README:213-219).

    The probe is a column expression over the portable bitmap
    (scale/dedup.py ``bloom_might_contain``): the ~2 KB bitmap embeds in
    the plan as a literal and every probe row is tested executor-side,
    so the probe set scales with the data instead of the driver. At
    ~16 Kbit / k=4 over tens of member sources a false positive is a
    ~1e-10 event — the strict oracle would catch one."""
    docs = load_table(spark, sf_dir, "documents")
    members = (
        docs.filter(F.col("doc_id") % 2 == 0).select("source").distinct()
    )
    bitmap = build_portable_bloom(members, "source")
    return (
        docs.select("source")
        .distinct()
        .withColumn("might_contain", bloom_might_contain("source", bitmap))
        .orderBy("source")
    )


@query(
    "cms_event_frequency",
    ids=("A14",),
    oracle="""
        SELECT event_type, count(*) AS est_count
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def cms_event_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates, eps=0.01 conf=0.99 seed=10
    (the exact lab knobs, README:236-243); 272x5 counters vs a handful
    of keys means estimates equal exact counts.

    Estimates run in-plan (scale/cms.py ``cms_estimate``): the counter
    table embeds as a literal array and each probe row takes the min of
    its five counters executor-side — data-sized probe sets cost one
    narrow scan, not a driver loop."""
    events = load_table(spark, sf_dir, "events")
    knobs = dict(eps=0.01, confidence=0.99, seed=10)
    counters = build_portable_cms(events, "event_type", **knobs)
    return (
        events.select("event_type")
        .distinct()
        .withColumn(
            "est_count", cms_estimate("event_type", counters, **knobs)
        )
        .orderBy("event_type")
    )


@query(
    "heavy_hitter_words",
    ids=("A14", "SCALE-TEXT"),
    oracle="""
        WITH nz AS (
            SELECT word
            FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word
                  FROM documents)
            WHERE word <> ''
        ),
        t AS (SELECT count(*) AS total FROM nz)
        SELECT word, count(*) AS n, t.total AS total
        FROM nz, t
        GROUP BY word, t.total
        HAVING count(*) * 31 > t.total
        ORDER BY n DESC, word
    """,
)
def heavy_hitter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (count > total/31, k=30) over document
    tokens: per-partition Misra-Gries candidate summaries, then a
    broadcast recount of candidates only — two scans, no data-sized
    shuffle or collect (scale/heavyhitters.py). The exact complement
    of cms_event_frequency's one-pass estimates: candidates vary with
    partitioning, the output provably doesn't, so this row is strict
    hash-gated. Gate data has a 31-word vocabulary; at corpus scale k
    rises into the thousands and the candidate set stays k*tasks."""
    from bigdatalab_spark.functions import tokenize
    from bigdatalab_spark.scale.heavyhitters import exact_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokenize("text")).alias("word"))
    return exact_heavy_hitters(words, "word", k=30).orderBy(
        F.desc("n"), F.asc("word")
    )


@query(
    "hll_union_daily_users",
    ids=("A12", "SCALE-SKETCH"),
    # no SQL oracle BY DESIGN: the Datasketches HLL binary encoding is
    # engine-specific (DuckDB's approx_distinct is a different sketch).
    # The gates live in pytest: union-of-dailies == direct-corpus
    # estimate (sketch algebra is deterministic), parquet round-trip
    # preserves the sketch, and the estimate lands within 5% of exact.
)
def hll_union_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type from UNIONED daily HLL sketches
    (Spark 4 Datasketches surface: hll_sketch_agg / hll_union_agg /
    hll_sketch_estimate) — the approximate member of the persistable
    pre-aggregate trio beside the bitmap exact-distinct
    (queries/spark4_sql.py) and the histogram quantiles
    (scale/quantiles.py). Unlike approx_count_distinct's buffer-bound
    HLL++ (hll_distinct_users), these sketches are a BINARY COLUMN:
    daily sketches land in parquet, any day range unions in
    aggregate-sized work, and the merged estimate is bit-deterministic
    — re-aggregating raw ids is never needed again."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sketch"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.expr(
                "hll_sketch_estimate(hll_union_agg(sketch))"
            ).alias("n_users_est")
        )
        .orderBy("event_type")
    )
