"""Sketch-backed queries (SURVEY §2.4 A12-A14).

Oracles are the EXACT equivalents: the sketch parameters are sized so
the approximate answers are provably exact at gate scale (HLL++ stays
in sparse/exact mode below its precision threshold; CMS with eps=0.01
has ~272x5 counters vs 5 distinct keys — zero collisions; Bloom fpp of
1e-6 over tens of probes makes a false positive a ~1e-5 event). The
knobs themselves are the lab's (rsd {0.05,0.1,0.01}; eps/conf/seed
0.01/0.99/10; README:192-243).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.operators.sketches import bloom_filter, count_min_sketch
from bigdatalab_spark.queries.registry import query
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
    distinct source (the `#vaccino` membership probe,
    README:213-219). fpp=1e-6 so no false positive at probe scale."""
    docs = load_table(spark, sf_dir, "documents")
    members = docs.filter(F.col("doc_id") % 2 == 0).select("source")
    n = members.distinct().count()
    bf = bloom_filter(members, "source", expected_items=max(n, 1), fpp=1e-6)
    probes = [r["source"] for r in docs.select("source").distinct().collect()]
    rows = [(p, bf.might_contain(p)) for p in sorted(probes)]
    return spark.createDataFrame(rows, "source string, might_contain boolean")


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
    (the exact lab knobs, README:236-243); ~272x5 counters vs a handful
    of keys means estimates equal exact counts."""
    events = load_table(spark, sf_dir, "events")
    cms = count_min_sketch(events, "event_type", eps=0.01, confidence=0.99, seed=10)
    keys = [r["event_type"] for r in events.select("event_type").distinct().collect()]
    rows = [(k, cms.estimate_count(k)) for k in sorted(keys)]
    return spark.createDataFrame(rows, "event_type string, est_count long")
