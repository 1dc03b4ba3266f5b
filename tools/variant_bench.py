"""VARIANT-at-scale A/B: parse-once-extract-many vs re-parse-per-field.

`variant_props_stats` claims the 100 TB shape for semi-structured
columns is: `parse_json` ONCE at ingest, persist the binary VARIANT,
and let every downstream query extract typed fields without touching a
JSON parser. This tool measures that claim against the alternative the
reference-era pattern implies (store the raw string, `get_json_object`
per extraction, which re-parses the string for every field):

- ingest: write `events` twice — props as the raw JSON string, and
  props as a parsed VARIANT column (parquet round-trips Spark 4's
  variant encoding); the variant write's extra cost IS the amortized
  parse.
- query: per stored table, extract 4 fields + aggregate, warm
  min-of-3 into a noop sink.

Usage: python -m tools.variant_bench [sf_dir] [workdir]
Output: one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def _timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    from pyspark.sql import functions as F

    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/variant_bench"
    spark = get_session(app_name="variant-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # the fixture's props is a one-key object ('{"k": 69}'), which would
    # understate string re-parse cost; widen it DETERMINISTICALLY from
    # existing columns to a realistic 8-key event payload so the A/B
    # reflects real-world JSON width (parse cost is per-byte).
    raw = load_table(spark, sf_dir, "events")
    ev = raw.select(
        "event_id",
        "event_type",
        F.to_json(
            F.named_struct(
                F.lit("k"), F.get_json_object("props", "$.k").cast("bigint"),
                F.lit("j"), (F.col("event_id") % 7).cast("bigint"),
                F.lit("a"), (F.col("user_id") % 1000).cast("bigint"),
                F.lit("b"), F.abs(F.hash("event_id")).cast("bigint"),
                F.lit("session"), F.concat(F.lit("s-"), F.col("user_id")),
                F.lit("page"), F.concat(F.lit("/p/"), F.col("event_id") % 50),
                F.lit("ua"), F.lit("Mozilla/5.0 (X11; Linux x86_64) Gecko/2010"),
                F.lit("ref"), F.concat(F.lit("https://example.com/r/"), F.col("event_id") % 13),
            )
        ).alias("props"),
    )
    out: dict = {"sf_dir": sf_dir, "n_rows": ev.count()}

    t0 = time.perf_counter()
    ev.write.mode("overwrite").parquet(f"{workdir}/props_string")
    out["ingest_string_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ev.withColumn("props", F.parse_json("props")).write.mode("overwrite").parquet(
        f"{workdir}/props_variant"
    )
    out["ingest_variant_sec"] = round(time.perf_counter() - t0, 2)

    fields = ["k", "j", "a", "b"]

    def q_string():
        df = spark.read.parquet(f"{workdir}/props_string")
        cols = [
            F.get_json_object("props", f"$.{f}").cast("bigint").alias(f)
            for f in fields
        ]
        return (
            df.select("event_type", *cols)
            .groupBy("event_type")
            .agg(*[F.sum(f).alias(f"sum_{f}") for f in fields])
        )

    def q_variant():
        df = spark.read.parquet(f"{workdir}/props_variant")
        cols = [
            F.try_variant_get("props", f"$.{f}", "bigint").alias(f) for f in fields
        ]
        return (
            df.select("event_type", *cols)
            .groupBy("event_type")
            .agg(*[F.sum(f).alias(f"sum_{f}") for f in fields])
        )

    for tag, fn in (("string_reparse", q_string), ("variant_extract", q_variant)):
        _timed(fn())  # warm
        out[f"query_{tag}_sec"] = round(min(_timed(fn()) for _ in range(3)), 3)

    # sanity: both paths must agree before the timing means anything
    a = {tuple(r) for r in q_string().collect()}
    b = {tuple(r) for r in q_variant().collect()}
    out["results_match"] = a == b
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
