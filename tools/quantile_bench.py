"""Measure the mergeable-histogram quantile contract at scale.

scale/quantiles.py claims the DDSketch economics: build per-day
``(group, bin, cnt)`` histograms ONCE (a scan-shaped cost), persist
them as plain parquet, and from then on answer p50/p95/p99 over any
day range from bin-sized rows — never re-reading raw values. This tool
pins the three costs against the rescan alternative on the same input:

- ``build_s``    — raw scan -> daily histograms -> parquet (the
  one-time ingest cost; proportional to the raw data).
- ``serve_s``    — read persisted histograms, merge day range, pick
  quantiles (the recurring dashboard cost; proportional to BIN rows).
- ``rescan_s``   — percentile_approx over the raw values (what every
  query pays if quantiles are NOT pre-aggregated).
- ``hist_rows`` / ``raw_rows`` — the compression the serve path rides.

The 100 TB reading: build_s tracks raw_rows, serve_s tracks hist_rows
(thousands), rescan_s tracks raw_rows — so serving from the persisted
pre-aggregate is the only regime whose cost does NOT grow with the
corpus. Run with --factor to check the law across decades.

Usage: python -m tools.quantile_bench [sf_dir] [--factor=N]
Output: one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> int:
    from pyspark.sql import functions as F

    from bigdatalab_spark.scale.quantiles import (
        histogram_bins,
        merge_histograms,
        quantiles_from_histogram,
    )
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table

    sf_dir = "/root/testdata/sf0.1"
    factor = 1
    for arg in sys.argv[1:]:
        if arg.startswith("--factor="):
            factor = int(arg.split("=", 1)[1])
        else:
            sf_dir = arg

    spark = get_session(app_name="quantile-bench")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = None
    if factor > 1:
        from tools.make_replica import build

        scratch = tempfile.mkdtemp(prefix=f"quantile_x{factor}_")
        build(sf_dir, scratch, factor, only=("events",))
        sf_dir = scratch

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    raw_rows = ev.count()  # warms the scan for every regime alike

    hist_dir = tempfile.mkdtemp(prefix="quantile_hist_")
    t0 = time.time()
    histogram_bins(ev, "value", ["event_type", "day"]).write.mode(
        "overwrite"
    ).parquet(hist_dir)
    build_s = time.time() - t0

    t0 = time.time()
    stored = spark.read.parquet(hist_dir)
    merged = merge_histograms(stored, ["event_type"])
    served = quantiles_from_histogram(
        merged, ["event_type"], [0.5, 0.95, 0.99]
    ).collect()
    serve_s = time.time() - t0
    hist_rows = stored.count()

    t0 = time.time()
    rescan = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", [0.5, 0.95, 0.99], 10_000
            ).alias("qs")
        )
        .collect()
    )
    rescan_s = time.time() - t0

    # the two estimators must agree within one bin's relative width
    approx = {r["event_type"]: r["qs"] for r in rescan}
    max_rel = 0.0
    for row in served:
        for i, tag in enumerate((50, 95, 99)):
            got = row[f"p{tag}_est"]
            ref = approx[row["event_type"]][i]
            max_rel = max(max_rel, abs(got - ref) / ref)

    print(
        json.dumps(
            {
                "metric": "quantile_hist_bench",
                "sf_dir": sf_dir,
                "factor": factor,
                "raw_rows": raw_rows,
                "hist_rows": hist_rows,
                "build_s": round(build_s, 3),
                "serve_s": round(serve_s, 3),
                "rescan_s": round(rescan_s, 3),
                "max_rel_diff_vs_approx": round(max_rel, 4),
            }
        )
    )
    if scratch and os.environ.get("KEEP_REPLICA") != "1":
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
