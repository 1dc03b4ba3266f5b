"""Z-order layout bench: measure the row-group pruning the key promises.

`zorder_clustering_key` computes a Morton key; until round 8 nothing
demonstrated that writing data in that order actually skips I/O. This
tool writes the SAME events rows three ways with identical file/row-
group geometry —

- zorder:  clustered by the interleaved (user bucket, day) key
- linear:  sorted by user bucket only (the naive single-dim layout)
- unsorted: as loaded (ingest order)

— then evaluates THREE predicates (x-range only, y-range only, and the
2-D rectangle) against every row group's parquet min/max footer
statistics (the exact check a pushed-down reader performs; see
rowgroup_pruning_stats) and reports the must-scan byte/row ratios per
(layout, predicate). It also runs the 2-D filter through Spark per
layout and reports wall time as corroboration.

Expectation, and why this needs three predicates: the linear layout is
OPTIMAL for its own sort column (contiguous x-ranges) and useless for
y (every group spans all days); z-order trades a little x-pruning for
pruning on EITHER dimension — its win is the worst case over query
dimensions, not any single predicate. Measuring only the 2-D rectangle
would under-sell linear and over-sell nothing.

Usage: python -m tools.zorder_bench [events_dir] [n_files]
Output: one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    import tempfile

    from pyspark.sql import functions as F

    from bigdatalab_spark.operators.zorder import (
        rowgroup_pruning_stats,
        write_zordered,
        zorder_key,
    )
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table

    events_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_session(app_name="zorder-bench")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, events_dir, "events").select(
        "event_id",
        (F.col("user_id") % 64).cast("bigint").alias("x"),
        F.dayofmonth("ts").cast("bigint").alias("y"),
        "event_type",
        "value",
    )
    n_rows = ev.count()
    # predicate rectangle: 1/8 of the x domain, ~1/4 of the day domain
    x_range, y_range = (8, 15), (8, 14)

    out = {"events_dir": events_dir, "n_rows": n_rows, "n_files": n_files,
           "x_range": x_range, "y_range": y_range, "layouts": {}}
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        layouts = {
            "zorder": lambda df, p: write_zordered(df, p, "x", "y", n_files),
            "linear": lambda df, p: (
                df.repartitionByRange(n_files, "x")
                .sortWithinPartitions("x")
                .write.mode("overwrite")
                .parquet(p)
            ),
            "unsorted": lambda df, p: (
                df.repartition(n_files).write.mode("overwrite").parquet(p)
            ),
        }
        x_dom, y_dom = (0, 63), (1, 31)  # full domains: a no-op bound
        predicates = {
            "x_only": (x_range, y_dom),
            "y_only": (x_dom, y_range),
            "both": (x_range, y_range),
        }
        for name, writer in layouts.items():
            path = f"{td}/{name}"
            writer(ev, path)
            stats = {}
            for pname, (xr, yr) in predicates.items():
                stats[pname] = rowgroup_pruning_stats(path, "x", xr, "y", yr)
            back = spark.read.parquet(path)
            pred = (
                (F.col("x") >= x_range[0]) & (F.col("x") <= x_range[1])
                & (F.col("y") >= y_range[0]) & (F.col("y") <= y_range[1])
            )
            back.filter(pred).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            back.filter(pred).write.format("noop").mode("overwrite").save()
            stats["filter_sec"] = round(time.perf_counter() - t0, 3)
            stats["n_match"] = back.filter(pred).count()
            out["layouts"][name] = stats

    # the headline: worst-case scan ratio across query dimensions
    for name in layouts:
        st = out["layouts"][name]
        st["worst_ratio"] = max(
            st[p]["scanned_bytes_ratio"] for p in predicates
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
