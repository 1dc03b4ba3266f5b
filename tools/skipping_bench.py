"""Measure the file-skipping index's scan narrowing at scale.

sources/skipping.py claims the Delta-style contract: for a selective
range predicate on a CLUSTERED non-partition column, the per-file
min/max index rules out most files before Spark plans the scan. This
tool pins it: replicate events by --factor, write them range-clustered
by user_id into many files, build the footer index, then answer the
same selective predicate three ways —

- ``full_scan_s``   — read everything, filter (no skipping at all).
- ``pruned_s``      — index lookup -> candidate files -> read+filter.
- ``build_index_s`` — the one-time footer-probe cost (executors open
  footers only, never data pages).

and report ``files_total`` vs ``files_read`` plus a correctness check
(pruned answer == full-scan answer, exact row count). The 100 TB
reading: files_read/files_total is the fraction of the table a point
query touches — the index turns O(table) scans into O(selectivity)
scans, and building it costs footer-reads, not data-reads.

Usage: python -m tools.skipping_bench [sf_dir] [--factor=N] [--files=N]
Output: one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> int:
    from pyspark.sql import functions as F

    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.sources.skipping import (
        build_file_index,
        candidate_files,
        pruned_read,
    )

    sf_dir = "/root/testdata/sf0.1"
    factor = 1
    n_files = 64
    for arg in sys.argv[1:]:
        if arg.startswith("--factor="):
            factor = int(arg.split("=", 1)[1])
        elif arg.startswith("--files="):
            n_files = int(arg.split("=", 1)[1])
        else:
            sf_dir = arg

    spark = get_session(app_name="skipping-bench")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = None
    if factor > 1:
        from tools.make_replica import build

        scratch = tempfile.mkdtemp(prefix=f"skipping_x{factor}_")
        build(sf_dir, scratch, factor, only=("events",))
        sf_dir = scratch

    ev = load_table(spark, sf_dir, "events")
    table_dir = tempfile.mkdtemp(prefix="skipping_tbl_")
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(table_dir)
    )

    t0 = time.time()
    index = build_file_index(spark, table_dir, ["user_id"]).cache()
    files_total = index.count()
    build_index_s = time.time() - t0

    # a ~5%-selective band derived from the data so the probe is
    # meaningful at every sf (user id domains differ across scales)
    lo, hi = ev.stat.approxQuantile("user_id", [0.40, 0.45], 0.0)

    t0 = time.time()
    full = (
        spark.read.parquet(table_dir)
        .filter(F.col("user_id").between(lo, hi))
        .count()
    )
    full_scan_s = time.time() - t0

    t0 = time.time()
    cand = candidate_files(index, "user_id", lo, hi)
    pruned_df = pruned_read(spark, table_dir, index, "user_id", lo, hi)
    pruned = pruned_df.count()
    pruned_s = time.time() - t0

    assert pruned == full, (pruned, full)
    print(
        json.dumps(
            {
                "metric": "skipping_bench",
                "sf_dir": sf_dir,
                "factor": factor,
                "rows": ev.count(),
                "files_total": files_total,
                "files_read": len(cand),
                "build_index_s": round(build_index_s, 3),
                "full_scan_s": round(full_scan_s, 3),
                "pruned_s": round(pruned_s, 3),
                "matched_rows": full,
            }
        )
    )
    shutil.rmtree(table_dir, ignore_errors=True)
    if scratch and os.environ.get("KEEP_REPLICA") != "1":
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
