"""Measure what ROW-GROUP-level skipping saves beyond file-level
skipping on a Z-ordered layout.

sources/skipping.py's file index answers "which files can a 2-D
rectangle touch"; the round-9 row-group index answers the same one
granularity finer, and ``rowgroup_pruned_read`` actually executes the
narrower scan (pyarrow read_row_groups on executors). This tool pins
the delta: replicate events by --factor, write a z-ordered layout,
then for a ~13% x ~23% rectangle report

- ``file_level``     — candidate files and their TOTAL bytes (what the
  file index alone must read),
- ``rowgroup_level`` — candidate row groups and their bytes (what the
  finer index reads), inside those same files,
- timings + a correctness check (row-group scan == full scan filter).

The 100 TB reading: bytes_rg / bytes_file is the I/O still on the
table after file skipping — on a z-layout each kept file spans the
full rectangle in one dimension only, so most of its row groups miss
the other dimension and the finer index skips them.

Usage: python -m tools.rowgroup_bench [sf_dir] [--factor=N] [--files=N]
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

    from bigdatalab_spark.operators.zorder import write_zordered
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.sources.skipping import (
        build_file_index,
        build_rowgroup_index,
        candidate_files,
        candidate_rowgroups,
        rowgroup_pruned_read,
    )

    sf_dir = "/root/testdata/sf0.1"
    factor = 1
    n_files = 16
    # Production shape: ~1 GB files with 128 MB row groups = ~8 row
    # groups per file. The replica's files are MBs, so the block size
    # scales down to keep the RATIO realistic; override with --block=.
    block = 2 << 20
    for arg in sys.argv[1:]:
        if arg.startswith("--factor="):
            factor = int(arg.split("=", 1)[1])
        elif arg.startswith("--files="):
            n_files = int(arg.split("=", 1)[1])
        elif arg.startswith("--block="):
            block = int(arg.split("=", 1)[1])
        else:
            sf_dir = arg

    spark = get_session(app_name="rowgroup-bench")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = None
    if factor > 1:
        from tools.make_replica import build

        scratch = tempfile.mkdtemp(prefix=f"rowgroup_x{factor}_")
        build(sf_dir, scratch, factor, only=("events",))
        sf_dir = scratch

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 64).cast("bigint").alias("x"),
        F.dayofmonth("ts").cast("bigint").alias("y"),
    )
    rows = ev.count()
    path = tempfile.mkdtemp(prefix="rowgroup_tbl_") + "/z"
    write_zordered(
        ev, path, "x", "y", n_files=n_files,
        writer_options={"parquet.block.size": block},
    )

    xr, yr = (8, 15), (8, 14)  # ~13% x ~23% rectangle
    preds = [("x", *xr), ("y", *yr)]

    t0 = time.time()
    rgindex = build_rowgroup_index(spark, path, ["x", "y"]).cache()
    rg_total = rgindex.select("file", "rg").distinct().count()
    build_rg_s = time.time() - t0

    findex = build_file_index(spark, path, ["x", "y"]).cache()
    kept = set(candidate_files(findex, "x", *xr)) & set(
        candidate_files(findex, "y", *yr)
    )
    cand = candidate_rowgroups(rgindex, preds)
    # same unit on both sides: the footer's per-row-group byte size
    # (os.path.getsize would mix compressed file bytes into the ratio)
    rg_bytes = {
        (r["file"], r["rg"]): r["n_bytes"]
        for r in rgindex.filter(F.col("col") == "x").collect()
    }
    bytes_file = sum(b for (f, _g), b in rg_bytes.items() if f in kept)
    bytes_rg = sum(
        rg_bytes[(f, g)] for f, rgs in cand.items() for g in rgs
    )

    t0 = time.time()
    got = rowgroup_pruned_read(spark, path, rgindex, preds).count()
    rg_scan_s = time.time() - t0
    t0 = time.time()
    want = (
        spark.read.parquet(path)
        .filter(F.col("x").between(*xr) & F.col("y").between(*yr))
        .count()
    )
    full_scan_s = time.time() - t0
    assert got == want, (got, want)

    print(
        json.dumps(
            {
                "metric": "rowgroup_bench",
                "sf_dir": sf_dir,
                "factor": factor,
                "rows": rows,
                "build_rg_index_s": round(build_rg_s, 3),
                "file_level": {
                    "files_total": n_files,
                    "files_read": len(kept),
                    "bytes_read": bytes_file,
                },
                "rowgroup_level": {
                    "rowgroups_total": rg_total,
                    "rowgroups_read": sum(len(v) for v in cand.values()),
                    "bytes_read": bytes_rg,
                },
                "bytes_saved_vs_file_level": bytes_file - bytes_rg,
                "rg_scan_s": round(rg_scan_s, 3),
                "full_scan_s": round(full_scan_s, 3),
                "matched_rows": want,
            }
        )
    )
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    if scratch and os.environ.get("KEEP_REPLICA") != "1":
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
