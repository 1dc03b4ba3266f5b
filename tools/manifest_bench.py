"""Measure ManagedTable's COMMIT metadata cost against live file count.

sources/managed.py's manifest plane claims commit metadata cost is
proportional to the files a commit TOUCHES, never to the table's live
file count: each commit composes its child ``_manifest`` from the
parent's rows + its own delta, and planning (file lists, candidate
sets, history sizes) reads the manifest instead of walking the
version directory. Before the manifest, every commit os.walked the
snapshot and re-stat'ed every file — O(live-file-count) driver inode
work per commit, the scaling wall at ~10⁶ files/version.

This tool pins the claim by growing the live FILE COUNT (the rows per
file stay fixed and small, so the data plane is constant) while
holding the DML delta fixed:

- ``delete``: delete_range touching ~1 file, at 8 / 80 / 800 live
  files — wall time should stay ~flat (the link loop is µs-scale
  syscalls; the former walk+stat was the driver-side cost).
- ``append``: a fixed 1-file append against the same grid — composes
  the manifest from the parent's rows, stats only the new file.
- ``plan_ms``: time to produce the latest version's file list
  (manifest read) — metadata-sized at every N.

Usage: python -m tools.manifest_bench [--grid=8,80,800] [--rows-per-file=50]
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
    from bigdatalab_spark.sources.managed import ManagedTable, _data_files

    grid = [8, 80, 800]
    rows_per_file = 50
    for arg in sys.argv[1:]:
        if arg.startswith("--grid="):
            grid = [int(x) for x in arg.split("=", 1)[1].split(",")]
        elif arg.startswith("--rows-per-file="):
            rows_per_file = int(arg.split("=", 1)[1])

    spark = get_session(app_name="manifest-bench")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = tempfile.mkdtemp(prefix="manifest_bench_")
    results = {}
    try:
        for n_files in grid:
            root = os.path.join(scratch, f"t{n_files}")
            t = ManagedTable(spark, root, index_cols=("k",))
            n_rows = n_files * rows_per_file
            base = (
                spark.range(n_rows)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") * 2.0).alias("score"),
                )
                .repartitionByRange(n_files, "k")
                .sortWithinPartitions("k")
            )
            t.write(base)
            live = len(_data_files(os.path.join(root, "v=1")))

            t0 = time.perf_counter()
            t.delete_range("k", 0, rows_per_file // 2)
            delete_sec = time.perf_counter() - t0
            vdir = os.path.join(root, f"v={t.latest()}")
            prev = os.path.join(root, "v=1")
            prev_inodes = {
                os.stat(os.path.join(prev, f)).st_ino
                for f in _data_files(prev)
            }
            fresh = [
                f
                for f in _data_files(vdir)
                if os.stat(os.path.join(vdir, f)).st_ino not in prev_inodes
            ]

            one = (
                spark.range(n_rows, n_rows + rows_per_file)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") * 2.0).alias("score"),
                )
                .coalesce(1)
            )
            t1 = time.perf_counter()
            t.append(one)
            append_sec = time.perf_counter() - t1

            t2 = time.perf_counter()
            files = _data_files(os.path.join(root, f"v={t.latest()}"))
            plan_ms = (time.perf_counter() - t2) * 1000

            results[str(n_files)] = {
                "live_files": live,
                "delete_sec": round(delete_sec, 3),
                "files_rewritten": len(fresh),
                "append_sec": round(append_sec, 3),
                "plan_ms": round(plan_ms, 2),
                "planned_files": len(files),
            }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    lo, hi = str(grid[0]), str(grid[-1])
    summary = {
        "metric": "managed_commit_vs_live_file_count",
        "grid": results,
        "delete_ratio_hi_over_lo": round(
            results[hi]["delete_sec"] / results[lo]["delete_sec"], 2
        ),
        "append_ratio_hi_over_lo": round(
            results[hi]["append_sec"] / results[lo]["append_sec"], 2
        ),
        "file_count_ratio": round(
            results[hi]["live_files"] / results[lo]["live_files"], 1
        ),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
