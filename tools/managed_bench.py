"""Measure the ManagedTable facade's pruning at scale, across the
table's LIFECYCLE (write -> append -> compact -> rollback).

sources/managed.py claims that reads through the version pointer prune
like the raw skipping index does (the index is part of each snapshot),
and that the claim survives the maintenance operations a long-lived
table actually undergoes. This tool pins it: replicate events by
--factor, commit a clustered base snapshot, append a delta, compact,
then answer the same ~5%-selective predicate through ``pruned_read``
at each surviving version, reporting files_read/files_total per
version plus correctness (pruned count == full-scan count at that
version) and the commit costs.

The 100 TB reading: append cost is proportional to the DELTA (hard
links + footer probes of new files only), compaction restores
selectivity the unclustered delta diluted, and version-N reads keep
version-N pruning — no global index to rebuild or invalidate.

Usage: python -m tools.managed_bench [sf_dir] [--factor=N] [--files=N]
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
    from bigdatalab_spark.sources.managed import ManagedTable, _data_files

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

    spark = get_session(app_name="managed-bench")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = None
    if factor > 1:
        from tools.make_replica import build

        scratch = tempfile.mkdtemp(prefix=f"managed_x{factor}_")
        build(sf_dir, scratch, factor, only=("events",))
        sf_dir = scratch

    ev = load_table(spark, sf_dir, "events")
    rows = ev.count()
    lo, hi = ev.stat.approxQuantile("user_id", [0.40, 0.45], 0.0)

    root = tempfile.mkdtemp(prefix="managed_tbl_") + "/t"
    t = ManagedTable(spark, root, index_cols=("user_id",))

    # base snapshot: 90% of events, range-clustered -> selective stats
    base = (
        ev.filter("event_id % 10 <> 0")
        .repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
    )
    t0 = time.time()
    v1 = t.write(base)
    write_s = time.time() - t0

    # delta append: 10% of events, UNCLUSTERED (the realistic worst
    # case — every delta file spans the whole user_id domain)
    delta = ev.filter("event_id % 10 = 0").repartition(4)
    t0 = time.time()
    v2 = t.append(delta)
    append_s = time.time() - t0

    # compaction re-clusters on the index column
    t0 = time.time()
    v3 = t.compact(target_file_rows=max(1, rows // n_files))
    compact_s = time.time() - t0

    per_version = {}
    for v in (v1, v2, v3):
        vdir = os.path.join(root, f"v={v}")
        total = len(_data_files(vdir))
        cand = t.candidate_files("user_id", lo, hi, version=v)
        t0 = time.time()
        pruned = t.pruned_read("user_id", lo, hi, version=v).count()
        pruned_s = time.time() - t0
        full = (
            spark.read.parquet(vdir)
            .filter(F.col("user_id").between(lo, hi))
            .count()
        )
        assert pruned == full, (v, pruned, full)
        per_version[f"v{v}"] = {
            "files_total": total,
            "files_read": len(cand),
            "pruned_s": round(pruned_s, 3),
            "matched_rows": full,
        }

    print(
        json.dumps(
            {
                "metric": "managed_bench",
                "sf_dir": sf_dir,
                "factor": factor,
                "rows": rows,
                "write_s": round(write_s, 3),
                "append_s": round(append_s, 3),
                "compact_s": round(compact_s, 3),
                "versions": per_version,
            }
        )
    )
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)
    if scratch and os.environ.get("KEEP_REPLICA") != "1":
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
