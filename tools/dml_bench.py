"""Measure ManagedTable's copy-on-write DML cost model at scale.

sources/managed.py claims DML cost is proportional to the TOUCHED
files, not the table: the attribution scan is pruned through the
stored index whenever the predicate/key bounds an indexed column, and
untouched files hard-link (zero copy). This tool pins both claims by
growing the table with --factor while holding the DML batch FIXED:

- DELETE of a fixed narrow key range (delete_range, index-pruned)
  vs the same predicate through delete_where (full attribution scan):
  the pruned op should stay ~flat as the table grows; the unpruned
  twin's attribution cost grows with the table.
- MERGE of a fixed upsert batch (contiguous late-correction key range
  + fresh inserts) keyed on the clustered/indexed column — the CDC
  apply-loop shape. Files rewritten should track the BATCH's key
  span, never the table.

The 100 TB reading: deleting one user's rows or applying one CDC
batch against a key-clustered table rewrites a handful of files and
scans only the index candidates — the table's size shows up nowhere
in the op's cost.

Usage: python -m tools.dml_bench [sf_dir] [--factor=N] [--files=N]
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

    spark = get_session(app_name="dml-bench")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = None
    if factor > 1:
        from tools.make_replica import build

        scratch = tempfile.mkdtemp(prefix=f"dml_x{factor}_")
        build(sf_dir, scratch, factor, only=("events",))
        sf_dir = scratch

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    rows = ev.count()
    max_key = ev.agg(F.max("event_id")).first()[0]

    # key-clustered table (the CDC-target shape): index + cluster on
    # event_id so both DELETE and MERGE can prune their attribution
    root = tempfile.mkdtemp(prefix="dml_tbl_") + "/t"
    t = ManagedTable(spark, root, index_cols=("event_id",))
    t.write(
        ev.repartitionByRange(n_files, "event_id").sortWithinPartitions(
            "event_id"
        )
    )
    files_total = len(_data_files(os.path.join(root, "v=1")))

    # ---- fixed-size DELETE: contiguous keys in the middle ----------------
    # spans scale-capped so the delete (at 50%) and the merge's update
    # range (at 10%) never overlap, even on tiny fixtures
    del_span = max(10, min(1000, max_key // 10))
    upd_span = max(5, min(500, max_key // 20))
    lo = max_key // 2
    hi = lo + del_span - 1
    t0 = time.time()
    v_del = t.delete_range("event_id", lo, hi)
    delete_pruned_s = time.time() - t0
    del_files = sorted(
        set(_data_files(os.path.join(root, "v=1")))
        - set(_data_files(os.path.join(root, f"v={v_del}")))
    )
    cdf_deleted = t.changes(v_del).count()

    # full-scan twin on a fresh copy of the same predicate (delete_where
    # cannot use the index): attribution must scan the whole table
    root2 = tempfile.mkdtemp(prefix="dml_tbl_noprune_") + "/t"
    t2 = ManagedTable(spark, root2, index_cols=("event_id",))
    t2.write(
        ev.repartitionByRange(n_files, "event_id").sortWithinPartitions(
            "event_id"
        )
    )
    t0 = time.time()
    t2.delete_where(F.col("event_id").between(lo, hi))
    delete_fullscan_s = time.time() - t0

    # ---- fixed-size MERGE: late corrections + fresh inserts --------------
    m_lo = max_key // 10
    src = (
        ev.filter(F.col("event_id").between(m_lo, m_lo + upd_span - 1))
        .select(
            "event_id",
            "user_id",
            F.lit("corrected").alias("event_type"),
            (F.col("value") * 2).alias("value"),
        )
        .unionByName(
            spark.range(upd_span).select(
                (F.col("id") + max_key + 1).alias("event_id"),
                (F.col("id") % 100).alias("user_id"),
                F.lit("fresh").alias("event_type"),
                F.lit(1.0).alias("value"),
            )
        )
    )
    t0 = time.time()
    v_merge = t.merge_into(src, "event_id")
    merge_s = time.time() - t0
    prev_files = set(_data_files(os.path.join(root, f"v={v_del}")))
    merged_files = set(_data_files(os.path.join(root, f"v={v_merge}")))
    merge_rewritten = len(prev_files - merged_files)
    merge_linked = len(prev_files & merged_files)
    cdf_by_type = {
        r["_change_type"]: r["n"]
        for r in t.changes(v_merge)
        .groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # correctness backstops (cheap counts, not the point of the bench)
    assert t.read(v_del).filter(
        F.col("event_id").between(lo, hi)
    ).count() == 0
    assert cdf_by_type.get("insert") == upd_span
    assert cdf_by_type.get("update_postimage") == cdf_by_type.get(
        "update_preimage"
    )

    print(
        json.dumps(
            {
                "metric": "dml_bench",
                "sf_dir": sf_dir,
                "factor": factor,
                "rows": rows,
                "files_total": files_total,
                "delete": {
                    "pruned_s": round(delete_pruned_s, 3),
                    "fullscan_s": round(delete_fullscan_s, 3),
                    "files_rewritten": len(del_files),
                    "rows_deleted": cdf_deleted,
                },
                "merge": {
                    "seconds": round(merge_s, 3),
                    "batch_rows": 2 * upd_span,
                    "files_rewritten": merge_rewritten,
                    "files_linked": merge_linked,
                    "cdf": cdf_by_type,
                },
            }
        )
    )
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)
    shutil.rmtree(os.path.dirname(root2), ignore_errors=True)
    if scratch and os.environ.get("KEEP_REPLICA") != "1":
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
