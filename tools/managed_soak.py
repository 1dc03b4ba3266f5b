"""Soak the ManagedTable DML + change-feed loop: N cycles of
merge → (compact / vacuum / restart), with three invariants asserted
EVERY cycle:

(a) TABLE TRUTH — the table equals the expected key→value state
    maintained independently in plain Python.
(b) CDC REPLAY — a shadow state built ONLY from the consumed change
    feed (ChangeFeedCursor: delete removes, update_postimage/insert
    set) equals the table. This is the contract every downstream
    incremental consumer relies on: the feed alone reconstructs the
    table, across compactions (empty feed) and vacuums (history the
    cursor already consumed may be reclaimed).
(c) BOUNDED DRIFT — versions and files do not grow without bound:
    compaction every third cycle keeps the file count flat, vacuum
    every fourth keeps the version count flat, and hard links mean
    surviving snapshots share bytes.

"Restart" every fifth cycle = replay the SAME batch id through
managed_merge_batch, which must be a no-op (the exactly-once skip),
then re-instantiate the facade from the path (no in-memory state).

Usage: python -m tools.managed_soak [sf_dir] [--cycles=N] [--files=N]
Output: one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time


def main() -> int:
    from pyspark.sql import functions as F

    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.sources.managed import ManagedTable, _data_files
    from bigdatalab_spark.sources.versioned import _version_dir
    from bigdatalab_spark.streaming.jobs import managed_merge_batch

    sf_dir = "/root/testdata/sf0.001"
    cycles = 20
    n_files = 8
    for arg in sys.argv[1:]:
        if arg.startswith("--cycles="):
            cycles = int(arg.split("=", 1)[1])
        elif arg.startswith("--files="):
            n_files = int(arg.split("=", 1)[1])
        else:
            sf_dir = arg

    spark = get_session(app_name="managed-soak")
    spark.sparkContext.setLogLevel("ERROR")

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
        .limit(2000)
        .collect()
    )  # driver-side source-of-truth: bounded fixture slice by design
    scratch = tempfile.mkdtemp(prefix="managed_soak_")
    root = scratch + "/t"
    table = ManagedTable(spark, root, index_cols=("event_id",))
    cursor = table.cursor(scratch + "/cursor")

    expected: dict[int, float] = {}
    shadow: dict[int, float] = {}  # rebuilt ONLY from the feed
    schema = "event_id long, user_id long, value double"
    stats = []

    def batch_rows(i: int) -> list[tuple]:
        # deterministic per-cycle slice: a sliding window of updates
        # plus a few brand-new keys; every 4th cycle deletes a stripe
        lo = (i * 97) % 1500
        rows = [
            (r["event_id"], r["user_id"], float(r["value"]) + i)
            for r in ev[lo : lo + 120]
        ]
        rows += [(1_000_000 + i * 10 + j, 7, float(i)) for j in range(5)]
        return rows

    for i in range(cycles):
        t0 = time.time()
        rows = batch_rows(i)
        bdf = spark.createDataFrame(rows, schema)
        applied = managed_merge_batch(
            table, bdf, i, ("event_id",), index_cluster_files=n_files
        )
        assert applied, f"cycle {i}: batch refused"
        for k, _, v in rows:
            expected[k] = v
        if i % 4 == 3:
            stripe_lo = (i * 53) % 1000
            table.delete_range("event_id", stripe_lo, stripe_lo + 49)
            for k in list(expected):
                if stripe_lo <= k <= stripe_lo + 49:
                    del expected[k]
        if i % 3 == 2:
            if i % 6 == 5:
                # every other compaction is OPTIMIZE ZORDER: the
                # Morton layout must keep the same truth/feed/drift
                # invariants as a plain compaction (both are
                # physical-layout no-ops to the feed)
                table.compact(
                    target_file_rows=100_000,
                    zorder_by=("event_id", "user_id"),
                )
            else:
                table.compact(target_file_rows=100_000)
        # drain the feed BEFORE vacuum may reclaim consumed history
        pending, upto = cursor.pending()
        if pending is not None:
            for r in pending.collect():  # delta-sized by construction
                k = r["event_id"]
                ct = r["_change_type"]
                if ct == "delete":
                    shadow.pop(k, None)
                elif ct in ("insert", "update_postimage"):
                    shadow[k] = r["value"]
            cursor.ack(upto)
        if i % 4 == 1:
            table.vacuum(keep_last=2)
        if i % 5 == 4:
            # restart drill: same batch id must be skipped, and a fresh
            # facade instance over the path sees identical state
            assert not managed_merge_batch(table, bdf, i, ("event_id",))
            table = ManagedTable(spark, root, index_cols=("event_id",))
            cursor = table.cursor(scratch + "/cursor")

        got = {
            r["event_id"]: r["value"] for r in table.read().collect()
        }
        assert got == expected, f"cycle {i}: table != expected state"
        assert shadow == expected, f"cycle {i}: CDC replay diverged"
        vdir = _version_dir(root, table.latest())
        stats.append(
            {
                "cycle": i,
                "seconds": round(time.time() - t0, 2),
                "versions_on_disk": len(table.versions()),
                "files": len(_data_files(vdir)),
                "live_keys": len(expected),
            }
        )

    print(
        json.dumps(
            {
                "metric": "managed_soak",
                "sf_dir": sf_dir,
                "cycles": cycles,
                "max_versions_on_disk": max(s["versions_on_disk"] for s in stats),
                "max_files": max(s["files"] for s in stats),
                "final_live_keys": stats[-1]["live_keys"],
                "cycle_seconds": [s["seconds"] for s in stats],
                "per_cycle": stats,
            }
        )
    )
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
