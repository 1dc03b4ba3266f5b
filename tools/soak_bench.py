"""N-cycle streaming soak: ingest -> forget -> restart, invariants
checked after EVERY cycle.

The round-8 pieces (streaming ingest maintaining the durable dedup
index, tombstone forgetting, checkpoint-resume restart, inline
compaction, tombstone purge) each have their own tests; this tool
composes them into the loop a production corpus index actually lives
in, and asserts the composition — not the parts — holds up:

(a) REPLAY NEVER RESURRECTS A FORGOTTEN DOC: every cycle starts fresh
    availableNow queries on the SAME checkpoints (a restart per cycle
    by construction); forgotten ids must stay out of the index's live
    stores, and a re-submitted copy of forgotten-only content must
    classify as 'new'.
(b) INDEX == REBUILD: serving a probe batch (copies of forgotten
    docs, copies of live docs, fresh docs) against the maintained
    index must return EXACTLY what a from-scratch index over the
    current live corpus returns — the strongest statement that N
    cycles of append/tombstone/compact/purge drift left no residue.
(c) FILE DRIFT IS BOUNDED: inline compaction (every 3rd batch) plus
    periodic tombstone purge must keep the index's file count flat-ish
    instead of growing with cycle count.

Usage: python -m tools.soak_bench [sf_dir] [--cycles=N] [--purge-every=K]
Output: one JSON line (per-cycle table + verdict); exit 1 on any
invariant failure.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time


def _index_files(path: str) -> int:
    return len(glob.glob(f"{path}/**/*.parquet", recursive=True))


def main() -> int:
    from pyspark.sql import functions as F

    from bigdatalab_spark.scale.dedup import (
        incremental_dedup_from_index,
        purge_dedup_tombstones,
        save_dedup_index,
    )
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.streaming.jobs import dedup_ingest_stream, forget_stream

    sf_dir = "/root/testdata/sf0.001"
    cycles = 20
    purge_every = 5
    for arg in sys.argv[1:]:
        if arg.startswith("--cycles="):
            cycles = int(arg.split("=", 1)[1])
        elif arg.startswith("--purge-every="):
            purge_every = int(arg.split("=", 1)[1])
        else:
            sf_dir = arg

    spark = get_session(app_name="soak-bench")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="soak_")
    src = os.path.join(root, "src")
    fsrc = os.path.join(root, "forget_src")
    index = os.path.join(root, "index")
    status = os.path.join(root, "status")
    ck_in = os.path.join(root, "ck_ingest")
    ck_fg = os.path.join(root, "ck_forget")
    rebuild = os.path.join(root, "rebuild")
    os.makedirs(src)
    os.makedirs(fsrc)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_waves = cycles + 1

    # seed the index with wave 0 (the ingest loop serves against an
    # EXISTING index; the seed is the pre-streaming corpus)
    seed = docs.filter(F.col("doc_id") % n_waves == 0)
    save_dedup_index(seed, index)
    admitted = {r["doc_id"] for r in seed.select("doc_id").collect()}
    forgotten: set = set()

    schema = "doc_id long, text string"
    failures: list[str] = []
    table = []

    def _serve(batch, path):
        return sorted(
            map(tuple, incremental_dedup_from_index(spark, batch, path).collect())
        )

    for cycle in range(1, cycles + 1):
        t0 = time.time()
        # ---- ingest: drop the wave, drain a FRESH query on the SAME
        # checkpoint (restart-per-cycle by construction)
        wave = docs.filter(F.col("doc_id") % n_waves == cycle)
        wave.write.parquet(os.path.join(src, f"wave_{cycle:03d}"))
        q = dedup_ingest_stream(
            spark.readStream.schema(schema).parquet(f"{src}/*"),
            index, status, ck_in, compact_every=3,
        )
        q.awaitTermination(600)
        new_ids = {
            r["doc_id"]
            for r in spark.read.parquet(status)
            .filter("status = 'new'").select("doc_id").collect()
        }
        admitted_now = (admitted | new_ids) - forgotten

        # ---- forget: a deterministic slice of the currently-live docs,
        # via the streaming deletion path (fresh query, same checkpoint)
        to_forget = sorted(
            i for i in admitted_now if i % 10 == cycle % 10
        )[:5]
        if to_forget:
            spark.createDataFrame(
                [(i,) for i in to_forget], "doc_id long"
            ).write.parquet(os.path.join(fsrc, f"wave_{cycle:03d}"))
            fq = forget_stream(
                spark.readStream.schema("doc_id long").parquet(f"{fsrc}/*"),
                index, ck_fg,
            )
            fq.awaitTermination(600)
        admitted |= new_ids
        forgotten |= set(to_forget)
        live = admitted - forgotten

        if cycle % purge_every == 0:
            purge_dedup_tombstones(spark, index)

        # ---- invariant (a): forgotten ids out of the live stores, and
        # the tombstone filter holds across this cycle's restarts
        sizes = spark.read.parquet(f"{index}/sizes")
        tomb_path = f"{index}/tombstones"
        stored = {r["doc_id"] for r in sizes.select("doc_id").collect()}
        if os.path.isdir(tomb_path) and glob.glob(f"{tomb_path}/*.parquet"):
            stored -= {
                r["doc_id"]
                for r in spark.read.parquet(tomb_path).select("doc_id").collect()
            }
        if stored & forgotten:
            failures.append(
                f"cycle {cycle}: forgotten ids resurrected: "
                f"{sorted(stored & forgotten)[:5]}"
            )
        if stored != live:
            failures.append(
                f"cycle {cycle}: live store {len(stored)} != expected {len(live)}"
            )

        # ---- invariant (b): serve == from-scratch rebuild on the
        # probe batch (forgotten copies + live copies + fresh docs)
        live_docs = docs.filter(
            F.col("doc_id").isin([int(i) for i in live])
        ).localCheckpoint()
        probe = (
            docs.filter(F.col("doc_id").isin([int(i) for i in sorted(forgotten)[:5]]))
            .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
            .unionByName(
                docs.filter(F.col("doc_id").isin([int(i) for i in sorted(live)[:5]]))
                .select((F.col("doc_id") + 3_000_000).alias("doc_id"), "text")
            )
            .unionByName(
                spark.createDataFrame(
                    [(4_000_000 + cycle, f"entirely fresh text {cycle} " * 4)],
                    schema,
                )
            )
        ).localCheckpoint()
        shutil.rmtree(rebuild, ignore_errors=True)
        save_dedup_index(live_docs, rebuild)
        got, want = _serve(probe, index), _serve(probe, rebuild)
        if got != want:
            failures.append(
                f"cycle {cycle}: serve != rebuild "
                f"({sum(1 for a, b in zip(got, want) if a != b)} rows differ)"
            )

        table.append(
            {
                "cycle": cycle,
                "live": len(live),
                "forgotten": len(forgotten),
                "index_files": _index_files(index),
                "sec": round(time.time() - t0, 1),
            }
        )

    # ---- invariant (c): bounded drift — the file count must not grow
    # with cycle count (compaction + purge keep it flat-ish): the max
    # across the campaign stays within 3x the first cycle's count
    first, peak = table[0]["index_files"], max(t["index_files"] for t in table)
    if peak > 3 * first:
        failures.append(f"file drift unbounded: first {first}, peak {peak}")

    print(
        json.dumps(
            {
                "metric": "soak_bench",
                "cycles": cycles,
                "purge_every": purge_every,
                "table": table,
                "file_drift": {"first": first, "peak": peak},
                "failures": failures,
                "ok": not failures,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
