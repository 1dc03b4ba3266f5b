"""Measure offline state-store inspection at scale (state_reader).

The statestore source's 100 TB claim is that inspecting a stateful
query's checkpoint costs a partition-parallel columnar-ish scan of the
STATE, independent of the input that built it — reading 10M keys of
RocksDB state should be seconds, not a replay of 10M input rows. This
tool pins that with three state regimes over the same (optionally
replicated) events input:

- ``user_counts``   — groupBy(user_id).count(): ~1.5k keys, the
  dashboard regime (state tiny, input big — inspection must not pay
  for the input).
- ``user_day``      — groupBy(user_id, day).count(): tens of
  thousands of keys, the reporting regime.
- ``event_dedup``   — dropDuplicates(event_id): one state row PER
  INPUT ROW — state as big as the input, the adversarial regime where
  partition-parallel state scan is the only thing that saves you.

Per regime it reports: stream drain seconds (the cost of BUILDING the
state), offline full-state read seconds (the cost of INSPECTING it),
state row count, and an exactness check against batch truth — plus the
metadata read (driver-only, should be milliseconds regardless of
regime).

Usage: python -m tools.state_bench [sf_dir] [--factor=N]
  factor > 1 replicates events via tools.make_replica into a scratch
  dir first (x100 over sf0.1 = 10M events).
Output: one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def _drain(df, ckpt: str, name: str) -> float:
    t0 = time.time()
    q = (
        df.writeStream.format("noop")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(3600)
    return time.time() - t0


def main() -> int:
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.streaming.jobs import stream_events
    from bigdatalab_spark.streaming.state_reader import (
        read_state,
        read_state_metadata,
    )
    from pyspark.sql import functions as F

    argv = list(sys.argv[1:])
    factor = 1
    pos = []
    for a in argv:
        if a.startswith("--factor="):
            factor = int(a.split("=", 1)[1])
        else:
            pos.append(a)
    sf_dir = pos[0] if pos else "/root/testdata/sf0.1"

    if factor > 1:
        from tools.make_replica import build

        scaled = tempfile.mkdtemp(prefix=f"state_bench_x{factor}_")
        build(sf_dir, scaled, factor, only=("events",))
        # dims aren't needed; stream_events only reads events.parquet
        sf_dir = scaled

    spark = get_session(app_name="state-bench")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="state_bench_ckpt_")

    from bigdatalab_spark.sources import load_table

    events = stream_events(spark, sf_dir)
    batch = load_table(spark, sf_dir, "events")
    n_input = batch.count()

    regimes = {
        "user_counts": events.groupBy("user_id").count(),
        "user_day": events.groupBy(
            "user_id", F.window("ts", "1 day").alias("day")
        ).count(),
        "event_dedup": events.select("event_id").dropDuplicates(["event_id"]),
    }
    truth = {
        "user_counts": batch.select("user_id").distinct().count(),
        "user_day": batch.select(
            "user_id", F.date_trunc("day", F.col("ts"))
        ).distinct().count(),
        "event_dedup": batch.select("event_id").distinct().count(),
    }

    out: dict = {"sf_dir": sf_dir, "factor": factor, "n_input_rows": n_input}

    # change-feed regime: same dedup state built WITH changelog
    # checkpointing, then the full mutation audit read back — the CDC
    # cost is one changelog scan per batch per partition, input never
    # replayed
    from bigdatalab_spark.streaming.state_reader import read_state_changes

    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled",
        "true",
    )
    ckpt_cdc = os.path.join(scratch, "dedup_changelog")
    build_s = _drain(
        events.select("event_id").dropDuplicates(["event_id"]),
        ckpt_cdc,
        "state_bench_changelog",
    )
    spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled"
    )
    t0 = time.time()
    n_changes = read_state_changes(spark, ckpt_cdc, 0).count()
    out["dedup_change_feed"] = {
        "build_stream_sec": round(build_s, 3),
        "change_feed_read_sec": round(time.time() - t0, 3),
        "n_change_rows": n_changes,
        # every distinct id was inserted exactly once
        "exact": bool(n_changes == truth["event_dedup"]),
    }

    for name, df in regimes.items():
        ckpt = os.path.join(scratch, name)
        build_s = _drain(df, ckpt, f"state_bench_{name}")
        t0 = time.time()
        meta = read_state_metadata(spark, ckpt).collect()
        meta_s = time.time() - t0
        t0 = time.time()
        state = read_state(spark, ckpt)
        n_state = state.count()
        read_s = time.time() - t0
        out[name] = {
            "build_stream_sec": round(build_s, 3),
            "state_read_sec": round(read_s, 3),
            "metadata_read_sec": round(meta_s, 3),
            "n_state_rows": n_state,
            "n_state_partitions": meta[0].numPartitions,
            "exact": bool(n_state == truth[name]),
        }
    print(json.dumps(out))
    checked = list(regimes) + ["dedup_change_feed"]
    return 0 if all(out[k]["exact"] for k in checked) else 1


if __name__ == "__main__":
    raise SystemExit(main())
