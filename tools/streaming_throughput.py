"""Measured drain throughput for the real streaming jobs.

The gate queries run readStream -> AvailableNow -> memory sink and are
timed end-to-end by bench.py, but seconds alone don't say how fast the
streaming path MOVES ROWS. This tool drains the two streaming shapes
(cumulative keyed state over events; the document quality gate) with an
explicit checkpoint so the RocksDB state store engages, and reports:

- input rows and wall-clock drain time -> rows/sec,
- the state operator's numRowsTotal + stateMemory from the progress
  events (the store's own accounting),
- the on-disk size of the checkpoint's state/ directory.

Usage: python -m tools.streaming_throughput [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _drain(result, name: str, checkpoint: str) -> dict:
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    t0 = time.perf_counter()
    q.awaitTermination()
    secs = time.perf_counter() - t0
    rows = 0
    state = {"numRowsTotal": 0, "memoryUsedBytes": 0}
    for p in q.recentProgress:
        rows += p.get("numInputRows", 0)
        for so in p.get("stateOperators", []):
            state["numRowsTotal"] = max(state["numRowsTotal"], so.get("numRowsTotal", 0))
            state["memoryUsedBytes"] = max(
                state["memoryUsedBytes"], so.get("memoryUsedBytes", 0)
            )
    return {
        "rows": rows,
        "secs": round(secs, 2),
        "rows_per_sec": round(rows / secs) if secs > 0 else None,
        "state_rows": state["numRowsTotal"],
        "state_memory_bytes": state["memoryUsedBytes"],
        "checkpoint_state_bytes": _dir_bytes(os.path.join(checkpoint, "state")),
    }


def main() -> int:
    from pyspark.sql import functions as F

    from bigdatalab_spark.operators import money_sum
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.streaming import stream_events, unique_sink_name

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="streaming-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"sf_dir": sf_dir}

    with tempfile.TemporaryDirectory() as ckpt:
        state = stream_events(spark, sf_dir).groupBy("event_type").agg(
            F.count(F.lit(1)).alias("total_events"),
            money_sum("value").alias("total_value"),
        )
        report["cumulative_counts"] = _drain(
            state, unique_sink_name("tput_cumulative"), os.path.join(ckpt, "c")
        )

        batch_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
        stream = (
            spark.readStream.schema(batch_schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
        ws = F.filter(F.split("text", r"\s+"), lambda t: t != "")
        n_chars = F.length("text")
        n_punct = F.size(F.expr(r"regexp_extract_all(text, '[^\\w\\s]', 0)"))
        punct_ratio = (
            F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
        )
        accepted = (F.size(ws) >= 32) & (punct_ratio < 0.2)
        gate = (
            stream.select("source", accepted.alias("accepted"))
            .groupBy("source")
            .agg(
                F.count(F.when(F.col("accepted"), 1)).alias("n_accepted"),
                F.count(F.when(~F.col("accepted"), 1)).alias("n_rejected"),
            )
        )
        report["quality_gate"] = _drain(
            gate, unique_sink_name("tput_gate"), os.path.join(ckpt, "g")
        )

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
