"""Streaming-ingest-loop bench: does daily cost stay flat as the index
grows, and what does fragmentation cost until compaction?

`dedup_ingest_stream` runs classify → status-log → append per
micro-batch. Two scale claims fall out of that design and this tool
measures both on a replica corpus:

1. **Per-batch cost is flat in index size.** Each batch pays its own
   shingling plus index-side columnar scans; the index growing by the
   admitted docs of earlier batches should not bend the curve. The
   tool replays N equal batches through the same classify+append pair
   the stream's foreachBatch calls (the streaming machinery itself is
   oracle-gated elsewhere; here we time the work) and prints the
   per-batch classify/append wall times.

2. **Appends fragment; compaction restores.** Every append lands one
   file set per store, so serve-side scan cost drifts up with file
   COUNT, not bytes. The tool records per-store parquet file counts
   after the batch sequence, times a reference serve (min-of-3 warm,
   noop sink), runs `compact_dedup_index`, and times the same serve
   again on the compacted layout — the delta is what a standing
   maintenance job buys.

Usage: python -m tools.ingest_bench [corpus_dir] [n_batches] [batch_rows]
       corpus_dir default /root/testdata/sf0.1 (use /tmp/sfx100tail for
       the 500k-doc point); n_batches default 8; batch_rows default 2000
Output: one JSON line.
"""

from __future__ import annotations

import glob
import json
import sys
import time


def _timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    import tempfile

    from pyspark.sql import functions as F

    from bigdatalab_spark.scale.dedup import (
        append_to_dedup_index,
        compact_dedup_index,
        incremental_dedup_from_index,
        save_dedup_index,
    )
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table

    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    spark = get_session(app_name="ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, corpus_dir, "documents").select("doc_id", "text")
    # corpus gets n/(n+1) of the docs (the index must START large for
    # the flat-cost claim to mean anything); the held-out 1/(n+1) is
    # round-robined into the daily batches
    corpus = docs.filter(F.col("doc_id") % (n_batches + 1) != 0)
    idx = tempfile.mkdtemp(prefix="ingest_bench_") + "/idx"

    t0 = time.perf_counter()
    save_dedup_index(corpus, idx)
    build_s = time.perf_counter() - t0

    def store_files() -> dict:
        return {
            s: len(glob.glob(f"{idx}/{s}/**/*.parquet", recursive=True))
            for s in ("bands", "shingles", "sizes", "hashes", "tombstones")
        }

    # reference serve batch: half exact dups (re-id'd corpus docs),
    # half perturbed near-dups — same adversarial mix as
    # dedup_serve_bench so the two tools' serve numbers are comparable
    seed = corpus.limit(batch_rows).collect()
    probe = spark.createDataFrame(
        [
            (10_000_000 + i, r["text"] if i % 2 == 0 else (r["text"] or "") + " perturbed tail")
            for i, r in enumerate(seed)
        ],
        "doc_id long, text string",
    )

    batches = []
    for k in range(1, n_batches + 1):
        batch = (
            docs.filter(
                (F.col("doc_id") % (n_batches + 1) == 0)
                & (
                    (F.col("doc_id") / (n_batches + 1)).cast("long")
                    % n_batches
                    == k - 1
                )
            )
            .limit(batch_rows)
        )
        t0 = time.perf_counter()
        statuses = incremental_dedup_from_index(spark, batch, idx).cache()
        n_new = statuses.filter(F.col("status") == "new").count()
        classify_s = time.perf_counter() - t0
        new_docs = batch.join(
            statuses.filter(F.col("status") == "new").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        t0 = time.perf_counter()
        append_to_dedup_index(new_docs, idx)
        append_s = time.perf_counter() - t0
        statuses.unpersist()
        batches.append(
            {
                "batch": k,
                "classify_s": round(classify_s, 3),
                "append_s": round(append_s, 3),
                "n_new": n_new,
            }
        )
        print(f"[batch {k}] classify {classify_s:.2f}s append {append_s:.2f}s new={n_new}", file=sys.stderr)

    files_fragmented = store_files()
    serve_frag = min(
        _timed(incremental_dedup_from_index(spark, probe, idx)) for _ in range(3)
    )
    t0 = time.perf_counter()
    compact_stats = compact_dedup_index(spark, idx)
    compact_s = time.perf_counter() - t0
    files_compacted = store_files()
    serve_compact = min(
        _timed(incremental_dedup_from_index(spark, probe, idx)) for _ in range(3)
    )

    out = {
        "metric": "dedup_ingest_loop",
        "corpus_dir": corpus_dir,
        "corpus_docs": corpus.count(),
        "n_batches": n_batches,
        "batch_rows": batch_rows,
        "build_s": round(build_s, 3),
        "batches": batches,
        "files_fragmented": files_fragmented,
        "files_compacted": files_compacted,
        "compact_s": round(compact_s, 3),
        "serve_fragmented_s": round(serve_frag, 3),
        "serve_compacted_s": round(serve_compact, 3),
        "compact_files": {k: v["files_after"] for k, v in compact_stats.items()},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
