"""ANN ingest-loop bench: append cost, fragmentation, and what
compaction restores — the embedding-side twin of tools/ingest_bench.py.

`append_to_ivf_index` claims daily-batch cost independent of corpus
size (frozen quantizer; assignment is a broadcast argmin over the
centroid table; one partitioned write). This tool measures that on a
replica corpus, then the file-count drift the appends leave behind and
the serve delta `compact_ivf_index` buys back:

- build: fit_ivf_index + save (one-time; n_centroids kept moderate —
  fit cost is the round-7/8 benches' story, not this one);
- per-batch: append wall time across N equal batches (flat = the
  claim holds: nothing in the append path scans the corpus);
- serve: fixed query batch, min-of-3 warm, noop sink — measured
  against the fresh layout, the fragmented layout (after N appends),
  and the compacted layout; per-store parquet file counts at each
  point.

Usage: python -m tools.ann_ingest_bench [emb_dir] [n_batches] [batch_rows]
       emb_dir default /root/testdata/sf0.1 (use /tmp/sfx300emb for
       the 600k point); n_batches default 8; batch_rows default 2000
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

    from bigdatalab_spark.scale.similarity import (
        append_to_ivf_index,
        compact_ivf_index,
        fit_ivf_index,
        ivf_serve_topk,
        load_ivf_index,
        save_ivf_index,
    )
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table

    emb_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    spark = get_session(app_name="ann-ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, emb_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % (n_batches + 1) != 0)
    queries = emb.sort("vec_id").limit(16)
    idx = tempfile.mkdtemp(prefix="ann_ingest_") + "/ivf"

    t0 = time.perf_counter()
    assigned, centroids = fit_ivf_index(corpus, n_centroids=32, seed=42)
    save_ivf_index(assigned, centroids, idx)
    build_s = time.perf_counter() - t0

    def serve_s() -> float:
        a, c = load_ivf_index(spark, idx)
        return min(
            _timed(ivf_serve_topk(queries, a, c, k=5, n_probe=4))
            for _ in range(3)
        )

    def n_files() -> int:
        return len(glob.glob(f"{idx}/corpus/**/*.parquet", recursive=True))

    serve_fresh = serve_s()
    files_fresh = n_files()

    batches = []
    for k in range(1, n_batches + 1):
        batch = (
            emb.filter(
                (F.col("vec_id") % (n_batches + 1) == 0)
                & (
                    (F.col("vec_id") / (n_batches + 1)).cast("long") % n_batches
                    == k - 1
                )
            )
            .select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
            .limit(batch_rows)
        )
        t0 = time.perf_counter()
        append_to_ivf_index(batch, idx)
        append_s = time.perf_counter() - t0
        batches.append({"batch": k, "append_s": round(append_s, 3)})
        print(f"[batch {k}] append {append_s:.2f}s", file=sys.stderr)

    files_fragmented = n_files()
    serve_fragmented = serve_s()
    t0 = time.perf_counter()
    compact_ivf_index(spark, idx)
    compact_s = time.perf_counter() - t0
    files_compacted = n_files()
    serve_compacted = serve_s()

    print(
        json.dumps(
            {
                "metric": "ann_ingest_loop",
                "emb_dir": emb_dir,
                "corpus_vectors": corpus.count(),
                "n_batches": n_batches,
                "batch_rows": batch_rows,
                "build_s": round(build_s, 3),
                "batches": batches,
                "files": {
                    "fresh": files_fresh,
                    "fragmented": files_fragmented,
                    "compacted": files_compacted,
                },
                "serve_s": {
                    "fresh": round(serve_fresh, 3),
                    "fragmented": round(serve_fragmented, 3),
                    "compacted": round(serve_compacted, 3),
                },
                "compact_s": round(compact_s, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
