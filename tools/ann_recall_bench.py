"""ANN recall at scale: recall@k vs exact L2 across (n_probe, rerank).

The recall gates run on the 500-vector gate corpus; serve TIME was
measured at x100/x300 but recall was not — so the chosen defaults
(n_probe=2, rerank=50) were never validated where they matter. This
tool computes exact squared-L2 top-k ground truth by brute force for a
query sample, fits one IVF-PQ index (fit is deterministic per seed),
then sweeps the serving knobs and reports recall@k AND serve seconds
per grid point — the curve you pick production defaults from:

- n_probe: how many coarse cells each query scans (linear serve-cost
  knob, recall ceiling knob);
- rerank: exact-distance re-scoring depth over the ADC shortlist
  (fixes quantization-error misrankings INSIDE the probed cells;
  cannot recover neighbors whose cell was never probed).

Reading the output: if recall plateaus in rerank at fixed n_probe, the
residual loss is cell misses — raise n_probe, not rerank. Serve times
are min-of-2 warm runs (full pipeline into a noop sink).

Usage: python -m tools.ann_recall_bench [sf_dir] [n_queries] [k] [grid] [n_centroids]
       grid = full (default: probe 1/2/4/8 x rerank 0/20/50)
            | quick (probe 1-2 x rerank 0/20, for the pytest smoke)
            | deep (probe 1/2/4 x rerank 50/200/500 — for when `full`
              shows recall flat in n_probe, i.e. shortlist-limited)
       n_centroids: coarse cells for the IVF fit (default 8; at 600k
       vectors that is 75k/cell — sweep this too before pinning)
Output: one JSON line with a grid of {recall, serve_sec}.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdatalab_spark.scale.pq import (
        _sq_dist,
        fit_ivf_pq_index,
        ivf_pq_serve_topk,
    )
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    grid_kind = sys.argv[4] if len(sys.argv) > 4 else "full"
    n_centroids = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    probes, reranks = {
        "quick": ((1, 2), (None, 20)),
        "full": ((1, 2, 4, 8), (None, 20, 50)),
        "deep": ((1, 2, 4), (50, 200, 500)),
    }[grid_kind]

    spark = get_session(app_name="ann-recall-bench")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    queries = emb.sort("vec_id").limit(n_queries).persist()
    n_queries = queries.count()

    # exact ground truth: brute-force squared L2, broadcast the queries
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    t0 = time.perf_counter()
    truth_rows = (
        c.join(F.broadcast(q))
        .select("query_id", "neighbor_id", _sq_dist(F.col("qv"), F.col("cv")).alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    )
    exact_sec = round(time.perf_counter() - t0, 3)
    truth: dict[int, set] = {}
    for r in truth_rows:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    t0 = time.perf_counter()
    codes, centroids, books = fit_ivf_pq_index(
        emb, n_centroids=n_centroids, m=8, seed=42
    )
    codes = codes.persist()
    codes.count()
    fit_sec = round(time.perf_counter() - t0, 3)

    grid = {}
    for n_probe in probes:
        for rerank in reranks:
            tag = f"probe{n_probe}_rerank{rerank or 0}"
            plan = lambda: ivf_pq_serve_topk(  # noqa: B023,E731
                queries, codes, centroids, books,
                k=k, n_probe=n_probe, rerank=rerank,
                corpus=emb if rerank else None,
            )
            got: dict[int, set] = {}
            for r in plan().collect():
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            hits = sum(len(got.get(qid, set()) & t) for qid, t in truth.items())
            recall = hits / (k * len(truth))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                plan().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            grid[tag] = {"recall": round(recall, 4), "serve_sec": round(best, 3)}

    codes.unpersist()
    queries.unpersist()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_corpus": n_corpus,
                "n_queries": n_queries,
                "k": k,
                "n_centroids": n_centroids,
                "exact_bruteforce_sec": exact_sec,
                "fit_sec": fit_sec,
                "grid": grid,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
