"""ANN fit-vs-serve bench: isolates the IVF serving join's scaling.

The round-5 x100 ANN numbers were KMeans-fit-dominated (SCALE_NOTES) —
one number for `ivf_kmeans_topk` said nothing about how the SERVING
join scales, which is the part a production index answers queries
with (the fit runs offline, once per index build). This tool times the
two phases separately:

- fit: `fit_ivf_index` (KMeans train + corpus bucketing), run once,
  with the bucketed corpus persisted and materialized — exactly the
  "index on disk" state a serving cluster starts from;
- serve: `ivf_serve_topk` over the prebuilt index, min-of-3 warm runs
  (the same discipline as bench.py), in both query-join regimes
  (broadcast = online Q<<N; shuffle = offline big-Q batch).

The `pq` and `ivfpq` families get the same split (round-7): fit =
codebook train + corpus encode with the codes persisted, serve =
ADC-score (+ exact rerank) over the prebuilt codes only.

Usage: python -m tools.ann_serve_bench [sf_dir] [n_queries] [family]
       family in {ivf (default), pq, ivfpq}
Output: one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def _timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    from pyspark.sql import functions as F

    from bigdatalab_spark.scale.similarity import fit_ivf_index, ivf_serve_topk
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    family = sys.argv[3] if len(sys.argv) > 3 else "ivf"
    if family not in ("ivf", "pq", "ivfpq"):
        raise SystemExit(f"unknown family {family!r}; use ivf|pq|ivfpq")
    spark = get_session(app_name="ann-serve-bench")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    # limit(), not an id-range filter: on a source with sparse vec_ids a
    # `vec_id < n` predicate silently times fewer queries than reported.
    queries = emb.sort("vec_id").limit(n_queries).persist()
    n_queries = queries.count()  # report the actual query-set size

    out = {"family": family, "sf_dir": sf_dir, "n_corpus": n_corpus,
           "n_queries": n_queries}

    if family == "ivf":
        t0 = time.perf_counter()
        assigned, centroids = fit_ivf_index(emb)
        assigned = assigned.persist()
        assigned.count()  # materialize: the index is now "on disk"
        out["fit_sec"] = round(time.perf_counter() - t0, 3)
        for mode in ("broadcast", "shuffle"):
            _timed(ivf_serve_topk(queries, assigned, centroids, k=3, query_join=mode))
            best = min(
                _timed(
                    ivf_serve_topk(queries, assigned, centroids, k=3, query_join=mode)
                )
                for _ in range(3)
            )
            out[f"serve_{mode}_sec"] = round(best, 3)
        assigned.unpersist()
    elif family == "pq":
        from bigdatalab_spark.scale.pq import fit_pq_index, pq_serve_topk

        t0 = time.perf_counter()
        codes, books = fit_pq_index(emb, m=8)
        codes = codes.persist()
        codes.count()
        out["fit_sec"] = round(time.perf_counter() - t0, 3)
        for tag, rerank in (("adc", None), ("rerank50", 50)):
            plan = lambda: pq_serve_topk(  # noqa: E731
                queries, codes, books, k=3, rerank=rerank, corpus=emb
            )
            _timed(plan())
            out[f"serve_{tag}_sec"] = round(min(_timed(plan()) for _ in range(3)), 3)
        codes.unpersist()
    else:  # ivfpq
        from bigdatalab_spark.scale.pq import fit_ivf_pq_index, ivf_pq_serve_topk

        t0 = time.perf_counter()
        codes, centroids, books = fit_ivf_pq_index(emb, m=8)
        codes = codes.persist()
        codes.count()
        out["fit_sec"] = round(time.perf_counter() - t0, 3)
        for tag, rerank in (("adc", None), ("rerank50", 50)):
            plan = lambda: ivf_pq_serve_topk(  # noqa: E731
                queries, codes, centroids, books, k=3, rerank=rerank, corpus=emb
            )
            _timed(plan())
            out[f"serve_{tag}_sec"] = round(min(_timed(plan()) for _ in range(3)), 3)
        codes.unpersist()
    queries.unpersist()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
