"""Measured quality metrics for the rows-only operator family.

The strict DuckDB oracle gate (tools/oracle_check.py) proves hash-exact
parity for SQL-expressible queries; the operators that are rows-only BY
DESIGN (trained/sampled/approximate: LSH recall, IVF/PQ ANN recall, the
quality classifier, ALS, semantic dedup) are gated instead by DECISION
QUALITY. This tool measures those numbers the way ORACLE_FULL records
parity: one JSON artifact with per-operator metric + threshold + pass,
refreshed by tests/test_quality_report.py so a regression in any
trained/approximate pipeline fails CI, not just a narrative claim.

Every computation is seeded/deterministic modulo float reduction order;
thresholds are the same gates the per-operator pytests enforce.

Usage: python -m tools.quality_report [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import sys


def _topk_sets(rows) -> dict:
    got: dict = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return got


def _mean_recall(exact: dict, got: dict, k: int) -> float:
    return sum(len(exact[q] & got.get(q, set())) / k for q in exact) / len(exact)


def _exact_topk(spark, emb, queries, k: int) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from bigdatalab_spark.scale.pq import _sq_dist

    qq = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    return _topk_sets(
        F.broadcast(qq)
        .crossJoin(cv)
        .select(
            "query_id", "neighbor_id", _sq_dist(F.col("qv"), F.col("cv")).alias("d")
        )
        .withColumn("r", F.row_number().over(w))
        .filter(f"r <= {k}")
        .collect()
    )


def compute_metrics(spark, sf_dir: str) -> list[dict]:
    """Measure every rows-only family metric; returns report rows."""
    import math
    import random

    from pyspark.sql import functions as F

    from bigdatalab_spark.sources import load_table

    out: list[dict] = []

    def add(operator: str, metric: str, value: float, threshold: float) -> None:
        out.append(
            {
                "operator": operator,
                "metric": metric,
                "value": round(float(value), 4),
                "threshold": threshold,
                "pass": bool(value >= threshold),
            }
        )

    # --- MinHash+LSH: recall vs the exact quadratic Jaccard ------------
    from bigdatalab_spark.scale.dedup import minhash_near_dups, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    exact_pairs = {
        (r.doc1, r.doc2) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh_pairs = {
        (r.doc1, r.doc2) for r in minhash_near_dups(docs, threshold=0.8).collect()
    }
    assert lsh_pairs <= exact_pairs, "LSH produced a non-verified pair"
    add(
        "dedup_minhash_lsh",
        "recall_vs_exact_jaccard@0.8",
        len(lsh_pairs & exact_pairs) / max(len(exact_pairs), 1),
        0.9,
    )

    # --- ANN family: recall vs brute force -----------------------------
    from bigdatalab_spark.scale.pq import ivf_pq_topk, pq_topk, train_codebooks
    from bigdatalab_spark.scale.similarity import brute_force_topk, ivf_kmeans_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")

    truth3 = _topk_sets(brute_force_topk(queries, emb, k=3).collect())
    ivf3 = _topk_sets(ivf_kmeans_topk(queries, emb, k=3).collect())
    add(
        "ann_ivf_kmeans",
        "recall@3_probe2_vs_bruteforce",
        len(set().union(*[{(q, n) for n in s} for q, s in ivf3.items()])
            & set().union(*[{(q, n) for n in s} for q, s in truth3.items()]))
        / sum(len(s) for s in truth3.values()),
        0.5,
    )

    exact5 = _exact_topk(spark, emb, queries, k=5)
    books = train_codebooks(emb, m=8, k=16, seed=42)
    pq5 = _topk_sets(
        pq_topk(queries, emb, k=5, m=8, rerank=50, codebooks=books).collect()
    )
    add("ann_pq_topk", "reranked_recall@5", _mean_recall(exact5, pq5, 5), 0.6)

    ivfpq5 = _topk_sets(ivf_pq_topk(queries, emb, k=5, n_probe=2).collect())
    add("ann_ivf_pq", "recall@5_probe2", _mean_recall(exact5, ivfpq5, 5), 0.4)

    # --- trained quality classifier: held-out AUC ----------------------
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    from bigdatalab_spark.scale.curation import hash_split
    from bigdatalab_spark.scale.quality_ml import (
        label_documents,
        score_documents,
        train_quality_classifier,
    )

    split = hash_split(docs, "doc_id")
    model = train_quality_classifier(split.filter(F.col("split") == "train"))
    holdout = split.filter(F.col("split") != "train")
    scored = score_documents(model, holdout).join(
        label_documents(holdout).select("doc_id", "label"), "doc_id"
    )
    auc = BinaryClassificationEvaluator(
        rawPredictionCol="p_good", labelCol="label"
    ).evaluate(scored.withColumn("p_good", F.col("p_good").cast("double")))
    add("quality_classifier", "heldout_auc", auc, 0.80)

    # --- ALS: planted block-preference recovery ------------------------
    from bigdatalab_spark.scale.recsys import train_als

    rows = [(c, s, 5) for c in range(20) for s in range(5)]
    rows += [(c, s, 5) for c in range(20, 40) for s in range(10, 15)]
    inter = spark.createDataFrame(rows, ["o_custkey", "l_suppkey", "cnt"])
    top1 = {
        r["o_custkey"]: r["recommendations"][0]["l_suppkey"]
        for r in train_als(inter, rank=4, max_iter=10)
        .recommendForAllUsers(1)
        .collect()
    }
    in_block = sum(
        1 for c, s in top1.items() if (c < 20 and s < 5) or (c >= 20 and s >= 10)
    )
    add("als_recommendations", "planted_block_top1_rate", in_block / len(top1), 0.9)

    # --- semantic dedup: planted near-copy decisions -------------------
    from bigdatalab_spark.scale.similarity import semantic_dedup

    rng = random.Random(11)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(40)]
    planted = [(i, v) for i, v in enumerate(base)]
    for j in range(3):
        planted.append((100 + j, [x + rng.gauss(0, 1e-4) for x in base[0]]))
    sem = semantic_dedup(
        spark.createDataFrame(planted, "vec_id long, embedding array<double>"),
        threshold=0.99,
        n_clusters=4,
        seed=1,
    ).collect()
    by_id = {r["vec_id"]: r for r in sem}
    # 4 planted decisions: keep id 0, drop 100-102 each naming witness 0
    correct = int(by_id[0]["is_kept"]) + sum(
        int(not by_id[i]["is_kept"] and by_id[i]["dup_of"] == 0)
        for i in (100, 101, 102)
    )
    add("semantic_dedup", "planted_decision_rate", correct / 4, 1.0)

    return out


def main() -> int:
    from bigdatalab_spark.session import get_session

    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    out_path = argv[1] if len(argv) > 1 else "QUALITY_r05.json"
    spark = get_session(app_name="quality-report")
    spark.sparkContext.setLogLevel("ERROR")
    report = {"sf_dir": sf_dir, "metrics": compute_metrics(spark, sf_dir)}
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    for m in report["metrics"]:
        flag = "OK " if m["pass"] else "FAIL"
        print(
            f"[{flag}] {m['operator']:24} {m['metric']:32} "
            f"{m['value']:8.4f} >= {m['threshold']}"
        )
    n_pass = sum(m["pass"] for m in report["metrics"])
    print(f"{n_pass}/{len(report['metrics'])} quality gates pass -> {out_path}")
    return 0 if n_pass == len(report["metrics"]) else 1


if __name__ == "__main__":
    sys.exit(main())
