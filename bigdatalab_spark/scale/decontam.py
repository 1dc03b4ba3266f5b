"""Benchmark decontamination operators (scale extension).

Training corpora must not contain evaluation data. Two standard
defenses, both expressed as keyed joins so they scale to 100 TB:

- **n-gram overlap** (the GPT-3 / PaLM recipe): a train document is
  contaminated when it shares at least one word n-gram with any held-out
  document. Shape: explode each side to distinct (doc, ngram-hash)
  pairs, inner-join on the hash, aggregate per train doc. Both explodes
  partially aggregate map-side; the join shuffles 8-byte hashes, never
  the text itself.
- **cluster leakage** (near-dup aware): a train document is leaked when
  its near-duplicate cluster (MinHash-LSH + connected components)
  contains any held-out document — catches paraphrases that exact
  n-gram matching misses. Shape: one join of cluster labels to split
  labels plus one per-cluster aggregate.

Hashes are the portable 28-bit md5 family
(:mod:`bigdatalab_spark.scale.hashing`), so DuckDB replays every stage
exactly for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatalab_spark.functions import tokenize, word_shingles
from bigdatalab_spark.scale.hashing import portable_hash

#: overlap window in tokens. Production recipes use 8-13 (GPT-3 used
#: 13-grams); the synthetic corpus' documents are short, so the default
#: stays testable at tiny scale-factors.
DEFAULT_NGRAM = 5


def _doc_ngram_hashes(
    docs: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """Distinct (doc_id, ngram-hash) pairs — one row per n-gram that
    occurs in the document, text dropped before any shuffle."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(tokenize(text_col), n)).alias("ngram"),
        )
        .select("doc_id", portable_hash(F.col("ngram")).alias("ngram_h"))
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame,
    n: int = DEFAULT_NGRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
    holdout_splits: tuple[str, ...] = ("val", "test"),
) -> DataFrame:
    """Flag train documents sharing any word n-gram with a held-out doc.

    ``docs`` must already carry ``split_col`` (e.g. from
    :func:`bigdatalab_spark.scale.curation.hash_split`). Returns one row
    per contaminated train document:
    ``(doc_id, n_shared_ngrams, n_holdout_docs)`` — how many distinct
    n-grams it shares and with how many distinct held-out documents.

    Scale shape: the held-out side is a small fraction of the corpus
    (10-20%), and after ``distinct()`` it is a set of 8-byte hashes —
    at 100 TB of train data the holdout n-gram set is typically
    broadcast-able; otherwise AQE picks a shuffle join on the hash.
    Nothing ever joins on raw text.
    """
    train = docs.filter(F.col(split_col) == "train")
    holdout = docs.filter(F.col(split_col).isin(*holdout_splits))
    train_ngrams = _doc_ngram_hashes(train, n, text_col, id_col)
    holdout_ngrams = _doc_ngram_hashes(holdout, n, text_col, id_col).select(
        F.col("doc_id").alias("holdout_doc_id"), "ngram_h"
    )
    return (
        train_ngrams.join(holdout_ngrams, "ngram_h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("ngram_h").alias("n_shared_ngrams"),
            F.countDistinct("holdout_doc_id").alias("n_holdout_docs"),
        )
    )


def cluster_split_leakage(
    clusters: DataFrame,
    splits: DataFrame,
    holdout_splits: tuple[str, ...] = ("val", "test"),
) -> DataFrame:
    """Near-dup-aware decontamination: train documents whose cluster
    contains at least one held-out document.

    ``clusters`` is ``(doc_id, cluster_id)`` (e.g. from
    :func:`bigdatalab_spark.scale.dedup.connected_components` over
    MinHash near-dup pairs); ``splits`` is ``(doc_id, split)``. Returns
    ``(doc_id, cluster_id, n_holdout_in_cluster)`` for every leaked
    train document.

    Shape: one equi-join on doc_id (co-partitioned if both sides came
    from the same upstream shuffle), one per-cluster aggregate over the
    held-out minority, one semi-join back — every stage keyed, no
    all-pairs work. This is the split-aware step a group-aware dedup
    pipeline runs AFTER clustering, so train/test leakage through
    paraphrased near-duplicates is removed before training.
    """
    labeled = clusters.join(splits, "doc_id")
    holdout_per_cluster = (
        labeled.filter(F.col("split").isin(*holdout_splits))
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_holdout_in_cluster"))
    )
    return (
        labeled.filter(F.col("split") == "train")
        .join(holdout_per_cluster, "cluster_id")
        .select("doc_id", "cluster_id", "n_holdout_in_cluster")
    )
