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
    occurs in the document, text dropped before any shuffle.

    The token array is materialized in its own projection BEFORE
    ``word_shingles`` (the higher-order-function CSE gotcha: an inline
    ``tokenize`` re-splits the document once per shingle position,
    turning a linear scan O(len²) — measured 13 s vs 0.6 s on 5k docs).
    """
    toks = docs.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("toks"))
    return (
        toks.select("doc_id", F.explode(word_shingles(F.col("toks"), n)).alias("ngram"))
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
    max_holdout_df: int | None = None,
) -> DataFrame:
    """Flag train documents sharing any word n-gram with a held-out doc.

    ``docs`` must already carry ``split_col`` (e.g. from
    :func:`bigdatalab_spark.scale.curation.hash_split`). Returns one row
    per contaminated train document: ``(doc_id, n_shared_ngrams)``.

    Scale shape — this is deliberately a *set* join, not a doc-pair
    join: the holdout side is reduced to its DISTINCT n-gram hashes
    before joining, so a popular n-gram contributes at most one output
    row per train document containing it. Joining (train doc, ngram) ×
    (holdout doc, ngram) pairs instead goes quadratic the moment a
    boilerplate n-gram is common on both sides — measured 6.4× growth
    at 10× data on the synthetic corpus; the set join is linear (which
    holdout docs leaked is the cluster operator's job, see
    :func:`cluster_split_leakage`). The holdout set is 8-byte hashes
    from the 10-20% split — typically broadcast-able at 100 TB; AQE
    falls back to a hash-partitioned join when it isn't. Nothing ever
    joins on raw text.

    ``max_holdout_df`` optionally drops n-grams occurring in more than
    that many held-out documents before the join — the boilerplate
    filter real decontamination recipes apply so that a site-wide
    footer shared by half the corpus doesn't mark everything
    contaminated. Off (None) by default.
    """
    train = docs.filter(F.col(split_col) == "train")
    holdout = docs.filter(F.col(split_col).isin(*holdout_splits))
    train_ngrams = _doc_ngram_hashes(train, n, text_col, id_col)
    holdout_pairs = _doc_ngram_hashes(holdout, n, text_col, id_col)
    if max_holdout_df is not None:
        holdout_set = (
            holdout_pairs.groupBy("ngram_h")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_holdout_df)
            .select("ngram_h")
        )
    else:
        holdout_set = holdout_pairs.select("ngram_h").distinct()
    return (
        train_ngrams.join(holdout_set, "ngram_h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
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
