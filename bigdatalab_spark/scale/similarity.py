"""Similarity search over embedding columns (scale extension).

Brute-force cosine top-k as the exactness baseline, plus a sign-bucket
(hyperplane-sign) partitioned variant as the scale path: bucketing by
the sign pattern of leading dimensions is a degenerate-but-deterministic
random-hyperplane LSH whose buckets shrink the candidate set by ~2^bits,
and — unlike learned IVF centroids — replays exactly in the SQL oracle.

All vector math is JVM-side higher-order functions (``zip_with`` +
``aggregate`` fold): per-element double cast keeps the fold
bit-identical to the oracle's ``list_sum(list_transform(...))``.

Scale notes: brute-force is O(Q x N) but embarrassingly parallel — the
query side broadcasts, the corpus never shuffles; the bucketed variant
prunes the corpus scan to matching buckets (partition pruning if the
corpus is written bucketed/partitioned by ``bucket``). For real ANN at
100 TB you'd add an IVF coarse quantizer trained offline; the plumbing
(bucket column, per-bucket top-k) is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SIGN_BUCKET_BITS = 4


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns (double fold,
    index order — deterministic)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def sign_bucket(vec: Column, bits: int = SIGN_BUCKET_BITS) -> Column:
    """Bucket id from the sign bits of the first ``bits`` dimensions."""
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(
            F.element_at(vec, i + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return out


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries against the corpus, rank
    per query. Returns (query_id, rank, neighbor_id, cos_sim)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Sign-bucket ANN: candidates restricted to the query's bucket.

    The bucket equi-join replaces the cross join — at scale this is the
    difference between O(Q x N) and O(Q x N / 2^bits), and the bucket
    column is a partition key for storage-side pruning.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket(F.col(vec_col)).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = F.broadcast(q).join(c, "bucket").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by sign bucket.

    Only pairs inside one bucket are compared (near-identical vectors
    share sign patterns except within ~|cos boundary| of a hyperplane);
    candidate count per bucket is what you size ``bits`` against at
    100 TB.
    """
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col)).alias("bucket"),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("id1"),
            F.col("b.vid").alias("id2"),
            cosine(F.col("a.vec"), F.col("b.vec")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_pandas_udf():
    """Arrow-vectorized cosine as a scalar ``pandas_udf`` — the sanctioned
    Python escape hatch (SURVEY §2.9) for vector math that outgrows
    column expressions. Returns the udf; apply as ``udf(a, b)``.

    Batch semantics: one numpy matmul per Arrow batch, ~100x faster than
    a row-at-a-time Python UDF; still slower than the pure-JVM
    ``cosine()`` fold for 64-dim vectors, so the column expression stays
    the default."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them, which the pandas_udf hint parser can't evaluate
    def _cos(a, b):
        # float64 up-cast: the parquet column is float32 and numpy would
        # otherwise accumulate in single precision
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / den)

    return pandas_udf(_cos, "double", PandasUDFType.SCALAR)


def ivf_kmeans_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN with a real trained coarse quantizer (pyspark.ml KMeans).

    Offline phase: fit KMeans(seed) on the corpus, assign every vector a
    centroid id (this is the partition/bucket column you'd write the
    corpus by at 100 TB). Online phase: route queries to their
    ``n_probe`` nearest centroids with a broadcast join against the
    centroid table (tiny — it lives on every executor; only the model
    fit and the centroid literals touch the driver), then exact cosine
    top-k within the probed buckets only. The routing is fully
    distributed — a query *set* of any size streams through the same
    broadcast-nested-loop + per-query window, nothing is collected.

    Deterministic given the seed (probe ties broken by bucket id), but
    the centroids are not SQL-replayable -> registered as a rows-only
    query; recall vs brute force is asserted in tests/test_scale.py.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_v = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(corpus_v)
    assigned = model.transform(corpus_v).select(
        "neighbor_id", "cv", F.col("prediction").alias("bucket")
    )

    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    spark = queries.sparkSession
    centroids = spark.createDataFrame(
        [(int(b), [float(x) for x in c]) for b, c in enumerate(model.clusterCenters())],
        "bucket int, center array<double>",
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("bucket"))
    probes = (
        q_rows.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "bucket",
            cosine(F.col("qv"), F.col("center")).alias("c_sim"),
        )
        .withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "bucket")
    )

    scored = (
        F.broadcast(probes.join(F.broadcast(q_rows), "query_id"))
        .join(assigned, "bucket")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )
