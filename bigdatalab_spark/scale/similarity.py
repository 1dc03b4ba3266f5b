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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SIGN_BUCKET_BITS = 4

# Registered-query defaults for the multi-table random-hyperplane LSH:
# pinned (not corpus-derived) so the static SQL oracle replays the same
# pipeline at every sf. Library callers get corpus-derived bits via
# ``bits=None`` -> :func:`hyperplane_bits_for`.
RHP_TABLES = 8
RHP_BITS = 4
RHP_SEED = 7
RHP_PLANE_DECIMALS = 3


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


def sign_bucket_near_dups(
    vectors: DataFrame,
    threshold: float = 0.9,
    bits: int = SIGN_BUCKET_BITS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Single-table leading-dimension sign blocking — the cheap variant.

    One hash table, one self-join; recall is limited (a pair is missed
    whenever ANY of the ``bits`` leading dimensions straddles zero
    between the two vectors — measured ~20% at threshold 0.4 on the
    gate corpus). Kept as the minimal-cost option; the production
    near-dup path is :func:`rhp_near_dups` (multi-table random
    hyperplanes, recall amplified by table union). Size ``bits`` with
    :func:`hyperplane_bits_for` so per-bucket candidate counts stay
    ~constant as the corpus grows.
    """
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), bits=bits).alias("bucket"),
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


# backward-compatible name; the registered query now routes to
# rhp_near_dups (see queries/similarity.py)
# Exported alias: the engine's embedding near-dup entry point IS the
# sign-bucket blocked implementation above (see its docstring for the
# algorithm and scale contract).
embedding_near_dups = sign_bucket_near_dups


def hyperplane_bits_for(n_rows: int, target_bucket_rows: int = 32, max_bits: int = 24) -> int:
    """Corpus-sized hash width: ``bits ~= log2(n / target)`` puts the
    EXPECTED bucket at ``target_bucket_rows`` for sign-random data, so
    total candidate pairs ~= n * target / 2 — linear in n, not n².
    At 100 TB you compute n from table metadata (a count over parquet
    footers), not a data scan. Clamped to [4, max_bits]; 2^bits buckets
    must also comfortably exceed the executor count for parallelism.
    """
    if n_rows <= target_bucket_rows:
        return 4
    return max(4, min(max_bits, math.ceil(math.log2(n_rows / target_bucket_rows))))


def random_hyperplanes(
    dim: int,
    bits: int = RHP_BITS,
    tables: int = RHP_TABLES,
    seed: int = RHP_SEED,
    decimals: int = RHP_PLANE_DECIMALS,
) -> list[list[list[float]]]:
    """``tables`` independent sets of ``bits`` Gaussian hyperplanes
    (Charikar sign-random-projection LSH), deterministic from the seed.

    Rounded to ``decimals`` so the SAME literals embed in the Spark plan
    and the SQL oracle: rounding does not affect LSH quality (any
    full-rank projection works) but keeps the oracle string exact. The
    planes are plan-side constants — tables*bits*dim doubles, broadcast
    with the plan itself, never a data-side join.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        [[float(x) for x in np.round(plane, decimals)] for plane in table]
        for table in rng.standard_normal((tables, bits, dim))
    ]


def hyperplane_table_rows(
    vectors: DataFrame,
    planes: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vid, tbl, sig) rows — one signature per hash table per vector.

    The embedding analogue of minhash ``band_rows``
    (bigdatalab_spark/scale/dedup.py): sig packs the sign bit of each
    plane dot product, computed as the same JVM ``zip_with``+fold used
    everywhere in this module (bit-identical to the oracle's
    ``list_sum(list_transform(...))``). Narrow — the explode multiplies
    rows by ``tables`` but nothing shuffles until the bucket join.
    """
    # assembled as ONE SQL expression string: tables*bits*dim literal
    # doubles built Column-by-Column cost thousands of py4j round
    # trips of pure driver time per plan (the same fix as
    # pq._sq_dist_sql — see its exactness note; repr round-trips every
    # finite double and the parsed tree is the identical fold)
    entries = []
    for t, table in enumerate(planes):
        terms = ["0"]
        for i, plane in enumerate(table):
            arr = "array(" + ", ".join(f"{float(x)!r}D" for x in plane) + ")"
            dot = (
                f"aggregate(zip_with(`{vec_col}`, {arr}, "
                "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                "0.0D, (acc, x) -> acc + x)"
            )
            terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
        entries.append(
            f"named_struct('tbl', {t}, 'sig', {' + '.join(terms)})"
        )
    return vectors.select(
        F.col(id_col).alias("vid"),
        F.explode(F.expr("array(" + ", ".join(entries) + ")")).alias("b"),
    ).select("vid", "b.tbl", "b.sig")


def rhp_candidate_pairs(
    rows: DataFrame, max_bucket_size: int | None = None
) -> DataFrame:
    """Distinct candidate pairs (id1 < id2) sharing >= 1 (tbl, sig)
    bucket — union over the hash tables, exactly the minhash-LSH
    banding join shape (dedup.lsh_candidate_pairs) keyed on (tbl, sig).

    ``max_bucket_size`` is the same degenerate-bucket quadratic guard:
    a bucket of b vectors contributes C(b,2) pairs, so one hot bucket
    (zero vectors, constant embeddings) can go quadratic. The window
    count reuses the join's own (tbl, sig) exchange; no persist — the
    r3 LSH A/B (SCALE_NOTES) showed persisting the capped band frame
    inside the self-join costs more in materialization/memory pressure
    than the recompute it saves (cache ``vectors`` upstream if the
    signature folds are worth saving).
    """
    from bigdatalab_spark.scale.dedup import blocked_self_pairs

    if max_bucket_size is not None:
        wb = Window.partitionBy("tbl", "sig")
        rows = (
            rows.withColumn("_n_bucket", F.count(F.lit(1)).over(wb))
            .filter(F.col("_n_bucket") <= max_bucket_size)
            .drop("_n_bucket")
        )
    return blocked_self_pairs(rows, key_cols=("tbl", "sig"), id_col="vid")


def rhp_near_dups(
    vectors: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    bits: int | None = None,
    tables: int = RHP_TABLES,
    seed: int = RHP_SEED,
    max_bucket_size: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-dup pairs via multi-table random-hyperplane LSH.

    Recall is amplified by the table union: a pair at angle θ agrees
    with one plane w.p. p = 1 − θ/π, collides in one table w.p. p^bits,
    and is MISSED only if all ``tables`` tables miss —
    (1 − p^bits)^tables. bits controls bucket size (candidate cost,
    size with :func:`hyperplane_bits_for`); tables controls recall at
    fixed bits — the same knobs as minhash rows-per-band × bands.
    Measured on the gate corpus (threshold 0.4): single-table 4-bit
    blocking recovers 12/59 brute-force pairs; 8×4 multi-table recovers
    the sublinear-candidate maximum (see tests/test_scale.py recall
    gate with planted pairs).

    ``dim``/``bits`` default from the data (one ``first()`` row for dim,
    one count for bits — metadata-scale driver actions); pass both
    explicitly in registered queries to keep plan construction job-free
    and the oracle static. Returns (id1, id2, cos_sim), verified exact
    cosine — LSH affects candidate RECALL only, never precision.
    """
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    if bits is None:
        bits = hyperplane_bits_for(vectors.count())
    planes = random_hyperplanes(dim, bits=bits, tables=tables, seed=seed)
    pairs = rhp_candidate_pairs(
        hyperplane_table_rows(vectors, planes, vec_col=vec_col, id_col=id_col),
        max_bucket_size=max_bucket_size,
    )
    v1 = vectors.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    v2 = vectors.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    # pairs ≪ corpus: AQE converts these to broadcast joins at runtime,
    # so the corpus streams and only the candidate list moves.
    # Verification cosine: candidate pairs outnumber the corpus by
    # orders of magnitude (LSH recall blocking, not exact blocking), so
    # the per-pair fold dominates the query — measured 8 of 10 s at
    # sf0.1 (811k pairs from 2k vectors). Evaluate it as ONE Arrow
    # batch kernel per partition instead of an interpreted HOF per row;
    # cosine_fold_pandas_udf is bit-identical to cosine() (see its
    # exactness argument), pinned by test + the strict SQL oracle.
    # asNondeterministic (guide §4.4): the threshold filter references
    # the udf column, and the optimizer otherwise duplicates the UDF
    # below the pushed filter — every surviving pair paid the fold
    # twice (4 ArrowEvalPython nodes in the plan; 1 after).
    fold_cos = cosine_fold_pandas_udf().asNondeterministic()
    return (
        pairs.join(v1, "id1")
        .join(v2, "id2")
        .select(
            "id1",
            "id2",
            fold_cos(F.col("v1"), F.col("v2")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_fold_pandas_udf():
    """Arrow-vectorized cosine that is BIT-IDENTICAL to :func:`cosine`'s
    JVM left-fold (guide §4: hand whole Arrow batches to numpy instead
    of evaluating an interpreted HOF per row — measured ~5× on the
    near-dup verification join, where the fold was ~80% of the query).

    Exactness argument, term by term against the ``zip_with`` +
    ``aggregate`` fold:

    - per-element products: float32→float64 casts are exact and the
      float64 multiply rounds identically in numpy and the JVM;
    - the fold ``acc = (..((0.0 + x0) + x1)..) + xn`` is reproduced
      with ``np.cumsum`` over ``[0.0, x0, .., xn]`` — cumsum is defined
      (and implemented) as SEQUENTIAL partial sums, unlike ``np.sum``/
      ``matmul`` whose pairwise/FMA accumulation drifts in the last
      ulp (the round-12 rejection); the explicit leading 0.0 keeps
      even the ``0.0 + x0`` signed-zero step identical;
    - ``np.sqrt`` and the JVM's ``Math.sqrt`` are both IEEE-754
      correctly rounded, and the final multiply/divide round
      identically.

    NaN/ordering semantics are untouched: the udf only produces the
    double; comparisons on it still run in Spark SQL."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them, which the pandas_udf hint parser can't evaluate
    def _cos(a, b):
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        zero = np.zeros((ma.shape[0], 1))
        dot = np.cumsum(np.concatenate([zero, ma * mb], axis=1), axis=1)[:, -1]
        na = np.sqrt(
            np.cumsum(np.concatenate([zero, ma * ma], axis=1), axis=1)[:, -1]
        )
        nb = np.sqrt(
            np.cumsum(np.concatenate([zero, mb * mb], axis=1), axis=1)[:, -1]
        )
        return pd.Series(dot / (na * nb))

    return pandas_udf(_cos, "double", PandasUDFType.SCALAR)


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
    query_join: str = "broadcast",
    fit_key: tuple | None = None,
) -> DataFrame:
    """IVF ANN with a real trained coarse quantizer (pyspark.ml KMeans).

    Offline phase: fit KMeans(seed) on the corpus, assign every vector a
    centroid id (this is the partition/bucket column you'd write the
    corpus by at 100 TB). Online phase: route queries to their
    ``n_probe`` nearest centroids with a broadcast join against the
    centroid table (tiny — it lives on every executor; only the model
    fit and the centroid literals touch the driver), then exact cosine
    top-k within the probed buckets only. The routing is fully
    distributed — nothing is collected — but the CANDIDATE join strategy
    is a regime choice, ``query_join``:

    - ``"broadcast"`` (default): the probes⋈queries frame broadcasts to
      the corpus buckets. Assumes Q ≪ N — the usual IVF serving regime
      (a query batch against a huge corpus). The query set must fit the
      broadcast limit; it does NOT "stream through at any size".
    - ``"shuffle"``: big-Q batch mode (offline joins of two corpora,
      all-pairs dedup between datasets) — plain shuffle equi-join on
      ``bucket``, both sides exchange-partitioned; no broadcast of
      either side, so Q may exceed executor memory. Hot buckets (a
      popular centroid) are AQE's skew-join case — the session factory
      enables AQE, which splits oversized bucket partitions at runtime;
      pre-salting is unnecessary because the per-query window below
      re-shuffles on query_id anyway.

    Deterministic given the seed (probe ties broken by bucket id), but
    the centroids are not SQL-replayable -> registered as a rows-only
    query; recall vs brute force AND broadcast-vs-shuffle result
    equality are asserted in tests/test_scale.py.
    """
    assigned, centroids = fit_ivf_index(
        corpus, n_centroids=n_centroids, seed=seed, vec_col=vec_col,
        id_col=id_col, fit_key=fit_key,
    )
    return ivf_serve_topk(
        queries,
        assigned,
        centroids,
        k=k,
        n_probe=n_probe,
        vec_col=vec_col,
        id_col=id_col,
        query_join=query_join,
    )


#: session-scoped fitted-KMeans store, keyed on (caller fit key, k,
#: seed, maxIter) — the coarse-quantizer twin of
#: pq._CODEBOOK_MEMO: "fit offline once, serve every query batch" is
#: the documented production shape (fit_ivf_index docstring, pq module
#: docstring), and the per-call refit was pure fixed cost (~20
#: scheduler-bound Lloyd iterations per invocation at gate scale).
#: Entries are KMeansModel handles (centroid-sized); bounded FIFO.
_KMEANS_MEMO: dict[tuple, object] = {}
_KMEANS_MEMO_MAX = 16


def _fit_kmeans_cached(frame, fit_key, k: int, seed: int, max_iter: int = 20):
    """Seeded ``KMeans(k, seed, maxIter).fit(frame)`` with a session
    memo. ``fit_key`` must identify the SESSION and the training-frame
    contents — callers pass ``(applicationId, corpus_fingerprint(...),
    "<recipe tag>")``, the same contract as
    :func:`~bigdatalab_spark.scale.pq.train_codebooks_cached` (the
    fingerprint folds file sizes/mtimes, so in-session data changes
    refit instead of silently serving stale centroids; the recipe tag
    keeps different feature constructions over the same corpus from
    colliding). ``fit_key=None`` disables the memo — library callers
    with ad-hoc frames always refit. Results are identical either way:
    a seeded fit over the same frame is deterministic, so the memo
    skips recomputation, never changes it."""
    from pyspark.ml.clustering import KMeans

    if fit_key is None:
        return KMeans(k=k, seed=seed, maxIter=max_iter).fit(frame)
    key = (fit_key, k, seed, max_iter)
    if key not in _KMEANS_MEMO:
        while len(_KMEANS_MEMO) >= _KMEANS_MEMO_MAX:
            _KMEANS_MEMO.pop(next(iter(_KMEANS_MEMO)))
        _KMEANS_MEMO[key] = KMeans(k=k, seed=seed, maxIter=max_iter).fit(frame)
    return _KMEANS_MEMO[key]


def fit_ivf_index(
    corpus: DataFrame,
    n_centroids: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fit_key: tuple | None = None,
) -> tuple[DataFrame, DataFrame]:
    """OFFLINE phase of the IVF index, split out so serving can be
    timed (and re-run) without re-fitting: train the coarse quantizer
    (pyspark.ml KMeans) and bucket every corpus vector. Returns
    ``(assigned, centroids)`` — assigned is corpus-sized (the frame
    you'd WRITE partitioned by bucket at 100 TB; callers may persist
    it), centroids is n_centroids rows (broadcast-sized). The x100
    bench showed the end-to-end IVF numbers are fit-dominated — this
    split is what makes the serving join's scaling measurable."""
    from pyspark.ml.functions import array_to_vector

    corpus_v = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    model = _fit_kmeans_cached(corpus_v, fit_key, n_centroids, seed)
    assigned = model.transform(corpus_v).select(
        "neighbor_id", "cv", F.col("prediction").alias("bucket")
    )
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(int(b), [float(x) for x in c]) for b, c in enumerate(model.clusterCenters())],
        "bucket int, center array<double>",
    )
    return assigned, centroids


def ivf_serve_topk(
    queries: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_join: str = "broadcast",
) -> DataFrame:
    """ONLINE phase of the IVF index over a prebuilt
    :func:`fit_ivf_index` result: route queries to their ``n_probe``
    nearest centroids (broadcast of the tiny centroid table), exact
    cosine top-k within probed buckets only. Join-strategy semantics
    identical to :func:`ivf_kmeans_topk`'s ``query_join``."""
    if query_join not in ("broadcast", "shuffle"):
        raise ValueError("query_join must be 'broadcast' or 'shuffle'")
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
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

    routed = probes.join(
        F.broadcast(q_rows) if query_join == "broadcast" else q_rows, "query_id"
    )
    if query_join == "broadcast":
        routed = F.broadcast(routed)
    scored = routed.join(assigned, "bucket").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fit_key: tuple | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup over an embedding column.

    The SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540): cluster
    the corpus with a seeded KMeans, then compare pairs only WITHIN a
    cluster and drop every vector that has a lower-id cluster-mate at
    ``cos_sim >= threshold`` — one survivor per near-identical group,
    chosen deterministically (the minimum id).

    Returns (vec_id, cluster_id, is_kept, dup_of, max_sim): ``dup_of``
    is the smallest-id duplicate witness and ``max_sim`` the highest
    similarity to any lower-id cluster-mate (NULL for kept rows).

    Scale design: the cluster id is the blocking key — the quadratic
    all-pairs problem becomes per-cluster joins, exactly the LSH-bucket
    shape (``k`` sized so n/k bounds the bucket; a hot centroid is
    AQE's skew-join case). At 100 TB the cluster id doubles as the
    storage partition column so re-runs prune to co-located scans, and
    the keep decision is a map-side-combinable min aggregate, not a
    window sort. Pairs missed across cluster boundaries are the
    documented recall trade-off of the method (mitigate with more
    clusters + a second pass on boundary shells, or the
    :func:`rhp_near_dups` multi-table LSH when recall dominates cost).
    KMeans centroids are not SQL-replayable -> registered rows-only;
    the decision contract is asserted in tests/test_scale.py.
    """
    from pyspark.ml.functions import array_to_vector

    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    model = _fit_kmeans_cached(v, fit_key, n_clusters, seed)
    assigned = model.transform(v).select(
        "vid", "vec", F.col("prediction").alias("cluster_id")
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    # pairwise cosine via the bit-exact Arrow batch kernel, not the
    # interpreted per-row HOF fold — the same swap (and the same
    # exactness argument) as rhp_near_dups' verification stage: the
    # kernel reproduces the sequential left fold double-for-double
    # (see cosine_fold_pandas_udf), and asNondeterministic keeps the
    # threshold filter from duplicating the UDF below the pushed
    # filter (guide §4.4). Within-cluster pairs dominate this query
    # (C(n/k, 2) per cluster), so the per-pair fold was most of it.
    fold_cos = cosine_fold_pandas_udf().asNondeterministic()
    witnesses = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("b.vid").alias("vid"),
            F.col("a.vid").alias("src"),
            fold_cos(F.col("a.vec"), F.col("b.vec")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .groupBy("vid")
        .agg(F.min("src").alias("dup_of"), F.max("cos_sim").alias("max_sim"))
    )
    return assigned.join(witnesses, "vid", "left").select(
        F.col("vid").alias("vec_id"),
        "cluster_id",
        F.col("dup_of").isNull().alias("is_kept"),
        "dup_of",
        "max_sim",
    )


def save_ivf_index(
    assigned: DataFrame, centroids: DataFrame, path: str
) -> None:
    """Persist a :func:`fit_ivf_index` result as the DURABLE index the
    fit docstring promises: the bucketed corpus written PARTITIONED BY
    its bucket (``path/corpus/bucket=N/``) and the centroid table
    beside it (``path/centroids``). The partition layout is the point —
    a serving join against this index prunes its scan to the probed
    buckets' directories via dynamic partition pruning (asserted in
    tests), so a 2-of-8-probe query batch reads 1/4 of a 100 TB corpus
    from disk, not all of it."""
    assigned.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/corpus"
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    assigned.sparkSession.createDataFrame(
        [], "neighbor_id long"
    ).write.mode("overwrite").parquet(f"{path}/tombstones")


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Euclidean argmin bucket assignment against a FIXED centroid
    table — the append-path twin of ``KMeans.transform`` (pinned
    equivalent on real data by the pytest): squared L2 to every
    centroid via a broadcast cross join, ``row_number`` argmin with
    ties broken by the lowest bucket id (KMeans's first-index-wins).
    Returns the :func:`fit_ivf_index` ``assigned`` schema
    ``(neighbor_id, cv, bucket)``, so the output appends cleanly onto
    a stored index. Fully distributed — the only driver-sized object
    is the broadcast centroid table."""
    d = F.zip_with(
        F.col("cv"),
        F.col("center"),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    w = Window.partitionBy("neighbor_id").orderBy(F.asc("_d2"), F.asc("bucket"))
    return (
        vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
        .crossJoin(F.broadcast(centroids))
        .select(
            "neighbor_id",
            "cv",
            "bucket",
            F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x).alias("_d2"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("neighbor_id", "cv", "bucket")
    )


def append_to_ivf_index(
    new_vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Fold new vectors into a stored :func:`save_ivf_index` without
    refitting — the ANN twin of
    :func:`~bigdatalab_spark.scale.dedup.append_to_dedup_index`, and
    the operation a daily embedding-ingest pipeline actually runs: the
    coarse quantizer is FROZEN (refitting would re-bucket the whole
    corpus — a full rewrite, done deliberately and rarely), new
    vectors are assigned to their nearest stored centroid by
    :func:`assign_to_centroids`, and the rows land in the existing
    ``bucket=N/`` partition directories, so serving's partition
    pruning is untouched.

    Crash/concurrency story: the append touches ONE store (centroids
    are immutable), written by a single Spark job whose files become
    visible only at job commit — a crashed append leaves ``_temporary``
    debris, never half-visible rows. The writer lock serializes
    appends against each other and against a concurrent rebuild
    (``save_ivf_index``'s overwrite racing an append interleaves into
    a mixed-generation corpus). Ids must be new — appending an
    existing neighbor_id duplicates it in every serve result.

    The documented drift trade-off: vectors from a distribution the
    original fit never saw still go to their nearest OLD centroid;
    buckets grow unbalanced as drift accumulates (monitor bucket
    sizes; refit + ``save_ivf_index`` is the rebalance)."""
    from bigdatalab_spark.sources.locks import dataset_write_lock

    spark = new_vectors.sparkSession
    with dataset_write_lock(path, "append_to_ivf_index"):
        centroids = spark.read.parquet(f"{path}/centroids")
        assign_to_centroids(new_vectors, centroids, vec_col, id_col).write.mode(
            "append"
        ).partitionBy("bucket").parquet(f"{path}/corpus")


def compact_ivf_index(
    spark, path: str, max_records_per_file: int = 5_000_000
) -> dict:
    """Small-file compaction for a :func:`save_ivf_index` layout — the
    maintenance job :func:`append_to_ivf_index` makes necessary (every
    append lands one file set into the touched ``bucket=N/``
    directories). Layout-only: the corpus store is rewritten
    clustered back onto its bucket partitions (pruning contract
    untouched, serve bit-identical — pinned by the pytest) via the
    two-rename atomic-with-resume flip; centroids are a handful of
    rows and are left alone. Same index-root writer lock as append,
    so a compaction cannot interleave with one.

    Choosing ``max_records_per_file`` (measured, SCALE_NOTES round-8):
    a probe-pruned serve reads only ``n_probe`` buckets, so its scan
    parallelism is floored at files-per-bucket × n_probe while bucket
    files are under ``spark.sql.files.maxPartitionBytes`` — compacting
    a sub-128MB-per-bucket corpus to ONE file per bucket throttled the
    600k-vector serve 4× (4 tasks on 32 cores). Keep roughly
    (cores / n_probe) files per bucket at that scale; once buckets
    exceed maxPartitionBytes the ceiling vanishes (parquet row-group
    splitting restores parallelism) and bigger files win outright."""
    from bigdatalab_spark.sources.locks import dataset_write_lock
    from bigdatalab_spark.sources.sinks import _compact_partitions_locked

    with dataset_write_lock(path, "compact_ivf_index"):
        return {
            "corpus": _compact_partitions_locked(
                spark, f"{path}/corpus", ("bucket",), max_records_per_file
            )
        }


def refit_ivf_index(
    spark, path: str, n_centroids: int | None = None, seed: int = 42
) -> dict:
    """The deliberate, rare FULL rewrite that closes
    :func:`append_to_ivf_index`'s documented drift trade-off: appends
    keep the coarse quantizer frozen, so old centroids slowly absorb
    new distributions (a genuinely novel vector cluster lands in — and
    stretches — whichever stale bucket is nearest, degrading that
    bucket's selectivity for every query). Refit retrains KMeans on
    the CURRENT stored corpus, re-buckets every vector, and replaces
    the index in place. ``n_centroids`` defaults to the stored count;
    raise it when drift added genuinely new clusters (the pytest's
    drift scenario).

    Crash/concurrency story: the new generation (corpus AND centroids
    together) is staged to a fresh sibling of the INDEX ROOT and the
    whole root flips via the two-rename resume-safe protocol — a
    mixed-generation window (new bucket assignment served against old
    centroids, which would silently probe the wrong directories) is
    structurally impossible; mid-flip the root is missing and loads
    fail loudly, and re-running the refit resumes the flip through the
    debris preamble. The writer lock is a SIBLING of the root, so the
    flip never carries it away, and a refit cannot interleave with an
    append/compaction. IVF-PQ indexes refit by rebuilding
    (fit_ivf_pq_index + save_ivf_pq_index): their codebooks must be
    retrained with the quantizer, so there is no cheaper path to
    share. Returns ``{n_vectors, n_centroids}``."""
    import os
    import shutil

    from bigdatalab_spark.sources.locks import dataset_write_lock

    with dataset_write_lock(path, "refit_ivf_index"):
        fresh, old = f"{path}__refit_fresh", f"{path}__refit_old"
        if os.path.exists(fresh):
            shutil.rmtree(fresh)
        if os.path.exists(old):
            if not os.path.exists(path):
                os.rename(old, path)  # resume the interrupted root flip
            else:
                shutil.rmtree(old)
        corpus, centroids = load_ivf_index(spark, path)
        k = n_centroids if n_centroids is not None else centroids.count()
        assigned, cents = fit_ivf_index(
            corpus.select("neighbor_id", "cv"),
            n_centroids=k,
            seed=seed,
            vec_col="cv",
            id_col="neighbor_id",
        )
        save_ivf_index(assigned, cents, fresh)
        n_vectors = spark.read.parquet(f"{fresh}/corpus").count()
        os.rename(path, old)  # root flip: old generation aside ...
        os.rename(fresh, path)  # ... new generation into place
        shutil.rmtree(old)
        return {"n_vectors": n_vectors, "n_centroids": k}


def _apply_index_tombstones(spark, rows: DataFrame, path: str) -> DataFrame:
    """Anti-join an index's neighbor_id-keyed store against its
    ``path/tombstones``, shared by the IVF and IVF-PQ loads. Indexes
    written before tombstones existed have no store — treated as
    empty (a plain scan, no join inserted). Measured: the anti-join
    does not displace the serving join's dynamic partition pruning
    (the probed-bucket scan contract survives — pinned in tests)."""
    import os

    if not os.path.exists(f"{path}/tombstones"):
        return rows
    # the tombstone store's schema is fixed by construction (created as
    # ``neighbor_id long``, appends cast to long) — pass it explicitly
    # so the open never runs a footer-inference job (one Spark job per
    # serve otherwise; guide §5)
    tomb = spark.read.schema("neighbor_id bigint").parquet(f"{path}/tombstones")
    return rows.join(tomb, "neighbor_id", "left_anti")


def _remove_from_index(vec_ids: DataFrame, path: str, op: str) -> int:
    """Shared logical-delete core for the ANN indexes (the embedding
    twin of :func:`~bigdatalab_spark.scale.dedup.remove_from_dedup_index`):
    O(delete-batch) append of ids to ``path/tombstones`` under the
    writer lock, eagerly staged and anti-joined against the current
    store so re-removals are no-ops. Returns new tombstones written."""
    import os
    import shutil

    from bigdatalab_spark.sources.locks import dataset_write_lock
    from bigdatalab_spark.sources.sinks import resume_interrupted_flip

    spark = vec_ids.sparkSession
    ids = vec_ids.select(
        F.col(vec_ids.columns[0]).cast("long").alias("neighbor_id")
    ).distinct()
    with dataset_write_lock(path, op):
        store = f"{path}/tombstones"
        resume_interrupted_flip(store)
        if os.path.exists(store):
            ids = ids.join(
                spark.read.schema("neighbor_id bigint").parquet(store),
                "neighbor_id",
                "left_anti",
            )
        staging = f"{path}/_tombstones_staging"
        ids.write.mode("overwrite").parquet(staging)
        # staged rows come from the cast-to-long select above — pinned
        # read, no inference job
        staged = spark.read.schema("neighbor_id bigint").parquet(staging)
        n_new = staged.count()
        if n_new:
            staged.write.mode("append").parquet(store)
        shutil.rmtree(staging, ignore_errors=True)
        return n_new


def _purge_index_tombstones(
    spark, path: str, row_store: str, op: str, max_records_per_file: int
) -> dict:
    """Shared physical-reclamation core for the ANN indexes: rewrite
    the bucket-partitioned row store without tombstoned ids (riding
    the resume-safe transform+flip), then empty the tombstone store
    LAST. Interrupt-safe for free, as with the dedup purge: loads
    filter by tombstones regardless, so every intermediate state
    serves identically."""
    from bigdatalab_spark.sources.locks import dataset_write_lock
    from bigdatalab_spark.sources.sinks import (
        _compact_flat_locked,
        _compact_partitions_locked,
        resume_interrupted_flip,
    )

    with dataset_write_lock(path, op):
        resume_interrupted_flip(f"{path}/tombstones")
        n_tomb = (
            spark.read.schema("neighbor_id bigint")
            .parquet(f"{path}/tombstones")
            .count()
        )

        def drop_dead(df: DataFrame) -> DataFrame:
            return df.join(
                spark.read.schema("neighbor_id bigint").parquet(
                    f"{path}/tombstones"
                ),
                "neighbor_id",
                "left_anti",
            )

        stats = {
            "n_purged_vectors": n_tomb,
            row_store: _compact_partitions_locked(
                spark, f"{path}/{row_store}", ("bucket",),
                max_records_per_file, transform=drop_dead,
            ),
        }
        stats["tombstones"] = _compact_flat_locked(
            spark, f"{path}/tombstones", max_records_per_file,
            transform=lambda df: df.limit(0),
        )
        return stats


def remove_from_ivf_index(vec_ids: DataFrame, path: str) -> int:
    """Logically delete vectors from a :func:`save_ivf_index` — the
    ANN side of the right-to-be-forgotten contract (a forgotten
    document's embedding must stop being servable as anyone's
    neighbor): ids land in ``path/tombstones`` in O(delete batch),
    and every load anti-joins the corpus store against them, so the
    vectors vanish from all top-k results immediately. Physical
    reclamation is :func:`purge_ivf_tombstones`. First column of
    ``vec_ids`` is taken as the id."""
    return _remove_from_index(vec_ids, path, "remove_from_ivf_index")


def purge_ivf_tombstones(
    spark, path: str, max_records_per_file: int = 5_000_000
) -> dict:
    """Physically reclaim tombstoned vectors from a
    :func:`save_ivf_index` corpus store (bucket partitioning — and the
    serve's partition-pruning contract — preserved), then empty the
    tombstone store. Same interrupt-safety argument as
    :func:`~bigdatalab_spark.scale.dedup.purge_dedup_tombstones`."""
    return _purge_index_tombstones(
        spark, path, "corpus", "purge_ivf_tombstones", max_records_per_file
    )


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a :func:`save_ivf_index` layout back as ``(assigned,
    centroids)``, serve-ready for :func:`ivf_serve_topk`. The corpus
    frame is a plain partitioned-parquet scan, so Catalyst sees the
    bucket directories and can partition-prune the serving join.
    Tombstoned vectors are filtered here (anti-join against
    ``path/tombstones``; DPP on the serving join survives it)."""
    return (
        _apply_index_tombstones(
            spark, spark.read.parquet(f"{path}/corpus"), path
        ),
        spark.read.parquet(f"{path}/centroids"),
    )
