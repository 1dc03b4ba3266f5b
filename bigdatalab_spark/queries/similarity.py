"""Similarity-search queries over ``embeddings`` (scale extension).

Oracles recompute cosine with the same per-element double-cast fold
(``list_sum(list_transform(...))``) which is bit-identical to Spark's
``zip_with``+``aggregate`` — verified, unlike DuckDB's builtin
``list_cosine_similarity`` which accumulates in float32.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.scale.similarity import (
    RHP_BITS,
    RHP_SEED,
    RHP_TABLES,
    SIGN_BUCKET_BITS,
    brute_force_topk,
    bucketed_topk,
    random_hyperplanes,
)
from bigdatalab_spark.sources import corpus_fingerprint, load_table


def _cos_sql(a: str, b: str) -> str:
    def sq(v: str) -> str:
        return f"sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

    dot = (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )
    return f"({dot} / ({sq(a)} * {sq(b)}))"


_BUCKET_SQL = " + ".join(
    f"CASE WHEN {{v}}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
    for i in range(SIGN_BUCKET_BITS)
)


def _bucket(v: str) -> str:
    return "(" + _BUCKET_SQL.format(v=v) + ")"


@query(
    "ann_cosine_topk",
    ids=("SCALE-SIM",),
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 5),
             c AS (SELECT vec_id AS neighbor_id, embedding AS cv
                   FROM embeddings WHERE vec_id >= 5),
             scored AS (
                SELECT query_id, neighbor_id, {_cos_sql('qv', 'cv')} AS cos_sim
                FROM q, c
             )
        SELECT query_id, rank, neighbor_id, cos_sim
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM scored
        )
        WHERE rank <= 5
        ORDER BY query_id, rank
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 5 query vectors — the exactness
    baseline every ANN variant is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb.filter("vec_id < 5"), emb.filter("vec_id >= 5"), k=5
    ).orderBy("query_id", "rank")


@query(
    "ann_bucketed_topk",
    ids=("SCALE-SIM",),
    oracle=f"""
        WITH v AS (
            SELECT vec_id, embedding, {_bucket('embedding')} AS bucket
            FROM embeddings
        ),
        q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
              FROM v WHERE vec_id < 10),
        c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM v),
        scored AS (
            SELECT query_id, neighbor_id, {_cos_sql('qv', 'cv')} AS cos_sim
            FROM q JOIN c USING (bucket)
        )
        SELECT query_id, rank, neighbor_id, cos_sim
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM scored
        )
        WHERE rank <= 3
        ORDER BY query_id, rank
    """,
)
def ann_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bucket ANN top-3: candidates pruned to the query's
    hyperplane-sign bucket — the 2^bits-way partition-pruned scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return bucketed_topk(emb.filter("vec_id < 10"), emb, k=3).orderBy(
        "query_id", "rank"
    )


# The SAME deterministic hyperplanes embed in the Spark plan and the
# oracle string — LSH bucketing replays exactly, so the oracle verifies
# the full multi-table pipeline, not just the cosine verify.
_RHP_PLANES = random_hyperplanes(64, bits=RHP_BITS, tables=RHP_TABLES, seed=RHP_SEED)


def _rhp_sig_sql(v: str, table_planes: list[list[float]]) -> str:
    terms = []
    for i, plane in enumerate(table_planes):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        dot = (
            f"list_sum(list_transform(list_zip({v}, {lit}), "
            f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        )
        terms.append(f"CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


_RHP_SIG_ROWS_SQL = "\n            UNION ALL\n".join(
    f"SELECT vec_id, {t} AS tbl, {_rhp_sig_sql('embedding', tp)} AS sig FROM embeddings"
    for t, tp in enumerate(_RHP_PLANES)
)


@query(
    "embedding_near_dups",
    ids=("SCALE-DEDUP", "SCALE-SIM"),
    oracle=f"""
        WITH sigs AS (
            {_RHP_SIG_ROWS_SQL}
        ),
        pairs AS (
            SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
            FROM sigs a JOIN sigs b
              ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
        )
        SELECT id1, id2,
               {_cos_sql('e1.embedding', 'e2.embedding')} AS cos_sim
        FROM pairs
        JOIN embeddings e1 ON pairs.id1 = e1.vec_id
        JOIN embeddings e2 ON pairs.id2 = e2.vec_id
        WHERE {_cos_sql('e1.embedding', 'e2.embedding')} >= 0.4
        ORDER BY id1, id2
    """,
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via multi-table random-hyperplane LSH
    (8 tables x 4 bits — RHP_TABLES/RHP_BITS — seeded): the r2
    single-table leading-dim blocking recovered 12/59 brute-force pairs
    at this threshold; the table union recovers the rest without an
    all-pairs join (recall gate: tests/test_scale.py)."""
    from bigdatalab_spark.scale.similarity import rhp_near_dups

    emb = load_table(spark, sf_dir, "embeddings")
    return rhp_near_dups(
        emb,
        threshold=0.4,
        dim=64,
        bits=RHP_BITS,
        tables=RHP_TABLES,
        seed=RHP_SEED,
    ).orderBy("id1", "id2")


@query(
    "ann_ivf_kmeans",
    ids=("SCALE-SIM",),
    oracle=None,  # learned centroids are not SQL-replayable; recall vs
    # brute force is asserted in tests/test_scale.py
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: KMeans coarse quantizer (seeded) + probe-2 bucket
    search. The coarse fit comes from the session memo — trained once
    per (session, corpus), amortized over every query batch, same
    contract as the PQ codebook memo."""
    from bigdatalab_spark.scale.similarity import ivf_kmeans_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_kmeans_topk(
        emb.filter("vec_id < 10"),
        emb,
        k=3,
        fit_key=(
            spark.sparkContext.applicationId,
            corpus_fingerprint(sf_dir, "embeddings"),
            "ivf-coarse",
        ),
    ).orderBy("query_id", "rank")


@query(
    "semantic_dedup",
    ids=("SCALE-SIM", "SCALE-DEDUP"),
    oracle=None,  # KMeans centroids are not SQL-replayable; the keep/drop
    # decision contract is asserted in tests/test_scale.py
)
def semantic_dedup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: cluster-blocked embedding dedup, one survivor per
    near-identical group (threshold 0.95, seeded KMeans blocking).
    The blocking KMeans comes from the session memo — fit once per
    (session, corpus)."""
    from bigdatalab_spark.scale.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb,
        threshold=0.95,
        fit_key=(
            spark.sparkContext.applicationId,
            corpus_fingerprint(sf_dir, "embeddings"),
            "semdedup-blocking",
        ),
    ).orderBy("vec_id")


@query(
    "ann_pq_topk",
    ids=("SCALE-SIM",),
    oracle=None,  # learned PQ codebooks are not SQL-replayable; recall
    # vs exact L2 and the compression contract are gated in tests
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with ADC scoring + exact rerank
    (:mod:`bigdatalab_spark.scale.pq`): corpus stored as 8 one-byte
    codes per 64-d vector (32x), scoring touches only code ints + a
    broadcast query LUT, rerank reads just the 50-vector shortlist.
    Codebooks come from the session memo — trained once per
    (session, corpus), amortized over every query batch."""
    from bigdatalab_spark.scale.pq import pq_topk, train_codebooks_cached

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_codebooks_cached(
        emb,
        (spark.sparkContext.applicationId, corpus_fingerprint(sf_dir, "embeddings")),
        m=8,
        k=16,
        seed=42,
    )
    return pq_topk(
        emb.filter("vec_id < 10"), emb, k=5, m=8, rerank=50, codebooks=books
    ).orderBy("query_id", "rank")


@query(
    "ann_ivf_pq",
    ids=("SCALE-SIM",),
    oracle=None,  # two learned quantizers (coarse + PQ); recall gated in tests
)
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (FAISS-style): coarse-centroid routing restricts scoring
    to n_probe buckets; PQ codes + broadcast LUT score them without
    reading corpus floats; exact rerank on the 50-row shortlist.
    Recall@5 0.60 at probe 2/8 on the gate corpus vs 0.84 for full-scan
    PQ — the probed-bucket coverage IS the cost knob. PQ codebooks come
    from the session memo (seed 43 = this query's historical seed+1)."""
    from bigdatalab_spark.scale.pq import ivf_pq_topk, train_codebooks_cached

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_codebooks_cached(
        emb,
        (spark.sparkContext.applicationId, corpus_fingerprint(sf_dir, "embeddings")),
        m=8,
        k=16,
        seed=43,
    )
    return ivf_pq_topk(
        emb.filter("vec_id < 10"),
        emb,
        k=5,
        codebooks=books,
        # the coarse quantizer is session-memoized like the codebooks —
        # refitting it per call was the remaining per-invocation KMeans
        coarse_fit_key=(
            spark.sparkContext.applicationId,
            corpus_fingerprint(sf_dir, "embeddings"),
            "ivfpq-coarse",
        ),
    ).orderBy("query_id", "rank")
