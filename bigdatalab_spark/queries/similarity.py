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
    SIGN_BUCKET_BITS,
    brute_force_topk,
    bucketed_topk,
    embedding_near_dups,
)
from bigdatalab_spark.sources import load_table


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


@query(
    "embedding_near_dups",
    ids=("SCALE-DEDUP", "SCALE-SIM"),
    oracle=f"""
        WITH v AS (
            SELECT vec_id, embedding, {_bucket('embedding')} AS bucket
            FROM embeddings
        )
        SELECT a.vec_id AS id1, b.vec_id AS id2,
               {_cos_sql('a.embedding', 'b.embedding')} AS cos_sim
        FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.4
        ORDER BY id1, id2
    """,
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by sign bucket."""
    from bigdatalab_spark.scale import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    return sim.embedding_near_dups(emb, threshold=0.4).orderBy("id1", "id2")


@query(
    "ann_ivf_kmeans",
    ids=("SCALE-SIM",),
    oracle=None,  # learned centroids are not SQL-replayable; recall vs
    # brute force is asserted in tests/test_scale.py
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: KMeans coarse quantizer (seeded) + probe-2 bucket search."""
    from bigdatalab_spark.scale.similarity import ivf_kmeans_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_kmeans_topk(emb.filter("vec_id < 10"), emb, k=3).orderBy(
        "query_id", "rank"
    )
