"""Dedup queries over ``documents`` (scale extension, BASELINE.json).

The DuckDB oracles replay the ENTIRE pipeline — shingling, portable
hashing, MinHash permutations, LSH banding, exact-Jaccard verification —
so the correctness gate covers the algorithm end to end, not just row
counts. Shared SQL fragments are generated from the same constants the
Spark side uses (:mod:`bigdatalab_spark.scale.hashing`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.scale.dedup import (
    exact_dedup_groups,
    minhash_near_dups,
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
    simhash_signatures,
)
from bigdatalab_spark.scale.hashing import (
    MINHASH_BANDS,
    MINHASH_COEFFS,
    MINHASH_P,
    MINHASH_ROWS,
    SIMHASH_BITS,
)
from bigdatalab_spark.sources import load_table

# ---- shared DuckDB fragments -------------------------------------------------

#: distinct 3-gram word shingles per doc (mirrors scale.dedup.doc_shingles)
SHINGLES_CTE = """
    words AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
        FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
        FROM words, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t
        WHERE len(ws) >= 3
    )
"""

_PARAMS_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_COEFFS)
)

#: jaccard verification over a `cands(doc1, doc2)` CTE
_VERIFY_SQL = """
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT doc1, doc2, count(*) AS n_common
        FROM cands
        JOIN shingles s1 ON s1.doc_id = cands.doc1
        JOIN shingles s2 ON s2.doc_id = cands.doc2 AND s2.shingle = s1.shingle
        GROUP BY doc1, doc2
    ),
    verified AS (
        SELECT doc1, doc2, s1.n AS n1, s2.n AS n2, n_common,
               CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2
    )
"""


@query(
    "dedup_exact",
    ids=("SCALE-DEDUP",),
    oracle="""
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
               min(doc_id) AS keep_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
        ORDER BY keep_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized content, keep min id."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs).orderBy("keep_id")


@query(
    "dedup_minhash_lsh",
    ids=("SCALE-DEDUP",),
    oracle=f"""
        WITH {SHINGLES_CTE},
        params(i, a, b) AS (VALUES {_PARAMS_VALUES}),
        hashes AS (
            SELECT doc_id, shingle,
                   CAST('0x' || substr(md5(shingle), 1, 7) AS BIGINT) AS h
            FROM shingles
        ),
        mh AS (
            SELECT doc_id, i, min((h * a + b) % {MINHASH_P}) AS v
            FROM hashes, params
            GROUP BY doc_id, i
        ),
        bands AS (
            SELECT doc_id, i // {MINHASH_ROWS} AS band,
                   string_agg(CAST(v AS VARCHAR), '_' ORDER BY i) AS sig
            FROM mh
            GROUP BY doc_id, i // {MINHASH_ROWS}
        ),
        cands AS (
            SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.sig = b.sig
                        AND a.doc_id < b.doc_id
        ),
        {_VERIFY_SQL}
        SELECT doc1, doc2, n1, n2, n_common, jaccard
        FROM verified
        WHERE jaccard >= 0.5
        ORDER BY doc1, doc2
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4x4) near-dup pairs verified at Jaccard >= 0.5.

    The oracle replays the identical permutations/banding, so a hash
    mismatch anywhere in the pipeline fails the gate.
    """
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_dups(docs, threshold=0.5).orderBy("doc1", "doc2")


@query(
    "dedup_ngram_jaccard",
    ids=("SCALE-DEDUP",),
    oracle=f"""
        WITH {SHINGLES_CTE},
        cands AS (
            SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
            FROM shingles a
            JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        ),
        {_VERIFY_SQL}
        SELECT doc1, doc2, n1, n2, n_common, jaccard
        FROM verified
        WHERE jaccard >= 0.5
        ORDER BY doc1, doc2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dups (inverted-index candidates, no
    LSH) — the recall baseline for dedup_minhash_lsh."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.5).orderBy("doc1", "doc2")


@query(
    "dedup_jaccard_prefix",
    ids=("SCALE-DEDUP",),
    oracle=f"""
        WITH {SHINGLES_CTE},
        cands AS (
            SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
            FROM shingles a
            JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        ),
        {_VERIFY_SQL}
        SELECT doc1, doc2, n1, n2, n_common, jaccard
        FROM verified
        WHERE jaccard >= 0.5
        ORDER BY doc1, doc2
    """,
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT Jaccard threshold join
    (scale.dedup.prefix_filter_jaccard_pairs): same answer as
    dedup_ngram_jaccard — the oracle is literally that query's SQL —
    but candidates come only from each doc's rarest-shingle prefix, so
    the candidate join scales with the frequency tail instead of every
    shared shingle. Exact + no false negatives (prefix-filter lemma),
    unlike the probabilistic LSH row; the pytest asserts the candidate
    count is a strict subset of the inverted-index baseline's."""
    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(docs, threshold=0.5).orderBy(
        "doc1", "doc2"
    )


@query(
    "dedup_simhash",
    ids=("SCALE-DEDUP",),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(token), 1, 7) AS BIGINT) AS h
            FROM toks WHERE token <> ''
        ),
        per_bit AS (
            SELECT doc_id, j,
                   CAST(sum(CASE WHEN (h & (CAST(1 AS BIGINT) << j)) <> 0
                            THEN 1 ELSE -1 END) AS BIGINT) AS s
            FROM hashed, (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS j) bits
            GROUP BY doc_id, j
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
        FROM per_bit
        GROUP BY doc_id
        ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-frequency-weighted 28-bit SimHash signature per document."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_signatures(docs).orderBy("doc_id")


@query(
    "dedup_clusters",
    ids=("SCALE-DEDUP",),
    oracle=f"""
        WITH {SHINGLES_CTE},
        params(i, a, b) AS (VALUES {_PARAMS_VALUES}),
        hashes AS (
            SELECT doc_id, shingle,
                   CAST('0x' || substr(md5(shingle), 1, 7) AS BIGINT) AS h
            FROM shingles
        ),
        mh AS (
            SELECT doc_id, i, min((h * a + b) % {MINHASH_P}) AS v
            FROM hashes, params
            GROUP BY doc_id, i
        ),
        bands AS (
            SELECT doc_id, i // {MINHASH_ROWS} AS band,
                   string_agg(CAST(v AS VARCHAR), '_' ORDER BY i) AS sig
            FROM mh
            GROUP BY doc_id, i // {MINHASH_ROWS}
        ),
        cands AS (
            SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.sig = b.sig
                        AND a.doc_id < b.doc_id
        ),
        {_VERIFY_SQL},
        pairs AS (SELECT doc1, doc2 FROM verified WHERE jaccard >= 0.5),
        edges AS (
            SELECT doc1 AS src, doc2 AS dst FROM pairs
            UNION ALL
            SELECT doc2, doc1 FROM pairs
        ),
        reach AS (
            -- transitive closure by recursion: every (doc, reachable label)
            SELECT doc_id AS doc, doc_id AS label FROM documents
            UNION
            SELECT e.src AS doc, r.label
            FROM reach r JOIN edges e ON e.dst = r.doc
        )
        SELECT doc, min(label) AS cluster_id
        FROM reach
        GROUP BY doc
        ORDER BY doc
    """.replace("WITH ", "WITH RECURSIVE ", 1),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components (min-label propagation)
    over the MinHash-LSH near-dup pair graph — the step that turns
    pairwise similarity into keep/drop groups in a dedup pipeline. The
    oracle replays the whole stack: shingles -> MinHash -> LSH -> Jaccard
    -> a recursive-CTE transitive closure."""
    from bigdatalab_spark.scale.dedup import connected_components, minhash_near_dups

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dups(docs, threshold=0.5).select("doc1", "doc2")
    nodes = docs.select("doc_id")
    return (
        connected_components(nodes, pairs)
        .select(F.col("doc_id").alias("doc"), "cluster_id")
        .orderBy("doc")
    )


_SEG_W = 10


@query(
    "dedup_segments",
    ids=("SCALE-DEDUP",),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS toks
            FROM documents
        ),
        segs AS (
            SELECT doc_id, CAST(s AS INT) AS seg_idx,
                   array_to_string(toks[s*{_SEG_W}+1 : s*{_SEG_W}+{_SEG_W}], ' ') AS seg_text
            FROM toks,
                 LATERAL (SELECT unnest(generate_series(
                     0,
                     CAST(ceil(len(toks) / CAST({_SEG_W} AS DOUBLE)) AS BIGINT) - 1)) AS s) t
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY seg_text ORDER BY doc_id, seg_idx) AS rn
            FROM segs
        )
        SELECT doc_id,
               count(*) AS n_segments,
               count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
               coalesce(string_agg(CASE WHEN rn = 1 THEN seg_text END, ' '
                                   ORDER BY seg_idx), '') AS dedup_text
        FROM ranked
        GROUP BY doc_id
        ORDER BY doc_id
    """,
)
def dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style segment-level exact dedup: drop corpus-wide repeats of
    10-word segments (keep the first occurrence by (doc_id, seg_idx))
    and reassemble each document from its surviving segments. The
    min-struct keeper aggregate partial-aggregates hot boilerplate
    segments map-side — the window-rank alternative would sort the
    whole hot bucket on one reducer."""
    from bigdatalab_spark.scale.dedup import segment_exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    return segment_exact_dedup(docs, seg_words=_SEG_W).orderBy("doc_id")


def _bloom_oracle() -> str:
    from bigdatalab_spark.scale.dedup import BLOOM_K, BLOOM_M_BITS
    from bigdatalab_spark.scale.hashing import (
        MINHASH_COEFFS,
        MINHASH_P,
        portable_hash_sql,
    )

    seeds = ", ".join(f"({a}, {b})" for a, b in MINHASH_COEFFS[:BLOOM_K])
    h = portable_hash_sql("ch")
    return f"""
        WITH seeds(a, b) AS (VALUES {seeds}),
        corpus_h AS (
            SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ch
            FROM documents WHERE doc_id % 2 = 0
        ),
        corpus_pos AS (
            SELECT DISTINCT (({h} * a + b) % {MINHASH_P}) % {BLOOM_M_BITS} AS p
            FROM corpus_h, seeds
            WHERE ch IS NOT NULL
        ),
        batch AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ch
            FROM documents WHERE doc_id % 2 = 1
        ),
        probe AS (
            SELECT doc_id, ch,
                   coalesce(bool_and(
                       (({h} * a + b) % {MINHASH_P}) % {BLOOM_M_BITS}
                           IN (SELECT p FROM corpus_pos)), false) AS bloom_positive
            FROM batch, seeds
            GROUP BY doc_id, ch
        )
        SELECT doc_id, bloom_positive,
               CASE WHEN NOT bloom_positive THEN 'new'
                    WHEN ch IN (SELECT ch FROM corpus_h) THEN 'exact_dup'
                    ELSE 'new_bloom_fp' END AS status
        FROM probe
        ORDER BY doc_id
    """


@query(
    "bloom_incremental_dedup",
    ids=("SCALE-DEDUP", "A13"),
    oracle=_bloom_oracle(),
)
def bloom_incremental_dedup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned daily-ingest exact dedup: the corpus (even doc_ids)
    is summarized once into a portable Bloom bitmap; the batch (odd
    doc_ids) probes it in a narrow scan and only bloom-positive rows
    join the corpus hash store for confirmation. The oracle replays the
    identical hash family position-set, so the engine's false-positive
    rows must match DuckDB's bit for bit."""
    from bigdatalab_spark.scale.dedup import bloom_incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id % 2 = 1")
    return bloom_incremental_dedup(batch, corpus).orderBy("doc_id")


_SPAN_TOKENS = 16
_SPAN_MIN_TOKENS = 5

_SPAN_DEDUP_ORACLE = f"""
    WITH words AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
        FROM documents
    ),
    spans AS (
        SELECT doc_id,
               CAST((i - 1) / {_SPAN_TOKENS} AS BIGINT) AS pos,
               array_to_string(ws[i:i+{_SPAN_TOKENS - 1}], ' ') AS span_text,
               least({_SPAN_TOKENS}, len(ws) - i + 1) AS n_tokens
        FROM words, LATERAL (SELECT unnest(generate_series(1, len(ws), {_SPAN_TOKENS})) AS i) t
        WHERE len(ws) > 0
    ),
    -- span_text determines token count (space-joined non-empty tokens),
    -- so each PARTITION BY span_text is homogeneous in n_tokens and the
    -- rn=1 rule only ever applies within all-long partitions, matching
    -- the engine's long-spans-only first-occurrence set
    flagged AS (
        SELECT doc_id, pos, span_text, n_tokens,
               (n_tokens < {_SPAN_MIN_TOKENS} OR
                row_number() OVER (PARTITION BY span_text ORDER BY doc_id, pos) = 1) AS kept
        FROM spans
    ),
    rebuilt AS (
        SELECT doc_id,
               string_agg(span_text, ' ' ORDER BY pos) FILTER (WHERE kept) AS dedup_text,
               count(*) AS n_spans,
               CAST(coalesce(sum(CASE WHEN NOT kept THEN 1 END), 0) AS BIGINT) AS n_dropped
        FROM flagged GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(r.dedup_text, '') AS dedup_text,
           CAST(coalesce(r.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(r.n_dropped, 0) AS BIGINT) AS n_dropped
    FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    ORDER BY d.doc_id
"""


@query(
    "span_dedup",
    ids=("SCALE-DEDUP",),
    oracle=_SPAN_DEDUP_ORACLE,
)
def span_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Dolma-style cross-corpus span dedup: every 16-token span that
    already occurred earlier in the corpus (by doc_id, position) is
    removed and the documents are reassembled from surviving spans;
    sub-5-token tails are always kept. The oracle replays span
    splitting, first-occurrence ranking, and ordered reassembly, so the
    rebuilt text must match character for character."""
    from bigdatalab_spark.scale.dedup import span_dedup

    docs = load_table(spark, sf_dir, "documents")
    return span_dedup(
        docs, span_tokens=_SPAN_TOKENS, min_tokens=_SPAN_MIN_TOKENS
    ).orderBy("doc_id")
