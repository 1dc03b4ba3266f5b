"""Training-data pipeline queries, second wave: benchmark
decontamination (n-gram overlap and near-dup cluster leakage), PII
redaction, deterministic corpus shuffling, mixture-weight sampling,
BPE merge statistics, lead/lag gap analysis, CDC latest-per-key
compaction, a real stream-static join, and incremental batch-vs-corpus
dedup. Registered AFTER the SURVEY-core top-50 (driver records the
first 50 registry entries); evidence is the strict local oracle +
pytest, same contract as :mod:`bigdatalab_spark.queries.pipeline`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.operators import money_sum
from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.queries.tpch import dsum
from bigdatalab_spark.scale.hashing import portable_hash_sql
from bigdatalab_spark.sources import corpus_fingerprint, load_table

_NGRAM = 5

_SPLIT_CTE = f"""
    assigned AS (
        SELECT doc_id,
               CASE WHEN h < 8000 THEN 'train'
                    WHEN h < 9000 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            -- coalesce(key, chr(0)) mirrors hash_split's NULL-key
            -- convention so a NULL doc_id cannot diverge between engines
            SELECT doc_id,
                   {portable_hash_sql(
                       "'split-v1' || coalesce(CAST(doc_id AS VARCHAR), chr(0))"
                   )}
                       % 10000 AS h
            FROM documents
        )
    )
"""


@query(
    "decontam_ngram_overlap",
    ids=("SCALE-DECONTAM", "SCALE-CURATION"),
    oracle=f"""
        WITH words AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
            FROM documents
        ),
        {_SPLIT_CTE},
        ngrams AS (
            SELECT DISTINCT w.doc_id,
                   {portable_hash_sql(f"array_to_string(ws[i:i+{_NGRAM - 1}], ' ')")}
                       AS ngram_h
            FROM words w,
                 LATERAL (SELECT unnest(generate_series(1, len(ws) - {_NGRAM - 1})) AS i) t
            WHERE len(ws) >= {_NGRAM}
        ),
        train AS (
            SELECT n.doc_id, ngram_h
            FROM ngrams n JOIN assigned a USING (doc_id)
            WHERE a.split = 'train'
        ),
        holdout_set AS (
            SELECT DISTINCT ngram_h
            FROM ngrams n JOIN assigned a USING (doc_id)
            WHERE a.split IN ('val', 'test')
        )
        SELECT t.doc_id, count(*) AS n_shared_ngrams
        FROM train t JOIN holdout_set h USING (ngram_h)
        GROUP BY t.doc_id
        ORDER BY t.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination, GPT-3 style: train documents sharing
    any word 5-gram with a val/test document
    (:func:`bigdatalab_spark.scale.decontam.ngram_contamination` over
    the deterministic hash split). The join runs the linear *set* shape
    on 28-bit portable n-gram hashes — never doc-pairs, never text —
    so the oracle replays it exactly and the cost stays proportional
    to the train side at 100 TB."""
    from bigdatalab_spark.scale.curation import hash_split
    from bigdatalab_spark.scale.decontam import ngram_contamination

    docs = hash_split(load_table(spark, sf_dir, "documents"), "doc_id")
    return ngram_contamination(docs, n=_NGRAM).orderBy("doc_id")


def _cluster_leak_oracle() -> str:
    from bigdatalab_spark.queries.dedup import (
        SHINGLES_CTE,
        _PARAMS_VALUES,
        _VERIFY_SQL,
    )
    from bigdatalab_spark.scale.hashing import MINHASH_P, MINHASH_ROWS

    return f"""
        WITH RECURSIVE {SHINGLES_CTE},
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
            -- seed only EDGE-INCIDENT docs: a singleton cluster can
            -- never hold both train and holdout members, so it cannot
            -- contribute a leak row — and the recursion state shrinks
            -- to the near-dup components instead of the whole corpus
            -- (the sf1 sweep's memory headroom lives here)
            SELECT src AS doc, src AS label FROM edges
            UNION
            SELECT e.src AS doc, r.label
            FROM reach r JOIN edges e ON e.dst = r.doc
        ),
        comp AS (SELECT doc, min(label) AS cluster_id FROM reach GROUP BY doc),
        clusters AS (
            SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id
        ),
        {_SPLIT_CTE},
        labeled AS (
            SELECT c.doc_id, c.cluster_id, a.split
            FROM clusters c JOIN assigned a USING (doc_id)
        ),
        holdout AS (
            SELECT cluster_id, count(*) AS n_holdout_in_cluster
            FROM labeled WHERE split IN ('val', 'test')
            GROUP BY cluster_id
        )
        SELECT l.doc_id, l.cluster_id, h.n_holdout_in_cluster
        FROM labeled l JOIN holdout h USING (cluster_id)
        WHERE l.split = 'train'
        ORDER BY l.doc_id
    """


@query(
    "cluster_split_decontam",
    ids=("SCALE-DECONTAM", "SCALE-DEDUP"),
    oracle=_cluster_leak_oracle(),
)
def cluster_split_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware decontamination: train documents whose MinHash-LSH
    cluster contains a val/test document — catches the paraphrased
    leakage that exact n-gram overlap misses
    (:func:`bigdatalab_spark.scale.decontam.cluster_split_leakage`).
    The oracle replays the full stack: shingles -> MinHash -> LSH ->
    Jaccard -> recursive-closure clusters -> split join."""
    from bigdatalab_spark.scale.curation import hash_split
    from bigdatalab_spark.scale.decontam import cluster_split_leakage
    from bigdatalab_spark.scale.dedup import connected_components, minhash_near_dups

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dups(docs, threshold=0.5).select("doc1", "doc2")
    clusters = connected_components(docs.select("doc_id"), pairs)
    splits = hash_split(docs.select("doc_id"), "doc_id").select("doc_id", "split")
    return cluster_split_leakage(clusters, splits).orderBy("doc_id")


def _pii_oracle() -> str:
    from bigdatalab_spark.scale.pii import redact_pii_sql

    count_frags, redacted = redact_pii_sql("raw")
    frags = ",\n               ".join(count_frags)
    return f"""
        WITH enriched AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or +1 555 '
                        || lpad(CAST(doc_id AS VARCHAR), 4, '0')
                        || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.' || CAST(doc_id % 100 AS VARCHAR) AS raw
            FROM documents
        )
        SELECT doc_id,
               {frags},
               md5({redacted}) AS redacted_md5
        FROM enriched
        ORDER BY doc_id
    """


@query(
    "pii_redaction",
    ids=("SCALE-PII", "SCALE-TEXT"),
    oracle=_pii_oracle(),
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-tier PII scrub (:func:`bigdatalab_spark.scale.pii.redact_pii`):
    emails, IPv4s, phone-shaped number runs redacted in a fixed order,
    with per-kind counts. The synthetic corpus carries no PII, so the
    query first plants deterministic contact strings derived from
    doc_id — the operator sees realistic mixed text and the oracle
    replays enrichment, counting, and replacement exactly (md5 of the
    scrubbed text proves byte-identical redaction across engines)."""
    from bigdatalab_spark.scale.pii import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555 "),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
            F.lit(" at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 100).cast("string"),
        ).alias("raw"),
    )
    return (
        redact_pii(enriched, text_col="raw")
        .select(
            "doc_id",
            "n_email",
            "n_ipv4",
            "n_phone",
            F.md5("redacted").alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "deterministic_shuffle_order",
    ids=("SCALE-CURATION", "P10"),
    oracle=f"""
        SELECT doc_id, h AS shuffle_hash,
               CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS shuffle_pos
        FROM (
            SELECT doc_id,
                   {portable_hash_sql("'shuf-v1' || CAST(doc_id AS VARCHAR)")} AS h
            FROM documents
        )
        ORDER BY shuffle_pos
    """,
)
def deterministic_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-stable global training shuffle
    (:func:`bigdatalab_spark.scale.curation.deterministic_shuffle`):
    position = rank of the salted portable hash, assigned with the
    scale-safe zipWithIndex shape (range partition + per-partition
    offsets — no single-task global sort). The oracle is a plain
    row_number over the same hash."""
    from bigdatalab_spark.scale.curation import deterministic_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(docs, "doc_id").select(
        "doc_id", "shuffle_hash", "shuffle_pos"
    ).orderBy("shuffle_pos")


_MIX_RATES = {"de": 1.0, "en": 0.5, "es": 0.75, "fr": 0.25, "zh": 0.1}
_MIX_CASE = " ".join(
    f"WHEN '{k}' THEN {int(round(v * 10000))}" for k, v in _MIX_RATES.items()
)


@query(
    "domain_mix_counts",
    ids=("SCALE-CURATION", "P11"),
    oracle=f"""
        SELECT lang, count(*) AS n_kept, min(doc_id) AS min_doc_id
        FROM documents
        WHERE {portable_hash_sql("'mix-v1' || lang || '|' || CAST(doc_id AS VARCHAR)")}
                  % 10000
              < CASE lang {_MIX_CASE} ELSE 10000 END
        GROUP BY lang
        ORDER BY lang
    """,
)
def domain_mix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weight corpus assembly
    (:func:`bigdatalab_spark.scale.curation.domain_mix`): keep each
    language at its own deterministic rate (de 100%, en 50%, es 75%,
    fr 25%, zh 10%) via the salted portable hash — the reproducible
    twin of ``sampleBy`` whose sample the SQL oracle replays exactly."""
    from bigdatalab_spark.scale.curation import domain_mix

    docs = load_table(spark, sf_dir, "documents")
    return (
        domain_mix(docs, "lang", _MIX_RATES)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("lang")
    )


@query(
    "bpe_merge_stats",
    ids=("SCALE-TEXT", "A1", "O4"),
    oracle="""
        WITH toks AS (
            SELECT list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
            FROM documents
        ),
        pairs AS (
            SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                                         i -> ws[i] || ' ' || ws[i + 1])) AS pair
            FROM toks
            WHERE len(ws) >= 2
        )
        SELECT pair, count(*) AS n
        FROM pairs
        GROUP BY pair
        ORDER BY n DESC, pair ASC
        LIMIT 20
    """,
)
def bpe_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent-pair frequencies — the statistic a BPE/
    WordPiece tokenizer trainer computes to pick its next merge. One
    partially-aggregated shuffle on the pair, then a TakeOrdered top-20
    (count DESC, pair ASC — deterministic at the cut)."""
    from bigdatalab_spark.functions import tokenize, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(tokenize("text").alias("toks"))
    return (
        base.select(F.explode(word_shingles(F.col("toks"), 2)).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


@query(
    "event_gap_stats",
    ids=("A4", "T-EXT", "P1"),
    oracle="""
        WITH gaps AS (
            SELECT user_id,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
            FROM events
        )
        SELECT user_id,
               count(*) AS n_gaps,
               CAST(max(gap_us) AS BIGINT) AS max_gap_us,
               CAST(sum(gap_us) AS DOUBLE) / count(*) AS avg_gap_us
        FROM gaps
        WHERE gap_us IS NOT NULL
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per user via ``lag`` — the windowed
    lead/lag family over event streams (inactivity detection, rate
    estimation). Gaps are exact integer microseconds; the average is an
    exact integer sum divided in double, so it replays bit-for-bit.
    Scale shape: the window partitions by user_id — state is one user's
    events per window instance, parallel across the key space."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.max("gap_us").alias("max_gap_us"),
            (F.sum("gap_us").cast("double") / F.count(F.lit(1))).alias("avg_gap_us"),
        )
        .orderBy("user_id")
    )


@query(
    "cdc_latest_by_key",
    ids=("O5", "T-EXT"),
    oracle="""
        SELECT user_id, event_id,
               CAST(ts AS VARCHAR) AS ts,
               event_type, value
        FROM (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
        ORDER BY user_id
    """,
)
def cdc_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: the latest record per key (events as a
    changelog keyed by user_id, newest by (ts, event_id) wins) — the
    keep-last-version pattern every incremental ingest pipeline runs.
    One shuffle on the key; within each key the window instance scans
    that key's rows only, so compaction parallelizes across keys at
    100 TB the same way the streaming dedup state does."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.col("ts").cast("string").alias("ts"),
            "event_type",
            "value",
        )
        .orderBy("user_id")
    )


@query(
    "stream_static_segment_value",
    ids=("T-EXT", "J3", "S12", "T1", "T10"),
    oracle=f"""
        SELECT c.c_mktsegment AS segment,
               count(*) AS n_events,
               {dsum('e.value')} AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY segment
        ORDER BY segment
    """,
)
def stream_static_segment_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL stream-static join run inside the correctness gate:
    readStream over events -> broadcast join to the static customer dim
    (:func:`bigdatalab_spark.streaming.jobs.stream_static_join`) ->
    keyed aggregation -> AvailableNow -> memory sink. The static side
    holds no stream state and is re-scanned per micro-batch; the oracle
    is the batch join+agg equivalent of the drained final state."""
    from bigdatalab_spark.streaming import run_stream_to_memory, stream_events
    from bigdatalab_spark.streaming.jobs import stream_static_join, unique_sink_name

    name = unique_sink_name("stream_static_seg")
    stream = stream_events(spark, sf_dir)
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    enriched = stream_static_join(stream, dim, on="user_id", how="inner")
    state = enriched.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum("value").alias("total_value"),
    )
    # TPC-H market segments are a 5-value enum at every scale factor:
    # keyspace-derived state partitioning (state_shuffle_partitions)
    run_stream_to_memory(
        state, name, output_mode="complete", expected_keys=8
    )
    return spark.table(name).orderBy("segment")


def _incremental_oracle(
    corpus_pred: str = "doc_id % 2 = 0",
    batch_pred: str = "doc_id % 2 = 1",
) -> str:
    """SQL replay of batch-vs-corpus classification, parameterized on
    the corpus/batch membership predicates so the forget-path query
    (corpus minus tombstoned docs) shares one oracle builder with the
    plain incremental queries."""
    from bigdatalab_spark.queries.dedup import (
        SHINGLES_CTE,
        _PARAMS_VALUES,
        _VERIFY_SQL,
    )
    from bigdatalab_spark.scale.hashing import MINHASH_P, MINHASH_ROWS

    return f"""
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
            SELECT DISTINCT b.doc_id AS doc1, c.doc_id AS doc2
            FROM bands b
            JOIN (SELECT doc_id FROM documents WHERE {batch_pred}) bb
              ON bb.doc_id = b.doc_id
            JOIN bands c ON b.band = c.band AND b.sig = c.sig
            JOIN (SELECT doc_id FROM documents WHERE {corpus_pred}) cc
              ON cc.doc_id = c.doc_id
        ),
        {_VERIFY_SQL},
        near AS (SELECT DISTINCT doc1 AS doc_id FROM verified WHERE jaccard >= 0.5),
        bh AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
            FROM documents WHERE {batch_pred}
        ),
        ch AS (
            SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
            FROM documents WHERE {corpus_pred}
        ),
        exact AS (
            SELECT doc_id FROM bh JOIN ch USING (content_hash)
            UNION
            SELECT b.doc_id
            FROM bh b JOIN bh b2
              ON b2.content_hash = b.content_hash AND b2.doc_id < b.doc_id
        )
        SELECT b.doc_id,
               CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                    WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                    ELSE 'new' END AS status
        FROM (SELECT doc_id FROM documents WHERE {batch_pred}) b
        LEFT JOIN exact e ON e.doc_id = b.doc_id
        LEFT JOIN near n ON n.doc_id = b.doc_id
        ORDER BY b.doc_id
    """


@query(
    "incremental_dedup_status",
    ids=("SCALE-DEDUP", "SCALE-CURATION"),
    oracle=_incremental_oracle(),
)
def incremental_dedup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup: classify a new batch (odd doc_ids) against the
    existing corpus (even doc_ids) as exact_dup / near_dup / new WITHOUT
    re-clustering the corpus
    (:func:`bigdatalab_spark.scale.dedup.incremental_dedup`). Candidate
    generation is batch×corpus band joins only — daily cost tracks the
    batch, and corpus signatures would come from a signature store in
    production. The oracle replays signatures for all docs and restricts
    candidates to the same cross-parity pairs."""
    from bigdatalab_spark.scale.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id % 2 = 1")
    return incremental_dedup(batch, corpus).orderBy("doc_id")


@query(
    "incremental_dedup_index_status",
    ids=("SCALE-DEDUP", "SCALE-CURATION"),
    oracle=_incremental_oracle(),
)
def incremental_dedup_index_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The durable-signature-store twin of ``incremental_dedup_status``
    (round 8): build a :func:`~bigdatalab_spark.scale.dedup.
    save_dedup_index` from the corpus half, then classify the batch
    half with :func:`~bigdatalab_spark.scale.dedup.
    incremental_dedup_from_index` — corpus text is read ONCE at index
    build and never at serve (plan-asserted in tests). The oracle is
    the SAME SQL as the self-contained query because the serve path is
    bit-identical by construction (shared classify core), which is
    exactly the property the oracle certifies here."""
    import os
    import tempfile

    from bigdatalab_spark.scale.dedup import (
        incremental_dedup_from_index,
        save_dedup_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id % 2 = 1")
    idx = os.path.join(
        tempfile.gettempdir(),
        "bigdatalab_dedup_index",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
    )
    save_dedup_index(corpus, idx)  # overwrite-under-lock: rebuild per run
    return incremental_dedup_from_index(spark, batch, idx).orderBy("doc_id")


@query(
    "dedup_index_forget_status",
    ids=("SCALE-DEDUP", "SCALE-CURATION"),
    oracle=_incremental_oracle(
        corpus_pred="doc_id % 2 = 0 AND doc_id % 10 <> 4"
    ),
)
def dedup_index_forget_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten over the durable dedup index (round 8):
    build the index from the corpus half, then
    :func:`~bigdatalab_spark.scale.dedup.remove_from_dedup_index`
    tombstones every corpus doc with ``doc_id % 10 = 4`` — an
    O(delete-batch) logical delete in the deletion-vector style — and
    the batch classifies against what remains: a duplicate of
    forgotten content re-admits as ``new`` (unless a live copy still
    carries the same content). The oracle is the SAME classification
    SQL with the corpus predicate narrowed to the surviving docs,
    certifying that serve-after-delete equals a rebuild on the reduced
    corpus. Physical reclamation
    (:func:`~bigdatalab_spark.scale.dedup.purge_dedup_tombstones`) is
    covered by pytest, where bit-identity of the serve across the
    purge is pinned."""
    import os
    import tempfile

    from bigdatalab_spark.scale.dedup import (
        incremental_dedup_from_index,
        remove_from_dedup_index,
        save_dedup_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id % 2 = 1")
    idx = os.path.join(
        tempfile.gettempdir(),
        "bigdatalab_dedup_forget_index",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
    )
    save_dedup_index(corpus, idx)  # overwrite-under-lock: rebuild per run
    remove_from_dedup_index(corpus.filter("doc_id % 10 = 4").select("doc_id"), idx)
    return incremental_dedup_from_index(spark, batch, idx).orderBy("doc_id")


def _two_round_ingest_oracle() -> str:
    """Sequential replay of the STREAMING ingest loop in pure SQL: two
    micro-batches (doc_id%4==1 then %4==3) classified in order, with
    round 1's 'new' docs ADMITTED into round 2's corpus — exactly what
    dedup_ingest_stream does through the durable index. One copy of
    the shingle/minhash/band CTEs serves both rounds; each round gets
    its own candidate/verify/exact block. No cap modeling needed: the
    bucket cap is a provable no-op at oracle scale (same stance as
    every LSH oracle here)."""
    from bigdatalab_spark.queries.dedup import SHINGLES_CTE, _PARAMS_VALUES
    from bigdatalab_spark.scale.hashing import MINHASH_P, MINHASH_ROWS

    def verify(round_id: int) -> str:
        return f"""
        inter{round_id} AS (
            SELECT doc1, doc2, count(*) AS n_common
            FROM cands{round_id} c
            JOIN shingles s1 ON s1.doc_id = c.doc1
            JOIN shingles s2 ON s2.doc_id = c.doc2 AND s2.shingle = s1.shingle
            GROUP BY doc1, doc2
        ),
        near{round_id} AS (
            SELECT DISTINCT doc1 AS doc_id
            FROM inter{round_id}
            JOIN zsizes s1 ON s1.doc_id = doc1
            JOIN zsizes s2 ON s2.doc_id = doc2
            WHERE CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) >= 0.5
        )"""

    return f"""
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
        zsizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        chash AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
            FROM documents
        ),
        -- round 1: batch (%4==1) vs the prebuilt corpus (%2==0)
        cands1 AS (
            SELECT DISTINCT b.doc_id AS doc1, c.doc_id AS doc2
            FROM bands b JOIN bands c ON b.band = c.band AND b.sig = c.sig
            WHERE b.doc_id % 4 = 1 AND c.doc_id % 2 = 0
        ),
        {verify(1)},
        exact1 AS (
            SELECT h.doc_id FROM chash h
            WHERE h.doc_id % 4 = 1 AND h.content_hash IN (
                SELECT content_hash FROM chash WHERE doc_id % 2 = 0)
            UNION
            SELECT b.doc_id FROM chash b
            JOIN chash b2 ON b2.content_hash = b.content_hash
                         AND b2.doc_id < b.doc_id AND b2.doc_id % 4 = 1
            WHERE b.doc_id % 4 = 1
        ),
        status1 AS (
            SELECT b.doc_id,
                   CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                        WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                        ELSE 'new' END AS status
            FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 1) b
            LEFT JOIN exact1 e ON e.doc_id = b.doc_id
            LEFT JOIN near1 n ON n.doc_id = b.doc_id
        ),
        -- round 2 corpus: prebuilt corpus + round 1's admitted docs
        corpus2 AS (
            SELECT doc_id FROM documents WHERE doc_id % 2 = 0
            UNION ALL
            SELECT doc_id FROM status1 WHERE status = 'new'
        ),
        cands2 AS (
            SELECT DISTINCT b.doc_id AS doc1, c.doc_id AS doc2
            FROM bands b JOIN bands c ON b.band = c.band AND b.sig = c.sig
            WHERE b.doc_id % 4 = 3
              AND c.doc_id IN (SELECT doc_id FROM corpus2)
        ),
        {verify(2)},
        exact2 AS (
            SELECT h.doc_id FROM chash h
            WHERE h.doc_id % 4 = 3 AND h.content_hash IN (
                SELECT content_hash FROM chash
                WHERE doc_id IN (SELECT doc_id FROM corpus2))
            UNION
            SELECT b.doc_id FROM chash b
            JOIN chash b2 ON b2.content_hash = b.content_hash
                         AND b2.doc_id < b.doc_id AND b2.doc_id % 4 = 3
            WHERE b.doc_id % 4 = 3
        ),
        status2 AS (
            SELECT b.doc_id,
                   CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                        WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                        ELSE 'new' END AS status
            FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 3) b
            LEFT JOIN exact2 e ON e.doc_id = b.doc_id
            LEFT JOIN near2 n ON n.doc_id = b.doc_id
        )
        SELECT doc_id, status FROM status1
        UNION ALL
        SELECT doc_id, status FROM status2
        ORDER BY doc_id
    """


@query(
    "streaming_dedup_ingest",
    ids=("SCALE-DEDUP", "T2", "T4", "K4"),
    oracle=_two_round_ingest_oracle(),
)
def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-8 production loop under the oracle gate: a REAL
    readStream replays the odd documents as two mtime-ordered
    micro-batches (doc_id%4==1 then %4==3) through
    :func:`~bigdatalab_spark.streaming.jobs.dedup_ingest_stream` —
    each batch classified against the durable signature store, its
    statuses landed in a per-batch-partitioned audit log, its 'new'
    docs APPENDED to the index so the second batch deduplicates
    against what the first admitted. The oracle replays both rounds
    sequentially in SQL (round 2's corpus = corpus ∪ round 1's
    admitted docs), so strict equality certifies the whole
    stream → classify → admit → re-classify loop, not one batch."""
    import os
    import tempfile
    import time

    from bigdatalab_spark.scale.dedup import save_dedup_index
    from bigdatalab_spark.streaming.jobs import dedup_ingest_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scratch = tempfile.mkdtemp(prefix="dedup_ingest_")
    idx, src = f"{scratch}/idx", f"{scratch}/src"
    save_dedup_index(docs.filter("doc_id % 2 = 0"), idx)
    docs.filter("doc_id % 4 = 1").coalesce(1).write.parquet(f"{src}/f1")
    docs.filter("doc_id % 4 = 3").coalesce(1).write.parquet(f"{src}/f2")
    # the file source orders micro-batches by modification time; pin it
    # explicitly instead of sleeping between writes
    now = time.time()
    for d, off in (("f1", -10), ("f2", 10)):
        for fn in os.listdir(f"{src}/{d}"):
            os.utime(f"{src}/{d}/{fn}", (now + off, now + off))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(f"{src}/*")
    )
    q = dedup_ingest_stream(stream, idx, f"{scratch}/statuses", f"{scratch}/ckpt")
    q.awaitTermination(600)
    return (
        spark.read.parquet(f"{scratch}/statuses")
        .select("doc_id", "status")
        .orderBy("doc_id")
    )


def _simhash_pairs_oracle() -> str:
    from bigdatalab_spark.scale.hashing import SIMHASH_BITS

    width = SIMHASH_BITS // 4
    return f"""
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
        ),
        sigs AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
            FROM per_bit
            GROUP BY doc_id
        ),
        bands AS (
            SELECT doc_id, i AS band, (simhash >> ({width} * i)) & {(1 << width) - 1} AS val
            FROM sigs, (SELECT unnest(generate_series(0, 3)) AS i) bi
        ),
        cands AS (
            SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.val = b.val
                        AND a.doc_id < b.doc_id
        )
        SELECT doc1, doc2,
               CAST(bit_count(xor(s1.simhash, s2.simhash)) AS BIGINT) AS hamming
        FROM cands
        JOIN sigs s1 ON s1.doc_id = doc1
        JOIN sigs s2 ON s2.doc_id = doc2
        WHERE bit_count(xor(s1.simhash, s2.simhash)) <= 2
        ORDER BY doc1, doc2
    """


@query(
    "simhash_hamming_pairs",
    ids=("SCALE-DEDUP",),
    oracle=_simhash_pairs_oracle(),
)
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming distance <= 2 via bit-banding
    (:func:`bigdatalab_spark.scale.dedup.simhash_near_dups`): the 28-bit
    signature splits into 4 bands, so any pair within distance 3 shares
    a bit-identical band BY PIGEONHOLE — banding with guaranteed recall,
    the deterministic counterpart to MinHash-LSH's probabilistic
    s-curve. Integer-only, exact SQL replay including bit_count(xor)."""
    from bigdatalab_spark.scale.dedup import simhash_near_dups

    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dups(docs, max_hamming=2).orderBy("doc1", "doc2")


@query(
    "winsorized_event_values",
    ids=("SCALE-CURATION", "A4", "J3"),
    oracle=f"""
        WITH cuts AS (
            SELECT event_type,
                   CAST(CAST(CAST(quantile_cont(value, 0.05)
                        AS DECIMAL(28,6)) AS STRING) AS DOUBLE) AS lo,
                   CAST(CAST(CAST(quantile_cont(value, 0.95)
                        AS DECIMAL(28,6)) AS STRING) AS DOUBLE) AS hi
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, c.lo, c.hi,
               CAST(sum(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
               CAST(sum(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
               {dsum('least(greatest(e.value, c.lo), c.hi)')} AS sum_clipped
        FROM events e JOIN cuts c USING (event_type)
        GROUP BY e.event_type, c.lo, c.hi
        ORDER BY e.event_type
    """,
)
def winsorized_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorization of event values
    (:func:`bigdatalab_spark.scale.curation.winsorize`, P05/P95): exact
    percentile cuts quantized at 6 decimals (interpolation-ULP-proof
    at any scale — see winsorize's quantize doc), broadcast back, clip,
    and summarize — clip counts plus a decimal-accumulated sum of the
    clipped values so the result replays bit-for-bit."""
    from bigdatalab_spark.scale.curation import winsorize

    ev = load_table(spark, sf_dir, "events")
    clipped = winsorize(ev, "value", "event_type", quantize=6)
    return (
        clipped.groupBy("event_type", "lo", "hi")
        .agg(
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0)).alias("n_below"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0)).alias("n_above"),
            money_sum("value_clipped").alias("sum_clipped"),
        )
        .orderBy("event_type")
    )


@query(
    "token_balanced_mix_counts",
    ids=("SCALE-CURATION", "A4"),
    oracle=f"""
        WITH wt AS (
            SELECT doc_id, lang,
                   CAST(len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS BIGINT)
                       AS n_tokens
            FROM documents
        ),
        per AS (
            SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS stratum_tokens
            FROM wt GROUP BY lang
        ),
        th AS (
            SELECT lang,
                   least(10000, CAST(floor(
                       10000.0
                       * (CAST(sum(stratum_tokens) OVER () AS DOUBLE) / count(*) OVER ())
                       / CAST(stratum_tokens AS DOUBLE)
                   ) AS BIGINT)) AS threshold
            FROM per
        )
        SELECT w.lang, t.threshold,
               count(*) AS kept_docs,
               CAST(sum(w.n_tokens) AS BIGINT) AS kept_tokens
        FROM wt w JOIN th t USING (lang)
        WHERE {portable_hash_sql("'bmix-v1' || w.lang || '|' || CAST(w.doc_id AS VARCHAR)")}
                  % 10000 < t.threshold
        GROUP BY w.lang, t.threshold
        ORDER BY w.lang
    """,
)
def token_balanced_mix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-balanced mixture
    (:func:`bigdatalab_spark.scale.curation.token_balanced_mix`): each
    language is deterministically downsampled toward an equal share of
    the TOKEN mass — the unit a trainer actually consumes — with keep
    rates derived from the data inside the plan (two aggregates + a
    broadcast; no collect). The oracle re-derives the same thresholds
    with identical fixed-order arithmetic, so the sample replays
    exactly."""
    from bigdatalab_spark.scale.curation import token_balanced_mix

    docs = load_table(spark, sf_dir, "documents")
    return (
        token_balanced_mix(docs, "lang")
        .groupBy("lang", "threshold")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_tokens").alias("kept_tokens"),
        )
        .orderBy("lang")
    )


def _lm_oracle() -> str:
    from bigdatalab_spark.scale.lm import LM_SCALE, LM_SCALE_BITS

    hash_ctx = portable_hash_sql("array_to_string(ws[i:i+1], ' ')")
    hash_tri = portable_hash_sql("array_to_string(ws[i:i+2], ' ')")
    return f"""
        WITH words AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ws
            FROM documents
        ),
        {_SPLIT_CTE},
        grams AS (
            SELECT w.doc_id, {hash_ctx} AS ctx_h, {hash_tri} AS tri_h
            FROM words w,
                 LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t
            WHERE len(ws) >= 3
        ),
        train_grams AS (
            SELECT g.* FROM grams g JOIN assigned a USING (doc_id)
            WHERE a.split = 'train'
        ),
        tri_counts AS (SELECT tri_h, count(*) AS c3 FROM train_grams GROUP BY tri_h),
        ctx_counts AS (SELECT ctx_h, count(*) AS c2 FROM train_grams GROUP BY ctx_h),
        vocab AS (
            SELECT count(DISTINCT tok) AS v
            FROM (SELECT unnest(ws) AS tok
                  FROM words w JOIN assigned a USING (doc_id)
                  WHERE a.split = 'train')
        ),
        tok AS (
            SELECT g.doc_id,
                   ((coalesce(c.c2, 0) + v.v) * {LM_SCALE})
                       // (coalesce(t.c3, 0) + 1) AS q
            FROM grams g
            LEFT JOIN tri_counts t USING (tri_h)
            LEFT JOIN ctx_counts c USING (ctx_h), vocab v
        ),
        surprise AS (
            SELECT doc_id,
                   8 * (length(bin(q)) - 1)
                       + ((q * 8) >> (length(bin(q)) - 1)) - 8
                       - {8 * LM_SCALE_BITS} AS s
            FROM tok
        )
        SELECT doc_id,
               count(*) AS n_trigrams,
               CAST(sum(s) AS BIGINT) AS surprise_eighth_bits,
               CAST(sum(s) AS DOUBLE) / (8 * count(*)) AS bits_per_token
        FROM surprise
        GROUP BY doc_id
        ORDER BY doc_id
    """


@query(
    "lm_perplexity_scores",
    ids=("SCALE-TEXTQA", "A1", "A4"),
    oracle=_lm_oracle(),
)
def lm_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style n-gram LM quality filter
    (:mod:`bigdatalab_spark.scale.lm`): an add-one-smoothed trigram
    model is trained in-plan on the corpus' deterministic train split
    and every document is scored by bits-per-token under it — the
    standard quality signal between heuristic filters and model-based
    scoring. All per-token arithmetic is integer fixed-point (no libm,
    no float sums), so the DuckDB oracle replays the entire train+score
    pipeline bit-for-bit. Reference tie-in: 301-solutions.scala:21-24
    (wordcount aggregates, extended from counting to modeling)."""
    from bigdatalab_spark.scale.curation import hash_split
    from bigdatalab_spark.scale.lm import lm_surprise_scores, train_trigram_model

    docs = load_table(spark, sf_dir, "documents")
    split = hash_split(docs, "doc_id")
    reference = split.filter(F.col("split") == "train").drop("split")
    tri, ctx, vocab = train_trigram_model(reference)
    return lm_surprise_scores(docs, tri, ctx, vocab).orderBy("doc_id")


@query("quality_classifier_scores", ids=("SCALE-TEXTQA", "SCALE-ML"))
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality classifier (:mod:`bigdatalab_spark.scale.quality_ml`):
    HashingTF + IDF + LogisticRegression fit on the train split's
    heuristic labels, scoring the held-out splits with the class-1
    probability. Rows-only by design — model outputs are float dot
    products (like the trained-KMeans IVF); pytest gates held-out AUC
    instead of value hashes."""
    from bigdatalab_spark.scale.curation import hash_split
    from bigdatalab_spark.scale.quality_ml import (
        score_documents,
        train_quality_classifier_cached,
    )

    docs = hash_split(load_table(spark, sf_dir, "documents"), "doc_id")
    model = train_quality_classifier_cached(
        docs.filter(F.col("split") == "train"),
        (spark.sparkContext.applicationId, corpus_fingerprint(sf_dir, "documents")),
    )
    holdout = docs.filter(F.col("split") != "train")
    return score_documents(model, holdout).orderBy("doc_id")


@query(
    "contamination_report",
    ids=("SCALE-DECONTAM",),
    oracle=f"""
        WITH words AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
            FROM documents
        ),
        {_SPLIT_CTE},
        ngrams AS (
            SELECT DISTINCT w.doc_id,
                   {portable_hash_sql(f"array_to_string(ws[i:i+{_NGRAM - 1}], ' ')")}
                       AS ngram_h
            FROM words w,
                 LATERAL (SELECT unnest(generate_series(1, len(ws) - {_NGRAM - 1})) AS i) t
            WHERE len(ws) >= {_NGRAM}
        ),
        train_ngrams AS (
            SELECT n.doc_id AS train_doc_id, ngram_h
            FROM ngrams n JOIN assigned a USING (doc_id)
            WHERE a.split = 'train'
        ),
        kept_train AS (
            SELECT t.* FROM train_ngrams t
            JOIN (
                SELECT ngram_h FROM train_ngrams
                GROUP BY ngram_h HAVING count(*) <= 1000
            ) g USING (ngram_h)
        ),
        holdout_ngrams AS (
            SELECT n.doc_id, a.split, ngram_h
            FROM ngrams n JOIN assigned a USING (doc_id)
            WHERE a.split IN ('val', 'test')
        ),
        shared AS (
            SELECT h.doc_id, h.split, k.train_doc_id,
                   count(*) AS n_shared_ngrams
            FROM holdout_ngrams h JOIN kept_train k USING (ngram_h)
            GROUP BY h.doc_id, h.split, k.train_doc_id
        )
        SELECT doc_id, split, train_doc_id, n_shared_ngrams, rank
        FROM (
            SELECT *, CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY n_shared_ngrams DESC, train_doc_id ASC
                   ) AS INT) AS rank
            FROM shared
        )
        WHERE rank <= 5
        ORDER BY doc_id, rank
    """,
)
def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout-side contamination report
    (:func:`bigdatalab_spark.scale.decontam.contamination_report`): for
    every val/test document, the top-5 train documents leaking into it
    by shared 5-gram count. Intrinsically a doc-pair join, kept linear
    by the train-df boilerplate guard + immediate per-pair aggregation;
    the oracle replays the guard, the pair counts, and the total-order
    ranking exactly."""
    from bigdatalab_spark.scale.curation import hash_split
    from bigdatalab_spark.scale.decontam import contamination_report as report

    docs = hash_split(load_table(spark, sf_dir, "documents"), "doc_id")
    return report(docs, n=_NGRAM, k=5).orderBy("doc_id", "rank")


@query(
    "events_daily_resampled",
    ids=("T-EXT", "P1", "A3"),
    oracle="""
        WITH ranked AS (
            SELECT user_id, CAST(ts AS DATE) AS day, value,
                   row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE user_id < 100
        ),
        daily AS (
            SELECT user_id, day,
                   count(*) AS n_events,
                   max(CASE WHEN rn = 1 THEN value END) AS last_value
            FROM ranked
            GROUP BY user_id, day
        ),
        bounds AS (
            SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
            FROM events
        ),
        grid AS (
            SELECT u.user_id, CAST(g.day AS DATE) AS day
            FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 100) u,
                 bounds,
                 LATERAL (SELECT unnest(generate_series(bounds.d0, bounds.d1,
                                                        INTERVAL 1 DAY)) AS day) g
        )
        SELECT grid.user_id,
               strftime(grid.day, '%Y-%m-%d') AS day,
               coalesce(daily.n_events, 0) AS n_events,
               last_value(daily.last_value IGNORE NULLS) OVER (
                   PARTITION BY grid.user_id ORDER BY grid.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value
        FROM grid LEFT JOIN daily USING (user_id, day)
        ORDER BY user_id, day
    """,
)
def events_daily_resampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with forward fill: per user, a regular
    daily grid over the corpus date range with event counts and the
    last observed value carried forward across empty days — the gap-
    filling shape every metrics/feature pipeline needs before ML
    windowing.

    Scale shape: the daily pre-aggregate shrinks events to one row per
    (user, day) BEFORE the grid join (never raw events x grid); the
    calendar bounds come from an aggregate cross-joined in-plan (no
    driver collect); the fill is one ``last(ignorenulls)`` running
    window per user — same user_id exchange the grid join already
    produced. Day count is bounded (a corpus has a calendar, not a key
    space), so grid rows = users x days stays linear in users."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter("user_id < 100")
    wlast = Window.partitionBy("user_id", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .withColumn("_rn", F.row_number().over(wlast))
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("_rn") == 1, F.col("value"))).alias("last_value"),
        )
    )
    bounds = load_table(spark, sf_dir, "events").agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    wfill = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("last_value", ignorenulls=True).over(wfill).alias("filled_value"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "incremental_agg_merge",
    ids=("A4", "A5", "T-EXT"),
    oracle="""
        WITH history AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   count(*) AS n_events,
                   CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sum_value
            FROM events
            WHERE CAST(ts AS DATE) < DATE '2024-01-25'
            GROUP BY 1, 2
        ),
        batch AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   count(*) AS n_events,
                   CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sum_value
            FROM events
            WHERE CAST(ts AS DATE) >= DATE '2024-01-25'
            GROUP BY 1, 2
        )
        SELECT coalesce(h.user_id, b.user_id) AS user_id,
               strftime(coalesce(h.day, b.day), '%Y-%m-%d') AS day,
               coalesce(h.n_events, 0) + coalesce(b.n_events, 0) AS n_events,
               coalesce(h.sum_value, 0) + coalesce(b.sum_value, 0) AS sum_value
        FROM history h
        FULL OUTER JOIN batch b ON h.user_id = b.user_id AND h.day = b.day
        ORDER BY user_id, day
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: merge a new batch's partial
    aggregate into a STORED per-(user, day) aggregate with a full outer
    join + coalesced sums — the materialized-view upkeep pattern. At
    100 TB the history side is the stored aggregate table (rows =
    users x days, orders of magnitude smaller than raw events) and only
    the new batch's raw rows are ever re-read: daily cost tracks the
    batch, never the history. Count and DECIMAL-exact sum are the
    mergeable buffers (the same decomposition Spark's partial
    aggregation uses internally — avg is derived sum/count at read
    time, never stored). The merged result equals the from-scratch
    aggregate bit-for-bit, which is what the oracle (and the algebraic
    property test) check."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-25").cast("date")

    def daily(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("day", F.to_date("ts"))
            .groupBy("user_id", "day")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(28,6)"))
                .cast("double")
                .alias("sum_value"),
            )
        )

    history = daily(ev.filter(F.to_date("ts") < cutoff))
    batch = daily(ev.filter(F.to_date("ts") >= cutoff))
    h, b = history.alias("h"), batch.alias("b")
    return (
        h.join(
            b,
            (F.col("h.user_id") == F.col("b.user_id"))
            & (F.col("h.day") == F.col("b.day")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("h.user_id"), F.col("b.user_id")).alias("user_id"),
            F.date_format(
                F.coalesce(F.col("h.day"), F.col("b.day")), "yyyy-MM-dd"
            ).alias("day"),
            (
                F.coalesce(F.col("h.n_events"), F.lit(0))
                + F.coalesce(F.col("b.n_events"), F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce(F.col("h.sum_value"), F.lit(0.0))
                + F.coalesce(F.col("b.sum_value"), F.lit(0.0))
            ).alias("sum_value"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "unpivoted_daily_metrics",
    ids=("P1", "A7"),
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   count(*) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY 1
        )
        SELECT strftime(day, '%Y-%m-%d') AS day, metric,
               CAST(value AS DOUBLE) AS value
        FROM daily
        UNPIVOT (value FOR metric IN (n_events, n_users, sum_value))
        ORDER BY day, metric
    """,
)
def unpivoted_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape via ``DataFrame.unpivot`` (melt): per-day
    metrics pivoted into (day, metric, value) rows — the long format
    metric stores and plotting layers expect. Unpivot is a zero-shuffle
    Expand projection (each input row fans out to one row per value
    column in place); the only exchange is the upstream daily
    aggregate's."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.countDistinct("user_id").cast("double").alias("n_users"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
    )
    return (
        daily.unpivot("day", ["n_events", "n_users", "sum_value"], "metric", "value")
        .orderBy("day", "metric")
    )


@query(
    "scd2_user_intervals",
    ids=("T-EXT", "O5"),
    oracle="""
        SELECT user_id,
               event_id,
               value,
               epoch_us(ts) AS valid_from_us,
               epoch_us(lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        FROM events
        WHERE user_id < 50
        ORDER BY user_id, valid_from_us, event_id
    """,
)
def scd2_user_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: each observed value becomes a validity
    interval [valid_from, valid_to) closed by the NEXT observation via
    ``lead`` (open-ended + is_current for the latest) — the
    slowly-changing-dimension table a lakehouse keeps instead of
    overwriting in place (the overwrite twin is cdc_latest_by_key).
    Interval bounds are exact integer epoch-microseconds. One window
    per user_id partition — the same single-exchange shape as the
    lag/gap family."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter("user_id < 50")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            F.unix_micros("ts").alias("valid_from_us"),
            F.unix_micros(nxt).alias("valid_to_us"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us", "event_id")
    )


@query(
    "decontaminated_split",
    ids=("SCALE-DECONTAM", "SCALE-CURATION"),
    oracle=f"""
        WITH words AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
            FROM documents
        ),
        {_SPLIT_CTE},
        ngrams AS (
            SELECT DISTINCT w.doc_id,
                   {portable_hash_sql(f"array_to_string(ws[i:i+{_NGRAM - 1}], ' ')")}
                       AS ngram_h
            FROM words w,
                 LATERAL (SELECT unnest(generate_series(1, len(ws) - {_NGRAM - 1})) AS i) t
            WHERE len(ws) >= {_NGRAM}
        ),
        holdout_set AS (
            SELECT DISTINCT ngram_h
            FROM ngrams n JOIN assigned a USING (doc_id)
            WHERE a.split IN ('val', 'test')
        ),
        contaminated AS (
            SELECT DISTINCT n.doc_id
            FROM ngrams n
            JOIN assigned a USING (doc_id)
            JOIN holdout_set h USING (ngram_h)
            WHERE a.split = 'train'
        )
        SELECT a.doc_id, a.split,
               CASE WHEN a.split = 'train' AND c.doc_id IS NOT NULL
                    THEN 'quarantine' ELSE a.split END AS final_split
        FROM assigned a LEFT JOIN contaminated c USING (doc_id)
        ORDER BY a.doc_id
    """,
)
def decontaminated_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split REPAIR: the detect step (decontam_ngram_overlap) feeds the
    fix — train documents sharing any 5-gram with a held-out document
    are reassigned to 'quarantine' so the training set ships clean
    without touching val/test membership (moving docs INTO holdout
    would bias it toward duplicated content). One anti-join-shaped
    left join against the contaminated id set; the set stays linear
    per the decontam shape notes."""
    from bigdatalab_spark.scale.curation import hash_split
    from bigdatalab_spark.scale.decontam import ngram_contamination

    docs = hash_split(load_table(spark, sf_dir, "documents"), "doc_id")
    contaminated = ngram_contamination(docs, n=_NGRAM).select("doc_id")
    return (
        docs.select("doc_id", "split")
        .join(contaminated.withColumn("_c", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            "split",
            F.when(
                (F.col("split") == "train") & F.col("_c").isNotNull(),
                F.lit("quarantine"),
            )
            .otherwise(F.col("split"))
            .alias("final_split"),
        )
        .orderBy("doc_id")
    )


@query(
    "event_props_variant",
    ids=("S6", "P6"),
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
                   AS sum_k,
               count(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                          THEN 1 END) AS n_with_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def event_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through the VARIANT type (Spark 4):
    ``parse_json`` ingests the JSON column ONCE into Variant's binary
    encoding, and every ``variant_get`` afterwards is a typed binary
    traversal — no re-parse per extraction, the open-format answer to
    repeated ``get_json_object`` calls each re-parsing the string. At
    100 TB you'd store the Variant column in the table and shred
    extractions at scan time."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k").isNotNull(), 1)).alias("n_with_k"),
        )
        .orderBy("event_type")
    )


_QUOTA_K = 10


@query(
    "stratified_quota_sample",
    ids=("P11", "SCALE-CURATION"),
    oracle=f"""
        SELECT source, doc_id
        FROM (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY {portable_hash_sql(
                           "'quota-v1' || coalesce(CAST(doc_id AS VARCHAR), chr(0))"
                       )}, doc_id
                   ) AS rn
            FROM documents
        )
        WHERE rn <= {_QUOTA_K}
        ORDER BY source, doc_id
    """,
)
def stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-quota stratified sampling: exactly k documents per stratum
    (not Bernoulli's k-in-expectation — sampleBy can over/undershoot
    small strata), chosen by ranking a salted portable hash so the
    quota set is deterministic, engine-independent, and stable under
    corpus growth ONLY when new docs hash behind the frontier — the
    reproducible eval-set carve-out pattern. One window per stratum
    partition; rows beyond k never leave their partition."""
    from pyspark.sql.window import Window

    from bigdatalab_spark.scale.hashing import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash(
        F.concat(
            F.lit("quota-v1"),
            F.coalesce(F.col("doc_id").cast("string"), F.lit("\x00")),
        )
    )
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _QUOTA_K)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


@query(
    "length_bucketed_batch_stats",
    ids=("SCALE-CURATION",),
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS n_tokens
            FROM documents
        ),
        assigned AS (
            SELECT doc_id, n_tokens,
                   CAST(ceil(log2(greatest(n_tokens, 1))) AS BIGINT) AS bucket,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 16 AS shard
            FROM toks
        ),
        numbered AS (
            SELECT *, row_number() OVER (
                       PARTITION BY bucket, shard ORDER BY n_tokens, doc_id
                   ) AS rn
            FROM assigned
        )
        SELECT bucket, shard,
               CAST((rn - 1) // 8 AS BIGINT) AS batch_idx,
               count(*) AS n_docs,
               max(n_tokens) AS max_tokens,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS pad_waste
        FROM numbered
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
)
def length_bucketed_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-minimizing batch assembly
    (:func:`bigdatalab_spark.scale.curation.length_bucketed_batches`):
    power-of-two length buckets sharded 16 ways, batches of 8 by
    ascending length, reported as per-batch padding economics —
    ``pad_waste`` is the tokens of padding a max-length-padded batch
    would burn. The oracle replays bucket/shard/rank assignment
    exactly (portable hash, same window order)."""
    from bigdatalab_spark.scale.curation import length_bucketed_batches

    docs = load_table(spark, sf_dir, "documents")
    assigned = length_bucketed_batches(docs, batch_size=8, n_shards=16)
    return (
        assigned.groupBy("bucket", "shard", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
            (
                F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")
            ).alias("pad_waste"),
        )
        .orderBy("bucket", "shard", "batch_idx")
    )


@query(
    "warehouse_quality_checks",
    ids=("SCALE-VALIDATION",),
    oracle="""
        WITH o AS (SELECT count(*) AS n FROM orders),
        l AS (SELECT count(*) AS n FROM lineitem),
        report(check_name, n_rows, n_violations) AS (
            SELECT 'orders_orderkey_unique', o.n,
                   (SELECT count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders)
            FROM o
            UNION ALL
            SELECT 'orders_orderkey_not_null', o.n,
                   (SELECT count(*) FILTER (WHERE o_orderkey IS NULL) FROM orders)
            FROM o
            UNION ALL
            SELECT 'orders_totalprice_positive', o.n,
                   (SELECT count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, false)) FROM orders)
            FROM o
            UNION ALL
            SELECT 'orders_orderdate_in_range', o.n,
                   (SELECT count(*) FILTER (WHERE NOT coalesce(
                        o_orderdate >= TIMESTAMP '1992-01-01'
                        AND o_orderdate < TIMESTAMP '2002-01-01', false)) FROM orders)
            FROM o
            UNION ALL
            SELECT 'orders_custkey_fk_customer', o.n,
                   (SELECT count(*) FROM orders
                    WHERE o_custkey IS NOT NULL
                      AND o_custkey NOT IN (SELECT c_custkey FROM customer))
            FROM o
            UNION ALL
            SELECT 'lineitem_quantity_range', l.n,
                   (SELECT count(*) FILTER (WHERE NOT coalesce(
                        l_quantity BETWEEN 1 AND 50, false)) FROM lineitem)
            FROM l
            UNION ALL
            SELECT 'lineitem_discount_range', l.n,
                   (SELECT count(*) FILTER (WHERE NOT coalesce(
                        l_discount BETWEEN 0 AND 1, false)) FROM lineitem)
            FROM l
            UNION ALL
            SELECT 'lineitem_orderkey_fk_orders', l.n,
                   (SELECT count(*) FROM lineitem
                    WHERE l_orderkey IS NOT NULL
                      AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
            FROM l
        )
        SELECT check_name, CAST(n_rows AS BIGINT) AS n_rows,
               CAST(n_violations AS BIGINT) AS n_violations,
               n_violations = 0 AS passed
        FROM report
        ORDER BY check_name
    """,
)
def warehouse_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite
    (:mod:`bigdatalab_spark.operators.validation`): uniqueness,
    not-null, range, and referential checks over orders/lineitem,
    folded into ONE aggregate scan per table plus one anti-join per
    foreign key — the Deequ/dbt-test pattern at engine cost. The
    oracle recomputes every check independently."""
    from bigdatalab_spark.operators.validation import (
        Expect,
        ForeignKey,
        NotNull,
        Unique,
        run_checks,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    o_report = run_checks(
        orders,
        [
            Unique("orders_orderkey_unique", "o_orderkey"),
            NotNull("orders_orderkey_not_null", "o_orderkey"),
            Expect("orders_totalprice_positive", F.col("o_totalprice") > 0),
            Expect(
                "orders_orderdate_in_range",
                (F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2002-01-01").cast("timestamp")),
            ),
            ForeignKey("orders_custkey_fk_customer", "o_custkey", customer, "c_custkey"),
        ],
    )
    l_report = run_checks(
        lineitem,
        [
            Expect(
                "lineitem_quantity_range", F.col("l_quantity").between(1, 50)
            ),
            Expect(
                "lineitem_discount_range", F.col("l_discount").between(0, 1)
            ),
            ForeignKey("lineitem_orderkey_fk_orders", "l_orderkey", orders, "o_orderkey"),
        ],
    )
    return o_report.unionByName(l_report).orderBy("check_name")


@query(
    "temperature_mix_counts",
    ids=("SCALE-CURATION", "P11", "A4"),
    oracle=f"""
        WITH counts AS (
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        ), mn AS (
            SELECT min(n_docs) AS n_min FROM counts
        ), rates AS (
            SELECT lang, n_docs,
                   CAST(FLOOR(10000 * sqrt(CAST(n_min AS DOUBLE)
                                           / CAST(n_docs AS DOUBLE)))
                        AS BIGINT) AS mix_threshold
            FROM counts, mn
        )
        SELECT r.lang, r.n_docs, r.mix_threshold, count(*) AS n_kept
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE {portable_hash_sql(
            "'tmix-v1' || d.lang || '|' || CAST(d.doc_id AS VARCHAR)")} % 10000
              < r.mix_threshold
        GROUP BY r.lang, r.n_docs, r.mix_threshold
        ORDER BY r.lang
    """,
)
def temperature_mix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) mixture rebalancing
    (:func:`bigdatalab_spark.scale.curation.temperature_mix`): keep
    rates derived IN-PLAN from the language histogram — rare languages
    keep everything, the dominant one is downsampled toward the
    flattened ``p_i ∝ sqrt(share_i)`` distribution. The salted-hash
    keep decision and the IEEE-sqrt thresholds replay exactly in the
    SQL oracle."""
    from bigdatalab_spark.scale.curation import temperature_mix

    docs = load_table(spark, sf_dir, "documents")
    return (
        temperature_mix(docs, "lang")
        .groupBy("lang")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("mix_threshold").alias("mix_threshold"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .orderBy("lang")
    )


@query(
    "weighted_median_price",
    ids=("A4", "A8", "P3", "O1"),
    oracle="""
        WITH base AS (
            SELECT l_returnflag, l_extendedprice AS v,
                   CAST(l_quantity AS BIGINT) AS wt
            FROM lineitem
        ), tot AS (
            SELECT l_returnflag, sum(wt) AS total
            FROM base GROUP BY l_returnflag
        ), cum AS (
            SELECT l_returnflag, v,
                   sum(wt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw
            FROM base
        )
        SELECT c.l_returnflag, min(v) AS weighted_median_price
        FROM cum c JOIN tot t ON c.l_returnflag = t.l_returnflag
        WHERE 2 * c.cw >= t.total
        GROUP BY c.l_returnflag
        ORDER BY c.l_returnflag
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag via the
    GROUPED_AGG pandas UDF surface
    (:mod:`bigdatalab_spark.functions.pandas_aggs`) — the Arrow-batched
    custom-aggregate extensibility path, made engine-exact (integer
    crossing test, result is an existing value) so the SQL oracle
    replays it with a cumulative-weight window. The oracle doubles as
    the built-in twin: same answer from pure SQL, proving the UDF's
    semantics rather than trusting them."""
    from bigdatalab_spark.functions.pandas_aggs import weighted_median_agg

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            weighted_median_agg("l_extendedprice", "l_quantity").alias(
                "weighted_median_price"
            )
        )
        .orderBy("l_returnflag")
    )


@query(
    "token_importance_counts",
    ids=("SCALE-CURATION", "P11", "A4"),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split_regex(text, '\\s+'),
                                   w -> w <> '')) AS w
            FROM documents
        ), mx AS (
            SELECT max(w) AS mw FROM toks
        )
        SELECT lang, count(*) AS n_kept,
               CAST(sum(w) AS BIGINT) AS kept_tokens
        FROM toks, mx
        WHERE {portable_hash_sql("'imp-v1' || CAST(doc_id AS VARCHAR)")}
                  % 10000
              < CAST(FLOOR(10000 * CAST(w AS DOUBLE) / CAST(mw AS DOUBLE))
                     AS BIGINT)
        GROUP BY lang
        ORDER BY lang
    """,
)
def token_importance_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass importance sampling
    (:func:`bigdatalab_spark.scale.curation.importance_sample`): keep
    probability proportional to whitespace token count, so every token
    has ~equal inclusion probability — the length-unbiased subcorpus.
    Per-row thresholds (floor of a deterministic double ratio) and the
    salted hash replay exactly in SQL."""
    from bigdatalab_spark.scale.curation import importance_sample
    from bigdatalab_spark.scale.textqa import whitespace_token_count

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "w", whitespace_token_count("text").cast("bigint")
    )
    return (
        importance_sample(docs, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("w").alias("kept_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "robust_value_outliers",
    ids=("SCALE-CURATION", "A4", "A8", "O1"),
    oracle="""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        ), mad AS (
            SELECT e.event_type,
                   quantile_cont(abs(e.value - m.med), 0.5) AS mad
            FROM events e JOIN med m ON e.event_type = m.event_type
            GROUP BY e.event_type
        )
        SELECT e.event_type, m.med, d.mad,
               CAST(sum(CASE WHEN d.mad <> 0
                              AND abs(0.6745 * (e.value - m.med) / d.mad) > 3.5
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               count(*) AS n_events
        FROM events e
        JOIN med m ON e.event_type = m.event_type
        JOIN mad d ON e.event_type = d.event_type
        GROUP BY e.event_type, m.med, d.mad
        ORDER BY e.event_type
    """,
)
def robust_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-score outliers
    (:func:`bigdatalab_spark.scale.curation.robust_outliers`) per event
    type — the outlier count a few extreme values cannot corrupt. The
    percentile interpolation matches quantile_cont, and the z-score is
    a pure per-row expression, so counts replay strictly."""
    from bigdatalab_spark.scale.curation import robust_outliers

    ev = load_table(spark, sf_dir, "events")
    return (
        robust_outliers(ev, "value", "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(F.col("is_outlier").cast("bigint")).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("event_type", "med", "mad", "n_outliers", "n_events")
        .orderBy("event_type")
    )


def _pagerank_oracle(iterations: int = 5, damping: float = 0.85) -> str:
    """Unrolled-CTE replay of scale.graph.pagerank (BPE-oracle style).

    Float literals go through string casts: ``1.0 - 0.85`` is
    0.15000000000000002 in IEEE arithmetic, and a bare DuckDB decimal
    literal of that many digits would parse as DECIMAL, not DOUBLE —
    the string cast pins the exact double Spark's F.lit carries.
    """
    tele = repr(1.0 - damping)
    damp = repr(damping)
    parts = [
        """
        WITH pairs AS (
            SELECT DISTINCT 'l:' || CAST(o_custkey AS VARCHAR) AS l_node,
                            'r:' || CAST(l_suppkey AS VARCHAR) AS r_node
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), edges AS (
            SELECT l_node AS src, r_node AS dst FROM pairs
            UNION ALL
            SELECT r_node AS src, l_node AS dst FROM pairs
        ), deg AS (
            SELECT src, count(*) AS d FROM edges GROUP BY src
        ), nodes AS (
            SELECT DISTINCT src AS node FROM edges
        ), nn AS (
            SELECT count(*) AS n FROM nodes
        ), r0 AS (
            SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nodes, nn
        )"""
    ]
    for k in range(iterations):
        parts.append(
            f""", r{k + 1} AS (
            SELECT e.dst AS node,
                   CAST('{tele}' AS DOUBLE) / nn.n
                   + CAST('{damp}' AS DOUBLE)
                     * CAST(sum(CAST(r.rank / deg.d AS DECIMAL(28,12)))
                            AS DOUBLE) AS rank
            FROM edges e
            JOIN r{k} r ON e.src = r.node
            JOIN deg ON e.src = deg.src
            CROSS JOIN nn
            GROUP BY e.dst, nn.n
        )"""
        )
    parts.append(
        f"""
        SELECT node, rank FROM r{iterations}
        WHERE node LIKE 'r:%'
        ORDER BY rank DESC, node
        LIMIT 25
    """
    )
    return "".join(parts)


@query(
    "pagerank_supplier_centrality",
    ids=("SCALE-GRAPH", "J1", "A4", "O2", "O4"),
    oracle=_pagerank_oracle(),
)
def pagerank_supplier_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-iteration PageRank over the customer↔supplier co-occurrence
    graph (:func:`bigdatalab_spark.scale.graph.pagerank`): which
    suppliers sit at the center of the purchasing network. Per-edge
    contributions quantize to DECIMAL(28,12) before each round's sum,
    so the whole iterative run — not just row counts — replays bit for
    bit in the unrolled SQL oracle."""
    from bigdatalab_spark.scale.graph import bipartite_edges, pagerank

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_custkey", "l_suppkey"
    )
    ranks = pagerank(bipartite_edges(pairs, "o_custkey", "l_suppkey"))
    return (
        ranks.filter(F.col("node").startswith("r:"))
        .orderBy(F.desc("rank"), "node")
        .limit(25)
    )


@query(
    "supplier_copurchase_triangles",
    ids=("SCALE-GRAPH", "J1", "A10"),
    oracle="""
        WITH cs AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey AS s
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-07-01'
        ), und AS (
            SELECT DISTINCT p1.s AS u, p2.s AS v
            FROM cs p1 JOIN cs p2 ON p1.c = p2.c AND p1.s < p2.s
        ), deg AS (
            SELECT node, count(*) AS d
            FROM (SELECT u AS node FROM und
                  UNION ALL SELECT v AS node FROM und)
            GROUP BY node
        ), wd AS (
            SELECT u, v, du.d AS du, dv.d AS dv
            FROM und
            JOIN deg du ON und.u = du.node
            JOIN deg dv ON und.v = dv.node
        ), oriented AS (
            SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS src,
                   CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS dst,
                   CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS ddst
            FROM wd
        ), wedges AS (
            SELECT w1.src, w1.dst AS x, w2.dst AS y
            FROM oriented w1 JOIN oriented w2 ON w1.src = w2.src
            WHERE w1.ddst < w2.ddst
               OR (w1.ddst = w2.ddst AND w1.dst < w2.dst)
        ), tri AS (
            SELECT 1 AS one
            FROM wedges JOIN oriented o ON wedges.x = o.src AND wedges.y = o.dst
        )
        SELECT (SELECT count(*) FROM deg)    AS n_nodes,
               (SELECT count(*) FROM und)    AS n_edges,
               (SELECT count(*) FROM wedges) AS n_wedges,
               (SELECT count(*) FROM tri)    AS n_triangles
    """,
)
def supplier_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census of the H1-1996 supplier co-purchase graph
    (:func:`bigdatalab_spark.scale.graph.triangle_count`): suppliers
    are linked when one customer bought from both in the window;
    triangle density measures how clustered the supply network is.
    The compact-forward degree orientation bounds wedge fan-out at hub
    suppliers to ~sqrt(E); the co-occurrence materialization itself is
    per-customer quadratic, bounded by order fanout (and windowed — the
    100 TB version materializes co-occurrence per time slice, exactly
    as here)."""
    from bigdatalab_spark.scale.graph import triangle_count

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cs = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
    ).distinct()
    p2 = cs.select(F.col("c"), F.col("s").alias("s2"))
    co = (
        cs.join(p2, "c")
        .filter(F.col("s") < F.col("s2"))
        .select(F.col("s").alias("a"), F.col("s2").alias("b"))
    )
    return triangle_count(co)


@query("als_supplier_recommendations", ids=("SCALE-ML", "J1", "A9", "O4"))
def als_supplier_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit-feedback ALS collaborative filtering
    (:mod:`bigdatalab_spark.scale.recsys`): top-3 supplier
    recommendations per customer from the factorized purchase matrix —
    the MovieLens-lab workload taken to its natural next step on
    Spark's block-partitioned ALS. Rows-only by design (learned float
    factors); pytest gates block-preference recovery on a planted
    structure instead of value hashes."""
    from bigdatalab_spark.scale.recsys import recommend_suppliers

    return recommend_suppliers(spark, sf_dir)
