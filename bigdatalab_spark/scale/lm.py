"""N-gram language-model quality filter (scale extension).

The CCNet recipe (Wenzek et al., 2020): train a small LM on a trusted
reference slice, score every document by its perplexity under that
model, and keep the low-perplexity (prose-like) tail. This sits between
the heuristic filters (:mod:`bigdatalab_spark.scale.textqa`) and a
trained classifier (:mod:`bigdatalab_spark.scale.quality_ml`) in a real
training-data pipeline.

Model: add-one-smoothed trigram LM. For token position i with context
``(w[i-2], w[i-1])``::

    p = (c3 + 1) / (c2 + V)

where ``c3`` = trigram count in the reference slice, ``c2`` = context
bigram count (derived from the same trigram explode, so c3 <= c2 by
construction), ``V`` = reference vocabulary size. An unseen context
degrades to ``1 / V`` — the uniform-over-vocabulary backoff.

**Exactness over libm.** The per-token negative log2 probability is
computed in *integer fixed point* so the whole pipeline replays
bit-for-bit in any SQL engine (the correctness gate's DuckDB oracle has
no float tolerance, and float SUMs are order-dependent under Spark's
partial aggregation — both rule out ``log()`` doubles on the hot path)::

    q        = ((c2 + V) * 2^20) div (c3 + 1)        -- 1/p, 20 frac bits
    msb      = length(bin(q)) - 1                    -- floor(log2 q)
    surprise = 8*msb + (shiftright(q*8, msb) - 8) - 160

``surprise`` is ``-log2(p)`` in **eighth-bit units** (msb gives the
integer part of log2, the next three bits after the MSB give the
fraction to 1/8 bit; 160 = 8 * log2(2^20) removes the fixed-point
scale). Measured error vs true 8*log2: <= 1.4 eighth-bits (0.18 bit)
per token, unbiased enough for filtering; the win is that every
arithmetic op is an int64 add/mul/shift — deterministic everywhere,
whole-stage-codegen'd, and SUM-able exactly.

Scale shape: one explode + two keyed aggregations build the model (both
partially aggregated map-side); scoring is one explode + two hash
equi-joins on 28-bit n-gram hashes (AQE broadcast-converts the model
tables when the reference slice is small — the CCNet regime; a corpus-
sized model falls back to hash-partitioned joins) + one keyed sum.
Nothing ever shuffles raw text. Int64 bounds: ``(c2+V) * 2^23`` must
stay under 2^63, i.e. context counts up to ~10^12 — comfortably past a
100 TB corpus' hottest bigram.

Reference tie-in: extends the wordcount-family aggregates
(301-solutions.scala:21-24) from counting words to modeling them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatalab_spark.functions import tokenize
from bigdatalab_spark.scale.hashing import portable_hash

#: fixed-point scale for the inverse probability (20 fractional bits)
LM_SCALE_BITS = 20
LM_SCALE = 1 << LM_SCALE_BITS


def doc_trigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Explode documents to ``(doc_id, ctx_h, tri_h)`` — one row per
    trigram position, context and trigram hashed with the portable
    28-bit family so DuckDB replays the join keys exactly.

    Tokens are lower-cased whitespace tokens (the corpus-wide
    convention). The token array is materialized in its own projection
    before the position ``transform`` — the higher-order-function CSE
    gotcha (see :func:`bigdatalab_spark.functions.word_shingles`).
    Narrow until the downstream aggregation: the explode preserves input
    partitioning.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize(F.lower(F.col(text_col))).alias("toks"),
    )
    grams = F.when(F.size("toks") < 3, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.struct(
                F.concat_ws(
                    " ", F.element_at("toks", i), F.element_at("toks", i + 1)
                ).alias("ctx"),
                F.concat_ws(
                    " ",
                    F.element_at("toks", i),
                    F.element_at("toks", i + 1),
                    F.element_at("toks", i + 2),
                ).alias("tri"),
            ),
        )
    )
    return toks.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id",
        portable_hash(F.col("g.ctx")).alias("ctx_h"),
        portable_hash(F.col("g.tri")).alias("tri_h"),
    )


def train_trigram_model(
    reference_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the trigram model on the reference slice in-plan.

    Returns ``(tri_counts(tri_h, c3), ctx_counts(ctx_h, c2),
    vocab(v))`` — three lazy DataFrames, no driver-side collection.
    ``ctx_counts`` is derived from the same trigram explode (context
    occurrences that *head a trigram*), so ``c3 <= c2`` holds by
    construction and the smoothed probability never exceeds 1.

    ``min_count`` optionally prunes trigrams rarer than the threshold
    from the model (the CCNet vocabulary-pruning knob); pruned trigrams
    score as unseen. Context counts and V are computed before pruning so
    probabilities stay normalized against the full reference mass.
    """
    grams = doc_trigrams(reference_docs, text_col, id_col)
    tri_counts = grams.groupBy("tri_h").agg(F.count(F.lit(1)).alias("c3"))
    if min_count is not None:
        tri_counts = tri_counts.filter(F.col("c3") >= min_count)
    ctx_counts = grams.groupBy("ctx_h").agg(F.count(F.lit(1)).alias("c2"))
    vocab = (
        reference_docs.select(
            F.explode(tokenize(F.lower(F.col(text_col)))).alias("tok")
        )
        .agg(F.count_distinct("tok").alias("v"))
    )
    return tri_counts, ctx_counts, vocab


def lm_surprise_scores(
    docs: DataFrame,
    tri_counts: DataFrame,
    ctx_counts: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document under the trained model.

    Returns ``(doc_id, n_trigrams, surprise_eighth_bits,
    bits_per_token)`` for each document with at least one trigram
    (docs under 3 tokens carry no model evidence and are omitted —
    length-based filters own that regime).

    ``surprise_eighth_bits`` is the exact-integer sum of per-token
    surprises; ``bits_per_token`` = total / (8 * n) is the ONE float op,
    a single correctly-rounded division of two exact integers —
    deterministic across engines, log2(perplexity) in bits.
    """
    grams = doc_trigrams(docs, text_col, id_col)
    # integer division: ((c2 + V) * SCALE) div (c3 + 1)
    scored = (
        grams.join(tri_counts, "tri_h", "left")
        .join(ctx_counts, "ctx_h", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn("c3n", F.coalesce("c3", F.lit(0)) + 1)
        .withColumn("c2v", F.coalesce("c2", F.lit(0)) + F.col("v"))
        .withColumn("q", F.expr(f"(c2v * {LM_SCALE}) div c3n"))
        .withColumn("msb", F.length(F.bin("q")) - 1)
        .withColumn(
            "s",
            8 * F.col("msb")
            + F.expr("shiftright(q * 8, msb)")
            - 8
            - 8 * LM_SCALE_BITS,
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum("s").cast("bigint").alias("surprise_eighth_bits"),
        (
            F.sum("s").cast("double") / (8 * F.count(F.lit(1)))
        ).alias("bits_per_token"),
    )
