"""Dataset curation operators: deterministic splits and stratified
sampling — the last mile between a deduplicated corpus and training.

Both are narrow/cheap by construction: assignment is a pure function of
the row (hash or RNG), so neither operator shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatalab_spark.scale.hashing import portable_hash

#: hash buckets for split assignment — weights resolve to integer
#: thresholds out of this many buckets
SPLIT_BUCKETS = 10_000


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe deterministic train/val/test assignment.

    The split is a pure function of ``(salt, key)`` — the portable
    28-bit md5 hash mod ``SPLIT_BUCKETS`` against cumulative weight
    thresholds — so:

    - all rows sharing a key (all chunks of a document, all documents of
      a domain) land in the SAME split: group-aware, no train/test
      leakage through near-identical siblings;
    - assignment is stable across runs, engines, partitionings, and
      corpus growth (a new document never moves an old one);
    - re-salting produces an independent split without touching data.

    NULL keys are coalesced to the NUL character before hashing (same
    convention as :func:`domain_mix`), so rows with a NULL key form one
    deterministic pseudo-key group rather than falling through the CASE
    chain to the last split by accident. An oracle replaying a NULLable
    key must apply the same ``coalesce(key, chr(0))``.

    Narrow (no shuffle): the hash and the CASE chain are codegen'd
    column expressions. Replayable in DuckDB for the exact-parity
    oracle: ``CAST('0x' || substr(md5(salt || key), 1, 7) AS BIGINT)
    % 10000``.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    bucket = (
        portable_hash(
            F.concat(
                F.lit(salt),
                F.coalesce(F.col(key_col).cast("string"), F.lit("\x00")),
            )
        )
        % SPLIT_BUCKETS
    )
    expr = None
    acc = 0.0
    for name, wgt in weights.items():
        acc += wgt
        threshold = int(round(SPLIT_BUCKETS * acc / total))
        cond = bucket < threshold
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # float rounding can leave the last threshold a hair under
    # SPLIT_BUCKETS; the final otherwise pins stragglers to the last split
    expr = expr.otherwise(F.lit(list(weights)[-1]))
    return df.withColumn(split_col, expr)


def domain_mix(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "mix-v1",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the *mixture-weights*
    step of corpus assembly (keep 50% of web, 100% of wiki, ...).

    Unlike :func:`stratified_sample` (Spark's seeded RNG, engine-
    specific), the keep decision here is a pure function of
    ``(salt, stratum, key)`` via the portable md5 hash, so the sampled
    corpus is identical across runs, engines, partitionings and corpus
    growth — and exactly replayable by the SQL oracle. Narrow
    (hash + CASE + filter), preserves input partitioning; changing the
    salt draws an independent sample.
    """
    # NULL-safe: concat NULL-propagates, and NULL < threshold would
    # silently DROP every row with a NULL stratum or key. Coalesce both
    # into the hash input so NULL strata form their own stratum sampled
    # at default_rate (the threshold CASE already falls through to the
    # default when the equality is NULL).
    bucket = (
        portable_hash(
            F.concat(
                F.lit(salt),
                F.coalesce(F.col(strata_col).cast("string"), F.lit("\x00")),
                F.lit("|"),
                F.coalesce(F.col(key_col).cast("string"), F.lit("\x00")),
            )
        )
        % SPLIT_BUCKETS
    )
    threshold = F.lit(int(round(default_rate * SPLIT_BUCKETS)))
    for name, rate in rates.items():
        threshold = F.when(
            F.col(strata_col) == name, F.lit(int(round(rate * SPLIT_BUCKETS)))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    salt: str = "tmix-v1",
) -> DataFrame:
    """Temperature-based mixture rebalancing (the mT5/XLM-R alpha
    sampling rule): sample stratum *i* so the output distribution
    follows ``p_i ∝ (n_i/N)^alpha`` — with ``alpha < 1`` rare domains
    are upweighted relative to dominant ones.

    Unlike :func:`domain_mix` (caller supplies rates), the rates are
    DERIVED IN-PLAN from the observed stratum counts: the keep rate
    reduces to ``r_i = (n_min/n_i)^(1-alpha)`` normalized so the rarest
    stratum keeps everything — two tiny aggregates (stratum counts,
    global min), broadcast back onto the rows; nothing collects to the
    driver, so the same plan holds when the stratum histogram is
    computed over 100 TB.

    The keep decision is the same salted portable-hash threshold as
    :func:`domain_mix` (reproducible across runs/engines/partitionings).
    Thresholds use ``floor`` (binary-exact both engines), and with the
    default ``alpha=0.5`` the rate is an IEEE ``sqrt`` — bit-identical
    in any engine, so the sample is exactly SQL-replayable. Other
    alphas go through ``pow``, which is not guaranteed correctly
    rounded everywhere; borderline hash buckets could then differ
    across engines (documented, not oracle'd).

    Adds ``n_docs`` (stratum size) and ``mix_threshold`` (buckets out
    of :data:`SPLIT_BUCKETS` kept) to surviving rows.
    """
    skey = F.coalesce(F.col(strata_col).cast("string"), F.lit("\x00"))
    counts = (
        df.groupBy(skey.alias("__t_stratum"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    n_min = counts.agg(F.min("n_docs").alias("__t_min"))
    ratio = F.col("__t_min").cast("double") / F.col("n_docs").cast("double")
    rate = (
        F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    )
    rates = counts.join(F.broadcast(n_min)).select(
        "__t_stratum",
        "n_docs",
        F.floor(rate * SPLIT_BUCKETS).cast("bigint").alias("mix_threshold"),
    )
    bucket = (
        portable_hash(
            F.concat(
                F.lit(salt),
                skey,
                F.lit("|"),
                F.coalesce(F.col(key_col).cast("string"), F.lit("\x00")),
            )
        )
        % SPLIT_BUCKETS
    )
    return (
        df.join(F.broadcast(rates), skey == F.col("__t_stratum"))
        .drop("__t_stratum")
        .filter(bucket < F.col("mix_threshold"))
    )


def importance_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "imp-v1",
) -> DataFrame:
    """Importance sampling: keep each row with probability proportional
    to a nonnegative per-row weight, normalized by the corpus maximum.

    With ``weight = token count`` this is token-mass sampling — every
    TOKEN has (approximately) equal inclusion probability, so a length-
    unbiased subcorpus falls out without first exploding to token rows.
    The max is one tiny aggregate broadcast back (nothing collects);
    the keep decision is the salted portable hash against a per-ROW
    threshold (``floor`` of a deterministic double ratio — exactly
    SQL-replayable), unlike the per-STRATUM thresholds of
    :func:`domain_mix` / :func:`temperature_mix`.

    Adds ``imp_threshold`` (buckets kept of :data:`SPLIT_BUCKETS`);
    rows with weight 0 are always dropped, the max-weight row always
    kept.
    """
    mx = df.agg(F.max(weight_col).alias("__imp_max"))
    threshold = F.floor(
        SPLIT_BUCKETS
        * F.col(weight_col).cast("double")
        / F.col("__imp_max").cast("double")
    ).cast("bigint")
    bucket = (
        portable_hash(
            F.concat(
                F.lit(salt),
                F.coalesce(F.col(key_col).cast("string"), F.lit("\x00")),
            )
        )
        % SPLIT_BUCKETS
    )
    return (
        df.join(F.broadcast(mx))
        .withColumn("imp_threshold", threshold)
        .drop("__imp_max")
        .filter(bucket < F.col("imp_threshold"))
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    z_cut: float = 3.5,
) -> DataFrame:
    """Median/MAD robust z-scores per group — outlier detection that a
    handful of extreme values cannot corrupt (unlike mean/stddev, where
    the outliers drag their own threshold).

    Two sequential keyed aggregates (median, then median absolute
    deviation around it), each a partially-aggregated shuffle on
    ``group_col`` with the tiny cuts broadcast back; the per-row score
    ``0.6745 * (x - med) / mad`` is a pure expression. Groups with
    ``mad = 0`` (constant values) score 0 rather than dividing by zero.
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    same interpolation, so ``med``/``mad`` replay exactly.

    Adds ``med``, ``mad``, ``robust_z`` and ``is_outlier``.
    """
    med = (
        df.groupBy(group_col)
        .agg(F.percentile(value_col, F.lit(0.5)).alias("med"))
        .withColumnRenamed(group_col, "__r_group")
    )
    with_med = df.join(
        F.broadcast(med), F.col(group_col).eqNullSafe(F.col("__r_group"))
    ).drop("__r_group")
    mad = (
        with_med.groupBy(group_col)
        .agg(
            F.percentile(
                F.abs(F.col(value_col) - F.col("med")), F.lit(0.5)
            ).alias("mad")
        )
        .withColumnRenamed(group_col, "__r_group")
    )
    scored = (
        with_med.join(
            F.broadcast(mad), F.col(group_col).eqNullSafe(F.col("__r_group"))
        )
        .drop("__r_group")
        .withColumn(
            "robust_z",
            F.when(F.col("mad") == 0.0, F.lit(0.0)).otherwise(
                0.6745 * (F.col(value_col) - F.col("med")) / F.col("mad")
            ),
        )
    )
    return scored.withColumn("is_outlier", F.abs(F.col("robust_z")) > z_cut)


def deterministic_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "shuf-v1",
    pos_col: str = "shuffle_pos",
) -> DataFrame:
    """Epoch-stable global training-order shuffle.

    Training pipelines need the corpus in a *random but reproducible*
    order. Position = rank of the portable hash ``H(salt || key)``
    (ties broken by the key), computed with the scale-safe global-index
    shape (:func:`bigdatalab_spark.operators.indexing.zip_with_index`):
    range-partition on the hash, per-partition counts -> cumulative
    offsets, per-partition row_number — no single-task global sort, so
    the shuffle order of a 100 TB corpus is assigned with every stage
    parallel. A new ``salt`` (e.g. per epoch) is a fresh permutation.

    Adds ``shuffle_hash`` and ``pos_col`` (0-based).
    """
    from bigdatalab_spark.operators.indexing import zip_with_index

    hashed = df.withColumn(
        "shuffle_hash",
        portable_hash(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
    )
    return zip_with_index(hashed, "shuffle_hash", key_col, idx_name=pos_col)


def token_balanced_mix(
    df: DataFrame,
    strata_col: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = "bmix-v1",
) -> DataFrame:
    """Token-budget-aware mixture: downsample each stratum so no
    language/domain exceeds an equal share of the TOKEN mass (docs are
    not the unit that matters to a trainer — tokens are).

    Per-stratum keep-threshold (out of ``SPLIT_BUCKETS``) is derived
    from the data in-plan: ``min(BUCKETS, floor(BUCKETS * (T/k) / T_s))``
    where ``T`` is total tokens, ``k`` the stratum count and ``T_s`` the
    stratum's tokens — over-represented strata shrink toward the equal
    share, rare strata keep 100%. Every step is a fixed-order integer/
    double expression on aggregate values, so the derived rates — and
    therefore the sample — replay exactly in SQL. Two keyed aggregates
    plus a broadcast of the per-stratum thresholds; the keep decision
    itself is the same salted-hash filter as :func:`domain_mix`.

    Adds ``n_tokens``, ``threshold`` and keeps only surviving rows.
    """
    from bigdatalab_spark.functions import token_count
    from pyspark.sql.window import Window

    with_tokens = df.withColumn("n_tokens", token_count(text_col).cast("long"))
    per = with_tokens.groupBy(strata_col).agg(
        F.sum("n_tokens").alias("stratum_tokens")
    )
    wall = Window.partitionBy()
    thresholds = per.select(
        strata_col,
        F.least(
            F.lit(SPLIT_BUCKETS).cast("long"),
            F.floor(
                F.lit(float(SPLIT_BUCKETS))
                * (
                    F.sum("stratum_tokens").over(wall)
                    / F.count(F.lit(1)).over(wall)
                ).cast("double")
                / F.col("stratum_tokens").cast("double")
            ),
        ).alias("threshold"),
    )
    bucket = (
        portable_hash(
            F.concat(
                F.lit(salt),
                F.coalesce(F.col(strata_col).cast("string"), F.lit("\x00")),
                F.lit("|"),
                F.coalesce(F.col(key_col).cast("string"), F.lit("\x00")),
            )
        )
        % SPLIT_BUCKETS
    )
    return (
        with_tokens.join(F.broadcast(thresholds), strata_col)
        .filter(bucket < F.col("threshold"))
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    quantize: int | None = None,
) -> DataFrame:
    """Per-group percentile clipping (winsorization) — the standard
    outlier-taming step before a value feeds loss weighting, sampling
    temperature, or any learned statistic.

    Two stages, both keyed on ``group_col``: exact percentile cuts per
    group (one partially-aggregated shuffle; Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` share the same interpolation, so cuts
    replay exactly), then a broadcast join of the tiny cuts table back
    onto the rows and a pure-expression clip. Adds ``lo``/``hi`` and
    ``<value_col>_clipped``; original rows and columns pass through —
    including rows whose group is NULL (the join is null-safe, matching
    the NULL-group cuts row ``groupBy`` produced).

    ``quantize=N`` rounds the cuts to N decimals through a
    decimal-string render BEFORE any comparison. Both engines define
    interpolated percentiles identically but order the interpolation
    arithmetic differently, so at large n the raw cuts can differ by
    1 ULP — which flips ``value < lo`` for values sitting exactly on a
    cut (caught by the round-9 sf1 sweep: n_below off by 50 at 1M
    rows). Quantized cuts are scale-independent and replayable; at
    micro-precision they are also what a production clipping config
    would pin anyway.
    """

    def _cut(q: float):
        c = F.percentile(value_col, F.lit(q))
        if quantize is None:
            return c
        return (
            c.cast(f"decimal(28,{quantize})").cast("string").cast("double")
        )

    cuts = (
        df.groupBy(group_col)
        .agg(_cut(lo_q).alias("lo"), _cut(hi_q).alias("hi"))
        .withColumnRenamed(group_col, "__w_group")
    )
    return (
        df.join(
            F.broadcast(cuts), F.col(group_col).eqNullSafe(F.col("__w_group"))
        )
        .drop("__w_group")
        .withColumn(
            f"{value_col}_clipped",
            F.least(F.greatest(F.col(value_col), F.col("lo")), F.col("hi")),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 7,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy`` passthrough): keep
    each stratum at its own rate — downsample over-represented sources/
    languages/domains without touching rare ones. RNG is engine-specific
    (seeded, reproducible within Spark), so tests assert distributional
    bounds rather than exact rows."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def pack_sequences(
    chunks: DataFrame,
    budget: int = 128,
    id_col: str = "doc_id",
    order_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy token-budget sequence packing: walk each document's chunks
    in order, close the current sequence when adding the next chunk
    would exceed ``budget`` tokens. Adds ``seq_id`` (0-based per doc).

    The greedy close-on-overflow rule is inherently sequential per
    document, so this is the sanctioned Arrow escape hatch — but NOT as
    ``applyInPandas`` per document: document groups are tiny, and the
    per-group invocation overhead dominates (measured 16 s for 5k docs
    at sf0.1, 8x growth at 10x). Instead: repartition by the id, sort
    within partitions by (id, order), and ``mapInPandas`` over WHOLE
    partitions — one Python call per Arrow batch instead of per
    document, with carry state across batches of the same partition
    (a document may straddle a batch boundary; rows arrive in order
    within a partition, so carrying (doc, seq, acc) is exact).
    Measured: 16.2 s -> sub-second at sf0.1.

    Deterministic: assignment depends only on the chunk order within
    the document, so it is partition-count invariant and exactly
    replayable by a recursive CTE (see the train-pipeline oracle).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    # build a FRESH StructType: DataFrame.schema is cached on the frame
    # and StructType.add mutates in place — appending to it directly
    # corrupts the source frame's resolved schema
    out_schema = StructType(
        list(chunks.schema.fields) + [StructField("seq_id", LongType())]
    )

    def pack_partition(batches):
        # carry across Arrow batches within one partition
        cur_doc, seq, acc = None, 0, 0
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            toks = pdf[tokens_col].to_numpy()
            seq_ids = [0] * len(pdf)
            for i in range(len(pdf)):
                d = ids[i]
                n = int(toks[i])
                if d != cur_doc:
                    cur_doc, seq, acc = d, 0, 0
                elif acc and acc + n > budget:
                    seq += 1
                    acc = 0
                acc += n
                seq_ids[i] = seq
            out = pdf.copy()
            out["seq_id"] = seq_ids
            yield out

    ordered = chunks.repartition(id_col).sortWithinPartitions(id_col, order_col)
    return ordered.mapInPandas(pack_partition, schema=out_schema)


def length_bucketed_batches(
    docs: DataFrame,
    batch_size: int = 8,
    n_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to padding-minimizing training batches.

    Batching similar-length sequences together is how training
    pipelines avoid paying max-length padding on every batch
    (fairseq/HF ``--group_by_length``). Assignment is deterministic and
    shuffle-frugal:

    1. ``bucket = ceil(log2(n_tokens))`` — power-of-two length buckets,
       a narrow per-row expression; members of a bucket are within 2x
       of each other, which caps padding waste at <50% before any
       sorting happens.
    2. ``shard = portable_hash(doc_id) % n_shards`` — each bucket is
       salted into ``n_shards`` deterministic sub-groups, so the
       within-group ``row_number`` window sorts ~|bucket|/n_shards
       rows per task instead of putting a whole bucket (there are only
       ~log2(max_len) of them!) in ONE task. Size ``n_shards`` to the
       cluster: at 100 TB this is the difference between a distributed
       sort and a straggler.
    3. ``batch_idx = (row_number within (bucket, shard) ordered by
       (n_tokens, doc_id) - 1) // batch_size`` — consecutive-length
       docs share a batch; the sole partial batch per (bucket, shard)
       is the sharding's waste cost.

    Returns (doc_id, n_tokens, bucket, shard, batch_idx); a batch is
    identified by (bucket, shard, batch_idx). Empty documents land in
    bucket 0.
    """
    from pyspark.sql.window import Window

    from bigdatalab_spark.functions import token_count

    if batch_size <= 0 or n_shards <= 0:
        raise ValueError("batch_size and n_shards must be positive")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(text_col).alias("n_tokens"),
    ).select(
        "doc_id",
        "n_tokens",
        F.ceil(F.log2(F.greatest(F.col("n_tokens"), F.lit(1)))).alias("bucket"),
        F.pmod(portable_hash(F.col("doc_id").cast("string")), F.lit(n_shards)).alias(
            "shard"
        ),
    )
    w = Window.partitionBy("bucket", "shard").orderBy("n_tokens", "doc_id")
    return base.withColumn(
        "batch_idx",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(batch_size)),
    )
