"""Unit tests for the second-wave pipeline operators: decontamination,
PII redaction, deterministic shuffle, domain mixing, BPE pair stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatalab_spark.scale.curation import deterministic_shuffle, domain_mix
from bigdatalab_spark.scale.decontam import cluster_split_leakage, ngram_contamination
from bigdatalab_spark.scale.pii import redact_pii


def test_ngram_contamination_flags_only_real_overlap(spark):
    docs = spark.createDataFrame(
        [
            # shares the 5-gram "a b c d e" with the test doc
            (1, "x y a b c d e z", "train"),
            # no 5-token window in common with any holdout doc
            (2, "p q r s t u v w", "train"),
            # too short for any 5-gram: can never be contaminated
            (3, "a b c d", "train"),
            (10, "a b c d e f g", "test"),
            (11, "m n o p q", "val"),
        ],
        "doc_id long, text string, split string",
    )
    out = ngram_contamination(docs, n=5).orderBy("doc_id").collect()
    assert [(r.doc_id, r.n_shared_ngrams) for r in out] == [(1, 1)]
    # boilerplate guard: an n-gram in >max_holdout_df holdout docs is ignored
    many = spark.createDataFrame(
        [(1, "a b c d e x", "train"), (10, "a b c d e", "test"), (11, "a b c d e", "val")],
        "doc_id long, text string, split string",
    )
    assert ngram_contamination(many, n=5, max_holdout_df=1).count() == 0
    assert ngram_contamination(many, n=5, max_holdout_df=2).count() == 1


def test_cluster_split_leakage_counts_holdout_members(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, cluster_id long",
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "val"), (4, "train"), (5, "train"), (6, "train")],
        "doc_id long, split string",
    )
    out = cluster_split_leakage(clusters, splits).orderBy("doc_id").collect()
    # cluster 1 leaks (one test + one val member); clusters 4 and 5 are
    # train-only, so docs 4-6 must NOT be flagged
    assert [(r.doc_id, r.cluster_id, r.n_holdout_in_cluster) for r in out] == [
        (1, 1, 2)
    ]


def test_redact_pii_exact_counts_and_text(spark):
    df = spark.createDataFrame(
        [
            (1, "mail alice.smith+x@corp.example.org now"),
            (2, "server at 192.168.1.250 rebooted"),
            (3, "call +1 555 0199 or 555-867-5309 today"),
            (4, "bob@a.io and carol@b.co from 10.0.0.1"),
            (5, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_phone) == (1, 0, 0)
    assert rows[1].redacted == "mail <EMAIL> now"
    assert rows[2].redacted == "server at <IP> rebooted"
    assert (rows[3].n_email, rows[3].n_ipv4, rows[3].n_phone) == (0, 0, 2)
    assert rows[3].redacted == "call <PHONE> or <PHONE> today"
    assert (rows[4].n_email, rows[4].n_ipv4, rows[4].n_phone) == (2, 1, 0)
    assert rows[4].redacted == "<EMAIL> and <EMAIL> from <IP>"
    assert rows[5].redacted == rows[5].text


def test_redact_pii_replacement_tokens_are_stable(spark):
    # an already-redacted text must pass through unchanged: replacement
    # tokens contain no digits or '@', so no pattern can re-match them
    df = spark.createDataFrame(
        [(1, "ping <EMAIL> from <IP> via <PHONE>")], "doc_id long, text string"
    )
    row = redact_pii(df).collect()[0]
    assert row.redacted == row.text
    assert (row.n_email, row.n_ipv4, row.n_phone) == (0, 0, 0)


def test_deterministic_shuffle_is_a_stable_permutation(spark):
    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = deterministic_shuffle(docs, "doc_id")
    pos = sorted(r.shuffle_pos for r in a.collect())
    assert pos == list(range(200))  # exact permutation, no gaps/dupes
    order_a = [r.doc_id for r in a.orderBy("shuffle_pos").collect()]
    order_b = [
        r.doc_id
        for r in deterministic_shuffle(docs, "doc_id").orderBy("shuffle_pos").collect()
    ]
    assert order_a == order_b  # reproducible across runs
    assert order_a != list(range(200))  # and actually shuffled
    order_c = [
        r.doc_id
        for r in deterministic_shuffle(docs, "doc_id", salt="epoch-2")
        .orderBy("shuffle_pos")
        .collect()
    ]
    assert order_c != order_a  # a new salt is a fresh permutation


def test_domain_mix_rates_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(400)],
        "doc_id long, lang string",
    )
    kept = domain_mix(docs, "lang", {"keep": 1.0, "drop": 0.0})
    langs = {r.lang for r in kept.select("lang").distinct().collect()}
    assert langs == {"keep"}  # rate 1.0 keeps all, rate 0.0 drops all
    assert kept.count() == 200
    half = domain_mix(docs, "lang", {"keep": 0.5, "drop": 0.5})
    n = half.count()
    assert 120 <= n <= 280  # ~200 expected over 400 rows
    assert half.count() == n  # deterministic: same plan, same sample
    # missing stratum falls back to default_rate=1.0
    other = domain_mix(docs, "lang", {"absent": 0.0})
    assert other.count() == 400


def test_word_pair_counts_exact(spark):
    from bigdatalab_spark.functions import tokenize, word_shingles

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], "doc_id long, text string"
    )
    pairs = (
        docs.select(tokenize("text").alias("toks"))
        .select(F.explode(word_shingles(F.col("toks"), 2)).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .collect()
    )
    assert [(r.pair, r.n) for r in pairs] == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_cdc_latest_by_key_newest_wins_with_tiebreak(spark):
    from pyspark.sql.window import Window

    log = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:00:00", "a"),
            (2, 100, "2024-01-02 00:00:00", "b"),  # newer ts wins
            (3, 200, "2024-01-01 00:00:00", "c"),
            (4, 200, "2024-01-01 00:00:00", "d"),  # same ts: higher event_id wins
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .orderBy("user_id")
        .collect()
    )
    assert [(r.user_id, r.event_id, r.event_type) for r in latest] == [
        (100, 2, "b"),
        (200, 4, "d"),
    ]


def test_stream_static_join_matches_batch_and_broadcasts(spark, sf_dir):
    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.streaming import run_stream_to_memory, stream_events
    from bigdatalab_spark.streaming.jobs import stream_static_join

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = stream_events(spark, sf_dir)
    agg = (
        stream_static_join(stream, dim, on="user_id", how="inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    run_stream_to_memory(agg, "t_stream_static", output_mode="complete")
    got = {
        r.c_mktsegment: r.n for r in spark.table("t_stream_static").collect()
    }
    expect = {
        r.c_mktsegment: r.n
        for r in load_table(spark, sf_dir, "events")
        .join(dim, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect and got  # same final state, non-empty


def test_incremental_dedup_statuses(spark):
    from bigdatalab_spark.scale.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "an entirely different corpus document about spark engines"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            # exact copy of corpus doc 0 (same normalized content)
            (11, "The  quick brown fox jumps over the lazy dog tonight"),
            # near-dup of corpus doc 0: one word changed
            (13, "the quick brown fox jumps over the lazy cat tonight"),
            # genuinely new
            (15, "completely unrelated text with no overlap whatsoever here"),
            # exact dup of an EARLIER batch doc (15): later id loses
            (17, "completely unrelated text with no overlap whatsoever here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in incremental_dedup(batch, corpus).collect()}
    assert out == {11: "exact_dup", 13: "near_dup", 15: "new", 17: "exact_dup"}


def test_domain_mix_samples_are_nested_across_rates(spark):
    # same salt => the kept set at a lower rate is a subset of the kept
    # set at a higher rate (thresholding one fixed hash), so mixture
    # weights can be tuned without resampling churn
    docs = spark.createDataFrame(
        [(i, "web") for i in range(300)], "doc_id long, lang string"
    )
    small = {r.doc_id for r in domain_mix(docs, "lang", {"web": 0.2}).collect()}
    large = {r.doc_id for r in domain_mix(docs, "lang", {"web": 0.6}).collect()}
    assert small <= large
    assert len(small) < len(large)


def test_new_operators_tolerate_degenerate_inputs(spark):
    from bigdatalab_spark.scale.dedup import incremental_dedup

    schema = "doc_id long, text string"
    empty = spark.createDataFrame([], schema)
    batch = spark.createDataFrame(
        [(1, "some brand new text here today"), (2, "some brand new text here today")],
        schema,
    )
    # empty corpus: nothing can be exact/near vs corpus; batch-internal
    # exact dup (doc 2) still caught
    out = {r.doc_id: r.status for r in incremental_dedup(batch, empty).collect()}
    assert out == {1: "new", 2: "exact_dup"}
    # empty batch: empty result, schema intact
    res = incremental_dedup(empty, batch)
    assert res.columns == ["doc_id", "status"] and res.count() == 0

    # no holdout docs at all: contamination result is empty, not an error
    train_only = spark.createDataFrame(
        [(1, "a b c d e f", "train")], "doc_id long, text string, split string"
    )
    assert ngram_contamination(train_only, n=5).count() == 0

    # empty frame through the shuffle keeps schema and yields no rows
    shuffled = deterministic_shuffle(spark.createDataFrame([], schema), "doc_id")
    assert shuffled.count() == 0 and "shuffle_pos" in shuffled.columns


def test_domain_mix_keeps_null_stratum_at_default_rate(spark):
    docs = spark.createDataFrame(
        [(1, "web"), (2, None), (3, None), (4, "web")], "doc_id long, lang string"
    )
    # NULL stratum is its own stratum at default_rate: 1.0 keeps all
    kept = domain_mix(docs, "lang", {"web": 0.0}, default_rate=1.0)
    assert {r.doc_id for r in kept.collect()} == {2, 3}
    # and default_rate=0.0 drops the NULLs while named rates still apply
    kept2 = domain_mix(docs, "lang", {"web": 1.0}, default_rate=0.0)
    assert {r.doc_id for r in kept2.collect()} == {1, 4}


def test_redact_pii_does_not_eat_dates_or_versions(spark):
    df = spark.createDataFrame(
        [
            (1, "released 2024-01-02 10:00:00 and 2020-2024 range"),
            (2, "build 20240102 id 123456789"),
            (3, "call 555-867-5309 or +44 20 7946 0958 maybe"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    # dates, year ranges, bare digit runs: NOT phones
    assert rows[1].redacted == rows[1].text and rows[1].n_phone == 0
    assert rows[2].redacted == rows[2].text and rows[2].n_phone == 0
    # real phone shapes still caught
    assert rows[3].n_phone >= 1 and "555-867-5309" not in rows[3].redacted


def test_simhash_banding_recall_is_exhaustive(spark, sf_dir):
    # pigeonhole guarantee: banded candidates must find EVERY pair with
    # hamming <= n_bands - 1; compare against the brute-force xor join
    from bigdatalab_spark.scale.dedup import simhash_near_dups, simhash_signatures
    from bigdatalab_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    banded = {
        (r.doc1, r.doc2) for r in simhash_near_dups(docs, max_hamming=3).collect()
    }
    sigs = simhash_signatures(docs)
    s1 = sigs.select(F.col("doc_id").alias("doc1"), F.col("simhash").alias("h1"))
    s2 = sigs.select(F.col("doc_id").alias("doc2"), F.col("simhash").alias("h2"))
    brute = {
        (r.doc1, r.doc2)
        for r in s1.crossJoin(s2)
        .filter("doc1 < doc2")
        .filter(F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))) <= 3)
        .collect()
    }
    assert banded == brute and brute  # exact recall, non-trivially

    with pytest.raises(ValueError):
        simhash_near_dups(docs, max_hamming=4, n_bands=4)


def test_redact_pii_is_idempotent_on_adversarial_battery(spark):
    battery = [
        (1, "mail alice.smith+x@corp.example.org now"),
        (2, "server at 192.168.1.250 rebooted 2024-01-02 10:00:00"),
        (3, "call +1 555 0199 or 555-867-5309 re 2020-2024"),
        (4, "bob@a.io x@y.zw 10.0.0.1 1.2.3.4.5 v1.2.3 20240102"),
    ]
    df = spark.createDataFrame(battery, "doc_id long, text string")
    once = redact_pii(df).select("doc_id", F.col("redacted").alias("text"))
    twice = redact_pii(once)
    diffs = twice.filter(F.col("redacted") != F.col("text")).count()
    assert diffs == 0  # a second pass changes nothing


def test_observe_quality_rides_the_existing_job(spark, sf_dir):
    from bigdatalab_spark.operators.observe import observe_quality
    from bigdatalab_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    observed, obs = observe_quality(orders, ["o_custkey"])
    kept = observed.filter("o_totalprice > 0").count()  # the one action
    m = obs.get
    assert m["n_rows"] == orders.count()  # observed BEFORE the filter
    assert m["n_null_o_custkey"] == 0
    assert m["n_distinct_o_custkey"] > 0
    assert kept > 0


def test_end_to_end_training_export_is_deterministic(spark, sf_dir, tmp_path):
    """Capstone: dedup -> quality filter -> split -> chunk -> pack ->
    epoch shuffle -> partitioned parquet export, run twice — identical
    rows both times (the property that makes a 100 TB run resumable and
    auditable)."""
    from bigdatalab_spark.scale.curation import deterministic_shuffle, hash_split
    from bigdatalab_spark.scale.dedup import exact_dedup_groups
    from bigdatalab_spark.scale.textqa import chunk_documents, quality_features
    from bigdatalab_spark.sources import load_table

    def build():
        docs = load_table(spark, sf_dir, "documents")
        keepers = docs.join(
            exact_dedup_groups(docs).select(F.col("keep_id").alias("doc_id")),
            "doc_id",
            "left_semi",
        )
        passed = keepers.join(
            quality_features(keepers)
            .filter("quality_score >= 0.4")
            .select("doc_id"),
            "doc_id",
            "left_semi",
        )
        chunks = chunk_documents(hash_split(passed, "doc_id"), 32, 8).join(
            hash_split(passed, "doc_id").select("doc_id", "split"), "doc_id"
        )
        return deterministic_shuffle(chunks, "doc_id").select(
            "doc_id", "chunk_id", "split", "chunk_text", "shuffle_pos"
        )

    a = {tuple(r) for r in build().collect()}
    b = {tuple(r) for r in build().collect()}
    assert a == b and a  # bitwise-identical corpus across runs

    out = str(tmp_path / "export")
    build().write.partitionBy("split").parquet(out)
    back = {
        tuple(r)
        for r in spark.read.parquet(out)
        .select("doc_id", "chunk_id", "split", "chunk_text", "shuffle_pos")
        .collect()
    }
    assert back == a  # export round-trips losslessly


def test_token_balanced_mix_caps_dominant_stratum(spark):
    from bigdatalab_spark.scale.curation import token_balanced_mix

    # 'big' holds ~10x the token mass of 'small'
    rows = [(i, "big", "w " * 100) for i in range(100)] + [
        (1000 + i, "small", "w " * 10) for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    kept = token_balanced_mix(docs, "lang")
    per = {
        r.lang: (r.thr, r.toks)
        for r in kept.groupBy("lang")
        .agg(F.first("threshold").alias("thr"), F.sum("n_tokens").alias("toks"))
        .collect()
    }
    assert per["small"][0] == 10000  # rare stratum keeps 100%
    assert per["small"][1] == 1000
    assert per["big"][0] < 10000  # dominant stratum is rate-capped...
    # ...to roughly the equal token share (5500 of 11000), hash noise aside
    assert 3000 <= per["big"][1] <= 8000
    # deterministic
    assert kept.count() == token_balanced_mix(docs, "lang").count()


def test_lm_surprise_orders_prose_before_gibberish(spark):
    from bigdatalab_spark.scale.lm import lm_surprise_scores, train_trigram_model

    # reference slice: repetitive natural-ish prose — trigrams repeat
    prose = "the cat sat on the mat and the dog sat on the rug"
    reference = spark.createDataFrame(
        [(i, prose) for i in range(8)], "doc_id long, text string"
    )
    tri, ctx, vocab = train_trigram_model(reference)
    scored_docs = spark.createDataFrame(
        [
            (100, "the cat sat on the mat"),       # in-distribution prose
            (101, "mat rug dog zzz qqq the on"),   # token soup, unseen trigrams
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.bits_per_token
        for r in lm_surprise_scores(scored_docs, tri, ctx, vocab).collect()
    }
    assert out[100] < out[101]
    # in-distribution prose scores low in absolute terms too (< uniform)
    v = vocab.collect()[0].v
    import math

    assert out[100] < math.log2(v)


def test_lm_surprise_exact_integer_arithmetic(spark):
    """The fixed-point surprise must match 8*log2 within 1.5 eighth-bits
    per token and sum exactly (bigint, no float accumulation)."""
    import math

    from bigdatalab_spark.scale.lm import lm_surprise_scores, train_trigram_model

    reference = spark.createDataFrame(
        [(1, "a b c a b c a b d")], "doc_id long, text string"
    )
    tri, ctx, vocab = train_trigram_model(reference)
    row = (
        lm_surprise_scores(reference, tri, ctx, vocab).collect()[0]
    )
    # replay the model in python: tokens a b c a b c a b d
    toks = "a b c a b c a b d".split()
    grams = [tuple(toks[i : i + 3]) for i in range(len(toks) - 2)]
    from collections import Counter

    c3 = Counter(grams)
    c2 = Counter(g[:2] for g in grams)
    v = 4
    total = 0
    for g in grams:
        q = ((c2[g[:2]] + v) * (1 << 20)) // (c3[g] + 1)
        msb = q.bit_length() - 1
        s = 8 * msb + ((q * 8) >> msb) - 8 - 160
        total += s
        assert abs(s - 8 * math.log2((c2[g[:2]] + v) / (c3[g] + 1))) <= 1.5
    assert row.surprise_eighth_bits == total
    assert row.n_trigrams == len(grams)
    assert row.bits_per_token == total / (8 * len(grams))


def test_quality_classifier_heldout_auc(spark):
    """The TF-IDF + LR classifier must recover the heuristic labels on
    held-out documents (AUC gate) — proves the ml-pipeline plumbing end
    to end, not train fit."""
    from bigdatalab_spark.scale.curation import hash_split
    from bigdatalab_spark.scale.quality_ml import (
        label_documents,
        score_documents,
        train_quality_classifier,
    )
    from bigdatalab_spark.sources import load_table

    docs = hash_split(
        load_table(spark, "/root/testdata/sf0.01", "documents"), "doc_id"
    )
    train = docs.filter(F.col("split") == "train")
    holdout = docs.filter(F.col("split") != "train")
    model = train_quality_classifier(train)
    scored = score_documents(model, holdout).join(
        label_documents(holdout).select("doc_id", "label"), "doc_id"
    )
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    auc = BinaryClassificationEvaluator(
        rawPredictionCol="p_good", labelCol="label"
    ).evaluate(scored.withColumn("p_good", F.col("p_good").cast("double")))
    assert auc >= 0.80, f"held-out AUC {auc:.3f} below gate"
    # scoring output contract
    row = scored.first()
    assert 0.0 <= row.p_good <= 1.0 and row.prediction in (0.0, 1.0)


def test_contamination_report_ranks_and_guards(spark):
    from bigdatalab_spark.scale.decontam import contamination_report

    docs = spark.createDataFrame(
        [
            # train 1 shares two 5-grams with holdout 10; train 2 shares one
            (1, "a b c d e f g", "train"),
            (2, "x a b c d e", "train"),
            (3, "no overlap here at all", "train"),
            (10, "a b c d e f g", "val"),
        ],
        "doc_id long, text string, split string",
    )
    out = [
        (r.doc_id, r.train_doc_id, r.n_shared_ngrams, r.rank)
        for r in contamination_report(docs, n=5, k=2).orderBy("doc_id", "rank").collect()
    ]
    # doc 10 contains 5-grams {abcde, bcdef, cdefg}; train 1 shares all 3,
    # train 2 shares only abcde
    assert out == [(10, 1, 3, 1), (10, 2, 1, 2)]
    # boilerplate guard: with max_train_df=1 the 5-gram "a b c d e"
    # (present in 2 train docs) is dropped; train 1 keeps its other grams
    guarded = [
        (r.train_doc_id, r.n_shared_ngrams)
        for r in contamination_report(docs, n=5, k=2, max_train_df=1).collect()
    ]
    assert guarded == [(1, 2)]


def test_incremental_agg_merge_equals_full_recompute(spark, sf_dir):
    """The merged (history + batch) aggregate must equal aggregating all
    events from scratch — the algebraic property incremental view
    maintenance depends on."""
    from bigdatalab_spark.queries import REGISTRY
    from bigdatalab_spark.sources import load_table

    merged = {
        (r["user_id"], r["day"]): (r["n_events"], r["sum_value"])
        for r in REGISTRY["incremental_agg_merge"].fn(spark, sf_dir).collect()
    }
    full = {
        (r["user_id"], r["day"]): (r["n_events"], r["sum_value"])
        for r in (
            load_table(spark, sf_dir, "events")
            .groupBy("user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
            )
            .collect()
        )
    }
    assert set(merged) == set(full)
    for k in merged:
        assert merged[k][0] == full[k][0]
        assert merged[k][1] == pytest.approx(full[k][1], rel=1e-12)


def test_temperature_mix_flattens_toward_rare_strata(spark):
    """alpha=0.5 rebalancing: the rarest stratum keeps everything
    (threshold = full bucket range), the dominant stratum is
    downsampled, and kept shares are strictly flatter than input
    shares. Deterministic across runs."""
    from bigdatalab_spark.scale.curation import SPLIT_BUCKETS, temperature_mix

    rows = (
        [(f"a{i}", "common") for i in range(900)]
        + [(f"b{i}", "mid") for i in range(100)]
        + [(f"c{i}", "rare") for i in range(25)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = temperature_mix(df, "lang")
    by = {r["lang"]: r for r in kept.groupBy("lang").agg(
        F.max("mix_threshold").alias("thr"), F.count(F.lit(1)).alias("n")
    ).collect()}
    # rarest stratum: rate 1.0 -> keeps all 25 rows
    assert by["rare"]["thr"] == SPLIT_BUCKETS
    assert by["rare"]["n"] == 25
    # thresholds follow sqrt(n_min/n_i): common < mid < rare
    assert by["common"]["thr"] < by["mid"]["thr"] < by["rare"]["thr"]
    # expected keep rates sqrt(25/900)=1/6, sqrt(25/100)=1/2 — the kept
    # ratio common:rare shrinks from 36:1 toward sqrt-flattened ~6:1
    assert by["common"]["n"] / by["rare"]["n"] < 12
    # deterministic: second run identical
    again = {r["lang"]: r["n"] for r in temperature_mix(df, "lang")
             .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == {k: v["n"] for k, v in by.items()}


def test_weighted_median_exact_ties_and_partition_invariance(spark):
    """The GROUPED_AGG weighted median returns the lower weighted
    median as an existing value, is tie-stable, and does not depend on
    partitioning (integer crossing arithmetic)."""
    from bigdatalab_spark.functions.pandas_aggs import weighted_median_agg

    rows = [
        # group a: weights 1,1,1,5 -> total 8, crossing at cum>=4 -> v=30
        ("a", 10.0, 1.0), ("a", 20.0, 1.0), ("a", 30.0, 5.0), ("a", 40.0, 1.0),
        # group b: tied values straddle the crossing -> the tied value
        ("b", 1.0, 2.0), ("b", 2.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 2.0),
    ]
    for parts in (1, 7):
        df = spark.createDataFrame(rows, ["g", "v", "w"]).repartition(parts)
        got = {
            r["g"]: r["m"]
            for r in df.groupBy("g")
            .agg(weighted_median_agg("v", "w").alias("m"))
            .collect()
        }
        assert got == {"a": 30.0, "b": 2.0}, got


def test_importance_sample_weights_inclusion_probability(spark):
    """Keep rate tracks the weight: the max-weight row is always kept,
    zero-weight rows never, and heavier strata keep a larger share.
    Deterministic across runs."""
    from bigdatalab_spark.scale.curation import importance_sample

    rows = (
        [(f"h{i}", 100) for i in range(200)]   # weight == max -> all kept
        + [(f"m{i}", 25) for i in range(200)]  # ~25% kept
        + [(f"z{i}", 0) for i in range(50)]    # never kept
    )
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    kept = importance_sample(df, "w").collect()
    by_prefix = {}
    for r in kept:
        by_prefix.setdefault(r["doc_id"][0], 0)
        by_prefix[r["doc_id"][0]] += 1
    assert by_prefix.get("h") == 200          # threshold 10000 keeps all
    assert by_prefix.get("z") is None         # weight 0 -> dropped
    assert 20 <= by_prefix.get("m", 0) <= 80  # ~50 expected at rate 1/4
    again = importance_sample(df, "w").count()
    assert again == len(kept)


def test_robust_outliers_finds_planted_extremes_and_survives_corruption(spark):
    """MAD-based z-scores flag planted extremes, and — the robustness
    claim — the threshold is NOT dragged by the outliers themselves:
    classic mean/std z-scores with 10% gross corruption miss the
    moderate outlier that the robust score still catches."""
    from bigdatalab_spark.scale.curation import robust_outliers

    base = [("a", float(v)) for v in range(1, 101)]          # 1..100
    planted = [("a", 10_000.0)] * 10 + [("a", 500.0)]        # gross + moderate
    df = spark.createDataFrame(base + planted, ["g", "v"])
    out = robust_outliers(df, "v", "g")
    flagged = {r["v"] for r in out.filter("is_outlier").collect()}
    assert 10_000.0 in flagged and 500.0 in flagged
    assert not any(v <= 100 for v in flagged)
    # mean/std comparison: std inflated by the 10k cluster hides 500
    from pyspark.sql import functions as F2

    stats = df.groupBy("g").agg(
        F2.avg("v").alias("mu"), F2.stddev_pop("v").alias("sd")
    ).collect()[0]
    assert abs((500.0 - stats["mu"]) / stats["sd"]) < 3.5  # classic misses it
    # constant group: mad=0 path scores 0, never divides by zero
    const = spark.createDataFrame([("c", 5.0)] * 20, ["g", "v"])
    got = robust_outliers(const, "v", "g").select("robust_z").distinct().collect()
    assert [r["robust_z"] for r in got] == [0.0]


def test_pagerank_hub_ranks_highest_and_mass_conserves(spark):
    """A star graph's hub must out-rank every leaf; total rank mass
    stays ~1 (bidirectional edges, no dangling loss); repeat runs are
    identical (decimal-exact accumulation)."""
    from bigdatalab_spark.scale.graph import bipartite_edges, pagerank

    # one supplier serving 10 customers + an isolated 1-1 pair
    pairs = [(c, 1) for c in range(10)] + [(99, 7)]
    df = spark.createDataFrame(pairs, ["cust", "supp"])
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(bipartite_edges(df, "cust", "supp")).collect()
    }
    hub = ranks["r:1"]
    assert all(hub > v for k, v in ranks.items() if k != "r:1")
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    again = {
        r["node"]: r["rank"]
        for r in pagerank(bipartite_edges(df, "cust", "supp")).collect()
    }
    assert again == ranks


def test_triangle_count_known_graphs(spark):
    """K4 has 4 triangles; removing one edge leaves 2; a star has 0.
    Duplicate/reversed input pairs must not change the census."""
    from bigdatalab_spark.scale.graph import triangle_count

    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    noisy = k4 + [(j, i) for i, j in k4] + k4  # reversed + repeated
    row = triangle_count(spark.createDataFrame(noisy, ["a", "b"])).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 6, 4)

    broken = [e for e in k4 if e != (0, 1)]
    row = triangle_count(spark.createDataFrame(broken, ["a", "b"])).collect()[0]
    assert row["n_triangles"] == 2

    star = [(0, i) for i in range(1, 8)]
    row = triangle_count(spark.createDataFrame(star, ["a", "b"])).collect()[0]
    assert row["n_triangles"] == 0 and row["n_wedges"] == 0


def test_interval_overlap_join_exact_pairs_no_cartesian(spark):
    """Every overlapping pair appears exactly once (even when the pair
    shares many bins), non-overlaps never, touching endpoints follow
    half-open semantics — and the plan contains no cartesian/nested
    loop."""
    from bigdatalab_spark.operators.rangejoin import bin_interval_overlap_join

    left = spark.createDataFrame(
        [("L1", 0, 100), ("L2", 50, 60), ("L3", 200, 210), ("L4", 300, 300)],
        ["lid", "llo", "lhi"],
    )
    right = spark.createDataFrame(
        [("R1", 90, 205), ("R2", 100, 150), ("R3", 0, 1000)],
        ["rid", "rlo", "rhi"],
    )
    out = bin_interval_overlap_join(left, right, "llo", "lhi", "rlo", "rhi", 10)
    pairs = {(r["lid"], r["rid"]) for r in out.collect()}
    # L1 x R1 overlap; L1 x R2 touch at 100 -> half-open, NO overlap;
    # L3 x R1 overlap (many shared bins -> still one row); L4 is empty;
    # R3 spans everything -> overlaps L1, L2, L3
    assert pairs == {
        ("L1", "R1"), ("L3", "R1"), ("L1", "R3"), ("L2", "R3"), ("L3", "R3"),
    }
    assert out.count() == len(pairs)  # exactly one row per pair
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_als_recovers_planted_block_preferences(spark):
    """Two disjoint customer blocks buy exclusively from disjoint
    supplier blocks; ALS factor recommendations must keep >=90% of
    top-1 picks inside the customer's own block. Seeded — re-train on
    the same data gives the same recommendations."""
    from bigdatalab_spark.scale.recsys import train_als

    rows = []
    for c in range(20):            # block A: customers 0-19, suppliers 0-4
        for s in range(5):
            rows.append((c, s, 5))
    for c in range(20, 40):        # block B: customers 20-39, suppliers 10-14
        for s in range(10, 15):
            rows.append((c, s, 5))
    inter = spark.createDataFrame(rows, ["o_custkey", "l_suppkey", "cnt"])
    model = train_als(inter, rank=4, max_iter=10)
    top1 = {
        r["o_custkey"]: r["recommendations"][0]["l_suppkey"]
        for r in model.recommendForAllUsers(1).collect()
    }
    in_block = sum(
        1
        for c, s in top1.items()
        if (c < 20 and s < 5) or (c >= 20 and s >= 10)
    )
    assert in_block >= 0.9 * len(top1), (in_block, len(top1))

    again = {
        r["o_custkey"]: r["recommendations"][0]["l_suppkey"]
        for r in train_als(inter, rank=4, max_iter=10)
        .recommendForAllUsers(1)
        .collect()
    }
    assert again == top1


def test_hand_built_lsh_agrees_with_spark_ml_minhashlsh(spark):
    """Cross-validation against the in-box implementation: on a corpus
    of planted near-dup pairs plus unrelated docs, the hand-built
    MinHash+LSH candidate generator and pyspark.ml's MinHashLSH
    approxSimilarityJoin must BOTH recover >=90% of planted pairs, and
    neither may pair unrelated docs."""
    import random

    from pyspark.ml.feature import HashingTF, MinHashLSH

    from bigdatalab_spark.functions import tokenize, word_shingles
    from bigdatalab_spark.scale.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(500)]
    rows, planted = [], set()
    for i in range(30):
        words = [rng.choice(vocab) for _ in range(40)]
        rows.append((f"base{i}", " ".join(words)))
        variant = list(words)
        variant[20] = rng.choice(vocab)  # one-word edit -> Jaccard ~0.9
        rows.append((f"var{i}", " ".join(variant)))
        planted.add((f"base{i}", f"var{i}"))
    for i in range(40):
        rows.append(
            (f"rand{i}", " ".join(rng.choice(vocab) for _ in range(40)))
        )
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    ours = {
        tuple(sorted((r["doc1"], r["doc2"])))
        for r in lsh_candidate_pairs(
            minhash_signatures(doc_shingles(docs))
        ).collect()
    }
    our_recall = len(ours & planted) / len(planted)
    assert our_recall >= 0.9, our_recall
    assert not any("rand" in a and "rand" in b for a, b in ours), (
        "unrelated docs paired"
    )

    shingled = docs.select(
        "doc_id",
        F.array_distinct(word_shingles(tokenize("text"), 3)).alias("sh"),
    )
    feats = HashingTF(
        inputCol="sh", outputCol="features", binary=True, numFeatures=1 << 18
    ).transform(shingled)
    lsh_model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=7
    ).fit(feats)
    joined = lsh_model.approxSimilarityJoin(feats, feats, 0.5, distCol="jacc")
    theirs = {
        tuple(
            sorted(
                (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"])
            )
        )
        for r in joined.filter("datasetA.doc_id < datasetB.doc_id").collect()
    }
    their_recall = len(theirs & planted) / len(planted)
    assert their_recall >= 0.9, their_recall
    # the sets agree on what matters: planted pairs found by both
    assert len(ours & theirs & planted) >= 0.85 * len(planted)


def test_dedup_index_roundtrip_serves_bit_identical(spark, sf_dir, tmp_path):
    """The durable signature store (round-8 headline): building a
    save_dedup_index from the corpus and serving a batch against it
    must classify BIT-identically to the self-contained
    incremental_dedup — on real documents, with every status class
    exercised (batch rows engineered to hit exact/near/new)."""
    from bigdatalab_spark.scale.dedup import (
        incremental_dedup,
        incremental_dedup_from_index,
        save_dedup_index,
    )
    from bigdatalab_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    # batch: real new docs + an exact corpus copy + a near-dup (text
    # perturbed by one appended word) — ids disjoint from the corpus
    base = docs.filter(F.col("doc_id") % 3 == 0).limit(20)
    seed = corpus.limit(2).collect()
    extra = spark.createDataFrame(
        [
            (10_000_001, seed[0]["text"]),                 # exact dup
            (10_000_002, seed[1]["text"] + " perturbed"),  # near dup
        ],
        "doc_id long, text string",
    )
    batch = base.select("doc_id", "text").unionByName(extra)

    idx = str(tmp_path / "dedup_idx")
    meta = save_dedup_index(corpus, idx)
    assert meta["format"] == "dedup-index/2" and meta["n"] == 3

    live = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(batch, corpus).collect()
    }
    served = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_from_index(spark, batch, idx).collect()
    }
    assert served == live
    assert served[10_000_001] == "exact_dup"
    assert served[10_000_002] == "near_dup"
    assert "new" in served.values()


def test_dedup_index_serve_never_reads_corpus_text(spark, sf_dir, tmp_path):
    """The index's 100 TB contract: serving reads band rows, shingles
    and hashes from the index — the corpus TEXT column is never
    scanned (daily cost ∝ batch, not corpus re-shingling). The batch
    here is in-memory, so ANY file scan whose ReadSchema contains
    'text' would be a corpus read — assert there is none, and that the
    corpus parquet path itself never appears in the plan."""
    from bigdatalab_spark.scale.dedup import (
        incremental_dedup_from_index,
        save_dedup_index,
    )
    from bigdatalab_spark.sources import load_table

    corpus = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "dedup_idx")
    save_dedup_index(corpus, idx)
    # the batch must generate ≥1 candidate (a perturbed corpus doc) —
    # with zero candidates Catalyst folds the empty shard filter away
    # and eliminates the shingle scan entirely, leaving nothing to
    # assert pruning on
    seed_text = corpus.sort("doc_id").limit(1).collect()[0]["text"]
    batch = spark.createDataFrame(
        [
            (10_000_001, "a brand new probe document for the plan test"),
            (10_000_002, (seed_text or "") + " perturbed"),
        ],
        "doc_id long, text string",
    )
    out = incremental_dedup_from_index(spark, batch, idx)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan, plan[:3000]
    import re

    for m in re.finditer(r"ReadSchema: ([^\n]+)", plan):
        assert "text" not in m.group(1), m.group(1)
    # the shingle-store scan must carry the literal shard partition
    # filter (static pruning to the candidate docs' shards) — without
    # it the verify stage reads all n_shards directories every day
    assert re.search(r"PartitionFilters: \[shard#\d+ IN \(", plan), plan[:3000]
    got = {r["doc_id"]: r["status"] for r in out.collect()}
    assert got[10_000_001] == "new" and got[10_000_002] == "near_dup"


def test_dedup_index_load_refuses_incomplete_or_foreign(spark, tmp_path):
    """meta.json is the commit marker (written last, atomic install):
    a missing, corrupt, or version-mismatched meta refuses loudly."""
    import json
    import os

    import pytest

    from bigdatalab_spark.scale.dedup import load_dedup_index, save_dedup_index

    # never built
    with pytest.raises(FileNotFoundError, match="meta.json missing"):
        load_dedup_index(spark, str(tmp_path / "nowhere"))

    corpus = spark.createDataFrame(
        [(1, "one corpus document of several words here")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    save_dedup_index(corpus, idx)
    meta_path = os.path.join(idx, "meta.json")

    # corrupt payload
    with open(meta_path, "w", encoding="utf-8") as fh:
        fh.write("{not json")
    with pytest.raises(ValueError, match="corrupt dedup index meta"):
        load_dedup_index(spark, idx)

    # foreign/stale format
    with open(meta_path, "w", encoding="utf-8") as fh:
        json.dump({"format": "dedup-index/0", "n": 3}, fh)
    with pytest.raises(ValueError, match="rebuild with save_dedup_index"):
        load_dedup_index(spark, idx)


def test_dedup_index_append_completes_the_daily_cycle(spark, sf_dir, tmp_path):
    """The daily-ingest loop: classify a batch against the index, fold
    its 'new' docs in with append_to_dedup_index, and (a) a re-serve of
    the same content now reports duplicates, (b) serving a THIRD batch
    against the appended index is bit-identical to serving against a
    full rebuild over corpus ∪ batch (cap never binds here — the
    documented exactness regime), (c) the store stays load-valid."""
    from bigdatalab_spark.scale.dedup import (
        append_to_dedup_index,
        incremental_dedup_from_index,
        load_dedup_index,
        save_dedup_index,
    )
    from bigdatalab_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0).limit(15)

    idx = str(tmp_path / "idx")
    save_dedup_index(corpus, idx)

    day1 = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_from_index(spark, batch, idx).collect()
    }
    new_ids = [i for i, s in day1.items() if s == "new"]
    assert new_ids, "fixture produced no new docs; widen the batch"
    new_docs = batch.filter(F.col("doc_id").isin(new_ids))
    append_to_dedup_index(new_docs, idx)

    # (a) the same content under fresh ids is now an exact dup
    reprobe = spark.createDataFrame(
        [
            (20_000_000 + i, r["text"])
            for i, r in enumerate(new_docs.collect())
        ],
        "doc_id long, text string",
    )
    day2 = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_from_index(spark, reprobe, idx).collect()
    }
    assert set(day2.values()) == {"exact_dup"}, day2

    # (b) appended index == full rebuild for an unrelated third batch
    seed = corpus.sort("doc_id").limit(2).collect()
    batch3 = spark.createDataFrame(
        [
            (30_000_001, seed[0]["text"]),
            (30_000_002, (seed[1]["text"] or "") + " perturbed again"),
            (30_000_003, "yet another wholly new document body"),
        ],
        "doc_id long, text string",
    )
    rebuilt = str(tmp_path / "rebuilt")
    save_dedup_index(corpus.unionByName(new_docs), rebuilt)
    got_append = sorted(
        (r["doc_id"], r["status"])
        for r in incremental_dedup_from_index(spark, batch3, idx).collect()
    )
    got_rebuild = sorted(
        (r["doc_id"], r["status"])
        for r in incremental_dedup_from_index(spark, batch3, rebuilt).collect()
    )
    assert got_append == got_rebuild

    # (c) stores stay consistent: distinct hashes, sizes keyed once
    hashes, bands, shingles, sizes, meta = load_dedup_index(spark, idx)
    assert hashes.count() == hashes.distinct().count()
    assert sizes.count() == sizes.select("doc_id").distinct().count()
    assert meta["format"] == "dedup-index/2"


@pytest.mark.slow
def test_dedup_index_compaction_layout_only_and_crash_recoverable(
    spark, sf_dir, tmp_path
):
    """compact_dedup_index is the maintenance half of the streaming
    ingest loop: appends fragment the four stores one file set per
    batch; compaction collapses the file count while (a) serving
    BIT-identically, (b) keeping the shard partition-pruning contract
    in the plan, and (c) recovering a crash that died mid-pointer-flip
    simply by being re-run."""
    import glob
    import os

    import pytest

    from bigdatalab_spark.scale.dedup import (
        append_to_dedup_index,
        compact_dedup_index,
        incremental_dedup_from_index,
        save_dedup_index,
    )
    from bigdatalab_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = str(tmp_path / "idx")
    save_dedup_index(docs.filter(F.col("doc_id") % 3 == 0), idx)
    # three daily appends, each leaving its own file set in every store
    for k in (1, 2):
        for half in (0, 1):
            append_to_dedup_index(
                docs.filter(
                    (F.col("doc_id") % 3 == k)
                    & (F.col("doc_id") % 2 == half)
                ),
                idx,
            )

    def n_files(store: str) -> int:
        return len(glob.glob(f"{idx}/{store}/**/*.parquet", recursive=True))

    seed = docs.sort("doc_id").limit(1).collect()[0]["text"]
    probe = spark.createDataFrame(
        [
            (40_000_001, seed),                      # exact dup
            (40_000_002, (seed or "") + " tail"),    # near dup
            (40_000_003, "an entirely novel probe document body"),
        ],
        "doc_id long, text string",
    )
    before_files = {s: n_files(s) for s in ("bands", "shingles", "sizes", "hashes")}
    before = sorted(
        (r["doc_id"], r["status"])
        for r in incremental_dedup_from_index(spark, probe, idx).collect()
    )

    stats = compact_dedup_index(spark, idx, max_records_per_file=5_000_000)
    after_files = {s: n_files(s) for s in ("bands", "shingles", "sizes", "hashes")}
    # every store shrank (4 write rounds × up-to-32 shuffle files each)
    for s in ("bands", "shingles", "sizes", "hashes"):
        assert after_files[s] < before_files[s], (s, before_files, after_files)
        assert stats[s]["files_after"] == after_files[s]
    assert after_files["sizes"] == 1 and after_files["hashes"] == 1

    out = incremental_dedup_from_index(spark, probe, idx)
    assert sorted((r["doc_id"], r["status"]) for r in out.collect()) == before
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"PartitionFilters: \[shard#\d+ IN \(", plan), plan[:3000]

    # crash mid-flip: sizes renamed aside, path missing — load refuses
    # loudly, and a re-run of compaction resumes the flip
    os.rename(f"{idx}/sizes", f"{idx}/sizes__compact_old")
    with pytest.raises(Exception):
        incremental_dedup_from_index(spark, probe, idx).collect()
    compact_dedup_index(spark, idx, max_records_per_file=5_000_000)
    assert os.path.exists(f"{idx}/sizes")
    assert not os.path.exists(f"{idx}/sizes__compact_old")
    out2 = sorted(
        (r["doc_id"], r["status"])
        for r in incremental_dedup_from_index(spark, probe, idx).collect()
    )
    assert out2 == before


def test_dedup_index_forget_semantics_per_copy(spark, tmp_path):
    """remove_from_dedup_index retracts exactly ONE document's
    contribution (the v2 per-doc hash rows make this precise): with two
    corpus copies of the same content, forgetting one still matches a
    re-submitted copy as exact_dup; forgetting both re-admits it as
    new. A near-dup of forgotten content re-admits too."""
    from bigdatalab_spark.scale.dedup import (
        incremental_dedup_from_index,
        remove_from_dedup_index,
        save_dedup_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # second copy of the same content
            (3, "completely different text about spark partitions and shuffles"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (101, base),                    # exact copy of forgotten content
            (102, base + " perturbed"),     # near-dup of forgotten content
            (103, "unrelated new document entirely on its own"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    save_dedup_index(corpus, idx, max_bucket_size=None)

    def classify():
        return {
            r["doc_id"]: r["status"]
            for r in incremental_dedup_from_index(spark, batch, idx).collect()
        }

    before = classify()
    assert before[101] == "exact_dup" and before[102] == "near_dup"
    assert before[103] == "new"

    # forget ONE copy: the surviving copy keeps matching both probes
    assert remove_from_dedup_index(
        spark.createDataFrame([(1,)], "doc_id long"), idx
    ) == 1
    after_one = classify()
    assert after_one == before

    # forget the second copy too: the content is gone from the index
    remove_from_dedup_index(spark.createDataFrame([(2,)], "doc_id long"), idx)
    after_both = classify()
    assert after_both[101] == "new" and after_both[102] == "new"
    assert after_both[103] == "new"

    # idempotent: re-removing writes nothing
    assert remove_from_dedup_index(
        spark.createDataFrame([(1,), (2,)], "doc_id long"), idx
    ) == 0


def test_dedup_index_purge_is_physical_and_interrupt_safe(
    spark, sf_dir, tmp_path
):
    """purge_dedup_tombstones physically reclaims tombstoned rows from
    every store (serve stays BIT-identical, tombstones empty after),
    and — the deletion-vector property — an interrupted purge serves
    correctly at EVERY store boundary: purged stores lost only
    invisible rows, unpurged stores are still load-filtered."""
    import glob

    from bigdatalab_spark.scale.dedup import (
        incremental_dedup_from_index,
        load_dedup_index,
        purge_dedup_tombstones,
        remove_from_dedup_index,
        save_dedup_index,
    )
    from bigdatalab_spark.sources import load_table
    from bigdatalab_spark.sources.sinks import _compact_partitions_locked

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(60)
    idx = str(tmp_path / "idx")
    save_dedup_index(corpus, idx)
    dead = corpus.filter(F.col("doc_id") % 10 == 4).select("doc_id")
    n_dead = dead.count()
    assert remove_from_dedup_index(dead, idx) == n_dead

    def serve():
        return sorted(
            (r["doc_id"], r["status"])
            for r in incremental_dedup_from_index(spark, batch, idx).collect()
        )

    logical = serve()

    # simulate a purge interrupted after ONE store (bands purged via the
    # same transform+flip the real purge uses, everything else untouched)
    tomb = spark.read.parquet(f"{idx}/tombstones")
    _compact_partitions_locked(
        spark, f"{idx}/bands", ("band",), 5_000_000,
        transform=lambda df: df.join(tomb, "doc_id", "left_anti"),
    )
    assert serve() == logical  # mixed state serves identically

    stats = purge_dedup_tombstones(spark, idx)
    assert stats["n_purged_docs"] == n_dead
    assert serve() == logical  # full purge is invisible to the answer

    # physical: no dead rows anywhere, tombstones empty
    dead_ids = {r["doc_id"] for r in dead.collect()}
    hashes, bands, shingles, sizes, _ = load_dedup_index(spark, idx)
    for frame in (hashes, bands, shingles, sizes):
        got = {r["doc_id"] for r in frame.select("doc_id").distinct().collect()}
        assert not (got & dead_ids)
    assert spark.read.parquet(f"{idx}/tombstones").count() == 0

    # re-running a completed purge is a no-op that keeps serving
    stats2 = purge_dedup_tombstones(spark, idx)
    assert stats2["n_purged_docs"] == 0
    assert serve() == logical

    # shard pruning contract survives the purge (partitioned rewrite
    # kept the partition scheme)
    import re

    plan = (
        incremental_dedup_from_index(spark, batch, idx)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"PartitionFilters: \[shard#\d+ IN \(", plan), plan[:3000]
    assert glob.glob(f"{idx}/shingles/shard=*")


def test_purge_resumes_after_crash_mid_tombstones_flip(spark, tmp_path):
    """A purge that died between the tombstone store's two renames
    leaves the store path missing with __compact_old holding the only
    copy. Re-running purge (or a remove) must RESUME that flip before
    its own top-level read of the store — a crashed maintenance job
    must not leave the next one failing at read time."""
    import os

    from bigdatalab_spark.scale.dedup import (
        incremental_dedup_from_index,
        purge_dedup_tombstones,
        remove_from_dedup_index,
        save_dedup_index,
    )

    corpus = spark.createDataFrame(
        [(i, f"document body number {i} with words") for i in range(20)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    save_dedup_index(corpus, idx, max_bucket_size=None)
    remove_from_dedup_index(
        spark.createDataFrame([(3,), (7,)], "doc_id long"), idx
    )

    # simulate the mid-flip crash
    os.rename(f"{idx}/tombstones", f"{idx}/tombstones__compact_old")

    stats = purge_dedup_tombstones(spark, idx)
    assert stats["n_purged_docs"] == 2  # the flip was resumed, not lost
    assert os.path.exists(f"{idx}/tombstones")
    assert not os.path.exists(f"{idx}/tombstones__compact_old")
    assert spark.read.parquet(f"{idx}/tombstones").count() == 0

    batch = spark.createDataFrame(
        [(100, "document body number 3 with words")], "doc_id long, text string"
    )
    got = incremental_dedup_from_index(spark, batch, idx).collect()
    assert got[0]["status"] == "new"  # doc 3 stayed forgotten

    # remove after a simulated crash also resumes instead of failing
    os.rename(f"{idx}/tombstones", f"{idx}/tombstones__compact_old")
    assert remove_from_dedup_index(
        spark.createDataFrame([(5,)], "doc_id long"), idx
    ) == 1
    assert spark.read.parquet(f"{idx}/tombstones").count() == 1
