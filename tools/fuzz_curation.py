"""Metamorphic fuzzing for the curation operators.

The SQL-grammar differential campaign (tools/fuzz_oracle.py, 3200
seeds) gates the relational surface; the LLM-pipeline curation
operators were gated only by fixed oracles. This tool adds seeded
METAMORPHIC properties — statements that must hold for ANY corpus, so
random corpora probe the operators where fixed fixtures cannot:

- P1 split-invariance: hash_split assignments are a pure function of
  the key — invariant under row permutation AND partition count, with
  group-keyed splits keeping every row of a key together.
- P2 mix-monotonicity: domain_mix keeps a subset of its input,
  invariant under repartitioning, and raising a stratum's rate can
  only GROW its kept set (same hash, higher threshold).
- P3 duplication-monotonicity + idempotence: injecting copies of
  existing docs (at fresh higher ids) never changes the dedup groups,
  keepers, or kept count; deduping the keepers keeps everything.
- P4 shuffle-permutation: deterministic_shuffle emits exactly the
  positions 0..n-1, identically under any input order/partitioning;
  a different salt draws a different permutation.
- P5 pack-soundness: pack_sequences preserves the chunk multiset, is
  partition-count invariant, never exceeds the token budget within a
  (doc, seq) (chunks here are smaller than the budget), and seq_ids
  start at 0 and step by at most 1 in chunk order.
- P6 chunk-reconstruction: with overlap=0, concatenating a document's
  chunks in chunk_id order reproduces its full token stream.

Usage: python -m tools.fuzz_curation [--seeds=N] [--start=S]
Output: one JSON line; exit 1 if any property failed.
"""

from __future__ import annotations

import json
import random
import sys


def _corpus(spark, rng: random.Random):
    """A random corpus: small vocabulary (forces shared shingles and
    exact duplicates), 4 domains, some empty docs, sequential ids."""
    vocab = [f"w{i}" for i in range(rng.randint(5, 30))]
    n = rng.randint(50, 150)
    rows = []
    texts = []
    for i in range(n):
        if texts and rng.random() < 0.15:
            text = rng.choice(texts)  # exact duplicate of an earlier doc
        elif rng.random() < 0.05:
            text = ""
        else:
            text = " ".join(
                rng.choice(vocab) for _ in range(rng.randint(1, 40))
            )
        texts.append(text)
        rows.append((i, text, rng.choice("abcd")))
    return spark.createDataFrame(
        rows, "doc_id long, text string, domain string"
    )


def _perm(df, rng: random.Random, n_parts: int):
    """A row-order + partitioning scramble that keeps the data equal."""
    from pyspark.sql import functions as F

    salt = rng.randint(0, 1 << 30)
    return (
        df.withColumn("__p", F.xxhash64(F.col("doc_id") + salt))
        .orderBy("__p")
        .drop("__p")
        .repartition(n_parts)
    )


def _p1_split(spark, df, rng, fail):
    from bigdatalab_spark.scale.curation import hash_split

    w = {"train": 0.6, "val": 0.2, "test": 0.2}
    base = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", w).select("doc_id", "split").collect()
    }
    alt = {
        r["doc_id"]: r["split"]
        for r in hash_split(_perm(df, rng, rng.randint(1, 8)), "doc_id", w)
        .select("doc_id", "split").collect()
    }
    if base != alt:
        fail.append("P1: split changed under permutation/repartition")
    if set(base.values()) - set(w):
        fail.append(f"P1: unknown split labels {set(base.values()) - set(w)}")
    from pyspark.sql import functions as F

    by_domain = (
        hash_split(df, "domain", w)
        .groupBy("domain")
        .agg(F.countDistinct("split").alias("n"))
        .collect()
    )
    if any(r["n"] != 1 for r in by_domain):
        fail.append("P1: domain-keyed split leaked a key across splits")


def _p2_mix(spark, df, rng, fail):
    from bigdatalab_spark.scale.curation import domain_mix

    r1 = {d: rng.choice([0.0, 0.2, 0.5, 0.8]) for d in "abcd"}
    r2 = {d: min(1.0, v * 2) for d, v in r1.items()}
    kept1 = {r["doc_id"] for r in domain_mix(df, "domain", r1).collect()}
    kept2 = {r["doc_id"] for r in domain_mix(df, "domain", r2).collect()}
    if not kept1 <= kept2:
        fail.append("P2: doubling rates dropped previously-kept rows")
    alt = {
        r["doc_id"]
        for r in domain_mix(_perm(df, rng, rng.randint(1, 8)), "domain", r1).collect()
    }
    if kept1 != alt:
        fail.append("P2: mix changed under permutation/repartition")
    all_ids = {r["doc_id"] for r in df.select("doc_id").collect()}
    if not kept2 <= all_ids:
        fail.append("P2: mix emitted rows not in the input")


def _p3_dedup(spark, df, rng, fail):
    from pyspark.sql import functions as F

    from bigdatalab_spark.scale.dedup import exact_dedup_groups

    base = {
        r["content_hash"]: (r["keep_id"], r["n_copies"])
        for r in exact_dedup_groups(df).collect()
    }
    n = df.count()
    # inject duplicates of random existing docs at FRESH higher ids
    dup_src = df.orderBy(F.rand(rng.randint(0, 1 << 30))).limit(
        rng.randint(1, 20)
    )
    k = dup_src.count()
    dups = dup_src.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "domain"
    )
    grown = {
        r["content_hash"]: (r["keep_id"], r["n_copies"])
        for r in exact_dedup_groups(df.unionByName(dups)).collect()
    }
    if set(grown) != set(base):
        fail.append("P3: injecting duplicates changed the content groups")
    elif any(grown[h][0] != base[h][0] for h in base):
        fail.append("P3: injecting duplicates changed a keeper id")
    if sum(v[1] for v in grown.values()) != n + k:
        fail.append("P3: group multiplicities do not sum to the row count")
    keepers = df.join(
        exact_dedup_groups(df).select(F.col("keep_id").alias("doc_id")),
        "doc_id",
    )
    again = exact_dedup_groups(keepers).collect()
    if any(r["n_copies"] != 1 for r in again) or len(again) != len(base):
        fail.append("P3: dedup of the deduped corpus is not the identity")


def _p4_shuffle(spark, df, rng, fail):
    from bigdatalab_spark.scale.curation import deterministic_shuffle

    n = df.count()
    pos = {
        r["doc_id"]: r["shuffle_pos"]
        for r in deterministic_shuffle(df).select("doc_id", "shuffle_pos").collect()
    }
    if sorted(pos.values()) != list(range(n)):
        fail.append("P4: shuffle positions are not a permutation of 0..n-1")
    alt = {
        r["doc_id"]: r["shuffle_pos"]
        for r in deterministic_shuffle(_perm(df, rng, rng.randint(1, 8)))
        .select("doc_id", "shuffle_pos").collect()
    }
    if pos != alt:
        fail.append("P4: shuffle order changed under permutation/repartition")
    other = {
        r["doc_id"]: r["shuffle_pos"]
        for r in deterministic_shuffle(df, salt=f"epoch-{rng.randint(1, 9)}")
        .select("doc_id", "shuffle_pos").collect()
    }
    if pos == other:  # n >= 50: a matching permutation is ~1/50! luck
        fail.append("P4: a different salt reproduced the same permutation")


def _p5_pack(spark, df, rng, fail):
    from bigdatalab_spark.scale.curation import pack_sequences
    from bigdatalab_spark.scale.textqa import chunk_documents

    budget = rng.choice([12, 20, 32])
    chunks = chunk_documents(df, chunk_tokens=8, overlap=0).localCheckpoint()
    packed = pack_sequences(chunks, budget=budget).collect()
    in_rows = {(r["doc_id"], r["chunk_id"]) for r in chunks.collect()}
    out_rows = {(r["doc_id"], r["chunk_id"]) for r in packed}
    if in_rows != out_rows:
        fail.append("P5: packing changed the chunk set")
    by_doc: dict = {}
    for r in packed:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["seq_id"], r["n_tokens"])
        )
    for d, rows in by_doc.items():
        rows.sort()
        seqs: dict = {}
        prev = 0
        if rows[0][1] != 0:
            fail.append(f"P5: doc {d} first seq_id != 0")
            break
        for _cid, sid, ntok in rows:
            if sid not in (prev, prev + 1):
                fail.append(f"P5: doc {d} seq_id jumped {prev}->{sid}")
                break
            prev = sid
            seqs[sid] = seqs.get(sid, 0) + ntok
        if any(tot > budget for tot in seqs.values()):
            fail.append(f"P5: doc {d} packed past the budget")
            break
    alt = pack_sequences(
        chunks.repartition(rng.randint(1, 8)), budget=budget
    ).collect()
    if {(r["doc_id"], r["chunk_id"], r["seq_id"]) for r in alt} != {
        (r["doc_id"], r["chunk_id"], r["seq_id"]) for r in packed
    }:
        fail.append("P5: packing changed under repartitioning")


def _p6_chunks(spark, df, rng, fail):
    from pyspark.sql import functions as F

    from bigdatalab_spark.functions.text import tokenize
    from bigdatalab_spark.scale.textqa import chunk_documents

    rebuilt = (
        chunk_documents(df, chunk_tokens=rng.choice([4, 8, 16]), overlap=0)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text")))
                .getField("chunk_text")
            ).alias("rebuilt")
        )
    )
    want = df.select(
        "doc_id", F.concat_ws(" ", tokenize("text")).alias("want")
    )
    bad = (
        want.join(rebuilt, "doc_id", "left")
        .filter(
            ~F.coalesce(F.col("rebuilt"), F.lit("")).eqNullSafe(F.col("want"))
        )
        .count()
    )
    if bad:
        fail.append(f"P6: {bad} docs failed chunk reconstruction")


PROPS = [_p1_split, _p2_mix, _p3_dedup, _p4_shuffle, _p5_pack, _p6_chunks]


def main() -> int:
    seeds, start = 25, 0
    for arg in sys.argv[1:]:
        if arg.startswith("--seeds="):
            seeds = int(arg.split("=", 1)[1])
        elif arg.startswith("--start="):
            start = int(arg.split("=", 1)[1])

    from bigdatalab_spark.session import get_session

    spark = get_session(app_name="fuzz-curation")
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for seed in range(start, start + seeds):
        rng = random.Random(seed)
        df = _corpus(spark, rng).localCheckpoint()
        for prop in PROPS:
            fail: list[str] = []
            prop(spark, df, rng, fail)
            failures.extend(f"seed {seed}: {m}" for m in fail)

    print(
        json.dumps(
            {
                "metric": "fuzz_curation",
                "seeds": seeds,
                "start": start,
                "properties": len(PROPS),
                "failures": failures,
                "ok": not failures,
            }
        )
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
