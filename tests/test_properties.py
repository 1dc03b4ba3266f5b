"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none): invariants that must hold for
ANY input, especially the determinism guarantees the oracle gate
depends on.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c\t\n"),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@given(rows=texts)
@settings(**SETTINGS)
def test_tokenize_never_yields_empty_tokens(spark, rows):
    from bigdatalab_spark.functions import tokenize

    df = spark.createDataFrame([(t,) for t in rows], "value string")
    toks = [
        r.t for r in df.select(F.explode(tokenize("value")).alias("t")).collect()
    ]
    assert all(t and not t.isspace() for t in toks)
    # token multiset equals python reference split
    want = [w for t in rows for w in t.split() if w]
    assert sorted(toks) == sorted(want)


@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    ),
    parts=st.integers(min_value=1, max_value=7),
)
@pytest.mark.slow
@settings(**SETTINGS)
def test_money_sum_is_partitioning_invariant(spark, values, parts):
    """The determinism claim behind operators.aggregates: the decimal
    sum cast to double is bit-identical under ANY partitioning."""
    from bigdatalab_spark.operators import money_sum

    df = spark.createDataFrame([(v,) for v in values], "v double")
    a = df.repartition(parts).agg(money_sum("v").alias("s")).collect()[0]["s"]
    b = df.coalesce(1).agg(money_sum("v").alias("s")).collect()[0]["s"]
    assert a == b  # exact bit equality, not approx


@given(
    n=st.integers(min_value=1, max_value=4),
    keys=st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=30),
)
@settings(**SETTINGS)
def test_top_n_per_group_size_and_order(spark, n, keys):
    from bigdatalab_spark.operators import top_n_per_group

    rows = [(k, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "k int, v int")
    got = top_n_per_group(df, ["k"], [F.desc("v")], n).collect()
    by_k: dict[int, list] = {}
    for r in got:
        by_k.setdefault(r.k, []).append(r)
    from collections import Counter

    sizes = Counter(keys)
    for k, rs in by_k.items():
        assert len(rs) == min(n, sizes[k])
        vs = [r.v for r in sorted(rs, key=lambda r: r.rank)]
        assert vs == sorted(vs, reverse=True)


@given(
    strings=st.lists(
        st.text(min_size=0, max_size=20), min_size=1, max_size=20, unique=True
    )
)
@settings(**SETTINGS)
def test_portable_hash_range_and_determinism(spark, strings):
    """portable_hash stays in [0, 2^28) (the MinHash overflow-safety
    precondition) and is stable across evaluations."""
    from bigdatalab_spark.scale.hashing import portable_hash

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    a = {r.s: r.h for r in df.select("s", portable_hash("s").alias("h")).collect()}
    b = {r.s: r.h for r in df.select("s", portable_hash("s").alias("h")).collect()}
    assert a == b
    assert all(0 <= h < 2**28 for h in a.values())


@given(rows=texts, chunk=st.integers(2, 6), overlap=st.integers(0, 1))
@settings(**SETTINGS)
def test_chunking_covers_every_token_exactly(spark, rows, chunk, overlap):
    """For ANY text and (chunk, overlap): concatenating each chunk's
    first `step` tokens in order reconstructs the token stream; chunk
    sizes stay within (0, chunk]; empty docs yield no chunks."""
    from bigdatalab_spark.functions import tokenize
    from bigdatalab_spark.scale.textqa import chunk_documents

    step = chunk - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )
    chunks = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict = {}
    for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_id)):
        assert 1 <= r.n_tokens <= chunk
        by_doc.setdefault(r.doc_id, []).append(r.chunk_text.split())
    for i, t in enumerate(rows):
        want = [w for w in t.split() if w]
        got_chunks = by_doc.get(i, [])
        if not want:
            assert got_chunks == []
            continue
        rebuilt = []
        for c in got_chunks:
            rebuilt.extend(c[:step])
        # the final chunk may extend past the last step boundary
        assert rebuilt[: len(want)] == want[: len(rebuilt)]
        flat_full = [w for c in got_chunks for w in c]
        assert set(flat_full) <= set(want)
        assert rebuilt == want or rebuilt == want[: len(rebuilt)]


@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=50, unique=True),
    salt=st.sampled_from(["a", "b"]),
)
@settings(**SETTINGS)
def test_hash_split_total_and_stable(spark, keys, salt):
    """Every key gets exactly one split; assignment is a pure function
    of (salt, key) — independent of what other keys are present."""
    from bigdatalab_spark.scale.curation import hash_split

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    full = {r.doc_id: r.split for r in hash_split(df, "doc_id", salt=salt).collect()}
    assert set(full) == set(keys)
    assert set(full.values()) <= {"train", "val", "test"}
    half = spark.createDataFrame([(k,) for k in keys[: len(keys) // 2 + 1]], "doc_id long")
    sub = {r.doc_id: r.split for r in hash_split(half, "doc_id", salt=salt).collect()}
    for k, s in sub.items():
        assert full[k] == s  # corpus growth never moves an old key


@given(n=st.integers(0, 60), parts=st.integers(1, 5))
@settings(**SETTINGS)
def test_zip_with_index_is_a_permutation(spark, n, parts):
    """For ANY size and partition count, idx is exactly 0..n-1 assigned
    in key order."""
    from bigdatalab_spark.operators import zip_with_index

    df = spark.range(n).select((F.col("id") * 7 % 61).alias("k"))
    got = zip_with_index(df, "k", num_partitions=parts).orderBy("idx").collect()
    assert [r.idx for r in got] == list(range(n))
    ks = [r.k for r in got]
    assert ks == sorted(ks)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=30).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    seg=st.integers(min_value=2, max_value=5),
)
def test_segment_dedup_idempotent_and_conserving(spark, docs, seg):
    """Properties of segment-level dedup: (1) kept segments are globally
    unique, (2) re-running on the deduped text drops nothing further
    (idempotence), (3) n_kept sums to the number of distinct segments."""
    from bigdatalab_spark.scale.dedup import segment_exact_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    once = segment_exact_dedup(df, seg_words=seg).cache()
    rows = once.collect()

    total_kept = sum(r["n_kept"] for r in rows)
    # distinct segments across the corpus == kept count
    import math

    def segs(text):
        toks = text.split()
        return [
            " ".join(toks[i * seg : (i + 1) * seg])
            for i in range(math.ceil(len(toks) / seg))
        ]

    distinct = len({s for t in docs for s in segs(t)})
    assert total_kept == distinct

    # idempotence: dedup of the deduped corpus keeps everything...
    redo = segment_exact_dedup(
        once.select("doc_id", F.col("dedup_text").alias("text")).filter(
            "dedup_text <> ''"
        ),
        seg_words=seg,
    ).collect()
    # ...UNLESS reassembly glued a short tail onto a following segment,
    # which can re-segment differently; that only ever MERGES boundaries,
    # so kept can only stay equal or shrink, never grow
    assert sum(r["n_kept"] for r in redo) <= total_kept
    for r in redo:
        assert r["n_kept"] <= r["n_segments"]
    once.unpersist()


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=200),
        st.integers(min_value=0, max_value=60),
    ),
    min_size=0,
    max_size=12,
)
points_strategy = st.lists(
    st.integers(min_value=-60, max_value=260), min_size=0, max_size=25
)


@given(points=points_strategy, ivs=intervals_strategy,
       width=st.sampled_from([1, 7, 32, 500]))
@pytest.mark.slow
@settings(**SETTINGS)
def test_bin_range_join_equals_naive_for_any_input(spark, points, ivs, width):
    """For ANY point set, interval set, and bin width, the binned
    equi-join returns exactly the naive cross-join containment rows."""
    from bigdatalab_spark.operators.rangejoin import bin_range_join

    pdf = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)] or [(None, None)],
        "pid int, p double",
    ).filter("pid IS NOT NULL")
    idf = spark.createDataFrame(
        [(i, float(lo), float(lo + span)) for i, (lo, span) in enumerate(ivs)]
        or [(None, None, None)],
        "iid int, lo double, hi double",
    ).filter("iid IS NOT NULL")
    naive = {
        (r.pid, r.iid)
        for r in pdf.crossJoin(idf).filter("p >= lo AND p < hi").collect()
    }
    got = {
        (r.pid, r.iid)
        for r in bin_range_join(pdf, idf, "p", "lo", "hi", bin_width=width).collect()
    }
    assert got == naive


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=40).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_span_dedup_invariants_for_any_corpus(spark, docs):
    """For ANY corpus: (1) every long span in the OUTPUT corpus is
    globally unique; (2) token multiset of each output doc is a subset
    of its input; (3) n_spans/n_dropped account exactly."""
    from bigdatalab_spark.scale.dedup import span_dedup

    span_tokens, min_tokens = 4, 2
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id int, text string"
    )
    out = {r.doc_id: r for r in span_dedup(df, span_tokens, min_tokens).collect()}
    assert set(out) == set(range(len(docs)))
    seen_long: set = set()
    for i, text in enumerate(docs):
        r = out[i]
        in_toks = [t for t in text.split() if t]
        out_toks = [t for t in r.dedup_text.split() if t]
        assert len(out_toks) <= len(in_toks)
        assert r.n_spans == (len(in_toks) + span_tokens - 1) // span_tokens
        assert 0 <= r.n_dropped <= r.n_spans
        # re-split the OUTPUT doc: long spans must never repeat corpus-wide.
        # (output spans re-align only when whole prefixes survive; checking
        # surviving input spans directly is exact)
    # exact re-derivation: recompute which input spans survived and check
    # global uniqueness of long survivors
    for i, text in enumerate(docs):
        in_toks = [t for t in text.split() if t]
        survivors = []
        for s in range(0, len(in_toks), span_tokens):
            chunk = " ".join(in_toks[s : s + span_tokens])
            n = len(in_toks[s : s + span_tokens])
            if n < min_tokens:
                survivors.append(chunk)  # short tails always kept
            elif chunk not in seen_long:
                seen_long.add(chunk)
                survivors.append(chunk)
        assert out[i].dedup_text == " ".join(survivors)


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_lower_weighted_median_matches_brute_model(pairs):
    """Kernel property: the result is the smallest value v such that
    the total weight of items <= v reaches half the overall weight —
    checked against an O(n^2) brute-force model, any input order."""
    import pandas as pd

    from bigdatalab_spark.functions.pandas_aggs import lower_weighted_median

    values = pd.Series([p[0] for p in pairs])
    weights = pd.Series([float(p[1]) for p in pairs])
    got = lower_weighted_median(values, weights)
    total = sum(p[1] for p in pairs)
    candidates = sorted({p[0] for p in pairs})
    want = next(
        v for v in candidates
        if 2 * sum(w for x, w in pairs if x <= v) >= total
    )
    assert got == want


@given(
    lhs=intervals_strategy,
    rhs=intervals_strategy,
    width=st.sampled_from([1, 7, 32, 500]),
)
@pytest.mark.slow
@settings(**SETTINGS)
def test_interval_overlap_join_equals_naive_for_any_input(spark, lhs, rhs, width):
    """For ANY two interval sets and bin width, the binned overlap join
    returns exactly the naive half-open overlap pairs, exactly once."""
    from bigdatalab_spark.operators.rangejoin import bin_interval_overlap_join

    ldf = spark.createDataFrame(
        [(i, float(lo), float(lo + span)) for i, (lo, span) in enumerate(lhs)]
        or [(None, None, None)],
        "lid int, llo double, lhi double",
    ).filter("lid IS NOT NULL")
    rdf = spark.createDataFrame(
        [(i, float(lo), float(lo + span)) for i, (lo, span) in enumerate(rhs)]
        or [(None, None, None)],
        "rid int, rlo double, rhi double",
    ).filter("rid IS NOT NULL")
    # empty intervals ([x, x)) overlap nothing — the operator's
    # documented contract; the bare SQL predicate alone would match
    # them when strictly inside the other side
    naive = {
        (r.lid, r.rid)
        for r in ldf.crossJoin(rdf)
        .filter("llo < lhi AND rlo < rhi AND llo < rhi AND rlo < lhi")
        .collect()
    }
    rows = bin_interval_overlap_join(
        ldf, rdf, "llo", "lhi", "rlo", "rhi", width
    ).collect()
    got = [(r.lid, r.rid) for r in rows]
    assert set(got) == naive
    assert len(got) == len(naive)  # exactly-once per pair


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=5)
)
@settings(**SETTINGS)
def test_temperature_mix_invariants_for_any_histogram(spark, sizes):
    """For ANY stratum histogram: the rarest stratum keeps everything,
    thresholds are monotone non-increasing in stratum size, kept counts
    never exceed stratum size, and every kept row's threshold matches
    the closed-form floor(sqrt(n_min/n_i) * buckets)."""
    import math

    from bigdatalab_spark.scale.curation import SPLIT_BUCKETS, temperature_mix

    rows = [
        (f"s{si}-d{di}", f"stratum{si}")
        for si, n in enumerate(sizes)
        for di in range(n)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_mix(df, "lang")
    by = {
        r["lang"]: r
        for r in out.groupBy("lang")
        .agg(
            F.max("mix_threshold").alias("thr"),
            F.max("n_docs").alias("n"),
            F.count(F.lit(1)).alias("kept"),
        )
        .collect()
    }
    n_min = min(sizes)
    for si, n in enumerate(sizes):
        name = f"stratum{si}"
        want_thr = math.floor(math.sqrt(n_min / n) * SPLIT_BUCKETS)
        if name in by:
            assert by[name]["thr"] == want_thr
            assert by[name]["kept"] <= n
        else:  # stratum fully sampled away — only possible via the hash
            assert want_thr < SPLIT_BUCKETS
    rare = f"stratum{sizes.index(n_min)}"
    assert by[rare]["kept"] == n_min  # threshold SPLIT_BUCKETS keeps all


@given(docs=texts, span=st.integers(min_value=1, max_value=4))
@settings(**SETTINGS)
def test_intradoc_span_dedup_matches_python_reference(spark, docs, span):
    """The zero-shuffle column-expression pipeline must agree with a
    straightforward Python replay (tokenize -> span -> keep first
    occurrence -> rejoin) for ANY text, including empties and
    whitespace runs."""
    import re

    from bigdatalab_spark.scale.dedup import intradoc_span_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_kept"], r["clean_text"])
        for r in intradoc_span_dedup(df, span_tokens=span).collect()
    }
    for i, t in enumerate(docs):
        toks = [w for w in re.split(r"\s+", t) if w]
        spans = [
            " ".join(toks[j : j + span]) for j in range(0, len(toks), span)
        ]
        kept, seen = [], set()
        for s in spans:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        assert got[i] == (len(spans), len(kept), " ".join(kept))


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # id
            st.sampled_from(["x", "y y", "z"]),      # text (collides often)
            st.integers(min_value=0, max_value=3),   # priority
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
@settings(**SETTINGS)
def test_priority_dedup_picks_global_minimum_per_content(spark, rows):
    """The algebraic min(struct) keeper must select exactly the
    (priority, id)-minimal copy per content group no matter how rows
    are partitioned."""
    from bigdatalab_spark.scale.dedup import priority_dedup

    df = spark.createDataFrame(
        [(i, t, f"src{p}") for i, t, p in rows],
        "doc_id long, text string, source string",
    ).repartition(4)
    pri = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    got = {
        r["keep_id"]: (r["source"], r["n_copies"])
        for r in priority_dedup(df, pri).collect()
    }
    expect = {}
    for i, t, p in rows:
        key = " ".join(t.split()).strip().lower()
        cur = expect.get(key)
        if cur is None:
            expect[key] = [(p, i), 0]
        elif (p, i) < cur[0]:
            cur[0] = (p, i)
    for i, t, p in rows:
        key = " ".join(t.split()).strip().lower()
        expect[key][1] += 1
    want = {pid: (f"src{pp}", n) for (pp, pid), n in expect.values()}
    assert got == want


@given(
    data=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=250),
    parts=st.integers(min_value=1, max_value=7),
    k=st.integers(min_value=1, max_value=8),
)
@settings(**SETTINGS)
def test_exact_heavy_hitters_matches_reference(spark, data, parts, k):
    """Two-pass Misra-Gries + recount must equal the exact definition
    {x : count(x)*(k+1) > N} for ANY input and ANY partitioning — the
    determinism claim that lets heavy_hitter_words be strict-gated even
    though the candidate pass is partitioning-dependent."""
    from collections import Counter

    from bigdatalab_spark.scale.heavyhitters import exact_heavy_hitters

    df = spark.createDataFrame(
        [(str(x),) for x in data], "word string"
    ).repartition(parts)
    got = {(r.word, r.n) for r in exact_heavy_hitters(df, "word", k).collect()}
    counts = Counter(str(x) for x in data)
    n = len(data)
    want = {(w, c) for w, c in counts.items() if c * (k + 1) > n}
    assert got == want
