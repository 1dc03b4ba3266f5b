"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none): invariants that must hold for
ANY input, especially the determinism guarantees the oracle gate
depends on.
"""

from __future__ import annotations

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
