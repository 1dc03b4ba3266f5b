"""Join helpers (SURVEY §2.3) encoding the strategies the reference
teaches by hand.

``broadcast_dim_join`` is the collectAsMap+broadcast pattern
(ExerciseComplete.scala:240-248) as a hint; ``preagg_join`` is the
aggregation-below-join rewrite Catalyst does not perform
(303-solutions.scala:45) captured as an operator so query authors can't
forget it. Co-partitioned joins (J2) need no helper: bucketed tables
(sources.sinks.save_table bucket_by) + EnsureRequirements reuse the
layout automatically — proven in tests/test_sinks.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Fact ⋈ broadcast(dim): replicate the small side to every
    executor; no shuffle of the fact table."""
    return fact.join(F.broadcast(dim), on, how)


def preagg_join(
    fact: DataFrame,
    fact_key: str,
    aggs: list[Column],
    dim: DataFrame,
    dim_key: str,
    how: str = "inner",
) -> DataFrame:
    """Aggregate the fact table to one row per key FIRST, then join the
    dimension — the shuffle carries |keys| rows instead of |fact|."""
    reduced = fact.groupBy(fact_key).agg(*aggs)
    return reduced.join(dim, reduced[fact_key] == dim[dim_key], how)


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    max_len_diff: int = 1,
    block_prefix: int = 1,
) -> DataFrame:
    """Blocked similarity join: pairs whose strings share a
    ``block_prefix``-character prefix, differ in length by at most
    ``max_len_diff``, and sit within Levenshtein distance ``max_dist``
    (exact-equal pairs are excluded — this finds VARIANTS, not copies).

    Scale design: the prefix equality is an EQUI key, so Catalyst plans
    a hash join (broadcast when one side is small) and only same-block
    pairs ever meet — never the |L|x|R| cross product a bare
    ``levenshtein() <= k`` predicate would force through
    BroadcastNestedLoop. The prefix block is part of the DECLARED
    semantics (variants preserving the leading characters), not a lossy
    shortcut for unrestricted edit distance; widen ``block_prefix`` to 0
    only for small broadcast-able sides.
    """
    lc, rc = F.col(left_col), F.col(right_col)
    cond = (
        (F.substring(lc, 1, block_prefix) == F.substring(rc, 1, block_prefix))
        & (F.abs(F.length(lc) - F.length(rc)) <= max_len_diff)
        & (F.levenshtein(lc, rc) <= max_dist)
        & (lc != rc)
    )
    return left.join(right, cond)
