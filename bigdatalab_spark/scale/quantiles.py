"""Mergeable log-histogram quantiles — the PERSISTABLE percentile
pre-aggregate.

``percentile_approx`` (queries/timeseries.py) answers quantiles in one
pass, but its GK sketch lives only inside the aggregation buffer: you
cannot store Monday's sketch and fold Tuesday into it. This module is
the quantile twin of the bitmap exact-distinct work
(queries/spark4_sql.py:334): the pre-aggregate is PLAIN DATA — one
``(group, bin, cnt)`` row per occupied histogram bin — so daily
histograms land in parquet, MERGE by summing counts (associative,
commutative, partial-aggregated map-side like any sum), and any
quantile over any day range is answered from aggregate-sized data
without re-reading raw values. That is the DDSketch/HDR-histogram
contract (Masson et al., VLDB'19), built from exact integer arithmetic
so a DuckDB replay is bit-identical.

Binning (all integer math, no float logs anywhere near a boundary):
values move as cents; ``k = length(bin(cents))`` is the exact
floor(log2)+1; each power-of-two range [2^(k-1), 2^k) splits into
``subbins`` equal sub-ranges. Relative bin width <= 1/subbins, so a
quantile read back from the histogram midpoint is within ~1/(2*subbins)
of the true value — bounded RELATIVE error at every magnitude, which is
what makes log bins (not equi-width ones) the right shape for
long-tailed value distributions.

Scale: the shuffle carries one (group, bin, partial-count) row per
map-side bucket — bins are O(subbins * log2(max_value)) ~ a few hundred
regardless of row count. Quantile extraction is a window cumsum over
those few hundred rows per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bin_expr(cents: str, subbins: int) -> str:
    """SQL for the bin id of a positive BIGINT cents column — exact:
    ``length(bin(x))`` is floor(log2(x))+1, sub-bin by integer-safe
    floor division (operands far below 2^53, quotient exact)."""
    k = f"length(bin({cents}))"
    base = f"CAST(power(2, {k} - 1) AS BIGINT)"
    sub = f"CAST(floor((({cents} - {base}) * {subbins}.0) / {base}) AS BIGINT)"
    return f"({k} * {subbins} + {sub})"


def _mid_expr(bin_col: str, subbins: int) -> str:
    """SQL for a bin's midpoint value in dollars, recovered from the
    bin id alone (same integer pieces both engines)."""
    k = f"CAST(floor({bin_col} / {subbins}) AS BIGINT)"
    sub = f"({bin_col} % {subbins})"
    base = f"power(2, {k} - 1)"
    return f"(({base} + ({sub} + 0.5) * {base} / {subbins}) / 100.0)"


def histogram_bins(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    subbins: int = 16,
) -> DataFrame:
    """Fold ``value_col`` (positive, 2-dp money) into the mergeable
    log-histogram pre-aggregate: one ``(group..., bin, cnt)`` row per
    occupied bin. This is the frame you persist per day/partition."""
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    return (
        df.withColumn("__cents", cents)
        .withColumn("bin", F.expr(_bin_expr("__cents", subbins)))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histograms(hist: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge histograms that were pre-aggregated at a finer grain (e.g.
    per day): counts simply sum per (group, bin). Associative and
    commutative — partial-aggregates map-side, so merging a year of
    daily histograms shuffles bin-sized rows, never raw values."""
    return hist.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def quantiles_from_histogram(
    hist: DataFrame,
    group_cols: list[str],
    qs: list[float],
    subbins: int = 16,
) -> DataFrame:
    """Read quantiles back out of a (merged) histogram: one window
    cumsum over each group's bins, pick the first bin whose cumulative
    count reaches rank ``ceil(q * n)`` (discrete-rank semantics,
    matching ``quantile_disc``). For integer cum, ``cum >= ceil(q*n)``
    is exactly ``cum * 100 >= p * n`` with ``p = 100q`` — kept as pure
    BIGINT arithmetic so no float/decimal literal rounding can flip a
    boundary rank in either engine. Cost is O(bins) per group —
    independent of how many raw rows the histogram absorbed."""
    w = Window.partitionBy(*group_cols).orderBy("bin")
    wg = Window.partitionBy(*group_cols)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(wg))
    )
    # every quantile rides ONE aggregate pass: min(bin) over the rows at
    # or past each rank — no per-quantile join, no second window.
    # tag = round(q*100) is computed ONCE and used for BOTH the rank
    # arithmetic and the output column name (int(q*100) truncates, so
    # 0.29 → 28.999… would label p28 while ranking at 29); qs that
    # collide at 2-decimal precision are rejected up front.
    tags = [round(q * 100) for q in qs]
    if len(set(tags)) != len(tags):
        raise ValueError(
            f"quantiles must be distinct at 2-decimal precision: {qs}"
        )
    aggs = [F.max("n").alias("n")]
    for tag in tags:
        at_rank = F.col("cum") * 100 >= F.lit(tag) * F.col("n")
        aggs.append(
            F.min(F.when(at_rank, F.col("bin"))).alias(f"__b{tag}")
        )
    out = cum.groupBy(*group_cols).agg(*aggs)
    for tag in tags:
        out = out.withColumn(
            f"p{tag}_est", F.expr(_mid_expr(f"__b{tag}", subbins))
        ).drop(f"__b{tag}")
    return out
