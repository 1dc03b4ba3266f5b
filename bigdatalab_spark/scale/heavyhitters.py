"""Exact distributed heavy hitters: Misra-Gries candidates + recount.

Single-pass frequency sketches (the Count-Min family in scale/cms.py,
queries/sketches.py) answer point queries approximately; this module
answers the *top-share* question exactly, in two distributed passes:

1. **Candidate pass** — each input partition runs a Misra-Gries
   ``FREQUENT`` summary with ``k`` counters (``mapInPandas``, merged in
   vectorized ``value_counts`` batches using the mergeable-summaries
   prune of Agarwal et al., PODS'12: add, subtract the (k+1)-th largest
   counter from all, keep positives). Each prune removes at least
   ``(k+1) * t`` mass for a decrement of ``t``, so per partition the
   total undercount is at most ``N_p / (k+1)`` — any item with
   partition count above that survives. By pigeonhole over partitions,
   any item with GLOBAL count > N/(k+1) exceeds the local threshold in
   at least one partition, so the union of the per-partition summaries
   (at most ``k * num_partitions`` rows — KB-sized, never data-sized)
   is a guaranteed superset of the global heavy hitters.
2. **Recount pass** — exact counts for the candidate set only, via a
   broadcast semi-join (no shuffle of the raw stream; the hash
   aggregate is map-side combined), then the integer-exact filter
   ``n * (k+1) > total``.

The output is therefore EXACT and partitioning-invariant — candidates
may differ run to run, but the superset guarantee plus the exact
recount make the final rows deterministic, which is what lets the
DuckDB oracle gate this with a strict hash compare (the one-pass
sketch queries can only gate accuracy contracts).

At 100 TB: pass 1 is a full scan with k-bounded state per task and a
``k * tasks`` collect-free result; pass 2 is a scan filtered by a
broadcast of at most ``k * tasks`` candidates. Nothing data-sized
shuffles, nothing data-sized reaches the driver.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import partial

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(
    batches: Iterator[pd.DataFrame], col: str, k: int
) -> Iterator[pd.DataFrame]:
    """Misra-Gries FREQUENT summary of one partition (≤ k candidates)."""
    counts: pd.Series | None = None
    for pdf in batches:
        vc = pdf[col].value_counts()
        counts = vc if counts is None else counts.add(vc, fill_value=0)
        if len(counts) > k:
            # Mergeable-summaries prune: subtract the (k+1)-th largest
            # counter from every counter; ≤ k stay positive. Each prune
            # removes ≥ (k+1)*t mass, bounding total undercount by
            # N_p/(k+1).
            t = counts.nlargest(k + 1).iloc[-1]
            counts = counts - t
            counts = counts[counts > 0]
    if counts is None or counts.empty:
        yield pd.DataFrame({col: pd.Series([], dtype=object)})
    else:
        yield pd.DataFrame({col: counts.index.astype(object)})


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate values (superset of the
    items with global count > N/(k+1)); ≤ k rows per input partition."""
    kernel = partial(_mg_partition, col=col, k=k)
    return df.select(col).mapInPandas(kernel, schema=f"{col} string").distinct()


def exact_heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """All values of ``col`` with count strictly above total/(k+1),
    with their EXACT counts: MG candidates, broadcast-semi-join
    recount, integer-exact threshold. Columns (col, n, total)."""
    cand = mg_candidates(df, col, k)
    counts = (
        df.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = df.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        # integer-exact: n*(k+1) > total avoids any float threshold
        .filter(F.col("n") * F.lit(k + 1) > F.col("total"))
        .select(col, "n", "total")
    )
