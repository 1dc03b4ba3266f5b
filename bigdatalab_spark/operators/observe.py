"""Inline data-quality observation (§2.10-adjacent production surface).

``df.observe`` piggybacks aggregate metrics onto a query's ONE existing
pass — row counts, null counts, min/max ranges arrive with the action
that ran anyway, instead of a second full scan per metric. At 100 TB a
separate ``count()`` + ``filter(isNull).count()`` validation pass costs
another complete read of the table; observation costs nothing beyond
the aggregation buffers. This is the mechanism a pipeline uses to
assert "no null keys, row count within expected band" on every run
without doubling its I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def observe_quality(
    df: DataFrame,
    key_cols: list[str],
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach standard data-quality metrics to ``df``.

    Returns ``(observed_df, observation)``; run any action on the
    returned frame, then read ``observation.get`` — a dict with
    ``n_rows`` plus ``n_null_<col>`` and ``n_distinct_<col>`` (approx,
    HLL++-based so the observation stays a streaming-safe aggregate)
    for each key column. The metrics ride the same job; no extra scan.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in key_cols:
        metrics.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"n_null_{c}")
        )
        metrics.append(F.approx_count_distinct(c).alias(f"n_distinct_{c}"))
    return df.observe(obs, *metrics), obs
