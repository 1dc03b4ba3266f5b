"""Skew mitigation: salted aggregation (SURVEY §2.10 scale tooling).

A grouped aggregate over a heavily-skewed key funnels the hot key's
rows into one task. Salting splits each key into ``n_salts`` subkeys,
aggregates partially per (key, salt), then merges — two small shuffles
instead of one stalled straggler. AQE's skew-join splitting handles the
JOIN case automatically; salting covers the AGGREGATION case, which AQE
does not rebalance when a single group dominates.

Only algebraic aggregates (re-aggregable partials: sum/count/min/max,
and avg via sum+count) can be salted; the helper takes the partial and
merge expression pairs explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    ``partial_aggs`` aggregate raw rows per (group, salt);
    ``merge_aggs`` re-aggregate the partials per group and must read
    the partials' aliases. Example::

        salted_agg(
            df, ["k"],
            partial_aggs=[F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")],
            merge_aggs=[F.sum("s").alias("total"), F.sum("c").alias("n")],
        )
    """
    salt = (F.spark_partition_id() * 31 + F.monotonically_increasing_id()) % n_salts
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*partial_aggs)
    )
    return stage1.groupBy(*group_cols).agg(*merge_aggs)
