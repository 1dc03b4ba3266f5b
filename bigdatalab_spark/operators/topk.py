"""Top-N-per-group (SURVEY §2.5 O5) as a reusable operator.

The reference materializes whole groups in memory
(``groupByKey.mapValues(_.toList.sortBy(...).take(N))``,
Exercise.scala:338-343) — which OOMs on a skewed group. ``row_number``
over a partitioned window shuffles once on the group key and Spark's
window exec sorts/spills per partition, so the operator survives
arbitrarily large groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str | Column],
    order_cols: list[Column],
    n: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top ``n`` rows per group under a total order.

    ``order_cols`` must end in a unique tie-breaker for deterministic
    output (SURVEY §7.4.4).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )
