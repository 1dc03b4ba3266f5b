"""Change-data-capture primitives: diff two snapshots of a keyed
dataset into an insert/update/delete changeset.

The warehouse staple behind incremental loads, audit trails, and
table-format time travel: given yesterday's snapshot and today's,
emit WHAT changed so downstream consumers (replication, cache
invalidation, incremental re-training) process the delta instead of
re-reading the world. Reference analogue: the lab's batch pipelines
recompute full outputs (e.g. 303-spark-sql aggregations); this is the
beyond-reference incremental twin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Keyed diff of two snapshots: one output row per key whose state
    changed, tagged ``op`` ∈ {insert, update, delete}, carrying the old
    and new values of every compared column (NULL on the absent side).
    Unchanged keys are dropped — the changeset is delta-sized, not
    snapshot-sized.

    Scale design: ONE full-outer shuffle join on the key — each side is
    first projected to ``key + compare`` columns so the exchange carries
    only what the diff needs (column pruning reaches the scans). Change
    detection is a null-safe struct comparison (``<=>`` on a single
    struct), a pure column expression: no hashing collisions, no UDF,
    and NULL-valued attributes compare correctly (NULL <=> NULL is
    true, so a NULL→NULL column is NOT an update). At 100 TB both
    snapshots shuffle once; if either side is bucketed by the key the
    exchange on that side disappears entirely.
    """
    keys = list(key_cols)
    cmp_ = list(compare_cols)
    o = old.select(*keys, F.struct(*cmp_).alias("_old")).alias("o")
    n = new.select(*keys, F.struct(*cmp_).alias("_new")).alias("n")
    joined = o.join(n, on=keys, how="full_outer")
    op = (
        F.when(F.col("_old").isNull(), F.lit("insert"))
        .when(F.col("_new").isNull(), F.lit("delete"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("update"))
    )  # unchanged -> NULL -> filtered
    return (
        joined.withColumn("op", op)
        .where(F.col("op").isNotNull())
        .select(
            "op",
            *keys,
            *[F.col(f"_old.{c}").alias(f"old_{c}") for c in cmp_],
            *[F.col(f"_new.{c}").alias(f"new_{c}") for c in cmp_],
        )
    )
