"""As-of (nearest-timestamp) join — a time-series operator Spark lacks
as a built-in (reference has nothing comparable; standard in feature
backfill and event-attribution pipelines).

Semantics: for every left row, attach the single right row with the
same key whose timestamp is the greatest one <= the left timestamp
(``direction="backward"``; ``"forward"`` = smallest >= ).

Scale design — why NOT a range join: the naive
``l JOIN r ON key AND r.ts <= l.ts`` explodes to all prior rows per
event before a per-group argmax prunes it (quadratic per key). Instead:
union both sides tagged with a side marker, one shuffle on the key, and
a running ``last(payload, ignorenulls)`` window ordered by
``(ts, side)`` within each key. Cost: one hash exchange + one
within-partition sort — the same budget as any keyed aggregation, with
no intermediate blow-up at any key cardinality or history depth.

On ties (several right rows at the matching timestamp) the row with the
greatest payload struct wins — made deterministic by adding the payload
to the sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``right_ts + value_cols``
    of its nearest right match (NULLs when no match exists yet).

    Matched columns are appended as ``<right_ts><suffix>`` and
    ``<col><suffix>``. ``tolerance`` (an SQL interval string like
    ``'1 hour'``) bounds how far the match may lie from the left
    timestamp: a nearest match older (backward) / newer (forward) than
    the tolerance is nulled out — the standard feature-staleness guard.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    reserved = {"_t", "_rv", "_side", "_match"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"asof_join reserves internal columns {sorted(clash)}")
    value_cols = (
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in (*on, right_ts)]
    )
    payload = F.struct(
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    r = right.select(*on, F.col(right_ts).alias("_t"), payload.alias("_rv"))
    l = left.withColumn("_t", F.col(left_ts))
    # right rows must sort adjacent to the left rows they can match:
    # backward => right-before-left at equal ts (a right row AT the left
    # timestamp is eligible), forward => left-before-right
    l = l.withColumn("_side", F.lit(1 if direction == "backward" else 0))
    r = r.withColumn("_side", F.lit(0 if direction == "backward" else 1))
    unioned = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_rv").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        match = F.last("_rv", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_rv").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.first("_rv", ignorenulls=True).over(w)
    out_cols = [c for c in left.columns]
    matched = (
        unioned.withColumn("_match", match)
        .filter(F.col("_side") == F.lit(1 if direction == "backward" else 0))
        .filter(F.col("_rv").isNull())  # keep genuine left rows only
    )
    if tolerance is not None:
        matched_ts = F.col(f"_match.{right_ts}{suffix}")
        in_range = (
            matched_ts >= F.col("_t") - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else matched_ts <= F.col("_t") + F.expr(f"INTERVAL {tolerance}")
        )
        matched = matched.withColumn(
            "_match", F.when(in_range, F.col("_match"))
        )
    return matched.select(
        *out_cols,
        F.col(f"_match.{right_ts}{suffix}").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_match.{c}{suffix}").alias(f"{c}{suffix}") for c in value_cols],
    )
