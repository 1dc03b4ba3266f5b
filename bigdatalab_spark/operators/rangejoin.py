"""Binned range join: point-in-interval joins as equi-joins.

The reference has no range/interval join (SURVEY §2.3 "not present"),
but a training-data pipeline meets the shape constantly: event-to-
maintenance-window attribution, record-to-validity-interval lookups,
point-in-band classification. Spark plans a bare
``points JOIN intervals ON p BETWEEN lo AND hi`` as a
BroadcastNestedLoopJoin (small side) or CartesianProduct (neither side
broadcastable) — O(|points| x |intervals|) compares, a non-starter at
100 TB.

The standard fix (Databricks' range-join bin hint, Flink interval
joins) is binning: pick a ``bin_width`` on the join domain, stamp each
point with its one containing bin, explode each interval to the bins
it overlaps, and equi-join on the bin with the range predicate as a
residual filter. Cost becomes one shuffle per side plus
``|intervals| * (avg_span / bin_width + 1)`` exploded rows — linear,
tunable, skew-handled by AQE like any other equi-join. A point lies in
exactly one bin, so each (point, interval) pair meets at most once and
no post-join dedup is needed.

Pick ``bin_width`` near the TYPICAL interval length: much smaller
multiplies the interval explosion; much larger packs unrelated rows
into shared bins and pushes work into the residual filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int | float,
    how: str = "inner",
    inclusive_hi: bool = False,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    Containment is ``lo <= point < hi`` (``<= hi`` with
    ``inclusive_hi=True`` — the SQL BETWEEN convention). ``how`` is
    ``'inner'`` or ``'left'`` (``'left'`` keeps points in no interval,
    with NULL interval columns — at most one such row per point, since
    a point occupies exactly one bin). Join-domain columns must be
    numeric (cast timestamps to epoch micros first) and the two frames
    must not share column names.

    The exploded bin range is ``floor(lo/w) .. floor(hi/w)`` inclusive;
    when ``hi`` sits exactly on a bin boundary under ``[lo, hi)``
    semantics that last bin matches no point (the residual predicate
    rejects it) — one vacuous row beats per-type boundary arithmetic.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint; shared: {sorted(overlap)}")
    reserved = {"_p_bin", "_i_bin"} & (set(points.columns) | set(intervals.columns))
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with the operator's "
            "internal bin columns; rename them first"
        )
    w = F.lit(bin_width)
    p = points.withColumn("_p_bin", F.floor(F.col(point_col) / w))
    # drop degenerate intervals (hi < lo) BEFORE the explode: they can
    # match nothing, and Spark's sequence() would otherwise generate a
    # DESCENDING bin list for them — wasted rows at best
    i = intervals.filter(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "_i_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w)
            )
        ),
    )
    in_range = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
        if inclusive_hi
        else F.col(point_col) < F.col(hi_col)
    )
    cond = (p["_p_bin"] == i["_i_bin"]) & in_range
    return p.join(i, cond, how).drop("_p_bin", "_i_bin")


def bin_interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bin_width: int | float,
) -> DataFrame:
    """Interval × interval OVERLAP join as a binned equi-join — the
    two-sided sibling of :func:`bin_range_join` (session-overlap
    attribution, validity-window reconciliation, meeting collisions).

    Overlap is half-open: ``l_lo < r_hi AND r_lo < l_hi`` — for
    NON-EMPTY intervals. Zero-length intervals (``lo == hi``) denote
    the empty set under [lo, hi) semantics and overlap nothing, so both
    inputs are filtered to ``lo < hi`` first; note the bare SQL
    predicate above would instead match an empty interval sitting
    strictly inside the other side — the two definitions agree only
    after that filter (property-tested). Both sides
    explode to the bins they cover and meet on the shared bin; an
    overlapping pair shares EVERY bin its intersection touches, so
    matches are restricted to the canonical first shared bin
    (``greatest`` of the two start bins) — exactly one output row per
    overlapping pair, no post-join DISTINCT over a data-sized frame.
    Cost: one shuffle per side plus the bin explosions; the naive plan
    Spark would pick for a bare overlap predicate is a nested-loop or
    cartesian join.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols:
        raise ValueError(
            f"column names must be disjoint; shared: {sorted(overlap_cols)}"
        )
    reserved = {"_l_bin", "_r_bin"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with the operator's "
            "internal bin columns; rename them first"
        )
    w = F.lit(bin_width)
    l = left.filter(F.col(l_lo) < F.col(l_hi)).withColumn(
        "_l_bin",
        F.explode(
            F.sequence(F.floor(F.col(l_lo) / w), F.floor(F.col(l_hi) / w))
        ),
    )
    r = right.filter(F.col(r_lo) < F.col(r_hi)).withColumn(
        "_r_bin",
        F.explode(
            F.sequence(F.floor(F.col(r_lo) / w), F.floor(F.col(r_hi) / w))
        ),
    )
    first_shared = F.greatest(
        F.floor(F.col(l_lo) / w), F.floor(F.col(r_lo) / w)
    )
    return (
        l.join(r, l["_l_bin"] == r["_r_bin"])
        .filter((F.col(l_lo) < F.col(r_hi)) & (F.col(r_lo) < F.col(l_hi)))
        .filter(F.col("_l_bin") == first_shared)
        .drop("_l_bin", "_r_bin")
    )
