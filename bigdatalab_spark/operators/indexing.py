"""Distributed global indexing (SURVEY §2.2 P10, zipWithIndex).

The reference's ``zipWithIndex`` (301-solutions.scala:56) assigns each
record its global position. The naive DataFrame translation — a
``row_number`` window with no PARTITION BY — funnels the entire input
through a single task; fine on a lab dataset, fatal at 100 TB.

This module implements the scale-safe shape instead: range-partition on
the order key, count rows per partition (one tiny aggregate), turn the
counts into cumulative offsets on the driver (#partitions rows — not a
data-sized collect), then add ``offset + row_number() within partition``.
No stage ever sorts more than one partition's worth of rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark import StorageLevel


def zip_with_index(
    df: DataFrame,
    *order_cols: str | Column,
    idx_name: str = "idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 0-based global index ``idx_name`` ordered by ``order_cols``.

    Three distributed steps (no single-task global sort):

    1. ``repartitionByRange`` on the order key — partition *i* holds only
       keys ≤ partition *i+1*'s, so per-partition ranks compose into a
       global rank.
    2. Per-partition row counts -> cumulative offsets. The aggregate
       output is ``num_partitions`` rows; collecting it is O(partitions),
       independent of data size.
    3. ``row_number()`` windowed BY partition id (each window instance is
       one partition's rows, executed in parallel) plus the offset map
       (a literal ``create_map`` — no join, no extra shuffle).

    The stamped frame is persisted because steps 2 and 3 both consume it
    and partition ids must agree between the two passes (and between the
    counts pass and the consumer's final read — repartitionByRange
    boundaries are sample-based, so a recompute is not guaranteed to
    reproduce them); at cluster scale the same pattern holds
    (MEMORY_AND_DISK, or checkpoint for very wide inputs). Because the
    returned frame still reads from the persisted one, it cannot be
    unpersisted here: it is freed by ``Engine.clear_cache()`` /
    ``spark.catalog.clearCache()`` or session end — call one of those
    between repeated invocations in a long-lived session.
    """
    if "_pid" in df.columns:
        raise ValueError("zip_with_index reserves the internal column '_pid'")
    spark = df.sparkSession
    parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    stamped = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in stamped.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # empty input => no offsets; an argless create_map() is typed
    # map<void,void> and fails the int lookup, so skip the lookup (there
    # are no rows for it to index anyway)
    offset = (
        F.create_map(*[F.lit(x) for pid_off in offsets.items() for x in pid_off])[
            F.col("_pid")
        ]
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    indexed = stamped.withColumn(
        idx_name,
        (offset + F.row_number().over(w) - 1).cast("long"),
    ).drop("_pid")
    return indexed
