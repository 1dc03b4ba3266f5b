"""Z-order (Morton) clustering: multi-dimensional data-skipping layout.

Sorting by ONE interleaved-bit key co-locates rows that are close in
BOTH dimensions, so parquet row-group min/max statistics prune scans
filtered on EITHER dimension — what lakehouse ``OPTIMIZE ZORDER BY``
computes before a sorted rewrite. A single-column sort only skips on
its leading column; the z-layout's whole value is measured, not
assumed (tools/zorder_bench.py + tests/test_plans.py assert actual
row-group pruning ratios on written files).

Reference parity: the layout lesson generalizes
302-spark-opt's partitioning/sorting material (file:line cited in
queries/analytics.py's zorder_clustering_key, the oracle-gated twin of
this helper).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the interleaved key (6 → 64 cells per dim)
Z_BITS = 6


def zorder_key(*cols: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of N ≥ 2 non-negative integer columns (low
    ``bits`` bits each): bit j of column i lands at position N*j + i,
    so each key prefix owns a tight hyper-rectangle in EVERY
    dimension. Pure codegen'd bit arithmetic — no UDF. The interleaved
    key is N*bits wide; keep it ≤ 63 bits (e.g. 3 columns × 6 bits =
    18)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least two columns")
    if n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} interleaved bits "
            "— exceeds a signed 64-bit key; lower bits"
        )
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        for i, c in enumerate(cols):
            z = z + F.shiftleft(
                F.shiftright(c, j).bitwiseAND(1), n * j + i
            )
    return z.cast("bigint")


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = Z_BITS,
    writer_options: dict | None = None,
) -> None:
    """Write ``df`` clustered by the z-key of (x_col, y_col):
    range-repartition on the key so each output file owns a contiguous
    z-range (a global sort's layout without its single-stage bottleneck
    — ranges are sampled, files written in parallel), then sort within
    partitions so row groups inside a file are tight too. The z-key
    itself is not persisted (recomputable; layout metadata, not data).

    ``writer_options`` pass through to the parquet writer — e.g.
    ``{"parquet.block.size": 1 << 20}`` to force several row groups
    per file (tests use this to make row-group pruning observable on
    small fixtures; production defaults are fine at scale).
    """
    keyed = df.withColumn("__z", zorder_key(F.col(x_col), F.col(y_col), bits=bits))
    writer = (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
    )
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(path)


def rowgroup_pruning_stats(
    path: str,
    x_col: str,
    x_range: tuple[int, int],
    y_col: str,
    y_range: tuple[int, int],
) -> dict:
    """Measure (not estimate) what a 2-D range predicate can skip in a
    parquet layout: walk every row group's min/max footer statistics
    for the two columns and count groups whose stats rectangle
    intersects the predicate rectangle — exactly the test a pushed-down
    reader performs. Driver-side metadata read only (footers, not
    data). Returns total/must-scan row groups, rows, and bytes."""
    import glob
    import os

    import pyarrow.parquet as pq

    (x_lo, x_hi), (y_lo, y_hi) = x_range, y_range
    total = {"row_groups": 0, "rows": 0, "bytes": 0}
    scanned = {"row_groups": 0, "rows": 0, "bytes": 0}
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    for f in files:
        meta = pq.ParquetFile(f).metadata
        cols = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            nbytes = rg.total_byte_size
            total["row_groups"] += 1
            total["rows"] += rg.num_rows
            total["bytes"] += nbytes
            sx = rg.column(cols[x_col]).statistics
            sy = rg.column(cols[y_col]).statistics
            if sx is None or sy is None:
                overlap = True  # no stats -> reader must scan
            else:
                overlap = sx.min <= x_hi and sx.max >= x_lo and (
                    sy.min <= y_hi and sy.max >= y_lo
                )
            if overlap:
                scanned["row_groups"] += 1
                scanned["rows"] += rg.num_rows
                scanned["bytes"] += nbytes
    return {
        "n_files": len(files),
        "total": total,
        "scanned": scanned,
        "scanned_bytes_ratio": (
            round(scanned["bytes"] / total["bytes"], 4) if total["bytes"] else None
        ),
        "scanned_rows_ratio": (
            round(scanned["rows"] / total["rows"], 4) if total["rows"] else None
        ),
    }
