"""File-level data-skipping index over plain parquet — the Delta/
Iceberg ``add file stats`` contract, rebuilt from footers.

Partition pruning (sinks.py partitionBy) skips directories; Z-order
(operators/zorder.py) makes row-group stats selective INSIDE a file;
this module closes the middle layer: a queryable index of per-file
min/max statistics for chosen columns, so a point/range predicate on a
NON-partition column selects the candidate file list before Spark ever
plans the scan. On a 100 TB table that is the difference between
listing+footer-probing a million files per query and one tiny index
read.

Scale design: the index BUILD distributes — the file list becomes a
one-column DataFrame and each task opens only the parquet FOOTERS of
its files (``pyarrow.parquet.ParquetFile.metadata``; kilobytes per
file, the data pages are never touched). The index itself is plain
data: one row per (file, column) with min/max/null-count/row-count —
persistable, mergeable by union, and refreshable incrementally (index
only the files added since the last build, union the frames).

``pruned_read`` then answers a range predicate by filtering the index
(a metadata-sized frame), collecting the CANDIDATE FILE LIST (the same
driver-side object any table format's planner materializes), and
handing exactly those files to ``spark.read.parquet``. The predicate is
re-applied after the read — skipping is a performance contract, never a
correctness one, so a stale index can only over-read, not corrupt
(files missing from the index are treated as always-candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_INDEX_SCHEMA = (
    "file string, col string, min_val double, max_val double, "
    "min_str string, max_str string, n_nulls bigint, n_rows bigint"
)

_RG_SCHEMA = (
    "file string, rg int, col string, min_val double, max_val double, "
    "min_str string, max_str string, n_nulls bigint, n_rows bigint, "
    "n_bytes bigint"
)


def _list_parquet_files(spark: SparkSession, path: str) -> list[str]:
    # the cheap way to an authoritative file list: a metadata-only scan
    files = spark.read.parquet(path).inputFiles()
    return sorted(f.removeprefix("file:") for f in files)


def build_file_index(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """One row per (file, column): min/max/null-count/row-count, read
    from parquet FOOTERS only, on executors (the file list is the
    distributed input — a build over a million files fans out like any
    other job). Numeric columns only (min/max land as doubles)."""
    files = _list_parquet_files(spark, path)
    paths = spark.createDataFrame([(f,) for f in files], "file string")
    return _index_paths(spark, paths, len(files), cols)


_INDEX_COLUMNS = (
    "file", "col", "min_val", "max_val",
    "min_str", "max_str", "n_nulls", "n_rows",
)


def _file_stat_rows_fn(cols: list[str]):
    """Per-file footer-stat extraction shared by the distributed probe
    (:func:`_index_paths`) and the driver-side small-delta fast path
    (:func:`index_rows_local` / managed ``_write_one_index``): ONE
    implementation so the two paths cannot drift. Returned as a
    closure, not a module function, so the distributed body pickles it
    by VALUE — executors never need the package importable."""
    want = list(cols)

    def rows_for(fname: str) -> list[tuple]:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(fname).metadata
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        rows = []
        for col in want:
            if col not in idx:
                # schema-evolution: this file predates the column.
                # Record NULL stats (with the footer row count) so
                # the file stays an always-candidate instead of
                # crashing the whole index build.
                rows.append(
                    (fname, col, None, None, None, None,
                     md.num_rows, md.num_rows)
                )
                continue
            i = idx[col]
            mn = mx = None
            nulls = 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    mn = mx = None
                    break
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
                nulls += st.null_count or 0
            is_str = isinstance(mn, (str, bytes))
            if isinstance(mn, bytes):
                mn = mn.decode("utf-8", "replace")
                mx = mx.decode("utf-8", "replace")
            rows.append(
                (
                    fname,
                    col,
                    None if mn is None or is_str else float(mn),
                    None if mx is None or is_str else float(mx),
                    mn if is_str else None,
                    mx if is_str else None,
                    nulls,
                    md.num_rows,
                )
            )
        return rows

    return rows_for


def index_rows_local(files: list[str], cols: list[str]) -> list[tuple]:
    """Driver-side footer probe of a METADATA-SIZED file list: the same
    stat rows :func:`_index_paths` computes distributed, without a
    Spark job. A table-format commit's index delta is a handful of
    files; probing their footers is microseconds of driver I/O, while
    the distributed probe pays a full job-schedule + Python-worker
    round trip (measured ~0.3 s per commit at gate scale). Callers
    gate on file count and fall back to the distributed build for
    large deltas (guide §5: the driver does metadata work only)."""
    rows_for = _file_stat_rows_fn(cols)
    out: list[tuple] = []
    for f in files:
        out.extend(rows_for(f))
    return out


def _index_paths(
    spark: SparkSession, paths: DataFrame, n_files: int, cols: list[str]
) -> DataFrame:
    rows_for = _file_stat_rows_fn(cols)

    def _footer_stats(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname in pdf["file"]:
                rows.extend(rows_for(fname))
            yield pd.DataFrame(rows, columns=list(_INDEX_COLUMNS))

    # one footer probe per file; repartition so a huge file list fans out
    n_tasks = max(1, min(n_files, spark.sparkContext.defaultParallelism))
    return paths.repartition(n_tasks).mapInPandas(
        _footer_stats, schema=_INDEX_SCHEMA
    )


def refresh_file_index(
    spark: SparkSession,
    path: str,
    old_index: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Incremental maintenance: footer-probe ONLY files not yet in the
    index, union with the still-valid rows. Appends to a 100 TB table
    cost index work proportional to the new files; rows for deleted
    files are dropped (a file gone from listing must not stay a
    candidate path for the reader)."""
    current = set(_list_parquet_files(spark, path))
    known = {
        r["file"] for r in old_index.select("file").distinct().collect()
    }
    fresh = sorted(current - known)
    kept = old_index.filter(
        F.col("file").isin([f for f in known if f in current])
    )
    if not fresh:
        return kept
    paths = spark.createDataFrame([(f,) for f in fresh], "file string")
    new_rows = _index_paths(spark, paths, len(fresh), cols)
    return kept.unionByName(new_rows)


def candidate_files(
    index: DataFrame, col: str, lo, hi
) -> list[str]:
    """Files whose [min, max] for ``col`` intersects [lo, hi] — plus
    any file with unusable stats (NULL min/max), which must stay a
    candidate: skipping may only ever over-read. Pass string bounds
    for string columns (binary collation order, matching parquet's
    footer stats); numeric bounds for numeric columns."""
    if isinstance(lo, str):
        mn, mx = F.col("min_str"), F.col("max_str")
    else:
        mn, mx = F.col("min_val"), F.col("max_val")
    rows = (
        index.filter(F.col("col") == col)
        .filter(mn.isNull() | ~((mx < lo) | (mn > hi)))
        .select("file")
        .collect()
    )
    return sorted(r["file"] for r in rows)


def pruned_read(
    spark: SparkSession,
    path: str,
    index: DataFrame,
    col: str,
    lo,
    hi,
    merge_schema: bool = True,
) -> DataFrame:
    """Read only the files the index cannot rule out for
    ``col BETWEEN lo AND hi``, then re-apply the predicate (the index
    narrows the scan; the filter stays the source of truth).

    Staleness contract, enforced here: the LIVE directory listing is
    consulted on every read, and any current file the index has no row
    for (under this column) is unioned into the candidate set. A stale
    index therefore only ever over-reads — files written after the last
    refresh are scanned in full, never silently dropped."""
    current = set(_list_parquet_files(spark, path))
    indexed = {
        r["file"]
        for r in index.filter(F.col("col") == col)
        .select("file").distinct().collect()
    }
    cand = set(candidate_files(index, col, lo, hi)) & current
    cand |= current - indexed  # unindexed live files: always-candidates
    if not cand:
        return spark.read.parquet(path).filter(F.lit(False))
    # mergeSchema (default on): a schema-evolved table may have files
    # that predate ``col`` — without merging, Spark resolves the read
    # schema from ONE footer and the filter can fail to analyze. The
    # cost is one footer read per candidate file, on executors; pass
    # merge_schema=False on known-homogeneous layouts to skip it.
    return (
        spark.read.option("mergeSchema", merge_schema)
        .parquet(*sorted(cand))
        .filter(F.col(col).between(lo, hi))
    )


# ---- row-group-level skipping ------------------------------------------
#
# The file-level index above prunes whole files; parquet footers already
# carry per-ROW-GROUP min/max, which is one granularity finer — on a
# Z-ordered layout a 2-D rectangle keeps a handful of files but only a
# fraction of each kept file's row groups intersects the rectangle.
# These functions store that finer index and give an EXECUTABLE scan
# that reads only the candidate row groups (pyarrow read_row_groups on
# executors), not just a stats report.


def build_rowgroup_index(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """One row per (file, row_group, column): min/max/null-count/
    row-count/byte-size, from footers only, on executors — same fan-out
    contract as :func:`build_file_index`, one granularity finer.
    A column missing from a file (schema evolution) gets NULL stats so
    its row groups stay always-candidates."""
    files = _list_parquet_files(spark, path)
    paths = spark.createDataFrame([(f,) for f in files], "file string")
    return _rowgroup_index_paths(spark, paths, len(files), cols)


_RG_COLUMNS = (
    "file", "rg", "col", "min_val", "max_val",
    "min_str", "max_str", "n_nulls", "n_rows", "n_bytes",
)


def _rg_stat_rows_fn(cols: list[str]):
    """Row-group twin of :func:`_file_stat_rows_fn` — one shared
    per-file extraction for the distributed probe and the driver-side
    fast path."""
    want = list(cols)

    def rows_for(fname: str) -> list[tuple]:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(fname).metadata
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        rows = []
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for col in want:
                if col not in idx:
                    rows.append((
                        fname, g, col, None, None, None, None,
                        rg.num_rows, rg.num_rows,
                        rg.total_byte_size,
                    ))
                    continue
                st = rg.column(idx[col]).statistics
                mn = mx = None
                nulls = 0
                if st is not None and st.has_min_max:
                    mn, mx = st.min, st.max
                    nulls = st.null_count or 0
                is_str = isinstance(mn, (str, bytes))
                if isinstance(mn, bytes):
                    mn = mn.decode("utf-8", "replace")
                    mx = mx.decode("utf-8", "replace")
                rows.append((
                    fname, g, col,
                    None if mn is None or is_str else float(mn),
                    None if mx is None or is_str else float(mx),
                    mn if is_str else None,
                    mx if is_str else None,
                    nulls, rg.num_rows, rg.total_byte_size,
                ))
        return rows

    return rows_for


def rowgroup_rows_local(files: list[str], cols: list[str]) -> list[tuple]:
    """Driver-side row-group footer probe of a metadata-sized file
    list — see :func:`index_rows_local` for the rationale and gating."""
    rows_for = _rg_stat_rows_fn(cols)
    out: list[tuple] = []
    for f in files:
        out.extend(rows_for(f))
    return out


def _rowgroup_index_paths(
    spark: SparkSession, paths: DataFrame, n_files: int, cols: list[str]
) -> DataFrame:
    """Row-group footer probe over an explicit file-path frame — the
    row-group twin of :func:`_index_paths` (ManagedTable probes only a
    version's NEW files through this)."""
    rows_for = _rg_stat_rows_fn(cols)

    def _rg_stats(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname in pdf["file"]:
                rows.extend(rows_for(fname))
            yield pd.DataFrame(rows, columns=list(_RG_COLUMNS))

    n_tasks = max(
        1, min(n_files, spark.sparkContext.defaultParallelism)
    )
    return paths.repartition(n_tasks).mapInPandas(
        _rg_stats, schema=_RG_SCHEMA
    )


def candidate_rowgroups(
    index: DataFrame, preds: list[tuple]
) -> dict[str, list[int]]:
    """Row groups whose stats rectangle intersects EVERY ``(col, lo,
    hi)`` predicate — the conjunction a pushed-down reader evaluates.
    NULL-stats entries stay candidates. Returns {file: sorted rg ids},
    a metadata-sized driver object (the same thing a table format's
    planner materializes as a split list)."""
    keep = None
    for col, lo, hi in preds:
        if isinstance(lo, str):
            mn, mx = F.col("min_str"), F.col("max_str")
        else:
            mn, mx = F.col("min_val"), F.col("max_val")
        c = (
            index.filter(F.col("col") == col)
            .filter(mn.isNull() | ~((mx < lo) | (mn > hi)))
            .select("file", "rg")
        )
        keep = c if keep is None else keep.join(c, ["file", "rg"])
    out: dict[str, list[int]] = {}
    for r in (keep or index.select("file", "rg")).distinct().collect():
        out.setdefault(r["file"], []).append(r["rg"])
    return {f: sorted(rgs) for f, rgs in sorted(out.items())}


def rowgroup_pruned_read(
    spark: SparkSession,
    path: str,
    index: DataFrame,
    preds: list[tuple],
    columns: list[str] | None = None,
    schema=None,
    constants: dict[str, dict] | None = None,
) -> DataFrame:
    """Scan ONLY the candidate row groups (then re-apply the predicate
    — pruning narrows I/O, the filter stays the source of truth).

    Spark's parquet reader has no public "these row groups only" API,
    so the scan is a distributed pyarrow kernel: one input row per
    candidate file carries its row-group list; each task calls
    ``read_row_groups`` (column-pruned) and emits Arrow batches
    zero-copy via ``mapInArrow``. The kernel never opens a
    non-candidate file and never decodes a non-candidate row group —
    at 100 TB that is the I/O the file-level index leaves on the
    table.

    ``constants`` maps a file path (as it appears in the index's
    ``file`` column) to {column: typed value} to STAMP as a constant
    array — partition-column values a partitioned layout stores in
    directory names, not in the physical files (the caller must NOT
    pass predicates on those columns in ``preds``; the index has no
    stats for them)."""
    import json

    cand = candidate_rowgroups(index, preds)
    consts_all = constants or {}
    # an explicit schema (the managed facade's stored snapshot schema)
    # avoids inferring from the directory — under the reference data
    # plane the version dir holds only the commit's delta files
    if schema is None:
        schema = spark.read.parquet(path).schema
    out_cols = list(columns) if columns else [f.name for f in schema.fields]
    from pyspark.sql.types import StructType

    by_name = {f.name: f for f in schema.fields}
    out_schema = StructType([by_name[c] for c in out_cols])
    if not cand:
        return spark.createDataFrame([], out_schema)

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(out_schema)

    def _read(batches):
        import pyarrow.parquet as pq

        for batch in batches:
            files = batch.column("file").to_pylist()
            lists = batch.column("rgs").to_pylist()
            for fname, rgs_json in zip(files, lists):
                pf = pq.ParquetFile(fname)
                have = set(pf.schema_arrow.names)
                consts = consts_all.get(fname, {})
                want = [
                    c for c in out_cols if c in have and c not in consts
                ]
                tbl = pf.read_row_groups(
                    json.loads(rgs_json), columns=want
                )
                # align to the table schema: stamp partition-column
                # constants, add schema-evolution NULL columns, fix
                # order, cast arrow types to Spark's
                import pyarrow as pa

                arrays = []
                for fld in target:
                    if fld.name in consts:
                        val = consts[fld.name]
                        arrays.append(
                            pa.nulls(len(tbl), fld.type)
                            if val is None
                            else pa.array(
                                [val] * len(tbl), type=fld.type
                            )
                        )
                    elif fld.name in tbl.column_names:
                        arrays.append(
                            tbl.column(fld.name).cast(fld.type)
                        )
                    else:
                        arrays.append(pa.nulls(len(tbl), fld.type))
                for b in pa.table(
                    arrays, schema=target
                ).to_batches(max_chunksize=1 << 16):
                    yield b

    pairs = spark.createDataFrame(
        [(f, json.dumps(rgs)) for f, rgs in cand.items()],
        "file string, rgs string",
    )
    n_tasks = max(
        1, min(len(cand), spark.sparkContext.defaultParallelism)
    )
    df = pairs.repartition(n_tasks).mapInArrow(_read, schema=out_schema)
    for col, lo, hi in preds:
        df = df.filter(F.col(col).between(lo, hi))
    return df
