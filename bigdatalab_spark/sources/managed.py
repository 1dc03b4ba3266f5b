"""ManagedTable — the storage capstone: versioned snapshots, the
file-skipping index, and compaction behind ONE facade.

The three primitives exist separately (sources/versioned.py —
snapshots/time-travel/rollback/vacuum; sources/skipping.py — per-file
min/max stats from parquet footers; sinks.py — small-file compaction),
but wiring them by hand leaves two gaps a real table format never has:
nothing guarantees the index tracks a version flip, and a compaction
rewrite silently orphans the index built over the pre-compaction file
names. This module closes both by making the index PART of the
snapshot:

    path/v=1/part-*.parquet          (immutable data files)
    path/v=1/_index/*.parquet        (skipping index FOR v=1 — relative
                                      file names, so hard-linked files
                                      keep their index rows)
    path/v=1/_COMMITTED              (marker: data AND index complete)
    path/v=2/...
    path/_latest                     (atomic pointer: "2")

Atomicity story (the reference's managed-table semantics,
303-spark-sql/README.md:66-73, rebuilt for 100 TB): a version is
visible iff its ``_COMMITTED`` marker exists, and the marker lands
only AFTER both the data files and the index files are fully on disk —
so the index can never be newer or older than the data it describes.
``_index`` and ``_COMMITTED`` start with ``_`` and are therefore
invisible to Spark's parquet reader; a plain
``spark.read.parquet(path/v=N)`` of a committed version is always
correct with or without the facade.

Scale design:
- WRITE cost is one footer probe per new file (distributed, metadata
  only — see skipping.py); APPEND hard-links the previous snapshot's
  files (zero copy, same inode) and probes only the NEW files, reusing
  the previous index rows verbatim because index file names are
  relative to the version directory.
- READ cost for a selective predicate is one metadata-sized index scan
  + only the candidate files — at 100 TB the difference between
  footer-probing a million files per query and reading a few-thousand-
  row index.
- COMPACTION is just another version: read vN, cluster, write vN+1
  with a fresh index. Crash-safety is free (a crash leaves a
  marker-less directory everyone ignores), time travel to the
  pre-compaction layout keeps working, and vacuum reclaims it later.
- Concurrency reuses the dataset writer lock (locks.py): one committer
  at a time, readers never block (they follow the pointer to immutable
  directories), and a pointer CAS before each flip turns any lock
  bypass into a loud ConcurrentWriteError instead of a lost update.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.sources.locks import (
    ConcurrentWriteError,
    dataset_write_lock,
)
from bigdatalab_spark.sources.skipping import _index_paths
from bigdatalab_spark.sources.versioned import (
    _MARKER,
    _POINTER,
    _version_dir,
    latest_version,
    list_versions,
)
from bigdatalab_spark.sources.versioned import rollback as _rollback
from bigdatalab_spark.sources.versioned import vacuum as _vacuum

_INDEX_DIR = "_index"


def _data_files(vdir: str) -> list[str]:
    """Relative paths of the snapshot's parquet data files (walk, so
    partitioned layouts work); ``_index`` and other _-prefixed entries
    are excluded the same way Spark's reader excludes them."""
    out = []
    for dirpath, dirnames, filenames in os.walk(vdir):
        dirnames[:] = [
            d for d in dirnames if not d.startswith(("_", "."))
        ]
        for f in filenames:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(
                    os.path.relpath(os.path.join(dirpath, f), vdir)
                )
    return sorted(out)


class ManagedTable:
    """Facade over one versioned, indexed, compactable parquet table.

    ``index_cols`` fixes which columns get file-level min/max stats;
    every committed version carries an index for exactly these columns
    (possibly with NULL stats for files that predate a column — such
    files are always-candidates, never dropped).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        index_cols: tuple[str, ...] = (),
    ) -> None:
        self.spark = spark
        self.path = path
        self.index_cols = tuple(index_cols)

    # ---- version surface (delegated semantics) --------------------------

    def versions(self) -> list[int]:
        return list_versions(self.path)

    def latest(self) -> int | None:
        return latest_version(self.path)

    def rollback(self, version: int) -> None:
        """Move the pointer to an earlier committed version. The index
        travels with the snapshot, so a rollback needs no index work —
        reads through the old pointer prune with the old index."""
        _rollback(self.path, version)

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Reclaim old snapshots (and crash debris). Hard-linked data
        files shared with surviving versions survive — the filesystem
        drops the directory entry, not the inode."""
        return _vacuum(self.path, keep_last)

    # ---- commit protocol -------------------------------------------------

    def write(
        self, df: DataFrame, partition_cols: tuple[str, ...] = ()
    ) -> int:
        """Full snapshot: ``df`` becomes the next version, with a fresh
        skipping index, in one atomic commit (data → index → marker →
        pointer flip). Returns the new version number."""
        with dataset_write_lock(self.path, "managed_write"):
            current = latest_version(self.path)
            version, vdir = self._allocate()
            writer = df.write.mode("errorifexists")
            if partition_cols:
                writer = writer.partitionBy(*partition_cols)
            writer.parquet(vdir)
            self._write_index(vdir, new_files=_data_files(vdir))
            self._commit(version, vdir, expected=current)
            return version

    def append(self, df: DataFrame) -> int:
        """Append-as-new-version: the previous snapshot's data files are
        HARD-LINKED into the new version (zero copy, shared inodes) and
        only ``df``'s new files are written + footer-probed; the
        previous index rows are reused verbatim (file names are
        relative, and a linked file's stats are its stats). Cost is
        proportional to the APPENDED data, not the table."""
        with dataset_write_lock(self.path, "managed_append"):
            current = latest_version(self.path)
            if current is None:
                # first append = first snapshot; same commit protocol
                version, vdir = self._allocate()
                df.write.mode("errorifexists").parquet(vdir)
                self._write_index(vdir, new_files=_data_files(vdir))
                self._commit(version, vdir, expected=current)
                return version
            prev = _version_dir(self.path, current)
            prev_files = _data_files(prev)
            if any(os.sep in rel for rel in prev_files):
                raise ValueError(
                    "append() links flat file layouts only; the current "
                    "snapshot is partitioned — use write() to produce "
                    "the next partitioned snapshot"
                )
            version, vdir = self._allocate()
            df.write.mode("errorifexists").parquet(vdir)
            new_files = set(_data_files(vdir))
            for rel in prev_files:
                if rel in new_files:  # astronomically unlikely (UUIDs)
                    raise ConcurrentWriteError(
                        f"append file-name collision on {rel}"
                    )
                dst = os.path.join(vdir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.link(os.path.join(prev, rel), dst)
            self._write_index(
                vdir,
                new_files=sorted(new_files),
                reuse_from=os.path.join(prev, _INDEX_DIR),
            )
            self._commit(version, vdir, expected=current)
            return version

    def compact(self, target_file_rows: int = 1_000_000) -> int:
        """Small-file compaction as a NEW version: read the current
        snapshot, cluster into ~``target_file_rows``-row files, commit
        with a fresh index. Time travel to the pre-compaction layout
        keeps working (it is just version N-1); vacuum reclaims it.
        Returns the new version number."""
        with dataset_write_lock(self.path, "managed_compact"):
            current = latest_version(self.path)
            if current is None:
                raise FileNotFoundError(
                    f"no committed versions under {self.path}"
                )
            prev = _version_dir(self.path, current)
            df = self.spark.read.parquet(prev)
            n_rows = df.count()
            n_files = max(1, -(-n_rows // target_file_rows))
            version, vdir = self._allocate()
            # sort by the first index column so the compacted files'
            # min/max stats come out SELECTIVE, not random — compaction
            # is the natural moment to (re)cluster for skipping
            if self.index_cols:
                df = df.repartitionByRange(
                    n_files, *self.index_cols
                ).sortWithinPartitions(*self.index_cols)
            else:
                df = df.coalesce(n_files)
            (
                df.write.mode("errorifexists")
                .option("maxRecordsPerFile", target_file_rows)
                .parquet(vdir)
            )
            self._write_index(vdir, new_files=_data_files(vdir))
            self._commit(version, vdir, expected=current)
            return version

    # ---- read surface ----------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Time-travel read: the pointer's target by default."""
        v = self._resolve(version)
        return self.spark.read.parquet(_version_dir(self.path, v))

    def index(self, version: int | None = None) -> DataFrame:
        """The stored skipping index of a committed version — one row
        per (relative file, column) with min/max/null/row counts."""
        v = self._resolve(version)
        return self.spark.read.parquet(
            os.path.join(_version_dir(self.path, v), _INDEX_DIR)
        )

    def candidate_files(
        self, col: str, lo, hi, version: int | None = None
    ) -> list[str]:
        """Relative names of the files the version's index cannot rule
        out for ``col BETWEEN lo AND hi`` — NULL-stats files and files
        missing from the index (should not happen for a committed
        version, guarded anyway) stay candidates."""
        v = self._resolve(version)
        vdir = _version_dir(self.path, v)
        all_files = set(_data_files(vdir))
        if col not in self.index_cols:
            return sorted(all_files)  # unindexed column: no pruning
        idx = self.index(v).filter(F.col("col") == col)
        if isinstance(lo, str):
            mn, mx = F.col("min_str"), F.col("max_str")
        else:
            mn, mx = F.col("min_val"), F.col("max_val")
        keep = {
            r["file"]
            for r in idx.filter(
                mn.isNull() | ~((mx < lo) | (mn > hi))
            ).select("file").collect()
        }
        indexed = {r["file"] for r in idx.select("file").collect()}
        return sorted((keep & all_files) | (all_files - indexed))

    def pruned_read(
        self, col: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Read only the candidate files of the requested version, then
        re-apply the predicate (the index narrows the scan; the filter
        stays the source of truth — skipping is a performance contract,
        never a correctness one)."""
        v = self._resolve(version)
        vdir = _version_dir(self.path, v)
        cand = self.candidate_files(col, lo, hi, v)
        if not cand:
            return self.read(v).filter(F.lit(False))
        return (
            self.spark.read.parquet(
                *[os.path.join(vdir, rel) for rel in cand]
            ).filter(F.col(col).between(lo, hi))
        )

    # ---- internals ---------------------------------------------------------

    def _resolve(self, version: int | None) -> int:
        if version is None:
            version = latest_version(self.path)
            if version is None:
                raise FileNotFoundError(
                    f"no committed versions under {self.path}"
                )
        if version not in list_versions(self.path):
            raise FileNotFoundError(
                f"version {version} not committed under {self.path}"
            )
        return version

    def _allocate(self) -> tuple[int, str]:
        os.makedirs(self.path, exist_ok=True)
        existing = [
            int(e[2:])
            for e in os.listdir(self.path)
            if e.startswith("v=")
        ]  # incl. crashed marker-less dirs: never reuse their numbers
        version = max(existing, default=0) + 1
        return version, _version_dir(self.path, version)

    def _write_index(
        self,
        vdir: str,
        new_files: list[str],
        reuse_from: str | None = None,
    ) -> None:
        """Build the snapshot's index BEFORE its marker: footer-probe
        the new files (distributed, metadata-only), relativize the file
        names, union with the reused previous-version rows (append
        path), and land it at ``vdir/_index``."""
        if not self.index_cols:
            return
        frames = []
        if new_files:
            paths = self.spark.createDataFrame(
                [(os.path.join(vdir, rel),) for rel in new_files],
                "file string",
            )
            fresh = _index_paths(
                self.spark, paths, len(new_files), list(self.index_cols)
            )
            prefix = vdir.rstrip("/") + "/"
            frames.append(
                fresh.withColumn(
                    "file", F.expr(f"substring(file, {len(prefix) + 1})")
                )
            )
        if reuse_from is not None and os.path.isdir(reuse_from):
            frames.append(self.spark.read.parquet(reuse_from))
        if not frames:
            return
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        out.coalesce(1).write.mode("errorifexists").parquet(
            os.path.join(vdir, _INDEX_DIR)
        )

    def _commit(self, version: int, vdir: str, expected: int | None) -> None:
        """Marker + atomic pointer flip, with a pointer CAS: the write
        was computed while the pointer was at ``expected``; if it moved
        (a writer bypassing the lock), abort BEFORE the marker lands so
        this snapshot stays invisible crash-debris for vacuum."""
        if latest_version(self.path) != expected:
            raise ConcurrentWriteError(
                f"managed commit on {self.path}: pointer moved from "
                f"v={expected} to v={latest_version(self.path)} "
                "mid-write — a concurrent writer bypassed the writer "
                "lock; this snapshot is aborted (uncommitted)."
            )
        with open(os.path.join(vdir, _MARKER), "w", encoding="utf-8"):
            pass
        tmp = os.path.join(self.path, f"{_POINTER}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(self.path, _POINTER))
