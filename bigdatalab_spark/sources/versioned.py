"""Versioned datasets on plain parquet: time travel, rollback, vacuum.

The table-format trio (Delta/Iceberg/Hudi) builds on one primitive:
writers create IMMUTABLE snapshots and readers follow a pointer — so
reads are repeatable (train/eval reproducibility), a bad load is
undone by moving the pointer, and storage is reclaimed explicitly.
This module rebuilds that primitive on a directory layout:

    path/v=1/...parquet + _COMMITTED      (immutable snapshot)
    path/v=2/...parquet + _COMMITTED
    path/_latest                          (pointer file: "2")

Commit protocol: a snapshot directory is INVISIBLE until its
``_COMMITTED`` marker lands, and the pointer file is replaced
atomically (write-temp + rename) — a crash mid-write leaves a
marker-less directory that every reader and the next writer ignore,
and a crash before the pointer flip leaves ``_latest`` on the old
snapshot. Same failure story as the engine's crash-safe compaction.

Scale note: snapshots share nothing (full copies), which is the right
tradeoff for curated training-set releases (tens of versions of
terabyte datasets, each immutable); incremental storage sharing is
what the real table formats add on top via file-level manifests —
out of scope here, the SEMANTICS are what the engine contracts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from bigdatalab_spark.sources.locks import (
    ConcurrentWriteError,
    dataset_write_lock,
)

_POINTER = "_latest"
_MARKER = "_COMMITTED"
#: tombstone for a vacuumed version directory that must stay on disk
#: because surviving manifests still REFERENCE files homed in it (the
#: managed facade's reference data plane). The directory is no longer
#: a committed version (invisible to list_versions / rollback / time
#: travel); it is physical storage awaiting its last reference.
_HOMEONLY = "_HOMEONLY"
#: grace period before vacuum treats a STAMPLESS ``.txn_setup_``
#: scratch dir as crash debris: a live optimistic writer is between
#: mkdir and its ``_RESERVED`` stamp write for microseconds — any
#: stampless dir older than this really did crash mid-setup.
_SETUP_GRACE_S = 60.0


def _version_dir(path: str, version: int) -> str:
    return os.path.join(path, f"v={version}")


def list_versions(path: str) -> list[int]:
    """Committed snapshot versions, ascending (marker-less directories
    are in-flight or crashed writes and are not versions)."""
    try:
        entries = os.listdir(path)
    except FileNotFoundError:
        return []
    out = []
    for e in entries:
        if e.startswith("v=") and os.path.exists(
            os.path.join(path, e, _MARKER)
        ):
            out.append(int(e[2:]))
    return sorted(out)


def latest_version(path: str) -> int | None:
    """The pointer's target, or None for an empty dataset."""
    try:
        with open(os.path.join(path, _POINTER), encoding="utf-8") as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def write_version(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ()
) -> int:
    """Write ``df`` as the next immutable snapshot and flip the pointer.
    Returns the new version number. Crash-safe: the snapshot is
    invisible until its marker lands, and the pointer replace is atomic.
    Concurrency-safe: the writer lock serializes version allocation and
    the flip, so two simultaneous writers cannot commit out of order
    (raises :class:`ConcurrentWriteError` instead of queueing)."""
    with dataset_write_lock(path, "write_version"):
        return _write_version_locked(df, path, partition_cols)


def _write_version_locked(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ()
) -> int:
    os.makedirs(path, exist_ok=True)
    existing = [
        int(e[2:]) for e in os.listdir(path) if e.startswith("v=")
    ]  # incl. crashed marker-less dirs: never reuse their numbers
    version = max(existing, default=0) + 1
    vdir = _version_dir(path, version)
    writer = df.write.mode("errorifexists")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(vdir)
    with open(os.path.join(vdir, _MARKER), "w", encoding="utf-8"):
        pass
    tmp = os.path.join(path, f"{_POINTER}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(path, _POINTER))
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time travel: read a specific committed snapshot, or the pointer's
    target by default."""
    if version is None:
        version = latest_version(path)
        if version is None:
            raise FileNotFoundError(f"no committed versions under {path}")
    if version not in list_versions(path):
        raise FileNotFoundError(f"version {version} not committed under {path}")
    return spark.read.parquet(_version_dir(path, version))


def rollback(path: str, version: int) -> None:
    """Undo to an earlier snapshot by moving ONLY the pointer — the
    rolled-back-over versions stay readable (and vacuumable). Takes the
    writer lock: a rollback racing a merge would otherwise be silently
    undone by the merge's pointer flip (or worse, the merge commits a
    combine of the version the rollback just rejected)."""
    with dataset_write_lock(path, "rollback"):
        # Existence check must run UNDER the lock: a concurrent vacuum
        # (which holds the lock and deletes non-pointer-target versions)
        # could remove the target between an early check and the pointer
        # flip, leaving _latest pointing at a deleted snapshot.
        if version not in list_versions(path):
            raise FileNotFoundError(
                f"version {version} not committed under {path}"
            )
        tmp = os.path.join(path, f"{_POINTER}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(path, _POINTER))


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Reclaim storage: delete committed snapshots beyond the newest
    ``keep_last``, never the pointer's target, plus any crashed
    marker-less directories. Returns the versions removed.

    Takes the writer lock: "marker-less directory" is indistinguishable
    from a LIVE writer's snapshot mid-write — vacuuming while a merge
    is in flight would delete the files it is still producing. Under
    the lock, any marker-less dir really is crash debris."""
    with dataset_write_lock(path, "vacuum"):
        return _vacuum_locked(path, keep_last)


def _reserved_live(vdir: str) -> bool:
    """True when a marker-less dir carries a ``_RESERVED`` stamp from
    a LIVE same-host writer (an optimistic transaction mid-flight, not
    crash debris) or from a writer we cannot attribute (another host —
    conservative). Dead same-host stamps are debris: clean."""
    from bigdatalab_spark.sources.locks import _holder, _pid_gone
    import socket

    stamp = os.path.join(vdir, "_RESERVED")
    if not os.path.exists(stamp):
        return False
    pid, host = _holder(stamp)
    if pid is None:
        return True  # unreadable stamp: never delete what we can't attribute
    if host and host != socket.gethostname():
        return True  # cross-host liveness is unknowable here
    return not _pid_gone(pid)


def _referenced_homes(path: str, retained: set[int]) -> set[int]:
    """Versions whose directories physically HOME files referenced by
    the RETAINED versions' manifests (the managed facade's reference
    data plane) — deleting those directories would destroy live data
    of surviving versions. Driver-side pyarrow read of one manifest
    column, metadata-sized; manifests predating the ``home`` column
    are self-homed by construction and contribute nothing beyond
    their own (retained) version."""
    import pyarrow.parquet as pq

    homes: set[int] = set()
    for v in retained:
        d = os.path.join(_version_dir(path, v), "_manifest")
        if not os.path.isdir(d):
            continue
        for part in sorted(os.listdir(d)):
            if not part.endswith(".parquet") or part.startswith(("_", ".")):
                continue
            f = os.path.join(d, part)
            if "home" not in pq.read_schema(f).names:
                continue
            homes |= {
                h
                for h in pq.read_table(f, columns=["home"])
                .column("home")
                .to_pylist()
                if h is not None
            }
    return homes


def _vacuum_locked(
    path: str,
    keep_last: int,
    protect: set[int] | None = None,
    extra_keep: set[int] | None = None,
) -> list[int]:
    """``protect`` names version directories that physically HOME
    files surviving manifests still reference (the managed facade's
    reference data plane) — deleting them would destroy live data of
    newer versions. The retained versions' manifest homes are ALWAYS
    added to the protect set here (``_referenced_homes``), so the bare
    module-level :func:`vacuum` is exactly as safe on a
    reference-plane managed table as the facade's own entry point;
    ``protect`` lets callers widen the set further. A protected
    directory beyond the retention window is DEMOTED instead of
    deleted: its ``_COMMITTED`` marker becomes a ``_HOMEONLY``
    tombstone, so it stops being a version (no time travel, no
    rollback target — the version IS vacuumed, and counts in the
    returned list) while its bytes stay on disk until the last
    referencing manifest is itself vacuumed."""
    import shutil
    import time

    committed = list_versions(path)
    keep = set(committed[-keep_last:]) if keep_last > 0 else set()
    if extra_keep:
        # time-based / policy retention from the caller (the managed
        # facade's keep_days); only committed versions can be kept
        keep |= set(extra_keep) & set(committed)
    current = latest_version(path)
    if current is not None:
        keep.add(current)
    protect = set(protect) if protect else set()
    protect |= _referenced_homes(path, keep) - keep
    removed = []
    for e in list(os.listdir(path)):
        if e.startswith(".txn_setup_"):
            # a crashed writer's mid-setup scratch (managed.py
            # _allocate_staging renames these into _txn_ once
            # stamped); same dead-pid attribution as _txn_ dirs. A
            # STAMPLESS dir younger than the grace period is a LIVE
            # writer between mkdir and its stamp write — skip it;
            # genuine crash debris ages past the grace and is swept
            # on a later vacuum.
            full = os.path.join(path, e)
            if _reserved_live(full):
                continue
            if not os.path.exists(os.path.join(full, "_RESERVED")):
                try:
                    age = time.time() - os.stat(full).st_mtime
                except FileNotFoundError:
                    continue  # renamed into _txn_ mid-scan: live
                if age < _SETUP_GRACE_S:
                    continue
            shutil.rmtree(full)
            continue
        if e.startswith("_txn_"):
            # an OPTIMISTIC transaction's staging dir: its writer is
            # alive and holds no lock during compute — not debris
            # unless its _RESERVED stamp names a dead same-host pid
            if not _reserved_live(os.path.join(path, e)):
                shutil.rmtree(os.path.join(path, e))
            continue
        if not e.startswith("v="):
            continue
        v = int(e[2:])
        committed = os.path.exists(os.path.join(path, e, _MARKER))
        if committed and v in keep:
            continue
        if v in protect:
            if committed:
                # demote: the version is vacuumed, the bytes are not
                os.replace(
                    os.path.join(path, e, _MARKER),
                    os.path.join(path, e, _HOMEONLY),
                )
                removed.append(v)
            # already-demoted (or just demoted) still-referenced home:
            # keep the directory
            continue
        shutil.rmtree(os.path.join(path, e))
        if committed:
            removed.append(v)
    return sorted(removed)


def merge_into_versioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
    order_col: str | None = None,
) -> dict:
    """MERGE (upsert) composed with the versioned-dataset primitive —
    the answer to the in-place sink's hand-rolled crash story: every
    merge lands as a NEW immutable snapshot, so

    - a crash mid-merge leaves a marker-less directory the next writer
      and every reader ignore; the retry simply builds the next
      version — no recovery sweep, no staging protocol;
    - undoing a bad merge is :func:`rollback` — a pointer write — with
      the full history still readable via :func:`read_version`;
    - readers mid-merge keep seeing the old pointer target (snapshot
      isolation), where the in-place rewrite briefly hides partitions.

    Storage does NOT multiply by versions: untouched partitions are
    HARD-LINKED from the previous snapshot (file-level sharing, the
    physical twin of a table format's manifest reuse — same inode, new
    directory entry), and only the partitions present in ``updates``
    are written fresh. ``vacuum`` drops old snapshots' directory
    entries; shared files survive until their last link goes.

    Same contracts as ``merge_into_partitions``: key-unique updates,
    partition-stable keys; ``order_col`` makes the merge order-aware
    (stored-vs-update max, safe under out-of-order batches).

    Returns ``{"version", "partitions_rewritten", "partitions_linked"}``.

    Concurrency: the writer lock is held across the whole
    read-modify-write (read pointer → combine → link → flip), so two
    simultaneous merges cannot both build on the same base version and
    silently discard each other — the second raises
    :class:`ConcurrentWriteError` at entry (retry = re-read + re-merge).
    A pointer re-check immediately before the flip turns any bypass of
    the lock into a loud failure instead of a lost update.
    """
    if not key_cols or not partition_cols:
        raise ValueError(
            "merge_into_versioned requires key and partition columns"
        )
    with dataset_write_lock(path, "merge_into_versioned"):
        return _merge_into_versioned_locked(
            spark, path, updates, key_cols, partition_cols, order_col
        )


def _merge_into_versioned_locked(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    partition_cols: tuple[str, ...],
    order_col: str | None,
) -> dict:
    from bigdatalab_spark.sources.sinks import (
        merge_frames,
        partition_prune_predicate,
    )

    current = latest_version(path)
    if current is None:
        version = _write_version_locked(updates, path, partition_cols)
        n_parts = updates.select(*partition_cols).distinct().count()
        return {
            "version": version,
            "partitions_rewritten": n_parts,
            "partitions_linked": 0,
        }

    affected = [
        tuple(r[c] for c in partition_cols)
        for r in updates.select(*partition_cols).distinct().collect()
    ]
    target = spark.read.parquet(_version_dir(path, current))
    if not affected:
        # empty batch: snapshot is the previous one — no new version
        return {
            "version": current,
            "partitions_rewritten": 0,
            "partitions_linked": 0,
        }
    merged = merge_frames(
        target.filter(partition_prune_predicate(affected, partition_cols)),
        updates,
        key_cols,
        order_col,
    )

    existing = [int(e[2:]) for e in os.listdir(path) if e.startswith("v=")]
    version = max(existing, default=0) + 1
    vdir = _version_dir(path, version)
    # 1) write the rewritten partitions fresh into the invisible snapshot
    merged.write.mode("errorifexists").partitionBy(*partition_cols).parquet(vdir)
    # 2) hard-link every leaf partition of the previous snapshot that the
    # write did NOT produce (directory presence = rewritten): same bytes,
    # zero copy, old snapshot untouched
    prev = _version_dir(path, current)
    linked = 0
    for dirpath, _dirnames, filenames in os.walk(prev):
        parquet = [f for f in filenames if f.endswith(".parquet")]
        if not parquet:
            continue
        rel = os.path.relpath(dirpath, prev)
        if rel == ".":
            # unpartitioned files at the root only occur with no
            # partition_cols, which this sink requires
            continue
        dst = os.path.join(vdir, rel)
        if os.path.exists(dst):
            continue  # rewritten by the merge
        os.makedirs(dst, exist_ok=True)
        for f in parquet:
            os.link(os.path.join(dirpath, f), os.path.join(dst, f))
        linked += 1
    # 3) CAS: the merge was computed against `current`; if the pointer
    # moved (a writer bypassing the lock), committing would discard that
    # writer's merge. Abort BEFORE the marker lands so this snapshot
    # stays invisible crash-debris for vacuum.
    if latest_version(path) != current:
        raise ConcurrentWriteError(
            f"merge_into_versioned on {path}: pointer moved from "
            f"v={current} to v={latest_version(path)} mid-merge — a "
            "concurrent writer bypassed the writer lock; this merge was "
            "based on the old snapshot and is aborted (uncommitted). "
            "Retry to re-merge against the new current version."
        )
    # commit marker, then atomic pointer flip
    with open(os.path.join(vdir, _MARKER), "w", encoding="utf-8"):
        pass
    tmp = os.path.join(path, f"{_POINTER}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(path, _POINTER))
    return {
        "version": version,
        "partitions_rewritten": len(affected),
        "partitions_linked": linked,
    }
