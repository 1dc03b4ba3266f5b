"""ManagedTable facade: versioned snapshots + skipping index +
compaction behind one API, with the index committed ATOMICALLY with
each snapshot (data -> index -> marker -> pointer flip).

The invariant every test circles: for any committed version V,
``index(V)`` describes exactly ``V``'s data files, so
``pruned_read(..., version=V)`` equals the full scan's filter at V —
across appends, compactions, rollbacks, crashes, and concurrent
writers.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdatalab_spark.sources.locks import (
    ConcurrentWriteError,
    lockfile_path,
)
from bigdatalab_spark.sources.managed import ManagedTable, _data_files


def _mk(spark, lo: int, hi: int, parts: int = 2):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("score"),
            (F.col("id") % 7).cast("string").alias("tag"),
        )
        .repartition(parts)
    )


def _rows(df) -> list[tuple]:
    return sorted(map(tuple, df.collect()))


def test_managed_write_read_prune_roundtrip(spark, tmp_path):
    """First snapshot: index exists, candidate list prunes on a
    range-clustered column, pruned read == full filter."""
    t = ManagedTable(spark, str(tmp_path / "t"), index_cols=("k",))
    df = _mk(spark, 0, 1000).repartitionByRange(8, "k").sortWithinPartitions("k")
    v = t.write(df)
    assert v == 1 and t.latest() == 1 and t.versions() == [1]

    n_files = len(_data_files(str(tmp_path / "t" / "v=1")))
    assert n_files == 8
    cand = t.candidate_files("k", 100, 200)
    assert 0 < len(cand) < n_files
    got = _rows(t.pruned_read("k", 100, 200))
    want = _rows(t.read().filter(F.col("k").between(100, 200)))
    assert got == want and got
    # the pruned plan really scans fewer files
    assert len(t.pruned_read("k", 100, 200).inputFiles()) == len(cand)
    # index rows use RELATIVE names, no version-dir leakage
    assert all("/" not in r["file"] for r in t.index().collect())


def test_managed_append_links_files_and_reuses_index(spark, tmp_path):
    """Append: new version = hard-linked old files + new files; only
    the new files were footer-probed (old index rows reused verbatim);
    pruning at the new version is exact, and the OLD version still
    reads/prunes its own snapshot (time travel)."""
    t = ManagedTable(spark, str(tmp_path / "t"), index_cols=("k",))
    t.write(_mk(spark, 0, 500, parts=2))
    v2 = t.append(_mk(spark, 500, 1000, parts=2))
    assert v2 == 2 and t.versions() == [1, 2]

    v1dir, v2dir = str(tmp_path / "t" / "v=1"), str(tmp_path / "t" / "v=2")
    f1, f2 = _data_files(v1dir), _data_files(v2dir)
    assert set(f1) < set(f2) and len(f2) == len(f1) + 2
    # linked, not copied: same inode
    for rel in f1:
        assert os.stat(os.path.join(v1dir, rel)).st_ino == os.stat(
            os.path.join(v2dir, rel)
        ).st_ino
    # reused index rows: v2's index covers every v2 file, incl. linked
    assert {r["file"] for r in t.index(2).collect()} == set(f2)

    got = _rows(t.pruned_read("k", 400, 600))
    want = _rows(t.read().filter(F.col("k").between(400, 600)))
    assert got == want and got
    # time travel: v1 sees only its own rows, pruned identically
    got1 = _rows(t.pruned_read("k", 400, 600, version=1))
    want1 = _rows(t.read(1).filter(F.col("k").between(400, 600)))
    assert got1 == want1
    assert max(r[0] for r in got1) < 500

    # appending onto a partitioned snapshot is refused loudly
    tp = ManagedTable(spark, str(tmp_path / "tp"), index_cols=("k",))
    tp.write(_mk(spark, 0, 50), partition_cols=("tag",))
    with pytest.raises(ValueError, match="partitioned"):
        tp.append(_mk(spark, 50, 60))


def test_managed_compact_preserves_content_and_reindexes(spark, tmp_path):
    """Compaction is a new version: fewer files, identical rows, FRESH
    index that prunes on the recluster — and the pre-compaction
    version remains time-travelable with ITS index."""
    t = ManagedTable(spark, str(tmp_path / "t"), index_cols=("k",))
    t.write(_mk(spark, 0, 300, parts=3))
    for lo in range(300, 1200, 300):
        t.append(_mk(spark, lo, lo + 300, parts=3))
    pre = t.latest()
    files_pre = len(_data_files(str(tmp_path / "t" / f"v={pre}")))
    assert files_pre == 12

    v = t.compact(target_file_rows=300)
    files_post = len(_data_files(str(tmp_path / "t" / f"v={v}")))
    assert files_post < files_pre
    assert _rows(t.read(v)) == _rows(t.read(pre))

    # fresh index prunes: compaction range-clusters on index_cols
    cand = t.candidate_files("k", 0, 100)
    assert 0 < len(cand) < files_post
    got = _rows(t.pruned_read("k", 0, 100))
    want = _rows(t.read().filter(F.col("k").between(0, 100)))
    assert got == want
    # pre-compaction version still prunes through its own index
    got_pre = _rows(t.pruned_read("k", 0, 100, version=pre))
    assert got_pre == want


def test_managed_rollback_and_vacuum_keep_index_coherent(spark, tmp_path):
    """Rollback is a pointer move — reads AND pruning follow it with
    zero index work; vacuum drops old snapshots but never the pointer
    target, and hard-link-shared files survive their source's vacuum."""
    t = ManagedTable(spark, str(tmp_path / "t"), index_cols=("k",))
    t.write(_mk(spark, 0, 200))
    t.append(_mk(spark, 200, 400))
    t.append(_mk(spark, 400, 600))

    t.rollback(2)
    assert t.latest() == 2
    got = _rows(t.pruned_read("k", 150, 250))
    want = _rows(t.read().filter(F.col("k").between(150, 250)))
    assert got == want and max(r[0] for r in got) < 400

    removed = t.vacuum(keep_last=1)
    # v=2 is the pointer target: kept even though keep_last=1 would
    # prefer the newest (v=3)
    assert 2 in t.versions()
    assert 1 in removed
    # v=2's files were hard-linked from v=1; the data must survive
    # v=1's deletion
    assert t.read(2).count() == 400
    assert _rows(t.pruned_read("k", 150, 250)) == got


def test_managed_crash_leaves_no_visible_damage(spark, tmp_path):
    """Crash drills on the commit protocol: (a) a version dir without a
    marker (crash before commit) is invisible to reads and version
    lists, never reused, and vacuumable; (b) a marker without a pointer
    flip (crash between) leaves the pointer on the old version — reads
    and pruning stay on the old snapshot."""
    t = ManagedTable(spark, str(tmp_path / "t"), index_cols=("k",))
    t.write(_mk(spark, 0, 100))

    # (a) crash BEFORE marker: fabricate debris the way a killed write
    # leaves it — data files but no _COMMITTED
    debris = str(tmp_path / "t" / "v=2")
    _mk(spark, 100, 200).write.parquet(debris)
    assert t.versions() == [1] and t.latest() == 1
    assert t.read().count() == 100
    v = t.append(_mk(spark, 100, 150))  # allocator skips past debris
    assert v == 3
    assert t.read().count() == 150
    t.vacuum(keep_last=5)
    assert not os.path.exists(debris)  # debris reclaimed, versions kept
    assert t.versions() == [1, 3]

    # (b) crash AFTER marker, BEFORE flip: committed but unreferenced —
    # pointer (and reads) stay on v=3; the orphan is time-travelable
    orphan = str(tmp_path / "t" / "v=4")
    _mk(spark, 150, 160).coalesce(1).write.parquet(orphan)
    open(os.path.join(orphan, "_COMMITTED"), "w").close()
    assert t.latest() == 3
    assert t.read().count() == 150
    assert 4 in t.versions() and t.read(4).count() == 10


def test_managed_single_writer_and_snapshot_isolated_reader(spark, tmp_path):
    """Concurrency contract: a held writer lock makes every mutator
    raise ConcurrentWriteError (write/append/compact/vacuum/rollback);
    a reader's DataFrame bound to version N keeps returning N's rows
    after the pointer moves (snapshot isolation on immutable dirs)."""
    path = str(tmp_path / "t")
    t = ManagedTable(spark, path, index_cols=("k",))
    t.write(_mk(spark, 0, 100))

    reader = t.read()  # bound to v=1's directory
    before = _rows(reader)

    lock = lockfile_path(path)
    with open(lock, "w", encoding="utf-8") as fh:
        fh.write(f"{os.getpid() + 1} otherhost")  # live foreign holder
    try:
        for op in (
            lambda: t.write(_mk(spark, 0, 10)),
            lambda: t.append(_mk(spark, 0, 10)),
            lambda: t.compact(),
            lambda: t.vacuum(),
            lambda: t.rollback(1),
        ):
            with pytest.raises(ConcurrentWriteError):
                op()
    finally:
        os.remove(lock)
    assert t.versions() == [1]  # nothing half-committed

    t.append(_mk(spark, 100, 200))
    assert t.latest() == 2 and t.read().count() == 200
    # the pre-append reader still sees exactly v=1
    assert _rows(reader) == before


def test_managed_commit_cas_detects_lock_bypass(spark, tmp_path):
    """Belt and braces: if the pointer moves mid-write (a writer that
    bypassed the lock), the commit aborts BEFORE its marker lands, so
    the half-built snapshot stays invisible debris."""
    path = str(tmp_path / "t")
    t = ManagedTable(spark, path, index_cols=("k",))
    t.write(_mk(spark, 0, 100))

    moved = {"done": False}
    orig = t._write_index

    def sabotage(vdir, new_files, reuse_from=None):
        orig(vdir, new_files=new_files, reuse_from=reuse_from)
        if not moved["done"]:
            moved["done"] = True
            # simulate a rogue writer flipping the pointer mid-commit
            with open(os.path.join(path, "_latest"), "w") as fh:
                fh.write("1\n")
            with open(os.path.join(path, "_latest"), "w") as fh:
                fh.write("99")

    t._write_index = sabotage
    try:
        with pytest.raises(ConcurrentWriteError, match="pointer moved"):
            t.write(_mk(spark, 100, 200))
    finally:
        t._write_index = orig
    # restore a sane pointer and confirm the aborted snapshot never
    # became a version
    with open(os.path.join(path, "_latest"), "w") as fh:
        fh.write("1")
    assert t.versions() == [1]
    assert t.read().count() == 100
