"""Single-writer commit lock for the plain-parquet dataset sinks.

The versioned and in-place MERGE sinks are read-modify-write: they read
the current snapshot, combine it with the updates, and install the
result. Two concurrent merges that both read version N will both build
on N and the last pointer flip silently discards the other writer's
rows — the classic lost update. Real table formats serialize commits
with an atomic log append (Delta) or a catalog CAS (Iceberg); on a
plain filesystem the equivalent primitive is an exclusive lockfile
(``O_CREAT | O_EXCL`` is atomic on POSIX) held across the
read-modify-write, plus a pointer re-check before the flip so a writer
that somehow bypassed the lock still fails loudly instead of losing
data.

Scope: one filesystem, cooperating writers. A writer that crashes while
holding the lock leaves it behind; the error message names the file and
the holder's pid so an operator can verify the pid is gone and remove
it. (Lease/timeout auto-recovery is a distributed-coordination problem
the real formats solve with their catalog — out of scope for the
filesystem twin, exactly like versioned.py's storage-sharing note.)
"""

from __future__ import annotations

import contextlib
import os

class ConcurrentWriteError(RuntimeError):
    """Another writer holds the dataset lock, or the version pointer
    moved underneath a read-modify-write merge."""


def lockfile_path(path: str) -> str:
    """The dataset's lockfile is a SIBLING of the dataset directory
    (``<path>__writer.lock``), never a child: compaction's pointer flip
    renames the dataset directory itself, and a child lockfile would
    ride the rename (vanishing from the live path mid-critical-section)
    — worse, creating the dataset dir just to hold the lock would make
    a crashed flip's recovery see an "existing" (empty) dataset and
    delete the only surviving copy."""
    return path.rstrip("/") + "__writer.lock"


@contextlib.contextmanager
def dataset_write_lock(path: str, what: str = "write"):
    """Exclusive per-dataset writer lock (atomic lockfile create).

    Raises :class:`ConcurrentWriteError` immediately if another writer
    holds it — merges are not queued, because by the time the lock
    frees the waiter's planned input version is stale anyway; the
    caller should re-read and retry the whole merge.
    """
    parent = os.path.dirname(os.path.abspath(path.rstrip("/")))
    os.makedirs(parent, exist_ok=True)
    lock = lockfile_path(path)
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        holder = ""
        with contextlib.suppress(OSError):
            with open(lock, encoding="utf-8") as fh:
                holder = fh.read().strip()
        raise ConcurrentWriteError(
            f"{what} on {path}: another writer holds {lock}"
            + (f" (pid {holder})" if holder else "")
            + " — concurrent read-modify-write commits would silently"
            " discard each other's rows. Retry after it completes; if"
            " that writer crashed, verify the pid is gone and remove"
            " the lockfile."
        ) from None
    try:
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.remove(lock)
