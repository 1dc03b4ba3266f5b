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
holding the lock leaves the lockfile behind; when the recorded holder
is a SAME-HOST pid that no longer exists, acquisition takes the lock
over automatically (serialized through a second O_EXCL "takeover"
file + atomic rename, so two waiters cannot both win). Cross-host or
still-live holders raise as before — pid liveness on another machine
is a distributed-coordination problem the real formats solve with
their catalog, out of scope for the filesystem twin.
"""

from __future__ import annotations

import contextlib
import os
import socket


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


def _holder(lock: str) -> tuple[int | None, str]:
    """Parse ``pid host`` from a lockfile. Returns (None, raw) when the
    contents are unreadable or garbage — callers treat that as a live
    holder (conservative: never steal a lock we can't attribute)."""
    try:
        with open(lock, encoding="utf-8") as fh:
            raw = fh.read().strip()
    except OSError:
        return None, ""
    parts = raw.split()
    try:
        return int(parts[0]), (parts[1] if len(parts) > 1 else "")
    except (ValueError, IndexError):
        return None, raw


def _pid_gone(pid: int) -> bool:
    """True only when the pid verifiably does not exist on THIS host.
    EPERM means it exists but belongs to another user — still live."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return True
    except PermissionError:
        return False
    except OSError:
        return False
    return False


def _stamp() -> bytes:
    return f"{os.getpid()} {socket.gethostname()}".encode()


def _try_takeover(lock: str) -> bool:
    """Steal ``lock`` iff its recorded holder is a dead same-host pid.

    Serialization: the takeover file (``<lock>.takeover``) is created
    with O_EXCL, so at most one waiter performs the steal; the steal
    itself is an atomic rename over the stale lockfile, so a normal
    O_CREAT|O_EXCL acquirer can never slip in between (the path is
    never unlinked). A crashed taker-over leaves the takeover file
    behind — it carries a pid too, and gets the same dead-pid cleanup
    one level down (no further recursion: the window is a few
    syscalls, not a Spark job).
    """
    pid, host = _holder(lock)
    if pid is None or (host and host != socket.gethostname()):
        return False
    if not _pid_gone(pid):
        return False
    tko = lock + ".takeover"
    try:
        fd = os.open(tko, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        tpid, thost = _holder(tko)
        if (
            tpid is not None
            and (not thost or thost == socket.gethostname())
            and _pid_gone(tpid)
        ):
            with contextlib.suppress(FileNotFoundError):
                os.remove(tko)
        return False  # another takeover in flight (or just cleaned) — retry
    try:
        os.write(fd, _stamp())
        os.close(fd)
        # Re-check under the takeover file: the stale holder cannot have
        # come back to life, but a PREVIOUS successful takeover may have
        # already replaced the lock with a live writer's stamp.
        pid2, host2 = _holder(lock)
        if (
            pid2 is None
            or pid2 != pid
            or (host2 and host2 != socket.gethostname())
            or not _pid_gone(pid2)
        ):
            return False
        os.rename(tko, lock)  # atomic: we now hold the lock
        return True
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.remove(tko)  # no-op when the rename consumed it


@contextlib.contextmanager
def dataset_write_lock(path: str, what: str = "write"):
    """Exclusive per-dataset writer lock (atomic lockfile create).

    Raises :class:`ConcurrentWriteError` immediately if another writer
    holds it — merges are not queued, because by the time the lock
    frees the waiter's planned input version is stale anyway; the
    caller should re-read and retry the whole merge. A lock whose
    recorded holder is a dead same-host pid is taken over automatically
    (crashed-writer recovery); live or cross-host holders raise.
    """
    parent = os.path.dirname(os.path.abspath(path.rstrip("/")))
    os.makedirs(parent, exist_ok=True)
    lock = lockfile_path(path)
    acquired = False
    for attempt in (0, 1):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, _stamp())
            os.close(fd)
            acquired = True
            break
        except FileExistsError:
            if attempt == 0 and _try_takeover(lock):
                acquired = True
                break
    if not acquired:
        pid, host = _holder(lock)
        holder = f"pid {pid}" + (f" on {host}" if host else "") if pid else ""
        raise ConcurrentWriteError(
            f"{what} on {path}: another writer holds {lock}"
            + (f" ({holder})" if holder else "")
            + " — concurrent read-modify-write commits would silently"
            " discard each other's rows. Retry after it completes;"
            " a crashed same-host writer's lock is recovered"
            " automatically on the next attempt."
        )
    try:
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.remove(lock)
