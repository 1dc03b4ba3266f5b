"""Python DataSource connector (Spark 4 extension point).

The engine's custom-connector surface: `pyspark.sql.datasource
.DataSource` lets a pure-Python reader plug into ``spark.read.format``
with planner-visible schema and partition-granular parallelism — the
public way to add a source format Spark lacks, without JVM code.

Showcase implementation: ``fixedwidth``, the reference's ISD weather
layout (WeatherData.scala:2-12) as a registered format::

    register_python_sources(spark)
    df = (spark.read.format("fixedwidth")
          .option("spec", spec_option(ISD_WEATHER_SPEC))
          .load(path))
    df.write.format("fixedwidth").option("spec", ...).save(out)  # sink too
    spark.readStream.format("fixedwidth").option("spec", ...).load(dir)  # tail

Scale/role note: each input FILE is one ``InputPartition``, so a
directory of block-sized files parallelizes across executors like any
file source, and rows stream through Arrow batches back to the JVM.
But the parsing itself is Python-per-line — this is the
EXTENSIBILITY surface, not the hot path. For formats expressible as
column expressions, :func:`bigdatalab_spark.sources.readers
.read_fixed_width` (substring + try_cast over ``spark.read.text``)
stays entirely inside whole-stage codegen and is the performance
path; both parse the same spec and agree row-for-row (tested).
Reach for a Python DataSource when the format genuinely needs
imperative decoding (proprietary binary layouts, exotic APIs).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from bigdatalab_spark.sources.readers import FixedWidthField

_DTYPES = ("string", "int", "bigint", "double")


def spec_option(spec: Sequence[FixedWidthField]) -> str:
    """Serialize a fixed-width spec for the ``spec`` reader option:
    ``name:start:end:dtype[:scale]`` fields joined by commas."""
    parts = []
    for f in spec:
        s = f"{f.name}:{f.start}:{f.end}:{f.dtype}"
        if f.scale is not None:
            s += f":{f.scale}"
        parts.append(s)
    return ",".join(parts)


def parse_spec_option(option: str) -> list[FixedWidthField]:
    """Inverse of :func:`spec_option`, with validation (the executor
    re-parses the option string, so errors must be early and clear)."""
    fields: list[FixedWidthField] = []
    for part in option.split(","):
        bits = part.split(":")
        if len(bits) not in (4, 5):
            raise ValueError(f"bad spec field {part!r}: want name:start:end:dtype[:scale]")
        name, start, end, dtype = bits[:4]
        if dtype not in _DTYPES:
            raise ValueError(f"bad dtype {dtype!r} in {part!r}; one of {_DTYPES}")
        scale = float(bits[4]) if len(bits) == 5 else None
        fields.append(FixedWidthField(name, int(start), int(end), dtype, scale))
    if not fields:
        raise ValueError("empty fixed-width spec")
    return fields


def _parse_line(line: str, spec: list[FixedWidthField]) -> tuple:
    """One record per spec; malformed fields -> None (the try_cast
    policy of readers.read_fixed_width — bad data never aborts a job)."""
    out = []
    for f in spec:
        raw = line[f.start : f.end]
        if f.dtype == "string":
            # short lines slice to '' — matches substring()'s empty
            # string (not NULL) in readers.read_fixed_width
            out.append(raw)
            continue
        try:
            v: float | int = (
                float(raw.strip()) if f.dtype == "double" else int(raw.strip())
            )
        except ValueError:
            out.append(None)
            continue
        if f.scale is not None:
            v = v / f.scale
        out.append(v)
    return tuple(out)


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class FixedWidthReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("fixedwidth source requires a path (use .load(path))")
        spec = options.get("spec")
        if not spec:
            raise ValueError("fixedwidth source requires the 'spec' option")
        self.path = path
        self.spec = parse_spec_option(spec)

    def partitions(self) -> list[InputPartition]:
        # one partition per file: a directory of block-sized files reads
        # with file-level parallelism, like the built-in text source
        import os

        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
            )
        else:
            files = [self.path]
        if not files:
            raise ValueError(f"no input files under {self.path}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                yield _parse_line(line.rstrip("\n"), self.spec)


class FixedWidthDataSource(DataSource):
    """``spark.read.format("fixedwidth")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def schema(self) -> str:
        spec = self.options.get("spec")
        if not spec:  # schema() runs before reader(); fail clearly here
            raise ValueError("fixedwidth source requires the 'spec' option")
        return ", ".join(
            f"{f.name} {f.dtype}" if f.scale is None else f"{f.name} double"
            for f in parse_spec_option(spec)
        )

    def reader(self, schema) -> FixedWidthReader:
        return FixedWidthReader(dict(self.options))

    def writer(self, schema, overwrite: bool) -> "FixedWidthWriter":
        return FixedWidthWriter(dict(self.options), overwrite)

    def streamReader(self, schema) -> "FixedWidthStreamReader":
        return FixedWidthStreamReader(dict(self.options))


def register_python_sources(spark) -> None:
    """Register every Python DataSource this engine ships (idempotent —
    re-registration replaces the entry)."""
    from bigdatalab_spark.sources.managed_snapshot import (
        ManagedSnapshotDataSource,
    )
    from bigdatalab_spark.sources.managed_stream import (
        ManagedChangesDataSource,
    )

    spark.dataSource.register(FixedWidthDataSource)
    spark.dataSource.register(ManagedChangesDataSource)
    spark.dataSource.register(ManagedSnapshotDataSource)
    # the managed snapshot source prunes via pushFilters; the capability
    # is gated behind this conf (runtime-settable, checked at plan time)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def _render_line(row, spec: list[FixedWidthField]) -> str:
    """Inverse of :func:`_parse_line`: place each field into its
    [start, end) slot. Values that don't FIT their slot raise — silent
    truncation of numbers would corrupt data; strings are the lab
    layout's free-text tails and clip like the source format does."""
    width = max(f.end for f in spec)
    buf = [" "] * width
    for f, v in zip(spec, row):
        slot = f.end - f.start
        if v is None:
            continue  # spaces parse back to NULL (numeric) / '' (string)
        if f.dtype == "string":
            s = str(v)[:slot].ljust(slot)
        else:
            n = round(float(v) * f.scale) if f.scale is not None else v
            s = str(int(n)) if f.dtype != "double" or f.scale is not None else str(v)
            if len(s) > slot:
                raise ValueError(
                    f"value {v!r} does not fit field {f.name} (width {slot})"
                )
            s = s.rjust(slot)
        buf[f.start : f.end] = s
    return "".join(buf)


class _TaskFile(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int) -> None:
        self.tmp_path = tmp_path
        self.rows = rows


class FixedWidthWriter(DataSourceWriter):
    """Transactional fixed-width sink: each task streams its rows to a
    hidden temp file and returns it as the commit message; the DRIVER's
    ``commit`` renames temps to ``part-NNNNN.txt`` and drops
    ``_SUCCESS``, and ``abort`` deletes them — so a failed job leaves
    no partial output visible (the same task-temp -> job-commit
    protocol every Spark file sink uses, here through the Python
    DataSource extension point).

    SINGLE-MACHINE ASSUMPTION: commit/abort run on the DRIVER with
    local ``os.replace``/``os.listdir`` over temp files the executor
    tasks wrote — correct only when driver and executors share a
    filesystem (local mode, or a shared mount). On a real cluster the
    driver would find no temp files; ``commit`` guards this by failing
    loudly if tasks reported rows but no temp file is visible, instead
    of silently writing an empty dataset with ``_SUCCESS``. A
    cluster-grade writer would rename task-side (HDFS/S3 committer
    style); the reference exercise this twins is itself single-node
    (101-mapreduce fixed-width ISD writer)."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("fixedwidth sink requires a path (use .save(path))")
        spec = options.get("spec")
        if not spec:
            raise ValueError("fixedwidth sink requires the 'spec' option")
        self.path = path
        self.spec = parse_spec_option(spec)
        self.overwrite = overwrite

    def write(self, iterator) -> _TaskFile:
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}")
        rows = 0
        try:
            with open(tmp, "w", encoding="utf-8") as fh:
                for row in iterator:
                    fh.write(_render_line(row, self.spec) + "\n")
                    rows += 1
        except BaseException:
            # task-side cleanup: a failing task removes its own temp so
            # the driver's abort sweep can't race a straggler re-creating
            # it (a killed-without-exception task may still orphan one —
            # harmless: underscore-prefixed files are reader-invisible,
            # the same dead-bytes-not-wrong-data contract as Hadoop's
            # _temporary leftovers)
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass
            raise
        return _TaskFile(tmp, rows)

    def commit(self, messages) -> None:
        import os
        import uuid

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("part-"):
                    os.remove(os.path.join(self.path, f))
        job = uuid.uuid4().hex[:8]  # append jobs must not collide on names
        for i, m in enumerate(m for m in messages if m is not None):
            if m.rows and not os.path.exists(m.tmp_path):
                # driver can't see the executor's temp file: driver and
                # executors do NOT share a filesystem — fail loudly
                # instead of committing an empty dataset with _SUCCESS
                raise RuntimeError(
                    "fixedwidth sink: task temp file missing at commit "
                    f"({m.tmp_path}); this sink requires driver and "
                    "executors to share a filesystem (local mode)"
                )
            os.replace(
                m.tmp_path, os.path.join(self.path, f"part-{i:05d}-{job}.txt")
            )
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8"):
            pass

    def abort(self, messages) -> None:
        import os

        # messages carry None for failed tasks, and the FAILING task's
        # own temp never reaches the driver — sweep every _tmp- orphan
        # under the target instead (single committing writer per path,
        # the same assumption behind Hadoop's _temporary cleanup)
        try:
            leftovers = os.listdir(self.path)
        except FileNotFoundError:
            return
        for f in leftovers:
            if f.startswith("_tmp-"):
                try:
                    os.remove(os.path.join(self.path, f))
                except FileNotFoundError:
                    pass


class FixedWidthStreamReader(DataSourceStreamReader):
    """Streaming half of the ``fixedwidth`` format (Spark 4 Python
    streaming data source): tail a directory of fixed-width files as an
    unbounded stream, one micro-batch per offset range, one
    InputPartition per NEW file — so executors parse in parallel
    exactly like the batch reader, and a 1000-file backlog drains with
    1000-way parallelism, not driver-side.

    Offset model: ``{"upto": <last consumed file name>}`` over the
    lexicographically sorted listing. The source contract (same as
    log-shipping layouts everywhere): files land atomically (write
    temp + rename in) under monotonically non-decreasing names
    (timestamps, part counters), and are immutable once visible. A
    file arriving UNDER an already-committed name violates the
    contract and is skipped — name your files monotonically.

    Exactly-once: offsets are replayed by the checkpoint; a restarted
    query re-reads precisely the files in its uncommitted range and no
    others (pinned by the restart test).
    """

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("fixedwidth stream requires a path (use .load(path))")
        spec = options.get("spec")
        if not spec:
            raise ValueError("fixedwidth stream requires the 'spec' option")
        self.path = path
        self.spec = parse_spec_option(spec)

    def _listing(self) -> list[str]:
        import os

        if not os.path.isdir(self.path):
            # single-file mode: list the BASENAME so partitions() can
            # rejoin it onto dirname(self.path) — returning the full
            # path here would double the directory component for
            # relative inputs (dir/dir/file)
            if os.path.exists(self.path):
                return [os.path.basename(self.path)]
            return []
        return sorted(
            f for f in os.listdir(self.path) if not f.startswith(("_", "."))
        )

    def initialOffset(self) -> dict:
        return {"upto": ""}

    def latestOffset(self) -> dict:
        names = self._listing()
        return {"upto": names[-1] if names else ""}

    def partitions(
        self, start: dict, end: dict
    ) -> list[InputPartition]:
        import os

        base = self.path if os.path.isdir(self.path) else os.path.dirname(self.path) or "."
        names = [
            n for n in self._listing() if start["upto"] < n <= end["upto"]
        ]
        return [_FilePartition(os.path.join(base, n)) for n in names]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                yield _parse_line(line.rstrip("\n"), self.spec)

    def commit(self, end: dict) -> None:
        # offsets live in the query checkpoint; nothing source-side to
        # reclaim (files are the caller's to retire)
        pass
