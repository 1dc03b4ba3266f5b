"""Custom pluggable source via the Python DataSource API (Spark 4).

The extension surface the reference era lacked entirely: a user-defined
source that plugs into ``spark.read.format(...)`` / ``readStream`` with
schema, options, and PARTITIONED reads — the contract a connector to an
internal service/queue implements. The synthetic generator here is the
test double: deterministic rows from (seed, partition, row) arithmetic,
so tests can assert exact content and partition layout.

Scale notes: ``partitions()`` is the parallelism contract — one
``InputPartition`` per split, each read independently on an executor
(here: ``num_partitions`` splits; a real connector returns one per
shard/file/offset-range). Rows cross the Python-JVM boundary via Arrow
batches, but per-row generation IS Python — this API is for
integration boundaries, never a replacement for parquet scans on the
hot path. The streaming half implements the simple-reader contract
(initialOffset/read/readBetweenOffsets): each microbatch emits one
deterministic batch and advances the offset — the replayable-source
property Structured Streaming's exactly-once recovery depends on.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("click", "view", "purchase")


def _row(seed: int, pid: int, i: int) -> tuple:
    """Deterministic row from pure arithmetic (no RNG state)."""
    h = (seed * 1_000_003 + pid * 10_007 + i * 101) % 2_147_483_647
    event_id = pid * 1_000_000 + i
    return (
        event_id,
        h % 1000,
        EVENT_TYPES[h % len(EVENT_TYPES)],
        float(h % 10_000) / 100.0,
    )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.num_partitions = int(options.get("num_partitions", 4))
        self.rows_per_partition = int(options.get("rows_per_partition", 100))
        self.seed = int(options.get("seed", 7))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        pid = partition.value
        for i in range(self.rows_per_partition):
            yield _row(self.seed, pid, i)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 10))
        self.seed = int(options.get("seed", 7))
        self.max_batches = int(options.get("max_batches", 3))

    def initialOffset(self):
        return {"batch": 0}

    def read(self, start):
        # "what is available NOW": drain every pending batch in one
        # call (a queue/log source returns all records up to its
        # current end offset; AvailableNow polls read() once)
        b = start["batch"]
        if b >= self.max_batches:
            return [], {"batch": b}
        rows = []
        for batch in range(b, self.max_batches):
            rows.extend(self._batch_row(batch, i) for i in range(self.rows_per_batch))
        return iter(rows), {"batch": self.max_batches}

    def readBetweenOffsets(self, start, end):
        # replay contract: regenerating [start, end) must return the
        # SAME rows — deterministic arithmetic makes this trivial
        rows = []
        for b in range(start["batch"], end["batch"]):
            rows.extend(self._batch_row(b, i) for i in range(self.rows_per_batch))
        return iter(rows)

    def _batch_row(self, b: int, i: int) -> tuple:
        return _row(self.seed, b, i)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after registration via
    :func:`register_synthetic_source`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, value double"

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
