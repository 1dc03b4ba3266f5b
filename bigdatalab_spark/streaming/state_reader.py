"""Offline state-store inspection (Spark 4 state data source).

At 100 TB the streaming state IS a dataset: a sessionization or
streaming-dedup job can hold billions of keys across a thousand
executors, and "what is in the state right now?" must be answerable
without attaching a debugger to a running query. Spark 4's
``statestore`` batch source reads a checkpoint's state directly —
RocksDB snapshots + changelogs are reconstructed executor-side, in
parallel, one scan task per state partition — so inspection scales
exactly like the job that wrote the state and never replays input.

The reference has no equivalent (its DStream checkpoints are opaque
Java serialization — 304-streaming's ``StreamingContext.getOrCreate``
either resumes or it doesn't); this is the operability layer a
production deployment adds on top.

Reads, not mutations: the source is read-only, so inspection can run
against a LIVE query's checkpoint (it reads committed batch versions
only, never the in-flight one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator map of a checkpoint: which stateful operators exist,
    their store names, partition counts, and committed batch range.

    This is the discovery step — ``operatorId``/``batchId`` arguments
    for :func:`read_state` come from here, not from guessing. Driver
    reads a few KB of metadata; no executor work.
    """
    return spark.read.format("state-metadata").load(checkpoint_dir)


def read_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """Raw state rows of one operator: ``key`` struct, ``value`` struct,
    ``partition_id``.

    ``batch_id`` time-travels to any committed micro-batch (default:
    latest committed) — the state equivalent of reading an old table
    snapshot. One scan task per state partition, so a 200-partition
    state store reads with 200-way parallelism regardless of how many
    executors the original query had.
    """
    reader = spark.read.format("statestore").option(
        "operatorId", str(operator_id)
    )
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", str(batch_id))
    return reader.load(checkpoint_dir)


def grouped_count_state(
    spark: SparkSession,
    checkpoint_dir: str,
    batch_id: int | None = None,
) -> DataFrame:
    """Flatten a ``groupBy(k...).count()`` aggregation's state into
    ``(k..., cnt)`` rows.

    A streaming count's state value is the aggregation buffer (a single
    ``count(1)`` long); the key struct carries the grouping columns.
    Column names come from the stored schema, so the caller gets back
    exactly the grouping columns they declared in the stream.
    """
    state = read_state(spark, checkpoint_dir, batch_id=batch_id)
    key_fields = state.schema["key"].dataType.fieldNames()
    value_fields = state.schema["value"].dataType.fieldNames()
    cols = [F.col(f"key.{f}").alias(f) for f in key_fields]
    # count(1) buffer is the single value field whatever Spark named it
    cols.append(F.col(f"value.{value_fields[0]}").alias("cnt"))
    return state.select(*cols)


def read_state_changes(
    spark: SparkSession,
    checkpoint_dir: str,
    start_batch_id: int = 0,
    end_batch_id: int | None = None,
    operator_id: int = 0,
    store_name: str | None = None,
) -> DataFrame:
    """State CHANGE FEED between two committed batches: one row per
    state mutation, tagged ``change_type`` (update/delete) and
    ``batch_id``.

    This is CDC over the state itself — the audit trail of what a
    stateful operator did between checkpoints, without diffing two full
    snapshots (which at 100 TB of state is a job; the changelog is
    metadata-rate). Requires the stream to have run with RocksDB
    changelog checkpointing enabled
    (``spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing
    .enabled=true``) — with snapshot-only checkpoints there is no
    changelog to read and Spark raises, which the caller should treat
    as "re-run the stream with changelogs on", not retry.
    """
    reader = (
        spark.read.format("statestore")
        .option("operatorId", str(operator_id))
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", str(start_batch_id))
    )
    if end_batch_id is not None:
        reader = reader.option("changeEndBatchId", str(end_batch_id))
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    return reader.load(checkpoint_dir)
