"""Arbitrary keyed streaming state via ``transformWithStateInPandas``
(Spark 4's state-v2 API — the successor to ``applyInPandasWithState``
in streaming/stateful.py, kept side by side as T5/T6 evolves).

What v2 adds over the v1 operator next door:

- TYPED state handles instead of one state tuple: ``ValueState`` /
  ``ListState`` / ``MapState``, each a named column-family in the
  RocksDB state store (the session default provider — v2 REQUIRES
  RocksDB), updated independently.
- per-state TTL (``ttlDurationMs``) — bounded state for unbounded key
  spaces without hand-rolled timeout bookkeeping.
- processing/event-time timers for timed emission (not exercised here).

Demo operator: per-user running stats with a ``ValueState`` scalar
aggregate (count + total) AND a ``MapState`` of per-event-type counts —
a composite that v1 would have to pickle into one opaque tuple, and a
streaming agg cannot express incrementally per arrival batch.

Scale: identical layout to every keyed stateful op — state partitioned
by grouping key in RocksDB (disk-backed, changelog-checkpointed,
session.py:71), Arrow-batched pandas kernel per key.

ENVIRONMENT NOTE: executing a state-v2 query requires the ``protobuf``
package (the v2 state protocol is protobuf-framed;
``pyspark/sql/streaming/proto/StateMessage_pb2.py`` imports
``google.protobuf`` in the driver worker). This sandbox has no
protobuf and installs are off-limits (verified: ``import
google.protobuf`` fails), so — like the Kafka broker and the image
codecs — execution is environment-blocked: plan construction and
output schema are tested always, the drain-and-compare test runs
automatically wherever protobuf exists (pytest importorskip gate).
The v1 operator next door (streaming/stateful.py) has no such
dependency and carries the executed T5/T6 general-state coverage.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, n_types BIGINT, "
    "top_type STRING"
)


class UserStatsProcessor(StatefulProcessor):
    """count/sum in a ValueState, per-event-type counts in a MapState;
    emits one row per key per micro-batch with the running picture.
    ``top_type`` breaks count ties lexicographically (deterministic)."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.agg = handle.getValueState(
            "agg", "cnt BIGINT, total DOUBLE", ttlDurationMs=self._ttl_ms
        )
        self.by_type = handle.getMapState(
            "by_type", "event_type STRING", "n BIGINT", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        cnt, total = self.agg.get() if self.agg.exists() else (0, 0.0)
        batch_types: dict[str, int] = {}
        for pdf in rows:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
            for t, n in pdf.groupby("event_type").size().items():
                batch_types[t] = batch_types.get(t, 0) + int(n)
        self.agg.update((cnt, total))
        for t, n in batch_types.items():
            prev = (
                self.by_type.getValue((t,))[0]
                if self.by_type.containsKey((t,))
                else 0
            )
            self.by_type.updateValue((t,), (prev + n,))
        counts = {k[0]: v[0] for k, v in self.by_type.iterator()}
        top = min(counts, key=lambda t: (-counts[t], t)) if counts else None
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [cnt],
                "total_value": [total],
                "n_types": [len(counts)],
                "top_type": [top],
            }
        )

    def close(self) -> None:
        pass


def user_stats_v2(stream: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Per-user running stats through the state-v2 processor (update
    mode, processing-time)."""
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStatsProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def user_stats_batch(df: DataFrame) -> pd.DataFrame:
    """Batch reference for tests: what the drained state must equal."""
    pdf = df.select("user_id", "event_type", "value").toPandas()
    out = []
    for uid, g in pdf.groupby("user_id"):
        counts = g.groupby("event_type").size().to_dict()
        top = min(counts, key=lambda t: (-counts[t], t)) if counts else None
        out.append(
            (uid, len(g), float(g["value"].sum()), len(counts), top)
        )
    return pd.DataFrame(
        out, columns=["user_id", "n_events", "total_value", "n_types", "top_type"]
    )
