"""Arbitrary keyed streaming state via ``applyInPandasWithState``
(SURVEY §7.4.2 — the general ``updateStateByKey`` replacement).

Simple cumulative counts/sums collapse into streaming aggregations
(streaming.jobs); THIS operator covers state machines a streaming agg
cannot express. The demo operator is a per-key exponentially-weighted
mean with a change counter — state that depends on arrival order within
the key, like the reference's custom sentiment state tuple
(ExerciseNetcat.scala:176-196) but genuinely non-aggregable.

Scale: state lives in the state store partitioned by key (same shuffle
layout as a streaming agg); the pandas kernel sees one key's rows per
call, Arrow-batched. GroupStateTimeout would bound state lifetime for
unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("ewma", DoubleType()),
        StructField("n", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ewma_value", DoubleType()),
        StructField("n_events", LongType()),
    ]
)


def _ewma_kernel(alpha: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ewma, n = state.get
        else:
            ewma, n = 0.0, 0
        for pdf in pdfs:
            # deterministic within-key order: sort by event time then id
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"]:
                ewma = float(v) if n == 0 else alpha * float(v) + (1 - alpha) * ewma
                n += 1
        state.update((ewma, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "ewma_value": [ewma], "n_events": [n]}
        )

    return fn


def ewma_per_user(stream: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Per-user exponentially-weighted mean of ``value`` as managed
    streaming state; emits the state after each micro-batch (update
    mode)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _ewma_kernel(alpha),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_per_user_batch(df: DataFrame, alpha: float = 0.5) -> pd.DataFrame:
    """Batch reference implementation (driver-side) for tests: the value
    the streaming state must converge to after draining the input."""
    pdf = df.select("user_id", "ts", "event_id", "value").toPandas()
    pdf = pdf.sort_values(["ts", "event_id"])
    out = []
    for uid, g in pdf.groupby("user_id"):
        ewma, n = 0.0, 0
        for v in g["value"]:
            ewma = float(v) if n == 0 else alpha * float(v) + (1 - alpha) * ewma
            n += 1
        out.append((uid, ewma, n))
    return pd.DataFrame(out, columns=["user_id", "ewma_value", "n_events"])
