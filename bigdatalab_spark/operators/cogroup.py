"""Cogrouped Arrow kernels — ``groupBy().cogroup().applyInPandas`` and
its Arrow-native twin ``applyInArrow``.

This is the last §2.9 vectorized-UDF surface the engine exposes (beside
scalar ``pandas_udf``, ``mapInPandas``, ``mapInArrow``, grouped
``applyInPandas``, ``applyInPandasWithState`` and Python UDTFs): two
DataFrames are co-partitioned on a key in ONE shuffle each, and the
kernel receives the pair of per-key pandas (or Arrow) batches side by
side. The reference has no counterpart (its join exercises are all
relational); the cogroup surface exists for per-key *algorithmic*
merges — interleaved bisection, sequence alignment, per-entity model
scoring against that entity's history — that a join + window cannot
express without first materializing a quadratic intermediate.

The demonstration kernel here is deliberately one that HAS a
relational twin (per-purchase counts/sums over the user's earlier
clicks), so the whole path is held to a strict DuckDB oracle: the
pandas kernel's ``searchsorted``/``cumsum`` answers must match the
decorrelated LEFT JOIN + GROUP BY replay bit for bit. Money moves as
integer cents; no float accumulation anywhere.

Scale design: cogroup is exactly as expensive as a shuffle join on the
same key — each side is hash-partitioned once, then streamed per key
through Arrow. The caveat that matters at 100 TB is per-KEY memory:
one key's rows on BOTH sides must fit in one Arrow batch on one
executor. Keys here are users (thousands of rows each at most); for
hot-key corpora you pre-aggregate or salt before cogrouping, same as
any keyed operator (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_OUT_SCHEMA = (
    "event_id bigint, user_id bigint, purchase_cents bigint, "
    "clicks_before bigint, click_cents_before bigint"
)


def _align_kernel(purchases, clicks):
    """Per-user pandas kernel: for every purchase, count/sum the user's
    strictly-earlier clicks via one sort + ``searchsorted`` (O((n+m) log
    (n+m)) per key, no quadratic join intermediate).

    Pruning gotcha (Spark 4.1, pinned in tests): Catalyst column-prunes
    the cogroup's INPUTS by what the downstream plan references — a
    count-only plan hands the kernel key-only (or empty-schema) frames,
    and the non-initiating side loses its copy of the grouping key even
    in full plans. A cogroup kernel therefore must (a) never index
    columns a count-only plan pruned away — only the output ROW COUNT
    is observable there, so zeros of the right length are correct —
    and (b) never rely on the key column being present in the data
    frames."""
    import numpy as np
    import pandas as pd

    if purchases.empty:
        return pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "purchase_cents": pd.Series(dtype="int64"),
                "clicks_before": pd.Series(dtype="int64"),
                "click_cents_before": pd.Series(dtype="int64"),
            }
        )
    if "ts" not in purchases.columns:
        # count-only plan: inputs pruned, only len(out) is observed
        z = np.zeros(len(purchases), dtype="int64")
        return pd.DataFrame(
            {
                "event_id": z,
                "user_id": z,
                "purchase_cents": z,
                "clicks_before": z,
                "click_cents_before": z,
            }
        )
    p_ts = purchases["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
    if clicks.empty or "ts" not in clicks.columns:
        n = np.zeros(len(purchases), dtype="int64")
        s = np.zeros(len(purchases), dtype="int64")
    else:
        order = np.argsort(clicks["ts"].to_numpy(dtype="datetime64[us]"), kind="stable")
        c_ts = (
            clicks["ts"].to_numpy(dtype="datetime64[us]").astype("int64")[order]
        )
        c_cents = clicks["cents"].to_numpy(dtype="int64")[order]
        idx = np.searchsorted(c_ts, p_ts, side="left")
        cum = np.concatenate(([0], np.cumsum(c_cents)))
        n = idx.astype("int64")
        s = cum[idx]
    return pd.DataFrame(
        {
            "event_id": purchases["event_id"].to_numpy(dtype="int64"),
            "user_id": purchases["user_id"].to_numpy(dtype="int64"),
            "purchase_cents": purchases["cents"].to_numpy(dtype="int64"),
            "clicks_before": n,
            "click_cents_before": s,
        }
    )


def _cents(df: DataFrame, extra: list[str]) -> DataFrame:
    from pyspark.sql import functions as F

    return df.select(
        *extra,
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )


def cogroup_click_attribution(events: DataFrame) -> DataFrame:
    """Per purchase: how many of the same user's clicks happened strictly
    before it, and their total value in cents — computed by cogrouping
    the purchase and click streams per user and running the pandas
    alignment kernel on each pair of per-key batches."""
    purchases = _cents(events.filter("event_type = 'purchase'"), ["event_id"])
    clicks = _cents(events.filter("event_type = 'click'"), [])
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(_align_kernel, schema=_OUT_SCHEMA)
    )


def cogroup_click_attribution_arrow(events: DataFrame) -> DataFrame:
    """Arrow-native twin: same cogroup, same answers, but the kernel
    receives raw ``pyarrow.Table`` pairs (``applyInArrow``) — no
    Arrow->pandas conversion on either side. The production choice for
    wide/binary payloads; byte-identical to the pandas path by test."""
    import pyarrow as pa

    def _arrow_kernel(purchases: pa.Table, clicks: pa.Table) -> pa.Table:
        import numpy as np

        if purchases.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "purchase_cents": pa.array([], type=pa.int64()),
                    "clicks_before": pa.array([], type=pa.int64()),
                    "click_cents_before": pa.array([], type=pa.int64()),
                }
            )
        if "ts" not in purchases.schema.names:
            # count-only plan: inputs pruned (see _align_kernel note)
            z = np.zeros(purchases.num_rows, dtype="int64")
            return pa.table(
                {
                    "event_id": pa.array(z),
                    "user_id": pa.array(z),
                    "purchase_cents": pa.array(z),
                    "clicks_before": pa.array(z),
                    "click_cents_before": pa.array(z),
                }
            )
        p_ts = purchases.column("ts").cast(pa.int64()).to_numpy()
        if clicks.num_rows == 0 or "ts" not in clicks.schema.names:
            n = np.zeros(purchases.num_rows, dtype="int64")
            s = np.zeros(purchases.num_rows, dtype="int64")
        else:
            c_ts_raw = clicks.column("ts").cast(pa.int64()).to_numpy()
            order = np.argsort(c_ts_raw, kind="stable")
            c_ts = c_ts_raw[order]
            c_cents = clicks.column("cents").to_numpy()[order]
            idx = np.searchsorted(c_ts, p_ts, side="left")
            cum = np.concatenate(([0], np.cumsum(c_cents)))
            n = idx.astype("int64")
            s = cum[idx]
        return pa.table(
            {
                "event_id": purchases.column("event_id"),
                "user_id": purchases.column("user_id"),
                "purchase_cents": purchases.column("cents"),
                "clicks_before": pa.array(n),
                "click_cents_before": pa.array(s),
            }
        )

    purchases = _cents(events.filter("event_type = 'purchase'"), ["event_id"])
    clicks = _cents(events.filter("event_type = 'click'"), [])
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInArrow(_arrow_kernel, schema=_OUT_SCHEMA)
    )


def cogroup_click_attribution_window_twin(events: DataFrame) -> DataFrame:
    """The pure-relational LINEAR twin: union both streams with a side
    flag, one running window per user ordered by (ts, side) — purchases
    sort before clicks at equal timestamps, so strictly-before
    semantics fall out of the sort key — then keep the purchase rows.
    Same one-shuffle budget as the cogroup kernel and no quadratic
    intermediate (the LEFT JOIN + GROUP BY oracle builds p*c pairs per
    user, which is already fatal at x100). The cogroup surface earns
    its place for kernels a running window CANNOT express; this twin
    exists to prove the engine picks the cheap plan when one exists,
    and as the equality check on the kernel."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    purchases = _cents(events.filter("event_type = 'purchase'"), ["event_id"])
    clicks = _cents(events.filter("event_type = 'click'"), [])
    tagged = purchases.select(
        "user_id", "ts", "cents",
        F.lit(0).alias("side"),      # purchases first at equal ts
        "event_id",
    ).unionByName(
        clicks.select(
            "user_id", "ts", "cents",
            F.lit(1).alias("side"),
            F.lit(None).cast("bigint").alias("event_id"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    contrib_n = F.when(F.col("side") == 1, F.lit(1)).otherwise(F.lit(0))
    contrib_c = F.when(F.col("side") == 1, F.col("cents")).otherwise(F.lit(0))
    return (
        tagged.withColumn("clicks_before", F.sum(contrib_n).over(w))
        .withColumn("click_cents_before", F.sum(contrib_c).over(w))
        .filter(F.col("side") == 0)
        .select(
            "event_id",
            "user_id",
            F.col("cents").alias("purchase_cents"),
            "clicks_before",
            "click_cents_before",
        )
    )
