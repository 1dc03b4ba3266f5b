"""Grouped-aggregate pandas UDFs (Arrow-batched custom aggregates).

The reference hand-builds custom aggregation buffers (sum/count pairs,
Ex4AverageWordLengthWithCombiner.java:68-108); Spark's native surface
for an aggregate the built-ins can't express is the GROUPED_AGG pandas
UDF: the group's columns arrive as Arrow-backed series, one scalar goes
back. This is the *extensibility* path — per the engine's UDF policy it
is Arrow-batched (never row-at-a-time Python) and reserved for semantics
with no built-in equivalent.

Scale note: a GROUPED_AGG UDF does NOT partial-aggregate — the whole
group's values ship to one task (unlike built-in aggregates, which
combine map-side). That is the honest cost of custom aggregation
semantics; keep groups bounded (here: per return-flag percentile
machinery would blow up, per-group medians over bounded groups are
fine) or decompose into built-ins when the algebra allows.

``weighted_median`` is written to be engine-exact so a SQL oracle can
verify it strictly: weights are cast to int64, the crossing test is
``2 * cumsum >= total`` in integer arithmetic, and the result is an
EXISTING input value (no interpolation) — so tie order inside the
group, partitioning, and float accumulation can never flip the answer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def lower_weighted_median(values: pd.Series, weights: pd.Series) -> float:
    """Smallest value whose cumulative integer weight reaches half the
    group's total weight — the deterministic lower weighted median.
    Pure kernel (property-tested directly in tests/test_properties.py).

    Weights must be integral: the crossing test is exact int64
    arithmetic so the SQL oracle (CAST ... AS BIGINT) replays it
    bit-for-bit, and a silent truncating cast of fractional weights
    would diverge from both the oracle and user intent — so
    non-integral weights fail loudly instead."""
    import numpy as np

    w = weights.to_numpy()
    if not np.all(np.equal(np.mod(w, 1), 0)):
        raise ValueError(
            "lower_weighted_median requires integral weights (exact "
            "int64 crossing test); got fractional weight(s)"
        )
    frame = pd.DataFrame(
        {"v": values.to_numpy(), "w": w.astype("int64")}
    ).sort_values("v", kind="mergesort")
    cum = frame["w"].cumsum()
    total = int(cum.iloc[-1])
    crossed = frame.loc[2 * cum >= total, "v"]
    return float(crossed.iloc[0])


def weighted_median_agg(value_col: str, weight_col: str):
    """Column expression: ``weighted_median(value, weight)`` for
    ``groupBy(...).agg(...)`` use.

    The GROUPED_AGG UDF is created HERE, not at module level: executors
    re-import this module to unpickle the kernel, and a module-level
    ``pandas_udf`` would parse its DDL return type on import — which
    needs a SparkContext that Python workers don't have. Deferred
    creation runs on the driver where the session is live."""
    wm = pandas_udf(lower_weighted_median, "double")
    return wm(F.col(value_col), F.col(weight_col))
