"""Warehouse maintenance shapes beyond the reference's batch-recompute
pipelines: change-data capture between dataset snapshots (registered
after the SURVEY-core top-50).

The reference's jobs (e.g. 303-spark-sql/README.md aggregations)
recompute outputs from the full input every run; at 100 TB the daily
delta is what must flow, not the world. These queries exercise the
incremental primitives (:mod:`bigdatalab_spark.operators.cdc`,
:func:`bigdatalab_spark.sources.sinks.merge_into_partitions`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.sources import load_table

# Deterministic snapshot derivation shared by the Spark query and the
# oracle: "yesterday" is missing keys ≡ 0 (mod 997) (today's inserts)
# and carries floor()-truncated prices on keys ≡ 0 (mod 5) (corrected
# today -> updates); "today" is missing keys ≡ 0 (mod 991) (deletes).
_INS, _DEL, _UPD = 997, 991, 5


@query(
    "orders_snapshot_cdc",
    ids=("SCALE-CDC", "J1"),
    oracle=f"""
        WITH old AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % {_UPD} = 0
                        THEN floor(o_totalprice) ELSE o_totalprice
                   END AS o_totalprice,
                   o_orderstatus
            FROM orders WHERE o_orderkey % {_INS} <> 0
        ),
        new AS (
            SELECT o_orderkey, o_totalprice, o_orderstatus
            FROM orders WHERE o_orderkey % {_DEL} <> 0
        )
        SELECT CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    ELSE 'update' END AS op,
               coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               o.o_totalprice  AS old_o_totalprice,
               n.o_totalprice  AS new_o_totalprice,
               o.o_orderstatus AS old_o_orderstatus,
               n.o_orderstatus AS new_o_orderstatus
        FROM old o FULL OUTER JOIN new n USING (o_orderkey)
        WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.o_totalprice  IS DISTINCT FROM n.o_totalprice
           OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        ORDER BY o_orderkey
    """,
)
def orders_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot change capture over orders: two derived
    snapshots (inserts, deletes, and price-correction updates planted
    deterministically from the key) diffed by
    :func:`bigdatalab_spark.operators.cdc.snapshot_diff` — ONE
    full-outer key shuffle of pruned (key + compared) projections,
    null-safe struct comparison, delta-sized output. The oracle replays
    the diff as a FULL OUTER JOIN with IS DISTINCT FROM predicates."""
    from bigdatalab_spark.operators.cdc import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % _INS != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % _UPD == 0, F.floor("o_totalprice").cast("double")
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    new = orders.where(F.col("o_orderkey") % _DEL != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    ).orderBy("o_orderkey")
