"""Graph analytics over warehouse-derived edge lists.

Beyond the label-propagation connected components in scale/dedup.py,
this module holds fixed-iteration graph algorithms whose per-round
arithmetic is made ENGINE-EXACT so a SQL oracle can replay the whole
run: float summation order is the only nondeterminism in a vanilla
PageRank, and casting each edge contribution to DECIMAL(28,12) before
the aggregate removes it — the same exact-accumulation trick as
operators/aggregates.py money_sum, applied per iteration.

Scale design (100 TB edge lists): the rank frame is node-sized and the
edge list is the data-sized side; each iteration is ONE keyed shuffle
of edges joined against the current ranks, with ranks localCheckpointed
per round (constant-size plans, previous round's blocks released
eagerly — the same loop discipline as BPE training and label
propagation). A fixed iteration count (the common production choice)
keeps the oracle replayable; convergence-based stopping would need a
driver-side delta check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatalab_spark.operators.checkpoints import release_local_checkpoint

#: exact accumulation type for per-edge rank contributions
CONTRIB_DECIMAL = "decimal(28,12)"


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list ``(src, dst)``.

    Every node appearing as a source must have out-degree >= 1 by
    construction (true for the bidirectional bipartite graphs built
    from co-occurrence); dangling-node mass redistribution is therefore
    not modeled. Returns ``(node, rank)`` for every node that receives
    at least one in-edge — for bidirectional edge lists that is every
    node.

    Engine-exact: ``rank/degree`` is a deterministic double division,
    its DECIMAL(28,12) quantization is identical across engines, the
    decimal SUM is order-independent, and the damping combination is
    fixed-order double arithmetic — so a DuckDB oracle unrolling the
    same ``iterations`` rounds reproduces the ranks bit for bit.
    """
    # the edge list feeds deg, nodes AND every iteration's contribution
    # join — left lazy, each of those consumers re-executes the edge
    # lineage (for warehouse-derived graphs: a data-sized join +
    # distinct) once per round. Persist for the loop's duration
    # (guide §5: cache what is reused when recomputing costs more);
    # MEMORY_AND_DISK spills rather than OOMs on edge lists bigger
    # than memory, and the decimal contribution sum is order-
    # independent, so caching cannot move a single bit of the ranks.
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).persist()
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    # n is ONE number — take it to the driver once and embed it as a
    # plan literal instead of crossJoin(broadcast(n_row)) every round:
    # that broadcast re-materialized as its own Spark job per iteration
    # (and once more for the init frame). Python float division IS the
    # JVM's double division (both IEEE-754 binary64), so 1.0/n and
    # (1-damping)/n embed bit-identical values.
    n = nodes.count()
    init_rank = 1.0 / n if n else 0.0
    base_mass = (1.0 - damping) / n if n else 0.0

    ranks = nodes.select("node", F.lit(init_rank).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        # rank/d is constant per source node: compute it on the
        # NODE-sized frame (ranks ⋈ deg) and join edges once, instead
        # of dragging both rank and d through separate edge-sized
        # joins. Same operands per edge ⇒ bit-identical contribs, but
        # the data-sized side now meets exactly one join per round —
        # and the rate frame is node-sized, so AQE can broadcast it
        # and leave the edge list entirely unshuffled before the agg.
        rates = ranks.join(deg, ranks.node == deg.src).select(
            F.col("src"),
            (F.col("rank") / F.col("d")).cast(CONTRIB_DECIMAL).alias(
                "contrib"
            ),
        )
        contribs = edges.join(rates, "src").select(
            F.col("dst").alias("node"), F.col("contrib")
        )
        new_ranks = (
            contribs.groupBy("node")
            .agg(F.sum("contrib").alias("csum"))
            .select(
                "node",
                (
                    F.lit(base_mass)
                    + F.lit(damping) * F.col("csum").cast("double")
                ).alias("rank"),
            )
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)
        release_local_checkpoint(ranks)
        ranks = new_ranks
    edges.unpersist()
    deg.unpersist()
    nodes.unpersist()
    return ranks


def bipartite_edges(
    pairs: DataFrame, left_col: str, right_col: str
) -> DataFrame:
    """Bidirectional edge list from distinct co-occurrence pairs, with
    prefixed node ids so the two partitions can't collide."""
    left = F.concat(F.lit("l:"), F.col(left_col).cast("string"))
    right = F.concat(F.lit("r:"), F.col(right_col).cast("string"))
    distinct = pairs.select(
        left.alias("l_node"), right.alias("r_node")
    ).distinct()
    fwd = distinct.select(
        F.col("l_node").alias("src"), F.col("r_node").alias("dst")
    )
    rev = distinct.select(
        F.col("r_node").alias("src"), F.col("l_node").alias("dst")
    )
    return fwd.unionAll(rev)


def triangle_count(pairs: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Exact triangle count over an undirected graph given as distinct
    unordered pairs — the compact-forward algorithm expressed as joins.

    Every canonical edge is ORIENTED from its (degree, id)-smaller
    endpoint to the larger; wedges are then built only at each
    triangle's minimum vertex in that order and closed with one more
    oriented-edge join, so each triangle is counted exactly once and —
    the scale property — the wedge fan-out at hub nodes is bounded by
    their ORIENTED out-degree, which the degree ordering caps at
    ~sqrt(E) instead of the raw degree. Total work O(E^1.5) worst case,
    three equi-joins, no cartesian anywhere.

    The (degree, id) comparison happens inline on carried degree
    columns — no global rank materialization, so nothing node-sized
    funnels through one task. Returns one row:
    ``(n_nodes, n_edges, n_wedges, n_triangles)`` — all exact integers,
    strictly SQL-replayable.
    """
    a, b = F.col(a_col), F.col(b_col)
    und = (
        pairs.filter(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    withdeg = und.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = withdeg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    )
    w1 = oriented.select(
        F.col("src"), F.col("dst").alias("x"), F.col("ddst").alias("dx")
    )
    w2 = oriented.select(
        F.col("src"), F.col("dst").alias("y"), F.col("ddst").alias("dy")
    )
    wedges = w1.join(w2, "src").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closer = oriented.select(
        F.col("src").alias("x"), F.col("dst").alias("y")
    )
    tri = wedges.join(closer, ["x", "y"])
    return (
        und.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
        .crossJoin(wedges.agg(F.count(F.lit(1)).alias("n_wedges")))
        .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    )
