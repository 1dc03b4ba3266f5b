"""Declarative pipelines (Spark 4.1 pyspark.pipelines API) executed by
the classic-mode local runner.

The stock runner's Spark Connect backend is env-blocked (no grpcio);
these tests pin that the local executor honors the API's semantics:
dependency discovery, MV full-refresh, partitioned materialization,
temp-view non-persistence, streaming-table incrementality, SQL-file
definitions, and loud failures for the illegal graphs.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.pipelines.graph_element_registry import (
    graph_element_registration_context,
)
from pyspark.sql import functions as F

from bigdatalab_spark.pipelines.local import LocalGraphRegistry, run_pipeline


def test_curation_pipeline_dag_end_to_end(spark, sf_dir, tmp_path):
    """The shipped graph: declaration order is not dependency order,
    the executor still materializes bronze -> doc_quality -> funnel;
    partition_cols land as reason= directories; the temp view is
    resolvable inside the graph but never persisted or returned."""
    from bigdatalab_spark.pipelines.curation import run_curation_pipeline

    storage = tmp_path / "sdp"
    res = run_curation_pipeline(spark, sf_dir, str(storage))
    assert set(res) == {"doc_quality", "quality_funnel", "kept_docs", "events_ingest"}
    assert "bronze_documents" not in res
    assert not (storage / "bronze_documents").exists()
    # partitioned MV: reason= subdirectories on disk
    dirs = {p.name for p in (storage / "doc_quality").iterdir() if p.is_dir()}
    assert dirs and all(d.startswith("reason=") for d in dirs)
    # the funnel MV is consistent with its upstream MV
    funnel = {r.reason: r.n_docs for r in res["quality_funnel"].collect()}
    by_reason = {
        r.reason: r.cnt
        for r in res["doc_quality"].groupBy("reason").agg(F.count("*").alias("cnt")).collect()
    }
    assert funnel == by_reason
    # kept_docs is exactly the 5_kept slice
    assert res["kept_docs"].count() == funnel.get("5_kept", 0)
    # streaming table drained the whole events input
    from bigdatalab_spark.sources import load_table

    assert res["events_ingest"].count() == load_table(spark, sf_dir, "events").count()


def test_streaming_table_is_incremental_across_runs(spark, tmp_path):
    """SDP's streaming-flow contract: re-running the pipeline processes
    only NEW input (checkpoint-resumed appends), while the MV downstream
    fully refreshes to see it."""
    from pyspark import pipelines as dp

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string") \
        .coalesce(1).write.parquet(str(src / "f1"))

    def build_registry():
        reg = LocalGraphRegistry()
        with graph_element_registration_context(reg):
            dp.create_streaming_table("ingested")

            @dp.append_flow(target="ingested")
            def tail_files():
                return (
                    spark.readStream.schema("id long, v string")
                    .parquet(str(src / "*"))
                )

            @dp.materialized_view
            def ingested_count():
                return spark.read.table("ingested").agg(
                    F.count("*").alias("n")
                )

        return reg

    storage = str(tmp_path / "store")
    res1 = run_pipeline(spark, build_registry(), storage)
    assert res1["ingested_count"].collect()[0].n == 2

    # same input -> streaming no-op, MV refresh sees the same rows
    res2 = run_pipeline(spark, build_registry(), storage)
    assert res2["ingested_count"].collect()[0].n == 2

    # new file -> ONLY it is processed; totals grow to 3
    spark.createDataFrame([(3, "c")], "id long, v string") \
        .coalesce(1).write.parquet(str(src / "f2"))
    res3 = run_pipeline(spark, build_registry(), storage)
    assert res3["ingested_count"].collect()[0].n == 3
    assert sorted(r.id for r in res3["ingested"].collect()) == [1, 2, 3]


def test_rerun_never_resolves_against_stale_temp_views(spark, tmp_path):
    """A second run in the SAME session must not let a downstream MV
    resolve against the previous run's leftover temp view of its
    upstream. The trap: the downstream's name sorts BEFORE the
    upstream's, so the probing executor visits it first — if the stale
    view answers, the downstream silently materializes last run's data.
    run_pipeline drops all graph-owned temp views up front, forcing the
    downstream to defer until the upstream is rebuilt this run."""
    from pyspark import pipelines as dp

    src = tmp_path / "src"
    spark.createDataFrame([(1,), (2,)], "id long").write.parquet(str(src))

    def build_registry():
        reg = LocalGraphRegistry()
        with graph_element_registration_context(reg):

            @dp.materialized_view
            def zz_upstream():
                return spark.read.parquet(str(src))

            @dp.materialized_view
            def aa_downstream():
                return spark.read.table("zz_upstream").agg(
                    F.count("*").alias("n")
                )

        return reg

    storage = str(tmp_path / "store")
    res1 = run_pipeline(spark, build_registry(), storage)
    assert res1["aa_downstream"].collect()[0].n == 2

    # input grows; the re-run must see 3 rows THROUGH the downstream
    spark.createDataFrame([(3,)], "id long").write.mode("append").parquet(
        str(src)
    )
    res2 = run_pipeline(spark, build_registry(), storage)
    assert res2["aa_downstream"].collect()[0].n == 3


def test_sql_definitions_register_and_run(spark, sf_dir, tmp_path):
    """register_sql: the SQL half of a pipeline (CREATE MATERIALIZED
    VIEW / TEMPORARY VIEW ... AS) joins the same graph and resolves
    against Python-defined datasets."""
    from pyspark import pipelines as dp

    reg = LocalGraphRegistry()
    with graph_element_registration_context(reg):

        @dp.temporary_view
        def base_orders():
            from bigdatalab_spark.sources import load_table

            return load_table(spark, sf_dir, "orders")

    reg.register_sql(
        """
        CREATE TEMPORARY VIEW open_orders AS
            SELECT o_orderkey, o_totalprice FROM base_orders
            WHERE o_orderstatus = 'O';
        CREATE MATERIALIZED VIEW open_order_stats AS
            SELECT count(*) AS n, min(o_orderkey) AS min_key FROM open_orders
        """,
        Path("defs.sql"),
    )
    res = run_pipeline(spark, reg, str(tmp_path / "store"))
    assert set(res) == {"open_order_stats"}
    row = res["open_order_stats"].collect()[0]
    from bigdatalab_spark.sources import load_table

    want = load_table(spark, sf_dir, "orders").filter("o_orderstatus = 'O'")
    assert row.n == want.count()


def test_illegal_graphs_fail_loudly(spark, tmp_path):
    from pyspark import pipelines as dp

    # cycle: a reads b, b reads a
    reg = LocalGraphRegistry()
    with graph_element_registration_context(reg):

        @dp.materialized_view
        def mv_a():
            return spark.read.table("mv_b")

        @dp.materialized_view
        def mv_b():
            return spark.read.table("mv_a")

    with pytest.raises(ValueError, match="cannot make progress"):
        run_pipeline(spark, reg, str(tmp_path / "s1"))

    # two flows into a batch dataset
    reg2 = LocalGraphRegistry()
    with graph_element_registration_context(reg2):

        @dp.materialized_view
        def mv_c():
            return spark.range(1)

        @dp.append_flow(target="mv_c")
        def extra():
            return spark.range(1)

    with pytest.raises(ValueError, match="only streaming tables"):
        run_pipeline(spark, reg2, str(tmp_path / "s2"))

    # flow targeting nothing
    reg3 = LocalGraphRegistry()
    with graph_element_registration_context(reg3):

        @dp.append_flow(target="ghost")
        def to_ghost():
            return spark.range(1)

    with pytest.raises(ValueError, match="unknown dataset"):
        run_pipeline(spark, reg3, str(tmp_path / "s3"))

    # a batch flow into a streaming table is LEGAL (@dp.table's batch
    # case) — it full-refreshes its slice idempotently across reruns
    reg4 = LocalGraphRegistry()
    with graph_element_registration_context(reg4):
        dp.create_streaming_table("st")

        @dp.append_flow(target="st")
        def batch_into_stream():
            return spark.range(3)

    res = run_pipeline(spark, reg4, str(tmp_path / "s4"))
    assert res["st"].count() == 3
    res = run_pipeline(spark, reg4, str(tmp_path / "s4"))  # rerun: no dup
    assert res["st"].count() == 3


def test_sink_streams_to_external_destination(spark, sf_dir, tmp_path):
    """create_sink: an external destination managed by the pipeline only
    through its checkpoint — data lands at the sink's own path, nothing
    is registered or returned, and re-running ships only new input."""
    from pyspark import pipelines as dp

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, "a")], "id long, v string") \
        .coalesce(1).write.parquet(str(src / "f1"))
    dest = str(tmp_path / "dest")

    def build_registry():
        reg = LocalGraphRegistry()
        with graph_element_registration_context(reg):
            dp.create_sink("export", format="parquet", options={"path": dest})

            @dp.append_flow(target="export")
            def ship():
                return (
                    spark.readStream.schema("id long, v string")
                    .parquet(str(src / "*"))
                )

        return reg

    res = run_pipeline(spark, build_registry(), str(tmp_path / "store"))
    assert res == {}  # external sink: not a pipeline-readable dataset
    assert spark.read.parquet(dest).count() == 1
    # incremental on re-run
    spark.createDataFrame([(2, "b")], "id long, v string") \
        .coalesce(1).write.parquet(str(src / "f2"))
    run_pipeline(spark, build_registry(), str(tmp_path / "store"))
    assert sorted(r.id for r in spark.read.parquet(dest).collect()) == [1, 2]

    # two flows into one file-format sink: refused up front
    reg2 = LocalGraphRegistry()
    with graph_element_registration_context(reg2):
        dp.create_sink("export2", format="parquet", options={"path": dest})

        @dp.append_flow(target="export2")
        def one():
            return spark.readStream.schema("id long, v string").parquet(str(src / "*"))

        @dp.append_flow(target="export2")
        def two():
            return spark.readStream.schema("id long, v string").parquet(str(src / "*"))

    with pytest.raises(ValueError, match="one sink per flow"):
        run_pipeline(spark, reg2, str(tmp_path / "store2"))


def test_dp_table_materializes_with_format_and_partitions(spark, tmp_path):
    """@dp.table: the batch-table decorator honors format and
    partition_cols in the materialized layout."""
    from pyspark import pipelines as dp

    reg = LocalGraphRegistry()
    with graph_element_registration_context(reg):

        @dp.table(partition_cols=["k"], format="json")
        def facts():
            return spark.range(6).select(
                (F.col("id") % 2).alias("k"), F.col("id").alias("v")
            )

    storage = tmp_path / "store"
    res = run_pipeline(spark, reg, str(storage))
    # @dp.table registers a StreamingTable with one batch flow; the flow
    # slice lands under <table>/<flow>/ with the declared layout
    slice_dir = storage / "facts" / "facts"
    dirs = {p.name for p in slice_dir.iterdir() if p.is_dir()}
    assert dirs == {"k=0", "k=1"}
    assert any(p.suffix == ".json" for p in (slice_dir / "k=0").iterdir())
    assert res["facts"].count() == 6
    # rerun is a full refresh, not an append
    res = run_pipeline(spark, reg, str(storage))
    assert res["facts"].count() == 6
