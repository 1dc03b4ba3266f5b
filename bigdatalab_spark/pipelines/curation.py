"""The engine's curation flow as a Spark Declarative Pipeline.

Definitions use ONLY the public ``pyspark.pipelines`` decorators (the
Spark 4.1 dataflow-graph API); execution goes through
:mod:`bigdatalab_spark.pipelines.local` because the stock runner's
Spark Connect backend is env-blocked here (no grpcio). The graph:

    bronze_documents (temp view over the lake)
        -> doc_quality        (MV: per-doc features + drop-cascade reason,
                               partitioned by reason — downstream reads
                               of one verdict prune to its directories)
            -> quality_funnel (MV: the per-reason report)
            -> kept_docs      (MV: survivors only — the training corpus cut)
    events_ingest (streaming table: incremental availableNow ingest of
                   the events stream; re-runs process only NEW files)

Declaring the DAG instead of sequencing jobs by hand is the point at
100 TB: a refresh recomputes exactly the declared dependencies in
dependency order, a new consumer MV is one decorated function, and the
streaming table's incremental contract (checkpoint-resumed appends)
rides the same graph.
"""

from __future__ import annotations

from pyspark import pipelines as dp
from pyspark.pipelines.graph_element_registry import (
    graph_element_registration_context,
)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.pipelines.local import LocalGraphRegistry, run_pipeline
from bigdatalab_spark.scale.textqa import quality_features
from bigdatalab_spark.sources import load_table


def register_curation_pipeline(
    spark: SparkSession, sf_dir: str
) -> LocalGraphRegistry:
    """Capture the curation dataflow graph against the public SDP API.

    Definition order is deliberately NOT dependency order (the funnel is
    declared before its upstream): the executor discovers the order, as
    the stock runner does.
    """
    reg = LocalGraphRegistry()
    with graph_element_registration_context(reg):

        @dp.materialized_view
        def quality_funnel() -> DataFrame:
            return (
                spark.read.table("doc_quality")
                .groupBy("reason")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    (
                        F.sum("n_chars").cast("double") / F.count(F.lit(1))
                    ).alias("avg_chars"),
                    F.max("quality_score").alias("max_quality"),
                )
            )

        @dp.temporary_view
        def bronze_documents() -> DataFrame:
            return load_table(spark, sf_dir, "documents")

        @dp.materialized_view(partition_cols=["reason"])
        def doc_quality() -> DataFrame:
            feats = quality_features(spark.read.table("bronze_documents"))
            reason = (
                F.when(F.col("n_chars") < 40, "1_too_short")
                .when(F.col("n_tokens") < 8, "2_too_few_tokens")
                .when(F.col("punct_ratio") > 0.10, "3_high_punct")
                .when(F.col("stop_ratio") == 0.0, "4_no_stopwords")
                .otherwise("5_kept")
            )
            return feats.withColumn("reason", reason)

        @dp.materialized_view
        def kept_docs() -> DataFrame:
            kept = spark.read.table("doc_quality").filter(
                F.col("reason") == "5_kept"
            )
            return kept.select("doc_id", "n_tokens", "quality_score")

        dp.create_streaming_table("events_ingest")

        @dp.append_flow(target="events_ingest")
        def events_files() -> DataFrame:
            from bigdatalab_spark.streaming.jobs import stream_events

            return stream_events(spark, sf_dir).select(
                "event_id", "user_id", "event_type", "value"
            )

    return reg


def run_curation_pipeline(
    spark: SparkSession, sf_dir: str, storage: str
) -> dict[str, DataFrame]:
    """Capture + execute the graph; returns the materialized datasets."""
    return run_pipeline(
        spark, register_curation_pipeline(spark, sf_dir), storage
    )
