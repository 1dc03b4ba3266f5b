"""Declarative dataflow pipelines (Spark 4.1 ``pyspark.pipelines``)
executed on classic Spark — see :mod:`bigdatalab_spark.pipelines.local`."""

from bigdatalab_spark.pipelines.local import LocalGraphRegistry, run_pipeline

__all__ = ["LocalGraphRegistry", "run_pipeline"]
