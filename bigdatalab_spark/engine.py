"""The user-facing engine facade.

One object that exposes everything a user of the reference lab repo
needs after switching to this engine: session management, the full
source/sink matrix, `sql()` with temp views, the named query library,
plan inspection, and sketch builders.

    from bigdatalab_spark.engine import Engine

    eng = Engine()                      # local[32], AQE on
    eng.register_warehouse("/root/testdata/sf0.01")
    df = eng.sql("SELECT count(*) FROM lineitem")
    eng.explain(df)
    result = eng.query("pricing_summary", "/root/testdata/sf0.01")
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

from bigdatalab_spark import session as _session
from bigdatalab_spark.operators.sketches import (
    BloomFilterHandle,
    CountMinSketchHandle,
    bloom_filter,
    count_min_sketch,
)
from bigdatalab_spark.plans.inspect import explain_str
from bigdatalab_spark.sources import readers as _readers
from bigdatalab_spark.sources import sinks as _sinks


class Engine:
    """Facade over SparkSession + the operator/query library."""

    def __init__(self, spark: SparkSession | None = None, **session_kwargs):
        self.spark = spark or _session.get_session(**session_kwargs)

    # -- sources --------------------------------------------------------
    def read_text(self, path: str) -> DataFrame:
        return _readers.read_text(self.spark, path)

    def read_csv(self, path: str, **opts) -> DataFrame:
        return _readers.read_csv(self.spark, path, **opts)

    def read_json(self, path: str, schema=None) -> DataFrame:
        return _readers.read_json(self.spark, path, schema)

    def read_parquet(self, path: str) -> DataFrame:
        return _readers.read_parquet(self.spark, path)

    def read_fixed_width(self, path: str, spec) -> DataFrame:
        return _readers.read_fixed_width(self.spark, path, spec)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def register_warehouse(self, sf_dir: str) -> None:
        """Register every warehouse table as a temp view for sql()."""
        _readers.register_views(self.spark, sf_dir)

    # -- sql ------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    # -- sinks ----------------------------------------------------------
    def write_parquet(self, df: DataFrame, path: str, **opts) -> None:
        _sinks.write_parquet(df, path, **opts)

    def write_json(self, df: DataFrame, path: str, **opts) -> None:
        _sinks.write_json(df, path, **opts)

    def write_text(self, df: DataFrame, path: str, **opts) -> None:
        _sinks.write_text(df, path, **opts)

    def save_table(self, df: DataFrame, name: str, **opts) -> None:
        _sinks.save_table(df, name, **opts)

    # -- query library --------------------------------------------------
    def query(self, name: str, sf_dir: str) -> DataFrame:
        from bigdatalab_spark.queries import REGISTRY

        return REGISTRY[name].fn(self.spark, sf_dir)

    def query_names(self) -> list[str]:
        from bigdatalab_spark.queries import REGISTRY

        return sorted(REGISTRY)

    # -- caching / storage levels (§2.10) -------------------------------
    def persist(self, df: DataFrame, level: str | StorageLevel = "MEMORY_AND_DISK") -> DataFrame:
        """``persist`` passthrough with named storage levels.

        Reference parity: 302-spark-opt/src/main/scala/Exercise.scala:162-175
        exercises cache() / persist(MEMORY_ONLY_SER) / persist(DISK_ONLY) /
        unpersist. On the JVM-serialized levels note: in PySpark every
        MEMORY_* level stores JVM-serialized bytes already, so
        MEMORY_ONLY_SER maps to MEMORY_ONLY (the PySpark StorageLevel
        module does the same).
        """
        if isinstance(level, str):
            name = level.upper()
            # PySpark's StorageLevel has no *_SER attributes (every MEMORY_*
            # level is JVM-serialized already) — alias the Scala names the
            # reference exercise uses to their PySpark equivalents
            name = {
                "MEMORY_ONLY_SER": "MEMORY_ONLY",
                "MEMORY_ONLY_SER_2": "MEMORY_ONLY_2",
                "MEMORY_AND_DISK_SER": "MEMORY_AND_DISK",
                "MEMORY_AND_DISK_SER_2": "MEMORY_AND_DISK_2",
            }.get(name, name)
            try:
                level = getattr(StorageLevel, name)
            except AttributeError:
                raise ValueError(
                    f"unknown storage level {level!r}; one of "
                    "MEMORY_ONLY, MEMORY_AND_DISK, DISK_ONLY, "
                    "MEMORY_ONLY_2, MEMORY_AND_DISK_2, OFF_HEAP, NONE "
                    "(plus the Scala *_SER aliases)"
                ) from None
        return df.persist(level)

    def cache(self, df: DataFrame) -> DataFrame:
        return df.cache()

    def unpersist(self, df: DataFrame, blocking: bool = False) -> DataFrame:
        return df.unpersist(blocking)

    def clear_cache(self) -> None:
        """Drop every cached table/DataFrame in the session (the sweep the
        reference does with per-RDD unpersist calls at job end)."""
        self.spark.catalog.clearCache()

    # -- plans / sketches ----------------------------------------------
    def explain(self, df: DataFrame, mode: str = "formatted") -> str:
        return explain_str(df, mode)

    def bloom_filter(self, df: DataFrame, col: str, n: int, fpp: float) -> BloomFilterHandle:
        return bloom_filter(df, col, n, fpp)

    def count_min_sketch(
        self, df: DataFrame, col: str, eps: float, confidence: float, seed: int
    ) -> CountMinSketchHandle:
        return count_min_sketch(df, col, eps, confidence, seed)

    def stop(self) -> None:
        self.spark.stop()
