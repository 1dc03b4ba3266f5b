"""Sink adapters (SURVEY §2.1 K1-K9).

Thin, explicit writers over ``df.write`` so every reference sink is a
declared engine capability: text/csv/json/parquet files, managed tables
with partitioning and bucketing, and SQL DDL helpers.

Scale notes: ``partitionBy`` writes one directory per key value
(partition pruning on read); ``bucketBy`` gives persistent
co-partitioning so future joins/aggregations on the bucket key skip the
shuffle (the durable version of the reference's HashPartitioner
co-partitioning, 303-spark-sql/README.md:71-73). ``single_file`` mirrors
the reference's ``coalesce(1)`` before save (ExampleWeather2.scala:33)
— driver-friendly for small results, never for large ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_text(df: DataFrame, path: str, single_file: bool = False) -> None:
    """saveAsTextFile (K1): one string column -> text files."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").text(path)


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).option(
        "sep", sep
    ).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "append") -> None:
    """JSON sink, append mode by default (K2, 303-spark-sql/README.md:55)."""
    df.write.mode(mode).json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Parquet file sink (K6)."""
    df.write.mode(mode).parquet(path)


def save_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
) -> None:
    """Managed-table sink (K3), optionally partitioned (K4) or bucketed
    (K5) — parquet-backed via the session catalog."""
    writer = df.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    writer.saveAsTable(name)


def create_database(spark: SparkSession, name: str) -> None:
    """DDL passthrough (K9, 303-spark-sql/README.md:62-63)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def use_database(spark: SparkSession, name: str) -> None:
    spark.sql(f"USE {name}")


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC file sink — the columnar alternative to parquet that ships
    with Spark (native vectorized ORC reader/writer). Kept for lake
    interoperability: Hive-era warehouses and some ingestion systems
    standardize on ORC, and the scan/pushdown properties match parquet
    (predicate pushdown, column pruning, stripe-level statistics)."""
    df.write.mode(mode).orc(path)
