"""Probabilistic sketches (SURVEY §2.4 A12-A14).

PySpark doesn't expose ``DataFrameStatFunctions.bloomFilter`` /
``countMinSketch`` (JVM-only), so this module is the thin py4j bridge
SURVEY §7.3 calls for. The sketch objects are driver-side handles over
``org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}`` — the
very classes the reference exercises from Scala
(304-streaming/spark/README.md:213-243); build cost is one distributed
aggregation, probes are O(1) driver-side.

Serialization round-trips (``to_bytes``/``from_bytes``) let a sketch
built on one cluster be shipped and probed elsewhere — the
SURVEY §7.4.3 requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class BloomFilterHandle:
    """Driver-side handle on a JVM BloomFilter."""

    def __init__(self, jsketch):
        self._j = jsketch

    def might_contain(self, value) -> bool:
        return bool(self._j.mightContain(value))

    def bit_size(self) -> int:
        return int(self._j.bitSize())

    def to_bytes(self) -> bytes:
        spark = SparkSession.getActiveSession()
        bos = spark._jvm.java.io.ByteArrayOutputStream()
        self._j.writeTo(bos)
        return bytes(bos.toByteArray())

    @classmethod
    def from_bytes(cls, spark: SparkSession, data: bytes) -> "BloomFilterHandle":
        bis = spark._jvm.java.io.ByteArrayInputStream(data)
        j = spark._jvm.org.apache.spark.util.sketch.BloomFilter.readFrom(bis)
        return cls(j)


class CountMinSketchHandle:
    """Driver-side handle on a JVM CountMinSketch."""

    def __init__(self, jsketch):
        self._j = jsketch

    def estimate_count(self, value) -> int:
        return int(self._j.estimateCount(value))

    def total_count(self) -> int:
        return int(self._j.totalCount())

    def to_bytes(self) -> bytes:
        spark = SparkSession.getActiveSession()
        bos = spark._jvm.java.io.ByteArrayOutputStream()
        self._j.writeTo(bos)
        return bytes(bos.toByteArray())

    @classmethod
    def from_bytes(cls, spark: SparkSession, data: bytes) -> "CountMinSketchHandle":
        bis = spark._jvm.java.io.ByteArrayInputStream(data)
        j = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
        return cls(j)


def bloom_filter(
    df: DataFrame, col: str, expected_items: int, fpp: float
) -> BloomFilterHandle:
    """Build a Bloom filter over a column (stat.bloomFilter,
    304-streaming/spark/README.md:213)."""
    return BloomFilterHandle(df._jdf.stat().bloomFilter(col, expected_items, fpp))


def count_min_sketch(
    df: DataFrame, col: str, eps: float, confidence: float, seed: int
) -> CountMinSketchHandle:
    """Build a Count-Min sketch over a column (stat.countMinSketch,
    304-streaming/spark/README.md:236; knobs eps/confidence/seed as the
    lab exercises them)."""
    return CountMinSketchHandle(df._jdf.stat().countMinSketch(col, eps, confidence, seed))
