"""Typed source adapters for the reference's own datasets (FIXTURES.md).

Each adapter turns a raw file into the typed DataFrame its lab queries
expect — parsing policy included (malformed-row drops, empty->default
fills, header-by-value filtering). Queries downstream are pure
relational logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.sources.readers import read_csv, read_fixed_width
from bigdatalab_spark.sources.schemas import (
    ISD_WEATHER_SPEC,
    MOVIES_SCHEMA,
    RATINGS_RAW_SCHEMA,
    STATIONS_SCHEMA,
    TAGS_RAW_SCHEMA,
    TWEETS_SCHEMA,
    WEATHER_MISSING,
)


def read_weather(spark: SparkSession, path: str) -> DataFrame:
    """ISD fixed-width weather lines -> typed observations with the
    validTemperature quality flag (WeatherData.scala:2-12)."""
    df = read_fixed_width(spark, path, ISD_WEATHER_SPEC)
    return df.withColumn(
        "validTemperature",
        F.coalesce(
            (F.col("temperature") < WEATHER_MISSING) & (F.col("quality") == "1"),
            F.lit(False),  # unparseable line -> invalid, not an error
        ),
    ).drop("quality")


def read_stations(spark: SparkSession, path: str) -> DataFrame:
    """stations.csv with the StationData policy: quotes stripped by the
    csv reader, empty lat/lon/elevation -> 0.0 (StationData.scala:3-8)."""
    df = read_csv(spark, path, header=False, schema=STATIONS_SCHEMA)
    for c in ("latitude", "longitude", "elevation"):
        df = df.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    return df


def read_tweets(spark: SparkSession, path: str) -> DataFrame:
    """tweet.dsv: pipe-separated, header row filtered BY VALUE (the
    reference keeps rows where col0 != 'LANGUAGE',
    304-streaming/spark/README.md:180), commas stripped from hashtags."""
    df = read_csv(spark, path, header=False, sep="|", schema=TWEETS_SCHEMA)
    return df.filter(F.col("language") != "LANGUAGE").withColumn(
        "tw_hashtags", F.regexp_replace("tw_hashtags", ",", "")
    )


def read_movies(spark: SparkSession, path: str) -> DataFrame:
    """movies.csv with quote-aware comma splitting; malformed rows
    dropped — the MovieLensParser Option/flatMap policy
    (MovieLensParser.scala:15-25)."""
    return read_csv(
        spark, path, header=True, schema=MOVIES_SCHEMA, drop_malformed=True
    )


def read_ratings(spark: SparkSession, path: str) -> DataFrame:
    """ratings.csv -> (movieId, year, rating): epoch seconds -> calendar
    year (MovieLensParser.scala:32-42)."""
    raw = read_csv(
        spark, path, header=True, schema=RATINGS_RAW_SCHEMA, drop_malformed=True
    )
    return raw.select(
        "movieId",
        F.year(F.from_unixtime("timestamp")).alias("year"),
        "rating",
    )


def read_tags(spark: SparkSession, path: str) -> DataFrame:
    """tags.csv -> (movieId, year) (MovieLensParser.scala:49-58)."""
    raw = read_csv(
        spark, path, header=True, schema=TAGS_RAW_SCHEMA, drop_malformed=True
    )
    return raw.select("movieId", F.year(F.from_unixtime("timestamp")).alias("year"))
