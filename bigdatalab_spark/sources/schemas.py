"""Declared schemas + parse specs for the reference's datasets (FIXTURES.md).

Each entry is the typed contract a source adapter produces; queries never
re-parse. Covers the three schema modes the reference teaches
(303-spark-sql/README.md:15-40): inferred, explicit StructType, and
header-driven CSV with options.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdatalab_spark.sources.readers import FixedWidthField

#: ISD fixed-width weather observation (WeatherData.scala:3-11;
#: MaxTemperatureMapper.java:19-20; ExampleWeather2.scala:7-13).
#: temperature raw offset [87,92) scaled /10; quality flag char 92.
ISD_WEATHER_SPEC: list[FixedWidthField] = [
    FixedWidthField("usaf", 4, 10),
    FixedWidthField("wban", 10, 15),
    FixedWidthField("year", 15, 19),
    FixedWidthField("month", 19, 21),
    FixedWidthField("day", 21, 23),
    FixedWidthField("temperature", 87, 92, dtype="double", scale=10.0),
    FixedWidthField("quality", 92, 93),
]

#: missing-temperature sentinel: raw 9999 -> 999.9 after /10
#: (MaxTemperatureMapper.java:13,22; Exercise.scala:58 filters < 999)
WEATHER_MISSING = 999.0

#: stations.csv, 11 quoted columns (StationData.scala:2-14): empty
#: lat/lon/elevation default to 0.0 at parse time.
STATIONS_SCHEMA = StructType(
    [
        StructField("usaf", StringType()),
        StructField("wban", StringType()),
        StructField("name", StringType()),
        StructField("country", StringType()),
        StructField("state", StringType()),
        StructField("call", StringType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("elevation", DoubleType()),
        StructField("date_begin", StringType()),
        StructField("date_end", StringType()),
    ]
)

#: tweet.dsv: |-separated, 11 positional columns, header row LANGUAGE...
#: (ExerciseNetcat.scala:135-136,158,189; FIXTURES.md §4)
TWEETS_SCHEMA = StructType(
    [
        StructField("language", StringType()),
        StructField("content", StringType()),
        StructField("tw_hashtags", StringType()),
        StructField("sentiment_crawler", StringType()),
        StructField("city", StringType()),
        StructField("county", StringType()),
        StructField("state", StringType()),
        StructField("country", StringType()),
        StructField("continent", StringType()),
        StructField("fullname", StringType()),
        StructField("gender", StringType()),
    ]
)

#: movielens post-parse schemas (MovieLensParser.scala:15,32,49;
#: 303-spark-sql/README.md:168-170)
MOVIES_SCHEMA = StructType(
    [
        StructField("movieId", LongType()),
        StructField("title", StringType()),
        StructField("genres", StringType()),
    ]
)

RATINGS_RAW_SCHEMA = StructType(
    [
        StructField("userId", LongType()),
        StructField("movieId", LongType()),
        StructField("rating", DoubleType()),
        StructField("timestamp", LongType()),
    ]
)

TAGS_RAW_SCHEMA = StructType(
    [
        StructField("userId", LongType()),
        StructField("movieId", LongType()),
        StructField("tag", StringType()),
        StructField("timestamp", LongType()),
    ]
)

#: population zipcode CSV — the explicit-StructType exercise reads ALL
#: columns as strings (303-spark-sql/README.md:22-28)
POPULATION_SCHEMA = StructType(
    [
        StructField("zipcode", StringType()),
        StructField("total_population", StringType()),
        StructField("avg_age", StringType()),
        StructField("male", StringType()),
        StructField("female", StringType()),
    ]
)

#: person micro-fixture (TestSpark.scala:60-73)
PERSON_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("age", IntegerType()),
        StructField("color", StringType()),
    ]
)
