"""The reference's own lab queries as typed-DataFrame functions.

These operate on the fixture adapters (:mod:`bigdatalab_spark.sources.
fixtures`) rather than the driver's warehouse tables, and are verified
in tests/test_lab_queries.py against the reference's published golden
outputs (301-spark-basics/README.md:68-76) and hand-computed expected
rows. The warehouse-table twins of these shapes live in the registered
query modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdatalab_spark.functions import tokenize
from bigdatalab_spark.sources.schemas import WEATHER_MISSING

# ---- word count family on a text-line frame (column `value`) ----------------


def word_count(lines: DataFrame) -> DataFrame:
    """(word, count) — 301-solutions.scala:21-24; golden (sopra,1),(la,4)."""
    return (
        lines.select(F.explode(tokenize("value")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def word_length_count(lines: DataFrame) -> DataFrame:
    """(length, count) — golden (2,4),(5,8)."""
    return (
        lines.select(F.explode(tokenize("value")).alias("word"))
        .groupBy(F.length("word").alias("length"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def avg_word_length_by_initial(lines: DataFrame) -> DataFrame:
    """(initial, avg_len) — golden (s,5.0),(l,2.0)."""
    words = lines.select(F.explode(tokenize("value")).alias("word"))
    return (
        words.groupBy(F.substring("word", 1, 1).alias("initial"))
        .agg(F.avg(F.length("word")).alias("avg_len"))
    )


def inverted_index(lines: DataFrame) -> DataFrame:
    """word -> sorted line indexes — golden (sopra,[0]),(la,[0,1]).

    Line index via row_number over the input order surrogate
    (zipWithIndex semantics, 301-solutions.scala:56; SURVEY §7.4.5).

    LAB FIXTURE ONLY: the un-partitioned Window here is a single-task
    global sort — correct and cheap on the 2-line golden text, wrong
    at scale. Point real data at
    ``operators.indexing.zip_with_index`` (distributed per-partition
    offsets) or key postings by an existing doc_id column, as the
    registered scale query does.
    """
    idx = F.row_number().over(
        Window.orderBy(F.monotonically_increasing_id())
    ) - 1
    indexed = lines.withColumn("line_id", idx)
    return (
        indexed.select("line_id", F.explode(tokenize("value")).alias("word"))
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("line_id")).alias("lines"))
    )


# ---- weather lab queries ----------------------------------------------------


def avg_temperature_per_month(weather: DataFrame) -> DataFrame:
    """The course hello-world (ExampleWeather2.scala:26-36): filter
    sentinel, grouped avg, sort by month."""
    return (
        weather.filter(F.col("temperature") < WEATHER_MISSING)
        .groupBy("month")
        .agg(F.avg("temperature").alias("avg_temp"))
        .orderBy("month")
    )


def max_temperature_per_year(weather: DataFrame) -> DataFrame:
    """MaxTemperature MR job (MaxTemperatureMapper/Reducer)."""
    return (
        weather.filter(F.col("temperature") < WEATHER_MISSING)
        .groupBy("year")
        .agg(F.max("temperature").alias("max_temp"))
        .orderBy("year")
    )


def max_temperature_per_uk_city(weather: DataFrame, stations: DataFrame) -> DataFrame:
    """302's capstone (ExerciseComplete.scala:151-153, 267-278 rdd6b/d):
    filter UK stations BEFORE the join (manual predicate+agg pushdown),
    broadcast the dim, grouped max, sorted desc."""
    uk = stations.filter(F.col("country") == "UK").select("usaf", "wban", "name")
    pre = (
        weather.filter(F.col("temperature") < WEATHER_MISSING)
        .groupBy("usaf", "wban")
        .agg(F.max("temperature").alias("max_temp"))
    )
    return (
        pre.join(F.broadcast(uk), ["usaf", "wban"])
        .groupBy("name")
        .agg(F.max("max_temp").alias("max_temp"))
        .orderBy(F.desc("max_temp"), F.asc("name"))
    )


# ---- movielens capstone -----------------------------------------------------


def top_rated_movies_per_year(
    movies: DataFrame, ratings: DataFrame, tags: DataFrame, top_n: int = 10
) -> DataFrame:
    """The optimized MovieLens job (ExerciseComplete.scala:354-379):
    aggregate ratings FIRST, rank within year, enrich from broadcast
    movies + tag counts (left-outer keeps tag-less movies — the Option/
    None path)."""
    agg = ratings.groupBy("movieId", "year").agg(
        F.avg("rating").alias("avg_rating"), F.count(F.lit(1)).alias("n_ratings")
    )
    w = Window.partitionBy("year").orderBy(F.desc("avg_rating"), F.asc("movieId"))
    ranked = agg.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    tags_per_movie = tags.groupBy("movieId").agg(F.count(F.lit(1)).alias("n_tags"))
    return (
        ranked.join(F.broadcast(movies.select("movieId", "title")), "movieId", "left")
        .join(F.broadcast(tags_per_movie), "movieId", "left")
        .select(
            "year", "rank", "movieId", "title", "avg_rating", "n_ratings",
            F.coalesce("n_tags", F.lit(0)).alias("n_tags"),
        )
        .orderBy("year", "rank")
    )


# ---- 303-spark-sql lab queries ----------------------------------------------


def transactions_avg_price_per_city(transactions: DataFrame) -> DataFrame:
    """Real-estate query (303-solutions.scala:4): EUR conversion x1.2,
    rounded avg per city, descending."""
    return (
        transactions.groupBy("city")
        .agg(F.round(F.avg(F.col("price") * 1.2), 2).alias("avgPrice"))
        .orderBy(F.desc("avgPrice"))
    )


def gender_pay_gap(userdata: DataFrame) -> DataFrame:
    """Pay-gap query (303-solutions.scala:11-30): avg salary per
    (country, gender), self-joined per country, gap as an expr column."""
    avg_salary = userdata.groupBy("country", "gender").agg(
        F.avg("salary").alias("avgSalary")
    )
    female = (
        avg_salary.filter("gender = 'Female'")
        .withColumnRenamed("avgSalary", "f_avgSalary")
        .drop("gender")
    )
    male = (
        avg_salary.filter("gender = 'Male'")
        .withColumnRenamed("avgSalary", "m_avgSalary")
        .drop("gender")
    )
    return (
        female.join(male, "country")
        .withColumn("gap", F.expr("f_avgSalary - m_avgSalary"))
        .orderBy("country")
    )
