"""The word-count family over ``documents.text`` (SURVEY §2.4 A1-A6).

Reference jobs re-expressed: word count (WordCount.java:25-48,
301-solutions.scala:21-24), word-length count (WordLengthCount.java:25-50),
avg word length by initial (Ex4AverageWordLength.java:37-47), inverted
index (Ex4InvertedIndex.java:23-45, 301-solutions.scala:56-59).

Scale notes: ``explode(split(...))`` is a narrow op — no shuffle until the
groupBy, and the hash aggregate does map-side partial aggregation, so at
100 TB the shuffle carries one row per distinct (word[,key]) per task,
not one per token. The reference's hand-written combiners
(WordLengthCount.java:66, MaxTemperatureWithCombiner.java:31) are this
partial-agg step, automatic in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatalab_spark.functions import tokenize
from bigdatalab_spark.queries.registry import query
from bigdatalab_spark.sources import load_table


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(tokenize("text")).alias("word")
    )


@query(
    "word_count",
    ids=("A1", "P2"),
    oracle="""
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
        ORDER BY n DESC, word
    """,
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap(split) -> count per word; golden shape (sopra,1),(la,4)."""
    return (
        _words(spark, sf_dir)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
    )


@query(
    "word_length_count",
    ids=("A2",),
    oracle="""
        SELECT length(word) AS word_len, count(*) AS n
        FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word_len
        ORDER BY word_len
    """,
)
def word_length_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count words grouped by their length (derived grouping key)."""
    return (
        _words(spark, sf_dir)
        .groupBy(F.length("word").alias("word_len"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("word_len")
    )


@query(
    "avg_word_length_by_initial",
    ids=("A4", "A5"),
    oracle="""
        SELECT substr(word, 1, 1) AS initial,
               CAST(sum(length(word)) AS DOUBLE) / count(*) AS avg_len,
               count(*) AS n_words
        FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY initial
        ORDER BY initial
    """,
)
def avg_word_length_by_initial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average word length keyed by first letter; true double average
    (the reference's int-division variant is a documented bug —
    SURVEY §7.4.4 — we canonicalize on double)."""
    return (
        _words(spark, sf_dir)
        .groupBy(F.substring("word", 1, 1).alias("initial"))
        .agg(
            (F.sum(F.length("word")).cast("double") / F.count(F.lit(1))).alias("avg_len"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .orderBy("initial")
    )


@query(
    "inverted_index",
    ids=("A6", "P10"),
    oracle="""
        SELECT word,
               array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings,
               count(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word
              FROM documents)
        WHERE word <> ''
        GROUP BY word
        ORDER BY word
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word -> sorted postings list of documents containing it.

    The MR version collects byte offsets into a TreeSet
    (Ex4InvertedIndex.java:38-44); we use document ids — deterministic
    under any partitioning (SURVEY §7.4.5) — and emit the postings as a
    comma-joined string so the oracle hash is representation-stable.
    ``collect_set`` + ``sort_array`` is the TreeSet: dedup + order.
    """
    return (
        _words(spark, sf_dir)
        .groupBy("word")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("doc_id"))).alias("postings"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("word")
    )
