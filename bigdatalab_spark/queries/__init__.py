"""Named query library.

Every reference lab exercise (SURVEY.md §2) and every scale extension is a
named, tested query here: a function ``(spark, sf_dir) -> DataFrame`` plus,
when SQL-expressible, a DuckDB oracle string used by the correctness gate.

Importing this package registers all queries into
:data:`bigdatalab_spark.queries.registry.REGISTRY`.
"""

from bigdatalab_spark.queries import (  # noqa: F401  (import = registration)
    analytics,
    dedup,
    joins,
    movielens,
    similarity,
    sketches,
    streaming_batch,
    textqa,
    tpch,
    weather,
    wordcount,
)
from bigdatalab_spark.queries.registry import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
