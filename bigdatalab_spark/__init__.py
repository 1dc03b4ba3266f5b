"""bigdatalab_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference lab repository (andreavaienti/BigDataLab):
batch relational queries, multi-format IO, probabilistic sketches,
structured streaming, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis).

Everything here is declarative DataFrame / Spark SQL so Catalyst + Tungsten
(predicate pushdown, column pruning, whole-stage codegen, AQE) do the
physical planning. Python UDFs appear only as Arrow-vectorized pandas UDFs
in the `scale` extensions where built-ins cannot express the semantics.
"""

from bigdatalab_spark.session import get_session

__version__ = "0.1.0"

__all__ = ["get_session", "__version__"]
