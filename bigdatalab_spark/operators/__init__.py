from bigdatalab_spark.operators.aggregates import money_sum, stable_avg

__all__ = ["money_sum", "stable_avg"]
