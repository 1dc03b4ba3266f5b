from bigdatalab_spark.operators.aggregates import money_sum, stable_avg
from bigdatalab_spark.operators.indexing import zip_with_index
from bigdatalab_spark.operators.joins import broadcast_dim_join, preagg_join
from bigdatalab_spark.operators.topk import top_n_per_group

__all__ = [
    "broadcast_dim_join",
    "money_sum",
    "preagg_join",
    "stable_avg",
    "top_n_per_group",
    "zip_with_index",
]
