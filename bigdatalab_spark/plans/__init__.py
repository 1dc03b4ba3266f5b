from bigdatalab_spark.plans.inspect import (
    exchange_count,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_count,
)

__all__ = [
    "exchange_count",
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_count",
]
