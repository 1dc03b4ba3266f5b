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
from bigdatalab_spark.queries import (  # noqa: F401  (register
    bpe,
    datapipe,
    pipeline,
    spark4_sql,
    timeseries,
    tpch_suite,
    warehouse,
)
# AFTER the SURVEY-core top-50 on purpose: beyond-reference extensions must not
# displace driver-window entries; _DEMOTED still sorts last)
from bigdatalab_spark.queries.registry import REGISTRY, QuerySpec

# The driver's correctness gate records the FIRST 50 registry entries, so
# registration order is the scoreboard. Demote query shapes whose every
# SURVEY §2 id is also covered by an earlier entry (they stay registered,
# runnable, and pytest-covered — they just must not displace the only
# representative of an operator family from the driver window).
_DEMOTED = (
    "distinct_users_per_type",  # A11 — table_profile, multi_distinct_agg, hll
    "part_type_stats",  # A3/A4/A7 — max_value_per_month, table_profile, pricing
    "order_priority_count",  # A9/P3 — priority_shipmode_matrix, pricing_summary
    "revenue_forecast_filter",  # A4/P3 — pricing_summary
    "promo_revenue_share",  # A4/J1/P6 — pricing, shipping_priority, high_value
    "large_volume_customers",  # A4/J6/O2 — shipping_priority, customer_nation_region
    "lineitem_part_supplier",  # A7/J1/J6 — shipping_priority, customer_nation_region
    "uk_style_filtered_join",  # A3/J1/O2/P3 — all covered above
    "customer_order_counts_outer",  # J7 — preagg_revenue_join, top_parts_per_year
    "top_customers_per_segment",  # A4/O2/O5 — top_parts_per_year
)

# Round-3+ operators registered inside SURVEY-core modules but added AFTER
# the driver window froze (round 2). They move past the window so the
# scoreboard rows stay byte-stable across rounds; the full-registry
# tools.oracle_check run covers them with the same strictness.
_POST_WINDOW = (
    "dedup_segments",
    "bloom_incremental_dedup",
    "exists_returned_orders",
    "small_quantity_revenue",
    "cube_order_stats",
    "semantic_dedup",
    "user_running_stats",
    "event_type_crosstab",
    "ann_pq_topk",
    "ann_ivf_pq",
    "sql_udf_revenue",
    "zorder_clustering_key",
    "sessionized_dynamic_gap",
    "important_part_types",
    "streaming_quality_gate",
    "orders_price_bands",
    "grouping_sets_revenue",
    # round 4
    "span_dedup",
    "purchases_in_busy_windows",
    "udtf_doc_spans",
    "lateral_top_order_per_customer",
    "event_attrs_xml",
    "warehouse_quality_checks",
    # round 4: TPC-H completion suite (Q2/Q5/Q7/Q8/Q9/Q10/Q15/Q16/Q19/Q20/Q21/Q22)
    "min_unit_price_supplier",
    "local_supplier_volume",
    "volume_shipping_pairs",
    "nation_market_share",
    "product_type_profit",
    "returned_item_reporting",
    "top_revenue_supplier",
    "part_supplier_variety",
    "disjunctive_brand_revenue",
    "excess_share_suppliers",
    "sole_return_suppliers",
    "idle_rich_customers",
    # round 4: Spark 4 SQL language surfaces
    "recursive_calendar_orders",
    "pipe_syntax_returnflag_revenue",
    "collated_segment_match",
    "weighted_median_price",
    "token_importance_counts",
    "robust_value_outliers",
    "pagerank_supplier_centrality",
    "supplier_copurchase_triangles",
    "user_spans_in_busy_windows",
    "order_value_histogram",
    "safe_ratio_metrics",
    "als_supplier_recommendations",
    # round 5
    "customer_order_distribution",
    "intradoc_span_dedup",
    "crosscorpus_best_dedup",
    "fuzzy_token_matches",
    "multires_event_rollup",
    "approx_value_quantiles",
    "orders_snapshot_cdc",
    "streaming_cdc_applied",
    "heavy_hitter_words",
    "dedup_jaccard_prefix",
    "streaming_attribution",
    # round 6
    "variant_props_stats",
    "unpivot_order_metrics",
    "group_by_all_revenue",
    "parameterized_sql_revenue",
    # round 7
    "listagg_order_priorities",
    "bitmap_distinct_users",
    # round 8
    "incremental_dedup_index_status",
    "wav_audio_features",
    "pipe_syntax_order_stats",
    "streaming_dedup_ingest",
    "pivot_order_status_matrix",
    "range_window_revenue",
    "png_image_features",
    "dedup_index_forget_status",
    "png_resize_features",
    "quality_filter_funnel",
    "normalization_dedup_stats",
    "statestore_user_counts",
    "sdp_quality_funnel",
    "sql_scripting_threshold",
    "cogroup_click_attribution",
    "histogram_value_quantiles",
    "hll_union_daily_users",
    # round 9 (textqa registers inside the SURVEY-core import block, so
    # the new query must be demoted past the pinned 50-entry window)
    "jpeg_image_features",
)


def _reorder() -> None:
    # pop raises KeyError if a demoted name ever disappears from the
    # registry, so a rename can't silently undo the ordering contract
    moved = {n: REGISTRY.pop(n) for n in _POST_WINDOW + _DEMOTED}
    REGISTRY.update(moved)


_reorder()

__all__ = ["REGISTRY", "QuerySpec"]
