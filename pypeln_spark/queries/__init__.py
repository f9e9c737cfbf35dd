"""Query registry — the judged surface.

Every entry pairs a Spark implementation (built on pypeln_spark's operator /
relational / extension layers) with the equivalent ANSI SQL that DuckDB runs
on the same parquet files. The driver hash-compares the two at sf0.01
(CORRECTNESS_r{N}.json) — column names are aligned on both sides, and every
order-sensitive float reduction goes through the decimal-cast convention
(pypeln_spark/functions.py) so values are bit-identical across engines.
"""

from .base import REGISTRY, Query, register, tables

# Importing the modules populates REGISTRY in module order; the explicit
# _PRIORITY reorder below then decides the DRIVER-VISIBLE order. The driver
# hash-checks the first 50 registered queries per round, so the front of the
# registry is rotated each round toward the queries with the fewest driver
# correctness rows. Current front (for the next driver run): the 20 queries
# never driver-checked in r1/r2 (all streaming, ANN/embedding, asof/range
# join, sketch CMS/quantiles, simhash pairs, minhash clusters/fast), the
# three r1 failures whose fixes have only local-gate evidence, and the
# queries added since r2 — 47 of the 50 checked slots carry no prior green
# driver row. Later additions (positions 51+) wait for the next rotation;
# ALL registry entries are covered every session by the local DuckDB gate
# (tests/test_correctness_gate.py replays every oracle).
# Every output schema is contract-tested canonicalizer-safe
# (assert_driver_safe_schema inside the gate), so front-loading unusual
# output types is no longer a blast-radius risk the way it was in r1.
from . import pipeline  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import curation  # noqa: E402,F401

try:  # later phases; keep imports soft so a broken module never kills entry()
    from . import text  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import dedup  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import similarity  # noqa: F401
except ImportError:  # pragma: no cover
    pass
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import relational4  # noqa: E402,F401
from . import variant  # noqa: E402,F401
from . import quality  # noqa: E402,F401

try:
    from . import streaming  # noqa: F401
except ImportError:  # pragma: no cover
    pass

# Driver-visible order: names listed here register first (in this order);
# everything else follows in original module order. Unknown names are
# ignored so a renamed query can't break import.
#
# Round-4 rotation (VERDICT r3 "Next round" #1): the front 50 is exactly the
# 52-query never-driver-checked set minus the two deferred TPC-H analogues
# (q13_customer_order_distribution, q14_promo_revenue_share — both already
# green in the local full-registry DuckDB gate), which lead the r5 window
# together with any queries added this round. Every name below has zero
# driver correctness rows across r1–r3; all are green in
# tests/test_correctness_gate.py. pipeline_datasource_source is deliberately
# first (VERDICT #6: never drop it from the window).
_PRIORITY = [
    "pipeline_datasource_source",
    "pipeline_flat_map_udtf",
    "pipeline_observe_metrics",
    "curation_source_mix",
    "text_unigram_lm_quality",
    "ann_pq_adc_topk",
    "ann_knn_classify",
    "ann_ivf_pq_topk",
    "q2_min_cost_supplier",
    "q4_order_priority_checking",
    "q7_nation_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_part_values",
    "q12_late_shipment_priority",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q20_excess_volume_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "events_retention_cohorts",
    "full_outer_month_spenders",
    "group_map_median_chars",
    "group_agg_udaf_midrange",
    "fuzzy_join_supplier_names",
    "events_gapfill_hourly",
    "events_scd2_status_intervals",
    "window_distribution_gauntlet",
    "merge_upsert_orders",
    "recursive_cte_ancestry",
    "variant_nested_event_doc",
    "variant_props_rollup",
    "streaming_variant_props_rollup",
    "quality_expectations_lineitem",
    "quality_profile_orders",
    "ivm_orders_priority_merge",
    "quality_table_diff_orders",
    "events_value_anomalies",
    "events_rolling_24h_stats",
    "histogram_equi_depth_by_type",
    "bloom_pruned_join_revenue",
    "zorder_layout_events",
    "graph_triangles_part_cooccurrence",
    "streaming_funnel_stages",
    "asof_join_with_tolerance",
    "streaming_interval_left_join",
    "streaming_asof_static_enrich",
    # -- r5 front: deferred + anything added in round 4 --
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "multimodal_real_decode_pnm",
    "sketch_quantile_global_histogram",
    "bucketed_join_priority_revenue",
    "streaming_merge_upsert_orders",
    "graph_pagerank_part_cooccurrence",
    "dedup_incremental_vs_corpus",
    "embedding_quantize_int8",
    "search_hybrid_rrf",
    "graph_ppr_part_cooccurrence",
]


def _reorder() -> None:
    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    for n, q in REGISTRY.items():
        if n not in ordered:
            ordered[n] = q
    # preserve object identity — other modules hold references to REGISTRY
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "Query", "register", "tables"]
