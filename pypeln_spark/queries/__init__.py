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
# hash-checks the first 50 registered queries per round, so the front of
# the registry is rotated each round toward the queries with the fewest /
# stalest driver correctness rows (see the rotation note above _PRIORITY).
# ALL registry entries are covered every session by the local DuckDB gate
# (tests/test_correctness_gate.py replays every oracle), and every output
# schema is contract-tested canonicalizer-safe (assert_driver_safe_schema
# inside the gate), so front-loading unusual output types carries no
# blast-radius risk.
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
# Round-10 rotation — EXACTLY 50 names (driver samples 50; invariants
# pinned by tests/test_correctness_gate.py::test_driver_window_rotation_
# invariants: window size, no duplicates, front-of-registry equality,
# never-driver-checked entries inside the window, and the two-phase
# 5-round-cycle freshness rule). Registry holds 205 ever-green entries.
# The front 50 is (a) VERDICT r9 #2: ALL 24 remaining r5-stale entries,
# oldest cohort first — they hit the 5-round hard-fail threshold if they
# miss this window; (b) r10 debuts (never driver-checked, must debut
# inside the window); (c) greens whose CODE changed in r10; then (d) the
# r6-stale cohort in registry order filling the remaining slots (VERDICT
# r9 #7 — chip the 46-entry r6 cohort ahead of schedule). ALL 205 entries
# stay covered every session by the local DuckDB gate
# (tests/test_correctness_gate.py replays every oracle).
_PRIORITY = [
    # -- (a) the 24 r5-stale entries (5-round cycle deadline this round) --
    "array_function_gauntlet",
    "unpivot_order_status_counts",
    "manual_median_price_by_priority",
    "cheapest_item_supplier_per_part",
    "nation_pair_trade_volume",
    "not_in_parts_never_shipped",
    "window_navigation_gauntlet",
    "listagg_region_nations",
    "stats_moments_by_event_type",
    "skew_salted_event_totals",
    "sketch_quantile_global_histogram",
    "bucketed_join_priority_revenue",
    "events_transition_matrix",
    "sketch_kmv_overlap_users",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "events_time_to_convert_quantiles",
    "graph_ppr_part_cooccurrence",
    "graph_pagerank_part_cooccurrence",
    "graph_kcore_part_cooccurrence",
    "graph_lpa_part_cooccurrence",
    "quality_drift_events_cohorts",
    "quality_ks_test_value_cohorts",
    "streaming_drift_daily_mix",
    # -- (b) r10 debuts, never driver-checked --
    "streaming_incremental_dedup_durable",
    "streaming_embedding_ingest_cells",
    "streaming_ann_topk_serving",
    "streaming_curated_ingest",
    # the hot-bucket star cap: LSH candidate generation bounded per bucket
    "dedup_lsh_hot_bucket_star",
    # its streaming twin: the gate's probed band view width-capped forever
    "streaming_incremental_dedup_capped",
    # corpus-scale simhash: 60-bit fingerprints, 4x15-bit band keys
    "dedup_simhash_near_pairs60",
    # -- (c) greens whose CODE changed in r10 (gate refactor: bucketing
    # hooks + _text_ingest_gate helper + epoch-label default + auto
    # compaction cadence plumbing) --
    "streaming_incremental_dedup",
    "streaming_embedding_ingest",
    # -- (d) r6-stale cohort, registry order (17 fit; the last 9 roll to
    # the r11 window) --
    "pipeline_each_audit_count",
    "pipeline_to_iterable_roundtrip",
    "q1_pricing_summary",
    "q6_revenue_delta",
    "agg_nation_customer_stats",
    "groupby_having_hot_parts",
    "count_distinct_parts_by_brand",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "semi_join_auto_orders",
    "anti_join_idle_customers",
    "window_top3_orders_per_customer",
    "window_running_customer_spend",
    "window_lag_order_gap_days",
    "top_k_expensive_parts",
    "set_intersect_nations",
    "set_except_nations",
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
