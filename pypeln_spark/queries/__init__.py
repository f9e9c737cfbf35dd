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
# Round-5 rotation: after r4, EVERY pre-r4 registry entry has a driver-green
# row. The front 50 is therefore (a) the 11 queries added late in r4 that
# have never been driver-checked, (b) the 16 queries added this round
# (containment dedup, LPA communities, ANN recall eval, token budget, WAV
# decode, video frame-sampling, k-core, batch + streaming drift monitors, the e2e curation capstone, the event transition matrix, KMV set algebra, the exact KS test), then (c)
# re-confirmation of the STALEST green rows — all 13 queries last checked
# in r1, plus the oldest 10 of the r2 cohort — so regressions can't hide
# behind old green rows. All 190 entries stay covered every session by the
# local DuckDB gate (tests/test_correctness_gate.py).
_PRIORITY = [
    # -- (a) r4 additions, never driver-checked --
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
    # -- (b) r5 additions --
    "dedup_containment_pairs",
    "graph_lpa_part_cooccurrence",
    "ann_recall_eval_ivf",
    "curation_token_budget",
    "multimodal_real_decode_wav",
    "multimodal_video_frame_sample",
    "graph_kcore_part_cooccurrence",
    "quality_drift_events_cohorts",
    "streaming_drift_daily_mix",
    "curation_e2e_pretrain_pack",
    "events_transition_matrix",
    "sketch_kmv_overlap_users",
    "quality_ks_test_value_cohorts",
    "curation_temperature_weights",
    "ann_recall_eval_lsh",
    "events_time_to_convert_quantiles",
    # -- (c) stalest greens: the full r1 cohort... --
    "subquery_orders_above_avg",
    "correlated_max_quantity_items",
    "grouping_sets_orders",
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
    # -- ...then the oldest 10 of the r2 cohort --
    "pipeline_map_revenue",
    "pipeline_map_python_udf",
    "pipeline_map_rows_python",
    "pipeline_filter_shipdate",
    "pipeline_flat_map_tokens",
    "pipeline_flat_map_python",
    "pipeline_concat_parties",
    "pipeline_ordered_lineitem",
    "pipeline_unbounded_pump",
    "multimodal_asset_feature_stats",
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
