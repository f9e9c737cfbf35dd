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
# Round-8 rotation — EXACTLY 50 names (the driver samples 50;
# tests/test_correctness_gate.py::test_driver_window_rotation_invariants
# pins the size, the no-duplicates rule, front-of-registry equality, and
# that every never-driver-checked query sits inside the window). The
# registry holds 202 entries, 202/202 ever-driver-green, zero failures.
# The front 50 is (a) the eight entries the r7 window left out (the 7
# r3-stale plus search_tfidf_cosine_topk, whose code was touched in r7)
# — VERDICT r7 #1 puts them at positions 1-8; (b) the 11 greens whose
# CODE changed in r8 (two-arm simhash/near-dup recall evals; the 5-arm
# IVF quantizer eval; the three streaming harnesses on the configurable
# sink root, the ingest gate also on IncrementalLshIndex; the pruned
# TF-IDF eval after the champions-mode retire fix; simhash_near_pairs /
# near_dup_lsh gained inert tables=/probe_hamming= params, default paths
# plan-identical; ann_ivf_kmeans_topk and semantic_dedup_pairs consume
# the re-keyed kmeans artifact — same training spec, values identical);
# plus streaming_embedding_ingest, ADDED in r8 (never driver-checked —
# must debut inside the window); then (c) 30 of the 49 r4-stale entries
# in registry order. NOTE: with 203 entries and a 50-slot window, full
# coverage takes 5 rounds — the 19 r4 entries that didn't fit
# (merge_upsert_orders through streaming_interval_left_join, plus
# q21_waiting_suppliers, see git log r8) go FIRST in r9, ahead of
# anything newer. ALL 203 entries stay covered every session by the
# local DuckDB gate (tests/test_correctness_gate.py).
_PRIORITY = [
    # -- (a) the eight the r7 window left out (VERDICT r7 #1) --
    "text_top_tokens",
    "text_tfidf_top_terms",
    "text_repetition_stats",
    "text_pii_scrub",
    "sketch_bloom_filter_probe",
    "streaming_cms_daily_heavy_hitters",
    "streaming_hll_daily_distinct",
    "search_tfidf_cosine_topk",
    # -- (b) greens whose code changed in r8 --
    "dedup_simhash_recall_eval",
    "embedding_near_dup_recall_eval",
    "ann_recall_eval_ivf_kmeans",
    "streaming_incremental_dedup",
    "streaming_asof_static_enrich",
    "streaming_merge_upsert_orders",
    "search_tfidf_pruned_recall_eval",
    "dedup_simhash_near_pairs",
    "embedding_near_dup_lsh",
    "ann_ivf_kmeans_topk",
    "semantic_dedup_pairs",
    # -- (b') added in r8, never driver-checked --
    "streaming_embedding_ingest",
    # -- (c) the r4-stale cohort, registry order (30 of 49 fit) --
    "pipeline_datasource_source",
    "pipeline_flat_map_udtf",
    "pipeline_observe_metrics",
    "curation_source_mix",
    "text_unigram_lm_quality",
    "ann_pq_adc_topk",
    "ann_knn_classify",
    "ann_ivf_pq_topk",
    "q4_order_priority_checking",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q22_dormant_customers",
    "events_retention_cohorts",
    "full_outer_month_spenders",
    "group_map_median_chars",
    "group_agg_udaf_midrange",
    "fuzzy_join_supplier_names",
    "events_gapfill_hourly",
    "events_scd2_status_intervals",
    "window_distribution_gauntlet",
    "q2_min_cost_supplier",
    "q7_nation_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_part_values",
    "q12_late_shipment_priority",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q20_excess_volume_suppliers",
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
