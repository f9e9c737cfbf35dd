"""Query registry — the judged surface.

Every entry pairs a Spark implementation (built on pypeln_spark's operator /
relational / extension layers) with the equivalent ANSI SQL that DuckDB runs
on the same parquet files. The driver hash-compares the two at sf0.01
(CORRECTNESS_r{N}.json) — column names are aligned on both sides, and every
order-sensitive float reduction goes through the decimal-cast convention
(pypeln_spark/functions.py) so values are bit-identical across engines.
"""

from .base import REGISTRY, RETIRED, Query, register, tables

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
# Round-12 rotation — EXACTLY 50 names (driver samples 50; invariants
# pinned by tests/test_correctness_gate.py::test_driver_window_rotation_
# invariants: window size, no duplicates, front-of-registry equality,
# never-driver-checked entries inside the window, and the two-phase
# 5-round-cycle freshness rule). The front 50 is (a) VERDICT r11 #1:
# ALL 20 r7-stale entries, in registry order — they hit the 5-round
# hard-fail threshold if they miss this window; (b) the TWO r12 debuts
# (never driver-checked, must debut inside the window):
# streaming_ann_topk_serving_live — serving against the LIVE index,
# query epochs interleaved with ingest epochs and a mid-stream
# cell-growing retrain (VERDICT r11 #4) — and
# search_mmr_diversified_topk — the greedy MMR diversified-top-k
# rerank with its full trajectory oracle-replayed; then (c) the
# r8-stale cohort in registry order filling the remaining slots
# oldest-first (the other 19 r8 entries lead the r13 window). ALL
# registry entries stay covered every session by the local DuckDB gate
# (tests/test_correctness_gate.py replays every oracle).
#
# RETIREMENT POLICY (VERDICT r11 #6 — written before the 250-entry
# rotation-capacity wall, ~r17 at 2 debuts/round). An entry may be
# RETIRED when BOTH hold: (1) it is documented SUPERSEDED by a strictly
# more general entry that exercises the same code path with equal or
# stronger oracle coverage (e.g. 32-bit `dedup_simhash_near_pairs_wide`
# vs the 60-bit x 4-table `dedup_simhash_near_pairs_wide60`), or it is
# a scaffolding variant whose only delta is a parameter another entry
# now sweeps; and (2) its implementation stays covered by at least one
# pytest (retirement removes the REGISTRY row + its _PRIORITY
# eligibility, never the code or its unit tests). Mechanics: move the
# register() call under `if os.environ.get("PYPELN_SPARK_RETIRED")`,
# record the retirement (name, superseding entry, round) in
# COVERAGE.md's Retired table; the rotation test ignores names absent
# from REGISTRY, so retired entries simply stop consuming window slots
# — their historical CORRECTNESS rows remain valid evidence. Retire at
# most ~5/round so the driver diff stays reviewable. No retirements
# executed yet: capacity math (216 entries + ~2 debuts/round vs
# 50x5=250) first forces a retirement around r16-r17.
_PRIORITY = [
    # -- (a) the 20 r7-stale entries (5-round cycle deadline this round) --
    "pipeline_pickled_objects",
    "sketch_kmv_distinct_users",
    "sketch_cms_heavy_hitters",
    "sketch_hll_distinct_users",
    "sketch_quantile_doc_lengths",
    "q10_returned_item_ranking",
    "events_funnel_conversion",
    "streaming_tumbling_hourly",
    "streaming_sliding_1h_30m",
    "streaming_session_windows",
    "streaming_watermark_late_drop",
    "streaming_stateful_running_totals",
    "asof_join_purchase_to_view",
    "range_join_purchase_after_signup",
    "streaming_interval_join_purchase_signup",
    "streaming_static_enrich_nation",
    "streaming_kmv_daily_distinct",
    "streaming_dedup_events",
    "asof_join_view_to_next_purchase",
    "streaming_doc_quality_counts",
    # -- (b) the r12 debuts --
    "streaming_ann_topk_serving_live",
    "search_mmr_diversified_topk",
    # -- (c) r8-stale cohort, registry order (the remaining 19 r8
    # entries lead the r13 window) --
    "pipeline_datasource_source",
    "pipeline_flat_map_udtf",
    "pipeline_observe_metrics",
    "curation_source_mix",
    "text_repetition_stats",
    "text_pii_scrub",
    "text_top_tokens",
    "text_tfidf_top_terms",
    "text_unigram_lm_quality",
    "search_tfidf_cosine_topk",
    "search_tfidf_pruned_recall_eval",
    "dedup_simhash_near_pairs",
    "dedup_simhash_recall_eval",
    "ann_ivf_kmeans_topk",
    "semantic_dedup_pairs",
    "ann_pq_adc_topk",
    "ann_knn_classify",
    "ann_ivf_pq_topk",
    "ann_recall_eval_ivf_kmeans",
    "sketch_bloom_filter_probe",
    "q4_order_priority_checking",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q22_dormant_customers",
    "events_retention_cohorts",
    "full_outer_month_spenders",
    "group_map_median_chars",
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

__all__ = ["REGISTRY", "RETIRED", "Query", "register", "tables"]
