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
# Round-13 rotation — EXACTLY 50 names (driver samples 50; invariants
# pinned by tests/test_correctness_gate.py::test_driver_window_rotation_
# invariants: window size, no duplicates, front-of-registry equality,
# never-driver-checked entries inside the window, and the two-phase
# 5-round-cycle freshness rule). The front 50 is (a) VERDICT r12 #1:
# ALL 18 r8-stale entries, in registry order — they hit the 5-round
# hard-fail threshold if they miss this window; (b) the TWO r13 debuts
# (never driver-checked, must debut inside the window):
# search_mmr_over_ann_front — the MMR rerank composed over the
# IVF-kmeans candidate front with the literal-quantizer BNLJ-free plan
# (VERDICT r12 #5) — and streaming_bm25_topk_serving_live — live
# lexical retrieval, BM25 top-k served during ingest under per-epoch
# IDF/avgdl snapshots (VERDICT r12 #4); then (c) the first 30
# non-retired r9-cohort entries in registry order (the 16 remaining r9
# entries — variant_nested_event_doc onward in cohort order — lead the
# r14 window head). ALL registry entries PLUS the r13-retired four
# stay covered every session by the local DuckDB gate
# (tests/test_correctness_gate.py replays every oracle in
# REGISTRY ∪ RETIRED).
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
# eligibility, never the code or its unit tests). Mechanics (first
# executed r13, VERDICT r12 #6): pass `retired_by="<superseding name>"`
# to register() — the Query object then lands in base.RETIRED instead
# of REGISTRY (PYPELN_SPARK_RETIRED=1 re-registers), the local gate and
# plan lint keep covering REGISTRY ∪ RETIRED, and the retirement is
# recorded (name, superseding entry, round, rationale) in COVERAGE.md's
# Retired table; the rotation test ignores names absent from REGISTRY,
# so retired entries simply stop consuming window slots — their
# historical CORRECTNESS rows remain valid evidence. Retire at most
# ~5/round so the driver diff stays reviewable. After the r13 four
# (dedup_simhash_near_pairs_wide, ann_recall_eval_ivf,
# dedup_minhash_lsh, curation_e2e_pretrain_pack): 214 live entries +
# ~2 debuts/round vs 50x5=250 — headroom through ~r19.
_PRIORITY = [
    # -- (a) the 18 r8-stale entries (5-round cycle deadline this round) --
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
    "streaming_cms_daily_heavy_hitters",
    "streaming_hll_daily_distinct",
    "streaming_asof_static_enrich",
    "streaming_merge_upsert_orders",
    # -- (b) the r13 debuts --
    "search_mmr_over_ann_front",
    "streaming_bm25_topk_serving_live",
    # -- (c) first 30 non-retired r9-cohort entries, registry order (the
    # 16 remaining r9 entries lead the r14 window head) --
    "pipeline_map_revenue",
    "pipeline_map_python_udf",
    "pipeline_map_rows_python",
    "pipeline_filter_shipdate",
    "pipeline_flat_map_tokens",
    "pipeline_flat_map_python",
    "pipeline_concat_parties",
    "pipeline_ordered_lineitem",
    "pipeline_unbounded_pump",
    "multimodal_real_decode_pnm",
    "multimodal_real_decode_wav",
    "multimodal_video_frame_sample",
    "multimodal_asset_feature_stats",
    "curation_token_budget",
    "curation_temperature_weights",
    "dedup_containment_pairs",
    "dedup_incremental_vs_corpus",
    "ann_ivf_topk",
    "embedding_near_dup_lsh",
    "embedding_near_dup_recall_eval",
    "embedding_quantize_int8",
    "search_hybrid_rrf",
    "ann_recall_eval_lsh",
    "ann_recall_eval_nprobe",
    "subquery_orders_above_avg",
    "correlated_max_quantity_items",
    "grouping_sets_orders",
    "q21_waiting_suppliers",
    "merge_upsert_orders",
    "recursive_cte_ancestry",
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
