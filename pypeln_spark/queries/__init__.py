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
# Round-6 rotation (tools/rotate_registry.py 50): after r5, all 190
# pre-r6 entries are ever-driver-green with zero failures. The front 50
# is therefore (a) the 3 queries added this round, never driver-checked,
# (b) the 3 greens whose CODE changed this round (span_dedup grew the
# stride path, the e2e chain was refactored for the drop rule, the asof
# enrichment harness swapped its sink) — re-confirm changed code first,
# then (c) re-confirmation of the STALEST greens: the whole r2 cohort
# plus the oldest of the r3 cohort, so no entry's last driver check ages
# past 3 rounds. All 193 entries stay covered every session by the local
# DuckDB gate (tests/test_correctness_gate.py).
_PRIORITY = [
    # -- (a) r6 additions, never driver-checked --
    "curation_e2e_pretrain_pack_cc",
    "dedup_span_overlap",
    "ann_recall_eval_pq",
    "dedup_cdc_chunks",
    "search_tfidf_cosine_topk",
    # -- (b) greens whose code changed in r6 --
    "dedup_span_chunks",
    "curation_e2e_pretrain_pack",
    "streaming_asof_static_enrich",
    # -- (c) stalest greens, oldest driver row first (r2 cohort) --
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
    "distinct_order_months",
    "rollup_order_status_priority",
    "cube_lineitem_flags",
    "pivot_priority_by_status",
    "scalar_function_gauntlet",
    "date_function_gauntlet",
    "case_when_price_tiers",
    "json_extract_event_props",
    "events_hourly_by_type",
    "events_sessionization",
    "curation_pipeline_survivors",
    "curation_sample_by_hash",
    "curation_stratified_topn",
    "curation_decontaminated",
    "curation_chunk_tokens",
    "text_token_stats",
    "text_bpe_ish_token_count",
    "text_quality_scores",
    "text_lang_id",
    "text_fingerprint",
    "text_length_histogram",
    "dedup_exact_documents",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard_exact",
    # -- ...then the oldest of the r3 cohort --
    "pipeline_each_audit_count",
    "pipeline_to_iterable_roundtrip",
    "pipeline_to_async_iterable_roundtrip",
    "curation_train_val_split",
    "curation_weighted_sample",
    "curation_shard_manifest",
    "curation_pack_sequences",
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
