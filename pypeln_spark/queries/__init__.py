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
_PRIORITY = [
    # -- never driver-checked in r1/r2 (VERDICT.md "What's missing" #1) --
    "streaming_tumbling_hourly",
    "streaming_sliding_1h_30m",
    "streaming_session_windows",
    "streaming_watermark_late_drop",
    "streaming_stateful_running_totals",
    "streaming_interval_join_purchase_signup",
    "streaming_static_enrich_nation",
    "streaming_kmv_daily_distinct",
    "ann_cosine_topk",
    "ann_lsh_bucketed_topk",
    "ann_ivf_topk",
    "embedding_near_dup_pairs",
    "asof_join_purchase_to_view",
    "range_join_purchase_after_signup",
    "sketch_cms_heavy_hitters",
    "sketch_quantile_doc_lengths",
    "dedup_simhash_fingerprints",
    "dedup_simhash_near_pairs",
    "dedup_minhash_clusters",
    "dedup_minhash_lsh_fast",
    # -- r1 failures fixed in r2, never driver-confirmed --
    "sketch_kmv_distinct_users",
    "pipeline_pickled_objects",
    "pipeline_task_async_enrich",
    # -- new round-3 queries --
    "ann_ivf_kmeans_topk",
    "ann_lsh_multiprobe_topk",
    "embedding_near_dup_lsh",
    "streaming_dedup_events",
    "asof_join_view_to_next_purchase",
    "streaming_cms_daily_heavy_hitters",
    "text_pii_scrub",
    "streaming_doc_quality_counts",
    "dedup_minhash_clusters_star",
    "pipeline_each_audit_count",
    "pipeline_to_iterable_roundtrip",
    "pipeline_to_async_iterable_roundtrip",
    "text_repetition_stats",
    "curation_train_val_split",
    # -- new round-4 queries --
    "sketch_hll_distinct_users",
    "search_bm25_topk",
    "dedup_span_chunks",
    "curation_weighted_sample",
    "text_top_tokens",
    "streaming_hll_daily_distinct",
    "curation_shard_manifest",
    "curation_pack_sequences",
    # -- new round-5 queries: fill the window's last 5 slots (the list
    # above holds 45 names; without these the tail slots fall to
    # pipeline queries that were already driver-green in r1/r2) --
    "q10_returned_item_ranking",
    "text_tfidf_top_terms",
    "sketch_bloom_filter_probe",
    "semantic_dedup_pairs",
    "events_funnel_conversion",
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
