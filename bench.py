"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "runs": N, "agg": "min", "sf": ...}.

Timing protocol: one tiny warm-up action (session + codegen spin-up) plus a
sf0.001 warm-up pass of every headline shape, then each query runs
$PYPELN_SPARK_BENCH_RUNS times (default 4) end-to-end — plan build through
terminal noop-sink write (full compute of every output row, zero driver
transfer) — and reports the per-query MIN. The host VM shows multi-second
one-sided hypervisor scheduling spikes (measured: a back-to-back
triple [8.2s, 3.6s, 1.6s] for a query whose standalone median-of-5 is a
stable 1.75s); noise on a deterministic workload is strictly additive, so
min-of-N is the unbiased low-variance estimator of engine cost — a median
still quotes the hypervisor whenever ≥2 of 3 draws are hit. The
aggregation is declared in the output line ("agg") so rounds measured
under different protocols aren't silently compared."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: the scale-relevant shapes (scan-agg, multi-join, window,
# sessionization, and the LLM-pipeline ops as they land)
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_delta",
    "window_top3_orders_per_customer",
    "events_sessionization",
    "pipeline_map_python_udf",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "dedup_simhash_fingerprints",
    "ann_cosine_topk",
    "ann_lsh_bucketed_topk",
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "ann_pq_adc_topk",
    "ann_ivf_pq_topk",
    "embedding_near_dup_lsh",
    "text_quality_scores",
    "text_fingerprint",
    "asof_join_purchase_to_view",
    "range_join_purchase_after_signup",
    "q10_returned_item_ranking",
    "q18_large_volume_customers",
    "q8_market_share",
    "q21_waiting_suppliers",
    "text_tfidf_top_terms",
    "semantic_dedup_pairs",
    "streaming_tumbling_hourly",
    "streaming_interval_join_purchase_signup",
    "curation_pipeline_survivors",
    "curation_decontaminated",
    "sketch_kmv_distinct_users",
    "sketch_cms_heavy_hitters",
    "sketch_quantile_doc_lengths",
    "dedup_minhash_clusters",
    "streaming_kmv_daily_distinct",
    "variant_props_rollup",
    "text_unigram_lm_quality",
    # -- round-4 additions (kept AFTER the frozen r3 set so like-for-like
    # round comparisons stay one subtraction) --
    "multimodal_real_decode_pnm",
    "sketch_quantile_global_histogram",
    "graph_triangles_part_cooccurrence",
    "bucketed_join_priority_revenue",
    "graph_pagerank_part_cooccurrence",
    "dedup_incremental_vs_corpus",
    "embedding_quantize_int8",
    "search_hybrid_rrf",
    # -- round-5 additions --
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
    # -- round-6 additions: the r6 queries plus the most expensive
    # previously-unbenched families (VERDICT r5 #8 — the tail can no
    # longer hide a regression) --
    "dedup_span_chunks",
    "dedup_span_overlap",
    "dedup_cdc_chunks",
    "search_tfidf_cosine_topk",
    "curation_e2e_pretrain_pack_cc",
    "ann_recall_eval_pq",
    "dedup_minhash_clusters_star",
    "streaming_hll_daily_distinct",
    "fuzzy_join_supplier_names",
    "graph_ppr_part_cooccurrence",
    "streaming_merge_upsert_orders",
    "streaming_asof_static_enrich",
    "streaming_session_windows",
    "streaming_stateful_running_totals",
    "q2_min_cost_supplier",
    "q7_nation_volume_shipping",
    "q9_product_type_profit",
    "window_navigation_gauntlet",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "recursive_cte_ancestry",
    "quality_profile_orders",
    "events_scd2_status_intervals",
    "multimodal_asset_feature_stats",
    # round-7 additions
    "search_tfidf_pruned_recall_eval",
    "streaming_incremental_dedup",
    "semantic_dedup_clusters",
    "dedup_lsh_recall_eval",
    "embedding_near_dup_recall_eval",
    "dedup_simhash_recall_eval",
    "ann_recall_eval_ivf_kmeans",
    # round-8 additions
    "streaming_embedding_ingest",
    # round-9 additions
    "ann_recall_eval_nprobe",
    "dedup_simhash_near_pairs_wide",
]


def main() -> None:
    from pypeln_spark.session import get_spark
    from pypeln_spark.queries import REGISTRY

    spark = get_spark(app_name="pypeln_spark_bench")

    # warm-up: JVM, codegen compilation, parquet reader paths, python worker
    # pool — run every headline shape once at the tiny SF so the timed runs
    # measure steady-state execution, not first-compile
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_sf = "/root/testdata/sf0.001"
    for name in HEADLINE:
        q = REGISTRY.get(name)
        if q is not None:
            try:
                q.fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
            except Exception as e:  # never let warm-up kill the bench
                print(f"# warmup {name} failed: {e}", file=sys.stderr)

    runs = max(1, int(os.environ.get("PYPELN_SPARK_BENCH_RUNS", "4")))
    timings: dict[str, float] = {}
    # storage-pool occupancy per query (VERDICT r8 #5): session caches
    # accumulate across the sweep (cached_index frames live outside the
    # invocation pool), and a query timed with the pool near capacity runs
    # under eviction thrash (r8: the sf1 text gate measured 2× slower
    # pressured vs isolated). Record the pool state each query STARTED
    # under and flag rows above half capacity, so a pressured absolute
    # number is read as a pressured number — ratios between two queries in
    # the same sweep position stay comparable across rounds.
    from pypeln_spark.ext.dedup import storage_pool_report

    pool_at: dict[str, int] = {}
    pool_cap = 1
    for name in HEADLINE:
        q = REGISTRY.get(name)
        if q is None:
            continue
        rep = storage_pool_report(spark)
        pool_at[name] = rep["mem_bytes"] + rep["disk_bytes"]
        pool_cap = max(pool_cap, rep["capacity_bytes"])
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = q.fn(spark, SF_DIR)
            # noop sink: full compute of every output row/column, zero driver
            # transfer — count() would let Catalyst prune pure projections
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        dt = min(samples)
        timings[name] = round(dt, 3)
        print(
            f"# {name}: {dt:.3f}s (min of {[round(s, 3) for s in samples]}; "
            f"pool {pool_at[name] / 2**20:.0f}MB)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    pressured = [n for n, b in pool_at.items() if b > 0.5 * pool_cap]
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "agg": "min",
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "pool_mb_max": round(max(pool_at.values()) / 2**20, 1),
                "pool_capacity_mb": round(pool_cap / 2**20, 1),
                "pool_pressured": pressured,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
