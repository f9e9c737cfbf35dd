"""Scale-sweep experiment: do the headline plans actually scale?

Synthesizes a ~sf1 dataset (10 x sf0.1, keys shifted per replica so join
cardinalities and dup-cluster sizes grow linearly, not quadratically:
documents get a per-replica tag token appended so replicas don't form
cross-replica near-dup pairs; embeddings get a deterministic per-replica
first-component nudge), then times a representative headline slice at
sf0.1 and at the synthetic sf1 and reports the time ratio next to the 10x
data ratio. A plan that survives scale shows ~linear (or better) growth;
a quadratic or driver-bound plan shows up immediately.

Usage: python tools/scale_sweep.py [outdir] [query ...]
(default outdir /tmp/pypeln_sfscale; with query names, only that subset
of SWEEP runs — the per-round refresh times just the round's additions).
Writes one JSON line; human detail on stderr. Results are recorded in
SCALING.md ("Scale-sweep evidence").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10
SRC = "/root/testdata/sf0.1"

SWEEP = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q18_large_volume_customers",
    "text_quality_scores",
    "dedup_exact_documents",
    "dedup_minhash_lsh_fast",
    "ann_lsh_bucketed_topk",
    "ann_ivf_kmeans_topk",
    "ann_pq_adc_topk",
    "ann_ivf_pq_topk",
    "quality_profile_orders",
    "semantic_dedup_pairs",
    "text_unigram_lm_quality",
    "variant_props_rollup",
    "merge_upsert_orders",
    "sketch_cms_heavy_hitters",
    "curation_decontaminated",
    "events_sessionization",
    # round-4 additions
    "graph_triangles_part_cooccurrence",
    "bucketed_join_priority_revenue",
    "multimodal_real_decode_pnm",
    "sketch_quantile_global_histogram",
    "streaming_merge_upsert_orders",
    "graph_pagerank_part_cooccurrence",
    "search_hybrid_rrf",
    "embedding_quantize_int8",
    # round-5 additions
    "dedup_containment_pairs",
    "graph_lpa_part_cooccurrence",
    "graph_kcore_part_cooccurrence",
    "ann_recall_eval_ivf",
    "curation_token_budget",
    "quality_drift_events_cohorts",
    "streaming_drift_daily_mix",
    "curation_e2e_pretrain_pack",
    "events_transition_matrix",
    "sketch_kmv_overlap_users",
    "quality_ks_test_value_cohorts",
    "curation_temperature_weights",
    "multimodal_real_decode_wav",
    "multimodal_video_frame_sample",
    # round-6 additions
    "dedup_cdc_chunks",
    "search_tfidf_cosine_topk",
    "curation_e2e_pretrain_pack_cc",
    "ann_recall_eval_pq",
    "dedup_span_overlap",
    # round-7 additions
    "search_tfidf_pruned_recall_eval",
    "streaming_incremental_dedup",
    "semantic_dedup_clusters",
]

KEYED = {
    # table -> (key columns to shift by replica * stride)
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def synthesize(spark, outdir: str) -> None:
    from pyspark.sql import functions as F

    from pypeln_spark.queries.base import load_table

    os.makedirs(outdir, exist_ok=True)
    for name in [
        "region", "nation", "part", "supplier",  # dims: copy as-is
    ]:
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            os.path.join(outdir, f"{name}.parquet")
        )
    for name, keys in KEYED.items():
        base = load_table(spark, SRC, name)
        strides = {
            k: (base.agg(F.max(k)).first()[0] or 0) + 1 for k in keys
        }
        parts = []
        for r in range(REPLICAS):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(r * strides[k]))
            if name == "documents":
                # salt texts per replica so replicas keep their WITHIN-
                # replica dup structure but never form cross-replica
                # near-dup pairs. The original one-token suffix tag did
                # NOT achieve this: it changes only ~5 of ~90 5-shingles,
                # leaving cross-replica Jaccard ≈ 0.9 — far above every
                # verify threshold — so dup clusters grew ∝ replicas and
                # near-dup sweep lines read super-linear on fixture
                # artifact alone (measured r7: the streaming ingest
                # gate's drop rate went 6% → 82% at 10×). Replacing
                # every 8th token touches ~5/8 of all 5-shingles and
                # most ~8-token CDC chunks, pushing cross-replica
                # similarity below threshold, while two near-dups within
                # one replica receive the SAME transformation and stay
                # near-dups.
                df = df.withColumn(
                    "text",
                    F.array_join(
                        F.expr(
                            "transform(split(text, ' '), "
                            f"(t, i) -> IF(i % 8 = 7, 'rep{r}salt', t))"
                        ),
                        " ",
                    ),
                )
            if name == "embeddings":
                df = df.withColumn(
                    "embedding",
                    F.concat(
                        F.array(
                            (F.element_at("embedding", 1) + F.lit(r * 1e-3)).cast(
                                "float"
                            )
                        ),
                        F.slice("embedding", 2, 63),
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(outdir, f"{name}.parquet")
        )
        print(f"# wrote {name} x{REPLICAS}", file=sys.stderr)


def main() -> None:
    from pypeln_spark.queries import REGISTRY
    from pypeln_spark.session import get_spark

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pypeln_sfscale"
    subset = sys.argv[2:]
    sweep = SWEEP
    if subset:
        unknown = [n for n in subset if n not in REGISTRY]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        sweep = subset
    spark = get_spark(app_name="pypeln_scale_sweep")
    if not os.path.exists(os.path.join(outdir, "lineitem.parquet")):
        synthesize(spark, outdir)

    def best_of(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results = {}
    for name in sweep:
        q = REGISTRY[name]
        q.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()  # warm
        t_small = best_of(
            lambda: q.fn(spark, SRC).write.format("noop").mode("overwrite").save()
        )
        t_big = best_of(
            lambda: q.fn(spark, outdir).write.format("noop").mode("overwrite").save()
        )
        ratio = t_big / t_small if t_small > 0 else float("inf")
        results[name] = {
            "sf0.1_s": round(t_small, 3),
            "sf1_s": round(t_big, 3),
            "ratio": round(ratio, 2),
        }
        print(f"# {name}: {t_small:.2f}s -> {t_big:.2f}s ({ratio:.1f}x)", file=sys.stderr)

    print(json.dumps({"replicas": REPLICAS, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
