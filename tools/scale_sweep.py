"""Scale-sweep experiment: do the headline plans actually scale?

Synthesizes a ~sf1 dataset (10 x sf0.1, keys shifted per replica so join
cardinalities and dup-cluster sizes grow linearly, not quadratically:
documents pass through a per-replica character bijection and embeddings
through a per-replica orthogonal transform, so each replica keeps its
internal dup/similarity structure bit-exactly while replicas never form
cross-replica near-dup pairs), then times a representative headline slice at
sf0.1 and at the synthetic sf1 and reports the time ratio next to the 10x
data ratio. A plan that survives scale shows ~linear (or better) growth;
a quadratic or driver-bound plan shows up immediately.

Usage: python tools/scale_sweep.py [--cold] [--isolate] [outdir] [query ...]
(default outdir /tmp/pypeln_sfscale; with query names, only that subset
of SWEEP runs — the per-round refresh times just the round's additions).
--cold clears the session artifact caches (trained_artifact model store,
cached_index frames) before EVERY invocation, so queries that train once
per session (the e2e capstones' shared prefix, kmeans/PQ-backed ANN) get
honest cold-path rows at both scale factors instead of timing a cache hit
(the r7 sweep's flagged 1.0x e2e ratio, SCALING.md "artifact-cached").
--isolate clears the artifact caches AND spark.catalog cache BETWEEN
QUERIES (each query's min-of-N still reads its own warm state) — the
cross-query-pollution-free mode: the r8 A/B measured the ingest gate 2x
slower at sf1 after 10 persist-heavy sweep queries filled the storage
pool, so late-list ABSOLUTE rows in a long default sweep are inflated
(ratios stay meaningful — both SFs share the session state). Default
stays accumulate-mode for comparability with the r5-r7 rows.
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

# Bumped whenever the synthesize() transforms change. main() stamps this
# (plus the replica count and source dir) into the fixture dir and
# re-synthesizes on mismatch — before the stamp existed, a fixture built
# by the r4 contaminated transforms (suffix tag / position salt /
# component nudge) was silently reused by any later sweep, reproducing
# exactly the phantom-similarity artifacts r7 fixed (ADVICE r7 low #2).
FIXTURE_SCHEME = "bijection-orthogonal-v2"
STAMP_NAME = "_fixture_version.json"

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
    "dedup_lsh_recall_eval",
    "embedding_near_dup_recall_eval",
    "dedup_simhash_recall_eval",
    "ann_recall_eval_ivf_kmeans",
    # round-8 additions
    "streaming_embedding_ingest",
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


def synthesize(
    spark, outdir: str, src: str = SRC, replicas: int = REPLICAS
) -> None:
    from pyspark.sql import functions as F

    from pypeln_spark.queries.base import load_table

    # 26 distinct letter rotations exist (identity + 25); past that, two
    # replicas would share a bijection and their documents would become
    # exact cross-replica duplicates — the contamination class the scheme
    # exists to prevent. A >26-replica fixture needs a richer bijection
    # family (e.g. per-replica random permutations), not a bigger shift.
    if replicas > 26:
        raise ValueError(f"replicas={replicas} > 26 distinct char rotations")
    os.makedirs(outdir, exist_ok=True)
    for name in [
        "region", "nation", "part", "supplier",  # dims: copy as-is
    ]:
        load_table(spark, src, name).write.mode("overwrite").parquet(
            os.path.join(outdir, f"{name}.parquet")
        )
    for name, keys in KEYED.items():
        base = load_table(spark, src, name)
        strides = {
            k: (base.agg(F.max(k)).first()[0] or 0) + 1 for k in keys
        }
        parts = []
        for r in range(replicas):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(r * strides[k]))
            if name == "documents" and r > 0:
                # Per-replica CHARACTER BIJECTION (rotated alphabet via
                # translate). The requirement is three-way: (a) a doc's
                # copies in two replicas must NOT be near-dups, (b)
                # within-replica near-dup pairs must STAY near-dups, and
                # (c) within-replica UNRELATED pairs must stay unrelated.
                # Two earlier salting schemes each failed one leg,
                # measured on 5-char-gram Jaccard (the dedup shingle,
                # ext/hashing.shingles): a one-token suffix tag left
                # cross-replica J ≈ 0.95 (fails a — dup clusters grew
                # ∝ replicas; the streaming ingest gate's drop rate went
                # 6% → 82% at 10×); replacing every 2nd token with a
                # (replica, position) salt fixed (a) but gave ALL docs in
                # a replica identical tokens at odd positions, doubling
                # unrelated-pair J 0.171 → 0.341 (fails c — LSH band
                # collisions ∝ J^4 exploded ~16× per pair, quadratic in
                # replica size; streaming_incremental_dedup read 45×).
                # A bijection on characters is a bijection on 5-grams
                # AND on tokens, so EVERY within-replica pairwise
                # Jaccard — char-gram or token — is preserved bit-exactly
                # ((b) and (c) by construction, verified: unrelated mean
                # 0.171 → 0.171 exact), while a doc's cross-replica copies
                # share only letter-free shingles (measured J = 0.000).
                lo = "abcdefghijklmnopqrstuvwxyz"
                up = lo.upper()
                dg = "0123456789"
                # shift derived so NO replica beyond 0 maps to identity:
                # r % 26 degenerates at r = 26 (and r % 10 at r = 10),
                # which would make that replica an exact cross-replica
                # duplicate of replica 0 — reachable now that replicas is
                # a parameter (ADVICE r7 low #3). 1 + (r-1) % 25 cycles
                # 1..25, never 0; likewise 1 + (r-1) % 9 for digits.
                s, t = 1 + (r - 1) % 25, 1 + (r - 1) % 9
                df = df.withColumn(
                    "text",
                    F.translate(
                        F.col("text"),
                        lo + up + dg,
                        lo[s:] + lo[:s] + up[s:] + up[:s] + dg[t:] + dg[:t],
                    ),
                )
            if name == "embeddings" and r > 0:
                # Per-replica ORTHOGONAL transform (coordinate roll +
                # deterministic sign flips). Same three-way requirement
                # as documents, in cosine space. The old first-component
                # nudge (+r·1e-3 on one of 64 dims) left cross-replica
                # copies at cosine 1.000000 (measured) — every vector
                # formed a 10-wide cross-replica near-dup cluster, so
                # semantic-dedup cell verification grew super-linearly.
                # A signed permutation is orthogonal: all within-replica
                # dot products and norms are preserved bit-for-bit
                # (measured max pairwise-cosine error 5.6e-17), while a
                # vector vs its transformed copy measures cosine
                # mean −0.02 / max 0.30 — far below every near-dup
                # threshold. y[i] = x[(i − 7r) mod 64] · s_i with
                # s_i = −1 iff (13i + 5r) % 3 = 0.
                sh = (7 * r) % 64
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        "transform(sequence(0, 63), i -> CAST("
                        f"element_at(embedding, ((i - {sh} + 64) % 64) + 1)"
                        f" * (CASE WHEN (13 * i + {5 * r}) % 3 = 0"
                        " THEN -1.0 ELSE 1.0 END) AS FLOAT))"
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(outdir, f"{name}.parquet")
        )
        print(f"# wrote {name} x{replicas}", file=sys.stderr)
    with open(os.path.join(outdir, STAMP_NAME), "w") as fh:
        json.dump({"scheme": FIXTURE_SCHEME, "replicas": replicas, "src": src}, fh)


def _fixture_current(outdir: str) -> bool:
    """True iff outdir holds a fixture built by THIS transform scheme.
    An unstamped dir (pre-stamp or partial build) or a scheme/replica
    mismatch forces re-synthesis — reusing a stale fixture silently
    reintroduces whatever artifacts the old transforms carried."""
    try:
        with open(os.path.join(outdir, STAMP_NAME)) as fh:
            stamp = json.load(fh)
    except (OSError, ValueError):
        return False
    return (
        stamp.get("scheme") == FIXTURE_SCHEME
        and stamp.get("replicas") == REPLICAS
        and stamp.get("src") == SRC
        and os.path.exists(os.path.join(outdir, "lineitem.parquet"))
    )


def main() -> None:
    from pypeln_spark.ext.similarity import clear_session_artifacts
    from pypeln_spark.queries import REGISTRY, RETIRED
    from pypeln_spark.session import get_spark

    argv = sys.argv[1:]
    cold = "--cold" in argv
    isolate = "--isolate" in argv
    argv = [a for a in argv if a not in ("--cold", "--isolate")]
    outdir = argv[0] if argv else "/tmp/pypeln_sfscale"
    subset = argv[1:]
    # retired entries keep sweeping (SWEEP holds two r13-retired names;
    # ratios must stay comparable across rounds)
    everything = {**REGISTRY, **RETIRED}
    sweep = SWEEP
    if subset:
        unknown = [n for n in subset if n not in everything]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        sweep = subset
    spark = get_spark(app_name="pypeln_scale_sweep")
    if not _fixture_current(outdir):
        print(f"# fixture stale/missing at {outdir}: synthesizing", file=sys.stderr)
        synthesize(spark, outdir)

    def best_of(fn, n=3):
        ts = []
        for _ in range(n):
            if cold:
                clear_session_artifacts()
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results = {}
    for name in sweep:
        q = everything[name]
        if isolate:
            clear_session_artifacts()
            spark.catalog.clearCache()
        if cold:
            clear_session_artifacts()
        q.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()  # warm the session machinery (not the artifacts, if cold)
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

    print(
        json.dumps(
            {
                "replicas": REPLICAS,
                "cold": cold,
                "isolate": isolate,
                "queries": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
