"""Storage-pool pressure A/B for the ingest gates (VERDICT r8 #5).

r8 found the sf1 text gate 2× slower (70.7 s vs 37.7 s) when 10
persist-heavy sweep queries' SESSION caches (cached_index frames — outside
the invocation pool the gates retire at entry) filled the storage pool and
every gate persist ran under eviction thrash. This tool reproduces that
comparison ON DEMAND with the new observability: it times the text gate
(a) in a fresh session ("isolated") and (b) after a pool-filling prefix of
the same persist-heavy queries the bench runs ("pressured"), recording
storage_pool_report() occupancy next to each timing — the
order-insensitive protocol: a pressured number is LABELED pressured, so
bench position can never masquerade as an engine regression (bench.py now
records the same per-query pool column and flags rows over half capacity).

Usage: python tools/pool_pressure.py [sf_dir]   (default /root/testdata/sf0.1)
One JSON line on stdout; human detail on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the bench's persist-heavy families — session caches (cached_index /
# trained_artifact) survive retire_pipeline_caches, which is the pressure
PREFIX = [
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "dedup_containment_pairs",
    "dedup_incremental_vs_corpus",
    "semantic_dedup_pairs",
    "search_tfidf_cosine_topk",
    "dedup_lsh_recall_eval",
    "embedding_near_dup_recall_eval",
    "ann_ivf_kmeans_topk",
    "dedup_minhash_clusters",
]

GATE = "streaming_incremental_dedup"


def run_gate(spark, sf_dir: str, runs: int = 3) -> tuple:
    from pypeln_spark.ext.dedup import storage_pool_report
    from pypeln_spark.queries import REGISTRY, RETIRED

    rep = storage_pool_report(spark)
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        REGISTRY[GATE].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        samples.append(round(time.perf_counter() - t0, 2))
    return min(samples), samples, rep


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import pypeln_spark as pl
    from pypeln_spark.queries import REGISTRY, RETIRED

    spark = pl.get_spark()
    spark.range(1000).selectExpr("sum(id)").collect()

    # (a) isolated: fresh session, empty pool
    iso_min, iso_all, iso_rep = run_gate(spark, sf_dir)
    print(f"isolated: {iso_all} pool={iso_rep['mem_bytes']>>20}MB", file=sys.stderr)

    # (b) pressured: fill the pool with the persist-heavy prefix, re-time
    for name in PREFIX:
        # resolve retired entries too — the pressure LOAD must stay
        # comparable across rounds (dedup_minhash_lsh retired r13)
        q = REGISTRY.get(name) or RETIRED.get(name)
        if q is None:
            continue
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"# prefix {name} failed: {e}", file=sys.stderr)
    prs_min, prs_all, prs_rep = run_gate(spark, sf_dir)
    print(f"pressured: {prs_all} pool={prs_rep['mem_bytes']>>20}MB", file=sys.stderr)

    print(json.dumps({
        "metric": "pool_pressure_ab",
        "sf_dir": sf_dir,
        "gate": GATE,
        "isolated_sec": iso_min,
        "pressured_sec": prs_min,
        "isolated_pool_mb": round(iso_rep["mem_bytes"] / 2**20, 1),
        "pressured_pool_mb": round(prs_rep["mem_bytes"] / 2**20, 1),
        "pool_capacity_mb": round(prs_rep["capacity_bytes"] / 2**20, 1),
        "ratio": round(prs_min / iso_min, 2),
    }))


if __name__ == "__main__":
    main()
