"""Stage-level profiler for the heavy composed queries (r13 optimization).

Times the SUB-STAGES of a composed query separately in one session — cold
first invocation vs warm repeats — so optimization effort goes where the
seconds are (guide §1: measure first). Each timed block runs to a noop sink
(full compute, zero driver transfer) and is labelled via setJobDescription.

Usage: python tools/profile_stages.py <target> [runs]
Targets: mmr_ann_front | mmr_exact | bm25_live | ann_live
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.3f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return out, dt


def profile_mmr(spark, use_ann_front: bool, runs: int):
    from pyspark.sql import functions as F

    from pypeln_spark.ext import similarity as S
    from pypeln_spark.queries.similarity import (
        K,  # noqa: F401
        KMEANS_ITERS,
        KMEANS_NPROBE,
        KMEANS_TRAIN_MOD,
        MMR_K_CAND,
        MMR_K_OUT,
        MMR_LAM,
        N_CELLS,
        N_QUERIES,
        _kmeans_artifact,
    )
    from pypeln_spark.queries.base import tables

    for r in range(runs):
        print(f"run {r} ({'cold' if r == 0 else 'warm'} session caches):")
        (emb,) = tables(spark, SF, "embeddings")
        queries = emb.filter(F.col("vec_id") < N_QUERIES)
        if use_ann_front:
            cents, _ = timed(spark, "kmeans_artifact",
                             lambda: _kmeans_artifact(spark, SF))
            cells, _ = timed(
                spark, "cells_index(cached)",
                lambda: S.cached_index(
                    ("ivf_kmeans_cells", SF, N_CELLS, KMEANS_ITERS,
                     KMEANS_TRAIN_MOD),
                    lambda: S.ivf_assign(
                        S.with_norms(S.spread(emb)), cents, N_CELLS, keep=1,
                        as_literals=True,
                    ),
                ),
            )
            timed(spark, "cells_index noop", lambda: noop(cells))
            front = S.ivf_topk(
                emb, queries, k=MMR_K_CAND, n_cells=N_CELLS,
                nprobe=KMEANS_NPROBE, quantizer="kmeans",
                kmeans_iters=KMEANS_ITERS, train_mod=KMEANS_TRAIN_MOD,
                centroids=cents, quantizer_literals=True, cells=cells,
            )
        else:
            front = S.cosine_topk(emb, queries, k=MMR_K_CAND)
        timed(spark, "front noop", lambda: noop(front))
        rer = S.mmr_rerank(
            emb, queries, k_cand=MMR_K_CAND, k_out=MMR_K_OUT, lam=MMR_LAM,
            candidates=front if use_ann_front else None,
        )
        timed(spark, "rerank noop (incl front recompute if unpersisted)",
              lambda: noop(rer))
        from pypeln_spark.ext.dedup import retire_pipeline_caches

        retire_pipeline_caches()


def main() -> int:
    target = sys.argv[1] if len(sys.argv) > 1 else "mmr_ann_front"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from pypeln_spark.session import get_spark

    spark = get_spark(app_name=f"profile_{target}")
    spark.range(1000).selectExpr("sum(id)").collect()
    if target == "mmr_ann_front":
        profile_mmr(spark, True, runs)
    elif target == "mmr_exact":
        profile_mmr(spark, False, runs)
    else:
        print(f"unknown target {target}", file=sys.stderr)
        return 2
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
