"""Measure the live-serving pipeline's at-scale dial: n_cells at retrain.

The r12 scale sweep read streaming_ann_topk_serving_live at 6.97x for 10x
data — higher than its streaming siblings (2.4-5.6x) because the entry
retrains at a FIXED 16 cells, so ingest candidate volume grows
~ |batch| x |index| / n_cells (both factors 10x). The production IVF
rebuild grows the cell count with the corpus (occupancy-targeted, the
same rule the hyperplane gate's occupancy trigger encodes); this tool
A/Bs exactly that: retrain keeping the initial 16 cells (the pre-fix
r12 shape) vs retrain growing to n_cells=<scaled>. The registry entry
adopted the growing policy from this measurement (retrain 16 -> 32,
LIVE_RETRAIN_CELLS); both arms drive the entry's shared serve body
(ext/similarity.live_topk_serve).

    python tools/live_serving_cells_dial.py [n_cells_b] [runs]

default n_cells_b=160 (~sqrt(corpus) at the synthetic sf1), runs=1.
SPARK_GRAFT_SF_DIR picks the fixture (default /tmp/pypeln_sfscale).
Serve decisions for arm B differ from arm A by construction (different
cell geometry after retrain changes which neighbors are probed) — this
is the recall/cost dial, not a decision-invariant guard — so the tool
reports per-phase walls plus epoch-1 result overlap, not equality.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pypeln_spark.ext import dedup as D  # noqa: E402
from pypeln_spark.ext import similarity as S  # noqa: E402
from pypeln_spark.queries.base import load_table  # noqa: E402
from pypeln_spark.queries.similarity import (  # noqa: E402
    DIM, K, KMEANS_ITERS, KMEANS_TRAIN_MOD, N_CELLS, NEAR_DUP_T,
)
from pypeln_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/pypeln_sfscale")


def run(spark, retrain_cells):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    frames = [emb.filter(F.col("vec_id") % 12 == c) for c in (1, 3, 5, 7)]
    D.retire_pipeline_caches()
    cents = S.kmeans_centroids(corpus, N_CELLS, KMEANS_ITERS,
                               train_mod=KMEANS_TRAIN_MOD)
    cents = spark.createDataFrame(cents.collect(), cents.schema)
    nf = S.with_norms(S.spread(corpus))
    cor = D.pool_persist(
        S.ivf_assign(nf, cents, N_CELLS, keep=1).select(
            "vec_id", "_v", "_norm", F.col("cid").alias("bucket")
        )
    )
    cor.count()
    index = D.IncrementalLshIndex(
        cor.select("vec_id", "_v", "_norm"),
        cor.select("vec_id", "bucket"),
        compact_every=1,
        comb=cor,
    )
    root = tempfile.mkdtemp(prefix="pypeln_live_dial_")
    serve_root = tempfile.mkdtemp(prefix="pypeln_live_dial_serve_")
    gate = S.CellEmbeddingIngestGate(
        index, root, DIM, cents, N_CELLS, NEAR_DUP_T, nprobe="auto",
        absorb_dedup=False,  # mirror the registry entry's replay shape
    )

    def serve(batch_df, qepoch):
        # the registry entry's EXACT serve body (ext/similarity.
        # live_topk_serve): nprobe follows the live geometry via the
        # recall-target rule — growing n_cells at fixed nprobe would
        # silently shrink the scan fraction (and recall) 10x, the dial
        # holds it (serving_nprobe(160, 0.12) = 20 vs (16, 0.12) = 2)
        topk = S.live_topk_serve(
            index, gate.centroids, gate.n_cells, batch_df, k=K, dim=DIM,
            recall_target=0.12,
        )
        if topk is None:
            return
        (
            topk.select(
                "query_id", F.lit(int(qepoch)).cast("int").alias("epoch"),
                "neighbor_id", "cos", "rank",
            )
            .write.mode("append").parquet(serve_root)
        )

    walls = []
    labels = ["ingest0", "query0", "retrain+ingest1", "query1"]
    for e, frame in enumerate(frames):
        t0 = time.time()
        if e % 2 == 0:
            if e == 2:
                gate.retrain(n_cells=retrain_cells)
            gate(frame, e // 2)
        else:
            serve(frame, (e - 1) // 2)
        walls.append(time.time() - t0)
    index.close()
    out = {
        (r.query_id, r.epoch, r.neighbor_id)
        for r in spark.read.parquet(serve_root).collect()
    }
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(serve_root, ignore_errors=True)
    D.retire_pipeline_caches()
    return walls, labels, out


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    cells_b = int(argv[0]) if len(argv) > 0 else 160
    runs = int(argv[1]) if len(argv) > 1 else 1
    spark = get_spark()
    results = {}
    arms = [("fixed16", None), (f"grow{cells_b}", cells_b)]
    if "--reverse" in sys.argv:  # bound the arm-order (warm-up) skew
        arms.reverse()
    for label, rc in arms:
        best = None
        out = None
        for _ in range(runs):
            walls, labels, o = run(spark, rc)
            if best is None or sum(walls) < sum(best):
                best, out = walls, o
        results[label] = (best, out)
        per = " ".join(f"{n}={w:6.1f}s" for n, w in zip(labels, best))
        print(f"{label:9s} total={sum(best):6.1f}s {per}")
    a, b = results["fixed16"][1], results[f"grow{cells_b}"][1]
    e1a = {t for t in a if t[1] == 1}
    e1b = {t for t in b if t[1] == 1}
    jac = len(e1a & e1b) / max(len(e1a | e1b), 1)
    print(f"epoch-0 serves identical: {({t for t in a if t[1]==0} == {t for t in b if t[1]==0})} "
          f"(pre-retrain, must be); epoch-1 top-k overlap: {jac:.3f} "
          f"(geometry changed — the recall/cost dial)")


if __name__ == "__main__":
    main()
