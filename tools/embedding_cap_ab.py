"""A/B the embedding gate's index bucket_cap on a planted identical-vector
cluster — the occupancy trigger's blind spot: identical vectors share every
hyperplane bucket at ANY plane count, so widening never splits the bucket
and its probed width grows with every absorbed copy. Only the cap bounds it.

Epoch 0 plants m identical copies of one synthetic vector (no corpus match
→ all absorb); later epochs carry 50 fresh copies + regular vectors.
Decisions for the copies must be IDENTICAL across arms (min-id member
survives the cap) — asserted.

    python tools/embedding_cap_ab.py [m] [cap] [epochs] [--cells]

defaults m=20000, cap=8, epochs=3.

``--cells`` (r11, VERDICT r10 #5) runs the same planted protocol through
CellEmbeddingIngestGate instead: the hot-CELL failure mode is the same
physics — an identical-vector cluster lands in ONE k-means cell, retrain
cannot split it any more than widening could, and every later epoch's
probe pays its width. The cap is INHERITED through the shared
IncrementalLshIndex (no gate-side wiring), which this A/B measures.

``--retrain`` (cells mode) calls gate.retrain() after the planting epoch —
the measured companion: with COARSE cells, min-id capping lets lower-id
regular traffic absorbed into the cluster's catch-all cell evict the
cluster's representative (the documented eviction trade; epoch-3 copies
read novel). Retrain on the grown index gives the planted mass its OWN
centroid/cell, where the min-id rep survives any cap — recall restored,
width still bounded.
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
from pypeln_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64
N_PLANES = 8
N_CELLS = 16
BOILER_BASE = 20_000_000


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = "cells" if "--cells" in sys.argv else "planes"
    m = int(argv[0]) if len(argv) > 0 else 20000
    cap = int(argv[1]) if len(argv) > 1 else 8
    n_epochs = int(argv[2]) if len(argv) > 2 else 3
    # cells mode needs buckets FINER than the cap (mean corpus occupancy
    # below it), or corpus rows saturate every cell and evict the planted
    # cluster's min-id representative — pick n_cells ≈ corpus/(cap/2)
    n_cells = int(argv[3]) if len(argv) > 3 else N_CELLS
    spark = get_spark()

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    regular = emb.filter(F.col("vec_id") % 2 == 1).persist()
    regular.count()
    # synthetic cluster vector, deterministic, not in the corpus
    boiler = [((i * 37 + 11) % 101 - 50) / 50.0 for i in range(DIM)]
    boiler_lit = F.array(*[F.lit(float(x)).cast("float") for x in boiler])

    def copies(n, base_id):
        return spark.range(n).select(
            (F.lit(base_id) + F.col("id")).alias("vec_id"),
            boiler_lit.alias("embedding"),
        )

    def epoch_frames():
        frames = [copies(m, BOILER_BASE)]
        for e in range(1, n_epochs + 1):
            reg = regular.filter(
                (F.col("vec_id") % (2 * n_epochs)) == (2 * e - 1)
            )
            frames.append(
                copies(50, BOILER_BASE + 100_000 * e).unionByName(reg)
            )
        return frames

    cents = None
    if mode == "cells":
        # centroid artifact shared across arms (same discipline as the
        # registry gate: collect-and-replay keeps training off every
        # epoch's lineage)
        c = S.kmeans_centroids(corpus, n_cells, 2, train_mod=4)
        cents = spark.createDataFrame(c.collect(), c.schema)

    def run(bucket_cap, absorb_dedup=False):
        root = tempfile.mkdtemp(prefix="pypeln_emb_cap_ab_")
        D.retire_pipeline_caches()
        nf = S.with_norms(S.spread(corpus))
        if mode == "cells":
            cor = S.ivf_assign(nf, cents, n_cells, keep=1).select(
                "vec_id", "_v", "_norm", F.col("cid").alias("bucket")
            )
        else:
            cor = S.lsh_bucket(nf, "_v", N_PLANES, DIM)
        cor = D.pool_persist(cor)
        cor.count()
        idx = D.IncrementalLshIndex(
            cor.select("vec_id", "_v", "_norm"),
            cor.select("vec_id", "bucket"),
            compact_every=1,
            bucket_cap=bucket_cap,
        )
        if mode == "cells":
            gate = S.CellEmbeddingIngestGate(
                idx, root, DIM, centroids=cents, n_cells=n_cells,
                threshold=0.95, nprobe=2, absorb_dedup=absorb_dedup,
            )
        else:
            gate = S.EmbeddingIngestGate(
                idx, root, DIM, n_planes=N_PLANES, threshold=0.95,
                probe_hamming=1, absorb_dedup=absorb_dedup,
            )
        walls = []
        retrain = mode == "cells" and "--retrain" in sys.argv
        for e, frame in enumerate(epoch_frames()):
            t0 = time.time()
            gate(frame, e)
            if retrain and e == 0:
                gate.retrain()
            walls.append(time.time() - t0)
        idx.close()
        out = spark.read.parquet(root)
        decisions = {
            (r.vec_id, r.epoch, r.dup_of, r.cos)
            for r in out.filter(F.col("vec_id") >= BOILER_BASE).collect()
        }
        n_flagged = out.filter(
            (F.col("vec_id") >= BOILER_BASE) & F.col("dup_of").isNotNull()
        ).count()
        shutil.rmtree(root, ignore_errors=True)
        D.retire_pipeline_caches()
        return walls, decisions, n_flagged

    arms = [("capped", cap, False), ("uncapped", None, False)]
    if "--absorb-dedup" in sys.argv:
        # the r11 guard: within-batch exact dedup of the absorb set —
        # alone (the flood stores ONE representative, no cap semantics)
        # and composed with the cap (belt and suspenders)
        arms += [("dedup", None, True), ("dedup+cap", cap, True)]
    results = {}
    for label, bc, ad in arms:
        walls, decisions, n_flagged = run(bc, ad)
        results[label] = decisions
        per = " ".join(f"e{i}={w:5.1f}s" for i, w in enumerate(walls))
        print(
            f"[{mode}] {label:9s} total={sum(walls):6.1f}s {per} "
            f"cluster-dups-flagged={n_flagged}"
        )
    ref = results["uncapped"]
    for label in results:
        if label == "uncapped":
            continue
        same = results[label] == ref
        print(f"{label} decisions identical to uncapped: {same}")
        if not same:
            diff = results[label] ^ ref
            key = lambda r: (r[0], r[1], r[2] if r[2] is not None else -1)
            print(f"  DIFFERING ROWS ({len(diff)}): {sorted(diff, key=key)[:6]}")


if __name__ == "__main__":
    main()
