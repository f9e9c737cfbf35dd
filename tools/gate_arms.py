"""Three-arm embedding ingest-gate comparison at scale (VERDICT r9 #4).

r9 measured the hyperplane gate's occupancy trigger two-sided: 2.2-2.6x
wall win, zero recall cost at production thresholds (>=0.9), but 27% of
dup decisions lost at the semantic threshold (0.35) because mid-cosine
pairs are weakly bucket-stable under random hyperplanes. SCALING.md named
the right tool for that regime — k-means CELL bucketing — and r10 built
it (ext/similarity.CellEmbeddingIngestGate). This tool runs the three
arms over the SAME stream and reports wall, dup decisions, candidate
volume, and planted-dup recall:

  fixed  — hyperplane, n_planes fixed (the saturating baseline)
  trig   — hyperplane + occupancy-triggered re-bucket (the r9 dial)
  cells  — k-means cells, nprobe probes (the r10 semantic-regime mode)

Stream shape = the registry gates': corpus = even vec_ids, three epochs
of odd vec_ids (vec_id % 6), atomic single-file feeds via
staged_foreach_batch, K=1 compaction. --plant N adds N exact copies of
corpus vectors per epoch under fresh ids (the r9 planted-recall
protocol); --threshold picks the regime. min-of-RUNS per arm; decisions
are asserted deterministic across runs within an arm.

Usage:
  python tools/gate_arms.py [fixture_dir] [--threshold 0.35] [--plant 0]
         [--runs 2] [--cells 100] [--nprobe 2] [--planes 6] [arm ...]
(default fixture /tmp/pypeln_sfscale — build it with scale_sweep.py;
default arms: fixed trig cells. sf0.1 sanity: pass /root/testdata/sf0.1.)
One JSON line on stdout; per-run detail on stderr. Results -> SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    opt = {"threshold": 0.35, "plant": 0, "runs": 2, "cells": 100,
           "nprobe": 2, "planes": 6, "trigger": 16.0, "target": 8.0}
    fixture = "/tmp/pypeln_sfscale"
    arms = []
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--"):
            key = a[2:]
            opt[key] = type(opt[key])(args[i + 1])
            i += 2
        elif os.path.isdir(a):
            fixture = a
            i += 1
        else:
            arms.append(a)
            i += 1
    arms = arms or ["fixed", "trig", "cells"]

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pypeln_spark import streaming as ST
    from pypeln_spark.ext import dedup as D
    from pypeln_spark.ext import similarity as S
    from pypeln_spark.queries.base import load_table
    from pypeln_spark.session import get_spark

    spark = get_spark(app_name="gate_arms")
    DIM = 64

    emb = load_table(spark, fixture, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % 2 == 0).localCheckpoint(eager=True)
    epochs = [
        emb.filter(F.col("vec_id") % 6 == c).localCheckpoint(eager=True)
        for c in (1, 3, 5)
    ]
    planted: dict[int, int] = {}
    if opt["plant"]:
        # N exact copies of corpus vectors per epoch under fresh ids —
        # deterministic draw (hash-ordered corpus sample), disjoint per
        # epoch so a planted copy always has exactly one true source
        base_id = (emb.agg(F.max("vec_id")).first()[0] or 0) + 1
        picks = [
            r.vec_id
            for r in corpus.select("vec_id")
            .orderBy(F.md5(F.col("vec_id").cast("string")))
            .limit(opt["plant"] * 3)
            .collect()
        ]
        src_vec = {
            r.vec_id: r.embedding
            for r in corpus.filter(F.col("vec_id").isin(picks)).collect()
        }
        new_epochs = []
        for e in range(3):
            srcs = picks[e * opt["plant"]:(e + 1) * opt["plant"]]
            rows = []
            for j, s in enumerate(srcs):
                nid = base_id + e * opt["plant"] + j
                planted[nid] = s
                rows.append((nid, src_vec[s]))
            extra = spark.createDataFrame(
                rows, "vec_id long, embedding array<float>"
            )
            new_epochs.append(
                epochs[e].unionByName(extra).localCheckpoint(eager=True)
            )
        epochs = new_epochs

    def run_arm(arm: str):
        S.drop_index()
        D.retire_pipeline_caches()
        root = ST.stream_sink_dir(f"gate_arms_{arm}_")
        schema = T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("epoch", T.IntegerType()),
            T.StructField("dup_of", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ])
        spark.createDataFrame([], schema).repartition(1).write.mode(
            "append"
        ).parquet(root)
        t_train0 = time.perf_counter()
        if arm == "cells":
            nf = S.with_norms(S.spread(corpus))
            cents = S.kmeans_centroids(
                corpus, opt["cells"], 2, train_mod=4
            ).localCheckpoint(eager=True)
            cor = S.ivf_assign(nf, cents, opt["cells"], keep=1).select(
                "vec_id", "_v", "_norm", F.col("cid").alias("bucket")
            ).localCheckpoint(eager=True)
        else:
            cor = S.lsh_bucket(
                S.with_norms(S.spread(corpus)), "_v", opt["planes"], DIM
            ).select("vec_id", "_v", "_norm", "bucket").localCheckpoint(eager=True)
        t_train = time.perf_counter() - t_train0
        idx = D.IncrementalLshIndex(
            cor.select("vec_id", "_v", "_norm"),
            cor.select("vec_id", "bucket"),
            compact_every=1,
        )
        if arm == "cells":
            gate = S.CellEmbeddingIngestGate(
                idx, root, DIM, cents, opt["cells"], opt["threshold"],
                nprobe=opt["nprobe"], collect_stats=True,
                absorb_dedup=False,  # arms compare store-everything shapes
            )
        else:
            gate = S.EmbeddingIngestGate(
                idx, root, DIM, opt["planes"], opt["threshold"],
                probe_hamming=1,
                occupancy_trigger=(opt["trigger"] if arm == "trig" else 0.0),
                target_occupancy=opt["target"], collect_stats=True,
                absorb_dedup=False,  # arms compare store-everything shapes
            )
        t0 = time.perf_counter()
        ST.staged_foreach_batch(spark, epochs, gate)
        wall = time.perf_counter() - t0
        dec = spark.read.parquet(root).collect()
        idx.close()
        D.retire_pipeline_caches()
        ST.remove_sink_dir(spark, root)
        dups = {r.vec_id: r.dup_of for r in dec if r.dup_of is not None}
        # caught = flagged as dup of ANY corpus vector (the gate's job);
        # at low thresholds the min-corpus-id survivor pick legitimately
        # names a different qualifying source, so exact-source is the
        # SECONDARY metric (it converges to caught as threshold rises)
        caught = sum(1 for n in planted if n in dups)
        exact = sum(1 for n, s in planted.items() if dups.get(n) == s)
        return {
            "wall_s": round(wall, 1),
            "train_s": round(t_train, 1),
            "n_decisions": len(dec),
            "n_dups": len(dups),
            "planted_caught": caught,
            "planted_exact_src": exact,
            "planted_total": len(planted),
            "n_cand_per_epoch": [s["n_cand"] for s in gate.stats],
        }, frozenset(dups.items())

    out = {}
    for arm in arms:
        runs, dsets = [], set()
        for r in range(opt["runs"]):
            res, dset = run_arm(arm)
            runs.append(res)
            dsets.add(dset)
            print(f"# {arm} run{r}: {res}", file=sys.stderr)
        assert len(dsets) == 1, f"{arm}: decisions nondeterministic across runs"
        best = min(runs, key=lambda x: x["wall_s"])
        out[arm] = best
    print(json.dumps({
        "metric": "gate_arms",
        "fixture": fixture,
        "threshold": opt["threshold"],
        "plant": opt["plant"],
        "arms": out,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
