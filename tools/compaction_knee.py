"""Compaction-knee experiment (VERDICT r8 #3): where does delta-chain
compaction start paying on a DEEP ingest stream?

r8 measured K=1 vs append-only at the registry gate's 3 epochs and found
compaction free-to-winning — but the LSM write-amplification trade only
shows with a deep delta chain (compaction re-writes the WHOLE index every
K epochs, while the append-only plan's leaf count and per-epoch analysis
cost grow without bound). This tool drives the IDENTICAL per-epoch gate
code the registry query runs (ext/dedup.TextIngestGate — the streaming
harness is deliberately skipped: its fixed ~1.5 s/run floor is epoch-count
independent, SCALING.md "harness floor") over a 12+ epoch synthetic
stream at several compact_every settings and reports per-epoch walls,
totals, and the final index plan's leaf count.

Stream shape: corpus = even doc_ids (the registry gate's index seed);
epochs = the odd doc_ids striped round-robin by (doc_id DIV 2) % N, so
every epoch carries ~|docs|/(2N) docs and the index grows monotonically —
the unbounded-crawl shape at depth N instead of the oracle-pinned 3.

Usage: python tools/compaction_knee.py [--epochs N] [--sf DIR] [K ...]
(defaults: 12 epochs, /root/testdata/sf0.1, K in 0 1 4 8 — 0 is pure
append-only). One JSON line on stdout; human detail on stderr. Results
recorded in SCALING.md ("Compaction knee") and the recommended default on
IncrementalLshIndex's docstring.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def leaves(df) -> int:
    s = df._jdf.queryExecution().analyzed().toString()
    return s.count("LogicalRDD") + s.count("Relation [") + s.count("Relation[")


def main() -> None:
    args = sys.argv[1:]
    n_epochs, sf_dir, ks = 12, "/root/testdata/sf0.1", []
    i = 0
    while i < len(args):
        if args[i] == "--epochs":
            n_epochs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            a = args[i]
            ks.append(a if a == "auto" else int(a)); i += 1
    ks = ks or [0, 1, 4, 8]

    import pypeln_spark as pl
    from pyspark.sql import functions as F

    from pypeln_spark import streaming as ST
    from pypeln_spark.ext import dedup as D
    from pypeln_spark.queries.base import load_table
    from pypeln_spark.queries.dedup import BANDS, JACCARD_THRESHOLD, N_HASHES

    spark = pl.get_spark()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    epochs = [
        docs.filter(
            (F.col("doc_id") % 2 == 1)
            & (F.expr("doc_id DIV 2") % n_epochs == e)
        )
        for e in range(n_epochs)
    ]

    # base index built ONCE, persisted, shared read-only across arms
    # (the index class never unpersists its base — same as the session
    # cache the registry gate reads)
    base_sh, base_bands, _ = D.build_corpus_index(
        corpus, n_hashes=N_HASHES, bands=BANDS
    )
    base_sh = base_sh.persist(); base_sh.count()
    base_bands = base_bands.persist(); base_bands.count()

    arms = {}
    scratch = tempfile.mkdtemp(prefix="pypeln_knee_")
    n_dup_ref = None
    for k in ks:
        root = os.path.join(scratch, f"k{k}")
        os.makedirs(root)
        index = D.IncrementalLshIndex(base_sh, base_bands, compact_every=k)
        gate = D.TextIngestGate(
            index, root, N_HASHES, BANDS, 5, JACCARD_THRESHOLD
        )
        per_epoch = []
        k_sched = []  # the K the auto policy picked per absorb
        t_all = time.time()
        with ST._stream_partitions(spark):  # the registry gate's scope
            for e, ep in enumerate(epochs):
                t = time.time()
                gate(ep, e)
                per_epoch.append(round(time.time() - t, 3))
                k_sched.append(index.compact_every)
        total = round(time.time() - t_all, 3)
        lf = leaves(index.sh)
        n_dup = (
            spark.read.parquet(root).filter(F.col("dup_of").isNotNull()).count()
        )
        D.retire_pipeline_caches()
        index.close()
        shutil.rmtree(root, ignore_errors=True)
        if n_dup_ref is None:
            n_dup_ref = n_dup
        assert n_dup == n_dup_ref, (
            f"K={k}: decisions changed ({n_dup} vs {n_dup_ref}) — "
            "compaction must be layout-only"
        )
        arms[f"K{k}"] = {
            "total_sec": total,
            "per_epoch_sec": per_epoch,
            "index_plan_leaves": lf,
            "n_dup_decisions": n_dup,
            **({"k_schedule": k_sched} if k == "auto" else {}),
        }
        print(
            f"K={k}: total {total}s, leaves {lf}, "
            f"first/last epoch {per_epoch[0]}/{per_epoch[-1]}s",
            file=sys.stderr,
        )
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({
        "metric": "compaction_knee",
        "sf_dir": sf_dir,
        "epochs": n_epochs,
        "arms": arms,
    }))


if __name__ == "__main__":
    main()
