"""A/B the ingest gate's index bucket_cap on a planted hot bucket.

Plants an m-wide boilerplate cluster INTO the gate's index (epoch 0: m
exact copies with distinct ids, no corpus match, all absorbed as novel —
within-batch dedup is the upstream batch pipeline's job), then streams
N further epochs each carrying fresh boilerplate copies plus regular
docs. Uncapped, every later copy verifies against all m bucket members
(per-epoch candidate rows ∝ m); capped, against ≤ cap + recent deltas.
Decisions for the copies must be IDENTICAL (min-id member survives the
cap; dup_of/jaccard bit-equal) — asserted, not assumed.

    python tools/gate_bucket_cap_ab.py [m] [cap] [epochs] [--absorb-dedup]

defaults m=5000, cap=8, epochs=4. Prints per-epoch walls and candidate
pair counts per arm. --absorb-dedup adds the r11 source-guard arm
(TextIngestGate(absorb_dedup=True), no cap): the planted flood stores
ONE representative at epoch 0, decisions must stay identical.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pypeln_spark.ext import dedup as D  # noqa: E402
from pypeln_spark.queries.base import load_table  # noqa: E402
from pypeln_spark.queries.dedup import BANDS, N_HASHES  # noqa: E402
from pypeln_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BOILER_BASE = 20_000_000


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    m = int(argv[0]) if len(argv) > 0 else 5000
    cap = int(argv[1]) if len(argv) > 1 else 8
    n_epochs = int(argv[2]) if len(argv) > 2 else 4
    spark = get_spark()

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    # synthetic boilerplate NOT present in the corpus: epoch 0's copies
    # must all read novel and be absorbed (planting the m-wide bucket) —
    # a text lifted from a corpus doc would be flagged dup at epoch 0 and
    # never absorbed, leaving the bucket 1-wide and the A/B vacuous
    boiler = (
        "navigation home products services about contact copyright all "
        "rights reserved terms of use privacy policy cookie settings "
        "sitemap newsletter subscribe follow us social media footer "
    ) * 4
    regular = docs.filter(F.col("doc_id") % 2 == 1).persist()
    regular.count()

    def epoch_frames():
        """epoch 0 plants the m-wide cluster; epochs 1..N each bring 50
        fresh copies + ~200 regular docs (disjoint slices by doc_id)."""
        frames = [
            spark.range(m).select(
                (F.lit(BOILER_BASE) + F.col("id")).alias("doc_id"),
                F.lit(boiler).alias("text"),
            )
        ]
        for e in range(1, n_epochs + 1):
            copies = spark.range(50).select(
                (F.lit(BOILER_BASE + 10_000 * e) + F.col("id")).alias("doc_id"),
                F.lit(boiler).alias("text"),
            )
            reg = regular.filter((F.col("doc_id") % (2 * n_epochs)) == (2 * e - 1))
            frames.append(copies.unionByName(reg))
        return frames

    def run(bucket_cap, absorb_dedup=False):
        root = tempfile.mkdtemp(prefix="pypeln_gate_cap_ab_")
        D.retire_pipeline_caches()
        cor_sh = D.pool_persist(
            D.shingle_arrays(D.spread(corpus), "text", "doc_id", 5)
        )
        cor_sh.count()
        cor_bands = D.lsh_band_table(
            D.minhash_signatures_wide(cor_sh, "doc_id", N_HASHES),
            "doc_id", BANDS, N_HASHES // BANDS,
        )
        idx = D.IncrementalLshIndex(
            cor_sh, cor_bands, compact_every=1, bucket_cap=bucket_cap
        )
        gate = D.TextIngestGate(
            idx, root, N_HASHES, BANDS, 5, 0.5, absorb_dedup=absorb_dedup
        )
        walls = []
        for e, frame in enumerate(epoch_frames()):
            t0 = time.time()
            gate(frame, e)
            walls.append(time.time() - t0)
        idx.close()
        out = spark.read.parquet(root)
        decisions = {
            (r.doc_id, r.epoch, r.dup_of, r.jaccard)
            for r in out.filter(F.col("doc_id") >= BOILER_BASE).collect()
        }
        n_flagged = out.filter(
            (F.col("doc_id") >= BOILER_BASE) & F.col("dup_of").isNotNull()
        ).count()
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        D.retire_pipeline_caches()
        return walls, decisions, n_flagged

    arms = [("capped", cap, False), ("uncapped", None, False)]
    if "--absorb-dedup" in sys.argv:
        arms.append(("dedup", None, True))
    results = {}
    for label, bc, ad in arms:
        walls, decisions, n_flagged = run(bc, ad)
        results[label] = decisions
        per = " ".join(f"e{i}={w:5.1f}s" for i, w in enumerate(walls))
        print(
            f"{label:9s} total={sum(walls):6.1f}s {per} "
            f"boiler-dups-flagged={n_flagged}"
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
