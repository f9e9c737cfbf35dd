"""Price absorb_dedup on a CLEAN (duplicate-free) stream (VERDICT r11 #3).

The r11 flood A/Bs priced the guard ON a flood (where it dominates); this
tool measures what a deployment pays for leaving it on when no flood
arrives — the number the default recommendation rests on. Streams the
fixture's odd-id rows (all distinct: the sf fixtures carry no within-epoch
duplicate shingle sets / vectors) through each gate family in N epochs,
absorb_dedup off vs on, min-of-R walls per epoch, and asserts the shared
decision columns are identical across arms (the guard must be a no-op on
clean traffic, in decisions AND absorbed rows).

    python tools/absorb_clean_ab.py [text|embedding|both] [epochs] [runs]

defaults: both, 3 epochs, 2 runs. SPARK_GRAFT_SF_DIR picks the fixture
(default sf0.1; point at /tmp/pypeln_sfscale for the sf1 arm).
Per-arm hypervisor-steal deltas are printed so a contended sample is
readable as one (host-contention protocol, SCALING.md r11).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _steal_jiffies  # noqa: E402 - bench.py sits at repo root
from pypeln_spark.ext import dedup as D  # noqa: E402
from pypeln_spark.ext import similarity as S  # noqa: E402
from pypeln_spark.queries.base import load_table  # noqa: E402
from pypeln_spark.queries.dedup import BANDS, N_HASHES  # noqa: E402
from pypeln_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64
N_PLANES = 8


def run_text(spark, n_epochs, absorb_dedup):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    root = tempfile.mkdtemp(prefix="pypeln_absorb_clean_")
    D.retire_pipeline_caches()
    cor_sh = D.pool_persist(D.shingle_arrays(D.spread(corpus), "text", "doc_id", 5))
    cor_sh.count()
    cor_bands = D.lsh_band_table(
        D.minhash_signatures_wide(cor_sh, "doc_id", N_HASHES),
        "doc_id", BANDS, N_HASHES // BANDS,
    )
    idx = D.IncrementalLshIndex(cor_sh, cor_bands, compact_every=1)
    gate = D.TextIngestGate(
        idx, root, N_HASHES, BANDS, 5, 0.5, absorb_dedup=absorb_dedup
    )
    walls = []
    for e in range(n_epochs):
        frame = docs.filter(
            (F.col("doc_id") % (2 * n_epochs)) == (2 * e + 1)
        )
        t0 = time.time()
        gate(frame, e)
        walls.append(time.time() - t0)
    idx.close()
    out = spark.read.parquet(root)
    decisions = {
        (r.doc_id, r.epoch, r.dup_of, r.jaccard) for r in out.collect()
    }
    n_absorbed = (
        out.filter(F.col("absorbed")).count() if absorb_dedup else None
    )
    shutil.rmtree(root, ignore_errors=True)
    D.retire_pipeline_caches()
    return walls, decisions, n_absorbed


def run_embedding(spark, n_epochs, absorb_dedup):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    root = tempfile.mkdtemp(prefix="pypeln_absorb_clean_")
    D.retire_pipeline_caches()
    cor = D.pool_persist(S.lsh_bucket(S.with_norms(S.spread(corpus)), "_v", N_PLANES, DIM))
    cor.count()
    idx = D.IncrementalLshIndex(
        cor.select("vec_id", "_v", "_norm"),
        cor.select("vec_id", "bucket"),
        compact_every=1,
    )
    gate = S.EmbeddingIngestGate(
        idx, root, DIM, n_planes=N_PLANES, threshold=0.95,
        probe_hamming=1, absorb_dedup=absorb_dedup,
    )
    walls = []
    for e in range(n_epochs):
        frame = emb.filter((F.col("vec_id") % (2 * n_epochs)) == (2 * e + 1))
        t0 = time.time()
        gate(frame, e)
        walls.append(time.time() - t0)
    idx.close()
    out = spark.read.parquet(root)
    decisions = {(r.vec_id, r.epoch, r.dup_of, r.cos) for r in out.collect()}
    shutil.rmtree(root, ignore_errors=True)
    D.retire_pipeline_caches()
    return walls, decisions, None


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    family = argv[0] if len(argv) > 0 else "both"
    n_epochs = int(argv[1]) if len(argv) > 1 else 3
    runs = int(argv[2]) if len(argv) > 2 else 2
    spark = get_spark()

    runners = {"text": run_text, "embedding": run_embedding}
    for fam in [family] if family != "both" else ["text", "embedding"]:
        runner = runners[fam]
        results = {}
        for label, ad in (("plain", False), ("dedup", True)):
            best, dec, n_abs = None, None, None
            s0 = _steal_jiffies()
            for _ in range(runs):
                walls, decisions, n_absorbed = runner(spark, n_epochs, ad)
                if best is None or sum(walls) < sum(best):
                    best, dec, n_abs = walls, decisions, n_absorbed
            s1 = _steal_jiffies()
            steal = (
                f"{(s1 - s0) / 100.0:.1f}cpu-s"
                if None not in (s0, s1) else "n/a"
            )
            results[label] = (best, dec, n_abs)
            per = " ".join(f"e{i}={w:5.1f}s" for i, w in enumerate(best))
            extra = f" absorbed_true={n_abs}" if n_abs is not None else ""
            print(
                f"{fam:9s} {label:6s} total={sum(best):6.1f}s {per} "
                f"steal={steal}{extra}"
            )
        same = results["plain"][1] == results["dedup"][1]
        over = sum(results["dedup"][0]) / max(sum(results["plain"][0]), 1e-9)
        print(f"{fam}: decisions identical={same} overhead={over:.3f}x")
        if not same:
            diff = results["plain"][1] ^ results["dedup"][1]
            print(f"  DIFFERING ROWS ({len(diff)}): {sorted(diff)[:6]}")
            # the docstring promises an ASSERT, not a report — a scripted
            # A/B must fail loudly on a decision mismatch (ADVICE r12)
            sys.exit(1)


if __name__ == "__main__":
    main()
