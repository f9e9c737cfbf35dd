"""A/B the LSH hot-bucket star cap on a planted boilerplate cluster.

Real web corpora carry dup clusters of 10^4-10^6 near-identical pages
(boilerplate, mirrors). Every band bucket such a cluster occupies emits
pairs quadratic in cluster size through the uncapped candidate self-join.
This tool plants an m-wide exact-dup cluster on top of sf0.1 documents and
measures both arms end to end (candidates + exact-Jaccard verify):

    python tools/hot_bucket_ab.py [m] [cap]

defaults m=1000, cap=256. Prints candidate counts, verified-pair counts,
and min-of-2 walls per arm, plus the connected-components cluster check
(the planted cluster must come out as ONE component in both arms).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pypeln_spark.ext import dedup as D  # noqa: E402
from pypeln_spark.queries.base import load_table  # noqa: E402
from pypeln_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark()

    docs = load_table(spark, SF_DIR, "documents")
    boiler = docs.orderBy("doc_id").limit(1).collect()[0]
    planted = spark.range(m).select(
        (F.lit(10_000_000) + F.col("id")).alias("doc_id"),
        F.lit(boiler.text).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    corpus = corpus.repartition(32).persist()
    n = corpus.count()
    print(f"corpus rows: {n} (planted cluster m={m}, cap={cap})")

    def run(bucket_cap):
        best = None
        counts = None
        for _ in range(runs):
            D.retire_pipeline_caches()
            t0 = time.time()
            sh = D.shingle_arrays(D.spread(corpus))
            sh = D.pool_persist(sh)
            sh.count()
            wide = D.minhash_signatures_wide(sh, n_hashes=32)
            wide = D.pool_persist(wide)
            wide.count()
            cand = D.lsh_candidate_pairs(wide, bands=8, bucket_cap=bucket_cap)
            n_cand = cand.count()
            verified = D.jaccard_pairs_from_candidates(cand, sh, threshold=0.5)
            n_ver = verified.count()
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
            counts = (n_cand, n_ver)
            # cluster integrity: the planted docs must be one component
            cc = D.connected_components(verified)
            planted_labels = (
                cc.filter(F.col("doc_id") >= 10_000_000)
                .select("cluster_id").distinct().count()
            )
        return best, counts, planted_labels

    for label, bc in (("capped", cap), ("uncapped", None)):
        wall, (n_cand, n_ver), labels = run(bc)
        print(
            f"{label:9s} wall(min-of-2)={wall:7.1f}s candidates={n_cand:>10,}"
            f" verified={n_ver:>10,} planted-components={labels}"
        )


if __name__ == "__main__":
    main()
