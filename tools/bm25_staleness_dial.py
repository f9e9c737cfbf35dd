"""Measure live BM25 serving's staleness dial: the IDF/avgdl snapshot cadence.

streaming_bm25_topk_serving_live re-snapshots corpus statistics (N, sum dl,
per-term df) from the live postings/doclen frames at EVERY query epoch —
the freshest cadence micro-batches allow. A deployment can hold a snapshot
longer (the lexical analogue of serving under pre-retrain centroids) and
serve scores computed under STALE idf against FRESH postings. This tool
prices both sides of that trade over an N-epoch ingest/serve interleave:

- arm FRESH: stats recomputed from the live frames at each query epoch
  (the registry entry's shape);
- arm STALE: stats frozen at the epoch-0 snapshot for every later serve.

Reported per query epoch: serve wall for each arm (the stale arm saves the
doclen aggregate + per-term df aggregate), top-k overlap between the arms,
and the max |score delta| on shared docs — the error magnitude staleness
buys. Ingest here appends every arriving doc to the postings (no LSH gate:
the dial isolates the statistics question; dedup decisions are orthogonal
to WHICH stats snapshot scores the survivors).

    python tools/bm25_staleness_dial.py [n_epochs] [runs] [--skew]

defaults: n_epochs=4, runs=1. SPARK_GRAFT_SF_DIR picks the fixture
(default /root/testdata/sf0.1). ``--skew`` restricts every arriving
epoch to documents containing query 0's first term — DIFFERENTIAL df
drift (one query's terms inflate while the others' hold), the regime
where stale idf flips RANKS, not just scores; uniform arrivals drift
every term's idf near-proportionally and rank order barely moves (the
default arm measures exactly that).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pypeln_spark.ext import dedup as D  # noqa: E402
from pypeln_spark.ext import text as X  # noqa: E402
from pypeln_spark.queries.base import load_table  # noqa: E402
from pypeln_spark.queries.streaming import (  # noqa: E402
    BM25_B, BM25_K1, BM25_LIVE_K, BM25_LIVE_QUERIES,
)
from pypeln_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    skew = "--skew" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_epochs = int(argv[0]) if len(argv) > 0 else 4
    runs = int(argv[1]) if len(argv) > 1 else 1
    spark = get_spark(app_name="bm25_staleness_dial")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    mod = 2 * n_epochs
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    qt = spark.createDataFrame(BM25_LIVE_QUERIES, "doc_id long, text string")
    qterms = qt.select(
        F.col("doc_id").alias("query_id"),
        F.explode(X.tokenize(F.col("text"))).alias("term"),
    )

    for r in range(runs):
        D.retire_pipeline_caches()
        base_p, base_d = X.bm25_postings(corpus)
        posts = [base_p.localCheckpoint(eager=True)]
        dls = [base_d.localCheckpoint(eager=True)]

        def live():
            p, d = posts[0], dls[0]
            for extra in posts[1:]:
                p = p.unionByName(extra)
            for extra in dls[1:]:
                d = d.unionByName(extra)
            return p, d

        frozen = {}  # the epoch-0 stats snapshot, collected once

        def serve(p, d, stats_rows=None):
            """stats_rows=None -> fresh in-plane stats (the entry's shape);
            otherwise score under the FROZEN literal snapshot."""
            if stats_rows is None:
                return X.bm25_serve(p, d, qterms, k=BM25_LIVE_K,
                                    k1=BM25_K1, b=BM25_B)
            n, sumdl, dfmap = stats_rows
            from pypeln_spark.functions import dsum

            m = p.join(F.broadcast(qterms), "term")
            df_lit = F.create_map(
                *[F.lit(x) for kv in dfmap.items() for x in kv]
            )
            avgdl = float(sumdl) / float(n)
            norm = F.lit(BM25_K1) * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B) * (F.col("dl").cast("double") / F.lit(avgdl))
            )
            # a term absent from the epoch-0 snapshot has df=0 under stale
            # stats (maximum idf (n+0.5)/0.5) — a NULL lookup would instead
            # silently DROP the term's contribution from the sum, corrupting
            # the drift numbers in exactly the differential regime measured
            dfc = F.coalesce(df_lit[F.col("term")].cast("double"), F.lit(0.0))
            idf = (F.lit(float(n)) - dfc + F.lit(0.5)) / (dfc + F.lit(0.5))
            tf = F.col("tf").cast("double")
            contrib = idf * ((tf * F.lit(BM25_K1 + 1.0)) / (tf + norm))
            sc = (
                m.withColumn("_c", contrib)
                .groupBy("query_id", "doc_id")
                .agg(dsum("_c", 12).alias("score"))
            )
            from pyspark.sql import Window

            w = Window.partitionBy("query_id").orderBy(
                F.col("score").desc(), F.col("doc_id").asc()
            )
            return (
                sc.withColumn("rank", F.row_number().over(w).cast("int"))
                .filter(F.col("rank") <= BM25_LIVE_K)
                .select("query_id", "doc_id", "score", "rank")
            )

        skew_term = BM25_LIVE_QUERIES[0][1].split()[0]
        for e in range(n_epochs):
            arriving = docs.filter(F.col("doc_id") % mod == 2 * e + 1)
            if skew:
                arriving = arriving.filter(
                    F.array_contains(X.tokenize(F.col("text")), skew_term)
                )
            p, d = X.bm25_postings(arriving)
            posts.append(p.localCheckpoint(eager=True))
            dls.append(d.localCheckpoint(eager=True))
            lp, ld = live()
            if e == 0 and not frozen:
                st = ld.agg(
                    F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
                ).collect()[0]
                dfr = (
                    lp.join(F.broadcast(qterms.select("term").distinct()), "term")
                    .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
                ).collect()
                frozen["v"] = (st.n, st.s, {r2.term: r2.df for r2 in dfr})
            t0 = time.time()
            fresh = {(r2.query_id, r2.doc_id): (r2.score, r2.rank)
                     for r2 in serve(lp, ld).collect()}
            t_fresh = time.time() - t0
            t0 = time.time()
            stale = {(r2.query_id, r2.doc_id): (r2.score, r2.rank)
                     for r2 in serve(lp, ld, frozen["v"]).collect()}
            t_stale = time.time() - t0
            shared = set(fresh) & set(stale)
            overlap = len(shared) / max(len(fresh), 1)
            max_d = max(
                (abs(fresh[k][0] - stale[k][0]) for k in shared), default=0.0
            )
            rel = max(
                (abs(fresh[k][0] - stale[k][0]) / abs(fresh[k][0])
                 for k in shared if fresh[k][0]), default=0.0,
            )
            print(
                f"run{r} epoch{e}: fresh={t_fresh:5.2f}s stale={t_stale:5.2f}s "
                f"topk_overlap={overlap:.2f} max|dscore|={max_d:.4f} "
                f"max_rel={rel:.4f}"
            )
        D.retire_pipeline_caches()


if __name__ == "__main__":
    main()
