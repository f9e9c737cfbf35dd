"""Capture/cost table for the combined corpus-scale SimHash setting
(VERDICT r10 #7): 60-bit fingerprints × T affine regrouping tables at
hd ≤ 5, measured against the brute-force 60-bit scan.

For the given fixture, reports per tables=1..4:
  - candidate pairs (the explode-join volume — the cost column)
  - verified pairs at hd ≤ 5
  - capture by hamming bucket vs brute force (recall at hd 3 / 4 / 5)
Plus the 32-bit wide form (tables=4, byte bands) for the saturation
comparison. Candidate/verified COUNTS are contention-immune — this is
the same discipline as the r10 sf1 confirmation.

Usage: python tools/simhash_wide60_capture.py [sf_dir] [max_docs]
(default /root/testdata/sf0.1, all docs). One JSON line per arm on
stdout; brute-force reference computed in DuckDB over the same frozen
h60 tokens. Results -> SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

_TH60 = "CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT)"

BRUTE = f"""
WITH th AS (
  SELECT doc_id, {_TH60} AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
),
contrib AS (
  SELECT doc_id, i,
         SUM(CASE WHEN (h >> CAST(i AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS i)
  GROUP BY doc_id, i
),
fp AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM contrib GROUP BY doc_id
)
SELECT bit_count(xor(a.simhash, b.simhash)) AS hd, COUNT(*) AS n
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 5
GROUP BY 1 ORDER BY 1
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    from pyspark.sql import functions as F

    from pypeln_spark.ext import dedup as D
    from pypeln_spark.queries.base import load_table
    from pypeln_spark.session import get_spark

    spark = get_spark(app_name="simhash_wide60_capture")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if max_docs:
        docs = docs.filter(F.col("doc_id") < max_docs)
    docs = D.pool_persist(docs)
    n_docs = docs.count()

    # brute-force 60-bit reference (DuckDB — same frozen md5 token hash)
    con = duckdb.connect()
    lim = f"WHERE doc_id < {max_docs}" if max_docs else ""
    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):  # Spark-written fixtures are part-file dirs
        path = f"{path}/*.parquet"
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, text FROM "
        f"read_parquet('{path}') {lim}"
    )
    t0 = time.time()
    ref = {int(hd): int(n) for hd, n in con.execute(BRUTE).fetchall()}
    t_ref = round(time.time() - t0, 1)
    print(json.dumps({"fixture": sf_dir, "n_docs": n_docs,
                      "brute_hd_pairs": ref, "brute_sec": t_ref}))

    fp60 = D.pool_persist(D.simhash_fingerprints(docs, bits=60))
    fp60.count()

    def measure(tables):
        # ONE pass at max_hamming=60 (every candidate passes the filter):
        # total rows = distinct candidate volume, the hd<=5 buckets give
        # verified pairs and per-hd capture
        t0 = time.time()
        out = D.simhash_near_pairs_wideband(
            fp60, max_hamming=60, band_bits=15, bands=4, tables=tables
        )
        by_hd = {int(r["hamming"]): int(r["n"]) for r in
                 out.groupBy("hamming").agg(F.count("*").alias("n")).collect()}
        wall = round(time.time() - t0, 1)
        rec = {hd: (by_hd.get(hd, 0), ref.get(hd, 0)) for hd in (1, 2, 3, 4, 5)}
        print(json.dumps({
            "arm": f"wide60_tables={tables}", "wall_s": wall,
            "candidates": sum(by_hd.values()),
            "verified_pairs_hd5": sum(n for h, n in by_hd.items() if h <= 5),
            "capture_vs_brute": {str(h): f"{a}/{b}" for h, (a, b) in rec.items()},
        }))

    for t in (1, 2, 4):
        measure(t)

    # 32-bit saturation comparison: the pre-r11 production setting
    fp32 = D.pool_persist(D.simhash_fingerprints(docs))
    fp32.count()
    t0 = time.time()
    n32 = D.simhash_near_pairs(fp32, max_hamming=5, tables=4).count()
    print(json.dumps({
        "arm": "wide32_tables=4", "wall_s": round(time.time() - t0, 1),
        "verified_pairs": int(n32),
        "note": "32-bit hd<=5 admissions — fingerprint saturation, not near-dups",
    }))
    D.retire_pipeline_caches()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
