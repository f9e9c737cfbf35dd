"""Capstone: a composed training-data curation pipeline — the workload this
engine exists for. Chains quality scoring → thresholds → exact-dedup
keep-list → per-survivor stats, all as one lazy plan (one scan of documents
feeding two branches, hash-join reconciled). The oracle replays the full
chain in SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pypeln_spark.ext import dedup as D, text as X

from .base import register, tables

_STOP_EN = "['" + "','".join(X.STOPWORDS["en"]) + "']"
TOKS = "string_split(text, ' ')"

MIN_TOKENS = 20
MIN_STOPWORD_RATIO = 0.02


@register(
    "curation_pipeline_survivors",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, text,
             CAST(len({TOKS}) AS BIGINT) AS n_tokens,
             CAST(len(list_filter({TOKS}, t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
               / CAST(len({TOKS}) AS DOUBLE) AS stopword_ratio
      FROM documents
    ),
    quality AS (
      SELECT * FROM scored
      WHERE n_tokens >= {MIN_TOKENS} AND stopword_ratio >= {MIN_STOPWORD_RATIO}
    ),
    keep AS (
      SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)
    )
    SELECT q.doc_id, q.n_tokens, q.stopword_ratio
    FROM quality q JOIN keep k ON q.doc_id = k.doc_id
    """,
)
def curation_pipeline_survivors(spark, sf_dir):
    """Quality-filter → exact-dedup → stats, composed lazily: Catalyst sees
    the whole chain and scans documents once per branch with the filters
    pushed down. At 100 TB the md5 keep-list shuffle carries (hash, id)
    only — survivors' text never moves."""
    (docs,) = tables(spark, sf_dir, "documents")
    scored = X.quality_scores(docs).select("doc_id", "n_tokens", "stopword_ratio")
    quality = (
        docs.join(scored, "doc_id")
        .filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
        )
    )
    keep = D.exact_dedup(quality).select(F.col("keep_id").alias("doc_id"))
    return quality.join(keep, "doc_id").select("doc_id", "n_tokens", "stopword_ratio")
