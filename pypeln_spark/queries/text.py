"""Text-analysis queries over the documents table — oracle-matched.

Spark implementations live in ext/text.py (pure Catalyst); each oracle here
spells the identical computation in DuckDB SQL. Shared sub-expressions come
from ext/hashing.py's sql_* twins so the two dialects cannot drift.
"""

from __future__ import annotations

from pypeln_spark.ext import text as X
from pypeln_spark.ext.hashing import sql_h31

from .base import register, tables

TOKS = "string_split(text, ' ')"
_STOP_EN = "['" + "','".join(X.STOPWORDS["en"]) + "']"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({TOKS})) AS BIGINT) AS n_unique_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    """Whitespace token counting — one codegen'd projection, no UDF."""
    (docs,) = tables(spark, sf_dir, "documents")
    return X.token_stats(docs)


@register(
    "text_bpe_ish_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]', 0)) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_ish_token_count(spark, sf_dir):
    """BPE-ish pre-tokenizer segmentation count (letter runs / digit runs /
    single symbols) — regexp, still JVM-side."""
    from pyspark.sql import functions as F

    (docs,) = tables(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(X.tokenize_bpe_ish(F.col("text"))).cast("long").alias("n_bpe_tokens"),
    )


@register(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len({TOKS}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS DOUBLE) / CAST(len({TOKS}) AS DOUBLE) AS avg_token_len,
           CAST(len(list_filter({TOKS}, t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
             / CAST(len({TOKS}) AS DOUBLE) AS stopword_ratio,
           CAST(len(list_filter({_STOP_EN}, s -> list_contains({TOKS}, s))) AS BIGINT)
             AS n_distinct_stopwords,
           CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS punct_ratio,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS digit_ratio
    FROM documents
    """,
)
def text_quality_scores(spark, sf_dir):
    """C4/Gopher-style cheap quality signals in one projection."""
    (docs,) = tables(spark, sf_dir, "documents")
    return X.quality_scores(docs)


def _lang_score_sql(lang: str) -> str:
    stop = "['" + "','".join(X.STOPWORDS[lang]) + "']"
    return (
        f"CAST(len(list_filter({TOKS}, t -> list_contains({stop}, t))) AS DOUBLE)"
        f" / CAST(len({TOKS}) AS DOUBLE)"
    )


_LANGS = list(X.STOPWORDS)
_BEST = "greatest(" + ", ".join(f"score_{l}" for l in _LANGS) + ")"
_PRED_CASES = " ".join(
    f"WHEN score_{l} = {_BEST} AND {_BEST} > 0 THEN '{l}'" for l in _LANGS
)


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             {", ".join(f"{_lang_score_sql(l)} AS score_{l}" for l in _LANGS)}
      FROM documents
    )
    SELECT doc_id, {", ".join(f"score_{l}" for l in _LANGS)},
           CASE {_PRED_CASES} ELSE 'und' END AS predicted_lang
    FROM scored
    """,
)
def text_lang_id(spark, sf_dir):
    """Stopword-ratio language ID with deterministic argmax tiebreak."""
    (docs,) = tables(spark, sf_dir, "documents")
    return X.lang_scores(docs)


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform({TOKS}, t -> {sql_h31('t')})),
             (acc, x) -> (acc * 31 + x) % 2147483647
           ) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Order-sensitive rolling-hash fingerprint (left fold of token hashes)."""
    (docs,) = tables(spark, sf_dir, "documents")
    return X.fingerprint(docs)


@register(
    "text_length_histogram",
    oracle="""
    SELECT n_chars // 100 AS bucket, COUNT(*) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY 1
    """,
)
def text_length_histogram(spark, sf_dir):
    from pyspark.sql import functions as F

    from pypeln_spark import relational as R

    (docs,) = tables(spark, sf_dir, "documents")
    return R.agg(
        docs.withColumn("bucket", (F.col("n_chars") / 100).cast("long")),
        by=["bucket"],
        aggs={
            "n_docs": F.count(F.lit(1)),
            "min_chars": F.min("n_chars"),
            "max_chars": F.max("n_chars"),
        },
    ).df


@register(
    "text_repetition_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) < 2 THEN []
                  ELSE list_transform(range(1, len(toks)),
                       i -> concat(toks[CAST(i AS INT)], ' ', toks[CAST(i+1 AS INT)]))
             END AS g2,
             CASE WHEN len(toks) < 3 THEN []
                  ELSE list_transform(range(1, len(toks) - 1),
                       i -> concat(toks[CAST(i AS INT)], ' ', toks[CAST(i+1 AS INT)],
                                   ' ', toks[CAST(i+2 AS INT)]))
             END AS g3
      FROM t
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CASE WHEN len(toks) <= 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                         / CAST(len(toks) AS DOUBLE) END AS dup_token_frac,
           CASE WHEN len(g2) <= 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
                         / CAST(len(g2) AS DOUBLE) END AS dup_2gram_frac,
           CASE WHEN len(g3) <= 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
                         / CAST(len(g3) AS DOUBLE) END AS dup_3gram_frac
    FROM g
    """,
)
def text_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality signals (ext/text.repetition_stats):
    duplicate token/2-gram/3-gram fractions per document, computed by array
    HOFs with no explode/shuffle — boilerplate and keyword-stuffing filters
    at codegen speed."""
    (docs,) = tables(spark, sf_dir, "documents")
    return X.repetition_stats(docs)


_BM25_TERMS = ("spark", "window", "join")


@register(
    "search_bm25_topk",
    oracle=X.sql_bm25_topk(_BM25_TERMS, k=20),
)
def search_bm25_topk(spark, sf_dir):
    """BM25 keyword search (ext/text.bm25_topk): top-20 documents for the
    fixed query {spark, window, join}, scores bit-identical to the oracle —
    integer tf/dl/df stats, one-division avgdl, log-free rational idf, and
    an identically-associated IEEE expression tree on both engines. Plan:
    one scan projection + a one-row broadcast stats aggregate + TakeOrdered."""
    (docs,) = tables(spark, sf_dir, "documents")
    return X.bm25_topk(docs, _BM25_TERMS, k=20)


@register(
    "text_pii_scrub",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b', '<PHONE>', 'g') AS text,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text,
             '\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) +
            len(regexp_extract_all(text,
             '\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b')) AS BIGINT) AS n_pii
    FROM documents
    """,
)
def text_pii_scrub(spark, sf_dir):
    """PII redaction (ext/text.scrub_pii): emails/phones replaced with
    typed tokens + per-pattern counts, one narrow projection. The patterns
    live in the RE2 ∩ Java-regex dialect so the oracle replays the
    redaction itself byte-for-byte — scrubbed text is part of the hash."""
    (docs,) = tables(spark, sf_dir, "documents")
    return X.scrub_pii(docs)


@register(
    "text_top_tokens",
    oracle=f"""
    SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents, UNNEST({TOKS}) AS u(t)
    WHERE t <> ''
    GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 50
    """,
)
def text_top_tokens(spark, sf_dir):
    """Global vocabulary head: top-50 tokens by corpus frequency with a
    total (count DESC, token ASC) order. Explode → count is the canonical
    map-side-combinable aggregate (partial counts per partition collapse
    the shuffle to |vocab| rows); the limit runs as TakeOrderedAndProject,
    so no global sort ever materializes. The quick signal for tokenizer /
    vocab drift checks over a new corpus snapshot."""
    from pyspark.sql import functions as F

    (docs,) = tables(spark, sf_dir, "documents")
    toks = X.tokenize(F.col("text"))
    return (
        docs.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(50)
    )


@register("text_tfidf_top_terms", oracle=X.sql_tfidf_top_terms(k=3))
def text_tfidf_top_terms(spark, sf_dir):
    """Per-document keyword extraction: top-3 TF-IDF terms
    (ext/text.tfidf_top_terms). The idf is the log-free rational
    (N+1)/(df+1) so scores — and therefore rank boundaries — are
    bit-identical cross-engine; document frequency comes from one window
    over the high-cardinality term key instead of a second groupBy+join
    shuffle."""
    (docs,) = tables(spark, sf_dir, "documents")
    return X.tfidf_top_terms(docs, k=3)


@register("text_unigram_lm_quality", oracle=X.sql_unigram_lm_score(vocab_size=500))
def text_unigram_lm_quality(spark, sf_dir):
    """Corpus-trained unigram LM quality score (ext/text.unigram_lm_score) —
    the deterministic stand-in for CCNet/KenLM perplexity filtering: mean
    unigram probability per document, exact BIGINTs until one final IEEE
    division (log-free, same determinism contract as BM25/TF-IDF), plus the
    exact OOV fraction against the 500-term vocab."""
    (docs,) = tables(spark, sf_dir, "documents")
    return X.unigram_lm_score(docs, vocab_size=500)


@register(
    "search_tfidf_cosine_topk", oracle=X.sql_tfidf_cosine_topk(n_queries=8, k=5)
)
def search_tfidf_cosine_topk(spark, sf_dir):
    """SPARSE top-k document similarity: TF-IDF cosine via an
    inverted-index equi-join on term (ext/text.tfidf_cosine_topk) — the
    lexical complement of the dense ANN arms. Pairs sharing zero terms
    never materialize (the posting-list join IS the candidate generator),
    so nothing is quadratic in the corpus; the tiny query side broadcasts.
    Weights use the log-free rational idf; the pair dot products and the
    document norms fold IN TERM ORDER, so every cosine — and therefore
    every rank boundary — replays bit-identically in the oracle."""
    (docs,) = tables(spark, sf_dir, "documents")
    return X.tfidf_cosine_topk(docs, n_queries=8, k=5)


@register(
    "search_tfidf_pruned_recall_eval",
    oracle=X.sql_tfidf_pruned_recall_eval(n_queries=8, k=5, champions=64),
)
def search_tfidf_pruned_recall_eval(spark, sf_dir):
    """Retrieval-quality EVALUATION for the champion-list-pruned sparse
    arm (VERDICT r6 #4): recall@k of tfidf_cosine_topk(champions=64)
    against the exact inverted-index retriever, per query — the sparse
    counterpart of the ANN recall-eval trilogy, so the production fix for
    stop-word-hot posting lists (per-term truncation to the 64
    highest-weight postings) ships WITH its measured quality cost, not
    just a speed claim. Candidates are generated from per-term champion
    lists (truncation = one row_number window on the SAME term
    partitioning the df window already created) and the shortlist is then
    scored EXACTLY — full postings, true norms — the
    shortlist-then-rerank shape of the PQ arm; index-only scoring would
    under-count surviving pairs' dot products (measured ~4× worse recall
    at equal N). BOTH arms read the once-materialized inverted index
    (r13; pruning adds at most the champion window's exchange —
    plan-tested), and candidates per query term are capped at 64
    regardless of df, which is what makes many-query workloads over
    stop-word-heavy corpora linear. The oracle replays BOTH retrievers
    and the recall arithmetic end to end."""
    from .similarity import _recall_table

    (docs,) = tables(spark, sf_dir, "documents")
    ex = X.tfidf_cosine_topk(docs, n_queries=8, k=5).select(
        "query_id", "neighbor_id"
    )
    pr = X.tfidf_cosine_topk(docs, n_queries=8, k=5, champions=64).select(
        "query_id", "neighbor_id"
    )
    return _recall_table(ex, pr)
