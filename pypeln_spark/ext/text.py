"""Text analysis for training-data pipelines: tokenization, quality scoring,
language-ID heuristic, document fingerprinting.

All pure Catalyst (built-in string/array functions, zero Python UDFs) — at
100 TB these run inside whole-stage codegen at scan speed. Each operator is
a DataFrame→DataFrame function; oracle SQL twins live in queries/text.py.
"""

from __future__ import annotations

import typing as tp

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import spread
from .hashing import P31, h31

# tiny embedded stopword lists for the lang-id heuristic (public knowledge;
# real pipelines would plug fastText/CLD3 in via the same operator shape)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en"],
}


def tokenize(c: Column) -> Column:
    """Whitespace tokenization (array<string>). For BPE-ish splitting use
    ``tokenize_bpe_ish``."""
    return F.split(c, " ")


def tokenize_bpe_ish(c: Column) -> Column:
    """Regex word/punct segmentation approximating a BPE pre-tokenizer:
    letter runs, digit runs, and single non-space symbols."""
    return F.regexp_extract_all(c, F.lit(r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])"), 1)


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    toks = tokenize(F.col(text_col))
    return spread(df).select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / word-length / stopword / char-class ratios — the standard
    cheap quality filters (C4/Gopher-style) as one projection."""
    t = F.col(text_col)
    toks = tokenize(t)
    n_toks = F.size(toks).cast("double")
    n_chars = F.length(t).cast("double")
    en_stop = F.array([F.lit(s) for s in STOPWORDS["en"]])
    # distinct stopwords present: filter the (ordered) stopword list, not the
    # tokens — gives the same count as a set-intersect on every engine
    n_stop = F.size(F.filter(en_stop, lambda s: F.array_contains(toks, s))).cast("double")
    stop_hits = F.size(F.filter(toks, lambda x: F.array_contains(en_stop, x))).cast("double")
    return spread(df).select(
        id_col,
        F.length(t).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        (n_chars / n_toks).alias("avg_token_len"),
        (stop_hits / n_toks).alias("stopword_ratio"),
        (n_stop).cast("long").alias("n_distinct_stopwords"),
        (
            F.length(F.regexp_replace(t, r"[a-zA-Z0-9 ]", "")).cast("double") / n_chars
        ).alias("punct_ratio"),
        (
            F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double") / n_chars
        ).alias("digit_ratio"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals, one narrow projection per doc:

    - ``dup_token_frac``   = 1 − |distinct tokens| / |tokens|
    - ``dup_2gram_frac``   = 1 − |distinct 2-grams| / |2-grams|
    - ``dup_3gram_frac``   = 1 − |distinct 3-grams| / |3-grams|

    High values flag boilerplate/spam (repeated lines, keyword stuffing) —
    the standard cheap repetition filters from the Gopher/MassiveText
    quality pipeline. All via array HOFs on the token array (no explode,
    no shuffle — O(doc length) per row, codegen-speed at any scale);
    n-grams join tokens with a space, fractions are NULL-free doubles
    (single-token docs have zero n-grams → fraction 0.0)."""
    toks = tokenize(F.col(text_col))

    def ngrams(n: int) -> Column:
        # guard: sequence(0, -1) DESCENDS in Spark, it isn't empty — docs
        # shorter than n tokens must yield zero n-grams explicitly
        return F.when(
            F.size(toks) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
                ),
            )
        )

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(n <= 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / n.cast("double")
        )

    return spread(df).select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        dup_frac(toks).alias("dup_token_frac"),
        dup_frac(ngrams(2)).alias("dup_2gram_frac"),
        dup_frac(ngrams(3)).alias("dup_3gram_frac"),
    )


# conservative, RE2-and-Java-portable patterns so the oracle can replay
# them: real pipelines extend this table (SSNs, IP addresses, keys...)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b",
}


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style PII redaction as one narrow projection: each pattern is
    replaced with a typed token ('<EMAIL>', '<PHONE>'), and per-pattern
    match counts ride along so downstream filters can drop PII-heavy docs
    without rescanning. Patterns are deliberately in the RE2 ∩ Java-regex
    dialect so DuckDB replays them byte-for-byte — extend PII_PATTERNS for
    production (keeping portability if cross-engine auditing matters).
    Output: (id, scrubbed text, n_<kind> per pattern, n_pii total)."""
    t = F.col(text_col)
    out_cols = [F.col(id_col)]
    scrubbed = t
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long").alias(f"n_{kind}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    out_cols.append(scrubbed.alias(text_col))
    out_cols += counts
    out = spread(df).select(*out_cols)
    total = sum((F.col(f"n_{k}") for k in PII_PATTERNS), F.lit(0).cast("long"))
    return out.withColumn("n_pii", total.cast("long"))


def lang_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit ratio per language + argmax prediction (deterministic
    tiebreak: language list order en>de>fr>es, then 'und')."""
    toks = tokenize(F.col(text_col))
    n_toks = F.size(toks).cast("double")
    cols: tp.List[Column] = [F.col(id_col)]
    for lang, words in STOPWORDS.items():
        arr = F.array([F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).cast("double")
        cols.append((hits / n_toks).alias(f"score_{lang}"))
    out = spread(df).select(*cols)
    best = F.greatest(*[F.col(f"score_{l}") for l in STOPWORDS])
    pred = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("predicted_lang", pred)


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive document fingerprint: left fold of token hashes,
    acc = (acc*31 + h31(token)) mod P31. Reorderings change the value
    (unlike bag-of-shingles hashes) — the rolling-hash contract."""
    toks = tokenize(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + h31(x)) % F.lit(P31),
    )
    return spread(df).select(id_col, fp.alias("fingerprint"))


def _tf(toks: Column, term: str) -> Column:
    """Term frequency in a token array — factory (not an inline lambda) so
    each term binds its own literal; a default-arg lambda would change the
    HOF's visible arity and make Spark pass the element index into it."""
    return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("long")


def bm25_topk(
    df: DataFrame,
    terms: tp.Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 keyword search: top-k documents for a fixed bag of query terms.
    Output (id, tf_<term>..., score) ordered by (score DESC, id ASC).

    Determinism contract (what makes the oracle possible): tf/dl/df/N are
    exact integers; avgdl is ONE division of an integer sum; idf uses the
    log-free rational variant (N - df + 0.5)/(df + 0.5) — monotone in df
    like the Robertson idf but with no ln(), because libm is the one
    operation IEEE doesn't pin down across engines. Every remaining op is
    a correctly-rounded IEEE-754 multiply/divide/add evaluated in the same
    association on both engines, so scores are bit-identical.

    Scale shape: per-doc tf's are one codegen'd projection (no explode, no
    per-term shuffle); the corpus stats (N, sum dl, df per term) are a
    single global aggregate whose one-row result broadcasts back; top-k is
    TakeOrderedAndProject. At 100 TB: one scan + one scalar-sized exchange
    + one top-k — no inverted index needed until the query SET is large."""
    toks = tokenize(F.col(text_col))
    proj = spread(df).select(
        id_col,
        F.size(toks).cast("long").alias("_dl"),
        *[_tf(toks, t).alias(f"tf_{t}") for t in terms],
    )
    stats = proj.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"_df_{t}")
            for t in terms
        ],
    )
    joined = proj.join(F.broadcast(stats))
    avgdl = F.col("_sumdl").cast("double") / F.col("_n").cast("double")
    # length normalization shared by every term: k1 * ((1 - b) + b * dl/avgdl)
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("_dl").cast("double") / avgdl)
    )
    score = None
    for t in terms:
        tf = F.col(f"tf_{t}").cast("double")
        idf = (
            (F.col("_n") - F.col(f"_df_{t}")).cast("double") + F.lit(0.5)
        ) / (F.col(f"_df_{t}").cast("double") + F.lit(0.5))
        term_score = idf * ((tf * F.lit(k1 + 1.0)) / (tf + norm))
        score = term_score if score is None else score + term_score
    hit = None
    for t in terms:
        h = F.col(f"tf_{t}") > 0
        hit = h if hit is None else hit | h
    return (
        joined.withColumn("score", score)
        .filter(hit)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
        .select(id_col, *[f"tf_{t}" for t in terms], "score")
    )


def sql_bm25_topk(
    terms: tp.Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of bm25_topk over the `documents` view — arithmetic text
    kept in the same association as the Column tree above (Python's
    left-assoc `+` chain == the SQL `+` chain)."""
    from .sketch import _dlit

    toks = "string_split(text, ' ')"
    tf_cols = ", ".join(
        f"CAST(len(list_filter({toks}, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in terms
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in terms
    )
    norm = (
        f"({_dlit(k1)} * ({_dlit(1.0 - b)} + {_dlit(b)} * "
        f"(CAST(_dl AS DOUBLE) / (CAST(_sumdl AS DOUBLE) / CAST(_n AS DOUBLE)))))"
    )
    term_scores = [
        f"(((CAST(_n - df_{t} AS DOUBLE) + 0.5e0) / (CAST(df_{t} AS DOUBLE) + 0.5e0))"
        f" * ((CAST(tf_{t} AS DOUBLE) * {_dlit(k1 + 1.0)})"
        f" / (CAST(tf_{t} AS DOUBLE) + {norm})))"
        for t in terms
    ]
    score = term_scores[0]
    for ts in term_scores[1:]:
        score = f"({score} + {ts})"
    hit = " OR ".join(f"tf_{t} > 0" for t in terms)
    return f"""
    WITH _proj AS (
      SELECT doc_id, CAST(len({toks}) AS BIGINT) AS _dl, {tf_cols}
      FROM documents
    ),
    _stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS _n, CAST(SUM(_dl) AS BIGINT) AS _sumdl,
             {df_cols}
      FROM _proj
    )
    SELECT doc_id, {", ".join(f"tf_{t}" for t in terms)}, {score} AS score
    FROM _proj CROSS JOIN _stats
    WHERE {hit}
    ORDER BY score DESC, doc_id ASC
    LIMIT {k}
    """


def bm25_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tp.Tuple[DataFrame, DataFrame]:
    """Build the BM25 INDEX frames for a document set: the postings table
    (doc_id, term, tf, dl — document length denormalized onto every
    posting so serving never joins a doclen side) and the skinny doclen
    table (doc_id, dl — the corpus-statistics source: N and sum dl).
    One explode + one groupBy per build; on the live-serving gate these
    build per-EPOCH over the absorbed novel set only (∝ |batch|), never
    over the corpus."""
    toks = tokenize(F.col(text_col))
    base = spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        toks.alias("_toks"),
    )
    doclen = base.select("doc_id", "dl")
    postings = (
        base.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .select("doc_id", "term", "tf", "dl")
    )
    return postings, doclen


def bm25_serve(
    postings: DataFrame,
    doclen: DataFrame,
    qterms: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    scale: int = 12,
) -> DataFrame:
    """Serve BM25 top-k for a BATCH OF QUERIES against a maintained
    postings index — the inverted-index formulation of bm25_topk (which
    pivots a fixed term set into columns; this one takes ``qterms`` as
    (query_id, term) rows, so the query set is data, which is what a
    live serving tier receives).

    Corpus statistics (N, sum dl, per-term df) are computed from the
    CURRENT index frames at call time — on the live gate this is the
    per-epoch IDF/avgdl SNAPSHOT, the lexical staleness dial (the
    analogue of the vector gate's centroid geometry; see
    streaming_bm25_topk_serving_live). Determinism matches bm25_topk:
    integer tf/dl/df/N, one-division avgdl, log-free rational idf,
    identically-associated IEEE per-term scores; the per-doc score SUM is
    order-nondeterministic under Spark's aggregation, so it goes through
    the decimal-cast convention (dsum, default scale 12) — bit-stable on
    both engines.

    Scale shape: the postings side NEVER moves — both the per-term df
    aggregate and the scoring join stream the postings against BROADCAST
    query frames (qterms is query-batch-sized, df is |distinct terms|
    rows, the stats frame is one row), then only the MATCHED postings
    (∝ query terms' document frequency) shuffle into the per-(query, doc)
    sum and the per-query top-k window. Output: (query_id, doc_id,
    score, rank ≤ k), docs with at least one matching term."""
    from ..functions import dsum

    terms = qterms.select("term").distinct()
    stats = doclen.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("dl").cast("long").alias("_sumdl"),
    )
    dft = (
        postings.join(F.broadcast(terms), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
    )
    m = (
        postings.join(F.broadcast(qterms.select("query_id", "term")), "term")
        .join(F.broadcast(dft), "term")
        .join(F.broadcast(stats))
    )
    avgdl = F.col("_sumdl").cast("double") / F.col("_n").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    )
    idf = (
        (F.col("_n") - F.col("_df")).cast("double") + F.lit(0.5)
    ) / (F.col("_df").cast("double") + F.lit(0.5))
    tf = F.col("tf").cast("double")
    contrib = idf * ((tf * F.lit(k1 + 1.0)) / (tf + norm))
    scored = (
        m.withColumn("_c", contrib)
        .groupBy("query_id", "doc_id")
        .agg(dsum("_c", scale).alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def chunk_tokens(
    df: DataFrame,
    chunk_size: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-token-count chunks — the packing step
    before sequence-length-bounded training. Output one row per chunk:
    (id, chunk_id, chunk_text, n_chunk_tokens). Pure posexplode of a
    per-doc slice array: narrow, no shuffle, rows ∝ total tokens /
    chunk_size. The chunk index extends the hierarchical-order convention
    (posexplode pos = the appended index component, SURVEY §2.1 flat_map)."""
    # materialize the token array before the chunk transform references it
    # (r13 optimization round, same fix as dedup.cdc_chunk_dedup: the
    # inlined form re-tokenized the document once per chunk — Catalyst
    # does not CSE into lambda bodies)
    toks = tokenize(F.col(text_col))
    base = spread(df).select(id_col, toks.alias("_toks"))
    tcol = F.col("_toks")
    n_chunks = F.ceil(F.size(tcol) / F.lit(chunk_size)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.array_join(F.slice(tcol, c * chunk_size + 1, chunk_size), " "),
    )
    return base.select(
        id_col, F.posexplode(chunks).alias("chunk_id", "chunk_text")
    ).withColumn(
        "n_chunk_tokens", F.size(tokenize(F.col("chunk_text"))).cast("long")
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic keyword-extraction /
    document-representation step. Output (id, term, tf, df, score, rank).

    Determinism contract: tf and df are exact integers; idf is the log-free
    rational (N+1)/(df+1) (same reasoning as bm25_topk — ln() is the one
    op IEEE doesn't pin across engines); score = tf × idf is one IEEE
    multiply of one IEEE division, associated identically in the oracle.
    Rank ties break on term ASC, so boundaries agree.

    Scale shape: explode → (doc, term) partial-aggregated count (shuffle ∝
    distinct doc-term pairs, combiner collapses repeats map-side); df via
    ONE window over term (high-cardinality key → even partitions — a
    groupBy+join would be a second shuffle of the same frame); N broadcasts
    as a one-row aggregate; top-k per doc is one window over doc_id. Three
    data shuffles total, none carrying text longer than a term."""
    from pyspark.sql import Window

    dt = (
        spread(df)
        .select(id_col, F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    wt = Window.partitionBy("term")
    wd = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    scored = (
        dt.withColumn("df", F.count(F.lit(1)).over(wt))
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (
                (F.col("_n").cast("double") + F.lit(1.0))
                / (F.col("df").cast("double") + F.lit(1.0))
            ),
        )
    )
    return (
        scored.withColumn("rank", F.row_number().over(wd).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def sql_tfidf_top_terms(k: int = 3) -> str:
    """DuckDB twin of tfidf_top_terms over the `documents` view — identical
    integer counts, identical float association."""
    return f"""
    WITH dt AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY doc_id, term
    ),
    n AS (SELECT COUNT(*) AS _n FROM documents),
    scored AS (
      SELECT doc_id, term, tf,
             COUNT(*) OVER (PARTITION BY term) AS df,
             CAST(tf AS DOUBLE) *
               ((CAST(_n AS DOUBLE) + 1.0) /
                (CAST(COUNT(*) OVER (PARTITION BY term) AS DOUBLE) + 1.0)) AS score
      FROM dt CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score, rank FROM (
      SELECT doc_id, term, tf, df, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term ASC) AS INT) AS rank
      FROM scored)
    WHERE rank <= {k}
    """


def tfidf_cosine_topk(
    df: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    champions: tp.Optional[int] = None,
) -> DataFrame:
    """SPARSE similarity search: top-k most similar documents per query
    document by TF-IDF cosine, via an INVERTED-INDEX equi-join on term —
    the lexical complement of the dense ANN arms (ext/similarity.py). A
    dense retriever must bucket/quantize to avoid the all-pairs scan; the
    sparse one gets scale for free, because "shares at least one term" IS
    an equi-join, and pairs with zero shared terms (cosine 0) never
    materialize. Output (query_id, neighbor_id, cos, rank), queries =
    the docs with ``id_col < n_queries`` — under the repo's testdata
    convention (dense 0-based doc ids) these are the n_queries smallest
    ids; with SPARSE or OFFSET ids the query set is whatever ids fall
    below the literal threshold (possibly empty). Pre-rank ids (a
    row_number over id_col) before calling if "the n smallest ids" is
    the contract you need.

    Determinism contract: tf/df/N are exact integers; idf is the log-free
    rational (N+1)/(df+1) (the tfidf_top_terms convention); each weight is
    ONE multiply of ONE division; the per-pair dot product and the per-doc
    norms are folded IN TERM ORDER (array_sort → left fold), never a
    float groupBy sum — so cosines replay bit-identically in SQL.

    Scale shape: weights = one explode + (doc, term) partial-agg count +
    ONE window over term for df (high-cardinality key, even partitions);
    per-doc norms partial-aggregate on doc. The query side is a filter of
    the SAME weights frame — tiny (n_queries docs) — and BROADCASTS into
    the term join, so the corpus side never shuffles for the join; the
    per-pair fold then shuffles only (query, neighbor, term-products) for
    pairs that actually share terms. Nothing is quadratic in the corpus:
    candidate count ∝ posting-list collisions, exactly like the LSH band
    join.

    ``champions`` (None = exact) enables CHAMPION-LIST pruning — the
    production fix for the one remaining hot spot: stop-word-grade terms
    whose posting lists approach the corpus size make the candidate join
    ∝ n_queries × |corpus| again. With champions=N, CANDIDATE GENERATION
    runs on each term's N highest-weight postings only (w desc, id asc
    tiebreak — the classic champion list / impact-ordered index prefix),
    capping candidates per query term at N regardless of df; the
    surviving shortlist is then scored EXACTLY (full postings, full
    norms) — the same shortlist-then-exact-rerank shape as the PQ-ADC
    arm. Index-only scoring (folding just the pruned postings) would
    underestimate surviving pairs' cosines and mis-rank them; measured on
    the sf0.01 corpus it costs ~4× the recall of rerank at equal N. Cost
    shape: ONE more row_number window over the SAME term partitioning the
    df window already established, plus broadcast semi-joins of the tiny
    candidate set. The weights frame (the inverted index, which feeds
    candidate generation, the corpus side, the query side and both
    norms) materializes ONCE via the invocation cache pool in BOTH arms
    (r13 — exact previously recomputed it per consumer, ~2× wall) — in
    production weights and champion lists are precomputed index TABLES,
    so this is the in-query stand-in. Net plan: pruning adds AT MOST the
    champion window's exchange over the cached index; every other join it
    introduces is a broadcast semi-join (tests/test_plans.py asserts it).
    Its at-scale win is unchanged: candidate generation over N postings
    per term instead of df-sized posting lists.
    Recall@k vs the exact arm is measured by the
    search_tfidf_pruned_recall_eval registry entry, the same
    quality-measurement contract as the ANN recall trilogy."""
    from pyspark.sql import Window

    dt = (
        spread(df)
        .select(id_col, F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    wt = Window.partitionBy("term")
    weights = (
        dt.withColumn("df", F.count(F.lit(1)).over(wt))
        .join(F.broadcast(n_docs))
        .withColumn(
            "w",
            F.col("tf").cast("double")
            * (
                (F.col("_n").cast("double") + F.lit(1.0))
                / (F.col("df").cast("double") + F.lit(1.0))
            ),
        )
        .select(id_col, "term", "w")
    )

    def _norms(wf: DataFrame, out_id: str, out_nrm: str) -> DataFrame:
        folded = wf.groupBy(id_col).agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("term"), (F.col("w") * F.col("w")).alias("w2"))
                        )
                    ),
                    lambda s: s["w2"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_ss")
        )
        return folded.select(
            F.col(id_col).alias(out_id), F.sqrt(F.col("_ss")).alias(out_nrm)
        )

    # the weights frame feeds the corpus side, the query side, both norms
    # and (pruned mode) candidate generation — persist it once (the
    # invocation-scoped pool, ext/dedup discipline) so EVERY plan reads
    # ONE materialized inverted index instead of recomputing the
    # tokenize→count→df subtree per consumer. Originally pruned-mode only;
    # the r13 interleaved A/B showed the exact arm pays the recompute 4×
    # (8 document scans / 4 tokenize-explodes in the plan, ~2× wall at
    # sf0.1 — AQE exchange reuse does NOT cover it because the consumers
    # filter/rename below different exchanges). In production the
    # weights/champion tables are precomputed index artifacts; the cache
    # is the in-query stand-in.
    # COMPOSITION-SAFE: deliberately no retire_pipeline_caches() here
    # (unlike the pipeline entry points in ext/dedup). An early draft
    # retired on entry, which made the operator a pipeline boundary —
    # a caller composing it after its own pool_persist frames (the
    # documented minhash_lsh_dedup hazard) silently lost those caches
    # (ADVICE r7 low #4). The eager count bounds this operator's pool
    # contribution to exactly one frame; the ENCLOSING pipeline's next
    # entry point owns retirement, as everywhere else.
    from .dedup import pool_persist

    weights = pool_persist(weights)
    weights.count()
    q = weights.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), "term", F.col("w").alias("wq")
    )
    corpus = weights.withColumnRenamed(id_col, "neighbor_id")
    cand = None
    if champions is not None:
        wc = Window.partitionBy("term").orderBy(F.desc("w"), F.asc(id_col))
        champs = (
            weights.withColumn("crank", F.row_number().over(wc))
            .filter(F.col("crank") <= champions)
            .select(F.col(id_col).alias("neighbor_id"), "term")
        )
        # shortlist pairs: duplicates (several shared champion terms) are
        # harmless — cand only ever feeds broadcast semi-joins, so no
        # distinct (a distinct here would be the one new shuffle)
        cand = (
            champs.join(F.broadcast(q.select("query_id", "term")), "term")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id")
        )
        corpus = corpus.join(
            F.broadcast(cand.select("neighbor_id")), "neighbor_id", "left_semi"
        )
    pairs_src = (
        corpus.join(F.broadcast(q), "term")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    if cand is not None:
        pairs_src = pairs_src.join(
            F.broadcast(cand), ["query_id", "neighbor_id"], "left_semi"
        )
    pairs = (
        pairs_src
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("term"),
                                (F.col("wq") * F.col("w")).alias("p"),
                            )
                        )
                    ),
                    lambda s: s["p"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_num")
        )
    )
    cn = _norms(weights, "neighbor_id", "_cn")
    qn = _norms(weights.filter(F.col(id_col) < n_queries), "query_id", "_qn")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.join(cn, "neighbor_id")
        .join(F.broadcast(qn), "query_id")
        .withColumn("cos", F.col("_num") / (F.col("_qn") * F.col("_cn")))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def sql_tfidf_cosine_topk(n_queries: int = 8, k: int = 5) -> str:
    """DuckDB twin of tfidf_cosine_topk over the `documents` view —
    identical integer counts, identical weight arithmetic, identical
    term-ordered folds (list(... ORDER BY term) → list_reduce left fold
    == array_sort → F.aggregate)."""
    fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list({expr} ORDER BY {ord})), (acc, x) -> acc + x)"
    )
    return f"""
    WITH dt AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY doc_id, term
    ),
    n AS (SELECT COUNT(*) AS _n FROM documents),
    weights AS (
      SELECT doc_id, term,
             CAST(tf AS DOUBLE) *
               ((CAST(_n AS DOUBLE) + 1.0) /
                (CAST(COUNT(*) OVER (PARTITION BY term) AS DOUBLE) + 1.0)) AS w
      FROM dt CROSS JOIN n
    ),
    norms AS (
      SELECT doc_id, sqrt({fold.format(expr='w * w', ord='term')}) AS nrm
      FROM weights GROUP BY doc_id
    ),
    pairs AS (
      SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
             {fold.format(expr='q.w * c.w', ord='q.term')} AS num
      FROM weights q JOIN weights c ON c.term = q.term
      WHERE q.doc_id < {n_queries} AND c.doc_id <> q.doc_id
      GROUP BY q.doc_id, c.doc_id
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT p.query_id, p.neighbor_id,
             p.num / (qn.nrm * cn.nrm) AS cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY p.query_id
                    ORDER BY p.num / (qn.nrm * cn.nrm) DESC,
                             p.neighbor_id ASC) AS INT) AS rank
      FROM pairs p
      JOIN norms qn ON qn.doc_id = p.query_id
      JOIN norms cn ON cn.doc_id = p.neighbor_id)
    WHERE rank <= {k}
    """


def sql_tfidf_pruned_recall_eval(
    n_queries: int = 8, k: int = 5, champions: int = 64
) -> str:
    """DuckDB twin of the champion-list recall eval: replays the EXACT
    retriever, the PRUNED retriever (champion-list candidate generation
    by the identical w-desc/id-asc truncation rule, then exact scoring of
    the shortlist), and the per-query recall arithmetic — so the measured
    recall numbers themselves are value-checked, the same contract as the
    ANN recall-eval trilogy."""
    fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list({expr} ORDER BY {ord})), (acc, x) -> acc + x)"
    )
    topk = """
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, p.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.query_id
                      ORDER BY p.num / (qn.nrm * cn.nrm) DESC,
                               p.neighbor_id ASC) AS rank
        FROM {pairs} p
        JOIN norms qn ON qn.doc_id = p.query_id
        JOIN norms cn ON cn.doc_id = p.neighbor_id)
      WHERE rank <= {k}
    """
    return f"""
    WITH dt AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY doc_id, term
    ),
    n AS (SELECT COUNT(*) AS _n FROM documents),
    weights AS (
      SELECT doc_id, term,
             CAST(tf AS DOUBLE) *
               ((CAST(_n AS DOUBLE) + 1.0) /
                (CAST(COUNT(*) OVER (PARTITION BY term) AS DOUBLE) + 1.0)) AS w
      FROM dt CROSS JOIN n
    ),
    champs AS (
      SELECT doc_id, term FROM (
        SELECT doc_id, term,
               ROW_NUMBER() OVER (PARTITION BY term
                      ORDER BY w DESC, doc_id ASC) AS crank
        FROM weights)
      WHERE crank <= {champions}
    ),
    cand AS (
      SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS neighbor_id
      FROM weights q JOIN champs c ON c.term = q.term
      WHERE q.doc_id < {n_queries} AND c.doc_id <> q.doc_id
    ),
    norms AS (
      SELECT doc_id, sqrt({fold.format(expr='w * w', ord='term')}) AS nrm
      FROM weights GROUP BY doc_id
    ),
    pairs_ex AS (
      SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
             {fold.format(expr='q.w * c.w', ord='q.term')} AS num
      FROM weights q JOIN weights c ON c.term = q.term
      WHERE q.doc_id < {n_queries} AND c.doc_id <> q.doc_id
      GROUP BY q.doc_id, c.doc_id
    ),
    pairs_pr AS (
      SELECT p.* FROM pairs_ex p
      SEMI JOIN cand x
        ON x.query_id = p.query_id AND x.neighbor_id = p.neighbor_id
    ),
    ex_top AS ({topk.format(pairs='pairs_ex', k=k)}),
    pr_top AS ({topk.format(pairs='pairs_pr', k=k)}),
    hits AS (
      SELECT x.query_id, COUNT(*) AS n_hits
      FROM ex_top x JOIN pr_top p
        ON p.query_id = x.query_id AND p.neighbor_id = x.neighbor_id
      GROUP BY x.query_id
    ),
    base AS (SELECT query_id, COUNT(*) AS n_exact FROM ex_top GROUP BY query_id)
    SELECT b.query_id, b.n_exact,
           COALESCE(h.n_hits, 0) AS n_hits,
           CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(b.n_exact AS DOUBLE)
             AS recall
    FROM base b LEFT JOIN hits h ON h.query_id = b.query_id
    """


def deletion_keys(c: Column) -> Column:
    """FastSS deletion neighborhood: the string itself plus every
    single-character deletion (distinct). Two strings within Levenshtein
    distance 1 ALWAYS share at least one key (equal; substitution → both
    drop the differing position; insert/delete → the shorter string IS a
    deletion of the longer), so blocking on these keys is recall-LOSSLESS
    for distance ≤ 1 — unlike LSH-style blocking there is nothing
    probabilistic to lose. Keys per string = length+1: the explode is ∝
    total characters, never quadratic."""
    s = c
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.length(s)),
            lambda i: F.when(i == 0, s).otherwise(
                F.concat(
                    F.substring(s, F.lit(1), i - 1),
                    F.substring(s, i + 1, F.length(s)),
                )
            ),
        )
    )


def fuzzy_join_lev1(
    df: DataFrame, name_col: str, id_col: str
) -> DataFrame:
    """Exact fuzzy self-join: all pairs with Levenshtein distance ≤ 1,
    found via deletion-key blocking + levenshtein verify — no O(n²) pass.
    Output (id_a, id_b, name_a, name_b, distance), id_a < id_b.

    Scale: ONE explode (len+1 keyed rows per string), one self-equi-join
    on the key (shuffle ∝ total characters), distinct, then the integer
    levenshtein verify on candidates only. Same candidates-then-verify
    architecture as MinHash-LSH, but with a lossless blocking scheme —
    the pattern for entity-resolution joins at corpus scale."""
    keyed = spread(df).select(
        F.col(id_col), F.col(name_col).alias("_nm"),
        F.explode(deletion_keys(F.col(name_col))).alias("_k"),
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"), F.col("_nm").alias("name_a"), "_k"
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), F.col("_nm").alias("name_b"), "_k"
    )
    return (
        a.join(b, "_k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
        .withColumn(
            "distance", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("int")
        )
        .filter(F.col("distance") <= 1)
    )


def unigram_lm_score(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained unigram language-model quality score — the
    deterministic stand-in for CCNet/KenLM perplexity filtering (train an
    LM on the corpus, keep documents whose tokens the model finds likely).
    Output (id, n_tokens, in_vocab, sum_counts, lm_score, oov_frac).

    The model IS the corpus term-frequency table truncated to the
    ``vocab_size`` most frequent terms (ties break term ASC, so the vocab
    boundary is engine-independent). A document's score is the MEAN UNIGRAM
    PROBABILITY of its tokens, kept log-free for cross-engine determinism
    (same reasoning as bm25_topk — ln() is the op IEEE doesn't pin):

        lm_score = Σ_i count(tok_i) / (n_tokens × N_total)

    Every term is an exact BIGINT until the single final IEEE division, so
    DuckDB replays it bit-identically. OOV tokens contribute 0 to the
    numerator; ``oov_frac`` is their exact share — the standard companion
    gate (high OOV = boilerplate/code/garbled text).

    Scale shape: training = one explode + term-count groupBy (map-side
    combine; shuffle ∝ distinct terms), vocab = TakeOrdered K, shipped
    BROADCAST (a 10⁵-term vocab is KBs regardless of corpus size — this is
    why unigram filtering runs at 100 TB where a neural scorer can't);
    scoring = re-explode + broadcast-hash join + per-doc partial aggregate
    (explode preserves doc locality, so combiners collapse to one row per
    doc before the shuffle — shuffle ∝ docs, never ∝ tokens). The corpus
    text is scanned twice (train + score), the classic two-pass LM shape.
    """
    toks = spread(df).select(id_col, F.explode(tokenize(F.col(text_col))).alias("_t"))
    counts = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    vocab = (
        counts.orderBy(F.col("_c").desc(), F.col("_t").asc()).limit(vocab_size)
    )
    total = counts.agg(F.sum("_c").alias("_n_total"))
    scored = (
        toks.join(F.broadcast(vocab), "_t", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count("_c").alias("in_vocab"),
            F.coalesce(F.sum("_c"), F.lit(0)).alias("sum_counts"),
        )
        .join(F.broadcast(total))
    )
    return scored.select(
        id_col,
        "n_tokens",
        "in_vocab",
        "sum_counts",
        (
            F.col("sum_counts").cast("double")
            / (F.col("n_tokens") * F.col("_n_total")).cast("double")
        ).alias("lm_score"),
        (
            (F.col("n_tokens") - F.col("in_vocab")).cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("oov_frac"),
    )


def sql_unigram_lm_score(vocab_size: int = 1000) -> str:
    """DuckDB twin of unigram_lm_score over the `documents` view — identical
    integer counts and vocab boundary, identical single final division."""
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    counts AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t),
    vocab AS (SELECT t, c FROM counts ORDER BY c DESC, t ASC LIMIT {vocab_size}),
    total AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM counts),
    scored AS (
      SELECT toks.doc_id,
             COUNT(*) AS n_tokens,
             COUNT(vocab.c) AS in_vocab,
             CAST(COALESCE(SUM(vocab.c), 0) AS BIGINT) AS sum_counts
      FROM toks LEFT JOIN vocab ON toks.t = vocab.t
      GROUP BY toks.doc_id
    )
    SELECT doc_id, n_tokens, in_vocab, sum_counts,
           CAST(sum_counts AS DOUBLE) / CAST(n_tokens * n_total AS DOUBLE)
             AS lm_score,
           CAST(n_tokens - in_vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             AS oov_frac
    FROM scored CROSS JOIN total
    """


def rrf_fuse(
    rankings: tp.Sequence[DataFrame],
    id_col: str = "doc_id",
    k_rrf: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    (sparse BM25 arm + dense ANN arm, or any N rankings):
    score(d) = Σ_i 1/(k + rank_i(d)) over the arms that retrieved d.

    Each input must carry (id_col, rank). Scores use only small-integer
    rank arithmetic — one correctly-rounded IEEE division per arm, summed
    in ARM ORDER (fixed association) — so fused scores and the final
    ordering replay bit-identically in SQL; no training, no tuning, which
    is exactly why RRF is the production default for fusing
    incomparably-scaled retriever scores. Candidate volume is Σ top-k of
    the arms (outer join on id), so fusion cost is independent of corpus
    size. Output: (id, rank_arm<i>..., rrf_score), top-k by score."""
    fused = None
    for i, r in enumerate(rankings):
        arm = r.select(F.col(id_col), F.col("rank").alias(f"rank_arm{i}"))
        fused = arm if fused is None else fused.join(arm, id_col, "outer")
    score = None
    for i in range(len(rankings)):
        s = F.when(
            F.col(f"rank_arm{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(f"rank_arm{i}").cast("double")),
        ).otherwise(F.lit(0.0))
        score = s if score is None else score + s
    return (
        fused.withColumn("rrf_score", score)
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(topk)
    )
