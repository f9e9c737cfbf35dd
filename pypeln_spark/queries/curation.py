"""Capstone: a composed training-data curation pipeline — the workload this
engine exists for. Chains quality scoring → thresholds → exact-dedup
keep-list → per-survivor stats, all as one lazy plan (one scan of documents
feeding two branches, hash-join reconciled). The oracle replays the full
chain in SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pypeln_spark.ext import curation as C, dedup as D, text as X
from pypeln_spark.ext.hashing import sql_h31

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


SAMPLE_RATE = 0.25
SAMPLE_DENOM = 10000
_SAMPLE_KEY = sql_h31("concat('sample:', CAST(doc_id AS VARCHAR))")


@register(
    "curation_sample_by_hash",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE {_SAMPLE_KEY} % {SAMPLE_DENOM} < {int(SAMPLE_RATE * SAMPLE_DENOM)}
    """,
)
def curation_sample_by_hash(spark, sf_dir):
    """Deterministic hash-Bernoulli sampling: reproducible across engines
    and runs (df.sample is partition-layout-dependent), pure pushdown-able
    filter, and disjoint rate windows split train/val/test in one pass."""
    (docs,) = tables(spark, sf_dir, "documents")
    return C.sample_by_hash(docs, rate=SAMPLE_RATE, denom=SAMPLE_DENOM).select(
        "doc_id", "lang", "source", "n_chars"
    )


STRAT_N = 20


@register(
    "curation_stratified_topn",
    oracle=f"""
    SELECT doc_id, lang, n_chars, CAST(rk AS INT) AS rk FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents)
    WHERE rk <= {STRAT_N}
    """,
)
def curation_stratified_topn(spark, sf_dir):
    """Per-language quota sampling: the N longest docs per stratum under a
    total (deterministic) order. One shuffle on the strata key."""
    (docs,) = tables(spark, sf_dir, "documents")
    return C.stratified_topn(
        docs.select("doc_id", "lang", "n_chars"),
        strata=["lang"],
        order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()],
        n=STRAT_N,
    )


DECON_N = 8
_DTOKS = "string_split(text, ' ')"
_DGRAM = sql_h31(
    f"array_to_string(list_slice({_DTOKS}, CAST(i AS INT), CAST(i + {DECON_N - 1} AS INT)), ' ')"
)
_DGRAMS = (
    f"list_distinct(list_transform("
    f"range(1, greatest(len({_DTOKS}) - {DECON_N - 1}, 1) + 1), i -> {_DGRAM}))"
)


@register(
    "curation_decontaminated",
    oracle=f"""
    WITH bg AS (
      SELECT DISTINCT unnest({_DGRAMS}) AS g FROM documents WHERE doc_id % 97 = 0
    ),
    tg AS (SELECT doc_id, unnest({_DGRAMS}) AS g FROM documents),
    cont AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (g))
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d LEFT JOIN cont c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL
    """,
)
def curation_decontaminated(spark, sf_dir):
    """Benchmark decontamination: drop every training doc sharing any word
    8-gram with the eval set (here the deterministic doc_id%97 slice — a
    stand-in for a real benchmark table). The gram join ships hashes only;
    the eval gram set broadcasts; text never shuffles."""
    (docs,) = tables(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return C.decontaminate(docs, bench, n=DECON_N).select(
        "doc_id", "lang", "source", "n_chars"
    )


CHUNK = 64
_CTOKS = "string_split(text, ' ')"


@register(
    "curation_chunk_tokens",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id, {_CTOKS} AS toks,
             unnest(range(0, CAST(ceil(len({_CTOKS}) / {CHUNK}.0) AS BIGINT))) AS c
      FROM documents
    )
    SELECT doc_id, CAST(c AS INT) AS chunk_id,
           array_to_string(list_slice(toks, CAST(c * {CHUNK} + 1 AS INT),
                                      CAST(c * {CHUNK} + {CHUNK} AS INT)), ' ') AS chunk_text,
           CAST(len(string_split(array_to_string(list_slice(toks, CAST(c * {CHUNK} + 1 AS INT),
                                      CAST(c * {CHUNK} + {CHUNK} AS INT)), ' '), ' ')) AS BIGINT)
             AS n_chunk_tokens
    FROM ex
    """,
)
def curation_chunk_tokens(spark, sf_dir):
    """Fixed-token-count chunk packing (sequence-length prep): posexplode of
    per-doc slice arrays — narrow, chunk index continues the hierarchical
    _index convention (SURVEY §2.1 flat_map)."""
    (docs,) = tables(spark, sf_dir, "documents")
    return X.chunk_tokens(docs, chunk_size=CHUNK)


_SPLIT_KEY = sql_h31("concat('split:', CAST(doc_id AS VARCHAR))")
VAL_FRAC, TEST_FRAC = 0.1, 0.05
_SPLIT_DENOM = 10000


@register(
    "curation_train_val_split",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, lang, n_chars,
             CASE WHEN ({_SPLIT_KEY}) % {_SPLIT_DENOM} < {int(VAL_FRAC * _SPLIT_DENOM)}
                    THEN 'val'
                  WHEN ({_SPLIT_KEY}) % {_SPLIT_DENOM}
                       < {int(VAL_FRAC * _SPLIT_DENOM) + int(TEST_FRAC * _SPLIT_DENOM)}
                    THEN 'test'
                  ELSE 'train' END AS split
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM assigned GROUP BY split, lang
    """,
)
def curation_train_val_split(spark, sf_dir):
    """Deterministic hash-windowed train/val/test split (ext/curation.
    train_val_split): reproducible across engines/partitionings — unlike
    randomSplit — and stable under corpus growth (new docs never reshuffle
    old assignments). Verified via per-(split, lang) counts and char
    totals, which pin every document's assignment."""
    (docs,) = tables(spark, sf_dir, "documents")
    assigned = C.train_val_split(docs, val_frac=VAL_FRAC, test_frac=TEST_FRAC)
    return assigned.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
    )


_WSAMPLE_KEY = sql_h31("concat('wsample:', CAST(doc_id AS VARCHAR))")


@register(
    "curation_weighted_sample",
    oracle=f"""
    SELECT doc_id, source, n_chars FROM documents
    WHERE {_WSAMPLE_KEY} % 10000 < LEAST(n_chars, 400) * 25
    """,
)
def curation_weighted_sample(spark, sf_dir):
    """Quality-weighted deterministic sampling (ext/curation.weighted_sample):
    keep probability scales with document length, capped at 1.0
    (least(n_chars,400)*25 out of 10000) — all integer arithmetic, so both
    engines agree on every row. A pure filter: pushes to the scan, no RNG,
    no partition-layout dependence, same doc kept on every run."""
    (docs,) = tables(spark, sf_dir, "documents")
    w = F.least(F.col("n_chars"), F.lit(400)) * F.lit(25)
    return C.weighted_sample(docs, w).select("doc_id", "source", "n_chars")


@register("curation_shard_manifest", oracle=C.sql_shard_manifest("doc_id", 32, 256))
def curation_shard_manifest(spark, sf_dir):
    """Deterministic training-shard manifest (ext/curation.shard_manifest):
    every document gets a stable (shard, position) under a pseudo-random
    but reproducible order. Spark runs the scalable two-level enumeration
    (fine-grained (shard, bucket) windows + broadcast prefix offsets); the
    oracle replays the equivalent one-window-per-shard spelling — identical
    output, which is the test that the scalable path IS the semantics."""
    (docs,) = tables(spark, sf_dir, "documents")
    return C.shard_manifest(docs, "doc_id", n_shards=32, n_buckets=256)


_PACK_TOKENS = "CAST(len(string_split(text, ' ')) AS BIGINT)"


@register(
    "curation_pack_sequences",
    oracle=f"""
    WITH _m AS ({C.sql_shard_manifest("doc_id", 32, 256)}),
    _t AS (
      SELECT _m.doc_id, _m.shard, _m.pos, {_PACK_TOKENS} AS n_tokens
      FROM _m JOIN documents USING (doc_id)
    )
    SELECT doc_id, shard, pos, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS cum_before,
           CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT)
             AS seq_id
    FROM _t
    """,
)
def curation_pack_sequences(spark, sf_dir):
    """Greedy fixed-budget sequence packing (ext/curation.pack_sequences)
    over the shard manifest: documents fill 512-token training sequences in
    manifest order, seq_id = floor(tokens-before / 512). Integer-only
    running sums — the deterministic batch-construction step after
    sharding."""
    (docs,) = tables(spark, sf_dir, "documents")
    m = C.shard_manifest(docs, "doc_id", n_shards=32, n_buckets=256)
    toks = m.join(
        docs.select(
            "doc_id",
            F.size(X.tokenize(F.col("text"))).cast("long").alias("n_tokens"),
        ),
        "doc_id",
    )
    return C.pack_sequences(toks, "n_tokens", budget=512).select(
        "doc_id", "shard", "pos", "n_tokens", "cum_before", "seq_id"
    )


@register(
    "curation_source_mix",
    oracle="""
    WITH per AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM per)
    SELECT source, lang, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS token_share
    FROM per CROSS JOIN tot
    """,
)
def curation_source_mix(spark, sf_dir):
    """Corpus-composition report: per (source, lang) document and token
    counts plus each cell's share of all tokens — the mixture table every
    pretraining data recipe starts from (and the denominator for sampling
    weights). Scale: one scan computing token counts in the projection,
    one partial-aggregated groupBy on a tiny key space, and a one-row
    total broadcast back — no shuffle carries text."""
    (docs,) = tables(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " ")).cast("long")
    per = (
        docs.select("source", "lang", toks.alias("_t"))
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("_t").alias("n_tokens"))
    )
    tot = per.agg(F.sum("n_tokens").alias("total_tokens"))
    return per.join(F.broadcast(tot)).select(
        "source", "lang", "n_docs", "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("total_tokens").cast("double")).alias(
            "token_share"
        ),
    )


@register(
    "curation_token_budget",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_tokens) AS total_tokens FROM per),
    cum AS (
      SELECT source, n_tokens,
             CAST(SUM(n_tokens) OVER (
               ORDER BY n_tokens DESC, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM per
    )
    SELECT c.source, c.n_tokens, c.cum_tokens,
           c.cum_tokens * 2 <= t.total_tokens AS in_budget
    FROM cum c CROSS JOIN tot t
    """,
)
def curation_token_budget(spark, sf_dir):
    """Token-budget planning for a data mix: per-source token totals taken
    greedily largest-first against a budget of HALF the corpus — the
    prefix-selection every pretraining recipe computes when deciding which
    sources fit a token target (the flag is integer-exact: 2·cum ≤ total,
    no float share). Scale: a partial-aggregated groupBy on the tiny
    source key space, one single-partition window over #sources rows
    (fine — the frame IS #sources), and a one-row total broadcast back;
    no shuffle carries text."""
    from pyspark.sql import Window

    (docs,) = tables(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " ")).cast("long")
    per = (
        docs.select("source", toks.alias("_t"))
        .groupBy("source")
        .agg(F.sum("_t").alias("n_tokens"))
    )
    # unpartitioned by design: `per` is post-aggregation, one row per
    # distinct source (a handful of corpus labels, not corpus-sized), so
    # the single-task cumulative sum is over a tiny frame
    w = (
        Window.orderBy(F.col("n_tokens").desc(), F.col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = per.agg(F.sum("n_tokens").alias("total_tokens"))
    return (
        per.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(F.broadcast(tot))
        .select(
            "source", "n_tokens", "cum_tokens",
            (F.col("cum_tokens") * 2 <= F.col("total_tokens")).alias("in_budget"),
        )
    )


# ---------------------------------------------------------------------------
# End-to-end pretraining curation: quality -> exact dedup -> near dedup ->
# decontaminate -> shard -> pack. Every stage is a registry operator in its
# own right; this query chains them into the pipeline a user would actually
# run, and the oracle replays the WHOLE chain.
# ---------------------------------------------------------------------------

E2E_NEAR_T = 0.5
E2E_SHARDS = 8
E2E_BUCKETS = 64
E2E_BUDGET = 512


def _e2e_oracle(drop_rule: str = "pairwise") -> str:
    from pypeln_spark.ext.hashing import MINHASH_PARAMS, sql_shingles

    params = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_PARAMS[:32])
    )
    manifest = C.sql_shard_manifest(
        "doc_id", E2E_SHARDS, E2E_BUCKETS, table="clean"
    )
    if drop_rule == "pairwise":
        recursive = ""
        dropx = "dropx AS (SELECT DISTINCT id_b AS doc_id FROM verified)"
    else:  # cc: one survivor (min id) per connected component of verified pairs
        recursive = "RECURSIVE "
        dropx = """edgesx AS (
      SELECT id_a AS a, id_b AS b FROM verified
      UNION SELECT id_b, id_a FROM verified
    ),
    reach(a, b) AS (
      SELECT a, a FROM edgesx
      UNION
      SELECT r.a, e.b FROM reach r JOIN edgesx e ON r.b = e.a
    ),
    ccx AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
    dropx AS (SELECT doc_id FROM ccx WHERE doc_id <> cluster_id)"""
    return f"""
    WITH {recursive}scored AS (
      SELECT doc_id, text,
             CAST(len({TOKS}) AS BIGINT) AS n_tokens,
             CAST(len(list_filter({TOKS}, t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
               / CAST(len({TOKS}) AS DOUBLE) AS stopword_ratio
      FROM documents
    ),
    quality AS (
      SELECT doc_id, text, n_tokens FROM scored
      WHERE n_tokens >= {MIN_TOKENS} AND stopword_ratio >= {MIN_STOPWORD_RATIO}
    ),
    keepx AS (SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
    uniq AS (SELECT q.* FROM quality q JOIN keepx k ON q.doc_id = k.doc_id),
    sh AS (
      SELECT DISTINCT doc_id, {sql_h31('shingle')} AS sh
      FROM (SELECT doc_id, unnest({sql_shingles('text')}) AS shingle FROM uniq)
    ),
    params(j, a, b) AS (VALUES {params}),
    mh AS (
      SELECT doc_id, j, MIN((a * sh + b) % 2147483647) AS mh
      FROM sh CROSS JOIN params GROUP BY doc_id, j
    ),
    banded AS (
      SELECT doc_id, j // 4 AS band, list(mh ORDER BY j) AS sig
      FROM mh GROUP BY doc_id, j // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
      GROUP BY c.id_a, c.id_b
    ),
    verified AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE CAST(i.n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.n_inter AS DOUBLE)
            >= {E2E_NEAR_T}
    ),
    {dropx},
    survivors AS (
      SELECT u.* FROM uniq u LEFT JOIN dropx d ON u.doc_id = d.doc_id
      WHERE d.doc_id IS NULL
    ),
    bg AS (
      SELECT DISTINCT unnest({_DGRAMS}) AS g FROM documents WHERE doc_id % 97 = 0
    ),
    tg AS (SELECT doc_id, unnest({_DGRAMS}) AS g FROM survivors),
    cont AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (g)),
    clean AS (
      SELECT s.doc_id, s.n_tokens FROM survivors s
      LEFT JOIN cont c ON s.doc_id = c.doc_id WHERE c.doc_id IS NULL
    ),
    manifest AS ({manifest}),
    packed AS (
      SELECT m.doc_id, m.shard, m.pos, cl.n_tokens
      FROM manifest m JOIN clean cl ON cl.doc_id = m.doc_id
    )
    SELECT doc_id, shard, pos, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS cum_before,
           CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {E2E_BUDGET}
             AS BIGINT) AS seq_id
    FROM packed
    """


def _e2e_prefix(spark, sf_dir):
    """The twins' IDENTICAL prefix — quality thresholds → exact-dedup
    keep-list (``uniq``) and the verified MinHash-LSH near-dup ``pairs``
    — as session-cached artifacts (VERDICT r6 #7, the model-store
    pattern, keyed on (table, thresholds/params) exactly like the PQ
    codebooks): whichever capstone variant runs first builds and
    materializes both frames; the other reads them from the index cache
    instead of re-running the quality folds and the whole LSH pipeline
    (~5s of the pair's combined bench at sf0.1). Standalone correctness
    is preserved by construction — on a cold session either query builds
    the prefix itself. The pool_persists for the LSH intermediates
    (doc_sh, wide) live only inside the build closure; the cached
    ``uniq``/``pairs`` frames are NOT pool-enrolled, so the next
    pipeline's retire can't drop them."""
    from pypeln_spark.ext import similarity as S

    def build_uniq():
        (docs,) = tables(spark, sf_dir, "documents")
        scored = X.quality_scores(docs).select(
            "doc_id", "n_tokens", "stopword_ratio"
        )
        quality = (
            docs.join(scored, "doc_id")
            .filter(
                (F.col("n_tokens") >= MIN_TOKENS)
                & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
            )
            .select("doc_id", "text", "n_tokens")
        )
        keep = D.exact_dedup(quality).select(F.col("keep_id").alias("doc_id"))
        return quality.join(keep, "doc_id")

    uniq = S.cached_index(
        ("e2e_uniq", sf_dir, MIN_TOKENS, MIN_STOPWORD_RATIO), build_uniq
    )

    def build_pairs():
        doc_sh = D.pool_persist(
            D.shingle_arrays(D.spread(uniq), "text", "doc_id", 5)
        )
        doc_sh.count()
        wide = D.pool_persist(D.minhash_signatures_wide(doc_sh, "doc_id", 32))
        wide.count()
        cand = D.lsh_candidate_pairs(wide, "doc_id", 8, 4)
        return D.jaccard_pairs_from_candidates(cand, doc_sh, "doc_id", E2E_NEAR_T)

    pairs = S.cached_index(
        ("e2e_pairs", sf_dir, MIN_TOKENS, MIN_STOPWORD_RATIO, 5, 32, 8, E2E_NEAR_T),
        build_pairs,
    )
    # eager: on a build, pairs must materialize WHILE the closure's pooled
    # LSH intermediates are still cached (a later action would recompute
    # them cold after the next pipeline's retire); on a hit both counts
    # just touch the cache
    uniq.count()
    pairs.count()
    return uniq, pairs


def _e2e_chain(spark, sf_dir, drop_rule: str):
    """Shared body of the two e2e capstone variants — identical chain,
    differing only in near-dup survivor election (``drop_rule``):
    "pairwise" drops the larger id of every verified pair (one anti-join,
    no component pass); "cc" clusters the verified pairs with
    connected_components and keeps ONE doc (the min id) per cluster —
    the cluster-accurate form: on an A–B, B–C chain where the bridge doc
    has the largest id, pairwise keeps BOTH endpoints of the cluster
    (tests/test_ext.py::test_pairwise_vs_cc_survivor_election). The
    quality→uniq→LSH-pairs prefix is shared between the twins through
    the session artifact cache (_e2e_prefix); ONE cache-pool scope for
    the rest (minhash_lsh_dedup would retire on entry and drop the
    upstream persists — measured 11.4s vs ~4s at sf0.1 — so the LSH
    stages are composed directly in the prefix builder)."""
    (docs,) = tables(spark, sf_dir, "documents")
    D.retire_pipeline_caches()
    uniq, pairs = _e2e_prefix(spark, sf_dir)
    if drop_rule == "pairwise":
        dropx = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    else:
        # connected_components is self-managing (materializes per round,
        # unpersists its edge cache on return) so it nests safely in this
        # pool scope; non-min cluster members drop
        cc = D.connected_components(pairs)
        dropx = cc.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    survivors = uniq.join(dropx, "doc_id", "left_anti")
    # clean feeds the shard manifest AND the token join back — persist so
    # the decontamination gram explode runs once
    clean = D.pool_persist(
        C.decontaminate(
            survivors, docs.filter(F.col("doc_id") % 97 == 0), n=DECON_N
        ).select("doc_id", "n_tokens")
    )
    clean.count()
    m = C.shard_manifest(clean, "doc_id", n_shards=E2E_SHARDS, n_buckets=E2E_BUCKETS)
    toks = m.join(clean, "doc_id")
    return C.pack_sequences(toks, "n_tokens", budget=E2E_BUDGET).select(
        "doc_id", "shard", "pos", "n_tokens", "cum_before", "seq_id"
    )


@register(
    "curation_e2e_pretrain_pack",
    oracle=_e2e_oracle(),
    # RETIRED r13: superseded by curation_e2e_pretrain_pack_cc — the
    # identical shingles-to-shard-positions chain with the strictly more
    # accurate cluster-level survivor election (pairwise drop can keep two
    # docs of one duplicate cluster; CC keeps exactly the min id) and a
    # strictly stronger oracle (the same full replay PLUS the recursive-CTE
    # transitive closure). The pairwise-drop stage itself remains exercised
    # by the _cc entry's verified-pair front and the curation unit tests.
    retired_by="curation_e2e_pretrain_pack_cc",
)
def curation_e2e_pretrain_pack(spark, sf_dir):
    """THE capstone composition — the full pretraining curation pipeline as
    one query: quality thresholds → exact-dedup keep-list → MinHash-LSH
    near-dedup (pairwise smaller-id-wins drop rule: the larger id of every
    verified Jaccard≥0.5 pair drops — one anti-join, no component pass) →
    benchmark decontamination (8-gram overlap vs the doc_id%97 eval slice)
    → deterministic shard manifest → 512-token greedy sequence packing.
    Every stage is an existing registry operator; the chain is what a user
    of this engine runs end to end, and the oracle replays ALL of it —
    shingles to shard positions — bit-exact. Scale: each stage keeps its
    own documented shape (pushdown filters, hash keep-lists, banded LSH,
    broadcast eval grams, two-level shard enumeration); nothing about the
    composition adds a new shuffle beyond the stages' own."""
    return _e2e_chain(spark, sf_dir, "pairwise")


@register("curation_e2e_pretrain_pack_cc", oracle=_e2e_oracle("cc"))
def curation_e2e_pretrain_pack_cc(spark, sf_dir):
    """The CLUSTER-ACCURATE capstone variant (VERDICT r5 #4): identical
    chain to curation_e2e_pretrain_pack, but near-dup survivor election
    runs connected_components over the verified pairs and keeps exactly
    one doc (the min id) per duplicate CLUSTER — pairwise drop can keep
    two docs from one cluster when the bridge doc of an A–B, B–C chain
    carries the largest id (it is the only id_b, so both endpoints
    survive). The oracle replays the CC rounds as a recursive-CTE
    transitive closure (same fixpoint as dedup_minhash_clusters' oracle)
    inside the full shingles-to-shard-positions replay. Scale: adds the
    O(diameter)-round min-label propagation over the skinny verified-pair
    edge list — near-dup clusters are shallow (2-4 rounds); every other
    stage keeps its documented shape."""
    return _e2e_chain(spark, sf_dir, "cc")


TEMP_SCALE = 12


@register(
    "curation_temperature_weights",
    oracle=f"""
    WITH per AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    sq AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS s FROM per),
    tot AS (
      SELECT CAST(SUM(CAST(s AS DECIMAL(38,{TEMP_SCALE}))) AS DOUBLE) AS total
      FROM sq
    )
    SELECT q.source, q.n_tokens, q.s AS sqrt_tokens,
           q.s / t.total AS weight
    FROM sq q CROSS JOIN tot t
    """,
)
def curation_temperature_weights(spark, sf_dir):
    """Temperature-0.5 source-mixing weights: w_i ∝ sqrt(tokens_i) — the
    standard down-weighting of giant sources in a pretraining mix (e.g.
    multilingual α-sampling), chosen at α=1/2 precisely because IEEE sqrt
    is CORRECTLY ROUNDED (a general pow(x, α) is libm-dependent and would
    not replay cross-engine). Normalization runs through the decimal-cast
    sum convention so the denominator is order-free; each weight is then
    one double division. Scale: tiny source key space after a
    partial-aggregated scan; one-row total broadcast back."""
    (docs,) = tables(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " ")).cast("long")
    per = (
        docs.select("source", toks.alias("_t"))
        .groupBy("source")
        .agg(F.sum("_t").alias("n_tokens"))
    )
    sq = per.withColumn("s", F.sqrt(F.col("n_tokens").cast("double")))
    tot = sq.agg(
        F.sum(F.col("s").cast(f"decimal(38,{TEMP_SCALE})"))
        .cast("double")
        .alias("total")
    )
    return sq.join(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.col("s").alias("sqrt_tokens"),
        (F.col("s") / F.col("total")).alias("weight"),
    )
