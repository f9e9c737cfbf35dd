"""Edge-case hardening: empty inputs through every extension operator,
await-stage parity, CSV/JSON connector round trips. The driver and judge
should never hit a crash on a degenerate input."""

import pytest
from pyspark.sql import functions as F, types as T

import pypeln_spark as pl
from pypeln_spark.ext import dedup as D, similarity as S, text as X
from pypeln_spark.queries.base import load_table

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame([], schema=DOC_SCHEMA)


@pytest.fixture()
def empty_emb(spark):
    return spark.createDataFrame([], schema=EMB_SCHEMA)


def test_dedup_ops_on_empty(spark, empty_docs):
    assert D.exact_dedup(empty_docs).count() == 0
    assert D.minhash_lsh_dedup(empty_docs).count() == 0
    assert D.simhash_near_pairs(D.simhash_fingerprints(empty_docs)).count() == 0
    assert D.ngram_jaccard_pairs(empty_docs).count() == 0


def test_text_ops_on_empty(spark, empty_docs):
    assert X.token_stats(empty_docs).count() == 0
    assert X.quality_scores(empty_docs).count() == 0
    assert X.lang_scores(empty_docs).count() == 0
    assert X.fingerprint(empty_docs).count() == 0


def test_similarity_ops_on_empty(spark, empty_emb):
    assert S.cosine_topk(empty_emb, empty_emb).count() == 0
    assert S.near_dup_pairs(empty_emb).count() == 0


def test_single_doc_no_pairs(spark):
    one = spark.createDataFrame(
        [(1, "hello world text sample", "en", "s", 23)], schema=DOC_SCHEMA
    )
    assert D.minhash_lsh_dedup(one).count() == 0
    assert D.simhash_near_pairs(D.simhash_fingerprints(one)).count() == 0


def test_await_stage(spark):
    import asyncio

    async def go():
        stage = pl.map(lambda x: x + 1, [1, 2, 3], returns="long") | pl.ordered()
        return await stage

    out = asyncio.new_event_loop().run_until_complete(go())
    assert out == [2, 3, 4]


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    """Connector coverage: the same relation through parquet, csv and json
    readers yields identical data."""
    nation = load_table(spark, sf_dir, "nation")
    csv_p, json_p = str(tmp_path / "n_csv"), str(tmp_path / "n_json")
    nation.write.mode("overwrite").option("header", True).csv(csv_p)
    nation.write.mode("overwrite").json(json_p)

    from_csv = pl.read_csv(csv_p, spark=spark, inferSchema=True).df
    from_json = pl.read_json(json_p, spark=spark, schema=nation.schema).df

    base = {tuple(r) for r in nation.collect()}
    assert {tuple(r) for r in from_csv.collect()} == base
    assert {tuple(r) for r in from_json.collect()} == base


def test_new_ops_on_empty(spark, empty_docs, empty_emb):
    """Round-5 operators on degenerate inputs: no crashes, sane outputs."""
    from pypeln_spark.ext import sketch as K

    assert X.tfidf_top_terms(empty_docs).count() == 0
    assert X.fuzzy_join_lev1(empty_docs, "text", "doc_id").count() == 0
    # empty build side -> a single empty bit set; every probe is negative
    bits = K.bloom_build(empty_docs, "text", m=64, kh=2)
    assert bits.select(F.size("bits")).first()[0] == 0
    probe = spark.createDataFrame([("x",)], "v string")
    probed = K.bloom_maybe_contains(probe, bits, "v", m=64, kh=2)
    assert probed.filter(F.col("maybe_member")).count() == 0
    # semantic near-dup needs >= 1 vector to seed centroids; empty -> empty
    assert S.semantic_near_dup(empty_emb, n_cells=2, iters=1).count() == 0


def test_tfidf_single_doc(spark):
    one = spark.createDataFrame([(1, "a b a", "en", "s", 5)], schema=DOC_SCHEMA)
    rows = X.tfidf_top_terms(one, k=5).collect()
    # df == N == 1 for every term; tf decides the order
    assert [(r.term, r.tf, r.df) for r in sorted(rows, key=lambda r: r.rank)] == [
        ("a", 2, 1),
        ("b", 1, 1),
    ]


def test_round3_ops_on_empty_and_degenerate(spark, empty_docs, empty_emb):
    """Empty/degenerate inputs through the round-3 operators: nothing
    throws, shapes are sane."""
    from pypeln_spark import relational as R
    from pypeln_spark.ext import incremental as I
    from pypeln_spark.ext import quality as Q
    from pypeln_spark.ext import text as TX
    from pyspark.sql import functions as F

    # merge with an empty delta / empty base
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    empty = base.filter("k < 0")
    assert {r.k: r.v for r in R.merge_upsert(base, empty, on="k").df.collect()} == {1: "a"}
    assert {r.k: r.v for r in R.merge_upsert(empty, base, on="k").df.collect()} == {1: "a"}

    # profile of an empty table: rows exist per column, counts are 0
    prof = {r.column: r for r in Q.profile(empty).collect()}
    assert prof["k"].n_rows == 0 and prof["k"].n_nulls == 0

    # expectations over empty input: zero violations, zero rows out
    out, obs = Q.expect(empty, {"ok": (F.col("k") > 0, "drop")})
    assert out.count() == 0 and obs.get == {"ok": 0}

    # IVM merge where one side is empty == the other side
    agg = base.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    eagg = agg.filter("n < 0")
    got = {r.v: r.n for r in I.merge_aggregates(agg, eagg, "v", {"n": "count"}).collect()}
    assert got == {"a": 1}

    # unigram LM over empty corpus: no rows, no division errors
    assert TX.unigram_lm_score(empty_docs).count() == 0


def test_pq_empty_queries_and_merge_upsert_all_replaced(spark, empty_emb):
    from pypeln_spark import relational as R
    from pypeln_spark.ext import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    no_queries = emb.filter("vec_id < 0")
    assert S.pq_adc_topk(emb, no_queries, k=5, m=16, n_codes=8).count() == 0

    # updates covering every base key: result == updates exactly
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    upd = spark.createDataFrame([(1, "A"), (2, "B")], "k long, v string")
    assert {r.k: r.v for r in R.merge_upsert(base, upd, on="k").df.collect()} == {
        1: "A", 2: "B"
    }
