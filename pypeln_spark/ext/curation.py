"""Corpus-curation operators for training-data pipelines: deterministic
sampling, stratified quotas, and benchmark decontamination.

Scale design notes:

- **sample_by_hash**: Bernoulli sampling keyed on a stable hash of the row
  id — reproducible across runs/engines (unlike ``df.sample`` whose RNG is
  partition-layout-dependent), pushdown-friendly (a pure filter), and
  splittable: disjoint rate windows give disjoint samples for train/val/test
  from one pass.
- **stratified_topn**: per-stratum quotas via window row_number — one shuffle
  on the strata key; the standard "N best docs per language/source" shape.
- **decontaminate**: drop training docs sharing any word n-gram with a
  benchmark/eval set. The join carries (ngram-hash, id) pairs only — at
  100 TB the benchmark gram set is small and broadcast; document text never
  shuffles.

Everything md5-derived (ext/hashing.py) so each operator has a DuckDB
oracle twin in queries/curation.py.
"""

from __future__ import annotations

import typing as tp

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import spread
from .hashing import h31
from .text import tokenize


def sample_key(key: Column, salt: str = "sample", denom: int = 10000) -> Column:
    """Stable sampling key in [0, denom): h31('<salt>:<key>') % denom."""
    return h31(F.concat(F.lit(salt + ":"), key.cast("string"))) % F.lit(denom)


def sample_by_hash(
    df: DataFrame,
    key_col: str = "doc_id",
    rate: float = 0.25,
    salt: str = "sample",
    denom: int = 10000,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose sample_key falls in
    [0, rate*denom). A pure filter — Catalyst pushes it to the scan, and the
    same (salt, key) always lands on the same side."""
    return df.filter(sample_key(F.col(key_col), salt, denom) < int(rate * denom))


def train_val_split(
    df: DataFrame,
    key_col: str = "doc_id",
    val_frac: float = 0.1,
    test_frac: float = 0.0,
    salt: str = "split",
    denom: int = 10000,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val(/test) assignment from ONE pass, zero
    shuffle: the same stable hash windowing as sample_by_hash, so (a) the
    split is reproducible across runs, engines, and re-partitioning —
    df.randomSplit is none of those — (b) membership is a pure projection
    any engine can replay, and (c) a document keeps its split when the
    corpus grows (new docs don't reshuffle old assignments — the property
    that keeps eval sets stable across corpus versions). Windows:
    val = [0, val_frac), test = [val_frac, val_frac+test_frac), train =
    the rest."""
    k = sample_key(F.col(key_col), salt, denom)
    val_hi = int(val_frac * denom)
    test_hi = val_hi + int(test_frac * denom)
    split = (
        F.when(k < val_hi, F.lit("val"))
        .when(k < test_hi, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(split_col, split)


def weighted_sample(
    df: DataFrame,
    weight: Column,
    key_col: str = "doc_id",
    salt: str = "wsample",
    denom: int = 10000,
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep a row with probability
    ``weight`` (an INTEGER column scaled to [0, denom] — callers build it
    with integer arithmetic so both engines agree exactly). Same stable
    hash-window trick as sample_by_hash: keep iff sample_key < weight, so
    inclusion is a pure integer comparison — reproducible across runs,
    engines, and partitionings, and pushable to the scan. The standard
    quality-weighted downsampling step (keep high-quality docs at a higher
    rate) without a single float or RNG."""
    return df.filter(sample_key(F.col(key_col), salt, denom) < weight)


def stratified_topn(
    df: DataFrame,
    strata: tp.Sequence[str],
    order_by: tp.Sequence[Column],
    n: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-n rows per stratum under a deterministic order (callers must make
    the order total, e.g. by appending the id column). One shuffle on the
    strata key; skewed strata split fine under AQE since the window itself
    is the only wide op."""
    from pyspark.sql import Window

    w = Window.partitionBy(*strata).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def shard_manifest(
    df: DataFrame,
    key_col: str = "doc_id",
    n_shards: int = 32,
    n_buckets: int = 256,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic training-shard assignment + within-shard position:
    (key, shard, pos) with pos a 1-based dense position in a stable
    pseudo-random order — the manifest that turns a corpus into N shuffled
    training shards reproducibly (same corpus → same shards → same order,
    on any engine, any partitioning).

    Scale shape (the point): a naive ROW_NUMBER() OVER (PARTITION BY shard)
    funnels each shard — billions of rows at 100 TB — through ONE task.
    Instead positions are enumerated two-level: rows order by (bucket, key
    hash, id) inside (shard, bucket) sub-groups (n_shards × n_buckets
    fine-grained window partitions), and a tiny (shards × buckets) count
    relation prefix-sums into per-bucket offsets that broadcast back. The
    result is IDENTICAL to the single-window spelling — which is exactly
    how the DuckDB oracle replays it — but no task ever sees more than a
    bucket's worth of rows."""
    from pyspark.sql import Window

    h = h31(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    rows = df.select(
        key_col,
        h.alias("_hk"),
        (h % F.lit(n_shards)).alias("shard"),
        ((h / F.lit(n_shards)).cast("long") % F.lit(n_buckets)).alias("_bkt"),
    )
    counts = rows.groupBy("shard", "_bkt").agg(F.count(F.lit(1)).alias("_c"))
    off_w = (
        Window.partitionBy("shard")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(off_w), F.lit(0))
    ).drop("_c")
    rn = F.row_number().over(
        Window.partitionBy("shard", "_bkt").orderBy("_hk", F.col(key_col))
    )
    return (
        rows.join(F.broadcast(offsets), ["shard", "_bkt"])
        .withColumn("pos", (F.col("_off") + rn).cast("long"))
        .select(key_col, "shard", "pos")
    )


def sql_shard_manifest(
    key_expr: str = "doc_id",
    n_shards: int = 32,
    n_buckets: int = 256,
    salt: str = "shard",
    table: str = "documents",
) -> str:
    """DuckDB twin of shard_manifest over ``table`` (default the
    `documents` view; pass a CTE name to manifest a derived set) — spelled
    as the equivalent single window per shard ordered by (bucket, hash,
    key)."""
    from .hashing import sql_h31

    h = sql_h31(f"concat('{salt}:', CAST({key_expr} AS VARCHAR))")
    return f"""
    WITH _r AS (
      SELECT {key_expr}, {h} AS _hk,
             {h} % {n_shards} AS shard,
             ({h} // {n_shards}) % {n_buckets} AS _bkt
      FROM {table}
    )
    SELECT {key_expr}, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shard ORDER BY _bkt, _hk, {key_expr}) AS BIGINT) AS pos
    FROM _r
    """


def pack_sequences(
    manifest: DataFrame,
    tokens_col: str = "n_tokens",
    budget: int = 512,
) -> DataFrame:
    """Greedy streaming sequence packing: walk each shard in manifest order
    and assign every document to training sequence floor(tokens_so_far /
    budget) — the deterministic contiguous-fill packing used to build
    fixed-length training batches. Input needs (shard, pos, tokens_col);
    output adds (cum_before, seq_id). Integer-only, so any engine replays
    it exactly.

    Scale: ONE running-sum window per shard. Unlike enumeration, the prefix
    sum genuinely needs the shard's order, but the state per task is one
    long — at 100 TB you'd run the same two-level offset trick as
    shard_manifest (per-bucket token-sum offsets then within-bucket running
    sums); kept single-window here because the input is a manifest (id +
    3 ints/row), ~1000× smaller than the corpus."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return manifest.withColumn("cum_before", cum).withColumn(
        "seq_id", F.floor(F.col("cum_before") / F.lit(budget)).cast("long")
    )


def word_ngram_hashes(c: Column, n: int = 8) -> Column:
    """Distinct hashes of word n-grams (space-joined token windows). Texts
    shorter than n tokens contribute their whole token sequence as one gram
    — short eval questions still decontaminate."""
    toks = tokenize(c)
    m = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: h31(F.array_join(F.slice(toks, i, n), " ")),
        )
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Training rows sharing NO word n-gram with the benchmark set.

    The benchmark gram set is distinct-ed then used as the build side of the
    contamination join (small → broadcast at any realistic eval-set size);
    the train side ships (gram, id) pairs only. Survivors come back via
    anti-join on id — the full text is never shuffled."""
    grams = word_ngram_hashes(F.col(text_col), n).alias("grams")
    bench_g = bench.select(F.explode(grams).alias("g")).distinct()
    train_g = spread(train).select(F.col(id_col), F.explode(grams).alias("g"))
    contaminated = (
        train_g.join(F.broadcast(bench_g), "g").select(id_col).distinct()
    )
    return train.join(contaminated, id_col, "left_anti")


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints into a Z-order
    (Morton) key — the space-filling-curve layout trick: sorting by this
    key clusters rows that are close in BOTH dimensions, so min/max file
    statistics prune on either column (a plain sort clusters only its
    leading column). Pure bit arithmetic, identical in any SQL engine.

    At 100 TB this is a WRITE-side operator: repartitionByRange(zkey) +
    sortWithinPartitions(zkey) before the parquet write gives every file a
    tight bounding box in (a, b); queries filtering either dimension skip
    files on footer stats alone. Bits beyond ``bits`` are ignored — scale
    inputs into range (e.g. % 2^bits buckets) before keying."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftrightunsigned(a.cast("long"), i) % 2
        bbit = F.shiftrightunsigned(b.cast("long"), i) % 2
        key = key + F.shiftleft(abit, 2 * i) + F.shiftleft(bbit, 2 * i + 1)
    return key
