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
