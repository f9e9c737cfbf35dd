"""Mergeable sketches over the frozen md5 hash family (ext/hashing.py).

Three sketches, one design rule: every estimator is *exactly reproducible
cross-engine*, so sketch state AND estimates can be value-checked against
the DuckDB oracle — unlike engine-native approx fns (approx_count_distinct,
approx_percentile, HLL/t-digest), which share no spec across engines.

- kmv_sketch — KMV (K-Minimum-Values) distinct count: a group's sketch is
  its k smallest distinct hashes; estimator (k-1) * H / kth_min (hashes
  uniform on [0, H)). The reproducible HLL alternative.
- cms_sketch / cms_estimate — Count-Min point frequency: d×w counter
  matrix; estimate = min over rows of the value's counter. Linear, so
  merge is counter addition.
- bottomk_quantiles — quantiles from the uniform row sample given by the k
  smallest key-hashes; rank-pick estimator, no interpolation.

Scale shape (the point): each is a two-phase aggregate exactly like Spark
lowers sum() — bounded PARTIAL state per (group, salt) sub-key or
(group, j, bucket) key, then an associative lossless FINAL merge — so the
result is provably independent of partitioning (tested), which is also
what lets the oracle compute it single-node. State never holds the value
set; collect_set/collect_list stay bounded by k and the salt fan-out.
"""

from __future__ import annotations

import typing as tp

from pyspark.sql import DataFrame, functions as F

from .hashing import MINHASH_PARAMS, P31, h31


def kmv_sketch(
    df: DataFrame,
    group_cols: tp.Sequence[str],
    value_col: str,
    k: int = 64,
    salts: int = 8,
) -> DataFrame:
    """Per-group KMV sketch + estimate: (group..., kmin: array<long>,
    est_distinct: double). est is exact (= |kmin|) when the group has fewer
    than k distinct hashes."""
    h = h31(F.col(value_col).cast("string"))
    salt = F.pmod(F.xxhash64(F.col(value_col).cast("string")), F.lit(salts))
    partial = (
        df.withColumn("_h", h)
        .withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_part"))
    )
    merged = partial.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_part")))), 1, k
        ).alias("kmin")
    )
    kth = F.element_at(F.col("kmin"), k).cast("double")
    est = F.when(
        F.size("kmin") < k, F.size("kmin").cast("double")
    ).otherwise(F.lit(float((k - 1) * P31)) / kth)
    return merged.withColumn("est_distinct", est)


def _cms_buckets(value_col: str, d: int, w: int) -> F.Column:
    """array<long> of the d CMS row-buckets for a value: row j's bucket is
    ((a_j*h31(v) + b_j) mod P31) mod w over the frozen minhash family —
    a_j*h < 2^62, so everything stays in exact int64 on any engine."""
    h = h31(F.col(value_col).cast("string"))
    return F.array(
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(P31)) % F.lit(w)
            for a, b in MINHASH_PARAMS[:d]
        ]
    )


def cms_sketch(
    df: DataFrame,
    group_cols: tp.Sequence[str],
    value_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Per-group Count-Min sketch: (group..., cms: array<array<long>>), d
    rows × w counters; cms[j][b] = #rows whose value hashes to bucket b under
    row-hash j. The sketch is LINEAR (counter-wise sums), so merging partial
    sketches is elementwise addition — partition-invariant by construction.

    Scale shape: one explode (×d) into a groupBy over (group, j, bucket) —
    key cardinality bounded by |groups|·d·w regardless of input size, so
    map-side partial aggregation collapses the shuffle to ~|groups|·d·w rows;
    the dense-array assembly then touches only that bounded relation."""
    rows = df.withColumn("_bk", _cms_buckets(value_col, d, w)).select(
        *group_cols, F.posexplode("_bk").alias("_j", "_b")
    )
    counts = rows.groupBy(*group_cols, "_j", "_b").agg(
        F.count(F.lit(1)).alias("_c")
    )
    dense = counts.groupBy(*group_cols, "_j").agg(
        F.map_from_entries(F.collect_list(F.struct("_b", "_c"))).alias("_m")
    ).select(
        *group_cols,
        "_j",
        F.transform(
            F.sequence(F.lit(0), F.lit(w - 1)),
            lambda b: F.coalesce(F.element_at(F.col("_m"), b.cast("long")), F.lit(0)),
        ).alias("_row"),
    )
    return dense.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_j", "_row"))), lambda x: x["_row"]
        ).alias("cms")
    )


def cms_estimate(
    sketch_df: DataFrame,
    items_df: DataFrame,
    group_cols: tp.Sequence[str],
    value_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point-frequency estimates for (group, value) rows in items_df against
    a cms_sketch over the same (d, w, hash family): adds `n_est` = min over
    rows j of cms[j][bucket_j(value)] — the classic CMS upper bound, exact-
    deterministic so it can be value-checked cross-engine. The sketch side is
    tiny (one row per group), so the join broadcasts."""
    bk = _cms_buckets(value_col, d, w)
    est = F.least(
        *[
            F.element_at(
                F.element_at("cms", j + 1), (F.element_at("_bk", j + 1) + 1).cast("int")
            )
            for j in range(d)
        ]
    )
    return (
        items_df.withColumn("_bk", bk)
        .join(F.broadcast(sketch_df), list(group_cols))
        .withColumn("n_est", est)
        .drop("_bk", "cms")
    )


def bottomk_quantiles(
    df: DataFrame,
    group_cols: tp.Sequence[str],
    key_col: str,
    value_col: str,
    k: int = 128,
    probs: tp.Sequence[float] = (0.5, 0.9),
    salts: int = 8,
) -> DataFrame:
    """Per-group quantile estimates from a bottom-k uniform row sample:
    keep the k rows whose KEY hashes smallest (key_col must be unique per
    row — e.g. the table's id — so the sample is uniform over ROWS and the
    estimates target multiset quantiles, not distinct-value quantiles).
    Output: (group..., m_sample, est_p{NN}...). Estimator is the sample
    value at rank max(1, ceil(p*m)) — pure integer/rank arithmetic, no
    interpolation, so estimates are bit-identical cross-engine; groups
    smaller than k are sampled whole, making their quantiles exact.

    Scale shape: same two-phase partial/final as kmv_sketch — per-(group,
    salt) bottom-k sub-samples (state ≤ k structs each), then a lossless
    k-smallest merge; the result is independent of partitioning."""
    h = h31(F.col(key_col).cast("string"))
    salt = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(salts))
    pair = F.struct(h.alias("_h"), F.col(value_col).alias("_v"))
    partial = (
        df.withColumn("_pair", pair)
        .withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.slice(F.array_sort(F.collect_list("_pair")), 1, k).alias("_part"))
    )
    merged = partial.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_part"))), 1, k
        ).alias("_kmin")
    )
    vals = F.array_sort(F.transform(F.col("_kmin"), lambda x: x["_v"]))
    out = merged.withColumn("_vals", vals).withColumn(
        "m_sample", F.size("_vals").cast("long")
    )
    for p in probs:
        rank = F.greatest(F.lit(1), F.ceil(F.lit(float(p)) * F.size("_vals")))
        out = out.withColumn(
            f"est_p{int(round(p * 100))}",
            F.element_at("_vals", rank.cast("int")),
        )
    return out.drop("_kmin", "_vals")
