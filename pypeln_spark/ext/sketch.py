"""Mergeable sketches over the frozen md5 hash family (ext/hashing.py).

KMV (K-Minimum-Values) distinct-count sketch: a group's sketch is the k
smallest distinct hashes of its values; the estimator is (k-1) * H / kth_min
(hashes uniform on [0, H)). Chosen over HLL here because it is *exactly
reproducible cross-engine* — Spark's approx_count_distinct and DuckDB's HLL
are different implementations with no shared spec, so they can never be
oracle-checked value-for-value; KMV over h31 can, estimate included.

Scale shape (the point): a two-phase aggregate exactly like Spark lowers
sum() — a PARTIAL sketch per (group, salt) sub-key, then a FINAL merge of
sub-sketches (flatten → distinct → k smallest). Merge is associative and
lossless (the k smallest of a union are among each side's k smallest), so
the result is independent of partitioning/salting — which is what lets the
oracle compute it single-node. State per sub-group is ≤ k longs, never the
value set; collect_set stays bounded by the salt fan-out.
"""

from __future__ import annotations

import typing as tp

from pyspark.sql import DataFrame, functions as F

from .hashing import P31, h31


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
