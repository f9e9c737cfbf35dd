"""As-of (point-in-time) join — an operator Spark lacks natively.

Semantics: for each left row, the single right row with the greatest
``right_ts`` ≤ ``left_ts`` within the same key group (DuckDB's ASOF JOIN,
pandas' merge_asof(direction='backward')).

Two lowerings:

- **union+window (default, the scale path)**: tag left/right, union, one
  window over (key, ts, side) carrying the last non-null right payload
  forward, keep left rows. ONE shuffle on the key — no range join, no
  per-key collect; skew behaves like any window (AQE handles it). This is
  the formulation that survives 100 TB.
- **merge_asof via applyInPandas (grouped fallback)**: per-key pandas
  merge_asof — simpler to reason about, but materializes each key group in
  one python worker; only sane when no key is huge.

Ties: if several right rows share (key, ts), the row whose ORDERABLE
payload columns sort largest wins deterministically — and it wins AS A
WHOLE ROW: the matched right row's payload travels through the window as
ONE struct, so its columns can never mix across different right rows and
its legitimate NULLs are preserved (merge_asof / ASOF JOIN semantics).
Non-orderable right columns (MapType anywhere in the nesting) are carried
but excluded from the tiebreak — rows identical on every orderable column
remain nondeterministic in those. Callers wanting DuckDB-identical results
should still dedup the right side first — DuckDB ASOF tie behavior is
unspecified.
"""

from __future__ import annotations

import typing as tp

from pyspark.sql import DataFrame, Window, functions as F, types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Catalyst can sort values of this type (MapType can't —
    anywhere in the nesting)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tp.Optional[tp.List[str]] = None,
    suffix: str = "_right",
    how: str = "inner",
    direction: str = "backward",
    tolerance: tp.Union[str, int, float, None] = None,
) -> DataFrame:
    """As-of join via union+window.

    ``direction="backward"`` (default): greatest right_ts ≤ left_ts —
    pandas merge_asof backward / DuckDB ``ASOF ... ON l.ts >= r.ts``.
    ``direction="forward"``: smallest right_ts ≥ left_ts — merge_asof
    forward / DuckDB ``ON l.ts <= r.ts``. Same single-shuffle lowering:
    forward just traverses the window in descending event time, so
    "last right row seen" flips from newest-at-or-before to
    oldest-at-or-after.

    ``tolerance`` bounds the match gap (pandas merge_asof tolerance): a
    SQL interval string ("1 hour") for timestamp axes, or a number for
    numeric axes. A match farther than the tolerance is treated as NO
    match — nulled under how='left', dropped under how='inner'. Applied
    as a post-carry predicate, so the lowering (one shuffle) is
    unchanged.

    Output: every left column, plus ``<right_ts><suffix>`` and each
    requested right column as ``<col><suffix>``; unmatched left rows are
    dropped (how='inner') or kept with nulls (how='left')."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    # The matched right row rides the window as ONE struct — carrying each
    # payload column through its own last(ignorenulls) would backfill a
    # right row's legitimate NULL from an OLDER right row and mix columns
    # across rows (ADVICE r1). One struct, one last(), whole-row semantics.
    lp_type = T.StructType(list(left.schema.fields))
    rp_type = T.StructType(
        [T.StructField("_rts", right.schema[right_ts].dataType)]
        + [T.StructField(f"_r_{c}", right.schema[c].dataType) for c in right_cols]
    )
    # Tiebreak sorts a struct of ONLY the orderable right columns (ADVICE
    # r2: ordering by the whole payload fails analysis when a right column
    # is a MapType); the FULL payload still travels through last(). Ties
    # among right rows identical on every orderable column stay
    # nondeterministic in their non-orderable columns — unavoidable without
    # an order, and documented in the module docstring.
    tb_cols = [c for c in right_cols if _orderable(right.schema[c].dataType)]
    tb_type = T.StructType(
        [T.StructField("_rts", right.schema[right_ts].dataType)]
        + [T.StructField(f"_r_{c}", right.schema[c].dataType) for c in tb_cols]
    )
    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lpayload"),
        F.lit(None).cast(rp_type).alias("_rpayload"),
        F.lit(None).cast(tb_type).alias("_rtiebreak"),
    )
    rhs = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lp_type).alias("_lpayload"),
        F.struct(
            F.col(right_ts).alias("_rts"),
            *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        ).alias("_rpayload"),
        F.struct(
            F.col(right_ts).alias("_rts"),
            *[F.col(c).alias(f"_r_{c}") for c in tb_cols],
        ).alias("_rtiebreak"),
    )
    # right rows sort before left rows at equal ts (side 0 < 1) → the match
    # is inclusive in both directions; the orderable-struct tiebreak makes
    # same-(key, ts) right rows deterministic (up to non-orderable columns)
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.col("_side").asc(), F.col("_rtiebreak").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        lhs.unionByName(rhs)
        .withColumn("_m", F.last("_rpayload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        bound = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        within = (
            F.col("_m._rts") >= F.col("_t") - bound
            if direction == "backward"
            else F.col("_m._rts") <= F.col("_t") + bound
        )
        carried = carried.withColumn(
            "_m", F.when(within, F.col("_m"))  # too-far match == no match
        )
    out_cols = [F.col(f"_lpayload.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_m._rts").alias(f"{right_ts}{suffix}"))
    out_cols += [F.col(f"_m._r_{c}").alias(f"{c}{suffix}") for c in right_cols]
    out = carried.select(*out_cols)
    if how == "inner":
        out = out.filter(F.col(f"{right_ts}{suffix}").isNotNull())
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tp.Optional[tp.List[str]] = None,
    suffix: str = "_right",
) -> DataFrame:
    """merge_asof fallback: cogroup by key, pandas merge_asof per group.
    Keeps unmatched left rows (nulls) — pandas semantics."""
    import pandas as pd
    from pyspark.sql import types as T

    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    # copy — StructType.add MUTATES, and left.schema is the DataFrame's
    # cached schema object
    out_schema = T.StructType(list(left.schema.fields))
    out_schema = out_schema.add(f"{right_ts}{suffix}", right.schema[right_ts].dataType)
    for c in right_cols:
        out_schema = out_schema.add(f"{c}{suffix}", right.schema[c].dataType)

    left_cols = list(left.columns)

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(left_ts)
        r = (
            r[[right_ts] + right_cols]
            .rename(columns={right_ts: f"{right_ts}{suffix}", **{c: f"{c}{suffix}" for c in right_cols}})
            .sort_values(f"{right_ts}{suffix}")
        )
        if len(r) == 0:
            for c in [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in right_cols]:
                l[c] = None
            return l
        return pd.merge_asof(
            l, r, left_on=left_ts, right_on=f"{right_ts}{suffix}", direction="backward"
        )

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Interval (range) join — points matched to every [start, end] interval
    of the same key that contains them — WITHOUT the naive theta-join.

    The scale shape: intervals explode to the time buckets they cover
    (rows ∝ interval length / bucket_s — bounded, pick bucket_s near the
    typical interval length), points map to exactly ONE bucket, and the
    match becomes an equi-join on (key, bucket) + an exact containment
    filter. Each (point, interval) pair meets in exactly one bucket (the
    point's), so no post-join dedup is needed. A theta-join
    `p.key = i.key AND p.ts BETWEEN i.start AND i.end` would make Spark fall
    back to a broadcast-nested-loop per key — quadratic per key group.

    Column names of ``points`` and ``intervals`` must not collide except for
    ``on``. Epoch-second truncation is monotonic, so bucket(point) always
    lies within [bucket(start), bucket(end)] — no boundary misses."""
    pb = points.withColumn(
        "_rb", F.floor(F.unix_timestamp(F.col(point_ts)) / F.lit(bucket_s))
    )
    ib = intervals.withColumn(
        "_rb",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts)) / F.lit(bucket_s)),
                F.floor(F.unix_timestamp(F.col(end_ts)) / F.lit(bucket_s)),
            )
        ),
    )
    return (
        pb.join(ib, [on, "_rb"])
        .filter((F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts)))
        .drop("_rb")
    )
