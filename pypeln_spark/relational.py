"""Relational layer — joins, aggregations, windows, set ops, top-k.

All beyond-reference capability (the reference's only multi-stage op is
``concat``, a bag union — SURVEY.md §2.2 'Joins: none'); this layer is a
deliberately thin veneer over the DataFrame API so that Catalyst owns every
physical decision (join strategy, partial aggregation, pushdown, AQE
re-planning). The helpers add exactly two things: Stage↔DataFrame lifting
and scale-aware defaults (auto-broadcast of dimension tables, sane top-k
lowering to TakeOrderedAndProject).
"""

from __future__ import annotations

import typing as tp

from pyspark.sql import Column, DataFrame, Window, functions as F

from .stage import Stage, to_stage

# dimension tables this small should always broadcast — on a 1000-executor
# cluster a shuffle of the fact table against a 25-row nation table is the
# canonical anti-pattern
BROADCAST_THRESHOLD_ROWS = 1_000_000


def _df(x: tp.Any) -> DataFrame:
    if isinstance(x, Stage):
        return x.df
    if isinstance(x, DataFrame):
        return x
    return to_stage(x).df


def join(
    left: tp.Any,
    right: tp.Any,
    on: tp.Union[str, tp.List[str], Column],
    how: str = "inner",
    broadcast: tp.Optional[bool] = None,
) -> Stage:
    """Join with optional explicit broadcast of the right side.

    ``broadcast=None`` leaves the choice to Catalyst/AQE (which sizes the
    plan at runtime); pass True for dimension tables you KNOW are small —
    the hint survives even when stats are missing (e.g. fresh parquet
    without analyze).
    """
    l, r = _df(left), _df(right)
    if broadcast:
        r = F.broadcast(r)
    return Stage(l.join(r, on, how))


def semi_join(left: tp.Any, right: tp.Any, on, broadcast: bool = False) -> Stage:
    l, r = _df(left), _df(right)
    if broadcast:
        r = F.broadcast(r)
    return Stage(l.join(r, on, "left_semi"))


def anti_join(left: tp.Any, right: tp.Any, on, broadcast: bool = False) -> Stage:
    l, r = _df(left), _df(right)
    if broadcast:
        r = F.broadcast(r)
    return Stage(l.join(r, on, "left_anti"))


def salted_join(
    left: tp.Any,
    right: tp.Any,
    on: str,
    how: str = "inner",
    salts: int = 16,
) -> Stage:
    """Skew-mitigated equi-join: spread each hot left-side key over ``salts``
    sub-keys, replicate the right side ×salts, join on (key, salt).

    Use when one side has pathological key skew AND AQE's skew-join split
    isn't available/enough (AQE only splits post-shuffle partitions of
    sort-merge joins). Cost: right side inflates ×salts — keep it the small
    side. The salt is derived from a stable row hash, not rand(): plans stay
    deterministic under retries/AQE re-execution.

    Only left-preserving joins are allowed: the right side is replicated
    ×salts, so right/full-outer would emit each unmatched right row
    ``salts`` times — wrong multiplicity (ADVICE r1)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: the "
            "right side is replicated per salt, so right-preserving joins "
            "would duplicate unmatched right rows"
        )
    l, r = _df(left), _df(right)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in l.columns]), F.lit(salts))
    l_s = l.withColumn("_salt", salt.cast("int"))
    r_s = r.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return Stage(l_s.join(r_s, [on, "_salt"], how).drop("_salt"))


def agg(
    stage: tp.Any,
    by: tp.Optional[tp.List[str]] = None,
    aggs: tp.Optional[tp.Dict[str, Column]] = None,
    kind: str = "groupby",
) -> Stage:
    """groupBy/rollup/cube aggregate. ``aggs`` maps output name → Column.

    Catalyst plans these as partial (map-side) + final aggregation — the
    shuffle moves only one row per group per partition, which is what makes
    a 100 TB groupBy viable.
    """
    df = _df(stage)
    by = by or []
    grouped = {
        "groupby": df.groupBy,
        "rollup": df.rollup,
        "cube": df.cube,
    }[kind](*by)
    exprs = [c.alias(name) for name, c in (aggs or {}).items()]
    return Stage(grouped.agg(*exprs))


def top_k(stage: tp.Any, k: int, by: tp.List[Column]) -> Stage:
    """ORDER BY ... LIMIT k — Spark lowers this to TakeOrderedAndProject:
    each partition keeps a k-row heap, the driver merges heaps. No global
    sort, no full shuffle; the right top-k at any scale."""
    return Stage(_df(stage).orderBy(*by).limit(k))


def window_rank(
    stage: tp.Any,
    partition_by: tp.List[str],
    order_by: tp.List[Column],
    k: tp.Optional[int] = None,
    rank_col: str = "rn",
    method: str = "row_number",
) -> Stage:
    """Top-k per group via ranking window — one shuffle on the partition keys."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    df = _df(stage).withColumn(rank_col, fn().over(w))
    if k is not None:
        df = df.filter(F.col(rank_col) <= k)
    return Stage(df)


def running(
    stage: tp.Any,
    partition_by: tp.List[str],
    order_by: tp.List[Column],
    aggs: tp.Dict[str, tp.Callable],
) -> Stage:
    """Running (cumulative) window aggregates, rowsBetween(unbounded, current).

    ``aggs`` maps output name → fn(WindowSpec) -> Column, so post-window
    casts compose correctly (a cast applied before ``.over`` would detach
    the window from the aggregate)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = _df(stage)
    for name, make in aggs.items():
        df = df.withColumn(name, make(w))
    return Stage(df)


def pivot(
    stage: tp.Any,
    by: tp.List[str],
    pivot_col: str,
    values: tp.List[str],
    agg_col: Column,
) -> Stage:
    """Pivot with EXPLICIT pivot values — never let Spark scan for distinct
    values first (that's an extra full pass at scale)."""
    return Stage(_df(stage).groupBy(*by).pivot(pivot_col, values).agg(agg_col))


def intersect(a: tp.Any, b: tp.Any) -> Stage:
    return Stage(_df(a).intersect(_df(b)))


def except_(a: tp.Any, b: tp.Any) -> Stage:
    return Stage(_df(a).exceptAll(_df(b)))


def distinct(stage: tp.Any, subset: tp.Optional[tp.List[str]] = None) -> Stage:
    df = _df(stage)
    return Stage(df.dropDuplicates(subset) if subset else df.distinct())


def sql(query: str, spark=None) -> Stage:
    from .io import _spark

    return Stage(_spark(spark).sql(query))

def group_map(
    stage: tp.Any,
    by: tp.Union[str, tp.List[str]],
    fn: tp.Callable,
    schema: tp.Union[str, tp.Any],
) -> Stage:
    """Grouped-map over pandas frames (``applyInPandas``): ``fn(pdf) ->
    pdf`` runs once per group with the whole group as one pandas
    DataFrame — the escape hatch for per-group logic Catalyst can't
    express (model fits, per-group resampling, custom rollups).

    Scale contract: ONE shuffle on the group key, then Arrow-batched
    per-group Python. Each group must fit one executor's memory — this is
    the documented applyInPandas constraint, so key cardinality and group
    size, not total data size, bound the operator. Prefer built-in
    aggregates whenever they express the computation (10-100× cheaper)."""
    by = [by] if isinstance(by, str) else list(by)
    return Stage(_df(stage).groupBy(*by).applyInPandas(fn, schema))


def group_agg(
    stage: tp.Any,
    by: tp.Union[str, tp.List[str]],
    aggs: tp.Dict[str, tp.Tuple[tp.Callable, str, str]],
) -> Stage:
    """Pandas UDAF aggregate: ``aggs`` maps output name → (fn, input_col,
    return_type) where ``fn(series) -> scalar`` runs as a GROUPED_AGG
    pandas UDF (Arrow-vectorized partial batches). The reference has no
    UDAF surface at all (SURVEY §2.2) — this is the beyond-reference
    custom-aggregate path; unlike group_map it composes with other
    aggregate expressions and never materializes whole groups as frames.

    Note Spark evaluates a GROUPED_AGG UDF over the full group (no partial
    merge contract on the Python side) — the shuffle still carries raw
    rows for the UDF's input column, unlike built-in partial aggregates.
    Use for genuinely custom reductions only."""
    from pyspark.sql.functions import pandas_udf

    by = [by] if isinstance(by, str) else list(by)
    exprs = []
    for name, (fn, col, rtype) in aggs.items():
        u = pandas_udf(fn, rtype, F.PandasUDFType.GROUPED_AGG)
        exprs.append(u(F.col(col)).alias(name))
    return Stage(_df(stage).groupBy(*by).agg(*exprs))


def merge_upsert(
    base: tp.Any,
    updates: tp.Any,
    on: tp.Union[str, tp.List[str]],
    broadcast: bool = True,
    validate_keys: bool = False,
) -> Stage:
    """MERGE / upsert without a table format: updates win on key match,
    unmatched base rows survive, unmatched update rows insert. The ANSI
    ``MERGE WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`` shape.

    DIVERGENCE from ANSI MERGE (ADVICE r3): when the update side holds
    DUPLICATE keys, ANSI MERGE errors ("multiple rows match"); this
    operator instead keeps EVERY update row — the matched base row is
    dropped once and all duplicates insert. Deduplicate the update side
    first if last-writer-wins is wanted, or pass ``validate_keys=True`` to
    get the ANSI behavior: one extra aggregate over the (small) update side
    that raises ValueError naming the duplicated keys. The check is an
    action on the update side only — the base never scans for it.

    Lowered as anti-join + union, which is the 100 TB shape for the common
    case (updates ≪ base): the update side broadcasts, so the base scan
    never shuffles — the alternative (union + row_number over the key)
    shuffles the FULL base on every merge. Columns must align
    (unionByName); schema evolution belongs to a table format, not here.

    Writing the result: pair with a partition-aligned sink — overwrite only
    the partitions holding updated keys (dynamic partition overwrite,
    ``spark.sql.sources.partitionOverwriteMode=dynamic``) so a merge
    touching 0.1%% of partitions rewrites 0.1%% of the data. Set
    ``broadcast=False`` when the update side is genuinely large; Catalyst
    then picks SMJ on the key."""
    b, u = _df(base), _df(updates)
    keys = [on] if isinstance(on, str) else list(on)
    if validate_keys:
        dups = (
            u.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(5)
            .collect()
        )
        if dups:
            shown = [tuple(r[k] for k in keys) for r in dups]
            raise ValueError(
                f"merge_upsert: update side has duplicate keys (first 5): "
                f"{shown}; ANSI MERGE rejects multiple matches — dedupe the "
                "update side or call with validate_keys=False to keep all "
                "duplicates"
            )
    right = F.broadcast(u) if broadcast else u
    kept = b.join(right.select(*keys), keys, "left_anti")
    return Stage(kept.unionByName(u))
