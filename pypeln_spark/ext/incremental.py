"""Incremental aggregate maintenance — merge partials instead of recompute.

The nightly-ETL shape at 100 TB: a materialized aggregate over years of
history must absorb one new day of data. Recomputing scans everything;
MERGING touches only the existing aggregate rows plus the delta's — the
classic incremental view maintenance for distributive/algebraic
aggregates (sum, count, min, max, and anything built from them: avg =
merged sum / merged count; the mergeable sketches in ext/sketch.py extend
this to distinct counts/quantiles/frequencies).

Exactness rule: partial SUMs over floats must stay in DECIMAL until the
final read — merging double-cast partials would reorder float addition
across merge boundaries and break replayability. Partials produced with
``F.sum(col.cast("decimal(38,6)"))`` merge associatively and exactly.
"""

from __future__ import annotations

import typing as tp

from pyspark.sql import DataFrame, functions as F

_MERGE_FNS = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def merge_aggregates(
    base: DataFrame,
    delta: DataFrame,
    keys: tp.Union[str, tp.List[str]],
    merges: tp.Mapping[str, str],
) -> DataFrame:
    """Combine two partial-aggregate tables (same schema) into one:
    ``merges`` maps each value column to its merge rule ("sum", "count",
    "min", "max"). Keys present in only one side pass through — exactly a
    groupBy over the union of partials, which is also why the result is
    independent of how history was split into increments.

    Scale shape: the union's row count is |base agg| + |delta agg| — key
    cardinality, not data volume; the merge is one shuffle on the key over
    those rows only. Pair with a partition-aligned sink (overwrite only
    the key partitions the delta touched) for the full IVM loop."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    exprs = []
    for col, rule in merges.items():
        try:
            fn = _MERGE_FNS[rule]
        except KeyError:
            raise ValueError(
                f"column {col!r}: unknown merge rule {rule!r} "
                f"(expected one of {sorted(_MERGE_FNS)})"
            ) from None
        exprs.append(fn(F.col(col)).alias(col))
    return base.unionByName(delta).groupBy(*keys).agg(*exprs)
