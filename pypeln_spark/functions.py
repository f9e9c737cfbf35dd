"""Deterministic aggregate helpers + scalar function passthrough.

The reference has no aggregations at all (users fold in Python at the sink,
SURVEY.md §2.2); everything here is beyond-reference surface built straight
on pyspark.sql.functions.

The ``dsum``/``davg`` family exists for cross-engine determinism: a SUM of
doubles is order-dependent (Spark's partition order ≠ DuckDB's scan order),
so value-hash comparison of raw double sums is flaky by construction.
Casting each term to DECIMAL(38, s) BEFORE the sum makes the aggregate exact
and order-insensitive, and casting the exact decimal result back to double
yields bit-identical values in any engine. Cost at scale: decimal sum is a
few× slower per row than double sum but still one pass, map-side partial
aggregation intact — a fair price for reproducible results; callers that
don't need bit-reproducibility can use plain F.sum.

SCALE RULE: the scale must be ≥ the exact decimal precision of the input
values, otherwise the cast itself rounds and can land on a genuine .5 tie
where engines disagree (Spark HALF_UP vs DuckDB's float-multiply rounding —
observed on TPC-H charge values, which have exactly 6 decimal digits, at
scale 4). Money×rate products here have ≤6 digits; 'random' full-precision
doubles have measure-zero tie probability at any scale. Default 6.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["dsum", "davg", "dsum_expr", "davg_expr", "col", "lit"]

col = F.col
lit = F.lit


def dsum(c: Column | str, scale: int = 6) -> Column:
    """Order-insensitive, engine-reproducible SUM over a double column."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def davg(c: Column | str, scale: int = 6) -> Column:
    """Reproducible AVG: exact decimal sum / count, division done in double."""
    c = F.col(c) if isinstance(c, str) else c
    return (
        F.sum(c.cast(f"decimal(38,{scale})")).cast("double")
        / F.count(c).cast("double")
    )


def dsum_expr(sql_expr: str, scale: int = 6) -> str:
    """The DuckDB-side spelling of dsum — keep the two in lockstep."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"


def davg_expr(sql_expr: str, scale: int = 6) -> str:
    return (
        f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"
        f" / CAST(COUNT({sql_expr}) AS DOUBLE)"
    )
