"""Sources & sinks beyond from_iterable/to_iterable.

The reference has NO connectors — all IO happens inside user fns
(SURVEY.md §2.2). On Spark the native readers are the scale path: parquet
scans get predicate pushdown + column pruning + partition pruning from
Catalyst for free, which is what makes the same query viable at 100 TB.
"""

from __future__ import annotations

import os
import typing as tp

from pyspark.sql import DataFrame, SparkSession

from .stage import Stage

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _spark(spark: tp.Optional[SparkSession]) -> SparkSession:
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from .session import get_spark

    return get_spark()


def read_parquet(path: str, spark: tp.Optional[SparkSession] = None) -> Stage:
    return Stage(_spark(spark).read.parquet(path))


def read_csv(path: str, spark: tp.Optional[SparkSession] = None, **options) -> Stage:
    options.setdefault("header", True)
    return Stage(_spark(spark).read.options(**options).csv(path))


def read_json(
    path: str, spark: tp.Optional[SparkSession] = None, schema=None, **options
) -> Stage:
    reader = _spark(spark).read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return Stage(reader.json(path))


def load_tables(
    sf_dir: str, spark: tp.Optional[SparkSession] = None, register_views: bool = True
) -> tp.Dict[str, DataFrame]:
    """Load every testdata table from an sf directory; optionally register
    each as a temp view so spark.sql can reference it by name (matching the
    DuckDB oracle's pre-registered views)."""
    spark = _spark(spark)
    out: tp.Dict[str, DataFrame] = {}
    for name in TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            df = spark.read.parquet(p)
            out[name] = df
            if register_views:
                df.createOrReplaceTempView(name)
    return out


def write_parquet(stage_or_df, path: str, mode: str = "overwrite", partition_by=None):
    df = stage_or_df.df if isinstance(stage_or_df, Stage) else stage_or_df
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
