"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 (plus
the beyond-reference relational / dedup / similarity / text / streaming
layers) for the sf0.01 DuckDB hash-compare.

Implementation lives in pypeln_spark/queries/ — one module per category,
each entry pairing the Spark plan with its oracle SQL so they evolve in
lockstep. Order-sensitive float reductions use the decimal-cast convention
(pypeln_spark/functions.py) to make values bit-identical across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pypeln_spark.queries import REGISTRY, RETIRED  # noqa: E402
from pypeln_spark.session import _export_package_path  # noqa: E402

_export_package_path()  # executors must be able to unpickle harness closures


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _declared() -> dict[str, "object"]:
    # The declared surface is REGISTRY ∪ RETIRED: retirement (r13) frees
    # rotation-window capacity only — a query declared in an earlier round
    # must never DISAPPEAR from queries()/oracle_sql(), so retired entries
    # stay declared (appended after the rotated registry, outside the
    # driver's 50-entry correctness window) with their oracles intact.
    return {**REGISTRY, **RETIRED}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _declared().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in _declared().items() if q.oracle is not None
    }
