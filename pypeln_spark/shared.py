"""Shared state — the Spark analogue of the reference's mutable Namespace.

The reference hands workers a Manager-backed namespace for cross-process
mutable state (pypeln/process/utils.py:10-43). Spark's execution model has
exactly two sound equivalents, both wrapped here:

- ``counter(...)`` / ``dict_counter(...)``: AccumulatorV2-style write-only
  aggregation from executors, readable on the driver after an action — the
  right tool for metrics (how many rows dropped, how many retried).
- ``broadcast_value(...)``: read-only state shipped once per executor — the
  right tool for lookup tables / model weights.

Arbitrary read-write shared state during a distributed computation is a
design smell the reference tolerated at single-machine scale; we expose the
two honest patterns instead of emulating Manager semantics over the network.
"""

from __future__ import annotations

import typing as tp

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import SparkSession


def counter(spark: SparkSession, initial: int = 0):
    """Write-only integer counter: ``c.add(n)`` in any UDF, ``c.value`` on
    the driver after an action."""
    return spark.sparkContext.accumulator(initial)


class _DictSumParam(AccumulatorParam):
    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            a[k] = a.get(k, 0) + v
        return a


def dict_counter(spark: SparkSession):
    """Keyed counter accumulator: ``c.add({"dropped": 1})``."""
    return spark.sparkContext.accumulator({}, _DictSumParam())


def broadcast_value(spark: SparkSession, value: tp.Any):
    """Read-only shared value; ``b.value`` inside any UDF. Ship lookup
    tables once per executor instead of capturing them in every closure
    (a captured driver global re-pickles per task)."""
    return spark.sparkContext.broadcast(value)
