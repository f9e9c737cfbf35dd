"""Schema inference + opaque-object fallback.

The reference flows arbitrary Python objects through its queues
(pypeln/utils.py:16,46-48 — ``Element.value`` is an unconstrained TypeVar).
On Spark we keep the same contract two ways:

- values whose type maps cleanly onto a Spark SQL type become a typed
  ``value`` column (columnar, Arrow-vectorized, Catalyst-optimizable);
- anything else is pickled into a ``BinaryType`` column and transparently
  un/re-pickled at every Python UDF edge (correct, but the slow path — the
  docstring equivalent of the reference's "queues pickle whole objects",
  docs/advanced.md:84).
"""

from __future__ import annotations

import datetime as dt
import decimal
import pickle
import typing as tp

from pyspark.sql import types as T

try:  # cloudpickle handles lambdas/closures inside payloads
    from pyspark import cloudpickle as _cp
except ImportError:  # pragma: no cover
    import cloudpickle as _cp  # type: ignore


def dumps(obj: tp.Any) -> bytes:
    try:
        return pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    except Exception:
        return _cp.dumps(obj)


def loads(data: bytes) -> tp.Any:
    return pickle.loads(data)


_SIMPLE = {
    bool: T.BooleanType(),
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bytes: T.BinaryType(),
    bytearray: T.BinaryType(),
    dt.datetime: T.TimestampType(),
    dt.date: T.DateType(),
    decimal.Decimal: T.DecimalType(38, 18),
}


def infer_spark_type(value: tp.Any) -> tp.Optional[T.DataType]:
    """Best-effort Spark type for a sample value; None → use pickle fallback."""
    if value is None:
        return None
    t = type(value)
    if t in _SIMPLE:
        # bool is a subclass of int — dict lookup by exact type handles it
        return _SIMPLE[t]
    if t is list:  # tuples stay pickled so they round-trip as tuples
        if not value:
            return None
        elem = infer_spark_type(value[0])
        if elem is None:
            return None
        # all elements must agree for a typed array
        for v in value[1:]:
            if infer_spark_type(v) != elem:
                return None
        return T.ArrayType(elem)
    if t is dict:
        if not value:
            return None
        kt = infer_spark_type(next(iter(value.keys())))
        vts = {str(infer_spark_type(v)) for v in value.values()}
        if kt is None or len(vts) != 1 or "None" in vts:
            return None
        return T.MapType(kt, infer_spark_type(next(iter(value.values()))))
    # numpy scalars
    mod = getattr(t, "__module__", "")
    if mod == "numpy":
        import numpy as np

        if isinstance(value, np.integer):
            return T.LongType()
        if isinstance(value, np.floating):
            return T.DoubleType()
        if isinstance(value, np.bool_):
            return T.BooleanType()
    return None


def infer_common_type(samples: tp.Iterable[tp.Any]) -> tp.Optional[T.DataType]:
    """Single type covering every sample, or None for the pickle fallback."""
    result: tp.Optional[T.DataType] = None
    saw_any = False
    for v in samples:
        if v is None:
            continue
        saw_any = True
        t = infer_spark_type(v)
        if t is None:
            return None
        if result is None:
            result = t
        elif result != t:
            # int+float promote to double; anything else → pickle
            kinds = {str(result), str(t)}
            if kinds == {"LongType()", "DoubleType()"}:
                result = T.DoubleType()
            else:
                return None
    return result if saw_any else None
