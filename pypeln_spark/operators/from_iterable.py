"""Source: lift a Python (a)sync iterable into a Stage.

Reference: pypeln/process/api/from_iterable.py:11-77 and the async-native
variant pypeln/task/api/from_iterable.py:14-83. Elements get the flat
creation-order index ``(i,)`` exactly like the reference
(from_iterable.py:22-28).

Lowering: the iterable is drained driver-side into an Arrow-backed
``createDataFrame`` (typed column when every element maps onto one Spark
type, pickled BinaryType otherwise — see infer.py). The reference's
``use_thread``/``maxsize`` knobs control queue plumbing that Spark doesn't
have; they are accepted and ignored for API parity. Unbounded iterables
should go through the streaming module instead (readStream / rate source) —
a driver-side list is the honest batch semantics.
"""

from __future__ import annotations

import asyncio
import inspect
import typing as tp

from pyspark.sql import SparkSession, types as T

from .. import infer
from ..stage import Stage
from ..utils import INDEX_COL, VALUE_COL


def _drain(iterable: tp.Any) -> tp.List[tp.Any]:
    if hasattr(iterable, "__aiter__") and not hasattr(iterable, "__iter__"):
        async def collect():
            return [x async for x in iterable]

        return asyncio.new_event_loop().run_until_complete(collect())
    if inspect.isgenerator(iterable) or not isinstance(iterable, (list, tuple)):
        return list(iterable)
    return list(iterable)


def from_iterable(
    iterable: tp.Any,
    maxsize: int = 0,  # noqa: ARG001 - parity knob, Spark pulls
    use_thread: bool = True,  # noqa: ARG001 - parity knob
    spark: tp.Optional[SparkSession] = None,
    returns: tp.Optional[tp.Union[str, T.DataType]] = None,
) -> Stage:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        from ..session import get_spark

        spark = get_spark()

    values = _drain(iterable)

    if isinstance(returns, str):
        returns = T._parse_datatype_string(returns)
    out_type = returns if returns is not None else infer.infer_common_type(values[:200])
    if out_type is not None and len(values) > 200:
        # make sure the tail agrees too; fall back to pickle on any clash
        full = infer.infer_common_type(values)
        out_type = full if returns is None else out_type
    pickled = out_type is None

    schema = T.StructType(
        [
            T.StructField(INDEX_COL, T.ArrayType(T.LongType()), False),
            T.StructField(VALUE_COL, out_type if not pickled else T.BinaryType(), True),
        ]
    )
    rows = [
        ([i], infer.dumps(v) if pickled else v)
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, schema=schema)
    return Stage(df, scalar=True, pickled=pickled)
