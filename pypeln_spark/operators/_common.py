"""Shared driver-side helpers for the element-wise operators."""

from __future__ import annotations

import typing as tp

from pyspark.sql import Column, types as T

from .. import infer
from ..stage import Stage
from ..utils import VALUE_COL, WorkerInfo, filter_kwargs


def parse_returns(returns: tp.Union[None, str, T.DataType]) -> tp.Optional[T.DataType]:
    if returns is None:
        return None
    if isinstance(returns, T.DataType):
        return returns
    return T._parse_datatype_string(returns)


def sample_values(stage: Stage, n: int = 1) -> tp.List[tp.Any]:
    rows = stage.df.select(VALUE_COL).take(n)
    vals = [r[VALUE_COL] for r in rows]
    if stage.pickled:
        vals = [infer.loads(v) for v in vals]
    return vals


def infer_out_type(
    f: tp.Callable, stage: Stage, kind: str
) -> tp.Optional[T.DataType]:
    """Apply ``f`` to one sampled element driver-side and infer the Spark type
    of the result. Any failure (f needs on_start resources, raises, yields an
    un-typable object) → None, which selects the pickled fallback — always
    correct, never fast. Pass ``returns=`` to skip the sample call entirely.
    """
    try:
        samples = sample_values(stage, 10)
        if not samples:
            # empty input: keep the input type, output is empty anyway
            return stage.df.schema[VALUE_COL].dataType if not stage.pickled else None
        kwargs = filter_kwargs(f, {"worker_info": WorkerInfo(0), "element_index": (0,)})
        outs = []
        for s in samples:
            out = f(s, **kwargs)
            if kind == "flat_map":
                outs.extend(list(out)[:20])
            else:
                outs.append(out)
        return infer.infer_common_type(outs)
    except Exception:
        return None


def is_column(f: tp.Any) -> bool:
    return isinstance(f, Column)
