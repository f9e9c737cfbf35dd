"""Sinks: to_iterable / to_async_iterable
(reference: pypeln/process/api/to_iterable.py:26-53, task/api/to_iterable.py:78-111).

``toLocalIterator`` pulls one partition at a time to the driver — the same
bounded-memory intent as the reference's ``maxsize`` on the main queue.
``return_index=True`` yields full ``Element(index, value)`` records.
"""

from __future__ import annotations

import typing as tp

from .. import infer
from ..stage import Stage, to_stage
from ..utils import INDEX_COL, UNDEFINED, VALUE_COL, curry_stage


class Element(tp.NamedTuple):
    index: tp.Tuple[int, ...]
    value: tp.Any


@curry_stage
def to_iterable(
    stage: tp.Any = UNDEFINED,
    maxsize: int = 0,  # noqa: ARG001 - toLocalIterator already bounds memory
    return_index: bool = False,
) -> tp.Iterable[tp.Any]:
    stage = to_stage(stage)
    df = stage.df

    def rows_of(d):
        # maxsize=0 means "unbounded buffer" in the reference — one collect()
        # job. maxsize>0 asks for bounded memory → toLocalIterator pulls one
        # partition at a time (one job per partition, slower but bounded).
        if maxsize and maxsize > 0:
            return d.toLocalIterator(prefetchPartitions=True)
        return iter(d.collect())

    if not stage.scalar:
        # table stage: yield Rows (or dicts) — closest to the reference's
        # "values are whatever you put in"
        for row in rows_of(df):
            yield row.asDict()
        return

    cols = ([INDEX_COL] if (return_index and stage.has_index) else []) + [VALUE_COL]
    for row in rows_of(df.select(*cols)):
        v = row[VALUE_COL]
        if stage.pickled and v is not None:
            v = infer.loads(v)
        if return_index and stage.has_index:
            yield Element(tuple(row[INDEX_COL]), v)
        else:
            yield v


async def to_async_iterable(
    stage: tp.Any = UNDEFINED,
    maxsize: int = 0,
    return_index: bool = False,
) -> tp.AsyncIterator[tp.Any]:
    """Async wrapper over to_iterable — pulls Spark partitions in a thread so
    the event loop stays responsive (reference: task/api/to_iterable.py)."""
    import asyncio

    it = iter(to_iterable(stage, maxsize=maxsize, return_index=return_index))
    loop = asyncio.get_event_loop()
    sentinel = object()
    while True:
        item = await loop.run_in_executor(None, next, it, sentinel)
        if item is sentinel:
            return
        yield item
