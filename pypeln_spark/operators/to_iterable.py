"""Sinks: to_iterable / to_async_iterable
(reference: pypeln/process/api/to_iterable.py:26-53, task/api/to_iterable.py:78-111).

RECOMMENDED USAGE — pass ``maxsize>0`` for anything that might be large::

    for row in pl.to_iterable(stage, maxsize=1):   # partition-at-a-time
        ...

``toLocalIterator`` then pulls one partition at a time to the driver — the
same bounded-memory intent as the reference's ``maxsize`` on the main
queue. The default ``maxsize=0`` matches the reference's "unbounded main
queue" semantics: ONE collect() job, i.e. the whole result materializes in
driver memory at once — fine for aggregates and samples, wrong for a
full-table sink (a warning fires past COLLECT_WARN_ROWS rows).
``return_index=True`` yields full ``Element(index, value)`` records.
"""

from __future__ import annotations

import typing as tp
import warnings

from .. import infer
from ..stage import Stage, to_stage
from ..utils import INDEX_COL, UNDEFINED, VALUE_COL, curry_stage

# maxsize=0 collects past this many rows -> advise the bounded path. The
# check is post-collect (len() of the already-built list) so the hot path
# never pays an extra Spark job for the advice.
COLLECT_WARN_ROWS = 100_000


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
        rows = d.collect()
        if len(rows) > COLLECT_WARN_ROWS:
            warnings.warn(
                f"to_iterable(maxsize=0) collected {len(rows):,} rows into "
                "driver memory in one job; pass maxsize>0 to pull one "
                "partition at a time with bounded memory",
                ResourceWarning,
                stacklevel=3,
            )
        return iter(rows)

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
