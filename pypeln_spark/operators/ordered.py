"""ordered — emit elements sorted by their hierarchical creation index
(reference: pypeln/process/api/ordered.py:12-20).

The reference buffers EVERYTHING in one worker's memory and warns about OOM
(ordered.py:65-66). Spark's sort is a distributed range-partitioned sort with
disk spill — strictly stronger: no OOM cliff, scales to any input. Arrays of
bigint compare lexicographically in Catalyst, which is exactly the
reference's ``Element.index`` total order (docs/advanced.md:120).

Streaming caveat: a global sort is only defined per-microbatch — use
``foreachBatch`` for that (SURVEY.md §7.3).
"""

from __future__ import annotations

import typing as tp

from pyspark.sql import functions as F

from ..stage import Stage, to_stage
from ..utils import INDEX_COL, UNDEFINED, curry_stage


@curry_stage
def ordered(stage: tp.Any = UNDEFINED, maxsize: int = 0) -> Stage:  # noqa: ARG001
    stage = to_stage(stage)
    if not stage.has_index:
        raise ValueError(
            "ordered() needs the hierarchical _index column; sources from "
            "from_iterable carry it automatically, table stages can declare "
            "one with Stage.with_index(*key_cols)"
        )
    return Stage(
        stage.df.orderBy(F.col(INDEX_COL).asc()),
        scalar=stage.scalar,
        pickled=stage.pickled,
    )
