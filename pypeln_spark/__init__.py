"""pypeln_spark — a PySpark-native engine with the query/data-processing
capabilities of cgarciae/pypeln, re-architected Spark-first.

The reference's concurrency machinery (queues + worker pools,
pypeln/process/stage.py) is replaced wholesale by Catalyst plans over
DataFrames; what is preserved is the operator semantics, the hierarchical
order index, the lifecycle/DI contract and the four-namespace API
(SURVEY.md).

Top-level exports mirror ``import pypeln as pl`` usage::

    import pypeln_spark as pl

    stage = range(10) | pl.process.map(lambda x: x * 2) | pl.process.filter(lambda x: x > 4)
    list(stage)

plus the relational / streaming / LLM-pipeline layers the reference never
had (pl.relational, pl.streaming, pl.text, pl.dedup, pl.similarity).
"""

from . import modes
from .modes import process, sync, task, thread
from .operators import (
    concat,
    each,
    filter,  # noqa: A004
    flat_map,
    from_iterable,
    from_iterable_source,
    map,  # noqa: A004
    observe,
    map_rows,
    ordered,
    run,
    to_async_iterable,
    to_iterable,
)
from . import shared
from .io import (
    compact_parquet,
    load_tables,
    read_csv,
    read_table,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    read_xml,
    overwrite_partitions,
    write_bucketed,
    write_csv,
    write_jsonl,
    write_xml,
    write_orc,
    write_parquet,
)
from .session import get_spark
from .stage import Stage, to_stage
from .utils import Partial, PipelineException, StageStatus, WorkerInfo

__version__ = "0.1.0"

__all__ = [
    "Stage",
    "to_stage",
    "get_spark",
    "process",
    "thread",
    "task",
    "sync",
    "modes",
    "map",
    "observe",
    "map_rows",
    "shared",
    "flat_map",
    "filter",
    "each",
    "concat",
    "ordered",
    "from_iterable",
    "from_iterable_source",
    "to_iterable",
    "to_async_iterable",
    "run",
    "read_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "read_text",
    "write_parquet",
    "write_orc",
    "write_jsonl",
    "write_csv",
    "read_xml",
    "write_xml",
    "read_table",
    "write_bucketed",
    "overwrite_partitions",
    "compact_parquet",
    "load_tables",
    "Partial",
    "PipelineException",
    "WorkerInfo",
    "StageStatus",
]
