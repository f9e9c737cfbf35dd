"""Client-side plumbing shared by all operators.

Re-expresses the reference's composition sugar (cgarciae/pypeln) on top of
Spark DataFrames:

- ``Partial`` / ``|`` piping   (reference: pypeln/utils.py:87-98)
- ``UNDEFINED`` currying marker (reference: pypeln/utils.py:118-125)
- ``function_args`` signature inspection used for dependency injection of
  ``worker_info`` / ``stage_status`` / ``element_index`` and ``on_start``
  resources (reference: pypeln/utils.py:128-129, pypeln/process/worker.py:71-118)
- ``PipelineException`` cross-worker error envelope
  (reference: pypeln/utils.py:21-39)

Everything in this module is pure Python that runs on the driver (and the
small bits that ship to executors are self-contained picklable callables).
"""

from __future__ import annotations

import functools
import inspect
import typing as tp

T = tp.TypeVar("T")

INDEX_COL = "_index"
VALUE_COL = "value"


class _Undefined:
    """Marker for 'argument not supplied' so operators can curry."""

    def __repr__(self) -> str:  # pragma: no cover
        return "UNDEFINED"

    def __bool__(self) -> bool:
        return False


UNDEFINED = _Undefined()


class PipelineException(Exception):
    """Error raised on the driver carrying the executor-side traceback.

    Mirrors the reference's (type, traceback-string) envelope
    (pypeln/utils.py:21-39); Spark already ships the Python worker traceback
    in the Py4J error message, we re-wrap it so user code can catch one
    stable exception type.
    """

    def __init__(self, exception_type: str, trace: str):
        self.exception_type = exception_type
        self.trace = trace
        super().__init__(exception_type, trace)

    def __str__(self) -> str:
        return f"{self.exception_type}\n\n{self.trace}"


class Partial(tp.Generic[T]):
    """A curried operator: ``pl.map(f)`` with no stage returns one of these.

    ``stage | partial`` and ``partial(stage)`` both apply it — identical
    semantics to the reference (pypeln/utils.py:87-98, docs/advanced.md:127-148).
    """

    def __init__(self, f: tp.Callable[[tp.Any], T]):
        self.f = f

    def __call__(self, stage) -> T:
        return self.f(stage)

    def __ror__(self, stage) -> T:
        return self.f(stage)

    def __or__(self, other: "Partial") -> "Partial":
        # compose two partials: (x | a | b) == b(a(x))
        return Partial(lambda stage: other.f(self.f(stage)))


def curry_stage(op: tp.Callable) -> tp.Callable:
    """Decorator: if the operator's ``stage`` arg is UNDEFINED, return a
    Partial awaiting the stage instead of executing."""

    sig = inspect.signature(op)

    @functools.wraps(op)
    def wrapper(*args, **kwargs):
        bound = sig.bind_partial(*args, **kwargs)
        stage = bound.arguments.get("stage", UNDEFINED)
        if isinstance(stage, _Undefined):
            def apply(s, _args=args, _kwargs=dict(kwargs)):
                kw = dict(_kwargs)
                kw["stage"] = s
                return op(*_args, **kw)
            return Partial(apply)
        return op(*args, **kwargs)

    return wrapper


def function_args(f: tp.Callable) -> tp.List[str]:
    """Names of f's parameters (the reference's DI contract keys off these)."""
    try:
        return list(inspect.signature(f).parameters)
    except (TypeError, ValueError):  # builtins etc.
        return []


def filter_kwargs(f: tp.Callable, available: tp.Dict[str, tp.Any]) -> tp.Dict[str, tp.Any]:
    """Subset of ``available`` that ``f`` declares by name (reference:
    pypeln/process/worker.py:71-118)."""
    names = set(function_args(f))
    return {k: v for k, v in available.items() if k in names}


class WorkerInfo(tp.NamedTuple):
    """Injected when a user fn declares ``worker_info``.

    ``index`` is the Spark partition id — the closest analogue of the
    reference's per-stage worker index (pypeln/process/worker.py:48-49).
    """

    index: int


class StageStatus:
    """Injected into ``on_done(stage_status)`` (reference:
    pypeln/process/worker.py:189-214, where done = active_workers == 0 over
    a shared namespace). Spark's analogue of a worker is the Python task
    over one partition, and on_done fires exactly as that task finishes —
    so ``done``/``active_workers`` describe THIS worker truthfully (it is
    finished; it has no live work), and ``processed`` is the REAL count of
    elements the worker consumed, tallied live in the harness loop.
    ``partition`` is the Spark partition id (the worker index). A GLOBAL
    in-flight view across workers is a driver-side question in a
    distributed engine — that's the ``observe`` surface
    (operators/observe.py): metrics ride the same action and land in an
    Observation / the streaming progress events."""

    __slots__ = ("processed", "partition")

    def __init__(self, processed: int = 0, partition: tp.Optional[int] = None):
        self.processed = processed
        self.partition = partition

    @property
    def done(self) -> bool:
        return True

    @property
    def active_workers(self) -> int:
        return 0

    def __repr__(self) -> str:  # reference parity: worker.py:211-214
        return (
            f"StageStatus(done = {self.done}, active_workers = "
            f"{self.active_workers}, processed = {self.processed}, "
            f"partition = {self.partition})"
        )
