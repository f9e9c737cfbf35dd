"""run — drain stages for their side effects
(reference: pypeln/process/api/run.py:15-43: concat the stages, iterate to
exhaustion, discard).

Lowering: Spark's built-in ``noop`` sink — a full compute of every row with
zero driver transfer (strictly better than iterating results back just to
drop them).
"""

from __future__ import annotations

import typing as tp

from ..stage import Stage, to_stage


def run(*stages: tp.Any, maxsize: int = 0) -> None:  # noqa: ARG001
    for s in stages:
        stage = to_stage(s)
        stage.df.write.format("noop").mode("overwrite").save()
