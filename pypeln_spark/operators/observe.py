"""observe — in-flight pipeline metrics without a second pass.

The reference exposes live pipeline telemetry through ``stage_status``
(worker/done counters injected into ``on_done``, pypeln/process/worker.py:
189-214) and users fold their own counts at the consuming end. The
Spark-native home for that is ``DataFrame.observe``: named aggregate
expressions evaluated ON THE DATA AS IT FLOWS through the existing job —
no extra action, no second scan, exact values (unlike accumulators, which
double-count on task retry; observed metrics are tied to successful task
commits).

Batch: metrics land in an ``Observation`` readable after the first action.
Streaming: the same call surfaces per-epoch values in every progress
event (``query.lastProgress["observedMetrics"][name]``) — the monitoring
hook a 100 TB pipeline actually runs on (row drops, null rates, domain
violations observed inline, alerting off the progress stream).
"""

from __future__ import annotations

import typing as tp

from pyspark.sql import Column, Observation

from ..stage import Stage, to_stage


def observe(
    stage: tp.Any,
    *metrics: Column,
    name: tp.Optional[str] = None,
) -> tp.Tuple[Stage, tp.Optional[Observation]]:
    """Attach named metric aggregates to a stage's flow.

    Returns ``(stage, observation)``. For a BATCH stage, ``observation.get``
    blocks until the first action over the returned stage and then holds
    ``{alias: value}`` — pass aliased aggregates (``F.count(F.lit(1)).
    alias("rows")``). For a STREAMING stage an Observation cannot be used
    (Spark restriction); pass ``name=`` instead — the observation rides
    the query's progress events and the returned observation is None.
    """
    st = to_stage(stage)
    if st.df.isStreaming or name is not None:
        out = st.df.observe(name or "pypeln_metrics", *metrics)
        return Stage(out, scalar=st.scalar, pickled=st.pickled), None
    obs = Observation()
    out = st.df.observe(obs, *metrics)
    return Stage(out, scalar=st.scalar, pickled=st.pickled), obs
