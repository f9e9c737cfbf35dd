"""transformWithState — Spark 4's arbitrary-stateful streaming API, gated.

``DataFrame.groupBy(...).transformWithStateInPandas`` supersedes
``applyInPandasWithState`` (streaming.py / queries/streaming.py) with typed
state variables (ValueState / ListState / MapState), optional TTL, and
event-/processing-time timers, backed by the RocksDB state store. It is the
forward path for every custom stateful operator in this engine (running
totals, KMV/CMS sketch state, funnels, sessionization).

FEATURE-GATED: the driver-side state server speaks protobuf
(``google.protobuf``), which this container does not ship, and the brief
forbids installing packages — so everything here degrades to
``available() == False`` and a clear ImportError, exactly like the PIL gate
in ext/multimodal.py. The applyInPandasWithState implementations remain the
verified production path; the suite's TWS tests skip when the dependency is
absent and exercise the real engine when it exists.

Scale notes (what this buys at 100 TB): RocksDB state lives off-heap with
incremental checkpointing (changelog), so per-key state no longer needs to
fit the executor heap; MapState gives O(1) point updates instead of
rewriting a whole pickled blob per key per batch; TTL bounds state without
hand-rolled expiry columns.
"""

from __future__ import annotations

import typing as tp

from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def available() -> bool:
    """True when the transformWithState runtime dependency (protobuf) exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _require() -> None:
    if not available():
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package for its "
            "state-server protocol, which is not installed in this "
            "environment. Use the applyInPandasWithState operators "
            "(pypeln_spark.streaming / queries.streaming) — same semantics, "
            "shipped and oracle-verified — or install protobuf where allowed."
        )


def transform_with_state(
    df: DataFrame,
    keys: tp.Sequence[str],
    processor: tp.Any,  # pyspark.sql.streaming.stateful_processor.StatefulProcessor
    output_schema: str,
    output_mode: str = "Update",
    time_mode: str = "None",
) -> DataFrame:
    """Apply a StatefulProcessor per key group, configuring the RocksDB
    state store the API requires. Returns the (streaming) output DataFrame;
    drive it with streaming.run_to_memory / staged_replay as usual."""
    _require()
    spark = df.sparkSession
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=output_schema,
        outputMode=output_mode,
        timeMode=time_mode,
    )


def make_event_type_counts_processor():
    """Reference processor: per-key event-type counts held in MapState —
    the TWS spelling of a streaming ``GROUP BY key, event_type COUNT(*)``
    with O(1) per-event point updates (vs. rewriting one pickled tuple per
    key in the applyInPandasWithState version). Emits the key's full count
    map each batch (Update mode → memory-sink latest-wins)."""
    _require()
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EventTypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.counts = handle.getMapState("counts", "etype string", "n bigint")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ARG002
            for pdf in rows:
                for et, grp in pdf.groupby("event_type"):
                    prev = (
                        self.counts.getValue((et,))[0]
                        if self.counts.containsKey((et,))
                        else 0
                    )
                    self.counts.updateValue((et,), (prev + len(grp),))
            items = sorted((k[0], v[0]) for k, v in self.counts.iterator())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(items),
                    "event_type": [k for k, _ in items],
                    "n_events": [n for _, n in items],
                }
            )

        def close(self) -> None:
            pass

    return EventTypeCounts()
