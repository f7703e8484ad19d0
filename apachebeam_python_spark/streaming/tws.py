"""``transformWithStateInPandas`` (PySpark 4 stateful API, SURVEY.md §2.9):
the closest Spark analogue to a full Beam stateful DoFn — named state
variables (ValueState/ListState/MapState) + lifecycle (init/close) on a
``StatefulProcessor`` class, per key, across micro-batches.

Demonstrated here: a running per-user value-sum with an emitted delta per
micro-batch — the Beam ``CombiningValueState`` pattern. Kept rows-only (the
API is the newest in Spark and intentionally out of the oracle path); the
older ``applyInPandasWithState`` carries the oracle-checked stateful query
(queries/streaming_q.q_stateful_dedup).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle


class RunningSumProcessor(StatefulProcessor):
    """Per-key running sum (Beam CombiningValueState): state survives across
    micro-batches; each batch emits the key's updated total."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._total = handle.getValueState("total", "total double")

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        prev = self._total.get()[0] if self._total.exists() else 0.0
        batch_sum = float(sum(pdf["value"].sum() for pdf in rows))
        total = prev + batch_sum
        self._total.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "running_total": [total]})

    def close(self) -> None:
        pass


def running_sum_stream(events: DataFrame) -> DataFrame:
    return events.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        RunningSumProcessor(),
        outputStructType="user_id long, running_total double",
        outputMode="append",
        timeMode="none",
    )


def tws_available() -> bool:
    """transformWithStateInPandas speaks a protobuf-based state-server
    protocol; this container lacks a working google.protobuf, so the API
    errors at runtime (verified 2026-08-13: ImportError 'descriptor').
    The processor above is the pattern; it activates wherever protobuf is
    installed — gate callers on this check."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
