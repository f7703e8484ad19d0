"""Per-key timers (SURVEY.md §2.9): the Beam ``TimerSpec`` / ``@on_timer``
surface, expressed with ``applyInPandasWithState`` — BOTH Beam time domains:

- ``TimeDomain.WATERMARK`` → ``EventTimeTimeout``
  (:func:`session_finalizer_stream`): a session finalizer — per user,
  accumulate an event count in state; (re)arm an event-time timer at
  ``last_event + gap``; when the watermark passes the timer, the callback
  fires with ``state.hasTimedOut`` and emits the finalized session exactly
  once, then clears state. The "emit when the user goes quiet in EVENT
  time" idiom.
- ``TimeDomain.REAL_TIME`` → ``ProcessingTimeTimeout``
  (:func:`idle_key_flush_stream`): flush a key's accumulated state after it
  has received no new data for a WALL-CLOCK duration — Beam's
  processing-time ``@on_timer`` (cache eviction, slow-source flush,
  "give up waiting" patterns). No watermark required; firing depends on a
  later micro-batch running, exactly as Beam's processing-time timers
  depend on the runner's timer sweep.

Scale: state is one counter + one timestamp per active key; timers are state-
store entries evicted on fire — bounded by ACTIVE keys, not total keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def session_finalizer_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events must carry a watermark (EventTimeTimeout needs one)."""
    gap_ms = gap_minutes * 60 * 1000

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "last_event_ms": [last_ms]}
            )
            return
        n, last_ms = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            batch_max = int(pdf["ts"].max().timestamp() * 1000)
            last_ms = max(last_ms, batch_max)
        state.update((n, last_ms))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame({"user_id": [], "n_events": [], "last_event_ms": []})

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, last_event_ms long",
        stateStructType="n long, last_ms long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def idle_key_flush_stream(events: DataFrame, idle_ms: int = 1000) -> DataFrame:
    """Processing-time timer (Beam ``TimeDomain.REAL_TIME`` ``@on_timer``):
    per key, accumulate an event count; each batch re-arms a PROCESSING-time
    timeout ``idle_ms`` in the future; once the key sees no data for that
    long (and a later micro-batch runs), the timeout path emits the flush
    row exactly once and clears state.

    Needs no watermark — wall clock, not event time, drives it (which also
    makes it inherently rows-only for testing: the flush boundary depends on
    host scheduling, so there is no SQL oracle by nature).

    Scale: identical state-store posture to the event-time variant — one
    counter per ACTIVE key, timer entries evicted on fire. The idiom at
    100 TB: per-entity cache eviction / "source went quiet" alerts where
    waiting for watermark progress would stall on a silent partition.
    """

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})
            return
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        state.setTimeoutDuration(idle_ms)
        yield pd.DataFrame({"user_id": [], "n_events": []})

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
