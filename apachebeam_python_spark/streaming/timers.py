"""Per-key event-time timers (SURVEY.md §2.9): the Beam ``TimerSpec`` /
``@on_timer`` surface, expressed with ``applyInPandasWithState`` +
``EventTimeTimeout``.

Pattern demonstrated: a session finalizer — per user, accumulate an event
count in state; (re)arm an event-time timer at ``last_event + gap``; when the
watermark passes the timer, the callback fires with ``state.hasTimedOut`` and
emits the finalized session exactly once, then clears state. This is the
timer idiom Beam examples use for "emit when the user goes quiet".

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
