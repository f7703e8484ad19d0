"""Stateful streaming processing (SURVEY.md §2.9): the Beam
``ValueState``/``BagState``/timer DoFn surface, Spark-style.

``applyInPandasWithState`` gives per-key mutable state + timeouts over
micro-batches (Beam state + processing-time timers ≈ GroupStateTimeout);
PySpark 4's ``transformWithStateInPandas`` adds true per-key event timers —
kept out of the oracle path (newest API) but the dedup below is the same
pattern.

State size is the scale constraint: per-key state lives in the state store
across batches — keep it O(small) per key (here: the set of seen event
types; bounded by the type domain).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_dedup_stream(events: DataFrame) -> DataFrame:
    """Streaming dedup-with-memory (Beam stateful DoFn with a SetState):
    emit each (user_id, event_type) the first time it is seen, suppress
    every later occurrence — across micro-batches, via per-key state.

    Output (the *set* of first-seen pairs) is deterministic even though
    in-batch arrival order is not, which makes it oracle-checkable:
    ``SELECT DISTINCT user_id, event_type FROM events``.

    State-encoding constraint: the seen-set is stored as a "\\x00"-joined
    string with "\\x01<null>" as the NULL sentinel, so an event_type
    containing "\\x00" (or equal to the sentinel) would corrupt state.
    Fixture-safe; if reused on arbitrary values, store a JSON array instead.
    """

    _NULL = "\x01<null>"  # state encoding for a NULL event_type (sortable)

    def dedup(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0].split("\x00")) if state.exists else set()
        out = []
        for pdf in pdfs:
            for et in pdf["event_type"]:
                enc = _NULL if et is None else et
                if enc not in seen:
                    seen.add(enc)
                    out.append(et)
        state.update(("\x00".join(sorted(seen)),))
        yield pd.DataFrame({"user_id": [key[0]] * len(out), "event_type": out})

    return events.groupBy("user_id").applyInPandasWithState(
        dedup,
        outputStructType="user_id long, event_type string",
        stateStructType="seen string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def threshold_alert_stream(events: DataFrame, threshold: float = 1000.0) -> DataFrame:
    """Stateful threshold-crossing alert (Beam ValueState accumulator DoFn):
    per user, accumulate ``value`` in event-time order and emit EXACTLY ONE
    alert row at the first event where the running total crosses
    ``threshold`` — the emit-on-transition shape (fraud/quota/billing
    alerts) that's distinct from dedup (emit-first) and sessionization
    (emit-on-timeout).

    State is two scalars per key (running total + alerted flag) — O(1),
    the ideal state-store profile. Determinism contract: rows are sorted
    by (ts, event_id) WITHIN each micro-batch before accumulating, so with
    the fixture's single-file replay (one batch) the crossing point is the
    batch-semantics answer exactly; across real unordered batches the
    accumulation order is batch-arrival — production wants the
    transformWithState event-time-timer form to reorder on watermark
    (streaming/tws.py pattern)."""

    def alert(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total, done, seen_prior = (
            state.get if state.exists else (0.0, False, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        out = []
        if not done and len(rows):
            rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
            n = 0
            for ts, v in zip(rows["ts"], rows["value"]):
                if done:
                    break
                n += 1
                total += 0.0 if pd.isna(v) else float(v)
                if total >= threshold:
                    done = True
                    out.append((key[0], ts, total, seen_prior + n))
        state.update((float(total), bool(done), int(seen_prior) + len(rows)))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "alert_ts", "cum_value", "n_seen"]
            )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            alert,
            outputStructType="user_id long, alert_ts timestamp, "
            "cum_value double, n_seen long",
            stateStructType="total double, done boolean, seen long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
