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


def funnel_stream(events: DataFrame) -> DataFrame:
    """Stateful ONLINE funnel (Beam multi-ValueState DoFn; round 5): per
    user, track the first 'view', the first 'click' strictly after it, and
    the first 'purchase' strictly after that — emitting one
    (user_id, step_no, step_ts) row at the moment each stage is first
    reached. The fourth member of the stateful family: emit-first (dedup),
    emit-on-transition (threshold), emit-on-timeout (sessions), and now
    emit-per-milestone.

    State is three timestamps per key — O(1). Determinism contract: rows
    sort by (ts, event_id) within each micro-batch, and stage predicates
    use strict event-time comparisons, so the milestones equal the batch
    funnel's chained min-aggregates whenever batches arrive in event-time
    order (the fixture replay's property; out-of-order production streams
    want the tws event-time-timer reorder, same as threshold alerts)."""

    def steps(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        v_ms, c_ms, p_ms = state.get if state.exists else (0, 0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        out = []
        if len(rows) and not p_ms:
            rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
            for ts, et in zip(rows["ts"], rows["event_type"]):
                ms = int(ts.timestamp() * 1_000_000)
                if not v_ms and et == "view":
                    v_ms = ms
                    out.append((key[0], 1, ts))
                elif v_ms and not c_ms and et == "click" and ms > v_ms:
                    c_ms = ms
                    out.append((key[0], 2, ts))
                elif c_ms and not p_ms and et == "purchase" and ms > c_ms:
                    p_ms = ms
                    out.append((key[0], 3, ts))
                    break  # funnel complete — state is terminal
        state.update((int(v_ms), int(c_ms), int(p_ms)))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "step_no", "step_ts"])

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            steps,
            outputStructType="user_id long, step_no int, step_ts timestamp",
            stateStructType="v_ms long, c_ms long, p_ms long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cdc_materialize_stream(events: DataFrame) -> DataFrame:
    """Stateful CDC materialization (the streaming upsert / last-write-wins
    view): per user, keep the LATEST event by (ts, event_id) and emit the
    key's current row once per micro-batch that touches it — the
    change-stream → materialized-snapshot pattern every streaming lakehouse
    sink runs (Beam: ValueState holding the newest version; Spark:
    applyInPandasWithState with O(1) state per key).

    State is one row per key (the current version) — the upsert profile.
    The emitted stream is an UPDATE LOG: downstream (or the batch step in
    q_stream_cdc_materialize) takes the last emission per key, which equals
    the batch last-row-per-user answer exactly because versions are ordered
    by the total (ts, event_id) key both here and in the oracle."""

    def upsert(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_ts, cur_id, cur_type, cur_val = state.get
        else:
            cur_ts, cur_id, cur_type, cur_val = (None, -1, None, None)
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
            last = rows.iloc[-1]
            last_key = (last["ts"].value, int(last["event_id"]))
            if cur_ts is None or last_key > (cur_ts, cur_id):
                cur_ts = last["ts"].value  # epoch nanos — integer-exact state
                cur_id = int(last["event_id"])
                cur_type = str(last["event_type"])
                cur_val = None if pd.isna(last["value"]) else float(last["value"])
            state.update((int(cur_ts), int(cur_id), cur_type, cur_val))
            yield pd.DataFrame(
                [
                    (
                        key[0],
                        pd.Timestamp(cur_ts, unit="ns"),
                        cur_id,
                        cur_type,
                        cur_val,
                    )
                ],
                columns=["user_id", "last_ts", "event_id", "event_type", "value"],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        upsert,
        outputStructType="user_id long, last_ts timestamp, event_id long, "
        "event_type string, value double",
        stateStructType="ts_nanos long, event_id long, event_type string, "
        "value double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
