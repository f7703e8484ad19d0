"""Event-time windowing operators (SURVEY.md §2.8) — batch path.

The reference's core demo surface: ``WindowInto(FixedWindows/SlidingWindows/
Sessions)`` + combiners. Spark expresses all three as grouping expressions
(``F.window`` / ``F.session_window``) that work identically over batch
DataFrames and streams — the batch path here is what the DuckDB oracle
checks; ``streaming.jobs`` reuses the same builders over ``readStream``
(assign-window-then-combine is one shuffle either way).

Semantics notes (oracle parity, SURVEY §7.4.2):
- Fixed/sliding windows align to the epoch (1970-01-01 UTC).
- ``session_window(gap)``: a session covers [first_ts, last_ts + gap]; an
  event starts a NEW session iff ``ts - prev_ts > gap`` (strictly greater —
  an event exactly ``gap`` after the previous one still MERGES; verified
  empirically, tests/test_operators.py::test_session_window_gap_boundary).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts: str, size: str, keys: Sequence[str] = (), **aggs: Column) -> DataFrame:
    """Beam ``FixedWindows(size)`` + CombinePerKey: one agg row per
    (window, keys). Emits ``window_start``/``window_end`` columns."""
    win = F.window(ts, size)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(*[a.alias(n) for n, a in aggs.items()])
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            *aggs.keys(),
        )
    )


def sliding(df: DataFrame, ts: str, size: str, slide: str, keys: Sequence[str] = (), **aggs: Column) -> DataFrame:
    """Beam ``SlidingWindows(size, period)``: each element lands in
    size/period overlapping windows (Spark expands them at assign time —
    input amplification is size/period, the same cost Beam pays)."""
    win = F.window(ts, size, slide)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(*[a.alias(n) for n, a in aggs.items()])
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            *aggs.keys(),
        )
    )


def session(df: DataFrame, ts: str, gap: str, keys: Sequence[str], **aggs: Column) -> DataFrame:
    """Beam ``Sessions(gap)``: merge-on-overlap sessions per key. Spark's
    native ``session_window`` does the merge in the agg (no self-join)."""
    win = F.session_window(ts, gap)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(*[a.alias(n) for n, a in aggs.items()])
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            *aggs.keys(),
        )
    )


def custom_window(df: DataFrame, window_expr: Column, keys: Sequence[str] = (), window_col: str = "window_start", **aggs: Column) -> DataFrame:
    """Beam custom ``WindowFn``: any deterministic ts→window-id mapping as an
    expression (e.g. calendar months via ``date_trunc``), then combine."""
    return (
        df.groupBy(window_expr.alias(window_col), *keys)
        .agg(*[a.alias(n) for n, a in aggs.items()])
    )
