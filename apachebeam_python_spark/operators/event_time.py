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


def resample_ffill(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    step: str = "1 hour",
) -> DataFrame:
    """Time-series resampling with forward fill (the hypertable
    `time_bucket_gapfill + locf` shape): per key, build the regular time
    grid spanning [min(ts), max(ts)] at ``step``, then carry the latest
    observation ≤ each grid point via the as-of join.

    Returns ``(keys..., grid_ts, ffill_value)``.

    Multiple observations at one (key, ts) collapse to max(value) first so
    the fill is deterministic (and matches DuckDB's ASOF JOIN tie behavior
    on a unique right side).

    100 TB plan: one agg for per-key bounds (tiny), grid explode is narrow
    (span/step rows per key, no shuffle), and the fill is the single-shuffle
    union+window as-of — never a per-grid-point range scan. Grid size is the
    only amplification knob; choose ``step`` so span/step stays sane per key.
    """
    from . import joins as _joins

    bounds = df.groupBy(*keys).agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("_t0"), F.col("_t1"), F.expr(f"INTERVAL {step}"))
        ).alias("grid_ts"),
    )
    obs = df.groupBy(*keys, ts_col).agg(F.max(value_col).alias("_obs"))
    return _joins.asof_join_union(
        grid, obs, list(keys), "grid_ts", ts_col, "_obs", out="ffill_value"
    )


def resample_linterp(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    step: str = "1 hour",
) -> DataFrame:
    """Linear-interpolation resampling (the gapfill `interpolate` twin of
    :func:`resample_ffill`): each grid point gets
    ``prev + (next-prev) * (t-prev_t)/(next_t-prev_t)`` from its bracketing
    observations; grid points outside the observed range take the nearest
    endpoint. Exact hits reduce to the observation itself (fraction 0).

    Same scale shape as the as-of fill — union grid∪obs, ONE shuffle on the
    key, two linear window passes (carry-backward via a mirrored frame, no
    extra shuffle since both frames share the partition+order).
    """
    bounds = df.groupBy(*keys).agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("_t0"), F.col("_t1"), F.expr(f"INTERVAL {step}"))
        ).alias("_ts"),
    ).select(*keys, "_ts", F.lit(None).cast("double").alias("_obs"), F.lit(1).alias("_is_grid"))
    obs = (
        df.groupBy(*keys, ts_col).agg(F.max(value_col).cast("double").alias("_obs"))
        .select(*keys, F.col(ts_col).alias("_ts"), "_obs", F.lit(0).alias("_is_grid"))
    )
    u = grid.unionByName(obs)
    from pyspark.sql import Window

    order = [F.col("_ts"), F.col("_is_grid")]
    wb = Window.partitionBy(*keys).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # carry-backward frame (r12, guide §1.2 per-task work): the natural
    # [currentRow, unboundedFollowing] frame puts Spark's window exec in
    # its recompute-per-row mode — O(rows²) per key partition (profiled:
    # the whole query was this frame). first() over the rows AFTER the
    # current one under (ts, is_grid) ASC selects the SAME row as a
    # RUNNING last() under the REVERSED order (ts, is_grid) DESC — the
    # frame [begin, current] in DESC order IS the set [current, end] in
    # ASC order — and a running frame is the O(rows) streaming mode. Both
    # windows share one exchange (same partition keys); the second sort is
    # the price, linear vs quadratic.
    rev = [F.col("_ts").desc(), F.col("_is_grid").desc()]
    wf = Window.partitionBy(*keys).orderBy(*rev).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    et = F.col("_ts").cast("double")
    obs_t = F.when(F.col("_obs").isNotNull(), et)
    stamped = u.select(
        *keys, "_ts", "_is_grid", et.alias("_et"),
        F.last("_obs", ignorenulls=True).over(wb).alias("_pv"),
        F.last(obs_t, ignorenulls=True).over(wb).alias("_pt"),
        F.last("_obs", ignorenulls=True).over(wf).alias("_nv"),
        F.last(obs_t, ignorenulls=True).over(wf).alias("_nt"),
    )
    interp = (
        F.when(F.col("_pv").isNull(), F.col("_nv"))
        .when(F.col("_nv").isNull(), F.col("_pv"))
        .when(F.col("_nt") == F.col("_pt"), F.col("_pv"))
        .otherwise(
            F.col("_pv")
            + (F.col("_nv") - F.col("_pv"))
            * (F.col("_et") - F.col("_pt"))
            / (F.col("_nt") - F.col("_pt"))
        )
    )
    return stamped.filter(F.col("_is_grid") == 1).select(
        *keys, F.col("_ts").alias("grid_ts"), F.round(interp, 6).alias("interp_value")
    )
