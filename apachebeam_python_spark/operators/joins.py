"""Join operators (SURVEY.md §2.4).

Beam has no first-class join; examples build them from ``CoGroupByKey``,
side-input dict lookups (broadcast hash join), and cross+filter DoFns. Here
every pattern is a real ``df.join`` so Catalyst/AQE picks the physical
algorithm (broadcast-hash / shuffled-hash / sort-merge / BNLJ) and can switch
at runtime (AQE broadcast conversion, skew-join splitting).

Scale guidance encoded below:
- dimension side of a star join → explicit ``F.broadcast`` (stable plan at
  any fact size; dims stay small — session.BROADCAST_DIMS);
- as-of joins avoid the naive per-row subquery entirely: union + one window
  pass = one shuffle on (key), linear in input;
- cross joins only for provably-tiny inputs (API takes a guard).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def equi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column, how: str = "inner") -> DataFrame:
    """CoGBK+flatten equivalent: equi join, any of inner/left/right/full."""
    return left.join(right, on=on, how=how)


def broadcast_join(fact: DataFrame, dim: DataFrame, on: Sequence[str] | Column, how: str = "inner") -> DataFrame:
    """Beam side-input (``AsDict``) lookup: broadcast the small side.

    The dim is replicated to every executor — no shuffle of the fact table.
    This is THE star-schema join plan at 100 TB (fact stays partitioned,
    dim rides the broadcast)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """Beam "exists" side-input pattern → left_semi (no right columns,
    no row multiplication — cheaper than inner+distinct)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """Beam "not exists" pattern → left_anti."""
    return left.join(right, on=on, how="left_anti")


def cross_join(left: DataFrame, right: DataFrame, *, max_right_rows: int | None = 10_000) -> DataFrame:
    """Beam keys-to-constant CoGBK → cartesian product. Guarded: the right
    side must be known-tiny (pass ``max_right_rows=None`` to opt out) —
    an unguarded cross join at 100 TB is a job-killer."""
    if max_right_rows is not None:
        n = right.limit(max_right_rows + 1).count()
        if n > max_right_rows:
            raise ValueError(f"cross_join right side has >{max_right_rows} rows")
    return left.crossJoin(right)


def range_join(left: DataFrame, right: DataFrame, equi: Column, band: Column) -> DataFrame:
    """Theta/band join: equi keys + range condition. The equi part keeps the
    physical plan a hash/sort-merge join (the band is a post-join filter);
    a pure-range join degrades to BNLJ — keep one side broadcastable then."""
    return left.join(right, on=equi & band, how="inner")


def cogroup_by_key(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_value: str,
    right_value: str,
    left_out: str = "left_values",
    right_out: str = "right_values",
) -> DataFrame:
    """Beam ``CoGroupByKey``: (K, {left:[...], right:[...]}) as a full-outer
    join of per-side grouped lists; absent side → empty list (Beam yields
    empty iterables, not NULL). Lists sorted for determinism.

    NULL keys join null-safely (eqNullSafe) — Beam groups None keys into ONE
    group; a plain USING join would split it into two one-sided rows."""
    lg = left.groupBy(*keys).agg(F.array_sort(F.collect_list(left_value)).alias(left_out))
    rg = right.groupBy(*[F.col(k).alias(f"_r_{k}") for k in keys]).agg(
        F.array_sort(F.collect_list(right_value)).alias(right_out)
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_r_{k}"))
        cond = c if cond is None else cond & c
    joined = lg.join(rg, on=cond, how="full_outer")
    return joined.select(
        *[F.coalesce(F.col(k), F.col(f"_r_{k}")).alias(k) for k in keys],
        F.coalesce(F.col(left_out), F.array().cast(f"array<{left.schema[left_value].dataType.simpleString()}>")).alias(left_out),
        F.coalesce(F.col(right_out), F.array().cast(f"array<{right.schema[right_value].dataType.simpleString()}>")).alias(right_out),
    )


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value: str,
    out: str = "asof_value",
) -> DataFrame:
    """As-of join (latest right value with right_ts ≤ left_ts per key) — the
    Beam stateful-DoFn pattern (SURVEY §2.4) as ONE window pass:

    union(left∪right, tagged) → per-key order by (ts, side) → carry
    ``last(right_value) ignore nulls`` → keep left rows.

    Single shuffle on keys, linear work — no per-row range scan, no skewed
    self-join; at 100 TB this is the plan you want for "latest quote ≤ trade".
    Right rows sort before left rows at equal ts (inclusive ≤ semantics).
    """
    lt = left.select(*keys, F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
                     F.lit(None).cast(right.schema[right_value].dataType).alias("_rv"),
                     F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"))
    rt = right.select(*keys, F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
                      F.col(right_value).alias("_rv"),
                      F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"))
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(out, F.last("_rv", ignorenulls=True).over(w))
    left_rows = carried.filter(F.col("_side") == 1)
    return left_rows.select(*[F.col("_lrow")[c].alias(c) for c in left.columns], F.col(out))
