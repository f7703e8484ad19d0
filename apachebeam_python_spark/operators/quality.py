"""Data-quality constraint checking (SURVEY.md §2.11 pipeline hygiene —
the validate-before-train step): declarative checks evaluated in ONE
aggregate pass over the table, Deequ-style.

Each check is a boolean Column ("the row is valid"); the report is one row
per check with its violation count. Uniqueness (a set-level property) rides
the same aggregate via count - count_distinct.

100 TB plan: every check folds into a single partial+final hash aggregate
over ONE scan — validating a corpus costs the same as counting it. The
result is O(checks) rows. No second pass, no per-check scans, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    checks: dict[str, Column],
    *,
    unique: Sequence[str] = (),
) -> DataFrame:
    """Evaluate all constraints in one aggregate pass.

    ``checks``: name → boolean validity expression; a row violates the check
    when the expression is false OR null (SQL three-valued logic would
    otherwise let nulls slide through).
    ``unique``: columns that must hold distinct non-null values; violations
    = count(col) - count_distinct(col) (null-ness is a separate
    completeness check by design).

    Returns ``(check_name, violations, n_rows, passed)`` — one row per
    check, ``passed`` as int (1/0) for engine-portable comparison.
    """
    if not checks and not unique:
        raise ValueError("no constraints given")
    aggs = [F.count("*").cast("long").alias("_n")]
    names: list[str] = []
    for name, cond in checks.items():
        names.append(name)
        aggs.append(
            F.sum(F.when(cond.isNull() | ~cond, 1).otherwise(0))
            .cast("long")
            .alias(name)
        )
    for col in unique:
        name = f"{col}_unique"
        names.append(name)
        aggs.append(
            (F.count(col) - F.count_distinct(F.col(col))).cast("long").alias(name)
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.select(
        F.expr(f"stack({len(names)}, {stack_args}) AS (check_name, violations)"),
        F.col("_n").alias("n_rows"),
    ).select(
        "check_name",
        "violations",
        "n_rows",
        (F.col("violations") == 0).cast("int").alias("passed"),
    )
