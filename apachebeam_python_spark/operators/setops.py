"""Set operators (SURVEY.md §2.6): Beam ``Flatten`` and the SQL set algebra.

``flatten`` is UNION ALL — a zero-shuffle metadata union (Beam's Flatten is
likewise free). distinct/intersect/except each cost one hash-aggregate
shuffle; at scale prefer pre-aggregated inputs so the shuffle carries keys,
not raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def flatten(*dfs: DataFrame) -> DataFrame:
    """Beam ``Flatten``: bag union (keeps duplicates), schema-aligned by name."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """Flatten + Distinct (SQL UNION)."""
    return flatten(*dfs).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL INTERSECT (distinct semantics)."""
    return a.intersect(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL EXCEPT (distinct semantics)."""
    return a.subtract(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL EXCEPT ALL (bag difference — multiplicity-aware)."""
    return a.exceptAll(b)
