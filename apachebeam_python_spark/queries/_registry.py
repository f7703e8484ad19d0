"""Query/oracle registry — the driver contract's backing store.

Every operator from SURVEY.md §2 is proven by a named query registered here:
a ``(spark, sf_dir) -> DataFrame`` builder plus (where SQL can express it) a
DuckDB oracle SQL string. ``__spark_entry__.py`` simply re-exports these.

Conventions (driver hash-compare, SURVEY §5.2):
- alias every computed column identically in Spark and SQL;
- round float aggregates in BOTH engines (SURVEY §7.4.4);
- make any collected list deterministic (``array_sort`` / ``ORDER BY`` in
  DuckDB ``list()``);
- nondeterministic / approx / non-SQL ops register with ``oracle=None`` →
  driver runs rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL or None (rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
