"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke, rows>0).
``queries()`` / ``oracle_sql()`` expose the engine's oracle-checked query
registry (one named query per operator in SURVEY.md §2; see
``apachebeam_python_spark/queries/``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may load this module by file path (importlib), in which case the
# repo root is not necessarily importable — make the package resolvable
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from apachebeam_python_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["q_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver contract: ≤50 entries covering every SURVEY.md §2 family,
    ordered coverage-first (see ``queries/__init__.DRIVER_ORDER``). Folded-out
    variants remain in ``apachebeam_python_spark.queries.QUERIES`` and are
    oracle-checked by the local pytest sweep."""
    return dict(_q.DRIVER_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted keys → rows-only check."""
    return dict(_q.DRIVER_ORACLES)
