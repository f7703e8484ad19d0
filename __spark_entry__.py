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
    oracle-checked by the local pytest sweep.

    Each callable releases any signature caches left by the PREVIOUS query
    before building (ADVICE r10 #4): operators that self-join an expensive
    subtree persist it via ``operators.dedup.register_cache``, and in a
    driver loop that constructs many queries in one session those persists
    would otherwise accumulate for the session lifetime. Releasing at the
    NEXT query's construction is safe — the prior result has been collected
    by then — and mirrors parity_dump's per-query release."""
    from apachebeam_python_spark.operators.dedup import release_signature_caches

    def _guarded(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_signature_caches()
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: _guarded(fn) for name, fn in _q.DRIVER_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted keys → rows-only check."""
    return dict(_q.DRIVER_ORACLES)
