"""Parametrized oracle-parity test: every registered query with an oracle
must hash-match DuckDB at the test scale factor (default sf0.01 — the scale
the driver checks at; override via SPARK_GRAFT_TEST_SF_DIR)."""

from __future__ import annotations

import pytest

from apachebeam_python_spark import queries as q

from .parity import assert_parity, driver_canon

ORACLE_NAMES = sorted(q.ORACLES)
ROWS_ONLY_NAMES = sorted(set(q.QUERIES) - set(q.ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, ddb, sf_dir):
    df = q.QUERIES[name](spark, sf_dir)
    assert_parity(df, ddb, q.ORACLES[name], name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(name, spark, sf_dir):
    df = q.QUERIES[name](spark, sf_dir)
    # the driver canonicalizes even rows-only results — a raw array column
    # crashes its count (q_approx_quantiles in round 1), so canon must succeed
    rows = driver_canon(df.toPandas())
    assert len(rows) >= 0
    assert len(df.columns) > 0
