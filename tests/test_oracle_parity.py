"""Parametrized oracle-parity test: every registered query with an oracle
must hash-match DuckDB at the test scale factor (the driver's t2 check,
run locally at sf0.001 for speed — the driver uses sf0.01)."""

from __future__ import annotations

import pytest

from apachebeam_python_spark import queries as q

from .parity import assert_parity

ORACLE_NAMES = sorted(q.ORACLES)
ROWS_ONLY_NAMES = sorted(set(q.QUERIES) - set(q.ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, ddb, sf_dir):
    df = q.QUERIES[name](spark, sf_dir)
    assert_parity(df, ddb, q.ORACLES[name], name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(name, spark, sf_dir):
    df = q.QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
