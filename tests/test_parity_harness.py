"""Meta-tests for the parity harness itself (VERDICT r1 #4): the local
compare must be driver-faithful — it has to FAIL on exactly the defect
classes that slipped through to the driver in round 1:

1. DuckDB integer ``sum()`` → HUGEINT → pandas float64 ('123.0' vs '123')
   while ``fetchall()`` hid it by yielding Python ints.
2. Raw array columns, which crash the driver's pandas sort_values canon.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from .parity import assert_parity


def test_uncast_hugeint_sum_fails(spark, ddb):
    """DuckDB sum(BIGINT) yields HUGEINT → float64 via .df(); an oracle that
    forgets CAST(... AS BIGINT) must fail locally even though values match."""
    df = spark.range(3).agg(F.sum("id").cast("long").alias("s"))
    with pytest.raises(AssertionError, match="s"):
        # range(3) sum = 3 in both engines; only the dtype differs.
        assert_parity(df, ddb, "SELECT sum(x) AS s FROM (VALUES (0),(1),(2)) t(x)", name="hugeint")
    # the cast form passes
    assert_parity(df, ddb, "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (0),(1),(2)) t(x)", name="hugeint_cast")


def test_raw_array_column_fails(spark, ddb):
    """An array-typed result column must fail the driver-canon layer (the
    driver's sort_values crashes on ndarray cells)."""
    df = spark.range(2).select(F.array(F.col("id"), F.col("id") + 1).alias("a"))
    with pytest.raises(AssertionError, match="canon|array"):
        assert_parity(df, ddb, "SELECT [x, x + 1] AS a FROM (VALUES (0),(1)) t(x)", name="arr")
    # the serialized form passes
    ser = spark.range(2).select(
        F.array_join(F.array(F.col("id"), F.col("id") + 1), ",").alias("a")
    )
    assert_parity(
        ser, ddb,
        "SELECT array_to_string([x, x + 1], ',') AS a FROM (VALUES (0),(1)) t(x)",
        name="arr_ser",
    )
