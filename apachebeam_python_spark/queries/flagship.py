"""Flagship query: pricing summary over ``lineitem`` (TPC-H-Q1-shaped).

Demonstrates the reference's core batch shape — ``Filter`` → ``CombinePerKey``
(multi-accumulator) → ordered output (SURVEY.md §2.2, §2.3: Beam
``Filter``/``CombinePerKey`` map to ``df.filter``/``groupBy().agg``; Catalyst
emits partial+final HashAggregate, i.e. Beam's "combiner lifting" for free).

Scale notes (100 TB): single shuffle on the 6-value group key; map-side
partial aggregation reduces shuffle traffic to O(groups × partitions);
predicate + column pruning reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import table
from ._registry import register

# The two product-sums use EXACT DECIMAL arithmetic in both engines:
# double accumulation order differs between Spark and DuckDB, and at
# sf0.1 (1.4M rows, sums ~3e9) the drift reaches the 6th decimal — a
# round() boundary hit (observed on sum_charge). Decimal sums are
# order-independent and have ≤6 exact decimals. Widths kept minimal so
# Spark's products stay long-backed compact decimals (precision ≤ 18 —
# ~35% faster than Decimal128 here, measured): (9,2)×(3,2)→(13,4);
# ×(3,2)→(17,6). Per-row values bound them at ANY sf: l_extendedprice
# ≤ ~105k < 10^7, discount/tax ∈ [0, 0.10].
#
# Output boundary (round 8, caught by the sf1.0 parity slice): the old
# round(CAST(sum AS DOUBLE), 6) broke at sf1.0 — sums reach ~2.8e10 where
# a double's ulp (~3.8e-6) exceeds the 1e-6 rounding quantum, so the
# engines' round() implementations disagreed in the last digit. Now the
# exact decimal sum is scaled to INTEGER units first (×1e4 / ×1e6 —
# exact, the sums have exactly 4/6 dp), cast to BIGINT, and converted
# back with ONE int64→double conversion + ONE division — both IEEE
# correctly-rounded on identical operands in both engines, so the bits
# match at any magnitude. Unit bound: charge micros < 2^63 up to ~sf300.
_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                          AS sum_qty,
  round(sum(l_extendedprice), 2)                                     AS sum_base_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
             * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            * 10000 AS BIGINT) AS DOUBLE) / 10000.0                  AS sum_disc_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
             * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
             * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2))))
            * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0              AS sum_charge,
  round(avg(l_quantity), 6)                                          AS avg_qty,
  round(avg(l_extendedprice), 6)                                     AS avg_price,
  round(avg(l_discount), 6)                                          AS avg_disc,
  count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q_pricing_summary", oracle=_ORACLE)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    # exact decimal products (see _ORACLE header note): order-independent
    # sums, final round is the identity — no float-boundary flakes at scale
    price_d = F.col("l_extendedprice").cast("decimal(9,2)")
    one_m_disc = F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    one_p_tax = F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)")
    disc_price = price_d * one_m_disc
    charge = disc_price * one_p_tax
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            ((F.sum(disc_price) * 10000).cast("long").cast("double") / 10000.0)
            .alias("sum_disc_price"),
            ((F.sum(charge) * 1000000).cast("long").cast("double") / 1000000.0)
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
