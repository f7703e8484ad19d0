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
# order-independent and have ≤6 exact decimals, so the final round is
# the identity and can never straddle a boundary. Widths kept minimal so
# Spark's products stay long-backed compact decimals (precision ≤ 18 —
# ~35% faster than Decimal128 here, measured): (9,2)×(3,2)→(13,4);
# ×(3,2)→(17,6). Per-row values bound them at ANY sf: l_extendedprice
# ≤ ~105k < 10^7, discount/tax ∈ [0, 0.10].
_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                          AS sum_qty,
  round(sum(l_extendedprice), 2)                                     AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
             * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 4)
                                                                     AS sum_disc_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
             * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
             * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE), 6)
                                                                     AS sum_charge,
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
            F.round(F.sum(disc_price).cast("double"), 4).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
