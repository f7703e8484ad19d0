"""Sort/limit and set-operation queries (SURVEY.md §2.6), backed by
``operators.setops`` and ``operators.aggregations.top_k_global``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import aggregations as agg
from ..operators import setops as S
from ..session import table
from ._registry import register


@register(
    "q_order_limit",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_orderdate, round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY + LIMIT → TakeOrderedAndProject (partial top-k per
    partition, no global sort). Total order via o_orderkey tiebreak."""
    o = table(spark, sf_dir, "orders")
    top = agg.top_k_global(
        o,
        [F.col("o_orderpriority"), F.col("o_totalprice").desc(), F.col("o_orderkey")],
        20,
    )
    return top.select(
        "o_orderkey", "o_orderpriority", "o_orderdate",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


@register(
    "q_union_all",
    oracle="""
SELECT nationkey, kind, count(*) AS n FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
) GROUP BY nationkey, kind
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beam ``Flatten``: bag union keeping duplicates (zero-shuffle), then a
    count to make the multiplicity observable."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind")
    )
    return S.flatten(c, s).groupBy("nationkey", "kind").agg(F.count("*").alias("n"))


@register(
    "q_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten + Distinct (SQL UNION)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return S.union_distinct(c, s)


@register(
    "q_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both rich customers & suppliers."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return S.intersect(c, s)


@register(
    "q_except",
    oracle="""
SELECT n_nationkey AS nationkey FROM nation
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with no high-balance supplier (non-empty at
    every fixture sf — verified 13 rows at sf0.01)."""
    n = table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 8000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return S.except_distinct(n, s)


@register(
    "q_except_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
""",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference, multiplicity-aware): per-priority surplus
    of finished over pending orders."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_orderpriority")
    return S.except_all(f, p)
