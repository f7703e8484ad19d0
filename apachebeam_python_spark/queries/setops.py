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
    driver=False,  # folded into q_setops
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
    driver=False,  # folded into q_setops
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
    driver=False,  # folded into q_setops
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
    driver=False,  # folded into q_setops
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
    driver=False,  # folded into q_setops
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


@register(
    "q_setops",
    oracle="""
SELECT 'union_all' AS tag, kind || '#' || nationkey AS key, count(*) AS n FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
) GROUP BY kind, nationkey
UNION ALL
SELECT 'union_distinct', CAST(nationkey AS VARCHAR), CAST(0 AS BIGINT) FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'intersect', CAST(nationkey AS VARCHAR), CAST(0 AS BIGINT) FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'except', CAST(nationkey AS VARCHAR), CAST(0 AS BIGINT) FROM (
  SELECT n_nationkey AS nationkey FROM nation
  EXCEPT
  SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
)
UNION ALL
SELECT 'except_all', o_orderpriority, count(*) FROM (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
) GROUP BY o_orderpriority
""",
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete SURVEY §2.6 set-operation family in ONE tagged driver row
    (folds q_union_all / q_union_distinct / q_intersect / q_except /
    q_except_all, pytest-only): Beam ``Flatten`` with multiplicity counts,
    distinct union (also the §2.3 Distinct primitive), INTERSECT, EXCEPT,
    and bag-difference EXCEPT ALL aggregated per priority. Every arm is
    hash-based (no sorts); unions of arms are zero-shuffle."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")

    ck = c.select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind"))
    sk = s.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind"))
    union_all = (
        S.flatten(ck, sk)
        .groupBy("kind", "nationkey")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("union_all").alias("tag"),
            F.concat_ws("#", "kind", "nationkey").alias("key"), "n",
        )
    )

    def _keyed(df, tag):
        return df.select(
            F.lit(tag).alias("tag"),
            F.col("nationkey").cast("string").alias("key"),
            F.lit(0).cast("long").alias("n"),
        )

    union_distinct = _keyed(
        S.union_distinct(
            c.select(F.col("c_nationkey").alias("nationkey")),
            s.select(F.col("s_nationkey").alias("nationkey")),
        ),
        "union_distinct",
    )
    inter = _keyed(
        S.intersect(
            c.filter(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("nationkey")),
            s.select(F.col("s_nationkey").alias("nationkey")),
        ),
        "intersect",
    )
    exc = _keyed(
        S.except_distinct(
            n.select(F.col("n_nationkey").alias("nationkey")),
            s.filter(F.col("s_acctbal") > 8000).select(F.col("s_nationkey").alias("nationkey")),
        ),
        "except",
    )
    exc_all = (
        S.except_all(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority"),
            o.filter(F.col("o_orderstatus") == "P").select("o_orderpriority"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("except_all").alias("tag"),
            F.col("o_orderpriority").alias("key"), "n",
        )
    )
    return union_all.unionByName(union_distinct).unionByName(inter).unionByName(exc).unionByName(exc_all)
