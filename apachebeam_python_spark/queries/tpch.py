"""Warehouse-benchmark join/agg shapes (TPC-H-style, SURVEY §2.3-2.4,
§2.6 composition showcase).

The flagship q_pricing_summary (Q1 shape) and q_shipping_priority (Q3
shape) cover the scan-agg and selective-star families; this module rounds
out the classic decision-support vocabulary a reference user would expect
to run unchanged: multi-way join reordering (Q7/Q8), conditional-share
aggregation (Q8/Q14), left-outer histograms (Q13), decorrelated scalar
subqueries (Q17), and aggregate-membership semi joins (Q18). Constants
are adapted to the fixture's value domains (NATION_i, Brand#N, one-word
p_type, 1995-2001 dates); revenue always sums through DECIMAL(18,4) so
hashes are order-independent at any scale (SURVEY §7.4.4).

100 TB design notes are per-query; the common spine: dimension tables
(nation, region, filtered customer/supplier/part) broadcast, fact-side
filters are pushed into the parquet scan, and every aggregation is a
partial+final hash agg on the fact table's natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import table
from ._registry import register


def _rev(expr_price="l_extendedprice", expr_disc="l_discount"):
    """Exact order-independent revenue term: price·(1−disc) via DECIMAL."""
    return (F.col(expr_price) * (1 - F.col(expr_disc))).cast("decimal(18,4)")


# --------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations
# --------------------------------------------------------------------------
@register(
    "q_volume_shipping",
    driver=False,  # §2.4 multi-way join reordering — pytest oracle
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE), 4) AS DOUBLE) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1, 2, 3
""",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume: revenue shipped between two
    specific nations (either direction) by year. The disjunctive nation
    predicate is the planning challenge: it can't be split per join side,
    so both nation joins stay selective broadcasts and the pair filter
    runs on the joined row.

    Scale: nation is 25 rows (broadcast, always); supplier and customer
    reduce to the two relevant nations BEFORE touching facts — the
    broadcast inner joins on s/c act as semi-filters, so lineitem and
    orders shuffle only on their own equi keys and AQE sees tiny build
    sides. The year agg is a partial+final hash agg on a 2×2×|years|
    result."""
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("s_nationkey"),
                                 F.col("n_name").alias("supp_nation"))),
            "s_nationkey",
        )
        .select("s_suppkey", "supp_nation")
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("c_nationkey"),
                                 F.col("n_name").alias("cust_nation"))),
            "c_nationkey",
        )
        .select("c_custkey", "cust_nation")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()).cast("double"), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8 shape: national market share within a region
# --------------------------------------------------------------------------
@register(
    "q_market_share",
    driver=False,  # §2.3 conditional-share aggregation — pytest oracle
    oracle="""
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
           AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'EUROPE'
    AND p.p_type = 'PROMO'
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                          AND TIMESTAMP '1997-12-31'
)
GROUP BY o_year
""",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — one nation's share of a region's PROMO-part revenue
    by order year: the conditional-share aggregation (numerator = CASE'd
    subset of the same sum). Both numerator and denominator sum through
    DECIMAL before ONE double division, so the share is exact and
    order-independent; a region with revenue is guaranteed by the
    denominator's own group (no 0/0 guard needed — groups exist only
    where volume rows exist).

    Scale: five dimension joins — all broadcast (nation/region always;
    PROMO-filtered part and region-filtered customer reduce ~5-25× before
    broadcast). lineitem is the only shuffled table, once on l_orderkey;
    the share agg is |years| rows."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cust_nk"))
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nk")
    ).select("c_custkey")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nk")
    ).select("s_suppkey", "supp_nation")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0.0).cast("decimal(18,4)")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q10 shape: returned-item revenue ranking
# --------------------------------------------------------------------------
@register(
    "q_returned_items",
    driver=False,  # §2.4+§2.6 ranked join rollup — pytest oracle
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE), 4) AS DOUBLE) AS revenue,
       round(c.c_acctbal, 2) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                        AND TIMESTAMP '1996-12-31'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — the 20 customers who returned the most revenue in
    a year: selective fact filter (returnflag + order date) feeding a
    customer rollup with dimension attributes carried through the
    grouping key, then a deterministic (revenue, custkey) global top-20.

    Scale: returnflag and the order-date window prune the fact side at
    the scan (both PushedFilters); nation broadcasts; the customer join
    shuffles on custkey once and the rollup rides the same partitioning.
    ORDER BY + LIMIT collapses to TakeOrderedAndProject — per-partition
    top-20, no global sort."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1996-12-31").cast("timestamp"),
        )
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()).cast("double"), 4).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q13 shape: customer order-count distribution
# --------------------------------------------------------------------------
@register(
    "q_cust_order_distribution",
    driver=False,  # §2.4 outer-join histogram — pytest oracle
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — how many customers placed how many (non-urgent)
    orders, INCLUDING the zero bucket: the left-outer histogram.
    count(o_orderkey) (not count(*)) makes unmatched customers count 0 in
    both engines; the join-side predicate lives in the ON clause so those
    customers survive the outer join.

    Scale: two aggregations — the per-customer count rides the join's
    custkey shuffle; the distribution rollup is a |distinct counts|-sized
    partial+final agg. At 100 TB pre-aggregate orders per custkey BEFORE
    the outer join (same result, order-side shuffle halves)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q14 shape: promo revenue share for one month
# --------------------------------------------------------------------------
@register(
    "q_promo_revenue",
    driver=False,  # §2.3 conditional-ratio aggregate — pytest oracle
    oracle="""
SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS DECIMAL(18,4))
                  ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE), 6)
         AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — what fraction of one month's revenue came from
    PROMO parts: the global conditional-ratio aggregate. Numerator and
    denominator sum through DECIMAL and divide ONCE in double, so the
    percentage is exact before its 6 dp round. The month is chosen
    inside the fixture's date span, so the denominator is non-empty by
    construction (and a 0/0 would return an empty result identically in
    both engines, since a global agg over zero joined rows yields NULL
    pct — still hash-equal).

    Scale: part broadcasts onto the month-pruned lineitem scan (shipdate
    range is a PushedFilter); the whole query is one map-side-combinable
    global agg — no shuffle beyond the 1-row final merge."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0.0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
                ).cast("double")
                / F.sum(_rev()).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue (decorrelated scalar subquery)
# --------------------------------------------------------------------------
@register(
    "q_small_qty_revenue",
    driver=False,  # §2.4 decorrelated scalar subquery — pytest oracle
    oracle="""
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)))
             AS DOUBLE) / 7.0, 4) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey AS agg_partkey,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                / count(*)) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
) t ON t.agg_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#7'
  AND l.l_quantity < t.qty_threshold
""",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — average yearly revenue lost if small-quantity
    orders (below 20% of the part's average order size) were not filled,
    for one brand. The classic correlated scalar subquery, written in its
    decorrelated form IDENTICALLY in both engines (per-part thresholds as
    a join table) so neither optimizer's decorrelation strategy can
    change semantics. The per-part average divides a DECIMAL sum by an
    exact count, making the 0.2·avg threshold bit-identical across
    engines (order-independent), so the strict < cut agrees everywhere.

    Scale: the threshold table is a partial+final agg on l_partkey (the
    fact table's own key — no extra shuffle if lineitem is bucketed by
    partkey); the brand filter reduces part to ~1/|brands| before its
    broadcast. Joining thresholds BEFORE filtering by brand would shuffle
    the full fact table twice — the plan keeps the brand semi-filter
    first."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#7").select(
        "p_partkey"
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count("*")
            )
        ).alias("qty_threshold")
    )
    branded = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return (
        branded.join(thresholds, branded.l_partkey == thresholds.agg_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast(
                    "double"
                )
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q18 shape: large-volume orders (aggregate-membership semi join)
# --------------------------------------------------------------------------
@register(
    "q_large_orders",
    driver=False,  # §2.4 agg-membership semi join — pytest oracle
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       CAST(round(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,4)))
            AS DOUBLE), 4) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o.o_orderkey
LIMIT 20
""",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — the 20 biggest orders whose total quantity tops a
    threshold: an IN-subquery over a grouped HAVING, i.e. a semi join
    against an AGGREGATED set (not a raw column). Spark expresses the
    membership as a left-semi join on the aggregated keys — same
    semantics, explicit plan. The quantity HAVING compares integral
    doubles (exact at any partitioning); the output sum goes through
    DECIMAL by repo convention.

    Scale: the HAVING-set build is a partial+final agg on l_orderkey —
    at 100 TB its map-side combine collapses each partition's order
    fragments before the shuffle, and the surviving key set (top ~0.1%)
    broadcasts back as the semi-join probe. The final rollup rides the
    orderkey shuffle; ORDER BY+LIMIT is TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    return (
        joined.groupBy(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"),
                4,
            ).alias("sum_qty")
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )
