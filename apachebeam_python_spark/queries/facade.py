"""Facade-built oracle query (round 7, VERDICT r6 #5).

pipeline.py's 41 verbs were proven only by unit tests; nothing on the
registry was ever BUILT through the facade, so "facade ≡ direct DataFrame"
was asserted, not hash-checked. q_pipeline_facade closes that: a real
batch-ETL chain (read → filter → with_keys → combine_per_key →
top_k_per_key — the canonical reference-repo shape from
examples/batch_etl.py) expressed entirely in facade verbs, registered with
a DuckDB oracle like any other query, plus a plan-equality pin
(tests/test_pipeline_facade.py) asserting its ``plan_fingerprint`` equals
the direct-DataFrame twin's — sugar, not semantics, demonstrated at both
the value and the plan level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import Pipeline
from ._registry import register


def _facade_chain(spark: SparkSession, sf_dir: str) -> Pipeline:
    """The facade chain under test — shared with the plan-equality test."""
    return (
        Pipeline.read_parquet(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull())
        .with_keys(F.upper(F.col("event_type")), "etype")
        .combine_per_key(
            ["etype", "user_id"],
            n_events=F.count("*").cast("long"),
            cents=F.sum(F.round(F.col("value") * 100).cast("long")).cast("long"),
        )
        .top_k_per_key(
            ["etype"], [F.col("cents").desc(), F.col("user_id")], 3
        )
    )


def direct_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same logical plan written directly against the DataFrame API —
    what a user migrating OFF the facade would write. The plan-equality
    test pins ``plan_fingerprint(facade) == plan_fingerprint(twin)``."""
    from pyspark.sql import Window

    w = Window.partitionBy("etype").orderBy(F.col("cents").desc(), F.col("user_id"))
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull())
        .withColumn("etype", F.upper(F.col("event_type")))
        .groupBy("etype", "user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "etype",
            "user_id",
            "n_events",
            "cents",
            F.col("rn").cast("integer").alias("rank"),
        )
    )


@register(
    "q_pipeline_facade",
    driver=False,  # facade ≡ direct-DataFrame proof — pytest oracle
    oracle="""
WITH agg AS (
  SELECT upper(event_type) AS etype, user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
)
SELECT etype, user_id, n_events, cents, CAST(rn AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY etype
                                   ORDER BY cents DESC, user_id) AS rn
      FROM agg)
WHERE rn <= 3
""",
)
def q_pipeline_facade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 spenders per (upper-cased) event type, built ENTIRELY through
    the Pipeline facade (SURVEY §2.2/§2.3 composition; VERDICT r6 #5). The
    sums are exact integer cents; the top-k order is total (cents DESC,
    user_id) so ranking is engine-exact.

    Scale: the facade adds nothing to the plan — one partial+final hash
    aggregate shuffle on (etype, user_id), then WindowGroupLimit for the
    per-key top-3 over the aggregate (domain-sized) table; Catalyst sees
    straight through the wrapper (plan-equality pinned in
    tests/test_pipeline_facade.py)."""
    return _facade_chain(spark, sf_dir).to_df().select(
        "etype",
        "user_id",
        "n_events",
        "cents",
        F.col("rn").cast("integer").alias("rank"),
    )
