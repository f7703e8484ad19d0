"""The spark.sql entry point (SURVEY §3.2): registered views make every
fixture table SQL-addressable — same engine, second front door."""

from __future__ import annotations

from apachebeam_python_spark import queries as q
from apachebeam_python_spark.session import register_views


def test_sql_over_views_equals_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT l_returnflag,
               round(sum(l_quantity), 2)      AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem GROUP BY l_returnflag
        """
    )
    via_df = q.QUERIES["q_agg_sum"](spark, sf_dir)
    assert {tuple(r) for r in via_sql.collect()} == {tuple(r) for r in via_df.collect()}


def test_events_view_has_converted_timestamp(spark, sf_dir):
    register_views(spark, sf_dir)
    (dtype,) = [t for c, t in spark.table("events").dtypes if c == "ts"]
    assert dtype == "timestamp"
