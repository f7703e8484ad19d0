#!/usr/bin/env python
"""Example 4 — time-series analytics over the events stream-table:
OHLC downsampling, gap-filled resampling (forward fill + linear
interpolation), and the as-of join that powers both.

Run: python examples/timeseries.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from apachebeam_python_spark.operators import event_time as ET
from apachebeam_python_spark.operators import joins as J
from apachebeam_python_spark.session import get_spark, table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-timeseries")
    spark.sparkContext.setLogLevel("ERROR")

    events = table(spark, sf_dir, "events")

    # candlesticks: one partial+final aggregate, no window pass
    ohlc = events.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
    )
    print("OHLC buckets:", ohlc.count())
    ohlc.orderBy("user_id", "bucket").show(5)

    # regular hourly grid with both gapfill flavors
    ff = ET.resample_ffill(events, "ts", "value", ["user_id"], "1 hour")
    li = ET.resample_linterp(events, "ts", "value", ["user_id"], "1 hour")
    print("grid points:", ff.count(), "(ffill) /", li.count(), "(linterp)")

    # as-of enrichment: probe points 30 minutes after every 10th event get
    # the latest event value at-or-before them ("price at trade time")
    probes = events.filter(F.col("event_id") % 10 == 0).select(
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("ts"),
        "event_id",
    )
    enriched = J.asof_join_union(
        probes, events.select("user_id", "ts", "value"),
        ["user_id"], "ts", "ts", "value",
    )
    print("probes enriched with latest prior event value:",
          enriched.filter(F.col("asof_value").isNotNull()).count(), "/", enriched.count())


if __name__ == "__main__":
    main()
