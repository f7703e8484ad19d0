#!/usr/bin/env python
"""Example 2 — streaming: event-time sessionization with a watermark, drained
through the availableNow harness (the unbounded half of the engine).

Run: python examples/streaming_sessions.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from apachebeam_python_spark.operators import event_time as ET
from apachebeam_python_spark.session import get_spark
from apachebeam_python_spark.streaming import jobs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    stream = jobs.events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    sessions = ET.session(
        stream, "ts", "30 minutes", keys=["user_id"],
        n_events=F.count("*"),
        total_value=F.round(F.sum("value"), 2),
    )
    jobs.run_to_memory(sessions, "example_sessions", output_mode="complete")

    result = spark.table("example_sessions")
    print(f"{result.count()} sessions; busiest:")
    result.orderBy(F.col("n_events").desc()).show(5, truncate=False)


if __name__ == "__main__":
    main()
