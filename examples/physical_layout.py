#!/usr/bin/env python
"""Example 11 — physical-layout playbook (round 6): the write-once /
read-forever decisions that dominate cost at warehouse scale, each shown
with its plan evidence:

1. PARTITION by the coarse always-filtered dimension → static pruning
   (PartitionFilters) and runtime pruning (dynamicpruningexpression when
   the filter lives on a dim query).
2. BUCKET by the recurring join key → the join reads co-located buckets,
   zero Exchange under the SortMergeJoin.
3. SALT the pathological key → the hot key spreads over n_salts reducers.
4. Lake manifest stats → file skipping before any byte is read.

Run: python examples/physical_layout.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from apachebeam_python_spark.plans.inspect import count_exchanges, executed_plan
from apachebeam_python_spark.session import get_spark, table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-physical-layout")
    spark.sparkContext.setLogLevel("ERROR")
    from apachebeam_python_spark.queries import QUERIES

    # 1) partitioned layout: static + dynamic pruning
    pp = QUERIES["q_partition_prune"](spark, sf_dir)
    # print the boolean like the DPP line below — the hard pin lives in
    # tests/test_plans.py (the old `... or True` assert was a no-op)
    pruned = "PartitionFilters" in executed_plan(pp)
    print(f"static pruning in plan: {pruned}; rows: {pp.count()}")
    dpp = QUERIES["q_dynamic_partition_prune"](spark, sf_dir)
    fired = "dynamicpruning" in executed_plan(dpp).lower()
    print(f"dynamic pruning fired: {fired}; rows: {dpp.count()}")

    # 2) bucketed join: the one-time shuffle amortization
    bj = QUERIES["q_bucketed_join"](spark, sf_dir)
    print(
        "bucketed join exchanges (0 under the join, 1 for the final agg):",
        count_exchanges(bj),
    )
    print(bj.orderBy("seg").show(5, truncate=False) or "")

    # 3) salted join for the skewed key
    sj = QUERIES["q_salted_join"](spark, sf_dir)
    print("salted join (salt visible in plan):", "_salt" in executed_plan(sj))
    sj.count()

    # 4) lake manifest stats skipping
    sk = QUERIES["q_lake_stats_skipping"](spark, sf_dir)
    print("stats-skipped band aggregate:")
    sk.show(truncate=False)

    # 5) z-order clustering: 2-D stats pruning (round 7)
    zs = QUERIES["q_zorder_skip"](spark, sf_dir)
    print("z-order vs linear file-skip census (2-D box predicate):")
    zs.orderBy("layout").show(truncate=False)

    # the same decisions, stated as data: where does each row volume live?
    e = table(spark, sf_dir, "events")
    print("partition-key histogram (what partitioning will prune):")
    e.groupBy("event_type").count().orderBy("event_type").show()


if __name__ == "__main__":
    main()
