"""Physical data layout for scale (SURVEY.md §4.2, scale_notes.md):
bucketing and partitioned layout — the two storage-side levers that delete
shuffles and scans *before* a query runs.

- **Bucketed tables**: both sides of a recurring fact-fact join written with
  ``bucketBy(key)`` join WITHOUT a shuffle (co-located join). At 100 TB the
  shuffle of the larger fact is usually the single biggest cost in the job —
  bucketing amortizes it into the write path once.
- **Partitioned layout**: directory partitioning by the dominant filter
  column turns predicate pushdown into partition PRUNING — files for
  non-matching partitions are never opened.

Both are asserted at the plan level in tests/test_scale_patterns.py.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-merged-ready) table.
    Joins/aggregations on ``bucket_cols`` between tables with the SAME
    bucketing skip the exchange entirely."""
    if "." in table_name:
        raise ValueError("write_bucketed takes an unqualified table name")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a stale location from a previous session's metastore blocks creation;
    # the metastore lowercases directory names, so match that here
    loc = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
        table_name.lower(),
    )
    shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    num_files: int = 8,
) -> None:
    """Range-partition + sort-within-partitions + parquet: each output file
    covers a disjoint range of ``cluster_col``, so parquet min/max statistics
    let a range filter skip whole files (poor-man's clustering / single-
    dimension Z-order). At 100 TB this is the difference between scanning
    one file and scanning a thousand for a point-range query."""
    (
        df.repartitionByRange(num_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )
