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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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


def overwrite_partition(df: DataFrame, path: str, partition_by: Sequence[str]) -> None:
    """Idempotent backfill: dynamic partition overwrite replaces ONLY the
    partitions present in ``df`` and leaves every other partition's files
    untouched — re-running one bad day of a 100 TB partitioned table is a
    surgical rewrite, not a table rewrite, and a retried job converges to
    the same state (the lake-side half of exactly-once)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_partition(
    spark: SparkSession, path: str, partition_filter: str, target_files: int = 1
) -> None:
    """Small-files compaction: rewrite the partitions matched by
    ``partition_filter`` (e.g. ``"day = '2024-01-01'"``) into
    ``target_files`` files each, via dynamic partition overwrite. Streaming
    and incremental ingest leave many KB-sized files per partition; reads
    then pay per-file open + footer costs. Run compaction on closed
    partitions only (no concurrent writer — this is plain parquet, not a
    transaction log)."""
    df = spark.read.parquet(path).filter(partition_filter)
    part_cols = [
        f.name
        for f in df.schema.fields
        if f.name in {c.strip() for c in _partition_cols_of(spark, path)}
    ]
    overwrite_partition(df.repartition(target_files), path, part_cols)


def _partition_cols_of(spark: SparkSession, path: str) -> list[str]:
    """Partition columns of a Hive-layout parquet directory (those whose
    values come from directory names rather than file contents)."""
    import re

    files = spark.read.parquet(path).inputFiles()
    cols: list[str] = []
    for seg in (s for f in files for s in f.split("/")):
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)=", seg)
        if m and m.group(1) not in cols:
            cols.append(m.group(1))
    return cols


def rewrite_for_parallel_scan(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    tables: Sequence[str],
    rows_per_split: int = 20_000,
    max_splits: int = 32,
) -> str:
    """Layout maintenance for SCAN parallelism — the inverse of
    :func:`compact_partition`: rewrite tables whose files hold one giant
    row group (one split = one task = a serial scan, however many cores
    exist) into enough parquet files that every core gets a split.

    This is the same lake-maintenance lever as compaction, pointed the
    other way: parquet's split unit is the row group, so a writer that
    emitted a single row group caps scan parallelism at 1 regardless of
    ``maxPartitionBytes``. At 100 TB a real writer never produces this
    (files are size-bounded), but single-machine exports and test fixtures
    do — ``bench.py`` runs this as warm-up layout maintenance before
    timing (README "comparability"). Tables small enough for one split are
    copied as-is. Returns ``dst_dir``."""
    for name in tables:
        src = os.path.join(src_dir, f"{name}.parquet")
        df = spark.read.parquet(src)
        splits = int(max(1, min(max_splits, df.count() // rows_per_split + 1)))
        df.repartition(splits).write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{name}.parquet")
        )
    return dst_dir


#: per-table join/identity keys that must be SHIFTED per replica so the
#: scaled copy preserves join fan-out and dup structure (a naive row copy
#: makes orders⋈lineitem fan out ×copies² and turns every document into an
#: exact-dup cluster — superlinear ARTIFACTS, not real scaling). The second
#: element names the key's SHARED STRIDE GROUP: columns in one group (the
#: two sides of a join) must shift by the SAME stride or replica r's
#: lineitem rows stop matching replica r's orders (round-5 review #4) —
#: strides therefore come from the max key across the whole group, read
#: from the source dir regardless of which table subset is replicated.
_REPLICA_SHIFT_KEYS = {
    "orders": (("o_orderkey", "orderkey"),),
    "lineitem": (("l_orderkey", "orderkey"),),
    "events": (("event_id", "eventid"),),
    "documents": (("doc_id", "docid"),),
    "embeddings": (("vec_id", "vecid"),),
}


def replicate_scaled(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    copies: int = 10,
    tables: Sequence[str] | None = None,
) -> str:
    """Materialize a ~``copies``× scaled copy of a fixture dir for
    scaling-curve benches (VERDICT r4 #7): fact tables are replicated with
    their join/identity keys shifted by ``replica_index * stride`` (stride =
    max(key)+1, so replicas never collide), dimension tables are copied
    as-is — dims are geography-/catalog-bounded in real warehouses, facts
    are what grow.

    Semantics preserved per query family: orders⋈lineitem stays linear
    (each replica joins only itself); dim joins stay valid (unshifted FK
    columns still hit the same dims, ×copies probe rows); per-user event
    history gets ×copies denser (real growth shape for an events table);
    documents get a per-replica text suffix token so the corpus grows
    WITHOUT turning into exact-dup clusters of size ``copies`` (which would
    hand dedup a quadratic in-bucket artifact).

    Scale note: this is bench tooling — the replicas write through one
    repartitioned pass each, O(copies × table) work, no driver collection.
    """
    from ..session import TABLES, table

    names = tuple(tables) if tables is not None else TABLES
    # group strides FIRST, over every table that shares the group — so a
    # subset replication (tables=['lineitem']) still shifts by the stride
    # the whole join family agrees on
    group_strides: dict[str, int] = {}
    for t_name, keys in _REPLICA_SHIFT_KEYS.items():
        for col, group in keys:
            mx = int(
                table(spark, src_dir, t_name).agg(F.max(col)).first()[0] or 0
            )
            group_strides[group] = max(group_strides.get(group, 0), mx + 1)
    for name in names:
        df = table(spark, src_dir, name)
        dst = os.path.join(dst_dir, f"{name}.parquet")
        shift_keys = _REPLICA_SHIFT_KEYS.get(name)
        if not shift_keys:
            df.write.mode("overwrite").parquet(dst)
            continue
        rep = df.withColumn(
            "_rep", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )
        for col, group in shift_keys:
            rep = rep.withColumn(
                col, F.col(col) + F.col("_rep") * F.lit(group_strides[group])
            )
        if name == "documents":
            # Replica text perturbation, r9 (VERDICT r8 #2): interleave a
            # DOC-UNIQUE salt token after every source token for replicas > 0
            # (doc_id is already stride-shifted, hence corpus-unique). Every
            # k-gram (k ≥ 2) of a perturbed doc then contains its salt, so
            # replicas share ZERO shingles with their source or each other —
            # near-dup density stays at the source corpus's level instead of
            # growing quadratically with ``copies`` (which made the exact
            # gram-join oracles infeasible at sf1 in round 8). Replica 0 is
            # untouched, so the corpus's true near-dup pairs remain the
            # nontrivial expected output of the dedup anchors.
            salt = F.concat(F.lit("x"), F.col("doc_id").cast("string"))
            rep = rep.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(" "), salt),
                        ),
                        " ",
                    )
                ),
            )
        rep.drop("_rep").repartition(32).write.mode("overwrite").parquet(dst)
    return dst_dir


def file_report(spark: SparkSession, path: str) -> DataFrame:
    """Per-file census of a parquet directory via the hidden ``_metadata``
    column: (file, rows, bytes). The small-files problem is invisible until
    you look — this is the one-liner that tells you when to run
    :func:`compact_partition`. Reads only file metadata plus row counts
    (count(*) per file is served by parquet footers after pruning)."""
    df = spark.read.parquet(path)
    return (
        df.select(
            F.col("_metadata.file_path").alias("file"),
            F.col("_metadata.file_size").alias("bytes"),
        )
        .groupBy("file", "bytes")
        .agg(F.count("*").alias("rows"))
        .select("file", "rows", "bytes")
    )


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Z-order (Morton) key: interleave the top ``bits`` bits of each
    column's rank-ish value so that sorting by ONE long co-locates rows
    close in EVERY dimension — multi-column file skipping from single-column
    min/max stats (the same idea as Delta's OPTIMIZE ZORDER BY).

    Inputs must already be non-negative integers of comparable magnitude
    (pre-bucket raw values with ntile/width_bucket/pmod as appropriate —
    interleaving raw skewed values wastes high bits). Pure bit arithmetic,
    fuses into codegen; no shuffle of its own.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if not 1 <= bits <= 63 // len(cols):
        raise ValueError(f"bits={bits} with {len(cols)} cols overflows a long")
    key = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):  # msb-first interleave
        for c in cols:
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = F.shiftleft(key, 1).bitwiseOR(bit)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: Sequence[str],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Multi-dimension clustering: range-partition + sort by the Morton key
    of ``zcols``, then parquet. A filter on ANY of the z-ordered columns
    skips files via min/max stats — the 2-D generalization of
    ``write_clustered`` (which is optimal for one column only). File-skip
    effectiveness is verified empirically in tests/test_scale_patterns.py."""
    keyed = df.withColumn("_zkey", zorder_key([F.col(c) for c in zcols], bits=bits))
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str,
) -> DataFrame:
    """Latest-wins merge (the CDC-upsert capability; SURVEY §2.3's
    Latest.PerKey applied to table maintenance): rows from ``updates``
    replace same-key rows of ``base`` when their ``version_col`` is
    greater-or-equal; unmatched keys pass through from either side.

    Plan shape: UNION ALL → one hash shuffle on ``keys`` → per-key max
    (no sort — ``max_by``-style struct ordering), so cost is one shuffle
    of base+updates regardless of update skew. At 100 TB pair this with
    ``overwrite_partition``: restrict ``base`` to the partitions present
    in ``updates`` and rewrite only those (MERGE on plain parquet =
    upsert the touched partitions, leave the rest untouched).

    Ties on (version, source) are broken FOR the update (_src=1 > 0):
    re-applying the same batch is idempotent and converges to the update.
    """
    cols = base.columns
    if set(cols) != set(updates.columns):
        raise ValueError("merge_upsert: base/updates schemas must match")
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.select(*cols).withColumn("_src", F.lit(1))
    )
    # single-agg latest-wins: max over (version, _src, payload) struct —
    # field order makes version the primary criterion, update-wins the tie
    payload = F.struct(
        F.col(version_col).alias("_v"),
        F.col("_src").alias("_s"),
        F.struct(*[F.col(c) for c in cols]).alias("_p"),
    )
    latest = tagged.groupBy(*[F.col(k) for k in keys]).agg(
        F.max(payload).alias("_w")
    )
    return latest.select(*[F.col(f"_w._p.{c}").alias(c) for c in cols])
