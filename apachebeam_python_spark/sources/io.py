"""Batch sources & sinks — the reference's I/O vocabulary (SURVEY.md §2.1).

Beam ``ReadFromText/Parquet/Csv`` + ``WriteTo*`` map to Spark's DataSource
readers/writers, which give us splittable reads, predicate pushdown and
column pruning for free (things Beam's file sources do via liquid sharding /
runner magic). Cloud connectors (BigQuery/PubSub/Kafka) are out of scope
offline — documented capability gaps (SURVEY §2.1); their *shape* (external
table read, unbounded source) is covered by parquet views and the streaming
file source (``streaming/jobs.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Beam ``ReadFromText``: one row per line, column ``value``. Globs OK."""
    return spark.read.text(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None) -> None:
    """Beam ``WriteToText``: writes string column(s) as text part-files.
    Sharding is Spark-native (one file per partition) — Beam's num_shards
    equivalent is ``df.repartition(n)`` before the write. ``compression``
    maps Beam's textio ``compression_type`` ('gzip', 'bzip2', …); gzip
    part-files are NOT splittable — one file = one read task, so keep
    per-file size bounded by the upstream partitioning at scale."""
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.text(path)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """CSV source. Explicit ``schema`` preferred at scale — ``inferSchema``
    triggers an extra full scan, unacceptable at 100 TB."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_parquet(spark: SparkSession, path: str, *, merge_schema: bool = False) -> DataFrame:
    """Beam ``ReadFromParquet``: columnar scan; projection/predicates push down.

    ``merge_schema=True`` unions the footers of every file — the
    schema-evolution read for a lake where later batches added columns
    (older files yield NULLs). Off by default: merging footers costs a
    file-listing pass, and a 100 TB table with a stable schema shouldn't
    pay it."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    max_records_per_file: int = 0,
) -> None:
    """Beam ``WriteToParquet`` + partitioned layout: at scale, partition by
    the dominant filter column so readers get partition pruning, and bound
    file sizes with ``max_records_per_file`` (0 = unbounded) — one skewed
    task must not emit a multi-GB file that later becomes an unsplittable
    straggler row-group for readers."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file > 0:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source (the textio+json.loads Beam pattern, SURVEY §2.1)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC columnar source — native in the Spark distribution (no extra jar,
    unlike Avro which stays a documented offline gap). Self-describing
    schema, predicate pushdown and column pruning like parquet."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_binary_files(
    df: DataFrame, path: str, key_col: str, payload_col: str, ext: str = "bin"
) -> None:
    """One-file-per-row binary sink (``<key>.<ext>``) — the shape of an
    image/audio corpus hand-off. Files are written EXECUTOR-side inside
    ``mapInPandas`` (per-partition parallelism, no driver involvement); the
    terminal collect is the sanctioned sink action and moves one count row
    per task, never data (tests/test_antipatterns.py census).

    Scale: at 100 TB the per-row fan-out is the point — each task writes
    its partition's files against shared storage; key-unique names make the
    write idempotent under task retries (last writer wins with identical
    bytes)."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)

    def sink(batches):
        for pdf in batches:
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = (
                    payload
                    if isinstance(payload, (bytes, bytearray))
                    else str(payload).encode("utf-8")
                )
                with open(os.path.join(path, f"{int(key)}.{ext}"), "wb") as fh:
                    fh.write(data)
            yield pd.DataFrame({"n": [len(pdf)]})

    df.select(key_col, payload_col).mapInPandas(sink, schema="n long").agg(
        F.sum("n")
    ).collect()


def read_binary_files(spark: SparkSession, glob_path: str) -> DataFrame:
    """Spark's ``binaryFile`` source: one row per file with (path,
    modificationTime, length, content) — the ingest half of every
    multimodal pipeline here (WebDataset tars, Avro containers, codec
    corpora all ride it). Listing is distributed; content is read by the
    task that owns the file."""
    return spark.read.format("binaryFile").load(glob_path)
