"""Spark 4 Python DataSource API (SURVEY §2.1 — Beam's custom
``Source``/``Sink`` surface, Spark-idiomatic): the Avro-lite codec exposed
as a REAL registrable datasource, so users write

    spark.dataSource.register(AvroLiteDataSource)
    df = spark.read.format("avro_lite").load(path)
    df.write.format("avro_lite").mode("append").save(path)

instead of calling module functions — the exact ergonomics of a built-in
format. This is the modern answer to Beam's ``iobase.BoundedSource``:
``partitions()`` is ``split()`` (one InputPartition per container file),
``read(partition)`` is the reader, and the writer's per-task
``write(iterator)`` + driver-side commit messages mirror the sink bundle
lifecycle (Beam's ``FileBasedSink`` finalize).

Scale: file-granularity splits — each task decodes one part-file
(part-files are written task-sized, so this matches upstream
parallelism); schema inference reads ONE header on the driver. The write
path streams rows per task; nothing gathers centrally.
"""

from __future__ import annotations

import glob
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .avro_lite import (
    _SYNC,
    _decode_blocks,
    _enc_long,
    _read_header,
    _encode_rows_py,
    _field_types,
    _header_for_spark_schema,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AvroLiteReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        self._schema = schema

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".avro")
        )
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        with open(partition.path, "rb") as fh:
            _, rows = _decode_blocks(fh.read())
        names = [f.name for f in self._schema.fields]
        for row in rows:
            yield tuple(row.get(n) for n in names)


class AvroLiteCommit(WriterCommitMessage):
    def __init__(self, file: str, n_rows: int):
        self.file = file
        self.n_rows = n_rows


class AvroLiteWriter(DataSourceWriter):
    def __init__(self, options, schema):
        self.path = options.get("path")
        self.schema = schema

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        header, fields = _header_for_spark_schema(self.schema)
        rows = list(iterator)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.avro")
        if rows:
            body = _encode_rows_py(rows, fields)

            with open(fname, "wb") as fh:
                fh.write(
                    header
                    + _enc_long(len(rows))
                    + _enc_long(len(body))
                    + body
                    + _SYNC
                )
        return AvroLiteCommit(fname, len(rows))

    def commit(self, messages):
        # Beam FileBasedSink.finalize analogue: a production impl renames
        # temp files here; ours wrote task-unique names directly.
        return None

    def abort(self, messages):
        for m in messages:
            if m and os.path.exists(m.file):
                os.remove(m.file)


class AvroLiteDataSource(DataSource):
    """``format("avro_lite")`` — jar-free Avro container read/write."""

    @classmethod
    def name(cls) -> str:
        return "avro_lite"

    def schema(self):
        path = self.options.get("path")
        first = next(
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".avro")
        )
        return _avro_to_struct(_read_header(first))

    def reader(self, schema):
        return AvroLiteReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        return AvroLiteWriter(self.options, schema)

    def streamWriter(self, schema, overwrite: bool):
        return AvroLiteStreamWriter(self.options, schema)


_SPARK_TYPES = {
    "long": LongType(),
    "double": DoubleType(),
    "string": StringType(),
}


def _avro_to_struct(avro_schema: dict) -> StructType:
    return StructType(
        [
            StructField(n, _SPARK_TYPES[t], nullable)
            for n, t, nullable in _field_types(avro_schema)
        ]
    )


# --------------------------------------------------------------------------
# custom STREAMING source (Beam's unbounded ReadFromPubSub shape)
# --------------------------------------------------------------------------
from pyspark.sql.datasource import SimpleDataSourceStreamReader


class EventsReplayStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader over the events parquet: deterministic
    replay in ``batch_rows``-sized micro-batches ordered by event_id.
    Offsets are row positions, so any offset range replays identically —
    the exactly-once recovery contract a real broker source (Kafka,
    Pub/Sub w/ ordering) provides via (partition, offset) pairs."""

    def __init__(self, options):
        self.path = options.get("path")
        self.batch_rows = int(options.get("batch_rows", "2000"))
        self._table = None

    def _rows(self):
        """The replay log as ONE sorted Arrow table (r9: kept as Arrow, not
        a Python list — a 1M-row replica materialized as pylist blew the
        streaming-source runner's memory during planPartitions; slicing the
        Arrow table bounds per-call materialization to ``batch_rows``)."""
        if self._table is None:
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = pq.read_table(self.path).sort_by("event_id")
            # normalize tz-naive timestamp columns to UTC-aware: the driver
            # fixtures carry tz-aware µs timestamps, but Spark-written
            # replicas store tz-naive values (same UTC instants) — and
            # Spark's streaming-source row converter rejects naive
            # timestamps (astimezone on a naive pandas Timestamp throws)
            for i, f in enumerate(t.schema):
                if pa.types.is_timestamp(f.type) and f.type.tz is None:
                    t = t.set_column(
                        i, f.name,
                        t.column(i).cast(pa.timestamp(f.type.unit, tz="UTC")),
                    )
            self._table = t
        return self._table

    def _tuples(self, lo: int, hi: int):
        chunk = self._rows().slice(lo, hi - lo).to_pylist()
        return [
            (
                r["event_id"], r["ts"], r["user_id"],
                r["event_type"], r["value"], r["props"],
            )
            for r in chunk
        ]

    def initialOffset(self):
        return {"row": 0}

    def read(self, start):
        lo = start["row"]
        hi = min(lo + self.batch_rows, self._rows().num_rows)
        return (iter(self._tuples(lo, hi)), {"row": hi})

    def readBetweenOffsets(self, start, end):
        return iter(self._tuples(start["row"], end["row"]))

    def commit(self, end):
        pass


class EventsReplayDataSource(DataSource):
    """``readStream.format("events_replay")`` — a registrable custom
    UNBOUNDED source (the Pub/Sub capability shape, offline). The simple
    reader serves batches from the driver — right for a prototype /
    low-volume source; the partition-parallel ``DataSourceStreamReader``
    is the same API one level down when per-batch volume demands
    executor-side reads."""

    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self):
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )

    def simpleStreamReader(self, schema):
        return EventsReplayStreamReader(self.options)


# --------------------------------------------------------------------------
# custom STREAMING sink (Beam's custom Write/FileBasedSink shape)
# --------------------------------------------------------------------------
from pyspark.sql.datasource import DataSourceStreamWriter  # noqa: E402


class AvroLiteStreamWriter(DataSourceStreamWriter):
    """Per-micro-batch Avro sink with idempotent-commit bookkeeping: each
    task writes ``batch-<id>-<uuid>.avro.tmp``; the driver-side
    ``commit(batchId)`` first deletes any ``batch-<id>-*.avro`` files a
    prior attempt of the SAME batch left behind, then renames this
    attempt's temp files into place and records a ``_commit_<batchId>``
    manifest — so a replayed batch (driver died between rename and
    checkpoint) replaces its earlier output instead of double-appending,
    which is the last-attempt-wins idempotence real file sinks implement;
    ``abort`` deletes the temp files."""

    def __init__(self, options, schema):
        self.path = options.get("path")
        self.schema = schema

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        header, fields = _header_for_spark_schema(self.schema)
        rows = list(iterator)
        fname = os.path.join(self.path, f"batch-{uuid.uuid4().hex}.avro.tmp")
        if rows:
            body = _encode_rows_py(rows, fields)
            with open(fname, "wb") as fh:
                fh.write(
                    header
                    + _enc_long(len(rows))
                    + _enc_long(len(body))
                    + body
                    + _SYNC
                )
        return AvroLiteCommit(fname if rows else "", len(rows))

    def commit(self, messages, batchId) -> None:
        # replay safety: drop any files an earlier attempt of this batch
        # already renamed into place — without this, a failure between
        # rename and checkpoint double-appends the whole batch on restart
        for stale in glob.glob(
            os.path.join(self.path, f"batch-{batchId:06d}-*.avro")
        ):
            os.remove(stale)
        n = 0
        for m in messages:
            if m and m.file and os.path.exists(m.file):
                final = m.file[: -len(".tmp")].replace(
                    "batch-", f"batch-{batchId:06d}-"
                )
                os.replace(m.file, final)
                n += m.n_rows
        with open(os.path.join(self.path, f"_commit_{batchId:06d}"), "w") as fh:
            fh.write(str(n))

    def abort(self, messages, batchId) -> None:
        for m in messages:
            if m and m.file and os.path.exists(m.file):
                os.remove(m.file)
