"""Multimodal-column operators (SURVEY.md §2.11): image/audio/video payloads
as opaque ``binary`` columns with typed metadata, processed by Arrow-batched
Pandas UDFs (``mapInPandas``).

The container has no image/audio codecs, so the *decode* step is stubbed
(``decode_image`` raises ``NotImplementedError``; ``fake_decode_meta`` is the
deterministic stand-in used by tests/queries). Everything Spark-side — the
binary schema, the Arrow batch shape, the iterator-of-batches UDF signature,
partition sizing — is real and is what matters at 100 TB:

- payloads travel in the same row as metadata (no side files) → partition
  sizing must account for payload bytes: repartition so that
  rows_per_partition × avg_payload ≲ executor Arrow batch budget; set
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` low for big blobs.
- decode/feature-extract runs once per batch with model/codec init hoisted
  out of the per-row loop (the ``setup`` hook of elementwise.par_do — the
  RunInference pattern).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_binary(df: DataFrame, text_col: str, out: str = "payload") -> DataFrame:
    """Pack a column into an opaque binary payload (UTF-8 here; in production
    the bytes come straight from the source — parquet BYTE_ARRAY, tar
    extraction, etc.)."""
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8"))


def decode_image(payload: bytes):
    """Real image decode — requires a codec library not present in this
    container. Kept as the single point to swap in Pillow/libvips."""
    raise NotImplementedError("image codecs unavailable in this environment; use fake_decode_meta")


def fake_decode_meta(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic stand-in for decode: (byte_len, md5_hex, width, height)
    where width/height derive from the length — stable across engines, so the
    plumbing is oracle-checkable."""
    n = len(payload)
    return n, hashlib.md5(payload).hexdigest(), n % 640, (n * 7) % 480


def extract_meta(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """mapInPandas metadata extraction over binary payloads: the real Arrow
    path a decode/resize/frame-sample UDF takes, with the stub decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task setup would go here (codec/model init — once, not per row)
        for pdf in batches:
            meta = pdf[payload_col].map(fake_decode_meta)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": meta.map(lambda m: m[0]),
                    "content_md5": meta.map(lambda m: m[1]),
                    "width": meta.map(lambda m: m[2]),
                    "height": meta.map(lambda m: m[3]),
                }
            )

    from ..session import fan_out

    # fan out before the Arrow boundary: a single-file input would otherwise
    # run the whole Python decode serially in one task
    return fan_out(df.select(id_col, payload_col)).mapInPandas(
        run, schema=f"{id_col} long, byte_len long, content_md5 string, width long, height long"
    )


def frame_sample(df: DataFrame, payload_col: str, every_n: int):
    """Video frame sampling — decode-dependent; stubbed like decode_image."""
    raise NotImplementedError("video codecs unavailable in this environment")
