"""Failure injection (VERDICT r7 #6): the lake/codec/Avro paths are proven
on well-formed inputs and writer races; these tests prove they fail LOUDLY
on corrupt ones — truncated Avro blocks, a parquet file torn mid-write
inside a lake data dir, a manifest pointing at a deleted file, CRC-flipped
PNG/FLAC payloads. The invariant under test is always the same: a typed,
diagnosable exception, never silent row loss or garbage decode.

At 100 TB this is the difference between a retryable task failure (Spark
reschedules, the pipeline converges) and a corrupted training corpus no
one notices until eval time.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from apachebeam_python_spark.sources import laketable as LT


# --------------------------------------------------------------------------
# Avro: truncation and bit flips
# --------------------------------------------------------------------------
def _one_avro_file(path: str) -> str:
    return next(
        os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".avro")
    )


@pytest.fixture()
def avro_dir(spark, tmp_path):
    from apachebeam_python_spark.sources.avro_lite import write_avro

    df = spark.range(0, 500).select(
        F.col("id"), F.concat(F.lit("row-"), F.col("id")).alias("name")
    )
    out = str(tmp_path / "avro")
    write_avro(df, out)
    return out


def test_truncated_avro_block_raises(spark, avro_dir):
    """A block cut mid-record (torn copy / partial upload) must raise a
    typed 'truncated or corrupt' error from the decoder — not yield the
    rows that happened to fit."""
    from apachebeam_python_spark.sources.avro_lite import read_avro

    f = _one_avro_file(avro_dir)
    data = open(f, "rb").read()
    open(f, "wb").write(data[: len(data) - 37])  # tear inside the last block
    with pytest.raises(Exception) as ei:
        read_avro(spark, avro_dir).count()
    msg = str(ei.value)
    assert "truncated" in msg or "corrupt" in msg or "sync marker" in msg, msg[:500]


def test_avro_sync_marker_bitflip_raises(spark, avro_dir):
    """A flipped byte in a block's sync marker (storage corruption) must
    fail the sync check, not resynchronize silently past damaged data."""
    from apachebeam_python_spark.sources.avro_lite import read_avro

    f = _one_avro_file(avro_dir)
    data = bytearray(open(f, "rb").read())
    data[-3] ^= 0xFF  # the trailing sync marker's bytes
    open(f, "wb").write(bytes(data))
    with pytest.raises(Exception) as ei:
        read_avro(spark, avro_dir).count()
    msg = str(ei.value)
    assert "sync marker" in msg or "corrupt" in msg or "truncated" in msg, msg[:500]


def test_avro_header_corruption_raises_at_plan_time(spark, avro_dir):
    """Garbage where the container magic should be fails the driver-side
    header peek immediately — before any cluster work is scheduled."""
    from apachebeam_python_spark.sources.avro_lite import read_avro

    f = _one_avro_file(avro_dir)
    data = bytearray(open(f, "rb").read())
    data[0:4] = b"Nope"
    open(f, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="not an Avro container file"):
        read_avro(spark, avro_dir)


# --------------------------------------------------------------------------
# Lake table: torn parquet, missing file, vacuumed time travel
# --------------------------------------------------------------------------
@pytest.fixture()
def lake(spark, tmp_path):
    path = str(tmp_path / "laketbl")
    LT.create_table(
        spark.range(0, 2000).select("id", (F.col("id") % 7).alias("v")), path
    )
    return path


def _data_files(path: str) -> list[str]:
    m = LT._read_manifest(path, LT.current_version(path))
    return [os.path.join(path, e["path"]) for e in m["files"]]


def test_lake_torn_parquet_footer_raises_not_drops(spark, lake):
    """A data file torn mid-write (footer never landed) must fail the
    snapshot read with a parquet error — NOT return a smaller row count.
    Guard the guard: ignoreCorruptFiles must be off, else Spark silently
    drops the file and this becomes undetectable row loss."""
    assert spark.conf.get("spark.sql.files.ignoreCorruptFiles") == "false"
    victim = _data_files(lake)[0]
    data = open(victim, "rb").read()
    assert len(data) > 100
    open(victim, "wb").write(data[: len(data) // 2])  # footer gone
    with pytest.raises(Exception) as ei:
        LT.read_table(spark, lake).count()
    msg = str(ei.value).lower()
    assert "parquet" in msg or "footer" in msg or "corrupt" in msg, msg[:500]


def test_lake_manifest_pointing_at_deleted_file_raises(spark, lake):
    """A manifest entry whose file was deleted out-of-band (bad vacuum,
    manual rm) must raise loudly at read, not skip the file."""
    victim = _data_files(lake)[0]
    os.remove(victim)
    with pytest.raises(Exception) as ei:
        LT.read_table(spark, lake).count()
    msg = str(ei.value).lower()
    assert (
        "does not exist" in msg or "no such file" in msg or "not exist" in msg
        or "filenotfound" in msg
    ), msg[:500]


def test_time_travel_to_vacuumed_version_raises_typed(spark, lake):
    """Reading a version whose manifest was compacted/vacuumed away must
    raise the documented 'compacted away' ValueError naming the earliest
    live version — not FileNotFoundError, not an empty DataFrame."""
    LT.append(spark.range(2000, 2100).select("id", (F.col("id") % 7).alias("v")), lake)
    LT.compact(spark, lake, target_files=1)
    v0 = 0
    LT.vacuum(lake, keep_last=1, retention_seconds=0)
    with pytest.raises(ValueError, match="compacted away"):
        LT.read_table(spark, lake, version=v0)


def test_lake_manifest_json_garbage_raises(spark, lake):
    """A manifest file hit by storage corruption (truncated JSON) must
    surface as a parse error, not be treated as an empty snapshot."""
    v = LT.current_version(lake)
    mf = os.path.join(lake, "_log", f"{v:08d}.json")
    data = open(mf, "rb").read()
    open(mf, "wb").write(data[: len(data) // 2])
    with pytest.raises(ValueError, match="corrupt manifest"):
        LT.read_table(spark, lake).count()


# --------------------------------------------------------------------------
# Codecs: CRC bit flips must be caught, not decoded into garbage pixels
# --------------------------------------------------------------------------
def test_png_idat_bitflip_fails_crc(spark):
    """One flipped byte inside the IDAT body must trip the chunk CRC —
    both in a direct decode and through the Spark mapInPandas path (the
    task fails; the executor error carries the typed message)."""
    import numpy as np

    from apachebeam_python_spark.operators.multimodal import decode_png, encode_png

    arr = (np.arange(12 * 16 * 3, dtype=np.uint8) % 251).reshape(12, 16, 3)
    png = bytearray(encode_png(arr))
    idat = png.index(b"IDAT")
    png[idat + 10] ^= 0x01  # inside the compressed body, CRC now stale
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(png))

    # Spark path: the corrupt payload fails the task with the same message
    df = spark.createDataFrame([(1, bytes(png))], "doc_id long, payload binary")

    def run(batches):
        for pdf in batches:
            for p in pdf["payload"]:
                decode_png(bytes(p))
            yield pdf[["doc_id"]]

    with pytest.raises(Exception) as ei:
        df.mapInPandas(run, schema="doc_id long").count()
    assert "CRC mismatch" in str(ei.value), str(ei.value)[:500]


def test_png_truncated_before_iend_raises(spark):
    import numpy as np

    from apachebeam_python_spark.operators.multimodal import decode_png, encode_png

    arr = (np.arange(8 * 8, dtype=np.uint8)).reshape(8, 8)
    png = encode_png(arr)
    with pytest.raises(Exception):
        decode_png(png[: len(png) - 20])  # IEND (and part of IDAT CRC) gone


def test_flac_frame_bitflip_fails_crc():
    """A single flipped bit in a FLAC frame's audio data must fail the
    frame CRC-16 (or the header CRC-8 if it lands there) — never return
    altered samples as if the decode succeeded."""
    import numpy as np

    from apachebeam_python_spark.operators.flac_lite import decode_flac, encode_flac

    t = np.arange(4096, dtype=np.float64)
    samples = (1000 * np.sin(t / 17)).astype(np.int16)
    flac = bytearray(encode_flac(samples, sample_rate=8_000))
    back, rate = decode_flac(bytes(flac))  # sanity: clean payload decodes
    assert rate == 8_000 and back.shape[0] == 4096

    flac[len(flac) // 2] ^= 0x10  # mid-frame audio data
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(bytes(flac))


def test_wav_truncated_data_chunk_raises():
    """A WAV whose data chunk is shorter than its declared size (torn
    upload) must raise, not return a short sample array."""
    import numpy as np

    from apachebeam_python_spark.operators.multimodal import decode_wav, encode_wav

    samples = (np.arange(1000) % 199).astype(np.int16)
    wav = encode_wav(samples)
    with pytest.raises(Exception):
        decode_wav(wav[: len(wav) - 64])
