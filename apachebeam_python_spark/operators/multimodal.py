"""Multimodal-column operators (SURVEY.md §2.11): image/audio/video payloads
as opaque ``binary`` columns with typed metadata, processed by Arrow-batched
Pandas UDFs (``mapInPandas``).

``decode_image`` is REAL for eight formats (rounds 3-4): baseline
**JPEG** (``operators.jpeg_lite`` — full sequential-DCT Huffman
pipeline: marker parse, canonical Huffman, dequantize, exact IDCT,
YCbCr→RGB), **PNG** (8-bit grey/RGB/RGBA, non-interlaced — stdlib zlib:
chunk walk + CRC checks + all five scanline filters), **GIF** (LZW),
**WebP-lossless** (``operators.webp_lite``), **TIFF** (baseline 6.0,
II/MM, PackBits strips — round 4), binary **PPM** (P6), 24-bpp
uncompressed **BMP**, and the self-describing RAWI raw format below —
each pure Python + numpy, no external library. Audio adds WAV PCM,
G.711 µ/A-law, **IMA ADPCM** (round 4), and FLAC
(``operators.flac_lite``). The magic-byte sniff remains the single
swap-in point for Pillow/libvips where AVIF/lossy-VP8 are needed; those
still raise ``NotImplementedError`` because they genuinely require
codec libraries this container lacks.
``decode_rawi``/``resize_nearest``/``image_features`` run an actual
parse→resize→featurize over Arrow batches, oracle-checked end to end by
q_image_pipeline over a mixed RAWI/PPM/BMP corpus. Everything Spark-side —
the binary schema, the Arrow batch shape, the iterator-of-batches UDF
signature, partition sizing — is real and is what matters at 100 TB:

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
    """Real image decode for the codec-free formats: sniffs magic bytes and
    dispatches to the PPM (P6), 24-bpp BMP, or RAWI parser — each pure
    Python + numpy, returning an (h, w, 3) uint8 RGB array. Compressed
    formats (JPEG/PNG/…) require an external codec library this container
    lacks; this function stays the single Pillow/libvips swap-in point for
    them."""
    if payload[:4] == _RAWI_MAGIC:
        return decode_rawi(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg_lite import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp_lite import decode_webp

        return decode_webp(payload)
    if payload[:2] in (b"II", b"MM"):
        return decode_tiff(payload)
    if payload[:4] == b"qoif":
        return decode_qoi(payload)
    raise NotImplementedError(
        "AVIF/HEIC/... (and lossy-VP8 WebP) need codec libraries this "
        "environment lacks; baseline JPEG (jpeg_lite), PNG (stdlib zlib), "
        "lossless WebP (webp_lite), GIF, TIFF (PackBits), QOI, PPM (P6), "
        "24-bpp BMP, and RAWI decode natively"
    )


def encode_ppm(arr) -> bytes:
    """numpy (h, w, 3) uint8 RGB → binary PPM (P6, maxval 255)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("PPM P6 is 3-channel RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes):
    """Binary PPM (P6) → numpy (h, w, 3) uint8. Full header grammar:
    whitespace-separated width/height/maxval tokens with ``#`` comments,
    exactly one whitespace byte after maxval, then the raw RGB body."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment runs to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    w, h, maxval = (int(t) for t in toks)
    if maxval > 255:
        raise NotImplementedError("16-bit-per-sample PPM not supported")
    pix = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i + 1)
    return pix.reshape(h, w, 3)


def encode_bmp(arr) -> bytes:
    """numpy (h, w, 3) uint8 RGB → 24-bpp uncompressed BMP (BI_RGB,
    bottom-up rows, 4-byte row padding — the classic Windows layout)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("24-bpp BMP is 3-channel")
    pad = (-(w * 3)) % 4
    body = b"".join(
        a[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    header = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")  # file size
        + b"\x00\x00\x00\x00"                     # reserved
        + (54).to_bytes(4, "little")              # pixel-data offset
        + (40).to_bytes(4, "little")              # BITMAPINFOHEADER size
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")                 # positive = bottom-up
        + (1).to_bytes(2, "little")               # planes
        + (24).to_bytes(2, "little")              # bpp
        + (0).to_bytes(4, "little")               # BI_RGB
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2        # 72 DPI
        + (0).to_bytes(4, "little") * 2           # palette
    )
    return header + body


def decode_bmp(payload: bytes):
    """24-bpp uncompressed BMP → numpy (h, w, 3) uint8 RGB. Honors the
    pixel-data offset, 4-byte row stride, BGR order, and both bottom-up
    (positive height) and top-down (negative) row layouts."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bpp BI_RGB BMP supported (bpp={bpp}, compression={comp})")
    bottom_up, h = h > 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


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


def frame_sample(
    df: DataFrame,
    payload_col: str,
    every_n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL video frame sampling over the codec-free RAWV container (round
    3 — the video sibling of RAWI/PPM/BMP images and PCM WAV audio):
    decode, keep every ``every_n``-th frame, emit one row per sampled frame
    with per-channel means — the 1→N mapInPandas shape a real
    ffmpeg-backed sampler would use. Sniffs TWO containers: RAWV (raw
    frames) and MJPG (Motion JPEG — each frame an independently-coded
    baseline JPEG through operators.jpeg_lite, the real compressed-video
    structure). MP4/WebM inter-frame codecs (H.264/VP9) still raise —
    they genuinely need codec libraries this environment lacks."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                id_col: [], "n_frames": [], "fps": [], "frame_idx": [],
                "height": [], "width": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if raw[:4] == _MJPG_MAGIC:
                    frames, fps = decode_mjpeg(raw)
                else:
                    frames, fps = decode_rawv(raw)
                n, h, w, _c = frames.shape
                for f in range(0, n, every_n):
                    m = frames[f].reshape(-1, 3).mean(axis=0, dtype=np.float64)
                    out[id_col].append(i)
                    out["n_frames"].append(n)
                    out["fps"].append(fps)
                    out["frame_idx"].append(f)
                    out["height"].append(h)
                    out["width"].append(w)
                    out["mean_r"].append(m[0])
                    out["mean_g"].append(m[1])
                    out["mean_b"].append(m[2])
            yield pd.DataFrame(out)

    from ..session import fan_out

    return fan_out(df.select(id_col, payload_col)).mapInPandas(
        run,
        schema=(
            f"{id_col} long, n_frames int, fps int, frame_idx int, "
            "height int, width int, mean_r double, mean_g double, mean_b double"
        ),
    )


_RAWV_MAGIC = b"RAWV"


def encode_rawv(frames, fps: int = 8) -> bytes:
    """numpy (n, h, w, 3) uint8 → RAWV bytes: magic, n_frames(2B BE),
    fps(1B), w(2B), h(2B), c(1B), then n concatenated raw frames."""
    import numpy as np

    a = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = a.shape
    return (
        _RAWV_MAGIC
        + n.to_bytes(2, "big")
        + bytes([fps])
        + w.to_bytes(2, "big")
        + h.to_bytes(2, "big")
        + bytes([c])
        + a.tobytes()
    )


def decode_rawv(payload: bytes):
    """RAWV bytes → (numpy (n, h, w, c) uint8, fps). Length-checked like
    decode_rawi — corrupt payloads fail loudly."""
    import numpy as np

    if payload[:4] != _RAWV_MAGIC:
        raise NotImplementedError(
            "compressed video containers (MP4/WebM/...) unavailable in this "
            "environment; RAWV decodes natively"
        )
    n = int.from_bytes(payload[4:6], "big")
    fps = payload[6]
    w = int.from_bytes(payload[7:9], "big")
    h = int.from_bytes(payload[9:11], "big")
    c = payload[11]
    pix = np.frombuffer(payload, dtype=np.uint8, offset=12)
    if pix.size != n * h * w * c:
        raise ValueError(f"RAWV length mismatch: {pix.size} != {n}*{h}*{w}*{c}")
    return pix.reshape(n, h, w, c), fps


def synth_videos(df: DataFrame, id_col: str = "doc_id", out: str = "payload") -> DataFrame:
    """Deterministic per-id RAWV payloads: frame count, dims, and every
    pixel are closed-form in the id — pixel(f, p) = (id + 37·f + p) % 256
    with p the row-major byte position — so every sampled-frame feature is
    oracle-replayable (same design as synth_images / synth_audio)."""
    from ..session import fan_out

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            payloads = []
            for i in ids:
                i = int(i)
                n = 3 + i % 6
                w = 8 + i % 5
                h = 6 + i % 4
                p = np.arange(h * w * 3)
                frames = np.stack(
                    [((i + 37 * f + p) % 256).astype(np.uint8).reshape(h, w, 3) for f in range(n)]
                )
                payloads.append(encode_rawv(frames, fps=8))
            yield pd.DataFrame({id_col: ids, out: payloads})

    return fan_out(df.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, {out} binary"
    )


# ---------------------------------------------------------------------------
# Audio: PCM WAV is a codec-free container (RIFF header + raw samples), so
# the audio decode path is REAL too — the same pure-Python + numpy pattern
# as PPM/BMP. Compressed audio (MP3/AAC/OGG) stays behind the codec gate.
# ---------------------------------------------------------------------------


def encode_wav(samples, sample_rate: int = 16_000) -> bytes:
    """numpy (n,) or (n, channels) int16 → PCM WAV bytes (RIFF/WAVE fmt 1)."""
    import numpy as np

    a = np.ascontiguousarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    byte_rate = sample_rate * ch * 2
    data = a.tobytes()
    return (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little")       # block align
        + (16).to_bytes(2, "little")           # bits per sample
        + b"data" + len(data).to_bytes(4, "little") + data
    )


def decode_wav(payload: bytes):
    """WAV → (numpy (n, channels) int16, sample_rate). Walks RIFF chunks
    (fmt may not immediately precede data — some writers insert LIST/fact
    chunks). Supports 16-bit linear PCM plus the two G.711 telephony
    codecs — µ-law (format 7) and A-law (format 6), expanded to int16 by
    the ITU closed-form segment/mantissa rule; other compressed formats
    raise."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # torn upload / partial copy: the chunk declares more bytes
            # than the payload holds — fail loudly, never return a short
            # sample array as if the decode succeeded (round 8)
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {size} bytes, "
                f"only {len(body)} present"
            )
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact":
            fact = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    ch = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 1 and bits == 16:
        samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    elif audio_format == 7 and bits == 8:  # G.711 µ-law
        samples = _ulaw_expand(np.frombuffer(data, dtype=np.uint8))
    elif audio_format == 6 and bits == 8:  # G.711 A-law
        samples = _alaw_expand(np.frombuffer(data, dtype=np.uint8))
    elif audio_format == 0x11 and bits == 4 and ch == 1:  # IMA ADPCM (round 4)
        block_align = int.from_bytes(fmt[12:14], "little")
        spb = (block_align - 4) * 2 + 1
        n_blocks = -(-len(data) // block_align)
        n_samples = (
            int.from_bytes(fact[0:4], "little") if fact else n_blocks * spb
        )
        samples = _adpcm_decode(data, block_align, n_samples)
    else:
        raise NotImplementedError(
            "supported WAV encodings: 16-bit PCM, 8-bit G.711 mu-law/A-law, "
            f"4-bit mono IMA ADPCM (got format={audio_format}, bits={bits})"
        )
    return samples.reshape(-1, ch), sample_rate


def _ulaw_expand(u: "np.ndarray") -> "np.ndarray":
    """ITU-T G.711 µ-law byte → linear int16 (the table every decoder
    ships, computed from the segment/mantissa closed form)."""
    import numpy as np

    u = ~u & 0xFF
    sign = u & 0x80
    seg = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant.astype(np.int32) << 3) + 0x84) << seg
    mag -= 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_expand(a: "np.ndarray") -> "np.ndarray":
    """ITU-T G.711 A-law byte → linear int16."""
    import numpy as np

    a = (a ^ 0x55) & 0xFF
    sign = a & 0x80  # A-law: sign bit SET means positive
    seg = (a >> 4) & 0x07
    mant = (a & 0x0F).astype(np.int32)
    mag = np.where(
        seg == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (seg - 1)
    )
    return np.where(sign, mag, -mag).astype(np.int16)


def encode_wav_g711(samples, sample_rate: int = 8_000, law: str = "ulaw") -> bytes:
    """int16 mono samples → 8-bit G.711 WAV (format 7 µ-law / 6 A-law) —
    the compressed telephony container, for testing the decode arms."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16).reshape(-1)
    if law == "ulaw":
        enc = _ulaw_compress(s)
        fmt_code = 7
    else:
        enc = _alaw_compress(s)
        fmt_code = 6
    data = enc.tobytes()
    fmt = (
        fmt_code.to_bytes(2, "little") + (1).to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + sample_rate.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    )
    riff = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    riff += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        riff += b"\x00"
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _ulaw_compress(s: "np.ndarray") -> "np.ndarray":
    import numpy as np

    x = s.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    seg = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int32)
    mant = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant) & 0xFF).astype(np.uint8)


def _alaw_compress(s: "np.ndarray") -> "np.ndarray":
    import numpy as np

    x = s.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767)
    seg = np.where(
        mag < 256, 0,
        (np.floor(np.log2(np.maximum(mag, 1))) - 7).clip(0, 7),
    ).astype(np.int32)
    mant = np.where(seg == 0, mag >> 4, (mag >> (seg + 3)) & 0x0F)
    return (((sign | (seg << 4) | mant) ^ 0x55) & 0xFF).astype(np.uint8)


def decode_audio(payload: bytes):
    """Format-sniffing audio decode: RIFF/WAVE (PCM + G.711) or FLAC →
    (numpy (n, channels) int array, sample_rate). The audio twin of
    decode_image's magic-byte dispatch."""
    if payload[:4] == b"fLaC":
        from .flac_lite import decode_flac

        return decode_flac(payload)
    return decode_wav(payload)


def synth_audio(
    df: DataFrame, id_col: str = "doc_id", out: str = "payload", encoder=None
) -> DataFrame:
    """Deterministic per-id mono audio payloads: a sawtooth whose length,
    rate, and amplitude are closed-form in the id — every downstream
    feature is oracle-replayable, same design as synth_images. ``encoder``
    overrides the container writer (default PCM WAV; pass
    ``flac_lite.encode_flac`` for an all-FLAC corpus)."""
    from ..session import fan_out

    enc = encoder or encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            payloads = []
            for i in ids:
                n = 64 + int(i) % 129               # 64..192 samples
                amp = 100 + int(i) % 900            # peak amplitude
                # sample(t) = ((i + t) mod 64) / 63 * amp - amp/2, exact int16
                t = (int(i) + np.arange(n)) % 64
                s = (t * amp // 63 - amp // 2).astype("<i2")
                payloads.append(enc(s, sample_rate=8_000))
            yield pd.DataFrame({id_col: ids, out: payloads})

    return fan_out(df.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, {out} binary"
    )


def audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode → featurize for audio: REAL format-sniffing parse (WAV,
    G.711, FLAC), duration / sample-count / peak / mean-abs per payload —
    one Arrow batch at a time, the same partition-sizing rules as
    image_features. Sums are exact int64 so every feature is
    oracle-checkable bit-for-bit."""
    from ..session import fan_out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = decode_audio(payload)
                mono = samples[:, 0].astype(np.int64)
                # duration: one IEEE division — bit-exact cross-engine;
                # mean_abs: explicit floor-rounding (x*1e6 stays exact int64
                # range), the only cross-engine-stable 6-dp round
                rows.append(
                    (int(i), len(mono), rate,
                     len(mono) / rate,
                     int(np.abs(mono).max()),
                     math.floor(float(np.abs(mono).sum()) * 1e6 / len(mono) + 0.5) / 1e6)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_samples", "sample_rate", "duration_s",
                         "peak", "mean_abs"],
            )

    return fan_out(df.select(id_col, payload_col)).mapInPandas(
        run,
        schema=(f"{id_col} long, n_samples long, sample_rate long, "
                "duration_s double, peak long, mean_abs double"),
    )


# ---------------------------------------------------------------------------
# RAWI: a self-describing uncompressed image format so the decode path can
# be REAL in a codec-less container. Layout: b"RAWI" | width u16be |
# height u16be | channels u8 | pixels (h*w*c bytes, row-major).
# Real formats swap _decode_rawi for Pillow/libvips in decode_image; every
# other line (packing, Arrow batches, resize, features) stays as-is.
# ---------------------------------------------------------------------------

_RAWI_MAGIC = b"RAWI"


def encode_rawi(arr) -> bytes:
    """numpy (h, w, c) uint8 → RAWI bytes."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    return _RAWI_MAGIC + w.to_bytes(2, "big") + h.to_bytes(2, "big") + bytes([c]) + a.tobytes()


def decode_rawi(payload: bytes):
    """RAWI bytes → numpy (h, w, c) uint8. Raises on bad magic/length —
    corrupt payloads should fail loudly, not decode garbage."""
    import numpy as np

    if payload[:4] != _RAWI_MAGIC:
        raise ValueError("not a RAWI payload")
    w = int.from_bytes(payload[4:6], "big")
    h = int.from_bytes(payload[6:8], "big")
    c = payload[8]
    pix = np.frombuffer(payload, dtype=np.uint8, offset=9)
    if pix.size != h * w * c:
        raise ValueError(f"RAWI length mismatch: {pix.size} != {h}*{w}*{c}")
    return pix.reshape(h, w, c)


def resize_nearest(img, out_h: int, out_w: int):
    """Nearest-neighbour resize via index maps — pure numpy, O(out pixels)."""
    import numpy as np

    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def synth_images(
    df: DataFrame, id_col: str = "doc_id", out: str = "payload", formats=None
) -> DataFrame:
    """Deterministic per-id image payloads in a FORMAT MIX — by default
    RAWI, PPM, or BMP by ``id % 3`` (the fixture has no binary media, so
    the bytes are synthesized — dimensions and pixel content are
    closed-form in the id, which keeps downstream features oracle-visible
    across every container format). ``formats`` overrides the encoder
    cycle (e.g. ``(encode_png,)`` for an all-PNG corpus). Generated inside
    mapInPandas: at scale the payload bytes enter exactly here — from the
    source file — so the batch shape matches production."""
    from ..session import fan_out

    encoders = tuple(formats) if formats else (encode_rawi, encode_ppm, encode_bmp)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            payloads = []
            for i in ids:
                w = 8 + int(i) % 16
                h = 8 + int(i) % 12
                # pixel(y, x, ch) = (i + y*w*3 + x*3 + ch) mod 256
                a = (int(i) + np.arange(h * w * 3)) % 256
                payloads.append(
                    encoders[int(i) % len(encoders)](
                        a.reshape(h, w, 3).astype(np.uint8)
                    )
                )
            yield pd.DataFrame({id_col: ids, out: payloads})

    return fan_out(df.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, {out} binary"
    )


def image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    thumb: int = 8,
) -> DataFrame:
    """Decode → resize → featurize, the canonical multimodal batch: REAL
    format-sniffing decode (RAWI/PPM/BMP), REAL nearest-neighbour resize,
    per-channel mean over the thumbnail — one Arrow batch at a time, codec
    init hoisted (here: none needed). At 100 TB this is the
    partition-sizing-critical stage: payload bytes dominate the batch, so
    bound rows-per-batch via
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (scale_notes §2.11)."""
    from ..session import fan_out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(payload)
                t = resize_nearest(img, thumb, thumb)
                means = t.reshape(-1, img.shape[2]).mean(axis=0)
                rows.append(
                    (int(i), img.shape[1], img.shape[0], len(payload),
                     round(float(means[0]), 4), round(float(means[1]), 4),
                     round(float(means[2]), 4))
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "byte_len",
                         "mean_r", "mean_g", "mean_b"],
            )

    return fan_out(df.select(id_col, payload_col)).mapInPandas(
        run,
        schema=(f"{id_col} long, width int, height int, byte_len long, "
                "mean_r double, mean_g double, mean_b double"),
    )


# --------------------------------------------------------------------------
# PNG — a REAL compressed mainstream format, decoded with stdlib zlib only
# (round 3). Scope: 8-bit greyscale/RGB/RGBA, non-interlaced, all five
# scanline filters. This moves decode_image past "codec-free formats only":
# PNG's compression is DEFLATE, which Python ships.
# --------------------------------------------------------------------------
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(arr) -> bytes:
    """numpy (h, w) or (h, w, {3,4}) uint8 → PNG (8-bit, filter 0 rows,
    zlib-compressed IDAT, CRC-correct chunks)."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, nch = 0, 1
    elif a.ndim == 3 and a.shape[2] == 3:
        color, nch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, nch = 6, 4
    else:
        raise ValueError("PNG encoder: (h,w), (h,w,3) or (h,w,4) uint8")
    h, w = a.shape[:2]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))  # filter 0/row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """PNG → numpy uint8 array ((h, w, 3) RGB — grey replicated, alpha
    dropped — so downstream featurize sees one shape). Implements the real
    format: chunk walk with CRC verification, zlib-inflated IDAT
    (concatenated across chunks per spec), and all five scanline filters
    (None/Sub/Up/Average/Paeth) undone row-sequentially."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = color = None
    while pos < len(payload):
        (n,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + n]
        (crc,) = struct.unpack(">I", payload[pos + 8 + n : pos + 12 + n])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                raise NotImplementedError(
                    "PNG subset: 8-bit grey/RGB/RGBA, non-interlaced"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + n
    nch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        ftype = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
        p += 1 + stride
        if ftype == 1:  # Sub
            for x in range(nch, stride):
                row[x] = (int(row[x]) + int(row[x - nch])) & 0xFF
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - nch]) if x >= nch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a_ = int(row[x - nch]) if x >= nch else 0
                b_ = int(prev[x])
                c_ = int(prev[x - nch]) if x >= nch else 0
                pp = a_ + b_ - c_
                pa, pb, pc = abs(pp - a_), abs(pp - b_), abs(pp - c_)
                pred = a_ if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
                row[x] = (int(row[x]) + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG: unknown filter {ftype}")
        out[y] = row
        prev = out[y]
    img = out.reshape(h, w, nch)
    if nch == 1:
        img = np.repeat(img, 3, axis=2).reshape(h, w, 3)
    elif nch == 4:
        img = img[:, :, :3]
    return img


def audio_spectral(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    n_bands: int = 4,
) -> DataFrame:
    """REAL spectral featurization over WAV payloads (numpy rFFT inside the
    Arrow batch — no DSP library): per clip, the dominant non-DC frequency
    (Hz), its share of total spectral energy, and ``n_bands`` equal-width
    band energy fractions — the features a speech/music classifier or a
    silence/noise gate consumes. Pure per-row compute after decode: no
    shuffle, scales like every other mapInPandas featurizer. Rows-only by
    nature (FFT floats aren't SQL-replayable); the physics is pinned in
    pytest: the synthesized sawtooth's recovered fundamental must sit
    within one bin of rate/64."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                id_col: [], "dominant_hz": [], "dominant_share": [],
                **{f"band_{b}": [] for b in range(n_bands)},
            }
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = decode_wav(bytes(blob))
                x = samples[:, 0].astype("float64")
                spec = np.abs(np.fft.rfft(x - x.mean())) ** 2
                spec[0] = 0.0
                total = float(spec.sum()) or 1.0
                k = int(spec.argmax())
                freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
                bands = np.array_split(spec[1:], n_bands)
                out[id_col].append(int(i))
                out["dominant_hz"].append(float(freqs[k]))
                out["dominant_share"].append(float(spec[k] / total))
                for b in range(n_bands):
                    out[f"band_{b}"].append(float(bands[b].sum() / total))
            yield pd.DataFrame(out)

    schema = (
        f"{id_col} long, dominant_hz double, dominant_share double, "
        + ", ".join(f"band_{b} double" for b in range(n_bands))
    )
    return df.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# GIF — the dictionary-compression (LZW) family, pure Python (round 3).
# Lossless for ≤256-color images, so pipelines over GIF payloads stay
# oracle-exact like PNG. Scope: GIF87a/89a, global/local color tables,
# interlace, first frame; animation frames beyond the first are ignored.
# --------------------------------------------------------------------------
def encode_gif(arr) -> bytes:
    """numpy (h, w, 3) uint8 with ≤256 distinct colors → GIF89a bytes
    (real LZW compression, sorted-palette for determinism)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("GIF needs ≤256 distinct colors")
    bits = max(2, int(len(palette) - 1).bit_length())  # palette size exponent
    gct = np.zeros((1 << bits, 3), np.uint8)
    gct[: len(palette)] = palette

    # LZW encode (variable width, clear=2^bits, eoi=clear+1)
    min_code = bits
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out_codes: list[tuple[int, int]] = []  # (code, width)
    width = min_code + 1
    table = {(i,): i for i in range(1 << min_code)}
    next_code = eoi + 1
    out_codes.append((clear, width))
    seq: tuple[int, ...] = ()
    for px in inverse.tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        out_codes.append((table[seq], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4096 - 1:
            out_codes.append((clear, width))
            table = {(i,): i for i in range(1 << min_code)}
            next_code = eoi + 1
            width = min_code + 1
        seq = (px,)
    if seq:
        out_codes.append((table[seq], width))
        # the decoder appends a table entry for this final code too (one
        # per code after the first-after-clear), so its width can cross
        # the power-of-two boundary BEFORE it reads EOI; mirror that bump
        # or EOI is written one bit narrower than the decoder reads it.
        # Mid-stream the two stay aligned because every other emission
        # carries an assignment (hypothesis-found, r11: 462-pixel stream
        # whose last data code landed exactly on the boundary).
        if next_code == (1 << width) and width < 12:
            width += 1
    out_codes.append((eoi, width))

    # pack codes LSB-first (GIF bit order), then 255-byte sub-blocks
    acc = n = 0
    data = bytearray()
    for code, cw in out_codes:
        acc |= code << n
        n += cw
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    blocks = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"

    head = b"GIF89a"
    head += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    head += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])  # GCT flag+size
    head += gct.tobytes()
    img = b"\x2c" + b"\x00\x00\x00\x00" + w.to_bytes(2, "little") + h.to_bytes(
        2, "little"
    ) + b"\x00"
    return head + img + bytes([min_code]) + bytes(blocks) + b"\x3b"


def decode_gif(payload: bytes):
    """GIF87a/89a first frame → numpy (h, w, 3) uint8 RGB: real LZW
    decode (variable code width, clear/EOI, 4096-entry dictionary),
    global/local color tables, interlace row reordering; extensions
    skipped via the sub-block walk."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02X}")
        # image descriptor
        w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        iflags = payload[pos + 9]
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            # spec-legal: neither global nor local table — decoders supply a
            # default palette; fail with a named error, not a NoneType index
            raise ValueError(
                "GIF has neither a global nor a local color table; "
                "decode_gif does not synthesize a default palette"
            )
        interlaced = bool(iflags & 0x40)
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        # LZW decode (LSB-first bit order)
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        width = min_code + 1
        table: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
        acc = n_bits = bitpos = 0
        pixels = bytearray()
        prev: bytes | None = None
        while True:
            while n_bits < width:
                if bitpos >= len(data):
                    raise ValueError("GIF: truncated LZW stream")
                acc |= data[bitpos] << n_bits
                bitpos += 1
                n_bits += 8
            code = acc & ((1 << width) - 1)
            acc >>= width
            n_bits -= width
            if code == clear:
                table = table[: (1 << min_code) + 2]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                break
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            pixels += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
        idx = np.frombuffer(bytes(pixels[: w * h]), np.uint8)
        if interlaced:
            rows = np.empty(h, np.int64)
            order = (
                list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2))
            )
            rows[np.array(order)] = np.arange(h)
            idx = idx.reshape(h, w)[rows].reshape(-1)
        return ct[idx].reshape(h, w, 3)
    raise ValueError(f"GIF: no image frame found ({sw}x{sh} screen)")


_MJPG_MAGIC = b"MJPG"


def encode_mjpeg(frames, fps: int = 8, quality: int = 90) -> bytes:
    """numpy (n, h, w, 3) uint8 → MJPG container: magic, n_frames(2B BE),
    fps(1B), then per frame a 4-byte BE length + a COMPLETE baseline JPEG
    (operators.jpeg_lite). This is Motion JPEG's actual structure —
    independently-coded JPEG frames — in a minimal length-prefixed
    container (AVI/MOV wrap the same frames in RIFF/QuickTime atoms)."""
    import numpy as np

    from .jpeg_lite import encode_jpeg

    a = np.ascontiguousarray(frames, dtype=np.uint8)
    out = bytearray(_MJPG_MAGIC)
    out += len(a).to_bytes(2, "big") + bytes([fps])
    for frame in a:
        j = encode_jpeg(frame, quality)
        out += len(j).to_bytes(4, "big") + j
    return bytes(out)


def decode_mjpeg(payload: bytes):
    """MJPG container → (numpy (n, h, w, 3) uint8, fps): length-prefixed
    walk, each frame through the baseline JPEG decoder."""
    import numpy as np

    from .jpeg_lite import decode_jpeg

    if payload[:4] != _MJPG_MAGIC:
        raise ValueError("not an MJPG payload")
    n = int.from_bytes(payload[4:6], "big")
    fps = payload[6]
    pos = 7
    frames = []
    for _ in range(n):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        frames.append(decode_jpeg(payload[pos + 4 : pos + 4 + ln]))
        pos += 4 + ln
    return np.stack(frames), fps


# -- IMA ADPCM (WAV format 0x11) — round 4 ---------------------------------
# Public spec: IMA "Recommended Practices for Enhancing Digital Audio
# Compatibility" (1992) / Microsoft WAVE format 0x11. 4:1 compression,
# ENTIRELY integer arithmetic — unlike DCT codecs the lossy result is
# bit-deterministic, so tests can pin exact decoded samples.

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibble(n: int, pred: int, idx: int) -> tuple[int, int]:
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    if n & 8:
        pred -= diff
    else:
        pred += diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[n & 7]))
    return pred, idx


def encode_wav_adpcm(samples, sample_rate: int = 8_000, block_align: int = 256) -> bytes:
    """int16 mono samples → IMA-ADPCM WAV (format 0x11): per-block 4-byte
    header (predictor int16, step index, reserved) + 4-bit nibbles, LSB
    nibble first, ``fact`` chunk carrying the true sample count."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16).reshape(-1).tolist()
    spb = (block_align - 4) * 2 + 1  # samples per block (mono)
    idx = 0
    blocks = []
    for b0 in range(0, len(s), spb):
        chunk = s[b0 : b0 + spb]
        pred = chunk[0]
        blocks.append(
            int(pred & 0xFFFF).to_bytes(2, "little") + bytes([idx, 0])
        )
        nibbles = []
        for x in chunk[1:]:
            step = _IMA_STEPS[idx]
            delta = x - pred
            n = 8 if delta < 0 else 0
            if delta < 0:
                delta = -delta
            if delta >= step:
                n |= 4
                delta -= step
            if delta >= step >> 1:
                n |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                n |= 1
            pred, idx = _ima_decode_nibble(n, pred, idx)
            nibbles.append(n)
        if len(nibbles) & 1:
            nibbles.append(0)
        blocks.append(
            bytes(nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2))
        )
    data = b"".join(blocks)
    spb_bytes = spb.to_bytes(2, "little")
    byte_rate = max(1, sample_rate * block_align // spb)
    fmt = (
        (0x11).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + spb_bytes
    )
    fact = len(s).to_bytes(4, "little")
    riff = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    riff += b"fact" + len(fact).to_bytes(4, "little") + fact
    riff += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        riff += b"\x00"
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _adpcm_decode(data: bytes, block_align: int, n_samples: int):
    import numpy as np

    spb = (block_align - 4) * 2 + 1
    out: list[int] = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4:
            break
        pred = int.from_bytes(block[0:2], "little", signed=True)
        idx = block[2]
        if idx > 88:
            raise ValueError(f"ADPCM step index {idx} out of range")
        out.append(pred)
        want = min(spb, n_samples - len(out) + 1) - 1
        for byte in block[4:]:
            for n in (byte & 0x0F, byte >> 4):
                if want <= 0:
                    break
                pred, idx = _ima_decode_nibble(n, pred, idx)
                out.append(pred)
                want -= 1
        if len(out) >= n_samples:
            break
    return np.asarray(out[:n_samples], dtype=np.int16)


# -- TIFF (baseline 6.0, PackBits) — round 4 -------------------------------
# The archival/scanning format: II/MM byte order, IFD tag walk, strip
# assembly, Compression 1 (none) or 32773 (PackBits RLE). Lossless, so the
# pipeline is oracle-exact end to end like PPM/BMP/PNG/GIF/WebP-lossless.


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out.append(257 - run & 0xFF)
            out.append(row[i])
            i = j + 1
        else:
            # literal run until next ≥2-byte repeat (max 128)
            k = i
            while (
                k + 1 < n
                and k - i < 127
                and not (k + 2 < n and row[k + 1] == row[k + 2])
            ):
                k += 1
            if k + 1 >= n:
                k = min(n - 1, i + 127)
            out.append(k - i & 0x7F)
            out += row[i : k + 1]
            i = k + 1
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        h = data[i]
        i += 1
        if h == 128:
            continue
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        else:
            out += bytes([data[i]]) * (257 - h)
            i += 1
    if len(out) != expect:
        raise ValueError(f"PackBits strip decoded {len(out)} of {expect} bytes")
    return bytes(out)


def encode_tiff(arr) -> bytes:
    """numpy (h, w, 3) uint8 → baseline little-endian TIFF 6.0 with
    PackBits-compressed strips (one strip per image)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_tiff expects (h, w, 3) RGB")
    h, w, _ = a.shape
    strip = _packbits_encode(a.tobytes())
    data_off = 8
    ifd_off = data_off + len(strip) + (len(strip) & 1)
    n_tags = 9
    bps_off = ifd_off + 2 + n_tags * 12 + 4  # BitsPerSample value area

    def tag(tid, ttype, count, value):
        return (
            tid.to_bytes(2, "little") + ttype.to_bytes(2, "little")
            + count.to_bytes(4, "little") + value
        )

    def short_v(v):
        return v.to_bytes(2, "little") + b"\x00\x00"

    def long_v(v):
        return v.to_bytes(4, "little")

    ifd = (n_tags).to_bytes(2, "little")
    ifd += tag(256, 3, 1, short_v(w))            # ImageWidth
    ifd += tag(257, 3, 1, short_v(h))            # ImageLength
    ifd += tag(258, 3, 3, long_v(bps_off))       # BitsPerSample → offset
    ifd += tag(259, 3, 1, short_v(32773))        # Compression: PackBits
    ifd += tag(262, 3, 1, short_v(2))            # Photometric: RGB
    ifd += tag(273, 4, 1, long_v(data_off))      # StripOffsets
    ifd += tag(277, 3, 1, short_v(3))            # SamplesPerPixel
    ifd += tag(278, 3, 1, short_v(h))            # RowsPerStrip
    ifd += tag(279, 4, 1, long_v(len(strip)))    # StripByteCounts
    ifd += (0).to_bytes(4, "little")             # next IFD: none
    ifd += (8).to_bytes(2, "little") * 3         # BitsPerSample values
    pad = b"\x00" if len(strip) & 1 else b""
    return (
        b"II" + (42).to_bytes(2, "little") + ifd_off.to_bytes(4, "little")
        + strip + pad + ifd
    )


def decode_tiff(payload: bytes):
    """Baseline TIFF → (h, w, 3) uint8: II/MM byte order, first-IFD tag
    walk, multi-strip assembly, Compression none/PackBits. Tiled, planar,
    paletted, and LZW/DEFLATE TIFFs raise with a clear message."""
    import numpy as np

    if payload[:2] == b"II":
        bo = "little"
    elif payload[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload")

    def u(b):
        return int.from_bytes(b, bo)

    if u(payload[2:4]) != 42:
        raise ValueError("bad TIFF magic")
    ifd = u(payload[4:8])
    n = u(payload[ifd : ifd + 2])
    tags = {}
    for i in range(n):
        o = ifd + 2 + i * 12
        tid, ttype, cnt = u(payload[o : o + 2]), u(payload[o + 2 : o + 4]), u(payload[o + 4 : o + 8])
        raw = payload[o + 8 : o + 12]
        size = {1: 1, 3: 2, 4: 4}.get(ttype)
        if size is None:
            continue
        if size * cnt <= 4:
            vals = [u(raw[k * size : (k + 1) * size]) for k in range(cnt)]
        else:
            off = u(raw)
            vals = [
                u(payload[off + k * size : off + (k + 1) * size]) for k in range(cnt)
            ]
        tags[tid] = vals
    w, h = tags[256][0], tags[257][0]
    comp = tags.get(259, [1])[0]
    photometric = tags.get(262, [2])[0]
    spp = tags.get(277, [1])[0]
    planar = tags.get(284, [1])[0]
    if photometric != 2 or spp != 3 or planar != 1:
        raise NotImplementedError(
            f"decode_tiff handles chunky RGB (photometric={photometric}, "
            f"spp={spp}, planar={planar})"
        )
    if any(b != 8 for b in tags.get(258, [8])):
        raise NotImplementedError("decode_tiff handles 8 bits per sample")
    rows_per_strip = tags.get(278, [h])[0]
    offs, counts = tags[273], tags[279]
    out = bytearray()
    remaining = h
    for so, sc in zip(offs, counts):
        rows = min(rows_per_strip, remaining)
        expect = rows * w * 3
        chunk = payload[so : so + sc]
        if comp == 1:
            if len(chunk) < expect:
                raise ValueError("TIFF strip truncated")
            out += chunk[:expect]
        elif comp == 32773:
            out += _packbits_decode(chunk, expect)
        else:
            raise NotImplementedError(
                f"decode_tiff handles Compression 1/32773 (got {comp})"
            )
        remaining -= rows
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, 3)


# --------------------------------------------------------------------------
# QOI — "Quite OK Image" (public spec qoiformat.org, round 5) — lossless,
# byte-oriented: hash-index, diff, luma, run and raw-RGB ops. Eighth codec
# family; pure Python like the rest (SURVEY §2.11 multimodal tier).
# --------------------------------------------------------------------------
def _qoi_wrap(d: int) -> int:
    """int8 wraparound difference, matching the spec's signed-char math."""
    return ((d + 128) & 0xFF) - 128


def encode_qoi(arr) -> bytes:
    """numpy (h, w, 3) uint8 RGB → QOI (channels=3, linear colorspace)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("this QOI encoder is 3-channel RGB")
    out = bytearray(
        b"qoif" + w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([3, 0])
    )
    index = [(0, 0, 0, 0)] * 64
    pr = pg = pb = 0
    run = 0
    for r, g, b in a.reshape(-1, 3).tolist():
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        idx = (r * 3 + g * 5 + b * 7 + 255 * 11) % 64
        if index[idx] == (r, g, b, 255):
            out.append(idx)
        else:
            index[idx] = (r, g, b, 255)
            dr, dg, db = _qoi_wrap(r - pr), _qoi_wrap(g - pg), _qoi_wrap(b - pb)
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((0xFE, r, g, b))
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_qoi(payload: bytes):
    """QOI → numpy (h, w, 3) uint8 RGB (RGBA payloads flatten their alpha
    away would be lossy — rejected; this pipeline only emits RGB)."""
    import numpy as np

    if payload[:4] != b"qoif":
        raise ValueError("not a QOI payload")
    w = int.from_bytes(payload[4:8], "big")
    h = int.from_bytes(payload[8:12], "big")
    if payload[12] != 3:
        raise NotImplementedError("RGBA QOI not produced by this pipeline")
    out = np.empty((h * w, 3), np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    i, n = 14, 0
    total = h * w
    while n < total:
        b1 = payload[i]
        i += 1
        if b1 == 0xFE:  # QOI_OP_RGB
            r, g, b = payload[i], payload[i + 1], payload[i + 2]
            i += 3
        elif b1 == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = payload[i], payload[i + 1], payload[i + 2], payload[i + 3]
            i += 4
        elif b1 >> 6 == 0:  # QOI_OP_INDEX
            r, g, b, a = index[b1]
        elif b1 >> 6 == 1:  # QOI_OP_DIFF
            r = (r + ((b1 >> 4) & 3) - 2) & 0xFF
            g = (g + ((b1 >> 2) & 3) - 2) & 0xFF
            b = (b + (b1 & 3) - 2) & 0xFF
        elif b1 >> 6 == 2:  # QOI_OP_LUMA
            dg = (b1 & 0x3F) - 32
            b2 = payload[i]
            i += 1
            r = (r + dg + ((b2 >> 4) & 0xF) - 8) & 0xFF
            g = (g + dg) & 0xFF
            b = (b + dg + (b2 & 0xF) - 8) & 0xFF
        else:  # QOI_OP_RUN
            for _ in range((b1 & 0x3F) + 1):
                out[n] = (r, g, b)
                n += 1
            continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[n] = (r, g, b)
        n += 1
    return out.reshape(h, w, 3)
