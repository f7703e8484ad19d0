"""Baseline JPEG (JFIF) codec in pure Python + numpy (SURVEY §2.11
multimodal) — closes the "compressed mainstream image codec" gap without
Pillow/libjpeg.

Scope: baseline sequential DCT, 8-bit, Huffman entropy coding, 4:4:4 (no
chroma subsampling) and grayscale; the quantization and Huffman tables are
the public JPEG Annex K defaults. The encoder exists to synthesize
spec-conform test payloads; the decoder handles files from any baseline
encoder that sticks to 1×1 sampling (progressive, arithmetic coding, and
subsampled chroma raise — they are documented out of scope, and
``decode_image`` remains the Pillow swap-in point for them).

JPEG is LOSSY: decode(encode(x)) ≈ x, not ==. Tests therefore pin (a)
bit-determinism of the encoder, (b) PSNR ≥ 30 dB on smooth content, (c)
near-exact recovery of flat blocks, rather than a value-hash oracle.

Everything block-local: FDCT/IDCT are exact float DCT-II/III matrices via
numpy; the entropy coder is the only sequential part. Inside the engine
this runs per-payload in Arrow-batched ``mapInPandas`` like every other
codec — per-row work, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# constants (JPEG spec Annex K — public defaults)
# --------------------------------------------------------------------------
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# (bits, values) per Annex K: DC luma, AC luma, DC chroma, AC chroma
_HUFF_DC_L = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_C = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# exact DCT-II basis (type-II forward with orthonormal scaling)
_C = np.array([
    [np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _scaled_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → table as-is, 90 → table/5, etc."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = (qt * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _build_codes(bits, vals):
    """Canonical Huffman: symbol → (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits, vals):
    """Canonical Huffman decode table: (length, code) → symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if not self.n:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + offset bits for a signed value."""
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v >= 0:
        return size, v
    return size, v + (1 << size) - 1


def _extend(bits_val: int, size: int) -> int:
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


def _rgb_to_ycc(a: np.ndarray) -> np.ndarray:
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycc_to_rgb(y, cb, cr):
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------
def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """numpy (h, w, 3) RGB or (h, w) grayscale uint8 → baseline JFIF bytes
    (4:4:4, Annex K tables scaled by ``quality``, deterministic)."""
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    qts = [_scaled_qt(_QT_LUMA, quality)] + (
        [] if gray else [_scaled_qt(_QT_CHROMA, quality)]
    )
    planes = [a - 128.0] if gray else list(
        np.moveaxis(_rgb_to_ycc(a) - 128.0, -1, 0)
    )

    dc_codes = [_build_codes(*_HUFF_DC_L), _build_codes(*_HUFF_DC_C)]
    ac_codes = [_build_codes(*_HUFF_AC_L), _build_codes(*_HUFF_AC_C)]
    bw = _BitWriter()
    pred = [0] * len(planes)
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.zeros((bh * 8, bwid * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]  # edge-replicate padding
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    for by in range(bh):
        for bx in range(bwid):
            for ci, p in enumerate(padded):
                t = 0 if ci == 0 else 1
                qt = qts[min(ci, len(qts) - 1)]
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = np.round(_fdct(block) / qt).astype(np.int64)
                zz = coef.flatten()[_ZIGZAG]
                # DC
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size, val = _magnitude(diff)
                c, ln = dc_codes[t][size]
                bw.write(c, ln)
                if size:
                    bw.write(val, size)
                # AC
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_codes[t][0xF0]  # ZRL
                        bw.write(c, ln)
                        run -= 16
                    size, val = _magnitude(v)
                    c, ln = ac_codes[t][(run << 4) | size]
                    bw.write(c, ln)
                    bw.write(val, size)
                    run = 0
                if run:
                    c, ln = ac_codes[t][0x00]  # EOB
                    bw.write(c, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, qt in enumerate(qts):
        out += seg(0xDB, bytes([i]) + bytes(qt.flatten()[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, min(ci, len(qts) - 1)])
    out += seg(0xC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, _HUFF_DC_L), (1, 0, _HUFF_AC_L),
        (0, 1, _HUFF_DC_C), (1, 1, _HUFF_AC_C),
    )[: 2 * (2 if not gray else 1)]:
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → numpy (h, w, 3) uint8 RGB (grayscale
    replicated). Supports baseline sequential Huffman, 1×1 sampling;
    progressive / arithmetic / subsampled files raise."""
    data = payload
    assert data[:2] == b"\xff\xd8", "not a JPEG (no SOI)"
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = w = None
    comps = []  # (id, qt_id)
    scan_comps = []  # (comp_idx, dc_id, ac_id)
    restart = 0
    while pos < len(data):
        assert data[pos] == 0xFF, f"expected marker at {pos}"
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (may hold several tables)
            bp = 0
            while bp < len(body):
                prec, tid = body[bp] >> 4, body[bp] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                flat = np.frombuffer(body, np.uint8, 64, bp + 1).astype(np.int32)
                qt = np.zeros(64, np.int32)
                qt[_ZIGZAG] = flat
                qts[tid] = qt.reshape(8, 8)
                bp += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            bp = 6
            for _ in range(nc):
                cid, samp, qid = body[bp], body[bp + 1], body[bp + 2]
                if samp != 0x11:
                    raise NotImplementedError("subsampled chroma (non-1x1)")
                comps.append((cid, qid))
                bp += 3
        elif marker in (0xC2, 0xC3, 0xC9, 0xCA):
            raise NotImplementedError("progressive/arithmetic JPEG")
        elif marker == 0xC4:  # DHT (may hold several tables)
            bp = 0
            while bp < len(body):
                cls, tid = body[bp] >> 4, body[bp] & 0xF
                bits = list(body[bp + 1 : bp + 17])
                n = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + n])
                (dc_tables if cls == 0 else ac_tables)[tid] = _build_decode(
                    bits, vals
                )
                bp += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            nc = body[0]
            bp = 1
            for _ in range(nc):
                cid = body[bp]
                tsel = body[bp + 1]
                idx = next(i for i, (c, _) in enumerate(comps) if c == cid)
                scan_comps.append((idx, tsel >> 4, tsel & 0xF))
                bp += 2
            pos += ln
            break
        pos += ln

    # entropy-coded segment runs to EOI (handle restart markers)
    end = data.rfind(b"\xff\xd9")
    scan_bytes = data[pos:end]

    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw_ * 8)) for _ in comps]
    pred = [0] * len(comps)
    br = _BitReader(scan_bytes)
    mcu = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart and mcu and mcu % restart == 0:
                # byte-align and consume RSTn
                br.n = 0
                while br.data[br.pos] == 0xFF and 0xD0 <= br.data[br.pos + 1] <= 0xD7:
                    br.pos += 2
                pred = [0] * len(comps)
            mcu += 1
            for idx, dc_id, ac_id in scan_comps:
                qt = qts[comps[idx][1]]
                zz = np.zeros(64, np.int64)
                size = br.symbol(dc_tables[dc_id])
                diff = _extend(br.bits(size), size) if size else 0
                pred[idx] += diff
                zz[0] = pred[idx]
                k = 1
                while k < 64:
                    sym = br.symbol(ac_tables[ac_id])
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += run
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
                coef = np.zeros(64, np.float64)
                coef[_ZIGZAG] = zz
                block = _idct(coef.reshape(8, 8) * qt)
                planes[idx][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block

    planes = [p[:h, :w] + 128.0 for p in planes]
    if len(planes) == 1:
        g = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycc_to_rgb(planes[0], planes[1], planes[2])
