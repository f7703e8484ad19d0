"""Pure-Python FLAC decoder + minimal encoder (SURVEY §2.11 multimodal
audio — the fifth compression family in the decode path: Rice-coded
linear-prediction residuals, the lossless audio analogue of PNG's
filter+DEFLATE).

Implemented from the public FLAC format specification (RFC 9639 /
https://xiph.org/flac/format.html):

- ``fLaC`` magic + metadata blocks (STREAMINFO parsed: block sizes,
  20-bit sample rate, channels, bits per sample, total samples);
- frames: 14-bit sync, blocking strategy, coded block-size/sample-rate/
  channel-assignment/sample-size, UTF-8-style coded frame/sample number,
  CRC-8 header check, CRC-16 frame check;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (the standard
  polynomial predictors), and LPC of any order (signed quantized
  coefficients, precision 4+1 bits, right-shift accumulator), plus
  wasted-bits unary prefixes;
- residuals: both Rice methods (4- and 5-bit parameters), 2^po
  partitions, escape-coded raw partitions (5-bit width, width 0 = all
  zeros), zigzag-free FLAC signed folding (unary quotient + param bits);
- stereo decorrelation: independent, left/side, right/side, and
  mid/side (side channel carries bps+1 bits), reconstructed exactly.

The encoder writes spec-conform streams with VERBATIM subframes and
independent channels (fixed blocking, explicit 16-bit block sizes,
CRC-8/CRC-16 correct) — its job is synthesizing corpora whose decode is
then proven two ways: encoder round trips plus hand-built frames in
tests/test_operators.py for every feature the encoder never emits
(constant, fixed, LPC, Rice partitions, escapes, wasted bits, all three
stereo decorrelation modes).

Scale: decode runs inside Arrow-batched ``mapInPandas``
(operators/multimodal.py audio_features) — payload bytes stay in the
row, decode parallelizes with the data. Production swaps `decode_flac`
for libFLAC/ffmpeg with no plan change.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# MSB-first bit I/O (FLAC packs bits big-endian, unlike VP8L)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.pos >= len(self.data) * 8:
                raise ValueError("FLAC: truncated stream")
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.pos >= len(self.data) * 8:
                raise ValueError("FLAC: truncated unary run")
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            self.pos += 1
            if bit:
                return q
            q += 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def align(self) -> None:
        while len(self.bits) & 7:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        out = bytearray(len(self.bits) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (7 - (i & 7))
        return bytes(out)


# ---------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005, both
# non-reflected, init 0 — per the FLAC spec)
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# UTF-8-style coded numbers (frame/sample index, up to 36 bits)
# ---------------------------------------------------------------------------


def _encode_utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    for n_extra in range(1, 7):
        if v < (1 << (6 - n_extra + 6 * n_extra)):
            lead = (0xFF << (7 - n_extra)) & 0xFF
            out = [lead | (v >> (6 * n_extra))]
            for i in range(n_extra - 1, -1, -1):
                out.append(0x80 | ((v >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("FLAC: coded number too large")


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_extra = 0
    mask = 0x40
    while b0 & mask:
        n_extra += 1
        mask >>= 1
    if n_extra == 0:
        raise ValueError("FLAC: invalid coded-number lead byte")
    v = b0 & (mask - 1)
    for _ in range(n_extra):
        b = br.read(8)
        if b >> 6 != 0b10:
            raise ValueError("FLAC: invalid coded-number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residuals(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    pbits = 4 + method  # Rice (4-bit) or Rice2 (5-bit) parameters
    escape = (1 << pbits) - 1
    po = br.read(4)
    if blocksize % (1 << po):
        raise ValueError("FLAC: partition order does not divide block size")
    res: list[int] = []
    for p in range(1 << po):
        n = (blocksize >> po) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            width = br.read(5)
            for _ in range(n):
                res.append(br.read_signed(width) if width else 0)
        else:
            for _ in range(n):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                res.append((v >> 1) ^ -(v & 1))  # FLAC signed folding
    return res


def _read_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    bps -= wasted

    if stype == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = [v] * blocksize
    elif stype == 1:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        out = [br.read_signed(bps) for _ in range(order)]
        coeffs = _FIXED_COEFFS[order]
        for r in _read_residuals(br, blocksize, order):
            pred = sum(c * out[-1 - j] for j, c in enumerate(coeffs))
            out.append(r + pred)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        out = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = br.read_signed(5)
        coeffs = [br.read_signed(precision) for _ in range(order)]
        for r in _read_residuals(br, blocksize, order):
            acc = sum(c * out[-1 - j] for j, c in enumerate(coeffs))
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        out = [s << wasted for s in out]
    return out


def decode_flac(payload: bytes):
    """FLAC bytes → (numpy (n, channels) int32, sample_rate) — the same
    shape contract as decode_wav."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        head = payload[pos]
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if head & 0x7F == 0:  # STREAMINFO
            raw = int.from_bytes(body[10:18], "big")
            info = {
                "sample_rate": raw >> 44,
                "channels": ((raw >> 41) & 0x7) + 1,
                "bps": ((raw >> 36) & 0x1F) + 1,
                "total": raw & ((1 << 36) - 1),
            }
        pos += 4 + length
        if head & 0x80:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")

    channels_out: list[list[int]] = [[] for _ in range(info["channels"])]
    br = _BitReader(payload, pos * 8)
    total_bits = len(payload) * 8
    while br.pos + 16 <= total_bits:
        frame_start_byte = br.pos >> 3
        if br.read(14) != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_assign = br.read(4)
        size_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block-size code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample-rate code")
        # CRC-8 covers the header bytes up to here
        hdr = payload[frame_start_byte : br.pos >> 3]
        if br.read(8) != _crc8(hdr):
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if size_code == 0:
            bps = info["bps"]
        elif size_code in _SAMPLE_SIZES:
            bps = _SAMPLE_SIZES[size_code]
        else:
            raise ValueError(f"FLAC: reserved sample-size code {size_code}")
        if chan_assign < 8:
            n_ch = chan_assign + 1
            subs = [_read_subframe(br, blocksize, bps) for _ in range(n_ch)]
        elif chan_assign == 8:  # left/side
            left = _read_subframe(br, blocksize, bps)
            side = _read_subframe(br, blocksize, bps + 1)
            subs = [left, [lv - sv for lv, sv in zip(left, side)]]
        elif chan_assign == 9:  # right/side
            side = _read_subframe(br, blocksize, bps + 1)
            right = _read_subframe(br, blocksize, bps)
            subs = [[rv + sv for rv, sv in zip(right, side)], right]
        elif chan_assign == 10:  # mid/side
            mid = _read_subframe(br, blocksize, bps)
            side = _read_subframe(br, blocksize, bps + 1)
            subs = [[], []]
            for mv, sv in zip(mid, side):
                m2 = (mv << 1) | (sv & 1)
                subs[0].append((m2 + sv) >> 1)
                subs[1].append((m2 - sv) >> 1)
        else:
            raise ValueError(f"FLAC: reserved channel assignment {chan_assign}")
        if len(subs) != info["channels"]:
            raise ValueError("FLAC: frame channel count != STREAMINFO")
        br.align()
        frame = payload[frame_start_byte : br.pos >> 3]
        if br.read(16) != _crc16(frame):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        for ch, s in enumerate(subs):
            channels_out[ch].extend(s)

    arr = np.array(channels_out, dtype=np.int32).T
    if info["total"] and len(arr) > info["total"]:
        arr = arr[: info["total"]]
    return arr, info["sample_rate"]


# ---------------------------------------------------------------------------
# encode (verbatim subframes, independent channels — minimal conform)
# ---------------------------------------------------------------------------


def encode_flac(samples, sample_rate: int = 8_000, blocksize: int = 4096) -> bytes:
    """numpy (n,) or (n, channels) int16 → FLAC bytes (16-bit, fixed
    blocking, VERBATIM subframes). Same signature family as encode_wav so
    synth_audio can cycle it."""
    import numpy as np

    a = np.ascontiguousarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if not 1 <= ch <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    if sample_rate >= 1 << 20:
        raise ValueError("FLAC sample rate exceeds 20 bits")

    # STREAMINFO (type 0, last metadata block)
    si = _BitWriter()
    si.write(min(blocksize, max(n, 16)), 16)  # min block size
    si.write(min(blocksize, max(n, 16)), 16)  # max block size
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(15, 5)  # bps - 1 = 15
    si.write(n, 36)
    si_bytes = si.tobytes() + b"\x00" * 16  # MD5 unset (0 = unknown)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    # n == 0: a frameless stream — FLAC cannot represent a 0-sample frame
    # (the field stores blocksize-1); decode_flac returns a (0, ch) array
    frame_idx = 0
    off = 0
    while off < n:
        bs = min(blocksize, n - off)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking: coded number = frame index
        bw.write(7, 4)  # block size: explicit u16 - 1
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(ch - 1, 4)  # independent channels
        bw.write(4, 3)  # 16-bit samples
        bw.write(0, 1)  # reserved
        for byte in _encode_utf8_number(frame_idx):
            bw.write(byte, 8)
        bw.write(bs - 1, 16)
        hdr = bw.tobytes()
        bw.write(_crc8(hdr), 8)
        for c in range(ch):
            bw.write(0, 1)  # padding
            bw.write(1, 6)  # VERBATIM
            bw.write(0, 1)  # no wasted bits
            for v in a[off : off + bs, c]:
                bw.write_signed(int(v), 16)
        bw.align()
        frame = bw.tobytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
        off += bs
        frame_idx += 1
    return bytes(out)
