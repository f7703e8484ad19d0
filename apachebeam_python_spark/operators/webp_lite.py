"""Pure-Python WebP-lossless (VP8L) codec (SURVEY §2.11 multimodal decode
path — the fourth compression family after DEFLATE/PNG, DCT+Huffman/JPEG,
and LZW/GIF: canonical-prefix-coded ARGB with LZ77 backward references,
a color cache, and spatial transforms).

Implemented from the public WebP lossless bitstream specification
(RFC 9649 / https://developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification):

- RIFF container: ``RIFF <size> WEBP VP8L <size> <payload>``;
- VP8L header: signature ``0x2F``, 14-bit width-1 / height-1, alpha hint,
  3-bit version (0);
- entropy-coded image: per-pixel GREEN symbol from a 256+24+cache prefix
  code — literal (with RED/BLUE/ALPHA codes), LZ77 length prefix
  (+ distance code with the spec's 120-entry 2D proximity map), or color
  cache index (hash ``0x1e35a7bd * argb >> (32 - cache_bits)``);
- prefix codes: "simple" (1-2 symbols) and "normal" (canonical codes
  described by the 19-symbol code-length code in the spec's
  ``17 18 0 1 2 3 4 5 16 6 7 8 9 10 11 12 13 14 15`` order, with
  repeat codes 16/17/18), code bits MSB-first in the LSB-first stream;
- all four transforms, inverse-applied in reverse read order:
  PREDICTOR (14 modes over power-of-two tiles), COLOR (per-tile signed
  cross-channel deltas), SUBTRACT-GREEN, and COLOR-INDEXING (delta-coded
  palette incl. sub-byte pixel bundling for ≤16 colors);
- meta prefix codes (entropy image selecting one of N code groups per
  tile) on the main image.

The encoder is deliberately minimal but spec-conform — no transforms, no
cache, one code group, flat 8-bit literal codes (a complete canonical
code), length/backref symbols zeroed via a repeat-18 run — because its
only job is to synthesize test corpora the decoder (or any compliant
decoder) reads back bit-exactly. Lossless, so pipeline oracles stay
closed-form in the pixel values.

The 2D distance map is generated from the spec's proximity ordering (all
offsets with ``y in [0,8]``, ``x in [-8,8]`` on or above the current row,
sorted by ``x²+y²`` then ``|x|`` then sign), which reproduces the spec
table; the leading entries are pinned in tests/test_operators.py.

Scale: like the PNG/JPEG/GIF paths this runs inside Arrow-batched
``mapInPandas`` (operators/multimodal.py) — payload bytes stay in the
row, decode parallelizes with the data, nothing gathers on the driver.
Production swaps `decode_webp` for libwebp/Pillow with no plan change.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# bit I/O — VP8L packs bits LSB-first within each byte
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # absolute bit position

    def read(self, n: int) -> int:
        """n bits, LSB-first (first bit read = least significant of result)."""
        v = 0
        for i in range(n):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits go into the stream MSB of the code first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes (DEFLATE-style assignment; MSB-first in stream)
# ---------------------------------------------------------------------------


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """{symbol: bit length>0} → {symbol: (code, length)}, canonical: codes
    assigned in (length, symbol) order, numerically increasing."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        code <<= ln - prev_len
        out[sym] = (code, ln)
        code += 1
        prev_len = ln
    return out


class _PrefixCode:
    """Decoder for one canonical prefix code."""

    __slots__ = ("by_code", "single")

    def __init__(self, lengths: dict[int, int]):
        nz = {s: l for s, l in lengths.items() if l > 0}
        if not nz:
            raise ValueError("VP8L: prefix code with no symbols")
        if len(nz) == 1:
            self.single = next(iter(nz))  # zero-bit code
            self.by_code = None
            return
        self.single = None
        self.by_code = {
            (ln, code): sym for sym, (code, ln) in _canonical(nz).items()
        }

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        by = self.by_code
        while True:
            code = (code << 1) | br.read_bit()
            ln += 1
            sym = by.get((ln, code))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("VP8L: invalid prefix code in stream")


#: code-length-code symbol transmission order (spec §"normal code length code")
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code: 1-2 symbols, 0/1-bit codes
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol in 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = {sym0: 1}
        if num_symbols == 2:
            lengths[br.read(8)] = 1
        else:
            lengths[sym0] = 0  # single symbol: zero-bit code
            pc = _PrefixCode.__new__(_PrefixCode)
            pc.single = sym0
            pc.by_code = None
            return pc
        return _PrefixCode(lengths)

    # normal code: code lengths themselves prefix-coded
    num_code_lengths = 4 + br.read(4)
    clc_lengths: dict[int, int] = {}
    for i in range(num_code_lengths):
        ln = br.read(3)
        if ln:
            clc_lengths[_CLC_ORDER[i]] = ln
    clc = _PrefixCode(clc_lengths)

    if br.read_bit():  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size

    lengths = {}
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            if code_len:
                lengths[symbol] = code_len
                prev_len = code_len
            symbol += 1
        else:
            # 16: repeat previous nonzero length 3-6×; 17: 3-10 zeros;
            # 18: 11-138 zeros
            extra, base = {16: (2, 3), 17: (3, 3), 18: (7, 11)}[code_len]
            repeat = base + br.read(extra)
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflows alphabet")
            if code_len == 16:
                for _ in range(repeat):
                    lengths[symbol] = prev_len
                    symbol += 1
            else:
                symbol += repeat
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix values and the 2D distance map
# ---------------------------------------------------------------------------


def _lz77_value(prefix: int, br: _BitReader) -> int:
    """Length/distance prefix symbol → value (spec: 4 direct, then
    (2 + (p&1)) << extra_bits ranges)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _distance_map() -> list[tuple[int, int]]:
    """First 120 pixel offsets (x, y) on/above the current row by the
    spec's proximity ordering; distance code 1..120 indexes this table."""
    cands = [
        (x, y)
        for y in range(0, 9)
        for x in range(-8, 9)
        if not (y == 0 and x <= 0)
    ]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0, p[1]))
    return cands[:120]


_DIST_MAP = _distance_map()


def _plane_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


# ---------------------------------------------------------------------------
# entropy-coded image (shared by the ARGB image, entropy image, and
# transform data)
# ---------------------------------------------------------------------------

_HASH_MUL = 0x1E35A7BD


def _read_entropy_image(
    br: _BitReader, xsize: int, ysize: int, is_level0: bool
) -> list[int]:
    """Decode one spatially-coded image → flat list of ARGB uint32 (row
    major). For ``is_level0`` the caller has already consumed transforms."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: color cache bits {cache_bits} out of range")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta prefix codes (main image only)
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mx = (xsize + (1 << meta_bits) - 1) >> meta_bits
        my = (ysize + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _read_entropy_image(br, mx, my, False)
        # meta index lives in (red << 8) | green
        meta = [(p >> 8) & 0xFFFF for p in meta_img]
        n_groups = max(meta) + 1

    green_size = 256 + 24 + cache_size
    groups = [
        (
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, 256),  # red
            _read_prefix_code(br, 256),  # blue
            _read_prefix_code(br, 256),  # alpha
            _read_prefix_code(br, 40),  # distance
        )
        for _ in range(n_groups)
    ]

    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    px: list[int] = []
    n = xsize * ysize
    mtx = (xsize + (1 << meta_bits) - 1) >> meta_bits if meta else 0

    def insert(p: int) -> None:
        cache[((_HASH_MUL * p) & 0xFFFFFFFF) >> shift] = p

    while len(px) < n:
        if meta is not None:
            i = len(px)
            x, y = i % xsize, i // xsize
            g = groups[meta[(y >> meta_bits) * mtx + (x >> meta_bits)]]
        else:
            g = groups[0]
        green, red, blue, alpha, dist = g
        s = green.read(br)
        if s < 256:
            r = red.read(br)
            b = blue.read(br)
            a = alpha.read(br)
            p = (a << 24) | (r << 16) | (s << 8) | b
            px.append(p)
            if cache_bits:
                insert(p)
        elif s < 280:
            length = _lz77_value(s - 256, br)
            d = _plane_to_distance(_lz77_value(dist.read(br), br), xsize)
            if d > len(px):
                raise ValueError("VP8L: backward reference before image start")
            for _ in range(length):
                p = px[-d]
                px.append(p)
                if cache_bits:
                    insert(p)
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L: color cache index out of range")
            px.append(cache[idx])
    if len(px) != n:
        raise ValueError("VP8L: backward reference overran the image")
    return px


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= min(255, max(0, c)) << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        d = a - ((tl >> sh) & 0xFF)
        # C truncation toward zero for the half-delta
        c = a + (d // 2 if d >= 0 else -((-d) // 2))
        out |= min(255, max(0, c)) << sh
    return out


def _select(t: int, l: int, tl: int) -> int:
    pa_minus_pb = 0
    for sh in (24, 16, 8, 0):
        tc, lc, tlc = (t >> sh) & 0xFF, (l >> sh) & 0xFF, (tl >> sh) & 0xFF
        pa_minus_pb += abs(lc - tlc) - abs(tc - tlc)
    return t if pa_minus_pb <= 0 else l


def _add_pixels(p: int, pred: int) -> int:
    return (
        ((((p >> 24) + (pred >> 24)) & 0xFF) << 24)
        | (((((p >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((p >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8)
        | (((p & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _inv_predictor(px: list[int], xs: int, ys: int, bits: int, tiles: list[int]) -> None:
    tx = (xs + (1 << bits) - 1) >> bits
    for i in range(xs * ys):
        x, y = i % xs, i // xs
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = px[i - 1]  # L
        elif x == 0:
            pred = px[i - xs]  # T
        else:
            mode = (tiles[(y >> bits) * tx + (x >> bits)] >> 8) & 0xFF
            L, T = px[i - 1], px[i - xs]
            TL = px[i - xs - 1]
            # rightmost column: i-xs+1 lands on the leftmost pixel of the
            # SAME row (already decoded) — exactly the spec's TR rule there
            TR = px[i - xs + 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = _avg2(_avg2(L, TR), T)
            elif mode == 6:
                pred = _avg2(L, TL)
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 8:
                pred = _avg2(TL, T)
            elif mode == 9:
                pred = _avg2(T, TR)
            elif mode == 10:
                pred = _avg2(_avg2(L, TL), _avg2(T, TR))
            elif mode == 11:
                pred = _select(T, L, TL)
            elif mode == 12:
                pred = _clamp_add_sub_full(L, T, TL)
            elif mode == 13:
                pred = _clamp_add_sub_half(L, T, TL)
            else:
                raise ValueError(f"VP8L: predictor mode {mode} invalid")
        px[i] = _add_pixels(px[i], pred)


def _ct_delta(t: int, c: int) -> int:
    """Signed (int8 transform value × int8 channel) >> 5 per the spec."""
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def _inv_color_transform(px: list[int], xs: int, ys: int, bits: int, tiles: list[int]) -> None:
    tx = (xs + (1 << bits) - 1) >> bits
    for i in range(xs * ys):
        x, y = i % xs, i // xs
        cte = tiles[(y >> bits) * tx + (x >> bits)]
        g2r = cte & 0xFF  # blue channel of the tile pixel
        g2b = (cte >> 8) & 0xFF  # green channel
        r2b = (cte >> 16) & 0xFF  # red channel
        p = px[i]
        a, r, g, b = (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF
        r = (r + _ct_delta(g2r, g)) & 0xFF
        b = (b + _ct_delta(g2b, g)) & 0xFF
        b = (b + _ct_delta(r2b, r)) & 0xFF
        px[i] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (r << 16) | b


def _inv_color_index(
    px: list[int], xs_packed: int, ys: int, xs_full: int, palette: list[int]
) -> list[int]:
    """Palette lookup incl. sub-byte bundling: with n ≤ 16 colors several
    indices pack into one green channel, lowest bits = leftmost pixel."""
    n = len(palette)
    wb = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
    per = 1 << wb
    ibits = 8 >> wb
    mask = (1 << ibits) - 1
    out: list[int] = []
    for y in range(ys):
        row: list[int] = []
        for xp in range(xs_packed):
            g = (px[y * xs_packed + xp] >> 8) & 0xFF
            for k in range(per):
                if len(row) >= xs_full:
                    break
                idx = (g >> (k * ibits)) & mask
                row.append(palette[idx] if idx < n else 0)
        out.extend(row)
    return out


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_webp(payload: bytes):
    """WebP-lossless bytes → numpy (h, w, 3) uint8 RGB (alpha dropped —
    the multimodal contract matches the other image decoders)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    if payload[12:16] != b"VP8L":
        raise NotImplementedError(
            "only lossless (VP8L) WebP decodes natively; lossy VP8 needs a "
            "codec library this environment lacks"
        )
    size = int.from_bytes(payload[16:20], "little")
    br = _BitReader(payload[20 : 20 + size])
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")

    # transforms, in read order (inverse-applied in reverse)
    transforms: list[tuple] = []
    xs = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype in (0, 1):  # predictor / color
            bits = br.read(3) + 2
            tx = (xs + (1 << bits) - 1) >> bits
            ty = (h + (1 << bits) - 1) >> bits
            tiles = _read_entropy_image(br, tx, ty, False)
            transforms.append((ttype, bits, tiles))
        elif ttype == 2:  # subtract green
            transforms.append((2,))
        else:  # color indexing
            n_colors = br.read(8) + 1
            entries = _read_entropy_image(br, n_colors, 1, False)
            palette: list[int] = []
            prev = 0
            for e in entries:  # delta-coded per channel
                prev = _add_pixels(e, prev)
                palette.append(prev)
            wb = 3 if n_colors <= 2 else 2 if n_colors <= 4 else 1 if n_colors <= 16 else 0
            xs_packed = (xs + (1 << wb) - 1) >> wb
            transforms.append((3, xs, palette))
            xs = xs_packed

    px = _read_entropy_image(br, xs, h, True)

    for t in reversed(transforms):
        if t[0] == 3:
            _, xs_full, palette = t
            px = _inv_color_index(px, xs, h, xs_full, palette)
            xs = xs_full
        elif t[0] == 2:
            _inv_subtract_green(px)
        elif t[0] == 1:
            _inv_color_transform(px, xs, h, t[1], t[2])
        else:
            _inv_predictor(px, xs, h, t[1], t[2])

    arr = np.array(px, dtype=np.uint32).reshape(h, w)
    rgb = np.empty((h, w, 3), dtype=np.uint8)
    rgb[..., 0] = (arr >> 16) & 0xFF
    rgb[..., 1] = (arr >> 8) & 0xFF
    rgb[..., 2] = arr & 0xFF
    return rgb


# ---------------------------------------------------------------------------
# encode (minimal spec-conform writer: flat literal codes, no transforms)
# ---------------------------------------------------------------------------


def _emit_flat_code(bw: _BitWriter, n_tail_zeros: int) -> None:
    """Emit a normal prefix code: symbols 0..255 all 8 bits long (a
    complete canonical code, so code == symbol), then ``n_tail_zeros``
    zero-length symbols via one repeat-18 run. The code-length code is
    always a complete two-symbol code ({8,18} with the run, {0,8}
    without — 0 is declared but never emitted) so every decoder path
    stays on the spec's main line."""
    bw.write(0, 1)  # not simple
    # order indices: symbol 18 → 1, symbol 0 → 2, symbol 8 → 11 ⇒ 12 entries
    bw.write(12 - 4, 4)
    partner = 18 if n_tail_zeros else 0
    for i in range(12):
        sym = _CLC_ORDER[i]
        bw.write(1 if sym in (8, partner) else 0, 3)
    bw.write(0, 1)  # no explicit max_symbol
    # canonical 1-bit codes by symbol value: {8,18} → 8:0, 18:1; {0,8} → 0:0, 8:1
    code_for_8 = 0 if n_tail_zeros else 1
    for _ in range(256):
        bw.write_code(code_for_8, 1)
    if n_tail_zeros:
        if not 11 <= n_tail_zeros <= 138:
            raise ValueError("tail zeros out of repeat-18 range")
        bw.write_code(1, 1)  # symbol 18
        bw.write(n_tail_zeros - 11, 7)


def _emit_simple_single(bw: _BitWriter, symbol: int) -> None:
    """Simple prefix code with one symbol (zero-bit code)."""
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # 1 symbol
    if symbol < 2:
        bw.write(0, 1)  # 1-bit first symbol
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)  # 8-bit first symbol
        bw.write(symbol, 8)


def encode_webp(arr) -> bytes:
    """numpy (h, w, 3) uint8 RGB → lossless WebP (VP8L) bytes. Minimal
    conform stream: no transforms, no color cache, one prefix group, flat
    8-bit green/red/blue codes, zero-bit alpha (constant 255) and distance
    codes."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("encode_webp takes (h, w, 3) RGB")
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be in [1, 16384]")

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    _emit_flat_code(bw, 24)  # green: 256 literals + 24 zeroed length codes
    _emit_flat_code(bw, 0)  # red — see below: emitted as {8}-only clc
    _emit_flat_code(bw, 0)  # blue
    _emit_simple_single(bw, 255)  # alpha: always 255
    _emit_simple_single(bw, 0)  # distance: never used
    flat = a.reshape(-1, 3)
    for r, g, b in flat:
        bw.write_code(int(g), 8)  # green symbol first
        bw.write_code(int(r), 8)
        bw.write_code(int(b), 8)
        # alpha: zero-bit code
    payload = bw.tobytes()

    vp8l = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        vp8l += b"\x00"  # RIFF chunks are 2-byte aligned
    riff = b"RIFF" + (4 + len(vp8l)).to_bytes(4, "little") + b"WEBP" + vp8l
    return riff
