"""Pure-stdlib WebP-lossless (VP8L) codec (decode + an encoder for fixtures).

Covers the LOSSLESS WebP profile (VP8L, the Google "WebP Lossless
Bitstream Specification" / RFC 9649), canonical-prefix-coded and fully
implementable with the stdlib, the same way jpeg/flac/gif_codec.py
retired their guards. (The LOSSY profile's boolean-arithmetic-coded
VP8 keyframes decode in the sibling vp8_codec.py since round 10.)
Scope:

- decoder: RIFF/VP8L container framing; LSB-first bit reader; simple
  (1-2 symbol) and normal (code-length-coded, with 16/17/18 repeats and
  the max-symbol short-circuit) canonical prefix codes; the five-code
  groups (green+length+cache / red / blue / alpha / distance); meta
  prefix images (spatially-varying code groups); color cache; LZ77
  backward references with the 120-entry 2D distance map; and all four
  transforms inverted in reverse order — PREDICTOR (all 14 modes, flat
  -array edge semantics), COLOR (cross-color deltas), SUBTRACT_GREEN,
  and COLOR_INDEXING (delta-coded palette incl. the packed sub-8-bit
  widths). VP8L is lossless, so decode is PIXEL-EXACT — the roundtrip
  test asserts byte equality.
- encoder (fixture generator): literal-coded ARGB with per-channel
  canonical prefix codes (simple codes for <=2 distinct values, normal
  codes with zero-run 17/18 repeats otherwise), optional SUBTRACT_GREEN
  and COLOR_INDEXING transforms, no LZ77/cache — enough to exercise the
  decoder's container, code-transmission, literal and transform paths
  with spec-correct bits; the LZ77/cache/meta/predictor decode paths are
  exercised by hand-assembled bitstreams in the tests (the encoder's
  BitWriter is public for exactly that).

Reference parity note: the reference repo ships no image handling at all
(it is an AMQP->ClickHouse market-data pipeline); this module exists for
the multimodal column family of the large-scale training-data pipeline
(SURVEY.md LLM-ops section), where image payloads stay opaque binary
columns until a decode seam turns them into features.
"""

from __future__ import annotations

import struct

# code-length-code transmission order (spec section "Normal Code Length
# Code"); only a prefix of this list is present in the stream. NOTE the
# easy-to-misremember detail: symbol 16 (repeat-previous) sits at
# position 8, between 5 and 6 — not at the end
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_GREEN_BASE = 256 + 24  # literals + length prefix codes (before cache)
_HASH_MUL = 0x1E35A7BD  # color-cache multiplicative hash (spec constant)

# the 120 special distance codes map to a (dx, dy) pixel-neighborhood
# offset; the spec's table packs each entry as (dy << 4) | (8 - dx) —
# decoded here once at import (dx = 8 - (v & 0xf), dy = v >> 4)
_DIST_TABLE = bytes((
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
))
_DIST_MAP = tuple((8 - (v & 0x0F), v >> 4) for v in _DIST_TABLE)


class BitReader:
    """LSB-first bit reader (VP8L packs the first bit of the stream into
    the least significant bit of the first byte)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("malformed VP8L: bitstream overrun")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class BitWriter:
    """LSB-first bit writer (the encoder's and the tests' stream
    assembler — mirror image of BitReader)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.out + bytes((self.acc & 0xFF,)))
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Canonical prefix codes


class PrefixCode:
    """Canonical prefix decoder: bits descend from the code's most
    significant bit (append-LSB tree walk), codes assigned per length in
    symbol order — DEFLATE's canonical construction."""

    def __init__(self, lengths: list[int]) -> None:
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("malformed VP8L: empty prefix code")
        if len(nz) == 1:
            self.single: int | None = nz[0][1]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        self.table = {}
        code = 0
        prev_len = 0
        for ln, sym in sorted(nz):
            code <<= ln - prev_len
            self.table[(ln, code)] = sym
            code += 1
            prev_len = ln
        if code != (1 << prev_len):
            raise ValueError("malformed VP8L: over/under-subscribed code")

    def decode(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("malformed VP8L: invalid prefix code bits")


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    if br.read(1):  # simple code
        n_syms = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if n_syms == 2:
            sym1 = br.read(8)
            if max(sym0, sym1) >= alphabet_size:
                raise ValueError("malformed VP8L: simple symbol overflow")
            lengths[sym0] = lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise ValueError("malformed VP8L: simple symbol overflow")
            lengths[sym0] = 1
        return PrefixCode(lengths)
    # normal code: code-length code first
    n_clc = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(n_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = PrefixCode(clc_lengths)
    # optional cap on the number of coded symbols
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = clc.decode(br)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            lengths[sym:sym + rep] = [prev_len] * min(rep, alphabet_size - sym)
            sym += rep
        elif s == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    if sym > alphabet_size:
        raise ValueError("malformed VP8L: code lengths overflow alphabet")
    return PrefixCode(lengths)


# ---------------------------------------------------------------------------
# Pixel helpers (pixels are 32-bit ARGB ints throughout)


def _prefix_value(code: int, br: BitReader) -> int:
    """LZ77 length/distance prefix decoding (spec: 4 direct values then
    exponentially-growing ranges with extra bits)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _dist_from_code(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    return max(1, dy * xsize + dx)


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a & 0xFF) + (b & 0xFF)) >> 1))
    )


def _add_px(a: int, b: int) -> int:
    """Per-channel mod-256 addition of two ARGB pixels."""
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, left: int, top: int, topleft: int, topright: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:  # Select: whichever of L/T is closer to the gradient;
        # ties go to TOP (p == 0 -> top), matching the spec's
        # "pa_minus_pb <= 0 ? top : left" with pa_minus_pb = sum(|L-TL|-|T-TL|)
        p = 0
        for sh in (24, 16, 8, 0):
            p += abs(((top >> sh) & 0xFF) - ((topleft >> sh) & 0xFF)) - abs(
                ((left >> sh) & 0xFF) - ((topleft >> sh) & 0xFF)
            )
        return top if p >= 0 else left
    if mode == 12:  # ClampAddSubtractFull
        out = 0
        for sh in (24, 16, 8, 0):
            out |= _clamp(
                ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((topleft >> sh) & 0xFF)
            ) << sh
        return out
    if mode == 13:  # ClampAddSubtractHalf: a + (a - b)/2, C-truncating div
        ave = _avg2(left, top)
        out = 0
        for sh in (24, 16, 8, 0):
            a = (ave >> sh) & 0xFF
            t = (topleft >> sh) & 0xFF
            d = a - t
            half = d // 2 if d >= 0 else -((-d) // 2)
            out |= _clamp(a + half) << sh
        return out
    raise ValueError(f"malformed VP8L: predictor mode {mode}")


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 multiply, arithmetic >> 5."""
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


# ---------------------------------------------------------------------------
# Image-stream decoding (recursive: transform data / palettes / meta
# images are themselves VP8L-coded images without transforms)


def _decode_image_stream(
    br: BitReader, xsize: int, ysize: int, is_level0: bool
) -> tuple[list[int], int]:
    """Returns (pixels, effective_xsize) — COLOR_INDEXING can shrink the
    coded width of the level-0 image (packed indices)."""
    transforms: list[tuple] = []
    eff_x = xsize
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("malformed VP8L: duplicate transform")
            seen.add(ttype)
            if ttype == 0:  # PREDICTOR
                size_bits = br.read(3) + 2
                bx = (eff_x + (1 << size_bits) - 1) >> size_bits
                by = (ysize + (1 << size_bits) - 1) >> size_bits
                data, _ = _decode_image_stream(br, bx, by, False)
                transforms.append(("pred", size_bits, bx, data))
            elif ttype == 1:  # COLOR
                size_bits = br.read(3) + 2
                bx = (eff_x + (1 << size_bits) - 1) >> size_bits
                by = (ysize + (1 << size_bits) - 1) >> size_bits
                data, _ = _decode_image_stream(br, bx, by, False)
                transforms.append(("color", size_bits, bx, data))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append(("subg",))
            else:  # COLOR_INDEXING
                pal_size = br.read(8) + 1
                pal_deltas, _ = _decode_image_stream(br, pal_size, 1, False)
                palette = []
                prev = 0
                for d in pal_deltas:
                    prev = _add_px(prev, d)
                    palette.append(prev)
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(("palette", palette, width_bits, eff_x))
                if width_bits:
                    eff_x = (eff_x + (1 << width_bits) - 1) >> width_bits

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("malformed VP8L: color cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta prefix image (level 0 only)
    meta = None
    meta_bits = 0
    meta_x = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mx = (eff_x + (1 << meta_bits) - 1) >> meta_bits
        my = (ysize + (1 << meta_bits) - 1) >> meta_bits
        meta, _ = _decode_image_stream(br, mx, my, False)
        meta = [(p >> 8) & 0xFFFF for p in meta]
        meta_x = mx
        n_groups = max(meta) + 1

    groups = []
    green_size = _GREEN_BASE + cache_size
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )

    # main pixel loop
    n = eff_x * ysize
    pixels: list[int] = [0] * n
    cache = [0] * cache_size
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % eff_x, pos // eff_x
            g = groups[meta[(y >> meta_bits) * meta_x + (x >> meta_bits)]]
        else:
            g = groups[0]
        s = g[0].decode(br)
        if s < 256:
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels[pos] = px
            if cache_size:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < _GREEN_BASE:
            length = _prefix_value(s - 256, br)
            dcode = _prefix_value(g[4].decode(br), br)
            dist = _dist_from_code(dcode, eff_x)
            if dist > pos:
                raise ValueError("malformed VP8L: LZ77 distance before start")
            if pos + length > n:
                raise ValueError("malformed VP8L: LZ77 copy past image end")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                if cache_size:
                    cache[
                        (_HASH_MUL * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
        else:
            idx = s - _GREEN_BASE
            if idx >= cache_size:
                raise ValueError("malformed VP8L: cache index overflow")
            pixels[pos] = cache[idx]
            pos += 1

    # inverse transforms, reverse order of appearance
    for tf in reversed(transforms):
        if tf[0] == "palette":
            _, palette, width_bits, full_x = tf
            if width_bits:
                out = [0] * (full_x * ysize)
                per_byte = 1 << width_bits
                bits = 8 >> width_bits
                mask = (1 << bits) - 1
                for y in range(ysize):
                    for px_i in range(eff_x):
                        packed = (pixels[y * eff_x + px_i] >> 8) & 0xFF
                        for k in range(per_byte):
                            x = px_i * per_byte + k
                            if x >= full_x:
                                break
                            idx = (packed >> (k * bits)) & mask
                            out[y * full_x + x] = (
                                palette[idx] if idx < len(palette) else 0
                            )
                pixels = out
                eff_x = full_x
            else:
                pixels = [
                    palette[(p >> 8) & 0xFF]
                    if ((p >> 8) & 0xFF) < len(palette)
                    else 0
                    for p in pixels
                ]
        elif tf[0] == "subg":
            for i, p in enumerate(pixels):
                gcomp = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) + gcomp) & 0xFF
                b = ((p & 0xFF) + gcomp) & 0xFF
                pixels[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif tf[0] == "color":
            _, size_bits, bx, data = tf
            for i, p in enumerate(pixels):
                x, y = i % eff_x, i // eff_x
                cte = data[(y >> size_bits) * bx + (x >> size_bits)]
                g2r = cte & 0xFF
                g2b = (cte >> 8) & 0xFF
                r2b = (cte >> 16) & 0xFF
                gcomp = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) + _ct_delta(g2r, gcomp)) & 0xFF
                b = ((p & 0xFF) + _ct_delta(g2b, gcomp)) & 0xFF
                b = (b + _ct_delta(r2b, r)) & 0xFF
                pixels[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif tf[0] == "pred":
            _, size_bits, bx, data = tf
            for i in range(len(pixels)):
                x, y = i % eff_x, i // eff_x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = pixels[i - 1]  # left
                elif x == 0:
                    pred = pixels[i - eff_x]  # top
                else:
                    mode = (data[(y >> size_bits) * bx + (x >> size_bits)] >> 8) & 0xFF
                    pred = _predict(
                        mode,
                        pixels[i - 1],
                        pixels[i - eff_x],
                        pixels[i - eff_x - 1],
                        # flat-array semantics: at the right edge the
                        # "top-right" slot is the current row's first
                        # pixel (already reconstructed) — matches the
                        # spec's one-dimensional addressing
                        pixels[i - eff_x + 1],
                    )
                pixels[i] = _add_px(pixels[i], pred)
    return pixels, eff_x


def decode_webp_lossless(data: bytes) -> dict:
    """Decode a RIFF/WEBP container holding a VP8L (lossless) chunk.

    Returns ``{"width", "height", "has_alpha", "pixels"}`` with pixels as
    ``width*height*4`` RGBA bytes. Lossy `VP8 ` containers route to
    vp8_codec.decode_webp_lossy and VP8X to decode_webp_extended (both
    ValueError here — wrong entry point, not missing capability).
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("malformed WebP: bad RIFF/WEBP header")
    fourcc = data[12:16]
    if fourcc == b"VP8 ":
        raise ValueError(
            "lossy WebP: use vp8_codec.decode_webp_lossy (real RFC 6386 "
            "keyframe decoder since round 10); this entry point is the "
            "lossless VP8L profile"
        )
    if fourcc == b"VP8X":
        raise ValueError(
            "extended container: use decode_webp_extended (VP8X still "
            "images with alpha decode for real since round 10; animation "
            "stays guarded there)"
        )
    if fourcc != b"VP8L":
        raise ValueError(f"malformed WebP: unknown chunk {fourcc!r}")
    (clen,) = struct.unpack("<I", data[16:20])
    payload = data[20:20 + clen]
    if len(payload) < clen:
        raise ValueError("malformed WebP: truncated VP8L chunk")
    return _decode_vp8l_payload(payload)


def _decode_vp8l_payload(payload: bytes) -> dict:
    """Decode a bare VP8L chunk payload (signature byte + 14-bit dims
    header + image stream) — shared by the plain-VP8L container path and
    the VP8X extended container."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("malformed VP8L: bad signature byte")
    br = BitReader(payload[1:])
    width = br.read(14) + 1
    height = br.read(14) + 1
    has_alpha = br.read(1)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"malformed VP8L: version {version}")
    pixels, _ = _decode_image_stream(br, width, height, True)
    rgba = bytearray(width * height * 4)
    for i, p in enumerate(pixels):
        rgba[4 * i] = (p >> 16) & 0xFF
        rgba[4 * i + 1] = (p >> 8) & 0xFF
        rgba[4 * i + 2] = p & 0xFF
        rgba[4 * i + 3] = (p >> 24) & 0xFF
    return {
        "width": width,
        "height": height,
        "has_alpha": bool(has_alpha),
        "pixels": bytes(rgba),
    }


# ---------------------------------------------------------------------------
# Extended container (VP8X): still images with an ALPH chunk


def _unfilter_alpha(vals: bytes, w: int, h: int, method: int) -> bytes:
    """Invert the ALPH chunk's spatial filter (container spec §Alpha):
    each stored byte is the mod-256 delta from a prediction. Row-0 /
    column-0 seeding follows the spec (and libwebp dsp/filters.c): the
    first pixel of a row predicts from the pixel ABOVE it (0 on the
    first row), and on the first row every filter degrades to
    horizontal."""
    if method == 0:
        return vals
    out = bytearray(w * h)
    for y in range(h):
        row = y * w
        for x in range(w):
            d = vals[row + x]
            if y == 0:
                pred = 0 if x == 0 else out[x - 1]  # first row: horizontal
            elif x == 0:
                pred = out[row - w]  # column 0: above
            elif method == 1:  # horizontal
                pred = out[row + x - 1]
            elif method == 2:  # vertical
                pred = out[row + x - w]
            else:  # gradient: clip(left + top - top_left)
                g = out[row + x - 1] + out[row + x - w] - out[row + x - w - 1]
                pred = 0 if g < 0 else (255 if g > 255 else g)
            out[row + x] = (d + pred) & 0xFF
    return bytes(out)


def _decode_alpha_chunk(payload: bytes, w: int, h: int) -> bytes:
    """Decode an ALPH chunk payload to the w*h alpha plane.

    Header byte (MSB first): Rsv(2) P(2) F(2) C(2). C=0 is the raw
    plane; C=1 is a HEADERLESS VP8L image stream (no signature/dims —
    the dimensions come from the sibling VP8 frame) whose GREEN channel
    carries the alpha values; the filter F is inverted on top. The
    pre-processing bit P is informational (level reduction happened at
    encode time). Alpha is coded losslessly either way, so the oracle
    test demands byte equality with libwebp's decoded A channel."""
    if not payload:
        raise ValueError("malformed ALPH: empty chunk")
    b0 = payload[0]
    if b0 >> 6:
        raise ValueError("malformed ALPH: reserved bits set")
    filt = (b0 >> 2) & 3
    comp = b0 & 3
    if comp > 1:
        raise ValueError(f"malformed ALPH: compression method {comp}")
    if comp == 0:
        vals = payload[1:1 + w * h]
        if len(vals) < w * h:
            raise ValueError("malformed ALPH: truncated raw alpha plane")
    else:
        br = BitReader(payload[1:])
        pixels, _ = _decode_image_stream(br, w, h, True)
        vals = bytes((p >> 8) & 0xFF for p in pixels)
    return _unfilter_alpha(vals, w, h, filt)


def decode_webp_extended(data: bytes) -> dict:
    """Decode a RIFF/WEBP container whose first chunk is VP8X (the
    extended container, WebP container spec / RFC 9649 §Extended File
    Format): a flags+canvas header followed by optional ICCP / ALPH /
    EXIF / XMP chunks around a single VP8 or VP8L image chunk.

    Still images decode for real — lossy VP8 (vp8_codec.py) or lossless
    VP8L, with the ALPH chunk's losslessly-coded alpha plane (raw or
    headerless-VP8L, all four filters) merged into the RGBA output.
    Animation (ANIM/ANMF) stays behind a NotImplementedError guard.
    Returns ``{"width", "height", "has_alpha", "pixels"}`` like
    decode_webp_lossless, plus the metadata-presence booleans."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("malformed WebP: bad RIFF/WEBP header")
    if data[12:16] != b"VP8X":
        raise ValueError(
            "not an extended container: use decode_webp_lossless / "
            "vp8_codec.decode_webp_lossy for plain VP8L / `VP8 `"
        )
    if len(data) < 30:
        raise ValueError("malformed VP8X: header chunk must be 10 bytes")
    (xlen,) = struct.unpack("<I", data[16:20])
    if xlen != 10:
        raise ValueError("malformed VP8X: header chunk must be 10 bytes")
    flags = data[20]
    if flags & 0x02:
        raise NotImplementedError(
            "animated WebP (ANIM/ANMF) is out of scope; still VP8X "
            "images (alpha/metadata wrappers) decode here"
        )
    canvas_w = 1 + int.from_bytes(data[24:27], "little")
    canvas_h = 1 + int.from_bytes(data[27:30], "little")
    # walk the remaining chunks (size-prefixed, padded to even offsets)
    pos = 30
    chunks: dict[bytes, bytes] = {}
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + clen]
        if len(payload) < clen:
            raise ValueError(f"malformed WebP: truncated {fourcc!r} chunk")
        if fourcc in (b"ANIM", b"ANMF"):
            raise NotImplementedError(
                "animated WebP (ANIM/ANMF) is out of scope"
            )
        if fourcc in chunks and fourcc in (b"VP8 ", b"VP8L", b"ALPH"):
            raise ValueError(f"malformed WebP: duplicate {fourcc!r} chunk")
        chunks[fourcc] = payload  # unknown chunks are skippable by spec
        pos += 8 + clen + (clen & 1)
    has_vp8, has_vp8l = b"VP8 " in chunks, b"VP8L" in chunks
    if has_vp8 == has_vp8l:
        raise ValueError(
            "malformed VP8X: need exactly one VP8 or VP8L image chunk"
        )
    if has_vp8l:
        # lossless frames carry alpha in the ARGB stream itself; the
        # spec forbids a sibling ALPH chunk (readers must ignore it)
        out = _decode_vp8l_payload(chunks[b"VP8L"])
    else:
        from .vp8_codec import decode_vp8_frame, yuv420_to_rgba

        d = decode_vp8_frame(chunks[b"VP8 "])
        w, h = d["width"], d["height"]
        rgba = bytearray(yuv420_to_rgba(d["y"], d["u"], d["v"], w, h))
        has_alpha = False
        if (flags & 0x10) and b"ALPH" in chunks:
            alpha = _decode_alpha_chunk(chunks[b"ALPH"], w, h)
            rgba[3::4] = alpha
            has_alpha = True
        out = {
            "width": w, "height": h,
            "has_alpha": has_alpha, "pixels": bytes(rgba),
        }
    if (out["width"], out["height"]) != (canvas_w, canvas_h):
        raise ValueError(
            f"malformed VP8X: canvas {canvas_w}x{canvas_h} != frame "
            f"{out['width']}x{out['height']} (still image)"
        )
    out["has_iccp"] = b"ICCP" in chunks
    out["has_exif"] = b"EXIF" in chunks
    out["has_xmp"] = b"XMP " in chunks
    return out


# ---------------------------------------------------------------------------
# Encoder (fixture generator)


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Code lengths from frequencies (plain Huffman; clamps by halving
    frequencies if a depth ever exceeds max_len — fixtures never should)."""
    import heapq
    import itertools

    syms = {s: f for s, f in freqs.items() if f > 0}
    if len(syms) == 1:
        return {next(iter(syms)): 1}
    while True:
        counter = itertools.count()
        heap = [(f, next(counter), s) for s, f in syms.items()]
        heapq.heapify(heap)
        parents: dict[int, tuple] = {}
        while len(heap) > 1:
            f1, _, n1 = heapq.heappop(heap)
            f2, _, n2 = heapq.heappop(heap)
            node = ("node", n1, n2)
            heapq.heappush(heap, (f1 + f2, next(counter), node))
        lengths: dict[int, int] = {}

        def walk(node, depth):
            if isinstance(node, tuple) and node[0] == "node":
                walk(node[1], depth + 1)
                walk(node[2], depth + 1)
            else:
                lengths[node] = max(depth, 1)

        walk(heap[0][2], 0)
        if max(lengths.values()) <= max_len:
            return lengths
        syms = {s: max(1, f // 2) for s, f in syms.items()}


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Symbol -> (code, length) with canonical (length, symbol) order."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, sym in sorted((ln, sym) for sym, ln in lengths.items()):
        code <<= ln - prev_len
        out[sym] = (code, ln)
        code += 1
        prev_len = ln
    return out


def _write_code_msb(bw: BitWriter, code: int, length: int) -> None:
    """Prefix-code bits go to the stream most-significant-bit first (the
    mirror of PrefixCode.decode's append-LSB tree walk)."""
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _write_prefix_code(
    bw: BitWriter, lengths: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Transmit a prefix code (simple form for <=2 symbols, else the
    code-length-coded normal form with 17/18 zero-run repeats); returns
    the symbol->(code,length) map for payload writing."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        first = syms[0]
        if first <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
            return {syms[0]: (0, 1), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    # normal form: emit per-symbol lengths as CLC symbols w/ zero runs
    seq: list[tuple[int, int]] = []  # (clc symbol, extra bits value+width)
    run_start = 0
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    i = 0
    while i < alphabet_size:
        if full[i] == 0:
            j = i
            while j < alphabet_size and full[j] == 0:
                j += 1
            run = j - i
            while run > 0:
                if run >= 11:
                    take = min(run, 138)
                    seq.append((18, take))
                elif run >= 3:
                    take = min(run, 10)
                    seq.append((17, take))
                else:
                    take = run
                    for _ in range(take):
                        seq.append((0, 0))
                run -= take
            i = j
        else:
            seq.append((full[i], 0))
            i += 1
    # trailing zero runs can be dropped entirely? keep them: we write
    # without the max_symbol cap, so every position must be covered
    clc_freq: dict[int, int] = {}
    for s, _ in seq:
        clc_freq[s] = clc_freq.get(s, 0) + 1
    clc_lengths = _huffman_lengths(clc_freq, max_len=7)
    clc_codes = _canonical_codes(clc_lengths)
    # number of CLC entries to transmit (in _CLC_ORDER, trailing zeros cut)
    order_lens = [clc_lengths.get(s, 0) for s in _CLC_ORDER]
    n_clc = len(order_lens)
    while n_clc > 4 and order_lens[n_clc - 1] == 0:
        n_clc -= 1
    bw.write(0, 1)  # normal
    bw.write(n_clc - 4, 4)
    for k in range(n_clc):
        bw.write(order_lens[k], 3)
    bw.write(0, 1)  # no max-symbol cap
    for s, extra in seq:
        c, ln = clc_codes[s]
        _write_code_msb(bw, c, ln)
        if s == 17:
            bw.write(extra - 3, 3)
        elif s == 18:
            bw.write(extra - 11, 7)
        elif s == 16:
            bw.write(extra - 3, 2)
    return _canonical_codes(lengths)


def encode_webp_lossless(
    rgba: bytes,
    width: int,
    height: int,
    subtract_green: bool = False,
    palette: bool = False,
) -> bytes:
    """Encode RGBA bytes as a spec-correct literal-coded VP8L WebP.

    Pixel-lossless: ``decode_webp_lossless(encode_webp_lossless(...))``
    recovers the input bytes exactly. ``subtract_green``/``palette``
    exercise those transforms' inverse paths (palette requires <=256
    distinct pixels; packed widths kick in automatically below 17)."""
    if len(rgba) != width * height * 4:
        raise ValueError("rgba must hold width*height*4 bytes")
    pixels = [
        (rgba[4 * i + 3] << 24)
        | (rgba[4 * i] << 16)
        | (rgba[4 * i + 1] << 8)
        | rgba[4 * i + 2]
        for i in range(width * height)
    ]
    bw = BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(int(any((p >> 24) & 0xFF != 0xFF for p in pixels)), 1)
    bw.write(0, 3)  # version

    eff_x = width
    if palette:
        distinct = sorted(set(pixels))
        if len(distinct) > 256:
            raise ValueError("palette encoding needs <=256 distinct pixels")
        pal = distinct
        index = {p: i for i, p in enumerate(pal)}
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(pal) - 1, 8)
        # delta-coded palette as a 1-row image (literal-coded, no cache)
        deltas = []
        prev = 0
        for p in pal:
            deltas.append(_sub_px(p, prev))
            prev = p
        _encode_literal_image(bw, deltas, is_level0=False)
        size = len(pal)
        if size <= 2:
            width_bits = 3
        elif size <= 4:
            width_bits = 2
        elif size <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per_byte = 1 << width_bits
            bits = 8 >> width_bits
            eff_x = (width + per_byte - 1) >> width_bits
            packed_px = []
            for y in range(height):
                for bx in range(eff_x):
                    v = 0
                    for k in range(per_byte):
                        x = bx * per_byte + k
                        if x < width:
                            v |= index[pixels[y * width + x]] << (k * bits)
                    packed_px.append(0xFF000000 | (v << 8))
            pixels = packed_px
        else:
            pixels = [0xFF000000 | (index[p] << 8) for p in pixels]
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        out = []
        for p in pixels:
            gcomp = (p >> 8) & 0xFF
            r = (((p >> 16) & 0xFF) - gcomp) & 0xFF
            b = ((p & 0xFF) - gcomp) & 0xFF
            out.append((p & 0xFF00FF00) | (r << 16) | b)
        pixels = out
    bw.write(0, 1)  # no more transforms
    _encode_literal_image(bw, pixels)
    payload = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _sub_px(a: int, b: int) -> int:
    """Per-channel mod-256 subtraction a-b (palette delta coding)."""
    return (
        (((a >> 24) - (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def _encode_literal_image(
    bw: BitWriter, pixels: list[int], is_level0: bool = True
) -> None:
    """Entropy-coded image body: no cache, no meta codes, all literals.
    Auxiliary images (palettes, transform data) carry NO meta-prefix bit
    — only the level-0 image does, hence ``is_level0``."""
    bw.write(0, 1)  # no color cache
    if is_level0:
        bw.write(0, 1)  # no meta prefix image
    chans = {
        "g": [(p >> 8) & 0xFF for p in pixels],
        "r": [(p >> 16) & 0xFF for p in pixels],
        "b": [p & 0xFF for p in pixels],
        "a": [(p >> 24) & 0xFF for p in pixels],
    }
    codes = {}
    for key, alphabet in (("g", _GREEN_BASE), ("r", 256), ("b", 256), ("a", 256)):
        freq: dict[int, int] = {}
        for v in chans[key]:
            freq[v] = freq.get(v, 0) + 1
        codes[key] = _write_prefix_code(bw, _huffman_lengths(freq), alphabet)
    # distance code: never used, transmit a 1-symbol simple code
    _write_prefix_code(bw, {0: 1}, 40)
    for i in range(len(pixels)):
        for key in ("g", "r", "b", "a"):
            c, ln = codes[key][chans[key][i]]
            _write_code_msb(bw, c, ln)
