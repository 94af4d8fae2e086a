"""Pure-stdlib lossy-VP8 (WebP) keyframe DECODER (RFC 6386).

Retires the LAST WebP guard in ``decode_image`` (webp_codec.py covers
the lossless VP8L profile; this module decodes the lossy `VP8 ` chunk),
the same way jpeg/flac/zstd_codec.py retired theirs: a real bit-level
implementation of the public format — the boolean arithmetic decoder,
tree-coded keyframe modes, token/coefficient decoding with the banded
context model, per-segment dequantization, the exact integer IDCT/WHT,
all intra predictors (16x16, chroma 8x8, and the ten 4x4 B modes with
VP8's above-right replication rules), and the in-loop deblocking filter
(normal and simple profiles) — NOT a wrapper. Decode-only by design:
fixtures come from this container's real libwebp encoder (ctypes
``WebPEncodeRGB``), which doubles as the independent ORACLE — tests
decode libwebp-encoded streams and require the Y/U/V planes byte-equal
to ``WebPDecodeYUV`` (comparing in YUV space keeps the comparison
inside the VP8 spec: RGB conversion and chroma upsampling are outside
the bitstream's definition). The large constant tables live in
``_vp8_tables.py``, extracted from libwebp's .rodata and re-verified
against it at test time (the objdump/register-discipline lesson:
thousand-entry tables retyped from memory are how self-consistent-but-
wrong decoders happen).

Scope: keyframes (which is what a WebP lossy file IS — the container
holds exactly one VP8 keyframe), all intra modes, segmentation with
per-segment quant/filter, loop-filter deltas, 1-8 token partitions,
both filter profiles. Out of scope (documented raises): interframes
(golden/altref reference buffers — never valid inside a static WebP)
and upscaling hints (scale fields are parsed and reported, not
resampled). The VP8X extended container decodes in
webp_codec.decode_webp_extended (still images + ALPH alpha, round 10).

Reference parity note: the reference repo ships no image handling at
all (AMQP->ClickHouse market-data pipeline); this module serves the
multimodal column family of the training-data pipeline (SURVEY.md
LLM-ops section) where image payloads are opaque binary columns until
a decode seam turns them into features.
"""

from __future__ import annotations

import struct

from ._vp8_tables import (
    _AC_Q,
    _COEFF_BANDS,
    _COEFF_PROBS,
    _COEFF_UPDATE_PROBS,
    _DC_Q,
    _KF_BMODE_PROBS,
)

# ---------------------------------------------------------------------------
# Mode enums and trees (RFC 6386 sections 11.2-11.4; tree convention:
# non-negative entries are node indices, negated entries are leaves, and
# node i reads probability probs[i >> 1])

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED,
 B_RD_PRED, B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROBS = (145, 156, 163, 128)

_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_MODE_PROBS = (142, 114, 183)

_BMODE_TREE = (
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
)

_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# the 16x16 mode of a neighboring macroblock acts as a pseudo-bmode for
# the 4x4 context model (RFC 11.4)
_MODE_TO_BMODE = {
    DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
    H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED,
}

# token tree (RFC 13.2): leaves 0..4 are literal values, 5..10 the six
# extra-bit categories, 11 end-of-block
_TOK_EOB = 11
_COEFF_TREE = (
    -_TOK_EOB, 2,
    -0, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6,
    18, 20,
    -7, -8,
    -9, -10,
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)

_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)


class BoolDecoder:
    """RFC 6386 section 7.3 boolean decoder. Reading past the partition
    end feeds zero bytes (the spec's decoders legally overrun by up to a
    few bytes while draining the final bits)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 2
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0

    def read_bool(self, probability: int) -> int:
        split = 1 + (((self.range - 1) * probability) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.value -= big_split
            self.range -= split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def read_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed(self, n: int) -> int:
        v = self.read_literal(n)
        return -v if self.read_bool(128) else v

    def read_tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read_bool(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _c128(v: int) -> int:
    """Signed-char clamp (the loop filter's arithmetic domain)."""
    return -128 if v < -128 else (127 if v > 127 else v)


# ---------------------------------------------------------------------------
# Inverse transforms (RFC 6386 sections 14.2-14.3, exact integer forms)

_C1 = 20091  # (cos(pi/8)*sqrt(2) - 1) << 16
_C2 = 35468  # sin(pi/8)*sqrt(2) << 16


def _idct4x4(b: list) -> list:
    t = [0] * 16
    for i in range(4):
        a1 = b[i] + b[i + 8]
        b1 = b[i] - b[i + 8]
        c1 = ((b[i + 4] * _C2) >> 16) - (b[i + 12] + ((b[i + 12] * _C1) >> 16))
        d1 = (b[i + 4] + ((b[i + 4] * _C1) >> 16)) + ((b[i + 12] * _C2) >> 16)
        t[i] = a1 + d1
        t[i + 12] = a1 - d1
        t[i + 4] = b1 + c1
        t[i + 8] = b1 - c1
    out = [0] * 16
    for i in range(0, 16, 4):
        a1 = t[i] + t[i + 2]
        b1 = t[i] - t[i + 2]
        c1 = ((t[i + 1] * _C2) >> 16) - (t[i + 3] + ((t[i + 3] * _C1) >> 16))
        d1 = (t[i + 1] + ((t[i + 1] * _C1) >> 16)) + ((t[i + 3] * _C2) >> 16)
        out[i] = (a1 + d1 + 4) >> 3
        out[i + 3] = (a1 - d1 + 4) >> 3
        out[i + 1] = (b1 + c1 + 4) >> 3
        out[i + 2] = (b1 - c1 + 4) >> 3
    return out


def _iwht4x4(b: list) -> list:
    t = [0] * 16
    for i in range(4):
        a1 = b[i] + b[i + 12]
        b1 = b[i + 4] + b[i + 8]
        c1 = b[i + 4] - b[i + 8]
        d1 = b[i] - b[i + 12]
        t[i] = a1 + b1
        t[i + 4] = c1 + d1
        t[i + 8] = a1 - b1
        t[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(0, 16, 4):
        a1 = t[i] + t[i + 3]
        b1 = t[i + 1] + t[i + 2]
        c1 = t[i + 1] - t[i + 2]
        d1 = t[i] - t[i + 3]
        out[i] = (a1 + b1 + 3) >> 3
        out[i + 1] = (c1 + d1 + 3) >> 3
        out[i + 2] = (a1 - b1 + 3) >> 3
        out[i + 3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# Plane buffers. Layout: 1 border column on the left (value 129), one
# border row on top (value 127, which also supplies the 127 top-left
# corner), and 4 extension columns on the right for the above-right
# reads (initialized 127 on the border row; replicated from the last
# in-frame pixel per reconstructed row, VP8's rightmost-column rule).


class _Plane:
    __slots__ = ("w", "h", "stride", "buf")

    def __init__(self, w: int, h: int) -> None:
        self.w = w
        self.h = h
        self.stride = 1 + w + 4
        self.buf = bytearray(self.stride * (h + 1))
        for x in range(self.stride):  # above-frame row: 127
            self.buf[x] = 127
        for y in range(1, h + 1):  # left-of-frame column: 129
            self.buf[y * self.stride] = 129

    def at(self, x: int, y: int) -> int:
        """Pixel at frame coordinates (x, y); borders live at -1."""
        return self.buf[(y + 1) * self.stride + x + 1]

    def put(self, x: int, y: int, v: int) -> None:
        self.buf[(y + 1) * self.stride + x + 1] = v

    def extend_row(self, y: int) -> None:
        """Replicate the last in-frame pixel into the 4 right-extension
        slots (feeds the above-right reads of the rightmost MB column)."""
        row = (y + 1) * self.stride
        v = self.buf[row + self.w]
        self.buf[row + self.w + 1:row + self.w + 5] = bytes((v,) * 4)


# ---------------------------------------------------------------------------
# Intra predictors. AVG3/AVG2 per RFC 6386 section 12.3.


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _pred_block(plane: _Plane, x0: int, y0: int, size: int, mode: int) -> None:
    """16x16 / 8x8 whole-block predictors (DC/V/H/TM), written in place."""
    if mode == DC_PRED:
        have_a = y0 > 0
        have_l = x0 > 0
        if have_a or have_l:
            total = 0
            n = 0
            if have_a:
                for i in range(size):
                    total += plane.at(x0 + i, y0 - 1)
                n += size
            if have_l:
                for i in range(size):
                    total += plane.at(x0 - 1, y0 + i)
                n += size
            # rounded average: (sum + n/2) >> log2(n)
            dc = (total + (n >> 1)) >> (n.bit_length() - 1)
        else:
            dc = 128
        for r in range(size):
            for c in range(size):
                plane.put(x0 + c, y0 + r, dc)
    elif mode == V_PRED:
        above = [plane.at(x0 + i, y0 - 1) for i in range(size)]
        for r in range(size):
            for c in range(size):
                plane.put(x0 + c, y0 + r, above[c])
    elif mode == H_PRED:
        for r in range(size):
            v = plane.at(x0 - 1, y0 + r)
            for c in range(size):
                plane.put(x0 + c, y0 + r, v)
    else:  # TM_PRED
        p = plane.at(x0 - 1, y0 - 1)
        above = [plane.at(x0 + i, y0 - 1) for i in range(size)]
        for r in range(size):
            left = plane.at(x0 - 1, y0 + r)
            base = left - p
            for c in range(size):
                plane.put(x0 + c, y0 + r, _clamp255(base + above[c]))


def _pred_b(plane: _Plane, bx: int, by: int, mode: int,
            ar_x: int, ar_y: int) -> list:
    """The ten 4x4 B-mode predictors (RFC 6386 section 12.3). Returns a
    16-entry prediction. (ar_x, ar_y) locates the 4 above-right pixels
    (VP8 rule: right-edge subblocks below the MB's top row reuse the
    MB-level above-right pixels from the above macroblock row)."""
    A = [plane.at(bx + i, by - 1) for i in range(4)]
    AR = [plane.at(ar_x + i, ar_y) for i in range(4)]
    L = [plane.at(bx - 1, by + i) for i in range(4)]
    P = plane.at(bx - 1, by - 1)
    o = [0] * 16
    if mode == B_DC_PRED:
        dc = (sum(A) + sum(L) + 4) >> 3
        for i in range(16):
            o[i] = dc
    elif mode == B_TM_PRED:
        for r in range(4):
            for c in range(4):
                o[4 * r + c] = _clamp255(L[r] + A[c] - P)
    elif mode == B_VE_PRED:
        e = [P] + A + [AR[0]]
        vals = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        for r in range(4):
            o[4 * r:4 * r + 4] = vals
    elif mode == B_HE_PRED:
        e = [P] + L
        vals = [
            _avg3(e[0], e[1], e[2]),
            _avg3(e[1], e[2], e[3]),
            _avg3(e[2], e[3], e[4]),
            _avg3(e[3], e[4], e[4]),
        ]
        for r in range(4):
            o[4 * r:4 * r + 4] = [vals[r]] * 4
    elif mode == B_LD_PRED:
        a = A + AR
        for r in range(4):
            for c in range(4):
                j = r + c
                o[4 * r + c] = (
                    _avg3(a[6], a[7], a[7]) if j == 6
                    else _avg3(a[j], a[j + 1], a[j + 2])
                )
    elif mode == B_RD_PRED:
        e = [L[3], L[2], L[1], L[0], P] + A  # e[0..8]
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                o[4 * r + c] = _avg3(e[i - 1], e[i], e[i + 1])
    elif mode == B_VR_PRED:
        X, I, J, K = P, L[0], L[1], L[2]
        Aa, Bb, Cc, Dd = A
        o[0] = o[8 + 1] = _avg2(X, Aa)
        o[1] = o[8 + 2] = _avg2(Aa, Bb)
        o[2] = o[8 + 3] = _avg2(Bb, Cc)
        o[3] = _avg2(Cc, Dd)
        o[4] = o[12 + 1] = _avg3(I, X, Aa)
        o[5] = o[12 + 2] = _avg3(X, Aa, Bb)
        o[6] = o[12 + 3] = _avg3(Aa, Bb, Cc)
        o[7] = _avg3(Bb, Cc, Dd)
        o[8] = _avg3(X, I, J)
        o[12] = _avg3(I, J, K)
    elif mode == B_VL_PRED:
        Aa, Bb, Cc, Dd = A
        E, F, G, H = AR
        o[0] = _avg2(Aa, Bb)
        o[1] = o[8] = _avg2(Bb, Cc)
        o[2] = o[8 + 1] = _avg2(Cc, Dd)
        o[3] = o[8 + 2] = _avg2(Dd, E)
        o[4] = _avg3(Aa, Bb, Cc)
        o[5] = o[12] = _avg3(Bb, Cc, Dd)
        o[6] = o[12 + 1] = _avg3(Cc, Dd, E)
        o[7] = o[12 + 2] = _avg3(Dd, E, F)
        o[8 + 3] = _avg3(E, F, G)
        o[12 + 3] = _avg3(F, G, H)
    elif mode == B_HD_PRED:
        X, I, J, K, Lp = P, L[0], L[1], L[2], L[3]
        Aa, Bb, Cc = A[0], A[1], A[2]
        o[0] = o[4 + 2] = _avg2(I, X)
        o[1] = o[4 + 3] = _avg3(I, X, Aa)
        o[2] = _avg3(X, Aa, Bb)
        o[3] = _avg3(Aa, Bb, Cc)
        o[4] = o[8 + 2] = _avg2(J, I)
        o[5] = o[8 + 3] = _avg3(J, I, X)
        o[8] = o[12 + 2] = _avg2(K, J)
        o[9] = o[12 + 3] = _avg3(K, J, I)
        o[12] = _avg2(Lp, K)
        o[13] = _avg3(Lp, K, J)
    else:  # B_HU_PRED
        I, J, K, Lp = L
        o[0] = _avg2(I, J)
        o[1] = _avg3(I, J, K)
        o[2] = o[4] = _avg2(J, K)
        o[3] = o[5] = _avg3(J, K, Lp)
        o[6] = o[8] = _avg2(K, Lp)
        o[7] = o[9] = _avg3(K, Lp, Lp)
        o[10] = o[11] = o[12] = o[13] = o[14] = o[15] = Lp
    return o


# ---------------------------------------------------------------------------
# Header / frame state


class _FrameHeader:
    pass


def _parse_first_partition(bd: BoolDecoder) -> _FrameHeader:
    h = _FrameHeader()
    h.color_space = bd.read_literal(1)
    h.clamping_type = bd.read_literal(1)
    h.segmentation = bd.read_bool(128)
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_abs = 0
    h.update_map = 0
    h.seg_tree_probs = [255, 255, 255]
    if h.segmentation:
        h.update_map = bd.read_bool(128)
        update_data = bd.read_bool(128)
        if update_data:
            h.seg_abs = bd.read_bool(128)
            for i in range(4):
                if bd.read_bool(128):
                    h.seg_quant[i] = bd.read_signed(7)
            for i in range(4):
                if bd.read_bool(128):
                    h.seg_lf[i] = bd.read_signed(6)
        if h.update_map:
            for i in range(3):
                if bd.read_bool(128):
                    h.seg_tree_probs[i] = bd.read_literal(8)
    h.filter_type = bd.read_literal(1)  # 0 = normal, 1 = simple
    h.filter_level = bd.read_literal(6)
    h.sharpness = bd.read_literal(3)
    h.lf_delta = bd.read_bool(128)
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta:
        if bd.read_bool(128):  # update
            for i in range(4):
                if bd.read_bool(128):
                    h.ref_lf_deltas[i] = bd.read_signed(6)
            for i in range(4):
                if bd.read_bool(128):
                    h.mode_lf_deltas[i] = bd.read_signed(6)
    h.n_token_partitions = 1 << bd.read_literal(2)
    h.y_ac_qi = bd.read_literal(7)
    h.y_dc_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    h.y2_dc_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    h.y2_ac_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    h.uv_dc_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    h.uv_ac_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    h.refresh_entropy = bd.read_bool(128)
    # token probability updates over the default table
    probs = bytearray(_COEFF_PROBS)
    for i in range(1056):
        if bd.read_bool(_COEFF_UPDATE_PROBS[i]):
            probs[i] = bd.read_literal(8)
    h.coeff_probs = bytes(probs)
    h.mb_no_skip = bd.read_bool(128)
    h.prob_skip = bd.read_literal(8) if h.mb_no_skip else 0
    return h


def _quantizers(h: _FrameHeader, seg_id: int) -> tuple:
    if h.segmentation:
        q = h.seg_quant[seg_id] if h.seg_abs else h.y_ac_qi + h.seg_quant[seg_id]
    else:
        q = h.y_ac_qi
    q = 0 if q < 0 else (127 if q > 127 else q)

    def dc_q(i):
        return _DC_Q[0 if i < 0 else (127 if i > 127 else i)]

    def ac_q(i):
        return _AC_Q[0 if i < 0 else (127 if i > 127 else i)]

    y1dc = dc_q(q + h.y_dc_delta)
    y1ac = ac_q(q)
    y2dc = dc_q(q + h.y2_dc_delta) * 2
    y2ac = ac_q(q + h.y2_ac_delta) * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = dc_q(q + h.uv_dc_delta)
    if uvdc > 132:
        uvdc = 132
    uvac = ac_q(q + h.uv_ac_delta)
    return (y1dc, y1ac, y2dc, y2ac, uvdc, uvac)


# ---------------------------------------------------------------------------
# Coefficient decoding (RFC 6386 section 13.3)


def _decode_block_coeffs(bd: BoolDecoder, probs: bytes, plane_type: int,
                         ctx: int, first: int) -> tuple:
    """Decode one 4x4 block's coefficients into natural order (zigzag
    applied); values are UNQUANTIZED token magnitudes. Returns
    (end_position, coeffs-or-None): the nonzero-context flag is
    ``end_position > first`` — the EOB position, exactly libwebp's
    GetCoeffs return (a legal all-zero run to position 16 sets the flag
    with no stored values, so flag and values must be tracked apart)."""
    out = None
    n = first
    base = plane_type * 264  # 8 bands * 3 ctx * 11 probs
    skip_eob = False
    while n < 16:
        p = base + _COEFF_BANDS[n] * 33 + ctx * 11
        pr = probs[p:p + 11]
        tok = bd.read_tree(_COEFF_TREE, pr, start=2 if skip_eob else 0)
        if tok == _TOK_EOB:
            break
        if tok == 0:
            skip_eob = True
            ctx = 0
            n += 1
            continue
        skip_eob = False
        if tok <= 4:
            v = tok
            ctx = 1 if v == 1 else 2
        else:
            cat = tok - 5
            extra = 0
            for cp in _CAT_PROBS[cat]:
                extra = (extra << 1) | bd.read_bool(cp)
            v = _CAT_BASE[cat] + extra
            ctx = 2
        if bd.read_bool(128):
            v = -v
        if out is None:
            out = [0] * 16
        out[_ZIGZAG[n]] = v
        n += 1
    return n, out


# ---------------------------------------------------------------------------
# Loop filter (RFC 6386 section 15)


def _filter_params(h: _FrameHeader, seg_id: int, is_bpred: bool) -> tuple:
    """Per-MB (level, interior_limit, hev_threshold) after segment and
    delta adjustments; level 0 disables filtering for the MB."""
    if h.segmentation:
        level = h.seg_lf[seg_id] if h.seg_abs else h.filter_level + h.seg_lf[seg_id]
    else:
        level = h.filter_level
    if h.lf_delta:
        level += h.ref_lf_deltas[0]  # keyframe MBs reference INTRA
        if is_bpred:
            level += h.mode_lf_deltas[0]
    level = 0 if level < 0 else (63 if level > 63 else level)
    interior = level
    if h.sharpness > 0:
        interior >>= 2 if h.sharpness > 4 else 1
        if interior > 9 - h.sharpness:
            interior = 9 - h.sharpness
    if interior < 1:
        interior = 1
    hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
    return level, interior, hev_t


def _filter_mask(p: list, limit: int, edge_limit: int) -> bool:
    p3, p2, p1, p0, q0, q1, q2, q3 = p
    return (
        abs(p3 - p2) <= limit and abs(p2 - p1) <= limit
        and abs(p1 - p0) <= limit and abs(q1 - q0) <= limit
        and abs(q2 - q1) <= limit and abs(q3 - q2) <= limit
        and abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit
    )


def _filter_edge(get, put, mb_edge: bool, limit: int, edge_limit: int,
                 hev_t: int) -> None:
    """Filter one 8-pixel segment across an edge. get(i)/put(i, v) index
    positions p3..q3 as 0..7 in pixel domain."""
    px = [get(i) for i in range(8)]
    if not _filter_mask(px, limit, edge_limit):
        return
    p2, p1, p0, q0, q1, q2 = (v - 128 for v in px[1:7])
    hev = abs(px[2] - px[3]) > hev_t or abs(px[5] - px[4]) > hev_t
    if not mb_edge:
        f = _c128((_c128(p1 - q1) if hev else 0) + 3 * (q0 - p0))
        f1 = _c128(f + 4) >> 3
        f2 = _c128(f + 3) >> 3
        q0 = _c128(q0 - f1)
        p0 = _c128(p0 + f2)
        if not hev:
            a = (f1 + 1) >> 1
            q1 = _c128(q1 - a)
            p1 = _c128(p1 + a)
        put(2, p1 + 128)
        put(3, p0 + 128)
        put(4, q0 + 128)
        put(5, q1 + 128)
    else:
        f = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
        if hev:
            f1 = _c128(f + 4) >> 3
            f2 = _c128(f + 3) >> 3
            q0 = _c128(q0 - f1)
            p0 = _c128(p0 + f2)
        else:
            a = _c128((27 * f + 63) >> 7)
            q0 = _c128(q0 - a)
            p0 = _c128(p0 + a)
            a = _c128((18 * f + 63) >> 7)
            q1 = _c128(q1 - a)
            p1 = _c128(p1 + a)
            a = _c128((9 * f + 63) >> 7)
            q2 = _c128(q2 - a)
            p2 = _c128(p2 + a)
        put(1, p2 + 128)
        put(2, p1 + 128)
        put(3, p0 + 128)
        put(4, q0 + 128)
        put(5, q1 + 128)
        put(6, q2 + 128)


def _filter_edge_simple(get, put, edge_limit: int) -> None:
    px = [get(i) for i in range(8)]
    if abs(px[3] - px[4]) * 2 + abs(px[2] - px[5]) // 2 > edge_limit:
        return
    p1, p0, q0, q1 = (v - 128 for v in px[2:6])
    f = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
    f1 = _c128(f + 4) >> 3
    f2 = _c128(f + 3) >> 3
    put(3, _c128(p0 + f2) + 128)
    put(4, _c128(q0 - f1) + 128)


def _filter_v_edge(plane: _Plane, x: int, y0: int, n: int, mb_edge: bool,
                   limit: int, edge_limit: int, hev_t: int,
                   simple: bool) -> None:
    """Vertical edge at column x (pixels x-4..x+3), rows y0..y0+n-1."""
    for y in range(y0, y0 + n):
        def get(i, y=y):
            return plane.at(x - 4 + i, y)

        def put(i, v, y=y):
            plane.put(x - 4 + i, y, v)

        if simple:
            _filter_edge_simple(get, put, edge_limit)
        else:
            _filter_edge(get, put, mb_edge, limit, edge_limit, hev_t)


def _filter_h_edge(plane: _Plane, x0: int, y: int, n: int, mb_edge: bool,
                   limit: int, edge_limit: int, hev_t: int,
                   simple: bool) -> None:
    """Horizontal edge at row y (pixels y-4..y+3), columns x0..x0+n-1."""
    for x in range(x0, x0 + n):
        def get(i, x=x):
            return plane.at(x, y - 4 + i)

        def put(i, v, x=x):
            plane.put(x, y - 4 + i, v)

        if simple:
            _filter_edge_simple(get, put, edge_limit)
        else:
            _filter_edge(get, put, mb_edge, limit, edge_limit, hev_t)


# ---------------------------------------------------------------------------
# Frame decode


def decode_vp8_frame(data: bytes) -> dict:
    """Decode one lossy VP8 KEYFRAME payload (the content of a WebP
    `VP8 ` chunk). Returns ``{"width", "height", "y", "u", "v"}`` with
    planes as bytes in raster order (chroma at ceil(w/2) x ceil(h/2)),
    loop filter applied — byte-identical to libwebp's WebPDecodeYUV."""
    if len(data) < 10:
        raise ValueError("malformed VP8: truncated frame header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    key_frame = not (tag & 1)
    version = (tag >> 1) & 7
    first_part_size = tag >> 5
    if not key_frame:
        raise NotImplementedError(
            "VP8 interframe: a static WebP holds exactly one keyframe; "
            "golden/altref reference decoding is out of scope"
        )
    if version > 3:
        raise ValueError(f"malformed VP8: version {version}")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("malformed VP8: bad keyframe start code")
    w16, h16 = struct.unpack_from("<HH", data, 6)
    width, height = w16 & 0x3FFF, h16 & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("malformed VP8: zero dimension")
    if 10 + first_part_size > len(data):
        raise ValueError("malformed VP8: first partition overruns frame")
    bd = BoolDecoder(data[10:10 + first_part_size])
    h = _parse_first_partition(bd)

    # token partitions: sizes trailer then data (last size is implicit)
    tp_start = 10 + first_part_size
    n_tp = h.n_token_partitions
    sizes_end = tp_start + 3 * (n_tp - 1)
    if sizes_end > len(data):
        raise ValueError("malformed VP8: truncated partition sizes")
    parts = []
    pos = sizes_end
    for i in range(n_tp):
        if i < n_tp - 1:
            sz = data[tp_start + 3 * i] | (data[tp_start + 3 * i + 1] << 8) \
                | (data[tp_start + 3 * i + 2] << 16)
        else:
            sz = len(data) - pos
        if pos + sz > len(data) or sz < 0:
            raise ValueError("malformed VP8: token partition overruns frame")
        parts.append(BoolDecoder(data[pos:pos + sz]))
        pos += sz

    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4
    yp = _Plane(mb_w * 16, mb_h * 16)
    up = _Plane(mb_w * 8, mb_h * 8)
    vp = _Plane(mb_w * 8, mb_h * 8)

    # ------ pass 1: modes for all MBs (they live in the first partition
    # in raster order, before any tokens are read)
    seg_ids = [0] * (mb_w * mb_h)
    skips = [False] * (mb_w * mb_h)
    ymodes = [DC_PRED] * (mb_w * mb_h)
    uvmodes = [DC_PRED] * (mb_w * mb_h)
    bmodes = [None] * (mb_w * mb_h)
    above_b = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    for mb_y in range(mb_h):
        left_b = [B_DC_PRED] * 4
        for mb_x in range(mb_w):
            i = mb_y * mb_w + mb_x
            if h.update_map:
                seg_ids[i] = bd.read_tree(_SEGMENT_TREE, h.seg_tree_probs)
            if h.mb_no_skip:
                skips[i] = bool(bd.read_bool(h.prob_skip))
            ym = bd.read_tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            ymodes[i] = ym
            if ym == B_PRED:
                bm = [0] * 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    a = bm[sb - 4] if r > 0 else above_b[mb_x][c]
                    le = bm[sb - 1] if c > 0 else left_b[r]
                    probs = _KF_BMODE_PROBS[(a * 10 + le) * 9:
                                            (a * 10 + le) * 9 + 9]
                    bm[sb] = bd.read_tree(_BMODE_TREE, probs)
                bmodes[i] = bm
                above_b[mb_x] = bm[12:16]
                left_b = [bm[3], bm[7], bm[11], bm[15]]
            else:
                pseudo = _MODE_TO_BMODE[ym]
                above_b[mb_x] = [pseudo] * 4
                left_b = [pseudo] * 4
            uvmodes[i] = bd.read_tree(_UV_MODE_TREE, _KF_UV_MODE_PROBS)

    # ------ pass 2: tokens + reconstruction, row by row
    # nonzero-context trackers: per MB 4 Y flags, 2 U, 2 V, 1 Y2
    above_nz = [[0] * 9 for _ in range(mb_w)]  # 4 Y, 2 U, 2 V, 1 Y2
    has_coeffs = [False] * (mb_w * mb_h)
    probs = h.coeff_probs
    for mb_y in range(mb_h):
        td = parts[mb_y % n_tp]
        left_nz = [0] * 9
        for mb_x in range(mb_w):
            i = mb_y * mb_w + mb_x
            ym = ymodes[i]
            is_b = ym == B_PRED
            a_nz, l_nz = above_nz[mb_x], left_nz
            coeffs = [None] * 25  # 16 Y, 4 U, 4 V, Y2
            if skips[i]:
                for k in range(8):
                    a_nz[k] = l_nz[k] = 0
                if not is_b:
                    a_nz[8] = l_nz[8] = 0
                # (B_PRED MBs have no Y2: its context is left untouched)
            else:
                q = _quantizers(h, seg_ids[i])
                nz_any = 0
                if not is_b:
                    ctx = a_nz[8] + l_nz[8]
                    end, blk = _decode_block_coeffs(td, probs, 1, ctx, 0)
                    a_nz[8] = l_nz[8] = 1 if end > 0 else 0
                    nz_any |= end > 0
                    if blk is not None:
                        coeffs[24] = [
                            v * (q[2] if j == 0 else q[3])
                            for j, v in enumerate(blk)
                        ]
                    first, ptype = 1, 0
                else:
                    first, ptype = 0, 3
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    ctx = a_nz[c] + l_nz[r]
                    end, blk = _decode_block_coeffs(
                        td, probs, ptype, ctx, first)
                    nz = 1 if end > first else 0
                    a_nz[c] = l_nz[r] = nz
                    nz_any |= nz
                    if blk is not None:
                        coeffs[sb] = [
                            v * (q[0] if j == 0 else q[1])
                            for j, v in enumerate(blk)
                        ]
                for half, off in ((0, 16), (1, 20)):
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        ai = 4 + half * 2 + c
                        li = 4 + half * 2 + r
                        ctx = a_nz[ai] + l_nz[li]
                        end, blk = _decode_block_coeffs(td, probs, 2, ctx, 0)
                        nz = 1 if end > 0 else 0
                        a_nz[ai] = l_nz[li] = nz
                        nz_any |= nz
                        if blk is not None:
                            coeffs[off + sb] = [
                                v * (q[4] if j == 0 else q[5])
                                for j, v in enumerate(blk)
                            ]
                has_coeffs[i] = bool(nz_any)
                if coeffs[24] is not None:
                    y2 = _iwht4x4(coeffs[24])
                    for sb in range(16):
                        if coeffs[sb] is None:
                            if y2[sb]:
                                coeffs[sb] = [0] * 16
                                coeffs[sb][0] = y2[sb]
                        else:
                            coeffs[sb][0] = y2[sb]
                elif not is_b:
                    pass  # all-zero Y2: DCs stay as decoded (zero)

            # ---- reconstruction
            x0, y0 = mb_x * 16, mb_y * 16
            if is_b:
                bm = bmodes[i]
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    bx, by = x0 + 4 * c, y0 + 4 * r
                    if c == 3 and r > 0:
                        ar_x, ar_y = x0 + 16, y0 - 1
                    else:
                        ar_x, ar_y = bx + 4, by - 1
                    pred = _pred_b(yp, bx, by, bm[sb], ar_x, ar_y)
                    blk = coeffs[sb]
                    if blk is not None:
                        res = _idct4x4(blk)
                        for j in range(16):
                            yp.put(bx + (j & 3), by + (j >> 2),
                                   _clamp255(pred[j] + res[j]))
                    else:
                        for j in range(16):
                            yp.put(bx + (j & 3), by + (j >> 2), pred[j])
            else:
                _pred_block(yp, x0, y0, 16, ym)
                for sb in range(16):
                    blk = coeffs[sb]
                    if blk is None:
                        continue
                    r, c = sb >> 2, sb & 3
                    bx, by = x0 + 4 * c, y0 + 4 * r
                    res = _idct4x4(blk)
                    for j in range(16):
                        px = yp.at(bx + (j & 3), by + (j >> 2))
                        yp.put(bx + (j & 3), by + (j >> 2),
                               _clamp255(px + res[j]))
            cx0, cy0 = mb_x * 8, mb_y * 8
            for plane, off in ((up, 16), (vp, 20)):
                _pred_block(plane, cx0, cy0, 8, uvmodes[i])
                for sb in range(4):
                    blk = coeffs[off + sb]
                    if blk is None:
                        continue
                    r, c = sb >> 1, sb & 1
                    bx, by = cx0 + 4 * c, cy0 + 4 * r
                    res = _idct4x4(blk)
                    for j in range(16):
                        px = plane.at(bx + (j & 3), by + (j >> 2))
                        plane.put(bx + (j & 3), by + (j >> 2),
                                  _clamp255(px + res[j]))
        # right-extension for the next MB row's above-right reads
        for yy in range(mb_y * 16, mb_y * 16 + 16):
            yp.extend_row(yy)

    # ------ pass 3: loop filter (intra prediction above used the
    # UNFILTERED reconstruction; the filtered frame is the output)
    if h.filter_level > 0 or h.segmentation or h.lf_delta:
        simple = h.filter_type == 1
        for mb_y in range(mb_h):
            for mb_x in range(mb_w):
                i = mb_y * mb_w + mb_x
                level, interior, hev_t = _filter_params(
                    h, seg_ids[i], ymodes[i] == B_PRED)
                if level == 0:
                    continue
                inner = has_coeffs[i] or ymodes[i] == B_PRED
                lim_mb = 2 * (level + 2) + interior
                lim_sb = 2 * level + interior
                x0, y0 = mb_x * 16, mb_y * 16
                cx0, cy0 = mb_x * 8, mb_y * 8
                if mb_x > 0:
                    _filter_v_edge(yp, x0, y0, 16, True, interior, lim_mb,
                                   hev_t, simple)
                    if not simple:
                        _filter_v_edge(up, cx0, cy0, 8, True, interior,
                                       lim_mb, hev_t, False)
                        _filter_v_edge(vp, cx0, cy0, 8, True, interior,
                                       lim_mb, hev_t, False)
                if inner:
                    for dx in (4, 8, 12):
                        _filter_v_edge(yp, x0 + dx, y0, 16, False, interior,
                                       lim_sb, hev_t, simple)
                    if not simple:
                        _filter_v_edge(up, cx0 + 4, cy0, 8, False, interior,
                                       lim_sb, hev_t, False)
                        _filter_v_edge(vp, cx0 + 4, cy0, 8, False, interior,
                                       lim_sb, hev_t, False)
                if mb_y > 0:
                    _filter_h_edge(yp, x0, y0, 16, True, interior, lim_mb,
                                   hev_t, simple)
                    if not simple:
                        _filter_h_edge(up, cx0, cy0, 8, True, interior,
                                       lim_mb, hev_t, False)
                        _filter_h_edge(vp, cx0, cy0, 8, True, interior,
                                       lim_mb, hev_t, False)
                if inner:
                    for dy in (4, 8, 12):
                        _filter_h_edge(yp, x0, y0 + dy, 16, False, interior,
                                       lim_sb, hev_t, simple)
                    if not simple:
                        _filter_h_edge(up, cx0, cy0 + 4, 8, False, interior,
                                       lim_sb, hev_t, False)
                        _filter_h_edge(vp, cx0, cy0 + 4, 8, False, interior,
                                       lim_sb, hev_t, False)

    # crop to frame dimensions
    cw, ch = (width + 1) >> 1, (height + 1) >> 1

    def crop(plane: _Plane, w: int, hh: int) -> bytes:
        out = bytearray(w * hh)
        for y in range(hh):
            row = (y + 1) * plane.stride + 1
            out[y * w:(y + 1) * w] = plane.buf[row:row + w]
        return bytes(out)

    return {
        "width": width,
        "height": height,
        "y": crop(yp, width, height),
        "u": crop(up, cw, ch),
        "v": crop(vp, cw, ch),
    }


def yuv420_to_rgba(y: bytes, u: bytes, v: bytes, w: int, h: int) -> bytes:
    """YUV420 -> RGBA with libwebp's exact integer BT.601 conversion
    (yuv.h: coeff<<8 fixed point, clip at 6 fractional bits) and POINT
    chroma upsampling. The conversion is OUTSIDE the VP8 bitstream spec
    — the oracle-grade comparison is the YUV planes from
    decode_vp8_frame; this presentation step matches WebPDecodeRGBA
    exactly wherever chroma is locally constant and within the
    upsampling-filter difference elsewhere (the JPEG 4:2:0 precedent:
    point vs fancy upsampling is a legal decoder choice)."""
    cw = (w + 1) >> 1
    out = bytearray(w * h * 4)
    mask = ~((256 << 6) - 1)
    for yy in range(h):
        crow = (yy >> 1) * cw
        for xx in range(w):
            # per libwebp yuv.h: each product >> 8 SEPARATELY, then sum
            Y = (y[yy * w + xx] * 19077) >> 8
            U = u[crow + (xx >> 1)]
            V = v[crow + (xx >> 1)]
            r = Y + ((V * 26149) >> 8) - 14234
            g = Y - ((U * 6419) >> 8) - ((V * 13320) >> 8) + 8708
            b = Y + ((U * 33050) >> 8) - 17685
            i = (yy * w + xx) * 4
            out[i] = (r >> 6) if not (r & mask) else (0 if r < 0 else 255)
            out[i + 1] = (g >> 6) if not (g & mask) else (0 if g < 0 else 255)
            out[i + 2] = (b >> 6) if not (b & mask) else (0 if b < 0 else 255)
            out[i + 3] = 255
    return bytes(out)


def decode_webp_lossy(data: bytes) -> dict:
    """Decode a RIFF/WEBP container holding a lossy `VP8 ` chunk to YUV
    planes (see decode_vp8_frame). VP8L containers belong to
    webp_codec.decode_webp_lossless, VP8X to decode_webp_extended."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("malformed WebP: bad RIFF/WEBP header")
    fourcc = data[12:16]
    if fourcc == b"VP8L":
        raise ValueError("lossless container: use decode_webp_lossless")
    if fourcc == b"VP8X":
        raise ValueError(
            "extended container: use webp_codec.decode_webp_extended "
            "(still VP8X with alpha decodes for real since round 10)"
        )
    if fourcc != b"VP8 ":
        raise ValueError(f"malformed WebP: unknown chunk {fourcc!r}")
    if len(data) < 20:
        raise ValueError("malformed WebP: truncated VP8 chunk header")
    (clen,) = struct.unpack("<I", data[16:20])
    payload = data[20:20 + clen]
    if len(payload) < clen:
        raise ValueError("malformed WebP: truncated VP8 chunk")
    return decode_vp8_frame(payload)
