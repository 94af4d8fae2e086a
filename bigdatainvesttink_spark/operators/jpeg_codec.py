"""Baseline + progressive + arithmetic JPEG codec on stdlib + numpy.

Retires the ``decode_image`` JPEG NotImplementedError guard the same way
rounds 4/5 retired WAV and PNG: no codec library, just the published
format — ITU-T T.81 DCT, Huffman entropy coding, 8-bit samples.
Supported: grayscale and YCbCr 4:4:4 / 4:2:2 / 4:2:0 (any h/v factors
<= 2), restart markers, multiple DQT/DHT segments, baseline sequential
(SOF0/1), — since r8 — PROGRESSIVE (SOF2): spectral selection +
successive approximation per T.81 Annex G, i.e. interleaved DC
first/refinement scans and per-component AC first/refinement scans with
EOB runs, accumulated into a persistent coefficient store and
dequantized/IDCT'd once after the last scan, and — since r9 —
ARITHMETIC coding, both sequential (SOF9) and progressive (SOF10): the
T.81 Annex D QM coder with the Table D.3 state machine, the F.2.4 DC/AC
conditioning contexts (DAC markers, restart statistics reset), and the
G.2 progressive scan kinds (per-block coded EOB decisions instead of
EOB runs), cross-validated against libjpeg-encoded streams. Out of
scope (documented raises, not silent garbage): hierarchical/lossless
variants, 12-bit precision.

The encoder twin (`encode_jpeg_baseline`) exists for the tests'
roundtrip proof, mirroring `encode_png` / the WAV writer: gray or RGB
4:4:4, Annex K standard Huffman tables, all-ones quantization by
default so the only roundtrip error is DCT rounding (uniform blocks
roundtrip EXACTLY; arbitrary content within a few LSB).

Everything is numpy matrix algebra per 8x8 block — IDCT/FDCT are
orthonormal DCT-II/III basis products, exact to float64 — and the bit
plumbing is plain Python, fine for the test-scale payloads that flow
through the Arrow-batched mapInPandas seam (`multimodal.extract_meta`).
Scale note: per-image decode parallelism comes from the Spark seam
(one image per row, partitions across executors), not from this module.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# orthonormal DCT-II basis: C[u, x] = a(u) cos((2x+1) u pi / 16);
# FDCT(b) = C b C^T, IDCT(B) = C^T B C — exact transposes of each other
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


# ----------------------------------------------------------------- decode


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker (0xFF xx, xx != 0)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:  # a real marker: no more entropy data
                raise EOFError("marker inside entropy segment")
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
            if b == 0xFF:  # skip the stuffed 0x00
                self.pos += 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Skip padding to the byte boundary, then consume one RSTn."""
        if self.bit:
            cur = self.data[self.pos]
            self.pos += 1
            if cur == 0xFF:  # padded byte was 0xFF -> stuffed 0x00 follows
                self.pos += 1
            self.bit = 0
        if (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


def _build_huffman(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman: (length, code) -> symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a `size`-bit magnitude to its signed
    value (top bit 0 means negative)."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(data: bytes) -> dict:
    """Decode baseline JPEG to ``{width, height, n_components, pixels}``
    with pixels as interleaved uint8 bytes (gray or RGB)."""
    try:
        return _decode_jpeg(data)
    except (struct.error, IndexError, KeyError, EOFError,
            ZeroDivisionError) as exc:
        # corruption backstop (r10 fuzz): segment walks, Huffman/QM
        # reads, and component bookkeeping index per header-declared
        # values; corrupt or truncated input can push any of them past
        # a buffer, reference an undeclared table id, or zero a
        # sampling factor — surface the module's ValueError convention
        # (valid-stream correctness is pinned by the libjpeg oracles)
        raise ValueError("malformed JPEG: truncated or corrupt stream") \
            from exc


def _decode_jpeg(data: bytes) -> dict:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    dac: dict[str, dict] = {"dc": {}, "ac": {}}  # arith conditioning
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them, else a padded stream would misread the
        # next byte pair as (marker=0xFF, bogus segment length)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec == 0:
                    vals = list(seg[p:p + 64])
                    p += 64
                else:
                    vals = list(
                        struct.unpack(">64H", seg[p:p + 128])
                    )
                    p += 128
                t = np.zeros((8, 8))
                for i, (r, c) in enumerate(_ZIGZAG):
                    t[r, c] = vals[i]
                qt[tid] = t
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                symbols = seg[p + 17:p + 17 + n]
                huff[(cls, tid)] = _build_huffman(counts, symbols)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 (baseline/extended sequential), SOF2 (progressive),
            # SOF9/SOF10 (sequential/progressive arithmetic — r9)
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("JPEG subset: 8-bit precision")
            h, w, nc = struct.unpack(">HHB", seg[1:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker in (0xC2, 0xCA),
                     "arith": marker in (0xC9, 0xCA)}
            if frame["progressive"]:
                store = _ProgressiveStore(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG subset: sequential/progressive, Huffman or "
                f"arithmetic, only (SOF marker 0x{marker:02X} is "
                "hierarchical/lossless)"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                cs = seg[p + 1]
                p += 2
                if tc == 0:  # DC: Cs = (U << 4) | L
                    up, lo = cs >> 4, cs & 0xF
                    if lo > up:
                        raise ValueError("malformed JPEG: DAC L > U")
                    dac["dc"][tb] = (lo, up)
                else:  # AC: Cs = Kx
                    if not 1 <= cs <= 63:
                        raise ValueError("malformed JPEG: DAC Kx range")
                    dac["ac"][tb] = cs
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            if frame is None:
                raise ValueError("SOS before SOF")
            if frame.get("progressive"):
                scan_comps = []
                for i in range(ns):
                    cid, tt = seg[1 + 2 * i:3 + 2 * i]
                    scan_comps.append(
                        (cid, {"dc": tt >> 4, "ac": tt & 0xF})
                    )
                ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
                if frame.get("arith"):
                    pos = store.decode_scan_arith(
                        data, pos + seglen, scan_comps, dac,
                        restart_interval, ss, se, ahal >> 4, ahal & 0xF,
                    )
                else:
                    pos = store.decode_scan(
                        data, pos + seglen, scan_comps, huff,
                        restart_interval, ss, se, ahal >> 4, ahal & 0xF,
                    )
                continue
            if ns != len(frame["comps"]):
                # a partial sequential scan (ns < nc) would KeyError deep
                # in _decode_scan — guard it here as a documented subset
                # limit instead (ADVICE r6)
                raise NotImplementedError(
                    "JPEG subset: single interleaved scan naming every "
                    "frame component (sequential)"
                )
            scan = {}
            for i in range(ns):
                cid, tt = seg[1 + 2 * i:3 + 2 * i]
                scan[cid] = {"dc": tt >> 4, "ac": tt & 0xF}
            pos += seglen
            if frame.get("arith"):
                return _decode_scan_arith(
                    data, pos, frame, scan, qt, dac, restart_interval
                )
            return _decode_scan(
                data, pos, frame, scan, qt, huff, restart_interval
            )
        pos += seglen
    if frame is not None and frame.get("progressive"):
        return store.reconstruct(qt)
    raise ValueError("no SOS segment found")


def _decode_block(br, dc_tab, ac_tab, pred: int):
    coef = np.zeros((8, 8))
    s = _huff_decode(br, dc_tab)
    diff = _extend(br.read_bits(s), s)
    dc = pred + diff
    coef[0, 0] = dc
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        coef[_ZIGZAG[k]] = _extend(br.read_bits(s), s)
        k += 1
    return coef, dc


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        for c in comps
    }
    preds = {c["id"]: 0 for c in comps}
    br = _BitReader(data, pos)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.align_to_marker()  # consume RSTn
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef, preds[c["id"]] = _decode_block(
                            br,
                            huff[(0, scan[c["id"]]["dc"])],
                            huff[(1, scan[c["id"]]["ac"])],
                            preds[c["id"]],
                        )
                        block = _C.T @ (coef * qt[c["tq"]]) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = block
            n_mcu += 1
    return _finish(frame, planes)


def _finish(frame: dict, planes: dict) -> dict:
    """Upsample each component plane to full resolution (sample
    replication), color-convert, clip — shared by the sequential and
    progressive paths."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(
            np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        pixels = out.tobytes()
        ncomp = 1
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
        pixels = out.tobytes()
        ncomp = 3
    else:
        raise NotImplementedError("JPEG subset: 1 or 3 components")
    return {
        "width": w,
        "height": h,
        "n_components": ncomp,
        "pixels": pixels,
    }


# ------------------------------------------------- arithmetic (SOF9, r9)

# T.81 Table D.3 — the QM-coder probability estimation state machine:
# (Qe, Next_Index_MPS, Next_Index_LPS, Switch_MPS) for states 0..112,
# plus the conventional fixed state 113 (transitions to itself, switch
# 0) used for the AC sign decision, which is coded at a fixed ~0.5
# probability. Pinned byte-for-byte against the installed libjpeg's
# exported `jpeg_aritab` by tests/test_llm_ops.py.
_ARITH_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0), (0x080B, 4, 18, 0),
    (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0), (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0),
    (0x0036, 9, 30, 0), (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1), (0x3F25, 16, 36, 0),
    (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0), (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0),
    (0x0CEF, 21, 43, 0), (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0), (0x01B1, 28, 54, 0),
    (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0), (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0),
    (0x0068, 33, 62, 0), (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0), (0x2EF1, 40, 67, 0),
    (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0), (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0), (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0), (0x04DE, 52, 50, 0),
    (0x040F, 53, 50, 0), (0x0363, 54, 51, 0), (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0),
    (0x01F8, 57, 54, 0), (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0), (0x008F, 32, 61, 0),
    (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0), (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0),
    (0x2FE8, 69, 83, 0), (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0), (0x119C, 76, 74, 0),
    (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0), (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0),
    (0x5832, 81, 80, 1), (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0), (0x2516, 71, 86, 0),
    (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0), (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0),
    (0x3824, 93, 99, 0), (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0), (0x3C3D, 100, 104, 0),
    (0x375E, 93, 99, 0), (0x5231, 102, 105, 0), (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0), (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1), (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)


class _ArithDecoder:
    """T.81 Annex D arithmetic (QM) decoder over one entropy segment.

    Register discipline: the code register C accumulates raw stream
    bytes high-first while ``ct`` counts pending renormalization shifts,
    deferred into the interval comparison (``(A - Qe) << ct``) — the
    form D.2's DECODE/RENORMD/BYTEIN flowcharts compile to, with the
    conditional MPS/LPS exchange of D.2.6. Init C=0, A=0, ct=-16 pulls
    exactly two bytes before the first decision. On hitting a marker the
    decoder feeds zero bytes from then on (F.2.2.1's marker convention)
    and records the marker for the restart logic. A statistics bin is
    one byte: bit 7 = current MPS sense, bits 0-6 = Table D.3 state
    index; state 113 is the fixed-probability bin (a transition fixed
    point, so sign decisions never adapt)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.marker = None  # marker byte once hit; zero-feed afterwards
        self.c = 0
        self.a = 0
        self.ct = -16

    def _byte(self) -> int:
        if self.marker is not None:
            return 0
        if self.pos >= len(self.data):  # truncated: behave as at EOI
            self.marker = 0xD9
            return 0
        d = self.data[self.pos]
        self.pos += 1
        if d != 0xFF:
            return d
        # 0xFF: swallow fill bytes, then stuffed-zero vs marker
        while True:
            d2 = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            self.pos += 1
            if d2 != 0xFF:
                break
        if d2 == 0:
            return 0xFF  # stuffed data byte
        self.marker = d2  # legal mid-segment: supply zeros from now on
        return 0

    def decode(self, st: bytearray, i: int) -> int:
        """One binary decision against statistics bin ``st[i]``."""
        c, a, ct = self.c, self.a, self.ct
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                c = (c << 8) | self._byte()
                ct += 8
                if ct < 0:
                    ct += 1
                    if ct == 0:  # two init bytes in -> open interval
                        a = 0x10000
                        break
            a <<= 1
        sv = st[i]
        qe, nm, nlps, sw = _ARITH_TAB[sv & 0x7F]
        a -= qe
        temp = a << ct
        if c < temp:
            if a < 0x8000:  # renorm pending: conditional MPS exchange
                if a < qe:
                    st[i] = (sv & 0x80) ^ nlps ^ (sw << 7)
                    bit = (sv >> 7) ^ 1
                else:
                    st[i] = (sv & 0x80) ^ nm
                    bit = sv >> 7
            else:  # fast path: MPS, no state change
                bit = sv >> 7
        else:  # LPS region: conditional LPS exchange
            c -= temp
            if a < qe:
                st[i] = (sv & 0x80) ^ nm
                bit = sv >> 7
            else:
                st[i] = (sv & 0x80) ^ nlps ^ (sw << 7)
                bit = (sv >> 7) ^ 1
            a = qe
        self.c, self.a, self.ct = c, a, ct
        return bit


def _next_marker(data: bytes, pos: int) -> tuple[int, int]:
    """Scan forward for the next real marker (skipping flush remnants
    and stuffed 0xFF00 pairs); returns (marker_byte, pos_after)."""
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
        elif data[pos + 1] == 0x00:
            pos += 2
        elif data[pos + 1] == 0xFF:
            pos += 1
        else:
            return data[pos + 1], pos + 2
    raise ValueError("malformed JPEG: missing restart marker")


# DC/AC statistics-area sizes and layout anchors (T.81 Table F.4:
# X1 = 20 for DC magnitude categories; AC low/high category bins at
# 3*63 = 189 and 189 + 28 = 217; magnitude-bit bins at category + 14)
_DC_STAT_BINS = 64
_AC_STAT_BINS = 256


def _arith_decode_dc(dec, st, ctx, cond) -> tuple[int, int]:
    """One DC difference (F.2.4.1); returns (diff, next context)."""
    lo, up = cond
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    m = dec.decode(st, ctx + 2 + sign)
    idx = ctx + 2 + sign
    if m:
        idx = 20  # X1: magnitude-category ladder
        while dec.decode(st, idx):
            m <<= 1
            if m == 0x8000:
                raise ValueError("malformed JPEG: arithmetic DC overflow")
            idx += 1
    # conditioning category for the NEXT block of this component
    # (F.1.4.4.1.2: zero / small / large diff, sign-split)
    if m < ((1 << lo) >> 1):
        nxt = 0
    elif m > ((1 << up) >> 1):
        nxt = 12 + 4 * sign
    else:
        nxt = 4 + 4 * sign
    v = m
    idx += 14  # X2: magnitude bit pattern bins
    mm = m >> 1
    while mm:
        if dec.decode(st, idx):
            v |= mm
        mm >>= 1
    v += 1
    return (-v if sign else v), nxt


def _arith_decode_ac(dec, st, fixed, kx, coef, ss=1, se=63, al=0):
    """AC coefficients of one block band [ss, se] (F.2.4.2 / G.2),
    written into ``coef`` (zigzag order) scaled by the successive-
    approximation bit position ``al``."""
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB
            break
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > se:
                raise ValueError("malformed JPEG: arithmetic AC run-off")
            base = 3 * (k - 1)
        sign = dec.decode(fixed, 0)
        idx = base + 2
        m = dec.decode(st, idx)
        if m:
            if dec.decode(st, idx):  # same bin doubles as first category
                m = 2
                idx = 189 if k <= kx else 217
                while dec.decode(st, idx):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "malformed JPEG: arithmetic AC overflow"
                        )
                    idx += 1
        v = m
        idx += 14
        mm = m >> 1
        while mm:
            if dec.decode(st, idx):
                v |= mm
            mm >>= 1
        v += 1
        coef[k] = (-v if sign else v) << al
        k += 1
    return coef


def _decode_scan_arith(data, pos, frame, scan, qt, dac, restart_interval):
    """Sequential arithmetic-coded scan (SOF9, T.81 F.2.4): same MCU
    geometry as the Huffman path, QM-coded decisions instead of Huffman
    codes. DAC conditioning: DC (L, U) bounds classify the previous
    diff into one of five contexts; AC Kx splits the low/high
    magnitude-category ladders. Restart resets the decoder registers,
    ALL statistics areas, and the DC state (F.2.1.3)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        for c in comps
    }

    def fresh_stats():
        dc = {scan[c["id"]]["dc"]: bytearray(_DC_STAT_BINS) for c in comps}
        ac = {scan[c["id"]]["ac"]: bytearray(_AC_STAT_BINS) for c in comps}
        return dc, ac

    dec = _ArithDecoder(data, pos)
    dc_stats, ac_stats = fresh_stats()
    fixed = bytearray([113])  # AC sign: fixed ~0.5 probability bin
    last_dc = {c["id"]: 0 for c in comps}
    dc_ctx = {c["id"]: 0 for c in comps}
    n_mcu = 0
    expected_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                if dec.marker is not None:
                    marker, nxt = dec.marker, dec.pos
                else:
                    marker, nxt = _next_marker(data, dec.pos)
                if marker != 0xD0 + expected_rst:
                    raise ValueError(
                        f"malformed JPEG: expected RST{expected_rst}, "
                        f"got 0x{marker:02X}"
                    )
                expected_rst = (expected_rst + 1) & 7
                dec = _ArithDecoder(data, nxt)
                dc_stats, ac_stats = fresh_stats()
                last_dc = {c["id"]: 0 for c in comps}
                dc_ctx = {c["id"]: 0 for c in comps}
            for c in comps:
                cid = c["id"]
                dc_tbl, ac_tbl = scan[cid]["dc"], scan[cid]["ac"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        diff, dc_ctx[cid] = _arith_decode_dc(
                            dec, dc_stats[dc_tbl], dc_ctx[cid],
                            dac["dc"].get(dc_tbl, (0, 1)),
                        )
                        last_dc[cid] += diff
                        zz = _arith_decode_ac(
                            dec, ac_stats[ac_tbl], fixed,
                            dac["ac"].get(ac_tbl, 5), np.zeros(64),
                        )
                        zz[0] = last_dc[cid]
                        coef = np.zeros((8, 8))
                        coef[tuple(zip(*_ZIGZAG))] = zz
                        block = _C.T @ (coef * qt[c["tq"]]) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = block
            n_mcu += 1
    return _finish(frame, planes)


# natural (row*8+col) index of each zigzag position, for the vectorized
# zigzag -> natural scatter in the progressive reconstruction
_Z2N = np.array([r * 8 + c for r, c in _ZIGZAG])


class _ProgressiveStore:
    """Persistent DCT-coefficient store for progressive (SOF2) decoding
    (T.81 Annex G): each SOS scan deposits its spectral band / bit-plane
    into per-component zigzag-order block arrays; ``reconstruct``
    dequantizes and IDCTs once after the last scan.

    Scan kinds (G.1.1): DC first (Ss=0, Ah=0 — the only scan kind that
    may interleave several components), DC refinement (Ss=0, Ah>0 — one
    appended bit per block), AC first (Ss>0, Ah=0 — one component, EOB
    runs), AC refinement (Ss>0, Ah>0 — the correction-bit algorithm of
    G.1.2.3, mirroring libjpeg's decode_mcu_AC_refine semantics).
    Restart markers reset DC predictors AND the EOB run."""

    def __init__(self, frame: dict):
        self.frame = frame
        self.n_scans = 0  # decoded SOS count — reconstruct refuses zero
        comps = frame["comps"]
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        w, h = frame["w"], frame["h"]
        self.mcus_x = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcus_y = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coefs: dict[int, np.ndarray] = {}
        self.nonint: dict[int, tuple[int, int]] = {}
        for c in comps:
            # MCU-padded grid (interleaved DC scans touch all of it)
            self.coefs[c["id"]] = np.zeros(
                (self.mcus_y * c["v"], self.mcus_x * c["h"], 64),
                dtype=np.int64,
            )
            # non-interleaved grid (G.1: single-component scans traverse
            # ceil(comp_samples / 8), which may be smaller than padded)
            cw = (w * c["h"] + self.hmax - 1) // self.hmax
            ch = (h * c["v"] + self.vmax - 1) // self.vmax
            self.nonint[c["id"]] = ((ch + 7) // 8, (cw + 7) // 8)
        self._eobrun = 0

    # ---- per-block band decoders ------------------------------------

    def _dc_first(self, br, coef, dc_tab, preds, cid, al):
        s = _huff_decode(br, dc_tab)
        diff = _extend(br.read_bits(s), s)
        preds[cid] += diff
        coef[0] = preds[cid] << al

    def _dc_refine(self, br, coef, al):
        if br.read_bit():
            coef[0] |= 1 << al

    def _ac_first(self, br, coef, ac_tab, ss, se, al):
        if self._eobrun > 0:
            self._eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(br, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                self._eobrun = (1 << r) - 1  # this block is a member
                if r:
                    self._eobrun += br.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            coef[k] = _extend(br.read_bits(s), s) << al
            k += 1

    def _ac_refine(self, br, coef, ac_tab, ss, se, al):
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if self._eobrun == 0:
            while k <= se:
                rs = _huff_decode(br, ac_tab)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s:
                    if s != 1:
                        raise ValueError(
                            "invalid magnitude in AC refinement scan"
                        )
                    val = p1 if br.read_bit() else m1
                elif r != 15:
                    self._eobrun = 1 << r  # counts this block; tail -= 1
                    if r:
                        self._eobrun += br.read_bits(r)
                    break
                # advance over r zero-history coefficients, appending a
                # correction bit to every nonzero one passed on the way
                while k <= se:
                    if coef[k] != 0:
                        if br.read_bit() and not (coef[k] & p1):
                            coef[k] += p1 if coef[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    coef[k] = val
                k += 1
        if self._eobrun > 0:
            while k <= se:  # correction bits for the rest of the band
                if coef[k] != 0:
                    if br.read_bit() and not (coef[k] & p1):
                        coef[k] += p1 if coef[k] >= 0 else m1
                k += 1
            self._eobrun -= 1

    # ---- scan driver --------------------------------------------------

    def decode_scan(self, data, pos, scan_comps, huff, restart_interval,
                    ss, se, ah, al) -> int:
        """Decode one SOS's entropy segment into the store; returns the
        position of the next marker."""
        # AC band bounds (ADVICE r8): Ss > Se would silently decode
        # nothing per block; Se > 63 would surface as a numpy IndexError
        # inside _ac_first/_ac_refine — fail as malformed input instead
        if ss > 0 and not (ss <= se <= 63):
            raise ValueError(
                f"malformed JPEG: AC scan band Ss={ss}..Se={se} "
                f"outside 1..63"
            )
        self.n_scans += 1
        comps_by_id = {c["id"]: c for c in self.frame["comps"]}
        br = _BitReader(data, pos)
        self._eobrun = 0
        preds = {cid: 0 for cid, _ in scan_comps}
        n_unit = 0

        def maybe_restart():
            nonlocal preds
            if (
                restart_interval
                and n_unit
                and n_unit % restart_interval == 0
            ):
                br.align_to_marker()
                preds = {cid: 0 for cid, _ in scan_comps}
                self._eobrun = 0

        if ss == 0:  # DC scan (the only kind that may interleave)
            if se != 0:
                raise ValueError("DC scan with Se != 0")
            if len(scan_comps) > 1:
                for my in range(self.mcus_y):
                    for mx in range(self.mcus_x):
                        maybe_restart()
                        for cid, tabs in scan_comps:
                            c = comps_by_id[cid]
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    coef = self.coefs[cid][
                                        my * c["v"] + by, mx * c["h"] + bx
                                    ]
                                    if ah == 0:
                                        self._dc_first(
                                            br, coef,
                                            huff[(0, tabs["dc"])],
                                            preds, cid, al,
                                        )
                                    else:
                                        self._dc_refine(br, coef, al)
                        n_unit += 1
            else:
                cid, tabs = scan_comps[0]
                bh, bw = self.nonint[cid]
                for by in range(bh):
                    for bx in range(bw):
                        maybe_restart()
                        coef = self.coefs[cid][by, bx]
                        if ah == 0:
                            self._dc_first(
                                br, coef, huff[(0, tabs["dc"])],
                                preds, cid, al,
                            )
                        else:
                            self._dc_refine(br, coef, al)
                        n_unit += 1
        else:  # AC scan: exactly one component (T.81 G.1)
            if len(scan_comps) != 1:
                raise ValueError("interleaved AC scan is illegal")
            cid, tabs = scan_comps[0]
            ac_tab = huff[(1, tabs["ac"])]
            bh, bw = self.nonint[cid]
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart()
                    coef = self.coefs[cid][by, bx]
                    if ah == 0:
                        self._ac_first(br, coef, ac_tab, ss, se, al)
                    else:
                        self._ac_refine(br, coef, ac_tab, ss, se, al)
                    n_unit += 1
        # the entropy segment ends at the next real marker
        p = br.pos
        while p + 1 < len(data) and not (
            data[p] == 0xFF and data[p + 1] != 0x00
        ):
            p += 1
        return p

    # ---- arithmetic scan driver (SOF10, r9) ---------------------------

    def decode_scan_arith(self, data, pos, scan_comps, dac,
                          restart_interval, ss, se, ah, al) -> int:
        """Progressive ARITHMETIC scan (T.81 G.2 + Annex D): the same
        four scan kinds as the Huffman driver, QM-coded. DC first reuses
        the sequential conditioning contexts (result scaled << Al); DC
        refinement is one fixed-probability decision per block; AC first
        is the sequential band decode over [Ss, Se]; AC refinement walks
        the band with per-k (EOB, newly-nonzero, correction-bit) bins,
        the previous stage's end-of-block index gating the EOB decision.
        Statistics are re-initialized at scan start and at every restart
        (F.2.1.3); there is no EOB-run state — EOB is a per-block coded
        decision."""
        if ss > 0 and not (ss <= se <= 63):
            raise ValueError(
                f"malformed JPEG: AC scan band Ss={ss}..Se={se} "
                f"outside 1..63"
            )
        self.n_scans += 1
        comps_by_id = {c["id"]: c for c in self.frame["comps"]}
        fixed = bytearray([113])

        def fresh():
            dc = {t["dc"]: bytearray(_DC_STAT_BINS) for _, t in scan_comps}
            ac = {t["ac"]: bytearray(_AC_STAT_BINS) for _, t in scan_comps}
            last = {cid: 0 for cid, _ in scan_comps}
            ctx = {cid: 0 for cid, _ in scan_comps}
            return dc, ac, last, ctx

        dec = _ArithDecoder(data, pos)
        dc_stats, ac_stats, last_dc, dc_ctx = fresh()
        n_unit = 0
        expected_rst = 0

        def maybe_restart():
            nonlocal dec, dc_stats, ac_stats, last_dc, dc_ctx, expected_rst
            if not (restart_interval and n_unit
                    and n_unit % restart_interval == 0):
                return
            if dec.marker is not None:
                marker, nxt = dec.marker, dec.pos
            else:
                marker, nxt = _next_marker(data, dec.pos)
            if marker != 0xD0 + expected_rst:
                raise ValueError(
                    f"malformed JPEG: expected RST{expected_rst}, "
                    f"got 0x{marker:02X}"
                )
            expected_rst = (expected_rst + 1) & 7
            dec = _ArithDecoder(data, nxt)
            dc_stats, ac_stats, last_dc, dc_ctx = fresh()

        def dc_block(coef, cid, tabs):
            if ah == 0:
                diff, dc_ctx[cid] = _arith_decode_dc(
                    dec, dc_stats[tabs["dc"]], dc_ctx[cid],
                    dac["dc"].get(tabs["dc"], (0, 1)),
                )
                last_dc[cid] += diff
                coef[0] = last_dc[cid] << al
            elif dec.decode(fixed, 0):  # refinement: one coded bit
                coef[0] |= 1 << al

        if ss == 0:  # DC scan (the only kind that may interleave)
            if se != 0:
                raise ValueError("DC scan with Se != 0")
            if len(scan_comps) > 1:
                for my in range(self.mcus_y):
                    for mx in range(self.mcus_x):
                        maybe_restart()
                        for cid, tabs in scan_comps:
                            c = comps_by_id[cid]
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    dc_block(
                                        self.coefs[cid][
                                            my * c["v"] + by,
                                            mx * c["h"] + bx,
                                        ],
                                        cid, tabs,
                                    )
                        n_unit += 1
            else:
                cid, tabs = scan_comps[0]
                bh, bw = self.nonint[cid]
                for by in range(bh):
                    for bx in range(bw):
                        maybe_restart()
                        dc_block(self.coefs[cid][by, bx], cid, tabs)
                        n_unit += 1
        else:  # AC scan: exactly one component (T.81 G.1)
            if len(scan_comps) != 1:
                raise ValueError("interleaved AC scan is illegal")
            cid, tabs = scan_comps[0]
            kx = dac["ac"].get(tabs["ac"], 5)
            bh, bw = self.nonint[cid]
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart()
                    coef = self.coefs[cid][by, bx]
                    if ah == 0:
                        _arith_decode_ac(
                            dec, ac_stats[tabs["ac"]], fixed, kx,
                            coef, ss, se, al,
                        )
                    else:
                        self._arith_ac_refine(
                            dec, ac_stats[tabs["ac"]], fixed,
                            coef, ss, se, al,
                        )
                    n_unit += 1
        # the entropy segment ends at the next real marker
        p = dec.pos if dec.marker is None else dec.pos - 2
        while p + 1 < len(data) and not (
            data[p] == 0xFF and data[p + 1] != 0x00
        ):
            p += 1
        return p

    @staticmethod
    def _arith_ac_refine(dec, st, fixed, coef, ss, se, al):
        """G.2 AC successive-approximation refinement: per k, the
        correction bit for already-nonzero coefficients, the
        newly-nonzero decision (sign from the fixed bin) otherwise; the
        EOB decision applies only past the previous stage's last nonzero
        index."""
        p1 = 1 << al
        m1 = -1 << al
        kex = se
        while kex > 0 and coef[kex] == 0:
            kex -= 1
        k = ss
        while k <= se:
            base = 3 * (k - 1)
            if k > kex and dec.decode(st, base):  # EOB
                break
            while True:
                if coef[k]:  # previously nonzero: one correction bit
                    if dec.decode(st, base + 2):
                        coef[k] += m1 if coef[k] < 0 else p1
                    break
                if dec.decode(st, base + 1):  # newly nonzero
                    coef[k] = m1 if dec.decode(fixed, 0) else p1
                    break
                k += 1
                if k > se:
                    raise ValueError(
                        "malformed JPEG: arithmetic AC refine run-off"
                    )
                base = 3 * (k - 1)
            k += 1

    # ---- reconstruction ------------------------------------------------

    def reconstruct(self, qt: dict) -> dict:
        # a SOF2 stream that reached EOI with zero decoded scans must
        # fail like the sequential path does, not return the store's
        # all-zero coefficients as a uniform gray image (ADVICE r8)
        if self.n_scans == 0:
            raise ValueError("no SOS segment found")
        planes = {}
        for c in self.frame["comps"]:
            z = self.coefs[c["id"]]
            by, bx = z.shape[0], z.shape[1]
            nat = np.zeros_like(z, dtype=np.float64)
            nat[..., _Z2N] = z  # zigzag -> natural scatter
            blocks = nat.reshape(by, bx, 8, 8) * qt[c["tq"]][None, None]
            spatial = (
                np.einsum("ur,yxuv,vc->yxrc", _C, blocks, _C) + 128.0
            )
            planes[c["id"]] = (
                spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
            )
        return _finish(self.frame, planes)


# ----------------------------------------------------------------- encode

# Annex K.3 typical Huffman tables (counts per code length 1..16, then
# the symbol values) — the interchange-standard tables every baseline
# encoder ships
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _encode_table(counts, symbols):
    """(length, code) per symbol for the canonical table."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def encode_jpeg_baseline(
    pixels: bytes, width: int, height: int, nch: int = 1
) -> bytes:
    """Minimal baseline encoder (gray / RGB 4:4:4, all-ones quant, Annex K
    luminance Huffman tables for every component) — the test-side twin of
    ``decode_jpeg``. All-ones quantization makes the roundtrip exact up
    to DCT coefficient rounding (uniform blocks roundtrip exactly)."""
    if nch not in (1, 3):
        raise ValueError("gray or RGB input only")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, nch
    ).astype(np.float64)
    if nch == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [img[..., 0]]

    dc_tab = _encode_table(*_DC_LUM)
    ac_tab = _encode_table(_AC_LUM_COUNTS, _AC_LUM_SYMBOLS)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: one all-ones 8-bit table, id 0
    zz_q = bytes(1 for _ in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    # SOF0
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])  # 4:4:4, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC + AC tables (class 0/1, id 0)
    for cls, (counts, symbols) in (
        (0, _DC_LUM),
        (1, (_AC_LUM_COUNTS, _AC_LUM_SYMBOLS)),
    ):
        payload = bytes([cls << 4]) + bytes(counts) + bytes(symbols)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    bh, bwd = (height + 7) // 8, (width + 7) // 8
    preds = [0] * ncomp
    for my in range(bh):
        for mx in range(bwd):
            for ci, plane in enumerate(planes):
                ys, xs = my * 8, mx * 8
                src = plane[ys:min(ys + 8, height), xs:min(xs + 8, width)]
                # edge-replicate partial blocks
                block = np.pad(
                    src,
                    ((0, 8 - src.shape[0]), (0, 8 - src.shape[1])),
                    mode="edge",
                )
                coef = _C @ (block - 128.0) @ _C.T
                q = np.rint(coef).astype(np.int64)  # quant table = 1s
                # DC
                diff = int(q[0, 0]) - preds[ci]
                preds[ci] = int(q[0, 0])
                s = _category(diff)
                length, code = dc_tab[s]
                bw.write(code, length)
                if s:
                    mag = diff if diff > 0 else diff + (1 << s) - 1
                    bw.write(mag, s)
                # AC
                zz = [int(q[rc]) for rc in _ZIGZAG[1:]]
                run = 0
                last_nz = -1
                for i, v in enumerate(zz):
                    if v:
                        last_nz = i
                for i, v in enumerate(zz):
                    if i > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        length, code = ac_tab[0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    s = _category(v)
                    length, code = ac_tab[(run << 4) | s]
                    bw.write(code, length)
                    mag = v if v > 0 else v + (1 << s) - 1
                    bw.write(mag, s)
                    run = 0
                # EOB only when the block ends BEFORE coefficient 63
                # (zz holds indices 0..62 for coefficients 1..63): a
                # nonzero final coefficient already completes the block
                if last_nz < 62:
                    length, code = ac_tab[0x00]  # EOB
                    bw.write(code, length)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
