"""Pure-stdlib Zstandard DECODER (RFC 8878).

Zstd is what large public corpora actually ship in (Common Crawl,
The Pile, most HuggingFace datasets), so the compressed-corpus seam
(compress_codec.decompress_payload) is incomplete without it. This is a
real bit-level decoder of the public format — FSE (tANS) tables incl.
the RFC's predefined distributions, 4-stream Huffman literals with
FSE-compressed weights, backward bitstreams, repeat offsets, treeless/
repeat modes across blocks — NOT a wrapper; the container ships no
python zstd binding. Decode-only by design: fixtures come from
pyarrow's bundled libzstd, which doubles as the independent ORACLE in
the tests (the VP8L lesson: a self-consistent codec pair proves
nothing, so every path here is exercised against real libzstd output
at several compression levels, with the frame's xxHash64 content
checksum verified).

Scope: single-segment and windowed frames, raw/RLE/compressed blocks,
all four literals types, all three sequence-table modes per code
(predefined / RLE / FSE / repeat), repeat-offset history with the
literal-length-0 twist, frame content checksums (xxHash64 low 32),
skippable-frame/multi-frame concatenation, and DICTIONARIES (round 10,
VERDICT r9 stretch #7): both the structured format (RFC 8878 section 5
— magic 0xEC30A437, dictionary ID, initial Huffman + OF/ML/LL FSE
tables, initial repeat offsets, content-as-history) and raw-content
dictionaries (the whole blob is history — libzstd's ZSTD_dlm auto
behavior for blobs without the magic). Oracle: the container's real
zstd CLI trains dictionaries (--train) and compresses with -D; the
tests decode those streams and require byte identity.
"""

from __future__ import annotations

import struct

from .compress_codec import xxhash32  # noqa: F401  (re-export sibling)

_ZSTD_MAGIC = 0xFD2FB528

# ---------------------------------------------------------------------------
# xxHash64 (public algorithm; zstd's content checksum = low 32 bits)

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round64(acc: int, inp: int) -> int:
    return (_rotl64((acc + inp * _P2) & _M64, 31) * _P1) & _M64


def _merge64(acc: int, val: int) -> int:
    acc ^= _round64(0, val)
    return (acc * _P1 + _P4) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            a, b, c, d = struct.unpack_from("<4Q", data, i)
            v1 = _round64(v1, a)
            v2 = _round64(v2, b)
            v3 = _round64(v3, c)
            v4 = _round64(v4, d)
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        h = _merge64(h, v1)
        h = _merge64(h, v2)
        h = _merge64(h, v3)
        h = _merge64(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = (_rotl64(h ^ _round64(0, k), 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl64(h ^ (k * _P1) & _M64, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl64(h ^ (data[i] * _P5) & _M64, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Bit streams. FSE table descriptions read FORWARD (LSB-first); Huffman
# literals and the sequences section read BACKWARD from a sentinel bit.


class ForwardBits:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for k in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("malformed zstd: FSE description overrun")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << k
            self.pos += 1
        return v

    def rewind(self, n: int) -> None:
        self.pos -= n

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class BackwardBits:
    """Reads from the end: the last byte's highest set bit is a sentinel;
    read(n) consumes the n bits just below the cursor, LSB-first order."""

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ValueError("malformed zstd: missing bitstream sentinel")
        self.data = data
        top = 8 * len(data) - 1
        while not (data[top >> 3] >> (top & 7)) & 1:
            top -= 1
        self.pos = top  # cursor ON the sentinel; reads take bits below

    def _bit(self, i: int) -> int:
        return (self.data[i >> 3] >> (i & 7)) & 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        if self.pos < 0:
            raise ValueError("malformed zstd: backward bitstream overrun")
        v = 0
        for k in range(n):
            v |= self._bit(self.pos + k) << k
        return v

    def bits_left(self) -> int:
        return self.pos


def _backward(data: bytes) -> BackwardBits:
    return BackwardBits(data)


# ---------------------------------------------------------------------------
# FSE


class FseTable:
    __slots__ = ("symbols", "nbits", "base", "log")

    def __init__(self, counts: list[int], log: int) -> None:
        size = 1 << log
        self.log = log
        self.symbols = [0] * size
        self.nbits = [0] * size
        self.base = [0] * size
        # "less than 1" symbols get one cell each from the table's end
        hi = size - 1
        for s, c in enumerate(counts):
            if c == -1:
                self.symbols[hi] = s
                self.nbits[hi] = log
                self.base[hi] = 0
                hi -= 1
        # spread the rest
        pos = 0
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        for s, c in enumerate(counts):
            if c <= 0:
                continue
            for _ in range(c):
                self.symbols[pos] = s
                pos = (pos + step) & mask
                while pos > hi:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ValueError("malformed zstd: FSE spread did not complete")
        # per-cell transitions, table order; counters start at the count
        desc = [c if c > 0 else 0 for c in counts]
        for i in range(hi + 1):
            s = self.symbols[i]
            d = desc[s]
            desc[s] += 1
            nb = log - d.bit_length() + 1
            self.nbits[i] = nb
            self.base[i] = (d << nb) - size


def fse_from_rle(symbol: int) -> FseTable:
    t = FseTable.__new__(FseTable)
    t.log = 0
    t.symbols = [symbol]
    t.nbits = [0]
    t.base = [0]
    return t


def read_fse_description(fb: ForwardBits, max_log: int) -> FseTable:
    log = fb.read(4) + 5
    if log > max_log:
        raise ValueError(f"malformed zstd: FSE accuracy log {log}")
    remaining = (1 << log) + 1
    counts: list[int] = []
    while remaining > 1 and len(counts) < 256:
        bits = (remaining).bit_length()  # floor(log2(remaining)) + 1
        val = fb.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if (val & lower_mask) < threshold:
            fb.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        proba = val - 1
        counts.append(proba)
        remaining -= -proba if proba < 0 else proba
        if proba == 0:
            while True:
                rep = fb.read(2)
                counts.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 1:
        raise ValueError("malformed zstd: FSE counts do not sum to table")
    return FseTable(counts, log)


# ---------------------------------------------------------------------------
# Huffman literals


class HufTable:
    __slots__ = ("max_bits", "table")  # table: dict[(len, code)] = symbol

    def __init__(self, weights: list[int]) -> None:
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ValueError("malformed zstd: empty Huffman weights")
        # the implied last weight completes the sum to the NEXT power of
        # two (strictly greater: the last weight is >= 1)
        max_bits = total.bit_length()
        left = (1 << max_bits) - total
        if left & (left - 1):
            raise ValueError("malformed zstd: Huffman weights not completable")
        last_w = left.bit_length()  # log2(left) + 1
        weights = weights + [last_w]
        self.max_bits = max_bits
        # num bits per symbol: max_bits + 1 - weight (weight 0 = absent);
        # canonical codes: longer codes (lower weight) first, code values
        # ascending with symbol order inside a weight class
        self.table = {}
        code = 0
        for w in range(1, max_bits + 1):
            ln = max_bits + 1 - w
            for sym, sw in enumerate(weights):
                if sw == w:
                    self.table[(ln, code >> (max_bits - ln))] = sym
                    code += 1 << (w - 1)
        if code != (1 << max_bits):
            raise ValueError("malformed zstd: Huffman weights oversubscribed")

    def decode(self, bb: BackwardBits) -> int:
        code = 0
        for ln in range(1, self.max_bits + 1):
            code = (code << 1) | bb.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("malformed zstd: invalid Huffman code")


def _read_huffman_weights(data: bytes) -> tuple[list[int], int]:
    """Returns (weights, header size consumed)."""
    if not data:
        raise ValueError("malformed zstd: missing Huffman header")
    h = data[0]
    if h >= 128:  # direct: (h - 127) weights, 4 bits each
        n = h - 127
        nbytes = (n + 1) // 2
        if len(data) < 1 + nbytes:
            raise ValueError("malformed zstd: truncated Huffman weights")
        weights = []
        for i in range(n):
            b = data[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        return weights, 1 + nbytes
    # FSE-compressed weights: h = compressed size; two interleaved states
    comp = data[1:1 + h]
    if len(comp) < h:
        raise ValueError("malformed zstd: truncated Huffman FSE weights")
    fb = ForwardBits(comp)
    table = read_fse_description(fb, 6)
    stream = comp[fb.bytes_consumed():]
    bb = _backward(stream)
    s1 = bb.read(table.log)
    s2 = bb.read(table.log)
    weights = []
    while True:
        weights.append(table.symbols[s1])
        if bb.bits_left() < table.nbits[s1]:
            # final flush: remaining states emit their symbols
            weights.append(table.symbols[s2])
            break
        s1 = table.base[s1] + bb.read(table.nbits[s1])
        weights.append(table.symbols[s2])
        if bb.bits_left() < table.nbits[s2]:
            weights.append(table.symbols[s1])
            break
        s2 = table.base[s2] + bb.read(table.nbits[s2])
        if len(weights) > 255:
            raise ValueError("malformed zstd: too many Huffman weights")
    return weights, 1 + h


# ---------------------------------------------------------------------------
# Sequences: code -> (baseline, extra bits)

_LL_BASE = (
    [(i, 0) for i in range(16)]
    + [(16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
       (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10),
       (2048, 11), (4096, 12), (8192, 13), (16384, 14), (32768, 15),
       (65536, 16)]
)
_ML_BASE = (
    [(i + 3, 0) for i in range(32)]
    + [(35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
       (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
       (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
       (32771, 15), (65539, 16)]
)

# RFC 8878 predefined distributions
_LL_DEFAULT = FseTable(
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1], 6)
_ML_DEFAULT = FseTable(
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1], 6)
_OF_DEFAULT = FseTable(
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1], 5)

_MAX_LOG = {"ll": 9, "of": 8, "ml": 9}


def _seq_table(mode: int, fb_data: bytes, off: int, kind: str, prev):
    """Returns (table, new offset). ``prev`` is the repeat-mode carry."""
    if mode == 0:
        return {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}[kind], off
    if mode == 1:  # RLE: one byte symbol
        return fse_from_rle(fb_data[off]), off + 1
    if mode == 2:
        fb = ForwardBits(fb_data[off:])
        t = read_fse_description(fb, _MAX_LOG[kind])
        return t, off + fb.bytes_consumed()
    if prev is None:
        raise ValueError("malformed zstd: repeat mode with no previous table")
    return prev, off


# ---------------------------------------------------------------------------
# Dictionaries (RFC 8878 section 5)

_DICT_MAGIC = 0xEC30A437


class ZstdDict:
    """A parsed decoding dictionary.

    Structured dictionaries (magic 0xEC30A437, what ``zstd --train``
    emits) carry a dictionary ID, INITIAL entropy tables — one Huffman
    literals table plus FSE tables in stored order offsets, match
    lengths, literals lengths (they serve the first block's treeless /
    repeat modes) — three initial repeat offsets replacing {1, 4, 8},
    and content that acts as the history window preceding the frame.
    A blob without the magic is a raw-content dictionary: all content,
    no ID, no tables (libzstd's auto/raw-content load mode)."""

    __slots__ = ("dict_id", "huf", "ll", "of", "ml", "rep", "content")

    def __init__(self, data: bytes) -> None:
        if len(data) >= 8 and struct.unpack_from("<I", data)[0] == _DICT_MAGIC:
            self.dict_id = struct.unpack_from("<I", data, 4)[0]
            weights, consumed = _read_huffman_weights(data[8:])
            self.huf = HufTable(weights)
            pos = 8 + consumed
            tables = {}
            for kind in ("of", "ml", "ll"):  # stored order per RFC 8878 §5
                fb = ForwardBits(data[pos:])
                tables[kind] = read_fse_description(fb, _MAX_LOG[kind])
                pos += fb.bytes_consumed()
            self.of, self.ml, self.ll = tables["of"], tables["ml"], tables["ll"]
            if pos + 12 > len(data):
                raise ValueError("malformed zstd dictionary: missing offsets")
            self.rep = list(struct.unpack_from("<3I", data, pos))
            pos += 12
            self.content = data[pos:]
            for r in self.rep:
                if r == 0 or r > len(self.content):
                    raise ValueError(
                        "malformed zstd dictionary: repeat offset out of range"
                    )
        else:
            self.dict_id = 0
            self.huf = self.ll = self.of = self.ml = None
            self.rep = [1, 4, 8]
            self.content = data


# ---------------------------------------------------------------------------
# Block and frame decoding


class _Ctx:
    """Cross-block state: huffman table + sequence tables + rep offsets.

    A dictionary seeds the state: its entropy tables serve the first
    block's treeless-literals / repeat-mode references and its repeat
    offsets replace the {1, 4, 8} defaults (RFC 8878 §5)."""

    def __init__(self, zdict: ZstdDict | None = None) -> None:
        if zdict is None:
            self.huf: HufTable | None = None
            self.ll = None
            self.of = None
            self.ml = None
            self.rep = [1, 4, 8]
        else:
            self.huf = zdict.huf
            self.ll = zdict.ll
            self.of = zdict.of
            self.ml = zdict.ml
            self.rep = list(zdict.rep)


def _decode_literals(block: bytes, ctx: _Ctx) -> tuple[bytes, int]:
    """Returns (literals, bytes consumed from block)."""
    h0 = block[0]
    ltype = h0 & 0x03
    sf = (h0 >> 2) & 0x03
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):  # 1-byte header, 5-bit size (sf bit0 only)
            size = h0 >> 3
            hdr = 1
        elif sf == 1:
            size = (h0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            size = (h0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if ltype == 0:
            return block[hdr:hdr + size], hdr + size
        return block[hdr:hdr + 1] * size, hdr + 1
    # compressed (2) or treeless (3)
    if sf == 0:
        n_streams = 1
        regen = (h0 >> 4) | ((block[1] & 0x3F) << 4)
        comp = (block[1] >> 6) | (block[2] << 2)
        hdr = 3
    elif sf == 1:
        n_streams = 4
        regen = (h0 >> 4) | ((block[1] & 0x3F) << 4)
        comp = (block[1] >> 6) | (block[2] << 2)
        hdr = 3
    elif sf == 2:
        n_streams = 4
        regen = (h0 >> 4) | (block[1] << 4) | ((block[2] & 0x03) << 12)
        comp = (block[2] >> 2) | (block[3] << 6)
        hdr = 4
    else:
        n_streams = 4
        regen = (h0 >> 4) | (block[1] << 4) | ((block[2] & 0x3F) << 12)
        comp = (block[2] >> 6) | (block[3] << 2) | (block[4] << 10)
        hdr = 5
    body = block[hdr:hdr + comp]
    if len(body) < comp:
        raise ValueError("malformed zstd: truncated literals")
    pos = 0
    if ltype == 2:
        weights, consumed = _read_huffman_weights(body)
        ctx.huf = HufTable(weights)
        pos = consumed
    if ctx.huf is None:
        raise ValueError("malformed zstd: treeless literals with no table")
    huf = ctx.huf
    out = bytearray()
    if n_streams == 1:
        bb = _backward(body[pos:])
        for _ in range(regen):
            out.append(huf.decode(bb))
    else:
        sz1, sz2, sz3 = struct.unpack_from("<3H", body, pos)
        pos += 6
        splits = [sz1, sz2, sz3, len(body) - pos - sz1 - sz2 - sz3]
        r13 = (regen + 3) // 4
        sizes_out = [r13, r13, r13, regen - 3 * r13]
        for k in range(4):
            stream = body[pos:pos + splits[k]]
            pos += splits[k]
            bb = _backward(stream)
            for _ in range(sizes_out[k]):
                out.append(huf.decode(bb))
    if len(out) != regen:
        raise ValueError("malformed zstd: literals size mismatch")
    return bytes(out), hdr + comp


def _decode_block(block: bytes, out: bytearray, ctx: _Ctx) -> None:
    literals, consumed = _decode_literals(block, ctx)
    rest = block[consumed:]
    if not rest:
        raise ValueError("malformed zstd: missing sequences section")
    b0 = rest[0]
    if b0 < 128:
        n_seq = b0
        spos = 1
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) | rest[1]
        spos = 2
    else:
        # RFC 8878 §3.1.1.3.2.1: long form is byte1 + (byte2<<8) + 0x7F00.
        # Addition, not OR — (byte2<<8) overlaps the set bits of 0x7F00,
        # so OR mis-decodes any count >= 32768 (e.g. 40000 -> 32576).
        n_seq = rest[1] + (rest[2] << 8) + 0x7F00
        spos = 3
    if n_seq == 0:
        out += literals
        return
    modes = rest[spos]
    spos += 1
    if modes & 0x03:
        raise ValueError("malformed zstd: reserved sequence mode bits")
    ll_mode = (modes >> 6) & 0x03
    of_mode = (modes >> 4) & 0x03
    ml_mode = (modes >> 2) & 0x03
    ctx.ll, spos = _seq_table(ll_mode, rest, spos, "ll", ctx.ll)
    ctx.of, spos = _seq_table(of_mode, rest, spos, "of", ctx.of)
    ctx.ml, spos = _seq_table(ml_mode, rest, spos, "ml", ctx.ml)
    bb = _backward(rest[spos:])
    ll_t, of_t, ml_t = ctx.ll, ctx.of, ctx.ml
    ll_s = bb.read(ll_t.log)
    of_s = bb.read(of_t.log)
    ml_s = bb.read(ml_t.log)
    lit_pos = 0
    rep = ctx.rep
    for seq_i in range(n_seq):
        of_code = of_t.symbols[of_s]
        ml_code = ml_t.symbols[ml_s]
        ll_code = ll_t.symbols[ll_s]
        offset_value = (1 << of_code) + bb.read(of_code)
        ml_base, ml_bits = _ML_BASE[ml_code]
        ml = ml_base + bb.read(ml_bits)
        ll_base, ll_bits = _LL_BASE[ll_code]
        ll = ll_base + bb.read(ll_bits)
        # repeat-offset resolution
        if offset_value > 3:
            offset = offset_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("malformed zstd: zero repeat offset")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        out += literals[lit_pos:lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("malformed zstd: match beyond window")
        for _ in range(ml):
            out.append(out[-offset])
        if seq_i != n_seq - 1:
            ll_s = ll_t.base[ll_s] + bb.read(ll_t.nbits[ll_s])
            ml_s = ml_t.base[ml_s] + bb.read(ml_t.nbits[ml_s])
            of_s = of_t.base[of_s] + bb.read(of_t.nbits[of_s])
    out += literals[lit_pos:]


def _decode_frame(
    data: bytes, pos: int, zdict: ZstdDict | None = None
) -> tuple[bytes, int]:
    """Decode one zstd frame starting at ``pos``; returns (payload, end)."""
    fhd = data[pos + 4]
    did_size = (0, 1, 2, 4)[fhd & 0x03]
    has_checksum = bool(fhd & 0x04)
    if fhd & 0x08:
        raise ValueError("malformed zstd: reserved frame-header bit")
    single = bool(fhd & 0x20)
    fcs_flag = fhd >> 6
    pos += 5
    if not single:
        pos += 1  # window descriptor (bounds unchecked: we buffer fully)
    if did_size:
        did = int.from_bytes(data[pos:pos + did_size], "little")
        if did:
            if zdict is None:
                raise ValueError(
                    f"zstd frame requires dictionary id {did}; pass "
                    "decode_zstd(..., dictionary=...)"
                )
            # raw-content dicts carry no id (0) — libzstd accepts them
            # for any frame; a structured dict must match the frame's id
            if zdict.dict_id and zdict.dict_id != did:
                raise ValueError(
                    f"zstd dictionary mismatch: frame wants id {did}, "
                    f"dictionary is id {zdict.dict_id}"
                )
        pos += did_size
    fcs = None
    if fcs_flag == 0:
        if single:
            fcs = data[pos]
            pos += 1
    elif fcs_flag == 1:
        fcs = struct.unpack_from("<H", data, pos)[0] + 256
        pos += 2
    elif fcs_flag == 2:
        fcs = struct.unpack_from("<I", data, pos)[0]
        pos += 4
    else:
        fcs = struct.unpack_from("<Q", data, pos)[0]
        pos += 8
    # Dictionary content is the "past" of the frame: prefix the output
    # window so matches can reach into it (offset checks and out[-offset]
    # copies then work unchanged), and strip it before returning.
    hist = len(zdict.content) if zdict is not None else 0
    out = bytearray(zdict.content) if zdict is not None else bytearray()
    ctx = _Ctx(zdict)
    while True:
        if pos + 3 > len(data):
            raise ValueError("malformed zstd: truncated block header")
        bh = int.from_bytes(data[pos:pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 0x03
        bsize = bh >> 3
        if btype == 0:  # raw
            out += data[pos:pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            out += data[pos:pos + 1] * bsize
            pos += 1
        elif btype == 2:
            _decode_block(data[pos:pos + bsize], out, ctx)
            pos += bsize
        else:
            raise ValueError("malformed zstd: reserved block type")
        if last:
            break
    payload = bytes(out[hist:])
    if has_checksum:
        (cc,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if cc != (xxhash64(payload) & 0xFFFFFFFF):
            raise ValueError("malformed zstd: content checksum mismatch")
    if fcs is not None and len(payload) != fcs:
        raise ValueError("malformed zstd: content size mismatch")
    return payload, pos


def decode_zstd(data: bytes, dictionary: bytes | None = None) -> bytes:
    """Decode a Zstandard payload to its exact original bytes. Real .zst
    files are frame SEQUENCES (RFC 8878 section 3: concatenated frames
    decode to the concatenation, skippable frames are ignored), so this
    loops frames until the input is exhausted. ``dictionary`` is a raw
    dictionary blob — structured (``zstd --train`` output, RFC 8878 §5)
    or raw-content — applied to every frame (libzstd semantics: a
    provided dictionary is used whether or not the frame names an id; a
    frame naming an id without a dictionary fails loud)."""
    zdict = ZstdDict(dictionary) if dictionary is not None else None
    if len(data) < 4:
        raise ValueError("malformed zstd: bad magic")
    (magic0,) = struct.unpack_from("<I", data, 0)
    if magic0 != _ZSTD_MAGIC and not 0x184D2A50 <= magic0 <= 0x184D2A5F:
        raise ValueError("malformed zstd: bad magic")
    out = bytearray()
    pos = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("malformed zstd: trailing garbage")
        (magic,) = struct.unpack_from("<I", data, pos)
        if magic == _ZSTD_MAGIC:
            try:
                payload, pos = _decode_frame(data, pos, zdict)
            except (struct.error, IndexError) as exc:
                # corruption backstop: the frame decoder's bit-level
                # machinery (FSE tables, sequences, Huffman streams)
                # indexes per format-declared offsets; corrupt or
                # truncated input can push any of them past the buffer.
                # Surface the module's ValueError convention instead of
                # a bare struct.error/IndexError — valid-stream
                # correctness is pinned by the libzstd oracle sweeps,
                # so anything landing here is malformed input.
                raise ValueError(
                    "malformed zstd: truncated or corrupt frame"
                ) from exc
            out += payload
        elif 0x184D2A50 <= magic <= 0x184D2A5F:  # skippable frame
            if pos + 8 > len(data):
                raise ValueError(
                    "malformed zstd: truncated skippable header")
            (skip,) = struct.unpack_from("<I", data, pos + 4)
            if pos + 8 + skip > len(data):
                raise ValueError(
                    "malformed zstd: truncated skippable frame")
            pos += 8 + skip
        else:
            raise ValueError("malformed zstd: bad frame magic mid-stream")
    return bytes(out)
