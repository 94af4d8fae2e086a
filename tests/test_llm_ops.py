"""Behavioral checks for the LLM-data operators: the synthesized
duplicates/mutants/clones must actually be FOUND (the oracle diff alone
would pass on an empty-vs-empty result)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL


def _q(name):
    return entrymod.queries()[name]


def test_exact_dedup_finds_injected_copies(spark):
    rows = _q("d1_dedup_exact")(spark, SF_SMALL).collect()
    dup_groups = {r["canonical_id"] for r in rows if r["n_copies"] > 1}
    assert dup_groups, "injected exact copies not detected"
    # every injected copy (doc_id >= 2e6) maps back to its original
    for r in rows:
        if r["doc_id"] >= 2_000_000:
            assert r["canonical_id"] == r["doc_id"] - 2_000_000
            assert r["n_copies"] >= 2


def test_jaccard_finds_mutants(spark):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in _q("d2_neardup_jaccard")(spark, SF_SMALL).collect()
    }
    mutant_pairs = [(a, b) for a, b in pairs if b == a + 1_000_000]
    assert mutant_pairs, "one-token mutants not detected by 3-gram jaccard"


def test_minhash_lsh_agrees_with_exact_on_mutants(spark):
    mh = {
        (r["doc_a"], r["doc_b"]): r["est_similarity"]
        for r in _q("d2_minhash_lsh")(spark, SF_SMALL).collect()
    }
    exact_dups = [(a, b) for a, b in mh if b == a + 2_000_000]
    assert exact_dups and all(mh[p] == 1.0 for p in exact_dups)


def test_simhash_finds_exact_and_near(spark):
    rows = _q("d2_simhash")(spark, SF_SMALL).collect()
    by_pair = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    exact = [(a, b) for a, b in by_pair if b == a + 2_000_000]
    assert exact and all(by_pair[p] == 0 for p in exact)


def test_ann_topk_ranks_clone_first(spark):
    rows = _q("d3_embedding_neardup")(spark, SF_SMALL).collect()
    clone_pairs = [r for r in rows if r["vec_b"] == r["vec_a"] + 100_000]
    assert clone_pairs, "blended clones not found above cosine 0.9"
    assert all(r["cosine"] >= 0.9 for r in rows)


def test_ann_bruteforce_shapes(spark):
    rows = _q("d3_ann_bruteforce_topk")(spark, SF_SMALL).collect()
    per_query = {}
    for r in rows:
        per_query.setdefault(r["query_id"], []).append(r["rnk"])
    assert per_query
    for ranks in per_query.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_multimodal_meta_is_deterministic_and_batched(spark):
    a = {tuple(r) for r in _q("dmm_binary_decode_meta")(spark, SF_SMALL).collect()}
    b = {tuple(r) for r in _q("dmm_binary_decode_meta")(spark, SF_SMALL).collect()}
    assert a == b and len(a) > 0
    import pytest

    from bigdatainvesttink_spark.operators.multimodal import decode_image

    # lossy VP8 and still VP8X decode for real since round 10, so a
    # garbage VP8 chunk and a truncated VP8X header both fail loud as
    # MALFORMED; only ANIMATED VP8X keeps a NotImplementedError
    with pytest.raises(ValueError, match="truncated|malformed"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 webp-ish")
    with pytest.raises(ValueError, match="10 bytes"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8X\x00\x00\x00\x00")
    anim = (b"RIFF\x00\x00\x00\x00WEBPVP8X\x0a\x00\x00\x00"
            b"\x02\x00\x00\x00" + b"\x0f\x00\x00\x0f\x00\x00")
    with pytest.raises(NotImplementedError, match="animated|ANIM"):
        decode_image(anim)


def test_png_decode_roundtrip_through_seam(spark):
    """VERDICT r4 stretch ask #7: a REAL image codec through the same
    pluggable mapInPandas seam as the WAV proof — synthetic RGB/RGBA/gray
    pixels, encoded with the stdlib-zlib PNG writer, decoded back
    sample-exactly by decode_image inside extract_meta; filters 0-4 are
    exercised via a second pass that re-filters with Sub/Up."""
    from bigdatainvesttink_spark.operators.multimodal import (
        IMAGE_META_SCHEMA,
        decode_image,
        encode_png,
        extract_meta,
    )

    specs = [(1, 16, 8, 3), (2, 7, 5, 4), (3, 20, 3, 1)]
    payloads = []
    want = {}
    for i, w, h, nch in specs:
        px = bytes((x * 31 + i * 7) % 256 for x in range(w * h * nch))
        want[i] = (px, w, h)
        payloads.append((i, encode_png(px, w, h, nch)))
    df = spark.createDataFrame(payloads, "doc_id long, content binary")
    got = {
        r["doc_id"]: r
        for r in extract_meta(
            df, decoder=decode_image, schema=IMAGE_META_SCHEMA
        ).collect()
    }
    for i, w, h, nch in specs:
        r = got[i]
        assert (r["width"], r["height"], r["fmt"]) == (w, h, "png")
        assert bytes(r["decoded_pixels"]) == want[i][0]  # sample-exact

    # per-scanline filters 1 (Sub) and 2 (Up) unfilter correctly too:
    # hand-build a filtered IDAT and compare against the filter-0 decode
    import struct
    import zlib

    w, h, nch = 5, 4, 3
    px = bytes((x * 17 + 3) % 256 for x in range(w * h * nch))
    base = decode_image(encode_png(px, w, h, nch))
    stride = w * nch
    lines = [bytearray(px[y * stride:(y + 1) * stride]) for y in range(h)]
    raw = bytearray()
    prev = bytearray(stride)
    for y, line in enumerate(lines):
        ft = 1 if y % 2 == 0 else 2
        raw.append(ft)
        for x in range(stride):
            a = line[x - nch] if x >= nch else 0
            raw.append((line[x] - (a if ft == 1 else prev[x])) & 0xFF)
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    filtered_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert decode_image(filtered_png)["decoded_pixels"] == base[
        "decoded_pixels"
    ]

    # nonzero compression/filter-method headers must raise the documented
    # NotImplementedError (ADVICE r5 #2); interlace=1 is REAL since r8
    # (Adam7 roundtrip + libpng cross-check below/in the libpng test)
    import pytest

    for comp, fm, il in ((1, 0, 0), (0, 1, 0), (0, 0, 2)):
        bad = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(
                b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, comp, fm, il)
            )
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            decode_image(bad)

    # Adam7 self-roundtrip through the pure-Python pair (the libpng
    # cross-validation lives in test_png_path_cross_validated_vs_libpng)
    for aw, ah, anc in ((5, 4, 3), (16, 16, 1), (11, 2, 4)):
        apx = bytes((x * 29 + 5) % 256 for x in range(aw * ah * anc))
        m7 = decode_image(encode_png(apx, aw, ah, anc, interlace=True))
        assert (m7["width"], m7["height"]) == (aw, ah)
        assert bytes(m7["decoded_pixels"]) == apx


def test_jpeg_decode_roundtrip_through_seam(spark):
    """VERDICT r5 stretch #7: baseline sequential JPEG (T.81 Huffman +
    IDCT, stdlib + numpy — jpeg_codec.py) through the same pluggable
    mapInPandas seam as the WAV/PNG proofs. All-ones quantization makes
    the roundtrip exact up to DCT rounding: uniform images roundtrip
    EXACTLY, arbitrary content within 1 LSB per sample."""
    import numpy as np

    from bigdatainvesttink_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_baseline,
    )
    from bigdatainvesttink_spark.operators.multimodal import (
        IMAGE_META_SCHEMA,
        decode_image,
        extract_meta,
    )

    specs = [
        # (doc_id, w, h, nch, pixel generator)
        (1, 24, 17, 1, lambda x, y, c: (x * 7 + y * 13) % 256),
        (2, 16, 8, 3, lambda x, y, c: (x * 31 + y * 17 + c * 5) % 256),
        (3, 8, 8, 1, lambda x, y, c: 77),  # uniform: exact
    ]
    payloads, want = [], {}
    for i, w, h, nch, gen in specs:
        px = bytes(
            gen(x, y, c)
            for y in range(h)
            for x in range(w)
            for c in range(nch)
        )
        want[i] = (px, w, h)
        payloads.append((i, encode_jpeg_baseline(px, w, h, nch)))
    df = spark.createDataFrame(payloads, "doc_id long, content binary")
    got = {
        r["doc_id"]: r
        for r in extract_meta(
            df, decoder=decode_image, schema=IMAGE_META_SCHEMA
        ).collect()
    }
    for i, w, h, nch, _ in specs:
        r = got[i]
        assert (r["width"], r["height"], r["fmt"]) == (w, h, "jpeg")
        a = np.frombuffer(want[i][0], np.uint8).astype(int)
        b = np.frombuffer(bytes(r["decoded_pixels"]), np.uint8).astype(int)
        assert np.abs(a - b).max() <= 1  # DCT-rounding bound
    a3 = np.frombuffer(want[3][0], np.uint8)
    b3 = np.frombuffer(bytes(got[3]["decoded_pixels"]), np.uint8)
    assert np.array_equal(a3, b3)  # uniform image: sample-exact

    # SOF2 is REAL since r8 (cross-validated vs libjpeg's progressive
    # encoder in test_jpeg_codec_cross_validated_vs_libjpeg) — but a
    # baseline stream MISLABELED as SOF2 must still fail loud, because
    # its full-band interleaved scan (Ss=0, Se=63) is illegal in
    # progressive mode (T.81 G.1: a DC scan has Se=0)
    import pytest

    base = payloads[0][1]
    k = base.find(b"\xff\xc0")
    prog = base[:k] + b"\xff\xc2" + base[k + 2:]
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(prog)


def test_jpeg_marker_fill_bytes_and_partial_scan(spark):
    """External baseline JPEGs exercise two T.81 legalities the test
    encoder never emits (ADVICE r6): (a) repeated 0xFF FILL bytes before
    a marker must be skipped, not parsed as a bogus segment; (b) an SOS
    naming fewer components than the frame (progressive-style partial
    scan) must raise the documented subset NotImplementedError, not a
    KeyError deep in the MCU loop."""
    import pytest

    from bigdatainvesttink_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    px = bytes((x * 7 + y * 13) % 256 for y in range(9) for x in range(11))
    base = encode_jpeg_baseline(px, 11, 9, 1)
    want = decode_jpeg(base)

    # (a) pad every metadata marker with fill bytes: insert 0xFF before
    # the DQT, DHT, SOF0 and SOS markers
    padded = base
    for m in (b"\xff\xdb", b"\xff\xc4", b"\xff\xc0", b"\xff\xda"):
        k = padded.find(m)
        assert k > 0, f"marker {m!r} not found in test stream"
        padded = padded[:k] + b"\xff\xff" + padded[k:]
    got = decode_jpeg(padded)
    assert got["pixels"] == want["pixels"]
    assert (got["width"], got["height"]) == (want["width"], want["height"])

    # (b) SOS naming fewer components than the frame
    rgb = bytes(
        (x * 3 + y * 5 + c) % 256
        for y in range(8)
        for x in range(8)
        for c in range(3)
    )
    stream = encode_jpeg_baseline(rgb, 8, 8, 3)
    k = stream.find(b"\xff\xda")
    ns_at = k + 4  # marker(2) + seglen(2) -> ns byte
    partial = stream[:ns_at] + b"\x01" + stream[ns_at + 1:]
    with pytest.raises(NotImplementedError, match="scan"):
        decode_jpeg(partial)


def test_compression_ratio_orders_quality(spark):
    """zlib ratio must (a) be reproducible, (b) rate repeated text far
    below unique prose — the property the quality gate relies on."""
    from bigdatainvesttink_spark.operators.textops import compression_ratio

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 50),
        (2, " ".join(f"unique{i}word{i * 7919 % 10007}" for i in range(400))),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert got[1].ratio < 0.1            # pure repetition crushes
    assert got[2].ratio > 0.25           # unique tokens resist
    assert got[1].ratio < got[2].ratio
    assert got[3].n_compressed > 0       # empty doc: defined, no div0
    # determinism
    again = {r.doc_id: r.ratio for r in compression_ratio(df).collect()}
    assert {k: v.ratio for k, v in got.items()} == again


def test_real_wav_codec_through_mapinpandas_harness(spark):
    """The codec seam is genuinely pluggable (VERDICT r3 ask #7): synthesize
    real PCM WAV bytes with stdlib wave, push them through the SAME
    extract_meta mapInPandas harness the fake decoder uses, and check the
    decoded header fields against what was written."""
    import io
    import wave

    from bigdatainvesttink_spark.operators.multimodal import (
        AUDIO_META_SCHEMA,
        decode_audio,
        extract_meta,
    )

    specs = [  # (doc_id, n_channels, sample_width, frame_rate, n_frames)
        (1, 1, 2, 8000, 8000),   # 1s mono 16-bit
        (2, 2, 2, 44100, 4410),  # 100ms stereo CD-rate
        (3, 1, 1, 16000, 400),   # 25ms mono 8-bit
    ]

    def make_wav(ch, width, rate, frames):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(bytes(frames * ch * width))
        return buf.getvalue()

    payloads = [(i, make_wav(ch, sw, fr, nf)) for i, ch, sw, fr, nf in specs]
    df = spark.createDataFrame(payloads, "doc_id long, content binary")
    got = {
        r["doc_id"]: r
        for r in extract_meta(
            df, decoder=decode_audio, schema=AUDIO_META_SCHEMA
        ).collect()
    }
    for i, ch, sw, fr, nf in specs:
        r = got[i]
        assert (r["n_channels"], r["sample_width"], r["frame_rate"],
                r["n_frames"]) == (ch, sw, fr, nf)
        assert r["duration_ms"] == nf * 1000 // fr
        assert r["fmt"] == "wav" and r["n_bytes"] > nf * ch * sw
    # non-WAV bytes keep the documented raise, same as decode_image
    import pytest

    with pytest.raises(NotImplementedError):
        decode_audio(b"\x89PNG not audio")


def test_real_flac_codec_through_mapinpandas_harness(spark):
    """VERDICT r6 stretch #8: FLAC through the same pluggable seam as the
    WAV/PNG/JPEG proofs. FLAC is lossless, so the roundtrip assertion is
    SAMPLE-EXACT (stronger than JPEG's 1-LSB bound); the bitstream is
    decoded for real — Rice residuals, FIXED/LPC prediction, stereo
    decorrelation, CRC-8/CRC-16 verified (flac_codec.py)."""
    import math

    import numpy as np
    import pytest

    from bigdatainvesttink_spark.operators.flac_codec import (
        decode_flac,
        encode_flac,
    )
    from bigdatainvesttink_spark.operators.multimodal import (
        AUDIO_META_SCHEMA,
        decode_audio,
        extract_meta,
    )

    mono = [int(500 * math.sin(i / 9)) + (i * 13 % 37) for i in range(3001)]
    stereo = []
    for i in range(2000):
        left = int(1000 * math.sin(i / 20)) + (i % 7)
        stereo += [left, left - (i % 13) + 5]
    specs = [  # (doc_id, samples, rate, nch, bps, block, mode, predictor)
        (1, mono, 8000, 1, 16, 256, "left_side", "fixed2"),
        (2, stereo, 44100 % 65536, 2, 16, 192, "mid_side", "lpc1"),
        (3, [(i * 11 % 200) - 100 for i in range(500)], 16000, 1, 8, 64,
         "left_side", "fixed2"),
    ]
    payloads, want = [], {}
    for i, xs, rate, nch, bps, blk, mode, pred in specs:
        enc = encode_flac(xs, rate, nch, bps=bps, block_size=blk,
                          stereo_mode=mode, predictor=pred)
        assert len(enc) < 2 * len(xs) * bps // 8, "no compression happened"
        # bit-level lossless roundtrip, all samples
        assert np.array_equal(decode_flac(enc)["samples"], np.array(xs))
        want[i] = (nch, bps // 8, rate, len(xs) // nch)
        payloads.append((i, enc))
    df = spark.createDataFrame(payloads, "doc_id long, content binary")
    got = {
        r["doc_id"]: r
        for r in extract_meta(
            df, decoder=decode_audio, schema=AUDIO_META_SCHEMA
        ).collect()
    }
    for i, *_ in specs:
        r = got[i]
        nch, sw, rate, nframes = want[i]
        assert (r["n_channels"], r["sample_width"], r["frame_rate"],
                r["n_frames"]) == (nch, sw, rate, nframes)
        assert r["fmt"] == "flac"
        assert r["duration_ms"] == nframes * 1000 // rate
    # a corrupted frame fails CRC loudly, never silent garbage
    bad = bytearray(payloads[0][1])
    bad[len(bad) // 2] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    # MP3 keeps the documented raise
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfb\x90\x00 not decodable")


def test_gif_animated_decode_through_seam(spark):
    """Round-7 codec-seam retirement (VERDICT r6 stretch #8 family):
    real GIF89a decode (stdlib LZW + disposal/transparency frame
    composition — gif_codec.py) through the same pluggable mapInPandas
    seam as the WAV/PNG/JPEG/FLAC proofs. GIF is palette-lossless, so
    unlike JPEG the roundtrip asserts BYTE equality — and it is the
    first format whose n_frames is a real decoded animation length."""
    import numpy as np
    import pytest

    from bigdatainvesttink_spark.operators.gif_codec import (
        decode_gif,
        encode_gif,
    )
    from bigdatainvesttink_spark.operators.multimodal import (
        IMAGE_META_SCHEMA,
        decode_image,
        extract_meta,
    )

    rng = np.random.default_rng(42)
    specs = [
        # (doc_id, w, h, n_colors, n_frames, interlace)
        (1, 24, 17, 8, 1, False),
        (2, 16, 12, 4, 5, False),  # animated: n_frames must be REAL
        (3, 40, 33, 256, 2, True),  # full palette + interlaced rows
    ]
    payloads, want = [], {}
    for i, w, h, nc, nf, il in specs:
        pal = bytes(rng.integers(0, 256, nc * 3, dtype=np.uint8))
        depth = 1
        while (1 << depth) < nc:
            depth += 1
        padded = pal + b"\x00" * ((1 << depth) * 3 - len(pal))
        frames = [
            bytes(rng.integers(0, nc, w * h, dtype=np.uint8))
            for _ in range(nf)
        ]
        rgb0 = b"".join(padded[j * 3:j * 3 + 3] for j in frames[0])
        want[i] = (w, h, nf, rgb0)
        payloads.append(
            (i, encode_gif(frames, w, h, pal, interlace=il))
        )
    df = spark.createDataFrame(payloads, "doc_id long, content binary")
    got = {
        r["doc_id"]: r
        for r in extract_meta(
            df, decoder=decode_image, schema=IMAGE_META_SCHEMA
        ).collect()
    }
    for i, *_ in specs:
        w, h, nf, rgb0 = want[i]
        r = got[i]
        assert (r["width"], r["height"], r["n_frames"], r["fmt"]) == (
            w, h, nf, "gif",
        )
        assert bytes(r["decoded_pixels"]) == rgb0  # palette-lossless

    # transparency composites over the PREVIOUS frame, not the palette's
    # transparent entry (frame 2's transparent half shows frame 1)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    f1 = bytes([0]) * 24
    f2 = bytes([3 if j < 12 else 1 for j in range(24)])
    d = decode_gif(encode_gif([f1, f2], 6, 4, pal, transparent=3))
    assert d["frames"][1][:36] == bytes([255, 0, 0]) * 12
    assert d["frames"][1][36:] == bytes([0, 255, 0]) * 12

    # malformed inputs fail loudly, never silent garbage
    ok = payloads[0][1]
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"GIF99a" + ok[6:])
    with pytest.raises(ValueError, match="sub-blocks|truncated|short"):
        decode_gif(ok[: len(ok) // 2])
    # a truncated lossy-WebP chunk fails loud through the seam (real
    # decode since round 10 — the old NotImplementedError is retired)
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def _libwebp():
    """The container's libwebp, used ONLY as a test oracle (the product
    decode path is the pure-Python webp_codec); None if unavailable."""
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    return lib


def test_webp_lossless_decode_through_seam(spark):
    """Round-7 retirement of the LAST image-format guard: real VP8L
    (WebP-lossless) decode — canonical prefix codes, LZ77, color cache,
    all four transforms — through the same pluggable mapInPandas seam as
    the WAV/PNG/JPEG/FLAC/GIF proofs. VP8L is lossless, so the roundtrip
    asserts BYTE equality of the RGBA samples."""
    import numpy as np
    import pytest

    from bigdatainvesttink_spark.operators.multimodal import (
        IMAGE_META_SCHEMA,
        decode_image,
        extract_meta,
    )
    from bigdatainvesttink_spark.operators.webp_codec import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(7)
    specs = [
        # (doc_id, w, h, encode kwargs)
        (1, 24, 17, {}),
        (2, 16, 9, {"subtract_green": True}),
        (3, 21, 6, {"palette": True}),   # few colors -> packed indices
        (4, 30, 20, {"palette": True}),  # 200 colors -> 8-bit indices
    ]
    payloads, want = [], {}
    for i, w, h, kw in specs:
        if kw.get("palette"):
            nc = 4 if w == 21 else 200
            pal = rng.integers(0, 256, (nc, 4), dtype=np.uint8)
            rgba = pal[rng.integers(0, nc, w * h)].tobytes()
        else:
            rgba = bytes(rng.integers(0, 256, w * h * 4, dtype=np.uint8))
        want[i] = (w, h, rgba)
        payloads.append((i, encode_webp_lossless(rgba, w, h, **kw)))
    df = spark.createDataFrame(payloads, "doc_id long, content binary")
    got = {
        r["doc_id"]: r
        for r in extract_meta(
            df, decoder=decode_image, schema=IMAGE_META_SCHEMA
        ).collect()
    }
    for i, *_ in specs:
        w, h, rgba = want[i]
        r = got[i]
        assert (r["width"], r["height"], r["fmt"]) == (w, h, "webp")
        assert bytes(r["decoded_pixels"]) == rgba  # lossless

    # lossy VP8 routes to vp8_codec (real decode since round 10); the
    # VP8L entry point redirects loudly. Malformed fails loudly too.
    with pytest.raises(ValueError, match="decode_webp_lossy"):
        decode_webp_lossless(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises(ValueError, match="RIFF|signature"):
        decode_webp_lossless(b"RIFX" + payloads[0][1][4:])
    ok = payloads[0][1]
    with pytest.raises(ValueError):
        decode_webp_lossless(ok[: len(ok) - len(ok) // 3])


def test_webp_codec_bit_exact_vs_libwebp():
    """Cross-validation against the system libwebp via ctypes (test
    oracle only): (a) this encoder's streams decode EXACTLY in libwebp;
    (b) libwebp-encoded streams — which exercise the predictor (incl.
    the Select tie-break), cross-color, meta-group, LZ77 and color-cache
    paths this encoder never emits — decode EXACTLY in this decoder.
    Skipped when the shared library is absent."""
    import ctypes
    import math
    import random as _random

    import pytest

    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 not available in this environment")

    from bigdatainvesttink_spark.operators.webp_codec import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    def ref_decode(data):
        w, h = ctypes.c_int(), ctypes.c_int()
        p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
        assert p, "libwebp refused a stream"
        out = bytes(
            bytearray(
                ctypes.cast(
                    p, ctypes.POINTER(ctypes.c_uint8 * (w.value * h.value * 4))
                ).contents
            )
        )
        lib.WebPFree(p)
        return w.value, h.value, out

    def ref_encode(rgba, w, h):
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
        assert n
        e = bytes(
            bytearray(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents)
        )
        lib.WebPFree(out)
        return e

    rnd = _random.Random(99)
    # (a) my encoder -> libwebp decoder (opaque alpha: libwebp's default
    # non-exact mode may rewrite RGB under alpha=0, by design)
    for w, h, kw in [(7, 5, {}), (32, 17, {}), (16, 9, {"subtract_green": True})]:
        rgba = bytes(
            rnd.randrange(256) if i % 4 != 3 else 255 for i in range(w * h * 4)
        )
        assert ref_decode(encode_webp_lossless(rgba, w, h, **kw)) == (w, h, rgba)
    # (b) libwebp encoder -> my decoder, over content classes that pull
    # in every decode path: noise (palette/normal codes), smooth photo
    # (predictor + cross-color + meta groups), color scatter (cache)
    cases = []
    for side in (8, 32, 48):
        cases.append(
            (side, side,
             bytes(rnd.randrange(256) if i % 4 != 3 else 255
                   for i in range(side * side * 4)))
        )
    w, h = 320, 200
    photo = bytearray()
    for y in range(h):
        for x in range(w):
            photo += bytes([
                int(127 + 100 * math.sin(x / 23) + rnd.randrange(40)) & 255,
                int(127 + 100 * math.sin(y / 17) + rnd.randrange(40)) & 255,
                int(127 + 100 * math.cos((x - y) / 29)) & 255,
                255,
            ])
    cases.append((w, h, bytes(photo)))
    colors = [bytes([rnd.randrange(256), rnd.randrange(256),
                     rnd.randrange(256), 255]) for _ in range(600)]
    cases.append((120, 90, b"".join(colors[rnd.randrange(600)]
                                    for _ in range(120 * 90))))
    for w, h, rgba in cases:
        enc = ref_encode(rgba, w, h)
        _, _, ref = ref_decode(enc)
        mine = decode_webp_lossless(enc)
        assert (mine["width"], mine["height"]) == (w, h)
        assert mine["pixels"] == ref == rgba


def test_gif_codec_cross_validated_vs_giflib():
    """Independent-oracle check for gif_codec (test oracle only, like the
    libwebp one): giflib's DGifSlurp must recover this encoder's exact
    palette indices — across plain LZW, full-alphabet streams that force
    code-width growth and a 4096-entry table reset, the 2-color
    min-code-size clamp, and interlacing (DGifSlurp deinterlaces, so
    screen-order equality also validates the 4-pass layout). Skipped when
    the shared library is absent."""
    import ctypes
    import os
    import random as _random
    import tempfile

    import pytest

    try:
        lib = ctypes.CDLL("libgif.so.7")
    except OSError:
        pytest.skip("libgif.so.7 not available in this environment")

    GifWord = ctypes.c_int

    class ColorMapObject(ctypes.Structure):
        _fields_ = [("ColorCount", ctypes.c_int), ("BitsPerPixel", ctypes.c_int),
                    ("SortFlag", ctypes.c_bool),
                    ("Colors", ctypes.c_void_p)]

    class GifImageDesc(ctypes.Structure):
        _fields_ = [("Left", GifWord), ("Top", GifWord), ("Width", GifWord),
                    ("Height", GifWord), ("Interlace", ctypes.c_bool),
                    ("ColorMap", ctypes.POINTER(ColorMapObject))]

    class ExtensionBlock(ctypes.Structure):
        _fields_ = [("ByteCount", ctypes.c_int),
                    ("Bytes", ctypes.POINTER(ctypes.c_ubyte)),
                    ("Function", ctypes.c_int)]

    class SavedImage(ctypes.Structure):
        _fields_ = [("ImageDesc", GifImageDesc),
                    ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                    ("ExtensionBlockCount", ctypes.c_int),
                    ("ExtensionBlocks", ctypes.POINTER(ExtensionBlock))]

    class GifFileType(ctypes.Structure):
        _fields_ = [("SWidth", GifWord), ("SHeight", GifWord),
                    ("SColorResolution", GifWord), ("SBackGroundColor", GifWord),
                    ("AspectByte", ctypes.c_ubyte),
                    ("SColorMap", ctypes.POINTER(ColorMapObject)),
                    ("ImageCount", ctypes.c_int), ("Image", GifImageDesc),
                    ("SavedImages", ctypes.POINTER(SavedImage)),
                    ("ExtensionBlockCount", ctypes.c_int),
                    ("ExtensionBlocks", ctypes.POINTER(ExtensionBlock)),
                    ("Error", ctypes.c_int), ("UserData", ctypes.c_void_p),
                    ("Private", ctypes.c_void_p)]

    lib.DGifOpenFileName.restype = ctypes.POINTER(GifFileType)
    lib.DGifOpenFileName.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    lib.DGifSlurp.argtypes = [ctypes.POINTER(GifFileType)]

    def slurp_rasters(data):
        fd, fn = tempfile.mkstemp(suffix=".gif")
        try:
            os.write(fd, data)
            os.close(fd)
            err = ctypes.c_int(0)
            gf = lib.DGifOpenFileName(fn.encode(), ctypes.byref(err))
            assert gf, f"giflib refused the stream (err {err.value})"
            assert lib.DGifSlurp(gf) == 1, "DGifSlurp failed"
            g = gf.contents
            out = []
            for i in range(g.ImageCount):
                si = g.SavedImages[i]
                d = si.ImageDesc
                n = d.Width * d.Height
                out.append(bytes(bytearray(
                    (ctypes.c_ubyte * n).from_address(
                        ctypes.addressof(si.RasterBits.contents)))))
            return out
        finally:
            os.unlink(fn)

    from bigdatainvesttink_spark.operators.gif_codec import encode_gif

    rnd = _random.Random(4)
    # multi-frame plain LZW
    w, h, nc = 13, 9, 5
    pal = bytes(rnd.randrange(256) for _ in range(3 * nc))
    frames = [bytes(rnd.randrange(nc) for _ in range(w * h)) for _ in range(3)]
    assert slurp_rasters(encode_gif(frames, w, h, pal)) == frames
    # interlaced (DGifSlurp returns screen order)
    w, h = 17, 23
    pal16 = bytes(rnd.randrange(256) for _ in range(3 * 16))
    fr = bytes(rnd.randrange(16) for _ in range(w * h))
    assert slurp_rasters(encode_gif([fr], w, h, pal16, interlace=True)) == [fr]
    # 256 colors, large frame: code-width growth + table reset at 4096
    w2, h2 = 200, 150
    pal256 = bytes((i * 7) % 256 for i in range(256 * 3))
    fr2 = bytes((x * x + y * 3) % 256 for y in range(h2) for x in range(w2))
    assert slurp_rasters(encode_gif([fr2], w2, h2, pal256)) == [fr2]
    # 2-color palette: the min-code-size >= 2 clamp
    fr3 = bytes(rnd.randrange(2) for _ in range(31 * 7))
    assert slurp_rasters(
        encode_gif([fr3], 31, 7, bytes([0, 0, 0, 255, 255, 255]))
    ) == [fr3]


def _compile_shim(name: str, source: str, libs: list) -> "ctypes.CDLL | None":
    """Compile a tiny C oracle shim at test time (gcc + dev headers are
    present in this container; gated — returns None when they aren't).
    The shims exist because libjpeg/libpng's full C APIs are impractical
    through raw ctypes; the PRODUCT decode path stays pure-Python."""
    import ctypes
    import os
    import shutil
    import subprocess
    import tempfile

    if shutil.which("gcc") is None:
        return None
    d = tempfile.mkdtemp(prefix="codec_shim_")
    src = os.path.join(d, f"{name}.c")
    so = os.path.join(d, f"{name}.so")
    with open(src, "w") as f:
        f.write(source)
    r = subprocess.run(
        ["gcc", "-shared", "-fPIC", "-O2", src, "-o", so]
        + [f"-l{x}" for x in libs],
        capture_output=True,
    )
    if r.returncode != 0:
        return None
    return ctypes.CDLL(so)


_JPEG_SHIM_SRC = r"""
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
int shim_decode_jpeg(const unsigned char* buf, unsigned long len,
                     unsigned char** out, int* w, int* h, int* ncomp) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) return 1;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width; *h = cinfo.output_height;
  *ncomp = cinfo.output_components;
  unsigned char* data = malloc((size_t)(*w) * (*h) * (*ncomp));
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = data + (size_t)cinfo.output_scanline * (*w) * (*ncomp);
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out = data;
  return 0;
}
int shim_encode_jpeg(const unsigned char* pixels, int w, int h, int ncomp,
                     int quality, int subsample, int progressive,
                     int restart_interval, int arith,
                     unsigned char** out, unsigned long* outlen) {
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  *out = NULL; *outlen = 0;
  jpeg_mem_dest(&cinfo, out, outlen);
  cinfo.image_width = w; cinfo.image_height = h;
  cinfo.input_components = ncomp;
  cinfo.in_color_space = (ncomp == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  if (!subsample && ncomp == 3) {
    cinfo.comp_info[0].h_samp_factor = 1;
    cinfo.comp_info[0].v_samp_factor = 1;
  }
  if (progressive) jpeg_simple_progression(&cinfo);
  cinfo.arith_code = arith ? TRUE : FALSE;
  cinfo.restart_interval = restart_interval;
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = (JSAMPROW)(pixels + (size_t)cinfo.next_scanline * w * ncomp);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  return 0;
}
void shim_free(unsigned char* p) { free(p); }
"""


def test_jpeg_codec_cross_validated_vs_libjpeg():
    """Independent-oracle check for jpeg_codec: (a) this encoder's
    streams decode in libjpeg within the T.81 IDCT-rounding bound;
    (b) libjpeg-ENCODED streams (its own quant + Huffman tables, with
    and without 4:2:0 subsampling) decode here within a small bound of
    libjpeg's own output — gray is the tight case (no color convert),
    chroma-subsampled content differs only by the spec-legal upsampling
    filter choice (sample replication here vs libjpeg's fancy triangle).
    Skipped when gcc or jpeglib.h is absent."""
    import ctypes

    import numpy as np
    import pytest

    lib = _compile_shim("jpeg_shim", _JPEG_SHIM_SRC, ["jpeg"])
    if lib is None:
        pytest.skip("gcc/libjpeg-dev not available in this environment")
    lib.shim_decode_jpeg.restype = ctypes.c_int
    lib.shim_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.shim_encode_jpeg.restype = ctypes.c_int
    lib.shim_encode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_ulong),
    ]

    def jdec(data):
        out = ctypes.POINTER(ctypes.c_ubyte)()
        w, h, nc = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        assert lib.shim_decode_jpeg(
            data, len(data), ctypes.byref(out),
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(nc)) == 0
        n = w.value * h.value * nc.value
        buf = bytes(bytearray(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * n)).contents))
        lib.shim_free(out)
        return w.value, h.value, nc.value, buf

    def jenc(px, w, h, nc, quality=90, subsample=0, progressive=0,
             restart=0, arith=0):
        out = ctypes.POINTER(ctypes.c_ubyte)()
        n = ctypes.c_ulong()
        assert lib.shim_encode_jpeg(
            px, w, h, nc, quality, subsample, progressive, restart, arith,
            ctypes.byref(out), ctypes.byref(n)) == 0
        buf = bytes(bytearray(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * n.value)).contents))
        lib.shim_free(out)
        return buf

    from bigdatainvesttink_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    # (a) my encoder -> libjpeg decoder
    for w, h, nch, gen in [
        (24, 17, 1, lambda x, y, c: (x * 7 + y * 13) % 256),
        (16, 8, 3, lambda x, y, c: (x * 31 + y * 17 + c * 5) % 256),
        (40, 33, 3, lambda x, y, c: (x * x + 3 * y + c * 11) % 256),
    ]:
        px = bytes(gen(x, y, c)
                   for y in range(h) for x in range(w) for c in range(nch))
        jw, jh, jnc, jbuf = jdec(encode_jpeg_baseline(px, w, h, nch))
        assert (jw, jh, jnc) == (w, h, nch)
        a = np.frombuffer(jbuf, np.uint8).astype(int)
        b = np.frombuffer(decode_jpeg(encode_jpeg_baseline(px, w, h, nch))
                          ["pixels"], np.uint8).astype(int)
        assert np.abs(a - b).max() <= 2  # two spec-legal IDCTs

    # (b) libjpeg encoder -> my decoder (smooth content; sawtooth wrap
    # would measure the upsampling-filter choice, not correctness)
    import math
    w, h = 28, 20
    smooth = bytes(
        int(127 + 90 * math.sin((x + c) / 5) + 30 * math.cos(y / 3)) % 256
        for y in range(h) for x in range(w) for c in range(3))
    gray = bytes((x * 7 + y * 13) % 256 for y in range(33) for x in range(40))
    for px, pw, ph, nc, sub, tol in [
        (gray, 40, 33, 1, 0, 1),
        (smooth, w, h, 3, 0, 2),
        (smooth, w, h, 3, 1, 3),
    ]:
        enc = jenc(px, pw, ph, nc, subsample=sub)
        _, _, _, ref = jdec(enc)
        mine = decode_jpeg(enc)
        assert (mine["width"], mine["height"]) == (pw, ph)
        a = np.frombuffer(ref, np.uint8).astype(int)
        b = np.frombuffer(mine["pixels"], np.uint8).astype(int)
        assert np.abs(a - b).max() <= tol, (sub, np.abs(a - b).max())

    # (c) PROGRESSIVE (SOF2, r8): libjpeg's jpeg_simple_progression —
    # interleaved DC first/refine, per-component AC first/refine with
    # EOB runs across every successive-approximation level — decodes
    # here within the same two-IDCT bound as the sequential cases;
    # quality sweep varies which refinement scans carry real bits
    for px, pw, ph, nc, sub, q, tol in [
        (gray, 40, 33, 1, 0, 85, 1),
        (smooth, w, h, 3, 0, 85, 2),
        (smooth, w, h, 3, 1, 70, 4),
        (smooth, w, h, 3, 1, 95, 3),
        (gray, 40, 33, 1, 0, 30, 1),
    ]:
        enc = jenc(px, pw, ph, nc, quality=q, subsample=sub, progressive=1)
        assert b"\xff\xc2" in enc  # really SOF2
        _, _, _, ref = jdec(enc)
        mine = decode_jpeg(enc)
        assert (mine["width"], mine["height"]) == (pw, ph)
        a = np.frombuffer(ref, np.uint8).astype(int)
        b = np.frombuffer(mine["pixels"], np.uint8).astype(int)
        assert np.abs(a - b).max() <= tol, (q, sub, np.abs(a - b).max())

    # progressive + restart markers: RSTn must reset DC predictors AND
    # the EOB run mid-scan (restart=2 forces several per scan)
    enc = jenc(smooth, w, h, 3, quality=85, subsample=1,
               progressive=1, restart=2)
    assert b"\xff\xc2" in enc and b"\xff\xdd" in enc  # SOF2 + DRI
    _, _, _, ref = jdec(enc)
    mine = decode_jpeg(enc)
    a = np.frombuffer(ref, np.uint8).astype(int)
    b = np.frombuffer(mine["pixels"], np.uint8).astype(int)
    assert np.abs(a - b).max() <= 3, np.abs(a - b).max()

    # (d) ARITHMETIC-coded sequential (SOF9, r9): libjpeg's QM coder
    # (T.81 Annex D + F.2.4 conditioning, DAC markers) decodes here
    # within the same two-IDCT bound; sweep quality (how adapted the
    # states get), subsampling (MCU interleave order), and gray vs color
    for px, pw, ph, nc, sub, q, tol in [
        (gray, 40, 33, 1, 0, 85, 1),
        (gray, 40, 33, 1, 0, 30, 1),
        (smooth, w, h, 3, 0, 85, 2),
        (smooth, w, h, 3, 1, 70, 4),
        (smooth, w, h, 3, 1, 95, 3),
    ]:
        enc = jenc(px, pw, ph, nc, quality=q, subsample=sub, arith=1)
        assert b"\xff\xc9" in enc and b"\xff\xcc" in enc  # SOF9 + DAC
        _, _, _, ref = jdec(enc)
        mine = decode_jpeg(enc)
        assert (mine["width"], mine["height"]) == (pw, ph)
        a = np.frombuffer(ref, np.uint8).astype(int)
        b = np.frombuffer(mine["pixels"], np.uint8).astype(int)
        assert np.abs(a - b).max() <= tol, (q, sub, np.abs(a - b).max())

    # arithmetic + restart markers: RSTn must reset the QM registers,
    # ALL statistics areas, and the DC conditioning state (F.2.1.3)
    enc = jenc(smooth, w, h, 3, quality=85, subsample=1, restart=2,
               arith=1)
    assert b"\xff\xc9" in enc and b"\xff\xdd" in enc  # SOF9 + DRI
    _, _, _, ref = jdec(enc)
    mine = decode_jpeg(enc)
    a = np.frombuffer(ref, np.uint8).astype(int)
    b = np.frombuffer(mine["pixels"], np.uint8).astype(int)
    assert np.abs(a - b).max() <= 3, np.abs(a - b).max()

    # (e) PROGRESSIVE + ARITHMETIC (SOF10, r9): QM-coded spectral
    # selection and successive approximation — DC first/refine, AC
    # first/refine with per-block coded EOB decisions (no EOB runs) —
    # including a restart-interval case
    for px, pw, ph, nc, sub, q, rst, tol in [
        (gray, 40, 33, 1, 0, 85, 0, 1),
        (smooth, w, h, 3, 0, 85, 0, 2),
        (smooth, w, h, 3, 1, 70, 0, 4),
        (smooth, w, h, 3, 1, 95, 0, 3),
        (smooth, w, h, 3, 1, 85, 2, 3),
    ]:
        enc = jenc(px, pw, ph, nc, quality=q, subsample=sub,
                   progressive=1, restart=rst, arith=1)
        assert b"\xff\xca" in enc  # really SOF10
        _, _, _, ref = jdec(enc)
        mine = decode_jpeg(enc)
        assert (mine["width"], mine["height"]) == (pw, ph)
        a = np.frombuffer(ref, np.uint8).astype(int)
        b = np.frombuffer(mine["pixels"], np.uint8).astype(int)
        assert np.abs(a - b).max() <= tol, (q, sub, rst,
                                            np.abs(a - b).max())


def test_jpeg_arith_state_table_matches_libjpeg():
    """The hard-coded T.81 Table D.3 must equal the installed libjpeg's
    exported jpeg_aritab byte-for-byte (the independent-oracle pin for
    the QM state machine; jdarith packs (Qe<<16)|(NMPS<<8)|(Switch<<7)
    |NLPS per entry). Skipped when the shared library is absent."""
    import ctypes

    import pytest

    from bigdatainvesttink_spark.operators.jpeg_codec import _ARITH_TAB

    try:
        lib = ctypes.CDLL("libjpeg.so.62")
        raw = (ctypes.c_long * 114).in_dll(lib, "jpeg_aritab")
    except OSError:
        pytest.skip("libjpeg shared library not available")
    got = [
        (v >> 16, (v >> 8) & 0xFF, v & 0x7F, (v >> 7) & 1) for v in raw
    ]
    assert list(_ARITH_TAB) == got


_PNG_SHIM_SRC = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <png.h>
int shim_decode_png(const unsigned char* buf, size_t len,
                    unsigned char** out, int* w, int* h, int* ncomp) {
  png_image image;
  memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, len)) return 1;
  if (image.format & PNG_FORMAT_FLAG_ALPHA) { image.format = PNG_FORMAT_RGBA; *ncomp = 4; }
  else if (image.format & PNG_FORMAT_FLAG_COLOR) { image.format = PNG_FORMAT_RGB; *ncomp = 3; }
  else { image.format = PNG_FORMAT_GRAY; *ncomp = 1; }
  *w = image.width; *h = image.height;
  unsigned char* data = malloc(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, NULL, data, 0, NULL)) { free(data); return 2; }
  *out = data;
  return 0;
}
int shim_encode_png(const unsigned char* pixels, int w, int h, int ncomp,
                    unsigned char** out, size_t* outlen) {
  png_image image;
  memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  image.width = w; image.height = h;
  image.format = (ncomp == 1) ? PNG_FORMAT_GRAY
               : (ncomp == 3) ? PNG_FORMAT_RGB : PNG_FORMAT_RGBA;
  png_alloc_size_t sz = 0;
  if (!png_image_write_to_memory(&image, NULL, &sz, 0, pixels, 0, NULL)) return 1;
  unsigned char* data = malloc(sz);
  if (!png_image_write_to_memory(&image, data, &sz, 0, pixels, 0, NULL)) { free(data); return 2; }
  *out = data; *outlen = sz;
  return 0;
}
typedef struct { unsigned char* buf; size_t len, cap; } membuf;
static void mb_write(png_structp png, png_bytep data, png_size_t n) {
  membuf* m = (membuf*)png_get_io_ptr(png);
  while (m->len + n > m->cap) {
    m->cap = m->cap ? m->cap * 2 : 65536;
    m->buf = realloc(m->buf, m->cap);
  }
  memcpy(m->buf + m->len, data, n); m->len += n;
}
static void mb_flush(png_structp png) { (void)png; }
/* Full-API writer so the ADAM7 flag is honored (png_image cannot write
   interlaced) — the independent-encoder direction of the r8 Adam7 test. */
int shim_encode_png_adam7(const unsigned char* pixels, int w, int h,
                          int ncomp, unsigned char** out, size_t* outlen) {
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                            NULL, NULL, NULL);
  if (!png) return 1;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_write_struct(&png, NULL); return 1; }
  membuf m = {0, 0, 0};
  png_bytep* rows = NULL;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info); free(m.buf); free(rows); return 2;
  }
  png_set_write_fn(png, &m, mb_write, mb_flush);
  int ct = (ncomp == 1) ? PNG_COLOR_TYPE_GRAY
         : (ncomp == 3) ? PNG_COLOR_TYPE_RGB : PNG_COLOR_TYPE_RGBA;
  png_set_IHDR(png, info, w, h, 8, ct, PNG_INTERLACE_ADAM7,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  rows = malloc((size_t)h * sizeof(png_bytep));
  for (int y = 0; y < h; y++)
    rows[y] = (png_bytep)(pixels + (size_t)y * w * ncomp);
  png_set_rows(png, info, rows);
  png_write_png(png, info, PNG_TRANSFORM_IDENTITY, NULL);
  free(rows);
  png_destroy_write_struct(&png, &info);
  *out = m.buf; *outlen = m.len;
  return 0;
}
/* Palette writer (r8): depths 1/2/4/8 via PNG_TRANSFORM_PACKING from
   one-byte-per-pixel indices, optional tRNS, optional ADAM7. */
int shim_encode_png_pal(const unsigned char* idx, int w, int h, int depth,
                        const unsigned char* pal_rgb, int npal,
                        const unsigned char* trns, int ntrns, int interlace,
                        unsigned char** out, size_t* outlen) {
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                            NULL, NULL, NULL);
  if (!png) return 1;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_write_struct(&png, NULL); return 1; }
  membuf m = {0, 0, 0};
  png_bytep* rows = NULL;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info); free(m.buf); free(rows); return 2;
  }
  png_set_write_fn(png, &m, mb_write, mb_flush);
  png_set_IHDR(png, info, w, h, depth, PNG_COLOR_TYPE_PALETTE,
               interlace ? PNG_INTERLACE_ADAM7 : PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_color pal[256];
  for (int i = 0; i < npal; i++) {
    pal[i].red = pal_rgb[3*i]; pal[i].green = pal_rgb[3*i+1];
    pal[i].blue = pal_rgb[3*i+2];
  }
  png_set_PLTE(png, info, pal, npal);
  if (ntrns > 0) png_set_tRNS(png, info, (png_bytep)trns, ntrns, NULL);
  rows = malloc((size_t)h * sizeof(png_bytep));
  for (int y = 0; y < h; y++) rows[y] = (png_bytep)(idx + (size_t)y * w);
  png_set_rows(png, info, rows);
  png_write_png(png, info, PNG_TRANSFORM_PACKING, NULL);
  free(rows);
  png_destroy_write_struct(&png, &info);
  *out = m.buf; *outlen = m.len;
  return 0;
}
void shim_free_png(unsigned char* p) { free(p); }
"""


def test_png_path_cross_validated_vs_libpng():
    """Independent-oracle check for the PNG seam: libpng decodes
    encode_png's output byte-exactly, and libpng-WRITTEN files — whose
    encoder picks adaptive per-row filters (types 0-4), the part of the
    format this repo's own encoder never emits — decode byte-exactly in
    decode_image's pure-Python unfilter. Skipped when gcc or png.h is
    absent."""
    import ctypes
    import random as _random

    import pytest

    lib = _compile_shim("png_shim", _PNG_SHIM_SRC, ["png16"])
    if lib is None:
        pytest.skip("gcc/libpng-dev not available in this environment")
    lib.shim_decode_png.restype = ctypes.c_int
    lib.shim_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.shim_encode_png.restype = ctypes.c_int
    lib.shim_encode_png.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_size_t),
    ]

    def pdec(data):
        out = ctypes.POINTER(ctypes.c_ubyte)()
        w, h, nc = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        assert lib.shim_decode_png(
            data, len(data), ctypes.byref(out),
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(nc)) == 0
        n = w.value * h.value * nc.value
        buf = bytes(bytearray(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * n)).contents))
        lib.shim_free_png(out)
        return w.value, h.value, nc.value, buf

    def penc(px, w, h, nc):
        out = ctypes.POINTER(ctypes.c_ubyte)()
        n = ctypes.c_size_t()
        assert lib.shim_encode_png(
            px, w, h, nc, ctypes.byref(out), ctypes.byref(n)) == 0
        buf = bytes(bytearray(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * n.value)).contents))
        lib.shim_free_png(out)
        return buf

    from bigdatainvesttink_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    rnd = _random.Random(8)
    for w, h, nc in [(24, 17, 3), (9, 5, 1), (12, 7, 4)]:
        px = bytes(rnd.randrange(256) for _ in range(w * h * nc))
        assert pdec(encode_png(px, w, h, nc)) == (w, h, nc, px)
    for w, h, nc in [(24, 17, 3), (9, 5, 1), (12, 7, 4), (64, 48, 3)]:
        px = bytes(rnd.randrange(256) for _ in range(w * h * nc))
        m = decode_image(penc(px, w, h, nc))
        assert (m["width"], m["height"]) == (w, h)
        assert bytes(m["decoded_pixels"]) == px

    # --- Adam7 interlace, both directions (r8, VERDICT stretch #8) ---
    lib.shim_encode_png_adam7.restype = ctypes.c_int
    lib.shim_encode_png_adam7.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_size_t),
    ]

    def penc7(px, w, h, nc):
        out = ctypes.POINTER(ctypes.c_ubyte)()
        n = ctypes.c_size_t()
        assert lib.shim_encode_png_adam7(
            px, w, h, nc, ctypes.byref(out), ctypes.byref(n)) == 0
        buf = bytes(bytearray(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * n.value)).contents))
        lib.shim_free_png(out)
        return buf

    # odd sizes exercise absent/narrow passes; 8x8-multiples the full grid;
    # 1-wide/1-tall the degenerate pass layouts
    shapes = [(24, 16, 3), (17, 13, 1), (12, 7, 4), (9, 5, 3),
              (1, 9, 3), (9, 1, 3), (3, 3, 1), (64, 48, 3)]
    for w, h, nc in shapes:
        px = bytes(rnd.randrange(256) for _ in range(w * h * nc))
        # libpng-WRITTEN Adam7 (its encoder picks adaptive per-pass
        # filters) -> this repo's deinterlacing unfilter, byte-exact
        m = decode_image(penc7(px, w, h, nc))
        assert (m["width"], m["height"]) == (w, h), (w, h, nc)
        assert bytes(m["decoded_pixels"]) == px, (w, h, nc)
        # this repo's Adam7 pass extraction -> libpng decode, byte-exact
        # (proves the scatter grid isn't a mirrored bug)
        assert pdec(encode_png(px, w, h, nc, interlace=True)) == (
            w, h, nc, px), (w, h, nc)

    # --- indexed-color (color type 3), depths 1/2/4/8 (r8) ---
    # libpng-WRITTEN palette files (PNG_TRANSFORM_PACKING packs sub-byte
    # rows; its encoder picks per-row filters over the PACKED bytes) must
    # decode here to the exact palette-mapped samples, sequential AND
    # Adam7, with and without tRNS alpha
    lib.shim_encode_png_pal.restype = ctypes.c_int
    lib.shim_encode_png_pal.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_size_t),
    ]

    def penc_pal(idx, w, h, depth, pal, trns, interlace):
        out = ctypes.POINTER(ctypes.c_ubyte)()
        n = ctypes.c_size_t()
        assert lib.shim_encode_png_pal(
            idx, w, h, depth, pal, len(pal) // 3,
            trns or b"", len(trns or b""), int(interlace),
            ctypes.byref(out), ctypes.byref(n)) == 0
        buf = bytes(bytearray(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_ubyte * n.value)).contents))
        lib.shim_free_png(out)
        return buf

    for depth in (1, 2, 4, 8):
        npal = min(1 << depth, 23)
        pal = bytes(rnd.randrange(256) for _ in range(3 * npal))
        for w, h in ((21, 13), (8, 8), (3, 17)):
            idx = bytes(rnd.randrange(npal) for _ in range(w * h))
            for use_trns in (False, True):
                trns = (bytes(rnd.randrange(256)
                              for _ in range(max(1, npal // 2)))
                        if use_trns else None)
                for il in (False, True):
                    data = penc_pal(idx, w, h, depth, pal, trns, il)
                    m = decode_image(data)
                    assert (m["width"], m["height"]) == (w, h)
                    nc2 = 4 if use_trns else 3
                    want = bytearray()
                    for v in idx:
                        want += pal[3 * v:3 * v + 3]
                        if use_trns:
                            want.append(
                                trns[v] if v < len(trns) else 255)
                    assert bytes(m["decoded_pixels"]) == bytes(want), (
                        depth, w, h, use_trns, il, nc2)


def test_gif_decoder_on_giflib_encoded_streams():
    """Decoder-direction oracle: streams produced by giflib's OWN LZW
    encoder (whose clear-code cadence and code-growth pattern differ
    from this repo's encoder) must decode to the exact composed frame.
    Skipped when the shared library is absent."""
    import ctypes
    import os
    import random as _random
    import tempfile

    import pytest

    try:
        lib = ctypes.CDLL("libgif.so.7")
    except OSError:
        pytest.skip("libgif.so.7 not available in this environment")

    class GifColorType(ctypes.Structure):
        _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                    ("Blue", ctypes.c_ubyte)]

    class ColorMapObject(ctypes.Structure):
        _fields_ = [("ColorCount", ctypes.c_int), ("BitsPerPixel", ctypes.c_int),
                    ("SortFlag", ctypes.c_bool),
                    ("Colors", ctypes.POINTER(GifColorType))]

    lib.EGifOpenFileName.restype = ctypes.c_void_p
    lib.EGifOpenFileName.argtypes = [
        ctypes.c_char_p, ctypes.c_bool, ctypes.POINTER(ctypes.c_int)]
    lib.GifMakeMapObject.restype = ctypes.POINTER(ColorMapObject)
    lib.GifMakeMapObject.argtypes = [ctypes.c_int, ctypes.POINTER(GifColorType)]
    lib.EGifPutScreenDesc.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ColorMapObject)]
    lib.EGifPutImageDesc.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_bool, ctypes.POINTER(ColorMapObject)]
    lib.EGifPutLine.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lib.EGifCloseFile.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]

    from bigdatainvesttink_spark.operators.gif_codec import decode_gif

    rnd = _random.Random(12)
    for w, h, nc in [(37, 29, 16), (90, 70, 256), (19, 11, 4)]:
        pal_rgb = bytes(rnd.randrange(256) for _ in range(3 * nc))
        frame = bytes(rnd.randrange(nc) for _ in range(w * h))
        colors = (GifColorType * nc)(*[
            GifColorType(pal_rgb[3 * i], pal_rgb[3 * i + 1], pal_rgb[3 * i + 2])
            for i in range(nc)])
        cmap = lib.GifMakeMapObject(nc, colors)
        fd, fn = tempfile.mkstemp(suffix=".gif")
        os.close(fd)
        os.unlink(fn)  # EGifOpenFileName wants to create it
        err = ctypes.c_int()
        gf = lib.EGifOpenFileName(fn.encode(), False, ctypes.byref(err))
        assert gf, err.value
        depth = max(2, (nc - 1).bit_length())
        assert lib.EGifPutScreenDesc(gf, w, h, depth, 0, cmap) == 1
        assert lib.EGifPutImageDesc(gf, 0, 0, w, h, False, None) == 1
        buf = (ctypes.c_ubyte * (w * h)).from_buffer_copy(frame)
        for row in range(h):
            assert lib.EGifPutLine(
                gf,
                ctypes.cast(ctypes.byref(buf, row * w),
                            ctypes.POINTER(ctypes.c_ubyte)), w) == 1
        assert lib.EGifCloseFile(gf, ctypes.byref(err)) == 1
        data = open(fn, "rb").read()
        os.unlink(fn)
        d = decode_gif(data)
        pad = pal_rgb + b"\x00" * (3 * ((1 << depth) - nc))
        want = b"".join(pad[i * 3:i * 3 + 3] for i in frame)
        assert (d["width"], d["height"], d["n_frames"]) == (w, h, 1)
        assert d["frames"][0] == want


def test_compression_codecs_cross_validated_vs_pyarrow():
    """Independent-oracle check for compress_codec: pyarrow's C++
    snappy / lz4_raw / lz4-frame codecs must round-trip byte-exactly in
    BOTH directions against the pure-Python implementations — including
    pyarrow's LINKED lz4 frame blocks (matches reaching into the prior
    block's output) and multi-block frames. xxHash32 is pinned to known
    public vectors first, since the frame checksums derive from it."""
    import random as _random

    import pyarrow as pa
    import pytest

    from bigdatainvesttink_spark.operators.compress_codec import (
        decode_lz4_block,
        decode_lz4_frame,
        decode_snappy,
        decompress_payload,
        encode_lz4_block,
        encode_lz4_frame,
        encode_snappy,
        xxhash32,
    )

    # public xxHash32 vectors
    assert xxhash32(b"") == 0x02CC5D05
    assert xxhash32(b"Nobody inspects the spammish repetition") == 0xE2293B2F

    rnd = _random.Random(1)
    samples = [
        b"",
        b"a",
        b"hello world " * 50,
        bytes(rnd.randrange(256) for _ in range(10000)),  # incompressible
        (b"the quick brown fox jumps over the lazy dog. " * 200)[:7777],
        bytes(100000),                                   # long zero runs
        bytes(rnd.randrange(4) for _ in range(300000)),  # multi-block
        b"abcdefgh" * 40000,                             # linked-block spans
    ]
    sn, l4r, l4f = pa.Codec("snappy"), pa.Codec("lz4_raw"), pa.Codec("lz4")
    for s in samples:
        # pyarrow encoder -> these decoders
        assert decode_snappy(bytes(sn.compress(s))) == s
        assert decode_lz4_block(bytes(l4r.compress(s))) == s
        assert decode_lz4_frame(bytes(l4f.compress(s))) == s
        # these encoders -> pyarrow decoder
        assert bytes(sn.decompress(encode_snappy(s), len(s))) == s
        assert bytes(l4r.decompress(encode_lz4_block(s), len(s))) == s
        assert bytes(l4f.decompress(encode_lz4_frame(s), len(s))) == s
        # auto-sniff dispatch (lz4 frame magic / gzip / zlib)
        assert decompress_payload(
            encode_lz4_frame(s, block_size=64 << 10), "auto") == s
    import zlib
    blob = samples[4]
    assert decompress_payload(zlib.compress(blob), "auto") == blob
    gz = zlib.compressobj(wbits=31)
    assert decompress_payload(gz.compress(blob) + gz.flush(), "auto") == blob
    # gzip MEMBER SEQUENCES (the Common Crawl WET/WARC layout): a naive
    # one-shot inflate silently truncates at the first member boundary
    g1 = zlib.compressobj(wbits=31)
    g2 = zlib.compressobj(wbits=31)
    two = g1.compress(blob[:100]) + g1.flush() + g2.compress(blob[100:]) + g2.flush()
    assert decompress_payload(two, "auto") == blob
    with pytest.raises(ValueError, match="truncated member"):
        decompress_payload(two[:-8], "gzip")
    # lz4 frame sequences behave the same way (lz4 CLI append layout)
    import struct as _struct
    la = bytes(l4f.compress(blob[:2000]))
    lb = bytes(l4f.compress(blob[2000:]))
    lskip = _struct.pack("<II", 0x184D2A51, 5) + b"notes"
    assert decode_lz4_frame(la + lb) == blob
    assert decode_lz4_frame(la + lskip + lb) == blob
    # corruption fails loudly (frame checksums are real)
    enc = bytearray(encode_lz4_frame(samples[4]))
    enc[len(enc) // 2] ^= 0x01
    with pytest.raises(ValueError):
        decode_lz4_frame(bytes(enc))
    with pytest.raises(ValueError, match="auto"):
        decompress_payload(b"\x00\x01\x02", "auto")  # no magic -> must name


def test_compress_codec_edge_frames():
    """ADVICE r7 follow-ups, each pinned: (1) lz4 streams that BEGIN
    with a skippable frame decode (legal per the frame spec); (2)
    truncated skippable headers raise ValueError, not struct.error, in
    both lz4 and zstd; (3) a frame declaring an external dictionary
    fails loud with NotImplementedError instead of decoding garbage;
    (4) auto-sniff accepts every valid zlib CMF byte (RFC 1950 header
    check), not just the 32 KB-window 0x78 prefix."""
    import struct as _struct
    import zlib

    import pyarrow as pa
    import pytest

    from bigdatainvesttink_spark.operators.compress_codec import (
        decode_lz4_frame,
        decompress_payload,
        xxhash32,
    )
    from bigdatainvesttink_spark.operators.zstd_codec import decode_zstd

    blob = (b"skippable-prologue payload " * 300)[:7001]
    l4 = bytes(pa.Codec("lz4").compress(blob))
    zs = bytes(pa.Codec("zstd").compress(blob))
    skip = _struct.pack("<II", 0x184D2A5F, 4) + b"meta"
    # leading skippable frame: legal in both formats
    assert decode_lz4_frame(skip + l4) == blob
    assert decode_zstd(skip + zs) == blob
    # truncated skippable header / body -> ValueError (module convention)
    for frag in (skip[:6], skip[:10]):
        with pytest.raises(ValueError):
            decode_lz4_frame(l4 + frag)
        with pytest.raises(ValueError):
            decode_zstd(zs + frag)
    # DictID flag set with no dictionary supplied -> fail loud up front
    # (round 10: WITH a dictionary the field parses and decode proceeds
    # — the id of a raw dictionary is unverifiable by construction)
    flg = l4[4] | 0x01
    # the one-byte header checksum covers ALL descriptor bytes between
    # the magic and HC — the 4-byte dictionary id included
    hdr = bytes([flg]) + l4[5:6] + _struct.pack("<I", 77)
    hc = (xxhash32(hdr) >> 8) & 0xFF
    dict_frame = l4[:4] + hdr + bytes([hc]) + l4[7:]
    with pytest.raises(ValueError, match="dictionary"):
        decode_lz4_frame(dict_frame)
    assert decode_lz4_frame(dict_frame, dictionary=b"unused") == blob
    # zlib auto-sniff across window sizes (CMF 0x08..0x78)
    for wbits in (9, 11, 13, 15):
        z = zlib.compress(blob, 6)
        z = zlib.compressobj(6, zlib.DEFLATED, wbits).compress(blob)
        zo = zlib.compressobj(6, zlib.DEFLATED, wbits)
        z = zo.compress(blob) + zo.flush()
        assert z[0] & 0x0F == 8 and ((z[0] << 8) | z[1]) % 31 == 0
        assert decompress_payload(z, "auto") == blob


def test_zstd_long_form_sequence_count():
    """RFC 8878 long-form Number_of_Sequences (byte0 == 255) is byte1 +
    (byte2 << 8) + 0x7F00 — ADDITION, not OR (the OR form mis-decodes
    any count >= 32768). Oracle: libzstd (via pyarrow) compressing a
    shuffled trigram-pool buffer at level 19 emits a block with ~40k
    sequences; the pure-Python decode must be byte-exact, and a tracer
    proves the long form was actually exercised (max n_seq >= 32768)."""
    import sys

    import numpy as np
    import pyarrow as pa

    from bigdatainvesttink_spark.operators import zstd_codec

    rng = np.random.default_rng(7)
    pool = rng.integers(0, 256, size=(5000, 3), dtype=np.uint8)
    idx = rng.integers(0, 5000, size=150_000)
    data = pool[idx].reshape(-1).tobytes()
    enc = bytes(pa.Codec("zstd", compression_level=19).compress(data))

    counts = []

    def tracer(frame, event, arg):
        if event == "call" and frame.f_code.co_name == "_decode_block":
            def local(fr, ev, _a):
                if ev == "return":
                    counts.append(fr.f_locals.get("n_seq", 0))
                return local
            return local
        return None

    sys.settrace(tracer)
    try:
        out = zstd_codec.decode_zstd(enc)
    finally:
        sys.settrace(None)
    assert out == data
    assert max(counts) >= 32768, (
        f"construction no longer exercises the long form (max {max(counts)})")


def test_decompress_docs_seam(spark):
    """The compressed-corpus seam end-to-end on Spark: documents' text
    compressed per-row with pyarrow's C++ snappy, decompressed
    executor-side through the mapInPandas seam, byte-exact against the
    source text with correct size accounting."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    from bigdatainvesttink_spark.io import load_table
    from bigdatainvesttink_spark.operators.compress_codec import (
        decompress_docs,
    )

    sn = pa.Codec("snappy")
    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("text") != "")
        .select("doc_id", "text")
        .limit(64)
        .collect()
    )
    assert docs
    payloads = [(r["doc_id"], bytes(sn.compress(r["text"].encode()))) for r in docs]
    want = {r["doc_id"]: r["text"].encode() for r in docs}
    df = spark.createDataFrame(payloads, "doc_id long, content binary")
    got = decompress_docs(df, algo="snappy").collect()
    assert len(got) == len(docs)
    for r in got:
        raw = bytes(r["content"])
        assert raw == want[r["doc_id"]]
        assert r["n_bytes"] == len(raw)
        assert r["n_compressed"] > 0


def test_zstd_decoder_cross_validated_vs_libzstd():
    """Independent-oracle check for zstd_codec: pyarrow's bundled
    libzstd compresses realistic corpus text and synthetic extremes at
    several levels; the pure-Python decoder must recover every payload
    byte-exactly. The level sweep is what varies the format features
    actually present in the stream — predefined vs FSE-described vs
    repeat sequence tables, direct vs FSE-compressed Huffman weights,
    1- vs 4-stream literals, raw/RLE blocks and multi-block frames.
    xxHash64 (the frame checksum primitive) is pinned to public vectors
    first."""
    import random as _random

    import duckdb
    import pyarrow as pa
    import pytest

    from bigdatainvesttink_spark.operators.compress_codec import (
        decompress_payload,
    )
    from bigdatainvesttink_spark.operators.zstd_codec import (
        decode_zstd,
        xxhash64,
    )

    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert (
        xxhash64(b"Nobody inspects the spammish repetition")
        == 0xFBCEA83C8A378BF1
    )

    rnd = _random.Random(5)
    con = duckdb.connect()
    corpus = "\n".join(
        r[0]
        for r in con.execute(
            "SELECT text FROM read_parquet("
            "'/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
    ).encode()
    cases = [("corpus", corpus, lv) for lv in (1, 3, 12, 19)]
    cases += [
        ("tiny", b"a", 3),
        ("empty", b"", 3),
        ("random", bytes(rnd.randrange(256) for _ in range(5000)), 3),
        ("alphabet8",
         bytes(rnd.randrange(8) for _ in range(50000)), 3),
        ("tokens",
         b"".join(rnd.choice([b"alpha", b"beta", b"gamma", b"delta "])
                  for _ in range(20000)), 19),
        ("multiblock-zeros", bytes(1_000_000), 3),
        ("multiblock-random",
         bytes(rnd.randrange(256) for _ in range(300_000)), 1),
    ]
    for name, data, level in cases:
        z = pa.Codec("zstd", compression_level=level)
        enc = bytes(z.compress(data))
        assert decode_zstd(enc) == data, (name, level)
        # both seam paths: native (pyarrow fast path) and pure Python
        assert decompress_payload(enc, "auto") == data
        assert decompress_payload(enc, "zstd", prefer_native=False) == data
    # corruption: without a content checksum a flipped LITERAL byte can
    # legally decode to different bytes, so the contract is "raise or
    # differ" — never silently equal; a corrupted block HEADER must
    # always raise
    z = pa.Codec("zstd", compression_level=3)
    good = bytes(z.compress(corpus))
    flipped = bytearray(good)
    flipped[len(flipped) // 2] ^= 0x01
    try:
        assert decode_zstd(bytes(flipped)) != corpus
    except ValueError:
        pass
    broken_header = bytearray(good)
    broken_header[6] ^= 0xFF  # block-header byte: size/type garbage
    with pytest.raises(ValueError):
        decode_zstd(bytes(broken_header))
    # real .zst files are frame SEQUENCES: concatenated frames decode to
    # the concatenation; skippable frames are ignored (RFC 8878 sec. 3)
    import struct as _struct
    half = corpus[: len(corpus) // 2]
    rest = corpus[len(corpus) // 2:]
    two = bytes(z.compress(half)) + bytes(z.compress(rest))
    assert decode_zstd(two) == corpus
    skippable = _struct.pack("<II", 0x184D2A50, 4) + b"meta"
    assert decode_zstd(
        bytes(z.compress(half)) + skippable + bytes(z.compress(rest))
    ) == corpus
    with pytest.raises(ValueError, match="requires dictionary"):
        # DID field set with no dictionary supplied -> fail loud (frame
        # header with FHD 0x01 + window byte + 1-byte dict id); real
        # dictionary decoding is covered by test_zstd_dictionary_decode
        decode_zstd(b"\x28\xb5\x2f\xfd\x01\x00\x07" + b"\x01\x00\x00")


def test_zstd_dictionary_decode(tmp_path):
    """Dictionary frames decode for real (round 10, retiring the last
    zstd guard). Oracle: the container's actual zstd CLI — it TRAINS a
    structured dictionary (RFC 8878 §5: magic 0xEC30A437, dict id,
    initial Huffman + OF/ML/LL FSE tables, initial repeat offsets,
    content-as-history) and compresses payloads with -D across levels;
    the pure-Python decoder must reproduce every original byte-exactly.
    Also pinned: raw-content dictionaries (blob without the magic = all
    history, libzstd's auto load mode, frames carry did=0), the
    missing-dictionary and wrong-dictionary fail-loud paths, and
    truncated-dictionary parsing."""
    import shutil
    import subprocess

    import pytest

    from bigdatainvesttink_spark.operators.zstd_codec import (
        ZstdDict,
        decode_zstd,
    )

    zstd_cli = shutil.which("zstd")
    if zstd_cli is None:
        pytest.skip("zstd CLI unavailable (the dictionary-trainer oracle)")

    # deterministic training corpus: shared vocabulary, varied payloads
    vocab = ("orders lineitem shipment quantity discount revenue "
             "warehouse supplier region nation customer priority ")
    samples = []
    for i in range(80):
        body = (vocab * 3) + f"record={i} " + vocab[i % 40:] * 2
        p = tmp_path / f"s{i}.txt"
        p.write_bytes(body.encode())
        samples.append(str(p))
    dict_path = tmp_path / "dict.bin"
    r = subprocess.run(
        [zstd_cli, "--train", *samples, "-o", str(dict_path),
         "--maxdict=8192", "-q"],
        capture_output=True,
    )
    if r.returncode != 0:  # trainer can refuse tiny corpora per version
        pytest.skip(f"zstd --train refused: {r.stderr.decode()[:200]}")
    dict_blob = dict_path.read_bytes()

    zd = ZstdDict(dict_blob)
    assert zd.dict_id != 0 and len(zd.content) > 0
    for rep in zd.rep:
        assert 0 < rep <= len(zd.content)

    # structured dictionary, level sweep, byte-exact vs the CLI encoder
    payloads = {
        "like-training": ((vocab * 5) + "record=99 " + vocab).encode(),
        "partial-overlap": (vocab + "unrelated tail " * 50).encode(),
        "short": b"orders lineitem",
    }
    for lvl in (1, 3, 7, 12, 19):
        for name, data in payloads.items():
            src = tmp_path / "p.bin"
            src.write_bytes(data)
            enc_p = tmp_path / "p.zst"
            subprocess.run(
                [zstd_cli, f"-{lvl}", "-D", str(dict_path), "-f", "-q",
                 str(src), "-o", str(enc_p)],
                check=True, capture_output=True,
            )
            enc = enc_p.read_bytes()
            assert decode_zstd(enc, dictionary=dict_blob) == data, (
                name, lvl)
            # frame names the dictionary id -> decoding without it fails
            with pytest.raises(ValueError, match="requires dictionary"):
                decode_zstd(enc)

    # wrong structured dictionary -> id mismatch, loud
    alt_samples = []
    for i in range(80):
        p = tmp_path / f"alt{i}.txt"
        p.write_bytes((f"totally different corpus {i} " * 30).encode())
        alt_samples.append(str(p))
    alt_path = tmp_path / "alt.bin"
    r = subprocess.run(
        [zstd_cli, "--train", *alt_samples, "-o", str(alt_path),
         "--maxdict=8192", "-q"],
        capture_output=True,
    )
    if r.returncode == 0:
        alt_blob = alt_path.read_bytes()
        if ZstdDict(alt_blob).dict_id != zd.dict_id:
            enc = (tmp_path / "p.zst").read_bytes()
            with pytest.raises(ValueError, match="mismatch"):
                decode_zstd(enc, dictionary=alt_blob)

    # raw-content dictionary: the -D file has no magic, so libzstd loads
    # it as pure history (frames carry did=0) and so do we
    raw_blob = (vocab * 20).encode()
    raw_path = tmp_path / "raw.bin"
    raw_path.write_bytes(raw_blob)
    data = (vocab * 8 + "suffix beyond the dictionary " * 20).encode()
    src = tmp_path / "r.bin"
    src.write_bytes(data)
    for lvl in (1, 9, 19):
        enc_p = tmp_path / "r.zst"
        subprocess.run(
            [zstd_cli, f"-{lvl}", "-D", str(raw_path), "-f", "-q",
             str(src), "-o", str(enc_p)],
            check=True, capture_output=True,
        )
        assert decode_zstd(enc_p.read_bytes(), dictionary=raw_blob) == data

    # dispatch seam: decompress_payload threads the dictionary through
    # (zstd-only — pyarrow's codec API takes none, so the pure decoder
    # serves dictionary streams even with prefer_native left True)
    from bigdatainvesttink_spark.operators.compress_codec import (
        decompress_payload,
    )

    enc = (tmp_path / "r.zst").read_bytes()
    assert decompress_payload(enc, "zstd", dictionary=raw_blob) == data
    assert decompress_payload(enc, "auto", dictionary=raw_blob) == data
    with pytest.raises(ValueError, match="zstd/lz4"):
        decompress_payload(enc, "gzip", dictionary=raw_blob)

    # truncated structured dictionary -> ValueError, not IndexError
    for cut in (9, len(dict_blob) // 2):
        try:
            ZstdDict(dict_blob[:cut])
        except ValueError:
            pass  # loud parse failure is the contract


def test_semdedup_cell_blocked_invariants(spark):
    """The SemDeDup scale path (r8, VERDICT ask #4): clusters are
    CELL-LOCAL by construction (candidate pairs never cross a k-means
    cell), the canonical flag is the min-id convention, and the synthetic
    near-dups (vec_id + 100000 = 3a + b neighbors) that land in their
    base vector's cell are detected — the recall trade is cross-cell
    misses only, never within-cell ones."""
    rows = _q("d3_semdedup_cell_blocked")(spark, SF_SMALL).collect()
    assert rows, "no duplicate clusters found at all"
    by_cluster: dict[int, list] = {}
    for r in rows:
        assert r["cluster_size"] >= 2
        assert r["is_canonical"] == (1 if r["vec_id"] == r["cluster_id"] else 0)
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        # one canonical per cluster; every member shares the cell
        assert sum(m["is_canonical"] for m in members) == 1, cid
        assert len({m["cell"] for m in members}) == 1, cid
        assert min(m["vec_id"] for m in members) == cid
    # within-cell completeness: every synthetic pair whose two ends share
    # a cell must be clustered together
    clustered = {r["vec_id"]: r["cluster_id"] for r in rows}
    cells_df = _q("d3_semdedup_cell_blocked")(spark, SF_SMALL).select(
        "vec_id", "cell"
    )
    cell_of = {r["vec_id"]: r["cell"] for r in cells_df.collect()}
    checked = 0
    for vid, cell in cell_of.items():
        if vid >= 100000 and (vid - 100000) in cell_of:
            base = vid - 100000
            if cell_of[base] == cell:
                assert clustered[vid] == clustered[base], (vid, base)
                checked += 1
    assert checked > 0, "no same-cell synthetic pair reached the output"


def test_jpeg_progressive_zero_scans_fails_loud():
    """A SOF2 stream truncated before its first SOS must raise the same
    'no SOS segment found' the sequential path raises, not return the
    store's all-zero coefficients as a silent uniform-gray image
    (ADVICE r8)."""
    import pytest

    from bigdatainvesttink_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    px = bytes((x * 7 + y * 13) % 256 for y in range(9) for x in range(11))
    base = encode_jpeg_baseline(px, 11, 9, 1)
    k = base.find(b"\xff\xc0")
    prog = base[:k] + b"\xff\xc2" + base[k + 2:]
    headers_only = prog[: prog.find(b"\xff\xda")] + b"\xff\xd9"
    with pytest.raises(ValueError, match="no SOS segment found"):
        decode_jpeg(headers_only)


def test_jpeg_progressive_ac_band_bounds_validated():
    """Corrupt AC-scan band bounds (Ss > Se, or Se > 63) must raise a
    clean malformed-JPEG ValueError at the top of decode_scan, not
    silently decode nothing per block / IndexError inside _ac_first
    (ADVICE r8)."""
    import pytest

    from bigdatainvesttink_spark.operators.jpeg_codec import (
        _ProgressiveStore,
    )

    frame = {
        "w": 8, "h": 8, "progressive": True,
        "comps": [{"id": 1, "h": 1, "v": 1, "tq": 0}],
    }
    store = _ProgressiveStore(frame)
    scan = [(1, {"dc": 0, "ac": 0})]
    for ss, se in [(6, 5), (1, 64), (63, 70)]:
        with pytest.raises(ValueError, match="AC scan band"):
            store.decode_scan(b"", 0, scan, {}, 0, ss, se, 0, 0)
    # the valid boundary band still enters the entropy decoder (and
    # fails there on the truncated segment, but NOT with the band message)
    try:
        store.decode_scan(b"\xff\xd9", 0, scan, {(1, 0): {}}, 0, 1, 63, 1, 0)
    except Exception as exc:
        assert "AC scan band" not in str(exc)


def test_png_zero_dimension_fails_as_malformed():
    """A palette PNG declaring 0x0 dimensions must fail with a
    malformed-PNG message, not 'max() arg is an empty sequence' from the
    index-range check (ADVICE r8)."""
    import struct
    import zlib

    import pytest

    from bigdatainvesttink_spark.operators.multimodal import decode_image

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 0, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes(3))
        + chunk(b"IDAT", zlib.compress(b""))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="zero-dimension"):
        decode_image(png)


def _libwebp_enc_yuv():
    """libwebp encode+YUV-decode entry points for the lossy-VP8 oracle
    (encode makes the fixtures; WebPDecodeYUV is the comparison target —
    YUV space keeps the check inside the VP8 bitstream spec, with RGB
    conversion and chroma upsampling out of the equation)."""
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    return lib


def _vp8_test_image(w: int, h: int, kind: str) -> bytes:
    """Deterministic RGB fixtures spanning the encoder's mode choices:
    flat/gradient favor 16x16 DC/TM, blocks/edges force B_PRED with
    varied 4x4 modes, noise stresses coefficient categories."""
    rgb = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            if kind == "flat":
                rgb[i:i + 3] = (120, 130, 140)
            elif kind == "gradient":
                rgb[i] = (x * 255) // max(w - 1, 1)
                rgb[i + 1] = (y * 255) // max(h - 1, 1)
                rgb[i + 2] = ((x + y) * 255) // max(w + h - 2, 1)
            elif kind == "blocks":
                c = 230 if ((x // 8) + (y // 8)) % 2 else 30
                rgb[i:i + 3] = (c, 255 - c, (c * 3) % 255)
            elif kind == "noise":
                hsh = (x * 2654435761 + y * 40503 + 12345) & 0xFFFFFFFF
                rgb[i:i + 3] = ((hsh >> 8) & 255, (hsh >> 16) & 255,
                                (hsh >> 3) & 255)
            else:  # edges
                c = 255 if (x * 7 + y * 3) % 31 < 5 else 20
                rgb[i:i + 3] = (c, c // 2, 255 - c)
    return bytes(rgb)


def test_vp8_lossy_decode_vs_libwebp():
    """Round-10 retirement of the lossy-WebP guard: the pure-Python
    RFC 6386 keyframe decoder (vp8_codec.py) against the container's
    real libwebp — encode deterministic fixtures across sizes (odd and
    non-multiple-of-16 included) and qualities, then require the decoded
    Y/U/V planes BYTE-EQUAL to WebPDecodeYUV. This exercises the bool
    decoder, segmentation, per-segment quantizers, token decoding with
    probability updates, IDCT/WHT, every intra predictor family the
    encoder picks (16x16 + chroma + 4x4 B modes incl. the above-right
    replication rules), and the normal in-loop deblocking filter.
    Fail-loud paths and the out-of-scope guards are pinned too."""
    import ctypes
    import pytest

    from bigdatainvesttink_spark.operators.vp8_codec import (
        decode_vp8_frame,
        decode_webp_lossy,
    )

    lib = _libwebp_enc_yuv()
    if lib is None:
        pytest.skip("libwebp unavailable (the lossy-VP8 oracle)")

    def encode(rgb: bytes, w: int, h: int, q: float) -> bytes:
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(out))
        assert n > 0
        data = ctypes.string_at(out, n)
        lib.WebPFree(out)
        return data

    def ref_yuv(data: bytes):
        w = ctypes.c_int()
        h = ctypes.c_int()
        u = ctypes.POINTER(ctypes.c_uint8)()
        v = ctypes.POINTER(ctypes.c_uint8)()
        st = ctypes.c_int()
        uv_st = ctypes.c_int()
        y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w),
                              ctypes.byref(h), ctypes.byref(u),
                              ctypes.byref(v), ctypes.byref(st),
                              ctypes.byref(uv_st))
        assert y
        W, H = w.value, h.value
        cw, ch = (W + 1) // 2, (H + 1) // 2

        def rows(ptr, stride, width, height):
            base = ctypes.addressof(ptr.contents)
            return b"".join(
                ctypes.string_at(base + r * stride, width)
                for r in range(height)
            )

        ys = rows(y, st.value, W, H)
        us = rows(u, uv_st.value, cw, ch)
        vs = rows(v, uv_st.value, cw, ch)
        lib.WebPFree(y)
        return W, H, ys, us, vs

    n_checked = 0
    for w, h in ((16, 16), (33, 17), (31, 31), (64, 48), (17, 63)):
        for kind in ("flat", "gradient", "blocks", "noise", "edges"):
            for q in (5, 40, 75, 95):
                rgb = _vp8_test_image(w, h, kind)
                enc = encode(rgb, w, h, q)
                W, H, ys, us, vs = ref_yuv(enc)
                assert (W, H) == (w, h)
                got = decode_webp_lossy(enc)
                assert got["y"] == ys, (kind, w, h, q, "Y plane")
                assert got["u"] == us, (kind, w, h, q, "U plane")
                assert got["v"] == vs, (kind, w, h, q, "V plane")
                n_checked += 1
    assert n_checked == 100

    # fail-loud: interframe flag, bad start code, truncation, bad magic
    good = encode(_vp8_test_image(16, 16, "gradient"), 16, 16, 75)
    payload = bytearray(good[20:])
    with pytest.raises(ValueError, match="truncated"):
        decode_vp8_frame(bytes(payload[:8]))
    inter = bytearray(payload)
    inter[0] |= 1  # key_frame bit inverted (0 = keyframe in VP8)
    with pytest.raises(NotImplementedError, match="interframe"):
        decode_vp8_frame(bytes(inter))
    bad = bytearray(payload)
    bad[3] = 0x00  # start code must be 9d 01 2a
    with pytest.raises(ValueError, match="start code"):
        decode_vp8_frame(bytes(bad))
    with pytest.raises(ValueError, match="overruns"):
        decode_vp8_frame(bytes(payload[:12]))


def test_vp8_tables_match_libwebp_rodata():
    """Provenance pin for _vp8_tables.py: every constant table must
    appear VERBATIM in the container libwebp's binary (the tables were
    extracted from it, and the spec publishes the same values). The kf
    bmode table is stored in RFC 6386 mode order, so the check applies
    the inverse of the libwebp-enum permutation (libwebp renumbers
    B_RD/B_VR/B_LD relative to the RFC; the two easy-to-spot-check rows
    [0][0] and [9][9] are fixed points of that permutation, which is
    exactly how a raw extraction can LOOK verified while decoding
    B_PRED macroblocks wrong — the end-to-end YUV identity test above
    caught it)."""
    import ctypes.util
    import struct as _struct

    import pytest

    from bigdatainvesttink_spark.operators._vp8_tables import (
        _AC_Q,
        _COEFF_BANDS,
        _COEFF_PROBS,
        _COEFF_UPDATE_PROBS,
        _DC_Q,
        _KF_BMODE_PROBS,
    )

    path = ctypes.util.find_library("webp")
    so = None
    for cand in (f"/lib/x86_64-linux-gnu/{path}", path or ""):
        try:
            with open(cand, "rb") as f:
                so = f.read()
            break
        except OSError:
            continue
    if so is None:
        pytest.skip("libwebp binary not readable for table re-extraction")

    assert so.find(_DC_Q) >= 0, "dc dequant table not found in libwebp"
    assert so.find(_struct.pack("<128H", *_AC_Q)) >= 0
    assert so.find(_COEFF_BANDS) >= 0
    assert so.find(_COEFF_PROBS) >= 0
    assert so.find(_COEFF_UPDATE_PROBS) >= 0
    # invert the RFC->libwebp B-mode permutation before searching
    perm = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)
    lw = bytearray(900)
    for a in range(10):
        for le in range(10):
            src = (a * 10 + le) * 9
            dst = (perm[a] * 10 + perm[le]) * 9
            lw[dst:dst + 9] = _KF_BMODE_PROBS[src:src + 9]
    assert so.find(bytes(lw)) >= 0, "kf bmode table (libwebp order)"
    # and the raw RFC-order table must NOT be what libwebp stores
    # (the permutation is real: 10x10x9 with 2 fixed-point anchor rows)
    assert bytes(lw) != _KF_BMODE_PROBS


def test_vp8_rgba_conversion_through_seam(spark):
    """The decode_image RGBA path for lossy WebP: point upsampling +
    libwebp's integer BT.601 conversion. On a chroma-flat image the
    fancy-vs-point upsampling difference vanishes, so the RGBA output
    must equal WebPDecodeRGBA EXACTLY; the metadata flows through the
    same mapInPandas seam as every other format."""
    import ctypes

    import pytest

    from bigdatainvesttink_spark.operators.multimodal import decode_image

    lib = _libwebp_enc_yuv()
    full = _libwebp()
    if lib is None or full is None:
        pytest.skip("libwebp unavailable")

    # luma gradient, constant chroma: upsampling-filter-proof content
    w, h = 32, 32
    rgb = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            g = (x * 4 + y * 3) % 256
            i = (y * w + x) * 3
            rgb[i:i + 3] = (g, g, g)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(bytes(rgb), w, h, w * 3, 75.0, ctypes.byref(out))
    enc = ctypes.string_at(out, n)
    lib.WebPFree(out)

    ww = ctypes.c_int()
    hh = ctypes.c_int()
    ref_ptr = full.WebPDecodeRGBA(enc, len(enc), ctypes.byref(ww),
                                  ctypes.byref(hh))
    ref = ctypes.string_at(ref_ptr, w * h * 4)
    lib.WebPFree(ref_ptr)

    got = decode_image(enc)
    assert (got["width"], got["height"], got["fmt"]) == (w, h, "webp")
    assert bytes(got["decoded_pixels"]) == ref


def _vp8x_rgba_fixture(w: int, h: int, kind: str) -> bytes:
    """RGBA fixtures whose ALPHA channel varies (WebPEncodeRGBA only
    writes a VP8X+ALPH container when the alpha plane is non-trivial):
    flat/step alphas favor the none filter, gradients the directional
    ones, noise the raw/vertical choices."""
    rgba = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 4
            if kind == "steps":
                a = 255 if (x // 4 + y // 4) % 2 else 80
                rgba[i:i + 4] = (120, 130, 140, a)
            elif kind == "vgrad":
                rgba[i:i + 4] = (10, 200, 30, (y * 255) // max(h - 1, 1))
            elif kind == "hgrad":
                rgba[i:i + 4] = (200, 20, 30, (x * 255) // max(w - 1, 1))
            elif kind == "dgrad":
                a = ((x + y) * 255) // max(w + h - 2, 1)
                rgba[i:i + 4] = (60, 70, 80, a)
            else:  # noise
                hsh = (x * 2654435761 + y * 40503 + 99) & 0xFFFFFFFF
                rgba[i:i + 4] = ((hsh >> 8) & 255, (hsh >> 16) & 255,
                                 (hsh >> 3) & 255, (hsh >> 24) & 255)
    return bytes(rgba)


def _libwebp_rgba():
    """WebPEncodeRGBA/WebPDecodeRGBA entry points for the VP8X oracle."""
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    return lib


def test_vp8x_alpha_decode_vs_libwebp():
    """Round-10 retirement of the VP8X still-image guard: libwebp
    encodes RGBA fixtures with non-trivial alpha (WebPEncodeRGBA at
    lossy quality emits VP8X+ALPH+VP8), and (a) this decoder's ALPHA
    channel must be BYTE-EQUAL to WebPDecodeRGBA's — alpha is coded
    losslessly (raw or headerless VP8L + spatial filter), so exactness
    is the spec, not luck; (b) the lossy Y/U/V planes under the VP8X
    wrapper must stay byte-equal to WebPDecodeYUV, proving the
    container walk hands the inner `VP8 ` chunk over unmangled."""
    import ctypes

    import pytest

    from bigdatainvesttink_spark.operators.webp_codec import (
        decode_webp_extended,
    )

    lib = _libwebp_rgba()
    yuv = _libwebp_enc_yuv()
    if lib is None or yuv is None:
        pytest.skip("libwebp unavailable (the VP8X oracle)")

    def encode(rgba: bytes, w: int, h: int, q: float) -> bytes:
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, q, ctypes.byref(out))
        assert n > 0
        data = ctypes.string_at(out, n)
        lib.WebPFree(out)
        return data

    def ref_rgba(data: bytes):
        w = ctypes.c_int()
        h = ctypes.c_int()
        p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                               ctypes.byref(h))
        assert p
        buf = ctypes.string_at(p, w.value * h.value * 4)
        lib.WebPFree(p)
        return w.value, h.value, buf

    import struct as _struct

    def alph_modes(data: bytes):
        pos = 30
        while pos + 8 <= len(data):
            cc = data[pos:pos + 4]
            (clen,) = _struct.unpack("<I", data[pos + 4:pos + 8])
            if cc == b"ALPH":
                b0 = data[pos + 8]
                return (b0 >> 2) & 3, b0 & 3
            pos += 8 + clen + (clen & 1)
        return None

    seen_filters: set[int] = set()
    n_checked = 0
    for w, h in ((32, 24), (17, 13), (16, 16), (33, 31), (64, 48)):
        for kind in ("steps", "vgrad", "hgrad", "dgrad", "noise"):
            for q in (30.0, 75.0, 95.0):
                rgba = _vp8x_rgba_fixture(w, h, kind)
                enc = encode(rgba, w, h, q)
                assert enc[12:16] == b"VP8X", "fixture alpha too trivial"
                W, H, ref = ref_rgba(enc)
                assert (W, H) == (w, h)
                got = decode_webp_extended(enc)
                assert (got["width"], got["height"]) == (w, h)
                assert got["has_alpha"]
                assert got["pixels"][3::4] == ref[3::4], (
                    kind, w, h, q, "alpha plane")
                modes = alph_modes(enc)
                assert modes is not None
                seen_filters.add(modes[0])
                n_checked += 1
    assert n_checked == 75
    # libwebp's filter heuristic picks at least two distinct filters
    # across these fixtures (none + a directional one) — if this ever
    # degenerates to {0} the oracle stopped exercising the unfilters
    assert len(seen_filters) >= 2, seen_filters

    # (b) the inner lossy frame: YUV byte-equal under the VP8X wrapper
    enc = encode(_vp8x_rgba_fixture(33, 31, "dgrad"), 33, 31, 75.0)
    wv = ctypes.c_int()
    hv = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    st = ctypes.c_int()
    uv_st = ctypes.c_int()
    y = yuv.WebPDecodeYUV(enc, len(enc), ctypes.byref(wv), ctypes.byref(hv),
                          ctypes.byref(u), ctypes.byref(v), ctypes.byref(st),
                          ctypes.byref(uv_st))
    assert y
    from bigdatainvesttink_spark.operators.vp8_codec import decode_vp8_frame

    pos, vp8_payload = 30, None
    while pos + 8 <= len(enc):
        cc = enc[pos:pos + 4]
        (clen,) = _struct.unpack("<I", enc[pos + 4:pos + 8])
        if cc == b"VP8 ":
            vp8_payload = enc[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    assert vp8_payload is not None
    d = decode_vp8_frame(vp8_payload)
    W, H = wv.value, hv.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    base = ctypes.addressof(y.contents)
    ys = b"".join(ctypes.string_at(base + r * st.value, W) for r in range(H))
    ub = ctypes.addressof(u.contents)
    vb = ctypes.addressof(v.contents)
    us = b"".join(ctypes.string_at(ub + r * uv_st.value, cw)
                  for r in range(ch))
    vs = b"".join(ctypes.string_at(vb + r * uv_st.value, cw)
                  for r in range(ch))
    yuv.WebPFree(y)
    assert d["y"] == ys and d["u"] == us and d["v"] == vs


def test_vp8x_alpha_filters_and_raw_vs_libwebp():
    """All four ALPH spatial filters x raw compression, each against
    libwebp: filter a known alpha plane per the container spec (mod-256
    deltas from the none/horizontal/vertical/gradient predictor), build
    a raw (C=0) ALPH chunk, splice it into a real libwebp VP8X
    container in place of the encoder's own ALPH, and require (a)
    libwebp's WebPDecodeRGBA accepts the spliced container and
    unfilters back to the intended plane — proving the hand-built chunk
    is spec-valid — and (b) this decoder's alpha equals both."""
    import ctypes
    import struct as _struct

    import pytest

    from bigdatainvesttink_spark.operators.webp_codec import (
        decode_webp_extended,
    )

    lib = _libwebp_rgba()
    if lib is None:
        pytest.skip("libwebp unavailable (the VP8X oracle)")

    w, h = 21, 17
    rgba = _vp8x_rgba_fixture(w, h, "dgrad")
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, 75.0, ctypes.byref(out))
    assert n > 0
    orig = ctypes.string_at(out, n)
    lib.WebPFree(out)
    assert orig[12:16] == b"VP8X"

    # pull the original chunks apart
    pos, kept = 30, []
    while pos + 8 <= len(orig):
        cc = orig[pos:pos + 4]
        (clen,) = _struct.unpack("<I", orig[pos + 4:pos + 8])
        if cc != b"ALPH":
            kept.append(orig[pos:pos + 8 + clen + (clen & 1)])
        pos += 8 + clen + (clen & 1)

    # a plane that varies in both axes (every filter's deltas differ)
    plane = bytes(((x * 5 + y * 11 + (x * y) // 3) % 256)
                  for y in range(h) for x in range(w))

    def spec_filter(vals: bytes, method: int) -> bytes:
        if method == 0:
            return vals
        out_b = bytearray(w * h)
        for y0 in range(h):
            for x0 in range(w):
                i = y0 * w + x0
                if y0 == 0:
                    pred = 0 if x0 == 0 else vals[i - 1]
                elif x0 == 0:
                    pred = vals[i - w]
                elif method == 1:
                    pred = vals[i - 1]
                elif method == 2:
                    pred = vals[i - w]
                else:
                    g = vals[i - 1] + vals[i - w] - vals[i - w - 1]
                    pred = 0 if g < 0 else (255 if g > 255 else g)
                out_b[i] = (vals[i] - pred) & 0xFF
        return bytes(out_b)

    for method in (0, 1, 2, 3):
        payload = bytes([method << 2]) + spec_filter(plane, method)
        chunk = b"ALPH" + _struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        body = orig[12:30] + chunk + b"".join(kept)
        spliced = b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WEBP" + body

        ww = ctypes.c_int()
        hh = ctypes.c_int()
        p = lib.WebPDecodeRGBA(spliced, len(spliced), ctypes.byref(ww),
                               ctypes.byref(hh))
        assert p, f"libwebp rejected the spliced container (filter {method})"
        ref = ctypes.string_at(p, w * h * 4)
        lib.WebPFree(p)
        assert ref[3::4] == plane, f"oracle disagrees on filter {method}"

        got = decode_webp_extended(spliced)
        assert got["pixels"][3::4] == plane, f"filter {method}"
        # RGB must be untouched by the alpha splice
        o = decode_webp_extended(orig)
        for c in range(3):
            assert got["pixels"][c::4] == o["pixels"][c::4]


def test_vp8x_lossless_and_metadata_chunks():
    """VP8X wrapping a VP8L frame (lossless still in the extended
    container) and skippable metadata chunks: wrap a libwebp-encoded
    VP8L chunk in a hand-built VP8X container with EXIF (odd-length, so
    the even-padding walk is exercised) and XMP chunks; libwebp must
    accept the wrapper and decode identical RGBA — proving the wrapper
    is spec-valid — and this decoder must match it, flag the metadata,
    and guard animation / malformed layouts loudly."""
    import ctypes
    import struct as _struct

    import pytest

    from bigdatainvesttink_spark.operators.webp_codec import (
        decode_webp_extended,
        decode_webp_lossless,
    )

    lib = _libwebp()
    rgba_lib = _libwebp_rgba()
    if lib is None or rgba_lib is None:
        pytest.skip("libwebp unavailable (the VP8X oracle)")

    w, h = 19, 11
    rgba = _vp8x_rgba_fixture(w, h, "steps")
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n > 0
    plain = ctypes.string_at(out, n)
    lib.WebPFree(out)
    assert plain[12:16] == b"VP8L"
    vp8l_chunk = plain[12:]

    def le24(v: int) -> bytes:
        return _struct.pack("<I", v)[:3]

    exif = b"EXIF" + _struct.pack("<I", 5) + b"fake\x00" + b"\x00"  # padded
    xmp = b"XMP " + _struct.pack("<I", 4) + b"<x/>"
    # flags: alpha(0x10) + EXIF(0x08) + XMP(0x04)
    vp8x = (b"VP8X" + _struct.pack("<I", 10) + bytes([0x1C]) + b"\x00" * 3
            + le24(w - 1) + le24(h - 1))
    body = b"WEBP" + vp8x + exif + vp8l_chunk + xmp
    wrapped = b"RIFF" + _struct.pack("<I", len(body)) + body

    ww = ctypes.c_int()
    hh = ctypes.c_int()
    p = rgba_lib.WebPDecodeRGBA(wrapped, len(wrapped), ctypes.byref(ww),
                                ctypes.byref(hh))
    assert p, "libwebp rejected the hand-built VP8X wrapper"
    ref = ctypes.string_at(p, w * h * 4)
    rgba_lib.WebPFree(p)

    got = decode_webp_extended(wrapped)
    assert got["pixels"] == ref == decode_webp_lossless(plain)["pixels"]
    assert got["has_exif"] and got["has_xmp"] and not got["has_iccp"]

    # fail-loud layouts
    def container(*chunks: bytes, flags: int = 0x10) -> bytes:
        vx = (b"VP8X" + _struct.pack("<I", 10) + bytes([flags])
              + b"\x00" * 3 + le24(w - 1) + le24(h - 1))
        b = b"WEBP" + vx + b"".join(chunks)
        return b"RIFF" + _struct.pack("<I", len(b)) + b

    anim = b"ANIM" + _struct.pack("<I", 6) + b"\x00" * 6
    with pytest.raises(NotImplementedError, match="animated|ANIM"):
        decode_webp_extended(container(anim, vp8l_chunk, flags=0x12))
    tiny_vp8l = b"VP8L" + _struct.pack("<I", 4) + b"\x2f\x00\x00\x00"
    with pytest.raises(ValueError, match="duplicate"):
        decode_webp_extended(container(tiny_vp8l, vp8l_chunk))
    with pytest.raises(ValueError, match="exactly one"):
        decode_webp_extended(container(exif))
    # canvas dims disagree with the frame
    vx_bad = (b"VP8X" + _struct.pack("<I", 10) + bytes([0x10]) + b"\x00" * 3
              + le24(w + 3) + le24(h - 1))
    b_bad = b"WEBP" + vx_bad + vp8l_chunk
    with pytest.raises(ValueError, match="canvas"):
        decode_webp_extended(b"RIFF" + _struct.pack("<I", len(b_bad)) + b_bad)
    # ALPH header guards: reserved bits, unknown compression, truncation
    from bigdatainvesttink_spark.operators.webp_codec import (
        _decode_alpha_chunk,
    )

    with pytest.raises(ValueError, match="reserved"):
        _decode_alpha_chunk(b"\xc0" + b"\x00" * (w * h), w, h)
    with pytest.raises(ValueError, match="compression"):
        _decode_alpha_chunk(b"\x02" + b"\x00" * (w * h), w, h)
    with pytest.raises(ValueError, match="truncated"):
        _decode_alpha_chunk(b"\x00" + b"\x00" * (w * h - 2), w, h)


def test_lz4_dictionary_decode(tmp_path):
    """LZ4 dictionary frames decode for real (round 10, the lz4 sibling
    of the retired zstd-dictionary guard). Oracle: the container's
    actual lz4 CLI compresses payloads with -D across block modes —
    independent AND linked (-BD), single- and multi-block (-B4 at 64 KB
    with >64 KB payloads), high compression (-12) — and the pure-Python
    decoder must reproduce every original byte-exactly. Dictionary
    kinds pin the spec's raw-content semantics: plain text, a >64 KB
    blob (only the LAST 64 KB may be referenced), and a zstd-TRAINED
    structured dictionary which lz4 must treat as raw history bytes
    (no RFC 8878 parsing — the asymmetry with decode_zstd). The
    missing-dictionary failure mode is also pinned: lz4 -D never sets
    the DictID flag, so the error surfaces as a match offset past the
    window, not a loud up-front raise (that path is covered in
    test_compress_codec_edge_frames with a hand-flagged frame)."""
    import shutil
    import subprocess

    import pytest

    from bigdatainvesttink_spark.operators.compress_codec import (
        decode_lz4_frame,
        decompress_payload,
    )

    lz4_cli = shutil.which("lz4")
    if lz4_cli is None:
        pytest.skip("lz4 CLI unavailable (the dictionary oracle)")

    vocab = (b"market data pipeline candle volume ticker feed "
             b"orders lineitem shipment quantity discount revenue ")

    dicts = {
        "text": vocab * 120,
        "big": bytes((i * 7 + 3) % 251 for i in range(200_000)) + vocab * 60,
    }
    zstd_cli = shutil.which("zstd")
    if zstd_cli is not None:
        samples = []
        for i in range(40):
            p = tmp_path / f"s{i}.txt"
            p.write_bytes(vocab * 3 + b"record=%d " % i + vocab[i % 40:] * 2)
            samples.append(str(p))
        r = subprocess.run(
            [zstd_cli, "--train", *samples, "-o", str(tmp_path / "zd.dict"),
             "--maxdict=8192", "-q"], capture_output=True)
        if r.returncode == 0:
            dicts["zstd_trained"] = (tmp_path / "zd.dict").read_bytes()

    def payloads():
        yield "overlap", (vocab * 1500)[:70_000]          # dict-heavy, 2 blocks at -B4
        yield "mixed", (vocab * 2 + bytes(range(256)) * 40) * 3
        yield "rand", bytes((i * 13 + 5) % 256 for i in range(5000))
        yield "tiny", vocab[:40]

    n_ok = 0
    for dname, dblob in dicts.items():
        dpath = tmp_path / f"{dname}.dict"
        dpath.write_bytes(dblob)
        for pname, p in payloads():
            ppath = tmp_path / "p.bin"
            ppath.write_bytes(p)
            for extra in ([], ["-BD"], ["-B4"], ["-BD", "-B4"], ["-12"]):
                cpath = tmp_path / "c.lz4"
                subprocess.run(
                    [lz4_cli, "-f", "-q", "-D", str(dpath), *extra,
                     str(ppath), str(cpath)],
                    check=True, capture_output=True)
                enc = cpath.read_bytes()
                got = decode_lz4_frame(enc, dictionary=dblob)
                assert got == p, (dname, pname, extra)
                # the decompress_payload seam threads the dictionary
                # (and must route around pyarrow, whose codec API takes
                # none) — same bytes either way
                assert decompress_payload(
                    enc, "lz4", dictionary=dblob) == p
                assert decompress_payload(
                    enc, "auto", dictionary=dblob) == p
                n_ok += 1
    assert n_ok >= 40

    # missing dictionary: a dict-referencing frame must fail loud as a
    # window violation, never decode to silently wrong bytes
    ppath = tmp_path / "p.bin"
    ppath.write_bytes((vocab * 1500)[:30_000])
    dpath = tmp_path / "text.dict"
    cpath = tmp_path / "c.lz4"
    subprocess.run([lz4_cli, "-f", "-q", "-D", str(dpath), str(ppath),
                    str(cpath)], check=True, capture_output=True)
    with pytest.raises(ValueError, match="offset out of range"):
        decode_lz4_frame(cpath.read_bytes())
    # wrong algo pairing still fails loud
    with pytest.raises(ValueError, match="zstd/lz4"):
        decompress_payload(b"\x00", "snappy", dictionary=b"d")


def test_xz_bz2_decompress_paths(tmp_path):
    """The xz/bz2 additions to the decompress seam (stdlib-tier like
    gzip/zlib): auto-sniff magics, multi-stream concatenation with xz
    stream padding (corpus dumps concatenate members), and truncation
    fail-louds. Oracle for xz: the container's xz CLI, an independent
    liblzma build path from the stdlib module's."""
    import bz2
    import lzma
    import shutil
    import subprocess

    import pytest

    from bigdatainvesttink_spark.operators.compress_codec import (
        decompress_payload,
    )

    blob_a = b"wikipedia dump article text " * 400
    blob_b = b"second member, different bytes " * 300

    # stdlib-made streams through the seam, auto-sniffed
    assert decompress_payload(lzma.compress(blob_a), "auto") == blob_a
    assert decompress_payload(bz2.compress(blob_a), "auto") == blob_a
    # concatenated members decode to the concatenation (gzip-path rule)
    xz2 = lzma.compress(blob_a) + lzma.compress(blob_b)
    bz2_2 = bz2.compress(blob_a) + bz2.compress(blob_b)
    assert decompress_payload(xz2, "xz") == blob_a + blob_b
    assert decompress_payload(bz2_2, "bz2") == blob_a + blob_b
    # xz stream padding between members (4-byte aligned nulls)
    padded = lzma.compress(blob_a) + b"\x00" * 8 + lzma.compress(blob_b)
    assert decompress_payload(padded, "xz") == blob_a + blob_b
    # truncation fails loud
    with pytest.raises((ValueError, lzma.LZMAError)):
        decompress_payload(lzma.compress(blob_a)[:-9], "xz")
    with pytest.raises((ValueError, OSError, EOFError)):
        decompress_payload(bz2.compress(blob_a)[:-9], "bz2")

    # CLI cross-check (xz CLI links its own liblzma entry path)
    xz_cli = shutil.which("xz")
    if xz_cli is not None:
        p = tmp_path / "a.bin"
        p.write_bytes(blob_a)
        subprocess.run([xz_cli, "-f", "-9", str(p)], check=True,
                       capture_output=True)
        enc = (tmp_path / "a.bin.xz").read_bytes()
        assert decompress_payload(enc, "auto") == blob_a


def _libbrotli_enc():
    """libbrotlienc one-shot compress (test oracle only)."""
    import ctypes

    try:
        lib = ctypes.CDLL("libbrotlienc.so.1")
    except OSError:
        return None
    lib.BrotliEncoderCompress.restype = ctypes.c_int
    lib.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
    ]

    def compress(data: bytes, quality: int, lgwin: int = 22,
                 mode: int = 0) -> bytes:
        import ctypes as ct

        n = ct.c_size_t(len(data) * 2 + 1024)
        buf = ct.create_string_buffer(n.value)
        ok = lib.BrotliEncoderCompress(quality, lgwin, mode, len(data),
                                       data, ct.byref(n), buf)
        assert ok, "libbrotlienc refused input"
        return buf.raw[:n.value]

    return compress


def _brotli_corpus(kind: str, n: int) -> bytes:
    if kind == "text":
        base = (b"The quick brown fox jumps over the lazy dog. Public "
                b"domain example text with words like time down life left "
                b"back code data show only site city open just like free "
                b"work. ")
        return (base * (n // len(base) + 1))[:n]
    if kind == "html":
        base = (b'<div class="item"><a href="http://example.com/page?id='
                b'%d">Link</a> <input type="hidden" name="tok"/></div>\n')
        return b"".join(base % i for i in range(n // 100 + 1))[:n]
    if kind == "rand":
        out = bytearray()
        x = 12345
        for _ in range(n):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            out.append((x >> 16) & 255)
        return bytes(out)
    # runs
    return b"".join(bytes([i % 7]) * (i % 97 + 1)
                    for i in range(n // 40 + 1))[:n]


def test_brotli_decode_vs_libbrotli():
    """Round-10 addition of the web-corpus codec: the pure-Python
    RFC 7932 decoder (brotli_codec.py) against the container's real
    libbrotlienc — every (content kind, size, quality 0-11, window)
    combination must reproduce the original BYTE-EXACTLY. The sweep
    exercises the whole format: simple and complex prefix codes with
    brotli's cumulative 16/17 repeats, multi-block-type streams with
    context maps (RLE + inverse-MTF), all four literal context modes,
    the 704-symbol command alphabet, the distance ring buffer with its
    15 short codes, static-dictionary references with transforms, and
    uncompressed meta-blocks (quality 0 on incompressible input).

    The BLOCK-COUNT CODE TAIL gets explicit regression fixtures below
    (test_brotli_crafted_streams): symbol 18 is (369, 7 extra) and 19
    is (497, 8) — a deflate-intuition tail (369,6)/(433,7) decodes 45 KB
    of a multi-block-type stream self-consistently before desyncing,
    which is exactly how the bug evaded the first sweep."""
    import pytest

    compress = _libbrotli_enc()
    if compress is None:
        pytest.skip("libbrotlienc unavailable (the brotli oracle)")

    from bigdatainvesttink_spark.operators.brotli_codec import decode_brotli

    n_ok = 0
    for kind in ("text", "html", "rand", "runs"):
        for n in (10, 1000, 300000):
            d = _brotli_corpus(kind, n)
            for q in (0, 1, 2, 5, 9, 11):
                for w in (10, 22):
                    enc = compress(d, q, w)
                    assert decode_brotli(enc) == d, (kind, n, q, w)
                    n_ok += 1
    assert n_ok == 144
    # one 1 MB stream end-to-end (multi-meta-block at small windows)
    d = _brotli_corpus("html", 1_000_000)
    assert decode_brotli(compress(d, 5, 18)) == d
    # empty input
    assert decode_brotli(compress(b"", 9)) == b""


def test_brotli_tables_provenance_and_transforms():
    """The runtime-loaded format constants (static dictionary,
    transforms, context LUT) pinned against known anchors, and the
    transform engine cross-validated against libbrotlicommon's own
    BrotliTransformDictionaryWord for ALL 121 transforms x a word
    sample — catching any divergence in the omit/ferment/prefix-suffix
    semantics independent of the entropy layer."""
    import ctypes

    import pytest

    from bigdatainvesttink_spark.operators.brotli_codec import (
        _brotli_tables,
        _transform_word,
    )

    t = _brotli_tables()
    if t is None:
        pytest.skip("libbrotlicommon unavailable")
    assert t["dict_data"][:16] == b"timedownlifeleft"
    assert len(t["dict_data"]) == 122784
    assert t["n_transforms"] == 121
    assert len(t["prefix_suffix"]) == 217
    assert t["size_bits"][4] == 10 and t["size_bits"][24] == 5
    # context LUT: LSB6 is identity&63, MSB6 is >>2, second half zero
    lut = t["context_lut"]
    assert len(lut) == 2048
    assert all(lut[i] == (i & 63) for i in range(256))
    assert all(lut[512 + i] == (i >> 2) for i in range(256))

    lib = ctypes.CDLL("libbrotlicommon.so.1")
    lib.BrotliGetTransforms.restype = ctypes.c_void_p
    lib.BrotliTransformDictionaryWord.restype = ctypes.c_int
    lib.BrotliTransformDictionaryWord.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int,
    ]
    trans = lib.BrotliGetTransforms()
    words = [b"time", b"working", b"Example\xc3\xa9abc", b"the of look",
             b"abcdefghijklmnopqrstuvwx"]
    n_checked = 0
    for w in words:
        for tid in range(121):
            buf = ctypes.create_string_buffer(len(w) + 32)
            n = lib.BrotliTransformDictionaryWord(buf, w, len(w), trans,
                                                 tid)
            assert _transform_word(t, w, tid) == buf.raw[:n], (w, tid)
            n_checked += 1
    assert n_checked == 605


class _BrotliWriter:
    """LSB-first bit writer for hand-crafted RFC 7932 fixtures (the
    probing tool that found the block-count-tail bug: craft a stream
    under this decoder's semantics, require libbrotli to accept it and
    produce the same bytes)."""

    def __init__(self):
        self.bits = []

    def w(self, v, n):
        assert 0 <= v < (1 << n)
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def wcode(self, code, length):  # prefix code word, MSB first
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def to_bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i // 8] |= 1 << (i % 8)
        return bytes(out)


def _libbrotli_dec():
    import ctypes

    try:
        lib = ctypes.CDLL("libbrotlidec.so.1")
    except OSError:
        return None
    lib.BrotliDecoderDecompress.restype = ctypes.c_int
    lib.BrotliDecoderDecompress.argtypes = [
        ctypes.c_size_t, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
    ]

    def dec(data: bytes, cap: int = 1 << 22):
        import ctypes as ct

        out = ct.create_string_buffer(cap)
        sz = ct.c_size_t(cap)
        r = lib.BrotliDecoderDecompress(len(data), data, ct.byref(sz), out)
        return r, out.raw[:sz.value]

    return dec


def test_brotli_crafted_streams():
    """Hand-assembled streams over the corners the encoder rarely
    emits, each validated BOTH ways: libbrotli must accept the fixture
    and decode it to the predicted bytes, and this decoder must match.
    Covers: the block-count tail (symbols 17/18/19 — the (369,7)/(497,8)
    rows whose misreading decodes 45 KB self-consistently before
    desyncing), block-type switching with a 3-tree context map (RLE
    zero-runs + inverse-MTF), metadata meta-blocks (skipped), and an
    uncompressed meta-block mixed with a compressed one."""
    import pytest

    refdec = _libbrotli_dec()
    if refdec is None:
        pytest.skip("libbrotlidec unavailable")

    import bigdatainvesttink_spark.operators.brotli_codec as B
    from bigdatainvesttink_spark.operators.brotli_codec import decode_brotli

    def craft_count(sym: int) -> tuple[bytes, bytes]:
        cnt = B._BLK_BASE[sym]
        total = cnt + 2
        w = _BrotliWriter()
        w.w(0, 1); w.w(1, 1); w.w(0, 1)
        nib = 4
        while total > (1 << (4 * nib)):
            nib += 1
        w.w(nib - 4, 2); w.w(total - 1, 4 * nib)
        w.w(1, 1); w.w(0, 3)                    # NBLTYPESL=2
        w.w(1, 2); w.w(0, 2); w.w(1, 2)         # type code: single "+1"
        w.w(1, 2); w.w(0, 2); w.w(sym, 5)       # count code: single sym
        w.w(0, B._BLK_EXTRA[sym])               # first count = base
        w.w(0, 1); w.w(0, 1)                    # I/D single-type
        w.w(0, 2); w.w(0, 4)                    # NPOSTFIX/NDIRECT
        w.w(0, 2); w.w(0, 2)                    # CMODEs LSB6
        w.w(1, 1); w.w(0, 3)                    # NTREESL=2
        w.w(0, 1)                               # map: no RLE
        w.w(1, 2); w.w(1, 2); w.w(0, 1); w.w(1, 1)  # simple {0,1}
        for _ in range(64):
            w.wcode(0, 1)
        for _ in range(64):
            w.wcode(1, 1)
        w.w(0, 1)                               # IMTF off
        w.w(0, 1)                               # NTREESD=1
        w.w(1, 2); w.w(0, 2); w.w(97, 8)        # lit0 = 'a'
        w.w(1, 2); w.w(0, 2); w.w(66, 8)        # lit1 = 'B'
        code = next(k for k in range(23, -1, -1)
                    if B._INS_BASE[k] <= total
                    and total - B._INS_BASE[k] < (1 << B._INS_EXTRA[k]))
        r = next(r for r in range(9)
                 if B._INS_RANGE_LUT[r] <= code <= B._INS_RANGE_LUT[r] + 7)
        cmd = ((r + 2) << 6) | ((code - B._INS_RANGE_LUT[r]) << 3)
        w.w(1, 2); w.w(0, 2); w.w(cmd, 10)      # cmd code: single
        w.w(1, 2); w.w(0, 2); w.w(0, 6)         # dist code: single
        if B._INS_EXTRA[code]:
            w.w(total - B._INS_BASE[code], B._INS_EXTRA[code])
        w.w(0, B._BLK_EXTRA[sym])               # switch count extra
        return w.to_bytes(), b"a" * cnt + b"BB"

    for sym in (8, 12, 16, 17, 18, 19):  # incl. the misreadable tail
        s, exp = craft_count(sym)
        rc, ref = refdec(s)
        assert rc == 1 and ref == exp, f"libbrotli rejects fixture {sym}"
        assert decode_brotli(s) == exp, f"count symbol {sym}"

    # metadata block + uncompressed meta-block + compressed final block
    w = _BrotliWriter()
    w.w(0, 1)                  # WBITS 16
    # metadata meta-block: ISLAST=0, MNIBBLES=3 code, skip 5 bytes
    w.w(0, 1); w.w(3, 2); w.w(0, 1); w.w(1, 2); w.w(4, 8)
    while len(w.bits) % 8:
        w.w(0, 1)
    for ch in b"META!":
        w.w(ch, 8)
    # uncompressed meta-block "raw" (ISLAST=0, ISUNCOMPRESSED)
    w.w(0, 1); w.w(0, 2); w.w(2, 16); w.w(1, 1)
    while len(w.bits) % 8:
        w.w(0, 1)
    for ch in b"raw":
        w.w(ch, 8)
    # final compressed block: 4 literals "done" via a 4-symbol simple
    # code with tree-select (lengths 1,2,3,3)
    w.w(1, 1); w.w(0, 1); w.w(0, 2); w.w(3, 16)
    for _ in range(3):
        w.w(0, 1)
    w.w(0, 2); w.w(0, 4); w.w(0, 2)
    w.w(0, 1); w.w(0, 1)
    w.w(1, 2); w.w(3, 2)       # simple, NSYM=4
    for ch in b"donX":           # d,o,n + one filler symbol
        w.w(ch, 8)
    w.w(1, 1)                  # tree-select: lengths 1,2,3,3
    cmd = (0 << 6) | (4 << 3) | 0   # implicit; il=4, cl=2 (unused)
    w.w(1, 2); w.w(0, 2); w.w(cmd, 10)
    w.w(1, 2); w.w(0, 2); w.w(0, 6)
    # literals "dond": canonical by (length, symbol): d(100)->'0',
    # o(111)->'10', X(88)->'110', n(110)->'111'
    w.wcode(0, 1); w.wcode(2, 2); w.wcode(7, 3); w.wcode(0, 1)
    s = w.to_bytes()
    rc, ref = refdec(s)
    assert rc == 1 and ref == b"rawdond", "libbrotli rejects the fixture"
    assert decode_brotli(s) == b"rawdond"

    # fail-louds: truncation, trailing garbage, reserved WBITS
    comp = _libbrotli_enc()
    if comp is not None:
        good = comp(b"hello hello hello", 5)
        with pytest.raises(ValueError):
            decode_brotli(good[:-2])
        with pytest.raises(ValueError, match="trailing"):
            decode_brotli(good + b"\xff")


def test_brotli_through_decompress_seam():
    """decompress_payload('brotli'): pyarrow's C codec on the native
    path and the pure-Python decoder agree byte-for-byte; brotli has NO
    magic number so `auto` must reject it by construction."""
    import pytest

    import pyarrow as pa

    from bigdatainvesttink_spark.operators.compress_codec import (
        decompress_payload,
    )

    compress = _libbrotli_enc()
    if compress is None:
        pytest.skip("libbrotlienc unavailable (the brotli oracle)")
    blob = _brotli_corpus("html", 50000)
    enc = compress(blob, 7)
    assert decompress_payload(enc, "brotli", prefer_native=True) == blob
    assert decompress_payload(enc, "brotli", prefer_native=False) == blob
    if pa.Codec.is_available("brotli"):
        # pyarrow's brotli needs the size up front (why brotli has no
        # native fast path in the seam) — still a second C cross-check
        assert bytes(pa.Codec("brotli").decompress(enc, len(blob))) == blob
    with pytest.raises(ValueError, match="no self-describing magic"):
        decompress_payload(enc, "auto")


def test_decompress_docs_dictionary_shard(spark, tmp_path):
    """The shard-dictionary corpus layout through the Spark seam:
    documents compressed with a shared zstd dictionary (the container's
    zstd CLI as producer), decompressed executor-side by
    decompress_docs(dictionary=) byte-exactly — and the same payloads
    FAIL loud without the dictionary instead of yielding junk."""
    import shutil
    import subprocess

    import pytest
    from pyspark.sql import functions as F

    from bigdatainvesttink_spark.io import load_table
    from bigdatainvesttink_spark.operators.compress_codec import (
        decompress_docs,
    )

    zstd_cli = shutil.which("zstd")
    if zstd_cli is None:
        pytest.skip("zstd CLI unavailable (the dictionary producer)")

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("text") != "")
        .select("doc_id", "text")
        .limit(48)
        .collect()
    )
    assert docs
    for i, r in enumerate(docs):
        (tmp_path / f"s{i}.txt").write_bytes(r["text"].encode())
    train = [str(tmp_path / f"s{i}.txt") for i in range(len(docs))]
    r0 = subprocess.run(
        [zstd_cli, "--train", *train, "-o", str(tmp_path / "shard.dict"),
         "--maxdict=4096", "-q"], capture_output=True)
    if r0.returncode != 0:
        pytest.skip(f"zstd --train refused: {r0.stderr.decode()[:120]}")
    dict_blob = (tmp_path / "shard.dict").read_bytes()

    payloads = []
    for i, r in enumerate(docs):
        subprocess.run(
            [zstd_cli, "-f", "-q", "-D", str(tmp_path / "shard.dict"),
             str(tmp_path / f"s{i}.txt"), "-o", str(tmp_path / f"s{i}.zst")],
            check=True, capture_output=True)
        payloads.append(
            (r["doc_id"], (tmp_path / f"s{i}.zst").read_bytes()))
    want = {r["doc_id"]: r["text"].encode() for r in docs}
    df = spark.createDataFrame(payloads, "doc_id long, content binary")
    got = decompress_docs(df, algo="zstd", dictionary=dict_blob).collect()
    assert len(got) == len(docs)
    for row in got:
        assert bytes(row["content"]) == want[row["doc_id"]]
    # without the dictionary: fail loud (the executor-side ValueError
    # names the missing dictionary id; Spark surfaces it as a
    # PythonException wrapper)
    with pytest.raises(Exception, match="requires dictionary id"):
        decompress_docs(df, algo="zstd").collect()


def test_codec_mutation_fuzz_fail_loud():
    """Corruption robustness for the round-10 decoders: random garbage,
    truncations, and bit-flips of valid streams must either decode (a
    flip can legally produce a different valid stream) or raise
    ValueError/NotImplementedError — never a foreign exception
    (struct.error / IndexError), never a hang. Seeded, so failures
    reproduce. This fuzz FOUND two gaps when first run (unguarded
    struct reads in the VP8X chunk walk and the lz4 frame descriptor);
    the guards it forced are now pinned here."""
    import random

    import pytest

    from bigdatainvesttink_spark.operators.brotli_codec import decode_brotli
    from bigdatainvesttink_spark.operators.compress_codec import (
        decode_lz4_frame,
        encode_lz4_frame,
    )
    from bigdatainvesttink_spark.operators.webp_codec import (
        decode_webp_extended,
    )

    import math

    import pyarrow as pa

    from bigdatainvesttink_spark.operators.flac_codec import (
        decode_flac,
        encode_flac,
    )
    from bigdatainvesttink_spark.operators.gif_codec import (
        decode_gif,
        encode_gif,
    )
    from bigdatainvesttink_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )
    from bigdatainvesttink_spark.operators.zstd_codec import decode_zstd

    rng = random.Random(20261017)
    targets = []

    compress = _libbrotli_enc()
    if compress is not None:
        targets.append(("brotli", decode_brotli,
                        compress(b"fuzz corpus text with words " * 200, 7)))
    lz_dict = b"dict content words " * 50
    lz = encode_lz4_frame(b"payload words dict content " * 30)
    targets.append(("lz4", lambda s: decode_lz4_frame(s, dictionary=lz_dict),
                    lz))
    targets.append(("zstd", decode_zstd,
                    bytes(pa.Codec("zstd").compress(
                        b"zstd fuzz corpus words " * 300))))
    rgb = bytes((x * 5 + y * 3) % 256
                for y in range(24) for x in range(24) for _ in range(3))
    targets.append(("png", decode_image, encode_png(rgb, 24, 24, 3)))
    targets.append(("gif", decode_gif, encode_gif(
        [bytes(i % 16 for i in range(24 * 24))], 24, 24,
        bytes(range(48)) + bytes(768 - 48))))
    targets.append(("flac", decode_flac, encode_flac(
        [int(1000 * math.sin(i / 7)) for i in range(2048)], 8000, 1)))
    from bigdatainvesttink_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    targets.append(("jpeg", decode_jpeg,
                    encode_jpeg_baseline(rgb, 24, 24, nch=3)))
    lib = _libwebp_rgba()
    if lib is not None:
        import ctypes

        rgba = bytes((x * 13 + y * 7 + c) % 256
                     for y in range(24) for x in range(24) for c in range(4))
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeRGBA(rgba, 24, 24, 96, 60.0, ctypes.byref(out))
        targets.append(("vp8x", decode_webp_extended,
                        ctypes.string_at(out, n)))

    assert targets
    for name, fn, base in targets:
        for trial in range(1200):
            mode = trial % 3
            if mode == 0:
                s = bytes(rng.randrange(256)
                          for _ in range(rng.randrange(1, 100)))
            elif mode == 1:
                s = base[:rng.randrange(len(base))]
            else:
                b = bytearray(base)
                for _ in range(rng.randrange(1, 8)):
                    b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
                s = bytes(b)
            try:
                fn(s)
            except (ValueError, NotImplementedError):
                pass
            except Exception as e:  # pragma: no cover - the assertion
                pytest.fail(f"{name}: foreign {type(e).__name__}: {e!r} "
                            f"(seeded trial {trial})")
