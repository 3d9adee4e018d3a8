"""Planted-fixture tests for the dependency-free media codecs
(multimodal.py `_make_media_codecs`): hand-constructed BMP/WAV bytes
with known contents (not produced by our own encoder, so an
encode/decode bug pair can't cancel out), round-trips, padding/row
order/chunk-walk edge cases, strict validation errors, and the
extract_features end-to-end path on real bytes."""

import struct

import numpy as np
import pytest

from syzgydb_spark.operators.multimodal import (
    decode_bmp,
    decode_media,
    decode_wav,
    encode_bmp,
    encode_wav,
)


def _bmp_header(w, h_signed, data_len, data_off=54):
    return (
        struct.pack("<2sIHHI", b"BM", data_off + data_len, 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h_signed, 1, 24, 0, data_len,
                      2835, 2835, 0, 0)
    )


def test_bmp_hand_built_bottom_up_with_padding():
    """2x2 bottom-up 24-bit BMP, rows padded 6->8 bytes, BGR storage.
    Logical image (top-down, RGB):
        (255,0,0) (0,255,0)
        (0,0,255) (255,255,255)
    """
    top = b"\x00\x00\xff" + b"\x00\xff\x00" + b"\x00\x00"      # BGR rows + pad
    bottom = b"\xff\x00\x00" + b"\xff\xff\xff" + b"\x00\x00"
    payload = _bmp_header(2, 2, 16) + bottom + top             # bottom-up order
    px = decode_bmp(payload)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[0, 1].tolist() == [0, 255, 0]
    assert px[1, 0].tolist() == [0, 0, 255]
    assert px[1, 1].tolist() == [255, 255, 255]


def test_bmp_top_down_negative_height():
    top = b"\x01\x02\x03" + b"\x04\x05\x06" + b"\x00\x00"
    bottom = b"\x07\x08\x09" + b"\x0a\x0b\x0c" + b"\x00\x00"
    payload = _bmp_header(2, -2, 16) + top + bottom            # stored top-down
    px = decode_bmp(payload)
    assert px[0, 0].tolist() == [3, 2, 1]   # BGR -> RGB
    assert px[1, 1].tolist() == [12, 11, 10]


def test_bmp_data_offset_skips_gap():
    row = b"\x09\x08\x07" + b"\x00"                            # 1x1, pad 3->4
    payload = _bmp_header(1, 1, 4, data_off=62) + b"\xde\xad" * 4 + row
    assert decode_bmp(payload)[0, 0].tolist() == [7, 8, 9]


def test_bmp_round_trip_random():
    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (3, 2), (5, 4), (8, 3)]:              # odd widths hit padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@pytest.mark.parametrize("mutate,msg", [
    (lambda p: p[:40], "truncated"),
    (lambda p: b"XX" + p[2:], "magic"),
    (lambda p: p[:28] + struct.pack("<H", 8) + p[30:], "24-bit"),
    (lambda p: p[:30] + struct.pack("<I", 1) + p[34:], "BI_RGB"),
    (lambda p: p[:-4], "truncated"),
])
def test_bmp_strict_validation(mutate, msg):
    good = encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match=msg):
        decode_bmp(mutate(good))


def test_wav_hand_built_pcm16_stereo():
    frames = struct.pack("<6h", 100, -100, 200, -200, 300, -300)  # 3 frames x 2ch
    fmt = struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    payload = (b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + len(frames)) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16) + fmt
               + b"data" + struct.pack("<I", len(frames)) + frames)
    s, rate = decode_wav(payload)
    assert rate == 16000 and s.shape == (3, 2)
    assert s[:, 0].tolist() == [100, 200, 300]
    assert s[:, 1].tolist() == [-100, -200, -300]


def test_wav_chunk_walk_skips_unknown_chunks():
    frames = struct.pack("<2h", 5, -5)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size -> pad byte
    payload = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
               + junk
               + b"fmt " + struct.pack("<I", 16) + fmt
               + b"data" + struct.pack("<I", len(frames)) + frames)
    s, rate = decode_wav(payload)
    assert s[:, 0].tolist() == [5, -5] and rate == 8000


def test_wav_8bit_mono():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([0, 128, 255])
    payload = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16) + fmt
               + b"data" + struct.pack("<I", 3) + data)
    s, _ = decode_wav(payload)
    assert s[:, 0].tolist() == [0, 128, 255]


def test_wav_round_trip():
    rng = np.random.default_rng(11)
    for ch in (1, 2):
        samples = rng.integers(-32768, 32767, size=(50, ch), dtype=np.int16)
        s, rate = decode_wav(encode_wav(samples, sample_rate=22050))
        assert rate == 22050 and np.array_equal(s, samples)


@pytest.mark.parametrize("mutate,msg", [
    (lambda p: p[:8], "truncated"),
    (lambda p: b"RIFX" + p[4:], "RIFF"),
    (lambda p: p.replace(b"data", b"xxxx"), "missing"),
    (lambda p: p[:20] + struct.pack("<H", 3) + p[22:], "PCM"),   # IEEE float fmt
    (lambda p: p[:-1], "truncated"),
])
def test_wav_strict_validation(mutate, msg):
    good = encode_wav(np.zeros((4, 1), dtype=np.int16))
    with pytest.raises(ValueError, match=msg):
        decode_wav(mutate(good))


def test_decode_media_rejects_unknown_mime():
    # all four real codecs (bmp/wav/png/jpeg) have branches now;
    # formats still needing a codec library reject loudly
    with pytest.raises(ValueError, match="no codec"):
        decode_media(b"\x00", "audio/mp3", 8)


def test_decode_media_jpeg_branch():
    from syzgydb_spark.operators.multimodal import decode_media, encode_jpeg

    px = np.full((8, 8), 136, dtype=np.uint8)  # flat even value: exact
    f = decode_media(encode_jpeg(px, quality=50), "image/jpeg", 8)
    assert list(f[:6]) == [8.0, 8.0, 136.0, 136.0, 136.0, 0.0]


def test_extract_features_on_real_bmp_bytes(spark):
    """The full multimodal path on genuine bytes: pack_media ->
    mapInPandas decode (shipped by value) -> deterministic stats."""
    from syzgydb_spark.operators.multimodal import extract_features, pack_media
    from pyspark.sql import functions as F

    imgs = {
        1: np.full((2, 3, 3), 10, dtype=np.uint8),
        2: np.dstack([np.full((2, 2), v, dtype=np.uint8) for v in (0, 100, 200)]),
    }
    df = spark.createDataFrame(
        [(k, bytearray(encode_bmp(v))) for k, v in imgs.items()],
        "doc_id long, raw binary",
    ).select("doc_id", pack_media("raw", F.lit("image/bmp")).alias("media"))
    out = {
        r["doc_id"]: r["features"]
        for r in extract_features(df, dim=8, decode_fn=decode_media).collect()
    }
    assert out[1][:5] == [3.0, 2.0, 10.0, 10.0, 10.0]   # w, h, mean RGB
    assert out[2][:5] == [2.0, 2.0, 0.0, 100.0, 200.0]


# ---- adversarial byte fuzz: decoders must fail CLOSED (ValueError) ----

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=300))
    def test_bmp_decoder_never_crashes_on_garbage(payload):
        """Any byte string either decodes to a well-formed array or
        raises ValueError — never IndexError/struct.error/segfault-ish
        numpy reshape errors (fail closed on hostile inputs)."""
        try:
            px = decode_bmp(payload)
        except ValueError:
            return
        assert px.ndim == 3 and px.shape[2] == 3

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=300))
    def test_wav_decoder_never_crashes_on_garbage(payload):
        try:
            s, rate = decode_wav(payload)
        except ValueError:
            return
        assert s.ndim == 2 and rate >= 0

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, 10**9), st.data())
    def test_bmp_mutation_fuzz(seed, data):
        """Single-byte mutations of a VALID bmp either still decode or
        raise ValueError; a mutation outside the header must never
        change the reported shape."""
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
        good = bytearray(encode_bmp(img))
        pos = data.draw(st.integers(0, len(good) - 1))
        val = data.draw(st.integers(0, 255))
        good[pos] = val
        try:
            px = decode_bmp(bytes(good))
        except ValueError:
            return
        assert px.shape[2] == 3
        if pos >= 54:  # body mutation: shape is header-determined
            assert px.shape == (3, 3, 3)


# ---- PNG: the stdlib-decodable COMPRESSED format (zlib inflate) ----

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib as _z
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF))


def _png_bytes(w, h, color_type, filtered_rows: bytes, depth=8,
               interlace=0, idat_split=None) -> bytes:
    import zlib as _z
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    comp = _z.compress(filtered_rows)
    if idat_split:
        idats = (_png_chunk(b"IDAT", comp[:idat_split])
                 + _png_chunk(b"IDAT", comp[idat_split:]))
    else:
        idats = _png_chunk(b"IDAT", comp)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + idats
            + _png_chunk(b"IEND", b""))


def test_png_hand_built_all_five_filters():
    """2x5 RGB image hand-built (NOT via our encoder, so an
    encode/decode bug pair can't cancel): one row per filter type with
    hand-computed unfilter results."""
    from syzgydb_spark.operators.multimodal import decode_png

    rows = bytes(
        [0, 10, 20, 30, 40, 50, 60]        # None: literal
        + [2, 1, 1, 1, 1, 1, 1]            # Up: row0 + 1
        + [1, 5, 6, 7, 10, 10, 10]         # Sub: left + raw
        + [3, 0, 0, 0, 0, 0, 0]            # Average of left/up
        + [4, 0, 0, 0, 0, 0, 0]            # Paeth predictor
    )
    px = decode_png(_png_bytes(2, 5, 2, rows))
    expect = np.array([
        [[10, 20, 30], [40, 50, 60]],
        [[11, 21, 31], [41, 51, 61]],
        [[5, 6, 7], [15, 16, 17]],
        [[2, 3, 3], [8, 9, 10]],
        [[2, 3, 3], [8, 9, 10]],
    ], dtype=np.uint8)
    assert (px == expect).all()


def test_png_multi_idat_concatenation():
    """IDAT data may be split across chunks at ANY byte boundary."""
    from syzgydb_spark.operators.multimodal import decode_png

    rows = bytes([0, 1, 2, 3, 4, 5, 6] + [0, 7, 8, 9, 10, 11, 12])
    whole = decode_png(_png_bytes(2, 2, 2, rows))
    split = decode_png(_png_bytes(2, 2, 2, rows, idat_split=3))
    assert (whole == split).all()


def test_png_round_trip_rgb_rgba_all_filters():
    from syzgydb_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(42)
    for shape in [(1, 1, 3), (7, 3, 3), (6, 6, 4), (11, 2, 4), (5, 13, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        for fm in ("cycle", "none"):
            back = decode_png(encode_png(px, filter_mode=fm))
            assert back.shape == shape and (back == px).all()


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"JUNK" + b[4:], "signature"),
        (lambda b: b[:20] + bytes([b[20] ^ 0xFF]) + b[21:], "CRC"),
        (lambda b: b[:-12], "IEND"),
        (lambda b: _png_bytes(2, 2, 3, bytes(14)), "color type"),
        (lambda b: _png_bytes(2, 2, 2, bytes(14), depth=16), "depth"),
        (lambda b: _png_bytes(2, 2, 2, bytes(14), interlace=1),
         "interlac"),
        (lambda b: _png_bytes(2, 3, 2, bytes(14)), "filtered bytes"),
    ],
)
def test_png_strict_validation(mutate, msg):
    from syzgydb_spark.operators.multimodal import decode_png, encode_png

    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match=msg):
        decode_png(mutate(good))


def test_decode_media_png_branch():
    from syzgydb_spark.operators.multimodal import decode_media, encode_png

    px = np.full((2, 3, 3), 7, dtype=np.uint8)
    px[:, :, 1] = 100
    f = decode_media(encode_png(px), "image/png", 8)
    assert list(f[:5]) == [3.0, 2.0, 7.0, 100.0, 7.0]


if HAVE_HYP:

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=300))
    def test_png_decoder_never_crashes_on_garbage(payload):
        from syzgydb_spark.operators.multimodal import decode_png

        try:
            px = decode_png(payload)
        except ValueError:
            return
        assert px.ndim == 3 and px.shape[2] in (3, 4)

    @settings(max_examples=150, deadline=None)
    @given(st.integers(0, 10**9), st.data())
    def test_png_mutation_fuzz(seed, data):
        """Single-byte mutations of a valid PNG either still decode
        (CRC collisions aside, they can't: CRC32 catches all 1-byte
        flips) or raise ValueError — never escape as zlib.error or
        struct.error."""
        from syzgydb_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
        good = bytearray(encode_png(img))
        pos = data.draw(st.integers(0, len(good) - 1))
        val = data.draw(st.integers(0, 255))
        orig, good[pos] = good[pos], val
        try:
            px = decode_png(bytes(good))
            assert val == orig or px.shape == (3, 3, 3)
        except ValueError:
            pass


# ---- JPEG: the LOSSY compressed tier (baseline sequential T.81) ----


def _seg(marker, body):
    return struct.pack(">HH", marker, len(body) + 2) + body


def _dc_only_jpeg(dc_category_bits: str, dc_value_bits: str) -> bytes:
    """Hand-built 8x8 grayscale baseline JPEG, independent of our own
    encoder: all-16 quant table, the STANDARD Annex-K DC luminance
    Huffman table (so the decoder's canonical DHT rebuild is proven
    against spec tables, not just our encoder's simple ones), and a
    one-symbol AC table holding only EOB at length 2. One block:
    DC diff in the given category, every AC zero."""
    dqt = _seg(0xFFDB, bytes([0x00]) + bytes([16] * 64))
    sof = _seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dht_dc = _seg(0xFFC4, bytes([0x00]) + bytes(dc_bits)
                  + bytes(range(12)))
    dht_ac = _seg(0xFFC4, bytes([0x10])
                  + bytes([0, 1] + [0] * 14) + bytes([0x00]))
    sos = _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bits = dc_category_bits + dc_value_bits + "00"  # ... + EOB
    bits += "1" * (-len(bits) % 8)  # 1-fill pad
    scan = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    # our scan bytes here never hit 0xFF, so no stuffing needed
    assert b"\xff" not in scan
    return b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + scan + b"\xff\xd9"


def test_jpeg_hand_built_dc_only_standard_dc_table():
    from syzgydb_spark.operators.multimodal import decode_jpeg

    # Annex-K DC luminance canonical codes: category 3 = '100' (len 3);
    # diff +4 = '100' -> dequantized DC 64 -> flat block 64/8 + 128
    px = decode_jpeg(_dc_only_jpeg("100", "100"))
    assert px.shape == (8, 8)
    assert np.array_equal(px, np.full((8, 8), 136, dtype=np.uint8))
    # negative diff: category 2 = '011', bits '00' -> diff -3 ->
    # DC -48 -> flat 128 - 6 = 122
    px = decode_jpeg(_dc_only_jpeg("011", "00"))
    assert np.array_equal(px, np.full((8, 8), 122, dtype=np.uint8))


def test_jpeg_flat_even_blocks_roundtrip_exactly():
    """The oracle's exactness contract: per-8x8-block-constant EVEN
    values survive the full lossy pipeline bit-exactly at quality 50
    (DC-only blocks, quant 16 divides 8*(v-128), no .5 boundary)."""
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(42)
    for _ in range(4):
        bh, bw = int(rng.integers(1, 4)), int(rng.integers(1, 5))
        vals = rng.integers(10, 110, size=(bh, bw)) * 2
        px = np.kron(vals, np.ones((8, 8), np.int64)).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(px, quality=50))
        assert np.array_equal(dec, px)


def test_jpeg_gradient_roundtrip_close_and_crops():
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:21, 0:35]  # NOT multiples of 8: pad + crop path
    px = ((x * 3 + y * 2) % 200 + 20).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quality=90))
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 4


def test_jpeg_color_roundtrip():
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    px = np.zeros((16, 16, 3), np.uint8)
    px[:8, :, 0] = 200
    px[8:, :, 1] = 180
    px[:, :8, 2] = 120
    dec = decode_jpeg(encode_jpeg(px, quality=95))
    assert dec.shape == px.shape
    # flat color regions at 4:4:4 q95: tiny loss only
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 4


def test_jpeg_quality_100_adversarial_does_not_overflow():
    """Quality-100 tables are all ones; an extreme checkerboard would
    quantize past baseline's 1023 cap without the encoder clamp."""
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    px = (np.indices((8, 8)).sum(axis=0) % 2 * 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quality=100))
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"XX" + b[2:], "SOI"),
        # flip SOF0 (0xC0) to SOF2: the baseline full-band SOS is not a
        # legal progressive scan (progressive itself is supported now)
        (lambda b: b.replace(b"\xff\xc0", b"\xff\xc2", 1),
         "progressive spectral band"),
        # SOF1 (extended sequential) stays rejected by marker
        (lambda b: b.replace(b"\xff\xc0", b"\xff\xc1", 1), "SOF marker"),
        # declare 4x1 sampling on the only component: factors above 2
        # stay strictly rejected (2x2 on grayscale is now legal — a
        # single-component scan ignores factors, T.81 A.2.2)
        (lambda b: b.replace(b"\x01\x11\x00", b"\x01\x41\x00", 1),
         "sampling factors"),
        # truncate the DRI segment body
        (lambda b: b.replace(
            b"\xff\xda", b"\xff\xdd\x00\x03\x00\xff\xda", 1),
         "DRI segment truncated"),
        (lambda b: b[: len(b) // 2], "truncated|missing"),
    ],
)
def test_jpeg_strict_validation(mutate, msg):
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    good = encode_jpeg(np.full((8, 8), 100, dtype=np.uint8), quality=50)
    with pytest.raises(ValueError, match=msg):
        decode_jpeg(mutate(good))


def test_jpeg_missing_huffman_table_rejected():
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    good = encode_jpeg(np.full((8, 8), 100, dtype=np.uint8), quality=50)
    # strip both DHT segments (marker 0xFFC4)
    out = bytearray()
    pos = 2
    out += good[:2]
    while pos + 4 <= len(good):
        size = struct.unpack_from(">H", good, pos + 2)[0]
        if good[pos + 1] != 0xC4:
            out += good[pos: pos + 2 + size]
        if good[pos + 1] == 0xDA:
            out += good[pos + 2 + size:]
            break
        pos += 2 + size
    with pytest.raises(ValueError, match="Huffman"):
        decode_jpeg(bytes(out))


if HAVE_HYP:

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=300))
    def test_jpeg_decoder_never_crashes_on_garbage(payload):
        from syzgydb_spark.operators.multimodal import decode_jpeg

        try:
            px = decode_jpeg(payload)
        except ValueError:
            return
        assert px.dtype == np.uint8 and px.ndim in (2, 3)

    @settings(max_examples=150, deadline=None)
    @given(st.integers(0, 10**9), st.data())
    def test_jpeg_mutation_fuzz(seed, data):
        """Single-byte mutations of a valid JPEG either raise
        ValueError or decode to SOME uint8 image (JPEG has no CRC, so
        scan mutations legitimately produce different pixels) — never
        escape as KeyError/IndexError/struct.error."""
        from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(11, 13), dtype=np.uint8)
        good = bytearray(encode_jpeg(img, quality=75))
        pos = data.draw(st.integers(0, len(good) - 1))
        good[pos] = data.draw(st.integers(0, 255))
        try:
            px = decode_jpeg(bytes(good))
        except ValueError:
            return
        assert px.dtype == np.uint8 and px.ndim in (2, 3)


def test_jpeg_420_and_422_flat_roundtrip_exactly():
    """Constant chroma survives box-average subsampling + replication
    upsample exactly, so the flat-block exactness contract extends to
    the subsampled layouts (r8 verdict 6: 4:2:0 is the dominant
    real-world encoding)."""
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    flat = np.full((24, 40, 3), 120, dtype=np.uint8)
    for sub in ("4:2:2", "4:2:0"):
        dec = decode_jpeg(encode_jpeg(flat, subsampling=sub))
        assert dec.shape == flat.shape
        assert np.array_equal(dec, flat), sub


def test_jpeg_420_gradient_roundtrip_close_and_crops():
    """Smooth color content through 4:2:0: bounded error, exact crop
    of non-multiple-of-16 dimensions (MCU is 16x16 at 2x2)."""
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:33, 0:50]
    img = np.stack([np.clip(yy * 4, 0, 255), np.clip(xx * 3, 0, 255),
                    np.clip(120 + yy, 0, 255)], -1).astype(np.uint8)
    for sub, tol in (("4:2:2", 8), ("4:2:0", 10)):
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        assert dec.shape == img.shape
        d = np.abs(dec.astype(int) - img.astype(int))
        assert d.max() <= tol, (sub, d.max())
        assert d.mean() <= 2.0, (sub, d.mean())


def test_jpeg_grayscale_2x2_sampling_factor_accepted():
    """Single-component scans are non-interleaved and ignore sampling
    factors (T.81 A.2.2); some encoders stamp 0x22 on grayscale and
    the old strict check wrongly rejected those files."""
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    enc = bytearray(encode_jpeg(img, quality=90))
    i = enc.find(b"\xff\xc0")
    assert enc[i + 11] == 0x11
    enc[i + 11] = 0x22
    assert np.array_equal(decode_jpeg(bytes(enc)),
                          decode_jpeg(encode_jpeg(img, quality=90)))


def test_jpeg_marker_fill_bytes_and_tem_consumed_rst_rejected():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker, and TEM (0xff01) is standalone with no length — both
    misparsed as length-bearing segments before the r8-advice fix.
    RSTn outside the entropy-coded scan stays a clear rejection."""
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    good = encode_jpeg(np.full((8, 8), 100, dtype=np.uint8), quality=50)
    i = good.find(b"\xff\xdb")
    base = decode_jpeg(good)
    assert np.array_equal(
        decode_jpeg(good[:i] + b"\xff\xff\xff" + good[i:]), base)
    assert np.array_equal(
        decode_jpeg(good[:i] + b"\xff\x01" + good[i:]), base)
    with pytest.raises(ValueError, match="RST.*outside"):
        decode_jpeg(good[:i] + b"\xff\xd3" + good[i:])
    with pytest.raises(ValueError, match="0xff00"):
        decode_jpeg(good[:i] + b"\xff\x00" + good[i:])


def test_jpeg_bad_subsampling_argument_rejected():
    from syzgydb_spark.operators.multimodal import encode_jpeg

    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="4:1:1")


if HAVE_HYP:

    @settings(max_examples=120, deadline=None)
    @given(st.integers(0, 10**9), st.data())
    def test_jpeg_420_mutation_fuzz(seed, data):
        """The subsampled decode path under single-byte mutation: the
        same no-escape contract as the 4:4:4 fuzz (ValueError or SOME
        uint8 image, never KeyError/IndexError/struct.error)."""
        from syzgydb_spark.operators.multimodal import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(19, 21, 3), dtype=np.uint8)
        good = bytearray(encode_jpeg(img, quality=75, subsampling="4:2:0"))
        pos = data.draw(st.integers(0, len(good) - 1))
        good[pos] = data.draw(st.integers(0, 255))
        try:
            px = decode_jpeg(bytes(good))
        except ValueError:
            return
        assert px.dtype == np.uint8 and px.ndim in (2, 3)


def test_jpeg_restart_interval_roundtrip_identical_to_unrestarted():
    """DRI/RSTm support (r9): a restart-encoded stream decodes to
    EXACTLY the pixels of its no-restart twin — byte alignment,
    stuffed-FF pad bytes before markers, the m-cycles-0-7 sequence,
    and the DC predictor reset are all on the line. Gray, color, and
    4:2:0 layouts; flat even blocks stay bit-exact."""
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    flat = np.full((24, 40), 120, dtype=np.uint8)
    for ri in (1, 2, 3, 7):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(flat, restart_interval=ri)), flat), ri

    rng = np.random.default_rng(11)
    for trial in range(12):
        h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        gray = trial % 2 == 0
        img = rng.integers(0, 256, (h, w) if gray else (h, w, 3),
                           dtype=np.uint8)
        sub = "4:4:4" if gray else ["4:4:4", "4:2:2", "4:2:0"][trial % 3]
        q = int(rng.integers(30, 96))
        kw = {} if gray else {"subsampling": sub}
        base = decode_jpeg(encode_jpeg(img, quality=q, **kw))
        ri = int(rng.integers(1, 5))
        got = decode_jpeg(
            encode_jpeg(img, quality=q, restart_interval=ri, **kw))
        assert np.array_equal(got, base), (trial, h, w, sub, q, ri)


def test_jpeg_restart_marker_errors_are_clear():
    """A wrong RSTm index and a declared-but-absent restart both raise
    naming the restart marker (fail closed, never garbage pixels)."""
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    flat = np.full((24, 40), 120, dtype=np.uint8)
    enc = bytearray(encode_jpeg(flat, restart_interval=1))
    i = enc.find(b"\xff\xd0")
    assert i > 0
    enc[i + 1] = 0xD5  # out-of-sequence restart index
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(bytes(enc))

    # DRI declared but the scan carries no RSTm where one is due
    plain = encode_jpeg(flat)  # 15 MCUs, no restarts
    with_dri = plain.replace(
        b"\xff\xda", b"\xff\xdd\x00\x04\x00\x01\xff\xda", 1)
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(with_dri)


if HAVE_HYP:

    @settings(max_examples=100, deadline=None)
    @given(st.integers(0, 10**9), st.data())
    def test_jpeg_restart_mutation_fuzz(seed, data):
        """Single-byte mutations of a restart-encoded JPEG: the same
        no-escape contract (ValueError or SOME uint8 image)."""
        from syzgydb_spark.operators.multimodal import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(19, 21), dtype=np.uint8)
        good = bytearray(encode_jpeg(img, quality=75, restart_interval=2))
        pos = data.draw(st.integers(0, len(good) - 1))
        good[pos] = data.draw(st.integers(0, 255))
        try:
            px = decode_jpeg(bytes(good))
        except ValueError:
            return
        assert px.dtype == np.uint8 and px.ndim in (2, 3)


def test_jpeg_progressive_decodes_identical_to_baseline_twin():
    """Progressive (SOF2) support: the progressive encoder quantizes
    EXACTLY like the baseline one, so a progressive stream must decode
    bit-identically to its baseline twin — any defect in the four
    progressive scan types (DC first/refine, AC first/refine with EOB
    runs, ZRL windows, buffered correction bits) breaks the identity.
    This cross-checks the entropy layer without an external codec."""
    from syzgydb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(13)
    for trial in range(16):
        h, w = int(rng.integers(4, 48)), int(rng.integers(4, 48))
        gray = trial % 2 == 0
        img = rng.integers(0, 256, (h, w) if gray else (h, w, 3),
                           dtype=np.uint8)
        sub = "4:4:4" if gray else ["4:4:4", "4:2:2", "4:2:0"][trial % 3]
        q = int(rng.integers(20, 96))
        kw = {} if gray else {"subsampling": sub}
        base = decode_jpeg(encode_jpeg(img, quality=q, **kw))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q, **kw))
        assert np.array_equal(prog, base), (trial, h, w, sub, q)


def test_jpeg_progressive_flat_blocks_and_eob_runs():
    """Flat even blocks stay bit-exact through progressive (the oracle
    exactness contract extends), and a sparse image (isolated specks
    in a flat field, low quality) stresses long EOB runs and ZRL
    windows in both AC passes."""
    from syzgydb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    flat = np.full((24, 40, 3), 120, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive(flat)), flat)

    sparse = np.full((64, 64), 128, dtype=np.uint8)
    rng = np.random.default_rng(3)
    for _ in range(12):
        y, x = rng.integers(0, 64, 2)
        sparse[y, x] = rng.integers(0, 256)
    for q in (10, 50, 90):
        base = decode_jpeg(encode_jpeg(sparse, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(sparse, quality=q))
        assert np.array_equal(prog, base), q


def test_jpeg_progressive_restart_roundtrip_identical():
    """Restarts INSIDE progressive scans (r9 verdict #5 — the one
    named reject real crawl data hits; cameras emit DRI+SOF2
    together): a restart-encoded progressive stream decodes
    bit-identically to its no-restart twin. The restart unit is the
    scan's own MCU (interleaved group in the DC scans, single block
    in the AC scans); on the line are per-scan m-cycling, EOB-run +
    buffered-correction-bit flushes before each marker, byte
    alignment with stuffed-FF pads, and predictor/EOB-run resets."""
    from syzgydb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    # flat even blocks stay bit-exact with restarts too
    flat = np.full((24, 40, 3), 120, dtype=np.uint8)
    enc = encode_jpeg_progressive(flat, restart_interval=2)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc  # DRI + RST0 real
    assert np.array_equal(decode_jpeg(enc), flat)

    rng = np.random.default_rng(23)
    for trial in range(12):
        h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
        gray = trial % 3 == 0
        img = rng.integers(0, 256, (h, w) if gray else (h, w, 3),
                           dtype=np.uint8)
        sub = "4:4:4" if gray else ["4:4:4", "4:2:2", "4:2:0"][trial % 3]
        q = int(rng.integers(20, 96))
        kw = {} if gray else {"subsampling": sub}
        ref = decode_jpeg(encode_jpeg_progressive(img, quality=q, **kw))
        ri = int(rng.integers(1, 6))
        got = decode_jpeg(encode_jpeg_progressive(
            img, quality=q, restart_interval=ri, **kw))
        assert np.array_equal(got, ref), (trial, h, w, sub, q, ri)


def test_jpeg_progressive_restart_errors_are_clear():
    """Fail-closed in progressive too: an out-of-sequence RSTm index
    raises naming the restart marker, never garbage pixels."""
    from syzgydb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    img = np.arange(24 * 40, dtype=np.uint8).reshape(24, 40) % 251
    enc = bytearray(encode_jpeg_progressive(img, restart_interval=1))
    i = enc.find(b"\xff\xd0")
    assert i > 0
    enc[i + 1] = 0xD6  # out-of-sequence restart index
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(bytes(enc))


if HAVE_HYP:

    @settings(max_examples=100, deadline=None)
    @given(st.integers(0, 10**9), st.data())
    def test_jpeg_progressive_restart_mutation_fuzz(seed, data):
        """Single-byte mutations of a restart-encoded PROGRESSIVE
        JPEG: the same no-escape contract (ValueError or SOME uint8
        image, never KeyError/IndexError/struct.error)."""
        from syzgydb_spark.operators.multimodal import (
            decode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(19, 21, 3), dtype=np.uint8)
        good = bytearray(encode_jpeg_progressive(
            img, quality=60, restart_interval=2))
        pos = data.draw(st.integers(0, len(good) - 1))
        good[pos] = data.draw(st.integers(0, 255))
        try:
            px = decode_jpeg(bytes(good))
        except ValueError:
            return
        assert px.dtype == np.uint8 and px.ndim in (2, 3)

    @settings(max_examples=100, deadline=None)
    @given(st.integers(0, 10**9), st.data())
    def test_jpeg_progressive_mutation_fuzz(seed, data):
        """Single-byte mutations of a progressive JPEG: the same
        no-escape contract (ValueError or SOME uint8 image, never
        KeyError/IndexError/struct.error)."""
        from syzgydb_spark.operators.multimodal import (
            decode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(19, 21, 3), dtype=np.uint8)
        good = bytearray(encode_jpeg_progressive(img, quality=60))
        pos = data.draw(st.integers(0, len(good) - 1))
        good[pos] = data.draw(st.integers(0, 255))
        try:
            px = decode_jpeg(bytes(good))
        except ValueError:
            return
        assert px.dtype == np.uint8 and px.ndim in (2, 3)
