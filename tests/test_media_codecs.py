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
    # jpeg needs a codec library this container lacks; png does NOT —
    # it is stdlib-decodable and has its own branch now
    with pytest.raises(ValueError, match="no codec"):
        decode_media(b"\x00", "image/jpeg", 8)


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
