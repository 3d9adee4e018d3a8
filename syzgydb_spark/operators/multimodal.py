"""Multimodal (image/audio/video) column support.

North-star surface (BASELINE.json): treat media as opaque BINARY
columns with typed metadata, and run decode / feature-extraction /
resize / frame-sampling as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio CODEC LIBRARIES, so formats needing
one are stubbed: ``decode_stub`` derives deterministic fake features
from the bytes; ``decode_strict`` raises NotImplementedError the way
a missing-codec deployment would. Four formats are REAL here with
zero dependencies, one per codec tier: 24-bit BMP and PCM RIFF/WAVE
(raw: pure header parse + reshape), 8-bit truecolor PNG
(lossless-compressed: stdlib ``zlib`` inflate + CRC-verified chunk
walk + the five per-row unfilters None/Sub/Up/Average/Paeth), and
baseline sequential JPEG (lossy-compressed: numpy DCT/IDCT +
canonical Huffman entropy coding — see ``_make_jpeg_codec``).
``decode_media`` is the decode_fn-compatible stats extractor over
all four — so the whole path (pack → mapInPandas decode →
features) runs on genuine bytes end-to-end (oracle queries
``bmp_pixel_stats`` / ``wav_sample_stats`` / ``png_pixel_stats`` /
``jpeg_pixel_stats`` hash-check the decoded pixels/samples against
DuckDB recomputing the planted generative formula). Everything
Spark-side — the schema contract, batch iteration, partition
behavior, output shapes — is real and tested; swapping
``pillow``/``librosa`` in for MP3/video is a pure executor-side
change.

Schema convention:

    media STRUCT<bytes: BINARY, mime: STRING, width: INT, height: INT,
                 duration_ms: BIGINT>

(the typed metadata travels next to the payload, so filters on
mime/width prune without touching bytes — at parquet level the bytes
column is only read when selected).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "STRUCT<bytes: BINARY, mime: STRING, width: INT, height: INT, duration_ms: BIGINT>"
)


def pack_media(
    bytes_col, mime_col, *, width=None, height=None, duration_ms=None
):
    """Assemble the media struct. String arguments are COLUMN NAMES for
    both parameters (consistently — a str mime used to be taken as a
    literal, silently storing the column name as every row's mime);
    pass ``F.lit("image/png")`` for a literal mime."""
    return F.struct(
        F.col(bytes_col).alias("bytes") if isinstance(bytes_col, str) else bytes_col.alias("bytes"),
        (F.col(mime_col) if isinstance(mime_col, str) else mime_col).alias("mime"),
        (width if width is not None else F.lit(None).cast("int")).alias("width"),
        (height if height is not None else F.lit(None).cast("int")).alias("height"),
        (duration_ms if duration_ms is not None else F.lit(None).cast("bigint")).alias(
            "duration_ms"
        ),
    )


def _make_decoders():
    """Nested closures so cloudpickle ships them BY VALUE into executor
    UDFs — module-level defs pickle by reference and would require this
    package on the executors' PYTHONPATH."""

    def stub(payload: bytes, mime: str, dim: int):
        import hashlib

        import numpy as np

        seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big")
        return np.random.default_rng(seed).standard_normal(dim)

    def strict(payload: bytes, mime: str, dim: int):
        raise NotImplementedError(
            f"no codec available for {mime!r} in this environment; "
            "install pillow/librosa/ffmpeg and pass decode_fn"
        )

    return stub, strict


#: Deterministic fake decoder (payload-hash-seeded) / strict no-codec raiser.
decode_stub, decode_strict = _make_decoders()


def _make_media_codecs():
    """REAL dependency-free codecs for two public uncompressed formats
    (r5-verdict task 5): 24-bit BI_RGB BMP and PCM RIFF/WAVE. The
    container has no pillow/ffmpeg, but these formats are pure header
    parse + array reshape, so the multimodal path is demonstrable
    end-to-end on real bytes — ``decode_strict`` is no longer the only
    non-stub decoder. Nested closures (incl. the encoders, which the
    oracle query plants bytes with executor-side) so cloudpickle ships
    the whole codec by value into mapInPandas workers.

    Validation is strict and errors are ValueError with the offending
    field named — a truncated or exotic file fails loudly, never
    returns garbage pixels.
    """
    import struct

    import numpy as np

    def encode_bmp(pixels) -> bytes:
        """(h, w, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
        px = np.asarray(pixels, dtype=np.uint8)
        if px.ndim != 3 or px.shape[2] != 3:
            raise ValueError(f"encode_bmp wants (h, w, 3), got {px.shape}")
        h, w = px.shape[:2]
        row_size = (w * 3 + 3) // 4 * 4
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up storage order
            row = px[y, :, ::-1].tobytes()  # RGB -> BGR
            body += row + b"\x00" * (row_size - len(row))
        header = struct.pack(
            "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
        ) + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
        )
        return bytes(header + body)

    def decode_bmp(payload: bytes):
        """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB.
        Handles bottom-up (positive height) and top-down (negative)
        storage, 4-byte row padding, and data offsets beyond the plain
        54-byte header (palettes/extensions are skipped, not parsed)."""
        import struct

        if payload is None or len(payload) < 54:
            raise ValueError("BMP truncated: need at least 54 header bytes")
        magic, file_size, _, _, data_off = struct.unpack_from("<2sIHHI", payload, 0)
        if magic != b"BM":
            raise ValueError(f"not a BMP: magic {magic!r}")
        hdr_size, w, h_signed, planes, bpp, compression = struct.unpack_from(
            "<IiiHHI", payload, 14
        )
        if hdr_size < 40:
            raise ValueError(f"unsupported DIB header size {hdr_size}")
        if planes != 1:
            raise ValueError(f"BMP planes must be 1, got {planes}")
        if bpp != 24:
            raise ValueError(f"only 24-bit BMP supported, got {bpp}bpp")
        if compression != 0:
            raise ValueError(f"only BI_RGB (0) supported, got compression {compression}")
        if w <= 0 or h_signed == 0:
            raise ValueError(f"bad dimensions {w}x{h_signed}")
        h = abs(h_signed)
        row_size = (w * 3 + 3) // 4 * 4
        if data_off < 54 or data_off + row_size * h > len(payload):
            raise ValueError(
                f"BMP truncated: need {data_off + row_size * h} bytes, have {len(payload)}"
            )
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_size * h, offset=data_off
        ).reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
        if h_signed > 0:
            rows = rows[::-1]  # bottom-up -> logical top-down
        return rows[:, :, ::-1].copy()  # BGR -> RGB

    def encode_wav(samples, sample_rate: int = 8000) -> bytes:
        """(n, channels) int16 -> PCM16 RIFF/WAVE bytes."""
        import struct

        s = np.asarray(samples, dtype=np.int16)
        if s.ndim == 1:
            s = s[:, None]
        n, ch = s.shape
        data = s.tobytes()  # interleaved little-endian
        fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                          sample_rate * ch * 2, ch * 2, 16)
        out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        out += b"data" + struct.pack("<I", len(data)) + data
        return out

    def decode_wav(payload: bytes):
        """PCM RIFF/WAVE bytes -> ((n, channels) int array, sample_rate).
        8-bit (unsigned) and 16-bit (signed LE) PCM; chunk walk skips
        unknown chunks (LIST/INFO etc.) per the RIFF contract."""
        import struct

        if payload is None or len(payload) < 12:
            raise ValueError("WAV truncated: need at least 12 RIFF bytes")
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
            body = payload[pos + 8: pos + 8 + size]
            if len(body) < size:
                raise ValueError(f"WAV chunk {cid!r} truncated")
            if cid == b"fmt ":
                if size < 16:
                    raise ValueError("fmt chunk too small")
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        audio_format, ch, rate, _, _, bits = fmt
        if audio_format != 1:
            raise ValueError(f"only PCM (1) supported, got format {audio_format}")
        if ch < 1:
            raise ValueError(f"bad channel count {ch}")
        if bits == 16:
            arr = np.frombuffer(data, dtype="<i2")
        elif bits == 8:
            arr = np.frombuffer(data, dtype=np.uint8)
        else:
            raise ValueError(f"only 8/16-bit PCM supported, got {bits}")
        if len(arr) % ch:
            raise ValueError("WAV data not a whole number of frames")
        return arr.reshape(-1, ch), rate

    def encode_png(pixels, *, filter_mode: str = "cycle") -> bytes:
        """(h, w, 3|4) uint8 -> 8-bit truecolor PNG bytes (stdlib zlib
        deflate; no image library). ``filter_mode="cycle"`` rotates the
        row filter through 0..4 (None/Sub/Up/Average/Paeth) so a
        round-trip exercises every unfilter path; ``"none"`` writes
        filter 0 rows."""
        import struct
        import zlib

        px = np.asarray(pixels, dtype=np.uint8)
        if px.ndim != 3 or px.shape[2] not in (3, 4):
            raise ValueError(f"encode_png wants (h, w, 3|4), got {px.shape}")
        if filter_mode not in ("cycle", "none"):
            raise ValueError(f"filter_mode must be 'cycle'|'none', "
                             f"got {filter_mode!r}")
        h, w, ch = px.shape
        raw = bytearray()
        prev = bytes(w * ch)
        for y in range(h):
            row = px[y].tobytes()
            f = (y % 5) if filter_mode == "cycle" else 0
            if f == 0:
                enc = row
            elif f == 1:  # Sub: left neighbor
                enc = bytes(
                    (row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                    for i in range(len(row)))
            elif f == 2:  # Up: row above
                enc = bytes((row[i] - prev[i]) & 0xFF
                            for i in range(len(row)))
            elif f == 3:  # Average
                enc = bytes(
                    (row[i] - ((row[i - ch] if i >= ch else 0)
                               + prev[i]) // 2) & 0xFF
                    for i in range(len(row)))
            else:  # Paeth
                enc = bytearray()
                for i in range(len(row)):
                    a = row[i - ch] if i >= ch else 0
                    b = prev[i]
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    enc.append((row[i] - pred) & 0xFF)
                enc = bytes(enc)
            raw += bytes([f]) + enc
            prev = row

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", w, h, 8,
                           2 if ch == 3 else 6, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    def decode_png(payload: bytes):
        """8-bit truecolor(+alpha) PNG bytes -> (h, w, 3|4) uint8.
        Real decode: chunk walk with CRC verification, multi-IDAT
        concatenation, zlib inflate, and all five per-row unfilters
        (None/Sub/Up/Average/Paeth). Strict like the BMP/WAV codecs —
        palette/gray/16-bit/interlaced files raise ValueError naming
        the field rather than returning garbage."""
        import struct
        import zlib

        sig = b"\x89PNG\r\n\x1a\n"
        if payload is None or len(payload) < 8 or payload[:8] != sig:
            raise ValueError("not a PNG: bad signature")
        pos, ihdr, idat, ended = 8, None, bytearray(), False
        while pos + 12 <= len(payload):
            length, tag = struct.unpack_from(">I4s", payload, pos)
            if pos + 12 + length > len(payload):
                raise ValueError(f"PNG chunk {tag!r} truncated")
            body = payload[pos + 8: pos + 8 + length]
            crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
            if tag == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", body)
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                ended = True
                break
            pos += 12 + length
        if ihdr is None:
            raise ValueError("PNG missing IHDR chunk")
        if not ended:
            raise ValueError("PNG missing IEND chunk")
        w, h, depth, color_type, comp, filt, interlace = ihdr
        if depth != 8:
            raise ValueError(f"only 8-bit depth supported, got {depth}")
        if color_type not in (2, 6):
            raise ValueError(
                f"only truecolor (2) / truecolor+alpha (6) supported, "
                f"got color type {color_type}")
        if comp != 0 or filt != 0:
            raise ValueError(
                f"bad compression/filter method {comp}/{filt}")
        if interlace != 0:
            raise ValueError("Adam7 interlacing not supported")
        if w <= 0 or h <= 0:
            raise ValueError(f"bad dimensions {w}x{h}")
        ch = 3 if color_type == 2 else 4
        raw = zlib.decompress(bytes(idat))
        stride = w * ch
        if len(raw) != h * (stride + 1):
            raise ValueError(
                f"PNG pixel data: need {h * (stride + 1)} filtered "
                f"bytes, have {len(raw)}")
        out = np.empty((h, stride), dtype=np.uint8)
        prev = bytes(stride)
        p = 0
        for y in range(h):
            f = raw[p]
            line = raw[p + 1: p + 1 + stride]
            p += 1 + stride
            if f == 0:
                cur = line
            elif f == 2:  # Up vectorizes (no left dependency)
                cur = ((np.frombuffer(line, np.uint8).astype(np.uint16)
                        + np.frombuffer(prev, np.uint8)) & 0xFF).astype(
                            np.uint8).tobytes()
            elif f in (1, 3, 4):  # left-dependent: sequential by spec
                buf = bytearray(stride)
                for i in range(stride):
                    a = buf[i - ch] if i >= ch else 0
                    b = prev[i]
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) // 2
                    else:
                        c = prev[i - ch] if i >= ch else 0
                        q = a + b - c
                        pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                        pred = a if (pa <= pb and pa <= pc) else (
                            b if pb <= pc else c)
                    buf[i] = (line[i] + pred) & 0xFF
                cur = bytes(buf)
            else:
                raise ValueError(f"bad row filter {f} at row {y}")
            out[y] = np.frombuffer(cur, np.uint8)
            prev = cur
        return out.reshape(h, w, ch).copy()

    # a private jpeg codec instance captured as a CLOSURE LOCAL (a
    # module-global reference would pickle by reference and require
    # the package on executors)
    _, _, _jpeg_decode = _make_jpeg_codec()

    def media_features(payload: bytes, mime: str, dim: int):
        """decode_fn-compatible REAL feature extractor: deterministic
        stats over the decoded pixels/samples, zero-padded to ``dim``."""
        if mime == "image/jpeg":
            px = _jpeg_decode(payload).astype(np.float64)
            if px.ndim == 2:  # grayscale: one plane fills the 3 slots
                px = np.repeat(px[:, :, None], 3, axis=2)
            h, w = px.shape[:2]
            stats = [
                float(w), float(h),
                px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean(),
                px.std(), px.min(), px.max(),
            ]
        elif mime == "image/png":
            px = decode_png(payload).astype(np.float64)
            h, w = px.shape[:2]
            stats = [
                float(w), float(h),
                px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean(),
                px.std(), px.min(), px.max(),
            ]
        elif mime == "image/bmp":
            px = decode_bmp(payload).astype(np.float64)
            h, w = px.shape[:2]
            stats = [
                float(w), float(h),
                px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean(),
                px.std(), px.min(), px.max(),
            ]
        elif mime in ("audio/wav", "audio/x-wav"):
            s, rate = decode_wav(payload)
            sf = s.astype(np.float64)
            stats = [
                float(rate), float(s.shape[0]), float(s.shape[1]),
                sf.mean(), sf.std(), sf.min(), sf.max(),
            ]
        else:
            raise ValueError(
                f"media_features has no codec for {mime!r} "
                "(jpeg/png/bmp/wav only); pass decode_fn for other "
                "formats"
            )
        out = np.zeros(dim)
        out[: min(dim, len(stats))] = stats[:dim]
        return out

    return (encode_bmp, decode_bmp, encode_wav, decode_wav,
            encode_png, decode_png, media_features)


def _make_jpeg_codec():
    """Baseline sequential JPEG (ITU-T T.81), stdlib + numpy only —
    the LOSSY tier of the codec registry (bmp/wav = raw, png =
    lossless-compressed, jpeg = lossy-compressed: the format real
    crawl pipelines actually hit). Grayscale and 4:4:4 YCbCr color.

    Encoder: level shift, vectorized 8x8 orthonormal DCT, Annex-K
    quantization tables scaled by ``quality`` (the libjpeg curve),
    zigzag, DC differential + AC run/size entropy coding with
    SIMPLE-but-valid canonical Huffman tables (every DC symbol at 4
    bits, every AC symbol at 9 — carried in the file's DHT segments
    like any table, so any conforming decoder reads our output; the
    all-ones code of each length is unused as T.81 requires, which
    also makes the 1-fill scan padding self-terminating).

    Decoder: general marker walk (APPn/COM skipped, 0xFF fill bytes
    and standalone TEM consumed per T.81 B.1.1.2), multi-table DQT
    (8-bit), SOF0 with sampling factors 1-2 per component (4:4:4,
    4:2:2, and the real-world-dominant 4:2:0; chroma upsampled by
    replication), DRI restart intervals in BOTH baseline and
    progressive scans (byte-aligned RSTm consumed, DC predictors and
    EOB runs reset — cameras emit DRI+SOF2 together), and strict
    rejection of 12-bit, arithmetic-coded, hierarchical, or
    higher-factor streams — ValueError naming the field,
    never garbage pixels (the PNG codec's stance) —
    DHT canonical rebuild (so it decodes STANDARD Annex-K-coded files
    too, not just its own), byte-unstuffed entropy decode, dequant,
    vectorized IDCT, level shift, clamp, and BT.601 YCbCr→RGB.

    Exactness contract the oracle leans on: a block that is CONSTANT
    at an even value v round-trips bit-exactly end-to-end — its DCT
    is DC-only, DC quant 16 at quality 50 divides 8·(v−128), and the
    reconstruction 2·round((v−128)/2)+128 lands back on v with no
    rounding boundary; so a planted flat-block image survives the
    lossy pipeline exactly and DuckDB can replay the generative
    formula without decoding anything (``jpeg_pixel_stats``).

    Nested closures so cloudpickle ships the codec by value into
    mapInPandas workers (the executor contract used by every codec
    in this module). Reference scope: smhanov/syzgydb has no media
    decoding (embedding.go is text-only) — north-star surface.
    """
    import struct

    import numpy as np

    # ---- shared tables ----
    x = np.arange(8)
    _C = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    _C[0] /= np.sqrt(2)  # orthonormal: F = C f C^T, f = C^T F C

    # Annex K base quantization tables (public spec constants)
    _QL = np.array([
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int64)
    _QC = np.array([
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int64)

    def _zigzag():
        idx, cx, cy = [], 0, 0
        for _ in range(64):
            idx.append(cy * 8 + cx)
            if (cx + cy) % 2 == 0:
                if cx == 7:
                    cy += 1
                elif cy == 0:
                    cx += 1
                else:
                    cx, cy = cx + 1, cy - 1
            else:
                if cy == 7:
                    cx += 1
                elif cx == 0:
                    cy += 1
                else:
                    cx, cy = cx - 1, cy + 1
        return np.array(idx)

    _ZZ = _zigzag()

    def _scaled_q(base, quality):
        if not 1 <= quality <= 100:
            raise ValueError(f"quality must be 1..100, got {quality}")
        scale = 5000 // quality if quality < 50 else 200 - 2 * quality
        return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)

    # simple valid Huffman spec: (BITS[1..16] counts, ordered symbols)
    _DC_SYMS = list(range(12))
    _AC_SYMS = [0x00, 0xF0] + [(r << 4) | s
                               for r in range(16) for s in range(1, 11)]
    _DC_SPEC = ([0, 0, 0, len(_DC_SYMS)] + [0] * 12, _DC_SYMS)
    _AC_SPEC = ([0] * 8 + [len(_AC_SYMS)] + [0] * 7, _AC_SYMS)

    def _canonical(bits, syms):
        """symbol -> (code, length) per T.81 canonical generation."""
        out, code, i = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                out[syms[i]] = (code, length)
                code += 1
                i += 1
            code <<= 1
        return out

    def _rgb_to_ycbcr(px):
        r, g, b = (px[..., 0].astype(np.float64),
                   px[..., 1].astype(np.float64),
                   px[..., 2].astype(np.float64))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        return np.stack([y, cb, cr], axis=-1)

    def _ycbcr_to_rgb(y, cb, cr):
        cb = cb - 128.0
        cr = cr - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136286 * cb - 0.714136286 * cr
        b = y + 1.772 * cb
        return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                       0, 255).astype(np.uint8)

    def _blocks(plane):
        """(H, W) float64 (H, W multiples of 8) -> (n, 8, 8) in
        raster block order."""
        h, w = plane.shape
        return (plane.reshape(h // 8, 8, w // 8, 8)
                .transpose(0, 2, 1, 3).reshape(-1, 8, 8))

    def _unblocks(blocks, h, w):
        return (blocks.reshape(h // 8, w // 8, 8, 8)
                .transpose(0, 2, 1, 3).reshape(h, w))

    def encode_jpeg(pixels, quality: int = 50, *,
                    subsampling: str = "4:4:4",
                    restart_interval: int = 0) -> bytes:
        """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JPEG
        bytes. Color defaults to 4:4:4 (no subsampling, the exactness
        contract's path); ``subsampling="4:2:0"`` / ``"4:2:2"`` emit
        the dominant real-world chroma layouts (box-averaged chroma,
        Y at 2x2 / 2x1 sampling factors) — the decoder upsamples by
        replication. Edges of non-multiple-of-MCU images are
        replicated to the block grid; the true dimensions travel in
        SOF0 and the decoder crops. ``restart_interval=n`` emits a DRI
        segment and an RSTm marker every n MCUs (byte-aligned scan,
        DC predictors reset) — the error-resilience layout many real
        encoders produce."""
        if not 0 <= restart_interval <= 0xFFFF:
            raise ValueError("restart_interval must be 0..65535")
        px = np.asarray(pixels, dtype=np.uint8)
        if px.ndim == 2:
            comps = 1
        elif px.ndim == 3 and px.shape[2] == 3:
            comps = 3
        else:
            raise ValueError(
                f"encode_jpeg wants (h, w) or (h, w, 3), got {px.shape}")
        factors = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}
        if subsampling not in factors:
            raise ValueError(
                f"subsampling must be one of {sorted(factors)}, "
                f"got {subsampling!r}")
        h, w = px.shape[:2]
        if h == 0 or w == 0:
            raise ValueError(f"bad dimensions {w}x{h}")
        if comps == 1:
            samps = [(1, 1)]
            planes = [px.astype(np.float64)]
            qtabs = [_scaled_q(_QL, quality)]
            qids = [0]
        else:
            yh, yv = factors[subsampling]
            samps = [(yh, yv), (1, 1), (1, 1)]
            ycc = _rgb_to_ycbcr(px)
            planes = [ycc[..., i] for i in range(3)]
            qtabs = [_scaled_q(_QL, quality), _scaled_q(_QC, quality)]
            qids = [0, 1, 1]
        hmax = max(s[0] for s in samps)
        vmax = max(s[1] for s in samps)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        ph, pw = mcus_y * 8 * vmax, mcus_x * 8 * hmax
        pad = ((0, ph - h), (0, pw - w))
        planes = [np.pad(p, pad, mode="edge") for p in planes]
        # chroma subsampling: box-average each (vmax/cv × hmax/ch) cell
        for ci, (ch, cv) in enumerate(samps):
            fy, fx = vmax // cv, hmax // ch
            if fy == 1 and fx == 1:
                continue
            p = planes[ci]
            planes[ci] = (p.reshape(p.shape[0] // fy, fy,
                                    p.shape[1] // fx, fx).mean(axis=(1, 3)))

        # vectorized forward DCT + quantize per component; each
        # component keeps its own block grid (ch·cv blocks per MCU)
        quant = []
        grids = []
        for ci, plane in enumerate(planes):
            blk = _blocks(plane - 128.0)
            coef = np.einsum("ux,nxy,vy->nuv", _C, blk, _C)
            q = qtabs[qids[ci]][None, :, :]
            # baseline caps entropy-coded magnitudes at 1023 (size ≤ 10
            # for AC); with quality-100 all-ones tables an adversarial
            # block can quantize past that, so clamp (error only in
            # that corner, where q is 1 anyway)
            quant.append(np.clip(np.round(coef / q), -1023, 1023)
                         .astype(np.int64))
            grids.append((plane.shape[0] // 8, plane.shape[1] // 8))

        dc_code = _canonical(*_DC_SPEC)
        ac_code = _canonical(*_AC_SPEC)

        out = bytearray()
        bitbuf, nbits = 0, 0

        def put(code, length):
            nonlocal bitbuf, nbits
            bitbuf = (bitbuf << length) | (code & ((1 << length) - 1))
            nbits += length
            while nbits >= 8:
                byte = (bitbuf >> (nbits - 8)) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)  # byte stuffing
                nbits -= 8
            bitbuf &= (1 << nbits) - 1

        def put_val(v):
            s = int(abs(v)).bit_length()
            if v < 0:
                v = v + (1 << s) - 1
            return s, v

        def seg(marker, body):
            return struct.pack(">HH", marker, len(body) + 2) + body

        hdr = bytearray(b"\xff\xd8")  # SOI
        hdr += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        for tid, qt in enumerate(qtabs):
            hdr += seg(0xFFDB, bytes([tid])
                       + bytes(int(qt.reshape(64)[_ZZ][i]) for i in range(64)))
        sof = struct.pack(">BHHB", 8, h, w, comps)
        for ci in range(comps):
            ch, cv = samps[ci]
            sof += bytes([ci + 1, (ch << 4) | cv, qids[ci]])
        hdr += seg(0xFFC0, sof)
        for cls, (bits, syms) in ((0, _DC_SPEC), (1, _AC_SPEC)):
            hdr += seg(0xFFC4, bytes([cls << 4]) + bytes(bits) + bytes(syms))
        if restart_interval:
            hdr += seg(0xFFDD, struct.pack(">H", restart_interval))
        sos = bytes([comps])
        for ci in range(comps):
            sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        sos += b"\x00\x3f\x00"
        hdr += seg(0xFFDA, sos)
        out += hdr

        # interleaved MCU scan: ch·cv blocks per component per MCU
        # (1 each at 4:4:4; 4 Y + 1 Cb + 1 Cr at 4:2:0)
        pred = [0] * comps

        def emit_block(ci, bidx):
            zz = quant[ci][bidx].reshape(64)[_ZZ]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            s, v = put_val(diff)
            put(*dc_code[s])
            if s:
                put(v, s)
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    put(*ac_code[0xF0])
                    run -= 16
                s, v = put_val(int(zz[k]))
                put(*ac_code[(run << 4) | s])
                put(v, s)
                run = 0
            if run:
                put(*ac_code[0x00])  # EOB

        n_restart = 0
        mcus_done = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcus_done and \
                        mcus_done % restart_interval == 0:
                    # byte-align with 1-fill (put() stuffs an FF pad
                    # byte), then the bare RSTm marker — markers are
                    # never stuffed — and reset the DC chain
                    if nbits:
                        put(0xFF, 8 - nbits)
                    out += bytes([0xFF, 0xD0 + (n_restart & 7)])
                    n_restart += 1
                    for ci in range(comps):
                        pred[ci] = 0
                for ci in range(comps):
                    ch, cv = samps[ci]
                    bw = grids[ci][1]
                    for v in range(cv):
                        for u in range(ch):
                            emit_block(ci, (my * cv + v) * bw
                                       + (mx * ch + u))
                mcus_done += 1
        if nbits:
            put(0xFF, 8 - nbits % 8 if nbits % 8 else 0)  # 1-fill pad
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # Progressive AC scans need EOBn symbols ((r<<4)|0 for r 0..14)
    # the baseline table omits; a separate spec keeps every baseline
    # bitstream byte-identical to pre-progressive builds.
    _ACP_SYMS = ([r << 4 for r in range(15)] + [0xF0]
                 + [(r << 4) | s for r in range(16) for s in range(1, 11)])
    _ACP_SPEC = ([0] * 8 + [len(_ACP_SYMS)] + [0] * 7, _ACP_SYMS)

    def encode_jpeg_progressive(pixels, quality: int = 50, *,
                                subsampling: str = "4:4:4",
                                restart_interval: int = 0) -> bytes:
        """(h, w) grayscale or (h, w, 3) RGB uint8 -> PROGRESSIVE
        (SOF2) JPEG bytes, the libjpeg-style scan script exercising
        all four progressive scan types: interleaved DC first at Al=1,
        DC refinement, then per component a full AC band (Ss=1 Se=63)
        at Al=1 and its AC refinement pass (EOB runs, ZRL, buffered
        correction bits per T.81 G.1.2.3). Quantized coefficients are
        IDENTICAL to the baseline encoder's, so a progressive stream
        must decode to exactly its baseline twin's pixels — the
        entropy-layer cross-check the tests pin. Prep (color
        transform, padding, subsampling, DCT, quantization) mirrors
        ``encode_jpeg`` deliberately so the baseline path stays
        byte-stable.

        ``restart_interval=n`` emits a DRI segment and an RSTm marker
        every n MCUs of EVERY scan (cameras emit DRI+SOF2 together —
        the real-crawl shape the r9 verdict named). An MCU is the
        interleaved group in the DC scans and a single block in the
        single-component AC scans (T.81 E.2.4 applies per scan); at
        each restart the scan byte-aligns with 1-fill, the EOB run
        (and its buffered refinement bits) is flushed FIRST, the
        marker's m cycles 0-7 from 0 per scan, and DC predictors
        reset."""
        if not 0 <= restart_interval <= 0xFFFF:
            raise ValueError("restart_interval must be 0..65535")
        px = np.asarray(pixels, dtype=np.uint8)
        if px.ndim == 2:
            comps = 1
        elif px.ndim == 3 and px.shape[2] == 3:
            comps = 3
        else:
            raise ValueError(
                f"encode_jpeg wants (h, w) or (h, w, 3), got {px.shape}")
        factors = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}
        if subsampling not in factors:
            raise ValueError(
                f"subsampling must be one of {sorted(factors)}, "
                f"got {subsampling!r}")
        h, w = px.shape[:2]
        if h == 0 or w == 0:
            raise ValueError(f"bad dimensions {w}x{h}")
        if comps == 1:
            samps = [(1, 1)]
            planes = [px.astype(np.float64)]
            qtabs = [_scaled_q(_QL, quality)]
            qids = [0]
        else:
            yh, yv = factors[subsampling]
            samps = [(yh, yv), (1, 1), (1, 1)]
            ycc = _rgb_to_ycbcr(px)
            planes = [ycc[..., i] for i in range(3)]
            qtabs = [_scaled_q(_QL, quality), _scaled_q(_QC, quality)]
            qids = [0, 1, 1]
        hmax = max(s[0] for s in samps)
        vmax = max(s[1] for s in samps)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        ph, pw = mcus_y * 8 * vmax, mcus_x * 8 * hmax
        pad = ((0, ph - h), (0, pw - w))
        planes = [np.pad(p, pad, mode="edge") for p in planes]
        for ci, (chf, cvf) in enumerate(samps):
            fy, fx = vmax // cvf, hmax // chf
            if fy == 1 and fx == 1:
                continue
            p = planes[ci]
            planes[ci] = (p.reshape(p.shape[0] // fy, fy,
                                    p.shape[1] // fx, fx).mean(axis=(1, 3)))
        zzq = []   # per-component (n_blocks, 64) int64 in ZIGZAG order
        grids = []
        for ci, plane in enumerate(planes):
            blk = _blocks(plane - 128.0)
            coef = np.einsum("ux,nxy,vy->nuv", _C, blk, _C)
            q = qtabs[qids[ci]][None, :, :]
            quant = np.clip(np.round(coef / q), -1023, 1023).astype(np.int64)
            zzq.append(quant.reshape(-1, 64)[:, _ZZ])
            grids.append((plane.shape[0] // 8, plane.shape[1] // 8))

        dc_code = _canonical(*_DC_SPEC)
        ac_code = _canonical(*_ACP_SPEC)

        def writer():
            buf = bytearray()
            st = [0, 0]  # bitbuf, nbits

            def put(code, length):
                st[0] = (st[0] << length) | (code & ((1 << length) - 1))
                st[1] += length
                while st[1] >= 8:
                    b = (st[0] >> (st[1] - 8)) & 0xFF
                    buf.append(b)
                    if b == 0xFF:
                        buf.append(0x00)  # byte stuffing
                    st[1] -= 8
                st[0] &= (1 << st[1]) - 1

            def padf():
                if st[1]:
                    put(0xFF, 8 - st[1])  # 1-fill to the byte boundary

            def rst(m):
                # byte-align (put() stuffs an FF pad byte), then the
                # bare RSTm — markers are never stuffed
                padf()
                buf.extend((0xFF, 0xD0 + (m & 7)))

            return buf, put, padf, rst

        def put_val_bits(v):
            s = int(abs(v)).bit_length()
            if v < 0:
                v = v + (1 << s) - 1
            return s, v

        def seg(marker, body):
            return struct.pack(">HH", marker, len(body) + 2) + body

        out = bytearray(b"\xff\xd8")
        out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        for tid, qt in enumerate(qtabs):
            out += seg(0xFFDB, bytes([tid])
                       + bytes(int(qt.reshape(64)[_ZZ][i]) for i in range(64)))
        sofb = struct.pack(">BHHB", 8, h, w, comps)
        for ci in range(comps):
            chf, cvf = samps[ci]
            sofb += bytes([ci + 1, (chf << 4) | cvf, qids[ci]])
        out += seg(0xFFC2, sofb)  # SOF2: progressive, Huffman
        out += seg(0xFFC4, bytes([0x00]) + bytes(_DC_SPEC[0])
                   + bytes(_DC_SPEC[1]))
        out += seg(0xFFC4, bytes([0x11]) + bytes(_ACP_SPEC[0])
                   + bytes(_ACP_SPEC[1]))
        if restart_interval:
            out += seg(0xFFDD, struct.pack(">H", restart_interval))

        def sos(comp_ids, ac_id, ss, se, ah, al):
            body = bytes([len(comp_ids)])
            for cid in comp_ids:
                body += bytes([cid, ac_id])  # DC table 0, AC table id
            body += bytes([ss, se, (ah << 4) | al])
            return seg(0xFFDA, body)

        DC_AL, AC_AL = 1, 1
        all_ids = [c + 1 for c in range(comps)]

        def dc_mcu_order():
            """Interleaved block order grouped per MCU (the restart
            unit of the DC scans; equals one block per group for
            single-component images at 1x1)."""
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    units = []
                    for ci in range(comps):
                        chf, cvf = samps[ci]
                        bw = grids[ci][1]
                        for v_ in range(cvf):
                            for u in range(chf):
                                units.append(
                                    (ci, (my * cvf + v_) * bw + (mx * chf + u)))
                    yield units

        # scan 1: DC first, point transform Al=1 (arithmetic shift —
        # floor division toward -inf, exactly what the decoder's
        # pred << Al then |= refinement-bit reconstruction inverts)
        buf, put, padf, rst = writer()
        pred = [0] * comps
        n_rst = 0
        for mcu_i, units in enumerate(dc_mcu_order()):
            if restart_interval and mcu_i and \
                    mcu_i % restart_interval == 0:
                rst(n_rst)
                n_rst += 1
                pred = [0] * comps
            for ci, bidx in units:
                dcv = int(zzq[ci][bidx, 0]) >> DC_AL
                diff = dcv - pred[ci]
                pred[ci] = dcv
                s, v = put_val_bits(diff)
                put(*dc_code[s])
                if s:
                    put(v, s)
        padf()
        out += sos(all_ids, 0x01, 0, 0, 0, DC_AL) + buf

        # scan 2: DC refinement — one raw bit per block (restart
        # boundaries still apply; no predictor chain to reset)
        buf, put, padf, rst = writer()
        n_rst = 0
        for mcu_i, units in enumerate(dc_mcu_order()):
            if restart_interval and mcu_i and \
                    mcu_i % restart_interval == 0:
                rst(n_rst)
                n_rst += 1
            for ci, bidx in units:
                put(int(zzq[ci][bidx, 0]) & 1, 1)
        padf()
        out += sos(all_ids, 0x01, 0, 0, DC_AL, 0) + buf

        def comp_blocks(ci):
            """Non-interleaved block order: the component's OWN
            sampled grid (pad blocks of the interleaved grid are not
            coded in single-component scans, T.81 A.2.2)."""
            chf, cvf = samps[ci]
            nb_w = ((w * chf + hmax - 1) // hmax + 7) // 8
            nb_h = ((h * cvf + vmax - 1) // vmax + 7) // 8
            bw = grids[ci][1]
            for by in range(nb_h):
                for bx in range(nb_w):
                    yield by * bw + bx

        # scans 3..: per component, AC band 1-63 first pass at Al=1
        # (the restart unit of a single-component scan is ONE block)
        for ci in range(comps):
            buf, put, padf, rst = writer()
            eobrun = 0
            n_rst = 0

            def flush_eobrun():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    put(*ac_code[r << 4])
                    if r:
                        put(eobrun - (1 << r), r)
                    eobrun = 0

            for blk_i, bidx in enumerate(comp_blocks(ci)):
                if restart_interval and blk_i and \
                        blk_i % restart_interval == 0:
                    flush_eobrun()  # an EOB run never crosses a restart
                    rst(n_rst)
                    n_rst += 1
                zz = zzq[ci][bidx]
                r = 0
                for k in range(1, 64):
                    t = int(zz[k])
                    mag = (t if t >= 0 else -t) >> AC_AL
                    if mag == 0:
                        r += 1
                        continue
                    flush_eobrun()
                    while r > 15:
                        put(*ac_code[0xF0])  # ZRL
                        r -= 16
                    s, v = put_val_bits(mag if t >= 0 else -mag)
                    put(*ac_code[(r << 4) | s])
                    put(v, s)
                    r = 0
                if r:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
            flush_eobrun()
            padf()
            out += sos([ci + 1], 0x01, 1, 63, 0, AC_AL) + buf

        # final scans: per component, AC refinement Ah=1 Al=0
        # (T.81 G.1.2.3 — newly-significant coefficients coded with
        # runs over ZERO-HISTORY positions; already-nonzero positions
        # contribute buffered correction bits; EOB runs carry the
        # buffered bits of every block they cover)
        for ci in range(comps):
            buf, put, padf, rst = writer()
            eobrun = 0
            n_rst = 0
            runbits: list[int] = []  # bits belonging to the pending EOB run

            def flush_eobrun():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    put(*ac_code[r << 4])
                    if r:
                        put(eobrun - (1 << r), r)
                    eobrun = 0
                for b in runbits:
                    put(b, 1)
                runbits.clear()

            for blk_i, bidx in enumerate(comp_blocks(ci)):
                if restart_interval and blk_i and \
                        blk_i % restart_interval == 0:
                    # flush the pending EOB run AND its buffered
                    # correction bits before the marker — restart
                    # state is fully reset on both sides
                    flush_eobrun()
                    rst(n_rst)
                    n_rst += 1
                zz = zzq[ci][bidx]
                # last newly-significant position: ZRL is only legal
                # while more of them follow (k <= eob) — a zero tail
                # folds into the EOB run instead
                eob = 0
                for k in range(1, 64):
                    if abs(int(zz[k])) == 1:
                        eob = k
                r = 0
                blockbits: list[int] = []
                for k in range(1, 64):
                    t = abs(int(zz[k]))
                    if t == 0:
                        r += 1
                        continue
                    # the ZRL check runs at EVERY nonzero position
                    # (before the already-significant branch), so the
                    # correction bits emitted after a ZRL are exactly
                    # those of the positions inside its 16-slot window
                    # — the order the decoder's advance loop reads
                    while r > 15 and k <= eob:
                        flush_eobrun()
                        put(*ac_code[0xF0])
                        r -= 16
                        for b in blockbits:
                            put(b, 1)
                        blockbits = []
                    if t > 1:  # already significant: correction bit
                        blockbits.append(t & 1)
                        continue
                    # newly significant (magnitude exactly 1 at Al=0)
                    flush_eobrun()
                    put(*ac_code[(r << 4) | 1])
                    put(1 if int(zz[k]) > 0 else 0, 1)
                    for b in blockbits:
                        put(b, 1)
                    blockbits = []
                    r = 0
                if r > 0 or blockbits:
                    eobrun += 1
                    runbits.extend(blockbits)
                    if eobrun == 0x7FFF or len(runbits) > 900:
                        flush_eobrun()
            flush_eobrun()
            padf()
            out += sos([ci + 1], 0x01, 1, 63, 1, 0) + buf

        out += b"\xff\xd9"  # EOI
        return bytes(out)

    def decode_jpeg(payload: bytes):
        """Baseline (SOF0) or progressive (SOF2) JPEG bytes ->
        (h, w) grayscale or (h, w, 3) RGB uint8. Handles 4:4:4,
        4:2:2 and 4:2:0 chroma subsampling (factors 1-2; replication
        upsample), DRI restart intervals in baseline scans (RSTm at
        byte-aligned boundaries, DC predictors reset), and all four
        progressive scan types (DC first/refine interleaved, AC
        first/refine single-component with EOB runs, T.81 G.2),
        including DRI restart intervals inside progressive scans
        (the restart unit is the scan's own MCU — one block in
        single-component AC scans; predictors and EOB runs reset at
        each marker). Strict: 12-bit/arithmetic/hierarchical streams
        and sampling factors above 2 raise ValueError naming the
        feature."""
        if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG: missing SOI marker")
        pos = 2
        qtabs: dict[int, np.ndarray] = {}
        htabs: dict[tuple[int, int], dict] = {}
        sof = None
        mode = None  # "baseline" (SOF0) | "progressive" (SOF2)
        restart_interval = 0
        scans_done = 0
        # geometry + coefficient state, created at the first SOS
        nc = hmax = vmax = grids = coefs = comps = None
        h = w = None

        def _ensure_geometry():
            nonlocal nc, hmax, vmax, grids, coefs, comps, h, w
            if coefs is not None:
                return
            if sof is None:
                raise ValueError("SOS before SOF")
            h, w, comps = sof
            nc = len(comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            # per-component block grid: ch·cv blocks per MCU, raster
            grids = [(mcus_y * cv, mcus_x * ch)
                     for (_, ch, cv, _) in comps]
            coefs = [np.zeros((bh * bw, 64), dtype=np.int64)
                     for bh, bw in grids]

        def _do_scan(start, scan_comps, ss, se, ah, al):
            """Decode one entropy-coded scan starting at byte
            ``start``; returns the byte position of the next marker.
            Baseline: the full interleaved block scan. Progressive:
            DC first/refine (interleaved or single-component) and
            AC first/refine (single-component, EOB runs) per
            T.81 G.2."""
            nonlocal scans_done
            _ensure_geometry()
            data = payload
            bitpos = start * 8
            eobrun = 0

            def read_bit():
                nonlocal bitpos
                byte_i = bitpos >> 3
                if byte_i >= len(data):
                    raise ValueError("JPEG scan truncated")
                byte = data[byte_i]
                if byte == 0xFF:
                    nxt = data[byte_i + 1] if byte_i + 1 < len(data) else None
                    if nxt != 0x00:
                        raise ValueError(
                            f"unexpected marker 0xff{nxt:02x} inside scan"
                            if nxt is not None else "JPEG scan truncated")
                bit = (byte >> (7 - (bitpos & 7))) & 1
                bitpos += 1
                # after the last bit of a stuffed 0xFF, hop the 0x00
                if (bitpos & 7) == 0 and byte == 0xFF:
                    bitpos += 8
                return bit

            def read_sym(table):
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | read_bit()
                    if (length, code) in table:
                        return table[(length, code)]
                raise ValueError("invalid Huffman code in scan")

            def receive(n):
                v = 0
                for _ in range(n):
                    v = (v << 1) | read_bit()
                return v

            def receive_extend(s):
                v = receive(s)
                if s and v < (1 << (s - 1)):
                    v -= (1 << s) - 1
                return v

            # map scan components to SOF indices + tables
            idx = []
            for cid, dc_id, ac_id in scan_comps:
                ci = next((i for i, c in enumerate(comps)
                           if c[0] == cid), None)
                if ci is None:
                    raise ValueError(f"SOS names unknown component {cid}")
                idx.append((ci, dc_id, ac_id))
            need_dc = ss == 0 and (mode == "baseline" or ah == 0)
            need_ac = se > 0
            tables = []
            for ci, dc_id, ac_id in idx:
                cid = comps[ci][0]
                if need_dc and (0, dc_id) not in htabs:
                    raise ValueError(
                        f"missing Huffman table for component {cid}")
                if need_ac and (1, ac_id) not in htabs:
                    raise ValueError(
                        f"missing Huffman table for component {cid}")
                if comps[ci][3] not in qtabs:
                    raise ValueError(
                        f"missing quant table for component {cid}")
                tables.append((htabs.get((0, dc_id)),
                               htabs.get((1, ac_id))))
            pred = [0] * len(idx)

            def read_block_baseline(si, bidx):
                dc_t, ac_t = tables[si]
                blk = coefs[idx[si][0]]
                s = read_sym(dc_t)
                if s > 11:
                    raise ValueError(f"bad DC size category {s}")
                pred[si] += receive_extend(s)
                blk[bidx, 0] = pred[si]
                k = 1
                while k < 64:
                    rs = read_sym(ac_t)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    blk[bidx, k] = receive_extend(rs & 0x0F)
                    k += 1

            def dc_first(si, bidx):
                blk = coefs[idx[si][0]]
                s = read_sym(tables[si][0])
                if s > 11:
                    raise ValueError(f"bad DC size category {s}")
                pred[si] += receive_extend(s)
                blk[bidx, 0] = pred[si] << al

            def dc_refine(si, bidx):
                blk = coefs[idx[si][0]]
                if read_bit():
                    blk[bidx, 0] |= 1 << al

            def ac_first(si, bidx):
                nonlocal eobrun
                blk = coefs[idx[si][0]]
                if eobrun > 0:
                    eobrun -= 1
                    return
                k = ss
                while k <= se:
                    rs = read_sym(tables[si][1])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past end of band")
                    blk[bidx, k] = receive_extend(s) << al
                    k += 1

            def ac_refine(si, bidx):
                nonlocal eobrun
                blk = coefs[idx[si][0]]
                p1 = 1 << al
                k = ss

                def correct(k):
                    if read_bit() and (abs(int(blk[bidx, k])) & p1) == 0:
                        blk[bidx, k] += p1 if blk[bidx, k] > 0 else -p1

                if eobrun == 0:
                    while k <= se:
                        rs = read_sym(tables[si][1])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r < 15:
                                # unlike ac_first, the count INCLUDES
                                # this (partial) block: its remaining
                                # correction bits are read below and
                                # the shared decrement follows
                                eobrun = 1 << r
                                if r:
                                    eobrun += receive(r)
                                break
                            newval = 0  # ZRL: 16 zero-history slots
                        elif s == 1:
                            newval = p1 if read_bit() else -p1
                        else:
                            raise ValueError(
                                "bad AC refinement symbol (size > 1)")
                        while k <= se:
                            if blk[bidx, k] != 0:
                                correct(k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s and k <= se:
                            blk[bidx, k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:  # correction bits only
                        if blk[bidx, k] != 0:
                            correct(k)
                        k += 1
                    eobrun -= 1

            if mode == "baseline":
                read_unit = read_block_baseline
            elif ss == 0 and se == 0:
                read_unit = dc_first if ah == 0 else dc_refine
            elif ss >= 1 and ss <= se <= 63:
                if len(idx) != 1:
                    raise ValueError(
                        "progressive AC scans must be single-component")
                read_unit = ac_first if ah == 0 else ac_refine
            else:
                raise ValueError(
                    f"bad progressive spectral band Ss={ss} Se={se}")
            def consume_restart(n_restart):
                """RSTm between restart segments (T.81 E.2.4, and G.2
                for progressive scans where the restart unit is the
                scan's own MCU — a single block in single-component AC
                scans): byte-align past the 1-fill pad (hopping a
                stuffed FF pad byte), verify 0xFFD0+m with m cycling
                0-7, reset the DC predictors AND the EOB run (the
                decoder returns to its initial scan state; a valid
                encoder never lets an EOB run cross a restart)."""
                nonlocal bitpos, eobrun
                if bitpos & 7:
                    pad = data[bitpos >> 3] if (bitpos >> 3) < len(data) else 0
                    bitpos = (bitpos + 7) & ~7
                    if pad == 0xFF:
                        bitpos += 8
                byte_i = bitpos >> 3
                if byte_i + 2 > len(data):
                    raise ValueError("JPEG scan truncated at restart marker")
                want = 0xD0 + (n_restart & 7)
                if data[byte_i] != 0xFF or data[byte_i + 1] != want:
                    raise ValueError(
                        f"expected restart marker {want:#x} at byte "
                        f"{byte_i}, got 0x{data[byte_i]:02x}"
                        f"{data[byte_i + 1]:02x}")
                bitpos += 16
                for si in range(len(idx)):
                    pred[si] = 0
                eobrun = 0

            n_restart = 0
            units_done = 0
            if len(idx) > 1:
                # interleaved: ch·cv blocks per component per MCU
                if len(idx) != nc:
                    raise ValueError(
                        "interleaved scan must cover all SOF components")
                mcus_y = grids[0][0] // comps[0][2]
                mcus_x = grids[0][1] // comps[0][1]
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        if restart_interval and units_done and \
                                units_done % restart_interval == 0:
                            consume_restart(n_restart)
                            n_restart += 1
                        for si, (ci, _, _) in enumerate(idx):
                            _, ch, cv, _ = comps[ci]
                            bw = grids[ci][1]
                            for v in range(cv):
                                for u in range(ch):
                                    read_unit(si, (my * cv + v) * bw
                                              + (mx * ch + u))
                        units_done += 1
            else:
                # non-interleaved: the component's OWN sampled grid
                # (T.81 A.2.2 — pad blocks of the interleaved grid are
                # not coded), one block per MCU
                ci = idx[0][0]
                _, ch, cv, _ = comps[ci]
                nb_w = ((w * ch + hmax - 1) // hmax + 7) // 8
                nb_h = ((h * cv + vmax - 1) // vmax + 7) // 8
                bw = grids[ci][1]
                for by in range(nb_h):
                    for bx in range(nb_w):
                        if restart_interval and units_done and \
                                units_done % restart_interval == 0:
                            consume_restart(n_restart)
                            n_restart += 1
                        read_unit(0, by * bw + bx)
                        units_done += 1

            scans_done += 1
            # skip to the next marker (fill bytes / stray RSTn eaten)
            p = (bitpos + 7) >> 3
            while p + 1 < len(data):
                if data[p] == 0xFF and data[p + 1] != 0x00:
                    if 0xD0 <= data[p + 1] <= 0xD7:
                        p += 2
                        continue
                    break
                p += 1
            return p
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError(f"expected marker at byte {pos}")
            # T.81 B.1.1.2: markers may be preceded by any number of
            # 0xFF fill bytes — consume them before the marker id
            while payload[pos + 1] == 0xFF:
                pos += 1
                if pos + 4 > len(payload):
                    raise ValueError("JPEG truncated in marker fill bytes")
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI
                if not scans_done:
                    raise ValueError(
                        "JPEG has no scan data (EOI before SOS)")
                break
            if marker == 0x00:
                raise ValueError(
                    f"invalid marker 0xff00 in header at byte {pos}")
            if marker == 0x01:  # TEM: standalone, no length segment
                pos += 2
                continue
            if 0xD0 <= marker <= 0xD7:  # RSTn: standalone, scan-only
                raise ValueError(
                    f"RST marker {marker:#x} outside entropy-coded scan")
            size = struct.unpack_from(">H", payload, pos + 2)[0]
            body = payload[pos + 4: pos + 2 + size]
            if len(body) != size - 2:
                raise ValueError(f"JPEG segment {marker:#x} truncated")
            if marker == 0xDB:  # DQT (possibly several tables)
                b = 0
                while b < len(body):
                    prec, tid = body[b] >> 4, body[b] & 0x0F
                    if prec != 0:
                        raise ValueError("only 8-bit DQT supported")
                    if b + 65 > len(body):
                        raise ValueError("DQT table truncated")
                    tab = np.zeros(64, dtype=np.int64)
                    tab[_ZZ] = np.frombuffer(
                        body[b + 1: b + 65], dtype=np.uint8)
                    qtabs[tid] = tab.reshape(8, 8)
                    b += 65
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError(
                    f"only baseline (SOF0) or progressive Huffman "
                    f"(SOF2) supported, got SOF marker {marker:#x}")
            elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
                if sof is not None:
                    raise ValueError("multiple SOF markers")
                mode = "baseline" if marker == 0xC0 else "progressive"
                if len(body) < 6:
                    raise ValueError("SOF0 segment truncated")
                depth, h, w, nc = struct.unpack_from(">BHHB", body, 0)
                if len(body) < 6 + 3 * nc:
                    raise ValueError("SOF0 component list truncated")
                if depth != 8:
                    raise ValueError(f"only 8-bit depth supported, got {depth}")
                if nc not in (1, 3):
                    raise ValueError(f"only 1 or 3 components, got {nc}")
                if h == 0 or w == 0:
                    raise ValueError(f"bad dimensions {w}x{h}")
                comps = []
                for i in range(nc):
                    cid, samp, qid = body[6 + 3 * i: 9 + 3 * i]
                    ch, cv = samp >> 4, samp & 0x0F
                    if ch not in (1, 2) or cv not in (1, 2):
                        raise ValueError(
                            f"unsupported sampling factors {ch}x{cv} "
                            f"for component {cid} (1 or 2 only — "
                            "4:4:4/4:2:2/4:2:0)")
                    comps.append((cid, ch, cv, qid))
                if nc == 1:
                    # single-component scans are non-interleaved: one
                    # data unit per MCU, sampling factors ignored
                    # (T.81 A.2.2) — some encoders stamp 0x22 on gray
                    comps = [(comps[0][0], 1, 1, comps[0][3])]
                sof = (h, w, comps)
            elif marker == 0xC4:  # DHT (possibly several tables)
                b = 0
                while b < len(body):
                    cls, tid = body[b] >> 4, body[b] & 0x0F
                    bits = list(body[b + 1: b + 17])
                    if len(bits) < 16:
                        raise ValueError("DHT bit-length table truncated")
                    n = sum(bits)
                    syms = list(body[b + 17: b + 17 + n])
                    if len(syms) < n:
                        raise ValueError("DHT table truncated")
                    decode_map = {}
                    code = 0
                    i = 0
                    for length in range(1, 17):
                        for _ in range(bits[length - 1]):
                            decode_map[(length, code)] = syms[i]
                            code += 1
                            i += 1
                        code <<= 1
                    htabs[(cls, tid)] = decode_map
                    b += 17 + n
            elif marker == 0xDD:  # DRI: restart every n MCUs (0 = off)
                if len(body) < 2:
                    raise ValueError("DRI segment truncated")
                restart_interval = struct.unpack_from(">H", body, 0)[0]
            elif marker == 0xDA:  # SOS
                if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                    raise ValueError("SOS segment truncated")
                ns = body[0]
                scan_comps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                               body[2 + 2 * i] & 0x0F) for i in range(ns)]
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                if mode == "baseline" and \
                        (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError(
                        "baseline SOS must cover the full band "
                        f"(got Ss={ss} Se={se} Ah={ah} Al={al})")
                pos = _do_scan(pos + 2 + size, scan_comps, ss, se, ah, al)
                continue
            elif marker == 0xC8 or 0xF0 <= marker <= 0xFD or marker == 0xCC:
                raise ValueError(
                    f"unsupported coding marker {marker:#x} "
                    "(arithmetic/hierarchical)")
            # APPn / COM / anything else: skip
            pos += 2 + size
        if coefs is None or not scans_done:
            raise ValueError("JPEG missing SOF0/SOS")

        # dequantize + vectorized IDCT per component, upsample
        # subsampled chroma by replication, crop to (h, w)
        planes = []
        inv_zz = np.argsort(_ZZ)
        for ci in range(nc):
            _, ch, cv, qid = comps[ci]
            bh, bw = grids[ci]
            deq = (coefs[ci][:, inv_zz].reshape(-1, 8, 8)
                   * qtabs[qid][None, :, :]).astype(np.float64)
            blk = np.einsum("ux,nuv,vy->nxy", _C, deq, _C)
            plane = _unblocks(blk, bh * 8, bw * 8) + 128.0
            if vmax // cv > 1:
                plane = np.repeat(plane, vmax // cv, axis=0)
            if hmax // ch > 1:
                plane = np.repeat(plane, hmax // ch, axis=1)
            planes.append(plane[:h, :w])
        if nc == 1:
            return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return _ycbcr_to_rgb(planes[0], planes[1], planes[2])

    return encode_jpeg, encode_jpeg_progressive, decode_jpeg


#: Lossy-tier codec (baseline sequential JPEG, stdlib + numpy): the
#: compressed format class real pipelines hit most; see
#: ``_make_jpeg_codec`` for the exactness contract the oracle uses.
encode_jpeg, encode_jpeg_progressive, decode_jpeg = _make_jpeg_codec()

#: Real format codecs (no external deps) and the decode_fn-compatible
#: stats extractor over all four (bmp/wav raw, png lossless, jpeg
#: lossy). Instantiated after the jpeg factory: media_features
#: captures the jpeg decoder as a closure local so the whole bundle
#: still ships by value into executors.
(encode_bmp, decode_bmp, encode_wav, decode_wav,
 encode_png, decode_png, decode_media) = _make_media_codecs()


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    *,
    out_col: str = "features",
    dim: int = 64,
    decode_fn: Callable[[bytes, str, int], np.ndarray] | None = None,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """media struct → float feature vector, batch-wise on executors.

    Only ``id_cols`` + the media column flow through Python; at 100 TB
    you select the narrowest projection before decoding and join the
    features back by id (bytes never shuffle)."""
    import pandas as pd

    fn = decode_fn or decode_stub
    id_cols = id_cols or [c for c in df.columns if c != media_col]
    if not id_cols:
        raise ValueError(
            "extract_features needs at least one id column to join the "
            "features back by (df has only the media column)"
        )
    src = df.select(*id_cols, media_col)
    fields = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in id_cols)
    out_schema = f"{fields}, {out_col} array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                # a NULL media struct yields NULL features (not a
                # worker-killing TypeError)
                fn(m["bytes"], m["mime"], dim).tolist() if m is not None else None
                for m in pdf[media_col]
            ]
            out = pdf[id_cols].copy()
            out[out_col] = feats
            yield out

    return src.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    *,
    every_ms: int = 1000,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled
    timestamp (frame decode stubbed — emits frame_ts + a frame-sized
    placeholder payload reference)."""
    import pandas as pd

    id_cols = id_cols or [c for c in df.columns if c != media_col]
    if not id_cols:
        raise ValueError(
            "sample_frames needs at least one id column (df has only "
            "the media column)"
        )
    src = df.select(*id_cols, media_col)
    fields = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in id_cols)
    out_schema = f"{fields}, frame_ts_ms bigint, frame_seed bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = r[media_col]
                if m is None:  # NULL media struct → zero frames
                    continue
                dur = m["duration_ms"] or 0
                payload = m["bytes"] or b""
                base = int.from_bytes(hashlib.md5(payload).digest()[:8], "big") >> 1
                for ts in range(0, int(dur), every_ms):
                    rows.append(
                        {**{c: r[c] for c in id_cols}, "frame_ts_ms": ts,
                         "frame_seed": (base + ts) % (1 << 62)}
                    )
            yield pd.DataFrame(rows, columns=id_cols + ["frame_ts_ms", "frame_seed"])

    return src.mapInPandas(run, schema=out_schema)
