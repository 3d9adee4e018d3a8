"""Multimodal (image/audio/video) column support.

North-star surface (BASELINE.json): treat media as opaque BINARY
columns with typed metadata, and run decode / feature-extraction /
resize / frame-sampling as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio CODEC LIBRARIES, so formats needing
one are stubbed: ``decode_stub`` derives deterministic fake features
from the bytes; ``decode_strict`` raises NotImplementedError the way
a missing-codec deployment would. Three formats are REAL here with
zero dependencies: 24-bit BMP and PCM RIFF/WAVE (pure header parse +
reshape), and 8-bit truecolor PNG — a genuinely COMPRESSED format,
decodable because deflate lives in the stdlib (``zlib`` inflate +
CRC-verified chunk walk + the five per-row unfilters
None/Sub/Up/Average/Paeth). ``decode_media`` is the
decode_fn-compatible stats extractor over all three — so the whole
path (pack → mapInPandas decode → features) runs on genuine bytes
end-to-end (oracle queries ``bmp_pixel_stats`` / ``wav_sample_stats``
/ ``png_pixel_stats`` hash-check the decoded pixels/samples against
DuckDB recomputing the planted generative formula). Everything
Spark-side — the schema contract, batch iteration, partition
behavior, output shapes — is real and tested; swapping
``pillow``/``librosa`` in for JPEG/MP3 is a pure executor-side
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

    def media_features(payload: bytes, mime: str, dim: int):
        """decode_fn-compatible REAL feature extractor: deterministic
        stats over the decoded pixels/samples, zero-padded to ``dim``."""
        if mime == "image/png":
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
                "(png/bmp/wav only); pass decode_fn for other formats"
            )
        out = np.zeros(dim)
        out[: min(dim, len(stats))] = stats[:dim]
        return out

    return (encode_bmp, decode_bmp, encode_wav, decode_wav,
            encode_png, decode_png, media_features)


#: Real format codecs (no external deps): 24-bit BMP, PCM WAV, and —
#: the one COMPRESSED format the stdlib can decode — 8-bit truecolor
#: PNG (zlib inflate + the five per-row unfilters), plus a
#: decode_fn-compatible stats extractor over all three.
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
