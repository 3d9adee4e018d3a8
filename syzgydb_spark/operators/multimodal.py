"""Multimodal (image/audio/video) column support.

North-star surface (BASELINE.json): treat media as opaque BINARY
columns with typed metadata, and run decode / feature-extraction /
resize / frame-sampling as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode step is STUBBED
(SURVEY.md build brief): ``decode_stub`` derives deterministic fake
features from the bytes; ``decode_strict`` raises NotImplementedError
the way a missing-codec deployment would. Everything Spark-side — the
schema contract, batch iteration, partition behavior, output shapes —
is real and tested; swapping ``pillow``/``librosa`` into the decoder is
a pure executor-side change.

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
