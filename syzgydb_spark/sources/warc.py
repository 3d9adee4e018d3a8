"""WARC / WET source — CommonCrawl-style web-archive ingestion.

A 100 TB text pipeline's raw input is usually WARC (ISO 28500) or its
WET (extracted-text conversion) variant: a byte stream of records,
each a version line + CRLF headers + ``Content-Length`` octets of
payload + a blank-line separator. No library dependency is needed —
the format is a strict header parse with Content-Length framing (the
payload may itself contain ``WARC/1.0``; scanning for magic instead of
honoring Content-Length is the classic corruption bug, pinned by
tests/test_warc.py::test_payload_containing_magic).

Spark plumbing: segments land as one file each (CommonCrawl ships
~1 GB gzip segments), so ``read_warc`` parallelizes BY FILE via the
``binaryFile`` source and parses each segment inside ``mapInPandas`` —
the 100 TB layout is tens of thousands of segment files, one task per
segment, no shuffle at all; downstream operators see ordinary
(uri, date, payload) rows. Whole-segment gzip is handled with the
stdlib; record-level (member-per-record) gzip concatenations also
decompress with the same call, because gzip members concatenate.

Extraction to the ``documents`` shape is ``wet_text`` (conversion
records → utf-8 text), after which the whole dedup/quality/tokenizer
surface applies unchanged. Oracle query ``warc_roundtrip``
(__spark_entry__) plants multi-record segments from the documents
table executor-side, parses them back through this module, and
hash-matches DuckDB recomputing the planted fields.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "payload binary"
)


def _make_warc_parser():
    """Closure-shipped parser (cloudpickle by value; see multimodal)."""

    def parse_warc(data: bytes):
        """Yield ``(headers: dict[str, str], payload: bytes)`` per
        record. Strict: bad version line, malformed header, missing or
        short Content-Length all raise ValueError naming the offset."""
        import gzip as _gzip

        if data[:2] == b"\x1f\x8b":  # whole-segment (or member-wise) gzip
            data = _gzip.decompress(data)
        pos, n = 0, len(data)
        while pos < n:
            # tolerate inter-record blank lines
            while pos < n and data[pos:pos + 2] == b"\r\n":
                pos += 2
            if pos >= n:
                return
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError(f"no version line terminator at offset {pos}")
            version = data[pos:eol]
            if not version.startswith(b"WARC/"):
                raise ValueError(
                    f"expected WARC/x.y version line at offset {pos}, "
                    f"got {version[:20]!r}"
                )
            pos = eol + 2
            headers: dict[str, str] = {}
            while True:
                eol = data.find(b"\r\n", pos)
                if eol < 0:
                    raise ValueError(f"unterminated header block at offset {pos}")
                line = data[pos:eol]
                pos = eol + 2
                if not line:
                    break  # blank line: headers done
                if b":" not in line:
                    raise ValueError(f"malformed header line {line[:40]!r}")
                k, v = line.split(b":", 1)
                headers[k.decode("ascii").strip().lower()] = v.decode(
                    "utf-8", "replace"
                ).strip()
            if "content-length" not in headers:
                raise ValueError("record missing Content-Length header")
            try:
                length = int(headers["content-length"])
            except ValueError:
                raise ValueError(
                    f"bad Content-Length {headers['content-length']!r}"
                ) from None
            if pos + length > n:
                raise ValueError(
                    f"payload truncated: need {length} octets at offset {pos}, "
                    f"have {n - pos}"
                )
            yield headers, data[pos:pos + length]
            pos += length

    return parse_warc


parse_warc = _make_warc_parser()


def warc_records_df(files_df: DataFrame) -> DataFrame:
    """``binaryFile`` rows (path, content) → one row per WARC record.

    One task per segment file; the parse never shuffles. Keep the
    projection narrow downstream — ``payload`` is the only wide column
    and parquet/late materialization skips it unless selected."""
    import pandas as pd

    parse = _make_warc_parser()
    src = files_df.select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["path", "record_id", "warc_type", "target_uri", "warc_date",
                "content_type", "content_length", "payload"]
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for headers, payload in parse(bytes(r["content"])):
                    rows.append({
                        "path": r["path"],
                        "record_id": headers.get("warc-record-id"),
                        "warc_type": headers.get("warc-type"),
                        "target_uri": headers.get("warc-target-uri"),
                        "warc_date": headers.get("warc-date"),
                        "content_type": headers.get("content-type"),
                        "content_length": len(payload),
                        "payload": payload,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, schema=WARC_SCHEMA)


def read_warc(spark, path: str) -> DataFrame:
    """Read WARC/WET segment files under ``path`` (glob ok) into the
    per-record DataFrame. Parallelism = number of segment files."""
    return warc_records_df(spark.read.format("binaryFile").load(path))


def wet_text(records: DataFrame, *, min_chars: int = 1) -> DataFrame:
    """WET conversion records → the ``documents``-shaped text relation
    (uri, fetch date, text). Non-conversion records (requests,
    metadata) are filtered BEFORE the payload column is touched."""
    from pyspark.sql import functions as F

    return (
        records.where(F.col("warc_type") == "conversion")
        .select(
            F.col("target_uri").alias("uri"),
            F.col("warc_date").alias("fetched_at"),
            F.decode(F.col("payload"), "UTF-8").alias("text"),
        )
        .where(F.length("text") >= min_chars)
    )
