"""WARC/WET source tests: hand-built segments (realistic CommonCrawl
header shapes), Content-Length framing (the payload-contains-magic
trap), multi-record walks, gzip segments, strict truncation errors,
and the Spark binaryFile → records → wet_text path end-to-end."""

import gzip
import os

import pytest

from syzgydb_spark.sources.warc import parse_warc, read_warc, wet_text


def rec(warc_type, uri, payload: bytes, extra=()):
    h = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: <urn:uuid:0000-" + uri.encode() + b">",
        b"WARC-Date: 2024-01-01T00:00:00Z",
        b"WARC-Target-URI: " + uri.encode(),
        b"Content-Type: text/plain",
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    h.extend(extra)
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def test_single_record_parse():
    out = list(parse_warc(rec("conversion", "http://a.example/x", b"hello world")))
    assert len(out) == 1
    headers, payload = out[0]
    assert payload == b"hello world"
    assert headers["warc-type"] == "conversion"
    assert headers["warc-target-uri"] == "http://a.example/x"
    assert headers["warc-date"] == "2024-01-01T00:00:00Z"


def test_multi_record_walk_and_header_case():
    seg = (
        rec("warcinfo", "meta", b"robots: classic\r\n")
        + rec("conversion", "http://a/1", b"first doc")
        + rec("conversion", "http://a/2", b"second doc, longer")
    )
    out = list(parse_warc(seg))
    assert [h["warc-type"] for h, _ in out] == ["warcinfo", "conversion", "conversion"]
    assert out[2][1] == b"second doc, longer"
    # header names are case-insensitive (normalized to lower)
    assert all("content-length" in h for h, _ in out)


def test_payload_containing_magic():
    """Content-Length framing, not magic scanning: a payload that
    CONTAINS a full WARC record must stay one opaque payload."""
    inner = rec("conversion", "http://inner/", b"trap")
    seg = rec("resource", "http://outer/", inner) + rec(
        "conversion", "http://after/", b"still parsed"
    )
    out = list(parse_warc(seg))
    assert len(out) == 2
    assert out[0][1] == inner            # the embedded record is payload bytes
    assert out[1][0]["warc-target-uri"] == "http://after/"


def test_gzip_segment():
    seg = rec("conversion", "http://a/1", b"zipped doc")
    out = list(parse_warc(gzip.compress(seg)))
    assert out[0][1] == b"zipped doc"


def test_member_per_record_gzip():
    """CommonCrawl gzips each record as its own member; concatenated
    members decompress as one stream."""
    seg = gzip.compress(rec("conversion", "http://a/1", b"m1")) + gzip.compress(
        rec("conversion", "http://a/2", b"m2")
    )
    out = list(parse_warc(seg))
    assert [p for _, p in out] == [b"m1", b"m2"]


@pytest.mark.parametrize("mutate,msg", [
    (lambda s: s[:-6], "truncated"),                        # short payload
    (lambda s: s.replace(b"WARC/1.0", b"HTTP/1.1"), "version"),
    (lambda s: s.replace(b"Content-Length: 5", b"X-Nope: 5"), "Content-Length"),
    (lambda s: s.replace(b"Content-Length: 5", b"Content-Length: ab"), "Content-Length"),
])
def test_strict_errors(mutate, msg):
    seg = rec("conversion", "http://a/1", b"12345")
    with pytest.raises(ValueError, match=msg):
        list(parse_warc(mutate(seg)))


def test_read_warc_and_wet_text_end_to_end(spark, tmp_path):
    seg1 = (
        rec("warcinfo", "meta", b"x")
        + rec("conversion", "http://a/1", "héllo".encode())
        + rec("request", "http://a/1", b"GET / HTTP/1.1")
    )
    seg2 = rec("conversion", "http://b/2", b"second segment doc")
    (tmp_path / "seg1.warc").write_bytes(seg1)
    (tmp_path / "seg2.warc.gz").write_bytes(gzip.compress(seg2))

    records = read_warc(spark, str(tmp_path) + "/*.warc*")
    got = records.select("warc_type", "target_uri", "content_length").collect()
    assert len(got) == 4
    docs = {r["uri"]: r["text"] for r in wet_text(records).collect()}
    assert docs == {"http://a/1": "héllo", "http://b/2": "second segment doc"}
    # one task per segment file: the parse stage must not shuffle
    from syzgydb_spark.plans import scale_report

    assert scale_report(wet_text(records))["n_shuffles"] == 0
    assert os.path.exists(tmp_path / "seg1.warc")


def test_ingest_resumable_exactly_once(spark, tmp_path):
    """Ingest protocol: only new segments parse on re-run; a replay
    with nothing new is a no-op; the ledger audits per-segment
    counts; zero-record segments are not re-parsed forever."""
    from syzgydb_spark.sources.warc import (
        ingest_warc_segments, read_ingest_ledger, read_ingested_records,
    )

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    store = str(tmp_path / "store")
    (seg_dir / "s1.warc").write_bytes(
        rec("conversion", "http://a/1", b"one") + rec("conversion", "http://a/2", b"two"))
    (seg_dir / "s2.warc").write_bytes(rec("conversion", "http://b/1", b"three"))

    r1 = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", store)
    assert r1["new_segments"] == 2 and r1["n_records"] == 3
    assert read_ingested_records(spark, store).count() == 3

    # no new segments -> no-op (and no new batch dirs)
    r2 = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", store)
    assert r2 == {"new_segments": 0, "n_records": 0, "n_failed": 0,
                  "batch": None}

    # a wave of new segments: only they are parsed; old rows keep
    # their batch (never rewritten)
    (seg_dir / "s3.warc").write_bytes(rec("conversion", "http://c/1", b"four"))
    # zero-RECORD segment (gzip of empty content — zero-LENGTH files
    # are invisible to binaryFile listing and carry no records anyway)
    (seg_dir / "s4.warc").write_bytes(gzip.compress(b""))
    r3 = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", store)
    assert r3["new_segments"] == 2 and r3["n_records"] == 1
    recs = read_ingested_records(spark, store)
    assert recs.count() == 4
    assert recs.select("target_uri").distinct().count() == 4

    ledger = {r["path"].rsplit("/", 1)[1]: r["n_records"]
              for r in read_ingest_ledger(spark, store).collect()}
    assert ledger == {"s1.warc": 2, "s2.warc": 1, "s3.warc": 1, "s4.warc": 0}

    # the zero-record segment is ledgered: another run stays a no-op
    r4 = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", store)
    assert r4["new_segments"] == 0


def test_ingest_orphan_batches_invisible_and_cleaned(spark, tmp_path):
    """A records batch without its ledger commit (= a run that died
    mid-ingest) is invisible to readers, its segments re-ingest on
    the next run, and the orphan dir is removed."""
    import os as _os

    from syzgydb_spark.sources.warc import (
        ingest_warc_segments, read_ingested_records,
    )

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    store = tmp_path / "store"
    (seg_dir / "s1.warc").write_bytes(rec("conversion", "http://a/1", b"one"))
    ingest_warc_segments(spark, str(seg_dir) + "/*.warc", str(store))

    # simulate a crashed ingest: records written, ledger never
    (seg_dir / "s2.warc").write_bytes(rec("conversion", "http://b/1", b"two"))
    from syzgydb_spark.sources.warc import read_warc
    orphan = store / "records" / "batch=9-deadbeefcafe"
    read_warc(spark, str(seg_dir / "s2.warc")).write.parquet(str(orphan))

    # invisible to readers
    assert read_ingested_records(spark, str(store)).count() == 1

    # next ingest cleans the orphan and re-ingests s2 exactly once
    r = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", str(store))
    assert r["new_segments"] == 1 and r["n_records"] == 1
    assert not _os.path.exists(orphan)
    got = read_ingested_records(spark, str(store))
    assert got.count() == 2
    assert got.where("target_uri = 'http://b/1'").count() == 1


def test_ingest_quarantine_and_retry(spark, tmp_path):
    """on_error='fail' aborts the wave with nothing committed;
    'quarantine' ingests the healthy segments, ledgers the broken one
    with its parse error, never retries it until retry_failed=True,
    and a successful retry adds records + a clean audit row."""
    import pytest as _pytest

    from syzgydb_spark.sources.warc import (
        ingest_warc_segments, read_ingest_ledger, read_ingested_records,
    )

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    store = str(tmp_path / "store")
    (seg_dir / "good1.warc").write_bytes(rec("conversion", "http://a/1", b"one"))
    (seg_dir / "good2.warc").write_bytes(rec("conversion", "http://b/1", b"two"))
    # truncated payload: Content-Length promises more octets than exist
    (seg_dir / "bad.warc").write_bytes(
        rec("conversion", "http://c/1", b"three")[:-9])

    # default: the wave fails whole, nothing commits
    with _pytest.raises(Exception):
        ingest_warc_segments(spark, str(seg_dir) + "/*.warc", store)
    assert read_ingest_ledger(spark, store).count() == 0

    # quarantine: healthy segments land, the broken one is ledgered
    r = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", store,
                             on_error="quarantine")
    assert r["new_segments"] == 3 and r["n_records"] == 2 and r["n_failed"] == 1
    recs = read_ingested_records(spark, store)
    assert recs.count() == 2  # marker rows invisible
    led = {r["path"].rsplit("/", 1)[1]: r
           for r in read_ingest_ledger(spark, store).collect()}
    assert led["bad.warc"]["n_records"] == 0
    assert "truncated" in led["bad.warc"]["error"]
    assert led["good1.warc"]["error"] is None

    # quarantined path is NOT retried by default
    r2 = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", store,
                              on_error="quarantine")
    assert r2["new_segments"] == 0

    # operator fixes the segment, retries the failed set only
    (seg_dir / "bad.warc").write_bytes(rec("conversion", "http://c/1", b"three"))
    r3 = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", store,
                              on_error="quarantine", retry_failed=True)
    assert r3["new_segments"] == 1 and r3["n_records"] == 1 and r3["n_failed"] == 0
    got = read_ingested_records(spark, store)
    assert got.count() == 3
    assert got.where("target_uri = 'http://c/1'").count() == 1
    # audit keeps both attempts; a later retry_failed run is a no-op
    attempts = read_ingest_ledger(spark, store).where(
        "path LIKE '%bad.warc'").collect()
    assert len(attempts) == 2
    r4 = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", store,
                              on_error="quarantine", retry_failed=True)
    assert r4["new_segments"] == 0


def test_quarantine_corrupt_gzip(spark, tmp_path):
    """Truncated gzip raises EOFError, bad magic raises
    gzip.BadGzipFile (OSError), corrupt deflate raises zlib.error —
    none of them ValueError. All three must quarantine, not abort the
    wave (the most common real corruption in crawl dumps is a
    truncated .gz)."""
    from syzgydb_spark.sources.warc import (
        ingest_warc_segments, read_ingest_ledger, read_ingested_records,
    )

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    store = str(tmp_path / "store")
    (seg_dir / "good.warc").write_bytes(rec("conversion", "http://a/1", b"one"))
    gz = gzip.compress(rec("conversion", "http://b/1", b"two"))
    (seg_dir / "trunc.warc.gz").write_bytes(gz[: len(gz) // 2])  # EOFError
    (seg_dir / "badmagic.warc.gz").write_bytes(
        b"\x1f\x8bgarbage-that-is-not-a-gzip-stream")  # BadGzipFile
    corrupt = bytearray(gz)
    corrupt[len(corrupt) // 2] ^= 0xFF  # flips deflate data -> zlib.error
    (seg_dir / "bitrot.warc.gz").write_bytes(bytes(corrupt))

    r = ingest_warc_segments(spark, str(seg_dir) + "/*.warc*", store,
                             on_error="quarantine")
    assert r["new_segments"] == 4
    assert r["n_records"] == 1 and r["n_failed"] == 3
    assert read_ingested_records(spark, store).count() == 1
    errs = {row["path"].rsplit("/", 1)[1]: row["error"]
            for row in read_ingest_ledger(spark, store).collect()
            if row["error"] is not None}
    assert set(errs) == {"trunc.warc.gz", "badmagic.warc.gz",
                         "bitrot.warc.gz"}


def test_marker_spoofing_from_untrusted_headers(spark, tmp_path):
    """A WARC record whose untrusted header claims
    'WARC-Type: __parse_error__' must be ingested as an ordinary
    record — visible to readers, counted in the ledger, and its
    segment NOT re-ingested by retry_failed (quarantine markers are a
    dedicated parse_error column the parser can never set)."""
    from syzgydb_spark.sources.warc import (
        ingest_warc_segments, read_ingest_ledger, read_ingested_records,
    )

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    store = str(tmp_path / "store")
    (seg_dir / "sneaky.warc").write_bytes(
        rec("__parse_error__", "http://evil/1", b"wolf in marker clothing")
        + rec("conversion", "http://a/1", b"healthy sibling"))

    r = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", store,
                             on_error="quarantine")
    assert r["n_records"] == 2 and r["n_failed"] == 0
    recs = read_ingested_records(spark, store)
    assert recs.count() == 2  # spoofed record is NOT dropped
    assert recs.where("warc_type = '__parse_error__'").count() == 1
    led = read_ingest_ledger(spark, store).collect()
    assert len(led) == 1 and led[0]["error"] is None
    # retry_failed must not re-ingest the segment (no duplicate sibling)
    r2 = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", store,
                              on_error="quarantine", retry_failed=True)
    assert r2["new_segments"] == 0
    assert read_ingested_records(spark, store).count() == 2


def test_half_written_ledger_is_not_a_commit(spark, tmp_path):
    """A ledger batch dir without _SUCCESS (driver died mid-commit)
    must not count as committed: its records stay invisible, the
    segments re-ingest exactly once on the next run, and both dangling
    dirs are cleaned."""
    import os as _os

    from syzgydb_spark.sources.warc import (
        ingest_warc_segments, read_ingested_records,
    )

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    store = tmp_path / "store"
    (seg_dir / "s1.warc").write_bytes(rec("conversion", "http://a/1", b"one"))
    ingest_warc_segments(spark, str(seg_dir) + "/*.warc", str(store))

    # simulate a crash between ledger data-file write and job commit:
    # a real ingest, then strip the _SUCCESS marker from its ledger dir
    (seg_dir / "s2.warc").write_bytes(rec("conversion", "http://b/1", b"two"))
    r = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", str(store))
    led_dir = store / "ledger" / f"batch={r['batch']}"
    rec_dir = store / "records" / f"batch={r['batch']}"
    _os.remove(led_dir / "_SUCCESS")

    # not committed -> invisible
    assert read_ingested_records(spark, str(store)).count() == 1

    # next run re-ingests s2 exactly once and removes the dangling dirs
    r2 = ingest_warc_segments(spark, str(seg_dir) + "/*.warc", str(store))
    assert r2["new_segments"] == 1 and r2["n_records"] == 1
    assert not _os.path.exists(rec_dir) and not _os.path.exists(led_dir)
    got = read_ingested_records(spark, str(store))
    assert got.count() == 2
    assert got.where("target_uri = 'http://b/1'").count() == 1


def test_stream_parser_parity_with_bytes_parser():
    """The streaming parser must agree record-for-record with the
    bytes parser on plain, gzip, and payload-containing-magic
    segments, and raise ValueError on the same truncations."""
    import io

    from syzgydb_spark.sources.warc import parse_warc, parse_warc_stream

    tricky = (
        rec("conversion", "http://a/1", b"body with\r\nWARC/1.0\r\ninside")
        + rec("warcinfo", "meta", b"x" * 100)
        + rec("conversion", "http://b/2", "unicode ü".encode())
    )
    for seg in (tricky, gzip.compress(tricky)):
        a = list(parse_warc(seg))
        b = list(parse_warc_stream(io.BytesIO(seg)))
        assert [(h, p) for h, p in a] == [(h, p) for h, p in b]

    for mutate in (lambda s: s[:-9],                      # short payload
                   lambda s: s.replace(b"WARC/1.0", b"JUNK/1.0", 1),
                   lambda s: gzip.compress(s)[:20]):      # truncated gzip
        broken = mutate(tricky)
        with pytest.raises((ValueError, EOFError)):
            list(parse_warc_stream(io.BytesIO(broken)))


def test_streaming_read_warc_equals_whole_bytes(spark, tmp_path):
    """read_warc(stream=True) and stream=False return identical record
    sets; 'auto' picks streaming for file: paths."""
    seg1 = (rec("conversion", "http://a/1", b"one")
            + rec("request", "http://a/1", b"GET /"))
    seg2 = rec("conversion", "http://b/1", b"two")
    (tmp_path / "s1.warc").write_bytes(seg1)
    (tmp_path / "s2.warc.gz").write_bytes(gzip.compress(seg2))

    def key(rows):
        return sorted((r["target_uri"], r["warc_type"], bytes(r["payload"]))
                      for r in rows)

    glob_ = str(tmp_path) + "/*.warc*"
    streamed = key(read_warc(spark, glob_, stream=True).collect())
    whole = key(read_warc(spark, glob_, stream=False).collect())
    auto = key(read_warc(spark, glob_).collect())
    assert streamed == whole == auto and len(streamed) == 3


def test_streaming_flush_chunking_preserves_records(spark, tmp_path):
    """A tiny flush window (forces a flush after nearly every record)
    must not lose, duplicate, or reorder-within-doc any records —
    and quarantine's two-pass validate must still discard a broken
    segment ENTIRELY even though healthy segments flushed early."""
    from syzgydb_spark.sources.warc import (
        _records_from_paths_with_markers, warc_records_from_paths,
    )

    seg = b"".join(rec("conversion", f"http://a/{i}", b"x" * 50)
                   for i in range(40))
    (tmp_path / "big.warc").write_bytes(seg)
    (tmp_path / "bad.warc").write_bytes(
        b"".join(rec("conversion", f"http://c/{i}", b"y" * 50)
                 for i in range(40))[:-9])
    paths = spark.createDataFrame(
        [(f"file:{tmp_path}/big.warc",), (f"file:{tmp_path}/bad.warc",)],
        "path string")

    good_only = paths.where("path LIKE '%big%'")
    out = warc_records_from_paths(good_only, flush_bytes=64).collect()
    assert sorted(r["target_uri"] for r in out) == sorted(
        f"http://a/{i}" for i in range(40))

    marked = _records_from_paths_with_markers(paths, flush_bytes=64).collect()
    healthy = [r for r in marked if not r["parse_error"]]
    markers = [r for r in marked if r["parse_error"]]
    assert len(healthy) == 40  # broken segment contributed NOTHING
    assert all(r["target_uri"].startswith("http://a/") for r in healthy)
    assert len(markers) == 1 and "truncated" in markers[0]["target_uri"]


def test_streaming_with_injected_open_fn(spark, tmp_path):
    """Object-store seam: a custom open_fn (closure-shipped
    path -> file object) lets non-local schemes use the streaming
    route — here a mock scheme mapping to local fixtures. Quarantine
    semantics ride along unchanged."""
    from syzgydb_spark.sources.warc import (
        _records_from_paths_with_markers, warc_records_from_paths,
    )

    (tmp_path / "x.warc").write_bytes(
        rec("conversion", "http://a/1", b"one")
        + rec("conversion", "http://a/2", b"two"))
    (tmp_path / "y.warc").write_bytes(
        rec("conversion", "http://b/1", b"three")[:-9])  # truncated
    base = str(tmp_path)

    def open_fn(p):
        assert p.startswith("mock://")
        return open(base + "/" + p[len("mock://"):], "rb")

    paths = spark.createDataFrame(
        [("mock://x.warc",), ("mock://y.warc",)], "path string")

    # default opener refuses the unknown scheme...
    with pytest.raises(Exception, match="no opener"):
        warc_records_from_paths(paths).collect()
    # ...the injected one streams it
    good = warc_records_from_paths(
        paths.where("path LIKE '%x%'"), open_fn=open_fn).collect()
    assert sorted(r["target_uri"] for r in good) == [
        "http://a/1", "http://a/2"]
    marked = _records_from_paths_with_markers(paths, open_fn=open_fn).collect()
    assert sum(1 for r in marked if r["parse_error"]) == 1
    assert sum(1 for r in marked if not r["parse_error"]) == 2
