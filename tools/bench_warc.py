"""Measure WARC ingestion memory behavior at realistic segment size
(r6-verdict task 4): CommonCrawl ships ~1 GB-class segments, the test
fixtures are ~500 records — this harness generates 256-384 MB
synthetic WET segments and compares the two read routes:

  whole-bytes  binaryFile content row -> bytes parser
               (JVM materializes the segment as ONE row, Arrow ships
                the whole bytes value into Python, parse from bytes)
  streaming    path-only listing -> executor opens the file and
               streams records (gzip.GzipFile incremental), flushing
               an Arrow batch every FLUSH_BYTES

Each route runs in its OWN subprocess/SparkSession so peak RSS is
per-route (a JVM never returns memory). Peak RSS = max over 100 ms
samples of the summed VmRSS of the route process and all descendants
(driver python, JVM, pyspark workers).

    python tools/bench_warc.py            # full comparison
    python tools/bench_warc.py --route whole|stream --dir D   # child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# env-overridable (bench_crawl_wave convention) so the same harness
# measures both the 375 MB class and CommonCrawl's ~1 GB class
N_SEGMENTS = int(os.environ.get("WARC_BENCH_SEGMENTS", 3))
RECORDS_PER_SEGMENT = int(os.environ.get("WARC_BENCH_RECORDS", 3000))
PAYLOAD_BYTES = int(os.environ.get("WARC_BENCH_PAYLOAD", 128 * 1024))
# defaults: 3000 x 128 KiB ~ 375 MB per segment


def gen_segments(d: str) -> None:
    """Deterministic WET-shaped segments: text-like payloads (repeat
    structure, so the .gz twin compresses like real WET, ~4x)."""
    os.makedirs(d, exist_ok=True)
    word = (b"the quick crawl of common text repeats across pages and "
            b"paragraphs with mild variation %04d\n")
    for s in range(N_SEGMENTS):
        path = os.path.join(d, f"seg{s}.warc" + (".gz" if s == 2 else ""))
        if os.path.exists(path):
            continue
        chunks = []
        for r in range(RECORDS_PER_SEGMENT):
            body = (word % r) * (PAYLOAD_BYTES // len(word % r))
            head = (
                b"WARC/1.0\r\n"
                b"WARC-Type: conversion\r\n"
                + f"WARC-Record-ID: <urn:uuid:{s}-{r}>\r\n".encode()
                + f"WARC-Target-URI: http://synthetic/{s}/{r}\r\n".encode()
                + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
                + b"Content-Type: text/plain\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
            )
            chunks.append(head + body + b"\r\n\r\n")
        data = b"".join(chunks)
        if path.endswith(".gz"):
            import gzip

            data = gzip.compress(data, compresslevel=1)
        with open(path, "wb") as f:
            f.write(data)
        print(f"gen {path}: {os.path.getsize(path) / 1e6:.0f} MB on disk")


def _tree_rss_kb(root_pid: int) -> int:
    """Summed VmRSS (kB) of root_pid and every descendant."""
    children: dict[int, list[int]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                ppid = int(f.read().split(")")[-1].split()[1])
            children.setdefault(ppid, []).append(int(p))
        except OSError:
            continue
    total, stack = 0, [root_pid]
    while stack:
        pid = stack.pop()
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1])
                        break
        except OSError:
            continue
        stack.extend(children.get(pid, []))
    return total


def run_route(route: str, d: str) -> None:
    """Child: run one route in this process's own SparkSession, print
    one JSON line with wall seconds + rows."""
    from pyspark.sql import functions as F

    from syzgydb_spark.session import get_spark
    from syzgydb_spark.sources.warc import (
        warc_records_df, warc_records_from_paths,
    )

    spark = get_spark(app_name=f"bench-warc-{route}", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    files = spark.read.format("binaryFile").load(d + "/*.warc*")
    recs = (warc_records_from_paths(files.select("path")) if route == "stream"
            else warc_records_df(files))
    # force the full parse incl. payload movement; count() alone would
    # let the parquet-less noop prune nothing, which is what we want —
    # every payload byte crosses the Arrow boundary either way
    t0 = time.time()
    agg = recs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("payload_bytes"),
    ).collect()[0]
    wall = time.time() - t0
    print(json.dumps({"route": route, "wall_s": round(wall, 2),
                      "rows": agg["n"],
                      "payload_mb": round(agg["payload_bytes"] / 1e6, 1)}))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--route", choices=["whole", "stream"])
    ap.add_argument("--dir", default="/tmp/bench_warc_segments")
    cli = ap.parse_args()

    if cli.route:
        run_route(cli.route, cli.dir)
        return 0

    gen_segments(cli.dir)
    results = {}
    for route in ("whole", "stream"):
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--route", route, "--dir", cli.dir],
            stdout=subprocess.PIPE, text=True, cwd=REPO,
        )
        peak = [0]
        stop = threading.Event()

        def sample():
            while not stop.is_set():
                peak[0] = max(peak[0], _tree_rss_kb(proc.pid))
                time.sleep(0.1)

        t = threading.Thread(target=sample, daemon=True)
        t.start()
        out, _ = proc.communicate()
        stop.set()
        t.join()
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results[route] = {**json.loads(line),
                          "peak_rss_mb": round(peak[0] / 1024, 0)}
        print(results[route])
    w, s = results["whole"], results["stream"]
    print(
        f"\nsegments: {N_SEGMENTS} x ~{w['payload_mb'] / N_SEGMENTS:.0f} MB "
        f"payload (one .gz)\n"
        f"whole-bytes : {w['wall_s']:7.2f}s  peak RSS {w['peak_rss_mb']:6.0f} MB\n"
        f"streaming   : {s['wall_s']:7.2f}s  peak RSS {s['peak_rss_mb']:6.0f} MB\n"
        f"peak-RSS ratio whole/stream: {w['peak_rss_mb'] / s['peak_rss_mb']:.2f}x"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
