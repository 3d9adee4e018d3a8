"""Crawl-wave loop at realistic wave size (r7-verdict task 4): the
closest thing to the 100 TB steady-state story this sandbox can
execute end to end.

examples/crawl_wave.py proves the COMPOSITION on fixture-scale waves;
this harness drives the same ``run_wave`` loop on bench_warc-class
segments (~375 MB of WET per wave, 3,000 documents of varied ~16k-word
text) and RECORDS what a deployment would watch: per-wave wall clock,
peak process-tree RSS (100 ms /proc sampling, the bench_warc method),
and the per-stage counts. Wave 3 repeats half of wave 1's documents,
so the Bloom gate + fingerprint store do real cross-wave work at this
size, and the final wave runs with ``compact=True`` so the fold-back
cost is priced inside the loop rather than hand-waved.

The claim this measures: per-wave cost tracks the WAVE (ingest +
gates + bounded store folds), not the growing corpus — wave 3's wall
should sit in the same band as wave 1's despite the corpus having
doubled, and the long-lived session's peak RSS must not GROW wave
over wave (segments never materialize whole — sources/warc.py
streaming route — and the stores fold bounded deltas, so growth
would mean corpus-sized state is accumulating somewhere).

    python tools/bench_crawl_wave.py [--workdir D] [--out J]
    CRAWL_BENCH_DOCS=120 CRAWL_BENCH_WORDS=400 ... # smoke scale
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# env-overridable so a smoke run can validate the loop in seconds,
# and a long steady-state capture can run 6+ waves (r8 verdict 7:
# two full compaction cycles at realistic wave size)
N_WAVES = int(os.environ.get("CRAWL_BENCH_WAVES", 3))
DOCS_PER_WAVE = int(os.environ.get("CRAWL_BENCH_DOCS", 3000))
WORDS_PER_DOC = int(os.environ.get("CRAWL_BENCH_WORDS", 16_000))
# defaults: ~125 KB of text per doc -> ~375 MB per wave
FP_TABLE = "bench_crawl_fp"
LINE_TABLE = "bench_crawl_ln"


def _vocab():
    import numpy as np

    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    return np.array([
        "".join(rng.choice(letters, rng.integers(3, 11))) for _ in range(8000)
    ])


def gen_wave_segment(workdir: str, wave: int) -> str:
    """One ~375 MB WET segment of varied-text conversion records.
    Wave 3 repeats half of wave 1's documents verbatim (same URI body
    at a new URI — the recrawl-duplicate shape the dedup gates exist
    for). Deterministic per (wave, doc)."""
    import numpy as np

    seg_dir = os.path.join(workdir, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    path = os.path.join(seg_dir, f"wave{wave}.warc")
    if os.path.exists(path):
        return path
    vocab = _vocab()
    # gopher_filters requires >= 2 distinct canonical stopwords; real
    # prose has ~40% function words — mix in ~12% so the quality gate
    # exercises real pass/fail behavior instead of rejecting everything
    stops = np.array(["the", "be", "to", "of", "and", "that",
                      "have", "with"])
    t0 = time.time()
    with open(path, "wb") as f:
        for d in range(DOCS_PER_WAVE):
            # every third wave, odd doc ids: replay the wave-minus-2
            # doc (same seed) — the recrawl-duplicate shape, recurring
            # once per compaction cycle (wave 3 repeats wave 1,
            # wave 6 repeats wave 4, ...)
            src_wave = (wave - 2 if (wave % 3 == 0 and d % 2 == 1)
                        else wave)
            rng = np.random.default_rng(100_000 * src_wave + d)
            words = vocab[rng.integers(0, len(vocab), WORDS_PER_DOC)]
            stop_pos = rng.integers(0, WORDS_PER_DOC, WORDS_PER_DOC // 8)
            words[stop_pos] = stops[rng.integers(0, len(stops),
                                                 len(stop_pos))]
            # ~12-word lines so the line store sees realistic lines
            lines = [" ".join(words[i:i + 12])
                     for i in range(0, len(words), 12)]
            body = "\n".join(lines).encode()
            head = (
                b"WARC/1.0\r\n"
                b"WARC-Type: conversion\r\n"
                + f"WARC-Record-ID: <urn:uuid:w{wave}-{d}>\r\n".encode()
                + f"WARC-Target-URI: http://crawl/w{wave}/{d}\r\n".encode()
                + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
                + b"Content-Type: text/plain\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
            )
            f.write(head + body + b"\r\n\r\n")
    print(f"gen {path}: {os.path.getsize(path) / 1e6:.0f} MB "
          f"({time.time() - t0:.0f}s)")
    return path


def _tree_rss_kb(root_pid: int) -> int:
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/bench_crawl_wave")
    ap.add_argument("--out", default=None)
    cli = ap.parse_args()

    if os.path.exists(cli.workdir):
        shutil.rmtree(cli.workdir)
    os.makedirs(cli.workdir)

    from examples.crawl_wave import run_wave
    from syzgydb_spark.session import get_spark

    # ONE session for the whole loop — the fingerprint/line stores are
    # session-catalog bucketed tables (in-memory catalog), and a
    # long-lived ingest service is the deployment shape anyway. The
    # RSS claim this enables is the one that matters for that shape:
    # the process tree's peak must NOT grow wave over wave (a JVM
    # never returns memory, so growth would mean the ingest is
    # accumulating corpus-sized state).
    spark = get_spark(app_name="crawl-bench", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    for t in (FP_TABLE, LINE_TABLE):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    me = os.getpid()
    peak = [0]
    done = threading.Event()

    def sample():
        while not done.is_set():
            peak[0] = max(peak[0], _tree_rss_kb(me))
            time.sleep(0.1)

    threading.Thread(target=sample, daemon=True).start()

    def _store_file_counts() -> dict:
        """Per-store data-file counts after a wave — the read-
        amplification a probe pays. Bounded deltas + periodic
        compaction must keep these FLAT across compaction cycles."""
        out = {}
        state = os.path.join(cli.workdir, "state")
        for store in ("bloom", "hot_terms", "len_dist"):
            n = 0
            root = os.path.join(state, store)
            for dirpath, _dirs, files in os.walk(root):
                n += sum(f.endswith((".parquet", ".bin")) for f in files)
            out[f"files_{store}"] = n
        wh = os.path.join(REPO, "spark-warehouse")
        for t in (FP_TABLE, LINE_TABLE):
            n = 0
            for dirpath, _dirs, files in os.walk(os.path.join(wh, t)):
                n += sum(f.endswith(".parquet") for f in files)
            out[f"files_{t.rsplit('_', 1)[-1]}"] = n
        return out

    report = {"waves": [], "n_waves": N_WAVES,
              "docs_per_wave": DOCS_PER_WAVE,
              "words_per_doc": WORDS_PER_DOC}
    try:
        for wave in range(1, N_WAVES + 1):
            seg = gen_wave_segment(cli.workdir, wave)
            seg_mb = round(os.path.getsize(seg) / 1e6)
            peak[0] = 0  # per-wave peak (high-water resets only here)
            t0 = time.time()
            stats = run_wave(
                spark, cli.workdir,
                fingerprint_table=FP_TABLE,
                line_table=LINE_TABLE,
                min_words=50,
                bloom_bits=1 << 22,
                mg_capacity=4096,
                # fold deltas back every third wave (and on the last):
                # the steady-state cadence a deployment runs
                compact=(wave % 3 == 0 or wave == N_WAVES),
            )
            row = {"wave": wave, "segment_mb": seg_mb,
                   "wall_s": round(time.time() - t0, 1),
                   "peak_rss_mb": round(peak[0] / 1024),
                   **stats, **_store_file_counts()}
            report["waves"].append(row)
            print(json.dumps(row))
    finally:
        done.set()
        for t in (FP_TABLE, LINE_TABLE):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    if cli.out:
        with open(cli.out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
