"""Bench variance protocol (r5-verdict task 3): median-of-N capture.

Single bench runs on this box have shown up to ~2.7x same-code
variance under machine contention (the r7 vs r7c captures), which
made per-query regression claims undecidable. This tool runs bench.py
N times (fresh process per run), records the 1-minute load average
before each run, and writes ONE capture JSON whose headline numbers
are per-query MEDIANS with a per-query spread column (max/min across
runs). A capture where any query spreads >1.5x is stamped
``"contended": true`` so it can never silently anchor a regression
narrative.

Usage:
  python tools/bench_capture.py --tag r8_sf0.1 --sf-dir /root/testdata/sf0.1
  python tools/bench_capture.py --tag r8_sf3_docs --sf-dir testdata_sf3 \\
      --queries quality_score,filter_lang_scan,html_extract,...
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPREAD_LIMIT = 1.5


def one_run(sf_dir: str, queries: str | None, cpus: str | None) -> tuple[dict, list]:
    load_pre = list(os.getloadavg())
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    if cpus:
        env["SPARK_GRAFT_CPUS"] = cpus
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        out_path = tf.name
    cmd = [sys.executable, os.path.join(ROOT, "bench.py"), "--out", out_path]
    if queries:
        cmd += ["--queries", queries]
    subprocess.run(cmd, cwd=ROOT, check=True, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out_path) as f:
        result = json.load(f)
    os.unlink(out_path)
    return result, load_pre


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, help="capture name, e.g. r8_sf0.1")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--cpus", default=None)
    cli = ap.parse_args()

    runs, loads = [], []
    for i in range(cli.runs):
        print(f"run {i + 1}/{cli.runs} (loadavg {os.getloadavg()[0]:.1f}) ...",
              flush=True)
        result, load_pre = one_run(cli.sf_dir, cli.queries, cli.cpus)
        runs.append(result)
        loads.append(load_pre)
        print(f"  warm total {result['value']}s  cold total "
              f"{result['cold_run_total']}s", flush=True)

    names = list(runs[0]["queries"])
    med = {q: round(statistics.median(r["queries"][q] for r in runs), 3)
           for q in names}
    med_cold = {q: round(statistics.median(r["cold_run_queries"][q] for r in runs), 3)
                for q in names}
    spread = {}
    for q in names:
        vals = [r["queries"][q] for r in runs]
        spread[q] = round(max(vals) / max(min(vals), 1e-9), 2)
    contended = [q for q, s in spread.items() if s > SPREAD_LIMIT]

    capture = {
        "tag": cli.tag,
        "sf": runs[0]["sf"],
        "sf_dir": cli.sf_dir,
        "n_runs": cli.runs,
        "protocol": f"median of {cli.runs} fresh-process runs; spread = "
                    f"max/min warm time per query; contended if any > {SPREAD_LIMIT}",
        "loadavg_1m_before_each_run": [round(l[0], 2) for l in loads],
        "median_queries": med,
        "median_total": round(sum(med.values()), 3),
        "median_cold_queries": med_cold,
        "median_cold_total": round(sum(med_cold.values()), 3),
        "spread": spread,
        "contended_queries": contended,
        "contended": bool(contended),
        "n_shuffles": runs[0].get("n_shuffles", {}),
        "runs": [
            {"queries": r["queries"], "cold_run_queries": r["cold_run_queries"]}
            for r in runs
        ],
    }
    out = os.path.join(ROOT, "docs", "bench", f"{cli.tag}.json")
    with open(out, "w") as f:
        json.dump(capture, f, indent=1, sort_keys=True)
    print(f"wrote {out}: median_total={capture['median_total']}s "
          f"spread_max={max(spread.values()) if spread else 0}x "
          f"contended={capture['contended']} ({contended})")


if __name__ == "__main__":
    main()
