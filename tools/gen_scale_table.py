"""Emit the SCALE.md measured-decade tables from median-of-N bench
captures (tools/bench_capture.py output). Ratios compare median warm
times between two captures of the SAME code at different scale
factors; the spread column carries each query's own max/min across
runs so a reader can see whether a ratio is signal or noise.

Usage:
  python tools/gen_scale_table.py r8_sf0.1 r8_sf1            # 10x decade
  python tools/gen_scale_table.py r8_sf1_docs r8_sf3_docs    # 3x docs decade
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(tag):
    with open(os.path.join(ROOT, "docs", "bench", f"{tag}.json")) as f:
        return json.load(f)


def main():
    lo_tag, hi_tag = sys.argv[1], sys.argv[2]
    lo, hi = load(lo_tag), load(hi_tag)
    factor = hi["sf"] / lo["sf"]
    print(f"### {lo_tag} -> {hi_tag} (data x{factor:g}; medians of "
          f"{lo['n_runs']}/{hi['n_runs']} runs; loadavg "
          f"{lo['loadavg_1m_before_each_run']} / {hi['loadavg_1m_before_each_run']})\n")
    print("| query | sf%s med (s) | sf%s med (s) | ratio | spread lo/hi |"
          % (f"{lo['sf']:g}", f"{hi['sf']:g}"))
    print("|---|---|---|---|---|")
    rows = []
    for q in lo["median_queries"]:
        if q not in hi["median_queries"]:
            continue
        a, b = lo["median_queries"][q], hi["median_queries"][q]
        ratio = b / max(a, 1e-9)
        rows.append((ratio, q, a, b))
    for ratio, q, a, b in sorted(rows, reverse=True):
        print(f"| {q} | {a} | {b} | {ratio:.1f}x | "
              f"{lo['spread'].get(q, '?')}x/{hi['spread'].get(q, '?')}x |")
    sup = [q for r, q, _, _ in rows if r > factor * 1.2]
    print(f"\nsuper-linear (> {factor * 1.2:.1f}x): {sup or 'none'}")
    if lo.get("contended") or hi.get("contended"):
        print(f"CONTENDED capture in pair: lo={lo.get('contended')} "
              f"hi={hi.get('contended')} — rerun before drawing conclusions")


if __name__ == "__main__":
    main()
