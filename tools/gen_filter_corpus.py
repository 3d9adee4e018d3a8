"""Regenerate fixtures/filter_fuzz_corpus.jsonl — the committed
filter-language conformance corpus (SURVEY §7.3 pinned error->drop
cases + 480+ seeded fuzz cases covering params, ANY/ALL, mixed-type
comparisons). Deterministic: same seed -> same bytes; the test
test_corpus_file_is_current fails on any drift so verdict changes are
always a reviewable diff.

Usage: python tools/gen_filter_corpus.py
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import test_filter_differential as tfd  # noqa: E402


def main():
    corpus = tfd.build_corpus()
    out = os.path.join(ROOT, tfd.CORPUS_PATH)
    with open(out, "w") as f:
        for case in corpus:
            f.write(json.dumps(case, sort_keys=True) + "\n")
    n_pinned = sum(1 for c in corpus if c["pinned"])
    n_keep = sum(1 for c in corpus if c["keep"])
    print(f"wrote {out}: {len(corpus)} cases "
          f"({n_pinned} pinned, {n_keep} keep / {len(corpus) - n_keep} drop)")


if __name__ == "__main__":
    main()
