"""Generate the documents AND events tables at a given scale factor —
the second measured decade for the scan-bound headline queries
(quality_score, filter_lang_scan [events], html_extract,
dedup_normalized, dedup_keep_best, leakage_split, unicode_clean,
entropy_filter) without paying lineitem/orders generation at sf>=3.
Same models as tools/gen_testdata.py (VOCAB draw, 10-90 words,
~0.16% planted exact duplicates; 30-day ~sorted events with JSON
props), own seed stream (content differs from a full-run sf dir;
scaling measurements don't compare rows across sf anyway).

Usage: python tools/gen_docs_sf.py --sf 3
"""

import argparse
import json
import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_testdata import EVENT_TYPES, LANG_W, LANGS, VOCAB, _write  # noqa: E402


def generate_events(sf: float, out_dir: str, seed: int = 428) -> None:
    """Same distribution as gen_testdata's events block: 30 days of
    ~sorted timestamps, 5 event types, uniform value, JSON props."""
    rng = np.random.default_rng(seed)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    day = 86_400_000_000
    e_t0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    ts = np.sort(rng.integers(0, 30 * day, n_ev)) + e_t0
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.uniform(0.0, 600.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))


def generate_documents(sf: float, out_dir: str, seed: int = 427) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_doc = int(50_000 * sf)
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 91, n_doc)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), int(n))]) for n in lens
    ]
    n_dup = max(1, int(n_doc * 0.0016))
    dup_src = rng.integers(0, n_doc, n_dup)
    dup_dst = rng.integers(0, n_doc, n_dup)
    for s, t in zip(dup_src, dup_dst):
        if s != t:
            texts[int(t)] = texts[int(s)]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_W)),
        "source": [f"src{i % 20}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def generate_embeddings(sf: float, out_dir: str, seed: int = 429) -> None:
    """Same model as gen_testdata's embeddings block (unit-norm 64-dim
    gaussian directions, 20k rows/sf): gives the served-ANN scaling
    measurements a second decade (sf1 -> sf3) without paying full
    TPC-H generation."""
    rng = np.random.default_rng(seed)
    n_emb = int(20_000 * sf)
    X = rng.standard_normal((n_emb, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=3.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"testdata_sf{args.sf:g}",
    )
    generate_documents(args.sf, out)
    generate_events(args.sf, out)
    generate_embeddings(args.sf, out)
    print("done:", out)
