"""Generate an sf1 replica of the driver's synthetic testdata shape.

The driver generates /root/testdata/sf{0.001,0.01,0.1} (TESTDATA.md,
read-only) but no sf1 — and the round-3 verdict's top task is a
measured sf0.1→sf1 scaling run of the bench headline. This script
reproduces the same SCHEMA and DISTRIBUTIONS (measured from the
driver's sf0.1 files: row-count ratios, value ranges, category
weights, planted-duplicate rate, unit-norm 64-dim embeddings) at 10×
sf0.1 cardinality, written under the repo (we must not write to
/root/testdata). It is NOT bit-identical to the driver's generator —
irrelevant for scaling measurements, which compare the engine against
itself at two sizes.

Usage: python tools/gen_testdata.py [--sf 1.0] [--out testdata_sf1]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Vocabulary observed in the driver's documents.text (word frequency
# shape: generic data/query words + "the"/"a" fillers).
VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "vector", "join", "customer", "the",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_NAMES1 = ["large", "hot", "blue", "green", "red", "small", "cold", "dark"]
P_NAMES2 = ["ring", "bolt", "screw", "nut", "washer", "plate", "rod", "gear"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    # Bounded row groups so Spark can SPLIT the scan: pyarrow's default
    # (1M rows/group) writes the whole table as one row group at these
    # scales, and a one-row-group file is a one-task scan no matter how
    # small maxPartitionBytes goes — every compute-bound query downstream
    # then runs single-threaded. Real lake layouts ship many files and
    # multi-row-group parquet; ~512KB row groups reproduce that
    # splittability at fixture scale.
    bpr = max(1, table.nbytes // max(1, table.num_rows))
    rows_per_group = max(2048, min(1_000_000, (512 << 10) // bpr))
    pq.write_table(
        table,
        os.path.join(out_dir, f"{name}.parquet"),
        row_group_size=rows_per_group,
    )
    print(f"{name}: {table.num_rows} rows ({rows_per_group} rows/group)")


def generate(sf: float, out_dir: str, seed: int = 427) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    # Cardinalities: 10x the measured sf0.1 counts at sf=1.
    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    # region / nation (fixed small dims)
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{P_NAMES1[i % 8]} {P_NAMES2[(i // 8) % 8]}" for i in range(n_part)
        ],
        "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, len(P_TYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1 % 1000, 2),
    }))

    # orders: dates 1995-01-01 .. 2001-08-01 (day granularity)
    day = 86_400_000_000  # us
    o_t0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    o_days = (np.datetime64("2001-08-01", "us").astype(np.int64) - o_t0) // day
    o_date = o_t0 + rng.integers(0, o_days + 1, n_ord) * day
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": pa.array(o_date, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: ~4 lines per order, linenumber 1..7
    l_ord = rng.integers(0, n_ord, n_li)
    l_ord.sort()
    # linenumber = position within its order (1-based), capped at 7
    _, counts = np.unique(l_ord, return_counts=True)
    linenum = (np.arange(n_li) - np.repeat(np.cumsum(counts) - counts, counts)) % 7 + 1
    ship = o_t0 + rng.integers(1, o_days + 95, n_li) * day
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ord, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))

    # events: 30 days from 2024-01-01, ~sorted ts, json props
    e_t0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    span = 30 * day
    ts = np.sort(rng.integers(0, span, n_ev)) + e_t0
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.uniform(0.0, 600.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 10-90 words from VOCAB; ~0.16% planted exact duplicates
    vocab = np.array(VOCAB)
    texts = []
    for i in range(n_doc):
        n_words = int(rng.integers(10, 91))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words)]))
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

    # embeddings: unit-norm 64-dim gaussian directions, label 0..9
    X = rng.standard_normal((n_emb, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"testdata_sf{args.sf:g}",
    )
    generate(args.sf, out)
    print("done:", out)
