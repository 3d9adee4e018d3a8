"""Measured recall@10 vs candidate fraction for every ANN tier
(docs/RECALL.md source): exact cosine top-10 as truth, every tier's
candidate_pairs Observation as the cost axis.

Usage: python tools/recall_sweep.py [sf_dir]
       python tools/recall_sweep.py --synthetic N DIM   (seeded uniform
       vectors — the same worst-case-for-ANN distribution as the sf
       embeddings, at the reference's 20k test scale)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation
from pyspark.sql import functions as F

from syzgydb_spark.session import get_spark
from syzgydb_spark.operators.knn import knn_join_fast
from syzgydb_spark.operators.lsh import LshIndex
from syzgydb_spark.operators.ivf import IvfIndex
from syzgydb_spark.operators.pq import PqIndex

spark = get_spark(app_name="recall-sweep")
spark.sparkContext.setLogLevel("ERROR")

if len(sys.argv) > 1 and sys.argv[1] == "--synthetic":
    import numpy as np

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    rng = np.random.default_rng(42)
    vecs = rng.uniform(size=(n, dim))
    emb = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
else:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = 64
data = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector")).cache()
n_data = data.count()
queries = (
    emb.where(F.col("vec_id") % 50 == 0)
    .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector"))
    .cache()
)
n_q = queries.count()
K = 10

exact = knn_join_fast(data, queries, K, method="cosine")
truth = {}
for r in exact.collect():
    truth.setdefault(r["query_id"], set()).add(r["id"])


def recall(df):
    got = {}
    for r in df.collect():
        got.setdefault(r["query_id"], set()).add(r["id"])
    tot = sum(len(truth[q] & got.get(q, set())) for q in truth)
    return tot / (len(truth) * K)


rows = []

lsh = LshIndex(dim, num_tables=10, num_planes=8, method="cosine")
sig = lsh.with_signatures(data, "vector").cache()
sig.count()
for probes in (0, 2, 4):
    obs = Observation(f"l{probes}")
    r = lsh.knn_join(sig, queries, K, observation=obs, n_probes=probes)
    rec = recall(r)
    pairs = obs.get["candidate_pairs"]
    rows.append(("LSH (10 tables x 8 planes)", f"n_probes={probes}", rec,
                 pairs / (n_data * n_q)))
    print(rows[-1], flush=True)

n_cells = 64 if n_data > 5000 else 32
ivf = IvfIndex.fit(data, "vector", n_clusters=n_cells, method="cosine", seed=7)
with_cells = ivf.with_cells(data, "vector").cache()
with_cells.count()
for probes in (1, 2, 4, 8, 16):
    obs = Observation(f"i{probes}")
    r = ivf.knn_join(with_cells, queries, K, n_probes=probes, observation=obs)
    rec = recall(r)
    pairs = obs.get["candidate_pairs"]
    rows.append((f"IVF ({n_cells} cells)", f"n_probes={probes}", rec, pairs / (n_data * n_q)))
    print(rows[-1], flush=True)

pq = PqIndex.fit(data, "vector", m=8, k=64, method="cosine", seed=7)
enc = pq.encode(data, "vector").cache()
enc.count()
for rr in (K, 4 * K, 10 * K):
    r = pq.adc_knn_join(enc, queries, K, rerank=rr if rr > K else None)
    rec = recall(r)
    label = f"shortlist={rr} (no rerank)" if rr == K else f"rerank={rr}"
    rows.append(("PQ (m=8, k=64) full ADC scan", label, rec, 1.0))
    print(rows[-1], flush=True)

enc_cells = ivf.with_cells(enc, "vector").cache()
enc_cells.count()
for probes in (2, 4, 8, 16):
    obs = Observation(f"ip{probes}")
    r = pq.ivf_adc_knn_join(enc_cells, queries, K, ivf=ivf, n_probes=probes,
                            rerank=4 * K, observation=obs)
    rec = recall(r)
    pairs = obs.get["candidate_pairs"]
    rows.append((f"IVF-PQ ({n_cells} cells, m=8)", f"n_probes={probes}, rerank=40",
                 rec, pairs / (n_data * n_q)))
    print(rows[-1], flush=True)

print("\n| Tier | Config | Recall@10 | Candidate fraction |")
print("|---|---|---|---|")
for tier, cfg, rec, frac in rows:
    star = "*" if tier.startswith("PQ") else ""
    print(f"| {tier} | {cfg} | {rec:.3f} | {frac:.3f}{star} |")
print(f"\nqueries={n_q} data={n_data}")
