"""Product quantization: encode, ADC join, re-rank recall, cosine."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.knn import knn_join
from syzgydb_spark.operators.pq import PqIndex, _subspaces


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return df.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vector"),
    ).cache()


def test_subspaces_must_divide():
    assert _subspaces(64, 8) == [(i * 8, (i + 1) * 8) for i in range(8)]
    with pytest.raises(ValueError):
        _subspaces(65, 8)


def test_encode_codes_in_range(emb):
    idx = PqIndex.from_seed(64, m=8, k=16, seed=42)
    codes = idx.encode(emb, "vector").select("pq_code").collect()
    for r in codes:
        assert len(r[0]) == 8
        assert all(0 <= c < 16 for c in r[0])


def test_encode_deterministic(emb):
    idx = PqIndex.from_seed(64, m=8, k=16, seed=42)
    a = idx.encode(emb, "vector").select("id", "pq_code").collect()
    b = idx.encode(emb, "vector").select("id", "pq_code").collect()
    assert sorted(map(tuple, ((r[0], tuple(r[1])) for r in a))) == sorted(
        map(tuple, ((r[0], tuple(r[1])) for r in b))
    )


def test_adc_matches_numpy(emb, spark):
    """Pure-ADC distances equal the straight numpy computation of
    Σ_m ‖q_m − codeword(code_m)‖² on every returned row."""
    idx = PqIndex.from_seed(64, m=8, k=16, seed=42)
    queries = emb.where(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vector")
    )
    got = idx.adc_knn_join(emb, queries, 5).collect()

    vecs = {r["id"]: np.array(r["vector"]) for r in emb.collect()}
    codes = {
        r["id"]: np.array(r["pq_code"])
        for r in idx.encode(emb, "vector").select("id", "pq_code").collect()
    }
    for row in got:
        q = vecs[row["query_id"]]
        c = codes[row["id"]]
        d2 = 0.0
        for mi in range(8):
            sub = q[mi * 8 : (mi + 1) * 8]
            d2 += ((sub - idx.codebooks[mi, c[mi]]) ** 2).sum()
        assert abs(np.sqrt(d2) - row["distance"]) < 1e-9


def test_adc_shortlist_is_topk(emb):
    """Returned rows per query = k, ascending distance."""
    idx = PqIndex.from_seed(64, m=8, k=16, seed=42)
    queries = emb.where(F.col("id") < 3).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vector")
    )
    res = idx.adc_knn_join(emb, queries, 7).collect()
    per = {}
    for r in res:
        per.setdefault(r["query_id"], []).append(r["distance"])
    assert set(per) == {0, 1, 2}
    for dists in per.values():
        assert len(dists) == 7 and dists == sorted(dists)


def test_fitted_rerank_recall(emb):
    """Fitted codebook + exact re-rank meets the recall criterion vs
    exact KNN (the reference's own gate, collection_test.go:82-101).
    Measured 0.845 at rerank=40; gated at 0.7 for slack."""
    queries = emb.where(F.col("id") < 20).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vector")
    )
    exact = knn_join(emb, queries, 10, method="euclidean").select("query_id", "id").collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["id"])

    idx = PqIndex.fit(emb, "vector", m=16, k=16, seed=42)
    got_rows = idx.adc_knn_join(emb, queries, 10, rerank=40).select("query_id", "id").collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["query_id"], set()).add(r["id"])
    recall = np.mean([len(got.get(q, set()) & s) / len(s) for q, s in truth.items()])
    assert recall >= 0.7, f"recall@10 {recall:.3f}"


def test_rerank_distances_are_exact(emb):
    """With rerank, reported distances are true euclidean distances."""
    idx = PqIndex.fit(emb, "vector", m=8, k=16, seed=42)
    queries = emb.where(F.col("id") < 3).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vector")
    )
    vecs = {r["id"]: np.array(r["vector"]) for r in emb.collect()}
    for row in idx.adc_knn_join(emb, queries, 5, rerank=20).collect():
        true = np.linalg.norm(vecs[row["query_id"]] - vecs[row["id"]])
        assert abs(true - row["distance"]) < 1e-9


def test_cosine_distances_in_range(emb):
    idx = PqIndex.from_seed(64, m=8, k=16, seed=7, method="cosine")
    queries = emb.where(F.col("id") < 3).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vector")
    )
    rows = idx.adc_knn_join(emb, queries, 5).collect()
    assert rows and all(0.0 <= r["distance"] <= 1.0 for r in rows)


def test_search_single_query(emb):
    idx = PqIndex.fit(emb, "vector", m=8, k=16, seed=42)
    vec = [float(x) for x in emb.where(F.col("id") == 0).first()["vector"]]
    rows = idx.search(emb, vec, 5, rerank=25).collect()
    assert len(rows) == 5
    # exact re-rank of a shortlist containing the query's own vector
    # must put it first at distance 0
    assert rows[0]["id"] == 0 and rows[0]["distance"] < 1e-9


def test_roundtrip_dict(emb):
    idx = PqIndex.from_seed(64, m=8, k=16, seed=42)
    back = PqIndex.from_dict(idx.to_dict())
    assert np.allclose(idx.codebooks, back.codebooks)
    assert back.method == idx.method


def test_ivf_pq_recall(emb):
    """IVF-PQ (cell-pruned ADC + exact re-rank) meets the recall
    criterion vs exact KNN. Measured 0.745 at 8/16 probes; gated 0.55."""
    from syzgydb_spark.operators.ivf import IvfIndex

    queries = emb.where(F.col("id") < 20).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vector")
    )
    exact = knn_join(emb, queries, 10, method="euclidean").select("query_id", "id").collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["id"])

    ivf = IvfIndex.fit(emb, "vector", n_clusters=16, method="euclidean", seed=42)
    pq = PqIndex.fit(emb, "vector", m=16, k=16, seed=42)
    data = ivf.with_cells(pq.encode(emb, "vector"), "vector")
    res = pq.ivf_adc_knn_join(
        data, queries, 10, ivf=ivf, n_probes=8, rerank=40
    ).select("query_id", "id").collect()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], set()).add(r["id"])
    recall = np.mean([len(got.get(q, set()) & s) / len(s) for q, s in truth.items()])
    assert recall >= 0.55, f"recall@10 {recall:.3f}"


def test_ivf_pq_all_probes_equals_plain_adc(emb):
    """Probing every cell disables the pruning — the result must equal
    the plain ADC join with the same codebooks (same re-rank)."""
    from syzgydb_spark.operators.ivf import IvfIndex

    queries = emb.where(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vector")
    )
    ivf = IvfIndex.fit(emb, "vector", n_clusters=8, method="euclidean", seed=42)
    pq = PqIndex.fit(emb, "vector", m=8, k=16, seed=42)
    data = ivf.with_cells(pq.encode(emb, "vector"), "vector")
    a = pq.ivf_adc_knn_join(
        data, queries, 7, ivf=ivf, n_probes=8, rerank=30
    ).select("query_id", "id").collect()
    b = pq.adc_knn_join(data, queries, 7, rerank=30).select("query_id", "id").collect()
    assert sorted((r["query_id"], r["id"]) for r in a) == sorted(
        (r["query_id"], r["id"]) for r in b
    )


def test_ivf_pq_candidate_observation(emb, spark):
    """candidate_pairs metric reports the pruned pair count (< N*Q)."""
    from pyspark.sql import Observation

    from syzgydb_spark.operators.ivf import IvfIndex

    queries = emb.where(F.col("id") < 4).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vector")
    )
    ivf = IvfIndex.fit(emb, "vector", n_clusters=16, method="euclidean", seed=42)
    pq = PqIndex.fit(emb, "vector", m=8, k=16, seed=42)
    data = ivf.with_cells(pq.encode(emb, "vector"), "vector")
    obs = Observation("ivfpq")
    res = pq.ivf_adc_knn_join(
        data, queries, 5, ivf=ivf, n_probes=4, rerank=20, observation=obs
    )
    n = res.count()
    assert n == 20
    pairs = obs.get["candidate_pairs"]
    total = emb.count() * 4
    assert 0 < pairs < total  # pruned: strictly fewer than brute force
