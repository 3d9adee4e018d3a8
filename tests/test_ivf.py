"""IVF ANN: recall vs exact on the embeddings fixture, probe behavior,
and the batch IVF KNN join."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.ivf import IvfIndex
from syzgydb_spark.operators.knn import knn_join_fast


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("vector")
    )
    idx = IvfIndex.fit(emb, n_clusters=16, method="euclidean", seed=7)
    celled = idx.with_cells(emb).cache()
    celled.count()
    return celled, idx


def test_observation_metrics(corpus, spark):
    """points/candidate-pair metrics observed with the query's own pass."""
    from pyspark.sql import Observation

    celled, idx = corpus
    total = celled.count()
    qv = [float(x) for x in celled.select("vector").first()[0]]
    obs = Observation("ps")
    idx.search(celled, qv, 5, n_probes=4, observation=obs).collect()
    m = obs.get
    assert m["points_total"] == total
    assert 0 < m["points_searched"] < m["points_total"]

    queries = celled.limit(5).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vector")
    )
    obs2 = Observation("cp")
    idx.knn_join(celled, queries, 5, n_probes=4, observation=obs2).count()
    assert 0 < obs2.get["candidate_pairs"] < total * 5


def test_fit_produces_centroids(corpus):
    celled, idx = corpus
    assert idx.centers.shape[0] == 16
    cells = celled.select("ivf_cell").distinct().count()
    assert cells > 4  # data actually spreads over cells


def test_search_recall_vs_exact(corpus, spark):
    celled, idx = corpus
    vecs = {r["id"]: r["vector"] for r in celled.select("id", "vector").collect()}
    mat = np.array([vecs[i] for i in sorted(vecs)])
    ids = np.array(sorted(vecs))
    rng = np.random.default_rng(5)
    recalls = []
    for _ in range(6):
        qid = int(rng.choice(ids))
        q = vecs[qid]
        got = {r["id"] for r in idx.search(celled, q, 10, n_probes=6).collect()}
        d = np.linalg.norm(mat - np.array(q), axis=1)
        want = set(ids[np.argsort(d)[:10]].tolist())
        recalls.append(len(got & want) / 10)
    assert float(np.mean(recalls)) >= 0.7, recalls


def test_probed_fraction_below_full(corpus):
    celled, idx = corpus
    total = celled.count()
    q = celled.select("vector").first()[0]
    probed = celled.where(
        F.col("ivf_cell").isin(idx.probe_cells(q, 4))
    ).count()
    assert 0 < probed < total


def test_ivf_knn_join_recall(corpus, spark):
    celled, idx = corpus
    queries = celled.limit(8).select(
        F.col("id").alias("query_id"), F.col("vector").alias("query_vector")
    )
    approx = idx.knn_join(celled, queries, k=5, n_probes=6).collect()
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], set()).add(r["id"])
    exact = knn_join_fast(celled.select("id", "vector"), queries, k=5).collect()
    exact_by_q = {}
    for r in exact:
        exact_by_q.setdefault(r["query_id"], set()).add(r["id"])
    recalls = [len(by_q.get(q, set()) & exact_by_q[q]) / 5 for q in exact_by_q]
    assert float(np.mean(recalls)) >= 0.7, recalls


def test_roundtrip_serialization(corpus):
    _, idx = corpus
    clone = IvfIndex.from_dict(idx.to_dict())
    assert np.allclose(clone.centers, idx.centers)
    v = idx.centers[0].tolist()
    assert clone.probe_cells(v, 3) == idx.probe_cells(v, 3)
