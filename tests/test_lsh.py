"""ANN recall gate — the reference's own acceptance criterion
(collection_test.go:23-103): medium-precision top-k distances must be
close to exact top-k on 20k random cosine vectors, while touching less
than 100% of the collection. Bucket-identical results are explicitly
NOT required (the reference's trees are randomized too, SURVEY §7.3.6).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.knn import knn_join_fast
from syzgydb_spark.operators.lsh import LshIndex

N = 20000
DIM = 3  # matches collection_test.go:33


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(42)
    vecs = rng.uniform(size=(N, DIM))
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(N)], "id LONG, vector ARRAY<DOUBLE>"
    )
    idx = LshIndex(DIM, num_tables=5, num_planes=10, seed=1, method="cosine")
    signed = idx.with_signatures(df).cache()
    signed.count()
    return signed, vecs, idx


def exact_cosine_topk(vecs, q, k):
    qn = q / np.linalg.norm(q)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    d = np.arccos(np.clip(vn @ qn, -1, 1)) / np.pi
    order = np.lexsort((np.arange(len(vecs)), d))
    return [(int(i), float(d[i])) for i in order[:k]]


def test_recall_vs_exact(corpus):
    signed, vecs, idx = corpus
    rng = np.random.default_rng(7)
    k = 10
    total_recall, trials = 0.0, 8
    for _ in range(trials):
        q = rng.uniform(size=DIM)
        got = idx.search(signed, q.tolist(), k).collect()
        got_ids = {r["id"] for r in got}
        want = exact_cosine_topk(vecs, q, k)
        want_ids = {w[0] for w in want}
        total_recall += len(got_ids & want_ids) / k
        # distance-ratio criterion (collection_test.go:82-96): the kth
        # approx distance must be within 2x of the kth exact distance
        if got:
            assert got[-1]["distance"] <= max(want[-1][1] * 2.0, want[-1][1] + 0.05)
    assert total_recall / trials >= 0.6, f"mean recall {total_recall/trials}"


def test_percent_searched_below_100(corpus):
    signed, vecs, idx = corpus
    q = vecs[123]
    cand = signed.where(idx.candidate_predicate(q.tolist())).count()
    assert 0 < cand < N, f"candidates {cand} of {N}"


def test_search_observation_metrics(corpus):
    """percent_searched collected with the search's own pass
    (collection.go:700-709) — no second count job."""
    from pyspark.sql import Observation

    signed, vecs, idx = corpus
    q = vecs[123]
    obs = Observation("ps")
    idx.search(signed, q.tolist(), 10, observation=obs).collect()
    m = obs.get
    assert m["points_total"] == N
    # matches the standalone candidate count exactly
    cand = signed.where(idx.candidate_predicate(q.tolist())).count()
    assert m["points_searched"] == cand
    assert 0 < m["points_searched"] < m["points_total"]


def test_knn_join_observation_metrics(corpus, spark):
    from pyspark.sql import Observation

    signed, vecs, idx = corpus
    queries = spark.createDataFrame(
        [(j, vecs[j * 31].tolist()) for j in range(5)],
        "query_id LONG, query_vector ARRAY<DOUBLE>",
    )
    obs = Observation("cp")
    idx.knn_join(signed, queries, 10, observation=obs).count()
    m = obs.get
    assert 0 < m["candidate_pairs"] < N * 5  # touched less than all pairs


def test_ann_knn_join_recall(corpus, spark):
    signed, vecs, idx = corpus
    nq, k = 10, 10
    queries = spark.createDataFrame(
        [(j, vecs[j * 97].tolist()) for j in range(nq)],
        "query_id LONG, query_vector ARRAY<DOUBLE>",
    )
    got = idx.knn_join(signed, queries, k).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["id"])
    exact = knn_join_fast(
        signed.select("id", "vector"), queries, k, method="cosine"
    ).collect()
    exact_by_q = {}
    for r in exact:
        exact_by_q.setdefault(r["query_id"], set()).add(r["id"])
    recalls = [
        len(by_q.get(q, set()) & exact_by_q[q]) / k for q in exact_by_q
    ]
    assert float(np.mean(recalls)) >= 0.6, recalls


def test_signature_determinism():
    a = LshIndex(8, num_tables=3, num_planes=12, seed=5)
    b = LshIndex(8, num_tables=3, num_planes=12, seed=5)
    v = np.random.default_rng(0).normal(size=8).tolist()
    assert a.query_signatures(v) == b.query_signatures(v)
    c = LshIndex(8, num_tables=3, num_planes=12, seed=6)
    assert a.query_signatures(v) != c.query_signatures(v)
