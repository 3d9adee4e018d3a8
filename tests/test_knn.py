"""KNN / radius / listing / KNN-join vs numpy oracle.

Mirrors the reference's search tests: basic-k / max-count / radius /
filter subtests (collection_test.go:283-382), the rest_test.go:503-570
end-to-end filtered-search scenario, and pagination
(rest_test.go:72-160).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.knn import knn_join, knn_join_fast, search

DIM = 4
N = 200


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(42)
    vecs = rng.uniform(size=(N, DIM)) * 100
    rows = [
        (i, vecs[i].tolist(), '{"parity": %d, "score": %d}' % (i % 2, i % 100))
        for i in range(N)
    ]
    df = spark.createDataFrame(rows, "id LONG, vector ARRAY<DOUBLE>, metadata STRING").cache()
    return df, vecs


def brute_topk(vecs, q, k, mask=None):
    d = np.linalg.norm(vecs - np.asarray(q), axis=1)
    idx = np.arange(len(vecs))
    if mask is not None:
        idx = idx[mask]
        d = d[mask]
    order = np.lexsort((idx, d))
    return [(int(idx[o]), float(d[o])) for o in order[:k]]


def test_topk_matches_oracle(data):
    df, vecs = data
    q = [50.0, 50.0, 50.0, 50.0]
    got = [(r["id"], r["distance"]) for r in search(df, q, k=10).collect()]
    want = brute_topk(vecs, q, 10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], rel=1e-12)


def test_k_larger_than_collection(data):
    df, _ = data
    assert search(df, [0.0] * DIM, k=N + 50).count() == N


def test_radius(data):
    df, vecs = data
    q = [50.0] * DIM
    r = 30.0
    got = sorted(row["id"] for row in search(df, q, radius=r).collect())
    want = sorted(int(i) for i in np.where(np.linalg.norm(vecs - np.array(q), axis=1) <= r)[0])
    assert got == want


def test_filtered_search(data):
    # even-id filter, like collection_test.go:346-365
    df, vecs = data
    q = [50.0] * DIM
    got = [r["id"] for r in search(df, q, k=5, filter="parity == 0").collect()]
    mask = np.arange(N) % 2 == 0
    want = [w[0] for w in brute_topk(vecs, q, 5, mask)]
    assert got == want


def test_rest_filter_scenario(spark):
    """rest_test.go:503-570 — the reference's canonical end-to-end
    slice: 3 docs, search with filter `category == "A" AND score > 75`
    → exactly id 1."""
    rows = [
        (1, [0.1, 0.2, 0.3, 0.4, 0.5], '{"category": "A", "score": 80}'),
        (2, [0.2, 0.3, 0.4, 0.5, 0.6], '{"category": "B", "score": 90}'),
        (3, [0.3, 0.4, 0.5, 0.6, 0.7], '{"category": "A", "score": 70}'),
    ]
    df = spark.createDataFrame(rows, "id LONG, vector ARRAY<DOUBLE>, metadata STRING")
    res = search(
        df, [0.1, 0.2, 0.3, 0.4, 0.5], k=3,
        filter="category == 'A' AND score > 75", method="cosine",
    ).collect()
    assert [r["id"] for r in res] == [1]


def test_listing_pagination(data):
    # offset counts post-filter rows (collection.go:649-663)
    df, _ = data
    res = search(df, None, filter="parity == 0", offset=5, limit=10).collect()
    ids = [r["id"] for r in res]
    assert ids == [10, 12, 14, 16, 18, 20, 22, 24, 26, 28]


def test_listing_lexicographic_order(data):
    # the reference sorts LISTING ids as decimal strings: "10" < "2"
    # (spanfile.go:540-560); opt-in via id_order
    df, _ = data
    res = search(df, None, id_order="lexicographic", limit=14).collect()
    ids = [r["id"] for r in res]
    assert ids == sorted(ids, key=str)
    assert ids != sorted(ids)  # the quirk is actually visible (0,1,10,11,...)


def test_knn_join_matches_oracle(data, spark):
    df, vecs = data
    qrows = [(100 + j, vecs[j * 7].tolist()) for j in range(5)]
    queries = spark.createDataFrame(qrows, "query_id LONG, query_vector ARRAY<DOUBLE>")
    got = knn_join(df, queries, k=3).select("query_id", "id", "distance").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["id"], r["distance"]))
    for j in range(5):
        want = brute_topk(vecs, vecs[j * 7], 3)
        gq = sorted(by_q[100 + j], key=lambda t: (t[1], t[0]))
        assert [g[0] for g in gq] == [w[0] for w in want]


def test_knn_join_fast_matches_slow(data, spark):
    df, vecs = data
    qrows = [(100 + j, vecs[j * 7].tolist()) for j in range(5)]
    queries = spark.createDataFrame(qrows, "query_id LONG, query_vector ARRAY<DOUBLE>")
    for method in ("euclidean", "cosine"):
        fast = knn_join_fast(df, queries, k=3, method=method).collect()
        by_q = {}
        for r in fast:
            by_q.setdefault(r["query_id"], []).append((r["id"], r["distance"]))
        slow = knn_join(df, queries, k=3, method=method).collect()
        by_q_slow = {}
        for r in slow:
            by_q_slow.setdefault(r["query_id"], []).append((r["id"], r["distance"]))
        for qid in by_q_slow:
            f = sorted(by_q[qid], key=lambda t: (t[1], t[0]))
            s = sorted(by_q_slow[qid], key=lambda t: (t[1], t[0]))
            assert [x[0] for x in f] == [x[0] for x in s], (method, qid)
            for a, b in zip(f, s):
                assert a[1] == pytest.approx(b[1], rel=1e-9)


def test_topk_plan_uses_take_ordered(data):
    """ORDER BY dist LIMIT k must compile to TakeOrderedAndProject —
    the distributed bounded heap (≙ resultPriorityQueue,
    collection.go:536-564), never a full sort."""
    df, _ = data
    plan = search(df, [1.0] * DIM, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
