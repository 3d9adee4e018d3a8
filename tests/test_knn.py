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


# ---- broadcast-bound enforcement (the 100 TB driver-OOM guard) ----
#
# knn_join_fast ships the query relation in the Arrow closure; the
# contract "Q is driver-sized" is enforced with a bounded LIMIT-collect.
# These tests prove (a) overflow never materializes the full query
# relation on the driver, (b) with an ANN index supplied the join
# auto-dispatches to the distributed bucket join, (c) without one it
# fails loudly instead of OOMing at scale.

def _spy_collect(monkeypatch, df):
    """Record the row count of every DataFrame.collect during a call.

    Patches the CONCRETE DataFrame class (pyspark 4's classic
    DataFrame overrides collect — patching the abstract base would
    intercept nothing).
    """
    cls = type(df)
    sizes = []
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    return sizes, orig


def test_overflow_raises_without_ann(data, spark, monkeypatch):
    from syzgydb_spark.operators.knn import QueryRelationTooLarge

    df, vecs = data
    qrows = [(1000 + j, vecs[j % N].tolist()) for j in range(30)]
    queries = spark.createDataFrame(qrows, "query_id LONG, query_vector ARRAY<DOUBLE>")
    sizes, orig = _spy_collect(monkeypatch, queries)
    with pytest.raises(QueryRelationTooLarge):
        knn_join_fast(df, queries, k=3, max_broadcast_queries=10)
    # the guard itself must be bounded: nothing larger than max+1
    # ever reached the driver
    assert sizes and max(sizes) <= 11


def test_overflow_dispatches_to_lsh_join(data, spark, monkeypatch):
    from syzgydb_spark.operators.lsh import LshIndex

    df, vecs = data
    idx = LshIndex(DIM, num_tables=5, num_planes=6, seed=7, method="euclidean")
    signed = idx.with_signatures(df)
    qrows = [(1000 + j, vecs[(j * 11) % N].tolist()) for j in range(12)]
    queries = spark.createDataFrame(qrows, "query_id LONG, query_vector ARRAY<DOUBLE>")

    want = {
        (r["query_id"], r["id"])
        for r in idx.knn_join(signed, queries, 3).collect()
    }

    sizes, orig = _spy_collect(monkeypatch, queries)
    out = knn_join_fast(signed, queries, k=3, max_broadcast_queries=5, ann=idx)
    got = {(r["query_id"], r["id"]) for r in orig(out)}
    # every driver collect during the guarded call stayed within the
    # bound — the large query relation took the distributed join path
    assert sizes and max(sizes) <= 6
    assert got == want


def test_pq_adc_overflow_guard(data, spark, monkeypatch):
    from syzgydb_spark.operators.knn import QueryRelationTooLarge
    from syzgydb_spark.operators.pq import PqIndex

    df, vecs = data
    pq = PqIndex.from_seed(dim=DIM, m=2, k=16, seed=3)
    enc = pq.encode(df)
    qrows = [(1000 + j, vecs[j % N].tolist()) for j in range(20)]
    queries = spark.createDataFrame(qrows, "query_id LONG, query_vector ARRAY<DOUBLE>")
    sizes, _ = _spy_collect(monkeypatch, queries)
    with pytest.raises(QueryRelationTooLarge):
        pq.adc_knn_join(enc, queries, 3, max_broadcast_queries=8)
    assert sizes and max(sizes) <= 9


def test_ivf_adc_overflow_dispatches_to_ivf(data, spark, monkeypatch):
    from syzgydb_spark.operators.ivf import IvfIndex
    from syzgydb_spark.operators.pq import PqIndex

    df, vecs = data
    ivf = IvfIndex.fit(df, n_clusters=4, seed=5)
    pq = PqIndex.from_seed(dim=DIM, m=2, k=16, seed=3)
    enc = ivf.with_cells(pq.encode(df))
    qrows = [(1000 + j, vecs[(j * 13) % N].tolist()) for j in range(15)]
    queries = spark.createDataFrame(qrows, "query_id LONG, query_vector ARRAY<DOUBLE>")

    want = {
        (r["query_id"], r["id"])
        for r in ivf.knn_join(enc, queries, 3, n_probes=4).collect()
    }
    sizes, orig = _spy_collect(monkeypatch, queries)
    out = pq.ivf_adc_knn_join(enc, queries, 3, ivf=ivf, max_broadcast_queries=5)
    got = {(r["query_id"], r["id"]) for r in orig(out)}
    assert sizes and max(sizes) <= 6
    assert got == want
