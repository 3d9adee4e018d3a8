"""BM25 keyword search (operators/bm25.py): ranking semantics on a
hand-built corpus, index reuse, and the no-term edge. The end-to-end
form is oracle-checked by the driver (`bm25_search` vs DuckDB)."""

import math

import pytest

from syzgydb_spark.operators.bm25 import bm25_index, bm25_score, bm25_search


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle join spark spark"),      # tf(spark)=3
            (2, "spark filter scan"),                   # tf(spark)=1, short
            (3, "pandas arrow batch kernel transfer"),  # no match
            (4, "join join join shuffle exchange"),     # joins only
        ],
        "doc_id LONG, text STRING",
    )


def test_ranking_tf_and_idf(spark, corpus):
    rows = bm25_search(corpus, "spark", k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids == [1, 2]  # higher tf wins; non-matching docs absent
    assert rows[0]["score"] > rows[1]["score"] > 0


def test_rare_term_outweighs_common(spark, corpus):
    # 'exchange' (df=1) is rarer than 'spark' (df=2): for single-tf
    # matches the rarer term scores higher
    sc = {r["doc_id"]: r["score"] for r in bm25_search(corpus, "spark exchange", k=10).collect()}
    assert sc[4] > sc[2]


def test_exact_formula_single_doc(spark):
    docs = spark.createDataFrame([(1, "a b c"), (2, "a a a")], "doc_id LONG, text STRING")
    [row] = bm25_search(docs, "b", k=1).collect()
    # N=2, df=1, tf=1, dl=3, avgdl=3
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    want = idf * 1 / (1 + 1.2 * (1 - 0.75 + 0.75 * 1.0))
    assert row["doc_id"] == 1 and abs(row["score"] - want) < 1e-9


def test_prebuilt_index_reuse(spark, corpus):
    postings, stats = bm25_index(corpus)
    postings = postings.cache()
    a = bm25_score(postings, stats, "spark", k=5).collect()
    b = bm25_score(postings, stats, "join shuffle", k=5).collect()
    assert [r["doc_id"] for r in a] == [1, 2]
    assert [r["doc_id"] for r in b][0] == 4
    postings.unpersist()


def test_empty_query_and_no_hits(spark, corpus):
    assert bm25_search(corpus, "???", k=5).count() == 0
    assert bm25_search(corpus, "zzzmissing", k=5).count() == 0


def test_query_tokenizer_matches_corpus_tokenizer(spark):
    # mixed case / punctuation / underscores normalize identically
    docs = spark.createDataFrame(
        [(1, "Hello WORLD snake_case o'clock")], "doc_id LONG, text STRING"
    )
    for q in ("hello", "WORLD", "snake case", "o'clock"):
        assert bm25_search(docs, q, k=1).count() == 1, q


def test_reciprocal_rank_fusion(spark):
    """A doc ranked well in BOTH lists beats docs that top only one."""
    from syzgydb_spark.operators.bm25 import reciprocal_rank_fusion

    a = spark.createDataFrame(
        [(1, 0.1), (2, 0.2), (3, 0.3)], "doc_id LONG, dist DOUBLE"
    )
    b = spark.createDataFrame(
        [(9, 5.0), (2, 4.0), (1, 3.0)], "doc_id LONG, score DOUBLE"
    )
    out = reciprocal_rank_fusion(
        [(a, "dist", True), (b, "score", False)], rrf_k=60, top=4
    ).collect()
    ids = [r["doc_id"] for r in out]
    # doc 2: ranks (2, 2) → 2/62; doc 1: ranks (1, 3) → 1/61 + 1/63
    assert ids[0] == 1 and ids[1] == 2
    assert set(ids) == {1, 2, 3, 9}
    want_1 = 1 / 61 + 1 / 63
    assert abs(out[0]["rrf_score"] - want_1) < 1e-12
