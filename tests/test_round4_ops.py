"""Planted-case tests for the round-4 corpus operators:

* ``dedup_normalized``   — punctuation/case-insensitive exact dedup
* ``tfidf_top_terms``    — per-document TF-IDF keyword extraction
* ``weighted_sample``    — deterministic A-Res weighted sampling
* ``token_frequency_spectrum`` — Zipf frequency-band rollup
* ``perplexity_bands``   — CCNet head/middle/tail per stratum
"""

import math

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.dedup import dedup_normalized
from syzgydb_spark.operators.quality import (
    perplexity_bands,
    tfidf_top_terms,
    token_frequency_spectrum,
    unigram_lm,
    weighted_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Hello,  World!", "en", "a", 14),
        (2, "hello world", "en", "a", 11),
        (3, "HELLO -- WORLD --", "en", "b", 17),
        (4, "goodbye world", "en", "b", 13),
        (5, "an unrelated document entirely", "en", "b", 30),
        (6, None, "en", "b", 0),
        (7, "", "en", "b", 0),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


# ------------------------------------------------------------ dedup_normalized


def test_dedup_normalized_collapses_case_and_punct(docs):
    kept = sorted(r["doc_id"] for r in dedup_normalized(docs).collect())
    # 1,2,3 normalize to "hello world" -> min id 1 survives;
    # NULL text (6) and empty text (7) normalize to the same "" group
    assert kept == [1, 4, 5, 6]


def test_dedup_normalized_is_superset_strict_of_exact(spark):
    from syzgydb_spark.operators.dedup import dedup_exact

    rows = [(i, f"unique doc {i}") for i in range(20)] + [
        (100, "Same text."),
        (101, "same  text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {r["doc_id"] for r in dedup_exact(df).collect()}
    norm = {r["doc_id"] for r in dedup_normalized(df).collect()}
    assert 100 in exact and 101 in exact  # byte-exact dedup keeps both
    assert 100 in norm and 101 not in norm  # normalized collapses them
    assert norm <= exact


# ------------------------------------------------------------ tfidf_top_terms


def test_tfidf_values_and_ranking(spark):
    rows = [
        (1, "apple apple apple banana"),
        (2, "banana cherry"),
        (3, "banana date date"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, 2)
    got = {(r["doc_id"], r["term_rank"]): r for r in out.collect()}
    # banana appears in all 3 docs; apple only in doc 1
    idf = lambda dfc: math.log((3 + 1) / (dfc + 1)) + 1
    r11 = got[(1, 1)]
    assert r11["term"] == "apple" and r11["tf"] == 3 and r11["df_count"] == 1
    assert r11["tfidf"] == pytest.approx(3 * idf(1), abs=1e-6)
    # doc 2: cherry (rare) outranks banana (ubiquitous) despite equal tf
    assert got[(2, 1)]["term"] == "cherry"
    assert got[(2, 2)]["term"] == "banana"
    # k bound respected
    assert all(r["term_rank"] <= 2 for r in got.values())


def test_tfidf_min_df_and_tie_break(spark):
    rows = [(1, "zz aa"), (2, "zz aa"), (3, "zz aa")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, 2).collect()
    # equal tfidf -> alphabetical term order breaks the tie
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["term_rank"], r["term"]))
    for terms in by_doc.values():
        assert sorted(terms) == [(1, "aa"), (2, "zz")]
    # min_df=2 drops hapaxes
    rows2 = [(1, "common rare1"), (2, "common rare2")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    out2 = tfidf_top_terms(df2, 5, min_df=2).collect()
    assert {r["term"] for r in out2} == {"common"}


# ------------------------------------------------------------ weighted_sample


def test_weighted_sample_deterministic_and_weighted(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, F.lit(1000.0)).otherwise(F.lit(0.001)).alias("w"),
    )
    a = sorted(r["doc_id"] for r in weighted_sample(df, 50, weight_col="w").collect())
    b = sorted(r["doc_id"] for r in weighted_sample(df, 50, weight_col="w").collect())
    assert a == b and len(a) == 50  # deterministic across runs
    # heavy rows dominate the sample overwhelmingly
    heavy = sum(1 for i in a if i < 1000)
    assert heavy >= 48
    # different seed -> different sample
    c = sorted(
        r["doc_id"] for r in weighted_sample(df, 50, weight_col="w", seed=7).collect()
    )
    assert a != c


def test_weighted_sample_excludes_nonpositive(spark):
    rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample(df, 10, weight_col="w").collect()}
    assert got == {1, 5}


# ------------------------------------------------- token_frequency_spectrum


def test_token_frequency_spectrum(spark):
    # term frequencies: a->1, b->2, c->3, d->8
    text = "a " + "b " * 2 + "c " * 3 + "d " * 8
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {r["freq_bucket"]: r for r in token_frequency_spectrum(df).collect()}
    assert out[0]["n_terms"] == 1 and out[0]["n_occurrences"] == 1  # [1,2): a
    assert out[1]["n_terms"] == 2 and out[1]["n_occurrences"] == 5  # [2,4): b,c
    assert out[3]["n_terms"] == 1 and out[3]["n_occurrences"] == 8  # [8,16): d
    assert 2 not in out


def test_token_frequency_spectrum_min_count(spark):
    df = spark.createDataFrame(
        [(1, "x x x y")], "doc_id long, text string"
    )
    out = {r["freq_bucket"]: r for r in token_frequency_spectrum(df, min_count=2).collect()}
    assert list(out) == [1] and out[1]["n_terms"] == 1


# ------------------------------------------------------------ perplexity_bands


def test_perplexity_bands_planted(spark):
    # 9 scoreable docs per lang; fluent docs repeat the reference's
    # high-mass tokens, tail docs are OOV-heavy
    ref_rows = [(100 + i, "the cat sat on the mat " * 3) for i in range(5)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    lm = unigram_lm(ref, min_count=1, alpha=0.5)
    rows = (
        [(i, "the cat sat on the mat", "en") for i in range(3)]
        + [(10 + i, "the cat zzz qqq", "en") for i in range(3)]
        + [(20 + i, "zzz qqq www uuu vvv", "en") for i in range(3)]
        + [(30, "", "en")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in perplexity_bands(df, lm, n_bands=3).collect()}
    assert all(out[i]["ppl_band"] == 1 for i in range(3))
    assert all(out[10 + i]["ppl_band"] == 2 for i in range(3))
    assert all(out[20 + i]["ppl_band"] == 3 for i in range(3))
    assert out[30]["ppl_band"] is None and out[30]["logppl"] is None
    assert len(out) == 10


def test_perplexity_bands_shared_bucket_shares_band(spark):
    # all docs identical -> one logppl bucket -> everyone band 1
    ref = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    lm = unigram_lm(ref, min_count=1, alpha=0.5)
    df = spark.createDataFrame(
        [(i, "a b c", "en") for i in range(6)], "doc_id long, text string, lang string"
    )
    out = perplexity_bands(df, lm, n_bands=3).collect()
    assert {r["ppl_band"] for r in out} == {1}
