"""Quality classifier (operators/classifier.py): planted separable
signal is learned, scoring matches an independent Python reference,
persistence round-trips, and the score plan stays zero-shuffle."""

import json
import math

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.classifier import (
    QualityClassifier,
    fit_quality_classifier,
    score_quality,
)


@pytest.fixture(scope="module")
def planted(spark):
    """Positives always contain 'good excellent'; negatives 'spam
    junk' — a linearly separable hashed-feature signal."""
    rows = []
    for i in range(60):
        rows.append((i, f"good excellent doc number {i} alpha beta"))
    for i in range(100, 160):
        rows.append((i, f"spam junk doc number {i} alpha beta"))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_fit_learns_planted_signal(planted):
    pos = planted.where("doc_id < 100")
    neg = planted.where("doc_id >= 100")
    clf = fit_quality_classifier(pos, neg, dim=64, seed=7, max_iter=50)
    scored = {r["doc_id"]: r["quality_score"]
              for r in score_quality(planted, clf).collect()}
    assert all(scored[i] > 0.5 for i in range(60))
    assert all(scored[i] < 0.5 for i in range(100, 160))


def test_score_matches_python_reference(spark):
    # fixed tiny model: score must equal the manual sigmoid(w.v + b)
    clf = QualityClassifier(
        weights=[0.5, -1.0, 2.0, 0.0], bias=0.25, dim=4, seed=42
    )
    df = spark.createDataFrame(
        [(0, "alpha beta beta"), (1, ""), (2, None)],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r["quality_score"]
           for r in score_quality(df, clf, decimals=None).collect()}

    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_pipeline_ops import _py_hashed_embedding

    v = _py_hashed_embedding("alpha beta beta", dim=4, seed=42)
    z = sum(w * x for w, x in zip(clf.weights, v)) + clf.bias
    assert abs(got[0] - 1.0 / (1.0 + math.exp(-z))) < 1e-12
    # empty text: zero vector -> sigmoid(bias)
    assert abs(got[1] - 1.0 / (1.0 + math.exp(-0.25))) < 1e-12
    # NULL text -> NULL score
    assert got[2] is None


def test_persistence_round_trip(spark):
    clf = QualityClassifier(weights=[1.0, -2.0], bias=0.1, dim=2, seed=3,
                            normalize=False)
    clf2 = QualityClassifier.from_dict(json.loads(json.dumps(clf.to_dict())))
    assert clf2 == clf
    df = spark.createDataFrame([(0, "x y z")], "doc_id LONG, text STRING")
    a = score_quality(df, clf, decimals=None).collect()[0]["quality_score"]
    b = score_quality(df, clf2, decimals=None).collect()[0]["quality_score"]
    assert a == b


def test_score_plan_zero_shuffle(spark, sf_dir):
    from syzgydb_spark.plans import scale_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clf = QualityClassifier(weights=[0.1] * 8, bias=0.0, dim=8)
    rep = scale_report(score_quality(docs, clf))
    assert rep["n_shuffles"] == 0
    assert not rep.get("row_python", False)


def test_fit_tolerates_null_text(spark):
    pos = spark.createDataFrame(
        [(0, "good excellent"), (1, None)], "doc_id LONG, text STRING"
    )
    neg = spark.createDataFrame(
        [(2, "spam junk"), (3, None)], "doc_id LONG, text STRING"
    )
    clf = fit_quality_classifier(pos, neg, dim=16, seed=1, max_iter=10)
    assert len(clf.weights) == 16  # fit survives NULL rows


def test_mismatched_weights_fail_fast(spark):
    clf = QualityClassifier(weights=[0.1, 0.2], bias=0.0, dim=4)
    df = spark.createDataFrame([(0, "x")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="2 weights for dim=4"):
        score_quality(df, clf)


def test_classifier_hash_fn_roundtrips_and_scores(spark):
    """hash_fn persists with the model (scores from one hash family
    are meaningless against the other's features) and the xxhash64
    scoring path agrees between Arrow and expression impls."""
    from syzgydb_spark.operators.classifier import QualityClassifier

    clf = QualityClassifier(
        weights=[0.5] * 8, bias=-0.1, dim=8, hash_fn="xxhash64")
    assert QualityClassifier.from_dict(clf.to_dict()).hash_fn == "xxhash64"
    # legacy dicts (no hash_fn key) stay md5
    d = clf.to_dict(); del d["hash_fn"]
    assert QualityClassifier.from_dict(d).hash_fn == "md5"

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "spark engines ship shuffles")],
        "id LONG, text STRING")
    rows = df.select(
        clf.score_expr("text", impl="arrow").alias("a"),
        clf.score_expr("text", impl="expr").alias("e"),
    ).collect()
    for r in rows:
        assert abs(r["a"] - r["e"]) < 1e-12
        assert 0.0 < r["a"] < 1.0
