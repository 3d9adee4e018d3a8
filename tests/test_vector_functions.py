"""Distance-function semantics vs a numpy oracle, incl. the reference's
pinned edge cases (zero-vector cosine → 1.0, collection.go:828-830;
exact Euclidean value, collection_test.go:12-21)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from syzgydb_spark.functions.vector import (
    cosine_distance,
    dot_product,
    euclidean_distance,
    l2_norm,
    l2_normalize,
    vector_mid,
)


@pytest.fixture(scope="module")
def pairs_df(spark):
    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=5).tolist(), rng.normal(size=5).tolist()) for i in range(50)]
    rows.append((50, [0.0] * 5, rng.normal(size=5).tolist()))  # zero vector
    rows.append((51, [0.0] * 5, [0.0] * 5))
    return spark.createDataFrame(rows, "i INT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"), rows


def test_euclidean_matches_numpy(pairs_df):
    df, rows = pairs_df
    got = {r["i"]: r["d"] for r in df.select("i", euclidean_distance("a", "b").alias("d")).collect()}
    for i, a, b in rows:
        want = float(np.linalg.norm(np.array(a) - np.array(b)))
        assert got[i] == pytest.approx(want, rel=1e-12), i


def test_euclidean_reference_value(spark):
    # reference collection_test.go:12-21: dist({1,2,3},{4,5,6}) == sqrt(27)
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
    d = df.select(euclidean_distance("a", "b").alias("d")).collect()[0]["d"]
    assert d == pytest.approx(math.sqrt(27.0), rel=1e-12)


def test_cosine_matches_numpy(pairs_df):
    df, rows = pairs_df
    got = {r["i"]: r["d"] for r in df.select("i", cosine_distance("a", "b").alias("d")).collect()}
    for i, a, b in rows:
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            want = 1.0  # reference collection.go:828-830
        else:
            cos = np.clip(np.dot(a, b) / (na * nb), -1.0, 1.0)
            want = float(np.arccos(cos) / np.pi)
        assert got[i] == pytest.approx(want, rel=1e-9), i


def test_cosine_identical_is_zero(spark):
    df = spark.createDataFrame([([0.3, 0.4], [0.3, 0.4])], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
    d = df.select(cosine_distance("a", "b").alias("d")).collect()[0]["d"]
    assert d == pytest.approx(0.0, abs=1e-9)


def test_dot_norm_normalize_mid(spark):
    df = spark.createDataFrame([([3.0, 4.0], [1.0, 2.0])], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
    row = df.select(
        dot_product("a", "b").alias("dot"),
        l2_norm("a").alias("norm"),
        l2_normalize("a").alias("unit"),
        vector_mid("a", "b").alias("mid"),
    ).collect()[0]
    assert row["dot"] == pytest.approx(11.0)
    assert row["norm"] == pytest.approx(5.0)
    assert row["unit"] == pytest.approx([0.6, 0.8])
    assert row["mid"] == pytest.approx([2.0, 3.0])
    # zero vector normalizes to itself (lshtree.go:22-36)
    z = spark.createDataFrame([([0.0, 0.0],)], "a ARRAY<DOUBLE>")
    assert z.select(l2_normalize("a").alias("u")).collect()[0]["u"] == [0.0, 0.0]


def test_distance_stays_jvm_side(spark):
    """The distance expression must not appear as a Python UDF —
    scan + filter + project should stay in whole-stage codegen."""
    df = spark.range(10).select(
        F.col("id"), F.array(F.rand(1), F.rand(2)).alias("v")
    )
    plan = df.select(
        euclidean_distance("v", F.lit([0.5, 0.5]).cast("array<double>")).alias("d")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cosine_batch_null_and_ragged_match_expression(spark):
    """cosine_distance_batch returns NULL for null/length-mismatched
    pairs like the expression form, instead of killing the worker."""
    from syzgydb_spark.functions.vector import cosine_distance, cosine_distance_batch

    rows = [
        (1, [1.0, 0.0], [0.0, 1.0]),
        (2, None, [1.0, 0.0]),
        (3, [1.0, 0.0], [1.0, 0.0, 0.0]),
        (4, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),  # different length, equal pair
    ]
    df = spark.createDataFrame(rows, "id LONG, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
    batch = {r["id"]: r["d"] for r in df.select("id", cosine_distance_batch("a", "b").alias("d")).collect()}
    assert batch[2] is None and batch[3] is None
    assert abs(batch[1] - 0.5) < 1e-9 and abs(batch[4] - 0.0) < 1e-9
