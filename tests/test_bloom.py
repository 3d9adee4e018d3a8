"""Bloom membership: no false negatives, sized fp rate, scalable plans."""

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.bloom import (
    bloom_build,
    bloom_filter_new,
    bloom_positions,
    bloom_probe,
)
from syzgydb_spark.plans import assert_scalable, scale_report

N_BITS = 1 << 14
K = 5


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(200).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("key-"), "id").alias("key")
    )


@pytest.fixture(scope="module")
def bloom(corpus):
    return bloom_build(corpus, "key", n_bits=N_BITS, n_hashes=K).cache()


def test_positions_deterministic_and_in_range(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("xyz",)], "key string")
    rows = df.select(
        bloom_positions(F.col("key"), n_bits=N_BITS, n_hashes=K).alias("p")
    ).collect()
    assert rows[0]["p"] == rows[1]["p"]          # same key → same positions
    assert rows[0]["p"] != rows[2]["p"]
    assert all(0 <= b < N_BITS for r in rows for b in r["p"])
    assert len(rows[0]["p"]) == K


def test_no_false_negatives(spark, corpus, bloom):
    hits = bloom_probe(corpus, bloom, "key", n_bits=N_BITS, n_hashes=K)
    assert hits.count() == 200
    assert hits.where(~F.col("bloom_hit")).count() == 0


def test_false_positive_rate_near_theory(spark, bloom):
    """200 keys in 2^14 bits, k=5 → theoretical fp ≈ (1-e^(-5·200/16384))^5
    ≈ 7e-7; 2000 fresh keys must produce (almost) no hits — allow a
    couple in case of unlucky md5 collisions."""
    fresh = spark.range(10_000, 12_000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("key-"), "id").alias("key")
    )
    fp = (
        bloom_probe(fresh, bloom, "key", n_bits=N_BITS, n_hashes=K)
        .where(F.col("bloom_hit"))
        .count()
    )
    assert fp <= 2, f"false-positive count {fp} far above theory"


def test_filter_new_drops_members_keeps_fresh(spark, corpus, bloom):
    mixed = corpus.unionByName(
        spark.range(10_000, 10_100).select(
            F.col("id").alias("doc_id"), F.concat(F.lit("key-"), "id").alias("key")
        )
    )
    kept = bloom_filter_new(mixed, bloom, "key", n_bits=N_BITS, n_hashes=K)
    ids = {r["doc_id"] for r in kept.collect()}
    assert all(i >= 10_000 for i in ids)          # every member dropped (no FN)
    assert len(ids) >= 98                          # fresh rows survive (≤ fp lost)


def test_bitmap_is_sparse_words(bloom):
    rows = bloom.collect()
    assert len(rows) <= N_BITS // 64
    assert all(r["word"] != 0 for r in rows)


def test_plans_scale(spark, corpus, bloom):
    fresh = spark.range(5_000, 5_100).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("key-"), "id").alias("key")
    )
    # different n_bits so the plan doesn't resolve to the cached fixture
    build_rep = scale_report(bloom_build(corpus, "key", n_bits=N_BITS * 2, n_hashes=K))
    assert build_rep["n_shuffles"] == 1            # single bit_or aggregation
    probe = bloom_probe(fresh, bloom, "key", n_bits=N_BITS, n_hashes=K)
    assert_scalable(probe)
    assert scale_report(probe)["n_shuffles"] <= 1  # bitmap broadcast + one re-agg
    assert_scalable(bloom_filter_new(fresh, bloom, "key", n_bits=N_BITS, n_hashes=K))
