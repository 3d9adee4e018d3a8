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


def test_bloom_store_lifecycle(spark, tmp_path, corpus):
    """build → probe → update → probe: parameters enforced by the
    sidecar (a probe cannot drift from the build), updates are pure
    deltas (prior batch dirs never rewritten)."""
    import os

    from syzgydb_spark.operators.bloom import (
        build_bloom_store,
        probe_bloom_store,
        read_bloom_store,
        update_bloom_store,
    )

    path = str(tmp_path / "bl")
    build_bloom_store(corpus, "key", path, n_bits=N_BITS, n_hashes=K)
    with pytest.raises(FileExistsError):
        build_bloom_store(corpus, "key", path, n_bits=N_BITS, n_hashes=K)

    batch2 = spark.range(300, 320).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("key-"), "id").alias("key")
    )
    assert probe_bloom_store(batch2, path, "key").where("bloom_hit").count() == 0
    update_bloom_store(batch2, "key", path)
    assert probe_bloom_store(batch2, path, "key").where("NOT bloom_hit").count() == 0
    # members of the ORIGINAL build still hit after the update
    assert probe_bloom_store(corpus, path, "key").where("NOT bloom_hit").count() == 0
    # delta model on disk: two batch dirs, batch=0 untouched by update;
    # updates get uuid-suffixed names so concurrent updaters never collide
    dirs = sorted(e for e in os.listdir(path) if e.startswith("batch="))
    assert len(dirs) == 2 and dirs[0] == "batch=0"
    assert dirs[1].startswith("batch=1-") and len(dirs[1]) == len("batch=1-") + 12
    _, meta = read_bloom_store(spark, path)
    assert meta == {"n_bits": N_BITS, "n_hashes": K}

    # two further updates of the SAME batch land in distinct delta dirs
    # (the old max(n)+1 scheme let concurrent updaters overwrite each
    # other); the folded bitmap is unchanged by the replay (OR idempotent)
    update_bloom_store(batch2, "key", path)
    update_bloom_store(batch2, "key", path)
    dirs = sorted(e for e in os.listdir(path) if e.startswith("batch="))
    assert len(dirs) == 4 and len(set(dirs)) == 4
    assert probe_bloom_store(corpus, path, "key").where("NOT bloom_hit").count() == 0


def test_bloom_null_keys_are_members(spark):
    """NULL keys hash via a sentinel: a null-keyed row inserted at
    build time HITS at probe time instead of registering definitely-new
    forever (advice r5: direct callers were unprotected)."""
    from syzgydb_spark.operators.bloom import bloom_build, bloom_probe

    corpus = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "doc_id long, key string"
    )
    bloom = bloom_build(corpus, "key", n_bits=N_BITS, n_hashes=K)
    probe = spark.createDataFrame(
        [(10, None), (11, "zz-not-present")], "doc_id long, key string"
    )
    got = {
        r["doc_id"]: r["bloom_hit"]
        for r in bloom_probe(probe, bloom, "key", n_bits=N_BITS, n_hashes=K).collect()
    }
    assert got[10] is True  # null key seen at build → hit
    assert got[11] is False  # unseen key → definitely new


def test_bloom_store_missing_sidecar_errors(spark, tmp_path, corpus):
    from syzgydb_spark.operators.bloom import probe_bloom_store

    with pytest.raises(FileNotFoundError, match="bloom store"):
        probe_bloom_store(corpus, str(tmp_path / "nope"), "key")


def test_streaming_bloom_dedup_across_batches(spark, tmp_path):
    """Cross-batch Bloom gating: a doc repeated in a later micro-batch
    is dropped (its bits are prior state); fresh docs pass; batch 1
    passes everything (no prior state)."""
    import glob
    import os

    from syzgydb_spark.streaming.ingest import streaming_bloom_dedup

    def mk_batch(rows, src_dir, name):
        tmp = os.path.join(src_dir, "_tmp")
        spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, os.path.join(src_dir, name))

    d = tmp_path / "bloom_src"
    d.mkdir()
    mk_batch([(1, "alpha document body"), (2, "beta document body")], str(d), "b1.parquet")
    mk_batch([(3, "alpha document body"), (4, "gamma fresh content")], str(d), "b2.parquet")
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    out_dir = str(tmp_path / "bloom_out")
    state_dir = str(tmp_path / "bloom_state")
    q = streaming_bloom_dedup(
        stream, out_dir=out_dir, state_dir=state_dir,
        n_bits=N_BITS, n_hashes=K,
        checkpoint=str(tmp_path / "ckpt_bloom"),
    )
    q.awaitTermination(180)
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir + "/batch=*").collect()
    )
    # 2 and 4 are unique texts → always pass; 1 and 3 share normalized
    # text → whichever batch arrived second loses, so exactly one of
    # them passes regardless of file pickup order
    assert len(got) == 3 and 2 in got and 4 in got
    assert (1 in got) != (3 in got)


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
