"""Sharding (deterministic shuffle), incremental dedup, and
duplicated-span detection."""

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators import dedup as DD
from syzgydb_spark.operators.sharding import (
    shard_assignments,
    shard_positions,
    write_shards,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


# ------------------------------------------------------------- sharding


def test_shard_assignments_deterministic_and_total(docs):
    n = docs.count()
    a = shard_assignments(docs, n_shards=8, seed=7)
    b = shard_assignments(docs, n_shards=8, seed=7)
    assert a.select("doc_id", "shard").exceptAll(b.select("doc_id", "shard")).count() == 0
    # every row gets exactly one shard in [0, 8)
    stats = a.agg(
        F.count("*").alias("n"), F.min("shard").alias("lo"), F.max("shard").alias("hi")
    ).first()
    assert stats["n"] == n and stats["lo"] >= 0 and stats["hi"] < 8


def test_shard_seed_changes_assignment(docs):
    a = shard_assignments(docs, n_shards=8, seed=1).select("doc_id", "shard")
    b = shard_assignments(docs, n_shards=8, seed=2).select("doc_id", "shard")
    moved = a.join(b, "doc_id").where(a["shard"] != b["shard"]).count()
    assert moved > 0  # astronomically unlikely to be 0 if seed matters


def test_shard_balance(docs):
    """md5 keys are uniform: no shard should be pathologically hot."""
    n = docs.count()
    sizes = [
        r["c"]
        for r in shard_assignments(docs, n_shards=8, seed=42)
        .groupBy("shard")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    assert len(sizes) == 8
    assert max(sizes) < 3 * n / 8  # loose 3x-of-fair-share bound


def test_shard_positions_contiguous(docs):
    sp = shard_positions(docs, n_shards=4, seed=42)
    per = (
        sp.groupBy("shard")
        .agg(F.count("*").alias("c"), F.min("pos").alias("lo"), F.max("pos").alias("hi"))
        .collect()
    )
    for r in per:  # 0-based dense ordinals per shard
        assert r["lo"] == 0 and r["hi"] == r["c"] - 1


def test_write_shards_roundtrip(docs, spark, tmp_path):
    path = str(tmp_path / "shards")
    write_shards(docs, path, n_shards=4, seed=42)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert set(r["shard"] for r in back.select("shard").distinct().collect()) == {0, 1, 2, 3}
    # within a shard file the rows are sorted by sort_key
    one = back.where(F.col("shard") == 0).select("sort_key").toPandas()["sort_key"]
    assert list(one) == sorted(one)


# ---------------------------------------------------- incremental dedup


def test_dedup_against_removes_known_docs(spark):
    corpus = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id LONG, text STRING"
    )
    new = spark.createDataFrame(
        [(10, "seen  BEFORE "), (11, "brand new"), (12, "also seen")],
        "doc_id LONG, text STRING",
    )
    kept = DD.dedup_against(new, corpus)
    # fingerprint normalizes case/whitespace → 10 and 12 both drop
    assert [r["doc_id"] for r in kept.orderBy("doc_id").collect()] == [11]
    assert kept.columns == ["doc_id", "text"]  # helper column dropped


def test_dedup_against_real_tables(docs):
    new = docs.where(F.col("source") == "wiki")
    corpus = docs.where(F.col("source") != "wiki")
    kept = DD.dedup_against(new, corpus)
    # survivors = new minus the rows whose fingerprint exists in corpus
    hits = (
        new.select(DD.fingerprint("text").alias("fp"))
        .join(corpus.select(DD.fingerprint("text").alias("fp")), "fp", "left_semi")
        .count()
    )
    assert kept.count() == new.count() - hits


# ----------------------------------------------------- duplicate spans


def test_duplicate_spans_planted(spark):
    """Two docs share a 12-token run; a third is unrelated. The shared
    run must be reported in both docs at the right token offsets."""
    shared = " ".join(f"s{i}" for i in range(12))
    rows = [
        (1, "alpha beta " + shared + " gamma"),
        (2, shared + " delta epsilon zeta"),
        (3, "totally unrelated text with many words here indeed"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in DD.duplicate_spans(df, gram_n=5, min_span_tokens=10).collect()
    }
    assert set(spans) == {1, 2}
    assert spans[1] == (2, 13, 12)  # after the 2-token prefix
    assert spans[2] == (0, 11, 12)


def test_duplicate_spans_min_length_filters(spark):
    """A 6-token shared run seeds 2 grams (n=5) → span of 6 tokens;
    with min_span_tokens=10 nothing is emitted."""
    shared = " ".join(f"t{i}" for i in range(6))
    rows = [(1, shared + " one two three four"), (2, "x y z " + shared)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    assert DD.duplicate_spans(df, gram_n=5, min_span_tokens=10).count() == 0
    got = DD.duplicate_spans(df, gram_n=5, min_span_tokens=6).collect()
    assert {(r["doc_id"], r["span_tokens"]) for r in got} == {(1, 6), (2, 6)}


def test_duplicate_spans_within_doc_repeat_not_flagged(spark):
    """The seed predicate is ≥2 *distinct docs* — a phrase repeated
    inside one document only is repetition (repetition_stats' job),
    not cross-document duplication."""
    phrase = " ".join(f"p{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, phrase + " filler " + phrase)], "doc_id LONG, text STRING"
    )
    assert DD.duplicate_spans(df, gram_n=5, min_span_tokens=5).count() == 0


def test_duplicate_spans_disjoint_islands(spark):
    """Two separate shared runs in one doc yield two spans, not one."""
    a = " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, a + " xx yy zz ww vv " + b),
            (2, a + " unrelated tail of words"),
            (3, "some prefix words then " + b),
        ],
        "doc_id LONG, text STRING",
    )
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in DD.duplicate_spans(df, gram_n=5, min_span_tokens=10)
        .where(F.col("doc_id") == 1)
        .collect()
    )
    assert got == [(0, 9), (15, 24)]


# ------------------------------------------------ remove duplicate spans


def test_remove_spans_keeps_one_copy(spark):
    shared = " ".join(f"s{i}" for i in range(12))
    rows = [
        (1, "alpha beta " + shared + " gamma"),
        (2, shared + " delta epsilon"),
        (3, "unrelated words only here right now ok fine yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_cut_spans"])
        for r in DD.remove_duplicate_spans(df, gram_n=5, min_span_tokens=10).collect()
    }
    # min-id doc keeps the span verbatim
    assert got[1] == ("alpha beta " + shared + " gamma", 0)
    # the later copy is cut, surrounding tokens survive
    assert got[2] == ("delta epsilon", 1)
    # untouched doc round-trips (token-joined)
    assert got[3] == ("unrelated words only here right now ok fine yes", 0)


def test_remove_spans_fully_cut_doc_empty(spark):
    shared = " ".join(f"t{i}" for i in range(15))
    df = spark.createDataFrame(
        [(1, "prefix " + shared), (2, shared)], "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in DD.remove_duplicate_spans(df, gram_n=5, min_span_tokens=10).collect()
    }
    assert got[2] == ""  # whole doc was the duplicated run
    assert got[1] == "prefix " + shared


def test_remove_spans_differing_extents_both_kept(spark):
    """Doc 1 shares a 12-token run with doc 2 AND a 16-token run with
    doc 3 that contains it; maximal extents differ per doc, so content
    fingerprints differ and no cut happens for the differing pair."""
    core = " ".join(f"c{i}" for i in range(12))
    ext = core + " " + " ".join(f"x{i}" for i in range(4))
    df = spark.createDataFrame(
        [(1, ext), (2, core + " tail tokens here"), (3, "head " + ext)],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_cut_spans"])
        for r in DD.remove_duplicate_spans(df, gram_n=5, min_span_tokens=10).collect()
    }
    # doc 1 and 3 share the identical maximal run 'ext' → doc 3 cut
    assert got[1][1] == 0
    assert got[3] == ("head", 1)


# ------------------------------------------- incremental near-dup dedup


def test_minhash_dedup_against_planted(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "an entirely different document about spark query planning and shuffles"),
        ],
        "doc_id LONG, text STRING",
    )
    new = spark.createDataFrame(
        [
            # near-dup of 1 (one word appended)
            (10, "the quick brown fox jumps over the lazy dog again and again today ok"),
            # exact copy of 2
            (11, "an entirely different document about spark query planning and shuffles"),
            # novel
            (12, "completely unrelated content mentioning neither foxes nor query engines"),
        ],
        "doc_id LONG, text STRING",
    )
    kept = DD.minhash_dedup_against(
        new, corpus, threshold=0.5, shingle_n=2, hash_fn="md5"
    )
    assert [r["doc_id"] for r in kept.collect()] == [12]


def test_minhash_dedup_against_corpus_not_self_paired(spark):
    """Two near-identical docs WITHIN the new batch both survive if
    neither matches the corpus — the operator checks new-vs-corpus
    only (self-dedup composes separately)."""
    corpus = spark.createDataFrame(
        [(1, "standing corpus text about topic alpha beta gamma delta")],
        "doc_id LONG, text STRING",
    )
    t = "twin texts inside the new batch with nearly identical words here"
    new = spark.createDataFrame(
        [(10, t), (11, t + " extra")], "doc_id LONG, text STRING"
    )
    kept = DD.minhash_dedup_against(new, corpus, threshold=0.5, shingle_n=2, hash_fn="md5")
    assert kept.count() == 2


def test_hash_split_disjoint_exhaustive_deterministic(docs):
    from syzgydb_spark.operators.sharding import hash_split

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    res = hash_split(docs, w).select("doc_id", "split")
    rows = {r["doc_id"]: r["split"] for r in res.collect()}
    assert len(rows) == docs.count()  # every row exactly one split
    counts = {}
    for s in rows.values():
        counts[s] = counts.get(s, 0) + 1
    n = docs.count()
    assert 0.7 * n < counts["train"] < 0.9 * n  # ~80% ± sampling noise
    assert set(counts) <= set(w)
    # deterministic: same assignment on re-run; different under new seed
    again = {r["doc_id"]: r["split"]
             for r in hash_split(docs, w).select("doc_id", "split").collect()}
    assert again == rows
    moved = {r["doc_id"]: r["split"]
             for r in hash_split(docs, w, seed=7).select("doc_id", "split").collect()}
    assert moved != rows
    # zero shuffle: pure projection
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_validates_weights(docs):
    from syzgydb_spark.operators.sharding import hash_split

    import pytest as _pytest
    with _pytest.raises(ValueError):
        hash_split(docs, {"a": -0.1, "b": 1.1})
    with _pytest.raises(ValueError):
        hash_split(docs, {"a": 0.0})
    # single split: everything lands there
    assert hash_split(docs, {"all": 1.0}).where("split != 'all'").count() == 0
