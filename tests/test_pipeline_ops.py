"""Training-data pipeline operators: text analysis, dedup (exact /
minhash / simhash / jaccard / embedding), embedding stage, JSON I/O,
multimodal plumbing — against the driver testdata plus planted cases.
"""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from syzgydb_spark.functions import text as TX
from syzgydb_spark.operators import dedup as DD
from syzgydb_spark.operators import multimodal as MM
from syzgydb_spark.embedding import embed_text, stub_model
from syzgydb_spark.collection import Collection, CollectionOptions
from syzgydb_spark.sources import json_io


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


# ---------------------------------------------------------------- text

def test_token_count(spark):
    df = spark.createDataFrame(
        [("hello world foo",), ("",), ("  a  b ",)], "text STRING"
    )
    got = [r[0] for r in df.select(TX.token_count("text")).collect()]
    assert got == [3, 0, 2]


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",)], "text STRING")
    assert df.select(TX.word_ngrams("text", 2).alias("g")).collect()[0]["g"] == [
        "a b", "b c", "c d",
    ]
    assert df.select(TX.word_ngrams("text", 3).alias("g")).collect()[0]["g"] == [
        "a b c", "b c d",
    ]
    # fewer tokens than n → empty
    short = spark.createDataFrame([("a",)], "text STRING")
    assert short.select(TX.word_ngrams("text", 3).alias("g")).collect()[0]["g"] == []


def test_language_id_planted(spark):
    """The fixture's lang labels are random (every text is an
    English-ish word salad), so accuracy is asserted on planted
    multilingual snippets instead."""
    rows = [
        ("en", "the cat and the dog sat on the mat and it was a good day for all of them"),
        ("de", "der hund und die katze sind nicht mit der maus auf ein boot gegangen"),
        ("fr", "le chat et le chien sont dans la maison pour une bonne journée des amis"),
        ("es", "el perro y el gato están en la casa con una buena comida para todos"),
        ("zh", "今天天气很好我们一起去公园散步吧然后吃饭"),
    ]
    df = spark.createDataFrame(rows, "lang STRING, text STRING")
    got = {r["lang"]: r["pred"] for r in df.select("lang", TX.language_id("text").alias("pred")).collect()}
    assert got == {lang: lang for lang, _ in rows}, got


def test_language_id_valid_codes(docs):
    codes = {r["pred"] for r in docs.select(TX.language_id("text").alias("pred")).distinct().collect()}
    assert codes <= {"en", "de", "fr", "es", "zh"}


def test_quality_score_range(docs):
    row = docs.select(
        F.min(TX.quality_score("text")).alias("lo"),
        F.max(TX.quality_score("text")).alias("hi"),
    ).collect()[0]
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "different")],
        "id LONG, text STRING",
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", TX.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2] != fps[3]


# --------------------------------------------------------------- dedup

@pytest.fixture(scope="module")
def planted(spark):
    """Corpus with planted exact and near duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and dreams of chasing birds in the garden"
    )
    near = base.replace("warm windowsill", "cold doorstep")  # small edit
    rows = [
        (1, base), (2, base),                       # exact dup pair
        (3, near),                                  # near dup of 1/2
        (4, "completely unrelated text about spark query engines and shuffles"),
        (5, "another document that shares nothing with the rest of them"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_exact_dedup(planted):
    groups = DD.exact_duplicates(planted).collect()
    by_id = {r["doc_id"]: r for r in groups}
    assert by_id[1]["group_min_id"] == 1 and by_id[2]["group_min_id"] == 1
    assert by_id[2]["group_size"] == 2
    assert by_id[3]["group_min_id"] == 3
    kept = DD.dedup_exact(planted)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4, 5]


def test_minhash_finds_planted_pair(planted):
    pairs = DD.minhash_near_duplicates(
        planted, num_hashes=64, bands=16, shingle_n=2, threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got          # exact dup: jaccard 1.0
    assert (1, 3) in got or (2, 3) in got  # near dup detected
    for a, b in got:
        assert {a, b} <= {1, 2, 3}  # nothing unrelated


def test_minhash_agrees_with_exact_jaccard(docs):
    """MinHash candidates should recover ~all high-jaccard pairs."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in DD.ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.8).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_near_duplicates(
            docs, num_hashes=64, bands=16, shingle_n=2, threshold=0.8
        ).collect()
    }
    assert exact, "fixture should contain high-similarity pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(approx))


def test_simhash_near_dups(planted):
    pairs = DD.simhash_near_duplicates(planted, max_hamming=10).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((1, 2)) == 0        # identical text → identical sketch
    assert (1, 3) in got               # near dup within 10 bits


def test_embedding_near_dups(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16))
    rows = [(i, base[i].tolist()) for i in range(20)]
    # plant: 100 = tiny perturbation of 0; 101 = scaled copy of 1 (same angle)
    rows.append((100, (base[0] + 0.001 * rng.standard_normal(16)).tolist()))
    rows.append((101, (2.0 * base[1]).tolist()))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    pairs = DD.embedding_near_duplicates(df, max_distance=0.05, dim=16).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100) in got
    assert (1, 101) in got


def test_minhash_impls_identical(planted):
    """The Arrow kernel (md5 fast path and sig-only path) must produce
    exactly the rows of the pure-Catalyst expression fold — integer
    math is exact in both worlds."""
    kw = dict(num_hashes=64, bands=16, shingle_n=2, threshold=0.3)
    for hash_fn in ("md5", "xxhash64"):
        expr = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in DD.minhash_near_duplicates(
                planted, hash_fn=hash_fn, impl="expr", **kw
            ).collect()
        }
        arrow = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in DD.minhash_near_duplicates(
                planted, hash_fn=hash_fn, impl="arrow", **kw
            ).collect()
        }
        assert expr == arrow and expr, (hash_fn, expr, arrow)


def test_skipped_bucket_observation(spark):
    """max_bucket skips are surfaced, never silent: a degenerate corpus
    (every doc identical) overflows one bucket and the Observation
    reports it."""
    from pyspark.sql import Observation

    rows = [(i, "same text repeated again and again for everyone") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    obs = Observation("skips")
    out = DD.minhash_near_duplicates(
        df, shingle_n=2, threshold=0.5, max_bucket=10, observation=obs
    )
    assert out.count() == 0  # every bucket oversized → all skipped
    m = obs.get
    assert m["skipped_buckets"] > 0
    assert m["largest_skipped_bucket"] == 30
    # and with the cap lifted the pairs come back, observed as zero skips
    obs2 = Observation("noskips")
    out2 = DD.minhash_near_duplicates(
        df, shingle_n=2, threshold=0.5, max_bucket=1000, observation=obs2
    )
    assert out2.count() == 30 * 29 // 2
    assert obs2.get["skipped_buckets"] == 0


def test_ngram_jaccard_max_df_observation(spark):
    from pyspark.sql import Observation

    rows = [(i, f"common shingle here unique{i} word{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    obs = Observation("cuts")
    out = DD.ngram_jaccard_pairs(
        df, shingle_n=2, threshold=0.01, max_df=5, observation=obs
    )
    n_pairs = out.count()
    m = obs.get
    assert m["dropped_shingles"] > 0      # 'common shingle'/'shingle here' in all 20 docs
    assert m["max_shingle_df"] == 20
    assert n_pairs == 0                   # all shared shingles were hot → no pairs survive


def test_duplicate_groups_synthetic(spark):
    """Chain 1-2-3 collapses to one group; disjoint pair stays apart;
    convergence needs diameter rounds (chain is the worst case)."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "id_a LONG, id_b LONG"
    )
    got = {r["doc_id"]: r["group_id"] for r in DD.duplicate_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_duplicate_groups_planted_transitive(spark):
    """A≈B and B≈C but A and C differ in two spots: transitivity must
    still put all three in one group."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and dreams of chasing birds in the garden "
        "on a bright summer morning full of gentle wind and soft light"
    )
    b = base.replace("warm windowsill", "cold doorstep")
    c = b.replace("bright summer", "gray winter")
    rows = [(1, base), (2, b), (3, c), (9, "entirely different content about engines")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    pairs = DD.minhash_near_duplicates(df, shingle_n=2, threshold=0.6)
    direct = {(r["id_a"], r["id_b"]) for r in pairs.select("id_a", "id_b").collect()}
    assert (1, 2) in direct and (2, 3) in direct
    groups = {r["doc_id"]: r["group_id"] for r in DD.duplicate_groups(pairs).collect()}
    assert groups[1] == groups[2] == groups[3] == 1
    assert 9 not in groups  # no edges → not emitted


def test_blocked_cosine_pairs(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((10, 8))
    rows = [(i, base[i].tolist(), i % 2) for i in range(10)]
    rows.append((100, (base[0] * 3.0).tolist(), 0))   # same angle as 0, block 0
    rows.append((101, (base[1] * 2.0).tolist(), 1))   # same angle as 1, block 1
    rows.append((102, [0.0] * 8, 0))                  # zero vector → distance 1.0
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    pairs = DD.blocked_cosine_pairs(
        df, "embedding", "vec_id", "label", max_distance=0.01
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in pairs}
    # arccos amplifies float error near cos=1: |d| ~ sqrt(2ε)/π ≈ 5e-9
    assert got.get((0, 100)) == pytest.approx(0.0, abs=1e-6)
    assert got.get((1, 101)) == pytest.approx(0.0, abs=1e-6)
    assert all({a, b} != {0, 1} for a, b in got)      # cross-block never compared
    assert not any(102 in p for p in got)             # zero vector at distance 1.0
    # semantics match the expression form on the same pairs
    from syzgydb_spark.functions.vector import cosine_distance

    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    expr = {
        (r["id_a"], r["id_b"]): r["d"]
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("d", cosine_distance("va", "vb"))
        .collect()
    }
    for p, d in got.items():
        assert d == pytest.approx(expr[p], abs=1e-6)


# ----------------------------------------------------------- embedding

def test_embed_text_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "world"), (3, "hello")], "doc_id LONG, text STRING"
    )
    out = embed_text(spark, df, dim=8).collect()
    vecs = {r["doc_id"]: r["embedding"] for r in out}
    assert len(vecs[1]) == 8
    assert vecs[1] == vecs[3]              # same text → same vector
    assert vecs[1] != vecs[2]
    assert abs(float(np.linalg.norm(vecs[1])) - 1.0) < 1e-9  # unit norm
    # matches the driver-side stub exactly
    assert vecs[1] == pytest.approx(stub_model(["hello"], 8)[0].tolist())


def test_embed_text_custom_model(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id LONG, text STRING")

    def model(texts, dim):
        return np.full((len(texts), dim), 0.5)

    out = embed_text(spark, df, dim=4, model_fn=model).collect()
    assert out[0]["embedding"] == [0.5] * 4


# ------------------------------------------------------------- json io

def test_json_roundtrip_reference_format(spark, tmp_path):
    opts = CollectionOptions(name="rt", dimension_count=3, distance_method="cosine")
    c = Collection.create(spark, str(tmp_path / "src"), opts)
    c.add_documents([
        (1, [0.1, 0.2, 0.3], '{"a": 1}'),
        (2, [0.4, 0.5, 0.6], '{"b": [1, 2]}'),
    ])
    dump = str(tmp_path / "dump.json")
    json_io.export_json(c, dump)
    doc = json.load(open(dump))
    assert doc["collection"]["name"] == "rt"
    assert len(doc["records"]) == 2

    c2 = json_io.import_json(spark, dump, str(tmp_path / "dst"))
    assert c2.count() == 2
    r = c2.get(2)
    assert r["vector"] == pytest.approx([0.4, 0.5, 0.6])
    assert json.loads(r["metadata"]) == {"b": [1, 2]}


def test_jsonl_roundtrip(spark, tmp_path):
    opts = CollectionOptions(name="rt2", dimension_count=2)
    c = Collection.create(spark, str(tmp_path / "src2"), opts)
    c.add_documents([(i, [float(i), 0.0], json.dumps({"i": i})) for i in range(10)])
    json_io.export_jsonl(c, str(tmp_path / "dump2"))
    c2 = json_io.import_jsonl(spark, str(tmp_path / "dump2"), str(tmp_path / "dst2"))
    assert c2.count() == 10
    assert json.loads(c2.get(7)["metadata"]) == {"i": 7}


# ----------------------------------------------------------- multimodal

def test_multimodal_features(spark):
    rows = [(i, bytes([i]) * 100) for i in range(5)]
    df = spark.createDataFrame(rows, "id LONG, payload BINARY").select(
        "id",
        MM.pack_media(F.col("payload"), F.lit("image/png"), width=F.lit(10), height=F.lit(10)).alias("media"),
    )
    out = MM.extract_features(df, dim=8).collect()
    assert len(out) == 5
    vecs = {r["id"]: r["features"] for r in out}
    assert all(len(v) == 8 for v in vecs.values())
    # deterministic: same payload → same features
    again = {r["id"]: r["features"] for r in MM.extract_features(df, dim=8).collect()}
    assert vecs == again


def test_multimodal_strict_raises(spark):
    df = spark.createDataFrame([(1, b"x")], "id LONG, payload BINARY").select(
        "id", MM.pack_media(F.col("payload"), F.lit("video/mp4")).alias("media")
    )
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        MM.extract_features(df, dim=4, decode_fn=MM.decode_strict).collect()


def test_frame_sampling(spark):
    df = spark.createDataFrame([(1, b"vid")], "id LONG, payload BINARY").select(
        "id",
        MM.pack_media(
            F.col("payload"), F.lit("video/mp4"), duration_ms=F.lit(3500).cast("bigint")
        ).alias("media"),
    )
    frames = MM.sample_frames(df, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]
    assert len({r["frame_seed"] for r in frames}) == 4


def test_winnow_fingerprints_guarantee(spark):
    """The winnowing guarantee: documents sharing a substring of at
    least k + window - 1 = 8 tokens share at least one selected
    fingerprint; unrelated docs (almost surely) share none; docs
    shorter than k+window-1 tokens yield no windows."""
    from syzgydb_spark.operators.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"seven eight {shared} nine ten eleven twelve"),
            (3, "totally unrelated words about storage engines and parquet"),
            (4, "short doc"),  # < 8 tokens → no fingerprints
        ],
        "doc_id LONG, text STRING",
    )
    fp = winnow_fingerprints(docs, k=5, window=4)
    rows = fp.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc.get(3, set()))
    assert 4 not in by_doc
    # density: selected << total windows, and positions are in range
    n1_tokens = len(docs.where("doc_id = 1").first()["text"].split())
    assert all(0 <= r["pos"] <= n1_tokens for r in rows if r["doc_id"] == 1)

    # overlap detection is one equi-join on fp
    a = fp.where("doc_id = 1").select("fp")
    b = fp.where("doc_id = 2").select("fp")
    assert a.join(b, "fp").count() > 0


def test_winnow_arrow_expr_bit_parity(spark):
    """The Arrow kernel (default) and the Catalyst HOF path select
    bit-identical (id, pos, fp) sets — including tie-heavy windows
    (repeated tokens → identical gram hashes inside one window, which
    exercises the rightmost-tie rule in both implementations), docs
    shorter than k+window-1 tokens (no windows), and docs exactly at
    the threshold (one window)."""
    from syzgydb_spark.operators.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, "x " * 20),                    # all grams identical: every
                                               # window is a full tie
            (3, "a b a b a b a b a b a b"),    # period-2 ties
            (4, "short doc"),                  # < k+window-1 → no rows
            (5, "t1 t2 t3 t4 t5 t6 t7 t8"),    # exactly one window
            (6, None),
        ],
        "doc_id LONG, text STRING",
    )
    key = lambda rows: sorted((r["doc_id"], r["pos"], r["fp"]) for r in rows)
    arrow = key(winnow_fingerprints(docs, impl="arrow").collect())
    expr = key(winnow_fingerprints(docs, impl="expr").collect())
    assert arrow == expr
    assert arrow, "parity test must not pass vacuously"
    assert not any(d == 4 or d == 6 for d, _, _ in arrow)


def test_decontaminate_spans_surgery(spark):
    """Span-level decontamination cuts exactly the eval-overlapping
    run and keeps the rest of the document; clean docs untouched;
    a fully-contaminated doc empties without error."""
    from syzgydb_spark.operators.contamination import decontaminate_spans

    bench = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    train = spark.createDataFrame(
        [
            (1, f"keep one two three {bench} keep four five six"),
            (2, "totally clean document with its own unique words here"),
            (3, bench),  # nothing but the benchmark line
        ],
        "doc_id LONG, text STRING",
    )
    eval_set = spark.createDataFrame(
        [(100, f"prefix words {bench} suffix words")], "doc_id LONG, text STRING"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate_spans(train, eval_set, n=8).collect()
    }
    assert out[1]["n_cut_spans"] == 1
    assert out[1]["clean_text"] == "keep one two three keep four five six"
    assert out[2]["n_cut_spans"] == 0
    assert "unique" in out[2]["clean_text"]
    assert out[3]["n_cut_spans"] == 1 and out[3]["clean_text"] == ""


def test_ngram_jaccard_hashed_matches_strings(spark, sf_dir):
    """The hash_shingles scale path returns the same pairs/similarity
    as the string-keyed exact form (64-bit collisions ~0 here)."""
    from syzgydb_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    b = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(docs, threshold=0.3, hash_shingles=True).collect()
    }
    assert a == b


def test_line_dedup_planted(spark):
    """Corpus-wide line dedup: a boilerplate line shared by 3 docs is
    removed everywhere; unique long lines survive; short duplicated
    lines are exempt; order and counts are exact."""
    boiler = "subscribe to our newsletter for updates"
    rows = [
        (1, f"unique first line of doc one\n{boiler}\nclosing thoughts of doc one"),
        (2, f"{boiler}\nsecond doc says something new"),
        (3, f"third doc opening line here\n{boiler}"),
        (4, "ok\nok\nfully unique document four line"),  # 'ok' short → exempt
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r
        for r in DD.line_dedup(df, min_count=2, min_line_chars=15).collect()
    }
    assert out[1]["clean_text"] == (
        "unique first line of doc one\nclosing thoughts of doc one"
    )
    assert out[1]["n_lines"] == 3 and out[1]["n_removed_lines"] == 1
    assert out[2]["clean_text"] == "second doc says something new"
    assert out[3]["clean_text"] == "third doc opening line here"
    assert out[4]["clean_text"] == "ok\nok\nfully unique document four line"
    assert out[4]["n_removed_lines"] == 0


def test_line_dedup_trim_matching_and_empty_doc(spark):
    """Matching is on the TRIMMED line (indented copies still count as
    duplicates) but the original spacing survives in kept lines; a doc
    whose every line is removed yields ''. md5 and xxhash64 paths
    agree."""
    dup = "this exact sentence appears everywhere"
    rows = [
        (1, f"  {dup}  \nkeep me i am a unique line"),
        (2, dup),
        (3, f"\t{dup}"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    for hash_fn in ("md5", "xxhash64"):
        out = {
            r["doc_id"]: r
            for r in DD.line_dedup(
                df, min_count=2, min_line_chars=15, hash_fn=hash_fn
            ).collect()
        }
        assert out[1]["clean_text"] == "keep me i am a unique line"
        assert out[2]["clean_text"] == ""
        assert out[2]["n_removed_lines"] == 1
        assert out[3]["clean_text"] == "\t" + dup, (
            "tab is not trimmed by SQL trim(): the tab copy is distinct"
        )


def test_line_dedup_null_text_survives(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a real line that is long enough here")],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in DD.line_dedup(df).collect()}
    assert set(out) == {1, 2}, "null-text doc must not vanish"
    assert out[1]["clean_text"] == "" and out[1]["n_removed_lines"] == 0


def test_line_dedup_paragraph_mode(spark):
    """sep='\\n\\n' dedups at paragraph granularity: a repeated
    paragraph (which itself contains single newlines) is removed
    whole; line-mode would have matched its lines separately."""
    para = "repeated paragraph first line\nand its second line"
    rows = [
        (1, f"{para}\n\nunique closing paragraph of doc one"),
        (2, f"opening of doc two stands alone\n\n{para}"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r
        for r in DD.line_dedup(df, min_count=2, min_line_chars=15, sep="\n\n").collect()
    }
    assert out[1]["clean_text"] == "unique closing paragraph of doc one"
    assert out[2]["clean_text"] == "opening of doc two stands alone"
    assert out[1]["n_lines"] == 2 and out[1]["n_removed_lines"] == 1


def test_embed_text_batches_once_despite_small_cache(spark):
    """One model call per Arrow batch even when unique texts exceed the
    LRU size (regression: evicted in-batch results fell back to one
    model call PER TEXT). The model encodes its call's batch size into
    every returned vector, so a per-text fallback call is visible as a
    vector starting with 1.0."""
    import numpy as np

    def size_stamping_model(texts, dim):
        return np.full((len(texts), dim), float(len(texts)))

    df = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(300)], "id LONG, text STRING"
    ).coalesce(1)
    out = embed_text(spark, df, text_col="text", dim=4,
                     model_fn=size_stamping_model, cache_size=10)
    sizes = {r["embedding"][0] for r in out.collect()}
    assert sizes == {300.0}, f"per-text fallback calls detected: {sizes}"


def test_jsonl_roundtrip_scalar_and_null_metadata(spark, tmp_path):
    """Export/import round-trip for SCALAR JSON metadata ('"abc"', '5')
    and all-null metadata — schema inference used to type these as
    primitives and to_json raised on import."""
    c = Collection.create(
        spark, str(tmp_path / "scalar_src"),
        CollectionOptions(name="s", dimension_count=2, n_buckets=2),
    )
    c.add_documents([
        (1, [1.0, 0.0], '"abc"'),
        (2, [0.0, 1.0], "5"),
        (3, [1.0, 1.0], None),
    ])
    json_io.export_jsonl(c, str(tmp_path / "exp"))
    c2 = json_io.import_jsonl(spark, str(tmp_path / "exp"), str(tmp_path / "scalar_dst"))
    got = {r["id"]: r["metadata"] for r in c2.df().collect()}
    assert json.loads(got[1]) == "abc"
    assert json.loads(got[2]) == 5
    assert got[3] is None


# ---- hashed (feature-hashing) document embeddings ----


def _py_hashed_embedding(text, dim=8, seed=42, normalize=True):
    """Independent Python reference of functions.text.hashed_embedding."""
    import hashlib
    import math
    import re

    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = [t for t in re.split(r"[^\w']+", text.lower()) if t != ""]
    v = [0.0] * dim
    for t in toks:
        b = md5_long(f"hb{seed}:{t}") % dim
        s = 1 if md5_long(f"hs{seed}:{t}") % 2 == 0 else -1
        v[b] += s
    nrm = math.sqrt(sum(x * x for x in v))
    if normalize and nrm > 0:
        v = [x / nrm for x in v]
    return v


def test_hashed_embedding_matches_python_reference(spark):
    from syzgydb_spark.functions.text import hashed_embedding

    texts = ["the quick brown fox", "spark spark spark", "a b c d e f g"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id LONG, text STRING"
    )
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id", hashed_embedding("text", dim=8).alias("v")
        ).collect()
    }
    for i, t in enumerate(texts):
        exp = _py_hashed_embedding(t, dim=8)
        assert all(abs(a - b) < 1e-12 for a, b in zip(got[i], exp)), (t, got[i], exp)


def test_hashed_embedding_duplicates_and_norm(spark):
    from syzgydb_spark.functions.text import hashed_embedding

    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "delta epsilon")],
        "id LONG, text STRING",
    )
    rows = {r["id"]: r["v"] for r in df.select(
        "id", hashed_embedding("text", dim=16).alias("v")).collect()}
    assert rows[0] == rows[1]          # identical docs → identical vectors
    assert rows[0] != rows[2]
    import math
    assert abs(math.sqrt(sum(x * x for x in rows[0])) - 1.0) < 1e-9


def test_hashed_embedding_batch_bit_parity(spark):
    """The Arrow kernel must equal the Catalyst expression form
    BIT-FOR-BIT on every shape: normal text, duplicate tokens, empty,
    NULL, unicode, unnormalized — it is the default scoring path and
    the oracle replays the expression semantics."""
    from syzgydb_spark.functions.text import (
        hashed_embedding,
        hashed_embedding_batch,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "spark spark spark spark"),
        (2, ""),
        (3, None),
        (4, "héllo wörld ünïcode"),
        (5, "punctuation!!! splits---tokens, right?"),
        (6, "a"),
    ]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    for dim, norm in [(8, True), (256, True), (16, False)]:
        got = df.select(
            "id",
            hashed_embedding("text", dim, seed=7, normalize=norm).alias("e"),
            hashed_embedding_batch("text", dim, seed=7, normalize=norm).alias("a"),
        ).collect()
        for r in got:
            assert r["e"] == r["a"], (dim, norm, r["id"], r["e"], r["a"])
    # and the Arrow kernel independently matches the pure-Python md5
    # reference (not just the expression form it twins)
    got = {
        r["id"]: r["a"]
        for r in df.select(
            "id", hashed_embedding_batch("text", 8, seed=7).alias("a")
        ).collect()
    }
    for i, t in rows:
        if got[i] is None:
            assert t is None, i        # only NULL text maps to NULL
            continue
        exp = _py_hashed_embedding(t, dim=8, seed=7)
        assert all(abs(x - y) < 1e-12 for x, y in zip(got[i], exp)), (i, t)


def test_hashed_embedding_xxhash64_bit_parity(spark):
    """The production hash option (r9 verdict #3): expression and
    Arrow forms must agree BIT-FOR-BIT under hash_fn='xxhash64' too —
    the batch form hashes JVM-side with the same codegen expressions
    and only scatter-adds in the kernel."""
    from syzgydb_spark.functions.text import (
        hashed_embedding,
        hashed_embedding_batch,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "spark spark spark spark"),
        (2, ""),
        (3, None),
        (4, "héllo wörld ünïcode"),
        (5, "a"),
    ]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    for dim, norm in [(8, True), (256, True), (16, False)]:
        got = df.select(
            "id",
            hashed_embedding(
                "text", dim, seed=7, normalize=norm, hash_fn="xxhash64"
            ).alias("e"),
            hashed_embedding_batch(
                "text", dim, seed=7, normalize=norm, hash_fn="xxhash64"
            ).alias("a"),
        ).collect()
        for r in got:
            assert r["e"] == r["a"], (dim, norm, r["id"], r["e"], r["a"])
    # and the two hash families are genuinely different functions
    md5_v, xx_v = df.where("id = 0").select(
        hashed_embedding("text", 256, seed=7).alias("m"),
        hashed_embedding("text", 256, seed=7, hash_fn="xxhash64").alias("x"),
    ).first()
    assert md5_v != xx_v
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hash_fn"):
        hashed_embedding("text", 8, hash_fn="sha1")
    with _pytest.raises(ValueError, match="hash_fn"):
        hashed_embedding_batch("text", 8, hash_fn="sha1")


def test_hashed_embedding_xxhash64_statistically_equivalent(spark, sf_dir):
    """xxhash64 must be a drop-in for md5 STATISTICALLY (r9 verdict
    #3): (a) bucket loads over the corpus vocabulary are uniform for
    both (chi-square within 2x its degrees of freedom); (b) pairwise
    document cosines under the two hash families correlate strongly —
    downstream neighbor structure (semdedup, ANN recall) is preserved.
    Deterministic: fixed corpus, seeded hashes."""
    import math

    from pyspark.sql import functions as F

    from syzgydb_spark.functions.text import (
        hashed_embedding_batch,
        md5_long,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dim = 64
    # the synthetic corpus has a ~31-token vocabulary — too little mass
    # for a chi-square; uniformity is a property of the HASH, so drive
    # it with 8192 distinct generated tokens instead
    n = 8192
    vocab = spark.range(n).select(
        F.concat(F.lit("tok"), F.col("id")).alias("tok")
    ).select(
        F.pmod(md5_long(F.concat(F.lit("hb42:"), F.col("tok"))),
               F.lit(dim)).alias("mb"),
        F.pmod(F.xxhash64(F.concat(F.lit("hb42:"), F.col("tok"))),
               F.lit(dim)).alias("xb"),
    )
    exp = n / dim
    for col in ("mb", "xb"):
        loads = {r[0]: r[1] for r in vocab.groupBy(col).count().collect()}
        chi2 = sum(
            (loads.get(b, 0) - exp) ** 2 / exp for b in range(dim)
        )
        # chi-square df=63: mean 63, std ~11 — 2x df is a wide, stable
        # bound that still fails on any systematic bucket bias
        assert chi2 < 2 * dim, (col, chi2)

    # (b) neighbor-structure preservation: cosine(md5) vs cosine(xx)
    # over all pairs of 40 documents
    sample = docs.orderBy("doc_id").limit(40).select(
        hashed_embedding_batch("text", 256).alias("m"),
        hashed_embedding_batch("text", 256, hash_fn="xxhash64").alias("x"),
    ).collect()
    import numpy as np

    M = np.array([r["m"] for r in sample])
    X = np.array([r["x"] for r in sample])
    iu = np.triu_indices(len(sample), k=1)
    cm = (M @ M.T)[iu]
    cx = (X @ X.T)[iu]
    r = float(np.corrcoef(cm, cx)[0, 1])
    assert r > 0.85, r


def test_hashed_embedding_empty_null_and_dim(spark):
    import pytest as _pytest

    from syzgydb_spark.functions.text import hashed_embedding

    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "...")], "id LONG, text STRING"
    )
    rows = {r["id"]: r["v"] for r in df.select(
        "id", hashed_embedding("text", dim=4).alias("v")).collect()}
    assert rows[0] == [0.0, 0.0, 0.0, 0.0]  # no tokens → zero vector
    assert rows[1] is None                   # NULL text → NULL
    assert rows[2] == [0.0, 0.0, 0.0, 0.0]  # punctuation only
    with _pytest.raises(ValueError):
        hashed_embedding("text", dim=0)


def test_hashed_embedding_zero_shuffle_plan(spark, sf_dir):
    from syzgydb_spark.functions.text import hashed_embedding
    from syzgydb_spark.plans import scale_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = scale_report(docs.select("doc_id", hashed_embedding("text").alias("v")))
    assert rep["n_shuffles"] == 0
    assert not rep.get("row_python", False)


# -------------------------------------------------- cache lifecycle

def test_release_cached_drops_operator_intermediates(spark, docs):
    """Operators that persist a multi-consumer intermediate attach it
    to their result; release_cached unpersists exactly those blocks
    (regression: serving loops pinned corpus-token-sized caches for
    the session lifetime, relying on LRU eviction)."""
    from syzgydb_spark.cache import release_cached

    base = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    pairs = DD.ngram_jaccard_pairs(docs.limit(200), "text", "doc_id")
    pairs.count()  # materialize → intermediate is now cached
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() > base
    assert release_cached(pairs) >= 1
    assert release_cached(pairs) == 0  # idempotent
    # re-execution after release still works (persist keeps lineage)
    assert pairs.count() >= 0


def test_lm_model_is_caller_owned_persisted(spark, docs):
    """unigram_lm returns the persisted model relation itself, and
    since the eager-fill change it also owns the vocab-bounded counts
    intermediate — release_cached(model) drops BOTH (model.unpersist()
    alone would leave the counts block pinned in a per-slice fit
    loop)."""
    from syzgydb_spark.cache import release_cached
    from syzgydb_spark.operators.quality import unigram_lm

    lm = unigram_lm(docs.limit(100))
    lm.count()
    assert lm.storageLevel.useMemory or lm.storageLevel.useDisk
    assert release_cached(lm) == 2      # the model + its counts relation
    assert not (lm.storageLevel.useMemory or lm.storageLevel.useDisk)


def test_char_ngrams_shapes(spark):
    """char shingles: lowercased, full-cover, short/empty/NULL text →
    empty array (the pinned-lambda rewrite must not change any of
    these edges)."""
    from syzgydb_spark.functions.text import char_ngrams

    df = spark.createDataFrame(
        [(0, "AbCd"), (1, "ab"), (2, ""), (3, None), (4, "xyz")],
        "id LONG, text STRING",
    )
    got = {r["id"]: r["g"] for r in
           df.select("id", char_ngrams("text", 3).alias("g")).collect()}
    assert got[0] == ["abc", "bcd"]
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == ["xyz"]
