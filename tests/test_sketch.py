"""Misra-Gries frequent-items sketch: exactness in the wide regime,
the N/(capacity+1) guarantee in the lossy regime, hot-item
completeness, merge correctness across partitions, and the persisted
mergeable store's incremental fold."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.sketch import (
    build_mg_store,
    frequent_terms,
    read_mg_store,
    update_mg_store,
)


def _stream(skew_hot=50, uniques=200):
    """A skewed stream: 3 hot terms + a long unique tail."""
    items = (["hot_a"] * skew_hot + ["hot_b"] * (skew_hot // 2)
             + ["hot_c"] * (skew_hot // 5)
             + [f"u{i}" for i in range(uniques)])
    # deterministic interleave so hot items are spread, not clumped
    items.sort(key=lambda t: hash((t, items.count(t))) % 1000)
    return items


def _df(spark, items, partitions=4):
    return spark.createDataFrame(
        [(t,) for t in items], "term string"
    ).repartition(partitions)


def test_exact_when_capacity_covers_distinct(spark):
    items = _stream()
    truth = Counter(items)
    out = {r["term"]: r for r in
           frequent_terms(_df(spark, items), "term",
                          capacity=len(truth) + 10).collect()}
    assert {t: r["est_count"] for t, r in out.items()} == dict(truth)
    assert all(r["err_bound"] == 0 for r in out.values())


def test_guarantee_in_lossy_regime(spark):
    items = _stream(skew_hot=300, uniques=500)
    truth = Counter(items)
    n = len(items)
    cap = 20
    rows = frequent_terms(_df(spark, items), "term", capacity=cap).collect()
    assert 0 < len(rows) <= cap
    # distributed bound: each of the 4 partition sketches may undercount
    # by its share of N/(cap+1), and the merge prune adds one more cut —
    # the reported err_bound is the actual sum and must respect the
    # per-summary guarantee while every estimate brackets the truth
    for r in rows:
        t = truth[r["term"]]
        assert r["est_count"] <= t, r
        assert t <= r["est_count"] + r["err_bound"], (r, t)
    err = rows[0]["err_bound"]
    assert all(r["err_bound"] == err for r in rows)
    assert err <= n  # sanity; the sharp per-summary bound follows below
    # every item with true count > err must be IN the sketch
    present = {r["term"] for r in rows}
    for t, c in truth.items():
        if c > err:
            assert t in present, (t, c, err)
    # the hot items clear the bound by construction
    assert {"hot_a", "hot_b"} <= present


def test_single_partition_bound_is_sharp(spark):
    """On one partition the classic bound holds: err <= N/(cap+1)."""
    items = _stream(skew_hot=120, uniques=300)
    n = len(items)
    cap = 16
    rows = frequent_terms(_df(spark, items, partitions=1), "term",
                          capacity=cap).collect()
    assert rows[0]["err_bound"] <= n // (cap + 1)


def test_null_terms_ignored_and_capacity_validated(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "term string")
    out = frequent_terms(df, "term", capacity=8).collect()
    assert {(r["term"], r["est_count"]) for r in out} == {("a", 2)}
    with pytest.raises(ValueError, match="capacity"):
        frequent_terms(df, "term", capacity=0)


def test_store_incremental_fold(spark, tmp_path):
    """Two waves through the store = one mergeable fold: exact in the
    wide regime, bracketed in the lossy one; capacity is enforced from
    the sidecar."""
    w1 = ["x"] * 30 + ["y"] * 10 + [f"a{i}" for i in range(40)]
    w2 = ["x"] * 20 + ["z"] * 15 + [f"b{i}" for i in range(40)]
    truth = Counter(w1) + Counter(w2)

    # wide regime: store equals plain counts with zero error
    p1 = str(tmp_path / "wide")
    build_mg_store(_df(spark, w1), "term", p1, capacity=256)
    update_mg_store(_df(spark, w2), "term", p1)
    got = {r["term"]: r for r in read_mg_store(spark, p1).collect()}
    assert {t: r["est_count"] for t, r in got.items()} == dict(truth)
    assert all(r["err_bound"] == 0 for r in got.values())

    # lossy regime: estimates bracket the truth with the folded bound
    p2 = str(tmp_path / "lossy")
    build_mg_store(_df(spark, w1), "term", p2, capacity=8)
    update_mg_store(_df(spark, w2), "term", p2)
    rows = read_mg_store(spark, p2).collect()
    assert 0 < len(rows) <= 8
    for r in rows:
        assert r["est_count"] <= truth[r["term"]]
        assert truth[r["term"]] <= r["est_count"] + r["err_bound"]
    assert {"x"} <= {r["term"] for r in rows}  # the cross-wave hot item


def test_plan_shape(spark):
    """Bounded machinery only: no cartesian product (the 1-row scalar
    joins broadcast), no corpus-wide window, and the only wide
    exchange is the bounded partial-sketch merge."""
    df = spark.createDataFrame([("a",), ("b",)], "term string")
    plan = (frequent_terms(df, "term", capacity=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_stream_frequent_terms_cross_batch(spark, tmp_path):
    """Two micro-batches fold into one store; the live read equals the
    batch operator over the union (wide regime ⇒ exact); replaying the
    stream from scratch against the SAME store converges (stable
    batch-id tokens overwrite, never double-count)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from syzgydb_spark.streaming.ingest import stream_frequent_terms

    d = tmp_path / "src"
    d.mkdir()
    b1 = ["x"] * 12 + ["y"] * 3 + [f"a{i}" for i in range(10)]
    b2 = ["x"] * 7 + ["z"] * 5 + [f"b{i}" for i in range(10)]
    for name, terms in (("b1.parquet", b1), ("b2.parquet", b2)):
        pq.write_table(pa.table({"term": terms}), str(d / name))

    store = str(tmp_path / "store")

    def run(ckpt):
        stream = (
            spark.readStream.schema("term string")
            .option("maxFilesPerTrigger", 1).parquet(str(d) + "/*")
        )
        q = stream_frequent_terms(
            stream, store_path=store, capacity=64,
            checkpoint=str(tmp_path / ckpt),
        )
        q.awaitTermination(180)

    run("ckpt1")
    truth = Counter(b1 + b2)
    got = {r["term"]: r["est_count"]
           for r in read_mg_store(spark, store).collect()}
    assert got == dict(truth)

    # full replay (fresh checkpoint, same store): batch ids repeat, the
    # deltas overwrite in place, and the fold is unchanged
    run("ckpt2")
    again = {r["term"]: r["est_count"]
             for r in read_mg_store(spark, store).collect()}
    assert again == dict(truth)


def test_stream_tokens_do_not_clobber_built_store(spark, tmp_path):
    """Attaching a stream to a PRE-BUILT store must not overwrite the
    build's batch=0 delta: stream deltas are namespaced
    ('stream-<batch_id>'), disjoint from build_mg_store's token '0'
    (pre-r7, the bare batch-id token silently lost the built counts)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from syzgydb_spark.operators.sketch import build_mg_store
    from syzgydb_spark.streaming.ingest import stream_frequent_terms

    store = str(tmp_path / "store")
    built = ["hot"] * 20 + ["warm"] * 5
    build_mg_store(
        spark.createDataFrame([(t,) for t in built], "term string"),
        "term", store, capacity=64,
    )

    d = tmp_path / "src"
    d.mkdir()
    streamed = ["hot"] * 3 + ["cold"] * 7
    pq.write_table(pa.table({"term": streamed}), str(d / "b1.parquet"))
    q = stream_frequent_terms(
        spark.readStream.schema("term string").parquet(str(d) + "/*"),
        store_path=store, capacity=64,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {r["term"]: r["est_count"]
           for r in read_mg_store(spark, store).collect()}
    assert got == dict(Counter(built + streamed))  # build counts survive


def test_update_wave_folding_to_empty_keeps_bound_honest(spark, tmp_path):
    """An update wave whose every term is cut (capacity=2, 4 singleton
    terms in one partition folds to ZERO surviving rows) must still
    carry its decrement into the store's err_bound: aggregating
    max(err_bound) over the empty folded relation recorded 0, and
    read_mg_store then claimed est ≤ true ≤ est+0 for terms that
    genuinely occurred (r8 advice, sketch.py carrier)."""
    p = str(tmp_path / "emptyfold")
    build_mg_store(_df(spark, ["x"] * 5, partitions=1), "term", p, capacity=2)
    # 4 singletons, one partition: merged ests all 1, cut=1, fold → empty
    update_mg_store(_df(spark, ["a", "b", "c", "d"], partitions=1), "term", p)

    truth = Counter(["x"] * 5 + ["a", "b", "c", "d"])
    rows = read_mg_store(spark, p).collect()
    got = {r["term"]: r for r in rows}
    # the store-wide bound must cover every term that occurred —
    # including the cut singletons, whose est is an implicit 0
    bounds = {r["err_bound"] for r in rows}
    assert len(bounds) == 1
    bound = bounds.pop()
    for t, true in truth.items():
        est = got[t]["est_count"] if t in got else 0
        assert est <= true <= est + bound, (t, est, true, bound)
