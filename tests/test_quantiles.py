"""Quantile sketch: exactness in the wide regime, weight conservation
and measured rank error in the lossy regime, merge correctness across
partitions, the persisted store's incremental fold, and compaction
equivalence under the manifest protocol."""

import math
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.quantiles import (
    build_quantile_store,
    compact_quantile_store,
    quantile_sketch,
    read_quantile_store,
    sketch_quantiles,
    update_quantile_store,
)


def _df(spark, xs, partitions=4):
    return spark.createDataFrame(
        [(float(x),) for x in xs], "v double").repartition(partitions)


def _lower_quantile(xs, q):
    s = sorted(xs)
    return s[math.ceil(q * len(s)) - 1]


def _rank(xs, v):
    return sum(1 for x in sorted(xs) if x <= v)


def test_exact_when_capacity_covers_distinct(spark):
    xs = [1, 2, 2, 3, 3, 3, 7, 7, 10] * 4
    out = quantile_sketch(_df(spark, xs), "v", capacity=16).collect()
    got = {r["value"]: r["weight"] for r in out}
    assert got == {1.0: 4, 2.0: 8, 3.0: 12, 7.0: 8, 10.0: 4}


def test_exact_quantiles_match_classic_definition(spark):
    xs = list(range(1, 51)) * 3  # 150 values, 50 distinct
    sk = quantile_sketch(_df(spark, xs), "v", capacity=64)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = {r["q"]: r["value"] for r in sketch_quantiles(sk, qs).collect()}
    for q in qs:
        assert got[q] == _lower_quantile(xs, q), q


def test_rank_is_exact_when_q_times_n_is_integer(spark):
    """Double arithmetic can round an integer q*n UP (0.07 * 100 →
    7.000000000000001 → ceil 8), returning one order statistic too
    high; the rank tolerance keeps the classic lower quantile. The
    DuckDB oracle carries the same tolerance, so this case is pinned
    here rather than by the hash check (r7 advice)."""
    xs = list(range(1, 101))  # n = 100, all distinct
    sk = quantile_sketch(_df(spark, xs), "v", capacity=128)
    got = {r["q"]: r["value"]
           for r in sketch_quantiles(sk, [0.07, 0.29, 0.5, 0.58]).collect()}
    # exact expectations (ceil computed in integer arithmetic):
    # 0.07*100 = 7 → 7th value; 0.29*100 = 29; 0.58*100 = 58
    assert got == {0.07: 7.0, 0.29: 29.0, 0.5: 50.0, 0.58: 58.0}


def test_weight_conservation_and_bound_in_lossy_regime(spark):
    rng = np.random.default_rng(7)
    xs = rng.normal(100.0, 15.0, size=5000)
    sk = quantile_sketch(_df(spark, xs), "v", capacity=64).collect()
    assert len(sk) <= 64
    assert sum(r["weight"] for r in sk) == 5000
    vals = [r["value"] for r in sk]
    assert vals == sorted(vals)


@pytest.mark.parametrize("dist", ["uniform", "skewed"])
def test_rank_error_in_lossy_regime(spark, dist):
    """No worst-case guarantee is claimed (module docstring) — this
    pins the MEASURED practical accuracy so a collapse regression is
    caught: every decile's reported value must sit within 2% of N of
    its true rank on both a flat and a heavy-tailed stream."""
    rng = np.random.default_rng(42)
    n = 4000
    xs = (rng.uniform(0, 1000, n) if dist == "uniform"
          else rng.pareto(1.5, n) * 100)
    sk = quantile_sketch(_df(spark, xs), "v", capacity=128)
    qs = [i / 10 for i in range(1, 10)]
    got = sketch_quantiles(sk, qs).collect()
    for r in got:
        err = abs(_rank(xs, r["value"]) - r["q"] * n)
        assert err <= 0.02 * n, (dist, r["q"], err)


def test_merge_equals_single_pass_in_exact_regime(spark):
    xs = [1, 5, 5, 9] * 5
    ys = [2, 5, 9, 9] * 5
    whole = quantile_sketch(_df(spark, xs + ys), "v", capacity=32).collect()
    # the store fold IS the merge path: two waves, read folds them
    # (covered again below; here compare against the one-shot sketch)
    halves = quantile_sketch(
        _df(spark, xs).unionByName(_df(spark, ys)), "v", capacity=32).collect()
    assert [tuple(r) for r in whole] == [tuple(r) for r in halves]


def test_null_nan_ignored_and_validation(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (float("nan"),), (2.0,)], "v double")
    out = quantile_sketch(df, "v", capacity=8).collect()
    assert {r["value"]: r["weight"] for r in out} == {1.0: 1, 2.0: 1}
    with pytest.raises(ValueError, match="capacity"):
        quantile_sketch(df, "v", capacity=1)
    with pytest.raises(ValueError, match="quantiles"):
        sketch_quantiles(quantile_sketch(df, "v"), [0.0])


def test_store_incremental_fold_exact_regime(spark, tmp_path):
    path = str(tmp_path / "qs")
    build_quantile_store(_df(spark, [10, 10, 20]), "v", path, capacity=32)
    update_quantile_store(_df(spark, [20, 30]), "v", path)
    update_quantile_store(_df(spark, [30, 30, 40]), "v", path)
    got = {r["value"]: r["weight"]
           for r in read_quantile_store(spark, path).collect()}
    assert got == {10.0: 2, 20.0: 2, 30.0: 3, 40.0: 1}


def test_store_stable_token_replay_converges(spark, tmp_path):
    path = str(tmp_path / "qs")
    build_quantile_store(_df(spark, [1.0]), "v", path, capacity=8)
    update_quantile_store(_df(spark, [2.0, 2.0]), "v", path, token="w1")
    update_quantile_store(_df(spark, [2.0, 2.0]), "v", path, token="w1")  # replay
    got = {r["value"]: r["weight"]
           for r in read_quantile_store(spark, path).collect()}
    assert got == {1.0: 1, 2.0: 2}


def test_store_compaction_preserves_fold_and_excludes_replay(spark, tmp_path):
    path = str(tmp_path / "qs")
    build_quantile_store(_df(spark, [1, 1, 5]), "v", path, capacity=32)
    update_quantile_store(_df(spark, [5, 9]), "v", path, token="w1")
    before = read_quantile_store(spark, path).collect()
    assert compact_quantile_store(spark, path) == 2
    assert read_quantile_store(spark, path).collect() == before
    assert compact_quantile_store(spark, path) == 0
    # a stable token the compaction manifest superseded is REFUSED:
    # correct for a replay (already folded), data loss for a fresh
    # checkpoint reusing batch ids — the store can't tell them apart
    with pytest.raises(ValueError, match="namespace"):
        update_quantile_store(_df(spark, [5, 9]), "v", path, token="w1")
    assert read_quantile_store(spark, path).collect() == before
    # a genuinely new wave stays live alongside the compacted delta
    update_quantile_store(_df(spark, [42]), "v", path)
    got = {r["value"]: r["weight"]
           for r in read_quantile_store(spark, path).collect()}
    assert got == {1.0: 2, 5.0: 2, 9.0: 1, 42.0: 1}


def test_store_capacity_pinned_by_sidecar(spark, tmp_path):
    """Updates and reads take capacity from the store, not the caller
    — summaries of different widths can never fold together."""
    path = str(tmp_path / "qs")
    build_quantile_store(_df(spark, list(range(100))), "v", path, capacity=16)
    update_quantile_store(_df(spark, list(range(100, 200))), "v", path)
    out = read_quantile_store(spark, path).collect()
    assert len(out) <= 16
    assert sum(r["weight"] for r in out) == 200


def test_stream_value_distribution_cross_batch_and_replay(spark, tmp_path):
    """Two micro-batches fold into one store; the live read equals the
    one-shot sketch over the union (exact regime); replaying against
    the SAME store converges (stable batch-id tokens overwrite); the
    stream's namespaced tokens do not clobber a pre-built store."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from syzgydb_spark.operators.quantiles import build_quantile_store
    from syzgydb_spark.streaming.ingest import stream_value_distribution

    store = str(tmp_path / "store")
    build_quantile_store(_df(spark, [100.0, 100.0]), "v", store, capacity=64)

    d = tmp_path / "src"
    d.mkdir()
    b1 = [1.0] * 4 + [2.0] * 2
    b2 = [2.0] * 3 + [9.0]
    for name, vs in (("b1.parquet", b1), ("b2.parquet", b2)):
        pq.write_table(pa.table({"value": vs}), str(d / name))

    def run(ckpt):
        stream = (
            spark.readStream.schema("value double")
            .option("maxFilesPerTrigger", 1).parquet(str(d) + "/*")
        )
        q = stream_value_distribution(
            stream, store_path=store, capacity=64,
            checkpoint=str(tmp_path / ckpt),
        )
        q.awaitTermination(180)

    run("ckpt1")
    want = {1.0: 4, 2.0: 5, 9.0: 1, 100.0: 2}  # built + both batches
    got = {r["value"]: r["weight"]
           for r in read_quantile_store(spark, store).collect()}
    assert got == want

    # full replay (fresh checkpoint, same store): tokens repeat, the
    # deltas overwrite in place, the fold is unchanged
    run("ckpt2")
    got = {r["value"]: r["weight"]
           for r in read_quantile_store(spark, store).collect()}
    assert got == want

    # capacity sidecar is enforced for streams too
    with pytest.raises(Exception, match="capacity"):
        q = stream_value_distribution(
            spark.readStream.schema("value double").parquet(str(d) + "/*"),
            store_path=store, capacity=32,
            checkpoint=str(tmp_path / "ckpt3"))
        q.awaitTermination(180)
        raise RuntimeError(str(q.exception()))
