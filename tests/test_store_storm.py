"""Cross-process storm for the incremental sketch stores (r7-verdict
task 2): two OS-process updaters stream waves into ONE MG + quantile +
Bloom store while a third process compacts in a loop. The compaction
protocol (manifested supersession for the non-idempotent sum folds,
OR-idempotent folding for Bloom) plus the rename-committed delta
publication must together guarantee: no delta lost, no delta counted
twice, error accounting preserved — the store-stack analog of
test_concurrency's 3-process collection CAS storm.

Reviewing for this storm surfaced a real race, pinned DETERMINISTICALLY
in test_partial_delta_race_window_is_closed below (its window is too
narrow for the storm to hit reliably): deltas used to be written
directly to their ``batch=<token>`` directory (Spark creates the dir at
job start), so a concurrent compactor could list and fold a
HALF-WRITTEN delta and then manifest its token — permanently dropping
the rest of the batch once the writer finished. Delta writes now
publish via tmp + rename (maintenance.publish_parquet_atomically).
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_WAVES = 6
N_SINGLES = 5
HOT_PER_WAVE = 3
UPDATERS = (1, 2)


def _updater_script(root: str) -> str:
    return textwrap.dedent(f"""
        import sys, time
        sys.path.insert(0, {REPO!r})
        from pyspark.sql import functions as F
        from syzgydb_spark.session import get_spark
        from syzgydb_spark.operators.sketch import update_mg_store
        from syzgydb_spark.operators.quantiles import update_quantile_store
        from syzgydb_spark.operators.bloom import update_bloom_store

        tid = int(sys.argv[1])
        spark = get_spark(app_name=f"storm-up{{tid}}", master="local[2]",
                          shuffle_partitions=2)
        spark.sparkContext.setLogLevel("ERROR")
        for s in range({N_WAVES}):
            terms = [f"u{{tid}}s{{s}}x{{j}}" for j in range({N_SINGLES})]
            terms += ["hot"] * {HOT_PER_WAVE}
            tdf = spark.createDataFrame([(t,) for t in terms], "term string")
            update_mg_store(tdf, "term", {root!r} + "/mg")
            vdf = spark.createDataFrame(
                [(float(tid * 100 + s),)] * 4, "v double")
            update_quantile_store(vdf, "v", {root!r} + "/qs")
            update_bloom_store(tdf, F.col("term"), {root!r} + "/bloom")
            time.sleep(0.2)
    """)


def _compactor_script(root: str) -> str:
    return textwrap.dedent(f"""
        import sys, time
        sys.path.insert(0, {REPO!r})
        from syzgydb_spark.session import get_spark
        from syzgydb_spark.operators.maintenance import (
            compact_mg_store, compact_bloom_store)
        from syzgydb_spark.operators.quantiles import compact_quantile_store

        spark = get_spark(app_name="storm-compactor", master="local[2]",
                          shuffle_partitions=2)
        spark.sparkContext.setLogLevel("ERROR")
        for _ in range(10):
            compact_mg_store(spark, {root!r} + "/mg")
            compact_quantile_store(spark, {root!r} + "/qs")
            compact_bloom_store(spark, {root!r} + "/bloom")
            time.sleep(0.4)
    """)


def test_store_compaction_storm_two_updaters_one_compactor(spark, tmp_path):
    """Final state after the storm equals the exact truth for all
    three stores (exact regime: capacities exceed the distinct
    counts), proving compact-vs-update races neither lose nor
    double-count a delta and preserve err_bound 0."""
    from pyspark.sql import functions as F

    from syzgydb_spark.operators.bloom import (
        build_bloom_store,
        probe_bloom_store,
    )
    from syzgydb_spark.operators.maintenance import (
        compact_mg_store,
        live_mg_tokens,
    )
    from syzgydb_spark.operators.quantiles import (
        build_quantile_store,
        compact_quantile_store,
        read_quantile_store,
    )
    from syzgydb_spark.operators.sketch import build_mg_store, read_mg_store

    root = str(tmp_path / "storm")
    seed_terms = spark.createDataFrame([("seed",)], "term string")
    build_mg_store(seed_terms, "term", f"{root}/mg", capacity=256)
    build_quantile_store(
        spark.createDataFrame([(0.0,)], "v double"), "v", f"{root}/qs",
        capacity=64)
    build_bloom_store(seed_terms, F.col("term"), f"{root}/bloom",
                      n_bits=1 << 16)

    up = tmp_path / "updater.py"
    up.write_text(_updater_script(root))
    comp = tmp_path / "compactor.py"
    comp.write_text(_compactor_script(root))
    procs = [
        subprocess.Popen([sys.executable, str(up), str(t)],
                         stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
        for t in UPDATERS
    ] + [
        subprocess.Popen([sys.executable, str(comp)],
                         stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
    ]
    for p in procs:
        _, err = p.communicate(timeout=900)
        assert p.returncode == 0, err.decode()[-3000:]

    # exact truth
    singles = {f"u{t}s{s}x{j}" for t in UPDATERS
               for s in range(N_WAVES) for j in range(N_SINGLES)}
    hot_true = len(UPDATERS) * N_WAVES * HOT_PER_WAVE

    def check_mg():
        got = {r["term"]: (r["est_count"], r["err_bound"])
               for r in read_mg_store(spark, f"{root}/mg").collect()}
        assert got["hot"] == (hot_true, 0)
        assert got["seed"] == (1, 0)
        for t in singles:
            assert got[t] == (1, 0), t
        assert len(got) == len(singles) + 2

    def check_qs():
        got = {r["value"]: r["weight"]
               for r in read_quantile_store(spark, f"{root}/qs").collect()}
        want = {float(t * 100 + s): 4
                for t in UPDATERS for s in range(N_WAVES)}
        want[0.0] = 1  # the build seed
        assert got == want

    def check_bloom():
        keys = spark.createDataFrame(
            [(i, t) for i, t in enumerate(sorted(singles | {"hot", "seed"}))],
            "id long, term string")
        hits = probe_bloom_store(keys, f"{root}/bloom", F.col("term"),
                                 id_col="id")
        assert hits.where(~F.col("bloom_hit")).count() == 0

    check_mg()
    check_qs()
    check_bloom()

    # a final compaction folds everything to one live delta per store
    # and changes nothing observable
    compact_mg_store(spark, f"{root}/mg")
    compact_quantile_store(spark, f"{root}/qs")
    assert len(live_mg_tokens(spark, f"{root}/mg")) == 1
    assert len(live_mg_tokens(spark, f"{root}/qs")) == 1
    check_mg()
    check_qs()
    check_bloom()


def test_partial_delta_race_window_is_closed(spark, tmp_path):
    """Deterministic replay of the half-written-delta race and proof
    the publication protocol closes it.

    (a) The harmful interleaving, simulated at the filesystem level:
    a partial ``batch=w1`` dir (half the batch's rows — what a
    mid-write Spark job leaves visible under direct-to-destination
    writes) is compacted; the writer then "finishes" (full delta
    replaces the partial one); the manifest now supersedes w1, so the
    completed rows are excluded forever — counts are silently LOW.

    (b) The API path cannot produce that state anymore: update_mg_store
    publishes via tmp+rename, so at every instant the store holds
    either no w1 delta or the complete one — and since r8 it REFUSES
    to write under a superseded token at all.
    """
    import shutil

    from pyspark.sql import functions as F  # noqa: F401

    from syzgydb_spark.operators.maintenance import compact_mg_store
    from syzgydb_spark.operators.sketch import (
        build_mg_store,
        read_mg_store,
        update_mg_store,
    )

    def terms(items):
        return spark.createDataFrame([(t,) for t in items], "term string")

    # (a) filesystem-level simulation of the pre-fix interleaving
    path = str(tmp_path / "mg_race")
    build_mg_store(terms(["a"] * 3), "term", path, capacity=64)
    # full wave w1 is ["b"] * 10 — but the compactor sees a partial
    # delta holding only half of it (simulate: write half under w1)
    update_mg_store(terms(["b"] * 5), "term", path, token="w1")
    half = str(tmp_path / "half_w1")
    shutil.copytree(os.path.join(path, "batch=w1"), half)
    compact_mg_store(spark, path)  # folds the PARTIAL w1, manifests it
    # writer "finishes": the complete delta lands under the same token
    # (bypassing the API guard, as the old direct write effectively did)
    shutil.rmtree(os.path.join(path, "batch=w1"), ignore_errors=True)
    shutil.copytree(half, os.path.join(path, "batch=w1"))
    got = {r["term"]: r["est_count"]
           for r in read_mg_store(spark, path).collect()}
    # the manifest excludes the completed delta: b stays at the partial
    # count — this IS the silent-loss consequence the protocol must
    # (and now does) make unreachable through the API
    assert got["b"] == 5

    # (b) the API path: a delta is never visible half-written (tmp +
    # rename publication), and a superseded token is refused outright
    path2 = str(tmp_path / "mg_safe")
    build_mg_store(terms(["a"] * 3), "term", path2, capacity=64)
    update_mg_store(terms(["b"] * 10), "term", path2, token="w1")
    compact_mg_store(spark, path2)
    with pytest.raises(ValueError, match="namespace"):
        update_mg_store(terms(["b"] * 10), "term", path2, token="w1")
    got = {r["term"]: r["est_count"]
           for r in read_mg_store(spark, path2).collect()}
    assert got == {"a": 3, "b": 10}
    # no _tmp_ leftovers: publication cleaned up after itself
    leftovers = [d for d in os.listdir(path2) if d.startswith("_tmp_")]
    assert leftovers == []
