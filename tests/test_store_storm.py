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


def test_stale_break_during_paused_fold_refuses_at_commit(
        spark, tmp_path, monkeypatch):
    """Deterministic replay of the zombie-compactor race (r8 verdict
    task 5): compactor Z acquires the lock and pauses mid-fold past
    the staleness horizon; a successor S breaks the lock and compacts
    the same live set; Z then resumes. Pre-guard, Z would publish a
    SECOND compacted delta over the same sources and every count
    doubles. The commit-point ``still_held()`` guard must make Z
    refuse, publish nothing, and leave S's compaction as the store's
    exact state.

    The pause is injected at Z's manifest write — after Z's fold has
    materialized its tmp parquet (so no read-of-deleted-source error
    masks the race) and immediately before the commit guard."""
    import time as _time

    from syzgydb_spark.operators import maintenance as mnt
    from syzgydb_spark.operators.sketch import (
        build_mg_store,
        read_mg_store,
        update_mg_store,
    )

    def terms(items):
        return spark.createDataFrame([(t,) for t in items], "term string")

    path = str(tmp_path / "mg_zombie")
    build_mg_store(terms(["a"] * 3), "term", path, capacity=64)
    update_mg_store(terms(["b"] * 2), "term", path, token="w1")
    update_mg_store(terms(["a"] * 4), "term", path, token="w2")

    real_write_text = mnt._write_text
    state = {"fired": False}

    def hooked(sp, p, text):
        if p.endswith("_sources.json") and not state["fired"]:
            state["fired"] = True
            real_write_text(sp, p, text)  # Z's tmp manifest completes
            # Z "pauses" here long enough for its lock to go stale...
            lock = os.path.join(path, "_compact.lock")
            old = _time.time() - 7200
            os.utime(lock, (old, old))
            # ...and successor S breaks the stale lock and compacts
            assert mnt.compact_mg_store(sp, path) == 3
            return
        real_write_text(sp, p, text)

    monkeypatch.setattr(mnt, "_write_text", hooked)
    with pytest.raises(mnt.CompactionInProgressError, match="commit point"):
        mnt.compact_mg_store(spark, path)  # Z: folds, pauses, must refuse

    got = {r["term"]: r["est_count"]
           for r in read_mg_store(spark, path).collect()}
    assert got == {"a": 7, "b": 2}  # exact — S's compaction, counted once
    dirs = os.listdir(path)
    assert sum(d.startswith("batch=compact-") for d in dirs) == 1
    assert not any(d.startswith("_tmp_") for d in dirs)  # Z cleaned up
    assert "_compact.lock" not in dirs  # Z did not delete S's... and S
    # released its own on exit; Z's token-guarded release left it alone


def test_fresh_lock_slipping_into_stale_break_is_not_stolen(
        spark, tmp_path, monkeypatch):
    """Deterministic replay of the stale-break TOCTOU (r8 advice):
    breakers A and B both observe the same stale lock; A breaks it and
    acquires FRESH before B's break lands. Pre-fix (delete-then-create)
    B would delete A's fresh lock and both hold. Post-fix B breaks via
    rename, sees the tomb carries A's token instead of the stale one it
    observed, RESTORES A's lock, and backs off."""
    import time as _time

    from syzgydb_spark.operators import maintenance as mnt

    store = str(tmp_path / "mg_toctou")
    os.makedirs(store)
    lock = os.path.join(store, "_compact.lock")
    with open(lock, "w") as f:
        f.write("compactor-dead")
    old = _time.time() - 7200
    os.utime(lock, (old, old))

    a = mnt._compaction_lock(spark, store)
    real_read_text = mnt._read_text
    state = {"fired": False}

    def hooked(sp, p):
        out = real_read_text(sp, p)
        # B's observed-read of the stale lock: before it returns, A's
        # full break-and-acquire completes (the interleaving window)
        if p.endswith("_compact.lock") and out == "compactor-dead" \
                and not state["fired"]:
            state["fired"] = True
            a.__enter__()
        return out

    monkeypatch.setattr(mnt, "_read_text", hooked)
    b = mnt._compaction_lock(spark, store)
    with pytest.raises(mnt.CompactionInProgressError,
                       match="while breaking a stale lock"):
        b.__enter__()

    # A's fresh lock survived B's aborted break, byte for byte
    with open(lock) as f:
        assert f.read() == a._token
    assert not [x for x in os.listdir(store) if ".tomb." in x]
    # and only A's own release removes it
    b.__exit__(None, None, None)
    assert os.path.exists(lock)
    a.__exit__(None, None, None)
    assert not os.path.exists(lock)


def test_zombie_release_does_not_delete_successor_lock(spark, tmp_path):
    """A compaction that outlives stale_seconds and gets its lock
    broken must NOT delete the successor's lock on exit (r8 advice:
    the old __exit__ deleted unconditionally)."""
    import time as _time

    from syzgydb_spark.operators import maintenance as mnt

    store = str(tmp_path / "mg_zrel")
    os.makedirs(store)
    lock = os.path.join(store, "_compact.lock")

    z = mnt._compaction_lock(spark, store)
    z.__enter__()
    old = _time.time() - 7200
    os.utime(lock, (old, old))  # z runs way past the horizon

    s = mnt._compaction_lock(spark, store)
    s.__enter__()  # breaks z's stale lock, acquires
    assert not z.still_held() and s.still_held()

    z.__exit__(None, None, None)  # zombie finishes: must leave s's lock
    with open(lock) as f:
        assert f.read() == s._token
    s.__exit__(None, None, None)
    assert not os.path.exists(lock)
