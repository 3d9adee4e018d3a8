"""Collection CRUD / persistence / quantization / stats.

Mirrors the reference's collection tests: add/get/update/remove
(collection_test.go:145-281), persistence across close/reopen
(384-457), add-delete-reopen-readd (459-534), 4-bit quantization
round-trip (614-667), stats sampling (105-143).
"""

import json
import os
import shutil

import numpy as np
import pytest

from syzgydb_spark.collection import Collection, CollectionOptions


@pytest.fixture()
def tmp_coll(spark, tmp_path):
    opts = CollectionOptions(name="t", dimension_count=3, distance_method="euclidean")
    return Collection.create(spark, str(tmp_path / "coll"), opts)


def test_crud_roundtrip(tmp_coll):
    c = tmp_coll
    docs = [(i, [float(i), float(i + 1), float(i + 2)], json.dumps({"i": i})) for i in range(20)]
    c.add_documents(docs)
    assert c.count() == 20
    row = c.get(5)
    assert row["vector"] == [5.0, 6.0, 7.0]
    assert json.loads(row["metadata"]) == {"i": 5}

    # upsert overwrites same id (collection.go:427-457)
    c.add_documents([(5, [9.0, 9.0, 9.0], '{"i": 99}')])
    assert c.count() == 20
    assert c.get(5)["vector"] == [9.0, 9.0, 9.0]

    # metadata-only update keeps vector (collection.go:490-509)
    c.update_metadata(5, '{"i": 100}')
    row = c.get(5)
    assert row["vector"] == [9.0, 9.0, 9.0]
    assert json.loads(row["metadata"]) == {"i": 100}
    with pytest.raises(KeyError):
        c.update_metadata(999, "{}")

    # remove every 10th (collection_test.go:384-457 pattern)
    c.remove([0, 10])
    assert c.count() == 18
    assert c.get(0) is None
    assert c.get_all_ids() == sorted(set(range(20)) - {0, 10})


def _file_states(path):
    """(relative path → (size, mtime_ns)) for every parquet file under data/."""
    import os

    states = {}
    data = os.path.join(path, "data")
    for root, _, files in os.walk(data):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                st = os.stat(full)
                states[os.path.relpath(full, data)] = (st.st_size, st.st_mtime_ns)
    return states


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """The scale contract: a small upsert/update/delete must leave every
    untouched bucket's files byte-identical on disk (same path, size,
    mtime) — no full-table rewrite (VERDICT r1 item 1)."""
    from pyspark.sql import functions as F

    opts = CollectionOptions(name="b", dimension_count=3, n_buckets=8)
    path = str(tmp_path / "b")
    c = Collection.create(spark, path, opts)
    c.add_documents(
        [(i, [float(i), 0.0, 0.0], json.dumps({"i": i})) for i in range(200)]
    )
    before = _file_states(path)
    assert len({p.split("/")[0] for p in before}) == 8  # all buckets populated

    def touched_bucket(doc_id):
        return (
            spark.range(1)
            .select(F.pmod(F.xxhash64(F.lit(doc_id).cast("long")), F.lit(8)).alias("b"))
            .collect()[0]["b"]
        )

    # upsert one doc → exactly one bucket's files change
    c.add_documents([(7, [9.0, 9.0, 9.0], '{"i": 99}')])
    after = _file_states(path)
    tb = touched_bucket(7)
    for p, st in before.items():
        if not p.startswith(f"bucket={tb}/"):
            assert after.get(p) == st, f"untouched file rewritten: {p}"
    assert not any(p.startswith(f"bucket={tb}/") and after.get(p) == st
                   for p, st in before.items())
    assert c.count() == 200 and c.get(7)["vector"] == [9.0, 9.0, 9.0]

    # metadata-only update → only that bucket changes
    before = after
    c.update_metadata(3, '{"i": 300}')
    after = _file_states(path)
    tb = touched_bucket(3)
    for p, st in before.items():
        if not p.startswith(f"bucket={tb}/"):
            assert after.get(p) == st, f"untouched file rewritten: {p}"

    # delete → only buckets containing the ids change
    before = after
    c.remove([11, 12])
    after = _file_states(path)
    tbs = {touched_bucket(11), touched_bucket(12)}
    for p, st in before.items():
        if p.split("/")[0].split("=")[1] not in {str(b) for b in tbs}:
            assert after.get(p) == st, f"untouched file rewritten: {p}"
    assert c.count() == 198


def test_dimension_validation(tmp_coll):
    with pytest.raises(ValueError):
        tmp_coll.add_documents([(1, [1.0, 2.0], "{}")])  # collection.go:432-434


def test_query_dimension_validation(tmp_coll):
    """The QUERY vector is validated too — zip_with over mismatched
    lengths would yield null distances (silently wrong results)."""
    with pytest.raises(ValueError, match="dimension mismatch"):
        tmp_coll.search([1.0, 2.0], k=1)
    with pytest.raises(ValueError, match="dimension mismatch"):
        tmp_coll.search_many([(0, [1.0, 2.0])], k=1)


def test_persistence_reopen(spark, tmp_path):
    path = str(tmp_path / "coll")
    opts = CollectionOptions(name="p", dimension_count=3, distance_method="cosine",
                             lsh={"dim": 3, "num_tables": 5, "num_planes": 8,
                                  "seed": 2, "method": "cosine", "bucket_width": 1.0})
    c1 = Collection.create(spark, path, opts)
    rng = np.random.default_rng(2)
    docs = [(i, rng.uniform(size=3).tolist(), json.dumps({"m": i})) for i in range(1000)]
    c1.add_documents(docs)

    # reopen: options come back from disk (collection.go:243-251) and
    # no index rebuild is needed — signature columns are already data
    c2 = Collection.open(spark, path)
    assert c2.options.distance_method == "cosine"
    assert c2.count() == 1000
    res = c2.search(docs[17][1], k=10, precision="medium").collect()
    assert len(res) == 10
    assert res[0]["id"] == 17
    # ANN touches less than the full collection (collection_test.go:98)
    assert c2.percent_searched(docs[17][1]) < 100.0

    # delete + readd cycle (collection_test.go:459-534)
    c2.remove(list(range(0, 1000, 10)))
    assert c2.count() == 900
    c2.add_documents([(0, docs[0][1], '{"m": 0}')])
    assert c2.count() == 901
    assert Collection.open(spark, path).get(0) is not None


@pytest.mark.parametrize("bits,tol", [(64, 0.0), (32, 1e-6), (16, 1e-4), (8, 0.01), (4, 0.07)])
def test_quantization_roundtrip(spark, tmp_path, bits, tol):
    """Round-trip error bounded per tier (collection_test.go:614-667
    tests 4-bit end-to-end; values live in [-1,1] per quantization.go)."""
    opts = CollectionOptions(name=f"q{bits}", dimension_count=3, quantization=bits)
    c = Collection.create(spark, str(tmp_path / f"q{bits}"), opts)
    rng = np.random.default_rng(4)
    vals = rng.uniform(-1.0, 1.0, size=(10, 3))
    c.add_documents([(i, vals[i].tolist(), "{}") for i in range(10)])
    for row in c.df().collect():
        want = vals[row["id"]]
        got = np.array(row["vector"])
        assert np.abs(got - want).max() <= tol + 1e-12, (bits, row["id"])
    # search still works on the dequantized view
    res = c.search(vals[3].tolist(), k=1, precision="exact").collect()
    assert res[0]["id"] == 3


def test_stats(spark, tmp_path):
    opts = CollectionOptions(name="s", dimension_count=3)
    c = Collection.create(spark, str(tmp_path / "s"), opts)
    rng = np.random.default_rng(9)
    c.add_documents([(i, rng.uniform(size=3).tolist(), "{}") for i in range(200)])
    st = c.stats(samples=50)
    assert st["document_count"] == 200
    assert st["dimension_count"] == 3
    assert st["quantization"] == 64
    assert st["storage_size"] > 0
    assert 0.0 < st["average_distance"] < np.sqrt(3)


def test_exact_search_percent_100(spark, tmp_path):
    """precision=exact scans everything (collection_test.go:549-612)."""
    opts = CollectionOptions(name="e", dimension_count=3)
    c = Collection.create(spark, str(tmp_path / "e"), opts)
    c.add_documents([
        (1, [1.0, 2.0, 3.0], '{"name": "doc1"}'),
        (2, [4.0, 5.0, 6.0], '{"name": "doc2"}'),
        (3, [7.0, 8.0, 9.0], '{"name": "doc3"}'),
    ])
    res = c.search([1.0, 2.0, 3.0], k=3, precision="exact").collect()
    assert [r["id"] for r in res] == [1, 2, 3]
    assert c.percent_searched([1.0, 2.0, 3.0]) == 100.0  # no index


def test_pq_enable_search_and_persistence(spark, tmp_path):
    """enable_pq reindexes once (codes become columns), precision='pq'
    searches the code column with exact re-rank, codebooks persist in
    options.json, and later writes encode incrementally."""
    path = str(tmp_path / "pqcoll")
    opts = CollectionOptions(name="pq", dimension_count=8)
    c = Collection.create(spark, path, opts)
    rng = np.random.default_rng(5)
    docs = [(i, rng.uniform(-1, 1, size=8).tolist(), json.dumps({"m": i})) for i in range(300)]
    c.add_documents(docs)

    with pytest.raises(ValueError):
        c.search(docs[0][1], k=3, precision="pq")  # not enabled yet

    c.enable_pq(m=4, k=16, seed=1)
    assert "pq_code" in c.df().columns
    res = c.search(docs[7][1], k=5, precision="pq").collect()
    assert len(res) == 5
    assert res[0]["id"] == 7 and res[0]["distance"] < 1e-9  # re-rank is exact
    assert [r["distance"] for r in res] == sorted(r["distance"] for r in res)

    # reopen: codebooks come back from options.json, no refit
    c2 = Collection.open(spark, path)
    assert c2.pq_index is not None
    res2 = c2.search(docs[7][1], k=5, precision="pq").collect()
    assert [r["id"] for r in res2] == [r["id"] for r in res]

    # incremental write after enabling: new row gets a code and is found
    new_vec = [float(x) for x in rng.uniform(-1, 1, size=8)]
    c2.add_documents([(9999, new_vec, json.dumps({"m": "new"}))])
    hit = c2.search(new_vec, k=1, precision="pq").collect()
    assert hit[0]["id"] == 9999 and hit[0]["distance"] < 1e-9


def test_pq_filter_prefilters(spark, tmp_path):
    path = str(tmp_path / "pqfilt")
    opts = CollectionOptions(name="pqf", dimension_count=8)
    c = Collection.create(spark, path, opts)
    rng = np.random.default_rng(6)
    docs = [
        (i, rng.uniform(-1, 1, size=8).tolist(), json.dumps({"grp": "even" if i % 2 == 0 else "odd"}))
        for i in range(200)
    ]
    c.add_documents(docs)
    c.enable_pq(m=4, k=16, seed=1)
    res = c.search(docs[3][1], k=5, precision="pq", filter="grp == 'odd'").collect()
    assert len(res) == 5
    assert all(json.loads(r["metadata"])["grp"] == "odd" for r in res)
    assert res[0]["id"] == 3


def test_storage_debug_dump(spark, tmp_path):
    """S10 (reference DumpIndex, dump.go:219-318): per-file physical
    storage report incl. dead space, from parquet footers only."""
    import json as _json

    from syzgydb_spark.sources.debug_dump import dump_storage, format_dump

    path = str(tmp_path / "dumpme")
    c = Collection.create(
        spark, path, CollectionOptions(name="d", dimension_count=3, n_buckets=4)
    )
    c.add_documents(
        [(i, [float(i), 0.0, 0.0], _json.dumps({"i": i})) for i in range(20)]
    )
    c.add_documents([(3, [9.0, 0.0, 0.0], _json.dumps({"i": 99}))])  # v3

    d = dump_storage(c)
    assert d["manifest_version"] == 3
    assert d["dead_files"] == 0  # commits delete replaced files
    # footer row counts sum to the live count without a Spark job
    assert d["live_rows"] == c.count() == 20
    assert all(f["live"] and f["version"] in (2, 3) for f in d["files"])
    assert d["live_bytes"] > 0

    # a dead file from a LOST commit (version behind the live
    # manifest — immediately reclaimable) shows as dead space
    b = d["files"][0]["bucket"]
    orphan = os.path.join(c._data_dir(), f"bucket={b}", "v1-orphan.parquet")
    shutil.copyfile(
        os.path.join(c._data_dir(), f"bucket={b}", d["files"][0]["file"]), orphan
    )
    d2 = dump_storage(c)
    assert d2["dead_files"] == 1 and d2["dead_bytes"] > 0
    assert {f["file"] for f in d2["files"] if not f["live"]} == {"v1-orphan.parquet"}

    text = format_dump(d2)
    assert "DEAD (vacuum)" in text and "Manifest version: 3" in text

    # vacuum reclaims exactly the dead file
    assert c.vacuum() == 1
    assert dump_storage(c)["dead_files"] == 0


def test_ivf_precision_tier(spark, tmp_path):
    """enable_ivf reindexes with a persisted cell column; precision='ivf'
    probes cells with observable coverage and respects filter/radius;
    the index survives reopen without a refit."""
    from pyspark.sql import Observation

    rng = np.random.default_rng(11)
    path = str(tmp_path / "ivf_coll")
    c = Collection.create(
        spark, path, CollectionOptions(name="iv", dimension_count=8, n_buckets=4)
    )
    docs = [
        (i, rng.uniform(-1, 1, size=8).tolist(), json.dumps({"grp": ["x", "y"][i % 2]}))
        for i in range(2000)
    ]
    c.add_documents(docs)
    c.enable_ivf(n_clusters=8, seed=5)
    assert "ivf_cell" in c.df().columns

    q = docs[123][1]
    exact = [r["id"] for r in c.search(q, k=10, precision="exact").collect()]

    obs = Observation("ivf")
    got = c.search(q, k=10, precision="ivf", n_probes=4, observation=obs).collect()
    assert len(got) == 10
    m = obs.get
    assert 0 < m["points_searched"] < m["points_total"] == 2000
    # recall@10 vs exact with half the cells probed
    recall = len(set(r["id"] for r in got) & set(exact)) / 10
    assert recall >= 0.8, recall

    # pre-filter applies before ranking
    filt = c.search(q, k=5, precision="ivf", filter="grp == 'x'").collect()
    assert len(filt) == 5 and all(
        json.loads(r["metadata"])["grp"] == "x" for r in filt
    )

    # radius bounds results
    rad = c.search(q, k=10, precision="ivf", radius=0.5).collect()
    assert all(r["distance"] <= 0.5 for r in rad)

    # reopen: centers come back from options.json, cells from parquet
    c2 = Collection.open(spark, path)
    assert c2.ivf_index is not None
    got2 = [r["id"] for r in c2.search(q, k=10, precision="ivf", n_probes=4).collect()]
    assert got2 == [r["id"] for r in got]

    # incremental writes assign cells in _encode (no refit)
    c2.add_documents([(9001, docs[123][1], json.dumps({"grp": "x"}))])
    top = c2.search(q, k=1, precision="ivf").collect()[0]
    assert top["id"] in (123, 9001) and top["distance"] <= 1e-9


def test_ivfpq_precision_tier(spark, tmp_path):
    """precision='ivfpq' composes the two index tiers: coarse cells
    prune candidates (observable coverage < 100%), PQ-ADC shortlists,
    exact re-rank orders — recall vs exact stays high while only the
    probed cells are scanned; survives reopen."""
    from pyspark.sql import Observation

    rng = np.random.default_rng(13)
    path = str(tmp_path / "ivfpq_coll")
    c = Collection.create(
        spark, path, CollectionOptions(name="ip", dimension_count=8, n_buckets=4)
    )
    docs = [
        (i, rng.uniform(-1, 1, size=8).tolist(), json.dumps({"grp": ["x", "y"][i % 2]}))
        for i in range(2000)
    ]
    c.add_documents(docs)
    with pytest.raises(ValueError, match="ivfpq"):
        c.search(docs[0][1], k=5, precision="ivfpq")
    c.enable_pq(m=4, k=16, seed=1)
    c.enable_ivf(n_clusters=8, seed=5)

    q = docs[123][1]
    exact = [r["id"] for r in c.search(q, k=10, precision="exact").collect()]
    obs = Observation("ivfpq")
    got = c.search(q, k=10, precision="ivfpq", n_probes=4, observation=obs).collect()
    assert len(got) == 10
    m = obs.get
    assert 0 < m["points_searched"] < m["points_total"] == 2000
    recall = len(set(r["id"] for r in got) & set(exact)) / 10
    assert recall >= 0.7, recall
    # re-rank distances are exact: ascending and equal to exact search's
    by_id = {r["id"]: r["distance"] for r in c.search(q, k=2000, precision="exact").collect()}
    for r in got:
        assert abs(r["distance"] - by_id[r["id"]]) < 1e-9
    # filter + radius compose; reopen keeps both indexes
    filt = c.search(q, k=5, precision="ivfpq", filter="grp == 'x'").collect()
    assert len(filt) == 5 and all(json.loads(r["metadata"])["grp"] == "x" for r in filt)
    c2 = Collection.open(spark, path)
    again = c2.search(q, k=10, precision="ivfpq", n_probes=4).collect()
    assert [r["id"] for r in again] == [r["id"] for r in got]

    # batch twin: search_many('ivfpq') agrees with the single-query
    # tier on the same collection, and its observation is readable
    obs2 = Observation("ivfpq_batch")
    batch = c2.search_many(
        [(0, q)], k=10, precision="ivfpq", n_probes=4, observation=obs2
    ).collect()
    assert [r["id"] for r in batch] == [r["id"] for r in got]
    assert obs2.get["candidate_pairs"] > 0
    # pq tier attaches the full-scan observation instead of hanging
    obs3 = Observation("pq_batch")
    pq_batch = c2.search_many([(0, q)], k=5, precision="pq", observation=obs3)
    assert pq_batch.count() == 5
    assert obs3.get["points_searched"] == obs3.get["points_total"] == 2000


def test_add_documents_duplicate_ids_last_wins(spark, tmp_path):
    """A batch containing the same id twice stores ONE row, the LAST
    occurrence — reference parity (sequential AddDocument overwrite,
    collection.go:427-457). Regression: the merge unioned both."""
    c = Collection.create(
        spark, str(tmp_path / "dup"),
        CollectionOptions(name="d", dimension_count=2, n_buckets=4),
    )
    c.add_documents([
        (1, [1.0, 0.0], json.dumps({"v": "first"})),
        (2, [0.0, 1.0], None),
        (1, [0.5, 0.5], json.dumps({"v": "second"})),
    ])
    assert c.count() == 2
    assert c.get_all_ids() == [1, 2]
    row = c.get(1)
    assert json.loads(row["metadata"])["v"] == "second"
    assert row["vector"] == [0.5, 0.5]
    # upserting the dup batch again is stable
    c.add_documents([(1, [0.5, 0.5], json.dumps({"v": "second"}))])
    assert c.count() == 2


def test_search_many_matches_single_query_search(spark, tmp_path):
    """Batch exact search agrees row-for-row with per-query search();
    list input, metadata join, filter pre-filtering, and the error
    paths all behave."""
    import pytest as _pytest

    opts = CollectionOptions(name="sm", dimension_count=3, n_buckets=4)
    c = Collection.create(spark, str(tmp_path / "sm"), opts)
    c.add_documents(
        [
            (i, [float(i % 10), float(i % 3), 1.0], json.dumps({"grp": i % 2}))
            for i in range(200)
        ]
    )
    qs = [(0, [2.0, 1.0, 1.0]), (1, [7.0, 0.0, 1.0])]

    batch = c.search_many(qs, k=5, precision="exact").collect()
    assert len(batch) == 10
    for qid, vec in qs:
        single = [
            (r["id"], round(r["distance"], 9))
            for r in c.search(vec, k=5, precision="exact").collect()
        ]
        got = [
            (r["id"], round(r["distance"], 9)) for r in batch if r["query_id"] == qid
        ]
        assert got == single, qid

    # metadata join + filter pre-filtering
    with_md = c.search_many(qs, k=3, precision="exact",
                            filter="grp == 1", include_metadata=True)
    rows = with_md.collect()
    assert len(rows) == 6
    assert all(json.loads(r["metadata"])["grp"] == 1 for r in rows)

    # error paths
    with _pytest.raises(ValueError):
        c.search_many(qs, k=0)  # k=0 is search()'s full-listing knob
    with _pytest.raises(ValueError):
        c.search_many(qs, k=3, precision="ivfpq")  # no indexes enabled
    with _pytest.raises(ValueError):
        c.search_many(qs, k=3, precision="pq")


def test_unknown_precision_rejected(tmp_coll):
    """A typo like 'ifv' must error, not silently run a full exact scan
    (at 100 TB that's a very expensive typo)."""
    tmp_coll.add_documents([(1, [1.0, 0.0, 0.0], "{}")])
    with pytest.raises(ValueError, match="unknown precision"):
        tmp_coll.search([1.0, 0.0, 0.0], k=1, precision="ifv")
    with pytest.raises(ValueError, match="unknown precision"):
        tmp_coll.search_many([(0, [1.0, 0.0, 0.0])], k=1, precision="medium ")


def test_observation_attached_on_exact_fallback(tmp_coll):
    """precision='medium' with no LSH index falls back to the exact
    scan — a caller-created Observation must still be attached (its
    .get otherwise blocks forever), reporting the honest 100%."""
    from pyspark.sql import Observation

    tmp_coll.add_documents(
        [(i, [float(i), 0.0, 0.0], "{}") for i in range(10)]
    )
    assert tmp_coll.index is None  # no LSH configured in this fixture

    obs = Observation("fallback_single")
    res = tmp_coll.search([1.0, 0.0, 0.0], k=3, precision="medium", observation=obs)
    res.collect()
    m = obs.get
    assert m["points_total"] == 10 and m["points_searched"] == 10

    obs2 = Observation("fallback_batch")
    res2 = tmp_coll.search_many(
        [(0, [1.0, 0.0, 0.0])], k=3, precision="medium", observation=obs2
    )
    res2.collect()
    m2 = obs2.get
    assert m2["points_total"] == 10 and m2["points_searched"] == 10


def test_calibrated_target_recall(spark, tmp_path, caplog):
    """calibrate_recall() measures the recall/cost curve on the
    collection's own data; search(target_recall=0.8) then picks the
    cheapest measured probe config and actually achieves >= 0.8
    recall@k against exact on a planted-structure fixture (clustered
    vectors — ANN's favorable case, per docs/RECALL.md)."""
    import logging

    import numpy as np

    rng = np.random.default_rng(7)
    dim, n_clusters, per = 16, 30, 80
    centers = rng.standard_normal((n_clusters, dim)) * 3.0
    rows = []
    i = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + rng.standard_normal(dim) * 0.3
            rows.append((i, [float(x) for x in v], "{}"))
            i += 1
    c = Collection.create(
        spark,
        str(tmp_path / "cal"),
        CollectionOptions(
            name="cal", dimension_count=dim, distance_method="cosine",
            lsh={"num_tables": 8, "num_planes": 6},
        ),
    )
    c.add_documents(rows)

    curves = c.calibrate_recall(k=10, n_queries=25, probe_grid={"lsh": [0, 2, 4]})
    assert "lsh" in curves and len(curves["lsh"]) == 3
    assert all(0 <= p["recall"] <= 1 and 0 < p["cand_frac"] <= 1 for p in curves["lsh"])
    # monotone cost: more probes -> more candidates
    fracs = [p["cand_frac"] for p in curves["lsh"]]
    assert fracs == sorted(fracs)

    # curve persists (reopen) and drives probe choice, with the
    # candidate fraction logged
    re = Collection.open(spark, str(tmp_path / "cal"))
    assert re.options.recall_curve is not None
    target = 0.8
    qs = [rows[j][1] for j in range(0, 1200, 120)]
    hits = tot = 0
    with caplog.at_level(logging.INFO, logger="syzgydb_spark.collection"):
        for q in qs:
            exact_ids = [r["id"] for r in re.search(q, k=10, precision="exact").collect()]
            got = {r["id"] for r in re.search(q, k=10, target_recall=target).collect()}
            hits += len(got & set(exact_ids))
            tot += 10
    assert hits / tot >= target, hits / tot
    assert any("candidate fraction" in m or "recall 1.0" in m for m in caplog.messages)

    # target no measured config reaches -> exact fallback (recall 1.0)
    got = {r["id"] for r in re.search(qs[0], k=10, target_recall=0.999999).collect()}
    exact_ids = {r["id"] for r in re.search(qs[0], k=10, precision="exact").collect()}
    assert got == exact_ids

    # uncalibrated tier errors clearly
    with pytest.raises(ValueError, match="calibrate_recall"):
        Collection.create(
            spark, str(tmp_path / "uncal"),
            CollectionOptions(name="u", dimension_count=3, lsh={}),
        ).search([1.0, 0.0, 0.0], k=2, target_recall=0.9)

    # target_recall without an ANN tier errors clearly
    with pytest.raises(ValueError, match="target_recall"):
        Collection.create(
            spark, str(tmp_path / "noann"),
            CollectionOptions(name="n", dimension_count=3),
        ).search([1.0, 0.0, 0.0], k=2, target_recall=0.9)


def test_calibrated_target_recall_ivfpq(spark, tmp_path):
    """The IVFADC composition gets its own measured curve: on a
    planted-structure collection with pq+ivf enabled,
    calibrate_recall() emits an 'ivfpq' curve (probe cells -> ADC
    codes -> exact re-rank, exactly the search(precision='ivfpq')
    path), and search(target_recall=...) on that tier achieves the
    target against exact."""
    import numpy as np

    rng = np.random.default_rng(11)
    dim, n_clusters, per = 16, 20, 100  # 2000 rows
    centers = rng.standard_normal((n_clusters, dim)) * 3.0
    rows = []
    i = 0
    for cc in range(n_clusters):
        for _ in range(per):
            v = centers[cc] + rng.standard_normal(dim) * 0.3
            rows.append((i, [float(x) for x in v], "{}"))
            i += 1
    c = Collection.create(
        spark,
        str(tmp_path / "calpq"),
        CollectionOptions(
            name="calpq", dimension_count=dim, distance_method="cosine"
        ),
    )
    c.add_documents(rows)
    c.enable_ivf(n_clusters=16, seed=5)
    # k=64 codewords: on this fixture ivfpq recall is PQ-resolution-
    # bound, FLAT in n_probes (a probed cell already contains each
    # query's whole planted cluster) — measured 0.86/0.965/0.995 at
    # k=32/64/128 with the deterministic (sorted-sample) fit. k=32 sat
    # under the 0.9 bar and only passed before by init luck, which the
    # partition-order-dependent sampling this round's fit fix removed.
    c.enable_pq(m=8, k=64, seed=5)

    curves = c.calibrate_recall(
        k=10, n_queries=20,
        probe_grid={"ivf": [1, 4], "ivfpq": [1, 2, 4, 8]},
    )
    assert set(curves) == {"ivf", "ivfpq"}
    pts = curves["ivfpq"]
    assert len(pts) == 4
    assert all(0 <= p["recall"] <= 1 and 0 < p["cand_frac"] <= 1 for p in pts)
    # monotone cost along the probe knob, like every other tier
    fracs = [p["cand_frac"] for p in pts]
    assert fracs == sorted(fracs)
    # the planted structure is ANN's favorable case: at max probes the
    # probed cells contain the cluster, so recall is bounded only by
    # the PQ quantization (≥0.9 at k=64; the curve is probe-flat here)
    assert pts[-1]["recall"] >= 0.9, pts

    # the persisted curve drives probe choice on the ivfpq tier
    re = Collection.open(spark, str(tmp_path / "calpq"))
    assert "ivfpq" in (re.options.recall_curve or {})
    target = 0.8
    hits = tot = 0
    for j in range(0, 2000, 250):
        q = rows[j][1]
        exact_ids = {
            r["id"] for r in re.search(q, k=10, precision="exact").collect()
        }
        got = {
            r["id"]
            for r in re.search(
                q, k=10, precision="ivfpq", target_recall=target
            ).collect()
        }
        hits += len(got & exact_ids)
        tot += 10
    assert hits / tot >= target, hits / tot

    # ivfpq target_recall without both indexes errors clearly
    with pytest.raises(ValueError, match="target_recall"):
        Collection.create(
            spark, str(tmp_path / "nopq"),
            CollectionOptions(name="np", dimension_count=3),
        ).search([1.0, 0.0, 0.0], k=2, precision="ivfpq", target_recall=0.9)
