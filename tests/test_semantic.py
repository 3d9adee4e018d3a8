"""SemDeDup (operators/semantic.py): planted near-duplicates are
dropped, the cluster head survives, the keep-rule follows the paper's
centroid ordering, and the pairwise pass never leaves its cluster."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.ivf import IvfIndex
from syzgydb_spark.operators.semantic import cluster_sizes, semdedup


@pytest.fixture(scope="module")
def planted(spark):
    """Two well-separated clusters; ids 0/1/2 are near-identical copies
    in cluster A (cosine ≈ 1), id 3 a distinct A member, ids 10/11
    distinct B members."""
    rng = np.random.default_rng(7)
    a = rng.normal(size=8)
    a /= np.linalg.norm(a)
    b = -a  # opposite direction: its own cluster
    rows = []
    for i, scale in ((0, 1.0), (1, 0.999), (2, 1.001)):
        rows.append((i, (a * scale + rng.normal(scale=1e-4, size=8)).tolist()))
    ortho = rng.normal(size=8)
    ortho -= ortho.dot(a) * a
    ortho /= np.linalg.norm(ortho)
    rows.append((3, (a * 0.3 + ortho).tolist()))
    rows.append((10, (b * 1.1).tolist()))
    rows.append((11, (b + 0.8 * ortho).tolist()))
    df = spark.createDataFrame(rows, "id LONG, vector ARRAY<DOUBLE>")
    idx = IvfIndex(np.stack([a, b]), method="euclidean")
    return df, idx


def test_semdedup_drops_planted_copies(planted):
    df, idx = planted
    res = semdedup(df, idx, tau=0.95).orderBy("id").collect()
    by_id = {r["id"]: r for r in res}
    # exactly one of the three near-identical copies survives
    copies_kept = [i for i in (0, 1, 2) if by_id[i]["kept"]]
    assert len(copies_kept) == 1
    # distinct members survive everywhere
    for i in (3, 10, 11):
        assert by_id[i]["kept"], i
    # the survivor among the copies is the farthest-from-centroid one:
    # the lowest rank (first in centroid-sim-ascending order)
    ranks = {i: by_id[i]["rank"] for i in (0, 1, 2)}
    assert ranks[copies_kept[0]] == min(ranks.values())


def test_semdedup_head_has_null_prior(planted):
    df, idx = planted
    res = semdedup(df, idx, tau=0.95)
    heads = res.where(F.col("rank") == 1).collect()
    assert all(r["max_prior_sim"] is None and r["kept"] for r in heads)


def test_semdedup_pairs_stay_in_cluster(planted):
    """tau=-1 drops every non-head member iff it has ANY prior member —
    so cluster B's head plus cluster A's head survive, proving no
    cross-cluster comparisons leak in."""
    df, idx = planted
    res = semdedup(df, idx, tau=-1.0)
    kept = sorted(r["id"] for r in res.where("kept").collect())
    cells = {r["id"]: r["cell"] for r in res.collect()}
    assert len(kept) == 2
    assert {cells[k] for k in kept} == {0, 1}


def test_cluster_sizes(planted):
    df, idx = planted
    sizes = {r["cell"]: r["n_members"] for r in cluster_sizes(df, idx).collect()}
    assert sizes == {0: 4, 1: 2}


def test_semdedup_kept_filter_roundtrip(planted):
    df, idx = planted
    res = semdedup(df, idx, tau=0.95)
    survivors = df.join(res.where("kept").select("id"), "id").count()
    assert survivors == res.where("kept").count() == 4


def test_cluster_balanced_sample_exact_k(planted):
    """Exactly min(k, cluster size) rows per cell, ranks 1..k, and the
    selection is deterministic across runs."""
    from syzgydb_spark.operators.semantic import cluster_balanced_sample

    df, idx = planted
    res = cluster_balanced_sample(df, idx, 2, id_col="id").collect()
    by_cell = {}
    for r in res:
        by_cell.setdefault(r["ivf_cell"], []).append(r)
    # cluster A has 4 members (0,1,2,3) → exactly 2; B has 2 → both
    assert sorted(len(v) for v in by_cell.values()) == [2, 2]
    for rows in by_cell.values():
        assert sorted(r["sample_rank"] for r in rows) == [1, 2]
    again = cluster_balanced_sample(df, idx, 2, id_col="id").collect()
    assert sorted((r["id"], r["sample_rank"]) for r in again) == sorted(
        (r["id"], r["sample_rank"]) for r in res
    )
    # k larger than any cluster: every row sampled
    all_rows = cluster_balanced_sample(df, idx, 100, id_col="id")
    assert all_rows.count() == df.count()


def test_cluster_balanced_sample_cache_release(planted):
    """The cell-assignment materialization is a caller-releasable
    persist (not a lineage-truncating localCheckpoint): the result
    carries exactly one handle, releasing it is idempotent, and a
    post-release re-execution recomputes the identical sample (the
    whole lineage — fitted centers, argmin, md5-fraction draw — is
    deterministic, which is what makes recompute-on-executor-loss
    safe)."""
    from syzgydb_spark.cache import release_cached
    from syzgydb_spark.operators.semantic import cluster_balanced_sample

    df, idx = planted
    res = cluster_balanced_sample(df, idx, 2, id_col="id")
    before = sorted((r["id"], r["sample_rank"]) for r in res.collect())
    assert len(getattr(res, "_syzgy_persisted", ())) == 1
    assert release_cached(res) == 1
    assert release_cached(res) == 0
    after = sorted((r["id"], r["sample_rank"]) for r in res.collect())
    assert after == before


# ---- embedding_outliers (centroid-distance trim) ----


@pytest.fixture(scope="module")
def trim_fixture(spark):
    """One tight cluster around +a with a single far stray, plus a
    second cluster so the rank is genuinely per-cell."""
    rng = np.random.default_rng(11)
    a = rng.normal(size=6)
    a /= np.linalg.norm(a)
    b = -a
    rows = []
    for i in range(20):  # tight core, distance ~1e-3
        rows.append((i, (a + rng.normal(scale=1e-3, size=6)).tolist()))
    rows.append((99, (a * 4.0).tolist()))  # stray: distance 3 from center
    for i in range(200, 210):
        rows.append((i, (b + rng.normal(scale=1e-3, size=6)).tolist()))
    df = spark.createDataFrame(rows, "id LONG, vector ARRAY<DOUBLE>")
    idx = IvfIndex(np.stack([a, b]), method="euclidean")
    return df, idx


def test_outlier_flags_planted_stray(trim_fixture):
    from syzgydb_spark.operators.semantic import embedding_outliers

    df, idx = trim_fixture
    res = embedding_outliers(df, idx, trim_fraction=0.05).collect()
    by_id = {r["id"]: r for r in res}
    assert by_id[99]["is_outlier"] is True
    assert by_id[99]["pr"] == 1.0  # farthest in its cell
    # the tight core is not flagged
    assert all(not by_id[i]["is_outlier"] for i in range(20))


def test_outlier_rank_is_per_cell(trim_fixture):
    from syzgydb_spark.operators.semantic import embedding_outliers

    df, idx = trim_fixture
    res = embedding_outliers(df, idx, trim_fraction=0.05).collect()
    # cell B has 10 members all near its center; the farthest of them
    # still ranks pr == 1.0 within ITS cell even though its absolute
    # distance is tiny versus the stray in cell A
    cell_b = [r for r in res if r["cell"] == 1]
    assert len(cell_b) == 10
    assert max(r["pr"] for r in cell_b) == 1.0
    # every cell's pr spans [0, 1]
    assert min(r["pr"] for r in cell_b) == 0.0


def test_outlier_trim_fraction_zero_and_one(trim_fixture):
    from syzgydb_spark.operators.semantic import embedding_outliers

    df, idx = trim_fixture
    none = embedding_outliers(df, idx, trim_fraction=0.0).collect()
    assert all(not r["is_outlier"] for r in none)  # pr > 1.0 impossible
    allr = embedding_outliers(df, idx, trim_fraction=1.0).collect()
    # pr > 0.0 — everything except each cell's closest member
    flagged = [r["id"] for r in allr if r["is_outlier"]]
    assert len(flagged) == len(allr) - 2  # one head per cell


def test_outliers_on_expression_backed_vectors(spark, sf_dir):
    """Regression: with an EXPRESSION-backed vector column (a
    hashed_embedding over text, not a stored column), AQE's logical
    re-optimization used to inline the assignment pandas UDF into the
    window exchange's hashpartitioning — skipping Python-UDF
    extraction and dying with INTERNAL_ERROR 'Cannot evaluate
    expression' at shuffle time, and only on the SECOND action in
    some session states. with_cell_distances is now a MapInPandas
    plan node, which nothing can collapse into an expression; both
    actions must succeed."""
    import numpy as np

    from syzgydb_spark.functions.text import hashed_embedding
    from syzgydb_spark.operators.semantic import embedding_outliers

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = docs.select(
        F.col("doc_id").alias("id"), hashed_embedding("text", dim=8).alias("vector")
    )
    idx = IvfIndex(np.random.default_rng(3).normal(size=(4, 8)), method="euclidean")
    res = embedding_outliers(emb, idx, trim_fraction=0.1)
    n_flagged = res.where("is_outlier").count()   # action 1
    n_total = res.count()                          # action 2 (the crasher)
    assert 0 < n_flagged < n_total
