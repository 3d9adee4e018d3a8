"""IVF index maintenance: skew detection (cell stats / imbalance),
staleness monitoring (quantization error), and hot-cell splitting —
bounded re-encode of only the split cell, stable ids for every other
cell, recall preserved across the split."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.ivf import IvfIndex
from syzgydb_spark.operators.maintenance import (
    ivf_cell_stats,
    ivf_imbalance,
    quantization_error,
    split_ivf_cell,
)

CENTERS = np.array([[0.0, 0.0], [10.0, 0.0], [5.0, 20.0]])


def _planted(spark):
    """Cell 0: 4 pts, cell 1 HOT: two sub-blobs (near x=8 and x=12,
    6 pts each), cell 2: 2 pts."""
    pts = (
        [(i, [0.1 * i, 0.1]) for i in range(4)]
        + [(10 + i, [8.0 + 0.1 * i, 0.2]) for i in range(6)]
        + [(20 + i, [12.0 + 0.1 * i, -0.2]) for i in range(6)]
        + [(30 + i, [5.0 + 0.1 * i, 20.0]) for i in range(2)]
    )
    return spark.createDataFrame(pts, "id long, vector array<double>")


@pytest.fixture()
def index():
    return IvfIndex(CENTERS.copy(), "euclidean")


@pytest.fixture()
def cells(spark, index):
    return index.with_cells(_planted(spark)).cache()


def test_cell_stats_and_imbalance(spark, index, cells):
    stats = {r["cell"]: r["n"] for r in ivf_cell_stats(cells).collect()}
    assert stats == {0: 4, 1: 12, 2: 2}
    row = ivf_imbalance(cells, n_cells=3).collect()[0]
    assert row["n_cells"] == 3 and row["n_used"] == 3
    assert row["max_n"] == 12
    assert row["avg_n"] == pytest.approx(6.0)
    assert row["imbalance"] == pytest.approx(2.0)


def test_imbalance_counts_empty_cells(spark, index):
    """avg divides by the DECLARED cell count: empty cells are wasted
    probe granularity and must worsen the figure, not vanish."""
    df = spark.createDataFrame(
        [(i, [0.0, 0.1 * i]) for i in range(6)], "id long, vector array<double>")
    cells = index.with_cells(df)  # everything lands in cell 0
    row = ivf_imbalance(cells, n_cells=3).collect()[0]
    assert row["n_used"] == 1
    assert row["avg_n"] == pytest.approx(2.0)  # 6 rows / 3 declared cells
    assert row["imbalance"] == pytest.approx(3.0)


def test_quantization_error_zero_at_centers_and_grows_with_drift(spark, index):
    at_centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(CENTERS)],
        "id long, vector array<double>")
    assert quantization_error(index, at_centers) == pytest.approx(0.0)

    near = spark.createDataFrame(
        [(i, [0.0 + 0.1 * i, 0.0]) for i in range(5)],
        "id long, vector array<double>")
    drifted = near.select("id", F.transform(
        F.col("vector"), lambda x: x + F.lit(3.0)).alias("vector"))
    q_near = quantization_error(index, near)
    q_drift = quantization_error(index, drifted)
    assert q_drift > q_near * 1.3  # the refit signal fires


def test_split_hot_cell_bounded_and_stable(spark, index, cells):
    new_index, reassigned = split_ivf_cell(index, cells, 1, k=2)
    # geometry: one appended center, untouched slots bit-identical
    assert len(new_index.centers) == 4
    assert np.array_equal(new_index.centers[0], CENTERS[0])
    assert np.array_equal(new_index.centers[2], CENTERS[2])
    # bounded: ONLY the hot cell's rows come back, re-encoded into the
    # replaced slot or the appended one
    rows = reassigned.collect()
    assert sorted(r["id"] for r in rows) == list(range(10, 16)) + list(range(20, 26))
    assert set(r["ivf_cell"] for r in rows) == {1, 3}
    # the two sub-blobs separate
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["ivf_cell"], []).append(r["vector"][0])
    lo, hi = sorted(by_cell.values(), key=lambda v: min(v))
    assert max(lo) < 9.0 and min(hi) > 11.0


def test_split_reduces_quantization_error(spark, index, cells):
    hot = cells.where(F.col("ivf_cell") == 1).drop("ivf_cell")
    before = quantization_error(index, hot)
    new_index, _ = split_ivf_cell(index, cells, 1, k=2)
    after = quantization_error(new_index, hot)
    assert after < before / 2


def test_probe_recall_holds_across_split(spark, index, cells):
    """For queries in the split region, the nearest-cell probe of the
    NEW index lands on the cell that holds the true nearest neighbor."""
    new_index, reassigned = split_ivf_cell(index, cells, 1, k=2)
    assign = {r["id"]: r["ivf_cell"] for r in reassigned.collect()}
    pts = {r["id"]: np.array(r["vector"]) for r in _planted(spark).collect()}
    for q in (np.array([8.2, 0.0]), np.array([12.3, 0.1])):
        true_nn = min(pts, key=lambda i: np.linalg.norm(pts[i] - q))
        probed = new_index.probe_cells(list(q), 1)
        assert assign[true_nn] in probed


def test_split_with_heavy_duplicates_never_appends_dead_center(spark, index):
    """Seeds are drawn from the UNIQUE-row matrix: a hot cell whose
    sample is dominated by one repeated vector used to draw duplicate
    seeds, which never separate under argmin tie-breaking and left a
    permanently empty appended sub-center (r7 advice). With two
    distinct values present, both sub-centers must end up non-empty
    regardless of how lopsided the duplication is."""
    pts = (
        [(i, [8.0, 0.0]) for i in range(40)]  # one value, 40 copies
        + [(100 + i, [12.0, 0.0]) for i in range(2)]  # the other blob
    )
    df = spark.createDataFrame(pts, "id long, vector array<double>")
    cells = index.with_cells(df)
    new_index, reassigned = split_ivf_cell(index, cells, 1, k=2, seed=0)
    counts = {r["ivf_cell"]: r["n"]
              for r in reassigned.groupBy("ivf_cell").agg(
                  F.count("*").alias("n")).collect()}
    assert sorted(counts) == [1, 3]
    assert counts[1] > 0 and counts[3] > 0
    assert sorted(counts.values()) == [2, 40]


def test_split_validation_errors(spark, index, cells):
    with pytest.raises(ValueError, match="out of range"):
        split_ivf_cell(index, cells, 7, k=2)
    with pytest.raises(ValueError, match="k must be"):
        split_ivf_cell(index, cells, 1, k=1)
    empty = cells.where(F.col("ivf_cell") == 99)
    with pytest.raises(ValueError, match="empty"):
        split_ivf_cell(index, empty, 2, k=2)


def test_split_cosine_method(spark):
    """Directions, not magnitudes: a hot angular cell splits into two
    directional sub-cells."""
    centers = np.array([[1.0, 0.0], [0.0, 1.0]])
    index = IvfIndex(centers, "cosine")
    pts = (
        [(i, [5.0, 0.1 * i]) for i in range(3)]          # near +x
        + [(10 + i, [0.2 + 0.05 * i, 3.0]) for i in range(4)]   # near +y
        + [(20 + i, [3.0, 3.0 + 0.1 * i]) for i in range(4)]    # diagonal, cell 0/1 border
    )
    df = spark.createDataFrame(pts, "id long, vector array<double>")
    cells = index.with_cells(df)
    hot = [r["cell"] for r in ivf_cell_stats(cells).orderBy(F.desc("n")).collect()][0]
    new_index, reassigned = split_ivf_cell(index, cells, int(hot), k=2)
    assert len(new_index.centers) == 3
    assert reassigned.count() == ivf_cell_stats(cells).where(
        F.col("cell") == int(hot)).collect()[0]["n"]


# ------------------------------------------------ PQ staleness monitor


def test_pq_reconstruction_error_zero_on_codebook_points(spark):
    from syzgydb_spark.operators.maintenance import pq_reconstruction_error
    from syzgydb_spark.operators.pq import PqIndex

    idx = PqIndex.from_seed(8, m=2, k=4, seed=3)
    # vectors that ARE codeword concatenations reconstruct exactly
    rows = []
    for i in range(4):
        v = list(idx.codebooks[0][i]) + list(idx.codebooks[1][3 - i])
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "id long, vector array<double>")
    assert pq_reconstruction_error(idx, df) == pytest.approx(0.0, abs=1e-12)


def test_pq_reconstruction_error_signals_drift(spark):
    """A fitted codebook reconstructs its own distribution far better
    than a drifted one — the refit signal."""
    from syzgydb_spark.operators.maintenance import pq_reconstruction_error
    from syzgydb_spark.operators.pq import PqIndex

    rng = np.random.default_rng(11)
    base = rng.normal(0.0, 1.0, (300, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        "id long, vector array<double>")
    idx = PqIndex.fit(df, m=2, k=16, seed=5)
    e_fit = pq_reconstruction_error(idx, df)

    drifted = spark.createDataFrame(
        [(i, [float(x) for x in v + 5.0]) for i, v in enumerate(base)],
        "id long, vector array<double>")
    e_drift = pq_reconstruction_error(idx, drifted)
    assert e_drift > e_fit * 2


def test_pq_reconstruction_error_cosine_in_range(spark):
    from syzgydb_spark.operators.maintenance import pq_reconstruction_error
    from syzgydb_spark.operators.pq import PqIndex

    rng = np.random.default_rng(2)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rng.normal(0, 1, (50, 8)))],
        "id long, vector array<double>")
    idx = PqIndex.fit(df, m=2, k=8, seed=5, method="cosine")
    e = pq_reconstruction_error(idx, df)
    assert 0.0 <= e <= 1.0
    # magnitude-invariance: scaling every vector leaves angular
    # distortion unchanged
    scaled = df.selectExpr("id", "transform(vector, x -> x * 7.0) as vector")
    assert pq_reconstruction_error(idx, scaled) == pytest.approx(e, rel=1e-9)
