"""Tests for the table profiler and z-order clustering."""

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.functions.zorder import cluster_by_zorder, zorder_key
from syzgydb_spark.operators.profile import profile_table


# ---------------------------------------------------------------- profiler


def test_profile_table_exact(spark):
    rows = [
        (1, "a", 1.5, [1, 2]),
        (2, "a", None, [3]),
        (3, None, 2.5, None),
        (3, "b", 2.5, []),
    ]
    df = spark.createDataFrame(rows, "id long, s string, x double, arr array<int>")
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert set(out) == {"id", "s", "x", "arr"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["id"]["n_nulls"] == 0 and out["id"]["n_distinct"] == 3
    assert out["id"]["min_value"] == "1" and out["id"]["max_value"] == "3"
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "b"
    assert out["x"]["n_nulls"] == 1 and out["x"]["n_distinct"] == 2
    # arrays profile counts but carry no ordering -> NULL min/max
    assert out["arr"]["n_nulls"] == 1 and out["arr"]["min_value"] is None
    assert out["arr"]["dtype"] == "array<int>"


def test_profile_table_approx_and_column_subset(spark):
    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 100).alias("mod")
    )
    out = {r["column"]: r for r in profile_table(df, ["mod"], approx=True).collect()}
    assert set(out) == {"mod"}
    assert out["mod"]["n_distinct"] == pytest.approx(100, rel=0.1)
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])


def test_profile_single_scan(spark):
    """The unpivot must not re-execute the aggregate per column: the
    executed plan contains exactly ONE scan of the input."""
    import io
    from contextlib import redirect_stdout

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("a"), (F.col("id") % 3).alias("b")
    )
    prof = profile_table(df)
    buf = io.StringIO()
    with redirect_stdout(buf):
        prof.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Scan ") + plan.count("Range ") <= 2  # one source (+AQE echo)
    assert prof.count() == 3


# ----------------------------------------------------------------- z-order


def _py_morton(vals, bits):
    key = 0
    n = len(vals)
    for j, v in enumerate(vals):
        v = max(0, min((1 << bits) - 1, v))
        for i in range(bits):
            key += ((v >> i) & 1) << (i * n + j)
    return key


def test_zorder_key_matches_reference_bit_math(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 3), (5, 9), (255, 1), (-4, 70000)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y", zorder_key(["x", "y"], bits=8).alias("k")
    ).collect()
    for r in out:
        assert r["k"] == _py_morton([r["x"], r["y"]], 8), (r["x"], r["y"])
    # NULL clamps to 0
    dfn = spark.createDataFrame([(None, 3)], "x long, y long")
    assert dfn.select(zorder_key(["x", "y"], bits=4)).first()[0] == _py_morton([0, 3], 4)
    with pytest.raises(ValueError):
        zorder_key(["x", "y"], bits=32)
    with pytest.raises(ValueError):
        zorder_key([])


def test_cluster_by_zorder_tightens_stats_on_both_columns(spark, tmp_path):
    """Row-group min/max must be tight on BOTH clustered columns,
    where a plain single-column sort leaves the second column's stats
    at full range in every group."""
    import pyarrow.parquet as pq

    n = 40_000
    df = spark.range(n).select(
        (F.xxhash64("id") % 256).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 256).alias("b"),
    ).select(F.abs("a").alias("a"), F.abs("b").alias("b"))

    z_dir = str(tmp_path / "zorder")
    s_dir = str(tmp_path / "sorted_a")
    cluster_by_zorder(df, ["a", "b"], bits=8, n_partitions=8).write.mode(
        "overwrite"
    ).parquet(z_dir)
    df.repartitionByRange(8, "a").sortWithinPartitions("a").write.mode(
        "overwrite"
    ).parquet(s_dir)

    def coverage(d, col):
        """Mean fraction of the full value range a row group spans."""
        import glob
        spans, full = [], 256.0
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(idx).statistics
                spans.append((st.max - st.min + 1) / full)
        return sum(spans) / len(spans)

    # single-column sort: 'a' tight, 'b' useless (full range everywhere)
    assert coverage(s_dir, "a") < 0.35
    assert coverage(s_dir, "b") > 0.9
    # z-order (distributed path): BOTH columns substantially tighter
    # than full range. Row-group boundaries here are writer-heuristic
    # AND range-partition sampling varies run to run, so this path
    # pins the CONTRAST with margin; the exact quantitative bound is
    # pinned on the deterministic layout below.
    assert coverage(z_dir, "a") < 0.7
    assert coverage(z_dir, "b") < 0.7

    # ---- deterministic layout: exact quantitative bound (r7-verdict
    # task 6). Global z-key sort -> one writer task -> exact 5000-row
    # file splits (one row group per file under the default block
    # size), so coverage is bit-reproducible: measured 0.578125 / b
    # 0.330566 on three consecutive runs. zorder_key is injective on
    # (a, b) at bits=8 over 0..255, so tie order cannot perturb stats.
    zd_det = str(tmp_path / "zorder_det")
    (df.withColumn("_zkey", zorder_key(["a", "b"], bits=8))
     .orderBy("_zkey").coalesce(1).drop("_zkey")
     .write.option("maxRecordsPerFile", 5000)
     .mode("overwrite").parquet(zd_det))
    ca, cb = coverage(zd_det, "a"), coverage(zd_det, "b")
    assert ca == pytest.approx(0.578125, abs=0.02), ca
    assert cb == pytest.approx(0.330566, abs=0.02), cb
