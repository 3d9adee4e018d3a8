"""robust_outliers (operators/profile.py): median/MAD modified
z-score from bounded histograms."""

import pyspark.sql.functions as F

from syzgydb_spark.operators.profile import robust_outliers


def test_planted_outliers_flagged(spark):
    # key 'a': tight cluster around 10 plus two gross outliers;
    # key 'b': uniform-ish, no outliers
    rows = (
        [("a", float(v)) for v in [9, 10, 10, 10, 11, 9, 11, 10]]
        + [("a", 500.0), ("a", -400.0)]
        + [("b", float(v)) for v in range(20)]
    )
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], ["id", "k", "v"]
    )
    out = robust_outliers(df, ["k"], "v").collect()
    flagged = {r["id"] for r in out if r["is_outlier"]}
    assert flagged == {8, 9}
    byid = {r["id"]: r for r in out}
    assert byid[0]["median"] == 10.0 and byid[0]["mad"] == 1.0
    # modified z-score of 500 vs (med 10, mad 1): 0.6745*490
    assert abs(byid[8]["robust_z"] - round(0.6745 * 490, 6)) < 1e-9


def test_degenerate_mad_fallback(spark):
    # >half identical values -> MAD 0 -> NULL score, flag != median
    rows = [("k", 5.0)] * 6 + [("k", 7.0), ("k", 5.0)]
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], ["id", "k", "v"]
    )
    out = robust_outliers(df, ["k"], "v").collect()
    for r in out:
        assert r["mad"] == 0.0 and r["robust_z"] is None
        assert r["is_outlier"] == (r["v"] != 5.0)


def test_null_values_unflagged(spark):
    df = spark.createDataFrame(
        [(1, "k", 1.0), (2, "k", 2.0), (3, "k", None)], ["id", "k", "v"]
    )
    out = {r["id"]: r for r in robust_outliers(df, ["k"], "v").collect()}
    assert out[3]["is_outlier"] is False and out[3]["robust_z"] is None
    assert len(out) == 3
