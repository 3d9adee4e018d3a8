"""FastSS deletion-neighborhood fuzzy matching (operators/fuzzy.py)."""

import random

import pyspark.sql.functions as F
import pytest

from syzgydb_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_join,
    fuzzy_pairs,
)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def test_deletion_variants_d1(spark):
    df = spark.createDataFrame([("abc",), ("", ), (None,)], "s string")
    got = df.select(deletion_variants("s", 1).alias("v")).collect()
    assert sorted(got[0]["v"]) == ["ab", "abc", "ac", "bc"]
    assert got[1]["v"] == [""]
    assert got[2]["v"] is None


def test_deletion_variants_d2(spark):
    df = spark.createDataFrame([("abcd",)], "s string")
    (got,) = df.select(deletion_variants("s", 2).alias("v")).collect()
    want = {"abcd"}
    for i in range(4):
        v1 = "abcd"[:i] + "abcd"[i + 1:]
        want.add(v1)
        for j in range(3):
            want.add(v1[:j] + v1[j + 1:])
    assert sorted(got["v"]) == sorted(want)


@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_pairs_match_brute_force(spark, d):
    """Seeded random short strings; the blocked plan must return
    EXACTLY the brute-force pair set at both supported distances."""
    rng = random.Random(427 + d)
    alphabet = "abcde"
    strs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 8)))
        for _ in range(120)
    ]
    df = spark.createDataFrame(list(enumerate(strs)), ["doc_id", "s"])
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(df, "s", max_dist=d).collect()
    )
    want = sorted(
        (i, j, _lev(strs[i], strs[j]))
        for i in range(len(strs))
        for j in range(i + 1, len(strs))
        if _lev(strs[i], strs[j]) <= d
    )
    assert got == want and len(want) > 0


def test_fuzzy_join_across_relations(spark):
    left = spark.createDataFrame(
        [(1, "spark"), (2, "flink"), (3, None)], ["doc_id", "s"]
    )
    right = spark.createDataFrame(
        [(10, "sparc"), (11, "spark"), (12, "blink"), (13, "trino")],
        ["doc_id", "s"],
    )
    got = sorted(
        (r["id_l"], r["id_r"], r["dist"])
        for r in fuzzy_join(left, right, "s", max_dist=1).collect()
    )
    assert got == [(1, 10, 1), (1, 11, 0), (2, 12, 1)]


def test_fuzzy_pairs_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 7}x") for i in range(50)], ["doc_id", "s"]
    )
    out = fuzzy_pairs(df, "s", max_dist=1)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_deletion_variants_validation(spark):
    with pytest.raises(ValueError):
        deletion_variants("s", 3)


def test_novelty_scores_planted(spark):
    """Planted: doc 1 and 2 identical (novelty 0), doc 3 disjoint
    (novelty 1), doc 4 half-overlapping with 3, doc 5 too short."""
    from syzgydb_spark.operators.dedup import novelty_scores

    t_ab = "a b c d e f g h"          # docs 1,2: all shingles shared
    t_c = "p q r s t u v w"           # doc 3: shares tail with doc 4
    t_d = "s t u v w x y z"           # doc 4: 'stuvw' window overlaps 3
    rows = [(1, t_ab), (2, t_ab), (3, t_c), (4, t_d), (5, "too short")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in novelty_scores(df, shingle_n=5).collect()}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    # doc 3: 4 shingles, one ('s t u v w') also in doc 4 -> 3/4
    assert out[3]["novelty"] == 0.75 and out[4]["novelty"] == 0.75
    assert out[5]["n_shingles"] == 0 and out[5]["novelty"] is None
    # hashed and string forms agree
    got_str = {
        r["doc_id"]: r["novelty"]
        for r in novelty_scores(df, shingle_n=5, hash_shingles=False).collect()
    }
    assert got_str == {k: v["novelty"] for k, v in out.items()}
