"""keep_best compaction, hard-negative mining, char entropy."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.functions.text import char_entropy
from syzgydb_spark.operators.dedup import keep_best
from syzgydb_spark.operators.mining import hard_negatives
from syzgydb_spark.plans import assert_scalable


# ------------------------------------------------------------ keep_best

def test_keep_best_picks_max_score_min_id(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 7)],
        "doc_id long, n_chars long",
    )
    # cluster {1,2,3} via transitive edges; 4 and 9 are singletons
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    rows = {r["group_id"]: r for r in keep_best(docs, pairs, "n_chars").collect()}
    assert rows[1]["kept_doc_id"] == 2          # max score 30, tie → min id
    assert rows[1]["group_size"] == 3
    assert rows[4]["kept_doc_id"] == 4 and rows[4]["group_size"] == 1
    assert rows[9]["kept_doc_id"] == 9
    assert len(rows) == 3


def test_keep_best_min_value_id_exact(spark):
    """Ids at the integer type's MIN_VALUE: the struct-max fast path
    bit-complements (~x = -x-1, order-reversing over the FULL domain)
    instead of negating, so MIN_VALUE never overflows — a score tie
    against MIN_VALUE keeps MIN_VALUE (the lowest id), where negation
    overflowed back to MIN_VALUE and kept the wrong member."""
    lo = -(1 << 63)                                  # Long.MIN_VALUE
    docs = spark.createDataFrame(
        [(lo, 10), (5, 10), (6, 3)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame([(lo, 5), (5, 6)], "id_a long, id_b long")
    rows = keep_best(docs, pairs, "n_chars").collect()
    assert len(rows) == 1
    assert rows[0]["kept_doc_id"] == lo              # tie -> lowest id
    assert rows[0]["group_size"] == 3


def test_keep_best_all_null_score_group_branch_parity(spark):
    """A group whose scores are ALL null violates the documented
    non-null contract; both branches must degrade identically: the
    group is emitted with its lowest id as keeper. Scores are chosen
    so numeric and lexicographic order coincide, making the string
    cast a faithful fallback-branch probe."""
    rows = [(1, "3"), (2, "5"), (3, None), (4, None), (9, "7")]
    docs_str = spark.createDataFrame(rows, "doc_id long, n_chars string")
    docs_num = docs_str.withColumn("n_chars", F.col("n_chars").cast("long"))
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    fast = {r["group_id"]: (r["kept_doc_id"], r["group_size"])
            for r in keep_best(docs_num, pairs, "n_chars").collect()}
    slow = {r["group_id"]: (r["kept_doc_id"], r["group_size"])
            for r in keep_best(docs_str, pairs, "n_chars").collect()}
    assert fast == slow
    assert fast[3] == (3, 2)                         # all-null group kept
    assert fast[1] == (2, 2) and fast[9] == (9, 1)   # normal groups


def test_keep_best_plan_is_window_free(spark):
    docs = spark.createDataFrame(
        [(i, i % 7) for i in range(50)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 20, 2)], "id_a long, id_b long"
    )
    out = keep_best(docs, pairs, "n_chars")
    assert_scalable(out)                         # no global window, no product
    assert "Window" not in out._jdf.queryExecution().executedPlan().toString()


# -------------------------------------------------------- hard_negatives

@pytest.fixture(scope="module")
def labeled_vecs(spark):
    # label 0 vectors hug the origin; label 1 vectors sit farther out
    rows = [(i, [float(i), 0.0], i % 2) for i in range(20)]
    return spark.createDataFrame(rows, "id long, vector array<double>, label int")


def test_hard_negatives_excludes_same_label(spark, labeled_vecs):
    anchors = spark.createDataFrame(
        [(100, [0.0, 0.0], 0)],
        "query_id long, query_vector array<double>, query_label int",
    )
    res = hard_negatives(
        labeled_vecs, anchors, k=4, method="euclidean"
    ).collect()
    assert len(res) == 4
    assert all(r["label"] == 1 for r in res)     # only mismatched labels
    # the 4 nearest odd ids to the origin, ranked among eligible only
    assert [r["id"] for r in res] == [1, 3, 5, 7]


def test_hard_negatives_fills_k_past_positives(spark, labeled_vecs):
    """Nearest rows share the anchor's label — a filter-after-topk
    would under-fill; ranking among eligible candidates must not."""
    anchors = spark.createDataFrame(
        [(200, [0.0, 0.0], 1)],
        "query_id long, query_vector array<double>, query_label int",
    )
    res = hard_negatives(labeled_vecs, anchors, k=3, method="euclidean").collect()
    assert [r["id"] for r in res] == [0, 2, 4]


def test_hard_negatives_exclude_pairs(spark, labeled_vecs):
    anchors = spark.createDataFrame(
        [(100, [0.0, 0.0], 0)],
        "query_id long, query_vector array<double>, query_label int",
    )
    known = spark.createDataFrame([(100, 1), (100, 5)], "query_id long, id long")
    res = hard_negatives(
        labeled_vecs, anchors, k=3, method="euclidean", exclude_pairs=known
    ).collect()
    assert [r["id"] for r in res] == [3, 7, 9]


# ------------------------------------------------------------ mmr_rerank

def test_mmr_rerank_breaks_up_near_copies(spark):
    """Two tight clusters of candidates: plain top-3 by relevance is
    all cluster A; MMR alternates clusters after the first pick."""
    from syzgydb_spark.operators.mining import mmr_rerank

    rows = [
        # cluster A near (1, 0): slightly decreasing relevance
        (7, 1, [1.0, 0.0], 0.99),
        (7, 2, [0.999, 0.001], 0.98),
        (7, 3, [0.998, 0.002], 0.97),
        # cluster B near (0, 1): lower relevance but diverse
        (7, 4, [0.0, 1.0], 0.80),
        (7, 5, [0.001, 0.999], 0.79),
    ]
    cand = spark.createDataFrame(
        rows, "query_id long, id long, vector array<double>, relevance double"
    )
    got = {
        r["mmr_rank"]: r["id"]
        for r in mmr_rerank(cand, k=3, lambda_=0.5).collect()
    }
    assert got[1] == 1                 # best relevance first
    assert got[2] == 4                 # then the diverse cluster
    assert got[3] == 2                 # back to A (B now penalized too)


def test_mmr_rerank_k_bounded_and_deterministic(spark):
    from syzgydb_spark.operators.mining import mmr_rerank

    rows = [(1, i, [float(i), 1.0], 0.5) for i in range(4)]   # equal relevance
    cand = spark.createDataFrame(
        rows, "query_id long, id long, vector array<double>, relevance double"
    )
    out = mmr_rerank(cand, k=10, lambda_=0.7).collect()       # k > n → n rows
    assert len(out) == 4
    first = min(out, key=lambda r: r["mmr_rank"])
    assert first["id"] == 0                                   # tie → min id


# --------------------------------------------------- leakage_safe_split

def test_leakage_safe_split_groups_stay_together(spark):
    from syzgydb_spark.operators.sharding import hash_split, leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # clusters {0..4} (chain) and {10,11}; everything else edge-free
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 200
    # every cluster member shares one split and one group_id
    assert len({rows[i]["split"] for i in range(5)}) == 1
    assert {rows[i]["group_id"] for i in range(5)} == {0}
    assert rows[10]["split"] == rows[11]["split"]
    # edge-free docs: identical assignment to plain hash_split
    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    clustered = {0, 1, 2, 3, 4, 10, 11}
    for i in range(200):
        if i not in clustered:
            assert rows[i]["split"] == plain[i], i
    # weights roughly respected over the singleton mass
    from collections import Counter

    c = Counter(rows[i]["split"] for i in range(200) if i not in clustered)
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_unicode_clean(spark):
    """NFC composition, invisible strip, whitespace collapse — and the
    dedup consequence: byte-different encodings of one string share a
    fingerprint after cleaning."""
    from syzgydb_spark.functions.text import fingerprint, unicode_clean

    rows = [
        (0, "cafe\u0301 time"),            # decomposed -> café
        (1, "caf\u00e9 time"),             # precomposed — same meaning
        (2, "zero\u200bwidth\u200c gone"),
        (3, "bell\x07 and\t\ttabs  runs"),
        (4, None),
        (5, "北京 ok"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {r["i"]: r["c"] for r in df.select("i", unicode_clean("t").alias("c")).collect()}
    assert got[0] == got[1] == "caf\u00e9 time"
    assert got[2] == "zerowidth gone"
    assert got[3] == "bell and tabs runs"
    assert got[4] is None
    assert got[5] == "北京 ok"                     # CJK untouched
    fps = df.where("t IS NOT NULL").select(
        fingerprint(unicode_clean("t")).alias("fp"), "i"
    ).collect()
    by_i = {r["i"]: r["fp"] for r in fps}
    assert by_i[0] == by_i[1]                     # encodings now dedup together


def test_duplicate_groups_converges_on_long_chains(spark):
    """A CHAIN of sliding near-copies has component diameter = n;
    plain min-label propagation needed O(n) rounds and blew the
    25-round budget at n > 25 — the pointer-jumping (path-halving)
    step makes convergence O(log n) on any component shape."""
    from syzgydb_spark.operators.dedup import duplicate_groups

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "id_a long, id_b long"
    )
    rows = duplicate_groups(pairs).collect()
    assert len(rows) == 301
    assert {r["group_id"] for r in rows} == {0}


# --------------------------------------------------------- char_entropy

def test_char_entropy_matches_reference(spark):
    texts = ["hello world", "", None, "aaaa", "abab", "The quick brown fox."]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {r["i"]: r["e"] for r in df.select("i", char_entropy("t").alias("e")).collect()}

    def ref(t):
        if not t:
            return 0.0
        c, n = Counter(t), len(t)
        return -sum((v / n) * math.log2(v / n) for _, v in sorted(c.items()))

    for i, t in enumerate(texts):
        assert got[i] == pytest.approx(ref(t or ""), abs=1e-12), (i, t)
    assert got[4] == pytest.approx(1.0)          # two equiprobable symbols


def test_char_entropy_arrow_matches_catalyst(spark, sf_dir):
    """The Arrow kernel (default, oracle-exact: C log2 like DuckDB)
    and the pure-Catalyst HOF variant (Java log2 = ln/ln2 — off by a
    last ulp on ~20% of docs) agree to 1e-12 on real documents; the
    rounded-6dp contract values are identical."""
    from syzgydb_spark.functions.text import char_entropy_expr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    both = docs.select(
        char_entropy("text").alias("a"), char_entropy_expr("text").alias("b")
    )
    assert both.where(F.abs(F.col("a") - F.col("b")) > 1e-12).count() == 0
    assert both.where(F.round("a", 6) != F.round("b", 6)).count() == 0
    assert_scalable(both)

    out = docs.select("doc_id", char_entropy("text").alias("e"))
    assert_scalable(out)                         # Arrow-batched, not row-python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    expr_plan = (
        docs.select(char_entropy_expr("text"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in expr_plan             # the SQL-only variant stays JVM-side
