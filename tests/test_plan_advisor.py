"""plans.advisor: the mechanical "would this survive 100×?" audit.

Unit cases pin each detector on a known-bad plan; the sweep then runs
``assert_scalable`` over EVERY contract query — a strictly stronger
version of the no-cartesian blanket gate: no global windows, no
row-at-a-time Python, no unbroadcast products anywhere in the engine's
public query surface.
"""

import pytest
from pyspark.sql import functions as F, Window
from pyspark.sql.types import LongType

import __spark_entry__ as E
from syzgydb_spark.plans import assert_scalable, scale_report


def _kinds(report):
    return [(f["severity"], f["kind"]) for f in report["findings"]]


def test_detects_cartesian(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = scale_report(emb.crossJoin(docs))
    assert ("error", "cartesian") in _kinds(r)
    with pytest.raises(AssertionError, match="cartesian"):
        assert_scalable(emb.crossJoin(docs))
    # waivable where the shape is intended
    assert_scalable(emb.crossJoin(docs), allow={"cartesian"})


def test_detects_global_window_but_not_partitioned(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.withColumn("r", F.row_number().over(Window.orderBy("doc_id")))
    assert ("error", "global_window") in _kinds(scale_report(bad))
    good = docs.withColumn(
        "r", F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    )
    assert ("error", "global_window") not in _kinds(scale_report(good))
    assert scale_report(good)["n_shuffles"] == 1


def test_detects_row_python_but_not_arrow(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    u = F.udf(lambda x: x + 1, LongType())
    assert ("error", "python_row_eval") in _kinds(
        scale_report(docs.select(u("doc_id")))
    )

    @F.pandas_udf("long")
    def pu(s):
        return s + 1

    kinds = _kinds(scale_report(docs.select(pu("doc_id"))))
    assert ("error", "python_row_eval") not in kinds
    assert ("info", "python_arrow") in kinds


def test_detects_unpushed_filter(spark, sf_dir):
    # an earlier module may have cached this relation — a cached scan
    # (InMemoryTableScan) has no PushedFilters line at all, which is
    # out of scope for the detector
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # length()+mod is not a pushable predicate → Filter directly over a
    # scan with PushedFilters: []
    bad = docs.where(F.length("text") % 7 == 3)
    assert ("warn", "unpushed_filter") in _kinds(scale_report(bad))
    good = docs.where(F.col("doc_id") > 5)
    assert ("warn", "unpushed_filter") not in _kinds(scale_report(good))


def test_every_contract_query_is_scalable(spark, sf_dir):
    """Blanket gate: assert_scalable over the whole queries() surface.
    Allows mirror the documented intended shapes: the brute-force KNN
    baseline IS a broadcast product; the single-row constants joins
    (BM25 corpus stats, LM normalizer, DSIR totals, mixture weights)
    plan as 1-row BroadcastNestedLoopJoins."""
    allow = {
        "knn_join_topk": {"cartesian"},
        "bm25_search": {"cartesian"},
        # RRF's final fused-rank window is global BY CONSTRUCTION over a
        # bounded relation (the union of two top-k lists, ≤ 2k rows)
        "hybrid_rank_fusion": {"cartesian", "global_window"},
        "lm_perplexity": {"cartesian"},
        "bigram_perplexity": {"cartesian"},
        "dsir_weights": {"cartesian"},
        "mixture_plan": {"cartesian"},
        "temperature_mixture": {"cartesian"},
    }
    failures = []
    for name, fn in E.queries().items():
        try:
            assert_scalable(fn(spark, sf_dir), allow=allow.get(name, set()))
        except AssertionError as e:
            failures.append(f"{name}: {str(e).splitlines()[1]}")
    assert not failures, "\n".join(failures)
