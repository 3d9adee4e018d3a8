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


def test_every_contract_query_is_scalable(registry_dfs):
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
        # TF-IDF joins the 1-row doc-count relation (with the max_df
        # bound as a non-equi condition on that single row); perplexity
        # banding inherits the LM scorer's 1-row OOV-mass join
        "tfidf_top_terms": {"cartesian"},
        "perplexity_bands": {"cartesian"},
        # negative mining broadcasts the anchor set BY CONSTRUCTION
        # (dimension-table pattern, same contract as knn_join_topk)
        "hard_negatives": {"cartesian"},
        # MMR re-ranks the bounded top-20-per-anchor candidate relation
        # produced by the brute knn_join baseline (broadcast product)
        "mmr_rerank": {"cartesian"},
        # the MG merge's 1-row (cut, dec_total) scalar joins
        "frequent_terms": {"cartesian"},
        # same bounded MG merge, read back through the compacted store
        "mg_compacted_counts": {"cartesian"},
        # the decile cumsum window is global BY CONSTRUCTION over a
        # bounded relation (the folded summary, ≤ capacity rows —
        # never the corpus; same class as hybrid_rank_fusion)
        "len_quantile_sketch": {"global_window"},
    }
    failures = []
    for name, df in registry_dfs.items():
        try:
            assert_scalable(df, allow=allow.get(name, set()))
        except AssertionError as e:
            failures.append(f"{name}: {str(e).splitlines()[1]}")
    assert not failures, "\n".join(failures)


def test_scan_splits_estimate_row_group_bounded(spark, tmp_path):
    """A big single-row-group parquet file is ONE task at any
    maxPartitionBytes (row groups are parquet's minimum split unit);
    the estimator must not report byte-derived splits it cannot have.
    The same bytes in many row groups report many splits."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from syzgydb_spark.session import scan_splits_estimate

    rng = np.random.default_rng(7)
    # ~12 MB incompressible payload >> the 4m default split size
    payload = [rng.bytes(6000) for _ in range(2000)]
    table = pa.table({"id": pa.array(range(2000)), "blob": pa.array(payload, pa.binary())})
    one = str(tmp_path / "one_group.parquet")
    many = str(tmp_path / "many_groups.parquet")
    pq.write_table(table, one, row_group_size=1_000_000)
    pq.write_table(table, many, row_group_size=250)
    assert scan_splits_estimate(spark.read.parquet(one)) == 1
    assert scan_splits_estimate(spark.read.parquet(many)) >= 3


def test_narrow_scan_finding(spark, tmp_path):
    """scale_report warns when file sources cap scan parallelism below
    half the cores on a non-trivial input — and stays silent for small
    tables (one task is their nature)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from syzgydb_spark.plans.advisor import scale_report

    rng = np.random.default_rng(11)
    payload = [rng.bytes(9000) for _ in range(4200)]  # ~38 MB, incompressible
    table = pa.table({"id": pa.array(range(4200)), "blob": pa.array(payload, pa.binary())})
    big = str(tmp_path / "big_one_group.parquet")
    pq.write_table(table, big, row_group_size=1_000_000)
    kinds = {f["kind"] for f in scale_report(spark.read.parquet(big))["findings"]}
    assert "narrow_scan" in kinds
    small = str(tmp_path / "small.parquet")
    pq.write_table(pa.table({"id": pa.array(range(10))}), small)
    kinds2 = {f["kind"] for f in scale_report(spark.read.parquet(small))["findings"]}
    assert "narrow_scan" not in kinds2
