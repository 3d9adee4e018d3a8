"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (filtered KNN through the
filter language) at sf0.001. ``queries()`` exposes one callable per
implemented operator from SURVEY.md §2 plus the north-star pipeline
operators; ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible one. Column names/types are aligned pairwise; float
distances are rounded to 6 dp on both sides; double aggregates go
through exact DECIMAL sums and are cast back to DOUBLE.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from syzgydb_spark.cache import carry_cached as _carry
from syzgydb_spark.functions import text as TX
from syzgydb_spark.operators import dedup as DD
from syzgydb_spark.operators.knn import knn_join, search
from syzgydb_spark.operators.lsh import LshIndex
from syzgydb_spark.query.compiler import where_filter


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # older testdata generations carried TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects without this conf; current
        # data is TIMESTAMP(µs), where the conf is a no-op (none of the
        # oracle queries use ts — streaming converts explicitly)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


_R = 6  # rounding for float distances in oracle-compared outputs


# --------------------------------------------------------------------
# core vector-search surface (SURVEY §2.1, §2.5, §2.7)
# --------------------------------------------------------------------

def q_knn_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    res = search(emb, _query_vec(spark, sf_dir), k=10, method="euclidean")
    return res.select("id", F.round("distance", _R).alias("distance"))


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    res = search(emb, _query_vec(spark, sf_dir), k=10, method="cosine")
    return res.select("id", F.round("distance", _R).alias("distance"))


def q_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    res = search(emb, _query_vec(spark, sf_dir), radius=1.3, method="euclidean")
    return res.select("id", F.round("distance", _R).alias("distance"))


def q_knn_filtered_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-filtered KNN with the filter *language* in the loop: the
    label column is packed into JSON metadata and filtered with
    ``label IN [1,3,5]`` (reference pre-filter semantics,
    collection.go:592)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vector"),
        F.to_json(F.struct("label")).alias("metadata"),
    )
    res = search(
        emb, _query_vec(spark, sf_dir), k=10, method="euclidean",
        filter="label IN [1, 3, 5]",
    )
    return res.select("id", F.round("distance", _R).alias("distance"))


def q_knn_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    data = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    res = knn_join(data, queries, k=5, method="euclidean")
    return res.select("query_id", "id", F.round("distance", _R).alias("distance"))


def q_listing_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("label").cast("long").alias("label")
    )
    return search(emb, None, offset=100, limit=50)


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 123)
        .select(
            F.col("vec_id").alias("id"),
            F.col("label").cast("long").alias("label"),
            F.size("embedding").cast("long").alias("dims"),
        )
    )


def q_collection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "embeddings").agg(
        F.count("*").alias("doc_count"),
        F.max(F.size("embedding")).cast("long").alias("dims"),
        F.countDistinct("label").cast("long").alias("labels"),
    )


# --------------------------------------------------------------------
# filter language over JSON metadata (SURVEY §2.2)
# --------------------------------------------------------------------

def q_filter_lang_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "metadata", F.to_json(F.struct("event_type", "value"))
    )
    return where_filter(ev, "event_type == 'click' AND value > 50").select("event_id")


def q_filter_lang_in_or_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "metadata", F.to_json(F.struct("event_type", "value"))
    )
    return where_filter(
        ev, "event_type IN ['view', 'signup'] OR event_type CONTAINS 'err'"
    ).select("event_id")


def q_filter_lang_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter straight over the schemaless props JSON column."""
    ev = _t(spark, sf_dir, "events")
    return where_filter(ev, "k >= 50 AND k < 80", "props").select("event_id", "user_id")


def q_filter_lang_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "metadata", F.to_json(F.struct("event_type"))
    )
    return where_filter(ev, "event_type MATCHES '^(click|view)$'").select("event_id")


# --------------------------------------------------------------------
# relational superset (free with DataFrames; validated vs oracle)
# --------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. Sums go through exact DECIMAL to be engine-
    reproducible, then back to DOUBLE."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(8,4)")
    tax = F.col("l_tax").cast("decimal(8,4)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1).cast("decimal(8,4)") - disc)).cast("double").alias("sum_disc_price"),
            F.sum(
                price * (F.lit(1).cast("decimal(8,4)") - disc) * (F.lit(1).cast("decimal(8,4)") + tax)
            ).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg; nation/region are broadcast-size dims."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "o_custkey", "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def q_events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


def q_segment_customers_setop(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    with_open_orders = (
        orders.where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return building.intersect(with_open_orders)


def q_orders_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.where(
            (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⋈ date-filtered orders
    ⋈ ship-date-filtered lineitem, revenue agg per order, top-10 by
    revenue. All three filters reach the parquet scans (pushdown);
    Catalyst/AQE pick the join order and the final top-10 is a
    TakeOrderedAndProject, never a global sort. Revenue sums through
    exact DECIMAL so the result is aggregation-order-free."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity crosses a
    threshold, joined back to customer. The HAVING-filtered aggregate
    is tiny relative to lineitem (215 rows at sf0.01), so AQE turns
    the orders-side join into a broadcast at runtime; the quantity sum
    is exact DECIMAL (order-free)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty"))
        .where(F.col("_qty") >= 250)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").alias("totalprice"),
            F.col("_qty").cast("double").alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------
# training-data pipeline operators (north star)
# --------------------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count("text").cast("long").alias("n_tokens"),
        F.size(TX.word_tokens("text")).cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return DD.exact_duplicates(docs).select(
        "doc_id", "fp", "group_min_id", F.col("group_size").cast("long").alias("group_size")
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    res = DD.ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.5)
    return _carry(
        res.select("id_a", "id_b", F.round("jaccard", _R).alias("jaccard")), res
    )


def q_emb_cosine_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs blocked on label equality — the
    oracle-checkable sibling of the LSH-blocked variant. One groupBy +
    per-block BLAS distance matrix (blocked_cosine_pairs): no join, no
    N² Arrow rows, no per-pair interpreted HOF (which was 15% of the r1
    bench wall). Matches the expression-form oracle at 6 dp."""
    emb = _t(spark, sf_dir, "embeddings")
    res = DD.blocked_cosine_pairs(
        emb, "embedding", "vec_id", "label", max_distance=0.41
    )
    return res.select("id_a", "id_b", F.round("distance", _R).alias("distance"))


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup pairs via hyperplane-LSH bucketing +
    exact verify — the scale path (headline bench member, VERDICT r2
    #4): candidate pairs come from seeded signature buckets whose size
    does NOT grow with N, unlike the label-blocked exact sibling
    (q_emb_cosine_pairs_blocked, kept as a small-SF oracle fixture of
    the bounded-block contract). The oracle replays the same seeded
    planes as SQL literals, the same any-table signature match, and
    the same exact cosine cut."""
    res = DD.embedding_near_duplicates(
        _t(spark, sf_dir, "embeddings"),
        "embedding",
        "vec_id",
        max_distance=0.41,
        dim=64,
        num_tables=8,
        num_planes=12,
        seed=42,
    )
    return res.select("id_a", "id_b", F.round("distance", _R).alias("distance"))


def q_events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each view event picks up the most recent prior (or
    same-instant) purchase value of its user. Union + one partitioned
    window — ONE shuffle on user_id, no range explosion (the naive
    l.ts >= r.ts range join is O(|L|·|R|) per key). The right side is
    pre-deduped to one row per (user, ts) so the latest-match is
    well-defined on both engines."""
    from syzgydb_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    res = asof_join(views, purchases, on="user_id", ts="ts", right_cols=["pval"])
    return res.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        F.round("pval_r", _R).alias("purchase_value"),
    )


def q_events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style tumbling rollup: daily buckets per event_type
    with count/sum/avg — map-side partial agg, one narrow shuffle row
    per (bucket, type). Oracle: DuckDB time_bucket (both engines align
    day buckets to the epoch)."""
    from syzgydb_spark.operators.temporal import time_rollup

    ev = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    res = time_rollup(
        ev,
        ts="ts",
        bucket="1 day",
        group_by=["event_type"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "sum_value": F.round(F.sum("value"), _R),
            "avg_value": F.round(F.avg("value"), _R),
        },
    )
    return res.select(
        F.unix_micros("bucket_start").alias("bucket_us"),
        "event_type",
        "n_events",
        "sum_value",
        "avg_value",
    )


def q_events_range_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: clicks by the same user within ±5 minutes of
    each error event, counted per error. The band is bucketed at its
    own width, so the plan is an equi-join on (user, time-bucket) with
    an exact filter — never the O(|L|·|R|)-per-key theta-join a naive
    BETWEEN join executes."""
    from syzgydb_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    six_hours = 6 * 3600 * 1_000_000
    res = range_join(
        errors, clicks, on="user_id", ts="ts",
        lower_us=-six_hours, upper_us=six_hours, right_cols=["click_id"],
    )
    return res.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_nearby_clicks")
    )


def q_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rule set (Rae et al. 2021 §A1.1) as one zero-
    shuffle projection: per-rule measurements + booleans + the
    conjunction, every value replayed by the DuckDB oracle."""
    from syzgydb_spark.operators.quality import gopher_filters

    return gopher_filters(
        _t(spark, sf_dir, "documents"), min_words=30, min_stopwords=1
    )


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (line-level terminal-punctuation + min-words
    filter, page-level lorem/brace/min-sentence flags) as one
    zero-shuffle projection with every outcome oracle-replayed."""
    from syzgydb_spark.operators.quality import c4_clean

    # the synthetic corpus has no line structure, so the fixture plants
    # some (same pattern as the planted-span queries): every 3rd doc
    # gains a terminal period, every 5th a code brace
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(". And one more thing."))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" {"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return c4_clean(docs, min_sentences=1)


_BM25_QUERY = "table scan merge window hash"


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 over documents, served from the PERSISTED
    bucketed posting store — the shape a retrieval deployment actually
    runs (index built once at write time; per-query scoring reads only
    the probed terms' buckets, store side shuffle-free). The store is
    built on first use per sf_dir; subsequent calls (a serving loop,
    the bench's warm passes) pay only the scoring plan: term-bucket
    scan → per-term df agg on the bucketed layout → broadcast
    constants → per-doc agg → TakeOrdered. Corpus constants broadcast
    as a single-row relation (no driver collect)."""
    import re as _re

    from syzgydb_spark.operators.bm25 import (
        bm25_score,
        build_bm25_store,
        read_bm25_store,
    )

    store = "bm25_docs_" + _re.sub(r"\W+", "_", sf_dir).strip("_")
    if not spark.catalog.tableExists(f"{store}_postings"):
        build_bm25_store(_t(spark, sf_dir, "documents"), store)
    postings, stats = read_bm25_store(spark, store)
    res = bm25_score(postings, stats, _BM25_QUERY, k=10)
    return _carry(res.select("doc_id", F.round("score", _R).alias("score")), res)


def q_hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two bounded ANN candidate lists
    (euclidean top-20 and cosine top-20 for the same query vector) —
    the hybrid-retrieval composition pattern; the single-partition
    rank windows see only the pre-truncated k rows."""
    from syzgydb_spark.operators.bm25 import reciprocal_rank_fusion

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("vector")
    )
    qv = _query_vec(spark, sf_dir, 0)
    eu = search(emb, qv, k=20, method="euclidean", id_col="doc_id")
    co = search(emb, qv, k=20, method="cosine", id_col="doc_id")
    res = reciprocal_rank_fusion(
        [(eu, "distance", True), (co, "distance", True)], top=10
    )
    return res.select("doc_id", F.round("rrf_score", _R).alias("rrf_score"))


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection: per doc, each 4-window
    of 5-gram hashes contributes its rightmost-minimal hash — shared
    substrings of ≥ 8 tokens guarantee a common fingerprint, so
    overlap detection is an equi-join on fp. Entirely HOF expressions;
    the min-then-rightmost-position formulation replays as list
    functions in DuckDB."""
    from syzgydb_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(
        _t(spark, sf_dir, "documents"), k=5, window=4
    )


def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact word-count quantiles (p50/p90/p99, type-7
    interpolation on both engines) + min/max/mean — the sorted-agg
    shape mixture curation reads to budget chunking/packing."""
    from syzgydb_spark.operators.quality import length_quantiles

    return length_quantiles(_t(spark, sf_dir, "documents"))


def q_media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, oracle-checked end-to-end: documents pack
    as media structs (text bytes as payload, duration = char length),
    then the mapInPandas frame sampler emits one row per 500ms frame
    with its deterministic seed (md5-derived — replayable in SQL). The
    bytes themselves never shuffle; only (doc_id, frame_ts, seed) come
    out of the Python stage — the exact shape a real video pipeline
    has, with the codec swapped for the documented stub."""
    from syzgydb_spark.operators.multimodal import pack_media, sample_frames

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        pack_media(
            F.col("text").cast("binary"),
            F.lit("video/fake"),
            duration_ms=F.length("text").cast("bigint"),
        ).alias("media"),
    )
    return sample_frames(docs, every_ms=500, id_cols=["doc_id"])


# ---- non-SQL-expressible (driver records rows-only checks) ----

def q_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate groups (connected components by iterative
    min-label propagation) over the exact n-gram Jaccard pairs; the
    DuckDB oracle walks the same edges with a recursive CTE."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.5)
    return DD.duplicate_groups(pairs)


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures with md5-derived base hashes — bit-for-bit
    reproducible by the DuckDB oracle (the pipeline default uses
    xxhash64, which only Spark has)."""
    docs = _t(spark, sf_dir, "documents")
    sig = DD.minhash_signature(
        "text", num_hashes=32, shingle_n=2, seed=42, hash_fn="md5"
    )
    return docs.select(
        "doc_id",
        F.when(sig.isNotNull(), F.concat_ws(",", sig.cast("array<string>"))).alias("sig"),
    )


def q_simhash_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash with md5 token hashes — DuckDB-reproducible."""
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash(docs, bits=48, hash_fn="md5")


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID — pure Catalyst, reproduced exactly by the
    DuckDB oracle (same stopword lists, tokenizer, CJK override)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.language_id("text").alias("lang_pred"))


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash LSH with md5-derived base hashes: every stage —
    signature fold, band keys, hashed-shingle Jaccard verify — is
    reproduced bit-for-bit by the DuckDB oracle."""
    docs = _t(spark, sf_dir, "documents")
    res = DD.minhash_near_duplicates(
        docs, num_hashes=64, bands=16, shingle_n=2, threshold=0.5, hash_fn="md5"
    )
    return _carry(
        res.select("id_a", "id_b", F.round("jaccard", _R).alias("jaccard")), res
    )


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit md5 SimHash, pigeonhole chunk join (4 chunks > max_hamming
    3), bit_count(xor) verify — DuckDB-reproducible end to end."""
    docs = _t(spark, sf_dir, "documents")
    res = DD.simhash_near_duplicates(docs, max_hamming=3, bits=48, hash_fn="md5")
    return _carry(
        res.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming")),
        res,
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document."""
    from syzgydb_spark.operators.quality import repetition_stats

    docs = _t(spark, sf_dir, "documents")
    res = repetition_stats(docs)
    return res.select(
        "doc_id",
        "n_tokens",
        F.round("distinct_token_ratio", _R).alias("distinct_token_ratio"),
        "top_bigram_count",
        "n_bigrams",
        F.round("top_bigram_frac", _R).alias("top_bigram_frac"),
    )


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) mixture accounting."""
    from syzgydb_spark.operators.quality import corpus_stats

    docs = _t(spark, sf_dir, "documents")
    res = corpus_stats(docs)
    return res.select(
        "lang", "source", "n_docs", "n_tokens", "n_chars",
        F.round("avg_tokens", _R).alias("avg_tokens"),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source sampling (md5 bucket, no RNG/shuffle)."""
    from syzgydb_spark.operators.quality import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    res = stratified_sample(
        docs, {"src0": 0.5, "src1": 0.25}, strata_col="source", default_rate=0.1
    )
    return res.select("doc_id", "source")


def q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs sharing an 8-gram with the
    held-out eval split (doc_id % 19 == 0)."""
    from syzgydb_spark.operators.contamination import ngram_contamination

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 19 != 0)
    eval_set = docs.where(F.col("doc_id") % 19 == 0)
    return ngram_contamination(train, eval_set, n=8).select(
        "train_id", "eval_id", "n_common"
    )


_DECON_PHRASE = (
    "zeta quark lattice boson entangle flux gauge parity spin chroma"
)


def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: every 11th train doc carries a
    planted benchmark phrase that every eval doc also carries; the
    operator cuts exactly the eval-overlapping token runs and keeps
    the rest of each document (doc-level dropping would discard the
    whole doc for one quoted line)."""
    from syzgydb_spark.operators.contamination import decontaminate_spans

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 19 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.col("text"), F.lit(" " + _DECON_PHRASE)),
        ).otherwise(F.col("text")).alias("text"),
    )
    eval_set = docs.where(F.col("doc_id") % 19 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" " + _DECON_PHRASE)).alias("text")
    )
    return decontaminate_spans(train, eval_set, n=8)


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents with planted PII (the synthetic corpus
    has none, so each row gets a doc_id-derived email/IP/phone appended
    — the oracle applies the identical construction, proving the
    Java-regex and RE2 scrub agree on every row)."""
    docs = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0."), F.col("doc_id").cast("string"),
        F.lit(".7 or +1 (555) 010-"), F.col("doc_id").cast("string"),
    )
    return docs.select("doc_id", TX.redact_pii(planted).alias("clean"))


def q_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 32-token windows, 8-token overlap."""
    docs = _t(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id",
        F.explode(TX.token_chunks("text", chunk_tokens=32, overlap=8)).alias("c"),
    )
    return ch.select(
        "doc_id",
        F.col("c.start").cast("long").alias("start"),
        F.col("c.n_tokens").cast("long").alias("n_tokens"),
        F.col("c.chunk").alias("chunk"),
    )


def q_sequence_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: global token-stream position of each
    document (bins of 256 tokens), via the two-pass distributed prefix
    scan (literal range boundaries + per-bucket windows + broadcast
    offsets)."""
    from syzgydb_spark.operators.packing import sequence_bins

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(TX.word_tokens("text")).cast("long").alias("n_tokens")
    )
    res = sequence_bins(docs, 256)
    return res.select("doc_id", "bin_id", F.col("bin_offset").cast("long").alias("bin_offset"))


def q_listing_lexicographic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact LISTING order: ids sorted as decimal
    strings ("10" < "2", spanfile.go:540-560) — W5 fully reproduced as
    an opt-in (numeric order stays the default)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("label").cast("long").alias("label")
    )
    res = search(emb, None, id_order="lexicographic", offset=10, limit=40)
    return res.select("id", "label")


def q_token_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture packing: accept documents per source until a 300-token
    budget (prefix mode — pure Catalyst window, SQL-reproducible; the
    greedy/streaming members of the family are tested in
    tests/test_quota.py)."""
    from syzgydb_spark.streaming.quota import token_quota_prefix

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(TX.word_tokens("text")).alias("n_tokens")
    )
    res = token_quota_prefix(docs, 300)
    return res.select("doc_id", "source", F.col("n_tokens").cast("long").alias("n_tokens"))


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: content-addressed md5 sort key →
    shard assignment + within-shard ordinal. Engine-portable (the
    oracle reproduces every key, shard and position bit-for-bit)."""
    from syzgydb_spark.operators.sharding import shard_positions

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    res = shard_positions(docs, n_shards=8, seed=42)
    return res.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.col("pos").cast("long").alias("pos"),
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: a synthetic 'new crawl' (every 3rd doc,
    re-idd, with every 6th doc's text modified) anti-joined against the
    standing corpus on normalized fingerprints — only the modified
    (genuinely new) texts survive. The oracle runs the identical
    construction + NOT EXISTS anti-join."""
    docs = _t(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.when(
            F.col("doc_id") % 6 == 0, F.concat(F.col("text"), F.lit(" modified"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return DD.dedup_against(new, docs).select("doc_id")


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication (Lee-et-al-style): docs in the same
    ``doc_id % 3`` group get the same planted 12-token phrase appended
    (every 7th doc), and the operator must report exactly those maximal
    token spans. The oracle replicates gram seeding, the distinct-doc
    predicate, and the islands merge in SQL."""
    docs = _t(spark, sf_dir, "documents")
    grp = (F.col("doc_id") % 3).cast("string")
    phrase = F.concat_ws(
        " ", *[F.concat(F.lit("g"), grp, F.lit(f"w{i}")) for i in range(12)]
    )
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" "), phrase)
        ).otherwise(F.col("text")).alias("text"),
    )
    res = DD.duplicate_spans(planted, gram_n=5, min_span_tokens=10)
    return _carry(
        res.select(
            "doc_id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            F.col("span_tokens").cast("long").alias("span_tokens"),
        ),
        res,
    )


def q_minhash_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup dedup: a synthetic new crawl (every 5th
    doc, re-idd; every 10th doc's text fully replaced with unique
    tokens, the rest perturbed by one appended token) is checked
    against the standing corpus with the banded MinHash join — only
    the replaced texts survive the 0.5-Jaccard gate. The md5 hash path
    makes every signature, band key and Jaccard value reproducible by
    the DuckDB oracle."""
    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    replacement = F.concat_ws(
        " ", F.lit("fresh"), F.lit("document"),
        *[F.concat(F.lit(c), i) for c in "uvwxyz"],
    )
    new = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.when(F.col("doc_id") % 10 == 0, replacement)
        .otherwise(F.concat("text", F.lit(" xq"), (F.col("doc_id") % 3).cast("string")))
        .alias("text"),
    )
    kept = DD.minhash_dedup_against(
        new, docs, num_hashes=64, bands=16, shingle_n=2,
        threshold=0.5, hash_fn="md5", impl="arrow",
    )
    return kept.select("doc_id")


def q_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-cut rewrite over the same planted corpus as
    q_duplicate_spans: one copy of each duplicated run survives (min
    doc id), the rest are cut and the text is rebuilt from the
    surviving tokens. The oracle replays spans → content fingerprint →
    keeper election → positional token filter in SQL."""
    docs = _t(spark, sf_dir, "documents")
    grp = (F.col("doc_id") % 3).cast("string")
    phrase = F.concat_ws(
        " ", *[F.concat(F.lit("g"), grp, F.lit(f"w{i}")) for i in range(12)]
    )
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" "), phrase)
        ).otherwise(F.col("text")).alias("text"),
    )
    res = DD.remove_duplicate_spans(planted, gram_n=5, min_span_tokens=10)
    return _carry(res.select("doc_id", "clean_text", "n_cut_spans"), res)


_BOILERPLATE_LINE = "PLEASE SUBSCRIBE TO OUR NEWSLETTER FOR THE LATEST UPDATES"


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact line dedup (RefinedWeb §3.2 / CCNet
    boilerplate-paragraph removal). The sf documents are single-line,
    so the fixture builds a line-structured corpus deterministically:
    each doc's own text, plus — for doc_id % 5 == 0 — the adjacent
    partner doc's text as a second line (a planted cross-document
    duplicate), plus — for doc_id % 3 == 0 — a shared boilerplate
    footer. Any line whose trimmed content occurs >= 2 times in the
    corpus is removed from EVERY document; md5 hash path so DuckDB
    replays the count→mark→rebuild pipeline bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    partner = F.when(F.col("doc_id") % 2 == 0, F.col("doc_id") + 1).otherwise(
        F.col("doc_id") - 1
    )
    p = docs.select(F.col("doc_id").alias("_pid"), F.col("text").alias("_ptext"))
    corpus = (
        docs.select("doc_id", "text", partner.alias("_partner"))
        .join(p, F.col("_partner") == F.col("_pid"), "left")
        .select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.col("text"),
                F.when(F.col("doc_id") % 5 == 0, F.col("_ptext")),
                F.when(F.col("doc_id") % 3 == 0, F.lit(_BOILERPLATE_LINE)),
            ).alias("text"),
        )
    )
    return DD.line_dedup(
        corpus, min_count=2, min_line_chars=15, hash_fn="md5"
    ).select("doc_id", "clean_text", "n_lines", "n_removed_lines")


def q_pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization KNN join (pure ADC): the seeded Gaussian
    codebook is reproducible from the seed alone, so subspace encoding
    (argmin over codewords), the per-query lookup-table distances, and
    the top-k are all replayed bit-for-bit by the DuckDB oracle —
    same trick as the LSH plane literals. Quality (fitted codebook +
    exact re-rank) is recall-gated in tests/test_pq.py."""
    from syzgydb_spark.operators.pq import PqIndex

    emb = _t(spark, sf_dir, "embeddings")
    data = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("vector")
    )
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vector"),
    )
    idx = PqIndex.from_seed(64, m=8, k=16, seed=42)
    res = idx.adc_knn_join(data, queries, k=10)
    return res.select("query_id", "id", F.round("distance", _R).alias("distance"))


def q_ann_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate KNN join. The hyperplanes are seeded constants, so
    the whole pipeline — sign signatures, per-table bucket match, exact
    cosine re-rank, top-k — is reproduced bit-for-bit by the DuckDB
    oracle (plane literals + list_dot_product). Recall vs exact is
    additionally gated ≥0.9 in tests/test_lsh.py::test_ann_knn_join_recall
    (the reference's own criterion, collection_test.go:82-101)."""
    emb = _t(spark, sf_dir, "embeddings")
    data = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    idx = LshIndex(64, num_tables=5, num_planes=10, seed=42, method="cosine")
    res = idx.knn_join(data, queries, k=10)
    return res.select("query_id", "id", F.round("distance", _R).alias("distance"))


def _ivf_fixture_index():
    """The persisted coarse quantizer: 16 centers fitted ONCE with
    MLlib KMeans (seed 42) on the sf0.01 embeddings and checked in as
    fixtures/ivf_centers.json — the to_dict/from_dict persistence flow
    a Collection uses for its own index options. Constants make the
    whole IVF plan (cell assignment → probe → exact re-rank) replayable
    by the DuckDB oracle, exactly the PQ-codebook/LSH-plane trick."""
    import json

    from syzgydb_spark.operators.ivf import IvfIndex

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "ivf_centers.json")
    with open(path) as f:
        return IvfIndex.from_dict(json.load(f))


def _wordpiece_fixture_vocab():
    """The persisted subword vocabulary: BPE-fitted ONCE (60 merges,
    min_count=2) on the sf0.01 documents and checked in as
    fixtures/wordpiece_vocab.json — same persisted-fixture flow as the
    IVF centers, so the DuckDB oracle replays the greedy WordPiece
    segmentation from the identical constants."""
    import json

    from syzgydb_spark.operators.tokenizer import WordpieceVocab

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "wordpiece_vocab.json")
    with open(path) as f:
        return WordpieceVocab.from_dict(json.load(f))


def q_wordpiece_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-subword tokenization (BPE-fitted vocab, WordPiece
    greedy longest-match apply — the BERT scheme) over the documents
    table, exploded to (doc_id, pidx, piece) so the oracle checks
    every piece of every document. The fit is persisted (see
    _wordpiece_fixture_vocab); application is a zero-shuffle
    Arrow-batched map after a Catalyst word split."""
    from syzgydb_spark.operators.tokenizer import tokenize

    docs = _t(spark, sf_dir, "documents")
    out = tokenize(docs, _wordpiece_fixture_vocab(), "text")
    return out.select(
        "doc_id", F.posexplode("wp_tokens").alias("pidx", "piece")
    ).select("doc_id", F.col("pidx").cast("long").alias("pidx"), "piece")


def q_ivf_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (KMeans coarse-quantizer) KNN join, oracle-checked: the
    fitted centers are persisted constants (see _ivf_fixture_index), so
    DuckDB replays assignment, probing, and re-rank bit-for-bit.
    Recall@k vs exact of a freshly-fitted index is additionally gated
    in tests/test_ivf.py (reference criterion,
    collection_test.go:82-101)."""
    emb = _t(spark, sf_dir, "embeddings")
    data = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("vector")
    )
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vector"),
    )
    idx = _ivf_fixture_index()
    res = idx.knn_join(idx.with_cells(data), queries, k=10, n_probes=6)
    return res.select("query_id", "id", F.round("distance", _R).alias("distance"))


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality scoring (Wenzek et al. 2020): fit an
    add-0.5-smoothed unigram LM on the corpus (min_count=2 vocab),
    score every document's mean negative log-likelihood. Empty docs
    → NULL logppl. Engine-portable: same tokenizer, ln, and smoothing
    replay in DuckDB."""
    from syzgydb_spark.operators.quality import lm_perplexity, unigram_lm

    docs = _t(spark, sf_dir, "documents")
    lm = unigram_lm(docs, min_count=2, alpha=0.5)
    res = lm_perplexity(docs, lm)
    return res.select(
        "doc_id", "n_tokens", F.round("logppl", _R).alias("logppl")
    )


def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer interpolated bigram LM scoring (the KenLM-lite
    sharpening of the CCNet recipe): per-token
    p = 0.7*p_bi(cur|prev) + 0.3*p_uni(cur) for contexts retained by
    the min_count=2 bigram fit, plain unigram for first tokens and
    unseen contexts. Engine-portable: counts, one division, exp/ln."""
    from syzgydb_spark.operators.quality import (
        bigram_lm,
        bigram_perplexity,
        unigram_lm,
    )

    docs = _t(spark, sf_dir, "documents")
    uni = unigram_lm(docs, min_count=2, alpha=0.5)
    bi, ctx = bigram_lm(docs, min_count=2, return_contexts=True)
    res = bigram_perplexity(docs, bi, uni, lambda_=0.7, ctx_lm=ctx)
    return res.select(
        "doc_id", "n_tokens", F.round("logppl", _R).alias("logppl")
    )


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 terms per source with deterministic (count desc, term)
    ranking — vocabulary-sized window input, corpus-sized only in the
    map-side-combined count."""
    from syzgydb_spark.operators.quality import top_terms

    docs = _t(spark, sf_dir, "documents")
    res = top_terms(docs, 10, strata_col="source")
    return res.select("source", "term", "term_count", "term_rank")


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture allocation: src0 weighted 3x, src1 2x,
    every other source 1x, 50k-token budget — per-source sampling rate,
    planned tokens, and unmet deficit."""
    from syzgydb_spark.operators.quality import mixture_plan

    docs = _t(spark, sf_dir, "documents")
    res = mixture_plan(
        docs, {"src0": 3.0, "src1": 2.0}, 50_000, default_weight=1.0
    )
    return res.select(
        "source", "n_docs", "n_tokens",
        F.round("weight", _R).alias("weight"),
        F.round("target_tokens", _R).alias("target_tokens"),
        F.round("rate", _R).alias("rate"),
        F.round("planned_tokens", _R).alias("planned_tokens"),
        F.round("deficit", _R).alias("deficit"),
    )


def q_hashed_doc_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) document vectors, dim=16: the
    model-free text→vector bridge into the embedding-space operators.
    Arrow scatter-add kernel over the Catalyst token array (zero
    shuffle); md5 bucket/sign hashes make every component
    engine-portable.

    Output shape is (doc_id, component_idx, value) — the vector is
    posexploded to scalar rows because the driver's canonicalizer
    (pandas sort_values) cannot hash list-valued cells; same
    information, driver-hashable shape (r8 verdict #1).  The shape
    class is gated registry-wide in tests/test_oracle_types.py."""
    from syzgydb_spark.functions.text import hashed_embedding_batch

    docs = _t(spark, sf_dir, "documents")
    # Arrow twin of the expression form — same values BIT-FOR-BIT
    # (differential-tested in test_pipeline_ops.py::
    # test_hashed_embedding_batch_bit_parity, md5 branch, plus the
    # independent Python reference; re-proven by this entry's oracle
    # hash at sf0.01 and sf0.1), but O(tokens) with a
    # per-batch distinct-token md5 memo instead of the O(dim x tokens)
    # per-component fold: 1.45 s -> 0.43 s at sf0.1 (r10 A/B). The
    # DuckDB oracle replays the VALUES; the expression form remains
    # the pure-SQL reference (functions/text.py).
    vec = hashed_embedding_batch("text", dim=16, seed=42)
    return docs.select(
        "doc_id",
        F.posexplode(
            F.transform(vec, lambda x: F.round(x, _R))
        ).alias("component_idx", "value"),
    )


def _quality_clf_fixture():
    """The persisted quality-classifier coefficients: MLlib logistic
    regression over 256-dim hashed features, fitted ONCE on the
    sf0.01 documents (trusted class = a planted content signal) and
    checked in as fixtures/quality_clf.json — same persisted-constant
    flow as the IVF centers, so scoring replays exactly in SQL."""
    import json

    from syzgydb_spark.operators.classifier import QualityClassifier

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "quality_clf.json")
    with open(path) as f:
        return QualityClassifier.from_dict(json.load(f))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality-classifier scoring (the GPT-3/LLaMA-style
    quality filter shape): sigmoid(w · hashed(text) + b) with the
    persisted coefficients — one zero-shuffle codegen projection.
    keep is derived from the ROUNDED score so the float boundary is
    engine-portable."""
    from syzgydb_spark.operators.classifier import score_quality

    docs = _t(spark, sf_dir, "documents")
    out = score_quality(docs, _quality_clf_fixture(), decimals=_R)
    return out.select(
        "doc_id", "quality_score",
        (F.col("quality_score") >= 0.5).alias("keep"),
    )


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponent-smoothed (alpha=0.5) sampling plan: weights from the
    corpus's own per-source token shares raised to alpha — the
    multilingual-mixing rule — through the same rate/deficit algebra
    as mixture_plan. Rounded to 6 decimals so the pow/sum float math
    is engine-portable."""
    from syzgydb_spark.operators.quality import temperature_mixture_plan

    docs = _t(spark, sf_dir, "documents")
    res = temperature_mixture_plan(docs, 50_000, alpha=0.5)
    return res.select(
        "source", "n_docs", "n_tokens",
        F.round("weight", _R).alias("weight"),
        F.round("target_tokens", _R).alias("target_tokens"),
        F.round("rate", _R).alias("rate"),
        F.round("planned_tokens", _R).alias("planned_tokens"),
        F.round("deficit", _R).alias("deficit"),
    )


def q_stratified_fixed_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-source sample (k=20) via the two-phase
    count → candidate-filter → bounded-window design; md5-deterministic,
    so the oracle reproduces the exact row set."""
    from syzgydb_spark.operators.quality import stratified_fixed_sample

    docs = _t(spark, sf_dir, "documents")
    res = stratified_fixed_sample(docs, 20, strata_col="source", id_col="doc_id")
    return res.select("doc_id", "source", "sample_rank")


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events stream (6-hour idle gap,
    chosen so the synthetic per-user event cadence yields multi-event
    sessions): per-session start/end/count/duration. Lag + cumulative
    sum over one per-user window — ONE shuffle."""
    from syzgydb_spark.operators.temporal import session_stats

    ev = _t(spark, sf_dir, "events")
    res = session_stats(
        ev, key="user_id", ts="ts", gap="6 hours", tie_break=["event_id"]
    )
    return res.select(
        "user_id", "session_seq", "session_start", "session_end",
        F.col("n_events").cast("long").alias("n_events"), "duration_us",
    )


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) hashed-ngram importance weights with
    target = English documents: md5-bucket histograms of unigrams +
    bigrams for target vs raw, add-1 smoothing, per-doc summed log
    ratio. Deterministic and engine-portable, so DuckDB replays the
    histograms and weights bit-for-bit (rounded 6dp)."""
    from syzgydb_spark.operators.quality import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    res = dsir_weights(docs, F.col("lang") == "en", n_buckets=10_000, seed=42)
    return res.select("doc_id", "n_feats", F.round("logw", _R).alias("logw"))


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over the embeddings table, reusing
    the persisted IVF centers as the cluster fixture: argmin-cell
    assignment, centroid-similarity-ascending rank within each cluster
    (the paper keeps the far-from-centroid copy), max cosine similarity
    to any prior member, kept iff below tau. tau=0.4 because the synthetic embeddings top out near 0.48
    pairwise cosine — the decision math is what the oracle checks.
    order_decimals=9 pins the rank order against last-bit float drift
    between Spark's sequential fold and DuckDB's list sum."""
    from syzgydb_spark.operators.semantic import semdedup

    emb = _t(spark, sf_dir, "embeddings")
    df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vector"),
    )
    res = semdedup(df, _ivf_fixture_index(), tau=0.4, order_decimals=9)
    return res.select(
        "id",
        F.col("cell").cast("long").alias("cell"),
        F.col("rank").cast("long").alias("rank"),
        F.round("max_prior_sim", _R).alias("max_prior_sim"),
        "kept",
    )


def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary accounting (exact path): total tokens,
    distinct tokens, type-token ratio. The approx=True HLL sibling is
    the 100 TB path (sketches fold map-side; no oracle — different
    sketch families across engines)."""
    from syzgydb_spark.operators.quality import vocab_stats

    docs = _t(spark, sf_dir, "documents")
    return vocab_stats(docs).select(
        "source", "n_tokens", "n_distinct_tokens", "type_token_ratio"
    )


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5) keyed on the
    content-addressed shuffle key — membership is a pure function of
    (seed, id), zero shuffle. The oracle replays the same cumulative
    thresholds over the same md5 key."""
    from syzgydb_spark.operators.sharding import hash_split

    docs = _t(spark, sf_dir, "documents")
    res = hash_split(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}, id_col="doc_id"
    )
    return res.select("doc_id", "split")


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster centroid-distance trim (top 5% of each IVF cell by
    distance to its own center flagged as outliers): the
    fringe-pruning curation filter that composes with semdedup's
    core-pruning. Assignment and distances replay bit-for-bit from the
    persisted center literals; percent_rank is an exact integer ratio,
    so the flag itself is engine-portable."""
    from syzgydb_spark.operators.semantic import embedding_outliers

    emb = _t(spark, sf_dir, "embeddings")
    df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vector"),
    )
    return embedding_outliers(df, _ivf_fixture_index(), trim_fraction=0.05)


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-embedding-cluster sample (k=5): nearest-center
    assignment with the persisted IVF fixture centers, then the
    two-phase exact-k design per cell (counts → md5 candidate filter →
    bounded rank window). Deterministic end to end, so the oracle
    replays assignment AND the exact sampled row set."""
    from syzgydb_spark.operators.semantic import cluster_balanced_sample

    emb = _t(spark, sf_dir, "embeddings")
    df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vector"),
    )
    res = cluster_balanced_sample(df, _ivf_fixture_index(), 5, id_col="id")
    return _carry(
        res.select(
            "id", F.col("ivf_cell").cast("long").alias("cell"), "sample_rank"
        ),
        res,
    )


def q_embed_text_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched embedding plumbing (mapInPandas + per-task LRU) with the
    deterministic md5-component stub model. The stub is exact-rational
    → IEEE double at every step, so the oracle reproduces the vectors
    bit-for-bit in DuckDB SQL (hex-cast of md5 prefixes + sqrt) —
    components are projected as scalars because the driver's value
    hash stringifies floats per-cell, not per-array."""
    from syzgydb_spark.embedding import embed_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = embed_text(spark, docs, text_col="text", dim=16)
    return out.select(
        "doc_id",
        F.size("embedding").cast("long").alias("dims"),
        F.round(F.col("embedding")[0], 6).alias("e0"),
        F.round(F.col("embedding")[8], 6).alias("e8"),
        F.round(F.col("embedding")[15], 6).alias("e15"),
    )


def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup: lowercase + collapse every
    punctuation/whitespace run, md5-fold the result, keep min id per
    group — the cheap reformatting-insensitive pass between byte-exact
    dedup and MinHash. One narrow (id, key) aggregation + semi join."""
    from syzgydb_spark.operators.dedup import dedup_normalized

    docs = _t(spark, sf_dir, "documents")
    return dedup_normalized(docs).select("doc_id", "lang", "source")


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by smoothed TF-IDF
    (sklearn smoothing), deterministic (score desc, term) ranking.
    Narrow (id, term, count) shuffles; per-doc rank windows only."""
    from syzgydb_spark.operators.quality import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    res = tfidf_top_terms(docs, 3)
    return _carry(
        res.select("doc_id", "term", "tf", "df_count", "tfidf", "term_rank"), res
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res keys from an md5 uniform), 100 docs weighted by
    n_chars — TakeOrderedAndProject, no sort, reproducible across
    engines (the oracle draws the identical sample)."""
    from syzgydb_spark.operators.quality import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    res = weighted_sample(docs, 100, weight_col="n_chars")
    return res.select("doc_id", "n_chars", "sample_key")


def q_token_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf spectrum: distinct terms + occurrences per power-of-two
    frequency band. Exact integer bucket math (length(bin(c))-1), one
    vocabulary-sized aggregation over the term counts."""
    from syzgydb_spark.operators.quality import token_frequency_spectrum

    docs = _t(spark, sf_dir, "documents")
    return token_frequency_spectrum(docs)


def q_perplexity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail banding per language: unigram-LM logppl
    split into 3 quantile bands via the bounded rounded-score histogram
    (no per-language global sort); boundary buckets share a band."""
    from syzgydb_spark.operators.quality import perplexity_bands, unigram_lm

    docs = _t(spark, sf_dir, "documents")
    lm = unigram_lm(docs, min_count=2, alpha=0.5)
    res = perplexity_bands(docs, lm, n_bands=3)
    # carry the per-document scored relation's handle (within-query
    # materialization) — NOT the LM model's (serving-lifetime cache,
    # owned by `lm`, deliberately left session-cached)
    return _carry(
        res.select("doc_id", "stratum", "n_tokens", "logppl", "ppl_band"), res
    )


def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan table profile of `documents`: per-column null count,
    exact distinct count, min/max — the pre-flight data-quality audit
    of a corpus build. One aggregation job (all columns at once), rows
    unpivoted from the single aggregated row via a constants-sized
    struct explode (the scan executes exactly once)."""
    from syzgydb_spark.operators.profile import profile_table

    docs = _t(spark, sf_dir, "documents")
    return profile_table(docs)


def q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) clustering keys over two independent event
    dimensions (user bucket, value bucket) — the multi-column layout
    key behind `cluster_by_zorder`, pure integer shift/mask codegen,
    bit-replayable by any engine."""
    from syzgydb_spark.functions.zorder import zorder_key

    ev = _t(spark, sf_dir, "events")
    key = zorder_key(
        [
            F.col("user_id") % 64,
            F.floor("value").cast("long"),
        ],
        bits=6,
    )
    return ev.select("event_id", key.alias("zkey"))


#: DuckDB replica of _synthetic_urls — the identical string construction
#: (same CASE arms, same concatenation order) so both engines normalize
#: the same raw bytes.
_URLS_CTE = """
        hosts0 AS (
          SELECT doc_id, source, lang,
                 (CASE WHEN doc_id % 3 = 0 THEN 'www.'
                       WHEN doc_id % 3 = 1 THEN 'news.' ELSE '' END)
                 || source
                 || (CASE WHEN regexp_matches(source, '[02468]$')
                          THEN '.co.uk' ELSE '.com' END) AS host0
          FROM documents
        ),
        urls AS (
          SELECT doc_id, source, lang,
                 (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END)
                 || (CASE WHEN doc_id % 5 = 0 THEN upper(host0) ELSE host0 END)
                 || (CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END)
                 || '/' || lang || '/item-' || CAST(doc_id % 25 AS VARCHAR)
                 || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
                 || (CASE WHEN doc_id % 4 = 1 THEN '?page=2'
                          WHEN doc_id % 4 = 2 THEN '?utm_source=news&page=2'
                          WHEN doc_id % 4 = 3 THEN '?page=2&utm_campaign=mix#top'
                          ELSE '' END) AS url
          FROM hosts0
        )"""

#: the TRACKING_PARAMS alternation (functions/url.py), verbatim
_TRACK = "(utm_[a-z]+|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)"

#: url_normalize replayed step-for-step (DuckDB regexp_replace needs the
#: explicit 'g' flag where Spark's replaces every match; \\1 is RE2's
#: replacement backreference where Java uses $1)
_URL_NORM_CTE = f"""
        n0 AS (SELECT doc_id, source,
                      regexp_replace(url, '#.*$', '', 'g') AS u FROM urls),
        n1 AS (SELECT doc_id, source,
                      regexp_replace(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '') AS u
               FROM n0),
        n2 AS (SELECT doc_id, source,
                      regexp_replace(regexp_replace(
                          lower(regexp_extract(u, '^([^/?#]*)', 1)),
                          '^www\\.', ''), ':(80|443)$', '') AS host,
                      regexp_replace(u, '^[^/?#]*', '') AS rest
               FROM n1),
        n3 AS (SELECT doc_id, source, host,
                      regexp_replace(rest,
                          '&{_TRACK}=[^&#]*', '', 'g') AS rest FROM n2),
        n4 AS (SELECT doc_id, source, host,
                      regexp_replace(rest,
                          '\\?{_TRACK}=[^&#]*&', '?', 'g') AS rest FROM n3),
        n5 AS (SELECT doc_id, source, host,
                      regexp_replace(rest,
                          '\\?{_TRACK}=[^&#]*$', '', 'g') AS rest FROM n4),
        normed AS (SELECT doc_id, source,
                          host || regexp_replace(rest, '/+(\\?|$)', '\\1', 'g')
                            AS norm_url
                   FROM n5)"""

#: url_host + registered_domain replayed (same regexes, same fallback)
_DOMAIN_EXPR = (
    "CASE WHEN regexp_extract(host, '([^.]+\\.(co|com|org|net|ac|gov|edu)"
    "\\.(uk|jp|au|nz|za|in|br|kr|cn|mx|sg|il|id|th|tr))$', 1) != '' "
    "THEN regexp_extract(host, '([^.]+\\.(co|com|org|net|ac|gov|edu)"
    "\\.(uk|jp|au|nz|za|in|br|kr|cn|mx|sg|il|id|th|tr))$', 1) "
    "ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END"
)


def _html_extract_oracle_sql() -> str:
    """DuckDB replica of q_html_extract: identical markup construction,
    identical strip/title/link-count regex chains (inline (?is) flags
    so RE2 and Java agree; 'g' where Spark replaces every match)."""

    def entities(x: str) -> str:
        # the _ENTITIES order from functions/html.py, &amp; last
        for ent, repl in [
            ("&nbsp;", " "),
            ("&lt;", "<"),
            ("&gt;", ">"),
            ("&quot;", '"'),
            ("&#39;", "''"),
            ("&apos;", "''"),
            ("&amp;", "&"),
        ]:
            x = f"replace({x}, '{ent}', '{repl}')"
        return x

    strip = "regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    strip = f"regexp_replace({strip}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    strip = f"regexp_replace({strip}, '(?s)<!--.*?-->', ' ', 'g')"
    strip = (
        f"regexp_replace({strip}, "
        "'(?i)</(p|div|li|h[1-6]|tr|ul|ol|table|blockquote)>|<br[^>]*>', "
        "chr(10), 'g')"
    )
    strip = f"regexp_replace({strip}, '(?s)<[^>]*>', ' ', 'g')"
    strip = entities(strip)
    strip = f"regexp_replace({strip}, '[ \\t\\r]+', ' ', 'g')"
    strip = f"regexp_replace({strip}, ' ?\\n ?', chr(10), 'g')"
    strip = f"regexp_replace({strip}, '\\n+', chr(10), 'g')"
    strip = f"regexp_replace({strip}, '^\\n|\\n$', '', 'g')"
    title = entities(
        "regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1)"
    )
    title = f"trim(regexp_replace({title}, '\\s+', ' ', 'g'))"
    links = (
        "CAST((length(html) - length(regexp_replace(html, '(?i)<a[\\s>]',"
        " '', 'g'))) / 3 AS BIGINT)"
    )
    return f"""
        WITH raw AS (
          SELECT doc_id,
                 '<html><head><title> Doc &amp; ' || source
                 || ' </title><style>p{{c:1}}</style></head><body><h1>'
                 || upper(lang) || '</h1><p>'
                 || replace(replace(text, ' table ', ' <b>table</b> '),
                            ' row ', '<br>row ')
                 || '</p><script>var a = 1 < 2;</script><a href="/x">x</a>'
                 || (CASE WHEN doc_id % 3 = 0
                          THEN '<a href="/y">y</a>' ELSE '' END)
                 || '<!-- trailing comment --></body></html>' AS html
          FROM documents
        )
        SELECT doc_id, {title} AS title, {links} AS n_links,
               trim({strip}) AS clean_text
        FROM raw
    """


def _zorder_oracle_sql() -> str:
    """DuckDB replica of q_zorder_events: the identical 12-term Morton
    interleave (bits=6, 2 columns) as explicit shift/mask arithmetic."""
    terms = " + ".join(
        f"(((v{j} >> {i}) & 1) << {i * 2 + j})" for i in range(6) for j in (0, 1)
    )
    return f"""
        WITH v AS (
          SELECT event_id,
                 least(greatest(coalesce(user_id % 64, 0), 0), 63) AS v0,
                 least(greatest(coalesce(CAST(floor(value) AS BIGINT), 0), 0), 63) AS v1
          FROM events
        )
        SELECT event_id, CAST({terms} AS BIGINT) AS zkey FROM v
    """


def _synthetic_urls(docs: DataFrame) -> DataFrame:
    """Deterministic crawl-shaped URLs derived from fixture columns —
    the raw strings both engines construct bit-identically, exercising
    every normalization rule: scheme http/https, www./news./bare
    subdomains, mixed host case, default port, trailing slash,
    tracking params in leading/mid position, fragments, and .com vs
    .co.uk registrable suffixes."""
    did = F.col("doc_id")
    scheme = F.when(did % 2 == 0, F.lit("http://")).otherwise(F.lit("https://"))
    sub = (
        F.when(did % 3 == 0, F.lit("www."))
        .when(did % 3 == 1, F.lit("news."))
        .otherwise(F.lit(""))
    )
    base = F.concat(
        F.col("source"),
        F.when(F.col("source").rlike("[02468]$"), F.lit(".co.uk")).otherwise(
            F.lit(".com")
        ),
    )
    host = F.concat(sub, base)
    host = F.when(did % 5 == 0, F.upper(host)).otherwise(host)
    port = F.when(did % 11 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/"), F.col("lang"), F.lit("/item-"), (did % 25).cast("string")
    )
    slash = F.when(did % 7 == 0, F.lit("/")).otherwise(F.lit(""))
    qry = (
        F.when(did % 4 == 1, F.lit("?page=2"))
        .when(did % 4 == 2, F.lit("?utm_source=news&page=2"))
        .when(did % 4 == 3, F.lit("?page=2&utm_campaign=mix#top"))
        .otherwise(F.lit(""))
    )
    return docs.withColumn(
        "url", F.concat(scheme, host, port, path, slash, qry)
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonical dedup (functions/url.py): normalize crawl URLs
    (scheme/www/port/fragment/tracking-param/trailing-slash rules) and
    keep the min-id survivor per canonical URL. The oracle replays the
    identical regex chain over the identical constructed strings."""
    from syzgydb_spark.functions.url import dedup_by_url

    docs = _synthetic_urls(_t(spark, sf_dir, "documents"))
    return dedup_by_url(docs).select(
        "doc_id", "source", "norm_url", "n_url_dups"
    )


def q_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain document caps (Gopher-style site
    throttling): at most 10 docs per domain, smallest id first, with
    the public-suffix-aware domain key (news.src3.co.uk →
    src3.co.uk)."""
    from syzgydb_spark.functions.url import per_domain_cap

    docs = _synthetic_urls(_t(spark, sf_dir, "documents"))
    return per_domain_cap(docs, 10).select(
        "doc_id", "source", "domain", "domain_rank"
    )


def q_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UT1-style domain blocklist filter (functions/url.py): survivors
    after dropping three blocklisted registrable domains; the list side
    is a codegen IN — zero extra shuffle at any corpus size."""
    from syzgydb_spark.functions.url import filter_blocklist

    docs = _synthetic_urls(_t(spark, sf_dir, "documents"))
    return filter_blocklist(
        docs, ["src1.com", "src2.co.uk", "src15.com"]
    ).select("doc_id", "source", "domain")


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET-style HTML→text extraction (functions/html.py): strip
    tags/script/style/comments, resolve entities, collapse whitespace;
    plus title and link-count signals. The markup is constructed
    deterministically from fixture columns (inline tags, <br> blocks,
    entities, a script element, 0-2 links) so the oracle replays the
    identical bytes through the identical regex chain."""
    from syzgydb_spark.functions.html import (
        html_link_count,
        html_title,
        strip_html,
    )

    docs = _t(spark, sf_dir, "documents")
    body = F.replace(
        F.col("text"), F.lit(" table "), F.lit(" <b>table</b> ")
    )
    body = F.replace(body, F.lit(" row "), F.lit("<br>row "))
    html = F.concat(
        F.lit("<html><head><title> Doc &amp; "),
        F.col("source"),
        F.lit(" </title><style>p{c:1}</style></head><body><h1>"),
        F.upper(F.col("lang")),
        F.lit("</h1><p>"),
        body,
        F.lit("</p><script>var a = 1 < 2;</script><a href=\"/x\">x</a>"),
        F.when(F.col("doc_id") % 3 == 0, F.lit('<a href="/y">y</a>')).otherwise(
            F.lit("")
        ),
        F.lit("<!-- trailing comment --></body></html>"),
    )
    return docs.select(
        "doc_id",
        html_title(html).alias("title"),
        html_link_count(html).alias("n_links"),
        strip_html(html).alias("clean_text"),
    )


def q_source_distinct_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source distinct-vocabulary count via the explicit
    two-stage decomposition (operators/skew.py): value-as-salt partial
    dedup, so no task holds a source's whole distinct set — the same
    shape Catalyst plans for countDistinct natively (plan-asserted in
    tests). Oracle: plain COUNT(DISTINCT)."""
    from syzgydb_spark.functions.text import word_tokens
    from syzgydb_spark.operators.skew import two_stage_distinct_count

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(word_tokens("text")).alias("term")
    )
    return two_stage_distinct_count(toks, ["source"], "term")


def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language p50/p90/p99 document lengths via the bounded-
    histogram inverse CDF (operators/skew.py histogram_quantiles) —
    exact type-1 quantiles with no per-key sort, the skew-safe
    replacement for percent_rank/ntile on hot keys. Oracle replays
    the identical histogram + ceil(N·p) boundary rule."""
    from syzgydb_spark.operators.skew import histogram_quantiles

    docs = _t(spark, sf_dir, "documents")
    return histogram_quantiles(
        docs, ["lang"], "n_chars", (0.5, 0.9, 0.99), precision=0
    )


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty scores (operators/dedup.novelty_scores):
    fraction of each doc's distinct 5-gram shingles unique to it
    corpus-wide — the continuous complement of binary dedup, md5-folded
    8-byte shingle keys on both engines."""
    from syzgydb_spark.operators.dedup import novelty_scores

    docs = _t(spark, sf_dir, "documents")
    return novelty_scores(docs, shingle_n=5)


def q_event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier flags (operators/profile.py
    robust_outliers): modified z-score 0.6745·|x−med|/MAD > 3.5, with
    median and MAD both from bounded histograms — no per-key sort.
    The oracle replays the identical two-histogram construction."""
    from syzgydb_spark.operators.profile import robust_outliers

    ev = _t(spark, sf_dir, "events")
    return robust_outliers(ev, ["event_type"], "value").select(
        "event_id", "event_type", "value", "median", "mad",
        "robust_z", "is_outlier",
    )


def q_fuzzy_title_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs of DISTINCT 12-char title prefixes within Levenshtein
    distance 1, via FastSS deletion-neighborhood blocking
    (operators/fuzzy.py) — an equi-join on deletion variants + codegen
    levenshtein verify, never a cross join, and the variant join runs
    on the distinct-string relation so duplicated titles cost one row
    each (the sf1 super-linearity fix). The oracle is the BRUTE
    definition (cross join + levenshtein filter over the same distinct
    relation), so the hash match proves the blocking misses no pair."""
    from syzgydb_spark.operators.fuzzy import fuzzy_string_pairs

    docs = _t(spark, sf_dir, "documents").select(
        F.substring("text", 1, 12).alias("title")
    )
    return fuzzy_string_pairs(docs, "title", max_dist=1)


def q_salted_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-5 terms through the explicit salted two-stage
    top-k (operators/skew.py): stage 1 bounds every task at k·n_salts
    rows even when one language dominates — the portable spelling of
    the WindowGroupLimit pruning Spark ≥3.5 applies to the plain
    rank-filter window natively. Result is bit-identical to the
    single-window plan the oracle runs (the (count DESC, term ASC)
    order is total)."""
    from syzgydb_spark.functions.text import word_tokens
    from syzgydb_spark.operators.skew import salted_topk

    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(word_tokens("text")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("term_count"))
    )
    return salted_topk(
        counts,
        ["lang"],
        [F.col("term_count").desc(), F.col("term").asc()],
        5,
        salt_on="term",
        rank_col="term_rank",
    ).select("lang", "term", "term_count", "term_rank")


def q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership probe (operators/bloom.py): the
    single-digit sources form the standing corpus, folded ONCE into a
    2^16-bit bitmap keyed on dedup-normalized text (one bit_or
    aggregation); every document is then probed with zero corpus
    access — broadcast bitmap + one re-aggregation. The 100 TB dedup
    front-door: "probably seen" rows skip the exact store pass. The
    oracle rebuilds the identical md5-derived bit positions and checks
    them against the corpus's distinct-position set — bit-for-bit the
    same decision, false positives included."""
    from syzgydb_spark.functions.text import normalized_text
    from syzgydb_spark.operators.bloom import bloom_build, bloom_probe

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.length("source") == 4)
    bloom = bloom_build(
        corpus, normalized_text("text"), n_bits=1 << 16, n_hashes=5
    )
    return bloom_probe(
        docs, bloom, normalized_text("text"),
        id_col="doc_id", n_bits=1 << 16, n_hashes=5,
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster compaction (operators/dedup.keep_best): the
    transitive groups over the banded MINHASH pairs (the scale-path
    pair source — exact bigram-Jaccard pair generation measured 24 s
    at sf0.1 vs 1.4 s warm for the LSH) collapse to ONE keeper each —
    highest n_chars, ties to the lowest id; edge-free docs keep
    themselves. Aggregation-only keeper choice (max-score then
    min-id), no per-group window, so a giant duplicate cluster is a
    groupBy key rather than a single-task sort. Oracle: the shared
    minhash CTEs + recursive-CTE components + the same two-step
    argmax."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_near_duplicates(
        docs, num_hashes=64, bands=16, shingle_n=2, threshold=0.5, hash_fn="md5"
    )
    return DD.keep_best(docs, pairs, "n_chars")


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard-negative mining (operators/mining.py):
    for each anchor (vec_id < 5) the 5 nearest vectors with a
    DIFFERENT label, ranked among eligible candidates only — filtering
    after a plain top-k would under-fill k. Broadcast anchors, fact
    side streams, per-anchor rank window."""
    from syzgydb_spark.operators.mining import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    data = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"), "label"
    )
    anchors = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
        F.col("label").alias("query_label"),
    )
    res = hard_negatives(data, anchors, k=5, method="euclidean")
    return res.select(
        "query_id",
        "id",
        F.col("label").cast("long").alias("neg_label"),
        F.round("distance", _R).alias("distance"),
    )


def q_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal (functions/text.char_entropy):
    Shannon entropy of each document's character distribution via the
    Arrow-batched pandas-UDF kernel (the pure-Catalyst variant is
    ``char_entropy_expr``; the kernel is the fast path — 20.5s→0.4s at
    sf0.1). Distinct characters are sorted before the float fold so the
    DuckDB oracle sums the same terms in the same IEEE order and
    hash-matches bit-for-bit. ``low_entropy`` flags the bottom tail
    (mash/padding suspects) on the rounded value so the threshold
    comparison is engine-exact."""
    from syzgydb_spark.functions.text import char_entropy

    docs = _t(spark, sf_dir, "documents")
    ent = F.round(char_entropy("text"), _R)
    return docs.select(
        "doc_id",
        ent.alias("char_entropy"),
        (ent < 4.0).alias("low_entropy"),
    )


def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (sharding.leakage_safe_split):
    every near-duplicate cluster lands in ONE split — membership keyed
    on the component min id, so a test document's training twin cannot
    leak eval signal. Edge-free docs split identically to hash_split
    (adding pair information never reshuffles the unaffected corpus).
    Oracle: minhash pairs → recursive components → the identical md5
    threshold CASE on group_id."""
    from syzgydb_spark.operators.sharding import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_near_duplicates(
        docs, num_hashes=64, bands=16, shingle_n=2, threshold=0.5, hash_fn="md5"
    )
    return leakage_safe_split(
        docs, pairs, {"train": 0.9, "val": 0.05, "test": 0.05}
    ).select("doc_id", "group_id", "split")


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank (operators/mining.mmr_rerank): per anchor
    (vec_id < 3), the top-20 cosine candidates re-ranked greedily by
    λ·relevance − (1−λ)·max-similarity-to-selected, k=5 — the standard
    fix for a retrieval top-k full of near-copies. Bounded per-query
    kernel (one shuffle); selection runs on 9dp-rounded scores so the
    DuckDB oracle (k unrolled argmax stages) replays it exactly."""
    from syzgydb_spark.operators.mining import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings")
    data = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    anchors = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    cand = knn_join(data, anchors, k=20, method="cosine").select(
        "query_id", "id", "vector", (1.0 - F.col("distance")).alias("relevance")
    )
    return mmr_rerank(cand, k=5, lambda_=0.7)


def q_unicode_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode hygiene pass (functions/text.unicode_clean): NFC
    composition + invisible-character strip + space/tab-run collapse —
    run BEFORE fingerprinting so byte-different encodings of one
    string share a dedup group. The fixture corpus is already clean,
    so deterministic dirt is planted in the query itself (combining
    diaeresis + zero-width space on every 3rd doc, a BEL + tab run on
    every 5th); the oracle plants the identical bytes and replays the
    scrub with nfc_normalize + the same RE2 classes."""
    from syzgydb_spark.functions.text import unicode_clean

    docs = _t(spark, sf_dir, "documents")
    dirty = F.col("text")
    dirty = F.when(
        F.col("doc_id") % 3 == 0, F.concat(dirty, F.lit(" nai\u0308ve\u200b"))  # i+COMBINING DIAERESIS, ZWSP
    ).otherwise(dirty)
    dirty = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.lit("alert\t\t"), dirty)
    ).otherwise(dirty)
    clean = unicode_clean(dirty)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        (clean != dirty).alias("was_dirty"),
    )


def q_bmp_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode end-to-end (operators/multimodal.py
    `_make_media_codecs`): per doc, plant a 24-bit BMP whose pixel at
    (x, y, channel c) is the closed form ``(doc_id*7 + x*3 + y*5 +
    c*11) % 256`` (width 5+id%4, height 3+id%3), encode it to genuine
    BMP bytes, DECODE those bytes back (header parse, BGR swap,
    bottom-up flip, 4-byte row padding), and emit exact integer pixel
    sums from the DECODED array. The DuckDB oracle recomputes the same
    sums from the generative formula without ever seeing bytes — any
    decode defect (padding, row order, channel order) breaks the hash.
    North-star multimodal clause; reference has no media surface."""
    from syzgydb_spark.operators.multimodal import decode_bmp, encode_bmp

    docs = _t(spark, sf_dir, "documents").select("doc_id").where(F.col("doc_id") < 48)
    cols = ["doc_id", "width", "height", "pix_sum", "sum_r", "sum_g", "sum_b"]

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 5 + did % 4, 3 + did % 3
                y, x, c = np.mgrid[0:h, 0:w, 0:3]
                px = ((did * 7 + x * 3 + y * 5 + c * 11) % 256).astype(np.uint8)
                dec = decode_bmp(encode_bmp(px)).astype(np.int64)
                rows.append({
                    "doc_id": did, "width": w, "height": h,
                    "pix_sum": int(dec.sum()),
                    "sum_r": int(dec[:, :, 0].sum()),
                    "sum_g": int(dec[:, :, 1].sum()),
                    "sum_b": int(dec[:, :, 2].sum()),
                })
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(
        run,
        "doc_id long, width int, height int, pix_sum long, "
        "sum_r long, sum_g long, sum_b long",
    )


def q_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-format decode end-to-end (multimodal.py
    `_make_media_codecs`): per doc, plant an 8-bit truecolor PNG whose
    pixel at (x, y, c) is ``(doc_id*11 + x*5 + y*7 + c*13) % 256``
    (width 4+id%5, height 3+id%4), encode with the row filter CYCLING
    through all five types (None/Sub/Up/Average/Paeth), DECODE the
    bytes back (CRC-verified chunk walk, zlib inflate, per-row
    unfilter), and emit exact integer pixel sums from the DECODED
    array. The DuckDB oracle recomputes the sums from the generative
    formula without ever seeing bytes — any defect in deflate framing,
    CRC handling, or any of the five unfilters breaks the hash.
    Completes the media family with a compressed format
    (bmp=uncompressed image, wav=audio, png=DEFLATE image).
    North-star multimodal clause; reference has no media surface."""
    from syzgydb_spark.operators.multimodal import decode_png, encode_png

    docs = _t(spark, sf_dir, "documents").select("doc_id").where(F.col("doc_id") < 48)
    cols = ["doc_id", "width", "height", "pix_sum", "sum_r", "sum_g", "sum_b"]

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                y, x, c = np.mgrid[0:h, 0:w, 0:3]
                px = ((did * 11 + x * 5 + y * 7 + c * 13) % 256).astype(np.uint8)
                dec = decode_png(encode_png(px, filter_mode="cycle")).astype(np.int64)
                rows.append({
                    "doc_id": did, "width": w, "height": h,
                    "pix_sum": int(dec.sum()),
                    "sum_r": int(dec[:, :, 0].sum()),
                    "sum_g": int(dec[:, :, 1].sum()),
                    "sum_b": int(dec[:, :, 2].sum()),
                })
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(
        run,
        "doc_id long, width int, height int, pix_sum long, "
        "sum_r long, sum_g long, sum_b long",
    )


def q_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL LOSSY-format decode end-to-end (multimodal.py
    `_make_jpeg_codec`): per doc, plant a grayscale image of
    (1+id%3)x(1+id%2) 8x8 blocks where block b is CONSTANT at the even
    value ``2*((doc_id*7 + b*5) % 101) + 20``, push it through the
    FULL baseline JPEG pipeline (forward DCT, quality-50 Annex-K
    quantization, zigzag, DC-differential Huffman coding, byte
    stuffing — then marker parse, entropy decode, dequant, IDCT,
    clamp), and emit exact integer stats from the DECODED pixels.
    Flat even-valued blocks survive the lossy pipeline BIT-EXACTLY
    (DC-only spectrum; quant 16 divides 8*(v-128); no .5 rounding
    boundary), so the DuckDB oracle replays the generative formula —
    any defect in the DCT round-trip, the Huffman tables, the DC
    prediction chain, or byte stuffing breaks the hash. Completes the
    codec tiers: bmp/wav raw, png lossless-compressed, jpeg lossy.
    North-star multimodal clause; reference has no media surface."""
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    docs = _t(spark, sf_dir, "documents").select("doc_id").where(F.col("doc_id") < 48)
    cols = ["doc_id", "width", "height", "pix_sum", "pix_min", "pix_max"]

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                nbw, nbh = 1 + did % 3, 1 + did % 2
                b = np.arange(nbw * nbh).reshape(nbh, nbw)
                vals = 2 * ((did * 7 + b * 5) % 101) + 20
                px = np.kron(vals, np.ones((8, 8), np.int64)).astype(np.uint8)
                dec = decode_jpeg(encode_jpeg(px, quality=50)).astype(np.int64)
                rows.append({
                    "doc_id": did, "width": 8 * nbw, "height": 8 * nbh,
                    "pix_sum": int(dec.sum()),
                    "pix_min": int(dec.min()),
                    "pix_max": int(dec.max()),
                })
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(
        run,
        "doc_id long, width int, height int, pix_sum long, "
        "pix_min long, pix_max long",
    )


def q_jpeg_subsampled_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:2:0 chroma-subsampled JPEG decode end-to-end (r9: the
    dominant real-world layout — multimodal.py generic MCU assembly,
    box-average encode, replication upsample): per doc, plant an RGB
    image of (2*(1+id%2))x2 8x8 blocks, gray-valued per block at the
    even value ``2*((doc_id*11 + b*7) % 101) + 24``, push it through
    the FULL color pipeline at 4:2:0 (RGB→YCbCr, 2x2 chroma box
    average, per-grid DCT/quant/Huffman with 4 Y + 1 Cb + 1 Cr blocks
    per MCU — then the subsampled decode path back to RGB). Gray
    pixels make Cb=Cr exactly 128 (constant chroma survives box
    average + replication bit-exactly) and flat even Y blocks are the
    4:4:4 exactness contract, so the DECODED pixels replay the
    generative formula exactly and DuckDB checks the whole subsampled
    path — MCU interleave order, per-component block grids, chroma
    upsample — without decoding anything."""
    from syzgydb_spark.operators.multimodal import decode_jpeg, encode_jpeg

    docs = _t(spark, sf_dir, "documents").select("doc_id").where(F.col("doc_id") < 48)
    cols = ["doc_id", "width", "height", "pix_sum", "pix_min", "pix_max"]

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                nbw, nbh = 2 * (1 + did % 2), 2
                b = np.arange(nbw * nbh).reshape(nbh, nbw)
                vals = 2 * ((did * 11 + b * 7) % 101) + 24
                g = np.kron(vals, np.ones((8, 8), np.int64)).astype(np.uint8)
                px = np.dstack([g, g, g])
                dec = decode_jpeg(
                    encode_jpeg(px, quality=50, subsampling="4:2:0")
                ).astype(np.int64)
                rows.append({
                    "doc_id": did, "width": 8 * nbw, "height": 8 * nbh,
                    "pix_sum": int(dec.sum()),
                    "pix_min": int(dec.min()),
                    "pix_max": int(dec.max()),
                })
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(
        run,
        "doc_id long, width int, height int, pix_sum long, "
        "pix_min long, pix_max long",
    )


def q_jpeg_progressive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive (SOF2) JPEG decode end-to-end (r9: multimodal.py
    multi-scan architecture): per doc, plant the SAME gray flat-block
    RGB image as jpeg_subsampled_stats but push it through
    encode_jpeg_progressive at 4:2:0 — DC first/refine interleaved
    scans plus per-component AC first/refine scans with EOB runs —
    then the progressive decode path back to RGB. Flat even gray
    blocks are bit-exact through the whole lossy pipeline (constant
    chroma = exactly 128 through box average + replication; DC-only
    spectra), so DuckDB replays the generative formula and the hash
    check covers the progressive entropy layer, the scan-script
    sequencing, and the subsampled MCU assembly together. r10: every
    doc also encodes with ``restart_interval = 1 + doc_id % 3`` —
    RSTm markers inside SOF2 scans (DRI+progressive, the camera
    shape) ride the same driver-green hash."""
    from syzgydb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id").where(F.col("doc_id") < 48)
    cols = ["doc_id", "width", "height", "pix_sum", "pix_min", "pix_max"]

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                nbw, nbh = 2 * (1 + did % 2), 2
                b = np.arange(nbw * nbh).reshape(nbh, nbw)
                vals = 2 * ((did * 11 + b * 7) % 101) + 24
                g = np.kron(vals, np.ones((8, 8), np.int64)).astype(np.uint8)
                px = np.dstack([g, g, g])
                dec = decode_jpeg(
                    encode_jpeg_progressive(
                        px, quality=50, subsampling="4:2:0",
                        restart_interval=1 + did % 3)
                ).astype(np.int64)
                rows.append({
                    "doc_id": did, "width": 8 * nbw, "height": 8 * nbh,
                    "pix_sum": int(dec.sum()),
                    "pix_min": int(dec.min()),
                    "pix_max": int(dec.max()),
                })
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(
        run,
        "doc_id long, width int, height int, pix_sum long, "
        "pix_min long, pix_max long",
    )


def q_wav_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: per doc, plant PCM16 samples via
    the closed form ``((doc_id*13 + i*7 + k*3) % 65536) - 32768``
    (50+id%17 frames, 1+id%2 channels), encode to genuine RIFF/WAVE
    bytes, decode them back (chunk walk, interleave deshuffle), and
    emit exact integer stats from the DECODED array; DuckDB recomputes
    from the formula. Companion to bmp_pixel_stats."""
    from syzgydb_spark.operators.multimodal import decode_wav, encode_wav

    docs = _t(spark, sf_dir, "documents").select("doc_id").where(F.col("doc_id") < 48)
    cols = ["doc_id", "n_frames", "channels", "samp_sum", "samp_min", "samp_max"]

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n, ch = 50 + did % 17, 1 + did % 2
                i, k = np.mgrid[0:n, 0:ch]
                samples = (((did * 13 + i * 7 + k * 3) % 65536) - 32768).astype(np.int16)
                dec, rate = decode_wav(encode_wav(samples, sample_rate=8000))
                assert rate == 8000
                d = dec.astype(np.int64)
                rows.append({
                    "doc_id": did, "n_frames": int(d.shape[0]),
                    "channels": int(d.shape[1]), "samp_sum": int(d.sum()),
                    "samp_min": int(d.min()), "samp_max": int(d.max()),
                })
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(
        run,
        "doc_id long, n_frames int, channels int, samp_sum long, "
        "samp_min long, samp_max long",
    )


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL web-archive ingestion end-to-end (sources/warc.py): per
    batch, pack documents into multi-record WET segments — genuine
    WARC/1.0 bytes with version line, CRLF headers, Content-Length
    framing, and record separators; every odd segment is additionally
    gzip-compressed like a CommonCrawl shard — then parse the segment
    bytes back through the module's strict parser and emit per-doc
    fields recovered ONLY from the decoded records (URI-parsed id,
    char/byte lengths, payload md5). The DuckDB oracle recomputes the
    same fields straight from the documents table without ever seeing
    WARC bytes — any framing defect (Content-Length off-by-one, header
    fold, gzip handling, payload-containing-magic) breaks the hash.
    North-star raw-ingestion clause; reference has no archive source."""
    from syzgydb_spark.sources.warc import _make_warc_parser

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 512)
    )
    parse = _make_warc_parser()

    def run(batches):
        import gzip
        import hashlib

        import pandas as pd

        cols = ["doc_id", "n_chars", "payload_bytes", "text_md5"]
        for pdf in batches:
            rows = []
            recs = list(zip(pdf["doc_id"], pdf["text"]))
            for seg_no, seg_start in enumerate(range(0, len(recs), 8)):
                buf = bytearray()
                for did, text in recs[seg_start:seg_start + 8]:
                    payload = str(text).encode("utf-8")
                    buf += (
                        b"WARC/1.0\r\n"
                        b"WARC-Type: conversion\r\n"
                        + f"WARC-Target-URI: https://example.org/doc/{int(did)}\r\n".encode()
                        + b"WARC-Date: 2026-08-15T00:00:00Z\r\n"
                        + f"WARC-Record-ID: <urn:uuid:doc-{int(did)}>\r\n".encode()
                        + b"Content-Type: text/plain\r\n"
                        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
                        + payload + b"\r\n\r\n"
                    )
                data = bytes(buf)
                if seg_no % 2 == 1:
                    data = gzip.compress(data)
                for headers, payload in parse(data):
                    assert headers["warc-type"] == "conversion"
                    rows.append({
                        "doc_id": int(headers["warc-target-uri"].rsplit("/", 1)[1]),
                        "n_chars": len(payload.decode("utf-8")),
                        "payload_bytes": len(payload),
                        "text_md5": hashlib.md5(payload).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(
        run, "doc_id long, n_chars long, payload_bytes long, text_md5 string"
    )


def q_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher §A1.2 repetition fractions (quality.duplication_stats):
    duplicate-line / duplicate-paragraph occurrence and character
    fractions plus top-{2,3,4}-gram character fractions. The synthetic
    corpus is single-line, so the fixture plants structure (the
    c4_clean pattern): each doc becomes
    ``text \\n h [\\n h if id%2==0] \\n\\n h \\n\\n (h | 'solo <id>')``
    with ``h = substr(text, 1, 40)`` — every doc carries a repeated
    line, even docs more so, and docs with id%3==0 carry a duplicated
    paragraph. The oracle rebuilds the identical planted string and
    replays lines/paragraphs/n-grams with unnest + group-and-max."""
    from syzgydb_spark.operators.quality import duplication_stats

    base = _t(spark, sf_dir, "documents").select("doc_id", "text")
    h = F.substring("text", 1, 40)
    planted = F.concat(
        F.col("text"), F.lit("\n"), h,
        F.when(F.col("doc_id") % 2 == 0, F.concat(F.lit("\n"), h))
        .otherwise(F.lit("")),
        F.lit("\n\n"), h, F.lit("\n\n"),
        F.when(F.col("doc_id") % 3 == 0, h)
        .otherwise(F.concat(F.lit("solo "), F.col("doc_id").cast("string"))),
    )
    res = duplication_stats(base.select("doc_id", planted.alias("text")))
    return res.select(
        "doc_id", "n_lines", "n_paras",
        *[F.round(c, _R).alias(c) for c in (
            "dup_line_frac", "dup_line_char_frac",
            "dup_para_frac", "dup_para_char_frac",
            "top_2gram_char_frac", "top_3gram_char_frac",
            "top_4gram_char_frac",
        )],
    )


def q_frequent_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries bounded-memory heavy hitters (operators/sketch.py)
    over the documents token stream. The synthetic vocabulary is far
    below the 1024-counter capacity, so the sketch is provably EXACT
    here (nothing ever decrements; err_bound = 0) and DuckDB checks it
    bit-for-bit as a plain GROUP BY count — the lossy regime's
    N/(capacity+1) guarantee is property-tested (test_sketch)."""
    from syzgydb_spark.functions import text as TX
    from syzgydb_spark.operators.sketch import frequent_terms

    toks = _t(spark, sf_dir, "documents").select(
        F.explode(TX.word_tokens("text")).alias("term"))
    return frequent_terms(toks, "term", capacity=1024)


def q_mg_compacted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store COMPACTION equivalence, oracle-checked end to end
    (operators/maintenance.compact_mg_store): the documents token
    stream is ingested into a persisted Misra-Gries store as three
    crawl waves (doc_id % 3), the store is compacted — three delta
    dirs folded into one manifest-carrying delta — and the folded
    summary is read back. Capacity far exceeds the synthetic
    vocabulary, so every stage is exact and DuckDB checks the whole
    build → update → update → compact → read lifecycle bit-for-bit as
    a plain GROUP BY count; a compaction that double-counted, dropped
    a delta, or mangled the carrier rows would hash-mismatch. The
    crash-window protocol (manifest supersession, replay exclusion,
    transitivity) is covered in tests/test_maintenance.py.

    The three wave ingests are data-INDEPENDENT (each appends its own
    ``batch=`` delta; only the sidecar init orders anything), so they
    run as concurrent Spark jobs from a small driver thread pool
    (guide §2.6 "overlap independent jobs"): ``ensure_mg_store`` (the
    documented lazy-init entry — the first batch IS the build) commits
    the parameter sidecar up front, then each wave folds in under an
    explicit stable token. Store end-state is bit-identical to the
    sequential build → update → update (same three deltas, same
    capacity sidecar; the fold is order-insensitive), and each wave's
    tail no longer leaves the other waves' tasks waiting — at 100 TB,
    three crawl-wave ingests pipeline instead of serializing."""
    import posixpath
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from syzgydb_spark.functions import text as TX
    from syzgydb_spark.operators.maintenance import compact_mg_store
    from syzgydb_spark.operators.sketch import (
        ensure_mg_store,
        read_mg_store,
        update_mg_store,
    )

    toks = _t(spark, sf_dir, "documents").select(
        F.col("doc_id"), F.explode(TX.word_tokens("text")).alias("term"))
    path = posixpath.join(tempfile.mkdtemp(prefix="mg_compact_q_"), "store")
    ensure_mg_store(spark, path, capacity=1 << 16)

    def _wave(k: int) -> None:
        spark.sparkContext.setJobDescription(f"mg lifecycle: wave {k}")
        update_mg_store(
            toks.where(F.col("doc_id") % 3 == k), "term", path, token=str(k))

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(_wave, range(3)))
    folded = compact_mg_store(spark, path)
    if folded != 3:
        raise RuntimeError(f"expected to fold 3 deltas, folded {folded}")
    return read_mg_store(spark, path)


def q_len_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile-sketch store lifecycle, oracle-checked end
    to end (operators/quantiles.py): document LENGTHS are ingested as
    two waves into a persisted distribution store, the store is
    COMPACTED (manifest protocol), and the folded summary answers the
    nine deciles. Capacity (4096) far exceeds the distinct length
    count (313 at sf0.01, 523 at sf0.1), so the whole build → update →
    compact → read → quantile chain is exact and DuckDB replays it as
    a window cumsum over plain GROUP BY counts — the lower weighted
    quantile, bit-for-bit. The lossy-regime collapse (Ben-Haim &
    Tom-Toy centroids, no worst-case bound claimed) is property-tested
    in test_quantiles.py.

    The two wave ingests are data-independent (each appends its own
    delta) and run as concurrent jobs from a driver thread pool
    (guide §2.6), exactly like ``q_mg_compacted_counts``:
    ``ensure_quantile_store`` commits the sidecar, each wave folds in
    under an explicit stable token, and the store end-state is
    bit-identical to the sequential build → update."""
    import posixpath
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from syzgydb_spark.operators.quantiles import (
        compact_quantile_store,
        ensure_quantile_store,
        read_quantile_store,
        sketch_quantiles,
        update_quantile_store,
    )

    lens = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars"))
    path = posixpath.join(tempfile.mkdtemp(prefix="qs_q_"), "store")
    ensure_quantile_store(spark, path, capacity=4096)

    def _wave(k: int) -> None:
        spark.sparkContext.setJobDescription(f"quantile lifecycle: wave {k}")
        update_quantile_store(
            lens.where(F.col("doc_id") % 2 == k), "n_chars", path, token=str(k))

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(_wave, range(2)))
    if compact_quantile_store(spark, path) != 2:
        raise RuntimeError("expected to fold 2 deltas")
    summary = read_quantile_store(spark, path)
    return sketch_quantiles(summary, [i / 10 for i in range(1, 10)])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order matters: the driver's correctness gate verifies the
    FIRST 50 entries against DuckDB oracles; `_WINDOW` (below the flat
    dict) is the explicit window and the dict itself carries no order
    significance. Round-10 rotation policy: (1) the 24 SURVEY §2 core
    queries are permanent; (2) any entry whose RESULT-BEARING CODE
    changed this round re-enters the window (jpeg_progressive_stats —
    the SOF2 decoder gained restart-interval (DRI+RSTn) support;
    hashed_doc_embedding — hashed_doc_vector gained a production
    hash_fn="xxhash64" option, the md5 oracle branch re-certified);
    the maintenance.py lock-protocol hardening (atomic token stamping,
    zombie-delta vacuum, vanished-lock retry) is concurrency-path
    only, not result-bearing — covered by test_store_storm and the
    full-registry self-check, so mg/quantile store entries do NOT
    burn window slots for it; (3) the remaining 24 slots take the
    entries whose most-recent driver check is OLDEST: both r05
    leftovers (text_stats, top_orders_per_customer), the full r06
    cohort (12), and the alphabetically-first 10 of the 24-entry r07
    cohort (the other 14 — fuzzy_title_pairs through zorder_events —
    wait a round).
    Every displaced entry is driver-green in r07-r09 and stays
    verified by the full-registry self-check (tools/check_oracle.py
    -> CORRECTNESS_SELF_r*.json); CONTRACT.md tracks per-entry
    provenance."""
    all_q = {
        # §2 core (permanent window residents)
        "knn_euclidean": q_knn_euclidean,
        "knn_cosine": q_knn_cosine,
        "radius_search": q_radius_search,
        "knn_filtered_language": q_knn_filtered_language,
        "knn_join_topk": q_knn_join_topk,
        "ann_knn_join": q_ann_knn_join,
        "ivf_knn_join": q_ivf_knn_join,
        "pq_adc_knn": q_pq_adc_knn,
        "listing_pagination": q_listing_pagination,
        "listing_lexicographic": q_listing_lexicographic,
        "point_lookup": q_point_lookup,
        "collection_stats": q_collection_stats,
        "filter_lang_and": q_filter_lang_and,
        "filter_lang_in_or_contains": q_filter_lang_in_or_contains,
        "filter_lang_json_props": q_filter_lang_json_props,
        "filter_lang_matches": q_filter_lang_matches,
        "pricing_summary": q_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "segment_customers_setop": q_segment_customers_setop,
        "events_asof_purchase": q_events_asof_purchase,
        "embed_text_stub": q_embed_text_stub,
        "png_pixel_stats": q_png_pixel_stats,
        "token_quota": q_token_quota,
        "warc_roundtrip": q_warc_roundtrip,
        # the last 19 never-driver-checked entries (25-43)
        "embedding_outliers": q_embedding_outliers,
        "lm_perplexity": q_lm_perplexity,
        "stratified_fixed_sample": q_stratified_fixed_sample,
        "mixture_plan": q_mixture_plan,
        "hashed_doc_embedding": q_hashed_doc_embedding,
        "top_terms": q_top_terms,
        "cluster_balanced_sample": q_cluster_balanced_sample,
        "vocab_stats": q_vocab_stats,
        "dedup_normalized": q_dedup_normalized,
        "token_frequency_spectrum": q_token_frequency_spectrum,
        "perplexity_bands": q_perplexity_bands,
        "profile_documents": q_profile_documents,
        "url_dedup": q_url_dedup,
        "domain_caps": q_domain_caps,
        "domain_blocklist": q_domain_blocklist,
        "source_distinct_terms": q_source_distinct_terms,
        "salted_top_terms": q_salted_top_terms,
        "histogram_quantiles": q_histogram_quantiles,
        "entropy_filter": q_entropy_filter,
        # new this round (44): the lossy codec tier
        "jpeg_pixel_stats": q_jpeg_pixel_stats,
        # oldest-driver-check family representatives (45-50)
        "winnow_fingerprints": q_winnow_fingerprints,
        "token_chunks": q_token_chunks,
        "mmr_rerank": q_mmr_rerank,
        "simhash_near_dups": q_simhash_near_dups,
        "media_frame_samples": q_media_frame_samples,
        "hybrid_rank_fusion": q_hybrid_rank_fusion,
        # ---- past the window: all driver-green in r06/r07 or earlier,
        # re-verified every round by the full-registry self-check ----
        "line_dedup": q_line_dedup,
        "minhash_near_dups": q_minhash_near_dups,
        "mg_compacted_counts": q_mg_compacted_counts,
        "dedup_keep_best": q_dedup_keep_best,
        "bloom_dedup": q_bloom_dedup,
        "duplicate_spans": q_duplicate_spans,
        "len_quantile_sketch": q_len_quantile_sketch,
        "quality_score": q_quality_score,
        "bigram_perplexity": q_bigram_perplexity,
        "tfidf_top_terms": q_tfidf_top_terms,
        "wordpiece_tokens": q_wordpiece_tokens,
        "leakage_split": q_leakage_split,
        "hard_negatives": q_hard_negatives,
        "fuzzy_title_pairs": q_fuzzy_title_pairs,
        "bm25_search": q_bm25_search,
        "session_stats": q_session_stats,
        "doc_novelty": q_doc_novelty,
        "dup_stats": q_dup_stats,
        "frequent_terms": q_frequent_terms,
        "wav_sample_stats": q_wav_sample_stats,
        "zorder_events": q_zorder_events,
        "weighted_sample": q_weighted_sample,
        "dsir_weights": q_dsir_weights,
        "temperature_mixture": q_temperature_mixture,
        "html_extract": q_html_extract,
        "event_value_outliers": q_event_value_outliers,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "duplicate_groups": q_duplicate_groups,
        "embedding_near_dups": q_embedding_near_dups,
        "minhash_dedup_incremental": q_minhash_dedup_incremental,
        "language_id": q_language_id,
        "hash_split": q_hash_split,
        "stratified_sample": q_stratified_sample,
        "unicode_clean": q_unicode_clean,
        "top_orders_per_customer": q_top_orders_per_customer,
        "events_user_stats": q_events_user_stats,
        "orders_priority_count": q_orders_priority_count,
        "shipping_priority": q_shipping_priority,
        "large_orders": q_large_orders,
        "text_stats": q_text_stats,
        "emb_cosine_pairs_blocked": q_emb_cosine_pairs_blocked,
        "events_time_rollup": q_events_time_rollup,
        "events_range_clicks": q_events_range_clicks,
        "gopher_filters": q_gopher_filters,
        "c4_clean": q_c4_clean,
        "length_quantiles": q_length_quantiles,
        "minhash_signatures": q_minhash_signatures,
        "simhash_sketches": q_simhash_sketches,
        "repetition_stats": q_repetition_stats,
        "corpus_stats": q_corpus_stats,
        "ngram_contamination": q_ngram_contamination,
        "redact_pii": q_redact_pii,
        "sequence_bins": q_sequence_bins,
        "shuffle_shards": q_shuffle_shards,
        "dedup_incremental": q_dedup_incremental,
        "remove_spans": q_remove_spans,
        "bmp_pixel_stats": q_bmp_pixel_stats,
        "semdedup": q_semdedup,
        "decontaminate_spans": q_decontaminate_spans,
        "jpeg_subsampled_stats": q_jpeg_subsampled_stats,
        "jpeg_progressive_stats": q_jpeg_progressive_stats,
    }
    ordered = {n: all_q[n] for n in _WINDOW}
    ordered.update((n, f) for n, f in all_q.items() if n not in ordered)
    return ordered


# The driver-verified window: exactly the first 50 names queries()
# yields. See the queries() docstring for this round's rotation policy.
_WINDOW = [
    # §2 core (24, permanent)
    "knn_euclidean", "knn_cosine", "radius_search",
    "knn_filtered_language", "knn_join_topk", "ann_knn_join",
    "ivf_knn_join", "pq_adc_knn", "listing_pagination",
    "listing_lexicographic", "point_lookup", "collection_stats",
    "filter_lang_and", "filter_lang_in_or_contains",
    "filter_lang_json_props", "filter_lang_matches", "pricing_summary",
    "revenue_by_nation", "segment_customers_setop",
    "events_asof_purchase", "embed_text_stub", "png_pixel_stats",
    "token_quota", "warc_roundtrip",
    # result-bearing code changed this round (25-26): progressive
    # decode gained DRI/RSTn restarts; hashed_doc_vector gained the
    # xxhash64 production option (oracle branch stays md5)
    "jpeg_progressive_stats", "hashed_doc_embedding",
    # oldest driver check first: the two r05 leftovers (27-28)
    "text_stats", "top_orders_per_customer",
    # the full r06 cohort (29-40)
    "bmp_pixel_stats", "decontaminate_spans", "dedup_exact",
    "duplicate_groups", "embedding_near_dups", "hash_split",
    "language_id", "minhash_dedup_incremental", "ngram_jaccard_pairs",
    "semdedup", "stratified_sample", "unicode_clean",
    # alphabetically-first 10 of the r07 cohort (41-50); the
    # remaining 14 wait a round
    "bigram_perplexity", "bloom_dedup", "bm25_search",
    "dedup_keep_best", "doc_novelty", "dsir_weights", "dup_stats",
    "duplicate_spans", "event_value_outliers", "frequent_terms",
]


# --------------------------------------------------------------------
# oracle SQL (DuckDB dialect) — keys must match queries()
# --------------------------------------------------------------------

_EUC = (
    "sqrt(list_sum(list_transform(list_zip(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])),"
    " x -> (x[1] - x[2])^2)))"
)
_DOT = (
    "list_sum(list_transform(list_zip(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])),"
    " x -> x[1] * x[2]))"
)
_NORM = "sqrt(list_sum(list_transform(CAST({a} AS DOUBLE[]), x -> x * x)))"
_COS_DIST = (
    "acos(least(greatest(" + _DOT + " / (" + _NORM.format(a="{a}") + " * "
    + _NORM.format(a="{b}") + "), -1.0), 1.0)) / pi()"
)
_QV = "(SELECT embedding FROM embeddings WHERE vec_id = 0)"
_WORDS = "list_filter(string_split_regex(lower({t}), '[^\\p{{L}}\\p{{N}}'']+'), x -> x != '')"
_BIGRAMS = (
    "list_distinct(list_transform(generate_series(1, greatest(len({w}) - 1, 0)),"
    " i -> {w}[i] || ' ' || {w}[i+1]))"
)


def oracle_sql() -> dict[str, str]:
    euc_q = _EUC.format(a="e.embedding", b=_QV)
    cos_q = _COS_DIST.format(a="e.embedding", b=_QV)
    words = _WORDS.format(t="text")
    fp = "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))"
    return {
        "knn_euclidean": f"""
            SELECT e.vec_id AS id, round({euc_q}, 6) AS distance
            FROM embeddings e ORDER BY {euc_q}, e.vec_id LIMIT 10
        """,
        "knn_cosine": f"""
            SELECT e.vec_id AS id, round({cos_q}, 6) AS distance
            FROM embeddings e ORDER BY {cos_q}, e.vec_id LIMIT 10
        """,
        "radius_search": f"""
            SELECT e.vec_id AS id, round({euc_q}, 6) AS distance
            FROM embeddings e WHERE {euc_q} <= 1.3
        """,
        "knn_filtered_language": f"""
            SELECT e.vec_id AS id, round({euc_q}, 6) AS distance
            FROM embeddings e WHERE e.label IN (1, 3, 5)
            ORDER BY {euc_q}, e.vec_id LIMIT 10
        """,
        "knn_join_topk": f"""
            WITH d AS (
              SELECT q.vec_id AS query_id, e.vec_id AS id,
                     {_EUC.format(a="e.embedding", b="q.embedding")} AS dist
              FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 5) q
            )
            SELECT query_id, id, round(dist, 6) AS distance
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, id) rn FROM d)
            WHERE rn <= 5
        """,
        "listing_pagination": """
            SELECT vec_id AS id, CAST(label AS BIGINT) AS label
            FROM embeddings ORDER BY vec_id LIMIT 50 OFFSET 100
        """,
        "point_lookup": """
            SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
                   CAST(len(embedding) AS BIGINT) AS dims
            FROM embeddings WHERE vec_id = 123
        """,
        "collection_stats": """
            SELECT count(*) AS doc_count, CAST(max(len(embedding)) AS BIGINT) AS dims,
                   CAST(count(DISTINCT label) AS BIGINT) AS labels
            FROM embeddings
        """,
        "filter_lang_and": """
            SELECT event_id FROM events WHERE event_type = 'click' AND value > 50
        """,
        "filter_lang_in_or_contains": """
            SELECT event_id FROM events
            WHERE event_type IN ('view', 'signup') OR event_type LIKE '%err%'
        """,
        "filter_lang_json_props": """
            SELECT event_id, user_id FROM events
            WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
              AND CAST(json_extract(props, '$.k') AS BIGINT) < 80
        """,
        "filter_lang_matches": """
            SELECT event_id FROM events WHERE regexp_matches(event_type, '^(click|view)$')
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
                     AS sum_disc_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                        * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))) AS DOUBLE)
                     AS sum_charge,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
                     AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice AS totalprice, CAST(rk AS BIGINT) AS rk
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) rk
                  FROM orders)
            WHERE rk <= 3
        """,
        "events_user_stats": """
            SELECT user_id, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
            FROM events GROUP BY user_id
        """,
        "segment_customers_setop": """
            SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        """,
        "orders_priority_count": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
            GROUP BY o_orderpriority
        """,
        "shipping_priority": """
            SELECT l_orderkey,
                   CAST(rev AS DOUBLE) AS revenue,
                   o_orderdate, o_orderpriority
            FROM (
              SELECT l_orderkey, o_orderdate, o_orderpriority,
                     sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS rev
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
                AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
              GROUP BY l_orderkey, o_orderdate, o_orderpriority
            )
            ORDER BY rev DESC, l_orderkey ASC
            LIMIT 10
        """,
        "large_orders": """
            SELECT c_custkey, c_name, o_orderkey, o_orderdate,
                   o_totalprice AS totalprice,
                   CAST(qty AS DOUBLE) AS sum_qty
            FROM orders
            JOIN (SELECT l_orderkey,
                         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) >= 250) big
              ON o_orderkey = big.l_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
        "text_stats": f"""
            SELECT doc_id,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
                   CAST(len({words}) AS BIGINT) AS n_words,
                   CAST(length(text) AS BIGINT) AS n_chars_actual
            FROM documents
        """,
        "dedup_exact": f"""
            WITH f AS (SELECT doc_id, {fp} AS fp FROM documents),
            g AS (SELECT fp, min(doc_id) AS group_min_id, count(*) AS group_size FROM f GROUP BY fp)
            SELECT f.doc_id, f.fp, g.group_min_id, CAST(g.group_size AS BIGINT) AS group_size
            FROM f JOIN g USING (fp)
        """,
        "ngram_jaccard_pairs": f"""
            WITH toks AS (SELECT doc_id, {words} AS w FROM documents),
            sh AS (SELECT doc_id, unnest({_BIGRAMS.format(w="w")}) AS sh FROM toks),
            sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
            common AS (
              SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS c
              FROM sh l JOIN sh r ON l.sh = r.sh AND l.doc_id < r.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON id_a = sa.doc_id
            JOIN sizes sb ON id_b = sb.doc_id
            WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
        """,
        "emb_cosine_pairs_blocked": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round({_COS_DIST.format(a="a.embedding", b="b.embedding")}, 6) AS distance
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE {_COS_DIST.format(a="a.embedding", b="b.embedding")} <= 0.41
        """,
        "minhash_signatures": _minhash_oracle_sql(),
        "simhash_sketches": _simhash_oracle_sql(),
        "minhash_near_dups": _minhash_near_dups_oracle_sql(),
        "simhash_near_dups": _simhash_near_dups_oracle_sql(),
        "duplicate_groups": _duplicate_groups_oracle_sql(),
        "language_id": _language_id_oracle_sql(),
        "ann_knn_join": _ann_knn_join_oracle_sql(),
        "embedding_near_dups": _embedding_near_dups_oracle_sql(),
        "events_asof_purchase": """
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'view'),
            r AS (SELECT user_id, ts, max(value) AS pval FROM events
                  WHERE event_type = 'purchase' GROUP BY user_id, ts)
            SELECT l.event_id, epoch_us(l.ts) AS ts_us, l.user_id,
                   round(r.pval, 6) AS purchase_value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "gopher_filters": _gopher_filters_oracle_sql(),
        "bm25_search": _bm25_oracle_sql(),
        "decontaminate_spans": _decontaminate_spans_oracle_sql(),
        "winnow_fingerprints": f"""
            WITH toks AS (SELECT doc_id, {words} AS w FROM documents),
            grams AS (
              SELECT doc_id,
                     list_transform(
                         generate_series(1, greatest(len(w) - 4, 0)),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              || ' ' || w[i+3] || ' ' || w[i+4]) AS g
              FROM toks
            ),
            hashes AS (
              SELECT doc_id,
                     list_transform(g,
                         x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS h
              FROM grams
            ),
            sel AS (
              SELECT doc_id,
                     list_transform(
                         generate_series(0, len(h) - 4),
                         i -> {{'pos': list_max(list_filter(
                                          generate_series(i, i + 3),
                                          j -> h[j+1] = list_min(h[i+1:i+4]))),
                               'fp': list_min(h[i+1:i+4])}}) AS s
              FROM hashes WHERE len(h) >= 4
            )
            SELECT DISTINCT doc_id, u.pos AS pos, u.fp AS fp
            FROM sel, unnest(s) AS t(u)
        """,
        "length_quantiles": f"""
            WITH nw AS (SELECT source, len({words}) AS n FROM documents)
            SELECT source,
                   count(*) AS n_docs,
                   min(n) AS min_words,
                   max(n) AS max_words,
                   round(avg(n), 6) AS mean_words,
                   round(quantile_cont(n, 0.5), 6) AS p50,
                   round(quantile_cont(n, 0.9), 6) AS p90,
                   round(quantile_cont(n, 0.99), 6) AS p99
            FROM nw GROUP BY source
        """,
        "hybrid_rank_fusion": f"""
            WITH eu AS (
              SELECT e.vec_id AS doc_id,
                     row_number() OVER (ORDER BY {euc_q}, e.vec_id) AS rk
              FROM embeddings e ORDER BY {euc_q}, e.vec_id LIMIT 20
            ),
            co AS (
              SELECT e.vec_id AS doc_id,
                     row_number() OVER (ORDER BY {cos_q}, e.vec_id) AS rk
              FROM embeddings e ORDER BY {cos_q}, e.vec_id LIMIT 20
            ),
            u AS (
              SELECT doc_id, 1.0 / (60 + rk) AS rrf FROM eu
              UNION ALL
              SELECT doc_id, 1.0 / (60 + rk) AS rrf FROM co
            )
            SELECT doc_id, round(sum(rrf), 6) AS rrf_score
            FROM u GROUP BY doc_id
            ORDER BY sum(rrf) DESC, doc_id LIMIT 10
        """,
        "c4_clean": r"""
            WITH planted AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 3 = 0
                             THEN '. And one more thing.' ELSE '' END
                     || CASE WHEN doc_id % 5 = 0 THEN ' {' ELSE '' END
                         AS text
              FROM documents
            ),
            base AS (
              SELECT doc_id, text, string_split(text, chr(10)) AS lines
              FROM planted
            ),
            cleaned AS (
              SELECT doc_id, lines,
                     list_filter(lines, l ->
                         (ends_with(l, '.') OR ends_with(l, '!')
                          OR ends_with(l, '?') OR ends_with(l, '"'))
                         AND len(list_filter(
                                 string_split_regex(trim(l), '\s+'),
                                 w -> w != '')) >= 3) AS kept,
                     contains(lower(text), 'lorem ipsum') AS has_lorem,
                     contains(text, '{') AS has_brace
              FROM base
            ),
            meas AS (
              SELECT doc_id, lines, kept, has_lorem, has_brace,
                     coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
                     len(string_split_regex(
                         coalesce(array_to_string(kept, chr(10)), ''),
                         '[.!?]+')) - 1
                         AS n_sentences
              FROM cleaned
            )
            SELECT doc_id, clean_text,
                   len(lines) AS n_lines,
                   len(kept) AS n_kept_lines,
                   n_sentences,
                   NOT has_lorem AS ok_no_lorem,
                   NOT has_brace AS ok_no_brace,
                   (n_sentences >= 1) AS ok_min_sentences,
                   (NOT has_lorem AND NOT has_brace AND n_sentences >= 1)
                       AS keep
            FROM meas
        """,
        "media_frame_samples": """
            WITH m AS (SELECT doc_id, length(text) AS dur,
                              (('0x' || substr(md5(text), 1, 16))::UBIGINT >> 1)
                                  AS base
                       FROM documents)
            SELECT doc_id, ts AS frame_ts_ms,
                   ((base + ts::UBIGINT) % 4611686018427387904)::BIGINT
                       AS frame_seed
            FROM m, unnest(generate_series(0, dur - 1, 500)) AS t(ts)
            WHERE dur > 0
        """,
        "events_range_clicks": """
            SELECT l.event_id, l.user_id, count(*) AS n_nearby_clicks
            FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
                  WHERE event_type = 'error') l
            JOIN (SELECT user_id, epoch_us(ts) AS us FROM events
                  WHERE event_type = 'click') r
              ON l.user_id = r.user_id
             AND r.us BETWEEN l.us - 21600000000 AND l.us + 21600000000
            GROUP BY 1, 2
        """,
        "events_time_rollup": """
            SELECT epoch_us(time_bucket(INTERVAL '1 day', ts)) AS bucket_us,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 6) AS sum_value,
                   round(avg(value), 6) AS avg_value
            FROM events
            GROUP BY 1, 2
        """,
        "repetition_stats": _repetition_stats_oracle_sql(),
        "dup_stats": _dup_stats_oracle_sql(),
        # exact-regime MG sketch: capacity >> distinct vocab, so the
        # summary equals the plain GROUP BY with a zero error bound
        "frequent_terms": f"""
            WITH toks AS (SELECT unnest({_WORDS.format(t='text')}) AS term
                          FROM documents)
            SELECT term, count(*) AS est_count,
                   CAST(0 AS BIGINT) AS err_bound
            FROM toks GROUP BY term
        """,
        "corpus_stats": f"""
            WITH toks AS (SELECT lang, source, len({words}) AS nt, length(text) AS nc
                          FROM documents)
            SELECT lang, source, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   CAST(sum(nc) AS BIGINT) AS n_chars,
                   round(avg(nt), 6) AS avg_tokens
            FROM toks GROUP BY lang, source
        """,
        "stratified_sample": """
            SELECT doc_id, source FROM documents
            WHERE ('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 10000
                  < (CASE WHEN source = 'src0' THEN 5000
                          WHEN source = 'src1' THEN 2500
                          ELSE 1000 END)
        """,
        "ngram_contamination": _ngram_contamination_oracle_sql(),
        "listing_lexicographic": """
            SELECT vec_id AS id, CAST(label AS BIGINT) AS label
            FROM embeddings ORDER BY CAST(vec_id AS VARCHAR) LIMIT 40 OFFSET 10
        """,
        "redact_pii": _redact_pii_oracle_sql(),
        "token_chunks": _token_chunks_oracle_sql(),
        "sequence_bins": f"""
            WITH t AS (SELECT doc_id, len({words}) AS nt FROM documents),
            r AS (SELECT doc_id,
                         sum(nt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - nt
                           AS prev
                  FROM t)
            SELECT doc_id, CAST(floor(prev / 256) AS BIGINT) AS bin_id,
                   CAST(prev % 256 AS BIGINT) AS bin_offset
            FROM r
        """,
        "token_quota": f"""
            WITH t AS (SELECT doc_id, source, len({words}) AS nt FROM documents),
            r AS (SELECT doc_id, source, nt,
                         sum(nt) OVER (PARTITION BY source ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) AS run
                  FROM t)
            SELECT doc_id, source, CAST(nt AS BIGINT) AS n_tokens
            FROM r WHERE run <= 300
        """,
        "shuffle_shards": """
            WITH k AS (
              SELECT doc_id,
                     ('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       AS sort_key
              FROM documents
            )
            SELECT doc_id, CAST(sort_key % 8 AS BIGINT) AS shard,
                   CAST(row_number() OVER (PARTITION BY sort_key % 8
                                           ORDER BY sort_key, doc_id) - 1 AS BIGINT) AS pos
            FROM k
        """,
        "dedup_incremental": f"""
            WITH new_batch AS (
              SELECT doc_id + 100000 AS doc_id,
                     CASE WHEN doc_id % 6 = 0 THEN text || ' modified' ELSE text END AS text
              FROM documents WHERE doc_id % 3 = 0
            ),
            corpus_fp AS (SELECT {fp} AS cfp FROM documents)
            SELECT n.doc_id
            FROM new_batch n
            WHERE NOT EXISTS (SELECT 1 FROM corpus_fp c WHERE c.cfp = {fp.replace("text", "n.text")})
        """,
        "duplicate_spans": _duplicate_spans_oracle_sql(),
        "remove_spans": _remove_spans_oracle_sql(),
        "line_dedup": _line_dedup_oracle_sql(),
        "pq_adc_knn": _pq_adc_oracle_sql(),
        "ivf_knn_join": _ivf_knn_join_oracle_sql(),
        "semdedup": _semdedup_oracle_sql(),
        "embedding_outliers": _embedding_outliers_oracle_sql(),
        "wordpiece_tokens": _wordpiece_oracle_sql(),
        "cluster_balanced_sample": _cluster_balanced_sample_oracle_sql(),
        "hash_split": _hash_split_oracle_sql(),
        "vocab_stats": f"""
            WITH toks AS (
              SELECT source, unnest({_WORDS.format(t="text")}) AS tok
              FROM documents
            )
            SELECT source, count(*) AS n_tokens,
                   count(DISTINCT tok) AS n_distinct_tokens,
                   round(count(DISTINCT tok) / CAST(count(*) AS DOUBLE), 9)
                     AS type_token_ratio
            FROM toks GROUP BY source
        """,
        "top_terms": f"""
            WITH toks AS (
              SELECT source, unnest({words}) AS term FROM documents
            ),
            counts AS (
              SELECT source, term, count(*) AS term_count
              FROM toks GROUP BY 1, 2
            )
            SELECT source, term, term_count, term_rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY term_count DESC, term) AS term_rank
              FROM counts
            ) WHERE term_rank <= 10
        """,
        "mixture_plan": f"""
            WITH counts AS (
              SELECT source, count(*) AS n_docs,
                     CAST(sum(len({words})) AS BIGINT) AS n_tokens
              FROM documents GROUP BY 1
            ),
            weighted AS (
              SELECT *, CASE WHEN source = 'src0' THEN 3.0
                             WHEN source = 'src1' THEN 2.0
                             ELSE 1.0 END AS w
              FROM counts
            ),
            norm AS (SELECT sum(w) AS wsum FROM weighted)
            SELECT source, n_docs, n_tokens,
                   round(w / wsum, 6) AS weight,
                   round(w / wsum * 50000, 6) AS target_tokens,
                   round(least(1.0, (w / wsum * 50000) / n_tokens), 6) AS rate,
                   round(least(1.0, (w / wsum * 50000) / n_tokens) * n_tokens, 6)
                     AS planned_tokens,
                   round(greatest(0.0, (w / wsum * 50000)
                         - least(1.0, (w / wsum * 50000) / n_tokens) * n_tokens), 6)
                     AS deficit
            FROM weighted CROSS JOIN norm
        """,
        "hashed_doc_embedding": f"""
            WITH t AS (SELECT doc_id, {words} AS ws FROM documents),
            p AS (
              SELECT doc_id, ws,
                     list_transform(ws, x ->
                       CAST({_MD5_INT.format(s="'hb42:' || x")} % 16 AS INT)) AS bs,
                     list_transform(ws, x ->
                       CASE WHEN {_MD5_INT.format(s="'hs42:' || x")} % 2 = 0
                            THEN 1 ELSE -1 END) AS ss
              FROM t
            ),
            v AS (
              SELECT doc_id,
                     CASE WHEN ws IS NULL THEN NULL ELSE
                       list_transform(generate_series(0, 15), j ->
                         CAST(coalesce(list_sum(list_transform(
                                list_zip(bs, ss),
                                q -> CASE WHEN q[1] = j THEN q[2] ELSE 0 END)), 0)
                              AS DOUBLE))
                     END AS v
              FROM p
            ),
            n AS (SELECT doc_id, v,
                         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
                  FROM v),
            final AS (
              SELECT doc_id,
                     CASE WHEN nrm = 0 THEN list_transform(v, x -> round(x, 6))
                          ELSE list_transform(v, x -> round(x / nrm, 6))
                     END AS vec
              FROM n
            )
            SELECT f.doc_id,
                   CAST(j.j AS INT) AS component_idx,
                   f.vec[j.j + 1] AS value
            FROM final f
            CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j
        """,
        "quality_score": _quality_score_oracle_sql(),
        "temperature_mixture": f"""
            WITH counts AS (
              SELECT source, count(*) AS n_docs,
                     CAST(sum(len({words})) AS BIGINT) AS n_tokens
              FROM documents GROUP BY 1
            ),
            weighted AS (
              SELECT *, pow(CAST(n_tokens AS DOUBLE), 0.5) AS w FROM counts
            ),
            norm AS (SELECT sum(w) AS wsum FROM weighted)
            SELECT source, n_docs, n_tokens,
                   round(w / wsum, 6) AS weight,
                   round(w / wsum * 50000, 6) AS target_tokens,
                   round(least(1.0, (w / wsum * 50000) / n_tokens), 6) AS rate,
                   round(least(1.0, (w / wsum * 50000) / n_tokens) * n_tokens, 6)
                     AS planned_tokens,
                   round(greatest(0.0, (w / wsum * 50000)
                         - least(1.0, (w / wsum * 50000) / n_tokens) * n_tokens), 6)
                     AS deficit
            FROM weighted CROSS JOIN norm
        """,
        "stratified_fixed_sample": """
            WITH counts AS (
              SELECT source, count(*) AS n FROM documents GROUP BY 1
            ),
            cand AS (
              SELECT d.doc_id, d.source, c.n,
                     ('0x' || substr(md5('k42:' || CAST(d.doc_id AS VARCHAR)),
                                     1, 15))::BIGINT AS hk
              FROM documents d JOIN counts c USING (source)
            ),
            f AS (
              SELECT * FROM cand
              WHERE CAST(hk AS DOUBLE)
                    < least(1.0, 80.0 / n) * 1152921504606846976.0
            ),
            r AS (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY hk, doc_id) AS sample_rank
              FROM f
            )
            SELECT doc_id, source, sample_rank FROM r WHERE sample_rank <= 20
        """,
        "session_stats": """
            WITH s AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts > lag(ts) OVER w + INTERVAL 6 HOUR
                          THEN 1 ELSE 0 END AS b
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            x AS (
              SELECT user_id, ts,
                     CAST(sum(b) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS session_seq
              FROM s
            )
            SELECT user_id, session_seq,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events,
                   epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
            FROM x GROUP BY 1, 2
        """,
        "dsir_weights": f"""
            WITH feats AS (
              SELECT doc_id, (lang = 'en') AS t,
                     list_concat(
                       {words},
                       list_transform(
                         generate_series(1, greatest(len({words}) - 1, 0)),
                         i -> {words}[i] || ' ' || {words}[i+1])
                     ) AS fs
              FROM documents
            ),
            exploded AS (
              SELECT doc_id, t,
                     ('0x' || substr(md5('d42:' || unnest(fs)), 1, 15))::BIGINT
                       % 10000 AS bkt
              FROM feats
            ),
            counts AS (
              SELECT bkt, sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
                     count(*) AS cr
              FROM exploded GROUP BY 1
            ),
            scal AS (
              SELECT CAST(sum(ct) AS DOUBLE) AS nt,
                     CAST(sum(cr) AS DOUBLE) AS nr
              FROM counts
            ),
            scored AS (
              SELECT e.doc_id,
                     ln((coalesce(c.ct, 0) + 1.0) / (s.nt + 10000.0))
                     - ln((coalesce(c.cr, 0) + 1.0) / (s.nr + 10000.0)) AS lr
              FROM exploded e LEFT JOIN counts c USING (bkt) CROSS JOIN scal s
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_feats, sum(lr) AS logw
              FROM scored GROUP BY 1
            )
            SELECT d.doc_id, coalesce(a.n_feats, 0) AS n_feats,
                   round(a.logw, 6) AS logw
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "lm_perplexity": f"""
            WITH toks AS (
              SELECT doc_id, unnest({words}) AS token FROM documents
            ),
            counts AS (
              SELECT token, count(*) AS c FROM toks
              GROUP BY 1 HAVING count(*) >= 2
            ),
            scal AS (
              SELECT CAST(sum(c) AS DOUBLE) AS n,
                     CAST(count(*) AS DOUBLE) AS v
              FROM counts
            ),
            vocab AS (
              SELECT token, ln((c + 0.5) / (n + 0.5 * (v + 1))) AS logp
              FROM counts CROSS JOIN scal
            ),
            oovv AS (SELECT ln(0.5 / (n + 0.5 * (v + 1))) AS oov FROM scal),
            scored AS (
              SELECT t.doc_id, coalesce(vb.logp, o.oov) AS lp
              FROM toks t LEFT JOIN vocab vb USING (token) CROSS JOIN oovv o
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_tokens, -sum(lp) / count(*) AS logppl
              FROM scored GROUP BY 1
            )
            SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
                   round(a.logppl, 6) AS logppl
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "minhash_dedup_incremental": _minhash_dedup_incremental_oracle_sql(),
        "bigram_perplexity": f"""
            WITH toks AS (
              SELECT doc_id, {words} AS w FROM documents
            ),
            pairs AS (
              SELECT doc_id,
                     CASE WHEN i = 1 THEN NULL ELSE w[i - 1] END AS prev,
                     w[i] AS cur
              FROM toks, unnest(generate_series(1, len(w))) AS u(i)
            ),
            bic AS (
              SELECT prev, cur, count(*) AS c FROM pairs
              WHERE prev IS NOT NULL
              GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            ctx AS (SELECT prev, sum(c) AS ck FROM bic GROUP BY 1),
            counts AS (
              SELECT cur AS token, count(*) AS c FROM pairs
              GROUP BY 1 HAVING count(*) >= 2
            ),
            scal AS (
              SELECT CAST(sum(c) AS DOUBLE) AS n,
                     CAST(count(*) AS DOUBLE) AS v
              FROM counts
            ),
            vocab AS (
              SELECT token, ln((c + 0.5) / (n + 0.5 * (v + 1))) AS logp
              FROM counts CROSS JOIN scal
            ),
            oovv AS (SELECT ln(0.5 / (n + 0.5 * (v + 1))) AS oov FROM scal),
            scored AS (
              SELECT p.doc_id,
                     ln(CASE WHEN cx.prev IS NOT NULL
                             THEN 0.7 * coalesce(
                                    CAST(b.c AS DOUBLE) / CAST(cx.ck AS DOUBLE), 0)
                                  + (1.0 - 0.7) * exp(coalesce(vb.logp, o.oov))
                             ELSE exp(coalesce(vb.logp, o.oov)) END) AS lp
              FROM pairs p
              LEFT JOIN vocab vb ON vb.token = p.cur
              LEFT JOIN bic b ON b.prev = p.prev AND b.cur = p.cur
              LEFT JOIN ctx cx ON cx.prev = p.prev
              CROSS JOIN oovv o
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_tokens,
                     -sum(lp) / count(*) AS logppl
              FROM scored GROUP BY 1
            )
            SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
                   round(a.logppl, 6) AS logppl
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "embed_text_stub": r"""
            WITH comps AS (
              SELECT doc_id,
                     list_transform(range(0, 16),
                       j -> ('0x' || substr(md5(text || '|' || CAST(j AS VARCHAR)), 1, 8))::BIGINT
                            / 4294967296.0 - 0.5) AS x
              FROM documents
            ),
            n AS (
              SELECT doc_id, x,
                     sqrt(list_sum(list_transform(x, v -> v * v))) AS nrm
              FROM comps
            )
            SELECT doc_id, CAST(16 AS BIGINT) AS dims,
                   round(x[1] / nrm, 6) AS e0,
                   round(x[9] / nrm, 6) AS e8,
                   round(x[16] / nrm, 6) AS e15
            FROM n
        """,
        "dedup_normalized": r"""
            WITH keyed AS (
              SELECT doc_id,
                     ('0x' || substr(md5(trim(regexp_replace(
                         lower(coalesce(text, '')), '[^\p{L}\p{N}]+', ' ', 'g'
                     ))), 1, 15))::BIGINT AS nfp
              FROM documents
            ),
            keep AS (SELECT min(doc_id) AS doc_id FROM keyed GROUP BY nfp)
            SELECT d.doc_id, d.lang, d.source
            FROM documents d JOIN keep USING (doc_id)
        """,
        "tfidf_top_terms": f"""
            WITH toks AS (
              SELECT doc_id, unnest({words}) AS term FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            dfc AS (SELECT term, count(*) AS df_count FROM tf GROUP BY 1),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            scored AS (
              SELECT doc_id, term, tf, df_count,
                     tf * (ln((n + 1) / (df_count + 1)) + 1) AS s
              FROM tf JOIN dfc USING (term) CROSS JOIN nn
            )
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
                   CAST(df_count AS BIGINT) AS df_count,
                   round(s, 6) AS tfidf, CAST(term_rank AS BIGINT) AS term_rank
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY s DESC, term) AS term_rank
              FROM scored
            ) WHERE term_rank <= 3
        """,
        "weighted_sample": """
            SELECT doc_id, n_chars, round(sk, 6) AS sample_key FROM (
              SELECT doc_id, n_chars,
                     pow(((('0x' || substr(md5('w42:' || CAST(doc_id AS VARCHAR)),
                            1, 15))::BIGINT % 1000000) + 1) / 1000001.0,
                         1.0 / CAST(n_chars AS DOUBLE)) AS sk
              FROM documents WHERE CAST(n_chars AS DOUBLE) > 0
            ) ORDER BY sk DESC, doc_id LIMIT 100
        """,
        "token_frequency_spectrum": f"""
            WITH toks AS (
              SELECT unnest({words}) AS term FROM documents
            ),
            counts AS (SELECT term, count(*) AS c FROM toks GROUP BY 1)
            SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS freq_bucket,
                   count(*) AS n_terms,
                   CAST(sum(c) AS BIGINT) AS n_occurrences
            FROM counts GROUP BY 1
        """,
        "perplexity_bands": f"""
            WITH toks AS (
              SELECT doc_id, unnest({words}) AS token FROM documents
            ),
            counts AS (
              SELECT token, count(*) AS c FROM toks
              GROUP BY 1 HAVING count(*) >= 2
            ),
            scal AS (
              SELECT CAST(sum(c) AS DOUBLE) AS n,
                     CAST(count(*) AS DOUBLE) AS v
              FROM counts
            ),
            vocab AS (
              SELECT token, ln((c + 0.5) / (n + 0.5 * (v + 1))) AS logp
              FROM counts CROSS JOIN scal
            ),
            oovv AS (SELECT ln(0.5 / (n + 0.5 * (v + 1))) AS oov FROM scal),
            scored AS (
              SELECT t.doc_id, coalesce(vb.logp, o.oov) AS lp
              FROM toks t LEFT JOIN vocab vb USING (token) CROSS JOIN oovv o
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_tokens, -sum(lp) / count(*) AS logppl
              FROM scored GROUP BY 1
            ),
            sdocs AS (
              SELECT d.doc_id, d.lang AS stratum,
                     coalesce(a.n_tokens, 0) AS n_tokens,
                     round(a.logppl, 6) AS b
              FROM documents d LEFT JOIN agg a USING (doc_id)
            ),
            hist AS (
              SELECT stratum, b, count(*) AS c FROM sdocs
              WHERE b IS NOT NULL GROUP BY 1, 2
            ),
            cum AS (
              SELECT stratum, b,
                     sum(c) OVER (PARTITION BY stratum ORDER BY b) AS cumc,
                     sum(c) OVER (PARTITION BY stratum) AS nn
              FROM hist
            ),
            bounds AS (
              SELECT stratum,
                     min(CASE WHEN cumc >= ceil(nn * 1 / 3.0) THEN b END) AS b1,
                     min(CASE WHEN cumc >= ceil(nn * 2 / 3.0) THEN b END) AS b2
              FROM cum GROUP BY 1
            )
            SELECT s.doc_id, s.stratum, CAST(s.n_tokens AS BIGINT) AS n_tokens,
                   s.b AS logppl,
                   CASE WHEN s.b IS NULL THEN NULL
                        ELSE CAST(1 + (CASE WHEN s.b > bo.b1 THEN 1 ELSE 0 END)
                                    + (CASE WHEN s.b > bo.b2 THEN 1 ELSE 0 END)
                             AS BIGINT) END AS ppl_band
            FROM sdocs s LEFT JOIN bounds bo USING (stratum)
        """,
        "profile_documents": """
            SELECT 'doc_id' AS "column", 'bigint' AS dtype,
                   count(*) AS n_rows,
                   count(*) - count(doc_id) AS n_nulls,
                   count(DISTINCT doc_id) AS n_distinct,
                   CAST(min(doc_id) AS VARCHAR) AS min_value,
                   CAST(max(doc_id) AS VARCHAR) AS max_value
            FROM documents
            UNION ALL
            SELECT 'text', 'string', count(*), count(*) - count(text),
                   count(DISTINCT text),
                   CAST(min(text) AS VARCHAR), CAST(max(text) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'lang', 'string', count(*), count(*) - count(lang),
                   count(DISTINCT lang),
                   CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'source', 'string', count(*), count(*) - count(source),
                   count(DISTINCT source),
                   CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'n_chars', 'bigint', count(*), count(*) - count(n_chars),
                   count(DISTINCT n_chars),
                   CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
            FROM documents
        """,
        "zorder_events": _zorder_oracle_sql(),
        "url_dedup": f"""
            WITH {_URLS_CTE},
            {_URL_NORM_CTE},
            reps AS (
              SELECT ('0x' || substr(md5(norm_url), 1, 15))::BIGINT AS uk,
                     min(doc_id) AS doc_id,
                     CAST(count(*) AS BIGINT) AS n_url_dups
              FROM normed GROUP BY 1
            )
            SELECT r.doc_id, n.source, n.norm_url, r.n_url_dups
            FROM reps r JOIN normed n ON r.doc_id = n.doc_id
        """,
        "domain_caps": f"""
            WITH {_URLS_CTE},
            hosts AS (
              SELECT doc_id, source,
                     lower(regexp_extract(
                       regexp_replace(
                         regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''),
                         '^[^/?#@]*@', ''),
                       '^([^/?#:]*)', 1)) AS host
              FROM urls
            ),
            doms AS (SELECT doc_id, source, {_DOMAIN_EXPR} AS domain FROM hosts)
            SELECT doc_id, source, domain, domain_rank FROM (
              SELECT *, CAST(row_number() OVER (
                PARTITION BY domain ORDER BY doc_id) AS BIGINT) AS domain_rank
              FROM doms
            ) WHERE domain_rank <= 10
        """,
        "domain_blocklist": f"""
            WITH {_URLS_CTE},
            hosts AS (
              SELECT doc_id, source,
                     lower(regexp_extract(
                       regexp_replace(
                         regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''),
                         '^[^/?#@]*@', ''),
                       '^([^/?#:]*)', 1)) AS host
              FROM urls
            ),
            doms AS (SELECT doc_id, source, {_DOMAIN_EXPR} AS domain FROM hosts)
            SELECT doc_id, source, domain FROM doms
            WHERE domain NOT IN ('src1.com', 'src2.co.uk', 'src15.com')
        """,
        "html_extract": _html_extract_oracle_sql(),
        "source_distinct_terms": f"""
            WITH toks AS (
              SELECT source, unnest({_WORDS.format(t="text")}) AS term
              FROM documents
            )
            SELECT source, CAST(count(DISTINCT term) AS BIGINT) AS n_distinct
            FROM toks GROUP BY source
        """,
        "doc_novelty": f"""
            WITH toks AS (SELECT doc_id, {words} AS w FROM documents),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                         generate_series(1, greatest(len(w) - 4, 0)),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              || ' ' || w[i+3] || ' ' || w[i+4])) AS g
              FROM toks
            ),
            gx AS (
              SELECT doc_id, ('0x' || substr(md5(u), 1, 15))::BIGINT AS h
              FROM grams, unnest(g) AS t(u)
            ),
            dfc AS (SELECT h, count(*) AS df FROM gx GROUP BY h),
            per AS (
              SELECT doc_id,
                     count(*) AS n_shingles,
                     CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_unique
              FROM gx JOIN dfc USING (h) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(p.n_shingles, 0) AS n_shingles,
                   coalesce(p.n_unique, 0) AS n_unique,
                   CASE WHEN p.n_shingles > 0
                        THEN round(p.n_unique / CAST(p.n_shingles AS DOUBLE), 6)
                   END AS novelty
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        "event_value_outliers": """
            WITH ev AS (
              SELECT event_id, event_type, value,
                     round(value, 2) AS x
              FROM events
            ),
            h1 AS (
              SELECT event_type, x AS b, count(*) AS c
              FROM ev WHERE x IS NOT NULL GROUP BY 1, 2
            ),
            c1 AS (
              SELECT event_type, b,
                     sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cm,
                     sum(c) OVER (PARTITION BY event_type) AS n
              FROM h1
            ),
            med AS (
              SELECT event_type,
                     min(CASE WHEN cm >= ceil(n * 0.5) THEN b END) AS median
              FROM c1 GROUP BY 1
            ),
            dev AS (
              SELECT e.event_id, e.event_type, e.value, m.median,
                     round(abs(e.x - m.median), 2) AS d
              FROM ev e LEFT JOIN med m USING (event_type)
            ),
            h2 AS (
              SELECT event_type, d AS b, count(*) AS c
              FROM dev WHERE d IS NOT NULL GROUP BY 1, 2
            ),
            c2 AS (
              SELECT event_type, b,
                     sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cm,
                     sum(c) OVER (PARTITION BY event_type) AS n
              FROM h2
            ),
            mad AS (
              SELECT event_type,
                     min(CASE WHEN cm >= ceil(n * 0.5) THEN b END) AS mad
              FROM c2 GROUP BY 1
            ),
            scored AS (
              SELECT d.event_id, d.event_type, d.value, d.median, a.mad,
                     CASE WHEN a.mad > 0
                          THEN round(0.6745 * d.d / a.mad, 6) END AS robust_z,
                     d.d
              FROM dev d LEFT JOIN mad a USING (event_type)
            )
            SELECT event_id, event_type, value, median, mad, robust_z,
                   CASE WHEN d IS NULL THEN false
                        ELSE coalesce(robust_z > 3.5, d > 0) END AS is_outlier
            FROM scored
        """,
        "fuzzy_title_pairs": """
            WITH t AS (
              SELECT DISTINCT substr(text, 1, 12) AS s
              FROM documents WHERE text IS NOT NULL
            )
            SELECT a.s AS s_a, b.s AS s_b,
                   CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
            FROM t a JOIN t b ON a.s < b.s
            WHERE levenshtein(a.s, b.s) <= 1
        """,
        "histogram_quantiles": """
            WITH hist AS (
              SELECT lang, n_chars AS b, count(*) AS c
              FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
            ),
            cum AS (
              SELECT lang, b,
                     sum(c) OVER (PARTITION BY lang ORDER BY b) AS cm,
                     sum(c) OVER (PARTITION BY lang) AS n
              FROM hist
            ),
            bounds AS (
              SELECT lang,
                     min(CASE WHEN cm >= ceil(n * 0.5) THEN b END) AS q0,
                     min(CASE WHEN cm >= ceil(n * 0.9) THEN b END) AS q1,
                     min(CASE WHEN cm >= ceil(n * 0.99) THEN b END) AS q2
              FROM cum GROUP BY lang
            )
            SELECT lang, CAST(0.5 AS DOUBLE) AS prob, q0 AS value FROM bounds
            UNION ALL SELECT lang, CAST(0.9 AS DOUBLE), q1 FROM bounds
            UNION ALL SELECT lang, CAST(0.99 AS DOUBLE), q2 FROM bounds
        """,
        "salted_top_terms": f"""
            WITH toks AS (
              SELECT lang, unnest({_WORDS.format(t="text")}) AS term
              FROM documents
            ),
            counts AS (
              SELECT lang, term, CAST(count(*) AS BIGINT) AS term_count
              FROM toks GROUP BY 1, 2
            )
            SELECT lang, term, term_count, term_rank FROM (
              SELECT *, CAST(row_number() OVER (
                PARTITION BY lang ORDER BY term_count DESC, term) AS BIGINT)
                AS term_rank
              FROM counts
            ) WHERE term_rank <= 5
        """,
        # bloom membership: the oracle rebuilds the identical md5-derived
        # bit positions (functions/text.md5_long convention) and checks
        # them against the corpus's distinct-position set — semantically
        # the bitmap (a word bit is set iff some corpus key produced the
        # position), so false positives reproduce too
        "bloom_dedup": r"""
            WITH norm AS (
              SELECT doc_id, source,
                     trim(regexp_replace(lower(coalesce(text, '')),
                          '[^\p{L}\p{N}]+', ' ', 'g')) AS nt
              FROM documents
            ),
            bits AS (
              SELECT DISTINCT
                (('0x' || substr(md5(nt || ':' || i), 1, 15))::BIGINT) % 65536 AS bit
              FROM norm, generate_series(0, 4) t(i)
              WHERE length(source) = 4
            ),
            probe AS (
              SELECT doc_id,
                (('0x' || substr(md5(nt || ':' || i), 1, 15))::BIGINT) % 65536 AS bit
              FROM norm, generate_series(0, 4) t(i)
            )
            SELECT p.doc_id, bool_and(b.bit IS NOT NULL) AS bloom_hit
            FROM probe p LEFT JOIN bits b ON p.bit = b.bit
            GROUP BY p.doc_id
        """,
        "dedup_keep_best": _dedup_keep_best_oracle_sql(),
        "hard_negatives": f"""
            WITH d AS (
              SELECT q.vec_id AS query_id, e.vec_id AS id, e.label AS neg_label,
                     {_EUC.format(a="e.embedding", b="q.embedding")} AS dist
              FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 5) q
              WHERE e.label != q.label
            )
            SELECT query_id, id, CAST(neg_label AS BIGINT) AS neg_label,
                   round(dist, 6) AS distance
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY dist, id) rn FROM d)
            WHERE rn <= 5
        """,
        # char entropy: distinct chars SORTED before the float fold on
        # both engines -> identical IEEE summation order; the flag
        # compares the rounded value so the threshold is engine-exact
        "entropy_filter": """
            WITH ch AS (
              SELECT doc_id,
                     list_filter(string_split(coalesce(text, ''), ''),
                                 c -> c != '') AS cs
              FROM documents
            ),
            e AS (
              SELECT doc_id, CASE WHEN len(cs) = 0 THEN 0.0 ELSE
                -list_sum(list_transform(list_sort(list_distinct(cs)),
                   c -> (len(list_filter(cs, x -> x = c))::DOUBLE / len(cs))
                        * log2(len(list_filter(cs, x -> x = c))::DOUBLE
                               / len(cs)))) END AS ent
              FROM ch
            )
            SELECT doc_id, round(ent, 6) AS char_entropy,
                   round(ent, 6) < 4.0 AS low_entropy
            FROM e
        """,
        "leakage_split": _leakage_split_oracle_sql(),
        "mmr_rerank": _mmr_rerank_oracle_sql(),
        "unicode_clean": _unicode_clean_oracle_sql(),
        # media decode oracles: DuckDB recomputes the planted
        # generative formula directly; the Spark side must round-trip
        # genuine BMP/WAV bytes through the real decoders to match
        "bmp_pixel_stats": """
            WITH d AS (
              SELECT doc_id, 5 + doc_id % 4 AS w, 3 + doc_id % 3 AS h
              FROM documents WHERE doc_id < 48
            ),
            px AS (
              SELECT d.doc_id, d.w, d.h, c.c,
                     (d.doc_id*7 + x.x*3 + y.y*5 + c.c*11) % 256 AS v
              FROM d,
                   (SELECT unnest(generate_series(0, 7)) AS x) x,
                   (SELECT unnest(generate_series(0, 4)) AS y) y,
                   (SELECT unnest(generate_series(0, 2)) AS c) c
              WHERE x.x < d.w AND y.y < d.h
            )
            SELECT doc_id,
                   CAST(MAX(w) AS INT) AS width,
                   CAST(MAX(h) AS INT) AS height,
                   CAST(SUM(v) AS BIGINT) AS pix_sum,
                   CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
                   CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
                   CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
            FROM px GROUP BY doc_id
        """,
        "png_pixel_stats": """
            WITH d AS (
              SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
              FROM documents WHERE doc_id < 48
            ),
            px AS (
              SELECT d.doc_id, d.w, d.h, c.c,
                     (d.doc_id*11 + x.x*5 + y.y*7 + c.c*13) % 256 AS v
              FROM d,
                   (SELECT unnest(generate_series(0, 7)) AS x) x,
                   (SELECT unnest(generate_series(0, 5)) AS y) y,
                   (SELECT unnest(generate_series(0, 2)) AS c) c
              WHERE x.x < d.w AND y.y < d.h
            )
            SELECT doc_id,
                   CAST(MAX(w) AS INT) AS width,
                   CAST(MAX(h) AS INT) AS height,
                   CAST(SUM(v) AS BIGINT) AS pix_sum,
                   CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
                   CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
                   CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
            FROM px GROUP BY doc_id
        """,
        # flat even-valued blocks round-trip the lossy pipeline
        # bit-exactly (DC-only; quant 16 divides 8*(v-128)), so the
        # oracle replays the planted per-block constant directly
        "jpeg_pixel_stats": """
            WITH d AS (
              SELECT doc_id, 1 + doc_id % 3 AS nbw, 1 + doc_id % 2 AS nbh
              FROM documents WHERE doc_id < 48
            ),
            blk AS (
              SELECT d.doc_id, d.nbw, d.nbh,
                     2 * ((d.doc_id*7 + b.b*5) % 101) + 20 AS v
              FROM d, (SELECT unnest(generate_series(0, 5)) AS b) b
              WHERE b.b < d.nbw * d.nbh
            )
            SELECT doc_id,
                   CAST(MAX(nbw) * 8 AS INT) AS width,
                   CAST(MAX(nbh) * 8 AS INT) AS height,
                   CAST(SUM(v) * 64 AS BIGINT) AS pix_sum,
                   CAST(MIN(v) AS BIGINT) AS pix_min,
                   CAST(MAX(v) AS BIGINT) AS pix_max
            FROM blk GROUP BY doc_id
        """,
        "jpeg_progressive_stats": """
            WITH d AS (
              SELECT doc_id, 2 * (1 + doc_id % 2) AS nbw, 2 AS nbh
              FROM documents WHERE doc_id < 48
            ),
            blk AS (
              SELECT d.doc_id, d.nbw, d.nbh,
                     2 * ((d.doc_id*11 + b.b*7) % 101) + 24 AS v
              FROM d, (SELECT unnest(generate_series(0, 7)) AS b) b
              WHERE b.b < d.nbw * d.nbh
            )
            SELECT doc_id,
                   CAST(MAX(nbw) * 8 AS INT) AS width,
                   CAST(MAX(nbh) * 8 AS INT) AS height,
                   CAST(SUM(v) * 64 * 3 AS BIGINT) AS pix_sum,
                   CAST(MIN(v) AS BIGINT) AS pix_min,
                   CAST(MAX(v) AS BIGINT) AS pix_max
            FROM blk GROUP BY doc_id
        """,
        "jpeg_subsampled_stats": """
            WITH d AS (
              SELECT doc_id, 2 * (1 + doc_id % 2) AS nbw, 2 AS nbh
              FROM documents WHERE doc_id < 48
            ),
            blk AS (
              SELECT d.doc_id, d.nbw, d.nbh,
                     2 * ((d.doc_id*11 + b.b*7) % 101) + 24 AS v
              FROM d, (SELECT unnest(generate_series(0, 7)) AS b) b
              WHERE b.b < d.nbw * d.nbh
            )
            SELECT doc_id,
                   CAST(MAX(nbw) * 8 AS INT) AS width,
                   CAST(MAX(nbh) * 8 AS INT) AS height,
                   CAST(SUM(v) * 64 * 3 AS BIGINT) AS pix_sum,
                   CAST(MIN(v) AS BIGINT) AS pix_min,
                   CAST(MAX(v) AS BIGINT) AS pix_max
            FROM blk GROUP BY doc_id
        """,
        "wav_sample_stats": """
            WITH d AS (
              SELECT doc_id, 50 + doc_id % 17 AS n, 1 + doc_id % 2 AS ch
              FROM documents WHERE doc_id < 48
            ),
            s AS (
              SELECT d.doc_id, d.n, d.ch,
                     ((d.doc_id*13 + i.i*7 + k.k*3) % 65536) - 32768 AS v
              FROM d,
                   (SELECT unnest(generate_series(0, 66)) AS i) i,
                   (SELECT unnest(generate_series(0, 1)) AS k) k
              WHERE i.i < d.n AND k.k < d.ch
            )
            SELECT doc_id,
                   CAST(MAX(n) AS INT) AS n_frames,
                   CAST(MAX(ch) AS INT) AS channels,
                   CAST(SUM(v) AS BIGINT) AS samp_sum,
                   CAST(MIN(v) AS BIGINT) AS samp_min,
                   CAST(MAX(v) AS BIGINT) AS samp_max
            FROM s GROUP BY doc_id
        """,
        # WARC ingestion oracle: DuckDB reads the documents table
        # directly; the Spark side must survive a full WET
        # encode→(gzip)→strict-parse round trip to match
        "warc_roundtrip": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   strlen(text) AS payload_bytes,
                   md5(text) AS text_md5
            FROM documents WHERE doc_id < 512
        """,
        # exact regime (capacity >> vocab): the whole build → update →
        # compact → read store lifecycle must reproduce plain counts
        "mg_compacted_counts": f"""
            WITH toks AS (SELECT unnest({_WORDS.format(t='text')}) AS term
                          FROM documents)
            SELECT term, count(*) AS est_count,
                   CAST(0 AS BIGINT) AS err_bound
            FROM toks GROUP BY term
        """,
        # exact regime (capacity >> distinct lengths): the quantile
        # store lifecycle must reproduce the classic lower weighted
        # quantile — cumsum over plain counts
        "len_quantile_sketch": """
            WITH t AS (SELECT CAST(length(text) AS DOUBLE) AS v FROM documents),
            c AS (SELECT v, count(*) AS w FROM t GROUP BY v),
            r AS (SELECT v, sum(w) OVER (ORDER BY v) AS cw,
                         (SELECT count(*) FROM t) AS n
                  FROM c),
            qs AS (SELECT unnest(generate_series(1, 9)) / 10.0 AS q)
            SELECT q, min(v) AS value
            FROM r JOIN qs ON r.cw >= ceil(qs.q * r.n - 1e-9)
            GROUP BY q
        """,
    }


def _spans_oracle_ctes() -> str:
    """Shared CTE prefix for the span oracles: planted phrase,
    tokenizer, 5-gram seeding (space-joined, 0-based positions),
    md5-folded gram hash, ≥2-distinct-docs predicate, and the
    ``pos - row_number()`` islands merge, ending in a ``spans``
    relation (doc_id, span_start, span_end, span_tokens ≥ 10)."""
    words = _WORDS.format(t="t")
    phrase = " || ' ' || ".join(f"'g' || g || 'w{i}'" for i in range(12))
    gram = " || ' ' || ".join(f"w[i + {k}]" for k in range(5))
    return f"""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN text || ' ' || {phrase}
                      ELSE text END AS t
          FROM (SELECT doc_id, text, CAST(doc_id % 3 AS VARCHAR) AS g FROM documents)
        ),
        toks AS (SELECT doc_id, {words} AS w FROM planted),
        grams AS (
          SELECT doc_id, i - 1 AS pos,
                 ('0x' || substr(md5({gram}), 1, 15))::BIGINT AS gh
          FROM toks, unnest(generate_series(1, greatest(len(w) - 4, 0))) AS u(i)
        ),
        shared AS (
          SELECT gh FROM (SELECT gh, count(DISTINCT doc_id) AS nd FROM grams GROUP BY gh)
          WHERE nd >= 2
        ),
        dup AS (SELECT DISTINCT doc_id, pos FROM grams WHERE gh IN (SELECT gh FROM shared)),
        isl AS (
          SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM dup
        ),
        spans AS (
          SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end,
                 max(pos) + 4 - min(pos) + 1 AS span_tokens
          FROM isl GROUP BY doc_id, grp
          HAVING max(pos) + 4 - min(pos) + 1 >= 10
        )"""


def _duplicate_spans_oracle_sql() -> str:
    """DuckDB replica of q_duplicate_spans (see _spans_oracle_ctes)."""
    return f"""
        {_spans_oracle_ctes()}
        SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
               CAST(span_end AS BIGINT) AS span_end,
               CAST(span_tokens AS BIGINT) AS span_tokens
        FROM spans
    """


def _decontaminate_spans_oracle_sql() -> str:
    """DuckDB replica of q_decontaminate_spans: same planted phrase,
    positional 8-gram md5 hashes on the train side, distinct eval gram
    probe, islands per doc, every flagged span cut (no keeper), text
    rebuilt positionally (1-based lambda index → ``i - 1``)."""
    words = _WORDS.format(t="text")
    gram8 = " || ' ' || ".join(f"w[i+{j}]" for j in range(8))
    gh = f"('0x' || substr(md5({gram8}), 1, 15))::BIGINT"
    return f"""
        WITH train AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 11 = 0
                              THEN ' {_DECON_PHRASE}' ELSE '' END AS text
          FROM documents WHERE doc_id % 19 != 0
        ),
        ev AS (
          SELECT text || ' {_DECON_PHRASE}' AS text
          FROM documents WHERE doc_id % 19 = 0
        ),
        toks AS (SELECT doc_id, {words} AS w FROM train),
        grams AS (
          SELECT doc_id, i - 1 AS pos, {gh} AS gh
          FROM toks, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS g(i)
        ),
        etoks AS (SELECT {words} AS w FROM ev),
        eg AS (
          SELECT DISTINCT {gh} AS gh
          FROM etoks, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS g(i)
        ),
        hit AS (SELECT g.doc_id, g.pos FROM grams g JOIN eg USING (gh)),
        isl AS (
          SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM hit
        ),
        spans AS (
          SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
          FROM isl GROUP BY doc_id, grp
          HAVING max(pos) + 7 - min(pos) + 1 >= 8
        ),
        cuts AS (
          SELECT doc_id, list({{'s': s, 'e': e}}) AS cut_list,
                 count(*) AS n_cut
          FROM spans GROUP BY doc_id
        )
        SELECT t.doc_id,
               coalesce(CASE WHEN c.doc_id IS NULL THEN array_to_string(t.w, ' ')
                    ELSE array_to_string(
                      list_filter(t.w, (x, i) -> len(list_filter(c.cut_list,
                        cc -> (i - 1) >= cc.s AND (i - 1) <= cc.e)) = 0), ' ')
               END, '') AS clean_text,
               CAST(coalesce(c.n_cut, 0) AS BIGINT) AS n_cut_spans
        FROM toks t LEFT JOIN cuts c ON c.doc_id = t.doc_id
    """


def _line_dedup_oracle_sql() -> str:
    """DuckDB replica of q_line_dedup: build the same planted corpus
    (partner line for doc_id%5==0, boilerplate for doc_id%3==0), hash
    eligible trimmed lines with the 60-bit md5 fold, count, mark, and
    rebuild each doc's text from the surviving lines in order."""
    return f"""
        WITH corpus AS (
          SELECT d.doc_id,
                 concat_ws(chr(10), d.text,
                   CASE WHEN d.doc_id % 5 = 0 THEN p.text END,
                   CASE WHEN d.doc_id % 3 = 0 THEN '{_BOILERPLATE_LINE}' END
                 ) AS text
          FROM documents d
          LEFT JOIN documents p
            ON p.doc_id = CASE WHEN d.doc_id % 2 = 0
                               THEN d.doc_id + 1 ELSE d.doc_id - 1 END
        ),
        split AS (
          SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus
        ),
        lines AS (
          SELECT doc_id, u.i AS pos, ls[u.i] AS line
          FROM split, unnest(generate_series(1, len(ls))) AS u(i)
        ),
        hashed AS (
          SELECT doc_id, pos, line,
                 CASE WHEN length(trim(line)) >= 15
                      THEN ('0x' || substr(md5(trim(line)), 1, 15))::BIGINT
                 END AS h
          FROM lines
        ),
        dups AS (
          SELECT h FROM hashed WHERE h IS NOT NULL
          GROUP BY h HAVING count(*) >= 2
        ),
        marked AS (
          SELECT hashed.doc_id, hashed.pos, hashed.line,
                 (dups.h IS NOT NULL) AS is_dup
          FROM hashed LEFT JOIN dups ON hashed.h = dups.h
        )
        SELECT doc_id,
               coalesce(string_agg(CASE WHEN NOT is_dup THEN line END,
                                   chr(10) ORDER BY pos), '') AS clean_text,
               count(*) AS n_lines,
               CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed_lines
        FROM marked GROUP BY doc_id
    """


def _remove_spans_oracle_sql() -> str:
    """DuckDB replica of q_remove_spans: span content fingerprint (md5
    of the exact token run), min-id keeper per fingerprint, cut ranges
    collected per doc, text rebuilt with a positional list_filter
    (DuckDB's 1-based lambda index vs the operator's 0-based positions
    is the ``i - 1``)."""
    return f"""
        {_spans_oracle_ctes()},
        sp AS (
          SELECT s.doc_id, s.span_start, s.span_end,
                 ('0x' || substr(md5(array_to_string(
                     list_slice(t.w, s.span_start + 1, s.span_end + 1), ' ')), 1, 15))::BIGINT AS fp
          FROM spans s JOIN toks t ON t.doc_id = s.doc_id
        ),
        keepers AS (SELECT fp, min(doc_id) AS keep FROM sp GROUP BY fp),
        cuts AS (
          SELECT sp.doc_id,
                 list({{'s': sp.span_start, 'e': sp.span_end}}) AS cut_list,
                 count(*) AS n_cut
          FROM sp JOIN keepers k ON k.fp = sp.fp
          WHERE sp.doc_id != k.keep
          GROUP BY sp.doc_id
        )
        SELECT t.doc_id,
               -- coalesce: DuckDB array_to_string([]) is NULL where
               -- Spark concat_ws is '' (a fully-cut document)
               coalesce(CASE WHEN c.doc_id IS NULL THEN array_to_string(t.w, ' ')
                    ELSE array_to_string(
                      list_filter(t.w, (x, i) -> len(list_filter(c.cut_list,
                        cc -> (i - 1) >= cc.s AND (i - 1) <= cc.e)) = 0), ' ')
               END, '') AS clean_text,
               CAST(coalesce(c.n_cut, 0) AS BIGINT) AS n_cut_spans
        FROM toks t LEFT JOIN cuts c ON c.doc_id = t.doc_id
    """


def _pq_adc_oracle_sql() -> str:
    """DuckDB replica of q_pq_adc_knn: the seeded (M=8, K=16, dsub=8)
    codebook is emitted as a VALUES table of DOUBLE[] codewords; each
    vector's subspace code is the argmin codeword (ties → lowest id,
    matching numpy argmin), the ADC distance is Σ_m ‖q_m − cw(code_m)‖²
    and the result is the per-query top-10 with (distance, id)
    tie-break — exactly the plan adc_knn_join executes."""
    from syzgydb_spark.operators.pq import PqIndex

    idx = PqIndex.from_seed(64, m=8, k=16, seed=42)

    def cw_lit(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    rows = ",\n              ".join(
        f"({mi}, {ci}, CAST({cw_lit(idx.codebooks[mi, ci])} AS DOUBLE[]))"
        for mi in range(idx.m)
        for ci in range(idx.k)
    )
    d2 = (
        "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) ^ 2))"
    )
    return f"""
        WITH cb(m, cid, cw) AS (
          VALUES {rows}
        ),
        sub AS (
          SELECT vec_id, m,
                 CAST(list_slice(embedding, m * 8 + 1, m * 8 + 8) AS DOUBLE[]) AS sv
          FROM embeddings, unnest(generate_series(0, 7)) AS t(m)
        ),
        enc AS (
          SELECT vec_id, m, cid FROM (
            SELECT s.vec_id, s.m, c.cid,
                   row_number() OVER (
                     PARTITION BY s.vec_id, s.m
                     ORDER BY {d2.format(a="s.sv", b="c.cw")}, c.cid) AS rn
            FROM sub s JOIN cb c ON c.m = s.m
          ) WHERE rn = 1
        ),
        qsub AS (SELECT vec_id AS query_id, m, sv FROM sub WHERE vec_id < 20),
        adc AS (
          SELECT q.query_id, e.vec_id AS id,
                 sum({d2.format(a="q.sv", b="c.cw")}) AS dd
          FROM enc e
          JOIN cb c ON c.m = e.m AND c.cid = e.cid
          JOIN qsub q ON q.m = e.m
          GROUP BY q.query_id, e.vec_id
        )
        SELECT query_id, id, round(sqrt(dd), 6) AS distance
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sqrt(dd), id) AS rn
              FROM adc)
        WHERE rn <= 10
    """


def _ivf_knn_join_oracle_sql() -> str:
    """DuckDB replica of q_ivf_knn_join: the persisted KMeans centers
    as a VALUES table of DOUBLE[] literals; each vector's ivf_cell is
    the argmin center (ties → lowest cid, matching numpy argmin), each
    query probes its 6 nearest cells, candidates are the cell
    equi-join, and the result is the per-query exact-euclidean top-10
    with (distance, id) tie-break — exactly the plan
    IvfIndex.knn_join executes."""
    idx = _ivf_fixture_index()

    def c_lit(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    rows = ",\n              ".join(
        f"({cid}, CAST({c_lit(idx.centers[cid])} AS DOUBLE[]))"
        for cid in range(len(idx.centers))
    )
    d2 = "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) ^ 2))"
    return f"""
        WITH centers(cid, c) AS (
          VALUES {rows}
        ),
        base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
        assigned AS (
          SELECT id, v, cid FROM (
            SELECT b.id, b.v, c.cid,
                   row_number() OVER (
                     PARTITION BY b.id
                     ORDER BY {d2.format(a="b.v", b="c.c")}, c.cid) AS rn
            FROM base b CROSS JOIN centers c
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT query_id, qv, cid FROM (
            SELECT q.id AS query_id, q.v AS qv, c.cid,
                   row_number() OVER (
                     PARTITION BY q.id
                     ORDER BY {d2.format(a="q.v", b="c.c")}, c.cid) AS rn
            FROM base q CROSS JOIN centers c WHERE q.id < 20
          ) WHERE rn <= 6
        ),
        ranked AS (
          SELECT query_id, id, distance,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY distance, id) AS rn
          FROM (SELECT p.query_id, a.id,
                       sqrt({d2.format(a="p.qv", b="a.v")}) AS distance
                FROM probes p JOIN assigned a ON a.cid = p.cid)
        )
        SELECT query_id, id, round(distance, 6) AS distance
        FROM ranked WHERE rn <= 10
    """


def _hash_split_oracle_sql() -> str:
    """DuckDB replica of q_hash_split: identical md5 shuffle key and
    the SAME Python-float cumulative thresholds (embedded as repr so
    boundary arithmetic is bit-identical in both engines)."""
    # replicate hash_split's accumulation arithmetic exactly (same
    # float ops in the same order), then embed the products as repr
    weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    acc = 0.0
    acc += weights["train"] / total
    t1 = repr(acc * 2.0**60)
    acc += weights["val"] / total
    t2 = repr(acc * 2.0**60)
    return f"""
        SELECT doc_id,
               CASE WHEN CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)),
                                              1, 15))::BIGINT AS DOUBLE) < {t1}
                    THEN 'train'
                    WHEN CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)),
                                              1, 15))::BIGINT AS DOUBLE) < {t2}
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """


def _cluster_balanced_sample_oracle_sql() -> str:
    """DuckDB replica of q_cluster_balanced_sample: the semdedup
    oracle's argmin cell assignment (same center literals, same
    d²+cid tie-break) feeding the stratified_fixed_sample skeleton
    with the cell as the stratum (oversample·k = 20)."""
    idx = _ivf_fixture_index()

    def c_lit(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    rows = ",\n              ".join(
        f"({cid}, CAST({c_lit(idx.centers[cid])} AS DOUBLE[]))"
        for cid in range(len(idx.centers))
    )
    d2 = "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) ^ 2))"
    return f"""
        WITH centers(cid, c) AS (
          VALUES {rows}
        ),
        base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
        assigned AS (
          SELECT id, cid FROM (
            SELECT b.id, c.cid,
                   row_number() OVER (
                     PARTITION BY b.id
                     ORDER BY {d2.format(a="b.v", b="c.c")}, c.cid) AS rn
            FROM base b CROSS JOIN centers c
          ) WHERE rn = 1
        ),
        counts AS (SELECT cid, count(*) AS n FROM assigned GROUP BY 1),
        cand AS (
          SELECT a.id, a.cid, c.n,
                 ('0x' || substr(md5('k42:' || CAST(a.id AS VARCHAR)),
                                 1, 15))::BIGINT AS hk
          FROM assigned a JOIN counts c USING (cid)
        ),
        f AS (
          SELECT * FROM cand
          WHERE CAST(hk AS DOUBLE)
                < least(1.0, 20.0 / n) * 1152921504606846976.0
        ),
        r AS (
          SELECT id, cid,
                 row_number() OVER (PARTITION BY cid
                                    ORDER BY hk, id) AS sample_rank
          FROM f
        )
        SELECT id, cid AS cell, sample_rank FROM r WHERE sample_rank <= 5
    """


def _wordpiece_oracle_sql() -> str:
    """DuckDB replica of q_wordpiece_tokens: the fitted vocabulary as
    a VALUES table, the SAME word split as text_stats (_WORDS), and
    the greedy longest-match loop UNROLLED 16 steps (a word is at most
    MAX_WORD_LEN=16 chars — longer words are [UNK] by contract — and
    every step consumes ≥1 char, so 16 chained CTE steps always reach
    the done state). Longest match per step is a correlated scalar
    subquery ordered by piece length DESC; per-doc piece order is the
    (widx, within-word) order flattened."""
    vocab = _wordpiece_fixture_vocab()
    from syzgydb_spark.operators.tokenizer import MAX_WORD_LEN

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vrows = ",\n              ".join(
        f"({q(raw)}, {'true' if cont else 'false'})"
        for raw, cont in vocab.pieces
    )
    words = _WORDS.format(t="text")
    step = """
        s{k} AS (
          SELECT doc_id, widx, w,
                 CASE WHEN done OR m IS NULL THEN pos
                      ELSE pos + length(m) END AS pos,
                 CASE WHEN done THEN pieces
                      WHEN m IS NULL THEN ['[UNK]']
                      ELSE list_append(pieces,
                             CASE WHEN pos = 1 THEN m ELSE '##' || m END)
                 END AS pieces,
                 CASE WHEN done THEN true
                      WHEN m IS NULL THEN true
                      ELSE pos + length(m) > length(w) END AS done
          FROM (
            SELECT s.*,
                   CASE WHEN s.done THEN NULL ELSE (
                     SELECT v.raw FROM v
                     WHERE v.cont = (s.pos > 1)
                       AND v.raw = substr(s.w, s.pos, length(v.raw))
                     ORDER BY length(v.raw) DESC, v.raw LIMIT 1
                   ) END AS m
            FROM s{prev} s
          )
        )"""
    steps = ",".join(step.format(k=k, prev=k - 1) for k in range(1, MAX_WORD_LEN + 1))
    return f"""
        WITH v(raw, cont) AS (
          VALUES {vrows}
        ),
        docs AS (SELECT doc_id, {words} AS ws FROM documents),
        w0 AS (SELECT doc_id, i AS widx, ws[i] AS w
               FROM docs, unnest(generate_series(1, len(ws))) AS u(i)),
        s0 AS (SELECT doc_id, widx, w, 1 AS pos,
                      CASE WHEN length(w) > {MAX_WORD_LEN} THEN ['[UNK]']
                           ELSE CAST([] AS VARCHAR[]) END AS pieces,
                      length(w) > {MAX_WORD_LEN} AS done
               FROM w0),
        {steps},
        perdoc AS (
          SELECT doc_id, flatten(list(pieces ORDER BY widx)) AS all_p
          FROM s16 GROUP BY doc_id
        )
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pidx, all_p[i] AS piece
        FROM perdoc, unnest(generate_series(1, len(all_p))) AS u(i)
    """


def _quality_score_oracle_sql() -> str:
    """DuckDB replica of q_quality_score: the same md5 bucket/sign
    feature hashing as hashed_doc_embedding (dim from the fixture,
    unrounded normalized components), dot product with the persisted
    coefficient literals as a left-to-right list fold, + bias, then
    sigmoid; rounded to 6 and keep = rounded >= 0.5."""
    clf = _quality_clf_fixture()
    dim = clf.dim
    seed = clf.seed
    w_lit = "[" + ", ".join(repr(float(x)) for x in clf.weights) + "]"
    bias = repr(float(clf.bias))
    words = _WORDS.format(t="text")
    # honor the fixture's normalize flag — a classifier fitted with
    # normalize=False scores RAW hashed counts, and the oracle must
    # replay exactly what the Spark path computes
    u_expr = (
        "CASE WHEN nrm = 0 THEN v ELSE list_transform(v, x -> x / nrm) END"
        if clf.normalize
        else "v"
    )
    return f"""
        WITH t AS (SELECT doc_id, {words} AS ws FROM documents),
        p AS (
          SELECT doc_id, ws,
                 list_transform(ws, x ->
                   CAST({_MD5_INT.format(s=f"'hb{seed}:' || x")} % {dim} AS INT)) AS bs,
                 list_transform(ws, x ->
                   CASE WHEN {_MD5_INT.format(s=f"'hs{seed}:' || x")} % 2 = 0
                        THEN 1 ELSE -1 END) AS ss
          FROM t
        ),
        v AS (
          SELECT doc_id,
                 CASE WHEN ws IS NULL THEN NULL ELSE
                   list_transform(generate_series(0, {dim - 1}), j ->
                     CAST(coalesce(list_sum(list_transform(
                            list_zip(bs, ss),
                            q -> CASE WHEN q[1] = j THEN q[2] ELSE 0 END)), 0)
                          AS DOUBLE))
                 END AS v
          FROM p
        ),
        n AS (SELECT doc_id, v,
                     sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
              FROM v),
        u AS (SELECT doc_id, {u_expr} AS u FROM n),
        z AS (SELECT doc_id,
                     list_sum(list_transform(
                       list_zip(CAST({w_lit} AS DOUBLE[]), u),
                       q -> q[1] * q[2])) + {bias} AS z
              FROM u)
        SELECT doc_id,
               round(1.0 / (1.0 + exp(-z)), 6) AS quality_score,
               round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS keep
        FROM z
    """


def _embedding_outliers_oracle_sql() -> str:
    """DuckDB replica of q_embedding_outliers: same center literals
    and argmin assignment as the IVF oracle, euclidean distance to the
    assigned center rounded to 9 decimals BEFORE ranking (the same
    pinned sort key the Spark plan uses), percent_rank per cell with
    id tie-break, outlier iff pr > 0.95 (threshold embedded as repr so
    the float comparison is bit-identical)."""
    idx = _ivf_fixture_index()
    threshold = repr(1.0 - 0.05)

    def c_lit(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    rows = ",\n              ".join(
        f"({cid}, CAST({c_lit(idx.centers[cid])} AS DOUBLE[]))"
        for cid in range(len(idx.centers))
    )
    d2 = "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) ^ 2))"
    return f"""
        WITH centers(cid, c) AS (
          VALUES {rows}
        ),
        base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
        assigned AS (
          SELECT id, v, cid FROM (
            SELECT b.id, b.v, c.cid,
                   row_number() OVER (
                     PARTITION BY b.id
                     ORDER BY {d2.format(a="b.v", b="c.c")}, c.cid) AS rn
            FROM base b CROSS JOIN centers c
          ) WHERE rn = 1
        ),
        scored AS (
          SELECT a.id, CAST(a.cid AS BIGINT) AS cell,
                 round(sqrt({d2.format(a="a.v", b="c.c")}), 9) AS distance
          FROM assigned a JOIN centers c ON c.cid = a.cid
        ),
        ranked AS (
          SELECT id, cell, distance,
                 percent_rank() OVER (
                   PARTITION BY cell ORDER BY distance, id) AS pr
          FROM scored
        )
        SELECT id, cell, distance, pr, pr > {threshold} AS is_outlier
        FROM ranked
    """


def _semdedup_oracle_sql() -> str:
    """DuckDB replica of q_semdedup: same center literals, same argmin
    assignment as the IVF oracle, unit-normalized vectors (zero vector
    unchanged, matching l2_normalize), rank by round(centroid_sim, 9)
    ASC with id tie-break, max prior-member cosine, kept iff < 0.4."""
    idx = _ivf_fixture_index()

    def c_lit(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    rows = ",\n              ".join(
        f"({cid}, CAST({c_lit(idx.centers[cid])} AS DOUBLE[]))"
        for cid in range(len(idx.centers))
    )
    d2 = "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) ^ 2))"
    nrm = "sqrt(list_sum(list_transform({a}, x -> x * x)))"
    unit = (
        f"CASE WHEN {nrm.format(a='{a}')} = 0 THEN {{a}} "
        f"ELSE list_transform({{a}}, x -> x / {nrm.format(a='{a}')}) END"
    )
    dot = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    return f"""
        WITH centers(cid, c) AS (
          VALUES {rows}
        ),
        base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
        assigned AS (
          SELECT id, v, cid FROM (
            SELECT b.id, b.v, c.cid,
                   row_number() OVER (
                     PARTITION BY b.id
                     ORDER BY {d2.format(a="b.v", b="c.c")}, c.cid) AS rn
            FROM base b CROSS JOIN centers c
          ) WHERE rn = 1
        ),
        normed AS (
          SELECT a.id, a.cid, {unit.format(a="a.v")} AS nv,
                 {dot.format(a=unit.format(a="a.v"), b=unit.format(a="c.c"))}
                   AS centroid_sim
          FROM assigned a JOIN centers c ON c.cid = a.cid
        ),
        ranked AS (
          SELECT id, cid, nv,
                 row_number() OVER (
                   PARTITION BY cid
                   ORDER BY round(centroid_sim, 9) ASC, id) AS rank
          FROM normed
        ),
        prior AS (
          SELECT r.id, max({dot.format(a="r.nv", b="l.nv")}) AS max_prior_sim
          FROM ranked r JOIN ranked l
            ON l.cid = r.cid AND l.rank < r.rank
          GROUP BY r.id
        )
        SELECT r.id, CAST(r.cid AS BIGINT) AS cell, r.rank,
               round(p.max_prior_sim, 6) AS max_prior_sim,
               coalesce(p.max_prior_sim < 0.4, true) AS kept
        FROM ranked r LEFT JOIN prior p USING (id)
    """


def _bm25_oracle_sql() -> str:
    """DuckDB replica of q_bm25_search: same tokenizer macro, same
    Okapi formula (k1=1.2, b=0.75), same (score desc, id asc) top-10."""
    from syzgydb_spark.operators.bm25 import _tokenize_query

    qterms = sorted(set(_tokenize_query(_BM25_QUERY)))
    qvals = ", ".join(f"('{t}')" for t in qterms)
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest({_WORDS.format(t="text")}) AS term
          FROM documents
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        q(term) AS (VALUES {qvals}),
        m AS (SELECT tf.doc_id, tf.term, tf.tf, dl.dl
              FROM tf JOIN dl USING (doc_id) JOIN q USING (term)),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM m GROUP BY 1),
        sc AS (
          SELECT m.doc_id,
                 sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                     * m.tf / (m.tf + 1.2 * (1 - 0.75 + 0.75 * m.dl / s.avgdl)))
                     AS score
          FROM m JOIN dft d USING (term) CROSS JOIN stats s
          GROUP BY 1
        )
        SELECT doc_id, round(score, 6) AS score
        FROM sc ORDER BY score DESC, doc_id LIMIT 10
    """


def _gopher_filters_oracle_sql() -> str:
    """DuckDB replica of quality.gopher_filters(min_words=30, min_stopwords=1): same
    tokenizer macro, same split-count symbol counts, same line rules,
    same canonical 8-stopword list (imported so it can't drift)."""
    from syzgydb_spark.operators.quality import GOPHER_STOPWORDS

    words = _WORDS.format(t="text")
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
        WITH base AS (
          SELECT doc_id, text, {words} AS w,
                 string_split(text, chr(10)) AS lines
          FROM documents
        ),
        meas AS (
          SELECT doc_id,
                 len(w) AS n_words,
                 CASE WHEN len(w) = 0 THEN 0.0
                      ELSE list_sum(list_transform(w, x -> length(x)))::DOUBLE
                           / len(w) END AS mean_wl,
                 CASE WHEN len(w) = 0 THEN 0.0
                      ELSE (len(string_split(text, '#')) - 1
                            + len(string_split(text, '...')) - 1)::DOUBLE
                           / len(w) END AS symbol_ratio,
                 (len(list_filter(lines, l -> starts_with(l, '- ')
                      OR starts_with(l, '* ') OR starts_with(l, '•'))))::DOUBLE
                     / len(lines) AS bullet_ratio,
                 (len(list_filter(lines, l -> ends_with(l, '...')
                      OR ends_with(l, '…'))))::DOUBLE
                     / len(lines) AS ellipsis_ratio,
                 CASE WHEN len(w) = 0 THEN 0.0
                      ELSE (len(list_filter(w, x -> regexp_matches(x, '[a-z]'))))::DOUBLE
                           / len(w) END AS alpha_ratio,
                 len(list_intersect(list_distinct(w), [{stops}])) AS stop_hits
          FROM base
        )
        SELECT doc_id, n_words,
               round(mean_wl, 6) AS mean_word_len,
               round(symbol_ratio, 6) AS symbol_ratio,
               round(bullet_ratio, 6) AS bullet_ratio,
               round(ellipsis_ratio, 6) AS ellipsis_ratio,
               round(alpha_ratio, 6) AS alpha_ratio,
               stop_hits AS stopword_hits,
               (n_words BETWEEN 30 AND 100000) AS ok_word_count,
               (mean_wl BETWEEN 3.0 AND 10.0) AS ok_mean_word_len,
               (symbol_ratio <= 0.1) AS ok_symbol_ratio,
               (bullet_ratio <= 0.9) AS ok_bullet_ratio,
               (ellipsis_ratio <= 0.3) AS ok_ellipsis_ratio,
               (alpha_ratio >= 0.8) AS ok_alpha_ratio,
               (stop_hits >= 1) AS ok_stopwords,
               ((n_words BETWEEN 30 AND 100000)
                AND (mean_wl BETWEEN 3.0 AND 10.0)
                AND (symbol_ratio <= 0.1)
                AND (bullet_ratio <= 0.9)
                AND (ellipsis_ratio <= 0.3)
                AND (alpha_ratio >= 0.8)
                AND (stop_hits >= 1)) AS passes
        FROM meas
    """


def _minhash_oracle_sql() -> str:
    """DuckDB replica of minhash_signature(num_hashes=32, shingle_n=2,
    seed=42, hash_fn='md5'): same universal-hash coefficients, same
    31-bit space, same md5-derived base hash."""
    from syzgydb_spark.operators.dedup import _minhash_coeffs, _MERSENNE

    a, b = _minhash_coeffs(32, 42)
    words = _WORDS.format(t="text")
    mins = ", ".join(
        f"list_min(list_transform(base, h -> ({a[i]} * h + {b[i]}) % {_MERSENNE}))"
        for i in range(32)
    )
    return f"""
        WITH toks AS (SELECT doc_id, {words} AS w FROM documents),
        sh AS (SELECT doc_id, {_BIGRAMS.format(w="w")} AS shingles FROM toks),
        hashed AS (
          SELECT doc_id,
                 list_transform(shingles,
                     s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {_MERSENNE}) AS base,
                 len(shingles) AS n
          FROM sh
        )
        SELECT doc_id, array_to_string([{mins}], ',') AS sig
        FROM hashed WHERE n > 0
        UNION ALL
        SELECT doc_id, NULL AS sig FROM hashed WHERE n = 0
    """


_MD5_INT = "('0x' || substr(md5({s}), 1, 15))::BIGINT"


def _simhash_sketch_ctes() -> str:
    """Shared CTE chain computing the 48-bit md5 SimHash per doc
    (replica of simhash(bits=48, hash_fn='md5')); exposes ``sk(doc_id,
    simhash)``."""
    words = _WORDS.format(t="text")
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(48)
    )
    packed = " + ".join(f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(48))
    return f"""
        toks AS (
          SELECT doc_id, unnest(list_distinct({words})) AS tok FROM documents
        ),
        hashed AS (
          SELECT doc_id, {_MD5_INT.format(s="tok")} AS h FROM toks
        ),
        agg AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
        sk AS (SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM agg)
    """


def _dup_groups_ctes() -> str:
    """Shared recursive-CTE body for the duplicate-grouping oracles:
    ngram_jaccard_pairs (shingle_n=2, threshold=0.5) edges, connected
    components via recursive reachability, ending in ``grp(doc_id,
    group_id)`` with group_id = component min id."""
    words = _WORDS.format(t="text")
    return f"""
        WITH RECURSIVE toks AS (SELECT doc_id, {words} AS w FROM documents),
        sh AS (SELECT doc_id, unnest({_BIGRAMS.format(w="w")}) AS sh FROM toks),
        sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
        common AS (
          SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS c
          FROM sh l JOIN sh r ON l.sh = r.sh AND l.doc_id < r.doc_id
          GROUP BY 1, 2
        ),
        p AS (
          SELECT id_a, id_b FROM common
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
          WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM p
          UNION
          SELECT id_b, id_a FROM p
        ),
        reach AS (
          SELECT src AS node, dst AS r FROM edges
          UNION
          SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
        ),
        grp AS (
          SELECT node AS doc_id, least(node, min(r)) AS group_id
          FROM reach GROUP BY node
        )
    """


def _duplicate_groups_oracle_sql() -> str:
    """DuckDB replica of duplicate_groups over ngram_jaccard_pairs:
    the shared component CTEs, emitted as-is."""
    return _dup_groups_ctes() + "SELECT doc_id, group_id FROM grp"


def _minhash_components_ctes() -> str:
    """``WITH RECURSIVE`` chain: minhash pairs → connected components,
    ending in ``grp(doc_id, group_id)`` (component min id). Shared by
    the keep-best and leakage-split oracles."""
    return "WITH RECURSIVE " + _minhash_pairs_ctes() + """
        , edges AS (
          SELECT id_a AS src, id_b AS dst FROM mp
          UNION
          SELECT id_b, id_a FROM mp
        ),
        reach AS (
          SELECT src AS node, dst AS r FROM edges
          UNION
          SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
        ),
        grp AS (
          SELECT node AS doc_id, least(node, min(r)) AS group_id
          FROM reach GROUP BY node
        )
    """


def _leakage_split_oracle_sql() -> str:
    """DuckDB replica of leakage_safe_split over the minhash pairs:
    components, group_id = coalesce(component, doc_id), then the
    hash_split CASE keyed on group_id — identical md5 key and the
    SAME Python-float cumulative thresholds (embedded as repr)."""
    weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    acc = 0.0
    acc += weights["train"] / total
    t1 = repr(acc * 2.0**60)
    acc += weights["val"] / total
    t2 = repr(acc * 2.0**60)
    key = ("CAST(('0x' || substr(md5('42:' || CAST(group_id AS VARCHAR)), 1, 15))"
           "::BIGINT AS DOUBLE)")
    return _minhash_components_ctes() + f"""
        , member AS (
          SELECT d.doc_id, coalesce(g.group_id, d.doc_id) AS group_id
          FROM documents d LEFT JOIN grp g ON d.doc_id = g.doc_id
        )
        SELECT doc_id, group_id,
               CASE WHEN {key} < {t1} THEN 'train'
                    WHEN {key} < {t2} THEN 'val'
                    ELSE 'test' END AS split
        FROM member
    """


def _mmr_rerank_oracle_sql() -> str:
    """DuckDB replica of q_mmr_rerank: top-20 cosine candidates per
    anchor, then the SAME greedy MMR selection as k=5 UNROLLED argmax
    stages (no recursion needed at fixed k). Determinism contract:
    relevance and pairwise similarities are rounded to 9dp on both
    sides before selection, and the score combine embeds the kernel's
    exact IEEE constants (``repr(1.0 - λ)`` — 1.0−0.7 is NOT 0.3 in
    doubles)."""
    lam, k = 0.7, 5
    w_rel = repr(lam)                 # '0.7'
    w_div = repr(1.0 - lam)           # '0.30000000000000004'
    cos_q = _COS_DIST.format(a="e.embedding", b="q.embedding")
    unit = "list_transform(CAST(embedding AS DOUBLE[]), x -> x / " + _NORM.format(a="embedding") + ")"
    dot_uu = (
        "round(list_sum(list_transform(list_zip(a.u, b.u), x -> x[1] * x[2])), 9)"
    )
    stages = []
    for s in range(2, k + 1):
        prev = " UNION ALL ".join(f"SELECT * FROM sel{i}" for i in range(1, s))
        stages.append(f"""
        prev{s} AS ({prev}),
        ms{s} AS (
          SELECT s.qid, s.ib AS id, max(s.s) AS m
          FROM sims s JOIN prev{s} p ON s.qid = p.qid AND s.ia = p.id
          GROUP BY 1, 2
        ),
        sel{s} AS (
          SELECT r.qid, r.id, {s} AS mmr_rank FROM r
          JOIN ms{s} m ON r.qid = m.qid AND r.id = m.id
          LEFT JOIN prev{s} p ON r.qid = p.qid AND r.id = p.id
          WHERE p.id IS NULL
          QUALIFY row_number() OVER (
            PARTITION BY r.qid
            ORDER BY {w_rel} * r.rel - {w_div} * m.m DESC, r.id
          ) = 1
        )""")
    return f"""
        WITH topk AS (
          SELECT qid, id, rel FROM (
            SELECT q.vec_id AS qid, e.vec_id AS id,
                   1.0 - ({cos_q}) AS rel,
                   row_number() OVER (
                     PARTITION BY q.vec_id ORDER BY {cos_q}, e.vec_id) AS rn
            FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 3) q
          ) WHERE rn <= 20
        ),
        cand AS (
          SELECT t.qid, t.id, t.rel, {unit} AS u
          FROM topk t JOIN embeddings ON vec_id = t.id
        ),
        sims AS (
          SELECT a.qid, a.id AS ia, b.id AS ib, {dot_uu} AS s
          FROM cand a JOIN cand b ON a.qid = b.qid
        ),
        r AS (SELECT qid, id, round(rel, 9) AS rel FROM cand),
        sel1 AS (
          SELECT qid, id, 1 AS mmr_rank FROM r
          QUALIFY row_number() OVER (
            PARTITION BY qid ORDER BY {w_rel} * rel DESC, id) = 1
        ),
        {",".join(stages)}
        SELECT qid AS query_id, id, CAST(mmr_rank AS BIGINT) AS mmr_rank
        FROM ({" UNION ALL ".join(f"SELECT * FROM sel{i}" for i in range(1, k + 1))})
    """


def _unicode_clean_oracle_sql() -> str:
    """DuckDB replica of q_unicode_clean: identical planted dirt
    (chr() spellings of the same code points), nfc_normalize (both
    engines implement the Unicode standard), and the shared RE2 scrub
    classes exported by functions/text.py."""
    from syzgydb_spark.functions.text import (
        UNICODE_CLEAN_CTRL_RE,
        UNICODE_CLEAN_WS_RE,
    )

    return f"""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' nai' || chr(776) || 've' || chr(8203)
                      ELSE text END AS t3
          FROM documents
        ),
        dirty AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0
                      THEN 'alert' || chr(9) || chr(9) || t3
                      ELSE t3 END AS dt
          FROM planted
        )
        SELECT doc_id,
               regexp_replace(regexp_replace(nfc_normalize(dt),
                   '{UNICODE_CLEAN_CTRL_RE}', '', 'g'),
                   '{UNICODE_CLEAN_WS_RE}', ' ', 'g') AS clean_text,
               regexp_replace(regexp_replace(nfc_normalize(dt),
                   '{UNICODE_CLEAN_CTRL_RE}', '', 'g'),
                   '{UNICODE_CLEAN_WS_RE}', ' ', 'g') != dt AS was_dirty
        FROM dirty
    """


def _dedup_keep_best_oracle_sql() -> str:
    """DuckDB replica of dedup.keep_best over the MINHASH pairs (the
    scale-path pair source — exact bigram-Jaccard pair generation is
    O(Σ df²) in posting-list sizes and measured 24 s at sf0.1 where
    the banded LSH is 1.4 s warm): the shared minhash CTEs + recursive
    components + left-join singletons + the identical two-step argmax
    (max n_chars per group, then min doc_id among the best-scored)."""
    return _minhash_components_ctes() + """
        , member AS (
          SELECT d.doc_id, coalesce(g.group_id, d.doc_id) AS group_id,
                 d.n_chars AS score
          FROM documents d LEFT JOIN grp g ON d.doc_id = g.doc_id
        ),
        best AS (
          SELECT group_id, max(score) AS best,
                 CAST(count(*) AS BIGINT) AS group_size
          FROM member GROUP BY 1
        )
        SELECT m.group_id, min(m.doc_id) AS kept_doc_id, b.group_size
        FROM member m
        JOIN best b ON m.group_id = b.group_id AND m.score = b.best
        GROUP BY m.group_id, b.group_size
    """


def _simhash_oracle_sql() -> str:
    """DuckDB replica of simhash(bits=48, hash_fn='md5')."""
    return f"""
        WITH {_simhash_sketch_ctes()}
        SELECT doc_id, simhash FROM sk
    """


def _simhash_near_dups_oracle_sql() -> str:
    """DuckDB replica of simhash_near_duplicates(max_hamming=3, bits=48,
    hash_fn='md5'): pigeonhole chunk join (4 chunks × 12 bits) +
    bit_count(xor) verify — the exact plan the Spark operator runs."""
    return f"""
        WITH {_simhash_sketch_ctes()},
        parts AS (
          SELECT doc_id, simhash, t.chunk AS chunk,
                 (simhash >> (t.chunk * 12)) & 4095 AS ck
          FROM sk, generate_series(0, 3) t(chunk)
        ),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM parts l JOIN parts r
            ON l.chunk = r.chunk AND l.ck = r.ck AND l.doc_id < r.doc_id
        )
        SELECT c.id_a, c.id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM cand c
        JOIN sk a ON c.id_a = a.doc_id
        JOIN sk b ON c.id_b = b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


def _minhash_pairs_ctes() -> str:
    """Shared CTE chain replicating minhash_near_duplicates(
    num_hashes=64, bands=16, shingle_n=2, threshold=0.5, seed=42,
    hash_fn='md5'): identical hashed-shingle sets, signature fold,
    band keys (md5 of the comma-joined band slice), and Jaccard
    verify — ending in ``mp(id_a, id_b, jaccard)`` (unrounded)."""
    from syzgydb_spark.operators.dedup import _minhash_coeffs, _MERSENNE

    a, b = _minhash_coeffs(64, 42)
    words = _WORDS.format(t="text")
    bigrams = _BIGRAMS.format(w="w")
    mins = ", ".join(
        f"list_min(list_transform(hs, h -> ({a[i]} * h + {b[i]}) % {_MERSENNE}))"
        for i in range(64)
    )
    band_str = "array_to_string(list_slice(sig, t.band * 4 + 1, t.band * 4 + 4), ',')"
    return f"""
        toks AS (SELECT doc_id, {words} AS w FROM documents),
        hs0 AS (
          SELECT doc_id,
                 list_distinct(list_transform({bigrams},
                     s -> {_MD5_INT.format(s="s")} % {_MERSENNE})) AS hs
          FROM toks
        ),
        hsx AS (SELECT * FROM hs0 WHERE len(hs) > 0),
        sigs AS (SELECT doc_id, [{mins}] AS sig FROM hsx),
        banded AS (
          SELECT doc_id, t.band AS band,
                 {_MD5_INT.format(s=band_str)} AS bh
          FROM sigs, generate_series(0, 15) t(band)
        ),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
        ),
        verify AS (
          SELECT c.id_a, c.id_b,
                 len(list_intersect(a.hs, b.hs)) * 1.0 AS inter,
                 len(a.hs) + len(b.hs) AS tot
          FROM cand c
          JOIN hsx a ON c.id_a = a.doc_id
          JOIN hsx b ON c.id_b = b.doc_id
        ),
        mp AS (
          SELECT id_a, id_b, inter / (tot - inter) AS jaccard
          FROM verify WHERE inter / (tot - inter) >= 0.5
        )
    """


def _minhash_near_dups_oracle_sql() -> str:
    """DuckDB replica of minhash_near_duplicates — the shared pair
    CTEs, rounded for comparison."""
    return (
        "WITH " + _minhash_pairs_ctes()
        + "SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM mp"
    )


def _minhash_dedup_incremental_oracle_sql() -> str:
    """DuckDB replica of q_minhash_dedup_incremental: the same planted
    new batch, the same md5 MinHash pipeline on BOTH sides (shared
    coefficients with _minhash_near_dups_oracle_sql), a new×corpus
    band-key join, Jaccard verify, NOT-EXISTS survivors."""
    from syzgydb_spark.operators.dedup import _minhash_coeffs, _MERSENNE

    a, b = _minhash_coeffs(64, 42)
    words = _WORDS.format(t="text")
    bigrams = _BIGRAMS.format(w="w")
    mins = ", ".join(
        f"list_min(list_transform(hs, h -> ({a[i]} * h + {b[i]}) % {_MERSENNE}))"
        for i in range(64)
    )
    band_str = "array_to_string(list_slice(sig, t.band * 4 + 1, t.band * 4 + 4), ',')"
    repl = " || ' ' || ".join(
        ["'fresh'", "'document'"] + [f"'{c}' || CAST(doc_id AS VARCHAR)" for c in "uvwxyz"]
    )

    def keyed(src: str, prefix: str) -> str:
        return f"""
        {prefix}toks AS (SELECT doc_id, {words} AS w FROM {src}),
        {prefix}hs0 AS (
          SELECT doc_id,
                 list_distinct(list_transform({bigrams},
                     s -> {_MD5_INT.format(s="s")} % {_MERSENNE})) AS hs
          FROM {prefix}toks
        ),
        {prefix}hsx AS (SELECT * FROM {prefix}hs0 WHERE len(hs) > 0),
        {prefix}sigs AS (SELECT doc_id, [{mins}] AS sig FROM {prefix}hsx),
        {prefix}banded AS (
          SELECT doc_id, t.band AS band,
                 {_MD5_INT.format(s=band_str)} AS bh
          FROM {prefix}sigs, generate_series(0, 15) t(band)
        )"""

    return f"""
        WITH new_base AS (
          SELECT doc_id + 200000 AS doc_id,
                 CASE WHEN doc_id % 10 = 0 THEN {repl}
                      ELSE text || ' xq' || CAST(doc_id % 3 AS VARCHAR) END AS text
          FROM documents WHERE doc_id % 5 = 0
        ),
        {keyed("documents", "c_")},
        {keyed("new_base", "n_")},
        cand AS (
          SELECT DISTINCT n.doc_id, c.doc_id AS cid
          FROM n_banded n JOIN c_banded c ON n.band = c.band AND n.bh = c.bh
        ),
        dup AS (
          SELECT DISTINCT cand.doc_id
          FROM cand
          JOIN n_hsx a ON cand.doc_id = a.doc_id
          JOIN c_hsx b ON cand.cid = b.doc_id
          WHERE len(list_intersect(a.hs, b.hs)) * 1.0
                / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) >= 0.5
        )
        SELECT doc_id FROM new_base
        WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup.doc_id = new_base.doc_id)
    """


def _ngrams_sql(w: str, n: int) -> str:
    """Non-distinct word n-grams of token list ``w`` (space-joined) —
    DuckDB replica of functions.text.word_ngrams."""
    parts = " || ' ' || ".join(f"{w}[i + {k}]" for k in range(n))
    return (
        f"list_transform(generate_series(1, greatest(len({w}) - {n - 1}, 0)),"
        f" i -> {parts})"
    )


def _repetition_stats_oracle_sql() -> str:
    """DuckDB replica of quality.repetition_stats: same tokenizer,
    non-distinct bigrams, per-doc top-bigram count via group-and-max."""
    words = _WORDS.format(t="text")
    return f"""
        WITH toks AS (SELECT doc_id, {words} AS w FROM documents),
        tok_stats AS (
          SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct
          FROM toks
        ),
        grams AS (SELECT doc_id, unnest({_ngrams_sql('w', 2)}) AS gram FROM toks),
        per_gram AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2),
        gram_stats AS (
          SELECT doc_id, max(c) AS top_bigram_count, sum(c) AS n_bigrams
          FROM per_gram GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(t.n_tokens AS BIGINT) AS n_tokens,
               round(CASE WHEN t.n_tokens > 0
                          THEN t.n_distinct::DOUBLE / t.n_tokens ELSE 0.0 END, 6)
                 AS distinct_token_ratio,
               CAST(coalesce(g.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
               CAST(coalesce(g.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               round(CASE WHEN coalesce(g.n_bigrams, 0) > 0
                          THEN g.top_bigram_count::DOUBLE / g.n_bigrams
                          ELSE 0.0 END, 6) AS top_bigram_frac
        FROM tok_stats t LEFT JOIN gram_stats g USING (doc_id)
    """


def _dup_stats_oracle_sql() -> str:
    """DuckDB replica of q_dup_stats: identical planted structure,
    line/paragraph split+trim, duplicate accounting via group-and-sum,
    and top-n-gram char fractions via group-and-max."""
    words = _WORDS.format(t="t")
    tl = "' ' || chr(9) || chr(13)"
    tp = "' ' || chr(9) || chr(13) || chr(10)"

    def unit_stats(name, split_expr, trim_set):
        return f"""
        {name}_u AS (
          SELECT doc_id, trim(x, {trim_set}) AS l
          FROM (SELECT doc_id, unnest({split_expr}) AS x FROM p)
          WHERE trim(x, {trim_set}) != ''),
        {name}_c AS (
          SELECT doc_id, l, count(*) AS c, len(l) AS ln
          FROM {name}_u GROUP BY 1, 2),
        {name}_s AS (
          SELECT doc_id, sum(c) AS n_units,
                 sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c) AS df,
                 CASE WHEN sum(ln * c) > 0
                      THEN sum(CASE WHEN c > 1 THEN ln * c ELSE 0 END)::DOUBLE
                           / sum(ln * c)
                      ELSE 0.0 END AS dcf
          FROM {name}_c GROUP BY doc_id)"""

    li_stats = unit_stats("li", "string_split(t, chr(10))", tl)
    pa_split = "string_split_regex(t, '\\n{2,}')"
    pa_stats = unit_stats("pa", pa_split, tp)
    return f"""
        WITH base AS (
          SELECT doc_id, text, substr(text, 1, 40) AS h FROM documents),
        p AS (
          SELECT doc_id,
                 text || chr(10) || h ||
                 CASE WHEN doc_id % 2 = 0 THEN chr(10) || h ELSE '' END ||
                 chr(10) || chr(10) || h || chr(10) || chr(10) ||
                 CASE WHEN doc_id % 3 = 0 THEN h
                      ELSE 'solo ' || doc_id END AS t
          FROM base),
        {li_stats},
        {pa_stats},
        toks AS (SELECT doc_id, {words} AS w FROM p),
        den AS (
          SELECT doc_id, len(array_to_string(w, ' ')) AS denom FROM toks),
        g AS (
          SELECT doc_id, 2 AS n, unnest({_ngrams_sql('w', 2)}) AS gm FROM toks
          UNION ALL
          SELECT doc_id, 3, unnest({_ngrams_sql('w', 3)}) FROM toks
          UNION ALL
          SELECT doc_id, 4, unnest({_ngrams_sql('w', 4)}) FROM toks),
        gc AS (SELECT doc_id, n, gm, count(*) AS c FROM g GROUP BY 1, 2, 3),
        -- Gopher semantics: the single MOST FREQUENT n-gram's count x
        -- joined-length (ties: longer gram, then lexicographically
        -- greatest) -- mirrors quality.duplication_stats exactly
        gb AS (
          SELECT doc_id, n, c * len(gm) AS best
          FROM (SELECT doc_id, n, gm, c,
                       row_number() OVER (
                         PARTITION BY doc_id, n
                         ORDER BY c DESC, len(gm) DESC, gm DESC) AS rk
                FROM gc)
          WHERE rk = 1),
        gf AS (
          SELECT doc_id,
                 max(CASE WHEN n = 2 THEN best END) AS b2,
                 max(CASE WHEN n = 3 THEN best END) AS b3,
                 max(CASE WHEN n = 4 THEN best END) AS b4
          FROM gb GROUP BY doc_id)
        SELECT li_s.doc_id,
               CAST(li_s.n_units AS BIGINT) AS n_lines,
               CAST(pa_s.n_units AS BIGINT) AS n_paras,
               round(li_s.df, 6) AS dup_line_frac,
               round(li_s.dcf, 6) AS dup_line_char_frac,
               round(pa_s.df, 6) AS dup_para_frac,
               round(pa_s.dcf, 6) AS dup_para_char_frac,
               round(CASE WHEN d.denom > 0
                          THEN coalesce(gf.b2, 0)::DOUBLE / d.denom
                          ELSE 0.0 END, 6) AS top_2gram_char_frac,
               round(CASE WHEN d.denom > 0
                          THEN coalesce(gf.b3, 0)::DOUBLE / d.denom
                          ELSE 0.0 END, 6) AS top_3gram_char_frac,
               round(CASE WHEN d.denom > 0
                          THEN coalesce(gf.b4, 0)::DOUBLE / d.denom
                          ELSE 0.0 END, 6) AS top_4gram_char_frac
        FROM li_s JOIN pa_s USING (doc_id) JOIN den d USING (doc_id)
        LEFT JOIN gf USING (doc_id)
    """


def _ngram_contamination_oracle_sql() -> str:
    """DuckDB replica of contamination.ngram_contamination(n=8) with
    the eval split doc_id % 19 == 0: same md5 gram hashes, eval-df cap,
    and per-pair overlap counts."""
    words = _WORDS.format(t="text")
    gh = "('0x' || substr(md5(g), 1, 15))::BIGINT"
    return f"""
        WITH toks AS (SELECT doc_id, {words} AS w FROM documents),
        gr AS (
          SELECT doc_id,
                 unnest(list_transform(list_distinct({_ngrams_sql('w', 8)}),
                                       g -> {gh})) AS gh
          FROM toks
        ),
        tg AS (SELECT doc_id AS train_id, gh FROM gr WHERE doc_id % 19 != 0),
        eg AS (SELECT doc_id AS eval_id, gh FROM gr WHERE doc_id % 19 = 0),
        evdf AS (SELECT gh, count(*) AS eval_df FROM eg GROUP BY gh),
        kept AS (SELECT eg.gh, eg.eval_id FROM eg JOIN evdf USING (gh)
                 WHERE eval_df <= 1000)
        SELECT train_id, eval_id, count(*) AS n_common
        FROM tg JOIN kept USING (gh)
        GROUP BY train_id, eval_id
        HAVING count(*) >= 1
    """


def _redact_pii_oracle_sql() -> str:
    """DuckDB replica of q_redact_pii: identical planted-PII
    construction and the same RE2-simple pattern chain (imported from
    functions.text so they cannot drift)."""
    from syzgydb_spark.functions.text import PII_PATTERNS

    expr = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com at 10.0.' || CAST(doc_id AS VARCHAR)"
        " || '.7 or +1 (555) 010-' || CAST(doc_id AS VARCHAR)"
    )
    for pat, tag in PII_PATTERNS:
        # DuckDB '...' literals keep backslashes as-is: only quotes
        # need escaping for the regex to arrive unchanged
        expr = f"regexp_replace({expr}, '{pat.replace(chr(39), chr(39) * 2)}', '{tag}', 'g')"
    return f"SELECT doc_id, {expr} AS clean FROM documents"


def _token_chunks_oracle_sql() -> str:
    """DuckDB replica of token_chunks(chunk_tokens=32, overlap=8):
    same tokenizer, same start sequence/step, same new-content filter,
    same trailing-window size."""
    words = _WORDS.format(t="text")
    return f"""
        WITH toks AS (SELECT doc_id, {words} AS w, len({words}) AS n FROM documents),
        st AS (
          SELECT doc_id, w, n, unnest(generate_series(1, n, 24)) AS s
          FROM toks WHERE n > 0
        )
        SELECT doc_id, CAST(s AS BIGINT) AS start,
               CAST(least(32, n - s + 1) AS BIGINT) AS n_tokens,
               array_to_string(list_slice(w, s, s + 31), ' ') AS chunk
        FROM st WHERE s = 1 OR s + 8 <= n
    """


def _ann_knn_join_oracle_sql() -> str:
    """DuckDB replica of q_ann_knn_join: the seeded hyperplanes are
    emitted as DOUBLE[] literals, each table's signature is the packed
    sign vector Σ (v·plane_p > 0)<<p, a candidate pair is any
    (data, query) agreeing on at least one table's signature, and the
    verify is the exact cosine re-rank + per-query top-10 — the same
    plan LshIndex.knn_join executes (one equi-join per table ≙ the OR
    here; identical result set after dedup)."""
    idx = LshIndex(64, num_tables=5, num_planes=10, seed=42, method="cosine")

    def plane_lit(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    sig_cols = []
    for t in range(idx.num_tables):
        terms = [
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),"
            f" {plane_lit(idx.planes[t, p])}) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(idx.num_planes)
        ]
        sig_cols.append("(" + " + ".join(terms) + f") AS s{t}")
    match = " OR ".join(f"d.s{t} = q.s{t}" for t in range(idx.num_tables))
    cos = _COS_DIST.format(a="d.embedding", b="q.embedding")
    return f"""
        WITH sigs AS (SELECT vec_id, embedding, {', '.join(sig_cols)} FROM embeddings),
        q AS (SELECT * FROM sigs WHERE vec_id < 20),
        cand AS (
          SELECT q.vec_id AS query_id, d.vec_id AS id, {cos} AS dist
          FROM sigs d JOIN q ON {match}
        )
        SELECT query_id, id, round(dist, 6) AS distance
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, id) rn
              FROM cand)
        WHERE rn <= 10
    """


def _embedding_near_dups_oracle_sql() -> str:
    """DuckDB replica of q_embedding_near_dups: the seeded hyperplanes
    as DOUBLE[] literals, each table's signature as the packed sign
    vector, candidate pairs = any-table signature agreement with
    id_a < id_b (≙ _pairs_from_buckets' distinct within-bucket pairs,
    no bucket exceeds max_bucket at oracle SF), then the exact cosine
    cut — the same candidate→verify plan embedding_near_duplicates
    executes."""
    idx = LshIndex(64, num_tables=8, num_planes=12, seed=42, method="cosine")

    def plane_lit(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    sig_cols = []
    for t in range(idx.num_tables):
        terms = [
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),"
            f" {plane_lit(idx.planes[t, p])}) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(idx.num_planes)
        ]
        sig_cols.append("(" + " + ".join(terms) + f") AS s{t}")
    match = " OR ".join(f"a.s{t} = b.s{t}" for t in range(idx.num_tables))
    cos = _COS_DIST.format(a="a.embedding", b="b.embedding")
    return f"""
        WITH sigs AS (SELECT vec_id, embedding, {', '.join(sig_cols)} FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS distance
        FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id AND ({match})
        WHERE {cos} <= 0.41
    """


def _language_id_oracle_sql() -> str:
    """DuckDB replica of functions.text.language_id: same tokenizer,
    same stopword lists (imported, so they can't drift), same
    CJK-ratio zh override, and the same (score, lang) lexicographic
    argmax — Spark's ``greatest`` over structs ≙ DuckDB's
    ``list_sort(..., 'DESC')[1]``."""
    from syzgydb_spark.functions.text import STOPWORDS

    words = _WORDS.format(t="text")
    score_cols = []
    structs = []
    for lang in sorted(STOPWORDS):
        lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        score_cols.append(
            f"CASE WHEN len(w) = 0 THEN 0.0 ELSE "
            f"len(list_filter(w, t -> list_contains([{lst}], t)))::DOUBLE / len(w) END"
            f" AS s_{lang}"
        )
        structs.append(f"{{'score': s_{lang}, 'lang': '{lang}'}}")
    return f"""
        WITH toks AS (
          SELECT doc_id, {words} AS w,
                 length(text) AS n_chars,
                 length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS n_cjk
          FROM documents
        ),
        scored AS (SELECT doc_id, n_chars, n_cjk, {', '.join(score_cols)} FROM toks)
        SELECT doc_id,
               CASE WHEN (CASE WHEN n_chars = 0 THEN 0.0
                          ELSE n_cjk::DOUBLE / n_chars END) > 0.05 THEN 'zh'
                    ELSE list_sort([{', '.join(structs)}], 'DESC')[1].lang
               END AS lang_pred
        FROM scored
    """


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: filter-language pre-filtered exact KNN over the
    sf0.001 embeddings table (the reference's canonical search shape,
    rest_test.go:503-570, at collection scale)."""
    return q_knn_filtered_language(spark, "/root/testdata/sf0.001")
