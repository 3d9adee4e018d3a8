"""Hybrid search service — the reference's serving surface composed
end to end on this engine:

    build: documents + embeddings → a Collection (LSH-indexed,
           metadata from the document columns) + a bucketed BM25
           posting store (index cost paid once at write)
    serve: (query text, query vector, metadata filter) →
           filtered ANN top-k  ⊕  BM25 top-k  → reciprocal-rank
           fusion → top-n with metadata

This is what "a user of the reference could switch" looks like in
practice: the collection API (create/add/search with the filter
language and percent_searched observability) carries the vector side,
and the training-data superset (BM25 store + RRF) carries the lexical
side. Run directly:

    python examples/search_service.py [sf_dir] [work_dir]

Scale notes: the serve path's plans are the ones the bench measures —
LSH bucket equi-join + re-rank for ANN (candidates observable), probed
term buckets with no store-side Exchange for BM25, single-partition
rank windows only over the pre-truncated top-k candidate lists.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from syzgydb_spark.collection import Collection, CollectionOptions
from syzgydb_spark.operators.bm25 import (
    bm25_score,
    build_bm25_store,
    read_bm25_store,
    reciprocal_rank_fusion,
)


def build_service(spark, sf_dir: str, work_dir: str, *, dim: int | None = None):
    """Index both modalities once; returns (collection, store_table)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    joined = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    if dim is None:
        dim = len(joined.select("embedding").first()[0])

    coll = Collection.create(
        spark,
        os.path.join(work_dir, "collection"),
        CollectionOptions(
            name="docs",
            dimension_count=dim,
            distance_method="cosine",
            lsh={"num_tables": 6, "num_planes": 8},
        ),
        overwrite=True,
    )
    coll.add_documents(
        joined.select(
            F.col("doc_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("vector"),
            F.to_json(F.struct("lang", "source", "n_chars")).alias("metadata"),
        )
    )

    store = "search_service_bm25"
    build_bm25_store(
        docs, store, buckets=8, path=os.path.join(work_dir, "bm25")
    )
    return coll, store


def serve(
    spark,
    coll: Collection,
    store: str,
    *,
    query_text: str,
    query_vector: list[float],
    filter: str | None = None,
    k_candidates: int = 20,
    top: int = 10,
) -> DataFrame:
    """One hybrid query → (doc_id, rrf_score, metadata) top-``top``."""
    ann = coll.search(
        query_vector, k=k_candidates, filter=filter, precision="medium"
    ).select(F.col("id").alias("doc_id"), "distance", "metadata")
    postings, stats = read_bm25_store(spark, store)
    lex = bm25_score(postings, stats, query_text, k=k_candidates)
    fused = reciprocal_rank_fusion(
        [(ann, "distance", True), (lex, "score", False)], top=top
    )
    return fused.join(ann.select("doc_id", "metadata"), "doc_id", "left")


if __name__ == "__main__":
    from syzgydb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/search_service"
    spark = get_spark(app_name="search-service")
    spark.sparkContext.setLogLevel("ERROR")
    coll, store = build_service(spark, sf_dir, work)
    qv = [
        float(x)
        for x in spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .where("vec_id = 0").first()["embedding"]
    ]
    res = serve(
        spark, coll, store,
        query_text="table scan filter value",
        query_vector=qv,
        filter="lang IN ['en', 'de']",
    )
    for r in res.collect():
        print(f"{r['doc_id']:8d}  {r['rrf_score']:.4f}  {r['metadata']}")
