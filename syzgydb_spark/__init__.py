"""syzgydb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of smhanov/syzgydb.

The reference (https://github.com/smhanov/syzgydb, snapshot at
/root/reference) is an embeddable single-node vector database written in
Go. This package re-expresses its data model and query surface — document
collections ``(id, vector, metadata)``, k-nearest-neighbor / radius /
filtered search, a metadata filter expression language, LSH approximate
indexing, quantization tiers, JSON import/export, text embedding — as an
idiomatic Apache Spark DataFrame engine, and extends it with the
large-scale training-data pipeline operators (deduplication, similarity
join, text analysis, multimodal columns) that a 100 TB deployment needs.

Nothing here is a port: execution is Catalyst/Tungsten (DataFrames,
higher-order functions, Arrow-batched pandas UDFs), not a translation of
the reference's mmap/goroutine engine.
"""

from syzgydb_spark.session import get_spark
from syzgydb_spark.cache import release_cached
from syzgydb_spark.query import compile_filter
from syzgydb_spark.collection import Collection, CollectionOptions
from syzgydb_spark.functions.vector import (
    euclidean_distance,
    cosine_distance,
    dot_product,
    l2_norm,
    l2_normalize,
    vector_mid,
    distance,
)
from syzgydb_spark.operators.knn import search, knn_join, knn_join_fast
from syzgydb_spark.operators.lsh import LshIndex
from syzgydb_spark.embedding import embed_text, make_http_model, stub_model
from syzgydb_spark.plans import scale_report, assert_scalable

__all__ = [
    "get_spark",
    "release_cached",
    "compile_filter",
    "Collection",
    "CollectionOptions",
    "euclidean_distance",
    "cosine_distance",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "vector_mid",
    "distance",
    "search",
    "knn_join",
    "knn_join_fast",
    "LshIndex",
    "embed_text",
    "make_http_model",
    "stub_model",
    "scale_report",
    "assert_scalable",
]
