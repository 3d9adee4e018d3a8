from syzgydb_spark.functions.vector import (
    euclidean_distance,
    cosine_distance,
    dot_product,
    l2_norm,
    l2_normalize,
    vector_mid,
    distance,
)

__all__ = [
    "euclidean_distance",
    "cosine_distance",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "vector_mid",
    "distance",
]
