"""Training-pair mining over embedding columns.

Contrastive/retrieval training data needs, for every anchor query, the
nearest examples that are NOT relevant — "hard negatives" (in-batch
random negatives are too easy; the informative ones sit just outside
the positive set). This module mines them as a declarative plan:
distance ranking with an exclusion predicate inside the join, so the
rank is taken over the eligible (negative) candidates only — filtering
*after* a plain top-k would silently return fewer than k and miss the
next-nearest negatives.

Reference lineage: the reference's search surface is pure KNN
(syzgydb collection.go Search); exclusion-aware mining is part of the
declared LLM-pipeline superset and composes the same distance
expressions (functions/vector.py — JVM HOFs, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from syzgydb_spark.functions.vector import distance as dist_fn

__all__ = ["hard_negatives"]


def hard_negatives(
    data: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    method: str = "cosine",
    data_vec: str = "vector",
    data_id: str = "id",
    data_label: str = "label",
    query_vec: str = "query_vector",
    query_id: str = "query_id",
    query_label: str = "query_label",
    exclude_pairs: DataFrame | None = None,
) -> DataFrame:
    """Per query: the ``k`` nearest data rows whose label differs from
    the query's (and, if ``exclude_pairs(query_id, data_id)`` is given,
    that are not known positives) — ranked among eligible candidates,
    tie-broken on ``data_id`` like every other KNN path.

    Plan: the query relation is broadcast (anchor sets are
    dimension-table sized by construction — a training run mines
    negatives for a batch of anchors, not the whole corpus); the fact
    side streams through the label-mismatch predicate and a
    per-query-partitioned rank window. ``exclude_pairs`` is a
    broadcast left-anti join keyed on the pair. For anchor sets beyond
    broadcast size, mine through ``LshIndex.knn_join`` with an
    over-fetch (k·expected-positive-rate) and apply the same exclusion
    + re-rank on its bounded candidate output.
    """
    joined = (
        data.crossJoin(F.broadcast(queries))
        .where(F.col(data_label) != F.col(query_label))
        .withColumn("distance", dist_fn(F.col(data_vec), F.col(query_vec), method))
    )
    if exclude_pairs is not None:
        joined = joined.join(
            F.broadcast(exclude_pairs), [query_id, data_id], "left_anti"
        )
    w = Window.partitionBy(query_id).orderBy(
        F.col("distance").asc(), F.col(data_id).asc()
    )
    return (
        joined.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= k)
    )
