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

__all__ = ["hard_negatives", "mmr_rerank"]


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
    # per-side norms precomputed before the pair join (cosine): one
    # fold per eligible pair instead of five — bit-identical values
    # (functions.vector.prenormed_pair_distance)
    from syzgydb_spark.functions.vector import prenormed_pair_distance

    data, queries, dist, helpers = prenormed_pair_distance(
        data, queries, data_vec, query_vec, method
    )
    joined = (
        data.crossJoin(F.broadcast(queries))
        .where(F.col(data_label) != F.col(query_label))
        .withColumn("distance", dist)
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
        .drop(*helpers)
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    *,
    lambda_: float = 0.7,
    query_id: str = "query_id",
    id_col: str = "id",
    vec_col: str = "vector",
    rel_col: str = "relevance",
    round_dp: int = 9,
) -> DataFrame:
    """Maximal Marginal Relevance diversity re-rank: per query, greedily
    pick ``k`` candidates maximizing ``λ·relevance − (1−λ)·max cosine
    similarity to the already-selected`` (ties → lowest id) — the
    standard fix for a top-k full of near-copies of one passage in
    retrieval serving. Returns ``(query_id, id, mmr_rank)``.

    Shape: the candidate sets are BOUNDED by construction (a top-N
    search result per query, N ≈ tens), so the greedy loop is an
    ``applyInPandas`` kernel per query group — one shuffle on
    ``query_id``, each task an N×N BLAS gram matrix + a k-step scan.
    Nothing here grows with the corpus; corpus-sized work happened in
    the search that produced the candidates.

    Engine-exact determinism: relevance and pairwise similarities are
    rounded to ``round_dp`` decimals BEFORE the greedy loop, so the
    argmax sees identical IEEE doubles in any engine — the DuckDB
    oracle replays the selection with k unrolled argmax stages and
    hash-matches. (Unrounded, a BLAS dot product and a SQL fold can
    disagree in the last ulp and flip a near-tie.) Zero-norm vectors
    get similarity 0 to everything.
    """
    import pandas as pd

    lam = float(lambda_)
    dp = int(round_dp)
    kk = int(k)
    # Output field types mirror the input columns (string/int/long ids all
    # work) — hardcoding 'long' would break non-long callers at runtime.
    q_type = candidates.schema[query_id].dataType.simpleString()
    id_type = candidates.schema[id_col].dataType.simpleString()
    out_schema = f"{query_id} {q_type}, {id_col} {id_type}, mmr_rank long"

    def select_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(X, axis=1)
        safe = np.where(norms == 0.0, 1.0, norms)
        U = X / safe[:, None]
        sims = np.round(U @ U.T, dp)
        sims[norms == 0.0, :] = 0.0
        sims[:, norms == 0.0] = 0.0
        rel = np.round(pdf[rel_col].to_numpy(dtype=np.float64), dp)
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        chosen: list[int] = []
        remaining = list(range(n))
        max_sim = np.zeros(n)
        for _ in range(min(kk, n)):
            best, best_score = None, None
            for i in remaining:
                score = lam * rel[i] - (1.0 - lam) * (
                    max_sim[i] if chosen else 0.0
                )
                if (
                    best is None
                    or score > best_score
                    or (score == best_score and ids[i] < ids[best])
                ):
                    best, best_score = i, score
            chosen.append(best)
            remaining.remove(best)
            max_sim = np.maximum(max_sim, sims[best])
        return pd.DataFrame(
            {
                query_id: pdf[query_id].iloc[:1].repeat(len(chosen)).to_numpy(),
                id_col: ids[chosen],
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int64),
            }
        )

    return (
        candidates.select(query_id, id_col, vec_col, rel_col)
        .groupBy(query_id)
        .applyInPandas(select_group, out_schema)
    )
