"""Hot-key skew mitigation: two-stage (salted) aggregation shapes.

Spark already handles the easy skew cases — plain ``groupBy(...).agg``
does map-side partial aggregation, and AQE splits skewed sort-merge
join partitions at runtime. What neither fixes is the per-key
*holistic* work that must see every row of a key in one place:

- ``count(DISTINCT x)`` per key — the distinct set for a hot key is
  built in a single task;
- per-key top-k windows — ``row_number() over (partition by key)``
  sorts the ENTIRE hot key's rows in one task.

Both have exact two-stage decompositions that bound every task by
construction; this module provides them. Results are bit-identical to
the single-stage plan (both are exact algorithms, and the top-k order
is required total), so the DuckDB oracles are the plain one-stage SQL.

Reference: no analog (the reference is single-node; skew is a
distribution concern). Part of the 100 TB design surface, same
motivation as the plan advisor's global-window check
(plans/advisor.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_stage_distinct_count(
    df: DataFrame,
    keys: list[str],
    col: str,
    *,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact ``count(DISTINCT col)`` per key without ever building a
    per-key distinct set in one task: stage 1 aggregates on
    ``(keys..., col)`` — the value itself is the salt, so a hot key's
    distinct values spread over the whole cluster and map-side combine
    absorbs the duplicate mass — stage 2 counts rows per key. NULL
    values are not counted (SQL COUNT(DISTINCT) semantics).

    Both shuffles carry one row per DISTINCT (key, value) — at 100 TB
    that is the vocabulary, not the corpus. Use whenever a key's
    distinct-value set can be large or skewed; use
    ``approx_count_distinct`` when ±2% error is acceptable and even
    the distinct relation is too wide."""
    kcols = [F.col(k) for k in keys]
    stage1 = (
        df.where(F.col(col).isNotNull())
        .groupBy(*kcols, F.col(col))
        .agg(F.lit(1).alias("_one"))
    )
    return stage1.groupBy(*kcols).agg(
        F.count(F.lit(1)).cast("long").alias(alias)
    )


def salted_topk(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
    k: int,
    *,
    n_salts: int = 16,
    rank_col: str = "rank",
    salt_on: str | None = None,
) -> DataFrame:
    """Exact per-key top-k under a TOTAL order, skew-safe: stage 1
    ranks within ``(keys..., salt)`` and keeps each salt's local
    top-k — no task ever sorts more than (hot key rows)/n_salts —
    stage 2 ranks the surviving ≤ k·n_salts rows per key and keeps the
    true top-k. Exactness needs the order to be total (include a
    tie-break column); with ties left ambiguous the two plans may pick
    different-but-equally-ranked rows, same as any window.

    The salt is ``pmod(hash(salt_on), n_salts)`` when ``salt_on``
    names a column (deterministic row spread), else
    ``spark_partition_id() % n_salts`` (free, no per-row hash; results
    are identical either way — stage 2 re-ranks globally per key).

    Returns ``df``'s columns plus ``rank_col`` (1-based). This is the
    scale path behind hot-domain caps (functions/url.py
    ``per_domain_cap``) and hot-stratum leaderboards (``top_terms``)."""
    if salt_on is not None:
        salt = F.pmod(F.hash(F.col(salt_on)), F.lit(int(n_salts)))
    else:
        salt = F.spark_partition_id() % int(n_salts)
    w1 = Window.partitionBy(*[F.col(c) for c in keys], F.col("_salt")).orderBy(
        *order_cols
    )
    w2 = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order_cols)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= int(k))
        .withColumn(rank_col, F.row_number().over(w2).cast("long"))
        .where(F.col(rank_col) <= int(k))
        .drop("_salt", "_r1")
    )
