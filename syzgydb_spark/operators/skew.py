"""Hot-key skew: explicit two-stage shapes + verification of Spark's
native coverage.

Per-key *holistic* work — a hot key's distinct-value set, a hot key's
top-k sort — is the classic skew trap: naively it all lands in one
task. Measuring it on this engine (tools/bench_skew.py: 40M rows, one
key owning 90%) produced a finding worth recording instead of a fix:

- ``count(DISTINCT v)`` per key: Catalyst plans the exact two-stage
  decomposition natively — partial dedup keyed on ``(k, v)`` (the
  value is the salt), exchange on ``(k, v)``, per-slice distinct
  counts, then a second exchange on ``k`` to sum. No task ever holds
  a hot key's full distinct set.
- rank-filter top-k (``row_number() ≤ k``): Spark ≥3.5 inserts
  ``WindowGroupLimit ... Partial`` BEFORE the exchange — a map-side
  per-key bounded heap, so the hot key ships ≤ k rows per input
  partition and the final task sorts ≤ k·partitions rows.

The measured consequence: the salted/two-stage rewrites below are
**wall-clock neutral** on Spark 4 (0.8-0.9× — the native plans were
never skew-bound). They are kept as (a) the explicit, engine-portable
statement of the decomposition for planners without these rules, and
(b) regression gates: ``tests/test_url_skew.py`` plan-asserts that
Spark still plans the native forms this way, so a Spark upgrade that
regressed either would fail the build, and the plan advisor stays
correct in NOT flagging keyed rank-filter windows.

What Spark does NOT bound natively (and these helpers don't either):
holistic windows that cannot be pruned without the full partition —
``percent_rank``/``ntile`` over a hot key, unbounded-frame
``collect_list``. The advisor's global-window check catches the empty
partitionBy case; per-key holistic frames on skewed keys remain the
caller's modeling decision (pre-aggregate, or bucket the key).

Reference: no analog (the reference is single-node). Part of the
100 TB design surface.
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
    """Exact ``count(DISTINCT col)`` per key as the explicit two-stage
    plan: stage 1 aggregates on ``(keys..., col)`` — the value itself
    is the salt, spreading a hot key's distinct values across the
    cluster — stage 2 counts rows per key. NULLs are not counted
    (SQL COUNT(DISTINCT) semantics). Both shuffles carry one row per
    DISTINCT (key, value) — the vocabulary, not the corpus.

    Catalyst plans ``groupBy(k).agg(countDistinct(v))`` in this exact
    shape natively (plan-asserted in tests), so prefer the built-in in
    application code; this form is the engine-portable spelling and
    the one to reach for when composing further logic on the distinct
    (key, value) relation before counting. Use
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
    """Exact per-key top-k under a TOTAL order via explicit salting:
    stage 1 ranks within ``(keys..., salt)`` and keeps each salt's
    local top-k; stage 2 ranks the surviving ≤ k·n_salts rows per key.
    Exactness requires the order to be total (include a tie-break);
    with ambiguous ties the two plans may pick different-but-equally-
    ranked rows, same as any window.

    On Spark ≥3.5 the plain ``row_number().over(key) ≤ k`` pattern is
    already skew-bounded by ``WindowGroupLimit Partial`` (map-side
    bounded heap before the exchange — plan-asserted in tests), and
    measures ~equal to this rewrite (tools/bench_skew.py); prefer the
    plain window there. This form is for engines/versions without the
    group-limit rule, and for pipelines where the rank filter is
    applied far from the window (where the optimizer cannot infer the
    limit).

    The salt is ``pmod(hash(salt_on), n_salts)`` when ``salt_on``
    names a column (deterministic row spread), else
    ``spark_partition_id() % n_salts`` (free; results identical either
    way — stage 2 re-ranks globally per key). Returns ``df``'s columns
    plus ``rank_col`` (1-based)."""
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
