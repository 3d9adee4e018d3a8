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


def histogram_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    probs: tuple = (0.5, 0.9, 0.99),
    *,
    precision: int = 6,
    value_col: str = "value",
) -> DataFrame:
    """Per-key quantiles WITHOUT a per-key sort: the skew-safe
    replacement for the holistic window family (``percent_rank`` /
    ``ntile``) that nothing bounds natively on a hot key (the
    docs/SCALE.md skew finding). This is ``perplexity_bands``'
    boundary machinery as a reusable operator.

    Values are rounded to ``precision`` decimals and aggregated into a
    per-(key, bucket) histogram — ONE narrow keyed aggregation,
    map-side combined; every later step runs on that bounded relation.
    The quantile for probability p is the inverse-CDF step value: the
    smallest bucket whose cumulative count reaches ``ceil(N·p)`` —
    i.e. exact type-1 quantiles of the ROUNDED values. Returns
    ``(keys..., prob, value)``; NULLs are excluded; a key with no
    non-null rows is absent.

    Boundedness is the caller's rounding contract: distinct buckets
    per key ≤ value-range · 10^precision, so pick ``precision`` to
    make that small (0 for integer-ish columns, 2-6 for scores in
    [0, 1]). For interpolated single-group quantiles over modest
    groups use ``quality.length_quantiles``'s exact ``percentile``;
    for one global quantile use ``approx_percentile``. Engine note:
    half-way rounding differs across engines on doubles (Spark
    HALF_UP) — cross-engine replays should use integer-valued
    columns or pre-rounded values, as the ``histogram_quantiles``
    oracle does."""
    if not probs or any(p <= 0 or p > 1 for p in probs):
        raise ValueError("probs must be in (0, 1]")
    kcols = [F.col(k) for k in keys]
    b = F.round(F.col(col), int(precision))
    hist = (
        df.where(b.isNotNull())
        .groupBy(*kcols, b.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wcum = (
        Window.partitionBy(*keys)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(wcum)).withColumn(
        "_n", F.sum("_c").over(Window.partitionBy(*keys))
    )
    # all boundaries from ONE aggregation over the bounded histogram
    bounds = cum.groupBy(*kcols).agg(
        *[
            F.min(
                F.when(
                    F.col("_cum") >= F.ceil(F.col("_n") * float(p)),
                    F.col("_b"),
                )
            ).alias(f"_q{i}")
            for i, p in enumerate(probs)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("prob"), F.col(f"_q{i}").alias(value_col)
            )
            for i, p in enumerate(probs)
        ]
    )
    return bounds.select(*kcols, F.explode(pairs).alias("_e")).select(
        *keys, "_e.prob", f"_e.{value_col}"
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
