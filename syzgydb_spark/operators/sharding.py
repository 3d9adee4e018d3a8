"""Deterministic corpus shuffling and shard assignment.

The last step of a training-data pipeline is a *global deterministic
shuffle* — examples must reach the trainer in an order that is
(a) pseudo-random (no source/time locality: a model that sees a whole
crawl-domain in sequence overfits batch-locally), (b) reproducible
(re-running the pipeline bit-for-bit reproduces the shard files), and
(c) resumable (shard N's contents don't depend on how many executors
ran). Spark's ``orderBy(rand())`` is none of these — ``rand`` is
per-task-attempt nondeterministic under retries.

The engine's shape: a content-addressed sort key ``md5(seed:id)``
(engine-portable — DuckDB reproduces it, so shard assignment is
oracle-checkable) gives every row a stable pseudo-random position.

* ``shard_assignments`` — pure projection (ZERO shuffle): shard =
  key mod n_shards. Balanced in expectation (md5 is uniform), exactly
  reproducible, and prunable: a trainer reading shard 17 scans one
  parquet partition.
* ``shard_positions`` — adds the within-shard ordinal via one window
  per shard. Use for bounded shards / oracle checks; the writer path
  below avoids materializing ordinals at scale.
* ``write_shards`` — one ``repartition(n_shards, shard)`` shuffle, then
  ``sortWithinPartitions(sort_key)``: each output file is internally
  ordered with NO global sort (no range-partition sampling pass, no
  driver involvement). At 100 TB with n_shards sized to ~1-4 GB per
  shard this is a single all-to-all — the minimum any global shuffle
  pays — and AQE coalescing never merges shards because the partition
  count is pinned by the explicit repartition.

Extends the reference's surface (it has no corpus operators; the
north-star pipeline needs a shuffle/shard stage between dedup and the
trainer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from syzgydb_spark.functions.text import md5_long


def shuffle_key(id_col: str = "doc_id", *, seed: int = 42) -> F.Column:
    """Stable pseudo-random 60-bit sort key for a row: md5 of
    ``"<seed>:<id>"``. Same (seed, id) → same key in Spark and DuckDB
    (``('0x' || substr(md5(seed || ':' || id), 1, 15))::BIGINT``)."""
    # NULL ids get a sentinel: concat_ws silently SKIPS nulls, which
    # would collide every null-id row on md5('<seed>') — one sort key,
    # one shard, one split for all of them
    return md5_long(
        F.concat_ws(
            ":",
            F.lit(str(seed)),
            F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null")),
        )
    )


def shard_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    n_shards: int,
    seed: int = 42,
) -> DataFrame:
    """Append ``sort_key`` and ``shard`` columns. Pure projection —
    no shuffle, no RNG state; kept deterministic under task retries
    and across engines."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    key = shuffle_key(id_col, seed=seed)
    return df.withColumn("sort_key", key).withColumn(
        "shard", F.pmod(F.col("sort_key"), F.lit(n_shards)).cast("int")
    )


def shard_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    n_shards: int,
    seed: int = 42,
) -> DataFrame:
    """``(… , sort_key, shard, pos)`` — pos is the row's 0-based
    ordinal within its shard in shuffled order (ties broken by id, so
    the order is total and reproducible).

    One shuffle; each shard is a single window partition, so size
    shards to what one task should hold (the writer path has no such
    constraint — it never numbers rows)."""
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return shard_assignments(df, id_col, n_shards=n_shards, seed=seed).withColumn(
        "pos", F.row_number().over(w) - 1
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    *,
    n_shards: int,
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Write the corpus as ``n_shards`` internally-shuffled parquet
    shards under ``path`` (directory per ``shard=N``). One all-to-all
    shuffle + per-partition sort; re-running reproduces byte-identical
    shard membership and row order."""
    out = shard_assignments(df, id_col, n_shards=n_shards, seed=seed)
    (
        # RANGE repartition on (shard, sort_key, id): a hash
        # repartition of the shard NUMBER birthday-collides shard
        # values into tasks (~1/e of writers idle, stragglers carrying
        # 2-4 shards); ranges give every task an equal contiguous slice
        # instead. A shard straddling two tasks writes two files whose
        # task order equals range order, so within-shard row order
        # stays globally sorted across the shard dir's files. shard
        # leads the sort so the rows arrive at the writer already
        # ordered by the partition column — otherwise FileFormatWriter
        # inserts its own (unstable) sort on `shard` and destroys the
        # within-shard shuffle order.
        out.repartitionByRange(n_shards, "shard", "sort_key", id_col)
        .sortWithinPartitions("shard", "sort_key", id_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic dataset split (train/val/test): assign each row to
    a named split with probability proportional to its weight, keyed on
    the content-addressed ``shuffle_key`` — so membership is a pure
    function of (seed, id): reproducible across runs and engines,
    stable under re-partitioning/retries (``randomSplit`` is neither),
    and disjoint-and-exhaustive by construction (threshold intervals
    partition the key space). ZERO shuffle — one projection.

    Returns the input plus a ``split`` column. Split boundaries are
    cumulative-weight fractions of the 60-bit md5 key space, evaluated
    in the given dict order (insertion order is the contract, so
    {'train': .98, 'val': .01, 'test': .01} is replayed identically by
    a SQL CASE on the same cumulative thresholds)."""
    total = float(sum(weights.values()))
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative with a positive sum: {weights}")
    key = shuffle_key(id_col, seed=seed).cast("double")
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = key < acc * 2.0**60
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    seed: int = 42,
    max_iterations: int = 25,
) -> DataFrame:
    """Group-aware :func:`hash_split`: every member of a near-duplicate
    cluster lands in the SAME split — membership is keyed on the
    cluster's ``group_id`` (component min id), not the document id.

    This closes the eval-leakage hole a plain per-document split
    leaves open: two near-copies of one document split across
    train/test let the model "memorize the test set" through its
    training twin, inflating eval scores — the reason dedup papers
    split by cluster. Edge-free documents have ``group_id == doc_id``,
    so their assignment is IDENTICAL to ``hash_split``'s (adding pair
    information never reshuffles the unaffected corpus).

    Shape: label propagation over the pair relation
    (``dedup.duplicate_groups``, O(component diameter) bounded joins)
    + a left join + the zero-shuffle threshold projection. Returns
    ``docs`` plus ``group_id`` and ``split``.
    """
    from syzgydb_spark.operators.dedup import duplicate_groups

    groups = duplicate_groups(
        pairs, id_a=id_a, id_b=id_b, max_iterations=max_iterations
    )
    if id_col != "doc_id":
        groups = groups.withColumnRenamed("doc_id", id_col)
    member = docs.join(groups, id_col, "left").withColumn(
        "group_id", F.coalesce("group_id", F.col(id_col))
    )
    return hash_split(member, weights, id_col="group_id", seed=seed)
