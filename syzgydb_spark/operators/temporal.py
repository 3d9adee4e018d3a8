"""Temporal operators: as-of join and time-bucket rollup.

Neither exists in the reference (it has no time dimension at all);
these are the operators a large-scale event/training-data pipeline
needs next to the relational surface — the "as-of join, range join,
hypertable rollup" family.

Scale design:

* ``asof_join`` uses the union + partitioned-window formulation: tag
  both sides, union, one window per key ordered by (ts, side), carry
  the right side's payload forward with ``last(..., ignorenulls)``.
  ONE shuffle on the join key, zero range explosion — the naive
  ``l.ts >= r.ts`` range join materializes O(|L|·|R|) pairs per key
  before aggregation, which is exactly what dies at 100 TB. Skewed
  keys degrade to one task per hot key (AQE skew handling does not
  split windows); if a single key's history exceeds a task, pre-bucket
  the time axis and as-of join bucket-by-bucket.
* ``time_rollup`` is a plain tumbling-window groupBy — map-side
  partial aggregation, shuffle carries one row per (bucket, group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    ts: str = "ts",
    direction: str = "backward",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    bucket_us: int | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the LATEST right row
    with ``right.ts <= left.ts`` on the same key (``direction=
    'backward'``, inclusive — DuckDB/pandas ``merge_asof`` semantics),
    or the EARLIEST right row with ``right.ts >= left.ts``
    (``'forward'``). Left rows with no match keep NULL payload
    (left-join semantics).

    Returns all left columns plus each requested right payload column
    renamed ``<name><suffix>``.

    ``bucket_us`` is the hot-key escape hatch: by default one window
    partition holds a key's entire history (one task per key — fine
    when keys are plentiful). With ``bucket_us`` set, windows partition
    by (key, time-bucket) and a second two-pass carry fixes up rows
    whose match lies in an earlier bucket: per-(key, bucket) boundary
    payloads (a tiny relation — one row per key per bucket) get a
    running carry per key, joined back by bucket. Identical results
    (differential-tested), but a hot key's work splits across
    history/bucket_us tasks — the ``packing.sequence_bins``
    literal-boundary pattern applied to time.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    payload = right_cols or [
        c for c in right.columns if c not in keys and c != ts
    ]

    # the payload travels as ONE struct so the carried columns always
    # come from the SAME matched right row — carrying columns
    # independently with last(ignorenulls) would let a right row's
    # NULL field fall through to an older row's value (merge_asof
    # never mixes rows). The struct is non-null exactly when built
    # from a right row.
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload]).alias("_payload"),
    )
    payload_type = r_tag.schema["_payload"].dataType
    l_tag = left.select(
        "*",
        F.col(ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_payload"),
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    order = F.col("_ats").asc() if direction == "backward" else F.col("_ats").desc()
    backward = direction == "backward"
    if bucket_us is None:
        # right rows order BEFORE left rows at equal ts so an exact
        # timestamp match is visible to the left row (inclusive)
        w = (
            Window.partitionBy(*keys)
            .orderBy(order, F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(
            "_match", F.last("_payload", ignorenulls=True).over(w)
        )
    else:
        b = F.floor(F.unix_micros(F.col("_ats").cast("timestamp")) / bucket_us)
        ub = u.withColumn("_b", b)
        # pass 1: within-bucket match (windows split by time bucket)
        w_local = (
            Window.partitionBy(*keys, "_b")
            .orderBy(order, F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = ub.withColumn(
            "_local", F.last("_payload", ignorenulls=True).over(w_local)
        )
        # pass 2: per-(key, bucket) boundary payload (the bucket's last
        # right row going backward / first going forward) → running
        # carry from STRICTLY earlier (later) buckets, per key, over a
        # one-row-per-bucket relation
        rsum = (
            ub.where(F.col("_side") == 0)
            .groupBy(*keys, "_b")
            .agg(
                (
                    F.max_by("_payload", "_ats")
                    if backward
                    else F.min_by("_payload", "_ats")
                ).alias("_blast")
            )
        )
        all_buckets = (
            ub.select(*keys, "_b").distinct()
        )
        w_carry = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_b").asc() if backward else F.col("_b").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            all_buckets.join(rsum, on=keys + ["_b"], how="left")
            .withColumn("_carry", F.last("_blast", ignorenulls=True).over(w_carry))
            .select(*keys, "_b", "_carry")
        )
        matched = local.join(carry, on=keys + ["_b"], how="left").withColumn(
            "_match", F.coalesce(F.col("_local"), F.col("_carry"))
        )
    return (
        matched.where(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col("_match")[c].alias(f"{c}{suffix}") for c in payload],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    ts: str = "ts",
    lower_us: int,
    upper_us: int,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Band join: all pairs with equal keys and ``right.ts - left.ts``
    in ``[lower_us, upper_us]`` microseconds. Returns left columns plus
    the right's ts (``ts<suffix>``) and payload columns suffixed; left
    rows with no partner are absent (inner semantics).

    Scale shape: a plain ``l.ts BETWEEN ...`` theta-join explodes to
    O(|L|·|R|) comparisons per key. Here the time axis is bucketed at
    the band width W = upper−lower: each right row lands in exactly ONE
    bucket, each left row explodes to the ≤2 buckets its band overlaps,
    and the join is a pure equi-join on (keys…, bucket) with an exact
    band filter after — candidates are bounded by per-bucket
    co-residency, never by |L|·|R|, and every pair appears exactly once
    (via the right row's single bucket)."""
    keys = [on] if isinstance(on, str) else list(on)
    if upper_us <= lower_us:
        raise ValueError("upper_us must exceed lower_us")
    W = upper_us - lower_us
    payload = right_cols or [
        c for c in right.columns if c not in keys and c != ts
    ]

    r = right.select(
        *[F.col(k) for k in keys],
        F.unix_micros(F.col(ts).cast("timestamp")).alias("_rus"),
        # the right ts rides through with its ORIGINAL value and type
        # (the docstring contract); _rus is bucketing-internal only
        F.col(ts).alias(f"{ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    ).withColumn("_bucket", F.floor(F.col("_rus") / W))
    l_us = F.unix_micros(F.col(ts).cast("timestamp"))
    l = (
        left.withColumn("_lus", l_us)
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor((F.col("_lus") + lower_us) / W),
                    F.floor((F.col("_lus") + upper_us) / W),
                )
            ),
        )
    )
    joined = l.join(r, on=keys + ["_bucket"]).where(
        F.col("_rus").between(
            F.col("_lus") + lower_us, F.col("_lus") + upper_us
        )
    )
    out_cols = (
        [F.col(c) for c in left.columns]
        + [F.col(f"{ts}{suffix}")]
        + [F.col(f"{c}{suffix}") for c in payload]
    )
    return joined.select(*out_cols)


def time_rollup(
    events: DataFrame,
    *,
    ts: str = "ts",
    bucket: str = "1 day",
    slide: str | None = None,
    group_by: list[str] | None = None,
    aggs: dict | None = None,
) -> DataFrame:
    """Time-bucket rollup: epoch-aligned windows of ``bucket`` width
    per ``group_by`` key, with ``aggs`` mapping output column →
    aggregate Column (default: ``n`` row count). With ``slide`` set
    (must evenly divide into overlapping windows, e.g. bucket='1 hour'
    slide='15 minutes') each event lands in bucket/slide windows —
    the hypertable continuous-aggregate shape.

    Emits ``bucket_start`` (TIMESTAMP) plus the group and aggregate
    columns. Pure Catalyst — map-side partial agg, one narrow shuffle
    row per (bucket, group); the sliding form multiplies shuffle rows
    by the overlap factor, never the input rows."""
    group_by = group_by or []
    aggs = aggs or {"n": F.count(F.lit(1))}
    agg_cols = [v.alias(k) for k, v in aggs.items()]
    win = F.window(ts, bucket, slide) if slide else F.window(ts, bucket)
    return (
        events.groupBy(win.alias("_w"), *group_by)
        .agg(*agg_cols)
        .select(
            F.col("_w.start").alias("bucket_start"),
            *group_by,
            *[F.col(k) for k in aggs],
        )
    )


def sessionize(
    df: DataFrame,
    *,
    key: str | list[str] = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: rows of one key belong to the same
    session while consecutive timestamps are at most ``gap`` apart; a
    larger gap starts a new session. Returns the input plus
    ``session_seq`` (1-based per-key session counter) — the standard
    lag/cumulative-sum formulation, semantically identical to what
    ``F.session_window`` merges in an aggregation but keeping the
    event rows (session_window only exists as a groupBy key).

    ONE shuffle on the key. Each key's history sorts within one task —
    right for user-grained keys (bounded per-user event counts); the
    same caveat and remedy as asof_join applies to pathological hot
    keys. ``tie_break`` columns extend the in-key ordering so runs are
    deterministic when timestamps can collide.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (tie_break or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_sess = (
        F.col(ts).cast("timestamp")
        > (F.lag(F.col(ts).cast("timestamp")).over(w) + gap_expr)
    )
    boundary = F.when(new_sess.isNull() | new_sess, 1).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def session_stats(
    df: DataFrame,
    *,
    key: str | list[str] = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    tie_break: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Per-session rollup over ``sessionize``: session start/end,
    duration, and event count per (key, session_seq), plus any extra
    aggregate expressions. The window shuffle and this groupBy share
    the same key prefix, so AQE coalesces them into one exchange."""
    keys = [key] if isinstance(key, str) else list(key)
    base = sessionize(df, key=keys, ts=ts, gap=gap, tie_break=tie_break)
    extra = list(aggs) if aggs else []
    return base.groupBy(*keys, "session_seq").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_micros(F.max(ts).cast("timestamp"))
            - F.unix_micros(F.min(ts).cast("timestamp"))
        ).alias("duration_us"),
        *extra,
    )
