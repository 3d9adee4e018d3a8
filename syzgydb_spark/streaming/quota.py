"""Streaming per-stratum token quotas — custom stateful operator.

The training-mixture packing step: accept documents from each source
only until that source's token budget is spent, across the whole run.
No built-in streaming operator expresses "running sum per key with a
cutoff" (window aggregates emit aggregates, not the surviving rows;
``dropDuplicates`` dedups, it doesn't meter), so this is the
engine's ``applyInPandasWithState`` operator: state = tokens accepted
so far per stratum, persisted in the state store across micro-batches
and restored on restart from the checkpoint.

Scale shape: one shuffle per micro-batch (groupBy stratum — low
cardinality), state is one LONG per stratum. Rows are metered in
``seq_col`` order inside each batch so the accepted set is
deterministic and re-runs of the same input accept the same documents
(same contract as the seq-ordered streaming dedup in ingest.py).

``batch_token_quota`` is the batch twin (state starts at zero, one
pass) — the oracle for the streaming operator in tests, and a usable
mixture-packing step on static tables in its own right.

All kernels are nested closures so cloudpickle ships them by value —
executors never need this package importable (house rule).
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "tokens_used long"


def _make_meter(seq_col: str, token_col: str, quota: int, mode: str):
    """Metering kernel, two policies over rows in seq order:

    * ``greedy`` — a document that would overshoot is skipped without
      consuming budget; later (smaller) documents may still fit. Packs
      tighter; inherently sequential.
    * ``prefix`` — every document consumes budget whether accepted or
      not, so acceptance is simply ``cumsum ≤ quota``: the accepted
      set is a prefix property, reproducible by a SQL window (see
      :func:`token_quota_prefix`).

    Nested so it pickles by value."""
    if mode not in ("greedy", "prefix"):
        raise ValueError(f"unknown quota mode: {mode!r}")

    def meter(rows, used: int):
        import numpy as np

        rows = rows.sort_values(seq_col)
        mask = np.zeros(len(rows), dtype=bool)
        for i, t in enumerate(rows[token_col]):
            t = int(t)
            fits = used + t <= quota
            mask[i] = fits
            if fits or mode == "prefix":
                used += t
        # ndarray mask: a plain list would be column-indexing when empty
        return rows[mask], used

    return meter


def token_quota_prefix(
    docs: DataFrame,
    quota: int,
    *,
    strata_col: str = "source",
    token_col: str = "n_tokens",
    seq_col: str = "doc_id",
    num_buckets: int | None = None,
) -> DataFrame:
    """Batch prefix-mode quota: keep a row iff its stratum's running
    token sum (in ``seq_col`` order, inclusive) stays within ``quota``.
    SQL-reproducible — the oracle-checked member of the quota family.

    Scale shape: a plain ``Window.partitionBy(stratum)`` cumulative sum
    puts each stratum's ENTIRE corpus in one task — with a handful of
    sources at 100 TB that is a single-task sort-and-fold. Instead this
    uses the same two-pass literal-boundary prefix scan as
    ``packing.sequence_bins``, applied per stratum:

    1. ~``num_buckets`` range boundaries on ``seq_col`` (approxQuantile,
       embedded as literals — deterministic across both passes);
    2. per-(stratum, bucket) running sums — strata × buckets parallel
       window tasks, each holding only its slice;
    3. per-(stratum, bucket) TOTALS to the driver (O(strata × buckets)
       rows — the broadcast-dim smallness contract), prefix-summed per
       stratum, shipped back as a literal map keyed by
       ``stratum <US> bucket``.

    ``seq_col`` must be numeric to compute range boundaries; otherwise
    the operator falls back to the one-task-per-stratum window (small
    inputs only, where that is also the fastest plan)."""
    p = num_buckets or docs.sparkSession.sparkContext.defaultParallelism
    seq_type = dict(docs.dtypes).get(seq_col, "")
    numeric_seq = seq_type in (
        "tinyint", "smallint", "int", "bigint", "float", "double",
    ) or seq_type.startswith("decimal")  # dtype renders as 'decimal(p,s)'
    bounds: list = []
    if p > 1 and numeric_seq:
        # ONE materialized snapshot feeds every pass — the boundary
        # probe, the driver-side totals, AND the per-bucket running-sum
        # window — so a non-deterministic source (re-sampled read, a
        # view over changing files) cannot misalign the offsets pass
        # against the acceptance pass. Full-width on purpose: pass 1
        # must emit all columns, and feeding it from the same snapshot
        # is what guarantees run/offset agreement.
        # Recompute story: a persist would RECOMPUTE lost blocks, and a
        # recompute of a non-deterministic source is exactly the
        # misalignment this snapshot exists to prevent — losing an
        # executor mid-micro-batch therefore fails the batch and the
        # sink retries it whole (the streaming engine's native unit of
        # retry). The snapshot is one micro-batch, not the corpus.
        docs = docs.localCheckpoint(eager=True)
        narrow = docs.select(strata_col, seq_col, token_col)
        probs = [i / p for i in range(1, p)]
        bounds = sorted(set(narrow.stat.approxQuantile(seq_col, probs, 0.001)))
    if not bounds:
        w = (
            Window.partitionBy(strata_col)
            .orderBy(seq_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        run = F.sum(F.col(token_col)).over(w)
        return docs.withColumn("_run", run).where(F.col("_run") <= quota).drop("_run")

    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col(seq_col) > F.lit(b)).cast("int")

    # pass 1: inclusive running sum within each (stratum, bucket) slice
    w = (
        Window.partitionBy(strata_col, "_bkt")
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = docs.withColumn("_bkt", bucket).withColumn(
        "_run_local", F.sum(F.col(token_col)).over(w)
    )

    # pass 2: (stratum, bucket) totals → per-stratum exclusive prefix
    # offsets on the driver, back as one literal map
    # the stratum key string is rendered by SPARK's cast in the totals
    # pass and looked up with the same cast — a Python f-string render
    # would disagree for boolean ('True' vs 'true'), decimal, and null
    # strata, silently zeroing the offsets. Nulls map to a sentinel on
    # both sides (concat_ws would drop them).
    skey = F.coalesce(F.col(strata_col).cast("string"), F.lit("\x00"))
    totals_rows = (
        narrow.withColumn("_bkt", bucket)
        .groupBy(skey.alias("_s"), F.col("_bkt"))
        .agg(F.sum(token_col).alias("t"))
        .collect()
    )
    per_stratum: dict = {}
    for r in totals_rows:
        per_stratum.setdefault(r["_s"], {})[r["_bkt"]] = int(r["t"] or 0)
    entries = []
    for s, bks in per_stratum.items():
        acc = 0
        for i in range(len(bounds) + 1):
            if i in bks:
                entries += [f"{s}\x1f{i}", acc]
                acc += bks[i]
    offset_map = F.create_map(*[F.lit(x) for x in entries]) if entries else None
    key = F.concat_ws("\x1f", skey, F.col("_bkt").cast("string"))
    offset = F.coalesce(offset_map[key], F.lit(0)) if entries else F.lit(0)
    return (
        local.where(F.col("_run_local") + offset <= quota)
        .drop("_bkt", "_run_local")
    )


def stream_token_quota(
    docs: DataFrame,
    quota: int,
    *,
    strata_col: str = "source",
    token_col: str = "n_tokens",
    seq_col: str = "doc_id",
    mode: str = "greedy",
) -> DataFrame:
    """Meter a streaming document feed: emit each arriving document
    only while its stratum's cumulative ``token_col`` stays within
    ``quota``. State (tokens used per stratum) lives in the streaming
    state store; no timeout — a quota is for the lifetime of the run.
    """
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields)
    meter = _make_meter(seq_col, token_col, quota, mode)

    def fn(key: Tuple, pdfs, state: GroupState) -> Iterator:
        import pandas as pd

        (used,) = state.get if state.exists else (0,)
        # one group-per-batch can arrive as MULTIPLE Arrow chunks (rows
        # beyond arrow.maxRecordsPerBatch) in shuffle order — metering
        # chunk-by-chunk would sort only within chunks and the accepted
        # set would depend on chunk boundaries. Concatenate, sort once,
        # meter once (bounded by the group's rows in this micro-batch).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            out, used = meter(pd.concat(chunks, ignore_index=True), used)
            if len(out):
                yield out
        state.update((int(used),))

    return docs.groupBy(strata_col).applyInPandasWithState(
        fn,
        outputStructType=fields,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_token_quota(
    docs: DataFrame,
    quota: int,
    *,
    strata_col: str = "source",
    token_col: str = "n_tokens",
    seq_col: str = "doc_id",
    mode: str = "greedy",
) -> DataFrame:
    """Batch twin of :func:`stream_token_quota`.

    ``mode='prefix'`` routes through :func:`token_quota_prefix` — the
    two-pass distributed prefix scan — since prefix acceptance is a
    pure cumulative-sum property. ``mode='greedy'`` (skip-on-overshoot)
    is an order-dependent sequential fold BY DEFINITION: whether a row
    is accepted depends on every prior accept/skip decision, so each
    stratum is one pandas group. That is the documented contract —
    use prefix mode (or per-(stratum, shard) greedy with sharded
    budgets) when a stratum's corpus exceeds one task."""
    if mode == "prefix":
        return token_quota_prefix(
            docs, quota, strata_col=strata_col, token_col=token_col, seq_col=seq_col
        )
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields)
    meter = _make_meter(seq_col, token_col, quota, mode)

    def fn(pdf):
        out, _ = meter(pdf, 0)
        return out

    return docs.groupBy(strata_col).applyInPandas(fn, schema=fields)
