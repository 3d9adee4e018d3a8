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
) -> DataFrame:
    """Batch prefix-mode quota as a pure Catalyst window filter: keep a
    row iff its stratum's running token sum (in ``seq_col`` order,
    inclusive) stays within ``quota``. One shuffle (window partition),
    whole-stage codegen, SQL-reproducible — the oracle-checked member
    of the quota family. Equivalent to ``batch_token_quota(...,
    mode='prefix')`` minus the Python kernel."""
    w = (
        Window.partitionBy(strata_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(token_col)).over(w)
    return (
        docs.withColumn("_run", run)
        .where(F.col("_run") <= quota)
        .drop("_run")
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
    """Batch twin of :func:`stream_token_quota`."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields)
    meter = _make_meter(seq_col, token_col, quota, mode)

    def fn(pdf):
        out, _ = meter(pdf, 0)
        return out

    return docs.groupBy(strata_col).applyInPandas(fn, schema=fields)
