"""Sequence packing: assign documents to fixed-size training bins.

The GPT-style data-prep step after chunking: documents are laid out on
one conceptual token stream (in ``seq_col`` order) and the stream is
cut every ``seq_len`` tokens; each document is tagged with the bin
containing its first token and its offset inside that bin. Downstream,
one `groupBy(bin_id)` materializes training rows.

This needs an EXACT GLOBAL running sum — the textbook "prefix scan"
that a naive window (`Window.orderBy(seq)` with no partition) would
compute on a single task. The scalable two-pass shape used here:

1. pick ~``num_buckets`` range boundaries on ``seq_col`` with
   ``approxQuantile`` and EMBED THEM AS LITERALS — the bucket of a row
   is then a deterministic expression, identical in every job that
   uses it (unlike ``repartitionByRange``, whose sampled boundaries
   can differ between the two passes and silently misalign them);
   boundary quality affects only balance, never correctness;
2. per-bucket running sums with a window — parallel, narrow;
3. per-bucket TOTALS (one row per bucket) to the driver, prefix-summed
   there, broadcast back as a literal map — the only driver-side data
   is O(#buckets), the same smallness contract as a broadcast join's
   dim side.

Shuffles: the bucket-window exchange + the totals aggregation, both of
(seq, tokens) width. No row-wise Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_bins(
    df: DataFrame,
    seq_len: int,
    *,
    token_col: str = "n_tokens",
    seq_col: str = "doc_id",
    num_buckets: int | None = None,
) -> DataFrame:
    """Add ``bin_id`` (0-based bin holding the document's first token)
    and ``bin_offset`` (token position inside that bin) for a stream
    cut every ``seq_len`` tokens in ``seq_col`` order. Deterministic:
    same input → same packing, on any cluster size."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    sc = df.sparkSession.sparkContext
    p = num_buckets or sc.defaultParallelism
    # approxQuantile needs a numeric order column; string ids (URL /
    # hash ids) degrade to ONE range bucket — a single global window
    # (correct, but one task sorts the whole stream; fine at test
    # scale, order a numeric ingest sequence for the distributed plan)
    seq_type = dict(df.dtypes).get(seq_col, "")
    if not (
        seq_type in ("tinyint", "smallint", "int", "bigint", "float", "double")
        or seq_type.startswith("decimal")
    ):
        p = 1

    # quantiles + totals both run driver-side actions BEFORE the final
    # plan executes; compute them from one materialized narrow snapshot
    # (two columns) so the input is scanned once for both, and so a
    # retried/appended-to source can't give the two passes different
    # data. The FINAL plan still re-reads `df`: the input must be
    # deterministic between the snapshot and the caller's action (the
    # same contract Spark itself puts on retried stages).
    # Recompute story: the snapshot must be a FIXED draw (boundaries
    # become literals in the final plan), so recompute-on-loss is the
    # wrong semantics here — an executor loss during the two driver
    # actions fails this call and the caller re-runs it whole; the
    # relation is two narrow columns, not the documents.
    narrow = df.select(seq_col, token_col).localCheckpoint(eager=True)

    # pass 0 (driver): ~p-quantile boundaries as plain literals
    probs = [i / p for i in range(1, p)]
    bounds = (
        sorted(set(narrow.stat.approxQuantile(seq_col, probs, 0.001))) if p > 1 else []
    )
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col(seq_col) > F.lit(b)).cast("int")
    withb = df.withColumn("_bkt", bucket)

    # pass 1: exclusive running sum within each bucket
    w = (
        Window.partitionBy("_bkt")
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = withb.withColumn(
        "_prev", F.sum(F.col(token_col)).over(w) - F.col(token_col)
    )

    # pass 2: bucket totals -> driver prefix sum (O(#buckets) rows),
    # from the same snapshot
    nb = narrow.withColumn("_bkt", bucket)
    totals = {
        r["_bkt"]: r["t"]
        for r in nb.groupBy("_bkt").agg(F.sum(token_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for i in range(len(bounds) + 1):
        offsets[i] = acc
        acc += int(totals.get(i, 0) or 0)
    offset_map = F.create_map(
        *[F.lit(x) for i in offsets for x in (i, offsets[i])]
    )

    gprev = F.col("_prev") + offset_map[F.col("_bkt")]
    return (
        local.withColumn("bin_id", F.floor(gprev / seq_len))
        .withColumn("bin_offset", gprev % seq_len)
        .drop("_bkt", "_prev")
    )
