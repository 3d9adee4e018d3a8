"""Table profiling: per-column statistics in ONE scan.

The data-quality sibling of `quality.corpus_stats`: before a 100 TB
corpus build starts, the curator profiles every input table (null
rates, cardinalities, value ranges) to catch schema drift, broken
extractions (a column suddenly 90% NULL), and key-cardinality
surprises. The reference has no analog (it stores opaque JSON
metadata); this is native DataFrame territory.

Scale shape: ALL columns profile in a single aggregation job — one
scan, map-side partial aggregation, one narrow shuffle of per-column
scalar state. The exact-distinct path pays Spark's multi-distinct
Expand (rows duplicated per distinct aggregate — still one scan);
``approx=True`` switches to HyperLogLog++ sketches, which fold
map-side with NO expand and is the 100 TB default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx: bool = False,
) -> DataFrame:
    """Per-column profile: ``(column, dtype, n_rows, n_nulls,
    n_distinct, min_value, max_value)`` — min/max rendered as strings
    so every column type shares one output schema (NULL for types
    without an ordering, e.g. arrays/maps/structs).

    One aggregation over all requested columns; the per-column rows
    unpivot from that single aggregated row by exploding a constants-
    sized struct array — ONE plan consumer, so the scan runs exactly
    once (a union of per-column selects would re-execute the aggregate
    per column)."""
    fields = [
        f for f in df.schema.fields if columns is None or f.name in columns
    ]
    if not fields:
        raise ValueError("no columns to profile")

    def orderable(dt):
        return dt.typeName() not in ("array", "map", "struct", "variant", "binary")

    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for f in fields:
        c = F.col(f.name)
        aggs.append(F.count(c).cast("long").alias(f"_nn_{f.name}"))
        aggs.append(
            (
                F.approx_count_distinct(f.name)
                if approx
                else F.count_distinct(c)
            ).cast("long").alias(f"_nd_{f.name}")
        )
        if orderable(f.dataType):
            aggs.append(F.min(c).cast("string").alias(f"_min_{f.name}"))
            aggs.append(F.max(c).cast("string").alias(f"_max_{f.name}"))
    row = df.agg(*aggs)
    null_s = F.lit(None).cast("string")
    structs = [
        F.struct(
            F.lit(f.name).alias("column"),
            F.lit(f.dataType.simpleString()).alias("dtype"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{f.name}")).cast("long").alias("n_nulls"),
            F.col(f"_nd_{f.name}").alias("n_distinct"),
            (F.col(f"_min_{f.name}") if orderable(f.dataType) else null_s).alias("min_value"),
            (F.col(f"_max_{f.name}") if orderable(f.dataType) else null_s).alias("max_value"),
        )
        for f in fields
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def robust_outliers(
    df: DataFrame,
    keys: list[str],
    col: str,
    *,
    z: float = 3.5,
    precision: int = 2,
    consistency: float = 0.6745,
) -> DataFrame:
    """Per-key robust outlier flags via the median/MAD z-score
    (Iglewicz & Hoaglin's modified z-score: ``0.6745·|x-med|/MAD``,
    flag > 3.5) — the outlier rule that, unlike mean/stddev, is not
    itself dragged by the outliers it hunts.

    Median and MAD both come from ``histogram_quantiles``' bounded
    rounded-value histograms (operators/skew.py) — two narrow keyed
    aggregations and two broadcast joins of per-key scalars; NO
    per-key sort at any scale, so a hot key profiles like any other.
    Quantiles are exact type-1 over values rounded to ``precision``
    decimals (the caller's boundedness contract, same as
    histogram_quantiles).

    Returns ``df``'s columns plus ``(median, mad, robust_z,
    is_outlier)``. NULL values get NULL score and ``is_outlier``
    false. A degenerate key (MAD = 0: over half the values identical)
    yields NULL ``robust_z`` and flags exactly the values different
    from the median — the standard fallback, stated rather than
    hidden.

    The MAD histogram is derived FROM the value histogram at bin
    level: every row in bin ``b`` shares the rounded value ``b``, so
    its deviation is ``round(|b − median|, precision)`` with the bin's
    count as weight — the deviation histogram is a histogram-sized
    transform, never a second aggregation over the data (the previous
    shape re-scanned and re-shuffled ``df`` to build it). One
    data-sized aggregation + one scoring pass total; the histogram is
    localCheckpoint'ed (bounded by the caller's rounding contract)
    because both the median and the deviation branches consume it."""
    from pyspark.sql import Window

    x = F.round(F.col(col), int(precision))
    kcols = [F.col(k) for k in keys]
    hist = (
        df.where(x.isNotNull())
        .groupBy(*kcols, x.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )

    def _hist_median(h, value_alias):
        # identical inverse-CDF step to skew.histogram_quantiles at
        # p=0.5: smallest bucket whose cumulative count reaches
        # ceil(N/2) — exact type-1 median of the rounded values
        wcum = (
            Window.partitionBy(*keys)
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = h.withColumn("_cum", F.sum("_c").over(wcum)).withColumn(
            "_n", F.sum("_c").over(Window.partitionBy(*keys))
        )
        return cum.groupBy(*kcols).agg(
            F.min(
                F.when(
                    F.col("_cum") >= F.ceil(F.col("_n") * 0.5), F.col("_b")
                )
            ).alias(value_alias)
        )

    med = _hist_median(hist, "median")
    dev_hist = (
        hist.join(F.broadcast(med), keys)
        .groupBy(
            *kcols,
            F.round(F.abs(F.col("_b") - F.col("median")), int(precision)).alias("_b"),
        )
        .agg(F.sum("_c").alias("_c"))
    )
    mad = _hist_median(dev_hist, "mad")
    scalars = med.join(mad, keys)
    scored = df.join(F.broadcast(scalars), keys, "left").withColumn(
        "_dev", F.round(F.abs(x - F.col("median")), int(precision))
    )
    rz = F.when(
        F.col("mad") > 0,
        F.round(F.lit(float(consistency)) * F.col("_dev") / F.col("mad"), 6),
    )
    return scored.withColumn("robust_z", rz).withColumn(
        "is_outlier",
        F.when(F.col("_dev").isNull(), F.lit(False)).otherwise(
            F.coalesce(
                F.col("robust_z") > float(z), F.col("_dev") > 0
            )
        ),
    ).drop("_dev")
