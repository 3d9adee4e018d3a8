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
