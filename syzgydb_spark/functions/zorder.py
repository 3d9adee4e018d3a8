"""Z-order (Morton) interleaving for multi-column data clustering.

Parquet row-group pruning is only as good as the correlation between
file order and filter columns. Sorting on one column gives perfect
stats for it and useless stats for every other; interleaving the bits
of SEVERAL columns gives each of them locality, so min/max stats stay
tight for filters on ANY of the clustered columns — the Delta/Iceberg
`ZORDER BY` idea, here as a plain Catalyst integer expression plus a
repartition-and-sort writer helper.

The collection layer's zone-map clustering (sort by bucket, ivf_cell,
id at commit) is the single-hierarchy special case; `zorder_key` is
for analytic tables filtered on independent dimensions (user_id AND
time, lang AND length, ...).

Everything is exact integer arithmetic (shifts, masks, adds) — pure
whole-stage-codegen, engine-portable, oracle-replayable bit for bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], *, bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` of each column.

    Inputs must be integer expressions; values are clamped to
    [0, 2^bits) (callers bucket/rank-scale beforehand — e.g.
    ``F.floor(value)``, ``id % 1024``, a width_bucket). NULL in any
    column yields key 0 (clusters NULLs together at the front).
    ``len(cols) * bits`` must fit a signed 64-bit key (≤ 62)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 63-bit key")
    lim = F.lit((1 << bits) - 1).cast("long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.least(F.greatest(F.coalesce(c.cast("long"), F.lit(0)), F.lit(0)), lim)
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return key


def cluster_by_zorder(
    df: DataFrame,
    cols: list[Column | str],
    *,
    bits: int = 16,
    n_partitions: int | None = None,
) -> DataFrame:
    """Physically cluster ``df`` on the Morton key of ``cols``: range-
    partition by key (contiguous key slices per output file — one
    shuffle, the write-time cost of the layout) and sort within
    partitions, so parquet row-group min/max stats are tight on every
    clustered column. Write the result with ``.write.parquet`` and
    filters on any of the columns prune at scan time."""
    key = zorder_key(cols, bits=bits).alias("_zkey")
    out = df.withColumn("_zkey", key)
    out = (
        out.repartitionByRange(n_partitions, "_zkey")
        if n_partitions
        else out.repartitionByRange("_zkey")
    )
    return out.sortWithinPartitions("_zkey").drop("_zkey")
