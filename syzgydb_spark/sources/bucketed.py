"""Bucketed-table storage for shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated fact-fact join is the
exchange. Spark's native bucketing kills it: both tables are written
pre-hash-partitioned (and optionally pre-sorted) on the join key, so a
join between tables with compatible bucket counts needs NO Exchange on
either side — the scan itself delivers co-partitioned (and pre-sorted)
input to the SortMergeJoin. The catalog records the layout; every
subsequent reader gets it for free.

This is the storage-side sibling of `Collection`'s hash-bucketed
layout: collections bucket by `pmod(xxhash64(id), n)` for bounded-
write-amplification UPSERT; analytic tables bucket with `bucketBy` for
shuffle-free JOIN. Use this for the relations a pipeline joins
repeatedly (embeddings ↔ metadata, docs ↔ scores), not for one-shot
reads (the one-time write pays one shuffle to cluster the data).

Plan contract (asserted in tests/test_plan_quality.py): a same-key
join of two tables bucketed (b, key) shows a SortMergeJoin with zero
Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def clear_stale_location(spark, table: str) -> None:
    """Remove an ORPHAN managed-table directory: the default warehouse
    location for ``table`` when no such table is registered. With the
    in-memory catalog a session that wrote a managed table and exited
    leaves its files behind; the next session's CREATE then fails with
    LOCATION_ALREADY_EXISTS even in overwrite mode (overwrite only
    drops tables the catalog knows). Only fires when the table is
    absent from the catalog, so a live table's data is never touched;
    goes through the Hadoop FileSystem API so non-local warehouses
    behave the same."""
    if spark.catalog.tableExists(table):
        return
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = jvm.org.apache.hadoop.fs.Path(warehouse + "/" + table.lower())
    fs = loc.getFileSystem(conf)
    if fs.exists(loc):
        fs.delete(loc, True)


def save_bucketed(
    df: DataFrame,
    table: str,
    *,
    keys: str | list[str],
    buckets: int = 32,
    sort: str | list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed on ``keys`` (and
    optionally sorted within buckets — presorting also removes the
    Sort below a merge join). ``path`` makes it an external table."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if path is None and mode == "overwrite":
        clear_stale_location(df.sparkSession, table)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort is not None:
        sort = [sort] if isinstance(sort, str) else list(sort)
        w = w.sortBy(*sort)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark, table: str) -> DataFrame:
    """Read a bucketed table back WITH its layout (a plain
    ``spark.read.parquet(path)`` of the same files would lose the
    bucket metadata and re-shuffle on join — always read through the
    catalog)."""
    return spark.table(table)
