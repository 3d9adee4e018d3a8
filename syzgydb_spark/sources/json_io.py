"""Collection JSON export/import.

Format mirrors the reference dump (/root/reference/dump.go:48-217):

    {"collection": {<options>}, "records": [{"id":..,"vector":[..],
     "metadata": {..}}, ...]}

The reference streams one big JSON document; at Spark scale a single
document is an anti-pattern, so the canonical export is JSON-lines
(one record per line, options in a sidecar) — ``spark.write.json`` —
with a small-collection compatibility mode that materializes the exact
reference format for round-trip parity tests (dump_test.go:11-297).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

from pyspark.sql import functions as F

from syzgydb_spark.collection import Collection, CollectionOptions


def export_jsonl(coll: Collection, path: str) -> None:
    """Scalable export: options sidecar + JSON-lines records
    (dequantized vectors, decoded metadata)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "collection.json"), "w") as f:
        json.dump(asdict(coll.options), f, indent=2)
    df = coll.df()
    meta_is_string = df.schema["metadata"].dataType.simpleString() == "string"
    out = df.select(
        "id",
        "vector",
        # schemaless: parse the JSON string so records serialize as
        # objects; schema'd: the struct/map column serializes directly
        (F.try_parse_json("metadata") if meta_is_string else F.col("metadata"))
        .alias("metadata"),
    )
    out.write.mode("overwrite").json(os.path.join(path, "records"))


def import_jsonl(spark, path: str, target_path: str) -> Collection:
    with open(os.path.join(path, "collection.json")) as f:
        opts = CollectionOptions(**json.load(f))
    coll = Collection.create(spark, target_path, opts)
    # read metadata as VARIANT: schema inference would type it from
    # the data (struct for objects, STRING/LONG for scalar JSON
    # metadata — which the filter language fully supports), and
    # to_json on a primitive column raises. Variant round-trips any
    # JSON value back to its exact text.
    df = (
        spark.read.schema("id BIGINT, vector ARRAY<DOUBLE>, metadata VARIANT")
        .json(os.path.join(path, "records"))
        .select(
            F.col("id").cast("long"),
            F.col("vector").cast("array<double>"),
            F.to_json("metadata").alias("metadata"),
        )
    )
    coll.add_documents(df)
    return coll


def export_json(coll: Collection, path: str) -> None:
    """Reference-format single-document export (dump.go:48-136).
    Collects to the driver — small collections only."""
    df = coll.df()
    meta_is_string = df.schema["metadata"].dataType.simpleString() == "string"
    meta = (
        F.col("metadata") if meta_is_string else F.to_json("metadata")
    ).alias("metadata")
    records = [
        {
            "id": r["id"],
            "vector": list(r["vector"]),
            "metadata": json.loads(r["metadata"]) if r["metadata"] else None,
        }
        for r in df.select("id", "vector", meta).orderBy("id").collect()
    ]
    doc = {"collection": asdict(coll.options), "records": records}
    with open(path, "w") as f:
        json.dump(doc, f)


def import_json(spark, path: str, target_path: str) -> Collection:
    """Reference-format single-document import (dump.go:138-217)."""
    with open(path) as f:
        doc = json.load(f)
    opts = CollectionOptions(**doc["collection"])
    coll = Collection.create(spark, target_path, opts)
    rows = [
        (r["id"], [float(x) for x in r["vector"]], json.dumps(r.get("metadata")))
        for r in doc["records"]
    ]
    if rows:
        coll.add_documents(rows)
    return coll
