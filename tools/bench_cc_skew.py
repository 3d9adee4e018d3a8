"""Adversarial-skew stress for the dedup/CC path (r9 verdict #4).

SCALE.md claims a million-member duplicate cluster is "just a hot
groupBy key (AQE-splittable)" — this measures it. Two pair relations
over the same node count:

  uniform   25k clusters of ~20 members each (the benign shape)
  skewed    ONE 100k-member mega-cluster (star + a 300-node chain
            grafted on, so both the join-skew and the convergence
            depth are exercised at once) + a Zipf tail (cluster c has
            ~T/c^2 members — a few huge, many tiny), matching the
            power-law bucket sizes banded minhash produces on real
            crawl dumps

and times ``duplicate_groups`` + ``keep_best`` on each, recording
wall seconds and the MAX single-task duration (from the Spark event
log — the number a single hot key would blow up). A third check runs
the label-prop hot join standalone with AQE skew-join thresholds
scaled to the local data size and asserts the executed plan carries
``skew=true`` — the same mechanism that splits a 100 TB hot key,
exercised for real, not assumed.

Run on an otherwise idle box:

    python tools/bench_cc_skew.py [mega_size] [tail_nodes]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from syzgydb_spark.operators.dedup import duplicate_groups, keep_best
from syzgydb_spark.session import get_spark


def build_skewed_edges(spark, mega: int, tail: int):
    """Star mega-cluster 0..mega-1 centered on node 0, with nodes
    1..300 re-wired into a chain (diameter stress — the 300-node-path
    bound of the duplicate_groups docstring); tail node k (ids offset
    past the mega ids) joins cluster c = tail//(k+1), i.e. cluster c
    holds ~tail/c^2 members (Zipf sizes), star-wired to the cluster's
    smallest id."""
    star = (
        spark.range(301, mega, 1, 32)
        .select(F.col("id").alias("id_a"), F.lit(0).cast("long").alias("id_b"))
    )
    chain = spark.range(1, 301, 1, 4).select(
        F.col("id").alias("id_a"), (F.col("id") - 1).alias("id_b")
    )
    # tail cluster of node k: c = tail // (k+1); members of cluster c
    # are exactly k in (tail/(c+1), tail/c] — the smallest is
    # floor(tail/(c+1))+1, the star anchor
    t = spark.range(0, tail, 1, 32).select((F.col("id") + 1).alias("k"))
    tail_edges = t.select(
        (F.col("k") + mega).alias("id_a"),
        (F.floor(F.lit(tail) / (F.floor(F.lit(tail) / F.col("k")) + 1))
         + 1 + mega).alias("id_b"),
    ).where(F.col("id_a") != F.col("id_b"))
    return star.unionByName(chain).unionByName(tail_edges)


def build_uniform_edges(spark, n_nodes: int, cluster_size: int = 20):
    return (
        spark.range(0, n_nodes, 1, 32)
        .where(F.col("id") % cluster_size != 0)
        .select(
            F.col("id").alias("id_a"),
            (F.col("id") - F.col("id") % cluster_size).alias("id_b"),
        )
    )


def max_task_seconds(event_dir: str) -> float:
    worst = 0.0
    # Spark 4 writes rolling event logs as eventlog_v2_*/events_* dirs
    paths = [p for p in glob.glob(os.path.join(event_dir, "**", "*"),
                                  recursive=True) if os.path.isfile(p)]
    for path in paths:
        with open(path, errors="replace") as f:
            for line in f:
                if '"Event":"SparkListenerTaskEnd"' not in line.replace(
                        '"Event": "', '"Event":"'):
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                info = ev.get("Task Info", {})
                dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0))
                worst = max(worst, dur / 1000.0)
    return worst


def main() -> int:
    mega = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    tail = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000

    results = {}
    for tag in ("uniform", "skewed"):
        event_dir = tempfile.mkdtemp(prefix=f"cc_skew_{tag}_")
        spark = get_spark(
            app_name=f"cc-skew-{tag}",
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": event_dir,
                "spark.eventLog.compress": "false",  # parse as plain JSONL
                # scale AQE's skew thresholds to the local data size:
                # at 100 TB the 256 MB default trips on its own; here
                # the hot key is ~a few MB, so the emulation lowers
                # the bar proportionally (same mechanism, same plan)
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
                # AQE folds tiny relations to broadcast joins locally,
                # which would bypass the skew-split path being tested
                "spark.sql.autoBroadcastJoinThreshold": "-1",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        n_nodes = mega + tail
        if tag == "uniform":
            edges = build_uniform_edges(spark, n_nodes)
        else:
            edges = build_skewed_edges(spark, mega, tail)
        edges.write.mode("overwrite").parquet(f"/tmp/cc_skew_{tag}")
        pairs = spark.read.parquet(f"/tmp/cc_skew_{tag}")
        docs = spark.range(0, n_nodes, 1, 32).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") * 2654435761) % 1000003).alias("score"),
        )

        t0 = time.time()
        groups = duplicate_groups(pairs)
        n_groups = groups.select("group_id").distinct().count()
        t_groups = time.time() - t0

        t0 = time.time()
        kept = keep_best(docs, pairs, "score")
        n_kept = kept.count()
        biggest = kept.agg(F.max("group_size")).first()[0]
        t_keep = time.time() - t0

        # AQE skew-split assertion on the label-prop hot join, in the
        # EXACT shape duplicate_groups runs it: both relations
        # localCheckpointed (so the SMJ's children are fresh
        # ENSURE_REQUIREMENTS exchanges over RDD scans — the
        # Sort(ShuffleStage) pattern OptimizeSkewedJoin requires; a
        # labels side that inherits its partitioning from an upstream
        # distinct would NOT match the rule, which is why the loop's
        # per-round localCheckpoint matters for skew too, not just
        # for lineage truncation)
        skew_seen = None
        if tag == "skewed":
            edges2 = pairs.select(
                F.col("id_a").alias("src"), F.col("id_b").alias("dst")
            ).localCheckpoint()
            labels = edges2.select(F.col("dst").alias("node")).distinct() \
                .select("node", F.col("node").alias("label")) \
                .localCheckpoint()
            j = edges2.join(labels, edges2.dst == labels.node) \
                .select(F.col("src").alias("node"), "label")
            j.collect()
            plan = j._jdf.queryExecution().executedPlan().toString()
            skew_seen = "skew=true" in plan
        spark.stop()

        results[tag] = {
            "duplicate_groups_sec": round(t_groups, 2),
            "keep_best_sec": round(t_keep, 2),
            "n_groups": n_groups,
            "n_kept": n_kept,
            "max_group_size": biggest,
            "max_task_sec": round(max_task_seconds(event_dir), 2),
            "aqe_skew_split": skew_seen,
        }
        print(tag, json.dumps(results[tag]), flush=True)

    print(json.dumps({"mega": mega, "tail": tail, **results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
