"""Measure the MG-sketch vs exact-rollup gap at high cardinality
(docs/SCALE.md; operators/sketch.py's scale claim).

Builds a heavy-tailed term stream — a few genuinely hot terms over a
huge unique tail, the shape of URLs/shingles/user-ids in a crawl —
and compares finding the top-k two ways:

  exact    groupBy(term).count() + TakeOrdered   [shuffles one row per
                                                  DISTINCT term]
  sketch   frequent_terms(capacity)              [shuffles <= partitions
                                                  x capacity rows]

Besides wall time, the harness records MEASURED shuffle bytes written
per phase from the Spark status REST API (the sketch's claimed benefit
is shuffle VOLUME — on a real cluster that's network, here it's
loopback, which is why local wall-time understates it; r6-verdict
task 5 wants the niche claim to carry a number).

Correctness cross-check: every exact top-k term must appear in the
sketch with est <= true <= est + err_bound, and the hot terms'
ranking by estimate must match. Run on an otherwise idle box:

    python tools/bench_sketch.py [n_rows] [n_distinct] [capacity]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from syzgydb_spark.operators.sketch import frequent_terms
from syzgydb_spark.session import get_spark


def _shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle bytes written across completed stages, from
    the status REST endpoint (the session here enables the UI just for
    this; the engine's default session keeps it off)."""
    import json
    import urllib.request

    app = spark.sparkContext.applicationId
    url = (f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app}"
           f"/stages?status=complete")
    stages = json.load(urllib.request.urlopen(url))
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_distinct = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    capacity = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    k = 10

    spark = get_spark(app_name="bench-sketch", extra_conf={
        "spark.ui.enabled": "true", "spark.ui.port": "4779",
        "spark.ui.retainedStages": "2000",
    })
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic heavy tail: 5% of rows hit one of 16 hot terms,
    # the rest spread uniformly over n_distinct uniques
    hot_every = 20
    df = spark.range(0, n_rows, 1, 32).select(
        F.when(
            F.col("id") % hot_every == 0,
            F.concat(F.lit("hot_"),
                     ((F.col("id") / hot_every).cast("long") % 16)
                     .cast("string")),
        ).otherwise(
            F.concat(F.lit("u"), (F.col("id") % n_distinct).cast("string"))
        ).alias("term")
    )
    df.count()  # materialize the range plan shape / warm JVM

    b0 = _shuffle_write_bytes(spark)
    t0 = time.time()
    exact_top = (
        df.groupBy("term").count()
        .orderBy(F.col("count").desc(), "term").limit(k).collect()
    )
    t_exact = time.time() - t0
    b1 = _shuffle_write_bytes(spark)
    t0 = time.time()
    sk = frequent_terms(df, "term", capacity=capacity)
    sk_rows = sk.orderBy(F.col("est_count").desc(), "term").limit(k).collect()
    t_sketch = time.time() - t0
    b2 = _shuffle_write_bytes(spark)
    bytes_exact, bytes_sketch = b1 - b0, b2 - b1

    # the MG guarantee covers terms ABOVE the error bound: every such
    # exact-top term must be present and bracketed (tail ties below the
    # bound are legitimately droppable)
    est = {r["term"]: r for r in sk_rows}
    err = sk_rows[0]["err_bound"]
    for r in exact_top:
        t, c = r["term"], r["count"]
        if c > err:
            assert t in est, f"above-bound term {t} ({c:,}) missing"
            assert est[t]["est_count"] <= c <= (
                est[t]["est_count"] + est[t]["err_bound"]), (est[t], c)
    assert all(r["term"].startswith("hot_") for r in sk_rows
               if r["est_count"] > err)

    print(
        f"rows={n_rows:,} distinct~{n_distinct:,} capacity={capacity}\n"
        f"exact groupBy+topk : {t_exact:7.2f}s  "
        f"shuffle {bytes_exact / 1e6:10.2f} MB written "
        f"(~{n_distinct:,} (term,count) rows)\n"
        f"MG frequent_terms  : {t_sketch:7.2f}s  "
        f"shuffle {bytes_sketch / 1e6:10.2f} MB written "
        f"(<= 32 x {capacity} partial rows)\n"
        f"shuffle-volume ratio exact/sketch: "
        f"{bytes_exact / max(bytes_sketch, 1):,.0f}x\n"
        f"above-bound agreement: OK (bracketed, err_bound="
        f"{sk_rows[0]['err_bound']:,})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
