"""Measure the quantile sketch's niche honestly (docs/SCALE.md;
operators/quantiles.py's scale claim).

Three ways to ask for deciles of a high-cardinality value column:

  exact     groupBy(value).count() + window cumsum   [shuffles one row
                                                      per DISTINCT value]
  native    percentile_approx (one-shot GK-style     [bounded partial
            aggregator built into Spark)              aggregation]
  sketch    quantile_sketch(capacity)                [<= partitions x
                                                      capacity rows]

Expected outcome — and the honest claim: the sketch's shuffle volume
matches ``percentile_approx``'s bounded shape, NOT a discovery that it
beats Spark. Its niche is what percentile_approx cannot do at all:
the summary PERSISTS and FOLDS, so cross-wave distribution tracking
(update_quantile_store per wave) reads store-sized state where any
percentile_approx answer would re-scan every prior wave. This harness
records the wall/shuffle numbers so the niche claim carries the
measured context, plus a decile-accuracy check of all three answers
against the exact ranks. Run on an otherwise idle box:

    python tools/bench_quantiles.py [n_rows] [n_distinct] [capacity]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from syzgydb_spark.operators.quantiles import quantile_sketch, sketch_quantiles
from syzgydb_spark.session import get_spark


def _shuffle_write_bytes(spark) -> int:
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
    capacity = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    qs = [i / 10 for i in range(1, 10)]

    spark = get_spark(app_name="bench-quantiles", extra_conf={
        "spark.ui.enabled": "true", "spark.ui.port": "4781",
        "spark.ui.retainedStages": "2000",
    })
    spark.sparkContext.setLogLevel("ERROR")

    # heavy-tailed continuous-ish values with ~n_distinct distincts:
    # a deterministic mix of a dense head and a long sparse tail
    df = spark.range(0, n_rows, 1, 32).select(
        F.when(F.col("id") % 4 == 0, (F.col("id") % 1000).cast("double"))
        .otherwise(
            1000.0 + (F.col("id") % n_distinct).cast("double")
            + (F.col("id") % 7).cast("double") / 10.0
        ).alias("v")
    )
    df.count()

    b0 = _shuffle_write_bytes(spark)
    t0 = time.time()
    from pyspark.sql import Window

    counts = df.groupBy("v").count()
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "v", F.sum("count").over(w).alias("cw"),
        F.sum("count").over(Window.partitionBy()).alias("n"))
    exact = {
        float(q): cum.where(
            F.col("cw") >= F.ceil(F.lit(q) * F.col("n"))
        ).agg(F.min("v")).collect()[0][0]
        for q in qs
    }
    t_exact = time.time() - t0
    b1 = _shuffle_write_bytes(spark)

    t0 = time.time()
    native = dict(zip(qs, df.agg(
        F.percentile_approx("v", qs, 10_000)).collect()[0][0]))
    t_native = time.time() - t0
    b2 = _shuffle_write_bytes(spark)

    t0 = time.time()
    sk = quantile_sketch(df, "v", capacity=capacity)
    sketch = {r["q"]: r["value"] for r in sketch_quantiles(sk, qs).collect()}
    t_sketch = time.time() - t0
    b3 = _shuffle_write_bytes(spark)

    # accuracy: rank error of each answer vs the exact decile, as a
    # fraction of N (computed from the same counts relation)
    def rank_err(vals: dict) -> float:
        worst = 0.0
        for q, v in vals.items():
            r = counts.where(F.col("v") <= v).agg(
                F.coalesce(F.sum("count"), F.lit(0))).collect()[0][0]
            worst = max(worst, abs(r - q * n_rows) / n_rows)
        return worst

    print(
        f"rows={n_rows:,} distinct~{n_distinct:,} capacity={capacity}\n"
        f"exact cumsum       : {t_exact:7.2f}s  shuffle "
        f"{(b1 - b0) / 1e6:10.2f} MB  (one row per distinct value)\n"
        f"percentile_approx  : {t_native:7.2f}s  shuffle "
        f"{(b2 - b1) / 1e6:10.2f} MB  (bounded, one-shot only)\n"
        f"quantile_sketch    : {t_sketch:7.2f}s  shuffle "
        f"{(b3 - b2) / 1e6:10.2f} MB  (bounded, persistable+mergeable)\n"
        f"worst decile rank error vs exact: native "
        f"{rank_err(native):.4%}, sketch {rank_err(sketch):.4%}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
