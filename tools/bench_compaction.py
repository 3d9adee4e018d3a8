"""Measure store read amplification vs delta-history length, and what
compaction buys back (docs/SCALE.md; operators/maintenance.py).

Every incremental store folds ALL its delta dirs per probe. The fold
is small, but listing + parquet footers + task scheduling grow with
history. This harness builds each store, applies ``n_waves``
incremental updates, times a probe at full history, compacts, and
times the same probe again — plus file/dir counts, so the claim
carries both a wall number and the structural reduction behind it.

Probes are timed as median-of-3 after one warm-up (plan-cache and JIT
noise), matching the bench protocol elsewhere. Run on an idle box:

    python tools/bench_compaction.py [n_waves] [wave_rows]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from syzgydb_spark.session import get_spark


def timed(fn, reps=3):
    fn()  # warm-up
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return round(statistics.median(ts), 3)


def n_dirs(path):
    return len([d for d in os.listdir(path) if d.startswith("batch=")])


def main() -> int:
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    wave_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    spark = get_spark(app_name="bench-compaction", master="local[8]",
                      shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="compaction_bench_")
    out: dict = {"n_waves": n_waves, "wave_rows": wave_rows}

    def wave_df(w):
        # half the lines are cross-wave boilerplate (same hash lands a
        # delta row EVERY wave — the row-folding case for the line
        # store), half are wave-unique
        return spark.range(wave_rows).selectExpr(
            f"concat('w{w}_', id) as term", "id as doc_id",
            f"concat(if(id % 2 = 0, 'shared', 'w{w}'), ' line ', id % 50,"
            f" ' repeated body text') as text")

    probe_df = spark.range(wave_rows).selectExpr(
        "concat('w3_', id) as term", "id as doc_id",
        "concat('w3 line ', id % 50, ' repeated body text') as text")

    # ---------------- bloom ----------------
    from syzgydb_spark.operators.bloom import (
        build_bloom_store, probe_bloom_store, update_bloom_store)
    from syzgydb_spark.operators.maintenance import compact_bloom_store

    path = os.path.join(root, "bloom")
    build_bloom_store(wave_df(0), "term", path, n_bits=1 << 20)
    for w in range(1, n_waves):
        update_bloom_store(wave_df(w), "term", path)

    def bloom_probe():
        probe_bloom_store(probe_df, path, "term").agg(
            {"bloom_hit": "count"}).collect()

    pre = timed(bloom_probe)
    d_pre = n_dirs(path)
    t0 = time.monotonic()
    compact_bloom_store(spark, path)
    out["bloom"] = {
        "probe_before_s": pre, "dirs_before": d_pre,
        "compact_s": round(time.monotonic() - t0, 3),
        "probe_after_s": timed(bloom_probe), "dirs_after": n_dirs(path),
    }

    # ---------------- misra-gries ----------------
    from syzgydb_spark.operators.maintenance import compact_mg_store
    from syzgydb_spark.operators.sketch import (
        build_mg_store, read_mg_store, update_mg_store)

    path = os.path.join(root, "mg")
    build_mg_store(wave_df(0), "term", path, capacity=1024)
    for w in range(1, n_waves):
        update_mg_store(wave_df(w), "term", path)

    def mg_read():
        read_mg_store(spark, path).agg({"est_count": "sum"}).collect()

    pre = timed(mg_read)
    d_pre = n_dirs(path)
    t0 = time.monotonic()
    compact_mg_store(spark, path)
    out["mg"] = {
        "read_before_s": pre, "dirs_before": d_pre,
        "compact_s": round(time.monotonic() - t0, 3),
        "read_after_s": timed(mg_read), "dirs_after": n_dirs(path),
    }

    # ---------------- quantile store ----------------
    from syzgydb_spark.operators.quantiles import (
        build_quantile_store, read_quantile_store, update_quantile_store)
    from syzgydb_spark.operators.quantiles import (
        compact_quantile_store, sketch_quantiles)

    path = os.path.join(root, "qs")
    build_quantile_store(
        wave_df(0).selectExpr("length(text) as v"), "v", path, capacity=1024)
    for w in range(1, n_waves):
        update_quantile_store(
            wave_df(w).selectExpr("length(text) as v"), "v", path)

    def qs_read():
        sketch_quantiles(read_quantile_store(spark, path), [0.5, 0.9]).collect()

    pre = timed(qs_read)
    d_pre = n_dirs(path)
    t0 = time.monotonic()
    compact_quantile_store(spark, path)
    out["quantile"] = {
        "read_before_s": pre, "dirs_before": d_pre,
        "compact_s": round(time.monotonic() - t0, 3),
        "read_after_s": timed(qs_read), "dirs_after": n_dirs(path),
    }

    # ---------------- line store ----------------
    from syzgydb_spark.operators.dedup import (
        build_line_store, line_dedup_against_store, update_line_store)
    from syzgydb_spark.operators.maintenance import compact_line_store

    table = f"bench_lines_{uuid.uuid4().hex[:8]}"
    build_line_store(wave_df(0), table, buckets=8)
    for w in range(1, n_waves):
        update_line_store(spark, wave_df(w), table)

    def line_probe():
        line_dedup_against_store(spark, probe_df, table).agg(
            {"n_removed_lines": "sum"}).collect()

    pre = timed(line_probe)
    f_pre = len(spark.table(table).inputFiles())
    r_pre = spark.table(table).count()
    t0 = time.monotonic()
    compact_line_store(spark, table)
    out["line"] = {
        "probe_before_s": pre, "files_before": f_pre, "rows_before": r_pre,
        "compact_s": round(time.monotonic() - t0, 3),
        "probe_after_s": timed(line_probe),
        "files_after": len(spark.table(table).inputFiles()),
        "rows_after": spark.table(table).count(),
    }
    spark.sql(f"DROP TABLE {table}")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
