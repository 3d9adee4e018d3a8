"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at the given
sf dir, compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --json OUT.json [sf_dir] [query ...]

``--json`` additionally writes a driver-style correctness artifact
(per-query rows/schema/hash match booleans) — committed each round as
CORRECTNESS_SELF_rN.json so every registry entry ships with recorded
correctness evidence, not just the first 50 the driver covers.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from syzgydb_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    report: dict[str, dict] = {}
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None,
                "err": f"spark: {type(e).__name__}: {str(e)[:200]}",
            }
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            report[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(srows),
                "oracle_rows": None, "err": "no_oracle",
            }
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            dtypes = [str(t).upper() for t in res.types]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None,
                "err": f"duckdb: {type(e).__name__}: {str(e)[:200]}",
            }
            failures += 1
            continue
        problems = []
        # Oracle result-type gate: the driver's hasher serializes typed
        # values, so a DuckDB column whose type Spark cannot produce
        # (HUGEINT from sum(int), DECIMAL, unsigned ints) hash-mismatches
        # even when fetchall()+str() collapses the values to identical
        # strings.  r6 verdict: this exact drift (line_dedup
        # n_removed_lines HUGEINT vs Spark BIGINT) passed 106/106 here
        # while failing the driver — fail it here too.
        drift = [
            f"{c}:{t}" for c, t in zip(dcols, dtypes)
            if any(bad in t for bad in
                   ("HUGEINT", "DECIMAL", "UBIGINT", "UINTEGER",
                    "USMALLINT", "UTINYINT"))
        ]
        if drift:
            problems.append(
                f"oracle type drift (cast to a Spark-native type): {drift}")
        # Result-shape gate (r8 verdict #1): the driver canonicalizes
        # with pandas sort_values, which cannot hash list/struct/map
        # cells — hashed_doc_embedding's ARRAY<DOUBLE> column was the
        # r8 window's one red cell while this stringifying check stayed
        # green.  Fail any non-scalar column on EITHER side.
        # list types render as T[] OR fixed-size T[3] — regex, not a
        # bare "[]" substring, so fixed arrays cannot slip past
        nonscalar = [
            f"duck:{c}:{t}" for c, t in zip(dcols, dtypes)
            if re.search(r"\[\d*\]", t)
            or any(bad in t for bad in ("STRUCT(", "MAP(", "UNION("))
        ] + [
            f"spark:{f.name}:{f.dataType.simpleString()}"
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if nonscalar:
            problems.append(
                f"non-scalar result columns (driver hasher cannot "
                f"canonicalize; explode or to_json): {nonscalar}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            a = norm_rows(scols, srows)
            b = norm_rows(dcols, drows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                extra_a = [x for x in a if x not in set(b)][:3]
                problems.append(f"values differ; first diffs {diff or extra_a}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: {len(srows)} rows hash-match")
        report[name] = {
            "rows_match": len(srows) == len(drows),
            "schema_match": sorted(scols) == sorted(dcols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": "; ".join(problems) if problems else None,
        }
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    if json_out:
        # provenance stamp: which tree + data this artifact certifies
        import subprocess

        try:
            sha = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or None
            dirty = bool(subprocess.run(
                ["git", "status", "--porcelain"],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                capture_output=True, text=True, timeout=10,
            ).stdout.strip())
        except Exception:
            sha, dirty = None, None
        artifact = {
            "_provenance": {
                "git_sha": sha,
                "git_dirty": dirty,
                "sf_dir": sf_dir,
                "n_queries": len(report),
                "n_failures": failures,
            },
            **report,
        }
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries, sha={sha and sha[:9]})")
        # CI-style regeneration: the contract table tracks the registry
        try:
            import gen_contract

            print(f"regenerated {gen_contract.main()}")
        except Exception as e:  # the artifact matters more than the doc
            print(f"CONTRACT.md regeneration failed: {e}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
