"""Registry-wide oracle result-type gate.

The driver's correctness hasher serializes *typed* values, so an oracle
whose SQL produces a DuckDB type Spark cannot emit — HUGEINT from
``sum(int)``, DECIMAL, unsigned ints — hash-mismatches against a
value-identical Spark result.  Round 6 shipped exactly this bug three
times (``line_dedup`` driver-red; ``session_stats`` / ``doc_novelty``
latent) while the fetchall()+str() self-check stayed 106/106 green.

This test binds every ``oracle_sql()`` entry under DuckDB (binding is
lazy — no execution, the whole sweep is ~2 s) and asserts no result
column carries a forbidden type.  Fix pattern: ``CAST(sum(...) AS
BIGINT)``.
"""

import re

import duckdb
import pytest

import __spark_entry__ as entry

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB types the driver-side hasher serializes differently from their
# Spark value-equivalents.  DECIMAL is forbidden wholesale: Spark's
# DecimalType exists but no registry query returns one, and silent
# sum()-promotion to DECIMAL is the same drift class as HUGEINT.
FORBIDDEN = (
    "HUGEINT", "DECIMAL", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
)

# Non-scalar result *shapes* the driver's canonicalizer cannot hash at
# all: pandas sort_values raises ``TypeError: unhashable type: 'list'``
# on any list/struct/map cell (r8 verdict #1: ``hashed_doc_embedding``
# returned ARRAY<DOUBLE> and was the round's one driver-red cell, while
# the stringifying self-check stayed green — the same
# self-vs-driver-normalizer gap as the r6 HUGEINT class, recurring in
# column shape instead of column type).  DuckDB renders list types as
# ``T[]`` (and fixed-size arrays as ``T[3]``) and nested types with a
# parenthesized body; the bracket form is matched by regex so a
# DOUBLE[3] cannot slip past a bare "[]" substring test.
FORBIDDEN_SHAPES = ("STRUCT(", "MAP(", "UNION(")
_LIST_SHAPE_RE = re.compile(r"\[\d*\]")


def _is_nonscalar_duck_type(typ: str) -> bool:
    return bool(_LIST_SHAPE_RE.search(typ)) or any(
        bad in typ for bad in FORBIDDEN_SHAPES)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _oracle_items():
    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize(
    "name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()]
)
def test_oracle_result_types_are_spark_native(con, name, sql):
    rel = con.sql(sql)  # lazy: binds + types the plan, does not execute
    drift = [
        f"{col}:{typ}"
        for col, typ in zip(rel.columns, (str(t).upper() for t in rel.types))
        if any(bad in typ for bad in FORBIDDEN)
    ]
    assert not drift, (
        f"oracle {name!r} produces driver-hash-unstable DuckDB types "
        f"{drift}; CAST the offending expressions to a Spark-native type "
        f"(e.g. CAST(sum(...) AS BIGINT))"
    )
    nonscalar = [
        f"{col}:{typ}"
        for col, typ in zip(rel.columns, (str(t).upper() for t in rel.types))
        if _is_nonscalar_duck_type(typ)
    ]
    assert not nonscalar, (
        f"oracle {name!r} produces non-scalar result columns {nonscalar}; "
        f"the driver's pandas canonicalizer cannot hash list/struct/map "
        f"cells — explode to scalar rows (doc_id, idx, value) or "
        f"serialize with to_json in BOTH the Spark query and the oracle"
    )


def test_spark_queries_return_scalar_columns_only(registry_dfs):
    """Spark-side twin of the shape gate: every queries() entry —
    including rows-only entries with no SQL oracle — must return only
    scalar columns, because the driver canonicalizes the SPARK result
    with pandas regardless of whether an oracle exists.  Schema-only
    (no job runs past the shared session-scoped binding)."""
    from pyspark.sql import types as T

    bad = {}
    for name, df in registry_dfs.items():
        nonscalar = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nonscalar:
            bad[name] = nonscalar
    assert not bad, (
        f"queries() entries return non-scalar result columns {bad}; "
        f"explode to scalar rows or to_json — the driver's hasher "
        f"cannot canonicalize them"
    )
