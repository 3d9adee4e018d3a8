"""Hot-path metadata promotion for SCHEMALESS collections.

A collection without a declared ``metadata_schema`` keeps the
reference's raw-JSON contract, and its filter evaluation rides the
variant compiler — correct, but interpreted (Spark's variant
expressions are CodegenFallback) and invisible to parquet row-group
pruning. ``Collection.promote_paths({"user.age": "double"})``
materializes chosen variant paths as plain typed columns at COMMIT
time; this module supplies the two expression builders:

* :func:`promoted_col` — the stored column expression. It reads the
  path exactly as the variant compiler would (``_ident_te`` → typed
  accessor), so the materialized value is NULL precisely when the
  filter language would see nil/type-mismatch/error — which is what
  makes the hint below sound.
* :func:`promoted_hint` — a conservative pushable shadow of a filter
  AST over the promoted columns, the schemaless sibling of
  ``typed.pushdown_hint``: every emitted conjunct is true whenever
  the Go evaluation of the filter is true, so it can be ANDed next
  to the exact variant predicate and pushed into the scan.

The exact predicate still runs (reference semantics are untouched);
promotion only changes WHERE the coarse filtering happens — inside
whole-stage codegen and parquet statistics instead of the variant
interpreter. This is the per-path version of declaring a full
``metadata_schema``: the long tail of cold paths stays schemaless.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from syzgydb_spark.query import parser as P
from syzgydb_spark.query.compiler import CompileError, _ident_te

PROMOTABLE_TYPES = ("double", "string", "boolean")

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def parse_path(path: str) -> list[str]:
    """Validate a promotable path: a plain dotted field chain (array
    indexes and wildcards are not promotable — their evaluation is
    positional, not a stored scalar)."""
    names = path.split(".")
    if not names or not all(_IDENT_RE.match(n) for n in names):
        raise CompileError(
            f"unpromotable path {path!r}: expected a dotted field chain "
            "like 'user.age'"
        )
    return names


def promoted_col(metadata: Column, path: str, dtype: str) -> Column:
    """The stored expression for a promoted path: the value AS THE
    FILTER LANGUAGE READS IT — typed when the stored JSON type
    matches, NULL on absent / type-mismatch / mid-path error — so a
    comparison against the materialized column is exactly the variant
    comparison."""
    if dtype not in PROMOTABLE_TYPES:
        raise CompileError(
            f"unpromotable type {dtype!r}: expected one of {PROMOTABLE_TYPES}"
        )
    te = _ident_te(
        F.try_parse_json(metadata), [("field", n) for n in parse_path(path)]
    )
    val = {"double": te.dbl, "string": te.str_, "boolean": te.bool_}[dtype]()
    # error rows (unparseable metadata, non-object mid-path) read NULL
    return F.when(~F.coalesce(te.err(), F.lit(True)), val)


def _promoted_ref(node, mapping: dict):
    """(colname, type) when the node is an Ident over a promoted
    dotted field chain, else None."""
    if not isinstance(node, P.Ident):
        return None
    if any(s[0] != "field" for s in node.segments):
        return None
    return mapping.get(".".join(s[1] for s in node.segments))


def _lit_for(value, dtype: str) -> Column | None:
    """Literal as a native operand when its type category matches the
    promoted type (type-strict Go semantics: a cross-type comparison
    is never true, so no hint operand is needed)."""
    if isinstance(value, bool):
        return F.lit(value) if dtype == "boolean" else None
    if isinstance(value, (int, float)):
        return F.lit(float(value)) if dtype == "double" else None
    if isinstance(value, str):
        return F.lit(value) if dtype == "string" else None
    return None


def promoted_hint(node, mapping: dict) -> Column | None:
    """Conservative pushable shadow of the filter AST over promoted
    physical columns. ``mapping``: dotted path → (column name, type).
    Same contract as ``typed.pushdown_hint``: AND the result next to
    the exact predicate; ``!=``/NOT/EXISTS contribute nothing (their
    Go-truth covers nil rows the columns read as NULL)."""
    if isinstance(node, P.BinOp):
        if node.op == "AND":
            l = promoted_hint(node.left, mapping)
            r = promoted_hint(node.right, mapping)
            if l is not None and r is not None:
                return l & r
            return l if l is not None else r
        if node.op == "OR":
            l = promoted_hint(node.left, mapping)
            r = promoted_hint(node.right, mapping)
            return (l | r) if l is not None and r is not None else None
        if node.op in ("==", "<", "<=", ">", ">=",
                       "CONTAINS", "STARTS_WITH", "ENDS_WITH"):
            ref = _promoted_ref(node.left, mapping)
            if ref is None or not isinstance(node.right, P.Lit):
                return None
            colname, dtype = ref
            if node.op in ("CONTAINS", "STARTS_WITH", "ENDS_WITH") and dtype != "string":
                return None
            lit = _lit_for(node.right.value, dtype)
            if lit is None:
                return None
            fcol = F.col(colname)
            return {
                "==": lambda: fcol == lit,
                "<": lambda: fcol < lit,
                "<=": lambda: fcol <= lit,
                ">": lambda: fcol > lit,
                ">=": lambda: fcol >= lit,
                "CONTAINS": lambda: fcol.contains(lit),
                "STARTS_WITH": lambda: fcol.startswith(lit),
                "ENDS_WITH": lambda: fcol.endswith(lit),
            }[node.op]()
    if isinstance(node, P.In) and not node.negated:
        ref = _promoted_ref(node.expr, mapping)
        if ref is None or not isinstance(node.array, P.ArrayLit):
            return None
        colname, dtype = ref
        lits = []
        for item in node.array.items:
            if not isinstance(item, P.Lit):
                return None
            if item.value is None:
                # tri-state nil==nil can be TRUE; isin() never says
                # true for NULL → no sound narrowing (typed.py parity)
                return None
            nl = _lit_for(item.value, dtype)
            if nl is not None:
                lits.append(
                    float(item.value)
                    if dtype == "double" and not isinstance(item.value, bool)
                    else item.value
                )
        return F.col(colname).isin(lits) if lits else F.lit(False)
    return None
