"""Typed-column fast path for the filter language.

The variant path (query/compiler.py) works on schemaless JSON —
faithful to the reference, but variant accessors are CodegenFallback
upstream, so wide predicates run interpreted. When the metadata schema
IS known (struct/map columns — e.g. a collection ingested with an
enforced schema, or relational columns packed into a struct), this
module compiles the same filter AST to plain struct-field accessors:
the whole predicate participates in whole-stage codegen and pushes
down to the parquet scan.

Ident paths resolve against the static schema at COMPILE time:

* top-level key absent from the schema → Go nil, no error
  (compiler.go:433-449);
* nested ``.field`` through a non-struct or absent field → constant
  error (row dropped), matching the reference's data-dependent error
  on the schema'd corpus;
* nested access through a NULL struct → per-row error (``.`` on nil,
  compiler.go:222-245);
* ``[idx]`` uses ``F.get`` (0-based, out-of-bounds → nil, no error —
  compiler.go:246-262); indexing a non-array type → constant error;
* ``.length`` on arrays, ``LENGTH()`` on string/array/map/struct;
* map columns keep real key-membership semantics
  (``map_contains_key``).

DOCUMENTED DEVIATION (inherent to typed rows): a struct row cannot
distinguish an absent key from a null value — every schema field exists
on every row. ``a EXISTS`` / ``a DOES NOT EXIST`` on struct fields
therefore resolve statically from the schema, and a key that was absent
in the source JSON reads as null. Map columns don't have this
limitation. The conformance suite runs against this path with those
cases excluded (tests/test_filter_typed.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from syzgydb_spark.query import parser as P
from syzgydb_spark.query.compiler import (
    ArrayLitTE,
    Compiler,
    CompileError,
    TE,
    _null_bool,
    _strict_eq,
)
from syzgydb_spark.query.parser import parse

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _is_obj_type(dt) -> bool:
    return isinstance(dt, (T.StructType, T.MapType))


class TypedTE(TE):
    """A value with a statically-known Spark type.

    ``err`` carries the per-row Go-error condition accumulated during
    path resolution; type mismatches are known at compile time, so the
    typed accessors are constants or plain column casts — all codegen.
    """

    def __init__(self, col: Column | None, dtype, err: Column | None = None):
        self.col = col          # None ⇔ statically nil (absent top-level key)
        self.dtype = dtype
        self._err = err if err is not None else F.lit(False)

    def dbl(self) -> Column:
        if self.col is not None and isinstance(self.dtype, _NUMERIC):
            return self.col.cast("double")
        return super().dbl()

    def str_(self) -> Column:
        if self.col is not None and isinstance(self.dtype, T.StringType):
            return self.col
        return super().str_()

    def bool_(self) -> Column:
        if self.col is not None and isinstance(self.dtype, T.BooleanType):
            return self.col
        return super().bool_()

    def arr(self) -> Column | None:
        return self.col if isinstance(self.dtype, T.ArrayType) else None

    def is_arr(self) -> Column:
        if self.col is None or not isinstance(self.dtype, T.ArrayType):
            return F.lit(False)
        return self.col.isNotNull()

    def is_obj(self) -> Column:
        if self.col is None or not _is_obj_type(self.dtype):
            return F.lit(False)
        return self.col.isNotNull()

    def is_nil(self) -> Column:
        if self.col is None:
            return ~self._err
        return self.col.isNull() & ~self._err

    def err(self) -> Column:
        return self._err

    def exists_(self) -> Column:
        """Path evaluates without error (compiler.go:335-340)."""
        return ~self._err

    # -- hooks consumed by compiler._array_eq / _length --
    def native_eq(self, other: "TypedTE") -> Column | None:
        """DeepEqual on typed arrays/structs/maps: Spark native
        equality when the static types are compatible; statically
        false otherwise (type-strict, like reflect.DeepEqual)."""
        if self.col is None or other.col is None:
            return None  # nil==nil handled by the is_nil parts
        a_deep = isinstance(self.dtype, (T.ArrayType, T.StructType, T.MapType))
        b_deep = isinstance(other.dtype, (T.ArrayType, T.StructType, T.MapType))
        if not (a_deep and b_deep):
            return None
        # compare on type SHAPE: DataType.__eq__ includes nullability /
        # containsNull metadata, so structurally identical arrays with
        # different inferred nullability would wrongly report lit(False)
        if self.dtype.simpleString() == other.dtype.simpleString():
            return self.col == other.col
        # numeric arrays of different widths compare numerically
        # (Go decodes every number to float64)
        if (
            isinstance(self.dtype, T.ArrayType)
            and isinstance(other.dtype, T.ArrayType)
            and isinstance(self.dtype.elementType, _NUMERIC)
            and isinstance(other.dtype.elementType, _NUMERIC)
        ):
            return self.col.cast("array<double>") == other.col.cast("array<double>")
        return F.lit(False)

    def eq_array_lit(self, lit: ArrayLitTE) -> Column:
        if self.col is None or not isinstance(self.dtype, T.ArrayType):
            return F.lit(False)
        et = self.dtype.elementType
        cond = self.col.isNotNull() & (F.size(self.col) == len(lit.items))
        for i, item in enumerate(lit.items):
            elem = TypedTE(F.get(self.col, i), et)
            cond = cond & _strict_eq(elem, item)
        return cond

    def obj_length_col(self) -> Column | None:
        """LENGTH() of a map/struct (key count)."""
        if self.col is None:
            return None
        if isinstance(self.dtype, T.MapType):
            return F.size(F.map_keys(self.col)).cast("double")
        if isinstance(self.dtype, T.StructType):
            return F.lit(float(len(self.dtype.fields)))
        return None


def _resolve(col: Column, dtype, segments) -> TypedTE:
    """Static schema walk tracking where Go would error per row."""
    err = F.lit(False)
    cur, cur_t = col, dtype
    for i, seg in enumerate(segments):
        if seg[0] == "field":
            name = seg[1]
            if (
                name == "length"
                and i > 0
                and isinstance(cur_t, T.ArrayType)
            ):
                # `.length` of an array (compiler.go:238-241); arrays
                # can't be stepped into further
                if i != len(segments) - 1:
                    return TypedTE(None, T.NullType(), F.lit(True))
                return TypedTE(F.size(cur).cast("double"), T.DoubleType(), err | cur.isNull())
            if isinstance(cur_t, T.StructType):
                if name in cur_t.fieldNames():
                    if i > 0:
                        err = err | cur.isNull()  # "." on nil → error
                    cur = cur[name]
                    cur_t = cur_t[name].dataType
                elif i == 0:
                    # top-level missing key: nil, no error
                    return TypedTE(None, T.NullType(), F.lit(False))
                else:
                    return TypedTE(None, T.NullType(), F.lit(True))
            elif isinstance(cur_t, T.MapType) and isinstance(cur_t.keyType, T.StringType):
                present = F.coalesce(F.map_contains_key(cur, name), F.lit(False))
                if i > 0:
                    err = err | cur.isNull() | ~present
                cur = F.try_element_at(cur, F.lit(name))
                cur_t = cur_t.valueType
            else:
                # "." on a non-object: top level never errors (nil),
                # nested errors (compiler.go:222-245, 433-449)
                return TypedTE(None, T.NullType(), F.lit(i > 0))
        elif seg[0] == "index":
            if isinstance(cur_t, T.ArrayType):
                err = err | cur.isNull()
                cur = F.get(cur, int(seg[1]))  # OOB → nil, no error
                cur_t = cur_t.elementType
            else:
                return TypedTE(None, T.NullType(), F.lit(True))
        else:
            raise CompileError("[*] only allowed as the ANY/ALL array expression")
    return TypedTE(cur, cur_t, err)


class TypedCompiler(Compiler):
    """Compiles against a (column, static-DataType) root instead of a
    variant column — roots are passed as ``(col, dtype)`` tuples."""

    def _ident(self, root, segments) -> TE:
        col, dtype = root
        return _resolve(col, dtype, segments)

    def _exists(self, node: P.Exists, root) -> TE:
        from syzgydb_spark.query.compiler import BoolTE

        expr = self.compile(node.expr, root)
        if not hasattr(expr, "exists_"):
            raise CompileError("EXISTS requires a field path")
        if not node.negated:
            return BoolTE(expr.exists_())
        # DOES NOT EXIST: top-level key membership (compiler.go:60-76)
        if not isinstance(node.expr, P.Ident) or len(node.expr.segments) != 1:
            return BoolTE(_null_bool())
        name = node.expr.segments[0][1]
        col, dtype = root
        if isinstance(dtype, T.StructType):
            # schema-complete rows: membership is static (see module
            # docstring for the absent-vs-null caveat)
            return BoolTE(F.lit(name not in dtype.fieldNames()))
        if isinstance(dtype, T.MapType):
            return BoolTE(~F.coalesce(F.map_contains_key(col, name), F.lit(False)))
        return BoolTE(F.lit(False))

    def _any_all(self, node: P.AnyAll, root) -> TE:
        from syzgydb_spark.query.compiler import BoolTE

        if not isinstance(node.array, P.Ident):
            raise CompileError("ANY/ALL require a field path array expression")
        segs = node.array.segments
        if segs[-1] == ("star",):
            segs = segs[:-1]
        arr_te = self._ident(root, segs)
        arr = arr_te.arr()
        if arr is None:
            return BoolTE(_null_bool())
        elem_t = arr_te.dtype.elementType

        def cond(el: Column) -> Column:
            return self.compile(node.cond, (el, elem_t)).bool_()

        col = F.exists(arr, cond) if node.kind == "ANY" else F.forall(arr, cond)
        return BoolTE(F.when(arr_te.is_arr() & ~arr_te.err(), col).otherwise(_null_bool()))


def compile_to_column_typed(
    query: str,
    metadata: Column | str,
    dtype,
    *,
    params: dict | None = None,
) -> Column:
    """Compile a filter string against a statically-typed metadata
    column to a tri-state boolean Column (NULL = Go error)."""
    col = F.col(metadata) if isinstance(metadata, str) else metadata
    node = parse(query)
    return TypedCompiler(params).compile(node, (col, dtype)).bool_()


def compile_filter_typed(
    query: str,
    metadata: Column | str,
    dtype,
    *,
    params: dict | None = None,
) -> Column:
    """Row-keeping predicate over a typed metadata column: rows whose
    evaluation would error in the reference are excluded (NULL→false).
    The result is a plain codegen-friendly boolean expression —
    pushdown-eligible, no variant machinery. A NULL metadata root is a
    per-row error like the variant path's unparsable JSON (the
    reference drops such rows) — without the guard a NULL map/struct
    root would evaluate as an empty document."""
    col = F.col(metadata) if isinstance(metadata, str) else metadata
    return (
        F.coalesce(
            compile_to_column_typed(query, metadata, dtype, params=params),
            F.lit(False),
        )
        & col.isNotNull()
    )


def _field_path(node, col: Column, dtype):
    """(column, leaf type) for a pure struct-field path, else None."""
    if not isinstance(node, P.Ident):
        return None
    cur, cur_t = col, dtype
    for seg in node.segments:
        if seg[0] != "field" or not isinstance(cur_t, T.StructType):
            return None
        if seg[1] not in cur_t.fieldNames():
            return None
        cur = cur[seg[1]]
        cur_t = cur_t[seg[1]].dataType
    return cur, cur_t


def _native_lit(value, ftype) -> Column | None:
    """Literal as a native comparison operand when its type category
    matches the field's (Go's type-strict semantics make cross-type
    comparisons false/error → no shadow needed)."""
    if isinstance(value, bool):
        return F.lit(value) if isinstance(ftype, T.BooleanType) else None
    if isinstance(value, (int, float)):
        return F.lit(value) if isinstance(ftype, _NUMERIC) else None
    if isinstance(value, str):
        return F.lit(value) if isinstance(ftype, T.StringType) else None
    return None


def pushdown_hint(node, col: Column, dtype) -> Column | None:
    """A CONSERVATIVE pushable approximation of the filter: a plain
    Catalyst predicate implied by "the Go evaluation returns true".
    ANDed next to the exact tri-state predicate it lets simple
    comparisons reach the parquet scan (row-group pruning), which the
    CASE-WHEN error-tracking form cannot. Soundness: every emitted
    conjunct is true whenever the Go result is true (type-strict ops
    are only true on matching non-nil operands). ``!=``/NOT/EXISTS
    contribute nothing (their Go-truth covers nil/mismatch rows)."""
    if isinstance(node, P.BinOp):
        if node.op == "AND":
            l = pushdown_hint(node.left, col, dtype)
            r = pushdown_hint(node.right, col, dtype)
            if l is not None and r is not None:
                return l & r
            return l if l is not None else r
        if node.op == "OR":
            l = pushdown_hint(node.left, col, dtype)
            r = pushdown_hint(node.right, col, dtype)
            return (l | r) if l is not None and r is not None else None
        if node.op in ("==", "<", "<=", ">", ">=",
                       "CONTAINS", "STARTS_WITH", "ENDS_WITH"):
            f = _field_path(node.left, col, dtype)
            if f is None or not isinstance(node.right, P.Lit):
                return None
            fcol, ftype = f
            lit = _native_lit(node.right.value, ftype)
            if lit is None:
                return None
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
        f = _field_path(node.expr, col, dtype)
        if f is None or not isinstance(node.array, P.ArrayLit):
            return None
        fcol, ftype = f
        lits = []
        for item in node.array.items:
            if not isinstance(item, P.Lit):
                return None
            if item.value is None:
                # a null in the list can match a nil/absent field
                # (tri-state nil==nil is TRUE); isin() can never say
                # true for NULL, so no sound narrowing exists — emit
                # no hint rather than an unsound lit(False)/isin
                return None
            nl = _native_lit(item.value, ftype)
            if nl is not None:
                lits.append(item.value)
        # no same-type non-null literal in the list ⇒ Go can never say true
        return fcol.isin(lits) if lits else F.lit(False)
    return None


def where_filter_typed(
    df: DataFrame, query: str, metadata: str = "metadata", *, params: dict | None = None
) -> DataFrame:
    """``where_filter`` for struct/map metadata columns. No hoisting is
    needed: struct accessors are cheap named-field reads inside
    whole-stage codegen (the variant path hoists because its accessors
    are interpreted). A conservative shadow of the predicate
    (pushdown_hint) is applied alongside so pushable conjuncts reach
    the parquet scan."""
    dtype = df.schema[metadata].dataType
    if not _is_obj_type(dtype):
        raise CompileError(
            f"column {metadata!r} is {dtype.simpleString()}, not struct/map — "
            "use query.compiler.where_filter for JSON-string/variant metadata"
        )
    node = parse(query)
    pred = compile_filter_typed(query, metadata, dtype, params=params)
    hint = pushdown_hint(node, F.col(metadata), dtype) if isinstance(
        dtype, T.StructType
    ) else None
    out = df.where(hint) if hint is not None else df
    return out.where(pred)
