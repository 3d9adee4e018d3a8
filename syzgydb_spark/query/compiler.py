"""Compile filter-language ASTs to ``pyspark.sql.Column`` predicates.

The reference evaluates filters as per-row Go closures with tri-state
results: true / false / *error*, where an erroring row is excluded from
results (collection.go:204-218). We model "error" as SQL NULL and wrap
the final predicate in ``coalesce(pred, false)``.

Exact semantics reproduced (from /root/reference/query/compiler.go):

* top-level identifier on an object: missing key → **nil, no error**
  (getField, compiler.go:433-449; Go map access returns the zero value);
* nested ``.field`` access: missing key or non-object operand → error
  (evaluateOperation ".", compiler.go:222-245);
* ``.length`` on an *array* → its length; strings/objects are not
  special-cased by ``.`` (compiler.go:238-241); ``LENGTH(x)`` supports
  string/array/object (evaluateLength, compiler.go:364-375);
* ``[idx]``: non-array → error; out-of-bounds → nil, no error
  (compiler.go:246-262);
* ``==``/``!=``: reflect.DeepEqual — never errors, type mismatch is
  false, nil == nil is true (so ``absent == null`` holds);
* ``>``/``<``/...: numeric or string×string, anything else (incl. nil)
  → error (compareValues/toFloat64, compiler.go:268-322, 450-474);
* ``CONTAINS/STARTS_WITH/ENDS_WITH/MATCHES``: both operands must be
  strings, else error (compiler.go:393-431);
* AND evaluates both sides, OR short-circuits on a true left; either
  way a non-bool/errored operand → error (compiler.go:180-199);
* ``x EXISTS``: "evaluates without error" (compiler.go:335-340) — note
  the inherited quirk that a single-segment path on an object never
  errors, so top-level EXISTS is always true;
* ``x DOES NOT EXIST``: top-level key-membership only; non-identifier
  argument → error; non-object data → false (compiler.go:60-76).

Type strictness: Spark's ``try_variant_get(v, p, 'double')`` *coerces*
(e.g. string "3" → 3.0), which Go never does, so every typed accessor is
guarded by ``schema_of_variant``. All JSON numbers compare as doubles —
the reference decodes every number to float64 (parser.go:472-480).

The compiler is pure Column construction — the resulting predicate is
JVM-side (whole-stage codegen, pushdown-friendly); no Python runs per
row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from syzgydb_spark.query import parser as P
from syzgydb_spark.query.parser import parse

def _null_bool():
    return F.lit(None).cast("boolean")
_NUMERIC_RE = "^(TINYINT|SMALLINT|INT|BIGINT|FLOAT|DOUBLE|DECIMAL)"


class CompileError(ValueError):
    pass


def _is_obj(v: Column) -> Column:
    t = F.schema_of_variant(v)
    return F.coalesce(t.startswith("OBJECT") | t.startswith("STRUCT"), F.lit(False))


def _is_arr(v: Column) -> Column:
    return F.coalesce(F.schema_of_variant(v).startswith("ARRAY"), F.lit(False))


class TE:
    """Typed expression with Go-error tracking.

    ``err()`` — evaluation would have errored in the reference.
    ``is_nil()`` — value is Go nil (JSON null or absent-without-error).
    Typed accessors return NULL unless the value is strictly that type.
    """

    def dbl(self) -> Column:
        return F.lit(None).cast("double")

    def str_(self) -> Column:
        return F.lit(None).cast("string")

    def bool_(self) -> Column:
        return _null_bool()

    def arr(self) -> Column | None:
        return None

    def is_arr(self) -> Column:
        return F.lit(False)

    def is_obj(self) -> Column:
        return F.lit(False)

    def is_nil(self) -> Column:
        return F.lit(False)

    def err(self) -> Column:
        return F.lit(False)


class VariantTE(TE):
    """A variant value (array element or resolved sub-document).

    ``typeof_col`` lets a caller bind a pre-materialized
    ``schema_of_variant`` column (see ``where_filter``'s hoisting) —
    in interpreted mode every accessor reference re-evaluates its
    expression tree, so walking the full metadata variant per
    reference is the dominant cost on wide predicates."""

    def __init__(
        self, sub: Column, err_col: Column | None = None, typeof_col: Column | None = None
    ):
        self.sub = sub
        self._err = err_col if err_col is not None else F.lit(False)
        self._typeof = typeof_col if typeof_col is not None else F.schema_of_variant(sub)

    def dbl(self) -> Column:
        return F.when(self._typeof.rlike(_NUMERIC_RE), F.try_variant_get(self.sub, "$", "double"))

    def str_(self) -> Column:
        return F.when(self._typeof == "STRING", F.try_variant_get(self.sub, "$", "string"))

    def bool_(self) -> Column:
        return F.when(self._typeof == "BOOLEAN", F.try_variant_get(self.sub, "$", "boolean"))

    def arr(self) -> Column:
        return F.try_variant_get(self.sub, "$", "array<variant>")

    def is_arr(self) -> Column:
        return _is_arr(self.sub)

    def is_obj(self) -> Column:
        return _is_obj(self.sub)

    def is_nil(self) -> Column:
        return (
            F.coalesce(F.is_variant_null(self.sub), F.lit(False))
            | (self.sub.isNull() & ~self._err)
        )

    def err(self) -> Column:
        return self._err


def _ident_te(root: Column, segments) -> VariantTE:
    """Walk an ident path step by step, tracking where Go would error.

    root must be the parsed metadata variant (NULL = JSON unmarshal
    failure, which the reference surfaces as an error per row,
    compiler.go:477-484).
    """
    err = root.isNull()
    cur = root
    n = len(segments)
    for i, seg in enumerate(segments):
        if seg[0] == "field":
            name = seg[1]
            nxt = F.try_variant_get(cur, f"$.{name}", "variant")
            if i == 0:
                # top-level getField: missing key is nil, not an error
                step_ok = _is_obj(cur)
            elif name == "length":
                # `.length` on an array yields its length (handled in
                # IdentTE.dbl); on an object it is a plain key lookup
                step_ok = _is_arr(cur) | (_is_obj(cur) & nxt.isNotNull())
            else:
                step_ok = _is_obj(cur) & nxt.isNotNull()
        elif seg[0] == "index":
            nxt = F.try_variant_get(cur, f"$[{seg[1]}]", "variant")
            step_ok = _is_arr(cur)
        else:
            raise CompileError("[*] only allowed as the ANY/ALL array expression")
        err = err | ~F.coalesce(step_ok, F.lit(False))
        cur = nxt
    return VariantTE(cur, err)


class IdentTE(TE):
    def __init__(self, root: Column, segments, env: dict | None = None):
        self.root = root
        self.segments = segments
        if env is not None and tuple(segments) in env:
            sub, typeof, err = env[tuple(segments)]
            self._v = VariantTE(sub, err, typeof)
        else:
            self._v = _ident_te(root, segments)
        self._len_parent: VariantTE | None = None
        if len(segments) > 1 and segments[-1] == ("field", "length"):
            par = tuple(segments[:-1])
            if env is not None and par in env:
                sub, typeof, err = env[par]
                self._len_parent = VariantTE(sub, err, typeof)
            else:
                self._len_parent = _ident_te(root, segments[:-1])

    def _length_col(self) -> Column:
        p = self._len_parent
        return F.when(p.is_arr() & ~p.err(), F.size(p.arr()).cast("double"))

    def dbl(self) -> Column:
        base = self._v.dbl()
        if self._len_parent is None:
            return base
        return F.coalesce(self._length_col(), base)

    def str_(self) -> Column:
        return self._v.str_()

    def bool_(self) -> Column:
        return self._v.bool_()

    def arr(self) -> Column:
        return self._v.arr()

    def is_arr(self) -> Column:
        return self._v.is_arr()

    def is_obj(self) -> Column:
        return self._v.is_obj()

    def is_nil(self) -> Column:
        nil = self._v.is_nil()
        if self._len_parent is not None:
            nil = nil & self._length_col().isNull()
        return nil

    def err(self) -> Column:
        e = self._v.err()
        if self._len_parent is not None:
            e = e & self._length_col().isNull()
        return e

    def exists_(self) -> Column:
        """True iff the path evaluates without error
        (reference compiler.go:335-340)."""
        return ~self.err()


class LitTE(TE):
    def __init__(self, value):
        self.value = value

    def dbl(self) -> Column:
        if isinstance(self.value, bool) or not isinstance(self.value, (int, float)):
            return super().dbl()
        return F.lit(float(self.value))

    def str_(self) -> Column:
        return F.lit(self.value) if isinstance(self.value, str) else super().str_()

    def bool_(self) -> Column:
        return F.lit(self.value) if isinstance(self.value, bool) else super().bool_()

    def is_nil(self) -> Column:
        return F.lit(self.value is None)


class BoolTE(TE):
    """Result of a comparison/logic op: boolean where NULL = Go error."""

    def __init__(self, col: Column):
        self.col = col

    def bool_(self) -> Column:
        return self.col

    def err(self) -> Column:
        return self.col.isNull()


class NumTE(TE):
    """Result of LENGTH(): numeric where NULL = Go error."""

    def __init__(self, col: Column):
        self.col = col

    def dbl(self) -> Column:
        return self.col

    def err(self) -> Column:
        return self.col.isNull()


class ArrayLitTE(TE):
    def __init__(self, items: list[TE]):
        self.items = items

    def eq_variant_array(self, other: TE) -> Column:
        arr = other.arr()
        cond = other.is_arr() & (F.size(arr) == len(self.items))
        for i, item in enumerate(self.items):
            elem = VariantTE(F.element_at(arr, i + 1))
            cond = cond & _strict_eq(elem, item)
        return cond


def _strict_eq(a: TE, b: TE) -> Column:
    """reflect.DeepEqual (compiler.go:174-177): type-strict equality;
    mismatched types are false, nil == nil is true, never errors."""
    parts = [
        a.dbl() == b.dbl(),
        a.str_() == b.str_(),
        a.bool_() == b.bool_(),
        a.is_nil() & b.is_nil(),
    ]
    arr_eq = _array_eq(a, b)
    if arr_eq is not None:
        parts.append(arr_eq)
    out = F.lit(False)
    for p in parts:
        out = out | F.coalesce(p, F.lit(False))
    return out


def _array_eq(a: TE, b: TE) -> Column | None:
    # typed fast path: native deep equality / element-wise literal
    # comparison (query/typed.py TEs implement these hooks)
    if hasattr(a, "native_eq") and hasattr(b, "native_eq"):
        return a.native_eq(b)
    if hasattr(a, "native_eq") and isinstance(b, ArrayLitTE):
        return a.eq_array_lit(b)
    if hasattr(b, "native_eq") and isinstance(a, ArrayLitTE):
        return b.eq_array_lit(a)
    a_var = isinstance(a, (VariantTE, IdentTE))
    b_var = isinstance(b, (VariantTE, IdentTE))
    if a_var and b_var:
        # DeepEqual on arrays/objects: canonical JSON text comparison —
        # both sides rendered by the same engine, and variant
        # canonicalization folds lexical number variants ('1.0'→'1',
        # '2.50'→'2.5', '5e-1'→'0.5'), so numerically-equal numbers
        # compare equal like Go's decode-everything-to-float64.
        # KNOWN DEVIATION (narrow): scientific-notation INTEGERS parse
        # as double and render with a trailing '.0' ('1e2'→'100.0' vs
        # '100'), so [1e2] != [100] field-vs-field, where Go says
        # equal. Pinned by tests/test_filter_language.py::
        # test_array_eq_number_canonicalization.
        asub = a.sub if isinstance(a, VariantTE) else a._v.sub
        bsub = b.sub if isinstance(b, VariantTE) else b._v.sub
        return (
            (a.is_arr() & b.is_arr() | a.is_obj() & b.is_obj())
            & (asub.cast("string") == bsub.cast("string"))
        )
    if a_var and isinstance(b, ArrayLitTE):
        return b.eq_variant_array(a)
    if b_var and isinstance(a, ArrayLitTE):
        return a.eq_variant_array(b)
    return None


def _cmp(op: str, a: TE, b: TE) -> Column:
    def apply(x: Column, y: Column) -> Column:
        return {"<": x < y, "<=": x <= y, ">": x > y, ">=": x >= y}[op]

    num = apply(a.dbl(), b.dbl())
    s = apply(a.str_(), b.str_())
    return (
        F.when(a.err() | b.err(), _null_bool())
        .when(num.isNotNull(), num)
        .when(s.isNotNull(), s)
        .otherwise(_null_bool())
    )


def _string_op(op: str, a: TE, b: TE) -> Column:
    sa, sb = a.str_(), b.str_()
    ops = {
        "CONTAINS": lambda: F.contains(sa, sb),
        "STARTS_WITH": lambda: F.startswith(sa, sb),
        "ENDS_WITH": lambda: F.endswith(sa, sb),
        "MATCHES": lambda: F.regexp_like(sa, sb),  # Java regex ⊇ Go RE2 for our surface
    }
    return (
        F.when(a.err() | b.err(), _null_bool())
        .when(sa.isNotNull() & sb.isNotNull(), ops[op]())
        .otherwise(_null_bool())
    )


class Compiler:
    def __init__(self, params: dict | None = None, env: dict | None = None):
        self.params = params or {}
        self.env = env

    def _ident(self, root, segments) -> TE:
        """Identifier-path resolution — the typed fast path
        (query/typed.py) overrides this with static schema walking."""
        return IdentTE(root, segments, self.env)

    def compile(self, node: P.Node, root) -> TE:
        if isinstance(node, P.Lit):
            return LitTE(node.value)
        if isinstance(node, P.ArrayLit):
            return ArrayLitTE([self.compile(i, root) for i in node.items])
        if isinstance(node, P.Param):
            if node.name in self.params:
                return LitTE(self.params[node.name])
            # reference: parameters are looked up in the data map
            # (compiler.go:79-90) — fall back to a field lookup
            return self._ident(root, (("field", node.name),))
        if isinstance(node, P.Ident):
            return self._ident(root, node.segments)
        if isinstance(node, P.Length):
            return self._length(node, root)
        if isinstance(node, P.Not):
            inner = self.compile(node.expr, root).bool_()
            return BoolTE(F.when(inner.isNull(), _null_bool()).otherwise(~inner))
        if isinstance(node, P.BinOp):
            return self._binop(node, root)
        if isinstance(node, P.In):
            return self._in(node, root)
        if isinstance(node, P.Exists):
            return self._exists(node, root)
        if isinstance(node, P.AnyAll):
            return self._any_all(node, root)
        raise CompileError(f"cannot compile {node!r}")

    def _length(self, node: P.Length, root) -> TE:
        # LENGTH(x): string/array/object, else error (compiler.go:364-375)
        inner = self.compile(node.expr, root)
        col = F.when(inner.err(), F.lit(None).cast("double"))
        arr_col = inner.arr()  # typed TEs return None for non-arrays
        if arr_col is not None:
            col = col.when(inner.is_arr(), F.size(arr_col).cast("double"))
        col = col.when(inner.str_().isNotNull(), F.length(inner.str_()).cast("double"))
        if isinstance(inner, (VariantTE, IdentTE)):
            sub = inner.sub if isinstance(inner, VariantTE) else inner._v.sub
            col = col.when(
                inner.is_obj(), F.size(F.json_object_keys(sub.cast("string"))).cast("double")
            )
        elif hasattr(inner, "obj_length_col"):  # typed fast path
            obj_len = inner.obj_length_col()
            if obj_len is not None:
                col = col.when(inner.is_obj(), obj_len)
        return NumTE(col)

    def _binop(self, node: P.BinOp, root: Column) -> TE:
        op = node.op
        if op in ("AND", "OR"):
            a = self.compile(node.left, root).bool_()
            b = self.compile(node.right, root).bool_()
            if op == "AND":
                # both sides always evaluated; either error → error
                # (compiler.go:180-186)
                col = F.when(a.isNull() | b.isNull(), _null_bool()).otherwise(a & b)
            else:
                # OR short-circuits when left is true (compiler.go:188-199)
                col = (
                    F.when(a, F.lit(True))
                    .when(a.isNull() | b.isNull(), _null_bool())
                    .otherwise(a | b)
                )
            return BoolTE(col)
        a = self.compile(node.left, root)
        b = self.compile(node.right, root)
        if op == "==":
            return BoolTE(F.when(a.err() | b.err(), _null_bool()).otherwise(_strict_eq(a, b)))
        if op == "!=":
            return BoolTE(F.when(a.err() | b.err(), _null_bool()).otherwise(~_strict_eq(a, b)))
        if op in ("<", "<=", ">", ">="):
            return BoolTE(_cmp(op, a, b))
        if op in ("CONTAINS", "STARTS_WITH", "ENDS_WITH", "MATCHES"):
            return BoolTE(_string_op(op, a, b))
        raise CompileError(f"unknown operator {op}")

    def _in(self, node: P.In, root: Column) -> TE:
        expr = self.compile(node.expr, root)
        arr = self.compile(node.array, root)
        if not isinstance(arr, ArrayLitTE):
            raise CompileError("IN requires an array literal")
        hit = F.lit(False)
        for item in arr.items:
            hit = hit | _strict_eq(expr, item)
        if node.negated:
            hit = ~hit
        return BoolTE(F.when(expr.err(), _null_bool()).otherwise(hit))

    def _exists(self, node: P.Exists, root) -> TE:
        expr = self.compile(node.expr, root)
        if not hasattr(expr, "exists_"):
            raise CompileError("EXISTS requires a field path")
        if not node.negated:
            return BoolTE(expr.exists_())
        # DOES NOT EXIST: top-level key membership only; non-identifier
        # argument is an error; non-object data → false
        # (compiler.go:60-76)
        if len(expr.segments) != 1:
            return BoolTE(_null_bool())
        name = expr.segments[0][1]
        present = F.try_variant_get(root, f"$.{name}", "variant").isNotNull()
        col = (
            F.when(root.isNull(), _null_bool())
            .when(_is_obj(root), ~present)
            .otherwise(F.lit(False))
        )
        return BoolTE(col)

    def _any_all(self, node: P.AnyAll, root: Column) -> TE:
        if not isinstance(node.array, P.Ident):
            raise CompileError("ANY/ALL require a field path array expression")
        segs = node.array.segments
        if segs[-1] == ("star",):
            segs = segs[:-1]
        arr_te = self._ident(root, segs)
        arr = arr_te.arr()

        # element scope compiles WITHOUT the hoist env: env maps
        # ROOT-relative paths to hoisted columns, and an element-scoped
        # ident that happens to share a root path's shape (ANY(items[*]
        # a > 5) with a root-scope `a` elsewhere in the filter) must
        # resolve against the lambda element, not the hoisted root
        # column. (TypedCompiler overrides _any_all; this is the
        # variant path only.)
        inner = Compiler(self.params) if self.env is not None else self

        def cond(el: Column) -> Column:
            return inner.compile(node.cond, el).bool_()

        col = F.exists(arr, cond) if node.kind == "ANY" else F.forall(arr, cond)
        return BoolTE(F.when(arr_te.is_arr() & ~arr_te.err(), col).otherwise(_null_bool()))


def compile_to_column(
    query: str,
    metadata: Column | str = "metadata",
    *,
    params: dict | None = None,
    metadata_is_json_string: bool = True,
) -> Column:
    """Compile a filter string to a tri-state boolean Column
    (NULL = the row would have errored in the reference)."""
    col = F.col(metadata) if isinstance(metadata, str) else metadata
    root = F.try_parse_json(col) if metadata_is_json_string else col
    node = parse(query)
    return Compiler(params).compile(node, root).bool_()


def compile_filter(
    query: str,
    metadata: Column | str = "metadata",
    *,
    params: dict | None = None,
    metadata_is_json_string: bool = True,
) -> Column:
    """Compile a filter string to a row-keeping predicate.

    Rows whose evaluation would error in the reference are excluded
    (collection.go:210-217): NULL → false.
    """
    return F.coalesce(
        compile_to_column(
            query, metadata, params=params, metadata_is_json_string=metadata_is_json_string
        ),
        F.lit(False),
    )


def _collect_root_paths(node, params: dict) -> set[tuple]:
    """Ident paths referenced at metadata-root scope (ANY/ALL condition
    idents are element-scoped and excluded; the ANY/ALL *array* path is
    root-scoped and included)."""
    out: set[tuple] = set()

    def walk(n, root_scope: bool):
        if isinstance(n, P.Ident):
            if root_scope and not any(s[0] == "star" for s in n.segments):
                out.add(tuple(n.segments))
        elif isinstance(n, P.Param):
            if root_scope and n.name not in params:
                out.add((("field", n.name),))
        elif isinstance(n, P.BinOp):
            walk(n.left, root_scope)
            walk(n.right, root_scope)
        elif isinstance(n, (P.Not, P.Length)):
            walk(n.expr, root_scope)
        elif isinstance(n, P.In):
            walk(n.expr, root_scope)
        elif isinstance(n, P.Exists):
            walk(n.expr, root_scope)
        elif isinstance(n, P.AnyAll):
            segs = n.array.segments
            if segs[-1] == ("star",):
                segs = segs[:-1]
            # a MID-path star survives the trailing strip; hoisting it
            # would crash — leave it out and let compile raise the
            # proper CompileError('[*] only allowed as the ANY/ALL
            # array expression')
            if root_scope and not any(s[0] == "star" for s in segs):
                out.add(tuple(segs))
            walk(n.cond, False)

    walk(node, True)
    return out


def where_filter(df, query: str, metadata: str = "metadata", *, params: dict | None = None):
    """Apply a filter-language predicate with every per-row-expensive
    piece hoisted into real columns.

    In interpreted mode (variant expressions don't join whole-stage
    codegen) each reference in the predicate tree re-evaluates its
    whole subtree, so a predicate that mentions a field five times
    would re-parse and re-walk the metadata variant five times per
    row. Hoisting materializes, per row: the parsed variant, one
    sub-variant column per referenced path prefix, and its
    schema_of_variant — the boolean tree then runs over cheap
    attribute references (~4x on JSON-heavy scans).

    Small inputs (fewer partitions than half the cores) are
    repartitioned first: the predicate is CPU-heavy relative to a
    shuffle of a small table, and a single-file scan would otherwise
    pin the whole evaluation to one core. Real multi-file tables at
    scale already have enough splits and skip this."""
    params = params or {}
    if not df.isStreaming:
        try:
            from syzgydb_spark.session import scan_splits_estimate

            sc = df.sparkSession.sparkContext
            splits = scan_splits_estimate(df)
            if splits is not None and splits < sc.defaultParallelism // 2:
                df = df.repartition(sc.defaultParallelism)
        except Exception:
            pass  # plan shapes that can't answer the file listing cheaply

    node = parse(query)
    paths = _collect_root_paths(node, params)
    prefixes = sorted(
        {p[:i] for p in paths for i in range(1, len(p) + 1)}, key=len
    )

    vcol = "__syz_v"
    out = df.withColumn(vcol, F.try_parse_json(F.col(metadata)))
    root = F.col(vcol)
    temp_cols = [vcol]

    sub_ref: dict[tuple, Column] = {(): root}
    typeof_ref: dict[tuple, Column] = {}
    err_expr: dict[tuple, Column] = {(): root.isNull()}

    def typeof_of(pref: tuple) -> Column:
        if pref == ():
            return F.schema_of_variant(root)  # root: evaluated rarely
        return typeof_ref[pref]

    for idx, pref in enumerate(prefixes):
        parent = pref[:-1]
        seg = pref[-1]
        step = f"$.{seg[1]}" if seg[0] == "field" else f"$[{seg[1]}]"
        scol, tcol = f"__syz_s{idx}", f"__syz_t{idx}"
        out = out.withColumn(scol, F.try_variant_get(sub_ref[parent], step, "variant"))
        out = out.withColumn(tcol, F.schema_of_variant(F.col(scol)))
        temp_cols += [scol, tcol]
        sub_ref[pref] = F.col(scol)
        typeof_ref[pref] = F.col(tcol)

        par_t = typeof_of(parent)
        par_is_obj = F.coalesce(
            par_t.startswith("OBJECT") | par_t.startswith("STRUCT"), F.lit(False)
        )
        par_is_arr = F.coalesce(par_t.startswith("ARRAY"), F.lit(False))
        if seg[0] == "index":
            step_ok = par_is_arr
        elif len(pref) == 1:
            step_ok = par_is_obj  # top-level getField never errors on objects
        elif seg == ("field", "length"):
            step_ok = par_is_arr | (par_is_obj & F.col(scol).isNotNull())
        else:
            step_ok = par_is_obj & F.col(scol).isNotNull()
        err_expr[pref] = err_expr[parent] | ~F.coalesce(step_ok, F.lit(False))

    env = {
        pref: (sub_ref[pref], typeof_ref[pref], err_expr[pref]) for pref in prefixes
    }
    pred = Compiler(params, env).compile(node, root).bool_()
    # Pushdown barrier: PushPredicateThroughNonJoin only pushes a
    # filter through a Project whose fields are all deterministic, so
    # a rand() column in the hoist projection — referenced by the
    # predicate so ColumnPruning keeps it — pins the filter above the
    # hoisted columns. Without it the optimizer substitutes every
    # hoisted alias back into the predicate and re-evaluates each
    # variant extraction per reference (~4-5x slower, measured). The
    # predicate could never reach the parquet scan anyway: it is over
    # a computed variant column. This leans on Spark 4.x optimizer
    # behavior (PushPredicateThroughNonJoin's determinism check);
    # tests/test_plan_quality.py asserts the hoisted projection
    # survives optimization, so an optimizer change fails loudly.
    nd = "__syz_nd"
    out = out.withColumn(nd, F.rand(42))
    temp_cols.append(nd)
    # rand ∈ [0,1) so the comparison is always true, but unlike
    # isnotnull(rand()) it is not constant-foldable, so the barrier
    # and the attribute reference both survive optimization
    keep = F.when(F.col(nd) >= -1.0, F.coalesce(pred, F.lit(False))).otherwise(
        F.lit(False)
    )
    return out.where(keep).drop(*temp_cols)
