"""Filter-language conformance suite.

The truth table is ported from the reference's own end-to-end tests
(/root/reference/query/compiler_test.go:215-348) plus the pinned edge
semantics from SURVEY.md §7.3 / FIXTURES.md §F2. Each case is
(query, metadata-JSON, expected-keep?): we apply ``compile_filter`` to a
one-row DataFrame and check whether the row survives — exactly how the
reference applies FilterFn inside search (collection.go:204-218).
"""

import json

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.query import compile_filter, parse, ast_repr

# (name, query, metadata json, expected keep)
CASES = [
    # --- ported verbatim from compiler_test.go:215-348 ---
    ("simple_equality", "age == 30", '{"age": 30}', True),
    ("complex_condition",
     "(age >= 18 AND status == 'active') OR role == 'admin'",
     '{"age": 25, "status": "active", "role": "user"}', True),
    ("nested_string_op", "user.email ENDS_WITH '@example.com'",
     '{"user": {"email": "john@example.com"}}', True),
    ("in_operator", "status IN ['active', 'pending']", '{"status": "pending"}', True),
    ("not_in_operator", "status NOT IN ['inactive', 'suspended']", '{"status": "active"}', True),
    ("complex_nested",
     "(user.age > 25 AND (user.status == 'active' OR user.role == 'admin')) AND company.name STARTS_WITH 'Tech'",
     '{"user": {"age": 30, "status": "inactive", "role": "admin"}, "company": {"name": "TechCorp"}}',
     True),
    ("string_operations",
     "name CONTAINS 'John' AND email ENDS_WITH '@example.com' AND id STARTS_WITH 'USER'",
     '{"name": "John Doe", "email": "johndoe@example.com", "id": "USER123"}', True),
    ("numeric_comparisons",
     "price > 100 AND price < 200 AND quantity >= 5 AND discount <= 0.2",
     '{"price": 150, "quantity": 10, "discount": 0.15}', True),
    ("boolean_operations", "is_active == true AND is_deleted == false",
     '{"is_active": true, "is_deleted": false}', True),
    # NULL here is (quirkily) an identifier in the reference — it
    # resolves to a missing field, i.e. nil, and DeepEqual(nil,nil)=true
    ("null_checks", "optional_field == NULL AND required_field != NULL",
     '{"required_field": "value"}', True),
    ("regex_match", "username MATCHES '^[a-z0-9_]{3,16}$'", '{"username": "john_doe123"}', True),
    ("deep_array_object_nesting",
     "users[0].contacts[1].address.city == 'New York' AND users[0].contacts[1].phones[1].type CONTAINS 'work'",
     '{"users": [{"contacts": [{"address": {"city": "Los Angeles"}}, '
     '{"address": {"city": "New York"}, "phones": [{"type": "home"}, {"type": "work"}]}]}]}',
     True),
    ("length_and_exists", "tags.length > 3 AND optional_field EXISTS",
     '{"tags": ["red", "green", "blue", "yellow"], "optional_field": "value"}', True),
    ("complex_logical",
     "((a > 10 OR b < 5) AND (c == true OR d != false)) OR (e IN [1, 2, 3] AND f NOT IN ['x', 'y', 'z'])",
     '{"a": 15, "b": 7, "c": false, "d": true, "e": 2, "f": "w"}', True),
    # ANY/ALL — the reference's disabled tests (compiler_test.go:174-187,
    # parser.go:278-326); implemented here as a documented superset
    ("any_function", "ANY(items[*] quantity > 100)",
     '{"items": [{"quantity": 50}, {"quantity": 120}, {"quantity": 80}]}', True),
    ("any_function_false", "ANY(items[*] quantity > 200)",
     '{"items": [{"quantity": 50}, {"quantity": 120}, {"quantity": 80}]}', False),

    # --- negative / false results ---
    ("eq_false", "age == 30", '{"age": 31}', False),
    ("in_false", "status IN ['active', 'pending']", '{"status": "closed"}', False),
    ("contains_false", "name CONTAINS 'Jane'", '{"name": "John"}', False),
    ("regex_false", "username MATCHES '^[0-9]+$'", '{"username": "john"}', False),

    # --- error-as-false semantics (collection.go:210-217) ---
    ("cmp_missing_top_level", "age > 10", '{"other": 1}', False),      # nil > num → error
    ("cmp_type_mismatch", "age > 'abc'", '{"age": 30}', False),        # float64 vs string → error
    ("cmp_string_vs_num", "name > 5", '{"name": "x"}', False),         # string vs num → error
    ("contains_on_number", "age CONTAINS 'x'", '{"age": 30}', False),  # non-string → error
    ("nested_missing_key", "user.phone == 'x'", '{"user": {"email": "e"}}', False),
    ("nested_on_scalar", "age.value == 1", '{"age": 30}', False),      # '.' on number → error
    ("and_non_bool", "age AND is_active", '{"age": 1, "is_active": true}', False),
    ("not_non_bool", "NOT age", '{"age": 1}', False),
    ("bad_json", "age == 30", 'not json at all', False),

    # --- DeepEqual strictness ---
    ("eq_num_vs_string", "age == '30'", '{"age": 30}', False),
    ("eq_string_vs_num", "tag == 5", '{"tag": "5"}', False),
    ("eq_bool_vs_num", "flag == 1", '{"flag": true}', False),
    ("neq_cross_type", "age != '30'", '{"age": 30}', True),
    ("eq_array_literal", "tags == ['a', 'b']", '{"tags": ["a", "b"]}', True),
    ("eq_array_literal_order", "tags == ['b', 'a']", '{"tags": ["a", "b"]}', False),
    ("eq_array_numbers", "nums == [1, 2, 3]", '{"nums": [1, 2, 3]}', True),

    # --- nil / null semantics (getField returns nil for absent top-level) ---
    ("null_eq_json_null", "a == null", '{"a": null}', True),
    ("null_eq_absent", "a == null", '{}', True),                       # nil == nil
    ("null_eq_value", "a == null", '{"a": 5}', False),
    ("null_neq_value", "a != null", '{"a": 5}', True),
    ("cmp_json_null", "a > 5", '{"a": null}', False),                  # nil cmp → error

    # --- EXISTS / DOES NOT EXIST ---
    ("exists_present", "a EXISTS", '{"a": 1}', True),
    ("exists_null_value", "a EXISTS", '{"a": null}', True),
    # top-level getField never errors on an object → EXISTS true even
    # when absent (reference quirk, compiler.go:335-340 + 433-449)
    ("exists_absent_top_quirk", "a EXISTS", '{}', True),
    ("exists_nested_present", "a.b EXISTS", '{"a": {"b": 1}}', True),
    ("exists_nested_absent", "a.b EXISTS", '{"a": {"c": 1}}', False),
    ("exists_nested_null", "a.b EXISTS", '{"a": {"b": null}}', True),
    ("dne_absent", "a DOES NOT EXIST", '{}', True),
    ("dne_present", "a DOES NOT EXIST", '{"a": 1}', False),
    ("dne_null_value", "a DOES NOT EXIST", '{"a": null}', False),

    # --- array indexing ---
    ("index_basic", "arr[1] == 20", '{"arr": [10, 20, 30]}', True),
    ("index_oob_eq_null", "arr[5] == null", '{"arr": [10, 20]}', True),   # OOB → nil, no error
    ("index_oob_cmp", "arr[5] > 1", '{"arr": [10, 20]}', False),          # nil cmp → error
    ("index_on_non_array", "age[0] == 1", '{"age": 30}', False),          # error
    ("index_exists_oob", "arr[5] EXISTS", '{"arr": [10, 20]}', True),     # no error → exists

    # --- LENGTH / .length ---
    ("length_fn_string", "LENGTH(name) == 4", '{"name": "John"}', True),
    ("length_fn_array", "LENGTH(tags) == 2", '{"tags": ["a", "b"]}', True),
    ("length_fn_object", "LENGTH(user) == 2", '{"user": {"a": 1, "b": 2}}', True),
    ("length_fn_number_err", "LENGTH(age) == 2", '{"age": 30}', False),
    ("dot_length_array", "tags.length == 2", '{"tags": ["a", "b"]}', True),
    # `.` on a string is an error in the reference (only arrays have
    # the .length pseudo-field, compiler.go:238-245)
    ("dot_length_string_err", "name.length == 4", '{"name": "John"}', False),
    ("dot_length_object_key", "box.length == 7", '{"box": {"length": 7}}', True),

    # --- string ops on missing/nil ---
    ("contains_missing", "name CONTAINS 'x'", '{}', False),
    ("starts_with_ok", "filename STARTS_WITH 'report'", '{"filename": "report_2023.pdf"}', True),
    ("ends_with_ok", "filename ENDS_WITH '.pdf'", '{"filename": "report_2023.pdf"}', True),

    # --- hex / float / exponent literals (lexer.go:254-293) ---
    ("hex_literal", "code == 0xFF", '{"code": 255}', True),
    ("exponent_literal", "val > 1e2", '{"val": 150}', True),
    ("float_literal", "val == 0.5", '{"val": 0.5}', True),

    # --- OR short-circuit (compiler.go:188-199) ---
    ("or_short_circuit_left_true", "a == 1 OR missing > 5", '{"a": 1}', True),
    ("or_error_left", "missing > 5 OR a == 1", '{"a": 1}', False),
    ("and_error_right", "a == 1 AND missing > 5", '{"a": 1}', False),

    # --- ALL superset ---
    ("all_function", "ALL(scores[*] s >= 60)", '{"scores": [{"s": 75}, {"s": 80}]}', True),
    ("all_function_false", "ALL(scores[*] s >= 80)", '{"scores": [{"s": 75}, {"s": 80}]}', False),
]


@pytest.fixture(scope="module")
def truth_df(spark):
    rows = [(i, c[1], c[2], c[3]) for i, c in enumerate(CASES)]
    return spark.createDataFrame(rows, "case_id INT, query STRING, metadata STRING, expected BOOLEAN").cache()


def test_conformance_table(spark):
    # Build one DataFrame per metadata doc and evaluate each query as a
    # compiled Column — batch them to keep the test fast.
    rows = [(i, c[2]) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(rows, "case_id INT, metadata STRING")
    cols = []
    for i, (name, query, _, _) in enumerate(CASES):
        cols.append(
            F.when(F.col("case_id") == i, compile_filter(query, "metadata")).alias(f"c{i}")
        )
    out = df.select("case_id", *cols).collect()
    failures = []
    for row in out:
        i = row["case_id"]
        name, query, data, expected = CASES[i]
        got = row[f"c{i}"]
        if got != expected:
            failures.append(f"{name}: query={query!r} data={data!r} expected={expected} got={got}")
    assert not failures, "\n".join(failures)


def test_array_eq_number_canonicalization(spark):
    """Pins compiler._array_eq number handling: variant canonical text
    folds lexical variants (1.0→1, 2.50→2.5), so [1] == [1.0] matches
    Go's float64 DeepEqual. The one documented deviation: scientific-
    notation integers stay double ([1e2] renders 100.0) and compare
    unequal to [100]."""
    df = spark.createDataFrame(
        [(1, '{"a": [1], "b": [1.0], "t": [2.5], "u": [2.50], '
             '"e": [1e2], "h": [100], "x": 1, "y": 1.0}')],
        "id INT, metadata STRING",
    )

    def ev(q):
        return df.select(compile_filter(q, "metadata")).collect()[0][0]

    assert ev("a == b") is True     # [1] == [1.0] like Go
    assert ev("t == u") is True     # trailing zeros folded
    assert ev("x == y") is True     # scalars numeric
    assert ev("e == h") is False    # documented deviation: 1e2 vs 100


def test_where_filter_hoisted_path_matches(spark):
    """The hoisted (column-materialized) evaluation path of
    where_filter must agree with compile_filter on every conformance
    case — same truth table, different physical plan."""
    from syzgydb_spark.query.compiler import where_filter

    rows = [(i, c[2]) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(rows, "case_id INT, metadata STRING").cache()
    df.count()
    failures = []
    for i, (name, query, data, expected) in enumerate(CASES):
        survived = where_filter(df.where(F.col("case_id") == i), query).count() == 1
        if survived != expected:
            failures.append(f"{name}: query={query!r} expected={expected} got={survived}")
    assert not failures, "\n".join(failures)


PARSER_CASES = [
    # canonical AST strings, style of the reference parser tests
    # (parser_test.go:8-70)
    ("age >= 18 AND status == 'active'", "AND(>=(age, 18), ==(status, 'active'))"),
    ("a OR b AND c", "OR(a, AND(b, c))"),
    ("NOT a == true", "==(NOT(a), true)"),   # NOT binds tighter than cmp
    ("status IN ['a', 'b']", "IN(status, ['a', 'b'])"),
    ("status NOT IN [1, 2]", "NOT IN(status, [1, 2])"),
    ("a.b[0].c EXISTS", "EXISTS(a.b[0].c)"),
    ("x DOES NOT EXIST", "DOES NOT EXIST(x)"),
    ("LENGTH(tags) > 3", ">(LENGTH(tags), 3)"),
    ("name CONTAINS 'x' OR name STARTS_WITH 'y'",
     "OR(CONTAINS(name, 'x'), STARTS_WITH(name, 'y'))"),
    ("(a == 1 OR b == 2) AND c == 3", "AND(OR(==(a, 1), ==(b, 2)), ==(c, 3))"),
    ("price == 0x1F", "==(price, 31)"),
    ("v == 1.5e2", "==(v, 150)"),
]


@pytest.mark.parametrize("query,expected", PARSER_CASES)
def test_parser_ast(query, expected):
    assert ast_repr(parse(query)) == expected


def test_parser_roundtrip_property():
    """Hypothesis round-trip: random AST → fully-parenthesized query
    text → parse → identical AST. Exercises the lexer (string escapes,
    float repr incl. exponents, keywords) and every grammar production
    except ANY/ALL (superset, covered by its own tests)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from syzgydb_spark.query import parser as P

    names = st.from_regex(r"[a-z_][a-z0-9_]{0,6}", fullmatch=True).filter(
        lambda s: s not in ("true", "false", "null")
    )
    # lexer has no unary minus (reference parity: lexer.go readNumber);
    # '-' only appears inside exponents, which repr() may emit
    floats = st.floats(min_value=0, allow_nan=False, allow_infinity=False)
    strings = st.text(
        alphabet=st.characters(
            codec="ascii", min_codepoint=32, max_codepoint=126
        ),
        max_size=12,
    )
    scalars = st.one_of(floats, strings, st.booleans(), st.none())

    idents = st.builds(
        lambda first, rest: P.Ident((("field", first),) + tuple(rest)),
        names,
        st.lists(
            st.one_of(
                names.map(lambda n: ("field", n)),
                st.integers(min_value=0, max_value=9).map(lambda i: ("index", i)),
            ),
            max_size=3,
        ),
    )
    operands = st.one_of(
        idents,
        scalars.map(P.Lit),
        names.map(P.Param),
        st.deferred(lambda: st.builds(P.Length, operands)),
    )
    cmp_ops = st.sampled_from(
        ["==", "!=", ">", ">=", "<", "<=",
         "CONTAINS", "STARTS_WITH", "ENDS_WITH", "MATCHES"]
    )
    leaves = st.one_of(
        st.builds(lambda o, l, r: P.BinOp(o, l, r), cmp_ops, operands, operands),
        st.builds(
            lambda e, items, neg: P.In(e, P.ArrayLit(tuple(P.Lit(i) for i in items)), neg),
            operands,
            st.lists(scalars, min_size=1, max_size=4),
            st.booleans(),
        ),
        st.builds(P.Exists, idents, st.booleans()),
    )
    exprs = st.recursive(
        leaves,
        lambda children: st.one_of(
            st.builds(lambda l, r: P.BinOp("AND", l, r), children, children),
            st.builds(lambda l, r: P.BinOp("OR", l, r), children, children),
            st.builds(P.Not, children),
        ),
        max_leaves=8,
    )

    def render(node):
        if isinstance(node, P.Lit):
            v = node.value
            if v is None:
                return "null"
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, str):
                return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
            return repr(v)
        if isinstance(node, P.Ident):
            out = ""
            for seg in node.segments:
                if seg[0] == "field":
                    out = f"{out}.{seg[1]}" if out else seg[1]
                else:
                    out += f"[{seg[1]}]"
            return out
        if isinstance(node, P.Param):
            return f":{node.name}"
        if isinstance(node, P.Length):
            return f"LENGTH({render(node.expr)})"
        if isinstance(node, P.BinOp):
            if node.op in ("AND", "OR"):
                return f"({render(node.left)} {node.op} {render(node.right)})"
            return f"{render(node.left)} {node.op} {render(node.right)}"
        if isinstance(node, P.Not):
            return f"NOT ({render(node.expr)})"
        if isinstance(node, P.In):
            items = ", ".join(render(i) for i in node.array.items)
            kw = "NOT IN" if node.negated else "IN"
            return f"{render(node.expr)} {kw} [{items}]"
        if isinstance(node, P.Exists):
            kw = "DOES NOT EXIST" if node.negated else "EXISTS"
            return f"{render(node.expr)} {kw}"
        raise AssertionError(type(node))

    def normalize(node):
        """Parsing normalizes numbers to float; the generator already
        emits floats, so the only normalization is int indexes."""
        return node

    @settings(max_examples=300, deadline=None)
    @given(exprs)
    def check(node):
        text = render(node)
        assert parse(text) == normalize(node), text

    check()


def test_parse_errors():
    from syzgydb_spark.query.parser import ParseError
    from syzgydb_spark.query.lexer import LexError
    for bad in ["age >", "== 5", "a IN 5", "(a == 1", "a == 'unterminated", "a @ b"]:
        with pytest.raises((ParseError, LexError)):
            parse(bad)


def test_any_all_element_scope_shadows_hoisted_root(spark):
    """Hoisted-path regression: an element-scoped ident inside ANY/ALL
    that shares a root path's shape must bind to the lambda element,
    not the hoisted root column; hoisted and unhoisted paths agree."""
    import json as _json

    from syzgydb_spark.query.compiler import compile_filter, where_filter

    rows = [
        (1, _json.dumps({"a": 0, "items": [{"a": 9}]})),
        (2, _json.dumps({"a": 9, "items": [{"a": 0}]})),
    ]
    df = spark.createDataFrame(rows, "id LONG, metadata STRING")
    expr = "a == 1 OR ANY(items[*] a > 5)"
    hoisted = sorted(r["id"] for r in where_filter(df, expr).collect())
    plain = sorted(
        r["id"] for r in df.where(compile_filter(expr, "metadata")).collect()
    )
    assert hoisted == plain == [1]


def test_mid_path_star_raises_compile_error_on_hoisted_path(spark):
    import json as _json

    import pytest as _pytest

    from syzgydb_spark.query.compiler import CompileError, where_filter

    df = spark.createDataFrame(
        [(1, _json.dumps({"items": [{"a": [1]}]}))], "id LONG, metadata STRING"
    )
    with _pytest.raises(CompileError, match="ANY/ALL"):
        where_filter(df, "ANY(items[*].a[*] x == 1)").collect()


def test_float_index_rounds_half_away_from_zero(spark):
    """Reference parity: Go math.Round — a[0.5] is element 1, not
    banker's-rounded element 0."""
    import json as _json

    from syzgydb_spark.query.compiler import where_filter

    df = spark.createDataFrame(
        [(1, _json.dumps({"a": ["zero", "one", "two", "three"]}))],
        "id LONG, metadata STRING",
    )
    assert where_filter(df, "a[0.5] == 'one'").count() == 1
    assert where_filter(df, "a[2.5] == 'three'").count() == 1
