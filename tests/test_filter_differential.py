"""Differential filter-language testing: hundreds of randomly
generated (query, document) pairs evaluated by (a) the Spark Column
compiler and (b) a Python oracle that reimplements the reference's
evaluator semantics exactly (/root/reference/query/compiler.go —
getField nil-not-error, '.'-operator errors, DeepEqual, strict
comparisons, error-as-false). Divergence on any case is a bug in one
of them.

Deterministic seeds; one batched Spark job for all cases.
"""

import json
import random
import re

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.query import compile_filter
from syzgydb_spark.query.compiler import where_filter

# ------------------------- the Python oracle -------------------------


class GoError(Exception):
    pass


def _deep_eq(a, b):
    """reflect.DeepEqual over decoded JSON: type-strict (bool is not a
    number), nil == nil."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_deep_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_deep_eq(a[k], b[k]) for k in a)
    return False


def _is_num(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def oracle_eval(node, data):
    """Evaluate an AST node per Go semantics; raises GoError."""
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "ident":
        segments = node[1]
        cur = data
        for i, seg in enumerate(segments):
            if seg[0] == "field":
                if i == 0:
                    if not isinstance(cur, dict):
                        raise GoError("top-level access on non-map")
                    cur = cur.get(seg[1])  # nil, no error
                elif isinstance(cur, dict):
                    if seg[1] not in cur:
                        raise GoError(f"key {seg[1]} not found")
                    cur = cur[seg[1]]
                elif isinstance(cur, list) and seg[1] == "length":
                    cur = float(len(cur))
                else:
                    raise GoError("'.' on non-map")
            else:  # index
                if not isinstance(cur, list):
                    raise GoError("'[]' on non-array")
                idx = seg[1]
                cur = cur[idx] if 0 <= idx < len(cur) else None
        return cur
    if kind in ("and", "or"):
        l = oracle_eval(node[1], data)
        if kind == "or" and l is True:
            return True
        r = oracle_eval(node[2], data)
        if not isinstance(l, bool) or not isinstance(r, bool):
            raise GoError("boolean operands required")
        return (l and r) if kind == "and" else (l or r)
    if kind == "not":
        v = oracle_eval(node[1], data)
        if not isinstance(v, bool):
            raise GoError("NOT requires boolean")
        return not v
    if kind in ("==", "!="):
        l = oracle_eval(node[1], data)
        r = oracle_eval(node[2], data)
        eq = _deep_eq(l, r)
        return eq if kind == "==" else not eq
    if kind in ("<", "<=", ">", ">="):
        l = oracle_eval(node[1], data)
        r = oracle_eval(node[2], data)
        if _is_num(l) and _is_num(r):
            pass
        elif isinstance(l, str) and isinstance(r, str) and not isinstance(l, bool):
            pass
        else:
            raise GoError("unsupported comparison")
        import operator

        op = {"<": operator.lt, "<=": operator.le, ">": operator.gt, ">=": operator.ge}
        return op[kind](l, r)
    if kind in ("contains", "starts_with", "ends_with", "matches"):
        l = oracle_eval(node[1], data)
        r = oracle_eval(node[2], data)
        if not isinstance(l, str) or not isinstance(r, str):
            raise GoError("string operands required")
        if kind == "contains":
            return r in l
        if kind == "starts_with":
            return l.startswith(r)
        if kind == "ends_with":
            return l.endswith(r)
        return re.search(r, l) is not None
    if kind in ("in", "not_in"):
        l = oracle_eval(node[1], data)
        hit = any(_deep_eq(l, item) for item in node[2])
        return hit if kind == "in" else not hit
    if kind == "exists":
        try:
            oracle_eval(node[1], data)
            return True
        except GoError:
            return False
    if kind == "dne":
        segments = node[1][1]
        if len(segments) != 1:
            raise GoError("DNE needs identifier")
        if not isinstance(data, dict):
            return False
        return segments[0][1] not in data
    if kind == "length":
        v = oracle_eval(node[1], data)
        if isinstance(v, (str, list, dict)) and not isinstance(v, bool):
            return float(len(v))
        raise GoError("LENGTH unsupported type")
    raise AssertionError(kind)


def oracle_keep(node, data_json):
    try:
        data = json.loads(data_json, parse_int=float, parse_float=float)
    except ValueError:
        return False
    try:
        result = oracle_eval(node, data)
    except GoError:
        return False
    return result is True


# ----------------------- generators (seeded) -------------------------

KEYS = ["a", "b", "name", "tags", "user", "num", "flag", "maybe"]
STRINGS = ["x", "abc", "hello world", "report.pdf", ""]


def gen_value(rng, depth=0):
    choices = ["num", "str", "bool", "null"]
    if depth < 2:
        choices += ["arr", "obj"]
    kind = rng.choice(choices)
    if kind == "num":
        return rng.choice([0.0, 1.0, -3.5, 42.0, 100.0])
    if kind == "str":
        return rng.choice(STRINGS)
    if kind == "bool":
        return rng.choice([True, False])
    if kind == "null":
        return None
    if kind == "arr":
        return [gen_value(rng, depth + 2) for _ in range(rng.randint(0, 3))]
    return {k: gen_value(rng, depth + 1) for k in rng.sample(KEYS, rng.randint(1, 3))}


def gen_doc(rng):
    return {k: gen_value(rng) for k in rng.sample(KEYS, rng.randint(1, 5))}


def gen_path(rng):
    segs = [("field", rng.choice(KEYS))]
    for _ in range(rng.randint(0, 2)):
        if rng.random() < 0.5:
            segs.append(("field", rng.choice(KEYS + ["length"])))
        else:
            segs.append(("index", rng.randint(0, 3)))
    return tuple(segs)


def gen_literal(rng):
    return rng.choice([1.0, 42.0, "x", "abc", True, False, None, 0.0, "hello world"])


# Regex subset where Go RE2, Java regex (Spark regexp_like), and Python
# re.search all agree: literals, '.', '*', '+', '?', classes,
# alternation, anchors — no backreferences, no lookaround, no escapes.
_REGEX_ATOMS = ["a", "b", "x", "ab", "wor", "[abc]", "[a-z]", "."]


def gen_regex(rng):
    parts = []
    for _ in range(rng.randint(1, 3)):
        atom = rng.choice(_REGEX_ATOMS)
        if rng.random() < 0.4:
            atom += rng.choice(["*", "+", "?"])
        parts.append(atom)
    pat = "".join(parts)
    if rng.random() < 0.2:
        pat = pat + "|" + rng.choice(["x", "abc"])
    if rng.random() < 0.2:
        pat = "^" + pat
    if rng.random() < 0.2:
        pat = pat + "$"
    return pat


def gen_expr(rng, depth=0):
    if depth >= 3 or rng.random() < 0.35:
        kind = rng.choice(
            ["==", "!=", "<", ">", "<=", ">=", "contains", "starts_with",
             "ends_with", "matches", "in", "not_in", "exists", "dne",
             "length_cmp"]
        )
        path = ("ident", gen_path(rng))
        if kind in ("==", "!=", "<", ">", "<=", ">="):
            rhs = ("ident", gen_path(rng)) if rng.random() < 0.25 else ("lit", gen_literal(rng))
            return (kind, path, rhs)
        if kind in ("contains", "starts_with", "ends_with"):
            return (kind, path, ("lit", rng.choice(["x", "ab", "world", ""])))
        if kind == "matches":
            return ("matches", path, ("lit", gen_regex(rng)))
        if kind in ("in", "not_in"):
            items = [rng.choice([1.0, 42.0, "x", "abc"]) for _ in range(rng.randint(1, 3))]
            return (kind, path, items)
        if kind == "exists":
            return ("exists", path)
        if kind == "dne":
            return ("dne", ("ident", (("field", rng.choice(KEYS)),)))
        return (rng.choice(["==", ">"]), ("length", path), ("lit", rng.choice([0.0, 2.0, 3.0])))
    op = rng.choice(["and", "or", "not"])
    if op == "not":
        return ("not", gen_expr(rng, depth + 1))
    return (op, gen_expr(rng, depth + 1), gen_expr(rng, depth + 1))


def to_query(node) -> str:
    kind = node[0]
    if kind == "lit":
        v = node[1]
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        return repr(v)
    if kind == "ident":
        out = ""
        for seg in node[1]:
            if seg[0] == "field":
                out = f"{out}.{seg[1]}" if out else seg[1]
            else:
                out += f"[{seg[1]}]"
        return out
    if kind in ("and", "or"):
        return f"({to_query(node[1])} {kind.upper()} {to_query(node[2])})"
    if kind == "not":
        return f"NOT ({to_query(node[1])})"
    if kind in ("==", "!=", "<", "<=", ">", ">="):
        return f"{to_query(node[1])} {kind} {to_query(node[2])}"
    if kind in ("contains", "starts_with", "ends_with", "matches"):
        kw = {"contains": "CONTAINS", "starts_with": "STARTS_WITH",
              "ends_with": "ENDS_WITH", "matches": "MATCHES"}[kind]
        return f"{to_query(node[1])} {kw} {to_query(node[2])}"
    if kind in ("in", "not_in"):
        items = ", ".join(to_query(("lit", i)) for i in node[2])
        kw = "IN" if kind == "in" else "NOT IN"
        return f"{to_query(node[1])} {kw} [{items}]"
    if kind == "exists":
        return f"{to_query(node[1])} EXISTS"
    if kind == "dne":
        return f"{to_query(node[1])} DOES NOT EXIST"
    if kind == "length":
        return f"LENGTH({to_query(node[1])})"
    raise AssertionError(kind)


N_CASES = 100
CHUNK = 25  # cases per Spark job — Catalyst cost grows superlinearly
            # with plan width, so many narrow jobs beat one wide one


def test_differential_compiled(spark):
    rng = random.Random(20260813)
    cases = []
    for i in range(N_CASES):
        node = gen_expr(rng)
        doc = json.dumps(gen_doc(rng))
        cases.append((i, node, to_query(node), doc, oracle_keep(node, doc)))

    got = {}
    for start in range(0, N_CASES, CHUNK):
        chunk = cases[start:start + CHUNK]
        df = spark.createDataFrame(
            [(i, doc) for i, _, _, doc, _ in chunk], "case_id INT, metadata STRING"
        )
        cols = [
            F.when(F.col("case_id") == i, compile_filter(q, "metadata")).alias(f"c{i}")
            for i, _, q, _, _ in chunk
        ]
        for r in df.select("case_id", *cols).collect():
            got[r["case_id"]] = r[f"c{r['case_id']}"]

    failures = []
    for i, node, q, doc, want in cases:
        if got[i] != want:
            failures.append(f"case {i}: {q!r} on {doc!r}: oracle={want} spark={got[i]}")
    assert not failures, f"{len(failures)} divergences:\n" + "\n".join(failures[:10])
