"""Recursive-descent parser for the filter language.

Grammar (reference parser.go:124-515; see SURVEY.md §2.2):

    Or      := And (OR And)*
    And     := Cmp (AND Cmp)*
    Cmp     := Not (cmpOp Not)?          -- non-associative comparison
    Not     := NOT? Postfix
    Postfix := Primary (IN array | NOT IN array | EXISTS | DOES NOT EXIST)?
    Primary := ident-path | literal | :param | '(' Or ')' | '[' array ']'
             | LENGTH '(' Or ')' | ANY '(' arrayExpr cond ')' | ALL '(' ... ')'
    ident-path := IDENT ('.' IDENT | '[' NUMBER ']' | '[*]')*

cmpOp ∈ { == != > >= < <= CONTAINS STARTS_WITH ENDS_WITH MATCHES }.
ANY/ALL take an array expression followed by a condition evaluated
against each element (reference compiler.go:107-157; dead grammar at
parser.go:278-326 — implemented here as a documented superset).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from syzgydb_spark.query.lexer import Token, tokenize


class ParseError(ValueError):
    pass


# ---- AST -------------------------------------------------------------

@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class Lit(Node):
    value: object  # float | str | bool | None


@dataclass(frozen=True)
class ArrayLit(Node):
    items: tuple


@dataclass(frozen=True)
class Ident(Node):
    # segments: ("field", name) | ("index", int) | ("star",)
    segments: tuple


@dataclass(frozen=True)
class Param(Node):
    name: str


@dataclass(frozen=True)
class BinOp(Node):
    op: str
    left: Node
    right: Node


@dataclass(frozen=True)
class Not(Node):
    expr: Node


@dataclass(frozen=True)
class In(Node):
    expr: Node
    array: Node
    negated: bool = False


@dataclass(frozen=True)
class Exists(Node):
    expr: Node
    negated: bool = False


@dataclass(frozen=True)
class Length(Node):
    expr: Node


@dataclass(frozen=True)
class AnyAll(Node):
    kind: str  # "ANY" | "ALL"
    array: Node
    cond: Node


_CMP_OPS = {"==", "!=", ">", ">=", "<", "<="}
_CMP_KEYWORDS = {"CONTAINS", "STARTS_WITH", "ENDS_WITH", "MATCHES"}


class Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    # -- helpers --
    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, value=None) -> Token | None:
        t = self.peek()
        if t.kind == kind and (value is None or t.value == value):
            return self.next()
        return None

    def expect(self, kind: str, value=None) -> Token:
        t = self.accept(kind, value)
        if t is None:
            raise ParseError(f"expected {value or kind}, got {self.peek()}")
        return t

    # -- grammar --
    def parse(self) -> Node:
        node = self.parse_or()
        if self.peek().kind != "EOF":
            raise ParseError(f"unexpected trailing token {self.peek()}")
        return node

    def parse_or(self) -> Node:
        node = self.parse_and()
        while self.accept("KEYWORD", "OR"):
            node = BinOp("OR", node, self.parse_and())
        return node

    def parse_and(self) -> Node:
        node = self.parse_cmp()
        while self.accept("KEYWORD", "AND"):
            node = BinOp("AND", node, self.parse_cmp())
        return node

    def parse_cmp(self) -> Node:
        left = self.parse_not()
        t = self.peek()
        if t.kind == "OP" and t.value in _CMP_OPS:
            self.next()
            return BinOp(t.value, left, self.parse_not())
        if t.kind == "KEYWORD" and t.value in _CMP_KEYWORDS:
            self.next()
            return BinOp(t.value, left, self.parse_not())
        return left

    def parse_not(self) -> Node:
        if self.peek().kind == "KEYWORD" and self.peek().value == "NOT":
            # lookahead: `NOT IN` is a postfix, handled inside parse_postfix;
            # a prefix NOT is only valid when not directly followed by IN
            nxt = self.toks[self.i + 1]
            if not (nxt.kind == "KEYWORD" and nxt.value == "IN"):
                self.next()
                return Not(self.parse_not())
        return self.parse_postfix()

    def parse_postfix(self) -> Node:
        node = self.parse_primary()
        t = self.peek()
        if t.kind == "KEYWORD":
            if t.value == "IN":
                self.next()
                return In(node, self.parse_array_literal())
            if t.value == "NOT":
                nxt = self.toks[self.i + 1]
                if nxt.kind == "KEYWORD" and nxt.value == "IN":
                    self.next()
                    self.next()
                    return In(node, self.parse_array_literal(), negated=True)
            if t.value == "EXISTS":
                self.next()
                return Exists(node)
            if t.value == "DOES NOT EXIST":
                self.next()
                return Exists(node, negated=True)
        return node

    def parse_primary(self) -> Node:
        t = self.peek()
        if t.kind in ("NUMBER", "STRING", "BOOL", "NULL"):
            self.next()
            return Lit(t.value)
        if t.kind == "PARAM":
            self.next()
            return Param(t.value)
        if t.kind == "OP" and t.value == "(":
            self.next()
            node = self.parse_or()
            self.expect("OP", ")")
            return node
        if t.kind == "OP" and t.value == "[":
            return self.parse_array_literal()
        if t.kind == "KEYWORD" and t.value == "LENGTH":
            self.next()
            self.expect("OP", "(")
            inner = self.parse_or()
            self.expect("OP", ")")
            return Length(inner)
        if t.kind == "KEYWORD" and t.value in ("ANY", "ALL"):
            kind = t.value
            self.next()
            self.expect("OP", "(")
            array = self.parse_array_expr()
            cond = self.parse_or()
            self.expect("OP", ")")
            return AnyAll(kind, array, cond)
        if t.kind == "IDENT":
            return self.parse_ident_path()
        raise ParseError(f"unexpected token {t}")

    def parse_array_expr(self) -> Node:
        node = self.parse_ident_path()
        return node

    def parse_ident_path(self) -> Node:
        t = self.expect("IDENT")
        segs: list[tuple] = [("field", t.value)]
        while True:
            p = self.peek()
            if p.kind == "OP" and p.value == ".":
                self.next()
                name = self.expect("IDENT")
                segs.append(("field", name.value))
            elif p.kind == "OP" and p.value == "[*]":
                self.next()
                segs.append(("star",))
            elif p.kind == "OP" and p.value == "[":
                self.next()
                idx = self.expect("NUMBER")
                self.expect("OP", "]")
                # float index rounded HALF AWAY FROM ZERO — the
                # reference uses Go math.Round (compiler.go:246-262);
                # Python's round() is banker's (a[0.5] would hit
                # element 0 instead of 1)
                v = float(idx.value)
                half_away = int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)
                segs.append(("index", half_away))
            else:
                break
        return Ident(tuple(segs))

    def parse_array_literal(self) -> Node:
        self.expect("OP", "[")
        items: list = []
        if not self.accept("OP", "]"):
            while True:
                t = self.peek()
                if t.kind in ("NUMBER", "STRING", "BOOL", "NULL"):
                    self.next()
                    items.append(Lit(t.value))
                else:
                    raise ParseError(f"array literals allow scalar literals only, got {t}")
                if self.accept("OP", "]"):
                    break
                self.expect("OP", ",")
        return ArrayLit(tuple(items))


def parse(text: str) -> Node:
    return Parser(tokenize(text)).parse()


def ast_repr(node: Node) -> str:
    """Canonical AST string, same style as the reference's parser tests
    (parser_test.go:8-70): ``AND(>=(age, 18), ==(status, 'active'))``."""
    if isinstance(node, Lit):
        if isinstance(node.value, str):
            return f"'{node.value}'"
        if node.value is None:
            return "null"
        if isinstance(node.value, bool):
            return "true" if node.value else "false"
        v = node.value
        return str(int(v)) if float(v).is_integer() else str(v)
    if isinstance(node, ArrayLit):
        return "[" + ", ".join(ast_repr(i) for i in node.items) + "]"
    if isinstance(node, Ident):
        out = ""
        for seg in node.segments:
            if seg[0] == "field":
                out = f"{out}.{seg[1]}" if out else seg[1]
            elif seg[0] == "index":
                out += f"[{seg[1]}]"
            else:
                out += "[*]"
        return out
    if isinstance(node, Param):
        return f":{node.name}"
    if isinstance(node, BinOp):
        return f"{node.op}({ast_repr(node.left)}, {ast_repr(node.right)})"
    if isinstance(node, Not):
        return f"NOT({ast_repr(node.expr)})"
    if isinstance(node, In):
        op = "NOT IN" if node.negated else "IN"
        return f"{op}({ast_repr(node.expr)}, {ast_repr(node.array)})"
    if isinstance(node, Exists):
        op = "DOES NOT EXIST" if node.negated else "EXISTS"
        return f"{op}({ast_repr(node.expr)})"
    if isinstance(node, Length):
        return f"LENGTH({ast_repr(node.expr)})"
    if isinstance(node, AnyAll):
        return f"{node.kind}({ast_repr(node.array)}, {ast_repr(node.cond)})"
    raise TypeError(f"unknown node {node!r}")
