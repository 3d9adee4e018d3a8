"""Lexer for the filter expression language.

Token surface mirrors the reference lexer (/root/reference/query/lexer.go:
84-347): uppercase keywords (``AND OR NOT IN EXISTS CONTAINS STARTS_WITH
ENDS_WITH MATCHES LENGTH ANY ALL``), lowercase ``true/false/null``, the
three-word keyword ``DOES NOT EXIST`` (lexer.go:169-195), single/double
quoted strings with escapes, decimal/float/exponent/hex numbers
(lexer.go:254-293), ``:name`` parameters, and the punctuation
``== != >= <= > < ( ) [ ] , . [*]``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "AND", "OR", "NOT", "IN", "EXISTS", "DOES NOT EXIST",
    "CONTAINS", "STARTS_WITH", "ENDS_WITH", "MATCHES", "LENGTH",
    "ANY", "ALL",
}

_BOOL_NULL = {"true": ("BOOL", True), "false": ("BOOL", False), "null": ("NULL", None)}


@dataclass(frozen=True)
class Token:
    kind: str       # KEYWORD, IDENT, STRING, NUMBER, BOOL, NULL, OP, PARAM, EOF
    value: object
    pos: int

    def __repr__(self) -> str:  # compact for error messages
        return f"{self.kind}({self.value!r})"


class LexError(ValueError):
    pass


_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_HEX_RE = re.compile(r"0[xX][0-9a-fA-F]+")
_NUM_RE = re.compile(r"(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?")
_WORD_RE = re.compile(r"[A-Za-z_]+")

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"', "0": "\0", "b": "\b", "f": "\f"}


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
            continue
        start = i
        if c in "'\"":
            quote = c
            i += 1
            buf = []
            while i < n and text[i] != quote:
                if text[i] == "\\" and i + 1 < n:
                    buf.append(_ESCAPES.get(text[i + 1], text[i + 1]))
                    i += 2
                else:
                    buf.append(text[i])
                    i += 1
            if i >= n:
                raise LexError(f"unterminated string at {start}")
            i += 1
            out.append(Token("STRING", "".join(buf), start))
            continue
        m = _HEX_RE.match(text, i)
        if m:
            out.append(Token("NUMBER", float(int(m.group(0), 16)), start))
            i = m.end()
            continue
        if c.isdigit() or (c == "." and i + 1 < n and text[i + 1].isdigit()):
            m = _NUM_RE.match(text, i)
            out.append(Token("NUMBER", float(m.group(0)), start))
            i = m.end()
            continue
        m = _IDENT_RE.match(text, i)
        if m:
            word = m.group(0)
            i = m.end()
            # three-word keyword backtrack (lexer.go:169-195)
            if word == "DOES":
                rest = text[i:]
                m2 = re.match(r"\s+NOT\s+EXIST\b", rest)
                if m2:
                    i += m2.end()
                    out.append(Token("KEYWORD", "DOES NOT EXIST", start))
                    continue
            if word in KEYWORDS:
                out.append(Token("KEYWORD", word, start))
            elif word in _BOOL_NULL:
                kind, val = _BOOL_NULL[word]
                out.append(Token(kind, val, start))
            else:
                out.append(Token("IDENT", word, start))
            continue
        if c == ":":
            m = _IDENT_RE.match(text, i + 1)
            if not m:
                raise LexError(f"expected parameter name after ':' at {i}")
            out.append(Token("PARAM", m.group(0), start))
            i = m.end()
            continue
        two = text[i:i + 2]
        if two in ("==", "!=", ">=", "<=", "[*"):
            if two == "[*":
                if text[i:i + 3] == "[*]":
                    out.append(Token("OP", "[*]", start))
                    i += 3
                    continue
                raise LexError(f"expected '[*]' at {i}")
            out.append(Token("OP", two, start))
            i += 2
            continue
        if c in "><()[],.":
            out.append(Token("OP", c, start))
            i += 1
            continue
        raise LexError(f"unexpected character {c!r} at {i}")
    out.append(Token("EOF", None, n))
    return out
