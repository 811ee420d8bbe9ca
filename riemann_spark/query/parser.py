"""Hand-written recursive-descent parser for the riemann query language.

Grammar (reference ``resources/query.g4:8-42``, values ``:44-102``)::

    expr      := or
    or        := and ( 'or' and )*
    and       := unary ( 'and' unary )*
    unary     := 'not' unary | '(' expr ')' | simple
    simple    := 'tagged' string
               | 'true' | 'false' | 'nil' | 'null'
               | field op value
    op        := '=' '!=' '<' '>' '<=' '>=' '=~' '~='
    value     := long | bignum(42N) | float | string | true|false|nil|null
    field     := identifier (core field or custom attribute)

AST is s-expression-shaped tuples mirroring the reference's
normalized AST (``query.clj:64-113``), e.g.
``('and', ('=', 'host', 'a'), ('>', 'metric', 2))``.

The compile cache mirrors the reference's 64-entry LRU
(``query.clj:193-216``) via functools.lru_cache.
"""

from __future__ import annotations

import re
from functools import lru_cache


class QueryParseError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<float>[-+]?(?:\d+\.\d*|\.\d+)(?:[eE][-+]?\d+)?|[-+]?\d+[eE][-+]?\d+)
  | (?P<bignum>[-+]?\d+N)
  | (?P<int>[-+]?\d+)
  | (?P<op><=|>=|!=|=~|~=|=|<|>)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<word>[A-Za-z_][A-Za-z0-9_.\-]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "tagged", "true", "false", "nil", "null"}


def _tokenize(s: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise QueryParseError(f"bad character at {pos}: {s[pos:pos+10]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "word" and text in _KEYWORDS:
            kind = text
        tokens.append((kind, text))
    tokens.append(("eof", ""))
    return tokens


def _unescape(raw: str) -> str:
    # raw includes the surrounding quotes
    body = raw[1:-1]
    # the reference grammar's escape set (query_test.clj:40-41):
    # \b \t \n \f \r plus pass-through for \" and \\
    esc = {"n": "\n", "t": "\t", "b": "\b", "f": "\f", "r": "\r"}
    return re.sub(r"\\(.)", lambda m: esc.get(m.group(1), m.group(1)), body)


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> tuple[str, str]:
        t = self.next()
        if t[0] != kind:
            raise QueryParseError(f"expected {kind}, got {t}")
        return t

    # expr := or
    def parse(self):
        node = self.or_expr()
        self.expect("eof")
        return node

    def or_expr(self):
        parts = [self.and_expr()]
        while self.peek()[0] == "or":
            self.next()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else ("or", *parts)

    def and_expr(self):
        parts = [self.unary()]
        while self.peek()[0] == "and":
            self.next()
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else ("and", *parts)

    def unary(self):
        kind, _ = self.peek()
        if kind == "not":
            self.next()
            return ("not", self.unary())
        if kind == "lparen":
            self.next()
            node = self.or_expr()
            self.expect("rparen")
            return node
        return self.simple()

    def simple(self):
        kind, text = self.next()
        if kind == "tagged":
            vk, vt = self.next()
            if vk != "string":
                raise QueryParseError("tagged expects a string literal")
            return ("tagged", _unescape(vt))
        if kind == "true":
            return True
        if kind == "false":
            return False
        if kind in ("nil", "null"):
            return None
        if kind == "word":
            field = text
            opk, opt = self.next()
            if opk != "op":
                raise QueryParseError(f"expected comparison operator after field {field!r}, got {opt!r}")
            value = self.value()
            return (opt, field, value)
        raise QueryParseError(f"unexpected token {text!r}")

    def value(self):
        kind, text = self.next()
        if kind == "string":
            return _unescape(text)
        if kind == "int":
            return int(text)
        if kind == "bignum":
            return int(text[:-1])
        if kind == "float":
            return float(text)
        if kind == "true":
            return True
        if kind == "false":
            return False
        if kind in ("nil", "null"):
            return None
        raise QueryParseError(f"expected literal, got {text!r}")


@lru_cache(maxsize=64)
def parse(query: str):
    """Parse a riemann query string into a tuple AST (LRU-cached)."""
    return _Parser(_tokenize(query)).parse()
