"""Recursive-descent parser for the expr-lang subset used by the reference.

Grammar covers what the reference's filter/transform configs exercise
(reference: glassflow-api/internal/filter/json/filter_test.go:17-163,
transformer/json/transformation_test.go): literals, identifiers with
dot paths, array/map literals, indexing, member access, function calls,
unary ``- ! not``, binary ``^ * / % + -``, comparisons
``== != < <= > >= in matches contains startsWith endsWith``, boolean
``and/&& or/|| not``, and the ternary ``cond ? a : b`` plus ``??``
(nil-coalescing).

The output is a small AST consumed by :mod:`.translate`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

# ---------------------------------------------------------------- AST


@dataclass(frozen=True)
class Lit:
    value: Any  # int | float | str | bool | None


@dataclass(frozen=True)
class Ident:
    name: str  # may contain dots only when written as a.b (member chain folds into this)


@dataclass(frozen=True)
class Member:
    obj: "Node"
    attr: str


@dataclass(frozen=True)
class Index:
    obj: "Node"
    index: "Node"


@dataclass(frozen=True)
class Slice:
    obj: "Node"
    start: "Node | None"  # end-exclusive, Go-style (expr-lang a[1:3])
    stop: "Node | None"


@dataclass(frozen=True)
class Call:
    func: str
    args: tuple["Node", ...]


@dataclass(frozen=True)
class Unary:
    op: str  # '-', 'not'
    operand: "Node"


@dataclass(frozen=True)
class Binary:
    op: str  # '+','-','*','/','%','^','==','!=','<','<=','>','>=','and','or','in','not in','matches','contains','startsWith','endsWith','??'
    left: "Node"
    right: "Node"


@dataclass(frozen=True)
class Ternary:
    cond: "Node"
    then: "Node"
    other: "Node"


@dataclass(frozen=True)
class ArrayLit:
    items: tuple["Node", ...]


@dataclass(frozen=True)
class MapLit:
    items: tuple[tuple[str, "Node"], ...]


Node = Lit | Ident | Member | Index | Slice | Call | Unary | Binary | Ternary | ArrayLit | MapLit


class ExprSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------- lexer

_PUNCT = [
    "??", "==", "!=", "<=", ">=", "&&", "||",
    "(", ")", "[", "]", "{", "}", ",", ":", "?", ".",
    "+", "-", "*", "/", "%", "^", "<", ">", "!", "=",
]

_KEYWORDS = {"and", "or", "not", "in", "true", "false", "nil", "matches",
             "contains", "startsWith", "endsWith"}


@dataclass(frozen=True)
class _Tok:
    kind: str  # 'num' | 'str' | 'ident' | 'kw' | 'punct' | 'eof'
    text: str
    value: Any = None


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
            continue
        if c in "'\"":
            quote = c
            j = i + 1
            buf = []
            while j < n and src[j] != quote:
                if src[j] == "\\" and j + 1 < n:
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r"}.get(esc, esc))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise ExprSyntaxError(f"unterminated string at {i}: {src!r}")
            toks.append(_Tok("str", src[i:j + 1], "".join(buf)))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            is_float = False
            while j < n and (src[j].isdigit() or src[j] == "_"):
                j += 1
            if j < n and src[j] == "." and j + 1 < n and src[j + 1].isdigit():
                is_float = True
                j += 1
                while j < n and src[j].isdigit():
                    j += 1
            if j < n and src[j] in "eE":
                k = j + 1
                if k < n and src[k] in "+-":
                    k += 1
                if k < n and src[k].isdigit():
                    is_float = True
                    j = k
                    while j < n and src[j].isdigit():
                        j += 1
            text = src[i:j].replace("_", "")
            toks.append(_Tok("num", text, float(text) if is_float else int(text)))
            i = j
            continue
        if c.isalpha() or c == "_" or c == "@" or c == "$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_@$"):
                j += 1
            word = src[i:j]
            toks.append(_Tok("kw" if word in _KEYWORDS else "ident", word))
            i = j
            continue
        if c == "#":  # expr-lang lambda placeholder (filter(arr, # > 3))
            toks.append(_Tok("ident", "#"))
            i += 1
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(_Tok("punct", p))
                i += len(p)
                break
        else:
            raise ExprSyntaxError(f"unexpected character {c!r} at {i} in {src!r}")
    toks.append(_Tok("eof", ""))
    return toks


# ---------------------------------------------------------------- parser


class _Parser:
    def __init__(self, toks: list[_Tok], src: str):
        self.toks = toks
        self.pos = 0
        self.src = src

    def peek(self) -> _Tok:
        return self.toks[self.pos]

    def next(self) -> _Tok:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, text: str) -> _Tok:
        t = self.next()
        if t.text != text:
            raise ExprSyntaxError(f"expected {text!r}, got {t.text!r} in {self.src!r}")
        return t

    def at(self, *texts: str) -> bool:
        return self.peek().text in texts

    # precedence (low -> high):
    # ternary ?:  |  ??  |  or  |  and  |  not(unary)  |  comparison  |  +-  |  */%  |  ^  |  unary -  |  postfix

    def parse_expr(self) -> Node:
        node = self.parse_coalesce()
        if self.at("?"):
            self.next()
            then = self.parse_expr()
            self.expect(":")
            other = self.parse_expr()
            return Ternary(node, then, other)
        return node

    def parse_coalesce(self) -> Node:
        node = self.parse_or()
        while self.at("??"):
            self.next()
            node = Binary("??", node, self.parse_or())
        return node

    def parse_or(self) -> Node:
        node = self.parse_and()
        while self.at("or", "||"):
            self.next()
            node = Binary("or", node, self.parse_and())
        return node

    def parse_and(self) -> Node:
        node = self.parse_not()
        while self.at("and", "&&"):
            self.next()
            node = Binary("and", node, self.parse_not())
        return node

    def parse_not(self) -> Node:
        if self.at("not", "!"):
            self.next()
            return Unary("not", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> Node:
        node = self.parse_additive()
        while True:
            t = self.peek()
            if t.text in ("==", "!=", "<", "<=", ">", ">=", "matches",
                          "contains", "startsWith", "endsWith"):
                self.next()
                node = Binary(t.text, node, self.parse_additive())
            elif t.text == "in":
                self.next()
                node = Binary("in", node, self.parse_additive())
            elif t.text == "not" and self.toks[self.pos + 1].text == "in":
                self.next()
                self.next()
                node = Binary("not in", node, self.parse_additive())
            else:
                return node

    def parse_additive(self) -> Node:
        node = self.parse_multiplicative()
        while self.at("+", "-"):
            op = self.next().text
            node = Binary(op, node, self.parse_multiplicative())
        return node

    def parse_multiplicative(self) -> Node:
        node = self.parse_power()
        while self.at("*", "/", "%"):
            op = self.next().text
            node = Binary(op, node, self.parse_power())
        return node

    def parse_power(self) -> Node:
        node = self.parse_unary()
        if self.at("^"):  # right-associative
            self.next()
            return Binary("^", node, self.parse_power())
        return node

    def parse_unary(self) -> Node:
        if self.at("-"):
            self.next()
            return Unary("-", self.parse_unary())
        if self.at("+"):
            self.next()
            return self.parse_unary()
        return self.parse_postfix()

    def parse_postfix(self) -> Node:
        node = self.parse_primary()
        while True:
            if self.at("."):
                self.next()
                attr = self.next()
                if attr.kind not in ("ident", "kw"):
                    raise ExprSyntaxError(f"expected attribute after '.', got {attr.text!r}")
                # fold pure identifier chains: a.b.c stays a single dotted
                # name so the schema resolver can try the literal dotted
                # top-level key first (reference dual resolution,
                # glassflow-api/internal/schema_v2/validate.go:64-87)
                if isinstance(node, Ident):
                    node = Ident(node.name + "." + attr.text)
                else:
                    node = Member(node, attr.text)
            elif self.at("["):
                self.next()
                start = None if self.at(":") else self.parse_expr()
                if self.at(":"):
                    self.next()
                    stop = None if self.at("]") else self.parse_expr()
                    self.expect("]")
                    node = Slice(node, start, stop)
                else:
                    self.expect("]")
                    node = Index(node, start)
            else:
                return node

    def parse_primary(self) -> Node:
        t = self.next()
        if t.kind == "num" or t.kind == "str":
            return Lit(t.value)
        if t.text == "true":
            return Lit(True)
        if t.text == "false":
            return Lit(False)
        if t.text == "nil":
            return Lit(None)
        if t.text == "(":
            node = self.parse_expr()
            self.expect(")")
            return node
        if t.text == "[":
            items = []
            while not self.at("]"):
                items.append(self.parse_expr())
                if self.at(","):
                    self.next()
            self.expect("]")
            return ArrayLit(tuple(items))
        if t.text == "{":
            items = []
            while not self.at("}"):
                k = self.next()
                if k.kind not in ("ident", "str", "kw"):
                    raise ExprSyntaxError(f"bad map key {k.text!r}")
                key = k.value if k.kind == "str" else k.text
                self.expect(":")
                items.append((key, self.parse_expr()))
                if self.at(","):
                    self.next()
            self.expect("}")
            return MapLit(tuple(items))
        if t.kind == "ident":
            if self.at("("):
                self.next()
                args = []
                while not self.at(")"):
                    args.append(self.parse_expr())
                    if self.at(","):
                        self.next()
                self.expect(")")
                return Call(t.text, tuple(args))
            return Ident(t.text)
        raise ExprSyntaxError(f"unexpected token {t.text!r} in {self.src!r}")


def parse(src: str) -> Node:
    """Parse an expr-lang expression string into an AST."""
    p = _Parser(_tokenize(src), src)
    node = p.parse_expr()
    if p.peek().kind != "eof":
        raise ExprSyntaxError(f"trailing input at token {p.peek().text!r} in {src!r}")
    return node
