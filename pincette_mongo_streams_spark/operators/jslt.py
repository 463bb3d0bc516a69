"""Native JSLT-subset compiler: JSLT scripts -> Spark Column programs.

The reference runs full JSLT on the JVM (Jslt.java:19-36, the Schibsted
engine).  No Python JSLT runtime exists, so this module compiles the
practically-used subset straight to Catalyst expressions — keeping
codegen, pushdown and vectorization — and rejects the rest loudly
(script.py falls back to its documented JVM-only boundary).

Supported (grammar of jslt.schibsted.com, subset):

- literals: numbers, strings, ``true``/``false``/``null``, arrays
  ``[...]``, objects ``{"k": <expr>, ...}``
- dot paths: ``.``, ``.foo``, ``.foo.bar`` (absent paths -> null, as in
  JSLT)
- the object spread ``* : .`` (copy the rest of the input through)
- operators: ``+ - * /``, comparisons ``== != < <= > >=``, boolean
  ``and`` / ``or``, parentheses.  ``+`` concatenates when either side is
  a string (JSLT semantics), adds otherwise — decided from the input
  schema / literal types.
- ``if (<expr>) <expr> else <expr>`` (missing else -> null)
- ``let name = <expr>`` bindings referenced as ``$name``
- builtins: size, not, string, number, round, floor, ceiling,
  lowercase, uppercase, trim, contains, split, join, test
- ``//`` line comments

Top level must be an object: with ``* : .`` it behaves like
``$addFields`` (transform-in-place), without it like a compute-only
``$project`` (the output has exactly the template's keys).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<op>==|!=|<=|>=|\*:|[-+*/<>(){}\[\],:.$=])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.X,
)


def tokenize(src: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise JsltUnsupported(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


class JsltUnsupported(Exception):
    """Script uses JSLT beyond the compiled subset."""


# ---------------------------------------------------------------- AST

@dataclass
class Lit:
    value: Any


@dataclass
class Path:
    parts: list[str]  # [] = the whole input document


@dataclass
class Var:
    name: str


@dataclass
class Bin:
    op: str
    left: Any
    right: Any


@dataclass
class If:
    cond: Any
    then: Any
    other: Any


@dataclass
class Call:
    name: str
    args: list[Any]


@dataclass
class Arr:
    items: list[Any]


@dataclass
class Obj:
    pairs: list[tuple[str, Any]]
    spread: bool


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

    def expect(self, text: str) -> None:
        kind, val = self.next()
        if val != text:
            raise JsltUnsupported(f"expected {text!r}, got {val!r}")

    # let bindings then the body expression
    def parse_script(self) -> tuple[dict[str, Any], Any]:
        lets: dict[str, Any] = {}
        while self.peek() == ("ident", "let"):
            self.next()
            kind, name = self.next()
            if kind != "ident":
                raise JsltUnsupported("let needs an identifier")
            self.expect("=")
            lets[name] = self.parse_expr()
        body = self.parse_expr()
        if self.peek()[0] != "eof":
            raise JsltUnsupported(f"trailing input at {self.peek()[1]!r}")
        return lets, body

    def parse_expr(self) -> Any:
        return self.parse_or()

    def parse_or(self) -> Any:
        node = self.parse_and()
        while self.peek() == ("ident", "or"):
            self.next()
            node = Bin("or", node, self.parse_and())
        return node

    def parse_and(self) -> Any:
        node = self.parse_cmp()
        while self.peek() == ("ident", "and"):
            self.next()
            node = Bin("and", node, self.parse_cmp())
        return node

    def parse_cmp(self) -> Any:
        node = self.parse_add()
        if self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            node = Bin(op, node, self.parse_add())
        return node

    def parse_add(self) -> Any:
        node = self.parse_mul()
        while True:
            kind, val = self.peek()
            if val in ("+", "-"):
                op = self.next()[1]
                node = Bin(op, node, self.parse_mul())
                continue
            # unspaced subtraction: `.score-1` lexes the right side as the
            # negative number -1 (JSLT parses this as subtraction)
            if kind == "number" and val.startswith("-"):
                self.next()
                lit = Lit(float(val[1:]) if any(c in val for c in ".eE")
                          else int(val[1:]))
                node = Bin("-", node, lit)
                continue
            return node

    def parse_mul(self) -> Any:
        node = self.parse_unary()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            node = Bin(op, node, self.parse_unary())
        return node

    def parse_unary(self) -> Any:
        if self.peek()[1] == "-":
            self.next()
            return Bin("-", Lit(0), self.parse_primary())
        return self.parse_primary()

    def parse_primary(self) -> Any:
        kind, val = self.peek()
        if val == "(":
            self.next()
            node = self.parse_expr()
            self.expect(")")
            return node
        if val == ".":
            return self.parse_path()
        if val == "$":
            self.next()
            k, name = self.next()
            if k != "ident":
                raise JsltUnsupported("$ needs a variable name")
            return Var(name)
        if val == "[":
            self.next()
            items = []
            while self.peek()[1] != "]":
                items.append(self.parse_expr())
                if self.peek()[1] == ",":
                    self.next()
            self.expect("]")
            return Arr(items)
        if val == "{":
            return self.parse_object()
        if kind == "string":
            self.next()
            return Lit(_unquote(val))
        if kind == "number":
            self.next()
            return Lit(float(val) if any(c in val for c in ".eE") else int(val))
        if kind == "ident":
            if val == "if":
                self.next()
                self.expect("(")
                cond = self.parse_expr()
                self.expect(")")
                then = self.parse_expr()
                other = None
                if self.peek() == ("ident", "else"):
                    self.next()
                    other = self.parse_expr()
                return If(cond, then, other)
            if val in ("true", "false"):
                self.next()
                return Lit(val == "true")
            if val == "null":
                self.next()
                return Lit(None)
            # function call
            self.next()
            if self.peek()[1] != "(":
                raise JsltUnsupported(f"bare identifier {val!r}")
            self.next()
            args = []
            while self.peek()[1] != ")":
                args.append(self.parse_expr())
                if self.peek()[1] == ",":
                    self.next()
            self.expect(")")
            return Call(val, args)
        raise JsltUnsupported(f"unsupported token {val!r}")

    def parse_path(self) -> Path:
        parts: list[str] = []
        while self.peek()[1] == ".":
            self.next()
            kind, val = self.peek()
            if kind == "ident":
                self.next()
                parts.append(val)
            elif kind == "string":
                self.next()
                parts.append(_unquote(val))
            else:
                break  # bare `.`
        return Path(parts)

    def parse_object(self) -> Obj:
        self.expect("{")
        pairs: list[tuple[str, Any]] = []
        spread = False
        while self.peek()[1] != "}":
            kind, val = self.peek()
            if val == "*" or val == "*:":
                # `* : .` / `*: .`
                self.next()
                if val == "*":
                    self.expect(":")
                tail = self.parse_expr()
                if not (isinstance(tail, Path) and not tail.parts):
                    raise JsltUnsupported("object spread must be `* : .`")
                spread = True
            else:
                if kind == "string":
                    self.next()
                    key = _unquote(val)
                elif kind == "ident":
                    self.next()
                    key = val
                else:
                    raise JsltUnsupported(f"bad object key {val!r}")
                self.expect(":")
                pairs.append((key, self.parse_expr()))
            if self.peek()[1] == ",":
                self.next()
        self.expect("}")
        return Obj(pairs, spread)


def _unquote(s: str) -> str:
    import json

    return json.loads(s)


# ------------------------------------------------------------- compiler

_STRING = "string"
_NUMBER = "number"
_BOOL = "bool"
_ARRAY = "array"
_UNKNOWN = None


def _schema_hint(dt: T.DataType) -> Optional[str]:
    if isinstance(dt, T.StringType):
        return _STRING
    if isinstance(dt, (T.ArrayType,)):
        return _ARRAY
    if isinstance(dt, T.BooleanType):
        return _BOOL
    if isinstance(dt, T.NumericType):
        return _NUMBER
    return _UNKNOWN


class _Compiler:
    def __init__(self, schema: T.StructType, lets: dict[str, Any]):
        self.schema = schema
        self.lets = lets

    def field_type(self, parts: list[str]) -> Optional[T.DataType]:
        cur: T.DataType = self.schema
        for p in parts:
            if not isinstance(cur, T.StructType) or p not in cur.fieldNames():
                return None
            cur = cur[p].dataType
        return cur

    def compile(self, node: Any) -> tuple[Column, Optional[str]]:
        if isinstance(node, Lit):
            if node.value is None:
                return F.lit(None), _UNKNOWN
            hint = (_STRING if isinstance(node.value, str)
                    else _BOOL if isinstance(node.value, bool)
                    else _NUMBER)
            return F.lit(node.value), hint
        if isinstance(node, Path):
            if not node.parts:
                # whole-document value: engine-internal columns (`__key`
                # after $setKey, `__`-reserved) are not part of the user
                # document — mirror $send/$delay's doc construction
                return (F.struct(*[F.col(c) for c in self.schema.fieldNames()
                                   if not c.startswith("__")]),
                        _UNKNOWN)
            dt = self.field_type(node.parts)
            if dt is None:
                return F.lit(None), _UNKNOWN  # absent -> null (JSLT)
            return F.col(".".join(f"`{p}`" for p in node.parts)), _schema_hint(dt)
        if isinstance(node, Var):
            if node.name not in self.lets:
                raise JsltUnsupported(f"unbound variable ${node.name}")
            return self.compile(self.lets[node.name])
        if isinstance(node, Bin):
            return self.compile_bin(node)
        if isinstance(node, If):
            cond, _ = self.compile(node.cond)
            then, th = self.compile(node.then)
            if node.other is None:
                return F.when(cond, then), th
            other, oh = self.compile(node.other)
            return F.when(cond, then).otherwise(other), th or oh
        if isinstance(node, Arr):
            cols = [self.compile(i)[0] for i in node.items]
            return F.array(*cols), _ARRAY
        if isinstance(node, Obj):
            if node.spread:
                raise JsltUnsupported("nested objects cannot use `* : .`")
            return (F.struct(*[self.compile(v)[0].alias(k)
                               for k, v in node.pairs]), _UNKNOWN)
        if isinstance(node, Call):
            return self.compile_call(node)
        raise JsltUnsupported(f"unsupported node {node!r}")

    def compile_bin(self, node: Bin) -> tuple[Column, Optional[str]]:
        left, lh = self.compile(node.left)
        right, rh = self.compile(node.right)
        op = node.op
        if op == "+":
            if _STRING in (lh, rh):
                return F.concat(left.cast("string"), right.cast("string")), _STRING
            return left + right, _NUMBER
        if op == "-":
            return left - right, _NUMBER
        if op == "*":
            return left * right, _NUMBER
        if op == "/":
            return F.try_divide(left, right), _NUMBER
        if op == "==":
            return left == right, _BOOL
        if op == "!=":
            return left != right, _BOOL
        if op == "<":
            return left < right, _BOOL
        if op == "<=":
            return left <= right, _BOOL
        if op == ">":
            return left > right, _BOOL
        if op == ">=":
            return left >= right, _BOOL
        if op == "and":
            return left & right, _BOOL
        if op == "or":
            return left | right, _BOOL
        raise JsltUnsupported(f"operator {op!r}")

    def compile_call(self, node: Call) -> tuple[Column, Optional[str]]:
        args = [self.compile(a) for a in node.args]
        cols = [c for c, _ in args]
        name = node.name

        def need(n: int) -> None:
            if len(cols) != n:
                raise JsltUnsupported(f"{name}() takes {n} argument(s)")

        if name == "size":
            need(1)
            # JSLT size(): length of string, size of array/object
            return (F.length(cols[0]) if args[0][1] == _STRING
                    else F.size(cols[0])).cast("long"), _NUMBER
        if name == "not":
            need(1)
            return ~cols[0].cast("boolean"), _BOOL
        if name == "string":
            need(1)
            return cols[0].cast("string"), _STRING
        if name == "number":
            need(1)
            return cols[0].try_cast("double"), _NUMBER
        if name == "round":
            need(1)
            return F.round(cols[0]).cast("long"), _NUMBER
        if name == "floor":
            need(1)
            return F.floor(cols[0]).cast("long"), _NUMBER
        if name == "ceiling":
            need(1)
            return F.ceil(cols[0]).cast("long"), _NUMBER
        if name == "lowercase":
            need(1)
            return F.lower(cols[0]), _STRING
        if name == "uppercase":
            need(1)
            return F.upper(cols[0]), _STRING
        if name == "trim":
            need(1)
            return F.trim(cols[0]), _STRING
        if name == "contains":
            need(2)
            # JSLT: contains(element, sequence)
            if args[1][1] == _STRING:
                return cols[1].contains(cols[0].cast("string")), _BOOL
            return F.array_contains(cols[1], cols[0]), _BOOL
        if name == "split":
            need(2)
            return F.split(cols[0], _literal_str(node.args[1])), _ARRAY
        if name == "join":
            need(2)
            return F.array_join(cols[0], _literal_str(node.args[1])), _STRING
        if name == "test":
            need(2)
            return cols[0].rlike(_literal_str(node.args[1])), _BOOL
        raise JsltUnsupported(f"builtin {name!r}")


def _literal_str(node: Any) -> str:
    if isinstance(node, Lit) and isinstance(node.value, str):
        return node.value
    raise JsltUnsupported("this argument must be a string literal")


def compile_jslt(script: str, df: DataFrame):
    """Compile a JSLT script against ``df``'s schema.

    Returns ``(added, projected)``: exactly one is non-None —
    ``added`` (dict of name -> Column) for spread templates
    ($addFields semantics), ``projected`` (list of aliased Columns)
    for spread-less templates ($project-compute semantics).
    Raises JsltUnsupported outside the subset."""
    lets, body = _Parser(tokenize(script)).parse_script()
    if not isinstance(body, Obj):
        raise JsltUnsupported("top-level JSLT must be an object template")
    comp = _Compiler(df.schema, lets)
    cols = {k: comp.compile(v)[0] for k, v in body.pairs}
    if body.spread:
        return cols, None
    return None, [c.alias(k) for k, c in cols.items()]
