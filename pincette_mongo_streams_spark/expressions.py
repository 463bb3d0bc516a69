"""MongoDB aggregation-expression compiler: JSON expression -> pyspark Column.

The reference delegates expression evaluation to
``net.pincette.mongo.Expression.function(expr, features)`` (witnessed at
reference AddFields.java:8,82 and Pipeline.java:197-198); the contract is
MongoDB's public aggregation-expression semantics.  Here every construct
compiles to a native Catalyst ``Column`` so plans stay inside whole-stage
codegen and keep predicate pushdown / column pruning — the main engineering
constraint from SURVEY.md §4 (opaque UDFs would forfeit both).

Compilation is schema-directed: an :class:`ExprContext` optionally carries
the input DataFrame schema so that

- missing field paths compile to ``lit(None)`` (Mongo "missing" ~ null),
- ``$mergeObjects`` / ``$objectToArray`` / ``$type`` resolve struct layouts,
- date arithmetic detects timestamp operands.

Deliberate fixed-schema deviations (documented in README): per-row
``$$REMOVE`` degrades to null outside statically-resolvable positions;
``$isArray``/``$type`` are static per column, dynamic only for null.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Any, Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .paths import has_path, nested_col, path_type, split_path


class Remove:
    """Sentinel for ``$$REMOVE`` (reference Project.java:46-47,102-107)."""

    _instance: Optional["Remove"] = None

    def __new__(cls) -> "Remove":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance


REMOVE = Remove()


class ExprContext:
    """Compilation scope: schema, variable bindings, field-path resolver.

    ``resolver`` maps path parts to a Column; the default reads top-level
    DataFrame columns.  Sub-document scopes (``$redact`` recursion,
    ``$lookup`` sub-pipelines over foreign docs) install a resolver rooted
    at a struct column.
    """

    def __init__(
        self,
        schema: Optional[T.StructType] = None,
        variables: Optional[dict[str, Any]] = None,
        resolver: Optional[Callable[[list[str]], Column]] = None,
    ):
        self.schema = schema
        self.variables = dict(variables or {})
        self._resolver = resolver
        # compile-time CSE (r10): per-context memo of compiled
        # sub-expressions.  Column objects are immutable wrappers over
        # immutable Catalyst expression trees, so reusing one across
        # call sites is exactly what a hand-written program does with a
        # shared local variable — and each py4j round trip saved is
        # ~0.2-0.5 ms of plan-build floor (switch-heavy stages like
        # $bucket recompile the same path/branch expressions dozens of
        # times).  Scoping is per ExprContext instance: with_vars /
        # with_schema return fresh contexts, so a memo can never leak
        # across variable bindings or schemas.
        self._memo: dict[str, Any] = {}
        # extension operators (Features analog) may be non-deterministic
        # or stateful — once one resolves, stop adding memo entries
        # (existing built-in-only entries stay valid).  The flag lives in
        # a one-element list SHARED with every context derived via
        # with_vars/with_schema: $let/$map/$filter/$reduce compile their
        # bodies in child contexts, and a nested extension op must poison
        # the memo of the ENCLOSING expression too (the parent memoizes
        # after the child compiles, so depth-first order makes the shared
        # cell sufficient).
        self._unsafe_cell: list[bool] = [False]

    @property
    def _memo_unsafe(self) -> bool:
        return self._unsafe_cell[0]

    @_memo_unsafe.setter
    def _memo_unsafe(self, value: bool) -> None:
        self._unsafe_cell[0] = value

    def _derive(self, schema: Optional[T.StructType], variables: dict[str, Any]) -> "ExprContext":
        child = ExprContext(schema, variables, self._resolver)
        child._unsafe_cell = self._unsafe_cell
        return child

    def with_vars(self, **vars: Any) -> "ExprContext":
        merged = dict(self.variables)
        merged.update(vars)
        return self._derive(self.schema, merged)

    def with_schema(self, schema: Optional[T.StructType]) -> "ExprContext":
        return self._derive(schema, self.variables)

    def resolve(self, parts: list[str]) -> Column:
        if self._resolver is not None:
            return self._resolver(parts)
        if self.schema is not None and not has_path(self.schema, parts):
            return F.lit(None)
        return nested_col(parts)

    def root(self) -> Column:
        if "ROOT" in self.variables:
            return self.variables["ROOT"]
        if self.schema is not None:
            return F.struct(*[nested_col([f.name]).alias(f.name) for f in self.schema.fields])
        return F.struct("*")

    def type_of_path(self, parts: list[str]) -> Optional[T.DataType]:
        if self.schema is None:
            return None
        return path_type(self.schema, parts)


def compile_expr(expr: Any, ctx: ExprContext) -> Any:
    """Compile a Mongo aggregation expression to a Column (or REMOVE).

    Memoized per (repr(expr), context): identical sub-expressions reuse
    the SAME Column object (compile-time CSE — see ExprContext._memo).
    Non-deterministic operators ($rand) bypass the memo: two occurrences
    of $rand must stay two independent draws."""
    if isinstance(expr, (str, list, dict)):
        key = repr(expr)
        hit = ctx._memo.get(key)
        if hit is not None:
            return hit
        out = _compile_expr_uncached(expr, ctx)
        if "$rand" not in key and not ctx._memo_unsafe:
            ctx._memo[key] = out
        return out
    return _compile_expr_uncached(expr, ctx)


def _compile_expr_uncached(expr: Any, ctx: ExprContext) -> Any:
    if isinstance(expr, str):
        if expr.startswith("$$"):
            return _variable(expr[2:], ctx)
        if expr.startswith("$"):
            return ctx.resolve(split_path(expr[1:]))
        return F.lit(expr)
    if isinstance(expr, bool) or isinstance(expr, (int, float)) or expr is None:
        return F.lit(expr)
    if isinstance(expr, list):
        return F.array(*[_c(e, ctx) for e in expr])
    if isinstance(expr, dict):
        op = next((k for k in expr if k.startswith("$")), None)
        if op is not None:
            if len(expr) != 1:
                raise ValueError(f"operator object must have a single key: {expr}")
            fn = OPERATORS.get(op)
            if fn is None:
                # Features analog: user expression operators registered on
                # the pipeline Context (reference Context.java:25-26);
                # built-ins win, so this is consulted only on a miss
                from .features import expression_extension

                fn = expression_extension(op)
                ctx._memo_unsafe = True
            if fn is None:
                raise NotImplementedError(f"unsupported expression operator {op}")
            return fn(expr[op], ctx)
        # expression object {k: expr, ...} -> struct (Group.java:233-246)
        return F.struct(*[_c(v, ctx).alias(k) for k, v in expr.items()])
    raise ValueError(f"cannot compile expression {expr!r}")


def _c(expr: Any, ctx: ExprContext) -> Column:
    """Compile, degrading REMOVE to null (valid only in capture positions)."""
    col = compile_expr(expr, ctx)
    if isinstance(col, Remove):
        return F.lit(None)
    return col


def _variable(name: str, ctx: ExprContext) -> Any:
    head, *rest = name.split(".")
    if head == "ROOT":
        base = ctx.root()
    elif head == "REMOVE":
        return REMOVE
    elif head == "NOW":
        base = F.current_timestamp()
    elif head == "CURRENT":
        base = ctx.root()
    elif head in ctx.variables:
        base = ctx.variables[head]
    else:
        raise ValueError(f"unknown variable $${name}")
    for p in rest:
        base = base.getField(p)
    return base


def _args(raw: Any, n: Optional[int] = None) -> list[Any]:
    out = raw if isinstance(raw, list) else [raw]
    if n is not None and len(out) != n:
        raise ValueError(f"expected {n} args, got {out}")
    return out


def mongo_truthy(col: Column) -> Column:
    """Mongo boolean coercion: null/missing/false/0 falsy, all else truthy.

    (Strings are truthy in Mongo; ``try_cast`` maps unparseable strings to
    null which we then treat as truthy — the one deviation is the strings
    "false"/"0", documented.)
    """
    return F.when(col.isNull(), F.lit(False)).otherwise(
        F.coalesce(col.try_cast("boolean"), F.lit(True))
    )


# Operators whose compiled Column is boolean-valued BY CONSTRUCTION
# (possibly null): for these, Mongo truthiness degenerates to
# ``coalesce(col, false)`` — no try_cast ladder.  Extensions cannot
# shadow these names (built-ins win in _compile_expr_uncached), so the
# syntactic check is sound.
_BOOL_VALUED_OPS = frozenset((
    "$and", "$or", "$not", "$eq", "$ne", "$gt", "$gte", "$lt", "$lte",
    "$in", "$isArray", "$isNumber", "$toBool", "$allElementsTrue",
    "$anyElementTrue", "$regexMatch",
))


def truthy_expr(raw: Any, ctx: "ExprContext") -> Column:
    """``mongo_truthy(compile_expr(raw))`` with a syntactic fast path
    (r12 bench lever): when ``raw`` is an operator expression that is
    boolean-valued by construction — every $cond/$switch/$and/$or
    condition in practice, e.g. $bucket's desugared CASE ladder — the
    coercion is just null->false, which halves the py4j round trips of
    the truthy wrapper AND shrinks the Catalyst tree the analyzer and
    codegen must walk.  Semantically identical: for a boolean column
    ``when(isNull, F).otherwise(coalesce(try_cast(bool), T))`` is
    exactly ``coalesce(col, false)``."""
    if isinstance(raw, bool):
        return F.lit(raw)
    if isinstance(raw, dict) and len(raw) == 1 \
            and next(iter(raw)) in _BOOL_VALUED_OPS:
        return F.coalesce(_c(raw, ctx), F.lit(False))
    return mongo_truthy(_c(raw, ctx))


def _fold(args: list[Column], fn: Callable[[Column, Column], Column]) -> Column:
    acc = args[0]
    for a in args[1:]:
        acc = fn(acc, a)
    return acc


def _is_ts(expr: Any, ctx: ExprContext) -> bool:
    if isinstance(expr, str) and expr.startswith("$") and not expr.startswith("$$"):
        t = ctx.type_of_path(split_path(expr[1:]))
        return isinstance(t, (T.TimestampType, T.DateType))
    if isinstance(expr, dict):
        op = next(iter(expr), "")
        return op in ("$toDate", "$dateFromString", "$dateAdd", "$dateTrunc", "$dateFromParts")
    return False


# ---------------------------------------------------------------- arithmetic


def _add(raw: Any, ctx: ExprContext) -> Column:
    exprs = _args(raw)
    cols = [_c(e, ctx) for e in exprs]
    ts = [i for i, e in enumerate(exprs) if _is_ts(e, ctx)]
    if ts:
        # date + millis (Mongo: one date operand, rest numeric millis)
        date = cols[ts[0]]
        ms = [c for i, c in enumerate(cols) if i != ts[0]]
        total = _fold(ms, lambda a, b: a + b) if ms else F.lit(0)
        return F.timestamp_millis(F.unix_millis(date) + total.cast("long"))
    return _fold(cols, lambda a, b: a + b)


def _subtract(raw: Any, ctx: ExprContext) -> Column:
    a_raw, b_raw = _args(raw, 2)
    a, b = _c(a_raw, ctx), _c(b_raw, ctx)
    a_ts, b_ts = _is_ts(a_raw, ctx), _is_ts(b_raw, ctx)
    if a_ts and b_ts:
        return F.unix_millis(a) - F.unix_millis(b)
    if a_ts:
        return F.timestamp_millis(F.unix_millis(a) - b.cast("long"))
    return a - b


def _trunc_to(x: Column, p: Column) -> Column:
    scale = F.pow(F.lit(10.0), p)
    return (x * scale).cast("long").cast("double") / scale


OPERATORS: dict[str, Callable[[Any, ExprContext], Any]] = {}


def _op(name: str) -> Callable:
    def deco(fn: Callable[[Any, ExprContext], Any]) -> Callable:
        OPERATORS[name] = fn
        return fn

    return deco


OPERATORS["$add"] = _add
OPERATORS["$subtract"] = _subtract
OPERATORS["$multiply"] = lambda raw, ctx: _fold([_c(e, ctx) for e in _args(raw)], lambda a, b: a * b)
OPERATORS["$divide"] = lambda raw, ctx: F.try_divide(
    _c(_args(raw, 2)[0], ctx).cast("double"), _c(_args(raw, 2)[1], ctx)
)
OPERATORS["$mod"] = lambda raw, ctx: (
    lambda a, b: F.when(b == 0, F.lit(None)).otherwise(a % b)
)(_c(_args(raw, 2)[0], ctx), _c(_args(raw, 2)[1], ctx))
OPERATORS["$abs"] = lambda raw, ctx: F.abs(_c(_args(raw)[0], ctx))
OPERATORS["$ceil"] = lambda raw, ctx: F.ceil(_c(_args(raw)[0], ctx))
OPERATORS["$floor"] = lambda raw, ctx: F.floor(_c(_args(raw)[0], ctx))
OPERATORS["$sqrt"] = lambda raw, ctx: F.sqrt(_c(_args(raw)[0], ctx))
OPERATORS["$exp"] = lambda raw, ctx: F.exp(_c(_args(raw)[0], ctx))
# Mongo 8.1 $sigmoid: 1 / (1 + e^-x)
OPERATORS["$sigmoid"] = lambda raw, ctx: (
    F.lit(1.0) / (F.lit(1.0) + F.exp(-_c(_args(raw)[0], ctx).cast("double")))
)
OPERATORS["$ln"] = lambda raw, ctx: F.log(_c(_args(raw)[0], ctx))
OPERATORS["$log10"] = lambda raw, ctx: F.log10(_c(_args(raw)[0], ctx))
OPERATORS["$log"] = lambda raw, ctx: (
    lambda num, base: F.log(num) / F.log(base)
)(_c(_args(raw, 2)[0], ctx), _c(_args(raw, 2)[1], ctx))
OPERATORS["$pow"] = lambda raw, ctx: F.pow(_c(_args(raw, 2)[0], ctx), _c(_args(raw, 2)[1], ctx))

# Bitwise operators (Mongo 6.3+): integer fold; $bitNot is unary.
OPERATORS["$bitAnd"] = lambda raw, ctx: _fold(
    [_c(e, ctx).cast("long") for e in _args(raw)], lambda a, b: a.bitwiseAND(b)
)
OPERATORS["$bitOr"] = lambda raw, ctx: _fold(
    [_c(e, ctx).cast("long") for e in _args(raw)], lambda a, b: a.bitwiseOR(b)
)
OPERATORS["$bitXor"] = lambda raw, ctx: _fold(
    [_c(e, ctx).cast("long") for e in _args(raw)], lambda a, b: a.bitwiseXOR(b)
)
OPERATORS["$bitNot"] = lambda raw, ctx: F.bitwise_not(_c(_args(raw)[0], ctx).cast("long"))


@_op("$round")
def _round(raw: Any, ctx: ExprContext) -> Column:
    """Half-up rounding as pure double arithmetic
    (``floor(x*10^p + 0.5)/10^p``) so results are bit-identical across
    engines (Spark's BigDecimal HALF_UP and DuckDB's round disagree on
    boundary halves of doubles — oracle parity requires one formula)."""
    a = _args(raw)
    x = _c(a[0], ctx).cast("double")
    if len(a) > 1 and isinstance(a[1], int):
        scale = F.lit(float(10 ** a[1]))
    elif len(a) > 1:
        scale = F.pow(F.lit(10.0), _c(a[1], ctx))
    else:
        scale = F.lit(1.0)
    return F.floor(x * scale + F.lit(0.5)) / scale


@_op("$trunc")
def _trunc(raw: Any, ctx: ExprContext) -> Column:
    a = _args(raw)
    x = _c(a[0], ctx)
    p = _c(a[1], ctx) if len(a) > 1 else F.lit(0)
    return _trunc_to(x.cast("double"), p)


# ------------------------------------------------------------------- string

OPERATORS["$concat"] = lambda raw, ctx: F.concat(*[_c(e, ctx) for e in _args(raw)])
OPERATORS["$toLower"] = lambda raw, ctx: F.lower(_c(_args(raw)[0], ctx))
OPERATORS["$toUpper"] = lambda raw, ctx: F.upper(_c(_args(raw)[0], ctx))
OPERATORS["$strLenCP"] = lambda raw, ctx: F.length(_c(_args(raw)[0], ctx))
OPERATORS["$strLenBytes"] = lambda raw, ctx: F.octet_length(_c(_args(raw)[0], ctx))
OPERATORS["$toString"] = lambda raw, ctx: _c(_args(raw)[0], ctx).cast("string")
OPERATORS["$strcasecmp"] = lambda raw, ctx: (
    lambda a, b: F.when(F.lower(a) < F.lower(b), -1).when(F.lower(a) > F.lower(b), 1).otherwise(0)
)(_c(_args(raw, 2)[0], ctx), _c(_args(raw, 2)[1], ctx))


@_op("$substrCP")
def _substr(raw: Any, ctx: ExprContext) -> Column:
    s, start, length = [_c(e, ctx) for e in _args(raw, 3)]
    return F.substring(s, start + F.lit(1), length)


OPERATORS["$substr"] = OPERATORS["$substrCP"]
OPERATORS["$substrBytes"] = OPERATORS["$substrCP"]


@_op("$trim")
def _trim(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    if "chars" in raw:
        return F.btrim(inp, _c(raw["chars"], ctx))
    return F.trim(inp)


@_op("$ltrim")
def _ltrim(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    if "chars" in raw:
        return F.call_function("ltrim", _c(raw["chars"], ctx), inp)
    return F.ltrim(inp)


@_op("$rtrim")
def _rtrim(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    if "chars" in raw:
        return F.call_function("rtrim", _c(raw["chars"], ctx), inp)
    return F.rtrim(inp)


@_op("$split")
def _split(raw: Any, ctx: ExprContext) -> Column:
    s_raw, d_raw = _args(raw, 2)
    s = _c(s_raw, ctx)
    if isinstance(d_raw, str) and not d_raw.startswith("$"):
        return F.split(s, re.escape(d_raw))
    # dynamic delimiter: \Q..\E literal-quotes it for the Java regex engine
    return F.split(s, F.concat(F.lit("\\Q"), _c(d_raw, ctx), F.lit("\\E")))


def _index_of_cp_impl(raw: Any, ctx: ExprContext) -> Column:
    a = _args(raw)
    s, sub = _c(a[0], ctx), _c(a[1], ctx)
    start = (_c(a[2], ctx) if len(a) > 2 else F.lit(0)).cast("int")
    # locate is 1-based, 0 = not found; Mongo is 0-based, -1 = not found
    found = F.call_function("locate", sub, s, start + F.lit(1))
    return found - F.lit(1)


OPERATORS["$indexOfCP"] = _index_of_cp_impl
OPERATORS["$indexOfBytes"] = _index_of_cp_impl


@_op("$regexMatch")
def _regex_match(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    regex = raw["regex"]
    opts = raw.get("options", "")
    if isinstance(regex, str) and opts:
        regex = f"(?{opts}){regex}"
    if isinstance(regex, str):
        return inp.rlike(regex)
    return inp.rlike(_c(regex, ctx))


@_op("$replaceOne")
def _replace_one(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    find = _c(raw["find"], ctx)
    repl = _c(raw["replacement"], ctx)
    pos = F.call_function("locate", find, inp)
    return F.when(pos == 0, inp).otherwise(
        F.concat(
            F.substring(inp, F.lit(1), pos - F.lit(1)),
            repl,
            F.substring(inp, pos + F.length(find), F.length(inp)),
        )
    )


@_op("$replaceAll")
def _replace_all(raw: Any, ctx: ExprContext) -> Column:
    return F.call_function(
        "replace", _c(raw["input"], ctx), _c(raw["find"], ctx), _c(raw["replacement"], ctx)
    )


# --------------------------------------------------------------- comparison

OPERATORS["$eq"] = lambda raw, ctx: _c(_args(raw, 2)[0], ctx).eqNullSafe(_c(_args(raw, 2)[1], ctx))
OPERATORS["$ne"] = lambda raw, ctx: ~_c(_args(raw, 2)[0], ctx).eqNullSafe(_c(_args(raw, 2)[1], ctx))
OPERATORS["$gt"] = lambda raw, ctx: _c(_args(raw, 2)[0], ctx) > _c(_args(raw, 2)[1], ctx)
OPERATORS["$gte"] = lambda raw, ctx: _c(_args(raw, 2)[0], ctx) >= _c(_args(raw, 2)[1], ctx)
OPERATORS["$lt"] = lambda raw, ctx: _c(_args(raw, 2)[0], ctx) < _c(_args(raw, 2)[1], ctx)
OPERATORS["$lte"] = lambda raw, ctx: _c(_args(raw, 2)[0], ctx) <= _c(_args(raw, 2)[1], ctx)
OPERATORS["$cmp"] = lambda raw, ctx: (
    lambda a, b: F.when(a < b, -1).when(a > b, 1).otherwise(0)
)(_c(_args(raw, 2)[0], ctx), _c(_args(raw, 2)[1], ctx))

# ------------------------------------------------------------------ boolean

OPERATORS["$and"] = lambda raw, ctx: _fold(
    [truthy_expr(e, ctx) for e in _args(raw)], lambda a, b: a & b
)
OPERATORS["$or"] = lambda raw, ctx: _fold(
    [truthy_expr(e, ctx) for e in _args(raw)], lambda a, b: a | b
)
OPERATORS["$not"] = lambda raw, ctx: ~truthy_expr(_args(raw)[0], ctx)

# -------------------------------------------------------------- conditional


@_op("$cond")
def _cond(raw: Any, ctx: ExprContext) -> Column:
    if isinstance(raw, dict):
        if_, then, else_ = raw["if"], raw["then"], raw["else"]
    else:
        if_, then, else_ = _args(raw, 3)
    return F.when(truthy_expr(if_, ctx), _c(then, ctx)).otherwise(_c(else_, ctx))


OPERATORS["$ifNull"] = lambda raw, ctx: F.coalesce(*[_c(e, ctx) for e in _args(raw)])


@_op("$switch")
def _switch(raw: Any, ctx: ExprContext) -> Column:
    col = None
    for branch in raw["branches"]:
        case = truthy_expr(branch["case"], ctx)
        then = _c(branch["then"], ctx)
        col = F.when(case, then) if col is None else col.when(case, then)
    if col is None:
        raise ValueError("$switch requires at least one branch")
    if "default" in raw:
        return col.otherwise(_c(raw["default"], ctx))
    return col


# -------------------------------------------------------------------- array


@_op("$arrayElemAt")
def _array_elem_at(raw: Any, ctx: ExprContext) -> Column:
    arr_raw, idx_raw = _args(raw, 2)
    arr = _c(arr_raw, ctx)
    if isinstance(idx_raw, int):
        idx = idx_raw
        return F.try_element_at(arr, F.lit(idx + 1 if idx >= 0 else idx))
    idx = _c(idx_raw, ctx).cast("int")
    return F.when(idx >= 0, F.try_element_at(arr, idx + F.lit(1))).otherwise(
        F.try_element_at(arr, idx)
    )


OPERATORS["$concatArrays"] = lambda raw, ctx: F.concat(*[_c(e, ctx) for e in _args(raw)])
OPERATORS["$reverseArray"] = lambda raw, ctx: F.reverse(_c(_args(raw)[0], ctx))
OPERATORS["$size"] = lambda raw, ctx: F.size(_c(_args(raw)[0], ctx))
OPERATORS["$in"] = lambda raw, ctx: F.array_contains(
    _c(_args(raw, 2)[1], ctx), _c(_args(raw, 2)[0], ctx)
)
OPERATORS["$first"] = lambda raw, ctx: F.try_element_at(_c(_args(raw)[0], ctx), F.lit(1))
OPERATORS["$last"] = lambda raw, ctx: F.try_element_at(_c(_args(raw)[0], ctx), F.lit(-1))


@_op("$indexOfArray")
def _index_of_array(raw: Any, ctx: ExprContext) -> Column:
    a = _args(raw)
    arr, val = _c(a[0], ctx), _c(a[1], ctx)
    return F.call_function("array_position", arr, val).cast("int") - F.lit(1)


@_op("$isArray")
def _is_array(raw: Any, ctx: ExprContext) -> Column:
    e = _args(raw)[0]
    if isinstance(e, str) and e.startswith("$") and not e.startswith("$$"):
        t = ctx.type_of_path(split_path(e[1:]))
        return F.lit(isinstance(t, T.ArrayType))
    if isinstance(e, list):
        return F.lit(True)
    return F.lit(False)


@_op("$filter")
def _filter(raw: Any, ctx: ExprContext) -> Column:
    var = raw.get("as", "this")
    inp = _c(raw["input"], ctx)
    out = F.filter(inp, lambda x: truthy_expr(raw["cond"], ctx.with_vars(**{var: x, "this": x})))
    if "limit" in raw:
        return F.slice(out, 1, _c(raw["limit"], ctx).cast("int"))
    return out


@_op("$map")
def _map(raw: Any, ctx: ExprContext) -> Column:
    var = raw.get("as", "this")
    inp = _c(raw["input"], ctx)
    return F.transform(inp, lambda x: _c(raw["in"], ctx.with_vars(**{var: x, "this": x})))


def infer_type(expr: Any, ctx: ExprContext) -> Optional[T.DataType]:
    """Best-effort static type of an expression (field paths + literals)."""
    if isinstance(expr, str) and expr.startswith("$") and not expr.startswith("$$"):
        return ctx.type_of_path(split_path(expr[1:]))
    if isinstance(expr, bool):
        return T.BooleanType()
    if isinstance(expr, int):
        return T.LongType()
    if isinstance(expr, float):
        return T.DoubleType()
    if isinstance(expr, str):
        return T.StringType()
    if isinstance(expr, list) and expr:
        et = infer_type(expr[0], ctx)
        return T.ArrayType(et) if et is not None else None
    return None


_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType)


@_op("$reduce")
def _reduce(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    init = _c(raw["initialValue"], ctx)
    # Spark's `aggregate` needs the init type to equal the lambda's output
    # type exactly; widen a numeric literal init to match the element type
    in_t = infer_type(raw["input"], ctx)
    init_t = infer_type(raw["initialValue"], ctx)
    if isinstance(in_t, T.ArrayType) and isinstance(in_t.elementType, _NUMERIC) and isinstance(
        init_t, _NUMERIC
    ):
        wide = (
            "double"
            if isinstance(in_t.elementType, (T.FloatType, T.DoubleType))
            or isinstance(init_t, (T.FloatType, T.DoubleType))
            else "long"
        )
        init = init.cast(wide)
    return F.aggregate(
        inp, init, lambda acc, x: _c(raw["in"], ctx.with_vars(value=acc, this=x))
    )


@_op("$range")
def _range(raw: Any, ctx: ExprContext) -> Column:
    a = _args(raw)
    start = _c(a[0], ctx).cast("long")
    end = _c(a[1], ctx).cast("long")
    step = _c(a[2], ctx).cast("long") if len(a) > 2 else F.lit(1).cast("long")
    bound = end - F.when(step > 0, F.lit(1)).otherwise(F.lit(-1))
    empty = ((step > 0) & (start >= end)) | ((step < 0) & (start <= end))
    return F.when(empty, F.array().cast("array<long>")).otherwise(F.sequence(start, bound, step))


@_op("$slice")
def _slice(raw: Any, ctx: ExprContext) -> Column:
    a = _args(raw)
    arr = _c(a[0], ctx)
    if len(a) == 2:
        n = _c(a[1], ctx).cast("int")
        return F.when(n >= 0, F.slice(arr, F.lit(1), n)).otherwise(
            F.when(-n >= F.size(arr), arr).otherwise(F.slice(arr, n, -n))
        )
    pos = _c(a[1], ctx).cast("int")
    n = _c(a[2], ctx).cast("int")
    start = F.when(pos >= 0, pos + F.lit(1)).otherwise(
        F.when(-pos > F.size(arr), F.lit(1)).otherwise(pos)
    )
    return F.slice(arr, start, n)


@_op("$zip")
def _zip(raw: Any, ctx: ExprContext) -> Column:
    inputs = [_c(e, ctx) for e in raw["inputs"]]
    if len(inputs) == 2 and not raw.get("useLongestLength"):
        # fast path: zip_with runs to the longest length, so trim both to
        # the shortest first
        a, b = inputs
        n = F.least(F.size(a), F.size(b))
        return F.zip_with(
            F.slice(a, 1, n), F.slice(b, 1, n), lambda x, y: F.array(x, y)
        )
    # N-ary: index-walk 0..n-1 and pick element i from every input
    # (try_element_at nulls past-the-end picks under longest-length)
    sizes = [F.size(i) for i in inputs]
    if raw.get("useLongestLength"):
        n = F.greatest(*sizes) if len(sizes) > 1 else sizes[0]
        defaults = raw.get("defaults")
        if defaults is not None and len(defaults) != len(inputs):
            raise ValueError(
                "$zip defaults must have the same length as inputs"
            )
        dcols = (
            [_c(e, ctx) for e in defaults] if defaults is not None
            else [None] * len(inputs)
        )
    else:
        n = F.least(*sizes) if len(sizes) > 1 else sizes[0]
        dcols = [None] * len(inputs)

    def elem(i: Column) -> Column:
        # the default only fills positions PAST an input's end — a stored
        # null element stays null (Mongo semantics)
        picks = [
            F.try_element_at(inp, (i + 1).cast("int")) if d is None
            else F.when(i < F.size(inp),
                        F.try_element_at(inp, (i + 1).cast("int"))
                        ).otherwise(d)
            for inp, d in zip(inputs, dcols)
        ]
        return F.array(*picks)

    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    # Mongo: any null input -> null result (least/greatest would skip nulls)
    any_null = reduce(lambda acc, c: acc | c.isNull(), inputs, F.lit(False))
    return F.when(~any_null, F.transform(idx, elem))


@_op("$arrayToObject")
def _array_to_object(raw: Any, ctx: ExprContext) -> Column:
    arr = _c(_args(raw)[0], ctx)
    # accepts [{k,v}...]; produces a MapType (fixed-schema stand-in for an
    # open object — documented deviation)
    return F.map_from_entries(F.transform(arr, lambda e: F.struct(e["k"], e["v"])))


@_op("$objectToArray")
def _object_to_array(raw: Any, ctx: ExprContext) -> Column:
    e = _args(raw)[0]
    col = _c(e, ctx)
    t = None
    if isinstance(e, str) and e.startswith("$") and not e.startswith("$$"):
        t = ctx.type_of_path(split_path(e[1:]))
    if isinstance(t, T.MapType):
        return F.transform(F.map_entries(col), lambda kv: F.struct(kv["key"].alias("k"), kv["value"].alias("v")))
    if isinstance(t, T.StructType):
        return F.array(
            *[
                F.struct(F.lit(f.name).alias("k"), col.getField(f.name).cast("string").alias("v"))
                for f in t.fields
            ]
        )
    raise NotImplementedError("$objectToArray requires a struct/map column with known schema")


# ---------------------------------------------------------------------- set


def _distinct_sorted(col: Column) -> Column:
    return F.array_sort(F.array_distinct(col))


OPERATORS["$setUnion"] = lambda raw, ctx: _distinct_sorted(
    F.concat(*[_c(e, ctx) for e in _args(raw)])
)
OPERATORS["$setIntersection"] = lambda raw, ctx: _distinct_sorted(
    _fold([_c(e, ctx) for e in _args(raw)], F.array_intersect)
)
OPERATORS["$setDifference"] = lambda raw, ctx: _distinct_sorted(
    F.array_except(_c(_args(raw, 2)[0], ctx), _c(_args(raw, 2)[1], ctx))
)
OPERATORS["$setEquals"] = lambda raw, ctx: _fold(
    [_distinct_sorted(_c(e, ctx)) for e in _args(raw)], lambda a, b: a.eqNullSafe(b)
)
OPERATORS["$setIsSubset"] = lambda raw, ctx: (
    F.size(F.array_except(_c(_args(raw, 2)[0], ctx), _c(_args(raw, 2)[1], ctx))) == 0
)
OPERATORS["$anyElementTrue"] = lambda raw, ctx: F.exists(
    _c(_args(raw)[0], ctx), mongo_truthy
)
OPERATORS["$allElementsTrue"] = lambda raw, ctx: F.forall(
    _c(_args(raw)[0], ctx), mongo_truthy
)

# --------------------------------------------------------------------- date

_MONGO_TO_SPARK_FMT = [
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%L", "SSS"),
    ("%j", "DDD"),
    ("%u", "e"),
    ("%z", "xxxx"),
    ("%%", "%"),
]


def _fmt(mongo_fmt: str) -> str:
    out = mongo_fmt
    for m, s in _MONGO_TO_SPARK_FMT:
        out = out.replace(m, s)
    return out


@_op("$dateFromString")
def _date_from_string(raw: Any, ctx: ExprContext) -> Column:
    ds = _c(raw["dateString"], ctx)
    if "format" in raw:
        return F.try_to_timestamp(ds, F.lit(_fmt(raw["format"])))
    return F.try_to_timestamp(ds)


@_op("$dateFromParts")
def _date_from_parts(raw: Any, ctx: ExprContext) -> Column:
    """``{year, month?, day?, hour?, minute?, second?, millisecond?,
    timezone?}`` or the ISO form ``{isoWeekYear, isoWeek?,
    isoDayOfWeek?, ...}``.  Out-of-range parts CARRY like Mongo's
    (month 13 -> next January, day 0 -> last day of the previous
    month): the date builds as make_date(y,1,1) + months + days, and
    the time-of-day as one dt-interval.  A part that IS specified but
    evaluates to null makes the whole result null (Mongo's null
    propagation) — defaults apply only to ABSENT parts."""
    if not isinstance(raw, dict):
        raise ValueError("$dateFromParts takes a document")

    guards: list[Column] = []

    def part(name: str, default: int) -> Column:
        if name in raw:
            c = _c(raw[name], ctx).cast("int")
            guards.append(c)
            return F.coalesce(c, F.lit(default))
        return F.lit(default)

    if "isoWeekYear" in raw:
        y = _c(raw["isoWeekYear"], ctx).cast("int")
        w = part("isoWeek", 1)
        d = part("isoDayOfWeek", 1)
        # ISO week 1 always contains Jan 4; weekday() is 0 for Monday
        jan4 = F.make_date(y, F.lit(1), F.lit(4))
        monday1 = F.date_sub(jan4, F.weekday(jan4))
        base = F.date_add(monday1, (w - 1) * 7 + (d - 1))
    else:
        y = _c(raw["year"], ctx).cast("int")
        base = F.date_add(
            F.add_months(F.make_date(y, F.lit(1), F.lit(1)),
                         part("month", 1) - 1),
            part("day", 1) - 1,
        )
    secs = (
        part("second", 0).cast("double")
        + part("millisecond", 0).cast("double") / 1000.0
    )
    ts = base.cast("timestamp") + F.make_dt_interval(
        F.lit(0), part("hour", 0), part("minute", 0), secs
    )
    tz = raw.get("timezone")
    if tz is not None:
        if not isinstance(tz, str):
            raise NotImplementedError(
                "$dateFromParts timezone must be a literal string"
            )
        # the parts describe wall-clock time IN tz; sessions run UTC
        ts = F.to_utc_timestamp(ts, tz)
    if guards:
        cond = guards[0].isNotNull()
        for g in guards[1:]:
            cond = cond & g.isNotNull()
        ts = F.when(cond, ts)
    return ts


@_op("$dateToString")
def _date_to_string(raw: Any, ctx: ExprContext) -> Column:
    date = _c(raw["date"], ctx)
    fmt = raw.get("format", "%Y-%m-%dT%H:%M:%S.%LZ")
    return F.date_format(date, _fmt(fmt))


OPERATORS["$year"] = lambda raw, ctx: F.year(_c(_args(raw)[0], ctx))
OPERATORS["$month"] = lambda raw, ctx: F.month(_c(_args(raw)[0], ctx))
OPERATORS["$dayOfMonth"] = lambda raw, ctx: F.dayofmonth(_c(_args(raw)[0], ctx))
OPERATORS["$hour"] = lambda raw, ctx: F.hour(_c(_args(raw)[0], ctx))
OPERATORS["$minute"] = lambda raw, ctx: F.minute(_c(_args(raw)[0], ctx))
OPERATORS["$second"] = lambda raw, ctx: F.second(_c(_args(raw)[0], ctx))
# unix_millis rejects TIMESTAMP_NTZ (the parquet date type) — cast first;
# with the UTC session timezone the cast is value-preserving
OPERATORS["$millisecond"] = lambda raw, ctx: (
    F.unix_millis(_c(_args(raw)[0], ctx).cast("timestamp")) % 1000
).cast("int")
OPERATORS["$dayOfWeek"] = lambda raw, ctx: F.dayofweek(_c(_args(raw)[0], ctx))
OPERATORS["$dayOfYear"] = lambda raw, ctx: F.dayofyear(_c(_args(raw)[0], ctx))
# Mongo $week is Sunday-based, 0-53: days before the year's first Sunday
# are week 0 (NOT ISO week, which is $isoWeek below).
OPERATORS["$week"] = lambda raw, ctx: (
    lambda d: F.floor((F.dayofyear(d) + 7 - F.dayofweek(d)) / 7).cast("int")
)(_c(_args(raw)[0], ctx))
OPERATORS["$isoWeek"] = lambda raw, ctx: F.weekofyear(_c(_args(raw)[0], ctx))
# ISO week-year = calendar year of that ISO week's Thursday.
OPERATORS["$isoWeekYear"] = lambda raw, ctx: (
    lambda d: F.year(F.date_add(d.cast("date"), 4 - (F.weekday(d) + 1))).cast("long")
)(_c(_args(raw)[0], ctx))
# weekday(): 0=Monday..6=Sunday; ISO dow is 1=Monday..7=Sunday.
OPERATORS["$isoDayOfWeek"] = lambda raw, ctx: (F.weekday(_c(_args(raw)[0], ctx)) + 1).cast("int")
OPERATORS["$toDate"] = lambda raw, ctx: _c(_args(raw)[0], ctx).try_cast("timestamp")


@_op("$dateToParts")
def _date_to_parts(raw: Any, ctx: ExprContext) -> Column:
    """``{date, iso8601?}`` → a parts document ({year..millisecond}, or the
    ISO variant {isoWeekYear, isoWeek, isoDayOfWeek, ...} when iso8601)."""
    d = _c(raw["date"], ctx)
    ms = (F.unix_millis(d.cast("timestamp")) % 1000).cast("int")
    if raw.get("iso8601"):
        return F.struct(
            F.year(F.date_add(d.cast("date"), 4 - (F.weekday(d) + 1))).cast("long")
            .alias("isoWeekYear"),
            F.weekofyear(d).alias("isoWeek"),
            (F.weekday(d) + 1).cast("int").alias("isoDayOfWeek"),
            F.hour(d).alias("hour"),
            F.minute(d).alias("minute"),
            F.second(d).alias("second"),
            ms.alias("millisecond"),
        )
    return F.struct(
        F.year(d).alias("year"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        F.hour(d).alias("hour"),
        F.minute(d).alias("minute"),
        F.second(d).alias("second"),
        ms.alias("millisecond"),
    )

_DATE_UNITS = {"year", "quarter", "month", "week", "day", "hour", "minute", "second", "millisecond"}


@_op("$dateAdd")
def _date_add(raw: Any, ctx: ExprContext) -> Column:
    unit = raw["unit"]
    if unit not in _DATE_UNITS:
        raise ValueError(f"bad $dateAdd unit {unit}")
    start = _c(raw["startDate"], ctx)
    amount = _c(raw["amount"], ctx).cast("long")
    return F.timestamp_add(unit.upper(), amount, start)


@_op("$dateSubtract")
def _date_subtract(raw: Any, ctx: ExprContext) -> Column:
    unit = raw["unit"]
    if unit not in _DATE_UNITS:
        raise ValueError(f"bad $dateSubtract unit {unit}")
    start = _c(raw["startDate"], ctx)
    amount = _c(raw["amount"], ctx).cast("long")
    return F.timestamp_add(unit.upper(), -amount, start)


@_op("$dateDiff")
def _date_diff(raw: Any, ctx: ExprContext) -> Column:
    unit = raw["unit"]
    if unit not in _DATE_UNITS:
        raise ValueError(f"bad $dateDiff unit {unit}")
    return F.timestamp_diff(unit.upper(), _c(raw["startDate"], ctx), _c(raw["endDate"], ctx))


@_op("$dateTrunc")
def _date_trunc(raw: Any, ctx: ExprContext) -> Column:
    return F.date_trunc(raw["unit"], _c(raw["date"], ctx))


# --------------------------------------------------------------------- type

_SPARK_TO_BSON = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.DoubleType: "double",
    T.FloatType: "double",
    T.BooleanType: "bool",
    T.TimestampType: "date",
    T.DateType: "date",
    T.ArrayType: "array",
    T.StructType: "object",
    T.MapType: "object",
    T.NullType: "null",
    T.BinaryType: "binData",
    T.DecimalType: "decimal",
}


@_op("$type")
def _type(raw: Any, ctx: ExprContext) -> Column:
    e = _args(raw)[0]
    col = _c(e, ctx)
    name = "missing"
    if isinstance(e, str) and e.startswith("$") and not e.startswith("$$"):
        t = ctx.type_of_path(split_path(e[1:]))
        if t is not None:
            name = _SPARK_TO_BSON.get(type(t), "object")
    elif isinstance(e, bool):
        name = "bool"
    elif isinstance(e, int):
        name = "long"
    elif isinstance(e, float):
        name = "double"
    elif isinstance(e, str):
        name = "string"
    elif isinstance(e, list):
        name = "array"
    elif isinstance(e, dict):
        name = "object"
    if name == "missing":
        return F.lit("missing")
    return F.when(col.isNull(), F.lit("null")).otherwise(F.lit(name))


@_op("$convert")
def _convert(raw: Any, ctx: ExprContext) -> Column:
    """Type conversion; Mongo 8.0's ``format`` option covers the
    string<->binData directions (base64, base64url, hex, utf8).
    Deviations: invalid base64/hex input passes through Java's lenient
    decoders instead of raising as Mongo does (use a $match guard for
    strict inputs); binData -> string utf8 has FULL Mongo semantics
    (r6): invalid UTF-8 raises, or routes to ``onError`` when given
    (validate_utf8 / try_validate_utf8); binData subtypes don't exist
    in Spark's BINARY
    type, so a ``to: {type, subtype}`` document ignores the subtype;
    and binData -> string WITHOUT ``format`` falls through to the plain
    string cast (lenient UTF-8) because the input's runtime type is not
    known at compile time — pass ``format: "base64"`` explicitly for
    Mongo's no-format default."""
    inp = _c(raw["input"], ctx)
    to = raw["to"]
    fmt = raw.get("format")
    if isinstance(to, dict):
        to = to["type"]
    if to == "binData":
        if fmt is None:
            fmt = "base64"  # Mongo 8.0's documented default
        if fmt == "base64":
            out = F.unbase64(inp)
        elif fmt == "base64url":
            b = F.translate(inp, "-_", "+/")
            pad = F.lit("===").substr(
                F.lit(1), (F.lit(4) - F.length(b) % 4) % 4)
            out = F.unbase64(F.concat(b, pad))
        elif fmt == "hex":
            out = F.unhex(inp)
        elif fmt == "utf8":
            out = F.encode(inp, "utf-8")
        else:
            raise ValueError(
                "$convert to binData format must be "
                "base64|base64url|hex|utf8")
        if "onError" in raw:
            out = F.coalesce(
                out, F.when(inp.isNotNull(), _c(raw["onError"], ctx)))
        if "onNull" in raw:
            out = F.when(inp.isNull(),
                         _c(raw["onNull"], ctx)).otherwise(out)
        return out
    if to == "string" and fmt is not None:
        if fmt == "base64":
            out = F.base64(inp)
        elif fmt == "base64url":
            out = F.translate(F.base64(inp), "+/", "-_")
        elif fmt == "hex":
            # Mongo emits lowercase hex (DuckDB/Spark hex() upper —
            # lowered on both engine and oracle sides)
            out = F.lower(F.hex(inp))
        elif fmt == "utf8":
            # r6: full Mongo parity via Spark's validate_utf8 family —
            # with onError, invalid bytes yield NULL (try_ variant) and
            # coalesce routes to onError like Mongo's catch; without,
            # validate_utf8 raises like Mongo does (closes the r5
            # U+FFFD-replacement deviation)
            out = (F.try_validate_utf8(inp) if "onError" in raw
                   else F.validate_utf8(inp))
        else:
            raise ValueError(
                "$convert to string supports format "
                "base64|base64url|hex|utf8")
        if "onError" in raw:
            out = F.coalesce(
                out, F.when(inp.isNotNull(), _c(raw["onError"], ctx)))
        if "onNull" in raw:
            out = F.when(inp.isNull(),
                         _c(raw["onNull"], ctx)).otherwise(out)
        return out
    spark_t = {
        "int": "int",
        "long": "long",
        "double": "double",
        "decimal": "decimal(38,10)",
        "bool": "boolean",
        "string": "string",
        "date": "timestamp",
    }.get(to)
    if spark_t is None:
        raise ValueError(f"$convert: unsupported target {to}")
    out = inp.try_cast(spark_t)
    if "onError" in raw:
        out = F.coalesce(out, F.when(inp.isNotNull(), _c(raw["onError"], ctx)))
    if "onNull" in raw:
        out = F.when(inp.isNull(), _c(raw["onNull"], ctx)).otherwise(out)
    return out


OPERATORS["$toInt"] = lambda raw, ctx: _c(_args(raw)[0], ctx).try_cast("int")
OPERATORS["$toLong"] = lambda raw, ctx: _c(_args(raw)[0], ctx).try_cast("long")
OPERATORS["$toDouble"] = lambda raw, ctx: _c(_args(raw)[0], ctx).try_cast("double")
OPERATORS["$toDecimal"] = lambda raw, ctx: _c(_args(raw)[0], ctx).try_cast("decimal(38,10)")
OPERATORS["$toBool"] = lambda raw, ctx: mongo_truthy(_c(_args(raw)[0], ctx))

# ------------------------------------------------------------------- object


@_op("$mergeObjects")
def _merge_objects(raw: Any, ctx: ExprContext) -> Column:
    """Shallow left-fold merge of struct values (later non-null operands win
    per field; wholly-null operands are skipped — Mongo semantics, used by
    Group.java:291-304)."""
    exprs = _args(raw)
    cols = [_c(e, ctx) for e in exprs]
    schemas: list[Optional[T.StructType]] = []
    for e in exprs:
        t = None
        if isinstance(e, str) and e.startswith("$") and not e.startswith("$$"):
            t = ctx.type_of_path(split_path(e[1:]))
        elif isinstance(e, dict) and not any(k.startswith("$") for k in e):
            # expression-object: synthesize a field list with unknown types
            t = T.StructType([T.StructField(k, T.NullType()) for k in e])
        if not isinstance(t, T.StructType):
            raise NotImplementedError(
                "$mergeObjects requires struct operands with known schema"
            )
        schemas.append(t)
    field_order: list[str] = []
    for s in schemas:
        for f in s.fields:
            if f.name not in field_order:
                field_order.append(f.name)
    out_fields = []
    for name in field_order:
        val: Optional[Column] = None
        for col, s in zip(cols, schemas):
            if any(f.name == name for f in s.fields):
                contrib = F.when(col.isNotNull(), col.getField(name))
                val = contrib if val is None else F.coalesce(contrib, val)
        out_fields.append(val.alias(name))
    return F.struct(*out_fields)


@_op("$getField")
def _get_field(raw: Any, ctx: ExprContext) -> Column:
    if isinstance(raw, str):
        return ctx.resolve([raw])
    field = raw["field"]
    inp = _c(raw["input"], ctx) if "input" in raw else None
    if inp is None:
        return ctx.resolve([field])
    return inp.getField(field)


@_op("$setField")
def _set_field(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    val = compile_expr(raw["value"], ctx)
    fname = "`" + raw["field"].replace("`", "``") + "`"
    if isinstance(val, Remove):
        return inp.dropFields(fname)
    return inp.withField(fname, val)


@_op("$unsetField")
def _unset_field(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    return inp.dropFields("`" + raw["field"].replace("`", "``") + "`")


# -------------------------------------------------------------------- other


@_op("$let")
def _let(raw: Any, ctx: ExprContext) -> Column:
    bound = ctx
    for name, vexpr in raw.get("vars", {}).items():
        bound = bound.with_vars(**{name: _c(vexpr, ctx)})
    return _c(raw["in"], bound)


@_op("$literal")
def _literal(raw: Any, ctx: ExprContext) -> Column:
    return _lit_deep(raw)


def _lit_deep(v: Any) -> Column:
    if isinstance(v, list):
        return F.array(*[_lit_deep(e) for e in v])
    if isinstance(v, dict):
        return F.struct(*[_lit_deep(val).alias(k) for k, val in v.items()])
    return F.lit(v)


# ------------------------------------------- superset: remaining MongoDB ops
# (operators beyond what the reference's fixtures witness, completing the
# public aggregation-expression surface — SURVEY.md §2.3a target list)

OPERATORS["$sin"] = lambda raw, ctx: F.sin(_c(_args(raw)[0], ctx))
OPERATORS["$cos"] = lambda raw, ctx: F.cos(_c(_args(raw)[0], ctx))
OPERATORS["$tan"] = lambda raw, ctx: F.tan(_c(_args(raw)[0], ctx))
OPERATORS["$asin"] = lambda raw, ctx: F.asin(_c(_args(raw)[0], ctx))
OPERATORS["$acos"] = lambda raw, ctx: F.acos(_c(_args(raw)[0], ctx))
OPERATORS["$atan"] = lambda raw, ctx: F.atan(_c(_args(raw)[0], ctx))
OPERATORS["$atan2"] = lambda raw, ctx: F.atan2(
    _c(_args(raw, 2)[0], ctx), _c(_args(raw, 2)[1], ctx)
)
OPERATORS["$sinh"] = lambda raw, ctx: F.sinh(_c(_args(raw)[0], ctx))
OPERATORS["$cosh"] = lambda raw, ctx: F.cosh(_c(_args(raw)[0], ctx))
OPERATORS["$tanh"] = lambda raw, ctx: F.tanh(_c(_args(raw)[0], ctx))
OPERATORS["$asinh"] = lambda raw, ctx: F.asinh(_c(_args(raw)[0], ctx))
OPERATORS["$acosh"] = lambda raw, ctx: F.acosh(_c(_args(raw)[0], ctx))
OPERATORS["$atanh"] = lambda raw, ctx: F.atanh(_c(_args(raw)[0], ctx))
OPERATORS["$degreesToRadians"] = lambda raw, ctx: F.radians(_c(_args(raw)[0], ctx))
OPERATORS["$radiansToDegrees"] = lambda raw, ctx: F.degrees(_c(_args(raw)[0], ctx))

# documented deviation: on a fixed-schema engine numeric-looking strings
# try_cast successfully; Mongo's $isNumber checks the BSON type tag instead
OPERATORS["$isNumber"] = lambda raw, ctx: _c(_args(raw)[0], ctx).try_cast(
    "double"
).isNotNull()


@_op("$meta")
def _meta(raw: Any, ctx: ExprContext) -> Column:
    """Atlas/Mongo ``{"$meta": "vectorSearchScore" | "searchScore" |
    "textScore"}``: reads the hidden score column bound by the
    $vectorSearch/$search stages (operators/atlas.py)."""
    name = _args(raw)[0]
    if not isinstance(name, str):
        raise ValueError("$meta takes a metadata field name string")
    alias = {"textScore": "searchScore"}.get(name, name)
    col = f"__meta_{alias}"
    if ctx.schema is not None and not has_path(ctx.schema, [col]):
        # Mongo errors here too ("query requires ... score metadata") —
        # a silent null would hide a missing/mis-ordered search stage
        raise ValueError(
            f"$meta {name!r}: no score metadata in scope — bind it with "
            "a preceding $vectorSearch/$search stage"
        )
    return ctx.resolve([col])


def _interp_percentile(sorted_arr: Column, n: Column, p: Any) -> Column:
    """Continuous-interpolation percentile over a sorted double array —
    the same definition as Spark's percentile() aggregate, keeping the
    expression form consistent with the $group accumulator form."""
    rank = (n - 1).cast("double") * F.lit(float(p))
    lo = F.floor(rank).cast("int")
    hi = F.ceil(rank).cast("int")
    vlo = F.element_at(sorted_arr, lo + 1)
    vhi = F.element_at(sorted_arr, hi + 1)
    return F.when(n > 0, vlo + (rank - lo.cast("double")) * (vhi - vlo))


def _numeric_sorted(raw: Any, ctx: ExprContext) -> tuple[Column, Column]:
    inp = _c(raw["input"], ctx)
    s = F.array_sort(
        F.filter(inp, lambda x: x.isNotNull()).cast("array<double>")
    )
    return s, F.size(s)


@_op("$median")
def _median_expr(raw: Any, ctx: ExprContext) -> Column:
    """Array-input expression form (Mongo 7.0); the accumulator form
    lives in operators/group.py.  Continuous interpolation (the engine's
    documented stance for $median/$percentile, matching Spark's
    median()/percentile() aggregates rather than Mongo's t-digest
    approximation)."""
    s, n = _numeric_sorted(raw, ctx)
    return _interp_percentile(s, n, 0.5)


@_op("$percentile")
def _percentile_expr(raw: Any, ctx: ExprContext) -> Column:
    s, n = _numeric_sorted(raw, ctx)
    ps = raw["p"]
    return F.array(*[_interp_percentile(s, n, p) for p in ps])


@_op("$sortArray")
def _sort_array(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    by = raw.get("sortBy", 1)
    if isinstance(by, dict):
        # field-wise sort over arrays of documents: an array_sort
        # comparator chaining the sort keys (null sorts smallest, as in
        # BSON order; descending reverses)
        specs = [(f, int(d)) for f, d in by.items()]

        def comparator(l: Column, r: Column) -> Column:
            result = F.lit(0)
            for f, d in reversed(specs):
                lf, rf = l.getField(f), r.getField(f)
                lt = (lf.isNull() & rf.isNotNull()) | (lf < rf)
                gt = (rf.isNull() & lf.isNotNull()) | (lf > rf)
                result = (
                    F.when(lt, F.lit(-d)).when(gt, F.lit(d)).otherwise(result)
                )
            return result

        return F.array_sort(inp, comparator)
    return F.array_sort(inp) if by == 1 else F.reverse(F.array_sort(inp))


@_op("$firstN")
def _first_n(raw: Any, ctx: ExprContext) -> Column:
    return F.slice(_c(raw["input"], ctx), 1, _c(raw["n"], ctx))


@_op("$lastN")
def _last_n(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    n = _c(raw["n"], ctx)
    start = F.greatest(F.size(inp) - n + 1, F.lit(1))
    return F.slice(inp, start, n)


@_op("$maxN")
def _max_n(raw: Any, ctx: ExprContext) -> Column:
    return F.slice(F.reverse(F.array_sort(_c(raw["input"], ctx))), 1, _c(raw["n"], ctx))


@_op("$minN")
def _min_n(raw: Any, ctx: ExprContext) -> Column:
    return F.slice(F.array_sort(_c(raw["input"], ctx)), 1, _c(raw["n"], ctx))


# expression ops whose result is an array (for single-arg type resolution)
_ARRAY_RESULT_OPS = {
    "$map", "$filter", "$slice", "$concatArrays", "$range", "$sortArray",
    "$zip", "$reverseArray", "$setUnion", "$setIntersection",
    "$setDifference", "$objectToArray", "$split", "$regexFindAll",
    "$firstN", "$lastN", "$maxN", "$minN",
}


def _is_array_operand(raw: Any, ctx: ExprContext) -> bool:
    """Best-effort static check: does this single operand evaluate to an
    array?  Field paths resolve through the schema; operator results by a
    known-arrays table; $literal lists are arrays."""
    if isinstance(raw, str) and raw.startswith("$") and not raw.startswith("$$"):
        t = ctx.type_of_path(split_path(raw[1:]))
        return isinstance(t, T.ArrayType)
    if isinstance(raw, dict):
        op = next((k for k in raw if k.startswith("$")), None)
        if op == "$literal":
            return isinstance(raw[op], list)
        return op in _ARRAY_RESULT_OPS
    return False


def _fold_array_arg(raw: Any, ctx: ExprContext) -> Optional[Column]:
    """Resolve $sum/$avg/$min/$max's operand to an array Column, or None
    when the operand is a scalar (MongoDB accepts scalars in expression
    position: $sum/$min/$max of a scalar is the value itself)."""
    if isinstance(raw, list):
        if len(raw) == 1:
            return _fold_array_arg(raw[0], ctx)
        return F.array(*[_c(a, ctx) for a in raw])
    if _is_array_operand(raw, ctx):
        return _c(raw, ctx)
    return None


def _numeric_only(arr: Column) -> Column:
    return F.filter(arr, lambda x: x.try_cast("double").isNotNull())


def _expr_sum(raw: Any, ctx: ExprContext) -> Column:
    arr = _fold_array_arg(raw, ctx)
    if arr is None:  # scalar operand: the numeric value, non-numeric -> 0
        return F.coalesce(_c(raw, ctx).try_cast("double"), F.lit(0.0))
    return F.coalesce(
        F.aggregate(
            _numeric_only(arr), F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ),
        F.lit(0.0),
    )


def _expr_avg(raw: Any, ctx: ExprContext) -> Column:
    arr = _fold_array_arg(raw, ctx)
    if arr is None:
        return _c(raw, ctx).try_cast("double")
    nums = _numeric_only(arr)
    return F.when(
        F.size(nums) > 0,
        F.aggregate(nums, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
        / F.size(nums),
    )


def _expr_minmax(is_max: bool):
    def op(raw: Any, ctx: ExprContext) -> Column:
        arr = _fold_array_arg(raw, ctx)
        if arr is None:  # scalar operand -> the value itself
            return _c(raw, ctx)
        return F.array_max(arr) if is_max else F.array_min(arr)

    return op


OPERATORS["$sum"] = _expr_sum
OPERATORS["$avg"] = _expr_avg
OPERATORS["$max"] = _expr_minmax(True)
OPERATORS["$min"] = _expr_minmax(False)


@_op("$regexFind")
def _regex_find(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    regex = raw["regex"]
    if not isinstance(regex, str):
        raise NotImplementedError("$regexFind needs a literal regex")
    m = F.regexp_extract(inp, regex, 0)
    found = F.regexp_like(inp, F.lit(regex))
    return F.when(
        found,
        F.struct(
            m.alias("match"),
            (F.regexp_instr(inp, F.lit(regex)) - 1).cast("int").alias("idx"),
        ),
    )


@_op("$regexFindAll")
def _regex_find_all(raw: Any, ctx: ExprContext) -> Column:
    inp = _c(raw["input"], ctx)
    regex = raw["regex"]
    if not isinstance(regex, str):
        raise NotImplementedError("$regexFindAll needs a literal regex")
    return F.regexp_extract_all(inp, F.lit(regex), 0)


OPERATORS["$binarySize"] = lambda raw, ctx: F.octet_length(_c(_args(raw)[0], ctx))
# BSON wire size is not reproducible without a BSON encoder; the engine's
# documented proxy is the UTF-8 byte length of the document's JSON
# encoding — same monotonicity ("which document is bigger"), different
# constant.  Null documents -> null, like Mongo.
OPERATORS["$bsonSize"] = lambda raw, ctx: F.octet_length(
    F.to_json(_c(_args(raw)[0], ctx))
)
OPERATORS["$toUUID"] = lambda raw, ctx: _c(_args(raw)[0], ctx).cast("string")
# Mongo's hashed-index key is an md5-folded BSON hash; without a BSON
# encoder the engine's documented proxy is the native 64-bit xxhash of
# the value — same contract (stable int64, uniform), different constant.
OPERATORS["$toHashedIndexKey"] = lambda raw, ctx: F.xxhash64(
    _c(_args(raw)[0], ctx)
)
OPERATORS["$tsSecond"] = lambda raw, ctx: F.unix_timestamp(_c(_args(raw)[0], ctx))
# BSON-timestamp ordinal: plain timestamps carry no per-second counter,
# so the increment is the sub-second ordinal proxy (microsecond part) —
# documents written in the same second order the same way
OPERATORS["$tsIncrement"] = lambda raw, ctx: F.pmod(
    # pmod, not %: pre-epoch micros are negative and % keeps the sign
    F.unix_micros(_c(_args(raw)[0], ctx).cast("timestamp")), 1_000_000
)
OPERATORS["$rand"] = lambda raw, ctx: F.rand()


# --------------------------------------------- dynamic documents (extension)
# The engine is fixed-schema per pipeline (SURVEY.md §1 "Schema system" —
# the single biggest model mismatch vs the reference's schema-less JSON).
# Open-world fields ride along as JSON strings or Spark 4 VariantType and
# are extracted with typed accessors — JVM-native, no UDF.


@_op("$parseJson")
def _parse_json(raw: Any, ctx: ExprContext) -> Column:
    """String -> VariantType (Spark 4): parse once, extract many.
    Malformed input -> null (try_ semantics, ANSI-safe)."""
    return F.try_parse_json(_c(_args(raw)[0], ctx))


@_op("$jsonGet")
def _json_get(raw: Any, ctx: ExprContext) -> Column:
    """Typed field extraction from a JSON string or variant column:
    ``{input, path, type?}``.  ``path`` is a JSONPath (``$.k`` or bare
    ``k``); ``type`` (default string) applies a try_cast — malformed or
    missing values become null, never errors."""
    inp = _c(raw["input"], ctx)
    path = raw["path"]
    if not path.startswith("$"):
        path = "$." + path
    typ = raw.get("type", "string")
    dtype = None
    if ctx.schema is not None and isinstance(raw["input"], str) and raw["input"].startswith("$"):
        name = raw["input"][1:]
        if "." not in name and name in ctx.schema.fieldNames():
            dtype = ctx.schema[name].dataType
    if dtype is not None and dtype.typeName() == "variant":
        return F.try_variant_get(inp, path, typ)
    return F.get_json_object(inp, path).try_cast(typ)
