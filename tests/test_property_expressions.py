"""Property test: randomized aggregation-expression trees, engine vs an
independent Python reference evaluator (MongoDB null-propagation and
truthiness semantics).  Seeded generation; all expressions for a round are
evaluated in ONE Spark select so the test stays fast."""

import math
import random

import pytest
from pyspark.sql import functions as F

from pincette_mongo_streams_spark.expressions import ExprContext, compile_expr

COLS = ["a", "b", "c"]
ROWS = [
    (1, 2, 3),
    (0, -5, 10),
    (None, 4, -1),
    (7, None, None),
    (-3, -3, 2),
    (100, 0, None),
    (None, None, None),
    (5, 5, 5),
]


def _gen_arith(rng: random.Random, depth: int):
    if depth <= 0 or rng.random() < 0.3:
        return rng.choice(["$" + c for c in COLS] + [rng.randint(-10, 10)])
    op = rng.choice(["$add", "$subtract", "$multiply", "$divide", "$abs",
                     "$ifNull", "$cond"])
    if op == "$abs":
        return {"$abs": [_gen_arith(rng, depth - 1)]}
    if op == "$ifNull":
        return {"$ifNull": [_gen_arith(rng, depth - 1), _gen_arith(rng, depth - 1)]}
    if op == "$cond":
        return {"$cond": [_gen_cmp(rng, depth - 1), _gen_arith(rng, depth - 1),
                          _gen_arith(rng, depth - 1)]}
    if op == "$add":
        return {"$add": [_gen_arith(rng, depth - 1) for _ in range(rng.randint(2, 3))]}
    return {op: [_gen_arith(rng, depth - 1), _gen_arith(rng, depth - 1)]}


def _gen_cmp(rng: random.Random, depth: int):
    # comparisons only over null-defaulted operands: Mongo orders null below
    # numbers (type-bracket order) while Spark nulls out — out of scope for
    # a fixed-schema engine, so the generator avoids null comparison operands
    op = rng.choice(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"])
    wrap = lambda e: {"$ifNull": [e, 0]}
    return {op: [wrap(_gen_arith(rng, depth)), wrap(_gen_arith(rng, depth))]}


def _ref(expr, row: dict):
    """Independent evaluator with MongoDB semantics."""
    if isinstance(expr, str) and expr.startswith("$"):
        return row[expr[1:]]
    if isinstance(expr, (int, float)):
        return expr
    (op, args), = expr.items()
    vals = [_ref(a, row) for a in args]
    if op == "$ifNull":
        return vals[0] if vals[0] is not None else vals[1]
    if op == "$cond":
        cond = vals[0]
        truthy = cond is not None and cond is not False and cond != 0
        return vals[1] if truthy else vals[2]
    if op == "$abs":
        return None if vals[0] is None else abs(vals[0])
    if any(v is None for v in vals):
        return None
    if op == "$add":
        return sum(vals)
    if op == "$subtract":
        return vals[0] - vals[1]
    if op == "$multiply":
        r = 1
        for v in vals:
            r *= v
        return r
    if op == "$divide":
        return None if vals[1] == 0 else vals[0] / vals[1]
    if op == "$eq":
        return vals[0] == vals[1]
    if op == "$ne":
        return vals[0] != vals[1]
    if op == "$gt":
        return vals[0] > vals[1]
    if op == "$gte":
        return vals[0] >= vals[1]
    if op == "$lt":
        return vals[0] < vals[1]
    if op == "$lte":
        return vals[0] <= vals[1]
    raise AssertionError(op)


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    if isinstance(a, float) or isinstance(b, float):
        if math.isinf(a) or math.isinf(b) or math.isnan(a) or math.isnan(b):
            return str(a) == str(b)
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_expression_trees_match_reference(spark, seed):
    rng = random.Random(seed)
    exprs = [_gen_arith(rng, 4) for _ in range(60)] + [
        _gen_cmp(rng, 3) for _ in range(20)
    ]
    df = spark.createDataFrame(ROWS, "a long, b long, c long")
    ectx = ExprContext(schema=df.schema)
    cols = [compile_expr(e, ectx).alias(f"e{i}") for i, e in enumerate(exprs)]
    got = df.select(*cols).collect()
    for ri, row in enumerate(ROWS):
        env = dict(zip(COLS, row))
        for i, e in enumerate(exprs):
            expected = _ref(e, env)
            actual = got[ri][f"e{i}"]
            assert _close(actual, expected), (
                f"seed={seed} row={env} expr={e}: engine={actual!r} "
                f"reference={expected!r}"
            )
