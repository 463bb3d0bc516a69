"""Property test for the $match query language: randomized query documents
vs an independent Python predicate with MongoDB semantics."""

import random

import pytest

from pincette_mongo_streams_spark.expressions import ExprContext
from pincette_mongo_streams_spark.match import compile_match

ROWS = [
    {"a": 1, "b": "x", "t": ["p", "q"]},
    {"a": 0, "b": "y", "t": []},
    {"a": -5, "b": "x", "t": ["q"]},
    {"a": None, "b": None, "t": None},
    {"a": 100, "b": "zz", "t": ["p", "q", "r"]},
    {"a": 7, "b": "x", "t": ["r"]},
]


def _gen_query(rng: random.Random, depth: int) -> dict:
    kind = rng.random()
    if depth <= 0 or kind < 0.45:
        field = rng.choice(["a", "b"])
        if field == "a":
            choice = rng.random()
            if choice < 0.3:
                return {"a": rng.randint(-6, 8)}
            op = rng.choice(["$gt", "$gte", "$lt", "$lte", "$ne", "$eq"])
            return {"a": {op: rng.randint(-6, 8)}}
            # note: null rows make comparison ops false, matching Mongo's
            # "missing/null never satisfies $gt" behavior
        choice = rng.random()
        if choice < 0.4:
            return {"b": rng.choice(["x", "y", "zz", "nope"])}
        return {"b": {"$in": rng.sample(["x", "y", "zz", "nope"], k=2)}}
    if kind < 0.6:
        return {"$and": [_gen_query(rng, depth - 1) for _ in range(2)]}
    if kind < 0.75:
        return {"$or": [_gen_query(rng, depth - 1) for _ in range(2)]}
    if kind < 0.85:
        return {"$nor": [_gen_query(rng, depth - 1) for _ in range(2)]}
    if kind < 0.95:
        return {"t": {"$size": rng.randint(0, 3)}}
    return {"t": rng.choice(["p", "q", "r"])}  # array-contains equality


def _matches(q: dict, row: dict) -> bool:
    for k, v in q.items():
        if k == "$and":
            if not all(_matches(s, row) for s in v):
                return False
        elif k == "$or":
            if not any(_matches(s, row) for s in v):
                return False
        elif k == "$nor":
            if any(_matches(s, row) for s in v):
                return False
        elif isinstance(v, dict):
            val = row[k]
            for op, arg in v.items():
                if op == "$eq":
                    if val != arg:
                        return False
                elif op == "$ne":
                    if val == arg:
                        return False
                elif op in ("$gt", "$gte", "$lt", "$lte"):
                    if val is None:
                        return False
                    if op == "$gt" and not val > arg:
                        return False
                    if op == "$gte" and not val >= arg:
                        return False
                    if op == "$lt" and not val < arg:
                        return False
                    if op == "$lte" and not val <= arg:
                        return False
                elif op == "$in":
                    if val not in arg:
                        return False
                elif op == "$size":
                    if val is None or len(val) != arg:
                        return False
                else:
                    raise AssertionError(op)
        else:
            # implicit equality; on an array field: contains OR whole-equal
            val = row[k]
            if isinstance(val, list):
                if v not in val and v != val:
                    return False
            elif val != v:
                return False
    return True


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_random_match_queries(spark, seed):
    rng = random.Random(seed)
    queries = [_gen_query(rng, 2) for _ in range(60)]
    df = spark.createDataFrame(
        [(r["a"], r["b"], r["t"]) for r in ROWS],
        "a long, b string, t array<string>",
    )
    ectx = ExprContext(schema=df.schema)
    cols = [compile_match(q, ectx).alias(f"q{i}") for i, q in enumerate(queries)]
    got = df.select(*cols).collect()
    for ri, row in enumerate(ROWS):
        for i, q in enumerate(queries):
            expected = _matches(q, row)
            actual = bool(got[ri][f"q{i}"])
            assert actual == expected, (
                f"seed={seed} row={row} query={q}: engine={actual} "
                f"reference={expected}"
            )
