"""Property test for the jq/JSLT subset compilers: randomized expression
trees rendered as SCRIPT TEXT, parsed + compiled by the engine, and
checked against an independent Python evaluator on the same rows.  This
exercises tokenizer -> parser -> Column codegen end to end, not just the
AST.  Seeded generation; each round evaluates all scripts in one pass."""

import random

import pytest

from pincette_mongo_streams_spark import Context, compile_pipeline

COLS = ["a", "b", "c"]
ROWS = [
    (1.0, 2.0, 3.0),
    (0.0, -5.0, 10.0),
    (7.0, 4.0, -1.0),
    (-3.0, -3.0, 2.0),
    (100.0, 0.5, 12.0),
    (5.0, 5.0, 5.0),
]


def _gen(rng: random.Random, depth: int):
    """Returns (jslt_text, jq_text, python_eval) for a numeric expression.

    Generated trees avoid the cross-engine edge cases that are out of
    property scope (division by zero, null propagation — covered by
    dedicated tests): denominators are literal non-zeros and columns are
    non-null."""
    if depth <= 0 or rng.random() < 0.35:
        if rng.random() < 0.6:
            col = rng.choice(COLS)
            return f".{col}", f".{col}", lambda row, c=col: row[c]
        lit = rng.randint(-9, 9)
        return str(lit), str(lit), lambda row, v=lit: v
    kind = rng.choice(["add", "sub", "mul", "div", "if"])
    lt, lq, lf = _gen(rng, depth - 1)
    if kind == "div":
        denom = rng.choice([2, 4, 5, -2])
        return (f"({lt} / {denom})", f"({lq} / {denom})",
                lambda row, f=lf, d=denom: f(row) / d)
    rt, rq, rf = _gen(rng, depth - 1)
    if kind == "add":
        return (f"({lt} + {rt})", f"({lq} + {rq})",
                lambda row, f=lf, g=rf: f(row) + g(row))
    if kind == "sub":
        return (f"({lt} - {rt})", f"({lq} - {rq})",
                lambda row, f=lf, g=rf: f(row) - g(row))
    if kind == "mul":
        return (f"({lt} * {rt})", f"({lq} * {rq})",
                lambda row, f=lf, g=rf: f(row) * g(row))
    # comparison-guarded conditional
    ct, cq, cf = _gen(rng, depth - 1)
    op = rng.choice(["<", "<=", ">", ">=", "=="])
    py_op = {"<": lambda x, y: x < y, "<=": lambda x, y: x <= y,
             ">": lambda x, y: x > y, ">=": lambda x, y: x >= y,
             "==": lambda x, y: x == y}[op]
    jslt = f"(if ({ct} {op} {rt}) {lt} else 0)"
    jq = f"(if {cq} {op} {rq} then {lq} else 0 end)"

    def ev(row, cf=cf, rf=rf, lf=lf, py_op=py_op):
        return lf(row) if py_op(cf(row), rf(row)) else 0

    return jslt, jq, ev


@pytest.mark.parametrize("seed", [11, 23, 47])
@pytest.mark.parametrize("kind", ["jslt", "jq"])
def test_random_scripts_match_python_eval(spark, seed, kind):
    rng = random.Random(seed)
    cases = [_gen(rng, 3) for _ in range(25)]
    if kind == "jslt":
        body = ", ".join(f'"x{i}": {t}' for i, (t, _, _) in enumerate(cases))
        script = "{" + body + ", *: .}"
        stage = {"$jslt": script}
    else:
        body = ", ".join(f"x{i}: {q}" for i, (_, q, _) in enumerate(cases))
        script = ". + {" + body + "}"
        stage = {"$jq": script}
    df = spark.createDataFrame(ROWS, "a double, b double, c double")
    out = compile_pipeline([stage], Context(spark=spark))(df)
    rows = [r.asDict() for r in out.collect()]
    assert len(rows) == len(ROWS)
    for r in rows:
        base = {c: r[c] for c in COLS}
        for i, (_, _, ev) in enumerate(cases):
            expect = ev(base)
            got = r[f"x{i}"]
            assert got == pytest.approx(expect, rel=1e-9, abs=1e-9), (
                f"seed={seed} case={i} row={base}: engine {got} != py {expect}"
            )
