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


# ---------------------------------------------------------------- folds
# r3: reduce / [foreach] / map / as-bindings (jq) and for-comprehensions
# (JSLT) — randomized over an array column, checked against Python folds.

FOLD_ROWS = [
    (2.0, [1.0, 2.0, 3.0]),
    (5.0, [0.0, -1.0, 4.0, 2.5]),
    (-1.0, []),
    (0.5, [10.0]),
    (3.0, [-2.0, -2.0, 7.0, 1.0, 0.25]),
]


@pytest.mark.parametrize("seed", [5, 17, 31])
def test_random_jq_folds_match_python_eval(spark, seed):
    rng = random.Random(seed)
    cases = []
    for i in range(8):
        k = rng.randint(-4, 4) or 2
        init = rng.randint(-3, 3)
        form = rng.choice(["reduce", "foreach", "map", "as"])
        if form == "reduce":
            script = f"reduce .xs[] as $e ({init}; . + $e * {k})"
            ev = (lambda row, I=init, K=k:
                  float(I) + sum(e * K for e in row["xs"]))
        elif form == "foreach":
            script = f"[foreach .xs[] as $e ({init}; . + $e * {k})]"

            def ev(row, I=init, K=k):
                acc, outs = float(I), []
                for e in row["xs"]:
                    acc = acc + e * K
                    outs.append(acc)
                return outs
        elif form == "map":
            script = f"(.xs | map(. * {k} + {init}))"
            ev = (lambda row, I=init, K=k:
                  [e * K + I for e in row["xs"]])
        else:
            script = f"(.a as $t | $t * {k} + {init})"
            ev = lambda row, I=init, K=k: row["a"] * K + I
        cases.append((script, ev))
    body = ", ".join(f"x{i}: {s}" for i, (s, _) in enumerate(cases))
    df = spark.createDataFrame(FOLD_ROWS, "a double, xs array<double>")
    out = compile_pipeline(
        [{"$jq": ". + {" + body + "}"}], Context(spark=spark))(df)
    rows = [r.asDict() for r in out.collect()]
    for r in rows:
        base = {"a": r["a"], "xs": r["xs"]}
        for i, (_, ev) in enumerate(cases):
            assert r[f"x{i}"] == pytest.approx(ev(base), rel=1e-9, abs=1e-9), (
                f"seed={seed} case={i} script={cases[i][0]} row={base}")


@pytest.mark.parametrize("seed", [7, 13, 29])
def test_random_jslt_for_match_python_eval(spark, seed):
    rng = random.Random(seed)
    cases = []
    for i in range(8):
        k = rng.randint(-4, 4) or 2
        t = rng.randint(-2, 3)
        if rng.random() < 0.5:
            script = f"[for (.xs) . * {k}]"
            ev = lambda row, K=k: [e * K for e in row["xs"]]
        else:
            script = f"[for (.xs) . * {k} if (. > {t})]"
            ev = (lambda row, K=k, T=t:
                  [e * K for e in row["xs"] if e > T])
        cases.append((script, ev))
    body = ", ".join(f'"x{i}": {s}' for i, (s, _) in enumerate(cases))
    df = spark.createDataFrame(FOLD_ROWS, "a double, xs array<double>")
    out = compile_pipeline(
        [{"$jslt": "{" + body + ", *: .}"}], Context(spark=spark))(df)
    rows = [r.asDict() for r in out.collect()]
    for r in rows:
        base = {"a": r["a"], "xs": r["xs"]}
        for i, (_, ev) in enumerate(cases):
            assert r[f"x{i}"] == pytest.approx(ev(base), rel=1e-9, abs=1e-9), (
                f"seed={seed} case={i} script={cases[i][0]} row={base}")
