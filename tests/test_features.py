"""The Features analog: Context-level expression/match-operator and
jq/JSLT custom-function registries (reference Context.java:25-26 carries
``net.pincette.mongo.Features``; consumed by every expression compile —
AddFields.java:82 — and by the script stages — Jslt.java:27-33,
Jq.java:27-31).  Built-ins always win, the same precedence the reference
gives stage extensions (Pipeline.java:275-276)."""

import pytest
from pyspark.sql import functions as F

from pincette_mongo_streams_spark import Context, compile_pipeline
from pincette_mongo_streams_spark.expressions import ExprContext, compile_expr
from pincette_mongo_streams_spark.features import active_features


def _run(spark, rows, schema, pipeline, **ctx_kwargs):
    df = spark.createDataFrame(rows, schema)
    ctx = Context(spark=spark, **ctx_kwargs)
    return compile_pipeline(pipeline, ctx)(df)


def _double(args, ectx):
    return compile_expr(args, ectx) * 2


def test_custom_expression_operator(spark):
    out = _run(
        spark,
        [(3,), (5,)],
        "n long",
        [{"$addFields": {"d": {"$double": "$n"}}}],
        expression_extensions={"$double": _double},
    ).collect()
    assert sorted((r["n"], r["d"]) for r in out) == [(3, 6), (5, 10)]


def test_custom_expression_operator_nested(spark):
    # custom operators compose with built-ins in both directions
    out = _run(
        spark,
        [(3,)],
        "n long",
        [{"$addFields": {"d": {"$add": [{"$double": {"$add": ["$n", 1]}}, 1]}}}],
        expression_extensions={"$double": _double},
    ).collect()
    assert out[0]["d"] == 9


def test_builtins_win_over_expression_extension(spark):
    # registering "$add" must NOT shadow the built-in (Pipeline.java:275-276)
    out = _run(
        spark,
        [(3,)],
        "n long",
        [{"$addFields": {"s": {"$add": ["$n", 1]}}}],
        expression_extensions={"$add": lambda a, c: F.lit(-999)},
    ).collect()
    assert out[0]["s"] == 4


def test_unknown_operator_still_raises(spark):
    with pytest.raises(NotImplementedError):
        _run(spark, [(1,)], "n long",
             [{"$addFields": {"x": {"$nosuchop": "$n"}}}]).collect()


def test_scope_is_per_pipeline(spark):
    # the extension must not leak outside its pipeline's compile/run scope
    _run(spark, [(1,)], "n long",
         [{"$addFields": {"d": {"$double": "$n"}}}],
         expression_extensions={"$double": _double}).collect()
    with pytest.raises(NotImplementedError):
        compile_expr({"$double": "$n"}, ExprContext())


def test_custom_match_operator(spark):
    def len_eq(col, arg, ectx):
        return F.length(col) == F.lit(arg)

    out = _run(
        spark,
        [("ab",), ("abc",), ("abcd",)],
        "s string",
        [{"$match": {"s": {"$lenEq": 3}}}],
        match_extensions={"$lenEq": len_eq},
    ).collect()
    assert [r["s"] for r in out] == ["abc"]


def test_custom_match_operator_mixed_with_builtin(spark):
    def len_eq(col, arg, ectx):
        return F.length(col) == F.lit(arg)

    out = _run(
        spark,
        [("ab",), ("abc",), ("xyz",)],
        "s string",
        [{"$match": {"s": {"$lenEq": 3, "$lt": "b"}}}],
        match_extensions={"$lenEq": len_eq},
    ).collect()
    assert [r["s"] for r in out] == ["abc"]


def test_custom_jslt_function(spark):
    # unknown function name pushes the script off the native compiler to
    # the tier-2 evaluator, where Context.jslt_functions resolves it.
    # (Functions ship to executors inside the UDF closure — lambdas /
    # closures pickle by value; module-level functions need their module
    # importable on the executors.)
    _shout = lambda s: (s or "").upper() + "!"
    out = _run(
        spark,
        [("hi", 1)],
        "msg string, n long",
        [{"$jslt": '{"loud": shout(.msg), "n": .n}'}],
        jslt_functions={"shout": _shout},
    ).collect()
    assert out[0]["loud"] == "HI!"
    assert out[0]["n"] == 1


def test_jslt_builtin_and_def_win_over_custom(spark):
    # script-local defs and builtins take precedence over custom functions
    out = _run(
        spark,
        [("hi",)],
        "msg string",
        # size() is a builtin; a custom "size" must not shadow it.  The
        # custom marker() forces tier 2 so the custom registry is live.
        [{"$jslt": '{"n": size(.msg), "m": marker(.msg)}'}],
        jslt_functions={"size": lambda v: -1, "marker": lambda v: "custom"},
    ).collect()
    assert out[0]["n"] == 2
    assert out[0]["m"] == "custom"


def test_custom_jq_function(spark):
    _revved = lambda inp, s: (s or "")[::-1]
    out = _run(
        spark,
        [("abc", 7)],
        "s string, n long",
        [{"$jq": "{rev: revved(.s), n: .n}"}],
        jq_functions={"revved": _revved},
    ).collect()
    assert out[0]["rev"] == "cba"
    assert out[0]["n"] == 7


def test_jq_builtin_wins_over_custom(spark):
    out = _run(
        spark,
        [("abc",)],
        "s string",
        # length is a builtin; marker forces the interpreter path
        [{"$jq": "{n: (.s | length), m: marker(.s)}"}],
        jq_functions={"length": lambda inp: -1, "marker": lambda inp, v: "c"},
    ).collect()
    assert out[0]["n"] == 3
    assert out[0]["m"] == "c"


def test_match_extension_in_expr_context(spark):
    # $match extensions also work under $expr-free nested forms ($elemMatch)
    def len_eq(col, arg, ectx):
        return F.length(col) == F.lit(arg)

    out = _run(
        spark,
        [(["ab", "abc"],), (["x"],)],
        "a array<string>",
        [{"$match": {"a": {"$elemMatch": {"$lenEq": 3}}}}],
        match_extensions={"$lenEq": len_eq},
    ).collect()
    assert len(out) == 1


def test_feature_scope_is_per_thread():
    """Concurrent pipeline compiles (e.g. two streaming queries'
    foreachBatch threads) must not see each other's registries or pop
    each other's frames — the scope stack is thread-local."""
    import threading
    import time as _t

    from pincette_mongo_streams_spark.features import (
        expression_extension,
    )

    errs: list = []

    class C:
        def __init__(self, ops):
            self.expression_extensions = ops

    def worker(name, present, absent):
        try:
            with active_features(C({present: lambda a, c: None})):
                for _ in range(200):
                    if expression_extension(present) is None:
                        raise AssertionError(f"{name}: lost own extension")
                    if expression_extension(absent) is not None:
                        raise AssertionError(f"{name}: sees foreign extension")
                    _t.sleep(0)
        except Exception as e:  # surface across the thread boundary
            errs.append(e)

    t1 = threading.Thread(target=worker, args=("t1", "$one", "$two"))
    t2 = threading.Thread(target=worker, args=("t2", "$two", "$one"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs


def test_active_features_nesting():
    class C1:
        expression_extensions = {"$one": lambda a, c: F.lit(1)}

    class C2:
        expression_extensions = {"$two": lambda a, c: F.lit(2)}

    with active_features(C1()):
        with active_features(C2()):
            # inner scope sees both (outer pipelines' features remain
            # visible to nested sub-pipeline compiles)
            assert compile_expr({"$one": 1}, ExprContext()) is not None
            assert compile_expr({"$two": 1}, ExprContext()) is not None
        with pytest.raises(NotImplementedError):
            compile_expr({"$two": 1}, ExprContext())


def test_memo_unsafe_propagates_from_child_contexts():
    # ADVICE r11: $let/$map/$filter/$reduce compile their bodies in
    # contexts derived via with_vars/with_schema; an extension operator
    # resolved in the CHILD must stop the PARENT from memoizing the
    # enclosing expression (the flag lives in a shared cell)
    ctx = ExprContext()
    child = ctx.with_vars(x=F.lit(1)).with_schema(None)
    assert ctx._memo_unsafe is False
    child._memo_unsafe = True
    assert ctx._memo_unsafe is True
    # a freshly-constructed context does NOT share the cell
    assert ExprContext()._memo_unsafe is False


def test_nested_extension_poisons_enclosing_memo(spark):
    # functional form of the hazard: an enclosing expression whose $let
    # body resolves a (possibly non-deterministic) extension op must not
    # be memoized in the parent context
    ctx = Context(spark=spark, expression_extensions={"$double": _double})
    ectx = ExprContext()
    enclosing = {"$add": [
        {"$let": {"vars": {"v": 1}, "in": {"$double": "$$v"}}}, 1]}
    with active_features(ctx):
        compile_expr(enclosing, ectx)
    assert ectx._memo_unsafe is True
    assert repr(enclosing) not in ectx._memo
