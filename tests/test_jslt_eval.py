"""The tier-2 pure-Python JSLT evaluator (operators/jslt_eval.py):
single-valued JSLT semantics, the builtin surface on dynamic values, and
a cross-check against the NATIVE compiler on shared-subset scripts."""

import random

import pytest

from pincette_mongo_streams_spark.operators.jslt_eval import (
    JsltEvalError,
    jslt_transform,
)

DOC = {"__key": "k7", "name": "Ada Lovelace", "age": 36, "score": 91.5,
       "nums": [3.0, 1.0, 2.0], "tags": ["a", "bb"],
       "obj": {"x": 1, "y": 2},
       "items": [{"k": "p", "v": 1}, {"k": "q", "v": 2}]}


@pytest.mark.parametrize("script,want", [
    ('{"n": .name, "a": .age + 1}', {"n": "Ada Lovelace", "a": 37}),
    ('{"s": .name + "!", "m": .age * 2}', {"s": "Ada Lovelace!", "m": 72}),
    ('def twice(x) $x * 2\n{"d": twice(.age)}', {"d": 72}),
    ('def fact(n) if ($n <= 1) 1 else $n * fact($n - 1)\n{"f": fact(6)}',
     {"f": 720}),
    ('{for (.obj) .key : .value * 10}', {"x": 10, "y": 20}),
    ('{"ks": [for (.obj) .key if (.value > 1)]}', {"ks": ["y"]}),
    ('let n = size(.nums)\n{"sc": [for (.nums) . * $n]}',
     {"sc": [9.0, 3.0, 6.0]}),
    ('{"second": .nums[1], "oob": .nums[9], "lastk": .items[-1].k}',
     {"second": 1.0, "oob": None, "lastk": "q"}),
    ('{"z": zip(.tags, .nums)}', {"z": [["a", 3.0], ["bb", 1.0]]}),
    ('{"t": if (.age > 18) "adult" else "minor"}', {"t": "adult"}),
    ('{"fb": fallback(.missing, .name)}', {"fb": "Ada Lovelace"}),
    ('{"j": to-json(.obj), "p": from-json("[1,2]")}',
     {"j": '{"x":1,"y":2}', "p": [1, 2]}),
    ('{"c": capture(.name, "(?<first>\\\\w+)")}', {"c": {"first": "Ada"}}),
    ('{"t": is-integer(.age), "d": is-decimal(.score), '
     '"o": is-object(.obj), "a": is-array(.nums)}',
     {"t": True, "d": True, "o": True, "a": True}),
    ('{"b0": boolean(""), "b1": boolean(.tags), "nn": not(.missing)}',
     {"b0": False, "b1": True, "nn": True}),
    ('{"pt": parse-time("2024-03-01 10:30:00", "yyyy-MM-dd HH:mm:ss")}',
     {"pt": 1709289000.0}),
    ('{"ft": format-time(1709288000, "yyyy-MM-dd")}', {"ft": "2024-03-01"}),
])
def test_evaluator_cases(script, want):
    assert jslt_transform(script)(DOC) == want


def test_internal_columns_stripped():
    got = jslt_transform('{"doc": ., *: .}')(DOC)
    assert "__key" not in got and "__key" not in got["doc"]


def test_spread_minus():
    got = jslt_transform('{* - age, obj, items, nums : .}')(DOC)
    assert set(got) == {"name", "score", "tags"}


def test_error_builtin():
    with pytest.raises(JsltEvalError, match="boom"):
        jslt_transform('{"x": error("boom")}')(DOC)


def test_object_plus_left_wins():
    got = jslt_transform('{"m": {"a": 1} + {"a": 2, "b": 3}}')(DOC)
    assert got == {"m": {"a": 1, "b": 3}}


def test_cross_check_against_native_compiler(spark):
    """Shared-subset scripts must agree between the native Columns tier
    and the evaluator — the two implementations cross-validate."""
    from pyspark.sql import Row

    from pincette_mongo_streams_spark import Context, compile_pipeline

    rng = random.Random(99)
    rows = [Row(_id=str(i), a=float(rng.randint(-5, 5)),
                b=float(rng.randint(1, 5)),
                xs=[float(rng.randint(-3, 9)) for _ in range(rng.randint(0, 4))])
            for i in range(6)]
    schema = "_id string, a double, b double, xs array<double>"
    scripts = [
        '{"_id": ._id, "s": .a + .b, "p": .a * 2}',
        '{"_id": ._id, "m": [for (.xs) . + 1]}',
        '{"_id": ._id, "c": if (.a > .b) 1 else 0}',
        'def sq(x) $x * $x\n{"_id": ._id, "q": sq(.a)}',
        '{"_id": ._id, "mx": max(.a, .b), "sm": sum(.xs)}',
    ]
    df = spark.createDataFrame(rows, schema)
    for script in scripts:
        native = compile_pipeline([{"$jslt": script}], Context(spark=spark))(df)
        got = {r["_id"]: r.asDict(recursive=True) for r in native.collect()}
        ev = jslt_transform(script)
        for row in rows:
            doc = {"_id": row._id, "a": row.a, "b": row.b, "xs": row.xs}
            want = ev(doc)
            have = got[row._id]
            for k, v in want.items():
                if isinstance(v, float):
                    assert have[k] == pytest.approx(v), (script, k)
                else:
                    assert have[k] == v, (script, k, have[k], v)


def test_tier2_preserves_message_key_and_rekeys(spark):
    """The tier-2 UDF bridge carries the internal key column through and
    re-derives it when the script changes _id (Script.java:67-73) — and
    never leaks __-internal columns into the document."""
    from pyspark.sql import Row

    from pincette_mongo_streams_spark import Context, compile_pipeline
    from pincette_mongo_streams_spark.operators.stateless import KEY_COL

    rows = [Row(__key="k7", _id="0", s=Row(a=1, b=2))]
    df = spark.createDataFrame(
        rows, "__key string, _id string, s struct<a:long,b:long>")
    # struct iteration forces tier 2; result has an _id -> key derives
    # from it (Script.java: result _id ?? original key)
    out = compile_pipeline([{"$jslt": '{"_id": "9", "ks": [for (.s) .key]}'}],
                           Context(spark=spark))(df)
    d = [r.asDict(recursive=True) for r in out.collect()][0]
    assert d[KEY_COL] == "9" and sorted(d["ks"]) == ["a", "b"]
    assert "__key" not in d.get("ks", [])
    # no _id in the result -> the original key survives the bridge
    out = compile_pipeline([{"$jslt": '{"ks": [for (.s) .key]}'}],
                           Context(spark=spark))(df)
    d = [r.asDict(recursive=True) for r in out.collect()][0]
    assert d[KEY_COL] == "k7"


def test_runaway_recursion_is_evaluator_error():
    """A non-terminating recursive def raises JsltEvalError, never a raw
    RecursionError that would kill the Spark task on one bad row."""
    import pytest

    from pincette_mongo_streams_spark.operators.jslt_eval import (
        JsltEvalError,
        jslt_transform,
    )

    run = jslt_transform("def f(x)\n  f($x + 1)\n\n{\"r\": f(1)}")
    with pytest.raises(JsltEvalError, match="recursion"):
        run({})


def test_array_and_string_slicing():
    """JSLT slicing [lo:hi] with negative bounds on arrays and strings
    (half-open, clamped, out-of-range -> empty) — tier-2 evaluator."""
    from pincette_mongo_streams_spark.operators.jslt_eval import (
        jslt_transform,
    )

    run = jslt_transform('{"m": .xs[1:3], "t": .xs[-2:], "h": .s[0:3], '
                         '"c": .s[1:-1], "o": .xs[5:9], "n": .nope[0:2]}')
    got = run({"xs": [1, 2, 3, 4], "s": "abcdef"})
    assert got == {"m": [2, 3], "t": [3, 4], "h": "abc", "c": "bcde",
                   "o": [], "n": None}


def test_tier2_module_imports(spark):
    """Scripts the Column compiler rejects (recursive module defs) fall
    to the tier-2 evaluator with the same resolver-served module defs."""
    from pyspark.sql import Row

    from pincette_mongo_streams_spark import Context, compile_pipeline

    modules = {"m": """
        def fact(n) if ($n <= 1) 1 else $n * fact($n - 1)
    """}
    rows = [Row(_id="0", n=5)]
    df = spark.createDataFrame(rows, "_id string, n long")
    ctx = Context(spark=spark, jslt_resolver=modules)
    out = compile_pipeline(
        [{"$jslt": 'import "m" as m\n{"f": m:fact(.n), "_id": ._id}'}],
        ctx)(df)
    assert [r.asDict() for r in out.collect()] == [{"f": 120, "_id": "0"}]
