"""The JSLT-subset compiler (operators/jslt.py): scripts beyond the
object-template fast path compile to native Columns — paths, operators,
if/else, let, builtins, spread vs projecting templates."""

import pytest
from pyspark.sql import Row

from pincette_mongo_streams_spark import Context, compile_pipeline


def _run(spark, script, rows=None, schema=None):
    rows = rows or [Row(_id="0", name="Ada Lovelace", age=36,
                        score=91.5, tags=["a", "b"])]
    df = spark.createDataFrame(rows, schema) if schema else spark.createDataFrame(rows)
    out = compile_pipeline([{"$jslt": script}], Context(spark=spark))(df)
    return [r.asDict(recursive=True) for r in out.collect()]


def test_spread_template_with_expressions(spark):
    docs = _run(spark, '{"upper": uppercase(.name), "next": .age + 1, *: .}')
    d = docs[0]
    assert d["upper"] == "ADA LOVELACE" and d["next"] == 37
    assert d["name"] == "Ada Lovelace" and d["tags"] == ["a", "b"]


def test_projecting_template_without_spread(spark):
    docs = _run(spark, '{"n": .name, "half": .score / 2}')
    assert docs == [{"n": "Ada Lovelace", "half": 45.75}]


def test_if_else_and_comparisons(spark):
    docs = _run(spark, '{"grown": if (.age >= 18) "yes" else "no", *: .}')
    assert docs[0]["grown"] == "yes"
    docs = _run(spark, '{"x": if (.age < 18) 1, *: .}')
    assert docs[0]["x"] is None


def test_string_concat_plus(spark):
    docs = _run(spark, '{"label": .name + "/" + .age, *: .}')
    assert docs[0]["label"] == "Ada Lovelace/36"


def test_let_bindings(spark):
    docs = _run(spark, 'let base = .score * 2\n{"double": $base, *: .}')
    assert docs[0]["double"] == 183.0


def test_builtins(spark):
    docs = _run(spark, """
    // line comment
    {"n_tags": size(.tags), "n_name": size(.name),
     "lo": lowercase(.name), "tr": trim("  x  "),
     "has_a": contains("a", .tags), "in_name": contains("Ada", .name),
     "parts": split(.name, " "), "joined": join(.tags, "-"),
     "re": test(.name, "^Ada"), "rounded": round(.score),
     "fl": floor(.score), "ce": ceiling(.score),
     "s": string(.age), "num": number("12.5"),
     *: .}
    """)
    d = docs[0]
    assert d["n_tags"] == 2 and d["n_name"] == 12
    assert d["lo"] == "ada lovelace" and d["tr"] == "x"
    assert d["has_a"] is True and d["in_name"] is True
    assert d["parts"] == ["Ada", "Lovelace"] and d["joined"] == "a-b"
    assert d["re"] is True and d["rounded"] == 92
    assert d["fl"] == 91 and d["ce"] == 92
    assert d["s"] == "36" and d["num"] == 12.5


def test_absent_path_is_null(spark):
    docs = _run(spark, '{"missing": .nope.deep, *: .}')
    assert docs[0]["missing"] is None


def test_nested_object_and_array_values(spark):
    docs = _run(spark, '{"o": {"a": .age, "b": [1, .score]}, *: .}')
    assert docs[0]["o"] == {"a": 36, "b": [1.0, 91.5]}


def test_rekey_on_new_id(spark):
    from pincette_mongo_streams_spark.operators.stateless import KEY_COL

    rows = [Row(__key="0", _id="0", test=0)]
    df_schema = "__key string, _id string, test long"
    docs = _run(spark, '{"_id": "9", *: .}', rows=rows, schema=df_schema)
    assert docs[0]["_id"] == "9" and docs[0][KEY_COL] == "9"


def test_unsupported_raises_jvm_boundary(spark):
    # bare `for` outside brackets is invalid JSLT: both the native
    # compiler and the tier-2 evaluator's shared parser reject it, and
    # the boundary error is still loud (r3)
    with pytest.raises(NotImplementedError, match="JSLT beyond"):
        _run(spark, 'for (.tags) { "t": . }')


def test_projecting_template_preserves_message_key(spark):
    """A spread-less template replaces the document, not the message key
    (ADVICE r2 medium)."""
    from pincette_mongo_streams_spark.operators.stateless import KEY_COL

    rows = [Row(__key="k7", _id="0", test=5)]
    docs = _run(spark, '{"t": .test + 1}', rows=rows,
                schema="__key string, _id string, test long")
    assert docs == [{KEY_COL: "k7", "t": 6}]


def test_whole_document_value_excludes_internal_columns(spark):
    rows = [Row(__key="k7", _id="0", test=5)]
    docs = _run(spark, '{"doc": ., *: .}', rows=rows,
                schema="__key string, _id string, test long")
    assert docs[0]["doc"] == {"_id": "0", "test": 5}


def test_unspaced_subtraction(spark):
    """`.score-1` is subtraction, not a path named `score-1` (ADVICE r2)."""
    docs = _run(spark, '{"down": .score-1, "up": .score+1}')
    assert docs == [{"down": 90.5, "up": 92.5}]


def test_for_comprehensions(spark):
    """r3: JSLT for loops compile to transform/filter HOFs (closing the
    former JVM-only boundary for the array/object comprehension forms)."""
    rows = [Row(_id="0", nums=[1, 2, 3, 4], tags=["a", "bb"],
                items=[Row(k="x", v=1), Row(k="y", v=2)])]
    schema = ("_id string, nums array<long>, tags array<string>, "
              "items array<struct<k:string,v:long>>")
    d = _run(spark, '{"doubled": [for (.nums) . * 2], *: .}',
             rows=rows, schema=schema)[0]
    assert d["doubled"] == [2, 4, 6, 8]
    d = _run(spark, '{"big": [for (.nums) . if (. > 2)], *: .}',
             rows=rows, schema=schema)[0]
    assert d["big"] == [3, 4]
    # element paths into struct arrays
    d = _run(spark, '{"keys": [for (.items) .k], "tens": [for (.items) .v * 10]}',
             rows=rows, schema=schema)[0]
    assert d == {"keys": ["x", "y"], "tens": [10, 20]}
    # object-for -> map (dynamic keys)
    d = _run(spark, '{"m": {for (.tags) . : size(.)}, *: .}',
             rows=rows, schema=schema)[0]
    assert d["m"] == {"a": 1, "bb": 2}
    # document-scoped let inside the lambda
    d = _run(spark, 'let n = size(.nums)\n{"scaled": [for (.nums) . * $n], *: .}',
             rows=rows, schema=schema)[0]
    assert d["scaled"] == [4, 8, 12, 16]


def test_native_array_indexing(spark):
    rows = [Row(_id="0", nums=[10, 20, 30],
                items=[Row(k="x", v=1), Row(k="y", v=2)])]
    schema = ("_id string, nums array<long>, "
              "items array<struct<k:string,v:long>>")
    d = _run(spark, '{"first": .nums[0], "k1": .items[1].k, '
                    '"oob": .nums[5], *: .}',
             rows=rows, schema=schema)[0]
    assert d["first"] == 10 and d["k1"] == "y" and d["oob"] is None


def test_extended_builtins(spark):
    """r3: the wider schibsted-JSLT builtin surface, all native Columns:
    fallback/min/max/sum/mod, string predicates + replace + sha256-hex,
    boolean()/is-* (static types make is-* compile-time), array zip /
    zip-with-index / index-of / flatten, to-json, parse-time /
    format-time, capture (named regex groups), parse-url."""
    rows = [Row(_id="0", name="Ada Lovelace", age=36, score=91.5,
                nums=[3.0, 1.0, 2.0], more=[9.0, 8.0, 7.0],
                nested=[[1, 2], [3]], tags=["a", "b"],
                url="https://example.com:8080/p/x?q=1#frag",
                ts="2024-03-01 10:30:00", note=None)]
    schema = ("_id string, name string, age long, score double, "
              "nums array<double>, more array<double>, "
              "nested array<array<long>>, tags array<string>, "
              "url string, ts string, note string")
    d = _run(spark, '''{
      "fb": fallback(.note, .name),
      "mn": min(.age, 40), "sm": sum(.nums), "md": mod(.age, 10),
      "sw": starts-with(.name, "Ada"), "rep": replace(.name, "[aeiou]", "_"),
      "b1": boolean(.note), "b2": boolean(.tags),
      "ii": is-integer(.age), "idec": is-decimal(.score),
      "ia": is-array(.nums), "ix": index-of(.nums, 2.0),
      "z": zip(.nums, .more), "zi": zip-with-index(.tags),
      "fl": flatten(.nested), "tj": to-json(.nums),
      "ft": format-time(1709288000, "yyyy-MM-dd"),
      "cap": capture(.name, "(?<first>\\\\w+) (?<last>\\\\w+)"),
      "host": get-key(parse-url(.url), "host")
    }''', rows=rows, schema=schema)[0]
    assert d["fb"] == "Ada Lovelace" and d["mn"] == 36
    assert d["sm"] == 6.0 and d["md"] == 6
    assert d["sw"] is True and d["rep"] == "Ad_ L_v_l_c_"
    assert d["b1"] is False and d["b2"] is True
    assert d["ii"] is True and d["idec"] is True and d["ia"] is True
    assert d["ix"] == 2
    assert d["z"] == [[3.0, 9.0], [1.0, 8.0], [2.0, 7.0]]
    assert d["zi"] == [{"value": "a", "index": 0},
                       {"value": "b", "index": 1}]
    assert d["fl"] == [1, 2, 3] and d["tj"] == "[3.0,1.0,2.0]"
    assert d["ft"] == "2024-03-01"
    assert d["cap"] == {"first": "Ada", "last": "Lovelace"}
    assert d["host"] == "example.com"


def test_hetero_zip_falls_to_tier2(spark):
    """zip() of differently-typed arrays has no typed Column shape — the
    native compiler refuses and the tier-2 evaluator takes over (r3).
    The JSON bridge coerces mixed pairs to the inferred common type."""
    rows = [Row(_id="0", nums=[1.0], tags=["a"])]
    schema = "_id string, nums array<double>, tags array<string>"
    d = _run(spark, '{"bad": zip(.tags, .nums)}', rows=rows, schema=schema)[0]
    assert d["bad"] == [["a", "1.0"]]


def test_tier2_evaluator_recursive_def_and_object_iteration(spark):
    """r3: recursive defs and struct-object iteration run on the
    pure-Python tier-2 evaluator (operators/jslt_eval.py) instead of
    raising the JVM-only boundary."""
    rows = [Row(_id="0", age=5, s=Row(a=1, b=2))]
    schema = "_id string, age long, s struct<a:long,b:long>"
    d = _run(spark, 'def fact(n) if ($n <= 1) 1 else $n * fact($n - 1)\n'
                    '{"f": fact(.age), "ks": [for (.s) .key]}',
             rows=rows, schema=schema)[0]
    assert d["f"] == 120 and sorted(d["ks"]) == ["a", "b"]


def test_def_inlines_natively_and_map_iteration_is_native(spark):
    """Non-recursive defs inline into Catalyst expressions; map-typed
    object iteration uses map_entries — no Python eval nodes."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [Row(_id="0", age=36, m={"x": 1, "y": 2})]
    df = spark.createDataFrame(rows, "_id string, age long, m map<string,long>")
    out = compile_pipeline([{"$jslt":
        'def twice(x) $x * 2\n'
        '{"d": twice(twice(.age)), "ks": [for (.m) .key], '
        '"tens": {for (.m) .key : .value * 10}}'}],
        Context(spark=spark))(df)
    d = [r.asDict(recursive=True) for r in out.collect()][0]
    assert d["d"] == 144 and sorted(d["ks"]) == ["x", "y"]
    assert d["tens"] == {"x": 10, "y": 20}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_spread_minus_exclusions(spark):
    """`* - a, b : .` copies the rest of the document except the listed
    keys (JSLT matcher exclusions), natively."""
    d = _run(spark, '{* - age, note : ., "extra": 1}')[0]
    assert "age" not in d and "note" not in d
    assert d["name"] == "Ada Lovelace" and d["extra"] == 1


def test_builtin_edge_semantics_match_tier2(spark):
    """r3 review fixes: zip truncates to the shorter array (no null
    padding), zip-with-index of an empty array is empty (no phantom
    descending sequence), min/max return null when either side is null
    — all matching the tier-2 evaluator."""
    rows = [Row(_id="0", xs=[1.0, 2.0, 3.0], ys=[9.0], empty=[],
                a=None, b=5.0)]
    schema = ("_id string, xs array<double>, ys array<double>, "
              "empty array<double>, a double, b double")
    d = _run(spark, '{"z": zip(.xs, .ys), "zi": zip-with-index(.empty), '
                    '"mn": min(.a, .b), "mx": max(.a, .b)}',
             rows=rows, schema=schema)[0]
    assert d["z"] == [[1.0, 9.0]]
    assert d["zi"] == []
    assert d["mn"] is None and d["mx"] is None
    from pincette_mongo_streams_spark.operators.jslt_eval import (
        jslt_transform,
    )
    doc = {"xs": [1.0, 2.0, 3.0], "ys": [9.0], "empty": [],
           "a": None, "b": 5.0}
    t2 = jslt_transform('{"z": zip(.xs, .ys), '
                        '"zi": zip-with-index(.empty), '
                        '"mn": min(.a, .b), "mx": max(.a, .b)}')(doc)
    assert t2["z"] == [[1.0, 9.0]] and t2["zi"] == []
    assert t2["mn"] is None and t2["mx"] is None


def test_capture_ignores_noncapturing_groups(spark):
    """Lookarounds / non-capturing groups must not shift the named-group
    numbering in regexp_extract (r3 review fix)."""
    rows = [Row(_id="0", s="price: 42 usd")]
    d = _run(spark, r'{"c": capture(.s, "(?:price): (?<amount>\\d+) (?<unit>\\w+)")}',
             rows=rows, schema="_id string, s string")[0]
    assert d["c"] == {"amount": "42", "unit": "usd"}


def test_array_string_slicing_native(spark):
    """JSLT slicing compiles to native slice()/substr() Columns (no
    Python in the plan): half-open [lo:hi], negative bounds, clamped
    out-of-range."""
    from pyspark.sql import Row as _Row

    rows = [_Row(_id="0", xs=[1, 2, 3, 4], s="abcdef")]
    df = spark.createDataFrame(rows, "_id string, xs array<int>, s string")
    out = compile_pipeline(
        [{"$jslt": '{"m": .xs[1:3], "t": .xs[-2:], "h": .s[0:3], '
                   '"c": .s[1:-1], "o": .xs[5:9]}'}],
        Context(spark=spark))(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    d = [r.asDict() for r in out.collect()][0]
    assert list(d["m"]) == [2, 3] and list(d["t"]) == [3, 4]
    assert d["h"] == "abc" and d["c"] == "bcde" and list(d["o"]) == []


def test_module_imports_native(spark):
    """`import "m" as m` + `m:fn(...)`: the Context.jslt_resolver seam
    (reference Features resolver hook, Jslt.java:19-36).  Module defs
    inline natively — no Python in the plan; module-level lets and
    sibling/nested imports resolve module-locally."""
    modules = {
        "util": """
            let factor = 10
            def scale(x) $x * $factor
            def scale2(x) scale(scale($x))
        """,
        "text": """
            import "util" as u
            def shout(s) uppercase($s) + "!"
            def big(x) u:scale($x)
        """,
    }
    rows = [Row(_id="0", name="Ada Lovelace", age=36,
                score=91.5, tags=["a", "b"])]
    df = spark.createDataFrame(rows)
    ctx = Context(spark=spark, jslt_resolver=modules)
    out = compile_pipeline(
        [{"$jslt": 'import "util" as u\nimport "text" as t\n'
                   '{"ten": u:scale(.age), "hundred": u:scale2(1), '
                   '"s": t:shout(.name), "b": t:big(2), *: .}'}],
        ctx)(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    d = [r.asDict() for r in out.collect()][0]
    assert d["ten"] == 360 and d["hundred"] == 100
    assert d["s"] == "ADA LOVELACE!" and d["b"] == 20
    assert d["name"] == "Ada Lovelace"  # spread intact


def test_module_import_errors(spark):
    """Imports without a resolver, unresolved modules, circular imports,
    and module bodies are compile-time errors (surfaced as the stage's
    NotImplementedError after both tiers reject)."""
    rows = [Row(_id="0", name="x", age=1, score=1.0, tags=["a"])]
    df = spark.createDataFrame(rows)

    def run(script, resolver=None):
        ctx = Context(spark=spark, jslt_resolver=resolver)
        return compile_pipeline([{"$jslt": script}], ctx)(df).collect()

    with pytest.raises(NotImplementedError):
        run('import "m" as m\n{"x": m:f(1)}')  # no resolver
    with pytest.raises(NotImplementedError):
        run('import "m" as m\n{"x": m:f(1)}', {"other": "def f(x) $x"})
    loop = {"a": 'import "b" as b\ndef f(x) b:g($x)',
            "b": 'import "a" as a\ndef g(x) a:f($x)'}
    with pytest.raises(NotImplementedError):
        run('import "a" as a\n{"x": a:f(1)}', loop)
    with pytest.raises(NotImplementedError):
        run('import "m" as m\n{"x": m:f(1)}',
            {"m": 'def f(x) $x\n{"body": 1}'})  # module body
