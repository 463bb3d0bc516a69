"""The tier-2 pure-Python jq interpreter (operators/jq_interp.py):
stream semantics, polymorphic arithmetic, the long-tail builtins, and a
cross-check against the NATIVE compiler on shared-subset scripts (both
tiers must agree)."""

import random

import pytest

from pincette_mongo_streams_spark.operators.jq_interp import (
    JqInterpError,
    jq_all,
    jq_first,
)

DOC = {"a": 2, "b": 3, "name": "Ada Lovelace", "xs": [4.0, 1.0, 3.0],
       "tags": ["x", "y"], "items": [{"k": "p", "v": 1}, {"k": "q", "v": 2}]}


@pytest.mark.parametrize("script,want", [
    (".a + .b", 5),
    ("[.xs[] | select(. > 2)]", [4.0, 3.0]),
    (".xs[0], .xs[-1]", None),  # handled in stream test below
    ('"\\(.a) and \\(.b)"', "2 and 3"),
    ("to_entries | length", 6),
    ("reduce .xs[] as $x (0; . + $x)", 8.0),
    ("[foreach .xs[] as $x (0; . + $x)]", [4.0, 5.0, 8.0]),
    ("{(.name | ascii_downcase): .a}", {"ada lovelace": 2}),
    (".items | group_by(.k) | map(.[0].k)", ["p", "q"]),
    (".items | sort_by(-.v) | map(.v)", [2, 1]),
    (".items | max_by(.v) | .v", 2),
    ("def tot: map(.v) | add; .items | tot", 3),
    ("def scale($k): map(. * $k); .xs | scale(10)", [40.0, 10.0, 30.0]),
    ("try error(\"boom\") catch .", "boom"),
    (".nope.deeper?", None),
    ("del(.a, .b) | keys", ["items", "name", "tags", "xs"]),
    (".xs | add / length", 8.0 / 3),
    ("[range(2; 9; 3)]", [2, 5, 8]),
    ('{a, extra: 1}', {"a": 2, "extra": 1}),
    ('[paths] | length', 17),
    ("[.items[].v]", [1, 2]),
    (".items[1].k", "q"),
    (".xs[1:]", [1.0, 3.0]),
    ('. as $d | .xs | map(. + $d.a)', [6.0, 3.0, 5.0]),
    ('if .a > 10 then "big" elif .a > 1 then "mid" else "small" end',
     "mid"),
])
def test_interpreter_cases(script, want):
    if want is None and "," in script:
        assert jq_all(script)(DOC) == [4.0, 3.0]
    else:
        assert jq_first(script)(DOC) == want


def test_stream_semantics():
    assert jq_all(".xs[]")(DOC) == [4.0, 1.0, 3.0]
    assert jq_all(".a, .b, empty, .a")(DOC) == [2, 3, 2]
    assert jq_all("(.a, .b) + 10")(DOC) == [12, 13]


def test_jq_total_order():
    # null < false < true < numbers < strings < arrays < objects
    mixed = [[1], "s", None, True, 0, False, {"a": 1}]
    got = jq_first("sort")(mixed)
    assert got == [None, False, True, 0, "s", [1], {"a": 1}]


def test_polymorphic_arithmetic():
    assert jq_first(". + [3]")([1, 2]) == [1, 2, 3]
    assert jq_first('. + {"b": 2}')({"a": 1}) == {"a": 1, "b": 2}
    assert jq_first(". - [2]")([1, 2, 3]) == [1, 3]
    assert jq_first('. * {"b": {"c": 1}}')({"b": {"d": 2}}) == \
        {"b": {"d": 2, "c": 1}}
    assert jq_first('. / ","')("a,b") == ["a", "b"]
    assert jq_first(". % 3")(7) == 1


def test_unsupported_is_loud():
    for bad in ("limit(2; .xs[])", "input", "..|numbers"):
        with pytest.raises(JqInterpError):
            jq_first(bad)(DOC)


def test_runtime_vs_parse_errors():
    from pincette_mongo_streams_spark.operators.jq_interp import (
        _JqRuntimeError,
    )

    with pytest.raises(_JqRuntimeError):
        jq_first(".a + .name")(DOC)  # number + string
    assert jq_first("try (.a + .name) catch \"t\"")(DOC) == "t"


def test_cross_check_against_native_compiler(spark):
    """Shared-subset scripts must agree between tier 1 (native Columns)
    and tier 2 (interpreter) — the two implementations cross-validate."""
    from pyspark.sql import Row

    from pincette_mongo_streams_spark import Context, compile_pipeline

    rng = random.Random(77)
    rows = [Row(_id=str(i), a=float(rng.randint(-5, 5)),
                b=float(rng.randint(1, 5)),
                xs=[float(rng.randint(-3, 9)) for _ in range(rng.randint(0, 5))])
            for i in range(8)]
    schema = "_id string, a double, b double, xs array<double>"
    scripts = [
        ". + {s: (.a + .b), p: (.a * 2)}",
        ". + {t: reduce .xs[] as $x (0; . + $x)}",
        ". + {m: (.xs | map(. + 1))}",
        ". + {c: if .a > .b then 1 else 0 end}",
        ". + {r: [foreach .xs[] as $x (0; . + $x)]}",
    ]
    df = spark.createDataFrame(rows, schema)
    for script in scripts:
        native = compile_pipeline([{"$jq": script}], Context(spark=spark))(df)
        got = {r["_id"]: r.asDict(recursive=True) for r in native.collect()}
        for row in rows:
            doc = {"_id": row._id, "a": row.a, "b": row.b, "xs": row.xs}
            want = jq_first(script)(doc)
            have = got[row._id]
            for k, v in want.items():
                assert have[k] == pytest.approx(v) if isinstance(v, float) \
                    else have[k] == v, (script, k, have[k], v)


def test_builtin_errors_are_catchable():
    """r3 review fix: type/value errors inside builtins become catchable
    jq errors instead of raw Python exceptions killing the task."""
    assert jq_first('try (.x | tonumber) catch "bad"')({"x": "abc"}) == "bad"
    assert jq_first('try (.xs | first) catch "empty"')({"xs": []}) == "empty"
    assert jq_first('(.x | tonumber)? // -1')({"x": "abc"}) == -1
    assert jq_first('try (.n | ascii_downcase) catch "t"')({"n": 3}) == "t"
