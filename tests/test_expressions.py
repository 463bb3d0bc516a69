"""Expression-compiler unit tests, modeled on the reference's per-stage
golden style (SURVEY.md §5): small inline docs, exact expected values."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pincette_mongo_streams_spark.expressions import ExprContext, compile_expr


def ev(spark, expr, rows=None, schema=None):
    """Evaluate expr against a one-row (or given) DataFrame, return values."""
    df = spark.createDataFrame(rows or [Row(x=1)], schema=schema)
    ctx = ExprContext(schema=df.schema)
    out = df.select(compile_expr(expr, ctx).alias("v")).collect()
    return [r["v"] for r in out]


def test_literals_and_paths(spark):
    rows = [Row(a=5, b=Row(c="hi"))]
    assert ev(spark, 3, rows) == [3]
    assert ev(spark, "plain", rows) == ["plain"]
    assert ev(spark, "$a", rows) == [5]
    assert ev(spark, "$b.c", rows) == ["hi"]
    assert ev(spark, "$missing", rows) == [None]
    assert ev(spark, None, rows) == [None]


def test_expression_object_struct(spark):
    rows = [Row(a=5)]
    [v] = ev(spark, {"total": {"$add": ["$a", 1]}, "lit": "x"}, rows)
    assert v.asDict() == {"total": 6, "lit": "x"}


def test_arithmetic(spark):
    rows = [Row(a=10, b=3.0)]
    assert ev(spark, {"$add": ["$a", "$b", 1]}, rows) == [14.0]
    assert ev(spark, {"$subtract": ["$a", "$b"]}, rows) == [7.0]
    assert ev(spark, {"$multiply": ["$a", 2]}, rows) == [20]
    assert ev(spark, {"$divide": ["$a", 4]}, rows) == [2.5]
    assert ev(spark, {"$mod": ["$a", 3]}, rows) == [1]
    assert ev(spark, {"$abs": -4}, rows) == [4]
    assert ev(spark, {"$ceil": 1.2}, rows) == [2]
    assert ev(spark, {"$floor": 1.8}, rows) == [1]
    assert ev(spark, {"$pow": [2, 10]}, rows) == [1024.0]
    assert ev(spark, {"$sqrt": 16}, rows) == [4.0]
    assert ev(spark, {"$round": [2.567, 1]}, rows) == [2.6]
    assert ev(spark, {"$trunc": [2.567, 1]}, rows) == [2.5]
    assert ev(spark, {"$divide": ["$a", 0]}, rows) == [None]


def test_strings(spark):
    rows = [Row(s="Hello World", t="  pad  ")]
    assert ev(spark, {"$concat": ["$s", "!"]}, rows) == ["Hello World!"]
    assert ev(spark, {"$toLower": "$s"}, rows) == ["hello world"]
    assert ev(spark, {"$toUpper": "$s"}, rows) == ["HELLO WORLD"]
    assert ev(spark, {"$strLenCP": "$s"}, rows) == [11]
    assert ev(spark, {"$substrCP": ["$s", 6, 5]}, rows) == ["World"]
    assert ev(spark, {"$trim": {"input": "$t"}}, rows) == ["pad"]
    assert ev(spark, {"$split": ["$s", " "]}, rows) == [["Hello", "World"]]
    assert ev(spark, {"$indexOfCP": ["$s", "World"]}, rows) == [6]
    assert ev(spark, {"$indexOfCP": ["$s", "zzz"]}, rows) == [-1]
    assert ev(spark, {"$regexMatch": {"input": "$s", "regex": "^Hello"}}, rows) == [True]
    assert ev(
        spark, {"$replaceOne": {"input": "$s", "find": "World", "replacement": "X"}}, rows
    ) == ["Hello X"]
    assert ev(
        spark, {"$replaceAll": {"input": "$s", "find": "l", "replacement": ""}}, rows
    ) == ["Heo Word"]


def test_comparison_boolean_conditional(spark):
    rows = [(5, None)]
    sch = "a long, b string"

    def e(expr):
        return ev(spark, expr, rows, sch)

    assert e({"$eq": ["$a", 5]}) == [True]
    assert e({"$ne": ["$a", 5]}) == [False]
    assert e({"$eq": ["$b", None]}) == [True]
    assert e({"$gt": ["$a", 4]}) == [True]
    assert e({"$cmp": ["$a", 9]}) == [-1]
    assert e({"$and": [{"$gt": ["$a", 1]}, {"$lt": ["$a", 9]}]}) == [True]
    assert e({"$or": [False, 0]}) == [False]
    assert e({"$not": [0]}) == [True]
    assert e({"$cond": [{"$gt": ["$a", 3]}, "big", "small"]}) == ["big"]
    assert e({"$cond": {"if": False, "then": 1, "else": 2}}) == [2]
    assert e({"$ifNull": ["$b", "dflt"]}) == ["dflt"]
    sw = {
        "$switch": {
            "branches": [
                {"case": {"$lt": ["$a", 3]}, "then": "low"},
                {"case": {"$lt": ["$a", 10]}, "then": "mid"},
            ],
            "default": "high",
        }
    }
    assert ev(spark, sw, rows, sch) == ["mid"]


def test_arrays(spark):
    rows = [Row(arr=[3, 1, 2], s="x")]
    assert ev(spark, {"$arrayElemAt": ["$arr", 0]}, rows) == [3]
    assert ev(spark, {"$arrayElemAt": ["$arr", -1]}, rows) == [2]
    assert ev(spark, {"$size": "$arr"}, rows) == [3]
    assert ev(spark, {"$in": [1, "$arr"]}, rows) == [True]
    assert ev(spark, {"$indexOfArray": ["$arr", 2]}, rows) == [2]
    assert ev(spark, {"$reverseArray": "$arr"}, rows) == [[2, 1, 3]]
    assert ev(spark, {"$concatArrays": ["$arr", [9]]}, rows) == [[3, 1, 2, 9]]
    assert ev(spark, {"$slice": ["$arr", 2]}, rows) == [[3, 1]]
    assert ev(spark, {"$slice": ["$arr", -2]}, rows) == [[1, 2]]
    assert ev(spark, {"$slice": ["$arr", 1, 2]}, rows) == [[1, 2]]
    assert ev(
        spark, {"$filter": {"input": "$arr", "cond": {"$gt": ["$$this", 1]}}}, rows
    ) == [[3, 2]]
    assert ev(
        spark, {"$map": {"input": "$arr", "as": "v", "in": {"$multiply": ["$$v", 10]}}}, rows
    ) == [[30, 10, 20]]
    assert ev(
        spark,
        {"$reduce": {"input": "$arr", "initialValue": 0, "in": {"$add": ["$$value", "$$this"]}}},
        rows,
    ) == [6]
    assert ev(spark, {"$range": [0, 5, 2]}, rows) == [[0, 2, 4]]
    assert ev(spark, {"$range": [5, 0]}, rows) == [[]]
    assert ev(spark, {"$first": "$arr"}, rows) == [3]
    assert ev(spark, {"$last": "$arr"}, rows) == [2]
    assert ev(spark, {"$zip": {"inputs": ["$arr", [9, 8]]}}, rows) == [[[3, 9], [1, 8]]]
    assert ev(spark, {"$isArray": "$arr"}, rows) == [True]
    assert ev(spark, {"$isArray": "$s"}, rows) == [False]


def test_sets(spark):
    rows = [Row(a=[1, 2, 2, 3], b=[2, 3, 4])]
    assert ev(spark, {"$setUnion": ["$a", "$b"]}, rows) == [[1, 2, 3, 4]]
    assert ev(spark, {"$setIntersection": ["$a", "$b"]}, rows) == [[2, 3]]
    assert ev(spark, {"$setDifference": ["$a", "$b"]}, rows) == [[1]]
    assert ev(spark, {"$setIsSubset": [[2, 3], "$b"]}, rows) == [True]
    assert ev(spark, {"$setEquals": [[2, 1, 3, 2], [1, 2, 3]]}, rows) == [True]
    # heterogeneous literal arrays are not representable on a fixed-schema
    # engine (documented deviation) — homogeneous coverage:
    assert ev(spark, {"$anyElementTrue": [[0, 0, 1]]}, rows) == [True]
    assert ev(spark, {"$allElementsTrue": [[True, False]]}, rows) == [False]


def test_type_conversion(spark):
    rows = [Row(n=42, s="3.5", b=True)]
    assert ev(spark, {"$toString": "$n"}, rows) == ["42"]
    assert ev(spark, {"$toDouble": "$s"}, rows) == [3.5]
    assert ev(spark, {"$toInt": "$b"}, rows) == [1]
    assert ev(spark, {"$toBool": "$n"}, rows) == [True]
    assert ev(spark, {"$type": "$n"}, rows) == ["long"]
    assert ev(spark, {"$type": "$s"}, rows) == ["string"]
    assert ev(spark, {"$convert": {"input": "x", "to": "int", "onError": -1}}, rows) == [-1]
    assert ev(spark, {"$convert": {"input": "$missing", "to": "int", "onNull": 0}}, rows) == [0]


def test_let_literal_mergeobjects(spark):
    rows = [(5, (1, None), (2, 3))]
    sch = "a long, o1 struct<x:long,y:long>, o2 struct<y:long,z:long>"
    assert ev(
        spark,
        {"$let": {"vars": {"t": {"$multiply": ["$a", 2]}}, "in": {"$add": ["$$t", 1]}}},
        rows,
        sch,
    ) == [11]
    assert ev(spark, {"$literal": "$a"}, rows, sch) == ["$a"]
    [v] = ev(spark, {"$mergeObjects": ["$o1", "$o2"]}, rows, sch)
    assert v.asDict() == {"x": 1, "y": 2, "z": 3}


def test_dates(spark):
    import datetime

    rows = [Row(d=datetime.datetime(2021, 3, 14, 15, 9, 26, 535000))]
    assert ev(spark, {"$year": "$d"}, rows) == [2021]
    assert ev(spark, {"$month": "$d"}, rows) == [3]
    assert ev(spark, {"$dayOfMonth": "$d"}, rows) == [14]
    assert ev(spark, {"$hour": "$d"}, rows) == [15]
    assert ev(spark, {"$minute": "$d"}, rows) == [9]
    assert ev(spark, {"$second": "$d"}, rows) == [26]
    assert ev(spark, {"$dayOfWeek": "$d"}, rows) == [1]  # Sunday=1
    assert ev(spark, {"$dateToString": {"date": "$d", "format": "%Y-%m-%d"}}, rows) == [
        "2021-03-14"
    ]
    [ts] = ev(spark, {"$dateFromString": {"dateString": "2021-03-14T15:09:26"}}, rows)
    assert ts == datetime.datetime(2021, 3, 14, 15, 9, 26)
    assert ev(
        spark, {"$dateDiff": {"startDate": "$d", "endDate": "$d", "unit": "day"}}, rows
    ) == [0]


def test_root_and_getfield(spark):
    rows = [Row(a=1, b="x")]
    [v] = ev(spark, "$$ROOT", rows)
    assert v.asDict() == {"a": 1, "b": "x"}
    assert ev(spark, {"$getField": {"field": "a"}}, rows) == [1]


def test_remove_in_project(spark):
    """$$REMOVE in a computed $project position drops the field
    conditionally (reference TestProject 'exclude 3',
    Project.java:46-47,102-107)."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame([(1, 5), (2, 15)], "_id long, v long")
    out = compile_pipeline(
        [{"$project": {"v": 1, "flag": {"$cond": [
            {"$gte": ["$v", 10]}, "big", "$$REMOVE"]}}}],
        Context(spark=spark),
    )(df)
    rows = {r["_id"]: r.asDict() for r in out.collect()}
    # fixed-schema engine: statically-present column, null where removed
    assert rows[2]["flag"] == "big"
    assert rows[1]["flag"] is None


def test_root_in_group_push(spark):
    """$$ROOT as an accumulator argument pushes whole documents
    (reference TestGroup.java:121)."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v long")
    out = compile_pipeline(
        [{"$group": {"_id": "$k", "docs": {"$push": "$$ROOT"}}}],
        Context(spark=spark),
    )(df)
    got = {r["_id"]: sorted((d["k"], d["v"]) for d in r["docs"]) for r in out.collect()}
    assert got == {"a": [("a", 1), ("a", 2)], "b": [("b", 3)]}


def test_week_variants(spark):
    """Mongo $week is Sunday-based 0-53 (days before the year's first
    Sunday are week 0); $isoWeek/$isoWeekYear/$isoDayOfWeek are ISO 8601."""
    rows = [Row(d="2023-01-01"), Row(d="2024-01-01"), Row(d="2021-01-03")]
    schema = "d string"

    def dv(expr):
        return ev(
            spark,
            {"$let": {"vars": {"t": {"$toDate": "$d"}}, "in": expr}},
            rows, schema,
        )

    # 2023-01-01 Sunday; 2024-01-01 Monday; 2021-01-03 first Sunday of 2021
    assert dv({"$week": "$$t"}) == [1, 0, 1]
    assert dv({"$isoWeek": "$$t"}) == [52, 1, 53]
    assert dv({"$isoWeekYear": "$$t"}) == [2022, 2024, 2020]
    assert dv({"$isoDayOfWeek": "$$t"}) == [7, 1, 7]


def test_date_subtract(spark):
    rows = [Row(d="1995-03-31")]
    [v] = ev(
        spark,
        {"$dateToString": {"date": {"$dateSubtract": {
            "startDate": {"$toDate": "$d"}, "unit": "month", "amount": 1}},
            "format": "%Y-%m-%d"}},
        rows, "d string",
    )
    assert v == "1995-02-28"  # end-of-month clamp


def test_bitwise_operators(spark):
    rows = [Row(a=12, b=10)]
    assert ev(spark, {"$bitAnd": ["$a", "$b"]}, rows) == [8]
    assert ev(spark, {"$bitOr": ["$a", "$b"]}, rows) == [14]
    assert ev(spark, {"$bitXor": ["$a", "$b"]}, rows) == [6]
    assert ev(spark, {"$bitNot": "$a"}, rows) == [-13]
    assert ev(spark, {"$bitAnd": [7, 3, 1]}, rows) == [1]


def test_date_to_parts(spark):
    import datetime

    rows = [Row(d=datetime.datetime(2024, 2, 29, 13, 45, 30, 123000))]
    got = ev(spark, {"$dateToParts": {"date": "$d"}}, rows)[0].asDict()
    assert got == {"year": 2024, "month": 2, "day": 29, "hour": 13,
                   "minute": 45, "second": 30, "millisecond": 123}
    iso = ev(spark, {"$dateToParts": {"date": "$d", "iso8601": True}}, rows)[0].asDict()
    # 2024-02-29 is a Thursday of ISO week 9
    assert iso == {"isoWeekYear": 2024, "isoWeek": 9, "isoDayOfWeek": 4,
                   "hour": 13, "minute": 45, "second": 30, "millisecond": 123}


def test_sort_array_fieldwise(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(1, [{"a": 3, "b": "x"}, {"a": 1, "b": "z"}, {"a": None, "b": "y"},
              {"a": 1, "b": "a"}])],
        "id long, arr array<struct<a:int,b:string>>",
    )
    out = compile_pipeline(
        [{"$project": {
            "s1": {"$sortArray": {"input": "$arr",
                                  "sortBy": {"a": 1, "b": -1}}},
            "s2": {"$sortArray": {"input": "$arr", "sortBy": {"a": -1}}},
        }}],
        Context(spark=spark),
    )(df).collect()[0]
    assert [(r["a"], r["b"]) for r in out["s1"]] == [
        (None, "y"), (1, "z"), (1, "a"), (3, "x")
    ]
    assert [(r["a"], r["b"]) for r in out["s2"]] == [
        (3, "x"), (1, "z"), (1, "a"), (None, "y")
    ]


def test_zip_nary(spark):
    rows = [([1, 2, 3], [10, 20], [100, 200, 300, 400])]
    mk = lambda: spark.createDataFrame(
        rows, "a array<int>, b array<int>, c array<int>"
    )
    from pincette_mongo_streams_spark import Context, compile_pipeline

    out = compile_pipeline(
        [{"$project": {
            "z3": {"$zip": {"inputs": ["$a", "$b", "$c"]}},
            "z3l": {"$zip": {"inputs": ["$a", "$b", "$c"],
                             "useLongestLength": True,
                             "defaults": [0, -1, -2]}},
            "z2l": {"$zip": {"inputs": ["$a", "$b"],
                             "useLongestLength": True}},
            "znull": {"$zip": {"inputs": ["$a", None]}},
        }}],
        Context(spark=spark),
    )(mk()).collect()[0]
    assert out["z3"] == [[1, 10, 100], [2, 20, 200]]
    assert out["z3l"] == [[1, 10, 100], [2, 20, 200], [3, -1, 300],
                          [0, -1, 400]]
    assert out["z2l"] == [[1, 10], [2, 20], [3, None]]
    assert out["znull"] is None


def test_zip_defaults_only_fill_past_end(spark):
    """A stored null element stays null — defaults only pad positions
    past an input's end (Mongo semantics)."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [([1, None], [10, 20, 30])], "a array<int>, b array<int>"
    )
    out = compile_pipeline(
        [{"$project": {"z": {"$zip": {
            "inputs": ["$a", "$b"], "useLongestLength": True,
            "defaults": [9, -9]}}}}],
        Context(spark=spark),
    )(df).collect()[0]
    assert out["z"] == [[1, 10], [None, 20], [9, 30]]


def test_zip_defaults_length_mismatch_raises(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline
    import pytest

    df = spark.createDataFrame([([1], [2], [3])],
                               "a array<int>, b array<int>, c array<int>")
    with pytest.raises(ValueError, match="defaults"):
        compile_pipeline(
            [{"$project": {"z": {"$zip": {
                "inputs": ["$a", "$b", "$c"], "useLongestLength": True,
                "defaults": [0, -1]}}}}],
            Context(spark=spark),
        )(df)


def test_median_percentile_expression_forms(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(1, [3, 1, 4, 1, 5]), (2, [2, None, 8]), (3, [])],
        "id long, xs array<int>",
    )
    out = compile_pipeline(
        [{"$project": {
            "id": 1,
            "med": {"$median": {"input": "$xs", "method": "approximate"}},
            "pcts": {"$percentile": {"input": "$xs", "p": [0.0, 0.5, 1.0],
                                     "method": "approximate"}},
        }}],
        Context(spark=spark),
    )(df).collect()
    by = {r["id"]: r for r in out}
    assert by[1]["med"] == 3.0               # sorted [1,1,3,4,5]
    assert by[1]["pcts"] == [1.0, 3.0, 5.0]
    assert by[2]["med"] == 5.0               # nulls ignored: [2,8] -> 5.0
    assert by[3]["med"] is None
    assert by[3]["pcts"] == [None, None, None]


def test_date_from_parts(spark):
    """$dateFromParts: calendar + ISO-week forms, Mongo's out-of-range
    carrying (month 13 -> next Jan, day 0 -> last day of prev month),
    milliseconds, and literal timezone interpretation."""
    import datetime

    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame([(2024, 2, 29)], "y int, m int, d int")
    out = compile_pipeline([{"$addFields": {
        "plain": {"$dateFromParts": {
            "year": "$y", "month": "$m", "day": "$d",
            "hour": 6, "minute": 30, "second": 15, "millisecond": 250}},
        "carry_month": {"$dateFromParts": {"year": 2023, "month": 13,
                                           "day": 1}},
        "carry_day": {"$dateFromParts": {"year": 2024, "month": 3,
                                         "day": 0}},
        "iso": {"$dateFromParts": {"isoWeekYear": 2024, "isoWeek": 2,
                                   "isoDayOfWeek": 3}},
        "tz": {"$dateFromParts": {"year": 2024, "month": 1, "day": 1,
                                  "hour": 12,
                                  "timezone": "America/New_York"}},
    }}], Context(spark=spark))(df)
    r = out.collect()[0]
    assert r["plain"] == datetime.datetime(2024, 2, 29, 6, 30, 15, 250000)
    assert r["carry_month"] == datetime.datetime(2024, 1, 1)
    assert r["carry_day"] == datetime.datetime(2024, 2, 29)   # leap year
    assert r["iso"] == datetime.datetime(2024, 1, 10)
    assert r["tz"] == datetime.datetime(2024, 1, 1, 17, 0)    # EST=UTC-5


def test_date_from_parts_null_part_propagates(spark):
    """A part that IS specified but evaluates to null nulls the whole
    result (Mongo's null propagation) — it must NOT silently fall back
    to the part's default (null month != January)."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(2024, None, 5), (2024, 3, None), (2024, 3, 5)],
        "y int, m int, d int")
    out = compile_pipeline([{"$project": {
        "ts": {"$dateFromParts": {"year": "$y", "month": "$m",
                                  "day": "$d"}},
        "iso": {"$dateFromParts": {"isoWeekYear": "$y",
                                   "isoWeek": "$m"}},
    }}], Context(spark=spark))(df)
    rows = out.collect()
    import datetime

    assert rows[0]["ts"] is None          # null month -> null, not Jan
    assert rows[1]["ts"] is None          # null day -> null, not 1st
    assert rows[2]["ts"] == datetime.datetime(2024, 3, 5)
    assert rows[0]["iso"] is None         # null isoWeek -> null
    assert rows[2]["iso"] is not None


def test_ts_second_increment(spark):
    """$tsSecond / $tsIncrement: epoch second + the sub-second ordinal
    proxy (plain timestamps carry no BSON per-second counter)."""
    import datetime

    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 5, 123456),)], "ts timestamp")
    out = compile_pipeline(
        [{"$project": {"s": {"$tsSecond": "$ts"},
                       "i": {"$tsIncrement": "$ts"}}}],
        Context(spark=spark))(df)
    r = out.collect()[0]
    assert r["s"] == 1704067205 and r["i"] == 123456


def test_sigmoid(spark):
    import math

    df = spark.createDataFrame([(0.0,), (2.0,), (-2.0,)], "x double")
    ectx = ExprContext(schema=df.schema)
    out = df.select(compile_expr({"$sigmoid": "$x"}, ectx).alias("s")).collect()
    got = sorted(r["s"] for r in out)
    want = sorted(1.0 / (1.0 + math.exp(-x)) for x in (0.0, 2.0, -2.0))
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-12


def test_convert_bindata_formats(spark):
    df = spark.createDataFrame([("hello", "aGVsbG8", "68656c6c6f")],
                               "s string, b64u string, hx string")
    ectx = ExprContext(schema=df.schema)

    def conv(spec):
        return df.select(compile_expr({"$convert": spec}, ectx)
                         .alias("v")).collect()[0]["v"]

    raw = conv({"input": "$s", "to": "binData", "format": "utf8"})
    assert raw == b"hello"
    # unpadded base64url round-trips
    assert conv({"input": "$b64u", "to": "binData",
                 "format": "base64url"}) == b"hello"
    assert conv({"input": "$hx", "to": "binData", "format": "hex"}) \
        == b"hello"
    # binData -> string renderings
    b = {"$convert": {"input": "$s", "to": "binData", "format": "utf8"}}
    assert conv({"input": b, "to": "string", "format": "base64"}) \
        == "aGVsbG8="
    assert conv({"input": b, "to": "string", "format": "base64url"}) \
        == "aGVsbG8="
    assert conv({"input": b, "to": "string", "format": "hex"}) \
        == "68656c6c6f"
    assert conv({"input": b, "to": "string", "format": "utf8"}) == "hello"
    # {type, subtype} form; subtype ignored
    assert conv({"input": "$s", "to": {"type": "binData", "subtype": 0},
                 "format": "utf8"}) == b"hello"
    # onNull applies
    df2 = spark.createDataFrame([(None,)], "s string")
    v = df2.select(compile_expr(
        {"$convert": {"input": "$s", "to": "binData", "format": "utf8",
                      "onNull": "X"}},
        ExprContext(schema=df2.schema)).alias("v")).collect()[0]["v"]
    assert v == b"X"  # Spark unifies the branch type to binary
    # no format on string -> binData defaults to base64 (Mongo 8.0)
    df3 = spark.createDataFrame([("aGVsbG8=",)], "s string")
    v3 = df3.select(compile_expr(
        {"$convert": {"input": "$s", "to": "binData"}},
        ExprContext(schema=df3.schema)).alias("v")).collect()[0]["v"]
    assert v3 == b"hello"
    # r6 full Mongo parity on malformed UTF-8: raises without onError,
    # routes to onError when given (validate_utf8 / try_validate_utf8)
    df4 = spark.createDataFrame([(bytes([0xFF, 0x68]),)], "b binary")
    with pytest.raises(Exception, match="(?i)utf"):
        df4.select(compile_expr(
            {"$convert": {"input": "$b", "to": "string",
                          "format": "utf8"}},
            ExprContext(schema=df4.schema)).alias("v")).collect()
    v4 = df4.select(compile_expr(
        {"$convert": {"input": "$b", "to": "string", "format": "utf8",
                      "onError": "BAD"}},
        ExprContext(schema=df4.schema)).alias("v")).collect()[0]["v"]
    assert v4 == "BAD"
    # valid bytes still decode on the onError path
    df5 = spark.createDataFrame([(b"hi",)], "b binary")
    assert df5.select(compile_expr(
        {"$convert": {"input": "$b", "to": "string", "format": "utf8",
                      "onError": "BAD"}},
        ExprContext(schema=df5.schema)).alias("v")).collect()[0]["v"] == "hi"
    with pytest.raises(ValueError, match="format must be"):
        compile_expr({"$convert": {"input": "$s", "to": "binData",
                                   "format": "uuid"}}, ectx)
