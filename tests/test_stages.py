"""Stage tests in the reference's golden-triple style (SURVEY.md §5 /
FIXTURES.md family A): (pipeline JSON, input docs, expected docs)."""

import pytest
from pyspark.sql import Row

from pincette_mongo_streams_spark import Context, compile_pipeline


def run(spark, pipeline, rows, schema=None, ctx=None, order_by=None):
    df = spark.createDataFrame(rows, schema=schema)
    ctx = ctx or Context(spark=spark)
    if order_by:
        ctx.order_by = order_by
    out = compile_pipeline(pipeline, ctx)(df)
    return [r.asDict(recursive=True) for r in out.collect()]


NESTED = [
    Row(
        _id="a",
        test1=1,
        test2=2,
        test3=Row(test1=10, test2=20),
    )
]
NESTED_SCHEMA = "_id string, test1 long, test2 long, test3 struct<test1:long,test2:long>"


def test_addfields(spark):
    [doc] = run(
        spark,
        [{"$addFields": {"sum": {"$add": ["$test1", "$test2"]}, "test3.test1": 99}}],
        NESTED,
        NESTED_SCHEMA,
    )
    assert doc["sum"] == 3
    assert doc["test3"] == {"test1": 99, "test2": 20}


def test_addfields_deep_create(spark):
    # deep-creating intermediate objects (TestAddFields.java:74-107)
    [doc] = run(spark, [{"$addFields": {"new.deep.field": 7}}], NESTED, NESTED_SCHEMA)
    assert doc["new"] == {"deep": {"field": 7}}


def test_addfields_overwrites_non_object_intermediate(spark):
    # TestAddFields addFields4: a non-object intermediate (test3.test1 is a
    # scalar) is replaced by a deep-created object
    ctx = Context(spark=spark)
    df = spark.createDataFrame(
        [(0, (0, 5))], "test1 long, test3 struct<test:long,test1:long>")
    out = compile_pipeline([{"$addFields": {"test3.test1.test2": 3}}], ctx)(df)
    doc = out.collect()[0].asDict(recursive=True)
    assert doc == {"test1": 0, "test3": {"test": 0, "test1": {"test2": 3}}}


def test_addfields_literal_dot_key_untouched(spark):
    # TestAddFields addFields1: an input key containing a literal dot
    # ("test.test") is data, not a path; other targets leave it alone
    ctx = Context(spark=spark)
    df = spark.createDataFrame([(0,)], "x long").selectExpr(
        "x", "x as `test.test`")
    out = compile_pipeline([{"$addFields": {"y": 1}}], ctx)(df)
    doc = out.collect()[0].asDict(recursive=True)
    assert doc == {"x": 0, "test.test": 0, "y": 1}


def test_addfields_getfield_cross_reference_sequential(spark):
    # r13 verdict hole: {"$getField": "a"} / {"$getField": {"field": "a"}}
    # read the CURRENT document without a "$"-string, so the batching
    # classifier missed the cross-field chain and the batched withColumns
    # read the INPUT value of `a` instead of the updated one.
    for getfield in ({"$getField": "a"}, {"$getField": {"field": "a"}}):
        [doc] = run(
            spark,
            [{"$addFields": {"a": {"$add": ["$test1", 100]}, "b": getfield}}],
            NESTED,
            NESTED_SCHEMA,
        )
        assert doc["a"] == 101
        assert doc["b"] == 101, "cross-field $getField must see the updated value"


def test_addfields_root_cross_reference_sequential(spark):
    # $$ROOT reads every field of the current document — a later target
    # referencing $$ROOT.<earlier target> must see the updated value.
    [doc] = run(
        spark,
        [{"$addFields": {"a": {"$add": ["$test1", 100]}, "b": "$$ROOT.a"}}],
        NESTED,
        NESTED_SCHEMA,
    )
    assert doc["a"] == 101
    assert doc["b"] == 101


def test_addfields_batchable_classification():
    from pincette_mongo_streams_spark.operators.stateless import (
        _addfields_batchable,
    )

    # implicit-CURRENT $getField forms referencing another target: NOT batchable
    assert not _addfields_batchable({"a": 1, "b": {"$getField": "a"}})
    assert not _addfields_batchable({"a": 1, "b": {"$getField": {"field": "a"}}})
    # dynamic/unresolvable field: conservative
    assert not _addfields_batchable(
        {"a": 1, "b": {"$getField": {"field": {"$concat": ["a"]}}}}
    )
    # bare $$ROOT / $$CURRENT read everything: conservative
    assert not _addfields_batchable({"a": 1, "b": "$$ROOT"})
    assert not _addfields_batchable({"a": 1, "b": {"$size": ["$$CURRENT"]}})
    assert not _addfields_batchable({"a": 1, "b": "$$ROOT.a"})
    # $getField WITH input reads the input, not the current doc: batchable
    assert _addfields_batchable(
        {"a": 1, "b": {"$getField": {"field": "a", "input": "$test3"}}}
    )
    # $literal payloads are data, not refs: batchable
    assert _addfields_batchable({"a": 1, "b": {"$literal": "$a"}})
    # self-reference reads the input either way: batchable
    assert _addfields_batchable({"a": {"$add": ["$a", 1]}, "b": "$test1"})


def test_project_include_exclude_compute(spark):
    [doc] = run(spark, [{"$project": {"test1": 1, "test3.test2": 1}}], NESTED, NESTED_SCHEMA)
    assert doc == {"_id": "a", "test1": 1, "test3": {"test2": 20}}
    [doc] = run(spark, [{"$project": {"test2": 0, "test3": 0}}], NESTED, NESTED_SCHEMA)
    assert doc == {"_id": "a", "test1": 1}
    [doc] = run(
        spark,
        [{"$project": {"_id": 0, "x": {"$multiply": ["$test1", 5]}}}],
        NESTED,
        NESTED_SCHEMA,
    )
    assert doc == {"x": 5}


def test_project_mix_rejected(spark):
    with pytest.raises(ValueError):
        run(spark, [{"$project": {"test1": 1, "test2": 0}}], NESTED, NESTED_SCHEMA)


def test_unset(spark):
    [doc] = run(spark, [{"$unset": ["test2", "test3.test1"]}], NESTED, NESTED_SCHEMA)
    assert doc == {"_id": "a", "test1": 1, "test3": {"test2": 20}}


def test_replace_with(spark):
    rows = [Row(_id="a", test=Row(_id="b", v=5))]
    [doc] = run(spark, [{"$replaceWith": "$test"}], rows, "_id string, test struct<_id:string,v:long>")
    assert doc == {"_id": "b", "v": 5}
    [doc] = run(
        spark,
        [{"$replaceRoot": {"newRoot": "$test"}}],
        rows,
        "_id string, test struct<_id:string,v:long>",
    )
    assert doc == {"_id": "b", "v": 5}


def test_unwind(spark):
    rows = [Row(_id="a", test=[1, 2]), Row(_id="b", test=[]), Row(_id="c", test=None)]
    schema = "_id string, test array<long>"
    docs = run(spark, [{"$unwind": "$test"}], rows, schema)
    assert docs == [{"_id": "a", "test": 1}, {"_id": "a", "test": 2}]
    docs = run(
        spark,
        [{"$unwind": {"path": "$test", "preserveNullAndEmptyArrays": True}}],
        rows,
        schema,
    )
    assert docs == [
        {"_id": "a", "test": 1},
        {"_id": "a", "test": 2},
        {"_id": "b", "test": None},
        {"_id": "c", "test": None},
    ]
    docs = run(
        spark,
        [{"$unwind": {"path": "$test", "includeArrayIndex": "i"}}],
        rows,
        schema,
    )
    assert docs == [
        {"_id": "a", "test": 1, "i": 0},
        {"_id": "a", "test": 2, "i": 1},
    ]


def test_setkey(spark):
    docs = run(spark, [{"$setKey": "$test1"}], NESTED, NESTED_SCHEMA)
    assert docs[0]["__key"] == "1"


def test_redact(spark):
    # level-based access control, the classic $redact shape
    rows = [
        Row(level=1, name="open", detail=Row(level=5, secret="x"), items=[Row(level=1, v="ok"), Row(level=9, v="hide")]),
        Row(level=9, name="locked", detail=Row(level=1, secret="y"), items=[]),
    ]
    schema = (
        "level long, name string, detail struct<level:long,secret:string>, "
        "items array<struct<level:long,v:string>>"
    )
    pipeline = [
        {
            "$redact": {
                "$cond": [{"$lt": ["$level", 5]}, "$$DESCEND", "$$PRUNE"]
            }
        }
    ]
    docs = run(spark, pipeline, rows, schema)
    assert len(docs) == 1
    assert docs[0]["name"] == "open"
    assert docs[0]["detail"] is None  # pruned subtree
    assert docs[0]["items"] == [{"level": 1, "v": "ok"}]  # pruned element


def test_group_accumulators(spark):
    rows = [Row(k="a", v=1, o=1), Row(k="a", v=2, o=2), Row(k="b", v=3, o=3)]
    docs = run(
        spark,
        [
            {
                "$group": {
                    "_id": "$k",
                    "total": {"$sum": "$v"},
                    "avg": {"$avg": "$v"},
                    "mn": {"$min": "$v"},
                    "mx": {"$max": "$v"},
                    "n": {"$count": {}},
                    "vals": {"$push": "$v"},
                    "st": {"$addToSet": "$v"},
                    "first": {"$first": "$v"},
                    "last": {"$last": "$v"},
                }
            }
        ],
        rows,
        order_by="o",
    )
    by_id = {d["_id"]: d for d in docs}
    assert by_id["a"] == {
        "_id": "a",
        "total": 3,
        "avg": 1.5,
        "mn": 1,
        "mx": 2,
        "n": 2,
        "vals": [1, 2],
        "st": [1, 2],
        "first": 1,
        "last": 2,
    }
    assert by_id["b"]["total"] == 3


def test_group_global_and_expr_key(spark):
    rows = [Row(k="a", v=1), Row(k="b", v=2)]
    docs = run(spark, [{"$group": {"_id": None, "n": {"$sum": 1}}}], rows)
    assert docs == [{"_id": None, "n": 2}]
    # expression-object key -> struct
    docs = run(
        spark,
        [{"$group": {"_id": {"u": "$k"}, "n": {"$sum": 1}}}],
        rows,
    )
    assert sorted([ (d["_id"]["u"], d["n"]) for d in docs]) == [("a", 1), ("b", 1)]


def test_bucket(spark):
    rows = [Row(v=1), Row(v=5), Row(v=15), Row(v=25)]
    docs = run(
        spark,
        [
            {
                "$bucket": {
                    "groupBy": "$v",
                    "boundaries": [0, 10, 20],
                    "default": "other",
                    "output": {"n": {"$sum": 1}},
                }
            }
        ],
        rows,
    )
    got = {str(d["_id"]): d["n"] for d in docs}
    assert got == {"0": 2, "10": 1, "other": 1}


def test_count_stage(spark):
    rows = [Row(v=1), Row(v=2)]
    assert run(spark, [{"$count": "n"}], rows) == [{"n": 2}]


def test_merge_objects_accumulator(spark):
    rows = [
        Row(k="a", o=1, val=Row(x=1, y=None)),
        Row(k="a", o=2, val=Row(x=None, y=2)),
    ]
    schema = "k string, o long, val struct<x:long,y:long>"
    docs = run(
        spark,
        [{"$group": {"_id": "$k", "m": {"$mergeObjects": "$val"}}}],
        rows,
        schema,
        order_by="o",
    )
    assert docs[0]["m"] == {"x": 1, "y": 2}


def test_stddev(spark):
    rows = [Row(k="a", v=2.0), Row(k="a", v=4.0)]
    docs = run(spark, [{"$group": {"_id": "$k", "sd": {"$stdDevPop": "$v"}}}], rows)
    assert docs[0]["sd"] == 1.0


def test_deduplicate(spark):
    rows = [Row(_id=1, test=0, o=1), Row(_id=2, test=0, o=2), Row(_id=3, test=1, o=3)]
    docs = run(spark, [{"$deduplicate": {"expression": "$test"}}], rows, order_by="o")
    assert sorted(d["_id"] for d in docs) == [1, 3]


def test_per(spark):
    rows = [Row(test=0, o=1), Row(test=1, o=2), Row(test=2, o=3)]
    docs = run(spark, [{"$per": {"amount": 2, "as": "batch"}}], rows, order_by="o")
    assert [[e["test"] for e in d["batch"]] for d in docs] == [[0, 1], [2]]


def test_pipeline_chain(spark):
    rows = [Row(_id="a", test=0), Row(_id="b", test=1), Row(_id="c", test=2)]
    docs = run(
        spark,
        [
            {"$match": {"test": {"$gt": 0}}},
            {"$addFields": {"double": {"$multiply": ["$test", 2]}}},
            {"$project": {"_id": 0, "double": 1}},
        ],
        rows,
    )
    assert docs == [{"double": 2}, {"double": 4}]


def test_unknown_stage_raises(spark):
    with pytest.raises(ValueError):
        run(spark, [{"$nope": {}}], [Row(x=1)])


def test_replace_with_non_object_passthrough(spark):
    """Non-object expression result -> original document passes through
    (ReplaceWith.java:25-37)."""
    df = spark.createDataFrame([(1, "x")], "_id long, test string")
    out = compile_pipeline([{"$replaceWith": "$test"}], Context(spark=spark))(df)
    assert out.columns == ["_id", "test"]
    assert out.collect()[0].asDict() == {"_id": 1, "test": "x"}


def test_unwind_preserve_and_index(spark):
    """preserveNullAndEmptyArrays keeps empty/null docs with a null index
    (Unwind.java:85-110)."""
    df = spark.createDataFrame(
        [(1, [10, 20]), (2, []), (3, None)], "_id long, test array<int>"
    )
    out = compile_pipeline(
        [{"$unwind": {"path": "$test", "includeArrayIndex": "idx",
                      "preserveNullAndEmptyArrays": True}}],
        Context(spark=spark),
    )(df)
    assert sorted(tuple(r) for r in out.collect()) == [
        (1, 10, 0), (1, 20, 1), (2, None, None), (3, None, None)
    ]


def test_lookup_scalar_and_array_local_field(spark):
    """The reference array-wraps scalar local values so both scalar and
    array localField work through the same $in rewrite
    (Lookup.java:110-114, TestLookup '$lookup 3')."""
    dim = spark.createDataFrame([(100, "a"), (300, "b")], "k long, v string")
    ctx = Context(spark=spark, collections={"dim": dim})
    scalar = spark.createDataFrame([(1, 100), (2, 300)], "_id long, ref long")
    out = compile_pipeline(
        [{"$lookup": {"from": "dim", "localField": "ref",
                      "foreignField": "k", "as": "m"}}], ctx
    )(scalar)
    got = sorted((r["_id"], [(x["k"], x["v"]) for x in r["m"]]) for r in out.collect())
    assert got == [(1, [(100, "a")]), (2, [(300, "b")])]
    arr = spark.createDataFrame([(1, [100, 300]), (2, [999])], "_id long, ref array<long>")
    out = compile_pipeline(
        [{"$lookup": {"from": "dim", "localField": "ref",
                      "foreignField": "k", "as": "m"}}], ctx
    )(arr)
    got = sorted(
        (r["_id"], sorted((x["k"], x["v"]) for x in r["m"])) for r in out.collect()
    )
    assert got == [(1, [(100, "a"), (300, "b")]), (2, [])]


def test_stage_extensions_and_builtin_precedence(spark):
    """Context.stageExtensions merges user stages (Context.java:34-35;
    the reference's test-only $wait — Wait.java:23-31); built-ins win on
    name collision (Pipeline.java:275-276)."""
    from pyspark.sql import functions as F

    from pincette_mongo_streams_spark import Context, compile_pipeline

    def wait_stage(expression, ctx):
        assert isinstance(expression, int)

        def fn(df, c):  # a passthrough marker instead of an async sleep
            return df.withColumn("__waited", F.lit(expression))

        return fn

    def bogus_match(expression, ctx):  # must NOT shadow the builtin
        def fn(df, c):
            raise AssertionError("extension shadowed a builtin stage")

        return fn

    ctx = Context(spark=spark,
                  stage_extensions={"$wait": wait_stage, "$match": bogus_match})
    df = spark.createDataFrame([(1,), (2,)], "v long")
    out = compile_pipeline([{"$wait": 5}, {"$match": {"v": 2}}], ctx)(df)
    rows = [r.asDict() for r in out.collect()]
    assert rows == [{"v": 2, "__waited": 5}]


def test_unknown_stage_raises(spark):
    """Deliberate deviation: unknown stages raise instead of being silently
    ignored (reference skips them — Pipeline.java:264-266)."""
    import pytest as _pytest

    from pincette_mongo_streams_spark import Context, compile_pipeline

    with _pytest.raises(ValueError, match="unknown pipeline stage"):
        compile_pipeline([{"$nope": 1}], Context(spark=spark))


def test_hint_passthrough_and_plan(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, k long, v double"
    )
    out = compile_pipeline(
        [{"$hint": {"repartition": {"numPartitions": 4, "by": ["k"]}}},
         {"$group": {"_id": "$k", "n": {"$count": {}}}}],
        Context(spark=spark),
    )(df)
    rows = {r["_id"]: r["n"] for r in out.collect()}
    assert rows == {0: 10, 1: 10, 2: 10}

    ident = compile_pipeline(
        [{"$hint": {"repartition": 6}}], Context(spark=spark)
    )(df)
    assert ident.rdd.getNumPartitions() == 6
    assert ident.count() == 30

    co = compile_pipeline(
        [{"$hint": {"coalesce": 2}}], Context(spark=spark)
    )(df)
    assert co.rdd.getNumPartitions() <= 2

    import pytest
    with pytest.raises(ValueError):
        compile_pipeline([{"$hint": {"nope": 1}}], Context(spark=spark))(df)


def test_hint_broadcast_pins_join_side(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    big = spark.range(0, 10000).selectExpr("id", "id % 100 as fk")
    dim = spark.range(0, 100).selectExpr("id as dk", "id * 2 as val")
    ctx = Context(spark=spark, collections={
        "dim": compile_pipeline([{"$hint": {"broadcast": True}}],
                                Context(spark=spark))(dim)})
    out = compile_pipeline(
        [{"$lookup": {"from": "dim", "localField": "fk",
                      "foreignField": "dk", "as": "d"}},
         {"$unwind": "$d"}],
        ctx,
    )(big)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 10000


def test_approx_accumulators(spark):
    """$approxCountDistinct / $approxQuantile: sketch-based aggregates
    (fixed-size state — the 100 TB path); pinned within tolerance of the
    exact answers."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(i % 3, float(i), i % 97) for i in range(2000)],
        "k long, v double, u long",
    )
    out = compile_pipeline(
        [{"$group": {"_id": "$k",
                     "nd": {"$approxCountDistinct": "$u"},
                     "nd2": {"$approxCountDistinct": {"input": "$u",
                                                      "relativeSD": 0.01}},
                     "q": {"$approxQuantile": {"input": "$v",
                                               "p": [0.5, 0.9]}}}}],
        Context(spark=spark),
    )(df).collect()
    for r in out:
        assert abs(r["nd"] - 97) <= 10
        assert abs(r["nd2"] - 97) <= 3
        med, p90 = r["q"]
        assert 800 <= med <= 1200      # exact median ~1000
        assert 1600 <= p90 <= 2000


def test_explain_stage(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = compile_pipeline(
        [{"$match": {"id": {"$gte": 2}}}, {"$explain": {}}],
        Context(spark=spark),
    )(df).collect()
    assert len(out) == 1
    assert "Physical Plan" in out[0]["plan"]
    assert out[0]["mode"] == "formatted"
    out2 = compile_pipeline(
        [{"$explain": "simple"}], Context(spark=spark)
    )(df).collect()
    assert "Scan" in out2[0]["plan"] or "Physical" in out2[0]["plan"]
