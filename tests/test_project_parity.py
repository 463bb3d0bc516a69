"""Golden parity with the reference's TestProject corpus
(TestProject.java:16-139): include/exclude/compute over nested documents,
dotted-path and nested-object forms, `_id` retention rules, and `$$REMOVE`.

Fixture document (TestProject.java:17-25):
  {_id:"0", test1:0, test2:0, test3:{test1:0,test2:0},
   test4:{test1:0,test2:0,test3:0}, test5:{test:0}}

Fixed-schema note: the reference drops fields structurally (absent key);
here exclusion/inclusion rebuilds the struct so the same fields are absent
from the output schema.
"""

import pytest
from pyspark.sql import Row

from pincette_mongo_streams_spark import Context, compile_pipeline

SCHEMA = (
    "_id string, test1 long, test2 long, "
    "test3 struct<test1:long,test2:long>, "
    "test4 struct<test1:long,test2:long,test3:long>, "
    "test5 struct<test:long>"
)
MESSAGE = Row(
    _id="0",
    test1=0,
    test2=0,
    test3=Row(test1=0, test2=0),
    test4=Row(test1=0, test2=0, test3=0),
    test5=Row(test=0),
)


def run(spark, pipeline, rows=(MESSAGE,), schema=SCHEMA):
    df = spark.createDataFrame(list(rows), schema)
    out = compile_pipeline(pipeline, Context(spark=spark))(df)
    return out, [r.asDict(recursive=True) for r in out.collect()]


def test_exclude_1_top_level(spark):
    """"$project exclude 1" (TestProject.java:27-37): 0/false drop whole
    top-level fields; everything else passes through."""
    out, docs = run(
        spark, [{"$project": {"test3": 0, "test4": False, "test5": 0}}]
    )
    assert set(out.columns) == {"_id", "test1", "test2"}
    assert docs == [{"_id": "0", "test1": 0, "test2": 0}]


def test_exclude_2_nested_paths(spark):
    """"$project exclude 2" (TestProject.java:39-63): dotted-path and
    nested-object exclusions remove single struct fields, keeping
    siblings; a whole-field 0 removes the field."""
    out, docs = run(
        spark,
        [{"$project": {"test3.test2": 0, "test4": {"test3": False},
                       "test5": 0}}],
    )
    assert set(out.columns) == {"_id", "test1", "test2", "test3", "test4"}
    assert docs == [{
        "_id": "0", "test1": 0, "test2": 0,
        "test3": {"test1": 0},
        "test4": {"test1": 0, "test2": 0},
    }]


def test_exclude_3_conditional_remove(spark):
    """"$project exclude 3" (TestProject.java:65-89): a computed $cond
    yielding $$REMOVE drops the field per-row (null under a fixed
    schema — the documented deviation for dynamic row shapes)."""
    rows = [
        Row(_id="0", test=0),
        Row(_id="1", test=1),
    ]
    out, docs = run(
        spark,
        [{"$project": {"test": {"$cond": {
            "if": {"$eq": [0, "$test"]},
            "then": "$$REMOVE",
            "else": "$test"}}}}],
        rows, "_id string, test long",
    )
    assert docs == [
        {"_id": "0", "test": None},
        {"_id": "1", "test": 1},
    ]


def test_include_1_keeps_id(spark):
    """"$project include 1" (TestProject.java:91-99): include mode keeps
    `_id` implicitly."""
    out, docs = run(spark, [{"$project": {"test1": 1, "test2": True}}])
    assert docs == [{"_id": "0", "test1": 0, "test2": 0}]


def test_include_2_id_excludable(spark):
    """"$project include 2" (TestProject.java:101-109): `_id: false` is the
    one allowed exclusion inside include mode."""
    out, docs = run(spark, [{"$project": {"test1": 1, "_id": False}}])
    assert docs == [{"test1": 0}]


def test_include_3_nested_include_and_compute(spark):
    """"$project include 3" (TestProject.java:111-138): non-0/1 numbers are
    computed literals (test1 -> 10); dotted and nested-object includes keep
    single struct fields (test3.test1, test3:{test2:1}); computed nested
    assignments merge into the original struct, preserving untouched
    siblings (test4.test1 stays 0 while test2/test3 become 10); a bare 1
    keeps the whole struct (test5)."""
    out, docs = run(
        spark,
        [{"$project": {"test1": 10, "_id": False,
                       "test3.test1": 1, "test3": {"test2": 1},
                       "test4": {"test2": 10}, "test4.test3": 10,
                       "test5": 1}}],
    )
    assert docs == [{
        "test1": 10,
        "test3": {"test1": 0, "test2": 0},
        "test4": {"test1": 0, "test2": 10, "test3": 10},
        "test5": {"test": 0},
    }]
