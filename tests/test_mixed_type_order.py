"""Pins the typed-column stance on MongoDB's mixed-type total order
(SURVEY.md §2.3a; net.pincette.mongo.Util.compare's BSON bracket order).

A Spark column holds one type, so heterogeneous groups cannot exist; what
remains of "mixed types" is numeric-width coercion and null handling —
both pinned here to match MongoDB's behavior — plus the documented
lexicographic boundary for string-encoded open-world data.
"""

from pyspark.sql import Row

from pincette_mongo_streams_spark import Context, compile_pipeline


def _group(spark, rows, acc):
    df = spark.createDataFrame(rows)
    pipeline = [{"$group": {"_id": None, **acc}}, {"$unset": "_id"}]
    out = compile_pipeline(pipeline, Context(spark=spark))(df)
    return out.collect()[0].asDict(recursive=True)


def test_min_max_ignore_nulls(spark):
    """MongoDB $min/$max skip null/missing; Spark aggregates do the same."""
    rows = [Row(v=None), Row(v=5.0), Row(v=None), Row(v=2.0)]
    got = _group(spark, rows, {"lo": {"$min": "$v"}, "hi": {"$max": "$v"}})
    assert got == {"lo": 2.0, "hi": 5.0}


def test_min_max_all_null_yield_null(spark):
    rows = [Row(v=None), Row(v=None)]
    df = spark.createDataFrame(rows, "v double")
    out = compile_pipeline(
        [{"$group": {"_id": None, "lo": {"$min": "$v"}}}, {"$unset": "_id"}],
        Context(spark=spark))(df)
    assert out.collect()[0].lo is None


def test_numeric_width_mixing_compares_numerically(spark):
    """int vs double in one expression coerces to double and compares
    numerically — BSON's cross-numeric comparison, not type-bracket."""
    rows = [Row(i=10, d=2.5)]
    df = spark.createDataFrame(rows)
    out = compile_pipeline(
        [{"$project": {"mx": {"$max": ["$i", "$d", 3]},
                       "mn": {"$min": ["$i", "$d", 3]}}}],
        Context(spark=spark))(df)
    r = out.collect()[0]
    assert r.mx == 10.0 and r.mn == 2.5


def test_addtoset_sorted_within_column_type(spark):
    """$addToSet output is sorted within the column's (single) type —
    the engine-level analog of the reference's total-JSON-order sort
    (Group.java:130-149)."""
    rows = [Row(v="b"), Row(v="a"), Row(v="b"), Row(v="c")]
    got = _group(spark, rows, {"s": {"$addToSet": "$v"}})
    assert got == {"s": ["a", "b", "c"]}


def test_string_encoded_heterogeneous_is_lexicographic(spark):
    """Open-world data in a string column orders lexicographically on the
    encoded form — the documented typed-column boundary: '10' < '9' as
    strings, unlike BSON's numeric bracket."""
    rows = [Row(v="10"), Row(v="9"), Row(v="true")]
    got = _group(spark, rows, {"lo": {"$min": "$v"}, "hi": {"$max": "$v"}})
    assert got == {"lo": "10", "hi": "true"}
