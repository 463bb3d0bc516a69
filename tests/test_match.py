"""Match-compiler tests (SURVEY.md §2.3b witnessed surface + contract)."""

import pytest
from pyspark.sql import Row

from pincette_mongo_streams_spark.expressions import ExprContext
from pincette_mongo_streams_spark.match import compile_match


def keep(spark, query, rows, schema=None):
    df = spark.createDataFrame(rows, schema=schema)
    ctx = ExprContext(schema=df.schema)
    return [r["id"] for r in df.filter(compile_match(query, ctx)).select("id").collect()]


ROWS = [
    Row(id=1, test=0, name="alpha", tags=["a", "b"], nested=Row(x=1)),
    Row(id=2, test=1, name="beta", tags=["b", "c"], nested=Row(x=2)),
    Row(id=3, test=2, name="gamma", tags=[], nested=Row(x=3)),
]


def test_implicit_equality(spark):
    assert keep(spark, {"test": 0}, ROWS) == [1]
    assert keep(spark, {"name": "beta"}, ROWS) == [2]
    assert keep(spark, {"nested.x": 3}, ROWS) == [3]
    # equality on an array field matches membership (Mongo semantics)
    assert keep(spark, {"tags": "b"}, ROWS) == [1, 2]


def test_comparisons(spark):
    assert keep(spark, {"test": {"$gt": 0}}, ROWS) == [2, 3]
    assert keep(spark, {"test": {"$gte": 1, "$lt": 2}}, ROWS) == [2]
    assert keep(spark, {"test": {"$ne": 1}}, ROWS) == [1, 3]
    assert keep(spark, {"test": {"$in": [0, 2]}}, ROWS) == [1, 3]
    assert keep(spark, {"test": {"$nin": [0, 2]}}, ROWS) == [2]


def test_logical(spark):
    assert keep(spark, {"$and": [{"test": {"$gt": 0}}, {"name": "beta"}]}, ROWS) == [2]
    assert keep(spark, {"$or": [{"test": 0}, {"name": "gamma"}]}, ROWS) == [1, 3]
    assert keep(spark, {"$nor": [{"test": 0}, {"name": "gamma"}]}, ROWS) == [2]
    assert keep(spark, {"test": {"$not": {"$gt": 0}}}, ROWS) == [1]


def test_regex_exists_size_mod(spark):
    assert keep(spark, {"name": {"$regex": "^[ab]"}}, ROWS) == [1, 2]
    assert keep(spark, {"name": {"$regex": "GAMMA", "$options": "i"}}, ROWS) == [3]
    assert keep(spark, {"test": {"$exists": True}}, ROWS) == [1, 2, 3]
    assert keep(spark, {"zzz": {"$exists": False}}, ROWS) == [1, 2, 3]
    assert keep(spark, {"tags": {"$size": 2}}, ROWS) == [1, 2]
    assert keep(spark, {"test": {"$mod": [2, 0]}}, ROWS) == [1, 3]


def test_elem_match_all_type_expr(spark):
    assert keep(spark, {"tags": {"$all": ["b", "c"]}}, ROWS) == [2]
    assert keep(spark, {"tags": {"$elemMatch": {"$eq": "a"}}}, ROWS) == [1]
    assert keep(spark, {"test": {"$type": "long"}}, ROWS) == [1, 2, 3]
    assert keep(spark, {"$expr": {"$eq": ["$test", {"$subtract": ["$id", 1]}]}}, ROWS) == [
        1,
        2,
        3,
    ]


def test_sample_rate(spark):
    """$sampleRate keeps each doc with the given probability; 0 and 1 are
    deterministic extremes."""
    df = spark.range(100).withColumnRenamed("id", "v")
    from pincette_mongo_streams_spark import Context, compile_pipeline

    ctx = Context(spark=spark)
    assert compile_pipeline([{"$match": {"$sampleRate": 0}}], ctx)(df).count() == 0
    assert compile_pipeline([{"$match": {"$sampleRate": 1}}], ctx)(df).count() == 100
    mid = compile_pipeline([{"$match": {"$sampleRate": 0.5}}], ctx)(df).count()
    assert 0 < mid < 100
    with pytest.raises(ValueError):
        compile_pipeline([{"$match": {"$sampleRate": 2}}], ctx)(df).count()


def test_bits_operators(spark):
    # v=0b1010 (10): bits 1 and 3 set
    rows = [Row(id=1, v=10), Row(id=2, v=5), Row(id=3, v=0), Row(id=4, v=None)]
    assert keep(spark, {"v": {"$bitsAllSet": [1, 3]}}, rows) == [1]
    assert keep(spark, {"v": {"$bitsAllSet": 10}}, rows) == [1]
    assert keep(spark, {"v": {"$bitsAnySet": [0, 1]}}, rows) == [1, 2]
    assert keep(spark, {"v": {"$bitsAllClear": [0, 2]}}, rows) == [1, 3]
    assert keep(spark, {"v": {"$bitsAnyClear": [1, 3]}}, rows) == [2, 3]


def test_json_schema_match(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(1, "alice", 30, ["a", "b"], {"city": "x", "zip": "12345"}),
         (2, "bob", -5, ["a"], {"city": "y", "zip": "99"}),
         (3, None, 40, [], {"city": None, "zip": "54321"}),
         (4, "eve", None, ["a", "a"], None)],
        "id long, name string, age int, tags array<string>, "
        "addr struct<city:string,zip:string>",
    )
    ctx = Context(spark=spark)

    def run(schema):
        out = compile_pipeline([{"$match": {"$jsonSchema": schema}}], ctx)(df)
        return {r["id"] for r in out.collect()}

    # required + type + minimum
    assert run({"required": ["name"],
                "properties": {"age": {"bsonType": "int", "minimum": 0}}}
               ) == {1, 4}  # 2 fails minimum, 3 fails required; 4: age null passes
    # string pattern on nested property
    assert run({"properties": {"addr": {
        "bsonType": "object", "required": ["zip"],
        "properties": {"zip": {"pattern": "^[0-9]{5}$"}}}}}) == {1, 3, 4}
    # array constraints
    assert run({"properties": {"tags": {
        "bsonType": "array", "minItems": 1, "uniqueItems": True,
        "items": {"enum": ["a", "b"]}}}}) == {1, 2}
    # enum + anyOf
    assert run({"anyOf": [{"properties": {"name": {"enum": ["bob"]}}},
                          {"properties": {"age": {"minimum": 35}}}]}
               ) == {2, 3, 4}  # 4: null name & null age pass both branches
    # type mismatch is static false for non-null values
    assert run({"properties": {"name": {"bsonType": "int"}}}) == {3}
    # $comment is a no-op
    out = compile_pipeline(
        [{"$match": {"id": {"$gte": 3}, "$comment": "audit"}}], ctx)(df)
    assert {r["id"] for r in out.collect()} == {3, 4}


def test_json_schema_review_fixes(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "alice", 30), (2, None, 7), (3, "bob", None)],
        "id long, name string, age int",
    )
    ctx = Context(spark=spark)

    def run(schema):
        out = compile_pipeline([{"$match": {"$jsonSchema": schema}}], ctx)(df)
        return {r["id"] for r in out.collect()}

    # ['string', 'null'] union keeps matching non-null strings
    assert run({"properties": {"name": {"bsonType": ["string", "null"]}}}
               ) == {1, 2, 3}
    assert run({"properties": {"name": {"bsonType": ["int", "null"]}}}
               ) == {2}  # only the null passes the int-or-null union
    # root-level unknown/typo'd keyword fails loudly
    with _pytest.raises(NotImplementedError, match="requird"):
        run({"requird": ["name"]})
    # root oneOf
    assert run({"oneOf": [{"required": ["name"]}, {"required": ["age"]}]}
               ) == {2, 3}  # 1 satisfies both -> fails oneOf
    # draft-4 / Mongo: keywords that don't apply to the instance type are
    # IGNORED — a Mongo-written numeric/string/array keyword over a
    # mismatching fixed-schema column validates every row (it must NOT
    # silently reject everything, and must not crash compilation)
    assert run({"properties": {"name": {"minItems": 1}}}) == {1, 2, 3}
    assert run({"properties": {"age": {"minLength": 1}}}) == {1, 2, 3}
    assert run({"properties": {"name": {"minimum": 1}}}) == {1, 2, 3}
    # ...while applicable keywords still bite
    assert run({"properties": {"name": {"minLength": 4}}}) == {1, 2}
    assert run({"properties": {"age": {"minimum": 10}}}) == {1, 3}
    # tuple-form items rejected clearly
    with _pytest.raises(NotImplementedError, match="items"):
        run({"properties": {"name": {"items": [{"bsonType": "int"}]}}})


def test_array_of_struct_path_traversal(spark):
    """Mongo path semantics through arrays of documents: ``m.v`` as an
    expression yields the array of element values; as a $match field it
    matches documents where ANY element matches (r4 — previously such
    paths resolved to missing/null)."""
    from pyspark.sql import Row

    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [
        Row(_id="1", m=[Row(v=10), Row(v=11)]),
        Row(_id="2", m=[Row(v=20)]),
    ]
    df = spark.createDataFrame(rows, "_id string, m array<struct<v:int>>")
    ctx = Context(spark=spark)
    out = compile_pipeline(
        [{"$project": {"_id": 1, "vs": "$m.v"}}], ctx)(df)
    got = {r["_id"]: list(r["vs"]) for r in out.collect()}
    assert got == {"1": [10, 11], "2": [20]}
    out2 = compile_pipeline([{"$match": {"m.v": 11}}], ctx)(df)
    assert [r["_id"] for r in out2.collect()] == ["1"]
    out3 = compile_pipeline(
        [{"$match": {"m.v": {"$gte": 20}}}], ctx)(df)
    assert [r["_id"] for r in out3.collect()] == ["2"]


def test_geo_within_and_intersects(spark):
    """$geoWithin ($geometry/$box/$polygon/$center/$centerSphere) and
    $geoIntersects in the match language (match.py _geo_predicate;
    index-free geo over point columns)."""
    import pytest

    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [(1, [4.35, 50.85]),    # Brussels
            (2, [2.35, 48.86]),    # Paris
            (3, [-74.0, 40.71]),   # New York
            (4, None)]
    df = spark.createDataFrame(rows, "id long, loc array<double>")

    def ids(q):
        out = compile_pipeline([{"$match": q}, {"$project": {"id": 1}}],
                               Context(spark=spark))(df)
        return sorted(r["id"] for r in out.collect())

    eu = {"type": "Polygon",
          "coordinates": [[[-5.0, 42.0], [10.0, 42.0], [10.0, 55.0],
                           [-5.0, 55.0]]]}
    assert ids({"loc": {"$geoWithin": {"$geometry": eu}}}) == [1, 2]
    assert ids({"loc": {"$geoIntersects": {"$geometry": eu}}}) == [1, 2]
    # legacy planar shapes — corners in any opposite order for $box
    assert ids({"loc": {"$geoWithin": {
        "$box": [[10.0, 55.0], [-5.0, 42.0]]}}}) == [1, 2]
    assert ids({"loc": {"$geoWithin": {
        "$polygon": [[-5.0, 42.0], [10.0, 42.0], [10.0, 55.0],
                     [-5.0, 55.0]]}}}) == [1, 2]
    # planar circle radius 3 degrees around Brussels: Paris is
    # sqrt(2^2 + 1.99^2) ~ 2.82 away -> inside
    assert ids({"loc": {"$geoWithin": {
        "$center": [[4.35, 50.85], 3.0]}}}) == [1, 2]
    assert ids({"loc": {"$geoWithin": {
        "$center": [[4.35, 50.85], 1.0]}}}) == [1]
    # spherical circle: 350 km in radians reaches Paris (~264 km)
    assert ids({"loc": {"$geoWithin": {
        "$centerSphere": [[4.35, 50.85], 350_000 / 6371008.7714]}}}) \
        == [1, 2]
    # $not composes; null geo never matches either branch's base
    assert ids({"loc": {"$not": {"$geoWithin": {"$geometry": eu}}}}) == [3, 4]
    with pytest.raises(ValueError, match="geometry only"):
        ids({"loc": {"$geoIntersects": {
            "$box": [[0.0, 0.0], [1.0, 1.0]]}}})
    with pytest.raises(ValueError, match="shape"):
        ids({"loc": {"$geoWithin": {}}})


def test_geo_missing_field_does_not_match(spark):
    """Mongo semantics: a geo predicate over a field absent from the
    schema simply matches nothing (no compile error), so $or branches
    keep working."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame([(1,), (2,)], "id long")
    out = compile_pipeline(
        [{"$match": {"$or": [
            {"loc": {"$geoWithin": {"$geometry": {
                "type": "Polygon",
                "coordinates": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]]}}}},
            {"id": 1},
        ]}}],
        Context(spark=spark))(df)
    assert [r["id"] for r in out.collect()] == [1]


# ------------------------------------------------------------------ $text

TEXT_ROWS = [
    Row(id=1, title="Fast Merge", body="the quick merge path wins"),
    Row(id=2, title="scan notes", body="a slow scan, then a window"),
    Row(id=3, title="Spill", body="merge under memory spill pressure"),
    Row(id=4, title="misc", body="nothing relevant here"),
]


def tkeep(spark, search, **opts):
    q = {"$text": {"$search": search, "$path": "body", **opts}}
    return keep(spark, q, TEXT_ROWS)


def test_text_terms_or(spark):
    assert tkeep(spark, "merge window") == [1, 2, 3]


def test_text_negated_term(spark):
    assert tkeep(spark, "merge -spill") == [1]


def test_text_phrase_is_required(spark):
    # with a phrase present, loose terms do not restrict (Mongo contract)
    assert tkeep(spark, 'window "slow scan"') == [2]
    assert tkeep(spark, '"merge path" window') == [1]


def test_text_negated_phrase(spark):
    assert tkeep(spark, 'scan -"slow scan"') == []


def test_text_all_negation_matches_nothing(spark):
    assert tkeep(spark, "-merge") == []


def test_text_case_sensitivity(spark):
    q = {"$text": {"$search": "fast", "$path": "title"}}
    assert keep(spark, q, TEXT_ROWS) == [1]
    q = {"$text": {"$search": "fast", "$path": "title",
                   "$caseSensitive": True}}
    assert keep(spark, q, TEXT_ROWS) == []


def test_text_multi_path(spark):
    q = {"$text": {"$search": "spill", "$path": ["title", "body"]}}
    assert keep(spark, q, TEXT_ROWS) == [3]


def test_text_requires_path(spark):
    with pytest.raises(ValueError, match=r"\$path"):
        keep(spark, {"$text": {"$search": "x"}}, TEXT_ROWS)


def test_text_unknown_option_rejected(spark):
    with pytest.raises(NotImplementedError, match="options"):
        tkeep(spark, "x", **{"$score": 1})


def test_near_rejected_in_match(spark):
    # Mongo forbids $near/$nearSphere inside an aggregation $match
    with pytest.raises(NotImplementedError, match=r"\$near"):
        keep(spark, {"nested": {"$near": [0, 0]}}, ROWS)
    with pytest.raises(NotImplementedError, match=r"\$nearSphere"):
        keep(spark, {"nested": {"$nearSphere": [0, 0], "$maxDistance": 1}},
             ROWS)


def test_text_phrase_is_token_bounded(spark):
    rows = [
        Row(id=1, title="x", body="the slow scan, then rest"),
        Row(id=2, title="x", body="a coleslaw scandal brews"),
        Row(id=3, title="x", body="slow-scan telemetry mode"),
    ]
    q = {"$text": {"$search": '"low scan"', "$path": "body"}}
    assert keep(spark, q, rows) == []  # never matches inside tokens
    q = {"$text": {"$search": '"slow scan"', "$path": "body"}}
    # punctuation and '-' both separate tokens; 'coleslaw scandal' does
    # not contain the token sequence
    assert keep(spark, q, rows) == [1, 3]


def test_text_tokenless_phrase_is_no_constraint(spark):
    rows = [Row(id=1, title="x", body="merge now !!!"),
            Row(id=2, title="x", body="other things")]
    # a phrase that tokenizes to nothing imposes no constraint — the
    # remaining terms decide (it must not compile to constant False)
    q = {"$text": {"$search": 'merge "!!!"', "$path": "body"}}
    assert keep(spark, q, rows) == [1]
    # alone, it is an all-negation-style empty positive: matches nothing
    q = {"$text": {"$search": '"!!!"', "$path": "body"}}
    assert keep(spark, q, rows) == []
