"""Atlas-syntax compatibility: $vectorSearch / $search / $meta
(operators/atlas.py)."""

import math

from pincette_mongo_streams_spark import Context, compile_pipeline


def test_vector_search(spark):
    rows = [(1, [1.0, 0.0], "a"), (2, [0.9, 0.1], "a"),
            (3, [0.0, 1.0], "b"), (4, [-1.0, 0.0], "a")]
    df = spark.createDataFrame(rows, "id long, emb array<double>, g string")
    out = compile_pipeline(
        [{"$vectorSearch": {"index": "ignored", "path": "emb",
                            "queryVector": [1.0, 0.0], "numCandidates": 10,
                            "limit": 2, "exact": True,
                            "filter": {"g": "a"}}},
         {"$project": {"id": 1,
                       "score": {"$meta": "vectorSearchScore"}}}],
        Context(spark=spark),
    )(df).collect()
    assert [r["id"] for r in out] == [1, 2]
    assert abs(out[0]["score"] - 1.0) < 1e-9          # cos=1 -> (1+1)/2
    cos2 = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(out[1]["score"] - (1 + cos2) / 2) < 1e-9
    # doc 3 filtered out by g, doc 4 would score 0.0


def test_search_text_bm25(spark):
    docs = spark.createDataFrame(
        [(1, "spark engine", "big data spark"),
         (2, "other text", "nothing here"),
         (3, "spark spark spark", "spark")],
        "doc_id long, title string, body string",
    )
    out = compile_pipeline(
        [{"$search": {"index": "default",
                      "text": {"query": "spark", "path": ["title", "body"]}}},
         {"$limit": 2},
         {"$project": {"doc_id": 1, "s": {"$meta": "searchScore"}}}],
        Context(spark=spark),
    )(docs).collect()
    assert len(out) == 2
    assert out[0]["s"] >= out[1]["s"] > 0
    assert {r["doc_id"] for r in out} <= {1, 3}
    # doc 2 scores 0 -> excluded entirely
    full = compile_pipeline(
        [{"$search": {"text": {"query": "spark", "path": "title"}}}],
        Context(spark=spark),
    )(docs).collect()
    assert {r["doc_id"] for r in full} == {1, 3}


def test_meta_columns_never_leak(spark):
    """Atlas never exposes score metadata unless requested via $meta: an
    unprojected $vectorSearch/$search pipeline must not grow a synthetic
    __meta_* column (the hidden score column drops at pipeline end)."""
    rows = [(1, [1.0, 0.0], "t spark"), (2, [0.0, 1.0], "spark x")]
    df = spark.createDataFrame(rows, "id long, emb array<double>, t string")
    out = compile_pipeline(
        [{"$vectorSearch": {"path": "emb", "queryVector": [1.0, 0.0],
                            "limit": 2}}],
        Context(spark=spark),
    )(df)
    assert out.columns == ["id", "emb", "t"]
    out2 = compile_pipeline(
        [{"$search": {"text": {"query": "spark", "path": "t"}}}],
        Context(spark=spark),
    )(df)
    assert out2.columns == ["id", "emb", "t"]
    # ...and requesting the score via $meta still works (value copied to a
    # user column; the hidden column itself is still dropped)
    out3 = compile_pipeline(
        [{"$vectorSearch": {"path": "emb", "queryVector": [1.0, 0.0],
                            "limit": 2}},
         {"$addFields": {"score": {"$meta": "vectorSearchScore"}}}],
        Context(spark=spark),
    )(df)
    assert out3.columns == ["id", "emb", "t", "score"]
    assert abs(out3.collect()[0]["score"] - 1.0) < 1e-9


def test_search_rejects_unknown_operator(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "id long, t string")
    with pytest.raises(NotImplementedError):
        compile_pipeline(
            [{"$search": {"span": {"path": "t", "query": "x"}}}],
            Context(spark=spark),
        )(df)


def _search(spark, rows, schema, spec):
    df = spark.createDataFrame(rows, schema)
    out = compile_pipeline(
        [{"$search": spec},
         {"$addFields": {"s": {"$meta": "searchScore"}}}],
        Context(spark=spark),
    )(df)
    return [(r["id"], r["s"]) for r in out.collect()]


_DOCS = [
    (1, "the quick brown fox", "news", 10),
    (2, "quick review of brown shoes", "blog", 25),
    (3, "slow green turtle", "news", 40),
    (4, None, "blog", 5),
]
_SCHEMA = "id long, t string, cat string, views long"


def test_search_phrase(spark):
    # adjacent tokens, in order, token-boundary anchored
    got = _search(spark, _DOCS, _SCHEMA,
                  {"phrase": {"query": "quick brown", "path": "t"}})
    assert [g[0] for g in got] == [1]
    # slop 1 allows one intervening token ("quick review of brown" needs 2)
    got = _search(spark, _DOCS, _SCHEMA,
                  {"phrase": {"query": "quick brown", "path": "t",
                              "slop": 2}})
    assert sorted(g[0] for g in got) == [1, 2]
    # no substring false-positives: "row" never matches "brown"
    got = _search(spark, _DOCS, _SCHEMA,
                  {"phrase": {"query": "row", "path": "t"}})
    assert got == []


def test_search_equals_range_exists_wildcard(spark):
    got = _search(spark, _DOCS, _SCHEMA,
                  {"equals": {"path": "cat", "value": "news"}})
    assert sorted(g[0] for g in got) == [1, 3]
    got = _search(spark, _DOCS, _SCHEMA,
                  {"range": {"path": "views", "gte": 10, "lt": 40}})
    assert sorted(g[0] for g in got) == [1, 2]
    got = _search(spark, _DOCS, _SCHEMA, {"exists": {"path": "t"}})
    assert sorted(g[0] for g in got) == [1, 2, 3]
    got = _search(spark, _DOCS, _SCHEMA,
                  {"wildcard": {"path": "t", "query": "*brown*"}})
    assert sorted(g[0] for g in got) == [1, 2]
    # wildcard is whole-value: no implicit substring match
    got = _search(spark, _DOCS, _SCHEMA,
                  {"wildcard": {"path": "cat", "query": "new"}})
    assert got == []
    got = _search(spark, _DOCS, _SCHEMA,
                  {"wildcard": {"path": "cat", "query": "ne?s"}})
    assert sorted(g[0] for g in got) == [1, 3]


def test_search_compound(spark):
    # must + mustNot + should with constant scores: score sums matched
    # must and should clauses
    got = _search(spark, _DOCS, _SCHEMA, {"compound": {
        "must": [{"exists": {"path": "t"}}],
        "mustNot": [{"equals": {"path": "cat", "value": "blog"}}],
        "should": [{"phrase": {"query": "brown", "path": "t",
                               "score": {"constant": {"value": 5.0}}}}],
    }})
    assert dict(got) == {1: 6.0, 3: 1.0}  # 3 matches must only
    # minimumShouldMatch drops docs matching too few shoulds
    got = _search(spark, _DOCS, _SCHEMA, {"compound": {
        "must": [{"exists": {"path": "t"}}],
        "should": [{"phrase": {"query": "quick", "path": "t"}},
                   {"phrase": {"query": "brown", "path": "t"}}],
        "minimumShouldMatch": 2,
    }})
    assert sorted(g[0] for g in got) == [1, 2]
    # pure-should compound: at least one should must match
    got = _search(spark, _DOCS, _SCHEMA, {"compound": {
        "should": [{"equals": {"path": "views", "value": 40}}],
    }})
    assert [g[0] for g in got] == [3]
    # filter gates without scoring; boost multiplies
    got = _search(spark, _DOCS, _SCHEMA, {"compound": {
        "filter": [{"range": {"path": "views", "lte": 25}}],
        "must": [{"exists": {"path": "cat",
                             "score": {"boost": {"value": 3.0}}}}],
    }})
    assert dict(got) == {1: 3.0, 2: 3.0, 4: 3.0}


def test_search_meta_operator_surface(spark):
    # $searchMeta counts through ANY $search operator, not just text
    df = spark.createDataFrame(_DOCS, _SCHEMA)
    out = compile_pipeline(
        [{"$searchMeta": {"range": {"path": "views", "gte": 10}}}],
        Context(spark=spark),
    )(df).collect()
    assert out[0]["count"]["total"] == 3


def test_search_meta_facets(spark):
    df = spark.createDataFrame(_DOCS, _SCHEMA)
    out = compile_pipeline(
        [{"$searchMeta": {"facet": {
            "operator": {"exists": {"path": "t"}},
            "facets": {
                "cats": {"type": "string", "path": "cat",
                         "numBuckets": 5},
                "viewsF": {"type": "number", "path": "views",
                           "boundaries": [0, 20, 50]},
            },
        }}}],
        Context(spark=spark),
    )(df).collect()
    row = out[0]
    assert row["count"]["total"] == 3  # doc 4 has no t
    cats = [(b["_id"], b["count"]) for b in row["facet"]["cats"]["buckets"]]
    # count desc then _id asc
    assert cats == [("news", 2), ("blog", 1)]
    views = [(b["_id"], b["count"])
             for b in row["facet"]["viewsF"]["buckets"]]
    assert views == [(0, 1), (20, 2)]  # 10 -> [0,20); 25,40 -> [20,50)
    # facet without an operator counts the whole collection
    out2 = compile_pipeline(
        [{"$searchMeta": {"facet": {"facets": {
            "cats": {"type": "string", "path": "cat"}}}}}],
        Context(spark=spark),
    )(df).collect()
    assert out2[0]["count"]["total"] == 4
    assert [(b["_id"], b["count"])
            for b in out2[0]["facet"]["cats"]["buckets"]] == [
        ("blog", 2), ("news", 2)]


def test_search_meta_numeric_facet_default_bucket(spark):
    """A number/date facet with a string `default` must not crash on the
    mixed _id types: with a default present every bucket _id renders as
    a string, boundary order is kept, and the default bucket sorts
    LAST (Atlas's catch-all)."""
    df = spark.createDataFrame(_DOCS, _SCHEMA)
    out = compile_pipeline(
        [{"$searchMeta": {"facet": {"facets": {
            "viewsF": {"type": "number", "path": "views",
                       "boundaries": [20, 50], "default": "other"},
        }}}}],
        Context(spark=spark),
    )(df).collect()
    buckets = [(b["_id"], b["count"])
               for b in out[0]["facet"]["viewsF"]["buckets"]]
    # views: 25/40 -> [20,50); 10 and 5 fall outside -> default
    assert buckets == [("20", 2), ("other", 2)]
    # a non-string default is a compile-time error, not a cast crash
    import pytest

    with pytest.raises(ValueError, match="default"):
        compile_pipeline(
            [{"$searchMeta": {"facet": {"facets": {
                "v": {"type": "number", "path": "views",
                      "boundaries": [0, 10], "default": 99},
            }}}}],
            Context(spark=spark),
        )(df).collect()


def test_search_autocomplete(spark):
    """autocomplete: every query token is a token-PREFIX match (Atlas
    edge-grams); tokenOrder any (default) vs sequential (adjacent, in
    order); fuzzy rejected; composes inside compound."""
    rows = [
        (1, "quick brown fox", "news", 1),
        (2, "the quiet brownie", "blog", 2),
        (3, "brown quilt", "news", 3),
        (4, "embroidery", "blog", 4),   # 'bro' only mid-token
    ]
    # "qui bro": both prefixes somewhere, any order
    got = _search(spark, rows, _SCHEMA,
                  {"autocomplete": {"query": "qui bro", "path": "t"}})
    assert sorted(g[0] for g in got) == [1, 2, 3]
    # sequential: 'qui...'-token immediately followed by 'bro...'-token
    got = _search(spark, rows, _SCHEMA,
                  {"autocomplete": {"query": "qui bro", "path": "t",
                                    "tokenOrder": "sequential"}})
    assert sorted(g[0] for g in got) == [1, 2]  # not 3 (reversed order)
    # single partial token
    got = _search(spark, rows, _SCHEMA,
                  {"autocomplete": {"query": "emb", "path": "t"}})
    assert [g[0] for g in got] == [4]
    # inside compound
    got = _search(spark, rows, _SCHEMA, {"compound": {
        "must": [{"autocomplete": {"query": "bro", "path": "t"}}],
        "filter": [{"equals": {"path": "cat", "value": "news"}}],
    }})
    assert sorted(g[0] for g in got) == [1, 3]
    import pytest

    df = spark.createDataFrame(rows, _SCHEMA)
    with pytest.raises(NotImplementedError, match="fuzzy"):
        compile_pipeline(
            [{"$search": {"autocomplete": {
                "query": "qui", "path": "t",
                "fuzzy": {"maxEdits": 1}}}}],
            Context(spark=spark))(df)
    with pytest.raises(ValueError, match="tokenOrder"):
        compile_pipeline(
            [{"$search": {"autocomplete": {
                "query": "qui", "path": "t", "tokenOrder": "weird"}}}],
            Context(spark=spark))(df)


def test_search_query_string(spark):
    """queryString: the Lucene-syntax subset — terms (juxtaposition =
    OR), AND/OR/NOT, field:value and field:(...) overrides, quoted
    phrases, token wildcards, [lo TO hi]/{lo TO hi} ranges; fuzzy and
    boosts rejected loudly."""
    rows = _DOCS

    def qs(query):
        got = _search(spark, rows, _SCHEMA,
                      {"queryString": {"defaultPath": "t", "query": query}})
        return sorted(g[0] for g in got)

    assert qs("quick brown") == [1, 2]           # juxtaposition = OR
    assert qs("quick AND fox") == [1]
    assert qs("green OR fox") == [1, 3]
    # NOT: a null field doesn't match `quick`, so doc 4 qualifies
    assert qs("NOT quick") == [3, 4]
    assert qs("cat:news") == [1, 3]
    assert qs("cat:(news OR blog)") == [1, 2, 3, 4]
    assert qs('"brown fox"') == [1]              # doc 2: not adjacent
    assert qs("qui*") == [1, 2]
    assert qs("b?own") == [1, 2]
    assert qs("views:[10 TO 25]") == [1, 2]
    assert qs("views:{10 TO 40}") == [2]
    assert qs("views:[25 TO *]") == [2, 3]
    assert qs("t:quick AND cat:news") == [1]
    assert qs("(green OR fox) AND cat:news") == [1, 3]
    import pytest

    df = spark.createDataFrame(rows, _SCHEMA)
    for bad, msg in [("quick~1", "fuzzy"), ("quick^2", "boost")]:
        with pytest.raises(NotImplementedError, match=msg):
            compile_pipeline(
                [{"$search": {"queryString": {"defaultPath": "t",
                                              "query": bad}}}],
                Context(spark=spark))(df)
    with pytest.raises(ValueError, match="defaultPath"):
        compile_pipeline(
            [{"$search": {"queryString": {"query": "x"}}}],
            Context(spark=spark))(df)


def test_search_compound_unknown_suboperator_message(spark):
    """An unsupported operator inside a compound clause raises a clear
    NotImplementedError naming the operator — not a bare StopIteration."""
    import pytest

    df = spark.createDataFrame(_DOCS, _SCHEMA)
    with pytest.raises(NotImplementedError, match="span"):
        compile_pipeline(
            [{"$search": {"compound": {"must": [
                {"span": {"path": "title", "query": "x"}},
            ]}}}],
            Context(spark=spark),
        )(df).collect()


def test_search_compound_with_text_clause(spark):
    # a BM25 text clause nests inside compound; its score flows through
    got = _search(spark, _DOCS, _SCHEMA, {"compound": {
        "must": [{"text": {"query": "quick", "path": "t"}}],
        "filter": [{"equals": {"path": "cat", "value": "news"}}],
    }})
    assert [g[0] for g in got] == [1]
    assert got[0][1] > 0


def test_search_null_path_and_vector_nulls(spark):
    import pytest

    docs = spark.createDataFrame(
        [(1, "spark", None), (2, None, "spark engine"), (3, None, None)],
        "doc_id long, title string, body string",
    )
    out = compile_pipeline(
        [{"$search": {"text": {"query": "spark",
                               "path": ["title", "body"]}}}],
        Context(spark=spark),
    )(docs).collect()
    # null paths contribute empty token lists: 1 and 2 both rank
    assert {r["doc_id"] for r in out} == {1, 2}

    vec = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, None)],
        "id long, emb array<double>",
    )
    got = compile_pipeline(
        [{"$vectorSearch": {"path": "emb", "queryVector": [1.0, 0.0],
                            "limit": 10, "exact": True}}],
        Context(spark=spark),
    )(vec).collect()
    # zero-norm / null embeddings are excluded, never null-score padding
    assert [r["id"] for r in got] == [1]

    # $meta without a search stage errors instead of silently nulling
    with pytest.raises(ValueError, match="score metadata"):
        compile_pipeline(
            [{"$project": {"s": {"$meta": "vectorSearchScore"}}}],
            Context(spark=spark),
        )(docs)


def test_search_meta_count(spark):
    docs = spark.createDataFrame(
        [(1, "spark rules"), (2, "nothing"), (3, "spark again")],
        "doc_id long, t string",
    )
    out = compile_pipeline(
        [{"$searchMeta": {"index": "default",
                          "text": {"query": "spark", "path": "t"},
                          "count": {"type": "total"}}}],
        Context(spark=spark),
    )(docs).collect()
    assert len(out) == 1 and out[0]["count"]["total"] == 2


def test_vector_search_approximate_recall(spark):
    """exact:false prunes with the shared LSH hyperplanes; on a clustered
    fixture the top hit survives pruning and recall vs exact stays high."""
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    q = rows[7][1]

    def run(exact):
        return [r["id"] for r in compile_pipeline(
            [{"$vectorSearch": {"path": "emb", "queryVector": q,
                                "limit": 10, "exact": exact, "bits": 6}}],
            Context(spark=spark),
        )(df).collect()]

    ex, ap = run(True), run(False)
    assert ex[0] == 7 and ap[0] == 7          # the identical vector survives
    assert len(set(ex) & set(ap)) >= 5        # recall@10 >= 0.5 on this seed


def test_search_meta_validation_and_explain_options(spark):
    import pytest

    docs = spark.createDataFrame([(1, "x")], "id long, t string")
    with pytest.raises(ValueError, match="lowerBound"):
        compile_pipeline(
            [{"$searchMeta": {"text": {"query": "x", "path": "t"},
                              "count": {"type": "bogus"}}}],
            Context(spark=spark),
        )(docs)
    with pytest.raises(ValueError, match="explain"):
        compile_pipeline(
            [{"$explain": {"mod": "cost"}}], Context(spark=spark)
        )(docs)


def test_search_embedded_document(spark):
    """embeddedDocument: the inner operator must match within ONE array
    element — a compound whose clauses only co-occur across different
    elements does NOT match (Atlas nested semantics); row-local
    F.exists, no explode in the plan."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("items", T.ArrayType(T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("qty", T.LongType()),
        ]))),
    ])
    rows = [
        (1, [{"name": "red apple", "qty": 5}, {"name": "pear", "qty": 1}]),
        # 'apple' and qty>=5 only across DIFFERENT elements:
        (2, [{"name": "apple pie", "qty": 1}, {"name": "fig", "qty": 9}]),
        (3, [{"name": "banana", "qty": 2}]),
        (4, None),
    ]
    df = spark.createDataFrame(rows, schema)

    def run(spec):
        out = compile_pipeline(
            [{"$search": spec}, {"$project": {"id": 1}}],
            Context(spark=spark))(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan  # no explode: row-local exists()
        return sorted(r["id"] for r in out.collect())

    # single-element conjunction
    assert run({"embeddedDocument": {
        "path": "items",
        "operator": {"compound": {"must": [
            {"text": {"query": "apple", "path": "items.name"}},
            {"range": {"path": "items.qty", "gte": 5}},
        ]}}}}) == [1]
    # relative inner paths work too
    assert run({"embeddedDocument": {
        "path": "items",
        "operator": {"text": {"query": "banana", "path": "name"}}}}) == [3]
    # range alone: any element with qty >= 9
    assert run({"embeddedDocument": {
        "path": "items",
        "operator": {"range": {"path": "qty", "gte": 9}}}}) == [2]
    # inside compound at the top level
    assert run({"compound": {
        "must": [{"embeddedDocument": {
            "path": "items",
            "operator": {"equals": {"path": "name", "value": "pear"}}}}],
    }}) == [1]
    import pytest

    with pytest.raises(ValueError, match="array of documents"):
        compile_pipeline(
            [{"$search": {"embeddedDocument": {
                "path": "id", "operator": {"exists": {"path": "x"}}}}}],
            Context(spark=spark))(df)


def test_search_more_like_this(spark):
    """moreLikeThis: like-doc string fields analyze into per-field BM25
    text clauses (compound-should) — documents sharing more vocabulary
    with the like docs score higher; unmapped/numeric like fields are
    ignored; empty analyzable surface raises."""
    rows = [
        (1, "spark engine tuning", "perf"),
        (2, "spark sql engine internals deep dive", "eng"),
        (3, "cooking with cast iron", "food"),
        (4, None, "misc"),
    ]
    df = spark.createDataFrame(rows, "id long, t string, cat string")
    out = compile_pipeline(
        [{"$search": {"moreLikeThis": {
            "like": {"t": "spark engine", "views": 7,
                     "nosuch": "ignored entirely"}}}},
         {"$project": {"id": 1, "s": {"$meta": "searchScore"}}}],
        Context(spark=spark))(df)
    got = {r["id"]: r["s"] for r in out.collect()}
    assert set(got) == {1, 2}              # 3 and 4 share no vocabulary
    assert all(v > 0 for v in got.values())
    # multiple like docs pool their vocabulary
    out2 = compile_pipeline(
        [{"$search": {"moreLikeThis": {"like": [
            {"t": "cast iron"}, {"cat": "eng"}]}}},
         {"$project": {"id": 1}}],
        Context(spark=spark))(df)
    assert sorted(r["id"] for r in out2.collect()) == [2, 3]
    import pytest

    with pytest.raises(ValueError, match="analyzable"):
        compile_pipeline(
            [{"$search": {"moreLikeThis": {"like": {"views": 9}}}}],
            Context(spark=spark))(df)


def test_search_in_and_near(spark):
    """`in`: equality against any of a value list (array fields match on
    any element); `near`: every doc with the field matches, scored
    pivot/(pivot + |value - origin|) — Atlas's decay, deterministic for
    numeric and ISO-date origins; geo origins rejected."""
    got = _search(spark, _DOCS, _SCHEMA,
                  {"in": {"path": "cat", "value": ["news", "nosuch"]}})
    assert sorted(g[0] for g in got) == [1, 3]
    got = _search(spark, _DOCS, _SCHEMA,
                  {"in": {"path": "views", "value": 25}})
    assert [g[0] for g in got] == [2]
    # near over views, origin 25, pivot 15: doc2 dist 0 -> 1.0,
    # doc1 dist 15 -> 0.5, doc4 dist 20 -> 15/35, doc3 dist 15 -> 0.5
    got = _search(spark, _DOCS, _SCHEMA,
                  {"near": {"path": "views", "origin": 25, "pivot": 15}})
    by = dict(got)
    assert abs(by[2] - 1.0) < 1e-12
    assert abs(by[1] - 0.5) < 1e-12 and abs(by[3] - 0.5) < 1e-12
    assert abs(by[4] - 15.0 / 35.0) < 1e-12
    # array-field `in`: any element matches
    rows = [(1, ["a", "b"]), (2, ["c"]), (3, None)]
    df = spark.createDataFrame(rows, "id long, tags array<string>")
    out = compile_pipeline(
        [{"$search": {"in": {"path": "tags", "value": ["b", "z"]}}},
         {"$project": {"id": 1}}],
        Context(spark=spark))(df)
    assert [r["id"] for r in out.collect()] == [1]
    import pytest

    # a geo origin over a NON-geo path is a clear schema error (geo
    # near itself is covered by test_search_geo_shape_and_near)
    df2 = spark.createDataFrame(_DOCS, _SCHEMA)
    with pytest.raises(ValueError, match="geo path"):
        compile_pipeline(
            [{"$search": {"near": {"path": "views", "pivot": 1,
                                   "origin": {"type": "Point",
                                              "coordinates": [0, 0]}}}}],
            Context(spark=spark))(df2)


def test_search_near_date_pivot_milliseconds(spark):
    """r6 advisor fix: a date-origin near measures distance in
    MILLISECONDS (Atlas's documented unit), so an Atlas pivot ports
    unchanged — a doc 1s from the origin with pivot 1000 scores 0.5."""
    rows = [(1, "2024-01-01T00:00:00Z"), (2, "2024-01-01T00:00:01Z"),
            (3, None)]
    df_rows = [(i, t) for i, t in rows]
    got = _search(spark, df_rows, "id long, ts string",
                  {"near": {"path": "ts", "origin": "2024-01-01T00:00:00Z",
                            "pivot": 1000}})
    by = dict(got)
    assert abs(by[1] - 1.0) < 1e-12
    assert abs(by[2] - 0.5) < 1e-12          # 1000/(1000+1000ms)
    assert 3 not in by


def test_query_string_numeric_range_on_messy_strings(spark):
    """r6 advisor fix: a numeric range over a string field holding
    non-numeric values must not-match those rows (try_cast), not throw
    under ANSI mode's strict string->double cast."""
    rows = [(1, "15"), (2, "oops"), (3, "35"), (4, None)]
    df = spark.createDataFrame(rows, "id long, v string")
    out = compile_pipeline(
        [{"$search": {"queryString": {"defaultPath": "v",
                                      "query": "v:[10 TO 20]"}}},
         {"$project": {"id": 1}}],
        Context(spark=spark))(df)
    assert [r["id"] for r in out.collect()] == [1]


def test_search_review_fixes(spark):
    """r5 review regressions: embeddedDocument should-only compounds
    need >= 1 should match; queryString field-scoped quoted phrases stay
    one token; mixed-type ranges compare lexicographically."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("items", T.ArrayType(T.StructType([
            T.StructField("name", T.StringType()),
        ]))),
    ])
    df = spark.createDataFrame(
        [(1, [{"name": "apple"}]), (2, [{"name": "fig"}])], schema)
    out = compile_pipeline(
        [{"$search": {"embeddedDocument": {
            "path": "items",
            "operator": {"compound": {"should": [
                {"text": {"query": "apple", "path": "name"}}]}}}}},
         {"$project": {"id": 1}}],
        Context(spark=spark))(df)
    # should-only: doc 2 must NOT match just for having elements
    assert [r["id"] for r in out.collect()] == [1]

    docs = spark.createDataFrame(_DOCS, _SCHEMA)
    out2 = compile_pipeline(
        [{"$search": {"queryString": {
            "defaultPath": "cat", "query": 't:"brown fox"'}}},
         {"$project": {"id": 1}}],
        Context(spark=spark))(docs)
    # the field-scoped phrase must bind to t, adjacent-token semantics
    assert [r["id"] for r in out2.collect()] == [1]
    # mixed range -> lexicographic on the string rendering
    out3 = compile_pipeline(
        [{"$search": {"queryString": {
            "defaultPath": "t", "query": "cat:[blog TO news]"}}},
         {"$project": {"id": 1}}],
        Context(spark=spark))(docs)
    assert sorted(r["id"] for r in out3.collect()) == [1, 2, 3, 4]


def test_search_geo_within(spark):
    """$search geoWithin box/circle/polygon over [lon, lat] and GeoJSON
    point columns (atlas.py geo helpers; Atlas geoWithin semantics)."""
    rows = [
        (1, [4.35, 50.85]),    # Brussels
        (2, [2.35, 48.86]),    # Paris
        (3, [-74.0, 40.71]),   # New York
        (4, [151.21, -33.87]),  # Sydney
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, loc array<double>")
    run = lambda spec: sorted(
        r["id"]
        for r in compile_pipeline(
            [{"$search": spec}, {"$project": {"id": 1}}],
            Context(spark=spark))(df).collect()
    )
    # box around western Europe
    assert run({"geoWithin": {
        "path": "loc",
        "box": {"bottomLeft": [-5.0, 42.0], "topRight": [10.0, 55.0]},
    }}) == [1, 2]
    # circle: 350 km around Brussels reaches Paris (~264 km), not NY
    assert run({"geoWithin": {
        "path": "loc",
        "circle": {"center": {"type": "Point",
                              "coordinates": [4.35, 50.85]},
                   "radius": 350_000.0},
    }}) == [1, 2]
    # 200 km circle keeps only Brussels itself
    assert run({"geoWithin": {
        "path": "loc",
        "circle": {"center": [4.35, 50.85], "radius": 200_000.0},
    }}) == [1]
    # polygon with a hole: big EU square minus a notch around Paris
    assert run({"geoWithin": {
        "path": "loc",
        "geometry": {
            "type": "Polygon",
            "coordinates": [
                [[-5.0, 42.0], [10.0, 42.0], [10.0, 55.0], [-5.0, 55.0],
                 [-5.0, 42.0]],
                [[2.0, 48.0], [3.0, 48.0], [3.0, 49.5], [2.0, 49.5],
                 [2.0, 48.0]],
            ],
        },
    }}) == [1]
    # MultiPolygon: EU square OR a square around Sydney
    assert run({"geoWithin": {
        "path": "loc",
        "geometry": {
            "type": "MultiPolygon",
            "coordinates": [
                [[[-5.0, 42.0], [10.0, 42.0], [10.0, 55.0], [-5.0, 55.0]]],
                [[[150.0, -35.0], [152.0, -35.0], [152.0, -33.0],
                  [150.0, -33.0]]],
            ],
        },
    }}) == [1, 2, 4]


def test_search_geo_shape_and_near(spark):
    """$search geoShape relations over point fields + near with a geo
    origin (haversine pivot decay)."""
    rows = [(1, {"type": "Point", "coordinates": [4.35, 50.85]}),
            (2, {"type": "Point", "coordinates": [2.35, 48.86]}),
            (3, {"type": "Point", "coordinates": [-74.0, 40.71]})]
    df = spark.createDataFrame(
        rows,
        "id long, loc struct<type string, coordinates array<double>>")
    eu = {"type": "Polygon",
          "coordinates": [[[-5.0, 42.0], [10.0, 42.0], [10.0, 55.0],
                           [-5.0, 55.0]]]}
    run = lambda spec, proj={"id": 1}: compile_pipeline(
        [{"$search": spec}, {"$project": proj}],
        Context(spark=spark))(df).collect()
    ids = lambda spec: sorted(r["id"] for r in run(spec))
    assert ids({"geoShape": {"path": "loc", "relation": "within",
                             "geometry": eu}}) == [1, 2]
    assert ids({"geoShape": {"path": "loc", "relation": "intersects",
                             "geometry": eu}}) == [1, 2]
    assert ids({"geoShape": {"path": "loc", "relation": "disjoint",
                             "geometry": eu}}) == [3]
    assert ids({"geoShape": {
        "path": "loc", "relation": "contains",
        "geometry": {"type": "Point", "coordinates": [2.35, 48.86]},
    }}) == [2]
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        run({"geoShape": {"path": "loc", "relation": "contains",
                          "geometry": eu}})
    # near with geo origin: Brussels origin, pivot 100 km
    out = run({"near": {"path": "loc",
                        "origin": {"type": "Point",
                                   "coordinates": [4.35, 50.85]},
                        "pivot": 100_000.0}},
              {"id": 1, "s": {"$meta": "searchScore"}})
    by = {r["id"]: r["s"] for r in out}
    assert abs(by[1] - 1.0) < 1e-9              # distance 0 -> score 1
    assert by[1] > by[2] > by[3] > 0
    # Paris ~264 km from Brussels: score = 1e5 / (1e5 + d)
    import math as _m
    assert abs(by[2] - 1e5 / (1e5 + 263_000)) < 0.01


def test_search_regex(spark):
    """$search regex: whole-value regular-expression match (wildcard's
    sibling), top-level, inside compound, and inside embeddedDocument."""
    rows = [(1, "alpha-7", [{"sku": "A-001"}]),
            (2, "beta-22", [{"sku": "B-17"}]),
            (3, None, [])]
    df = spark.createDataFrame(
        rows, "id long, code string, items array<struct<sku string>>")
    run = lambda spec: sorted(
        r["id"] for r in compile_pipeline(
            [{"$search": spec}, {"$project": {"id": 1}}],
            Context(spark=spark))(df).collect())
    assert run({"regex": {"path": "code", "query": "[a-z]+-[0-9]"}}) == [1]
    assert run({"regex": {"path": "code",
                          "query": "[a-z]+-[0-9]+"}}) == [1, 2]
    assert run({"compound": {
        "must": [{"regex": {"path": "code", "query": ".*-22"}}]}}) == [2]
    assert run({"embeddedDocument": {
        "path": "items",
        "operator": {"regex": {"path": "sku",
                               "query": "A-[0-9]{3}"}}}}) == [1]


def test_geo_near_stage(spark):
    """Mongo-core $geoNear: nearest-first, distanceField (+multiplier),
    query filter, min/max distance, includeLocs, null geo drops."""
    import pytest

    rows = [(1, [4.35, 50.85], "a"), (2, [2.35, 48.86], "b"),
            (3, [-74.0, 40.71], "a"), (4, None, "a")]
    df = spark.createDataFrame(rows, "id long, loc array<double>, g string")
    out = compile_pipeline(
        [{"$geoNear": {"near": {"type": "Point", "coordinates": [4.0, 50.0]},
                       "distanceField": "d", "key": "loc",
                       "distanceMultiplier": 0.001,
                       "includeLocs": "where"}}],
        Context(spark=spark))(df).collect()
    assert [r["id"] for r in out] == [1, 2, 3]     # nearest-first, 4 drops
    assert out[0]["where"] == [4.35, 50.85]
    # Brussels ~98 km from (4.0, 50.0): multiplier 0.001 -> km
    assert 90 < out[0]["d"] < 110
    assert out[1]["d"] < out[2]["d"]
    # query + maxDistance compose as plain conjuncts
    out = compile_pipeline(
        [{"$geoNear": {"near": [4.0, 50.0], "distanceField": "d",
                       "key": "loc", "query": {"g": "a"},
                       "maxDistance": 1_000_000.0}}],
        Context(spark=spark))(df).collect()
    assert [r["id"] for r in out] == [1]
    # minDistance excludes the near ring
    out = compile_pipeline(
        [{"$geoNear": {"near": [4.0, 50.0], "distanceField": "d",
                       "key": "loc", "minDistance": 1_000_000.0}}],
        Context(spark=spark))(df).collect()
    assert [r["id"] for r in out] == [3]
    # key is required: no index to infer the geo field from
    with pytest.raises(ValueError, match="key"):
        compile_pipeline(
            [{"$geoNear": {"near": [0.0, 0.0], "distanceField": "d"}}],
            Context(spark=spark))(df)


def test_geo_polygon_raycast_property(spark):
    """The unrolled XOR-chain ray cast must agree with an independent
    per-point Python pnpoly over seeded random points and concave /
    holed / multi polygons (guards Column operator-precedence and null
    regressions in the geo compiler)."""
    import random

    rng = random.Random(20260814)
    pts = [[round(rng.uniform(-10, 10), 3), round(rng.uniform(-10, 10), 3)]
           for _ in range(300)]

    def pnpoly(ring, x, y):
        c = False
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if (y1 > y) != (y2 > y) and \
                    x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
                c = not c
        return c

    concave = [[-5.0, -5.0], [5.0, -5.0], [5.0, 5.0], [0.0, 0.5],
               [-5.0, 5.0]]                      # notched top
    outer = [[-8.0, -8.0], [8.0, -8.0], [8.0, 8.0], [-8.0, 8.0]]
    hole = [[-2.0, -2.0], [2.0, -2.0], [2.0, 2.0], [-2.0, 2.0]]
    island = [[9.0, 9.0], [9.9, 9.0], [9.9, 9.9], [9.0, 9.9]]

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)], "id long, loc array<double>")

    def spark_inside(geometry):
        got = compile_pipeline(
            [{"$search": {"geoWithin": {"path": "loc",
                                        "geometry": geometry}}},
             {"$project": {"id": 1}}],
            Context(spark=spark))(df).collect()
        return {r["id"] for r in got}

    # concave polygon
    exp = {i for i, (x, y) in enumerate(pts) if pnpoly(concave, x, y)}
    assert spark_inside({"type": "Polygon",
                         "coordinates": [concave]}) == exp
    # polygon with a hole
    exp = {i for i, (x, y) in enumerate(pts)
           if pnpoly(outer, x, y) and not pnpoly(hole, x, y)}
    assert spark_inside({"type": "Polygon",
                         "coordinates": [outer, hole]}) == exp
    # multipolygon: holed square OR island
    exp = {i for i, (x, y) in enumerate(pts)
           if (pnpoly(outer, x, y) and not pnpoly(hole, x, y))
           or pnpoly(island, x, y)}
    assert spark_inside({"type": "MultiPolygon",
                         "coordinates": [[outer, hole], [island]]}) == exp


def test_search_sort_option(spark):
    """Atlas $search `sort`: field order replaces relevance order
    (score desc stays the tie-break; {$meta: searchScore} mixes the
    score back in)."""
    import pytest

    df = spark.createDataFrame(_DOCS, _SCHEMA)
    out = compile_pipeline(
        [{"$search": {"exists": {"path": "t"}, "sort": {"views": -1}}},
         {"$project": {"id": 1}}],
        Context(spark=spark))(df).collect()
    assert [r["id"] for r in out] == [3, 2, 1]       # views 40, 25, 10
    out = compile_pipeline(
        [{"$search": {"exists": {"path": "t"},
                      "sort": {"s": {"$meta": "searchScore"},
                               "views": 1}}},
         {"$project": {"id": 1}}],
        Context(spark=spark))(df).collect()
    assert [r["id"] for r in out] == [1, 2, 3]       # equal scores -> views
    with pytest.raises(ValueError, match="sort"):
        compile_pipeline(
            [{"$search": {"exists": {"path": "t"}, "sort": {}}}],
            Context(spark=spark))(df)


def test_search_sort_and_geo_near_validation(spark):
    """Review fixes: $search sort rejects directions beyond 1/-1;
    $geoNear rejects a negative distanceMultiplier."""
    import pytest

    df = spark.createDataFrame(_DOCS, _SCHEMA)
    with pytest.raises(ValueError, match="sort values"):
        compile_pipeline(
            [{"$search": {"exists": {"path": "t"},
                          "sort": {"views": "asc"}}}],
            Context(spark=spark))(df).collect()
    with pytest.raises(ValueError, match="nonnegative"):
        compile_pipeline(
            [{"$geoNear": {"near": [0.0, 0.0], "distanceField": "d",
                           "key": "loc", "distanceMultiplier": -1.0}}],
            Context(spark=spark))


def test_search_meta_geo_operator(spark):
    """$searchMeta counts/facets through the geo clauses (shared
    _search_clause path — geoWithin region counts come for free)."""
    rows = [(1, [4.35, 50.85], "be"), (2, [2.35, 48.86], "fr"),
            (3, [-74.0, 40.71], "us"), (4, None, "be")]
    df = spark.createDataFrame(
        rows, "id long, loc array<double>, country string")
    out = compile_pipeline(
        [{"$searchMeta": {"geoWithin": {
            "path": "loc",
            "box": {"bottomLeft": [-5.0, 42.0],
                    "topRight": [10.0, 55.0]}}}}],
        Context(spark=spark))(df).collect()
    assert out[0]["count"]["total"] == 2
    out = compile_pipeline(
        [{"$searchMeta": {"facet": {
            "operator": {"geoWithin": {
                "path": "loc",
                "box": {"bottomLeft": [-5.0, 42.0],
                        "topRight": [10.0, 55.0]}}},
            "facets": {"by_country": {"type": "string",
                                      "path": "country"}},
        }}}],
        Context(spark=spark))(df).collect()
    row = out[0].asDict(recursive=True)
    assert row["count"]["total"] == 2
    buckets = {b["_id"]: b["count"]
               for b in row["facet"]["by_country"]["buckets"]}
    assert buckets == {"be": 1, "fr": 1}


# ------------------------------------------------------- text.synonyms


def _syn_ctx(spark, docs, mapping_rows):
    mapping = spark.createDataFrame(
        mapping_rows,
        "mappingType string, input array<string>, synonyms array<string>")
    return Context(spark=spark, collections={"syn": mapping})


def _syn_docs(spark):
    return spark.createDataFrame(
        [(1, "my car is fast"), (2, "an auto on the road"),
         (3, "the automobile age"), (4, "a bicycle lane"),
         (5, "car auto together")],
        "doc_id long, text string")


def test_search_text_synonyms_equivalent(spark):
    docs = _syn_docs(spark)
    ctx = _syn_ctx(spark, docs,
                   [("equivalent", None, ["car", "auto", "automobile"])])
    out = compile_pipeline(
        [{"$search": {"text": {"query": "car", "path": "text",
                               "synonyms": "syn"}}},
         {"$project": {"doc_id": 1, "s": {"$meta": "searchScore"}}}],
        ctx,
    )(docs).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {1, 2, 3, 5}  # every synonym matches, bicycle doesn't
    by_id = {r["doc_id"]: r["s"] for r in out}
    # the group is ONE BM25 term slot: doc 5 has tf 2 for the group and
    # the shortest... (two synonym tokens) so it outranks single-hit docs
    assert by_id[5] == max(by_id.values())
    # without synonyms only the literal token matches
    plain = compile_pipeline(
        [{"$search": {"text": {"query": "car", "path": "text"}}}],
        ctx,
    )(docs).collect()
    assert {r["doc_id"] for r in plain} == {1, 5}


def test_search_text_synonyms_explicit_is_one_directional(spark):
    docs = _syn_docs(spark)
    # explicit: "vehicle" REWRITES to car/auto; car does NOT expand
    ctx = _syn_ctx(spark, docs,
                   [("explicit", ["vehicle"], ["car", "auto"])])
    out = compile_pipeline(
        [{"$search": {"text": {"query": "vehicle", "path": "text",
                               "synonyms": "syn"}}}],
        ctx,
    )(docs).collect()
    assert {r["doc_id"] for r in out} == {1, 2, 5}
    # an input token not in the synonyms list does not match itself:
    # docs saying "vehicle" are NOT matched unless listed
    docs2 = docs.union(spark.createDataFrame(
        [(6, "a vehicle here")], "doc_id long, text string"))
    out2 = compile_pipeline(
        [{"$search": {"text": {"query": "vehicle", "path": "text",
                               "synonyms": "syn"}}}],
        ctx,
    )(docs2).collect()
    assert 6 not in {r["doc_id"] for r in out2}


def test_search_synonyms_in_compound_filter_and_meta(spark):
    docs = _syn_docs(spark)
    ctx = _syn_ctx(spark, docs,
                   [("equivalent", None, ["car", "auto", "automobile"])])
    out = compile_pipeline(
        [{"$search": {"compound": {
            "filter": [{"text": {"query": "car", "path": "text",
                                 "synonyms": "syn"}}],
            "mustNot": [{"text": {"query": "together", "path": "text"}}],
        }}},
         {"$project": {"doc_id": 1}}],
        ctx,
    )(docs).collect()
    assert {r["doc_id"] for r in out} == {1, 2, 3}
    meta = compile_pipeline(
        [{"$searchMeta": {"count": {"type": "total"},
                          "text": {"query": "car", "path": "text",
                                   "synonyms": "syn"}}}],
        ctx,
    )(docs).collect()
    assert meta[0]["count"]["total"] == 4


def test_search_synonyms_validation(spark):
    docs = _syn_docs(spark)
    ctx = _syn_ctx(spark, docs, [("fuzzy", None, ["a", "b"])])
    import pytest

    with pytest.raises(ValueError, match="mappingType"):
        compile_pipeline(
            [{"$search": {"text": {"query": "car", "path": "text",
                                   "synonyms": "syn"}}}],
            ctx,
        )(docs).collect()
    with pytest.raises(Exception, match="collection|synonyms"):
        compile_pipeline(
            [{"$search": {"text": {"query": "car", "path": "text",
                                   "synonyms": "missing"}}}],
            Context(spark=spark),
        )(docs).collect()


# ----------------------------------------------------------- text.fuzzy


def test_search_text_fuzzy(spark):
    docs = spark.createDataFrame(
        [(1, "the spark engine"), (2, "a sparc processor"),
         (3, "spork utensils"), (4, "nothing related")],
        "doc_id long, text string")
    out = compile_pipeline(
        [{"$search": {"text": {"query": "spark", "path": "text",
                               "fuzzy": {"maxEdits": 1}}}},
         {"$project": {"doc_id": 1, "s": {"$meta": "searchScore"}}}],
        Context(spark=spark),
    )(docs).collect()
    # spark (0 edits), sparc (1), spork (1); "nothing related" excluded
    assert {r["doc_id"] for r in out} == {1, 2, 3}
    assert all(r["s"] > 0 for r in out)


def test_search_text_fuzzy_prefix_length(spark):
    docs = spark.createDataFrame(
        [(1, "the spark engine"), (2, "a sparc processor"),
         (3, "spork utensils")],
        "doc_id long, text string")
    out = compile_pipeline(
        [{"$search": {"text": {"query": "spark", "path": "text",
                               "fuzzy": {"maxEdits": 1,
                                         "prefixLength": 4}}}}],
        Context(spark=spark),
    )(docs).collect()
    # prefixLength 4 requires the literal "spar" prefix — spork drops
    assert {r["doc_id"] for r in out} == {1, 2}


def test_search_text_fuzzy_validation_and_meta(spark):
    docs = spark.createDataFrame([(1, "text spark")],
                                 "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError, match="maxEdits"):
        compile_pipeline(
            [{"$search": {"text": {"query": "x", "path": "text",
                                   "fuzzy": {"maxEdits": 3}}}}],
            Context(spark=spark))(docs).collect()
    mapping = spark.createDataFrame(
        [("equivalent", None, ["a", "b"])],
        "mappingType string, input array<string>, synonyms array<string>")
    with pytest.raises(ValueError, match="fuzzy with synonyms"):
        compile_pipeline(
            [{"$search": {"text": {"query": "x", "path": "text",
                                   "fuzzy": {"maxEdits": 1},
                                   "synonyms": "syn"}}}],
            Context(spark=spark, collections={"syn": mapping}))(docs)
    # $searchMeta counting honors fuzzy membership
    meta = compile_pipeline(
        [{"$searchMeta": {"count": {"type": "total"},
                          "text": {"query": "sperk", "path": "text",
                                   "fuzzy": {"maxEdits": 1}}}}],
        Context(spark=spark),
    )(docs).collect()
    assert meta[0]["count"]["total"] == 1


def test_search_fuzzy_damerau_transpositions(spark):
    """r6: Lucene counts an adjacent transposition as ONE edit — "hte"
    matches "the" at maxEdits 1 (plain Levenshtein says 2); at
    maxEdits 2 a transposition plus one other edit matches; $searchMeta
    counts stay in lockstep; a required prefix still excludes variants
    that disturb it."""
    docs = spark.createDataFrame(
        [(1, "hte quick fox"),        # transposed "the": DL 1, lev 2
         (2, "the quick fox"),        # exact
         (3, "het quick fox"),        # "het": transpose he -> eh? DL("het","the")
         (4, "thx quick fox"),        # substitution: lev 1
         (5, "htes quick fox"),       # transpose + insert: DL 2
         (6, "xyz words here")],
        "doc_id long, text string")
    got = lambda spec: {r["doc_id"] for r in compile_pipeline(
        [{"$search": spec}, {"$project": {"doc_id": 1}}],
        Context(spark=spark))(docs).collect()}
    assert got({"text": {"query": "the", "path": "text",
                         "fuzzy": {"maxEdits": 1}}}) >= {1, 2, 4}
    assert 5 not in got({"text": {"query": "the", "path": "text",
                                  "fuzzy": {"maxEdits": 1}}})
    assert 6 not in got({"text": {"query": "the", "path": "text",
                                  "fuzzy": {"maxEdits": 2}}})
    assert got({"text": {"query": "the", "path": "text",
                         "fuzzy": {"maxEdits": 2}}}) >= {1, 2, 4, 5}
    # $searchMeta honors the same Damerau membership
    meta = compile_pipeline(
        [{"$searchMeta": {"count": {"type": "total"},
                          "text": {"query": "the", "path": "text",
                                   "fuzzy": {"maxEdits": 1}}}}],
        Context(spark=spark))(docs).collect()
    assert meta[0]["count"]["total"] == len(
        got({"text": {"query": "the", "path": "text",
                      "fuzzy": {"maxEdits": 1}}}))
    # prefixLength 1 demands a literal "t" start: "hte" drops
    assert 1 not in got({"text": {"query": "the", "path": "text",
                                  "fuzzy": {"maxEdits": 1,
                                            "prefixLength": 1}}})


def test_search_fuzzy_prefix_longer_than_term(spark):
    # prefixLength caps at the term length: longer candidates that
    # START with the whole term still match (Lucene behavior)
    docs = spark.createDataFrame(
        [(1, "ab here"), (2, "abc here"), (3, "xbc here")],
        "doc_id long, text string")
    out = compile_pipeline(
        [{"$search": {"text": {"query": "ab", "path": "text",
                               "fuzzy": {"maxEdits": 1,
                                         "prefixLength": 3}}}}],
        Context(spark=spark),
    )(docs).collect()
    assert {r["doc_id"] for r in out} == {1, 2}  # xbc lacks the prefix


def test_search_synonyms_explicit_empty_rewrites_to_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "a vehicle here"), (2, "plain words")],
        "doc_id long, text string")
    mapping = spark.createDataFrame(
        [("explicit", ["vehicle"], [])],
        "mappingType string, input array<string>, synonyms array<string>")
    ctx = Context(spark=spark, collections={"syn": mapping})
    out = compile_pipeline(
        [{"$search": {"text": {"query": "vehicle", "path": "text",
                               "synonyms": "syn"}}}],
        ctx,
    )(docs).collect()
    assert out == []  # rewritten to nothing — matches NO document
    meta = compile_pipeline(
        [{"$searchMeta": {"count": {"type": "total"},
                          "text": {"query": "vehicle", "path": "text",
                                   "synonyms": "syn"}}}],
        ctx,
    )(docs).collect()
    assert meta[0]["count"]["total"] == 0


def test_search_synonyms_multiword_rejected(spark):
    import pytest

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    mapping = spark.createDataFrame(
        [("equivalent", None, ["car", "motor vehicle"])],
        "mappingType string, input array<string>, synonyms array<string>")
    with pytest.raises(NotImplementedError, match="multi-word"):
        compile_pipeline(
            [{"$search": {"text": {"query": "car", "path": "text",
                                   "synonyms": "syn"}}}],
            Context(spark=spark, collections={"syn": mapping}),
        )(docs).collect()


def _osa_dp(a, b):
    """Reference optimal-string-alignment (restricted Damerau) DP."""
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


def test_search_fuzzy_max_edits_2_exact_osa(spark):
    """r7: fuzzy matching is EXACT OSA at BOTH maxEdits levels — the r6
    k=2 over-match (second edit inside the transposed pair, e.g. term
    'ab' vs token 'bxa': OSA 3 but within 1 edit of the swap 'ba') is
    closed.  Exhaustive differential vs the OSA DP: adversarial short
    binary/ternary-alphabet terms against EVERY token of length <= 6
    over {a, b, x}, through the real $search SQL path, with the
    $searchMeta Column path counted in lockstep."""
    import itertools

    toks = ["".join(p) for n in range(1, 7)
            for p in itertools.product("abx", repeat=n)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, text string")
    terms = ["ab", "ba", "aab", "aba", "abx", "bab",
             "abab", "abba", "the"]
    for term in terms:
        for k in (1, 2):
            want = {i for i, t in enumerate(toks)
                    if _osa_dp(term, t) <= k}
            got = {r["doc_id"] for r in compile_pipeline(
                [{"$search": {"text": {"query": term, "path": "text",
                                       "fuzzy": {"maxEdits": k}}}},
                 {"$project": {"doc_id": 1}}],
                Context(spark=spark))(docs).collect()}
            assert got == want, (
                term, k, sorted(toks[i] for i in got - want)[:5],
                sorted(toks[i] for i in want - got)[:5])
        # $searchMeta count stays in lockstep with the rowset
        meta = compile_pipeline(
            [{"$searchMeta": {"count": {"type": "total"},
                              "text": {"query": term, "path": "text",
                                       "fuzzy": {"maxEdits": 2}}}}],
            Context(spark=spark))(docs).collect()
        assert meta[0]["count"]["total"] == len(
            {i for i, t in enumerate(toks) if _osa_dp(term, t) <= 2})
