"""Superset operators beyond the reference's witnessed surface: trig,
array-N selectors, regex find, array-expression $sum/$avg/$min/$max, and
the extended accumulator family ($top/$bottom/$topN/$median/$percentile)."""

import math

import pytest
from pyspark.sql import functions as F

from pincette_mongo_streams_spark import Context, compile_pipeline
from pincette_mongo_streams_spark.expressions import ExprContext, compile_expr


def _eval(spark, expr, rows, schema):
    df = spark.createDataFrame(rows, schema)
    col = compile_expr(expr, ExprContext(schema=df.schema))
    return [r["out"] for r in df.select(col.alias("out")).collect()]


def test_trig_family(spark):
    rows = [(0.5,)]
    out = _eval(spark, {"$sin": "$x"}, rows, "x double")[0]
    assert out == pytest.approx(math.sin(0.5))
    out = _eval(spark, {"$atan2": ["$x", 1.0]}, rows, "x double")[0]
    assert out == pytest.approx(math.atan2(0.5, 1.0))
    out = _eval(spark, {"$degreesToRadians": 180}, rows, "x double")[0]
    assert out == pytest.approx(math.pi)


def test_sort_first_last_max_min_n(spark):
    rows = [([3, 1, 2, 5, 4],)]
    assert _eval(spark, {"$sortArray": {"input": "$a", "sortBy": 1}}, rows, "a array<int>")[0] == [1, 2, 3, 4, 5]
    assert _eval(spark, {"$sortArray": {"input": "$a", "sortBy": -1}}, rows, "a array<int>")[0] == [5, 4, 3, 2, 1]
    assert _eval(spark, {"$firstN": {"input": "$a", "n": 2}}, rows, "a array<int>")[0] == [3, 1]
    assert _eval(spark, {"$lastN": {"input": "$a", "n": 2}}, rows, "a array<int>")[0] == [5, 4]
    assert _eval(spark, {"$maxN": {"input": "$a", "n": 2}}, rows, "a array<int>")[0] == [5, 4]
    assert _eval(spark, {"$minN": {"input": "$a", "n": 2}}, rows, "a array<int>")[0] == [1, 2]
    # n larger than the array -> whole array
    assert _eval(spark, {"$lastN": {"input": "$a", "n": 9}}, rows, "a array<int>")[0] == [3, 1, 2, 5, 4]


def test_numeric_array_expressions(spark):
    rows = [([1.0, 2.0, 3.0],)]
    assert _eval(spark, {"$sum": "$a"}, rows, "a array<double>")[0] == 6.0
    assert _eval(spark, {"$avg": "$a"}, rows, "a array<double>")[0] == 2.0
    assert _eval(spark, {"$max": "$a"}, rows, "a array<double>")[0] == 3.0
    assert _eval(spark, {"$min": "$a"}, rows, "a array<double>")[0] == 1.0
    # multi-arg form
    assert _eval(spark, {"$sum": [1, 2, 3]}, rows, "a array<double>")[0] == 6.0
    # empty array: $sum -> 0, $avg -> null
    empty = [([],)]
    assert _eval(spark, {"$sum": "$a"}, empty, "a array<double>")[0] == 0.0
    assert _eval(spark, {"$avg": "$a"}, empty, "a array<double>")[0] is None


def test_regex_find(spark):
    rows = [("care about cats",), ("no match here",)]
    out = _eval(
        spark, {"$regexFind": {"input": "$s", "regex": "ca[rt]"}}, rows, "s string"
    )
    assert out[0].asDict() == {"match": "car", "idx": 0}
    assert out[1] is None
    out = _eval(
        spark, {"$regexFindAll": {"input": "$s", "regex": "ca[rt]"}}, rows, "s string"
    )
    assert out[0] == ["car", "cat"]
    assert out[1] == []


def test_is_number_binary_size(spark):
    rows = [(1.5, "abc")]
    assert _eval(spark, {"$isNumber": "$x"}, rows, "x double, s string")[0] is True
    assert _eval(spark, {"$isNumber": "$s"}, rows, "x double, s string")[0] is False
    assert _eval(spark, {"$binarySize": "$s"}, rows, "x double, s string")[0] == 3


def test_to_hashed_index_key_proxy(spark):
    # documented proxy: stable engine-native int64, not Mongo's constant
    rows = [("a",), ("a",), ("b",), (None,)]
    out = _eval(spark, {"$toHashedIndexKey": "$s"}, rows, "s string")
    assert out[0] == out[1] and out[0] != out[2]
    assert isinstance(out[0], int)


def test_bson_size_json_proxy(spark):
    # documented proxy: UTF-8 byte length of the JSON encoding
    rows = [((1, "ab"),), (None,)]
    schema = "d struct<i: long, s: string>"
    out = _eval(spark, {"$bsonSize": "$d"}, rows, schema)
    assert out[0] == len('{"i":1,"s":"ab"}')
    assert out[1] is None


def _group(spark, rows, schema, group_expr, order_by=None):
    df = spark.createDataFrame(rows, schema)
    ctx = Context(spark=spark, order_by=order_by)
    return compile_pipeline([{"$group": group_expr}], ctx)(df).collect()


def test_accumulator_top_bottom(spark):
    rows = [("a", 1, 10), ("a", 2, 30), ("a", 3, 20), ("b", 4, 5)]
    out = _group(
        spark, rows, "k string, i long, v long",
        {"_id": "$k",
         "best": {"$top": {"sortBy": {"v": -1}, "output": "$i"}},
         "worst": {"$bottom": {"sortBy": {"v": -1}, "output": "$i"}},
         "top2": {"$topN": {"sortBy": {"v": -1}, "output": "$i", "n": 2}}},
    )
    by_id = {r["_id"]: r for r in out}
    a = by_id["a"]
    assert a["best"] == 2      # highest v=30
    assert a["worst"] == 1     # lowest v=10
    assert a["top2"] == [2, 3]  # v desc: 30, 20
    assert by_id["b"]["best"] == 4


def test_accumulator_n_median_percentile(spark):
    rows = [("a", i, float(i)) for i in range(1, 6)]  # v = 1..5
    out = _group(
        spark, rows, "k string, o long, v double",
        {"_id": "$k",
         "first2": {"$firstN": {"input": "$v", "n": 2}},
         "last2": {"$lastN": {"input": "$v", "n": 2}},
         "max2": {"$maxN": {"input": "$v", "n": 2}},
         "med": {"$median": {"input": "$v"}},
         "pct": {"$percentile": {"input": "$v", "p": [0.0, 1.0]}}},
        order_by="o",
    )
    r = out[0]
    assert r["first2"] == [1.0, 2.0]
    assert r["last2"] == [4.0, 5.0]
    assert r["max2"] == [5.0, 4.0]
    assert r["med"] == 3.0
    assert r["pct"] == [1.0, 5.0]


def test_json_get_and_parse_json(spark):
    rows = [('{"k": 69, "name": "x", "nested": {"d": 1.5}}',), ("not json",), (None,)]
    df = spark.createDataFrame(rows, "props string")
    ectx_rows = _eval(
        spark, {"$jsonGet": {"input": "$props", "path": "k", "type": "long"}},
        rows, "props string",
    )
    assert ectx_rows == [69, None, None]
    assert _eval(
        spark, {"$jsonGet": {"input": "$props", "path": "$.nested.d", "type": "double"}},
        rows, "props string",
    ) == [1.5, None, None]
    assert _eval(
        spark, {"$jsonGet": {"input": "$props", "path": "name"}},
        rows, "props string",
    ) == ["x", None, None]
    # variant path: parse once, extract typed
    from pincette_mongo_streams_spark.expressions import ExprContext, compile_expr
    from pyspark.sql import functions as F
    parsed = df.select(
        compile_expr({"$parseJson": "$props"}, ExprContext(schema=df.schema)).alias("v")
    )
    got = parsed.select(
        compile_expr(
            {"$jsonGet": {"input": "$v", "path": "k", "type": "long"}},
            ExprContext(schema=parsed.schema),
        ).alias("out")
    ).collect()
    assert [r["out"] for r in got] == [69, None, None]


def test_first_n_without_order_by(spark):
    """$firstN/$lastN must not crash when no pipeline order column is
    configured (nondeterministic expressions are illegal inside
    aggregates); the N taken is arbitrary but valid, like Mongo without
    a sort."""
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0)]
    out = _group(
        spark, rows, "k string, v double",
        {"_id": "$k", "f2": {"$firstN": {"input": "$v", "n": 2}},
         "l2": {"$lastN": {"input": "$v", "n": 2}}},
    )
    assert len(out[0]["f2"]) == 2 and len(out[0]["l2"]) == 2
    assert set(out[0]["f2"]) <= {1.0, 2.0, 3.0}


def test_bottom_n_keeps_sort_order(spark):
    """$bottomN returns the tail IN sortBy order, not reversed: values
    [10,20,30] sorted desc = [30,20,10], bottom 2 = [20,10]."""
    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 30)]
    out = _group(
        spark, rows, "k string, i long, v long",
        {"_id": "$k",
         "b2_desc": {"$bottomN": {"sortBy": {"v": -1}, "output": "$v", "n": 2}},
         "b2_asc": {"$bottomN": {"sortBy": {"v": 1}, "output": "$v", "n": 2}},
         "t2_asc": {"$topN": {"sortBy": {"v": 1}, "output": "$v", "n": 2}}},
    )
    r = out[0]
    assert r["b2_desc"] == [20, 10]
    assert r["b2_asc"] == [20, 30]
    assert r["t2_asc"] == [10, 20]


def test_top_bottom_multikey_sortby(spark):
    """Multi-key sortBy documents with mixed directions: primary key ties
    broken by the secondary key, nulls sorting lowest (Mongo sort order)."""
    rows = [
        ("a", 1, 10, 100),
        ("a", 2, 10, 300),   # ties v=10 with row 1; u breaks the tie
        ("a", 3, 30, 200),
        ("a", 4, None, 999),  # null v sorts lowest
    ]
    out = _group(
        spark, rows, "k string, i long, v long, u long",
        {"_id": "$k",
         # v desc then u asc: order = (30,200)->3, (10,100)->1, (10,300)->2,
         # (null)->4
         "best": {"$top": {"sortBy": {"v": -1, "u": 1}, "output": "$i"}},
         "worst": {"$bottom": {"sortBy": {"v": -1, "u": 1}, "output": "$i"}},
         "top3": {"$topN": {"sortBy": {"v": -1, "u": 1}, "output": "$i", "n": 3}},
         "bot2": {"$bottomN": {"sortBy": {"v": -1, "u": 1}, "output": "$i", "n": 2}},
         # v asc: null first
         "first_asc": {"$top": {"sortBy": {"v": 1, "u": 1}, "output": "$i"}}},
    )
    r = out[0]
    assert r["best"] == 3
    assert r["worst"] == 4
    assert r["top3"] == [3, 1, 2]
    assert r["bot2"] == [2, 4]
    assert r["first_asc"] == 4


def test_window_top_multikey_sortby(spark):
    rows = [("a", 1, 10, 2), ("a", 2, 10, 1), ("a", 3, 5, 9), ("b", 4, 7, 7)]
    df = spark.createDataFrame(rows, "k string, i long, v long, u long")
    ctx = Context(spark=spark)
    out = compile_pipeline(
        [{"$setWindowFields": {
            "partitionBy": "$k",
            "output": {
                "lead": {"$top": {"sortBy": {"v": -1, "u": -1},
                                  "output": "$i"}},
                "lead2": {"$topN": {"sortBy": {"v": -1, "u": -1},
                                    "output": "$i", "n": 2}},
            }}},
         {"$project": {"i": 1, "lead": 1, "lead2": 1}}],
        ctx,
    )(df).collect()
    by_i = {r["i"]: r for r in out}
    # partition a, v desc / u desc: (10,2)->1, (10,1)->2, (5,9)->3
    assert by_i[1]["lead"] == 1 and by_i[3]["lead"] == 1
    assert by_i[2]["lead2"] == [1, 2]
    assert by_i[4]["lead"] == 4


def test_scalar_sum_max_in_expression_position(spark):
    """Mongo accepts scalars for expression-position $sum/$max/$min/$avg:
    the value itself (0 for non-numeric $sum)."""
    rows = [(5.0, "txt")]
    assert _eval(spark, {"$sum": "$x"}, rows, "x double, s string") == [5.0]
    assert _eval(spark, {"$max": "$x"}, rows, "x double, s string") == [5.0]
    assert _eval(spark, {"$min": "$x"}, rows, "x double, s string") == [5.0]
    assert _eval(spark, {"$avg": "$x"}, rows, "x double, s string") == [5.0]
    assert _eval(spark, {"$sum": "$s"}, rows, "x double, s string") == [0.0]


def test_bm25_ranking_and_plan(spark):
    """$bm25 ranks docs containing more/rarer query terms higher; the
    top-k executes as TakeOrderedAndProject (per-partition heap-k, no
    global sort shuffle)."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [
        (1, "spark joins data with spark sql"),
        (2, "pandas eats bamboo"),
        (3, "spark spark spark everywhere"),
        (4, "data data data data data data"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ctx = Context(spark=spark)
    out = compile_pipeline(
        [{"$bm25": {"query": "spark data", "input": "$text",
                    "id": "doc_id", "k": 3}}], ctx
    )(df)
    got = [(r.rank, r.doc_id) for r in out.orderBy("rank").collect()]
    assert len(got) == 3
    assert got[0][0] == 1
    ranked_ids = [d for _, d in got]
    assert 2 not in ranked_ids  # no query term -> score 0, pushed out of top-3
    assert all(r.score > 0 for r in out.collect() if r.doc_id in (1, 3))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_rank_fusion_weights_and_missing_docs(spark):
    """$rankFusion: RRF score sums weight/(k+rank) per pipeline; docs
    present in only one ranking still score; weights shift the order."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [
        (1, "spark sql engine", "alpha beta"),
        (2, "spark spark spark", "beta beta beta"),
        (3, "unrelated words here", "beta gamma delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, t1 string, t2 string")
    ctx = Context(spark=spark)
    out = compile_pipeline(
        [{"$rankFusion": {
            "input": {"pipelines": {
                "p1": [{"$bm25": {"query": "spark", "input": "$t1",
                                  "id": "doc_id", "k": 2}}],
                "p2": [{"$bm25": {"query": "beta", "input": "$t2",
                                  "id": "doc_id", "k": 3}}],
            }},
            "combination": {"weights": {"p1": 10, "p2": 1}},
            "rankConstant": 60, "id": "doc_id",
        }}], ctx
    )(df).collect()
    by_id = {r.doc_id: r for r in out}
    assert set(by_id) == {1, 2, 3}          # union of both rankings
    # p1 ranks doc 2 first (tf=3); weight 10 dominates -> doc 2 on top
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)][0] == 2
    # doc 3 appears only in p2 -> its score is exactly 1/(60+rank_p2)
    assert abs(by_id[3].score - 1.0 / (60 + 3)) < 1e-12


def test_fusion_without_limit_is_bounded(spark):
    """A missing `limit` defaults to 1000 (Mongo requires bounded fused
    pipelines): the fused set is probed with ONE TakeOrderedAndProject
    job (limit+1 rows) and the downstream plan reads a <= 1000-row LOCAL
    relation — the final rank window never sorts an unbounded fused set
    through one partition, and the sub-pipelines never execute twice."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [(i, f"spark doc {i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    ctx = Context(spark=spark)
    out = compile_pipeline(
        [{"$rankFusion": {
            "input": {"pipelines": {
                "p1": [{"$bm25": {"query": "spark", "input": "$t",
                                  "id": "doc_id", "k": 3}}],
            }},
            "id": "doc_id",  # no limit
        }}], ctx
    )(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # bounded-by-construction: the plan's source is the collected local
    # relation, not a re-execution of the fused sub-pipelines
    assert "ExistingRDD" in plan or "LocalTableScan" in plan, plan
    assert "BM25" not in plan  # sub-pipeline scans don't re-run
    assert len(out.collect()) == 3


def test_fusion_implicit_limit_truncation_warns(spark):
    """When no `limit` was given and the fused set exceeds the implicit
    default 1000, the stage warns (silent truncation is not detectable
    otherwise); an explicit limit stays silent — that truncation is
    user-requested."""
    import warnings

    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [(i,) for i in range(1, 1102)]        # 1101 fused ids
    df = spark.createDataFrame(rows, "doc_id long")
    ranked = [{"$project": {"doc_id": 1, "rank": "$doc_id"}}]
    ctx = Context(spark=spark)
    with warnings.catch_warnings(record=True) as got:
        warnings.simplefilter("always")
        out = compile_pipeline(
            [{"$rankFusion": {"input": {"pipelines": {"p": ranked}},
                              "id": "doc_id"}}], ctx
        )(df)
        assert len(out.collect()) == 1000
    msgs = [str(w.message) for w in got
            if issubclass(w.category, RuntimeWarning)]
    assert any("$rankFusion" in m and "implicit default limit" in m
               for m in msgs)
    with warnings.catch_warnings(record=True) as got2:
        warnings.simplefilter("always")
        out2 = compile_pipeline(
            [{"$rankFusion": {"input": {"pipelines": {"p": ranked}},
                              "id": "doc_id", "limit": 50}}], ctx
        )(df)
        assert len(out2.collect()) == 50
    assert not [w for w in got2 if issubclass(w.category, RuntimeWarning)]


def test_fusion_warn_on_truncate_false_stays_lazy(spark):
    """`warnOnTruncate: false` is the documented opt-out (advisor r7):
    with the implicit default limit the stage does NOT run the
    truncation probe at apply time — the plan stays fully lazy (the
    fused sub-pipeline appears in it, no collected local relation) and
    no warning fires, at the cost of silent truncation."""
    import warnings

    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [(i,) for i in range(1, 1102)]        # 1101 fused ids
    df = spark.createDataFrame(rows, "doc_id long")
    ranked = [{"$project": {"doc_id": 1, "rank": "$doc_id"}}]
    ctx = Context(spark=spark)
    with warnings.catch_warnings(record=True) as got:
        warnings.simplefilter("always")
        out = compile_pipeline(
            [{"$rankFusion": {"input": {"pipelines": {"p": ranked}},
                              "id": "doc_id", "warnOnTruncate": False}}],
            ctx,
        )(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # lazy: the bound comes from a plan-side limit, not a probe
        assert "LocalTableScan" not in plan, plan
        assert len(out.collect()) == 1000
    assert not [w for w in got if issubclass(w.category, RuntimeWarning)]


def test_score_fusion_sigmoid_and_weights(spark):
    """$scoreFusion: sigmoid normalization maps scores to (0,1); weighted
    average over contributing pipelines; absent docs contribute 0."""
    import math

    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [
        (1, "spark sql engine", "alpha beta"),
        (2, "spark spark spark", "beta beta beta"),
        (3, "unrelated words here", "beta gamma delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, t1 string, t2 string")
    ctx = Context(spark=spark)

    def one(pipe_query, col):
        return [{"$bm25": {"query": pipe_query, "input": col,
                           "id": "doc_id", "k": 2}}]

    out = compile_pipeline(
        [{"$scoreFusion": {
            "input": {"pipelines": {"p1": one("spark", "$t1"),
                                    "p2": one("beta", "$t2")},
                      "normalization": "sigmoid"},
            "combination": {"weights": {"p1": 3, "p2": 1}},
            "id": "doc_id",
        }}], ctx
    )(df)
    got = {r.doc_id: r.score for r in out.collect()}
    # every fused score is a weighted average of (0,1) values -> in [0,1)
    assert all(0 <= s < 1 for s in got.values())
    # doc 2 tops both rankings -> highest fused score
    assert max(got, key=got.get) == 2
    # k=2 keeps docs {1,2} in p1 and two of three in p2 -> union covers all
    assert set(got) <= {1, 2, 3}


def test_bucket_auto_granularity(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(float(v),) for v in [3, 7, 12, 18, 29, 44, 67, 95, 140, 210]],
        "price double",
    )
    out = compile_pipeline(
        [{"$bucketAuto": {"groupBy": "$price", "buckets": 4,
                          "granularity": "R5"}}],
        Context(spark=spark),
    )(df).collect()
    rows = sorted(
        ((r["_id"]["min"], r["_id"]["max"]), r["count"]) for r in out
    )
    # boundaries are R5 series values (s in {1,1.6,2.5,4,6.3} * 10^k)
    import math
    series = [1.0, 1.6, 2.5, 4.0, 6.3]
    for (lo, hi), _ in rows:
        for b in (lo, hi):
            mant = b / (10 ** math.floor(math.log10(b)))
            assert any(abs(mant - s) < 1e-6 or abs(mant - 10 * s) < 1e-6
                       for s in series), b
    # buckets are contiguous and cover all 10 rows
    assert sum(n for _, n in rows) == 10
    bs = [b for b, _ in rows]
    assert all(bs[i][1] == bs[i + 1][0] for i in range(len(bs) - 1))
    # first min rounds DOWN below the data min; last max rounds UP above
    assert bs[0][0] <= 3.0 and bs[-1][1] >= 210.0


def test_bucket_auto_powers_of_2(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(float(v),) for v in [1, 3, 6, 12, 25, 50, 100, 200]],
        "v double",
    )
    out = compile_pipeline(
        [{"$bucketAuto": {"groupBy": "$v", "buckets": 3,
                          "granularity": "POWERSOF2"}}],
        Context(spark=spark),
    )(df).collect()
    import math
    for r in out:
        for b in (r["_id"]["min"], r["_id"]["max"]):
            assert abs(math.log2(b) - round(math.log2(b))) < 1e-9, b
    assert sum(r["count"] for r in out) == 8


def test_bucket_auto_granularity_null_and_empty(spark):
    import pytest
    from pincette_mongo_streams_spark import Context, compile_pipeline

    ctx = Context(spark=spark)
    withnull = spark.createDataFrame(
        [(1.0,), (None,), (5.0,)], "v double")
    with pytest.raises(ValueError, match="non-negative numeric"):
        compile_pipeline(
            [{"$bucketAuto": {"groupBy": "$v", "buckets": 2,
                              "granularity": "R5"}}], ctx
        )(withnull).collect()
    # empty input keeps the contract schema: struct _id + accumulators
    empty = spark.createDataFrame([], "v double")
    out = compile_pipeline(
        [{"$bucketAuto": {"groupBy": "$v", "buckets": 2,
                          "granularity": "R5",
                          "output": {"avg": {"$avg": "$v"}}}}], ctx
    )(empty)
    assert out.count() == 0
    assert [f.name for f in out.schema["_id"].dataType.fields] == ["min", "max"]
    assert "avg" in out.columns


def test_window_range_with_time_unit(spark):
    """{range: [-1, 0], unit: "hour"}: a date-keyed range window spans
    the trailing hour per partition."""
    from datetime import datetime
    from pincette_mongo_streams_spark import Context, compile_pipeline

    rows = [
        ("a", datetime(2024, 1, 1, 10, 0), 1.0),
        ("a", datetime(2024, 1, 1, 10, 30), 2.0),
        ("a", datetime(2024, 1, 1, 11, 15), 4.0),   # 10:30 in range, 10:00 not
        ("a", datetime(2024, 1, 1, 13, 0), 8.0),    # alone
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = compile_pipeline(
        [{"$setWindowFields": {
            "partitionBy": "$k", "sortBy": {"ts": 1},
            "output": {"s": {"$sum": "$v",
                             "window": {"range": [-1, 0],
                                        "unit": "hour"}}}}}],
        Context(spark=spark),
    )(df).collect()
    got = {r["ts"].hour * 100 + r["ts"].minute: r["s"] for r in out}
    assert got[1000] == 1.0
    assert got[1030] == 3.0
    assert got[1115] == 6.0   # 10:30 + 11:15 (10:00 is 75 min back)
    assert got[1300] == 8.0


def test_window_approx_count_distinct(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(i, i % 50) for i in range(500)], "i long, u long")
    out = compile_pipeline(
        [{"$setWindowFields": {
            "sortBy": {"i": 1},
            "output": {"nd": {"$approxCountDistinct": "$u",
                              "window": {"documents":
                                         ["unbounded", "current"]}}}}}],
        Context(spark=spark),
    )(df).collect()
    last = max(out, key=lambda r: r["i"])
    assert abs(last["nd"] - 50) <= 5


def test_densify_date_unit(spark):
    from datetime import datetime
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 0), 1.0),
         ("a", datetime(2024, 1, 1, 3), 2.0)],
        "k string, ts timestamp, v double",
    )
    out = compile_pipeline(
        [{"$densify": {"field": "ts",
                       "range": {"step": 1, "unit": "hour",
                                 "bounds": "full"}}}],
        Context(spark=spark),
    )(df).collect()
    hours = sorted(r["ts"].hour for r in out)
    assert hours == [0, 1, 2, 3]
    filled = [r for r in out if r["v"] is None]
    assert len(filled) == 2  # 01:00 and 02:00 inserted

    # literal date bounds, upper exclusive
    out2 = compile_pipeline(
        [{"$densify": {"field": "ts",
                       "range": {"step": 2, "unit": "hour",
                                 "bounds": ["2024-01-01 00:00:00",
                                            "2024-01-01 06:00:00"]}}}],
        Context(spark=spark),
    )(df).collect()
    hours2 = sorted(r["ts"].hour for r in out2)
    assert hours2 == [0, 2, 3, 4]  # grid 0,2,4 (6 excluded); 0 existed, 3 kept


def test_densify_quarter_and_fractional_step(spark):
    import pytest
    from datetime import datetime
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1),), (datetime(2024, 10, 1),)], "ts timestamp")
    out = compile_pipeline(
        [{"$densify": {"field": "ts",
                       "range": {"step": 1, "unit": "quarter",
                                 "bounds": "full"}}}],
        Context(spark=spark),
    )(df).collect()
    months = sorted(r["ts"].month for r in out)
    assert months == [1, 4, 7, 10]  # quarter = 3 months
    with pytest.raises(ValueError, match="whole number"):
        compile_pipeline(
            [{"$densify": {"field": "ts",
                           "range": {"step": 1.5, "unit": "hour",
                                     "bounds": "full"}}}],
            Context(spark=spark),
        )(df)
