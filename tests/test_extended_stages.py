"""Batch-completeness stages ($sort/$limit/$skip/$sample/$sortByCount/
$unionWith/$facet/$setWindowFields/$fill/$densify) and the $windowGroup
event-time extension."""

import datetime

import pytest

from pincette_mongo_streams_spark import Context, compile_pipeline


def _run(spark, rows, schema, pipeline, collections=None):
    df = spark.createDataFrame(rows, schema)
    ctx = Context(
        spark=spark,
        collections={
            k: spark.createDataFrame(v[0], v[1]) for k, v in (collections or {}).items()
        },
    )
    return compile_pipeline(pipeline, ctx)(df)


def test_sort_limit_skip(spark):
    rows = [(i, 10 - i) for i in range(10)]
    out = _run(
        spark, rows, "i long, v long",
        [{"$sort": {"v": 1}}, {"$skip": 2}, {"$limit": 3}],
    ).collect()
    assert [r["v"] for r in out] == [3, 4, 5]
    out = _run(spark, rows, "i long, v long", [{"$sort": {"v": -1}}, {"$limit": 2}])
    assert [r["v"] for r in out.collect()] == [10, 9]


def test_sample_size(spark):
    rows = [(i,) for i in range(100)]
    out = _run(spark, rows, "i long", [{"$sample": {"size": 7}}]).collect()
    assert len(out) == 7
    assert len({r["i"] for r in out}) == 7  # without replacement


def test_sample_size_no_global_sort(spark):
    """r6 scale path: exact-size $sample Bernoulli-oversamples at the
    scan then takes n by rand() over the ~n-row sample — the plan shows
    a Sample node feeding TakeOrderedAndProject and NEVER a full Sort
    (Exchange rangepartitioning) of the corpus."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.range(10_000).selectExpr("id AS i")
    out = compile_pipeline([{"$sample": {"size": 50, "seed": 42}}],
                           Context(spark=spark))(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sample" in plan and "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
    rows = out.collect()
    assert len(rows) == 50 and len({r["i"] for r in rows}) == 50
    # seeded: deterministic across executions
    again = compile_pipeline([{"$sample": {"size": 50, "seed": 42}}],
                             Context(spark=spark))(df).collect()
    assert {r["i"] for r in again} == {r["i"] for r in rows}
    # size >= population: every row returns (Mongo semantics)
    small = spark.range(5).selectExpr("id AS i")
    assert compile_pipeline([{"$sample": {"size": 99}}],
                            Context(spark=spark))(small).count() == 5


def test_sort_by_count(spark):
    rows = [("a",), ("b",), ("a",), ("c",), ("a",), ("b",)]
    out = _run(spark, rows, "k string", [{"$sortByCount": "$k"}]).collect()
    assert [(r["_id"], r["count"]) for r in out] == [("a", 3), ("b", 2), ("c", 1)]


def test_union_with(spark):
    rows = [(1, "x")]
    out = _run(
        spark, rows, "a long, b string",
        [{"$unionWith": {"coll": "other", "pipeline": [{"$project": {"a": 1}}]}}],
        collections={"other": ([(2, "y")], "a long, b string")},
    ).collect()
    vals = sorted((r["a"], r["b"]) for r in out)
    assert vals == [(1, "x"), (2, None)]


def test_facet(spark):
    rows = [(i, float(i)) for i in range(1, 5)]
    out = _run(
        spark, rows, "i long, v double",
        [{"$facet": {
            "n": [{"$count": "total"}],
            "sums": [{"$group": {"_id": None, "s": {"$sum": "$v"}}}],
        }}],
    ).collect()
    assert len(out) == 1
    r = out[0].asDict(recursive=True)
    assert r["n"] == [{"total": 4}]
    assert r["sums"] == [{"_id": None, "s": 10.0}]


def test_set_window_fields(spark):
    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 4, 5.0)]
    out = _run(
        spark, rows, "k string, o long, v double",
        [{"$setWindowFields": {
            "partitionBy": "$k",
            "sortBy": {"o": 1},
            "output": {
                "cum": {"$sum": "$v", "window": {"documents": ["unbounded", "current"]}},
                "rnk": {"$rank": {}},
                "dn": {"$documentNumber": {}},
                "prev": {"$shift": {"output": "$v", "by": -1, "default": 0.0}},
                "tot": {"$sum": "$v"},
            },
        }}],
    ).collect()
    a = sorted([r for r in out if r["k"] == "a"], key=lambda r: r["o"])
    assert [r["cum"] for r in a] == [10.0, 30.0, 60.0]
    assert [r["rnk"] for r in a] == [1, 2, 3]
    assert [r["dn"] for r in a] == [1, 2, 3]
    assert [r["prev"] for r in a] == [0.0, 10.0, 20.0]
    assert [r["tot"] for r in a] == [60.0, 60.0, 60.0]  # whole-partition default
    b = [r for r in out if r["k"] == "b"][0]
    assert b["cum"] == 5.0 and b["rnk"] == 1


def test_set_window_fields_window_spec_validation(spark):
    """A window spec with `unit` but no `range` gets a clear ValueError
    (not a bare KeyError); `unit` with a `documents` window is rejected
    the way Mongo rejects it."""
    rows = [("a", 1, 10.0)]
    schema = "k string, o long, v double"

    def bad(window, match):
        with pytest.raises(ValueError, match=match):
            _run(spark, rows, schema, [{"$setWindowFields": {
                "partitionBy": "$k", "sortBy": {"o": 1},
                "output": {"s": {"$sum": "$v", "window": window}},
            }}]).collect()

    bad({"unit": "hour"}, "requires a 'range'")
    bad({"unit": "hour", "documents": ["unbounded", "current"]},
        "only valid with 'range'")
    bad({"bogus": 1}, "needs 'documents' or 'range'")


def test_fill_value_and_locf(spark):
    rows = [("a", 1, None), ("a", 2, 7.0), ("a", 3, None), ("a", 4, None)]
    out = _run(
        spark, rows, "k string, o long, v double",
        [{"$fill": {
            "partitionBy": "$k",
            "sortBy": {"o": 1},
            "output": {"v": {"method": "locf"}},
        }}],
    ).collect()
    assert [r["v"] for r in sorted(out, key=lambda r: r["o"])] == [None, 7.0, 7.0, 7.0]
    out = _run(
        spark, rows, "k string, o long, v double",
        [{"$fill": {"output": {"v": {"value": -1.0}}}}],
    ).collect()
    assert sorted(r["v"] for r in out) == [-1.0, -1.0, -1.0, 7.0]


def test_densify_full_and_bounded(spark):
    rows = [("a", 0), ("a", 4), ("b", 2)]
    # bounds "full": every partition densifies over the GLOBAL [min, max]
    # of the field (MongoDB $densify), so b gets 0 and 4 too
    out = _run(
        spark, rows, "k string, x long",
        [{"$densify": {"field": "x",
                       "range": {"step": 2, "bounds": "full",
                                 "partitionByFields": ["k"]}}}],
    ).collect()
    got = sorted((r["k"], r["x"]) for r in out)
    assert got == [("a", 0), ("a", 2), ("a", 4),
                   ("b", 0), ("b", 2), ("b", 4)]
    # bounds "partition": each partition densifies within its own range
    out = _run(
        spark, rows, "k string, x long",
        [{"$densify": {"field": "x",
                       "range": {"step": 2, "bounds": "partition",
                                 "partitionByFields": ["k"]}}}],
    ).collect()
    got = sorted((r["k"], r["x"]) for r in out)
    assert got == [("a", 0), ("a", 2), ("a", 4), ("b", 2)]
    # explicit bounds [0, 6) — upper exclusive, no partitioning
    rows2 = [(1,), (4,)]
    out = _run(
        spark, rows2, "x long",
        [{"$densify": {"field": "x", "range": {"step": 1, "bounds": [0, 6]}}}],
    ).collect()
    assert sorted(r["x"] for r in out) == [0, 1, 2, 3, 4, 5]


def test_window_group_batch(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(minutes=m), t, v)
        for m, t, v in [(5, "a", 1.0), (20, "a", 2.0), (70, "b", 3.0), (75, "a", 4.0)]
    ]
    out = _run(
        spark, rows, "ts timestamp, k string, v double",
        [{"$windowGroup": {"on": "$ts", "duration": "1 hour",
                           "n": {"$count": {}}, "total": {"$sum": "$v"}}}],
    ).collect()
    by_start = {r["window_start"].hour: r for r in out}
    assert by_start[0]["n"] == 2 and by_start[0]["total"] == 3.0
    assert by_start[1]["n"] == 2 and by_start[1]["total"] == 7.0
    # keyed variant
    out = _run(
        spark, rows, "ts timestamp, k string, v double",
        [{"$windowGroup": {"on": "$ts", "duration": "1 hour", "_id": "$k",
                           "n": {"$count": {}}}}],
    ).collect()
    assert {(r["window_start"].hour, r["_id"], r["n"]) for r in out} == {
        (0, "a", 2), (1, "b", 1), (1, "a", 1)
    }


def test_batch_only_stages_raise_in_streaming(spark):
    rows = [(1,)]
    df = spark.createDataFrame(rows, "x long")
    ctx = Context(spark=spark, streaming=True)
    with pytest.raises(ValueError, match="batch-only"):
        compile_pipeline([{"$sort": {"x": 1}}], ctx)(df)


def test_graph_lookup(spark):
    # chain: 1 <- 2 <- 3; 10 isolated
    coll = [(1, None), (2, 1), (3, 2), (10, None)]
    out = _run(
        spark, coll, "id long, parent long",
        [{"$graphLookup": {
            "from": "h", "startWith": "$parent",
            "connectFromField": "parent", "connectToField": "id",
            "as": "anc", "depthField": "depth",
        }}],
        collections={"h": (coll, "id long, parent long")},
    ).collect()
    anc = {
        r["id"]: sorted((a["id"], a["depth"]) for a in r["anc"]) for r in out
    }
    assert anc[1] == [] and anc[10] == []
    assert anc[2] == [(1, 0)]
    assert anc[3] == [(2, 0), (1, 1)] or anc[3] == [(1, 1), (2, 0)]
    assert sorted(anc[3]) == [(1, 1), (2, 0)]


def test_graph_lookup_max_depth_and_cycle(spark):
    # cycle: 1 -> 2 -> 1 must terminate via visited pruning
    coll = [(1, 2), (2, 1)]
    out = _run(
        spark, coll, "id long, parent long",
        [{"$graphLookup": {
            "from": "h", "startWith": "$parent",
            "connectFromField": "parent", "connectToField": "id",
            "as": "anc",
        }}],
        collections={"h": (coll, "id long, parent long")},
    ).collect()
    anc = {r["id"]: sorted(a["id"] for a in r["anc"]) for r in out}
    assert anc[1] == [1, 2] and anc[2] == [1, 2]
    # maxDepth: 0 = only the first hop
    out = _run(
        spark, [(3, 2)], "id long, parent long",
        [{"$graphLookup": {
            "from": "h", "startWith": "$parent",
            "connectFromField": "parent", "connectToField": "id",
            "as": "anc", "maxDepth": 0,
        }}],
        collections={"h": (coll, "id long, parent long")},
    ).collect()
    assert [a["id"] for a in out[0]["anc"]] == [2]


def test_bucket_auto(spark):
    rows = [(i,) for i in range(1, 13)]  # 1..12 -> 3 buckets of 4
    out = _run(
        spark, rows, "v long",
        [{"$bucketAuto": {"groupBy": "$v", "buckets": 3,
                          "output": {"count": {"$sum": 1},
                                      "total": {"$sum": "$v"}}}}],
    ).collect()
    got = sorted(
        ((r["_id"]["min"], r["_id"]["max"], r["count"], r["total"]) for r in out)
    )
    # Mongo bound shape: each max = next bucket's min, last max inclusive
    assert got == [(1, 5, 4, 10), (5, 9, 4, 26), (9, 12, 4, 42)]


def test_documents_stage(spark):
    out = _run(
        spark, [(0,)], "ignore long",
        [{"$documents": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]},
         {"$match": {"a": {"$gte": 2}}}],
    ).collect()
    assert [(r["a"], r["b"]) for r in out] == [(2, "y")]


def test_shift_default_only_out_of_window(spark):
    """$shift's default applies only outside the partition; genuinely-null
    in-window values stay null (Mongo semantics)."""
    rows = [("a", 1, 5.0), ("a", 2, None), ("a", 3, 7.0)]
    out = _run(
        spark, rows, "k string, o long, v double",
        [{"$setWindowFields": {
            "partitionBy": "$k", "sortBy": {"o": 1},
            "output": {"prev": {"$shift": {"output": "$v", "by": -1,
                                            "default": 0.0}}},
        }}],
    ).collect()
    by_o = {r["o"]: r["prev"] for r in out}
    assert by_o[1] == 0.0   # out of window -> default
    assert by_o[2] == 5.0
    assert by_o[3] is None  # in-window null stays null


def test_fill_linear(spark):
    """$fill method:linear interpolates proportionally to the sortBy key;
    nulls before the first / after the last known value stay null."""
    rows = [
        ("a", 0, 0.0), ("a", 1, None), ("a", 3, None), ("a", 4, 8.0),
        ("a", 5, None),
        ("b", 0, None), ("b", 1, 2.0),
    ]
    out = _run(
        spark, rows, "k string, t long, v double",
        [{"$fill": {"partitionBy": "$k", "sortBy": {"t": 1},
                    "output": {"v": {"method": "linear"}}}}],
    ).collect()
    got = {(r["k"], r["t"]): r["v"] for r in out}
    # a: 0 at t=0, 8 at t=4 -> t=1: 2.0, t=3: 6.0; t=5 trailing -> null
    assert got[("a", 1)] == 2.0 and got[("a", 3)] == 6.0
    assert got[("a", 0)] == 0.0 and got[("a", 4)] == 8.0
    assert got[("a", 5)] is None
    # b: leading null stays null
    assert got[("b", 0)] is None and got[("b", 1)] == 2.0


def test_window_covariance_median_percentile(spark):
    rows = [("a", 1, 1.0, 2.0), ("a", 2, 2.0, 4.0), ("a", 3, 3.0, 7.0),
            ("b", 1, 5.0, 1.0)]
    out = _run(
        spark, rows, "k string, o long, x double, y double",
        [{"$setWindowFields": {
            "partitionBy": "$k", "sortBy": {"o": 1},
            "output": {
                "cpop": {"$covariancePop": ["$x", "$y"],
                         "window": {"documents": ["unbounded", "unbounded"]}},
                "csamp": {"$covarianceSamp": ["$x", "$y"],
                          "window": {"documents": ["unbounded", "unbounded"]}},
                "med": {"$median": {"input": "$y", "method": "approximate"},
                        "window": {"documents": ["unbounded", "unbounded"]}},
                "p50": {"$percentile": {"input": "$y", "p": [0.5],
                                        "method": "approximate"},
                        "window": {"documents": ["unbounded", "unbounded"]}},
            }}}],
    ).collect()
    a = next(r for r in out if r["k"] == "a")
    # x=[1,2,3], y=[2,4,7]: covar_pop = E[xy]-E[x]E[y] = 31/3 - 2*13/3 = 5/3
    assert a["cpop"] == pytest.approx(5.0 / 3.0)
    assert a["csamp"] == pytest.approx(2.5)
    assert a["med"] == pytest.approx(4.0)
    assert a["p50"] == [pytest.approx(4.0)]
    b = next(r for r in out if r["k"] == "b")
    assert b["cpop"] == pytest.approx(0.0) and b["csamp"] is None


def test_window_derivative_integral(spark):
    # t in seconds as a date; y climbs 10 per 100 t-units
    base = datetime.datetime(2020, 1, 1)
    rows = [("a", base + datetime.timedelta(seconds=i * 100), float(i * 10))
            for i in range(3)]
    out = _run(
        spark, rows, "k string, t timestamp, y double",
        [{"$setWindowFields": {
            "partitionBy": "$k", "sortBy": {"t": 1},
            "output": {
                "dy": {"$derivative": {"input": "$y", "unit": "second"},
                       "window": {"documents": [-1, 0]}},
                "area": {"$integral": {"input": "$y", "unit": "second"},
                         "window": {"documents": ["unbounded", "unbounded"]}},
            }}}],
    ).collect()
    rs = sorted(out, key=lambda r: r["t"])
    assert rs[0]["dy"] is None                       # single-point frame
    assert rs[1]["dy"] == pytest.approx(0.1)         # 10 per 100 s
    assert rs[2]["dy"] == pytest.approx(0.1)
    # trapezoid over (0,0),(100,10),(200,20): 100*5 + 100*15 = 2000
    assert rs[0]["area"] == pytest.approx(2000.0)


def test_window_exp_moving_avg(spark):
    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0)]
    out = _run(
        spark, rows, "k string, o long, v double",
        [{"$setWindowFields": {
            "partitionBy": "$k", "sortBy": {"o": 1},
            "output": {"ema": {"$expMovingAvg": {"input": "$v", "N": 2}}}}}],
    ).collect()
    rs = sorted(out, key=lambda r: r["o"])
    # alpha = 2/(N+1) = 2/3: 10, then 20*2/3+10/3, then 30*2/3 + prev/3
    e1 = 10.0
    e2 = 20.0 * (2 / 3) + e1 * (1 / 3)
    e3 = 30.0 * (2 / 3) + e2 * (1 / 3)
    assert [r["ema"] for r in rs] == [pytest.approx(e1), pytest.approx(e2),
                                      pytest.approx(e3)]


def test_window_exp_moving_avg_long_partition_linear_and_exact(spark):
    """The truncated-history EMA (O(n*K) instead of O(n^2)) must agree
    with the exact sequential recurrence to double precision on a
    partition much longer than the history bound K (~38 rows at N=2)."""
    n = 3000
    rows = [("a", i, float((i * 37) % 100)) for i in range(n)]
    out = _run(
        spark, rows, "k string, o long, v double",
        [{"$setWindowFields": {
            "partitionBy": "$k", "sortBy": {"o": 1},
            "output": {"ema": {"$expMovingAvg": {"input": "$v", "N": 2}}}}}],
    ).collect()
    got = [r["ema"] for r in sorted(out, key=lambda r: r["o"])]
    alpha = 2.0 / 3.0
    exact = None
    for i in range(n):
        v = float((i * 37) % 100)
        exact = v if exact is None else v * alpha + exact * (1 - alpha)
        assert got[i] == pytest.approx(exact, rel=1e-12), f"row {i}"


def test_window_locf_and_linear_fill_ops(spark):
    """$locf and $linearFill as $setWindowFields operators (the window-op
    spellings $fill desugars to in MongoDB)."""
    rows = [("a", 0, 0.0), ("a", 1, None), ("a", 2, 4.0), ("a", 3, None)]
    out = _run(
        spark, rows, "k string, t long, v double",
        [{"$setWindowFields": {
            "partitionBy": "$k", "sortBy": {"t": 1},
            "output": {
                "lo": {"$locf": "$v"},
                "lin": {"$linearFill": "$v"},
            }}}],
    ).collect()
    rs = sorted(out, key=lambda r: r["t"])
    assert [r["lo"] for r in rs] == [0.0, 0.0, 4.0, 4.0]
    assert [r["lin"] for r in rs] == [0.0, 2.0, 4.0, None]


def test_window_n_family(spark):
    rows = [("a", 1, 30.0), ("a", 2, 10.0), ("a", 3, 20.0), ("a", 4, 40.0)]
    out = _run(
        spark, rows, "k string, o long, v double",
        [{"$setWindowFields": {
            "partitionBy": "$k", "sortBy": {"o": 1},
            "output": {
                "f2": {"$firstN": {"input": "$v", "n": 2},
                       "window": {"documents": ["unbounded", "unbounded"]}},
                "l2": {"$lastN": {"input": "$v", "n": 2},
                       "window": {"documents": ["unbounded", "unbounded"]}},
                "mn2": {"$minN": {"input": "$v", "n": 2},
                        "window": {"documents": ["unbounded", "unbounded"]}},
                "mx2": {"$maxN": {"input": "$v", "n": 2},
                        "window": {"documents": ["unbounded", "unbounded"]}},
                "tp": {"$top": {"sortBy": {"v": 1}, "output": "$o"},
                       "window": {"documents": ["unbounded", "unbounded"]}},
                "bt": {"$bottom": {"sortBy": {"v": 1}, "output": "$o"},
                       "window": {"documents": ["unbounded", "unbounded"]}},
                "tp2": {"$topN": {"sortBy": {"v": 1}, "output": "$o", "n": 2},
                        "window": {"documents": ["unbounded", "unbounded"]}},
                "bt2": {"$bottomN": {"sortBy": {"v": 1}, "output": "$o", "n": 2},
                        "window": {"documents": ["unbounded", "unbounded"]}},
            }}}],
    ).collect()
    r = out[0]
    assert r["f2"] == [30.0, 10.0] and r["l2"] == [20.0, 40.0]
    assert r["mn2"] == [10.0, 20.0] and r["mx2"] == [40.0, 30.0]
    # $top: doc with smallest v (v=10 at o=2); $bottom: largest (o=4)
    assert r["tp"] == 2 and r["bt"] == 4
    assert r["tp2"] == [2, 3] and r["bt2"] == [1, 4]


def test_union_with_documents_only_pipeline(spark):
    """$unionWith without coll (MongoDB 6.0+): a self-sourcing pipeline
    starting with $documents."""
    rows = [(1, "x")]
    out = _run(
        spark, rows, "a long, b string",
        [{"$unionWith": {"pipeline": [
            {"$documents": [{"a": 2, "b": "y"}]}]}}],
    ).collect()
    assert sorted((r["a"], r["b"]) for r in out) == [(1, "x"), (2, "y")]


def test_min_max_scaler_window(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
         (4, "b", 5.0), (5, "b", 5.0), (6, "c", None)],
        "id long, g string, v double")
    out = compile_pipeline(
        [{"$setWindowFields": {
            "partitionBy": "$g",
            "output": {"s": {"$minMaxScaler": {"input": "$v"}},
                       "s5": {"$minMaxScaler": {"input": "$v",
                                                "min": 1, "max": 3}}}}}],
        Context(spark=spark))(df)
    rows = {r["id"]: (r["s"], r["s5"]) for r in out.collect()}
    assert rows[1] == (0.0, 1.0)
    assert rows[2] == (0.5, 2.0)
    assert rows[3] == (1.0, 3.0)
    # a constant frame scales to the lower bound
    assert rows[4] == (0.0, 1.0) and rows[5] == (0.0, 1.0)
    # null input stays null
    assert rows[6] == (None, None)


def test_min_max_scaler_framed_window(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 6)], "id long, v double")
    out = compile_pipeline(
        [{"$setWindowFields": {
            "sortBy": {"id": 1},
            "output": {"s": {"$minMaxScaler": {"input": "$v"},
                             "window": {"documents": [-1, 1]}}}}}],
        Context(spark=spark))(df)
    rows = {r["id"]: r["s"] for r in out.collect()}
    # interior rows sit mid-frame; edges clip to 2-row frames
    assert rows[1] == 0.0 and rows[5] == 1.0
    assert rows[2] == 0.5 and rows[3] == 0.5 and rows[4] == 0.5


def test_min_max_scaler_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="min < max"):
        compile_pipeline(
            [{"$setWindowFields": {"output": {"s": {
                "$minMaxScaler": {"input": "$v", "min": 5, "max": 5}}}}}],
            Context(spark=spark))(df).collect()
    with pytest.raises(ValueError, match="include the current"):
        compile_pipeline(
            [{"$setWindowFields": {"sortBy": {"id": 1}, "output": {"s": {
                "$minMaxScaler": {"input": "$v"},
                "window": {"documents": [-2, -1]}}}}}],
            Context(spark=spark))(df).collect()
