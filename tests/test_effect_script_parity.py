"""Parity tests for the reference test classes with no prior coverage here:
TestDelay, TestDelete, TestScript ($jq/$jslt), TestThrottle
(src/test/java/net/pincette/mongo/streams/).
"""

import pytest

from pincette_mongo_streams_spark.context import Context
from pincette_mongo_streams_spark import compile_pipeline


def _docs(df):
    return [r.asDict(recursive=True) for r in df.collect()]


# ----------------------------------------------------------------- $delay

def test_delay_sends_and_drops(spark):
    # TestDelay.delay: {duration: 5000, topic: "test"} -> the message goes
    # to the producer and disappears from the stream (Delay.java:49-76);
    # the batch analog sends immediately, carrying no internal columns
    sent = []
    ctx = Context(spark=spark, producer=lambda t, k, v: sent.append((t, v)))
    df = spark.createDataFrame([(0,)], "test long")
    out = compile_pipeline(
        [{"$delay": {"duration": 5000, "topic": "test"}}], ctx
    )(df)
    assert out.count() == 0
    assert sent == [("test", {"test": 0})]


def test_delay_string_duration_is_invalid(spark):
    # isLong(pair.first) is a JSON TYPE check (Delay.java:63-70): a
    # STRING duration — even "1500", which would coerce numerically —
    # is invalid, so every message passes through and nothing is sent.
    sent = []
    ctx = Context(spark=spark, producer=lambda t, k, v: sent.append(v))
    df = spark.createDataFrame([("1500", 0)], "dur string, test long")
    out = compile_pipeline(
        [{"$delay": {"duration": "$dur", "topic": "test"}}], ctx
    )(df)
    assert [r["test"] for r in _docs(out)] == [0]
    assert sent == []


def test_delay_numeric_topic_is_invalid(spark):
    # isString(pair.second) is likewise a type check: a numeric topic
    # makes the pair invalid -> passthrough, no send.
    sent = []
    ctx = Context(spark=spark, producer=lambda t, k, v: sent.append(v))
    df = spark.createDataFrame([(0,)], "test long")
    out = compile_pipeline(
        [{"$delay": {"duration": 5000, "topic": 7}}], ctx
    )(df)
    assert _docs(out) == [{"test": 0}]
    assert sent == []


def test_delay_invalid_eval_passthrough(spark):
    # non-long duration / non-string topic -> message passes through
    # unchanged (Delay.java:63-70)
    sent = []
    ctx = Context(spark=spark, producer=lambda t, k, v: sent.append(v))
    df = spark.createDataFrame([(0,)], "test long")
    out = compile_pipeline(
        [{"$delay": {"duration": "$nope", "topic": "test"}}], ctx
    )(df)
    assert _docs(out) == [{"test": 0}]
    assert sent == []


# ---------------------------------------------------------------- $delete

@pytest.mark.parametrize("on,doc", [
    ("_id", {"_id": "0"}),                          # TestDelete $delete 1
    (["_id", "test"], {"_id": "0", "test": 0}),     # TestDelete $delete 2
])
def test_delete_removes_matches_and_passes_through(spark, on, doc):
    target = spark.createDataFrame(
        [("0", 0), ("1", 1)], "_id string, test long")
    ctx = Context(spark=spark, collections={"t": target})
    df = spark.createDataFrame([tuple(doc.values())],
                               ", ".join(f"{k} {'string' if k == '_id' else 'long'}"
                                         for k in doc))
    out = compile_pipeline([{"$delete": {"from": "t", "on": on}}], ctx)(df)
    # message passes through (Delete.java:38-71)
    assert _docs(out) == [doc]
    # matching rows are gone from the collection, others stay
    assert [r["_id"] for r in ctx.collection("t").collect()] == ["1"]


def test_delete_missing_on_field_drops_message(spark):
    # a message missing an `on` value is dropped and deletes nothing
    # (Delete.java:61-66)
    target = spark.createDataFrame([("0",)], "_id string")
    ctx = Context(spark=spark, collections={"t": target})
    df = spark.createDataFrame([("x",)], "other string")
    out = compile_pipeline([{"$delete": {"from": "t", "on": "_id"}}], ctx)(df)
    assert out.count() == 0
    assert ctx.collection("t").count() == 1


# --------------------------------------------------------- $jq and $jslt

def _script_roundtrip(spark, stage, script):
    # TestScript.script: {_id:"0", test:0} -> {_id:"0", test:1}
    ctx = Context(spark=spark)
    df = spark.createDataFrame([("0", 0)], "_id string, test long")
    out = compile_pipeline([{stage: script}], ctx)(df)
    docs = _docs(out)
    assert len(docs) == 1
    assert docs[0]["_id"] == "0"
    assert docs[0]["test"] == 1


def test_jq_inline(spark):
    _script_roundtrip(spark, "$jq", ". + {test: 1}")   # TestScript jq2


def test_jq_file(spark, tmp_path):
    # TestScript jq1 loads resource:/test.jq whose body is `. + {test: 1}`;
    # the engine's file-path form covers the same load-from-storage path
    p = tmp_path / "test.jq"
    p.write_text(". + {test: 1}\n")
    _script_roundtrip(spark, "$jq", str(p))


def test_jq_resource_root(spark, tmp_path):
    """TestScript jq1's actual form: resource:/test.jq, resolved against
    Context.resource_root (the classpath-resources analog,
    Script.java:28-46)."""
    (tmp_path / "test.jq").write_text(". + {test: 1}\n")
    ctx = Context(spark=spark, resource_root=str(tmp_path))
    df = spark.createDataFrame([("0", 0)], "_id string, test long")
    out = compile_pipeline([{"$jq": "resource:/test.jq"}], ctx)(df)
    assert _docs(out) == [{"_id": "0", "test": 1}]


def test_jq_resource_without_root_raises(spark):
    import pytest

    with pytest.raises(NotImplementedError, match="resource_root"):
        compile_pipeline([{"$jq": "resource:/x.jq"}], Context(spark=spark))


def test_jslt_template(spark):
    _script_roundtrip(spark, "$jslt", '{"test": 1, *: .}')  # TestScript jslt2


def test_jslt_file(spark, tmp_path):
    p = tmp_path / "test.jslt"
    p.write_text('{\n  "test": 1,\n  *: .\n}\n')
    _script_roundtrip(spark, "$jslt", str(p))


def test_jq_quoted_string_value_with_colon(spark):
    # string literals containing '{word:' / ', word:' patterns must not be
    # mangled by the bare-key rewrite
    ctx = Context(spark=spark)
    df = spark.createDataFrame([("0",)], "_id string")
    out = compile_pipeline([{"$jq": '. + {"msg": "a, b: c"}'}], ctx)(df)
    assert out.collect()[0]["msg"] == "a, b: c"


def test_jq_identity(spark):
    ctx = Context(spark=spark)
    df = spark.createDataFrame([("0", 0)], "_id string, test long")
    out = compile_pipeline([{"$jq": "."}], ctx)(df)
    assert _docs(out) == [{"_id": "0", "test": 0}]


def test_jq_rekeys_on_new_id(spark):
    # Script.java:67-73: a script that changes _id re-keys the message
    # (the engine's key column is __key)
    ctx = Context(spark=spark)
    df = spark.createDataFrame([("0", "old")], "_id string, __key string")
    out = compile_pipeline([{"$jq": '. + {_id: "9"}'}], ctx)(df)
    row = out.collect()[0]
    assert row["_id"] == "9"
    assert row["__key"] == "9"


# -------------------------------------------------- $lookup database ext

def test_lookup_database_extension(spark):
    # Lookup.java:74-78: `database` queries another DB's collection; here
    # the qualified name routes through collections/collection_loader
    other = spark.createDataFrame([(1, "x")], "k long, v string")
    ctx = Context(spark=spark, collections={"otherdb.dim": other})
    df = spark.createDataFrame([(1,)], "k long")
    out = compile_pipeline(
        [{"$lookup": {"from": "dim", "database": "otherdb",
                      "localField": "k", "foreignField": "k", "as": "m"}}], ctx
    )(df)
    docs = [r.asDict(recursive=True) for r in out.collect()]
    assert docs == [{"k": 1, "m": [{"k": 1, "v": "x"}]}]


# ------------------------------------------------------------- $redact

def test_redact_keep_stops_recursion(spark):
    # TestRedact: test=1 -> $$KEEP, test=2 -> $$PRUNE, default $$DESCEND.
    # A KEPT subtree stops recursing: test2 (test=1) keeps its sub even
    # though sub.test=2 would prune; test3 (test=2) prunes; array elements
    # are evaluated individually (test4 drops its test=2 element)
    ctx = Context(spark=spark)
    df = spark.createDataFrame(
        [( "0", 0, (0, 0), (1, 0, (2,)), (2, 0), [(0, 0, None), (1, 0, (2,)), (2, 0, None)] )],
        "_id string, test long, test1 struct<test:long,v:long>, "
        "test2 struct<test:long,v:long,sub:struct<test:long>>, "
        "test3 struct<test:long,v:long>, "
        "test4 array<struct<test:long,v:long,sub:struct<test:long>>>")
    out = compile_pipeline([{"$redact": {"$switch": {
        "branches": [
            {"case": {"$eq": ["$test", 1]}, "then": "$$KEEP"},
            {"case": {"$eq": ["$test", 2]}, "then": "$$PRUNE"},
        ],
        "default": "$$DESCEND",
    }}}], ctx)(df)
    doc = out.collect()[0].asDict(recursive=True)
    assert doc["test"] == 0
    assert doc["test1"] == {"test": 0, "v": 0}
    # KEEP keeps the whole subtree including the would-prune sub
    assert doc["test2"] == {"test": 1, "v": 0, "sub": {"test": 2}}
    assert doc["test3"] is None  # pruned
    assert doc["test4"] == [
        {"test": 0, "v": 0, "sub": None},
        {"test": 1, "v": 0, "sub": {"test": 2}},
    ]


# ------------------------------------------------------- $unwind newIds

def test_unwind_new_ids(spark):
    # Unwind.java:128-135: newIds:true gives each output a fresh UUID _id
    # and re-keys from it
    ctx = Context(spark=spark)
    df = spark.createDataFrame([("0", [1, 2, 3])], "_id string, a array<long>")
    out = compile_pipeline(
        [{"$unwind": {"path": "$a", "newIds": True}}], ctx
    )(df)
    docs = [r.asDict() for r in out.collect()]
    assert sorted(d["a"] for d in docs) == [1, 2, 3]
    ids = {d["_id"] for d in docs}
    assert len(ids) == 3 and "0" not in ids  # three fresh UUIDs
    import uuid
    for i in ids:
        uuid.UUID(i)  # parseable UUID


# ----------------------------------------------------- $group array _id

def test_group_array_id_filtered(spark):
    # hasId (Group.java:261-263,429): group docs whose _id evaluates to an
    # array are dropped (Mongo forbids array _id); null keys survive
    ctx = Context(spark=spark)
    df = spark.createDataFrame(
        [(1, [1, 2]), (2, [1, 2]), (3, None)],
        "v long, tags array<long>")
    out = compile_pipeline(
        [{"$group": {"_id": "$tags", "n": {"$sum": 1}}}], ctx
    )(df)
    docs = [r.asDict() for r in out.collect()]
    assert docs == [{"_id": None, "n": 1}]


# ----------------------------------------------------------------- $probe

def test_probe_emits_count_and_passes_through(spark):
    # TestProbe (Probe.java:43-78): passthrough tap emitting
    # {name, minute, count} to `topic`; the batch analog emits one count
    # for the batch at the injected clock's minute
    sent = []
    ctx = Context(spark=spark, producer=lambda t, k, v: sent.append((t, v)),
                  clock=lambda: 120.0)
    df = spark.createDataFrame([(i,) for i in range(5)], "i long")
    out = compile_pipeline([{"$probe": {"name": "p", "topic": "t"}}], ctx)(df)
    assert out.count() == 5  # passthrough
    assert sent == [("t", {"name": "p", "minute": 2, "count": 5})]


# --------------------------------------------------------------- $throttle

def test_throttle_passthrough_and_validation(spark):
    # Batch/relational plans treat rate limiting as a source concern
    # (maxOffsetsPerTrigger); the stage validates and passes rows through
    # (Throttle.java:30-50)
    ctx = Context(spark=spark)
    df = spark.createDataFrame([(i,) for i in range(100)], "i long")
    out = compile_pipeline([{"$throttle": {"maxPerSecond": 10}}], ctx)(df)
    assert out.count() == 100
    with pytest.raises(ValueError):
        compile_pipeline([{"$throttle": {"maxPerSecond": 0}}], ctx)
