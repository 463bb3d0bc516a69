"""Parity pins for the remaining small reference corpora:

- TestReplaceRoot.java / TestReplaceWith.java — the new document's ``_id``
  becomes the message key ("1" in both goldens).
- TestDeduplicate.java — the dedup expression value may be an *object*
  (``_id`` = {test:"0"}), deduped distinctly from scalar values.
- TestBucket.java — the exact 12-emission incremental sequence across
  buckets 0/10/20 and the "other" default bucket.
"""

from pyspark.sql import Row
from pyspark.sql import types as T

from pincette_mongo_streams_spark import Context, compile_pipeline
from pincette_mongo_streams_spark.operators.stateless import KEY_COL

from tests.test_streaming import _run


def _run_batch(spark, pipeline, rows, schema, order_by=None):
    df = spark.createDataFrame(rows, schema)
    ctx = Context(spark=spark)
    if order_by:
        ctx.order_by = order_by
    out = compile_pipeline(pipeline, ctx)(df)
    return [r.asDict(recursive=True) for r in out.collect()]


def test_replace_root_rekeys_on_new_id(spark):
    """TestReplaceRoot.java:16-30: $replaceRoot{newRoot:"$test.test"} yields
    {_id:"1",test:0} AND re-keys the message to "1" (Util.java:86-88)."""
    rows = [Row(__key="0", _id="0", test=Row(test=Row(_id="1", test=0)))]
    schema = T.StructType([
        T.StructField(KEY_COL, T.StringType()),
        T.StructField("_id", T.StringType()),
        T.StructField("test", T.StructType([
            T.StructField("test", T.StructType([
                T.StructField("_id", T.StringType()),
                T.StructField("test", T.LongType()),
            ]))
        ])),
    ])
    docs = _run_batch(
        spark, [{"$replaceRoot": {"newRoot": "$test.test"}}], rows, schema
    )
    assert docs == [{KEY_COL: "1", "_id": "1", "test": 0}]


def test_replace_with_rekeys_on_new_id(spark):
    """TestReplaceWith.java:16-29: same golden through the $replaceWith
    spelling."""
    rows = [Row(__key="0", _id="0", test=Row(test=Row(_id="1", test=0)))]
    schema = T.StructType([
        T.StructField(KEY_COL, T.StringType()),
        T.StructField("_id", T.StringType()),
        T.StructField("test", T.StructType([
            T.StructField("test", T.StructType([
                T.StructField("_id", T.StringType()),
                T.StructField("test", T.LongType()),
            ]))
        ])),
    ])
    docs = _run_batch(
        spark, [{"$replaceWith": "$test.test"}], rows, schema
    )
    assert docs == [{KEY_COL: "1", "_id": "1", "test": 0}]


def test_deduplicate_object_valued_expression(spark):
    """TestDeduplicate.java:20-52: the dedup expression value may be an
    object — {_id:{test:"0"}} and a scalar-keyed doc dedup independently,
    each surviving once in arrival order."""
    schema = T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("_id", T.StructType([T.StructField("test", T.StringType())])),
        T.StructField("o", T.LongType()),
    ])
    rows = [
        Row(kind="o1", _id=Row(test="0"), o=1),
        Row(kind="o2", _id=Row(test="1"), o=2),
        Row(kind="o1", _id=Row(test="0"), o=3),
        Row(kind="o2", _id=Row(test="1"), o=4),
    ]
    docs = _run_batch(
        spark, [{"$deduplicate": {"expression": "$_id"}}], rows, schema,
        order_by="o",
    )
    assert sorted((d["kind"], d["o"]) for d in docs) == [("o1", 1), ("o2", 2)]


def test_bucket_full_emission_sequence_with_default(spark, tmpdir):
    """TestBucket.java:17-57: twelve inputs spanning boundaries [0,10,20,30]
    plus out-of-range values emit twelve incremental counts — three for
    bucket 0, four for bucket 10, two for bucket 20, three for "other"."""
    inputs = [0, 1, 5, 10, 12, 18, 19, 22, 26, 56, 60, 70]
    pipeline = [{"$bucket": {"groupBy": "$test",
                             "boundaries": [0, 10, 20, 30],
                             "default": "other",
                             "output": {"count": {"$sum": 1}}}}]
    schema = T.StructType([T.StructField("test", T.LongType())])
    emissions = _run(
        spark, tmpdir, schema, [[{"test": v}] for v in inputs],
        pipeline, suppress_unchanged=True,
    )
    seq = [(str(r["_id"]), r["count"]) for rows in emissions for r in rows]
    assert seq == [
        ("0", 1), ("0", 2), ("0", 3),
        ("10", 1), ("10", 2), ("10", 3), ("10", 4),
        ("20", 1), ("20", 2),
        ("other", 1), ("other", 2), ("other", 3),
    ]


def test_match_golden(spark):
    """TestMatch.java:18-28: {$match:{test:0}} keeps only the matching doc."""
    docs = _run_batch(
        spark, [{"$match": {"test": 0}}],
        [Row(_id="0", test=0), Row(_id="1", test=1)],
        "_id string, test long",
    )
    assert docs == [{"_id": "0", "test": 0}]


def test_unwind_golden(spark):
    """TestUnwind.java:18-27: $unwind "$test" over [0,1] emits one message
    per element with the element substituted at the path."""
    docs = _run_batch(
        spark, [{"$unwind": "$test"}],
        [Row(_id="0", test=[0, 1])],
        "_id string, test array<long>",
    )
    assert docs == [{"_id": "0", "test": 0}, {"_id": "0", "test": 1}]


def test_unset_golden(spark):
    """TestUnset.java:22-39: string form drops a top-level field; array form
    drops a top-level and a nested field (leaving the empty parent)."""
    rows = [Row(_id="0", test1=0, test2=Row(test=0))]
    schema = ("_id string, test1 long, "
              "test2 struct<test: long>")
    one = _run_batch(spark, [{"$unset": "test1"}], rows, schema)
    assert one == [{"_id": "0", "test2": {"test": 0}}]
    two = _run_batch(spark, [{"$unset": ["test1", "test2.test"]}], rows, schema)
    assert two == [{"_id": "0", "test2": {}}]


def test_setkey_golden(spark):
    """TestSetKey.java:22-30: the stringified expression value becomes the
    message key; the payload is unchanged."""
    from pyspark.sql import types as T

    rows = [Row(__key="0", _id="0", test="1")]
    schema = T.StructType([
        T.StructField(KEY_COL, T.StringType()),
        T.StructField("_id", T.StringType()),
        T.StructField("test", T.StringType()),
    ])
    docs = _run_batch(spark, [{"$setKey": "$test"}], rows, schema)
    assert docs == [{KEY_COL: "1", "_id": "0", "test": "1"}]


def test_per_golden(spark):
    """TestPer.java:19-28: {$per:{amount:2, as:"test"}} over three docs
    yields [doc0,doc1] then [doc2]."""
    docs = _run_batch(
        spark, [{"$per": {"amount": 2, "as": "test"}}],
        [Row(test=0, ord=0), Row(test=1, ord=1), Row(test=2, ord=2)],
        "test long, ord long",
        order_by="ord",
    )
    batches = [[e["test"] for e in d["test"]] for d in docs]
    assert sorted(batches) == [[0, 1], [2]]


def test_out_golden(spark):
    """TestOut.java:21-36: $out passes the message through AND the target
    collection holds the replaced doc keyed by _id."""
    written = {}
    ctx = Context(
        spark=spark,
        collections={"pms-test": spark.createDataFrame([], "_id string")},
        collection_writer=lambda name, df: written.__setitem__(name, df),
    )
    df = spark.createDataFrame([Row(_id="0")], "_id string")
    out = compile_pipeline([{"$out": "pms-test"}], ctx)(df)
    docs = [r.asDict(recursive=True) for r in out.collect()]
    assert docs == [{"_id": "0"}]
    assert "pms-test" in written
    stored = [r.asDict() for r in written["pms-test"].collect()]
    assert stored == [{"_id": "0"}]
