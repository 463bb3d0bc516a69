"""$delay real scheduling (retry-topic pattern) and $probe minute
rollover, under injectable fake clocks (Context.clock).

Reference semantics pinned: Delay.java:34-47 (valid -> scheduled send +
drop; invalid -> passthrough) and Probe.java:63-78 ({name, minute,
count} emitted when the wall-clock minute advances).
"""

from pyspark.sql import Row
from pyspark.sql import types as T

from pincette_mongo_streams_spark import Context, compile_pipeline

from tests.test_streaming import _run


def _docs(spark):
    return spark.createDataFrame([
        Row(_id="a", kind="late", dur=500),
        Row(_id="b", kind="late", dur=1500),
        Row(_id="c", kind="now", dur=None),   # invalid duration -> passthrough
    ])


def test_delay_envelopes_to_delay_topic(spark):
    sent = []
    ctx = Context(spark=spark, clock=lambda: 100.0,
                  producer=lambda t, k, v: sent.append((t, v)))
    pipeline = [{"$delay": {"duration": "$dur", "topic": "target",
                            "delayTopic": "app-delay"}}]
    out = compile_pipeline(pipeline, ctx)(_docs(spark))
    kept = [r._id for r in out.collect()]
    assert kept == ["c"]  # valid messages dropped from the stream
    assert sorted(t for t, _ in sent) == ["app-delay", "app-delay"]
    envs = sorted((v for _, v in sent), key=lambda v: v["deliverAt"])
    assert envs[0]["deliverAt"] == 100_000 + 500
    assert envs[1]["deliverAt"] == 100_000 + 1500
    assert all(v["topic"] == "target" for v in envs)
    assert {v["doc"]["_id"] for v in envs} == {"a", "b"}


def test_delay_release_delivers_due_and_passes_future(spark):
    sent = []
    envs = spark.createDataFrame([
        Row(deliverAt=100_500, topic="target", doc=Row(_id="a", v=1)),
        Row(deliverAt=101_500, topic="target", doc=Row(_id="b", v=2)),
    ])
    # before either deadline: nothing due, both pass through for re-enqueue
    ctx = Context(spark=spark, clock=lambda: 100.0,
                  producer=lambda t, k, v: sent.append((t, v)))
    out = compile_pipeline([{"$delayRelease": {}}], ctx)(envs)
    assert out.count() == 2 and sent == []
    # past the first deadline: "a" delivered to its target topic, "b" kept
    ctx2 = Context(spark=spark, clock=lambda: 101.0,
                   producer=lambda t, k, v: sent.append((t, v)))
    out2 = compile_pipeline([{"$delayRelease": {}}], ctx2)(envs)
    assert [r.doc._id for r in out2.collect()] == ["b"]
    assert sent == [("target", {"_id": "a", "v": 1})]


def test_delay_roundtrip_with_fake_clock(spark):
    """$delay -> (envelopes re-read) -> $delayRelease: the message reaches
    its target topic only after the duration has elapsed — Delay.java's
    scheduled-send semantics on batch infrastructure."""
    delayed, delivered = [], []
    ctx = Context(spark=spark, clock=lambda: 100.0,
                  producer=lambda t, k, v: delayed.append(v))
    compile_pipeline(
        [{"$delay": {"duration": 500, "topic": "target",
                     "delayTopic": "d"}}],
        ctx,
    )(_docs(spark).filter("_id = 'a'")).collect()
    envs = spark.createDataFrame([
        Row(deliverAt=v["deliverAt"], topic=v["topic"], doc=Row(**v["doc"]))
        for v in delayed
    ])
    early = Context(spark=spark, clock=lambda: 100.2,
                    producer=lambda t, k, v: delivered.append((t, v)))
    assert compile_pipeline([{"$delayRelease": {}}], early)(envs).count() == 1
    assert delivered == []
    late = Context(spark=spark, clock=lambda: 100.6,
                   producer=lambda t, k, v: delivered.append((t, v)))
    assert compile_pipeline([{"$delayRelease": {}}], late)(envs).count() == 0
    assert len(delivered) == 1 and delivered[0][0] == "target"
    assert delivered[0][1]["_id"] == "a"


def test_probe_streaming_minute_rollover(spark, tmpdir):
    """Across micro-batches, $probe emits the COMPLETED minute's count
    when the clock rolls into the next minute (Probe.java:63-78)."""
    sent = []
    ticks = iter([0.0, 61.0, 122.0])  # one clock read per micro-batch
    ctx = Context(spark=spark, clock=lambda: next(ticks),
                  producer=lambda t, k, v: sent.append((t, v)))
    schema = T.StructType([T.StructField("_id", T.StringType()),
                           T.StructField("v", T.LongType())])
    batches = [
        [{"_id": "m1", "v": 1}, {"_id": "m2", "v": 2}],
        [{"_id": "m3", "v": 3}],
        [{"_id": "m4", "v": 4}],
    ]
    pipeline = [{"$probe": {"name": "p", "topic": "metrics"}}]
    emissions = _run(spark, tmpdir, schema, batches, pipeline, ctx=ctx)
    assert sum(len(rows) for rows in emissions) == 4  # passthrough intact
    assert sent == [
        ("metrics", {"name": "p", "minute": "1970-01-01T00:00:00Z", "count": 2}),
        ("metrics", {"name": "p", "minute": "1970-01-01T00:01:00Z", "count": 1}),
    ]


def test_probe_batch_single_count_unchanged(spark):
    sent = []
    ctx = Context(spark=spark, clock=lambda: 120.0,
                  producer=lambda t, k, v: sent.append(v))
    out = compile_pipeline(
        [{"$probe": {"name": "p", "topic": "m"}}], ctx)(_docs(spark))
    assert out.count() == 3
    assert sent == [{"name": "p", "minute": 2, "count": 3}]
