"""$vectorNormalize / $vectorQuantize / $vectorDequantize — embedding
storage operators (8x shrink at int8 with bounded reconstruction
error)."""

import math

import pytest
from pyspark.sql import Row

from pincette_mongo_streams_spark import Context, compile_pipeline


def _df(spark):
    return spark.createDataFrame([
        Row(vec_id=1, e=[3.0, 4.0]),
        Row(vec_id=2, e=[0.0, 0.0]),          # zero vector passes through
        Row(vec_id=3, e=[-1.5, 2.5, 0.5]),
    ])


def test_normalize_unit_and_zero(spark):
    out = compile_pipeline(
        [{"$vectorNormalize": {"input": "$e", "as": "u"}}],
        Context(spark=spark))(_df(spark))
    got = {r.vec_id: r.u for r in out.collect()}
    assert got[1] == pytest.approx([0.6, 0.8])
    assert got[2] == [0.0, 0.0]
    assert sum(x * x for x in got[3]) == pytest.approx(1.0)


def test_quantize_dequantize_round_trip_error_bound(spark):
    pipeline = [
        {"$vectorQuantize": {"input": "$e", "as": "qv", "bits": 8}},
        {"$vectorDequantize": {"input": "$qv", "as": "recon"}},
    ]
    out = compile_pipeline(pipeline, Context(spark=spark))(_df(spark))
    for r in out.collect():
        assert all(isinstance(q, int) and abs(q) <= 127 for q in r.qv.q)
        # reconstruction error bounded by scale/2 per component
        bound = (r.qv.scale or 0.0) / 2 + 1e-12
        assert all(abs(x - y) <= bound for x, y in zip(r.e, r.recon))
        # the max-magnitude component hits the full int range
        if any(x != 0 for x in r.e):
            assert max(abs(q) for q in r.qv.q) == 127


def test_quantize_zero_vector(spark):
    out = compile_pipeline(
        [{"$vectorQuantize": {"input": "$e", "as": "qv"}}],
        Context(spark=spark))(_df(spark))
    z = [r for r in out.collect() if r.vec_id == 2][0]
    assert z.qv.scale == 0.0 and z.qv.q == [0, 0]


def test_quantize_bits_parameter(spark):
    out = compile_pipeline(
        [{"$vectorQuantize": {"input": "$e", "as": "qv", "bits": 4}}],
        Context(spark=spark))(_df(spark))
    for r in out.collect():
        assert all(abs(q) <= 7 for q in r.qv.q)
