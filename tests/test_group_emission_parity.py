"""Golden emission-sequence parity with the reference's TestGroup corpus.

The reference asserts, for every `$group` accumulator, the exact *sequence*
of incremental emissions — one output per state-changing input, carrying the
full current group document (TestGroup.java:17-266; emission protocol
Group.java:176-186, 423-430).  Here each input document becomes its own
micro-batch (file source + maxFilesPerTrigger=1), and ``suppress_unchanged``
reproduces the JSON-diff suppression, so the per-micro-batch update-mode
emissions reproduce the reference's per-message sequences exactly.

Documented deviations exercised here:
- ``$stdDevPop`` emits the mathematically correct population stddev; the
  reference's selector emits the running count (Group.java:451-453, golden
  at TestGroup.java:214-227) — see README "Deliberate deviations".
- Fixed-schema struct fields make "absent" indistinguishable from null, so
  ``$mergeObjects`` over a schema'd struct skips null *fields* (coalesce
  fold) — the same observable merge as the reference's shallow key-merge.
"""

import math

import pytest
from pyspark.sql import types as T

from tests.test_streaming import _run

pytestmark = pytest.mark.usefixtures("spark")


def _seq(emissions):
    """Flatten per-epoch emission lists into one sequence of row dicts."""
    return [r for rows in emissions for r in rows]


def _one_per_batch(docs):
    return [[d] for d in docs]


V_LONG = T.StructType([T.StructField("test", T.LongType())])
V_STR = T.StructType([T.StructField("test", T.StringType())])


def test_add_to_set_sequence(spark, tmpdir):
    """TestGroup.java:17-29 ("$group $addToSet"): inputs 2,1,2,0 emit three
    sorted sets — the duplicate 2 changes nothing and is suppressed."""
    pipeline = [{"$group": {"_id": None, "items": {"$addToSet": "$test"}}}]
    emissions = _run(
        spark, tmpdir, V_LONG,
        _one_per_batch([{"test": 2}, {"test": 1}, {"test": 2}, {"test": 0}]),
        pipeline, suppress_unchanged=True,
    )
    assert [r["items"] for r in _seq(emissions)] == [[2], [1, 2], [0, 1, 2]]


def test_avg_sequence(spark, tmpdir):
    """TestGroup.java:31-44 ("$group $avg"): running averages 0, .5, 1, 1.5."""
    pipeline = [{"$group": {"_id": None, "avg": {"$avg": "$test"}}}]
    emissions = _run(
        spark, tmpdir, V_LONG,
        _one_per_batch([{"test": 0}, {"test": 1}, {"test": 2}, {"test": 3}]),
        pipeline, suppress_unchanged=True,
    )
    assert [r["avg"] for r in _seq(emissions)] == [0.0, 0.5, 1.0, 1.5]


def test_count_per_key_sequence(spark, tmpdir):
    """TestGroup.java:46-63 ("$group $count"): per-key running counts keyed
    by the group value — "0":1, "0":2, "1":1, "0":3."""
    pipeline = [{"$group": {"_id": "$test", "count": {"$count": {}}}}]
    emissions = _run(
        spark, tmpdir, V_STR,
        _one_per_batch(
            [{"test": "0"}, {"test": "0"}, {"test": "1"}, {"test": "0"}]
        ),
        pipeline, suppress_unchanged=True,
    )
    assert [(r["_id"], r["count"]) for r in _seq(emissions)] == [
        ("0", 1), ("0", 2), ("1", 1), ("0", 3),
    ]


def test_bare_group_emits_distinct_keys_once(spark, tmpdir):
    """TestGroup.java:65-94 ("$group 1"/"$group 2"): a key-only group emits
    each distinct key exactly once — repeats don't change state."""
    pipeline = [{"$group": {"_id": "$test"}}]
    emissions = _run(
        spark, tmpdir, V_STR,
        _one_per_batch(
            [{"test": "0"}, {"test": "0"}, {"test": "1"}, {"test": "0"}]
        ),
        pipeline, suppress_unchanged=True,
    )
    assert [r["_id"] for r in _seq(emissions)] == ["0", "1"]


def test_last_sequence(spark, tmpdir):
    """TestGroup.java:96-108 ("$group $last 1"): latest value per input."""
    pipeline = [{"$group": {"_id": None, "last": {"$last": "$test"}}}]
    emissions = _run(
        spark, tmpdir, V_LONG,
        _one_per_batch([{"test": 0}, {"test": 1}, {"test": 2}]),
        pipeline, suppress_unchanged=True,
    )
    assert [r["last"] for r in _seq(emissions)] == [0, 1, 2]


def test_last_root_with_sum_sequence(spark, tmpdir):
    """TestGroup.java:110-138 ("$group $last 2"): $last of $$ROOT carries the
    whole latest document alongside a running $sum."""
    schema = T.StructType(
        [T.StructField("test1", T.LongType()), T.StructField("test2", T.LongType())]
    )
    pipeline = [
        {"$group": {"_id": None, "last": {"$last": "$$ROOT"},
                    "sum": {"$sum": "$test1"}}}
    ]
    emissions = _run(
        spark, tmpdir, schema,
        _one_per_batch(
            [{"test1": 0, "test2": 0}, {"test1": 1, "test2": 1},
             {"test1": 2, "test2": 2}]
        ),
        pipeline, suppress_unchanged=True,
    )
    seq = _seq(emissions)
    assert [r["sum"] for r in seq] == [0, 1, 3]
    assert [r["last"] for r in seq] == [
        {"test1": 0, "test2": 0},
        {"test1": 1, "test2": 1},
        {"test1": 2, "test2": 2},
    ]


def test_max_suppresses_non_improving_input(spark, tmpdir):
    """TestGroup.java:140-152 ("$group $max"): inputs 0,1,2,0 emit 0,1,2 —
    the final 0 doesn't raise the max, so nothing is emitted."""
    pipeline = [{"$group": {"_id": None, "max": {"$max": "$test"}}}]
    emissions = _run(
        spark, tmpdir, V_LONG,
        _one_per_batch([{"test": 0}, {"test": 1}, {"test": 2}, {"test": 0}]),
        pipeline, suppress_unchanged=True,
    )
    assert [r["max"] for r in _seq(emissions)] == [0, 1, 2]


def test_min_suppresses_non_improving_input(spark, tmpdir):
    """TestGroup.java:185-197 ("$group $min"): inputs 2,1,2,0 emit 2,1,0."""
    pipeline = [{"$group": {"_id": None, "min": {"$min": "$test"}}}]
    emissions = _run(
        spark, tmpdir, V_LONG,
        _one_per_batch([{"test": 2}, {"test": 1}, {"test": 2}, {"test": 0}]),
        pipeline, suppress_unchanged=True,
    )
    assert [r["min"] for r in _seq(emissions)] == [2, 1, 0]


def test_merge_objects_sequence(spark, tmpdir):
    """TestGroup.java:166-183 ("$group $mergeObjects 2"): shallow left-fold
    merge — later non-null fields win, earlier fields survive."""
    schema = T.StructType([
        T.StructField("test", T.StructType([
            T.StructField("test1", T.LongType()),
            T.StructField("test2", T.LongType()),
        ]))
    ])
    pipeline = [{"$group": {"_id": None, "merged": {"$mergeObjects": "$test"}}}]
    emissions = _run(
        spark, tmpdir, schema,
        _one_per_batch(
            [{"test": {"test1": 0}}, {"test": {"test2": 0}},
             {"test": {"test1": 1}}]
        ),
        pipeline, suppress_unchanged=True,
    )
    # Fixed-schema note: absent struct fields read as null and are skipped
    # by the coalesce fold, reproducing the reference's key-level merge.
    assert [r["merged"] for r in _seq(emissions)] == [
        {"test1": 0, "test2": None},
        {"test1": 0, "test2": 0},
        {"test1": 1, "test2": 0},
    ]


def test_push_sequence(spark, tmpdir):
    """TestGroup.java:199-212 ("$group $push"): every input appends and
    emits — duplicates included, arrival order preserved."""
    pipeline = [{"$group": {"_id": None, "items": {"$push": "$test"}}}]
    emissions = _run(
        spark, tmpdir, V_LONG,
        _one_per_batch([{"test": 2}, {"test": 1}, {"test": 2}, {"test": 0}]),
        pipeline, suppress_unchanged=True,
    )
    assert [r["items"] for r in _seq(emissions)] == [
        [2], [2, 1], [2, 1, 2], [2, 1, 2, 0],
    ]


def test_stddev_pop_sequence_documented_deviation(spark, tmpdir):
    """TestGroup.java:214-227 ("$group $stdDevPop") golden-tests the
    reference quirk of emitting the running *count* (1,2,3,4).  This engine
    deliberately emits the correct population stddev instead (README
    "Deliberate deviations"), so the same inputs 0,1,2,3 yield
    sigma = 0, .5, sqrt(2/3), sqrt(5/4)."""
    pipeline = [{"$group": {"_id": None, "sd": {"$stdDevPop": "$test"}}}]
    emissions = _run(
        spark, tmpdir, V_LONG,
        _one_per_batch([{"test": 0}, {"test": 1}, {"test": 2}, {"test": 3}]),
        pipeline, suppress_unchanged=True,
    )
    expected = [0.0, 0.5, math.sqrt(2.0 / 3.0), math.sqrt(5.0 / 4.0)]
    got = [r["sd"] for r in _seq(emissions)]
    assert len(got) == 4
    for g, e in zip(got, expected):
        assert g == pytest.approx(e)


def test_sum_long_per_key_sequence(spark, tmpdir):
    """TestGroup.java:229-246 ("$group $sum 1"): $sum of literal 1 keyed by
    the value — "0":1, "0":2, "1":1, "0":3."""
    pipeline = [{"$group": {"_id": "$test", "sum": {"$sum": 1}}}]
    emissions = _run(
        spark, tmpdir, V_STR,
        _one_per_batch(
            [{"test": "0"}, {"test": "0"}, {"test": "1"}, {"test": "0"}]
        ),
        pipeline, suppress_unchanged=True,
    )
    assert [(r["_id"], r["sum"]) for r in _seq(emissions)] == [
        ("0", 1), ("0", 2), ("1", 1), ("0", 3),
    ]


def test_sum_double_per_key_sequence(spark, tmpdir):
    """TestGroup.java:248-265 ("$group $sum 2"): summing literal 1.5 —
    1.5, 3, 1.5, 4.5 (the reference renders the integral 3.0 as long 3;
    numerically identical here)."""
    pipeline = [{"$group": {"_id": "$test", "sum": {"$sum": 1.5}}}]
    emissions = _run(
        spark, tmpdir, V_STR,
        _one_per_batch(
            [{"test": "0"}, {"test": "0"}, {"test": "1"}, {"test": "0"}]
        ),
        pipeline, suppress_unchanged=True,
    )
    assert [(r["_id"], r["sum"]) for r in _seq(emissions)] == [
        ("0", 1.5), ("0", 3.0), ("1", 1.5), ("0", 4.5),
    ]
