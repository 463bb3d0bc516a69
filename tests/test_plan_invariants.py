"""Physical-plan regression gate (SCALE.md invariant 1): every gate query
must stay JVM-native — no row-at-a-time Python, no Arrow eval — except the
documented codec/transport boundaries; and filtering queries must push
predicates into the parquet scan."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# stages whose *transport* legitimately crosses into Python (Arrow-batched
# mapInPandas, SCALE.md §0) — everything else must be pure JVM.
# jq_tail: the tier-2 jq interpreter is the documented per-row Python
# boundary for scripts beyond the native Column compiler (script.py).
_PYTHON_ALLOWED = {"http_enrich", "decode_media_meta", "media_pipeline",
                   "jq_tail",
                   # r6: real BPE — the unbounded merge loop is the
                   # documented Arrow-batched tokenizer boundary
                   "bpe_token_count",
                   # r7: ROUGE-L — the LCS dynamic program is the
                   # eval-family's documented Arrow boundary (row-local,
                   # zero shuffle; full hash oracle via the subsequence
                   # identity)
                   "rouge_l_eval",
                   # r9: multi-reference eval runs the same ROUGE-L
                   # Arrow boundary (the multi-ref BLEU half is pure
                   # JVM — nested HOF transforms)
                   "eval_multiref",
                   # r9: $wer — the word-Levenshtein DP is the same
                   # documented eval-family Arrow boundary
                   "wer_eval",
                   # r10: multi-reference and corpus WER run the same
                   # DP boundary (chrf_multiref stays pure JVM and is
                   # deliberately NOT listed here)
                   "wer_multiref", "wer_corpus",
                   # r11: $ter's greedy-shift search runs on the same
                   # eval-family Arrow DP boundary as $wer, and the
                   # corpusWer paired bootstrap computes its per-segment
                   # sufficient statistics through it (bootstrap_ci_corpus
                   # = corpusBleu stays pure JVM and is deliberately NOT
                   # listed here)
                   "ter_eval", "ter_corpus", "paired_bootstrap_corpus",
                   # r12: $rougeLsum's union-LCS DP runs on the same
                   # eval-family Arrow boundary (rouge_n stays pure JVM
                   # and is deliberately NOT listed here)
                   "rouge_lsum"}


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_no_python_in_plan(spark, name):
    if name in _PYTHON_ALLOWED:
        # skip BEFORE building: query construction can run eager jobs
        # (bpe_token_count trains its merge table) — all spent to
        # assert nothing
        pytest.skip("documented Python transport boundary")
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, f"{name}: {marker} leaked into the plan"


def test_match_pushdown_reaches_scan(spark):
    df = entrymod.queries()["match_basic"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_returnflag" in pushed, pushed


def test_lookup_broadcasts_small_side(spark):
    df = entrymod.queries()["lookup_array_size"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_lookup_broadcast_gated_by_size_estimate(spark):
    """A foreign side whose optimizer size estimate exceeds
    BROADCAST_SIZE_LIMIT must NOT be broadcast-hinted ($lookup gate,
    operators/lookup.py): forcing a 100x dimension onto every executor
    heap is the canonical scale OOM.  AQE may still convert at runtime —
    the invariant is about the *logical* hint we emit."""
    from pincette_mongo_streams_spark.operators import lookup as lk

    big = spark.range(0, 10).withColumnRenamed("id", "fk")
    old = lk.BROADCAST_SIZE_LIMIT
    try:
        lk.BROADCAST_SIZE_LIMIT = 0  # everything is "too big"
        out = lk._maybe_broadcast(big)
        assert "ResolvedHint" not in out._jdf.queryExecution().analyzed().toString()
    finally:
        lk.BROADCAST_SIZE_LIMIT = old
    # and a genuinely small side still gets the hint
    out = lk._maybe_broadcast(big)
    assert "ResolvedHint" in out._jdf.queryExecution().analyzed().toString()


def test_ann_topk_uses_window_group_limit(spark):
    df = entrymod.queries()["ann_topk"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # per-partition heap-k before shuffle


def test_size_only_lookup_avoids_collect_list(spark):
    """The size-only rewrite (plans/optimize.py) must remove the
    collect_list(struct(*)) match-array materialization from both bench
    lookup queries."""
    for name in ("lookup_array_size", "lookup_pipeline"):
        df = entrymod.queries()[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "collect_list" not in plan, f"{name} still materializes arrays"


def test_group_uses_partial_aggregation(spark):
    """Aggregations must map-side combine (HashAggregate partial -> final)
    so the shuffle carries one row per (task, key), not per input row."""
    df = entrymod.queries()["group_accumulators"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_" in plan, "no partial aggregation before the exchange"


def test_knn_join_never_cartesian(spark):
    """$knnJoin's LSH bucket equi-join must plan as a hash join — an
    inequality/cross plan would be the O(n^2) product the operator exists
    to avoid."""
    df = entrymod.queries()["knn_join"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_never_cartesian(spark):
    """$rangeJoin's binned strategy must plan the containment predicate as
    a residual on an equi-join, not as a nested-loop join."""
    df = entrymod.queries()["range_join"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_single_key_shuffle(spark):
    """$asOfJoin's union trick costs exactly ONE hash shuffle (the window
    partitioning) — a join-based plan would add per-side exchanges."""
    df = entrymod.queries()["asof_join"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, plan
    assert "Join" not in plan


def test_tf_idf_reuses_token_shuffle(spark):
    """$tfIdf derives document frequencies from the SAME (id, term)
    aggregate that feeds term frequencies — at runtime the exchange must
    be reused, not recomputed (a second tokenize+explode pass would
    double the scan cost at corpus scale)."""
    df = entrymod.queries()["tf_idf"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan
    assert "CartesianProduct" not in plan


def test_new_corpus_ops_never_cartesian_or_python(spark):
    """tf_idf / collocations / cross_dedup / jaccard_join: equi-join
    plans only (no nested-loop/cartesian products except the single-row
    stats broadcasts), and no Python eval nodes — the whole surface
    stays JVM-side."""
    for name in ("tf_idf", "collocations", "cross_dedup", "jaccard_join"):
        df = entrymod.queries()[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        # a BroadcastNestedLoopJoin is legal ONLY for the single-row
        # totals/stats cross joins (IdentityBroadcastMode); any other
        # nested loop means a join lost its equi-keys
        for line in plan.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                assert "Cross" in line, (name, line)
