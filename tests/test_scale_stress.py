"""sf0.1 scale-stress pass for the r3 corpus operators (VERDICT r3 #5):
$crossDedup, $knnJoin, $connectedComponents run over the real
driver-generated sf0.1 tables (5k documents / 2k embeddings) asserting

1. runtime plan shape — no CartesianProduct, no BroadcastNestedLoopJoin,
   no Python eval in the plan (the scale invariants from SCALE.md §2 at
   a scale where a regression would already cost wall-time), and
2. a wall-clock budget — a plan regression that survives the shape
   checks (e.g. an accidental all-pairs explosion behind an equi-join)
   still trips the timer.

Budgets are generous (the suite shares a loaded CI host) but an O(n²)
regression at 5k docs ≈ 25M pairs blows straight through them.
"""

import time

import pytest

from pincette_mongo_streams_spark import Context, compile_pipeline

SF_DIR = "/root/testdata/sf0.1"

_BAD_PLAN = ("CartesianProduct", "BroadcastNestedLoopJoin",
             "BatchEvalPython", "ArrowEvalPython", "MapInPandas")


def _plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_scale_plan(df, name):
    plan = _plan_of(df)
    for marker in _BAD_PLAN:
        assert marker not in plan, f"{name}: {marker} in plan"
    return plan


def _timed(df):
    t0 = time.monotonic()
    n = df.count()
    return n, time.monotonic() - t0


def test_cross_dedup_sf01(spark):
    """Corpus (sf0.1 documents) vs reference corpus (a 40% sample of the
    same table): both sides 100 TB-class in design — the reference side
    reduces to DISTINCT band buckets, membership is a left-semi equi-join,
    nothing broadcasts pairwise."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter("doc_id % 5 < 2").select("doc_id", "text")
    ctx = Context(spark=spark, collections={"bench": bench})
    out = compile_pipeline(
        [{"$crossDedup": {"from": "bench", "input": "$text",
                          "id": "doc_id", "shingle": 3,
                          "numHashes": 32, "bands": 16}}],
        ctx,
    )(docs)
    _assert_scale_plan(out, "cross_dedup")
    n, secs = _timed(out)
    # every bench doc IS in the corpus -> its exact dup must drop;
    # survivors are a strict, non-empty subset
    assert 0 < n <= 3000
    assert secs < 45, f"cross_dedup took {secs:.1f}s at sf0.1"
    # the verify path stays candidate-sized (adds the id-keyed shingle
    # fetch join, still no cartesian)
    out2 = compile_pipeline(
        [{"$crossDedup": {"from": "bench", "input": "$text",
                          "id": "doc_id", "shingle": 3,
                          "numHashes": 32, "bands": 16, "verify": 0.8}}],
        ctx,
    )(docs)
    _assert_scale_plan(out2, "cross_dedup_verify")
    n2, secs2 = _timed(out2)
    assert n <= n2 <= 5000  # verify only rescues, never drops more
    assert secs2 < 60, f"cross_dedup verify took {secs2:.1f}s at sf0.1"


def test_knn_join_sf01(spark):
    """Self k-NN join over the full sf0.1 embeddings table: both sides
    bucket row-locally, plain equi-join on bucket, per-left top-k.  The
    2k x 2k all-pairs product (4M rows) would blow the budget; the
    bucketed plan touches only same-bucket pairs."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    ctx = Context(spark=spark)
    out = compile_pipeline(
        [{"$knnJoin": {"input": "$embedding", "id": "vec_id", "k": 3,
                       "bits": 8, "dim": dim, "probes": 3}}],
        ctx,
    )(emb)
    plan = _assert_scale_plan(out, "knn_join")
    # the bucket join must be a real equi-join (hash or sort-merge)
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan
    n, secs = _timed(out)
    assert n > 0
    # each left vector yields AT MOST k neighbors (pairs arise once)
    assert n <= 2000 * 3
    assert secs < 45, f"knn_join took {secs:.1f}s at sf0.1"
    per_left = out.groupBy("left_id").count()
    assert per_left.filter("count > 3").count() == 0


def test_semantic_dedup_sf01(spark):
    """SemDeDup over the full sf0.1 embeddings table: the pair join is a
    plain equi-join on the k-means cell id, so candidate work is bounded
    at Σ cell² instead of the 2k × 2k all-pairs product; assignment and
    centroid distances are row-local column algebra."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ctx = Context(spark=spark)
    out = compile_pipeline(
        [{"$semanticDedup": {"input": "$embedding", "id": "vec_id",
                             "k": 8, "iterations": 1, "threshold": 0.3}}],
        ctx,
    )(emb)
    plan = _assert_scale_plan(out, "semantic_dedup")
    # the cell join must be a real equi-join (hash or sort-merge)
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan
    n, secs = _timed(out)
    # survivors are a strict, non-empty subset at this threshold
    assert 0 < n < 2000
    assert secs < 45, f"semantic_dedup took {secs:.1f}s at sf0.1"


def test_connected_components_sf01(spark):
    """Large-star/small-star over a worst-case 5k-node chain (maximum
    round count for the node set) plus star components: O(log n) rounds,
    no neighborhood materialization, budget-bounded."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    # chain 0-1-2-...-2499 (one 2500-node component, log-depth stress)
    chain = spark.range(1, 2500).selectExpr("id - 1 as src", "id as dst")
    # stars: hub h = 2500 + (i % 50) for the rest
    stars = spark.range(2550, n_docs).selectExpr(
        "id as src", "2500 + cast(id % 50 as long) as dst")
    edges = chain.unionByName(stars)
    ctx = Context(spark=spark, collections={"e": edges})
    out = compile_pipeline(
        [{"$connectedComponents": {"edges": "e", "src": "src",
                                   "dst": "dst", "on": "doc_id",
                                   "as": "comp"}}],
        ctx,
    )(docs)
    _assert_scale_plan(out, "connected_components")
    t0 = time.monotonic()
    rows = out.select("doc_id", "comp").collect()
    secs = time.monotonic() - t0
    comp = {r["doc_id"]: r["comp"] for r in rows}
    # the whole chain collapses to min id 0
    assert {comp[i] for i in range(2500)} == {0}
    # each star labels with its hub id (the minimum in the component)
    assert comp[2550] == 2500 and comp[2599] == 2549 and comp[2600] == 2500
    # isolated nodes (2500..2549 appear as hubs; all nodes covered) —
    # no document loses its label
    assert len(comp) == n_docs
    assert secs < 90, f"connected_components took {secs:.1f}s at sf0.1"


def test_page_rank_sf01(spark):
    """$pageRank over a hub-skewed directed graph on the sf0.1 documents
    table (r4 verdict #7): per power-iteration round exactly one
    edges⋈ranks hash join + one groupBy(dst) partial-agg sum — never a
    cartesian/nested-loop product, no Python in the plan, lineage pinned
    per round so the final plan stays round-local; wall-time budgeted."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    # hub-skew: every doc links to one of 10 hubs (worst-case key skew
    # for the contribution aggregate) plus a ring for irreducibility
    hubs = spark.range(0, n_docs).selectExpr(
        "id as src", "cast(id % 10 as long) as dst")
    ring = spark.range(0, n_docs).selectExpr(
        "id as src", f"cast((id + 1) % {n_docs} as long) as dst")
    edges = hubs.unionByName(ring)
    ctx = Context(spark=spark, collections={"e": edges})
    out = compile_pipeline(
        [{"$pageRank": {"edges": "e", "src": "src", "dst": "dst",
                        "on": "doc_id", "as": "rank",
                        "iterations": 5}}],
        ctx,
    )(docs)
    plan = _assert_scale_plan(out, "page_rank")
    # the label join keeps the single-key fast path: no null-safe
    # composite (coalesce/isnull) broadcast keys
    assert "coalesce(doc_id" not in plan
    t0 = time.monotonic()
    rows = out.select("doc_id", "rank").collect()
    secs = time.monotonic() - t0
    ranks = {r["doc_id"]: r["rank"] for r in rows}
    assert len(ranks) == n_docs and all(v is not None for v in ranks.values())
    # hubs receive mass from n/10 in-links each: every hub must outrank
    # every non-hub outside the hubs' immediate ring wake (nodes 10-14
    # inherit half a hub's mass through the ring, decaying ~0.425/step)
    non_hub_max = max(v for k, v in ranks.items() if k >= 15)
    hub_min = min(v for k, v in ranks.items() if k < 10)
    assert hub_min > non_hub_max
    # total rank is bounded by 1 (dangling-dropped recurrence leaks mass
    # only downward; no round may create mass)
    assert sum(ranks.values()) <= 1.0 + 1e-6
    assert secs < 90, f"page_rank took {secs:.1f}s at sf0.1"


def test_span_dedup_sf01(spark):
    """$spanDedup over sf0.1 documents (r5 corpus op): corpus-wide
    ownership is one groupBy(span-hash) + equi-joins — never a
    cartesian/nested-loop pair explosion, no Python eval; wall-time
    budgeted.  A shared 4-sentence boilerplate block is appended to a
    third of the corpus so the dedup path (ownership + removal rewrite)
    does real work at scale."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    boiler = ("Subscribe to our newsletter. All rights reserved. "
              "Terms of service apply. Contact support for help.")
    corpus = docs.selectExpr(
        "doc_id",
        f"CASE WHEN doc_id % 3 = 0 THEN concat(text, ' {boiler}') "
        "ELSE text END AS text",
    )
    out = compile_pipeline(
        [{"$spanDedup": {"input": "$text", "id": "$doc_id", "span": 3}},
         {"$project": {"doc_id": 1,
                       "n_removed": "$span_dedup.n_removed"}}],
        Context(spark=spark),
    )(corpus)
    _assert_scale_plan(out, "span_dedup")
    t0 = time.monotonic()
    rows = out.collect()
    secs = time.monotonic() - t0
    by = {r["doc_id"]: r["n_removed"] for r in rows}
    assert len(by) == corpus.count()
    dup_ids = sorted(k for k in by if k % 3 == 0 and by[k] is not None)
    # near-all boilerplate carriers lose sentences — only span owners
    # (one per duplicated span) and null/short-text docs keep them all;
    # owner-survival precision itself is pinned by the unit test
    losers = [k for k in dup_ids if by[k] > 0]
    assert len(losers) >= max(1, len(dup_ids) - 20)
    assert secs < 120, f"span_dedup took {secs:.1f}s at sf0.1"


def test_group_cap_sf01(spark):
    """$groupCap over sf0.1 documents (r5): the rank filter must compile
    to WindowGroupLimit (partial map-side per-group pruning BEFORE the
    exchange + final pruning after), one hash exchange, no join, no
    Python; wall-time budgeted."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = compile_pipeline(
        [{"$groupCap": {"by": "$source", "cap": 3,
                        "sortBy": {"n_chars": -1, "doc_id": 1}}},
         {"$project": {"doc_id": 1, "source": 1}}],
        Context(spark=spark))(docs)
    plan = _assert_scale_plan(out, "group_cap")
    assert plan.count("WindowGroupLimit") == 2   # partial + final
    t0 = time.monotonic()
    rows = out.collect()
    secs = time.monotonic() - t0
    from collections import Counter

    per = Counter(r["source"] for r in rows)
    assert per and max(per.values()) <= 3
    assert secs < 60, f"group_cap took {secs:.1f}s at sf0.1"


def test_edit_distance_join_sf01(spark):
    """Self edit-distance join over the full sf0.1 documents table
    (5k long texts): candidates come from the q*k+1 globally-RAREST
    positional grams per string (ED-Join prefix filtering), so the join
    keys are never the hot boilerplate shingles; verify is banded
    levenshtein behind a length-diff prefilter.  Correctness is the
    brute-force oracle at sf0.01 (edit_distance_join); this pins the
    plan shape and the wall-time at 10x."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = compile_pipeline(
        [{"$editDistanceJoin": {"input": "$text", "id": "doc_id",
                                "maxDistance": 2, "gram": 3}}],
        Context(spark=spark),
    )(docs)
    _assert_scale_plan(out, "edit_distance_join")
    n, secs = _timed(out)
    # the corpus plants exact duplicates (distance 0) -> non-empty; a
    # candidate-path blowup would instead verify ~n^2/2 = 12.5M pairs
    assert 0 < n < 5000
    assert secs < 60, f"edit_distance_join took {secs:.1f}s at sf0.1"


def test_jaccard_join_sf01(spark):
    """Self Jaccard-similarity join over sf0.1 documents: LSH band
    buckets generate candidates (DISTINCT before verify), exact-Jaccard
    verification touches candidate pairs only."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = compile_pipeline(
        [{"$jaccardJoin": {"input": "$text", "id": "doc_id", "shingle": 3,
                           "numHashes": 32, "bands": 8, "threshold": 0.5}}],
        Context(spark=spark),
    )(docs)
    _assert_scale_plan(out, "jaccard_join")
    n, secs = _timed(out)
    # planted near-dups at >= 0.5 Jaccard exist; an LSH regression to
    # all-pairs would verify 12.5M candidates instead of hundreds
    assert 0 < n < 10_000
    assert secs < 30, f"jaccard_join took {secs:.1f}s at sf0.1"


def test_asof_join_sf01(spark):
    """$asOfJoin at sf0.1 (20k clicks vs 20k views, on user_id): the
    union-trick plan — one sort-merge per key group, never a range
    cross product (no BroadcastNestedLoopJoin)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks = ev.filter("event_type = 'click'")
    views = ev.filter("event_type = 'view'")
    ctx = Context(spark=spark, collections={"v": views})
    out = compile_pipeline(
        [{"$asOfJoin": {"from": "v", "on": "user_id", "leftTime": "$ts",
                        "rightTime": "$ts", "as": "m"}}],
        ctx,
    )(clicks)
    plan = _assert_scale_plan(out, "asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    n, secs = _timed(out)
    assert n == clicks.count()  # left-preserving
    assert secs < 30, f"asof_join took {secs:.1f}s at sf0.1"


def test_ann_ivf_search_sf01(spark):
    """$annIvfSearch at sf0.1 (2k corpus / 50 queries / nprobe 4 of 16):
    the corpus is probed through centroid buckets — an equi-join on the
    cell id, not a brute-force scan per query."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ctx = Context(spark=spark, collections={
        "queries": emb.filter(F.col("vec_id") < 50).select(
            F.col("vec_id").alias("query_id"), "embedding")})
    out = compile_pipeline(
        [{"$annIvfSearch": {"queries": "queries", "input": "$embedding",
                            "id": "vec_id", "k": 10, "nlist": 16,
                            "nprobe": 4}}],
        ctx,
    )(emb)
    _assert_scale_plan(out, "ann_ivf_search")
    n, secs = _timed(out)
    assert n == 50 * 10  # k results per query
    assert secs < 30, f"ann_ivf_search took {secs:.1f}s at sf0.1"


def test_range_join_sf01(spark):
    """$rangeJoin at sf0.1 (20k clicks vs purchase value-bands on
    user_id): the binned equi-join — candidates come from (key, bin)
    equality, never a pure range cross product."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks = ev.filter("event_type = 'click'")
    bands = (ev.filter("event_type = 'purchase'")
             .select("user_id", "event_id",
                     (F.col("value") - 5).alias("lo"),
                     (F.col("value") + 5).alias("hi")))
    ctx = Context(spark=spark, collections={"b": bands})
    out = compile_pipeline(
        [{"$rangeJoin": {"from": "b", "on": "user_id",
                         "leftValue": "$value", "rightStart": "$lo",
                         "rightEnd": "$hi", "as": "m", "binSize": 10}}],
        ctx,
    )(clicks)
    plan = _assert_scale_plan(out, "range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    n, secs = _timed(out)
    assert n > 0
    assert secs < 30, f"range_join took {secs:.1f}s at sf0.1"


def test_decontaminate_sf01(spark):
    """$decontaminate at sf0.1 (5k docs vs a 715-doc benchmark slice):
    benchmark shingle hashes reduce to DISTINCT and broadcast; the
    corpus never shuffles its text."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter("doc_id % 7 = 0").select("text")
    ctx = Context(spark=spark, collections={"bench": bench})
    out = compile_pipeline(
        [{"$decontaminate": {"input": "$text", "against": "bench",
                             "againstField": "text", "shingle": 8,
                             "as": "contamination", "mode": "flag"}}],
        ctx,
    )(docs)
    # the one BroadcastNestedLoopJoin is the intended shape: the
    # benchmark's DISTINCT shingle hashes collect into a SINGLE row and
    # cross-broadcast (IdentityBroadcastMode) — a metadata-sized build
    # side, same pattern as bm25's stats row, not a pairwise hazard
    plan = _plan_of(out)
    for marker in ("CartesianProduct", "BatchEvalPython",
                   "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, f"decontaminate: {marker} in plan"
    assert "IdentityBroadcastMode" in plan
    n, secs = _timed(out)
    assert n == docs.count()  # flag mode annotates, never drops
    # every benchmark doc IS in the corpus -> those flag as contaminated
    flagged = out.filter("contamination > 0").count()
    assert flagged >= bench.count()
    assert secs < 30, f"decontaminate took {secs:.1f}s at sf0.1"


def test_graph_lookup_sf01(spark):
    """$graphLookup at sf0.1 (15k-node div-10 ancestry chain, maxDepth
    4): one frontier-join per BFS level, the frontier monotone-shrinks,
    no cartesian anywhere."""
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        (F.col("c_custkey") / F.lit(10)).cast("long").alias("parent"))
    ctx = Context(spark=spark, collections={"h": cust})
    out = compile_pipeline(
        [{"$graphLookup": {"from": "h", "startWith": "$parent",
                           "connectFromField": "parent",
                           "connectToField": "id",
                           "as": "anc", "maxDepth": 4}}],
        ctx,
    )(cust)
    _assert_scale_plan(out, "graph_lookup")
    n, secs = _timed(out)
    assert n == 15_000  # left-preserving
    assert secs < 30, f"graph_lookup took {secs:.1f}s at sf0.1"


def test_minhash_dedup_sf01(spark):
    """The canonical web-scale dedup at sf0.1: signature computation is
    row-local HOFs, the only shuffle is the slim band-bucket
    groupBy(min), survivors come back via one anti-join — O(corpus),
    never pairwise."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = compile_pipeline(
        [{"$minhashDedup": {"input": "$text", "id": "doc_id",
                            "shingle": 3, "numHashes": 32, "bands": 16}}],
        Context(spark=spark),
    )(docs)
    _assert_scale_plan(out, "minhash_dedup")
    n, secs = _timed(out)
    # planted near-dups drop; survivors are a strict non-empty subset
    assert 0 < n < 5000
    assert secs < 30, f"minhash_dedup took {secs:.1f}s at sf0.1"


def test_set_window_fields_sf01(spark):
    """$setWindowFields at sf0.1 (100k events over user_id partitions):
    ONE hash shuffle on partitionBy, frames evaluated streaming within
    partition — no per-frame joins, no Python."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = compile_pipeline(
        [{"$setWindowFields": {
            "partitionBy": "$user_id", "sortBy": {"ts": 1},
            "output": {
                "running": {"$sum": "$value",
                            "window": {"documents": ["unbounded",
                                                     "current"]}},
                "rank": {"$denseRank": {}}}}}],
        Context(spark=spark),
    )(ev)
    plan = _assert_scale_plan(out, "set_window_fields")
    assert plan.count("Exchange hashpartitioning") <= 1
    n, secs = _timed(out)
    assert n == 100_000  # row-preserving
    assert secs < 30, f"set_window_fields took {secs:.1f}s at sf0.1"


def test_dsir_score_sf01(spark):
    """$dsirScore at sf0.1 (5k docs scored against a 1.1k-doc en
    target): both corpus models partial-aggregate to <= buckets rows,
    the log-ratio table broadcasts into the feature join, the per-doc
    sum rides one doc-keyed shuffle — O(corpus tokens) end to end."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tgt = docs.filter(F.col("lang") == "en")
    ctx = Context(spark=spark, collections={"tgt": tgt})
    out = compile_pipeline(
        [{"$dsirScore": {"input": "$text", "id": "doc_id", "from": "tgt"}}],
        ctx,
    )(docs)
    # the two BroadcastNestedLoopJoin nodes are the intended shape: the
    # model TOTALS are single-row aggregates cross-broadcast into the
    # buckets-sized ratio table (IdentityBroadcastMode, 1-row build
    # side) — bm25's stats pattern, not a pairwise hazard
    plan = _plan_of(out)
    for marker in ("CartesianProduct", "BatchEvalPython",
                   "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, f"dsir_score: {marker} in plan"
    assert "IdentityBroadcastMode" in plan
    n, secs = _timed(out)
    assert n == docs.count()  # scoring annotates every row
    assert secs < 30, f"dsir_score took {secs:.1f}s at sf0.1"
    # en documents skew toward the target model
    means = {r["lang"]: r["m"] for r in out.groupBy("lang")
             .agg(F.avg("dsir_score").alias("m")).collect()}
    assert means["en"] == max(means.values())


def test_mmr_sf01(spark):
    """$mmr at sf0.1: 2k embeddings as 8 query groups of ~250
    candidates each — the collect-per-group + row-local greedy fold
    must stay cartesian-free and budget-bounded (the fold is
    O(k^2*n*dim) per group, all inside codegen)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df = emb.withColumn("g", F.col("vec_id") % 8).withColumn(
        "s", ((F.col("vec_id") * 37) % 100) / 100.0)
    out = compile_pipeline(
        [{"$mmr": {"score": "$s", "input": "$embedding", "id": "vec_id",
                   "by": "$g", "k": 10, "lambda": 0.7}}],
        Context(spark=spark),
    )(df)
    _assert_scale_plan(out, "mmr")
    n, secs = _timed(out)
    assert n == 8 * 10
    assert secs < 45, f"mmr took {secs:.1f}s at sf0.1"
    per_group = out.groupBy("g").count().collect()
    assert all(r["count"] == 10 for r in per_group)


def test_span_dedup_tokens_sf01(spark):
    """$spanDedup unit:'tokens' at sf0.1: the occurrence explode is
    corpus-token-sized (5k docs x ~50 tokens), ownership is one
    partial-aggregated groupBy on the window hash, removals join back
    once — never pairwise, no Python."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = compile_pipeline(
        [{"$spanDedup": {"input": "$text", "id": "$doc_id", "as": "sd",
                         "unit": "tokens", "span": 5}}],
        Context(spark=spark),
    )(docs)
    _assert_scale_plan(out, "span_dedup_tokens")
    n, secs = _timed(out)
    assert n == docs.count()  # rewrite annotates, never drops rows
    assert secs < 45, f"span_dedup_tokens took {secs:.1f}s at sf0.1"
    # the synthetic corpus DOES contain duplicated 5-token windows
    from pyspark.sql import functions as F

    touched = out.filter(F.col("sd.n_removed") > 0).count()
    assert touched > 0


def test_sample_size_two_phase_sf01(spark):
    """$sample {size} at sf0.1 (r6): the plan Bernoulli-samples at the
    scan and bounds via TakeOrderedAndProject over O(n) rows — never a
    range-partitioned global sort of the corpus; the count is exact."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = compile_pipeline(
        [{"$sample": {"size": 2000, "seed": 11}},
         {"$project": {"l_orderkey": 1}}],
        Context(spark=spark),
    )(li)
    plan = _assert_scale_plan(out, "sample_size")
    assert "Sample" in plan and "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    n, secs = _timed(out)
    assert n == 2000
    assert secs < 45, f"sample took {secs:.1f}s at sf0.1"


def test_bpe_train_sf01(spark):
    """$bpeTrain at sf0.1 (r6): the word-count aggregation partial-
    aggregates the 5k-doc corpus to a distinct-pretoken table; training
    is driver-side over that bounded table; the emitted merge table is
    a local relation consumable by tokenizer:{merges}."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.monotonic()
    merges = compile_pipeline(
        [{"$bpeTrain": {"input": "$text", "merges": 256}}],
        Context(spark=spark),
    )(docs)
    rows = merges.collect()
    secs = time.monotonic() - t0
    assert 0 < len(rows) <= 256
    assert secs < 60, f"bpeTrain took {secs:.1f}s at sf0.1"
    out = compile_pipeline(
        [{"$tokenCount": {"input": "$text", "as": "n_bpe",
                          "tokenizer": {"merges": "m"}}}],
        Context(spark=spark, collections={"m": merges}),
    )(docs)
    agg = out.selectExpr("sum(n_bpe) AS b",
                         "sum(length(text)) AS c").collect()[0]
    assert 0 < agg["b"] < agg["c"]  # learned merges compress in aggregate
