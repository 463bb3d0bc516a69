"""$connectedComponents (operators/graphcc.py): alternating
large-star/small-star labels verified against a driver-side union-find on
handcrafted and seeded-random graphs, plus $minhashDedup transitive mode."""

import random

from pyspark.sql import functions as F

from pincette_mongo_streams_spark import Context, compile_pipeline
from pincette_mongo_streams_spark.operators.graphcc import connected_components


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # path-compress fully: component = min reachable
    return {x: find(x) for x in list(parent)}


def _cc_spark(spark, edges, node_type="long"):
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], f"a {node_type}, b {node_type}"
    )
    labels = connected_components(df)
    out = {r["__cc_node"]: r["__cc_comp"] for r in labels.collect()}
    return out


def _expected(edges):
    uf = _union_find(None, edges)
    # graphcc omits roots (label == self); mirror that
    return {k: v for k, v in uf.items() if k != v}


def test_chain_and_isolated(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
    assert _cc_spark(spark, edges) == _expected(edges)


def test_cycle_and_cross_links(spark):
    edges = [(5, 6), (6, 7), (7, 5), (1, 7), (20, 21), (21, 22), (20, 22)]
    assert _cc_spark(spark, edges) == _expected(edges)


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(3, 3), (1, 2), (2, 1), (1, 2), (4, 4)]
    assert _cc_spark(spark, edges) == _expected(edges)


def test_string_node_ids(spark):
    edges = [("b", "c"), ("a", "b"), ("x", "y")]
    got = _cc_spark(spark, edges, node_type="string")
    assert got == {"b": "a", "c": "a", "y": "x"}


def test_long_chain_converges_in_log_rounds(spark):
    # a 200-node path: diameter 200, but large/small-star needs O(log n)
    # rounds — the maxIterations=50 default must be far more than enough
    edges = [(i, i + 1) for i in range(200)]
    got = _cc_spark(spark, edges)
    assert got == {i: 0 for i in range(1, 201)}


def test_seeded_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(10, 60)
        m = rng.randint(5, 120)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        assert _cc_spark(spark, edges) == _expected(edges), (trial, edges)


def test_stage_labels_and_singletons(spark):
    nodes = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(8)], "nid long, payload string"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "src long, dst long"
    )
    ctx = Context(spark=spark, collections={"e": edges})
    out = compile_pipeline(
        [{"$connectedComponents": {"edges": "e", "src": "src", "dst": "dst",
                                   "on": "nid", "as": "component"}}],
        ctx,
    )(nodes)
    got = {r["nid"]: r["component"] for r in out.collect()}
    # connected nodes labeled by component min; untouched nodes by self
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}
    assert set(out.columns) == {"nid", "payload", "component"}


def test_empty_edges(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "nid long")
    edges = spark.createDataFrame([], "src long, dst long")
    ctx = Context(spark=spark, collections={"e": edges})
    out = compile_pipeline(
        [{"$connectedComponents": {"edges": "e", "src": "src", "dst": "dst",
                                   "on": "nid"}}],
        ctx,
    )(nodes)
    assert {r["nid"]: r["component"] for r in out.collect()} == {1: 1, 2: 2}


def _near_dup_docs(spark):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    mk = lambda words: " ".join(words)
    a = base[:]
    b = base[:]; b[19] = "CHANGED1"
    c = b[:]; c[0] = "CHANGED2"   # similar to b, less similar to a
    d = ["totally", "different", "text", "with", "no", "overlap", "at",
         "all", "whatsoever", "here", "nothing", "shared", "q1", "q2",
         "q3", "q4", "q5", "q6", "q7", "q8"]
    return spark.createDataFrame(
        [(1, mk(a)), (2, mk(b)), (3, mk(c)), (4, mk(d))],
        "doc_id long, text string",
    )


def test_minhash_dedup_transitive_collapses_chains(spark):
    docs = _near_dup_docs(spark)
    ctx = Context(spark=spark)
    run = compile_pipeline(
        [{"$minhashDedup": {"input": "$text", "id": "doc_id", "shingle": 3,
                            "numHashes": 32, "bands": 16,
                            "transitive": True}}],
        ctx,
    )
    survivors = {r["doc_id"] for r in run(docs).collect()}
    # 1~2 and 2~3 share buckets (1-word edits); transitive closure keeps
    # only doc 1 for the {1,2,3} cluster; 4 is its own cluster
    assert survivors == {1, 4}
    # deterministic across runs
    assert {r["doc_id"] for r in run(docs).collect()} == survivors


def test_minhash_dedup_transitive_subset_of_default(spark):
    docs = _near_dup_docs(spark)
    ctx = Context(spark=spark)

    def run(transitive):
        return {
            r["doc_id"]
            for r in compile_pipeline(
                [{"$minhashDedup": {"input": "$text", "id": "doc_id",
                                    "shingle": 3, "numHashes": 32,
                                    "bands": 16,
                                    "transitive": transitive}}],
                ctx,
            )(docs).collect()
        }

    assert run(True) <= run(False)


def test_durable_checkpoint_used_when_dir_configured(spark, tmp_path):
    sc = spark.sparkContext
    assert not sc._jsc.sc().getCheckpointDir().isDefined()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        edges = [(1, 2), (2, 3), (10, 11)]
        assert _cc_spark(spark, edges) == _expected(edges)
        import os
        assert any(os.scandir(tmp_path / "ckpt"))  # rounds were persisted
    finally:
        # restore the localCheckpoint path for the rest of the suite
        none_cls = getattr(spark.sparkContext._jvm.scala, "None$")
        scala_none = getattr(none_cls, "MODULE$")
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(scala_none)


def test_page_rank_matches_reference_power_iteration(spark):
    """$pageRank reproduces a hand-rolled power iteration exactly
    (same simplified recurrence, fixed rounds)."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    E = [(1, 2), (2, 3), (3, 1), (1, 3)]
    d, k = 0.85, 5
    nodes = sorted({x for e in E for x in e})
    n = len(nodes)
    out = {u: sum(1 for a, _ in E if a == u) for u in nodes}
    r = {u: 1.0 / n for u in nodes}
    for _ in range(k):
        nr = {}
        for v in nodes:
            s = sum(r[u] / out[u] for u, w in E if w == v)
            nr[v] = (1 - d) / n + d * s
        r = nr

    edges = spark.createDataFrame(E, "src long, dst long")
    docs = spark.createDataFrame([(u,) for u in nodes] + [(99,)], "node long")
    ctx = Context(spark=spark, collections={"e": edges})
    got = compile_pipeline(
        [{"$pageRank": {"edges": "e", "src": "src", "dst": "dst",
                        "on": "node", "as": "pr", "damping": d,
                        "iterations": k}}],
        ctx,
    )(docs).collect()
    by = {row["node"]: row["pr"] for row in got}
    for u in nodes:
        assert abs(by[u] - r[u]) < 1e-12, (u, by[u], r[u])
    # isolated node: the (1-d)/n floor
    assert abs(by[99] - (1 - d) / n) < 1e-12
    # higher in-link mass -> higher rank (3 receives from 1 and 2)
    assert by[3] > by[2]


def test_page_rank_plan_is_joins_not_collects(spark):
    """The per-round work is edge⋈rank joins + groupBy sums — no
    cartesian, no Python eval."""
    from pincette_mongo_streams_spark import Context, compile_pipeline

    edges = spark.range(0, 500).selectExpr(
        "id as src", "(id * 7) % 500 as dst")
    docs = spark.range(0, 500).selectExpr("id as node")
    ctx = Context(spark=spark, collections={"e": edges})
    out = compile_pipeline(
        [{"$pageRank": {"edges": "e", "src": "src", "dst": "dst",
                        "on": "node", "as": "pr", "iterations": 3}}],
        ctx,
    )(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan
    rows = out.collect()
    assert len(rows) == 500
    total = sum(r["pr"] for r in rows)
    assert total > 0
