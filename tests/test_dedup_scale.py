"""Scale guards for the near-dup operators (VERDICT r1 "what's wrong"):

- $ngramJaccardDedup: hot-shingle document-frequency cap bounds the
  inverted-index bucket fan-out (one stop-word shingle must not create an
  m² candidate bucket); Jaccard stays exact for surviving candidates.
- $embedDedup: the exact all-pairs self-join is refused above a size
  estimate unless {exact: true}; {bits: k} selects the LSH path.
"""

import pytest
from pyspark.sql import Row

from pincette_mongo_streams_spark import Context, compile_pipeline
from pincette_mongo_streams_spark.functions import datapipe


def _ngram(spark, rows, **opts):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])
    pipeline = [{"$ngramJaccardDedup": {"input": "$text", "id": "doc_id",
                                        "n": 2, "threshold": 0.5, **opts}}]
    out = compile_pipeline(pipeline, Context(spark=spark))(df)
    return sorted(r.doc_id for r in out.collect())


def test_ngram_cap_keeps_exact_jaccard_for_cold_pairs(spark):
    """Near-dup docs that share cold shingles dedup identically whether or
    not an unrelated hot shingle is capped out of candidate generation."""
    hot = "common filler words appear everywhere"
    rows = [
        (1, f"alpha beta gamma delta {hot}"),
        (2, f"alpha beta gamma delta epsilon {hot}"),  # near-dup of 1
        (3, f"totally different content here {hot}"),
        (4, f"another unrelated document text {hot}"),
        (5, f"more unrelated words again {hot}"),
    ]
    uncapped = _ngram(spark, rows, maxShingleDf=10**6)
    capped = _ngram(spark, rows, maxShingleDf=4)  # hot shingles hit DF=5
    assert uncapped == capped == [1, 3, 4, 5]


def test_ngram_cap_drops_hot_only_candidates(spark):
    """A pair whose ONLY shared shingles are hot is no longer a candidate
    under the cap — the documented recall trade (SCALE.md)."""
    # five 2-shingle docs all sharing the same hot bigram
    rows = [(i, f"shared bigram unique{i}") for i in range(5)]
    uncapped = _ngram(spark, rows, maxShingleDf=10**6)
    capped = _ngram(spark, rows, maxShingleDf=4)
    # uncapped: jaccard(docs i,j) = 1/3 < 0.5 -> nothing removed either way
    assert uncapped == capped == [0, 1, 2, 3, 4]
    # make them true hot-only near-dups: 1-shingle docs, jaccard 1.0
    rows = [(i, "shared bigram") for i in range(5)]
    assert _ngram(spark, rows, maxShingleDf=10**6) == [0]
    assert _ngram(spark, rows, maxShingleDf=4) == [0, 1, 2, 3, 4]


def test_minhash_dedup_verify_rescues_false_positives(spark):
    """LSH bucket-transitive pruning over-drops; {verify: t} confirms
    each (keeper, member) candidate with exact shingle Jaccard before
    dropping — true near-dups still dedup, low-overlap bucket collisions
    survive."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near-dup of 1
        (3, "alpha completely different words here now okay fine"),
    ]
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])

    def run(**opts):
        p = [{"$minhashDedup": {"input": "$text", "id": "doc_id",
                                "shingle": 1, "numHashes": 32, "bands": 32,
                                **opts}}]
        out = compile_pipeline(p, Context(spark=spark))(df)
        return sorted(r.doc_id for r in out.collect())

    # single-row bands: doc 3 shares one word with doc 1 -> bucket collision
    assert run() == [1]                 # unverified over-drops doc 3
    assert run(verify=0.5) == [1, 3]    # verified keeps it, still drops 2


def _embed(spark, n_rows, **opts):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 3), 1.0, 2.0]) for i in range(n_rows)]
    )
    pipeline = [{"$embedDedup": {"input": "$embedding", "id": "vec_id",
                                 "threshold": 0.999, **opts}}]
    return compile_pipeline(pipeline, Context(spark=spark))(df)


def test_embed_dedup_refuses_all_pairs_above_limit(spark, monkeypatch):
    # parquet-backed input => a real optimizer size estimate (in-memory
    # relations report the Long.MaxValue sentinel, which the guard treats
    # as "unknown" and allows)
    # the guard reads the OWNING module dynamically (r10 split:
    # datapipe is a re-export aggregator, so patching its copy
    # would not reach the stage)
    from pincette_mongo_streams_spark.functions import dp_dedup
    monkeypatch.setattr(dp_dedup, "ALL_PAIRS_SIZE_LIMIT", 0)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def run(**opts):
        pipeline = [{"$embedDedup": {"input": "$embedding", "id": "vec_id",
                                     "threshold": 0.999, **opts}}]
        return compile_pipeline(pipeline, Context(spark=spark))(emb)

    with pytest.raises(ValueError, match="all-pairs self-join refused"):
        run().collect()
    # explicit opt-ins still plan and run
    assert run(exact=True).count() >= 1
    assert run(bits=4, dim=64).count() >= 1


def test_embed_dedup_exact_under_limit_unchanged(spark):
    # tiny corpus under the default limit: exact all-pairs still the default
    out = _embed(spark, 9)
    assert sorted(r.vec_id for r in out.collect()) == [0, 1, 2]


def test_cross_dedup_removes_benchmark_near_dups(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today"),
         (101, "completely unrelated benchmark text about spark engines")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),   # exact
         (2, "the quick brown fox jumps over the lazy cat today"),   # near
         (3, "an entirely different document about parquet files and joins")],
        "doc_id long, text string",
    )
    ctx = Context(spark=spark, collections={"bench": bench})
    out = compile_pipeline(
        [{"$crossDedup": {"from": "bench", "input": "$text", "id": "doc_id",
                          "shingle": 2, "numHashes": 32, "bands": 16}}],
        ctx,
    )(corpus).collect()
    kept = {r["doc_id"] for r in out}
    assert 1 not in kept            # exact dup always caught
    assert 3 in kept                # unrelated survives
    # verify path: a strict threshold keeps the near-but-not-exact doc
    out2 = compile_pipeline(
        [{"$crossDedup": {"from": "bench", "input": "$text", "id": "doc_id",
                          "shingle": 2, "numHashes": 32, "bands": 16,
                          "verify": 0.99}}],
        ctx,
    )(corpus).collect()
    kept2 = {r["doc_id"] for r in out2}
    assert 1 not in kept2 and 2 in kept2 and 3 in kept2


def test_band_config_validated(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline
    import pytest

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for stage in (
        {"$minhashDedup": {"input": "$text", "id": "doc_id",
                           "numHashes": 32, "bands": 64}},
        {"$crossDedup": {"from": "b", "input": "$text", "id": "doc_id",
                         "numHashes": 32, "bands": 6}},
    ):
        with pytest.raises(ValueError, match="divisible"):
            compile_pipeline([stage], Context(
                spark=spark, collections={"b": df}))(df)


def test_jaccard_join_pairs(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon eta"),    # near-dup of 1
         (3, "totally different words entirely here now")],
        "doc_id long, text string",
    )
    out = compile_pipeline(
        [{"$jaccardJoin": {"input": "$text", "id": "doc_id", "shingle": 2,
                           "numHashes": 32, "bands": 16, "threshold": 0.3}}],
        Context(spark=spark),
    )(docs).collect()
    pairs = {(r["left_id"], r["right_id"]): r["jaccard"] for r in out}
    assert (1, 2) in pairs
    # 2-shingles: doc1/doc2 share 4 of 6 distinct -> J = 4/6
    import math
    assert pairs[(1, 2)] == math.floor(4 / 6 * 1e9 + 0.5) / 1e9
    assert all(3 not in p for p in pairs)
    # unordered pairs emitted once, left < right
    assert all(l < r for l, r in pairs)


def test_jaccard_join_cross_corpus(spark):
    from pincette_mongo_streams_spark import Context, compile_pipeline

    left = spark.createDataFrame(
        [(1, "one two three four five")], "doc_id long, text string")
    right = spark.createDataFrame(
        [(9, "one two three four six"), (8, "unrelated totally")],
        "rid long, text string")
    out = compile_pipeline(
        [{"$jaccardJoin": {"from": "r", "input": "$text", "id": "doc_id",
                           "foreignId": "rid", "shingle": 1,
                           "numHashes": 32, "bands": 16,
                           "threshold": 0.4}}],
        Context(spark=spark, collections={"r": right}),
    )(left).collect()
    assert {(r["left_id"], r["right_id"]) for r in out} == {(1, 9)}


def test_jaccard_join_invariants_random(spark):
    """LSH-independent invariants on random corpora: every returned pair
    truly meets the threshold (soundness — the exact verify guarantees
    no false positives), and exact-duplicate texts are ALWAYS found
    (identical signatures share every band)."""
    import random

    from pincette_mongo_streams_spark import Context, compile_pipeline

    rng = random.Random(23)
    words = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(40):
        n = rng.randint(4, 10)
        rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
    rows.append((100, rows[5][1]))  # exact duplicate of doc 5
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = compile_pipeline(
        [{"$jaccardJoin": {"input": "$text", "id": "doc_id", "shingle": 2,
                           "numHashes": 32, "bands": 16,
                           "threshold": 0.5}}],
        Context(spark=spark),
    )(df).collect()

    def shingles(t):
        ws = t.lower().split()
        return set(" ".join(ws[i:i + 2]) for i in range(len(ws) - 1))

    texts = dict(rows)
    for r in out:
        a, b = shingles(texts[r["left_id"]]), shingles(texts[r["right_id"]])
        true_j = len(a & b) / len(a | b)
        assert true_j >= 0.5 - 1e-9, (r, true_j)   # soundness
    assert any(r["left_id"] == 5 and r["right_id"] == 100 for r in out)
    exact_pair = [r for r in out
                  if (r["left_id"], r["right_id"]) == (5, 100)][0]
    assert exact_pair["jaccard"] == 1.0


def test_cross_dedup_invariants_random(spark):
    """Invariants independent of LSH randomness: with verify, every
    REMOVED doc truly near-duplicates some benchmark doc (soundness);
    docs textually identical to a benchmark doc are always removed."""
    import random

    from pincette_mongo_streams_spark import Context, compile_pipeline

    rng = random.Random(31)
    words = [f"w{i}" for i in range(10)]

    def mk(n):
        return " ".join(rng.choice(words) for _ in range(n))

    bench_rows = [(100 + i, mk(rng.randint(5, 9))) for i in range(8)]
    corpus_rows = [(i, mk(rng.randint(5, 9))) for i in range(30)]
    corpus_rows.append((50, bench_rows[2][1]))  # verbatim benchmark copy
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    ctx = Context(spark=spark, collections={"bench": bench})
    out = compile_pipeline(
        [{"$crossDedup": {"from": "bench", "input": "$text",
                          "id": "doc_id", "shingle": 2, "numHashes": 32,
                          "bands": 16, "verify": 0.6}}],
        ctx,
    )(corpus).collect()
    kept = {r["doc_id"] for r in out}
    assert 50 not in kept  # the verbatim copy always dies

    def shingles(t):
        ws = t.lower().split()
        return set(" ".join(ws[i:i + 2]) for i in range(len(ws) - 1))

    bsh = [shingles(t) for _, t in bench_rows]
    for did, text in corpus_rows:
        if did not in kept:
            s = shingles(text)
            best = max(len(s & b) / len(s | b) for b in bsh)
            assert best >= 0.6 - 1e-9, (did, best)  # soundness of removal
