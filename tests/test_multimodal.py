"""Multimodal column plumbing: $decodeMedia (Arrow-batched stub codec),
$frameSample (native byte-window framing), $mediaEmbed (deterministic
featurizer composing with the ANN operators)."""

from pyspark.sql import functions as F

from pincette_mongo_streams_spark import Context, compile_pipeline


def _bin_df(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    return df.withColumn("content", F.encode(F.col("t"), "UTF-8"))


def test_frame_sample_windows(spark):
    df = _bin_df(spark, ["abcdefghij", "abc", ""])
    out = compile_pipeline(
        [{"$frameSample": {"input": "$content", "frameSize": 4, "stride": 3,
                           "as": "frames"}}],
        Context(spark=spark),
    )(df)
    rows = {r["id"]: r["frames"] for r in out.collect()}
    # len 10, size 4, stride 3 -> offsets 0,3,6 (9+4 > 10 stops at 6)
    assert [(f["idx"], bytes(f["data"]).decode()) for f in rows[0]] == [
        (0, "abcd"), (1, "defg"), (2, "ghij")
    ]
    assert rows[1] == []  # shorter than one frame
    assert rows[2] == []


def test_frame_sample_default_stride_non_overlapping(spark):
    df = _bin_df(spark, ["abcdefgh"])
    out = compile_pipeline(
        [{"$frameSample": {"input": "$content", "frameSize": 4, "as": "frames"}}],
        Context(spark=spark),
    )(df).collect()
    assert [bytes(f["data"]).decode() for f in out[0]["frames"]] == ["abcd", "efgh"]


def test_media_embed_deterministic_and_composes_with_ann(spark):
    df = _bin_df(spark, ["doc one text", "doc two text", "doc one text"])
    ctx = Context(spark=spark)
    pipeline = [{"$mediaEmbed": {"input": "$content", "dim": 8, "as": "emb"}}]
    out = compile_pipeline(pipeline, ctx)(df).collect()
    embs = {r["id"]: r["emb"] for r in out}
    assert len(embs[0]) == 8
    assert all(-1.0 <= v < 1.0 for v in embs[0])
    assert embs[0] == embs[2]  # same bytes -> same embedding
    assert embs[0] != embs[1]
    # run twice -> identical (no per-run salt)
    again = {r["id"]: r["emb"] for r in compile_pipeline(pipeline, ctx)(df).collect()}
    assert again == embs

    # composes with $annTopK: identical docs are each other's top match
    emb_df = compile_pipeline(pipeline, ctx)(df)
    queries = emb_df.filter(F.col("id") == 0).select(
        F.col("id").alias("query_id"), F.col("emb").alias("embedding")
    )
    ctx2 = Context(spark=spark, collections={"q": queries})
    res = compile_pipeline(
        [{"$annTopK": {"queries": "q", "input": "$emb", "id": "id", "k": 2}}],
        ctx2,
    )(emb_df).collect()
    top = sorted(res, key=lambda r: r["rank"])
    assert {top[0]["corpus_id"], top[1]["corpus_id"]} == {0, 2}  # the twins


def test_media_embed_no_python_in_plan(spark):
    """The stub featurizer must stay JVM-side (SCALE.md invariant 1)."""
    df = _bin_df(spark, ["abc"])
    out = compile_pipeline(
        [{"$mediaEmbed": {"input": "$content", "dim": 4, "as": "emb"}},
         {"$frameSample": {"input": "$content", "frameSize": 2, "as": "fr"}}],
        Context(spark=spark),
    )(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "InPandas" not in plan


def test_ann_lsh_search_recall_vs_brute_force(spark, sf_dir):
    """$annLshSearch must (a) return the $annTopK schema, (b) prune the
    corpus, and (c) keep useful recall vs brute force on the real
    embeddings table (deterministic hash -> recall is a fixed number)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ctx = Context(spark=spark, collections={"q": queries})
    brute = compile_pipeline(
        [{"$annTopK": {"queries": "q", "input": "$embedding", "id": "vec_id",
                       "k": 5}}], ctx
    )(emb).collect()
    lsh = compile_pipeline(
        [{"$annLshSearch": {"queries": "q", "input": "$embedding",
                            "id": "vec_id", "k": 5, "bits": 6, "dim": 64,
                            "probes": 7}}], ctx
    )(emb).collect()
    assert {c for c in lsh[0].asDict()} == {"query_id", "corpus_id", "score", "rank"}
    b = {(r["query_id"], r["corpus_id"]) for r in brute}
    l = {(r["query_id"], r["corpus_id"]) for r in lsh}
    # every query finds itself (cos=1 in its own bucket)
    assert all((q, q) in l for q in range(10))
    recall = len(b & l) / len(b)
    assert recall >= 0.25, f"recall {recall} collapsed"  # uniform data, 6 bits


def test_ann_ivf_search_exact_when_probing_all_cells(spark, sf_dir):
    """$annIvfSearch with nprobe == nlist probes every cell, so it must
    reproduce brute-force $annTopK exactly; with nprobe < nlist it must
    still find each query's own vector (its own cell is the top probe)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ctx = Context(spark=spark, collections={"q": queries})
    brute = compile_pipeline(
        [{"$annTopK": {"queries": "q", "input": "$embedding", "id": "vec_id",
                       "k": 5}}], ctx
    )(emb).collect()
    full = compile_pipeline(
        [{"$annIvfSearch": {"queries": "q", "input": "$embedding",
                            "id": "vec_id", "k": 5, "nlist": 8,
                            "nprobe": 8}}], ctx
    )(emb).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(((r["query_id"], r["rank"], r["corpus_id"]) for r in full)) == \
        sorted(((r["query_id"], r["rank"], r["corpus_id"]) for r in brute))

    pruned = compile_pipeline(
        [{"$annIvfSearch": {"queries": "q", "input": "$embedding",
                            "id": "vec_id", "k": 5, "nlist": 8,
                            "nprobe": 2}}], ctx
    )(emb).collect()
    assert {c for c in pruned[0].asDict()} == {"query_id", "corpus_id", "score", "rank"}
    got = {(r["query_id"], r["corpus_id"]) for r in pruned}
    assert all((q, q) in got for q in range(10))
    # deterministic: same pipeline twice -> identical result
    again = compile_pipeline(
        [{"$annIvfSearch": {"queries": "q", "input": "$embedding",
                            "id": "vec_id", "k": 5, "nlist": 8,
                            "nprobe": 2}}], ctx
    )(emb).collect()
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, again))


def test_http_parallel_transport(spark):
    """$http parallelism extension: pooled transport beats the reference's
    strictly sequential per-partition calls; row/response alignment and
    httpError protocol are unchanged."""
    import json as _json
    import time

    def slow_transport(req):
        t0 = time.perf_counter()
        time.sleep(0.1)
        t1 = time.perf_counter()
        n = int(req["url"].rsplit("/", 1)[1])
        if n == 3:
            return {"status": 404, "body": "nope", "contentType": "text/plain"}
        return {"status": 200,
                "body": _json.dumps({"n": n * 10, "t0": t0, "t1": t1}),
                "contentType": "application/json"}

    df = spark.createDataFrame([(i,) for i in range(8)], "i long").repartition(1)
    ctx = Context(spark=spark, http_transport=slow_transport)
    def run(par):
        pipeline = [{"$http": {
            "url": {"$concat": ["http://svc/", {"$toString": "$i"}]},
            "as": "resp", "parallelism": par,
        }}]
        t0 = time.perf_counter()
        rows = compile_pipeline(pipeline, ctx)(df).collect()
        return rows, time.perf_counter() - t0

    seq_rows, _ = run(1)
    rows, _ = run(8)
    by_i = {r["i"]: r for r in rows}
    assert _json.loads(by_i[0]["resp"])["n"] == 0
    assert _json.loads(by_i[7]["resp"])["n"] == 70
    assert by_i[3]["resp"] is None
    assert by_i[3]["httpError"].asDict() == {"statusCode": 404, "body": "nope"}
    # pooled and sequential agree on results
    assert ({r["i"]: r["resp"] and _json.loads(r["resp"])["n"]
             for r in seq_rows}
            == {r["i"]: r["resp"] and _json.loads(r["resp"])["n"]
                for r in rows})

    # concurrency proof by transport-reported call intervals, not
    # wall-clock margins (which go flaky under host load): the pooled run
    # must overlap calls, the sequential run must not
    def intervals(rs):
        spans = [_json.loads(r["resp"]) for r in rs if r["resp"]]
        return sorted((s["t0"], s["t1"]) for s in spans)

    def max_concurrent(spans):
        events = [(t0, 1) for t0, _ in spans] + [(t1, -1) for _, t1 in spans]
        cur = best = 0
        for _, d in sorted(events):
            cur += d
            best = max(best, cur)
        return best

    assert max_concurrent(intervals(rows)) >= 2, "pool never overlapped"
    assert max_concurrent(intervals(seq_rows)) == 1, "sequential overlapped"


def test_ann_ivf_empty_corpus(spark):
    """Empty corpus: no centroids exist — the stage returns an empty
    result with the standard (query_id, corpus_id, score, rank) schema."""
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(1, [1.0, 0.0])],
                              "query_id long, embedding array<double>")
    ctx = Context(spark=spark, collections={"q": q})
    out = compile_pipeline(
        [{"$annIvfSearch": {"queries": "q", "input": "$embedding",
                            "id": "vec_id", "k": 3, "nlist": 4}}], ctx
    )(emb)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "corpus_id", "score", "rank"}


def test_ann_ivf_empty_corpus_id_type_follows_corpus(spark):
    """ADVICE r1: the empty result's corpus_id must take the CORPUS id
    type (string here), not the query table's (long) — a type flip breaks
    downstream unions with non-empty results."""
    emb = spark.createDataFrame([], "vec_id string, embedding array<double>")
    q = spark.createDataFrame([(1, [1.0, 0.0])],
                              "query_id long, embedding array<double>")
    ctx = Context(spark=spark, collections={"q": q})
    out = compile_pipeline(
        [{"$annIvfSearch": {"queries": "q", "input": "$embedding",
                            "id": "vec_id", "k": 3, "nlist": 4}}], ctx
    )(emb)
    assert out.count() == 0
    assert dict(out.dtypes)["corpus_id"] == "string"


def _knn_brute(vecs, left_ids, k, exclude_self):
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    out = {}
    for li in left_ids:
        scored = [
            (cos(vecs[li], vecs[ri]), ri)
            for ri in vecs
            if not (exclude_self and ri == li)
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        out[li] = [ri for _, ri in scored[:k]]
    return out


def test_knn_join_exact_bits0_matches_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 40
    )
    ctx = Context(spark=spark)
    got = compile_pipeline(
        [{"$knnJoin": {"input": "$embedding", "id": "vec_id", "k": 3,
                       "bits": 0}}],
        ctx,
    )(emb).collect()
    vecs = {r["vec_id"]: list(r["embedding"])
            for r in emb.select("vec_id", "embedding").collect()}
    expect = _knn_brute(vecs, list(vecs), 3, exclude_self=True)
    by_left = {}
    for r in sorted(got, key=lambda r: (r["left_id"], r["rank"])):
        by_left.setdefault(r["left_id"], []).append(r["right_id"])
    assert by_left == expect


def test_knn_join_lsh_self_bucket_and_determinism(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    left = emb.filter(F.col("vec_id") < 20)
    ctx = Context(spark=spark, collections={"corpus": emb})
    run = compile_pipeline(
        [{"$knnJoin": {"from": "corpus", "input": "$embedding",
                       "id": "vec_id", "k": 5, "bits": 6, "dim": 64,
                       "probes": 3}}],
        ctx,
    )
    got = run(left).collect()
    # every left vector is in the corpus and shares its own bucket:
    # rank 1 must be itself at cosine 1 (excludeSelf defaults false when
    # `from` is given)
    top = {r["left_id"]: (r["right_id"], round(r["score"], 6))
           for r in got if r["rank"] == 1}
    assert top == {i: (i, 1.0) for i in range(20)}
    again = run(left).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
