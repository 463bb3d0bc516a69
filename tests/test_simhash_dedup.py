"""$simhashDedup (functions/datapipe.py): pigeonhole-band candidate
generation + exact popcount verification, pinned against a brute-force
Hamming dedup in the driver."""

import hashlib

from pyspark.sql import functions as F

from pincette_mongo_streams_spark import Context, compile_pipeline


def _ref_simhash(text, n, bits):
    words = [w for w in text.lower().split() if w]
    shingles = list(dict.fromkeys(
        " ".join(words[i:i + n]) for i in range(max(0, len(words) - n + 1))
    ))
    hs = [int(hashlib.md5(f"0:{s}".encode()).hexdigest()[:15], 16)
          for s in shingles]
    v = 0
    for j in range(bits):
        if 2 * sum((h >> j) & 1 for h in hs) > len(hs):
            v |= 1 << j
    return v


def _ref_dedup(docs, n, bits, max_h):
    """Brute-force mirror of the (member, bucket-keeper) semantics."""
    sigs = {i: _ref_simhash(t, n, bits) for i, t in docs.items()}
    nb = max_h + 1
    base_w, extra = divmod(bits, nb)
    bands, start = [], 0
    for i in range(nb):
        w = base_w + (1 if i < extra else 0)
        bands.append((start, w))
        start += w
    buckets = {}
    for i, h in sigs.items():
        for bi, (s, w) in enumerate(bands):
            buckets.setdefault((bi, (h >> s) & ((1 << w) - 1)), []).append(i)
    dups = set()
    for members in buckets.values():
        keep = min(members)
        for m in members:
            if m != keep and bin(sigs[m] ^ sigs[keep]).count("1") <= max_h:
                dups.add(m)
    return set(docs) - dups


def test_simhash_dedup_matches_reference(spark, sf_dir):
    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ctx = Context(spark=spark)
    out = compile_pipeline(
        [{"$simhashDedup": {"input": "$text", "id": "doc_id", "shingle": 1,
                            "bits": 16, "maxHamming": 3}},
         {"$project": {"doc_id": 1}}],
        ctx,
    )(docs_df).collect()
    got = {r["doc_id"] for r in out}
    docs = {r["doc_id"]: r["text"]
            for r in docs_df.select("doc_id", "text").collect()}
    expect = _ref_dedup(docs, 1, 16, 3)
    assert got == expect
    # sanity: near-dups exist at bits=16 on this corpus, so some docs drop
    assert len(got) < len(docs)


def test_simhash_dedup_identical_docs_collapse(spark):
    docs = spark.createDataFrame(
        [(1, "same words here"), (2, "same words here"),
         (3, "entirely other content")],
        "doc_id long, text string",
    )
    out = compile_pipeline(
        [{"$simhashDedup": {"input": "$text", "id": "doc_id", "shingle": 1,
                            "bits": 32, "maxHamming": 2}}],
        Context(spark=spark),
    )(docs).collect()
    assert {r["doc_id"] for r in out} == {1, 3}


def test_simhash_dedup_transitive(spark, sf_dir):
    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ctx = Context(spark=spark)

    def run(t):
        return {
            r["doc_id"]
            for r in compile_pipeline(
                [{"$simhashDedup": {"input": "$text", "id": "doc_id",
                                    "shingle": 1, "bits": 16,
                                    "maxHamming": 4, "transitive": t}}],
                ctx,
            )(docs_df).collect()
        }

    assert run(True) <= run(False)


def test_simhash_bits_guard(spark):
    import pytest
    from pincette_mongo_streams_spark import Context, compile_pipeline

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for stage in ({"$simhash": {"input": "$text", "bits": 64}},
                  {"$simhashDedup": {"input": "$text", "id": "doc_id",
                                     "bits": 64}}):
        with pytest.raises(ValueError, match="60"):
            compile_pipeline([stage], Context(spark=spark))(df)
    # 60 is the documented maximum and works
    out = compile_pipeline(
        [{"$simhash": {"input": "$text", "bits": 60}}],
        Context(spark=spark))(df).collect()
    assert out[0]["simhash"] is not None


def test_simhash_packed_fold_reference(spark):
    """The r13 packed vote fold (7-bit groups, 9-bit counter fields,
    511-element chunking) must stay bit-identical to the per-bit naive
    fold for every input shape: short docs (direct branch), >511
    distinct shingles (chunked branch), empty text, and the 60-bit
    maximum (9 groups, width-4 tail group)."""
    def _engine_simhash(text, n, bits):
        # mirror of the engine's shingle semantics: Spark's
        # split('', '\\s+') keeps the one empty word, the test-file
        # reference above filters it — same fold either way
        import re as _re

        words = _re.split(r"\s+", text.lower())
        shingles = list(dict.fromkeys(
            " ".join(words[i:i + n])
            for i in range(max(0, len(words) - n + 1))))
        hs = [int(hashlib.md5(f"0:{s}".encode()).hexdigest()[:15], 16)
              for s in shingles]
        v = 0
        for j in range(bits):
            if 2 * sum((h >> j) & 1 for h in hs) > len(hs):
                v |= 1 << j
        return v

    long_doc = " ".join(f"w{i}" for i in range(1300))   # 1300 > 2*511
    edge_doc = " ".join(f"w{i}" for i in range(511))    # exactly the cap
    over_doc = " ".join(f"w{i}" for i in range(512))    # first chunked size
    docs = spark.createDataFrame(
        [(1, "a few short words"), (2, long_doc), (3, edge_doc),
         (4, over_doc), (5, ""), (6, "same same same word word")],
        "doc_id long, text string",
    )
    for bits in (16, 60):
        out = compile_pipeline(
            [{"$simhash": {"input": "$text", "as": "sh", "shingle": 1,
                           "bits": bits}},
             {"$project": {"doc_id": 1, "sh": 1}}],
            Context(spark=spark),
        )(docs).collect()
        got = {r["doc_id"]: r["sh"] for r in out}
        texts = {1: "a few short words", 2: long_doc, 3: edge_doc,
                 4: over_doc, 5: "", 6: "same same same word word"}
        for i, t in texts.items():
            assert got[i] == _engine_simhash(t, 1, bits), (i, bits)


def test_pigeonhole_band_property():
    """Pure property of the band split (no Spark): ANY two bits-wide
    values within Hamming distance maxHamming agree exactly on at least
    one of the maxHamming+1 bands — the guarantee that makes the bucket
    equi-join a complete candidate generator."""
    from hypothesis import given, settings, strategies as st

    bits, max_h = 16, 3
    nb = max_h + 1
    base_w, extra = divmod(bits, nb)
    bands, start = [], 0
    for i in range(nb):
        w = base_w + (1 if i < extra else 0)
        bands.append((start, w))
        start += w

    @settings(max_examples=300, deadline=None)
    @given(st.integers(0, 2**bits - 1),
           st.sets(st.integers(0, bits - 1), max_size=max_h))
    def check(sig, flips):
        other = sig
        for b in flips:
            other ^= 1 << b
        assert bin(sig ^ other).count("1") <= max_h
        shares = any(
            (sig >> s) & ((1 << w) - 1) == (other >> s) & ((1 << w) - 1)
            for s, w in bands
        )
        assert shares, (sig, other, flips)

    check()
