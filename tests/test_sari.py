"""$sari — Xu et al. 2016 paper equations (multiset counts, fractional
multi-reference counts, deletion precision only, mean over n=1..maxN).
The reference implementation below is a direct transcription of the
paper's equations; the engine must agree EXACTLY.
"""

import random
from collections import Counter

import pytest

from pincette_mongo_streams_spark import Context, compile_pipeline


def _grams(ws, n):
    return Counter(
        " ".join(ws[i:i + n]) for i in range(len(ws) - n + 1))


def _sari_ref(src, cand, refs, max_n=4):
    ws, wc = src.lower().split(), cand.lower().split()
    wrs = [r.lower().split() for r in refs]
    R = len(wrs)
    fa = fk = pd = 0.0
    for n in range(1, max_n + 1):
        gs, gc = _grams(ws, n), _grams(wc, n)
        gr = Counter()
        for wr in wrs:
            gr.update(_grams(wr, n))
        rr = {g: c / R for g, c in gr.items()}
        support = set(gc) | set(gs) | set(rr)
        an = adp = adr = kn = kdp = kdr = dn = ddp = 0.0
        for g in support:
            cs, ss, r = gc.get(g, 0), gs.get(g, 0), rr.get(g, 0.0)
            an += min(max(cs - ss, 0), r)
            adp += max(cs - ss, 0)
            adr += max(r - ss, 0)
            kn += min(min(cs, ss), min(ss, r))
            kdp += min(cs, ss)
            kdr += min(ss, r)
            dn += min(max(ss - cs, 0), max(ss - r, 0))
            ddp += max(ss - cs, 0)
        p_add = an / adp if adp else 0.0
        r_add = an / adr if adr else 0.0
        f_add = (2 * p_add * r_add / (p_add + r_add)
                 if p_add + r_add else 0.0)
        p_keep = kn / kdp if kdp else 0.0
        r_keep = kn / kdr if kdr else 0.0
        f_keep = (2 * p_keep * r_keep / (p_keep + r_keep)
                  if p_keep + r_keep else 0.0)
        p_del = dn / ddp if ddp else 0.0
        fa += f_add / max_n
        fk += f_keep / max_n
        pd += p_del / max_n
    return ((fa + fk + pd) / 3.0, fa, fk, pd)


def _run(spark, rows, **opts):
    df = spark.createDataFrame(rows, ["i", "s", "c", "rs"])
    out = compile_pipeline(
        [{"$sari": {"source": "$s", "candidate": "$c",
                    "references": "$rs", "as": "x", **opts}}],
        Context(spark=spark))(df)
    return {r["i"]: r["x"] for r in out.collect()}


def test_sari_hand_derived(spark):
    """Fully hand-derived small case: src 'a b c', cand 'a b d',
    ref ['a b d'] -> F_add=.75, F_keep=.5, P_del=.75, SARI=2/3."""
    got = _run(spark, [(1, "a b c", "a b d", ["a b d"])])
    s = got[1]
    assert abs(s["add"] - 0.75) < 1e-12
    assert abs(s["keep"] - 0.5) < 1e-12
    assert abs(s["del"] - 0.75) < 1e-12
    assert abs(s["sari"] - 2 / 3) < 1e-12


def test_sari_identity_is_one_third(spark):
    """candidate == source == reference: keep is perfect, add/del have
    empty supports -> SARI = 1/3 exactly (a known SARI property; the
    metric deliberately does not reward copying)."""
    t = "a b c d"
    got = _run(spark, [(1, t, t, [t])])
    assert abs(got[1]["sari"] - 1 / 3) < 1e-12
    assert got[1]["keep"] == 1.0 and got[1]["add"] == 0.0


def test_sari_fractional_multi_reference(spark):
    """src 'a', cand 'b', refs ['b','c']: fractional counts r(b)=0.5 ->
    F_add=0.125, P_del=0.25, SARI=0.125 (hand-derived)."""
    got = _run(spark, [(1, "a", "b", ["b", "c"])])
    s = got[1]
    assert abs(s["add"] - 0.125) < 1e-12
    assert s["keep"] == 0.0
    assert abs(s["del"] - 0.25) < 1e-12
    assert abs(s["sari"] - 0.125) < 1e-12


def test_sari_paper_example_differential(spark):
    """The paper's running example + randomized differential vs the
    transcribed equations."""
    src = "About 95 species are currently accepted"
    rows = [
        (0, src, "About 95 species are currently known",
         ["About 95 species are currently known",
          "About 95 species are now accepted",
          "95 species are now accepted"]),
        (1, src, "About 95 you now get in",
         ["About 95 species are currently known",
          "About 95 species are now accepted",
          "95 species are now accepted"]),
    ]
    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "e"]
    for i in range(2, 40):
        mk = lambda: " ".join(  # noqa: E731
            rng.choices(vocab, k=rng.randint(1, 10)))
        rows.append((i, mk(), mk(),
                     [mk() for _ in range(rng.randint(1, 3))]))
    got = _run(spark, rows)
    for i, s, c, rs in rows:
        exp = _sari_ref(s, c, rs)
        o = got[i]
        for k, v in zip(("sari", "add", "keep", "del"), exp):
            assert abs(o[k] - v) < 1e-12, (i, k, s, c, rs)


def test_sari_single_reference_and_case(spark):
    df = spark.createDataFrame(
        [(1, "A b", "a B", "a b")], ["i", "s", "c", "r"])
    out = compile_pipeline(
        [{"$sari": {"source": "$s", "candidate": "$c",
                    "reference": "$r", "as": "x"}}],
        Context(spark=spark))(df).collect()[0]["x"]
    # case-folded: identical 2-token text -> keep=1 for n=1..2 and
    # empty supports for n=3..4 -> F_keep=0.5, SARI=1/6
    assert abs(out["sari"] - 1 / 6) < 1e-12
    out2 = compile_pipeline(
        [{"$sari": {"source": "$s", "candidate": "$c",
                    "reference": "$r", "as": "x",
                    "caseSensitive": True}}],
        Context(spark=spark))(df).collect()[0]["x"]
    assert out2["sari"] != out["sari"]


def test_sari_nulls_and_options(spark):
    got = _run(spark, [(1, None, "a", ["a"]), (2, "a", None, ["a"]),
                       (3, "a", "a", [])])
    assert got[1] is None and got[2] is None and got[3] is None
    ctx = Context(spark=spark)
    for bad in ({"maxN": 0}, {"maxN": 9}, {"maxWords": 0}):
        with pytest.raises(ValueError):
            compile_pipeline(
                [{"$sari": {"source": "$s", "candidate": "$c",
                            "reference": "$r", **bad}}], ctx)
    with pytest.raises(ValueError, match="exactly one"):
        compile_pipeline(
            [{"$sari": {"source": "$s", "candidate": "$c"}}], ctx)


def test_sari_plan_pure_jvm(spark):
    df = spark.createDataFrame([(1, "a", "b", ["c"])],
                               ["i", "s", "c", "rs"])
    out = compile_pipeline(
        [{"$sari": {"source": "$s", "candidate": "$c",
                    "references": "$rs"}}],
        Context(spark=spark))(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
