"""dp_stats family: $cohenKappa, $fleissKappa, $corpusDivergence,
$distinctN, $zipfFit, $bradleyTerry — every expected value below is
hand-computed from the published formulas (Cohen 1960/1968, Fleiss
1971, Lin 1991, Li et al. 2016, Zipf/weighted-OLS, Bradley & Terry 1952
via Hunter 2004 MM).
"""

import math

import pytest

from pincette_mongo_streams_spark import Context, compile_pipeline


def _one(spark, rows, schema, pipeline):
    df = spark.createDataFrame(rows, schema)
    return compile_pipeline(pipeline, Context(spark=spark))(df).collect()


# ------------------------------------------------------------ Cohen


def test_cohen_kappa_textbook(spark):
    """The classic 2x2 table (20 yy / 5 yn / 10 ny / 15 nn):
    po=0.7, pe=0.5, kappa=0.4."""
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    (o,) = _one(spark, rows, "a string, b string",
                [{"$cohenKappa": {"a": "$a", "b": "$b"}}])
    assert o["n"] == 50
    assert abs(o["po"] - 0.7) < 1e-12
    assert abs(o["pe"] - 0.5) < 1e-12
    assert abs(o["kappa"] - 0.4) < 1e-12


def test_cohen_kappa_null_rows_excluded(spark):
    rows = [("y", "y"), ("y", None), (None, "n"), ("n", "n")]
    (o,) = _one(spark, rows, "a string, b string",
                [{"$cohenKappa": {"a": "$a", "b": "$b"}}])
    assert o["n"] == 2 and abs(o["kappa"] - 1.0) < 1e-12


def test_cohen_kappa_weighted(spark):
    """Quadratic weights, labels {1,2}: A=[1,2], B=[2,2] ->
    observed disagreement .5, expected .5, kappa 0.  Linear on a
    3-level case hand-computed."""
    (o,) = _one(spark, [(1, 2), (2, 2)], "a int, b int",
                [{"$cohenKappa": {"a": "$a", "b": "$b",
                                  "weights": "quadratic"}}])
    assert abs(o["po"] - 0.5) < 1e-12
    assert abs(o["pe"] - 0.5) < 1e-12
    assert abs(o["kappa"] - 0.0) < 1e-12
    # linear: A=[1,2,3], B=[1,3,3]; obs dis = (0+1+0)/3
    # marg a: {1:1,2:1,3:1}, b: {1:1,3:2}
    # exp dis = sum ca*cb*|i-j|/9 = (1*1*0 + 1*2*2 + 1*1*1 + 1*2*1
    #            + 1*1*2 + 1*2*0)/9 = 9/9 = 1... recompute in code:
    exp_dis = sum(ca * cb * abs(i - j)
                  for i, ca in {1: 1, 2: 1, 3: 1}.items()
                  for j, cb in {1: 1, 3: 2}.items()) / 9.0
    obs_dis = 1.0 / 3.0
    po, pe = 1 - obs_dis, 1 - exp_dis
    (o,) = _one(spark, [(1, 1), (2, 3), (3, 3)], "a int, b int",
                [{"$cohenKappa": {"a": "$a", "b": "$b",
                                  "weights": "linear"}}])
    assert abs(o["po"] - po) < 1e-12
    assert abs(o["pe"] - pe) < 1e-12
    assert abs(o["kappa"] - (po - pe) / (1 - pe)) < 1e-12


def test_cohen_kappa_degenerate_single_label(spark):
    """Both raters always say the same single label: pe=1, po=1 ->
    kappa defined as 1 (perfect agreement, zero variance)."""
    (o,) = _one(spark, [("y", "y")] * 4, "a string, b string",
                [{"$cohenKappa": {"a": "$a", "b": "$b"}}])
    assert o["kappa"] == 1.0


def test_cohen_kappa_options(spark):
    with pytest.raises(ValueError, match="weights"):
        compile_pipeline(
            [{"$cohenKappa": {"a": "$a", "b": "$b", "weights": "cubic"}}],
            Context(spark=spark))


# ------------------------------------------------------------ Fleiss


def test_fleiss_kappa_hand(spark):
    """3 items x 2 raters: (a,a), (a,b), (b,b) -> P_bar=2/3, p_e=1/2,
    kappa=1/3."""
    rows = [("i1", "a"), ("i1", "a"), ("i2", "a"), ("i2", "b"),
            ("i3", "b"), ("i3", "b")]
    (o,) = _one(spark, rows, "item string, r string",
                [{"$fleissKappa": {"item": "$item", "rating": "$r"}}])
    assert o["items"] == 3 and o["raters"] == 2
    assert abs(o["p_bar"] - 2 / 3) < 1e-12
    assert abs(o["p_e"] - 0.5) < 1e-12
    assert abs(o["kappa"] - 1 / 3) < 1e-12


def test_fleiss_kappa_unbalanced_raises(spark):
    rows = [("i1", "a"), ("i1", "a"), ("i2", "a")]
    with pytest.raises(Exception, match="same number of ratings"):
        _one(spark, rows, "item string, r string",
             [{"$fleissKappa": {"item": "$item", "rating": "$r"}}])


# -------------------------------------------------------- divergence


def test_corpus_divergence_hand(spark):
    """P = 'a a b', Q = 'a b b b', add-1 over union vocab {a,b}+unseen:
    every output checked against the closed-form sums in bits."""
    p = spark.createDataFrame([("a a b",)], "text string")
    q = spark.createDataFrame([("a b b b",)], "text string")
    ctx = Context(spark=spark, collections={"ref": q})
    (o,) = compile_pipeline(
        [{"$corpusDivergence": {"input": "$text", "against": "ref"}}],
        ctx)(p).collect()
    pp = {"a": 3 / 6, "b": 2 / 6, None: 1 / 6}
    qq = {"a": 2 / 7, "b": 4 / 7, None: 1 / 7}
    kl = sum(pp[g] * math.log2(pp[g] / qq[g]) for g in pp)
    klq = sum(qq[g] * math.log2(qq[g] / pp[g]) for g in pp)
    jsd = sum(
        0.5 * pp[g] * math.log2(pp[g] / ((pp[g] + qq[g]) / 2))
        + 0.5 * qq[g] * math.log2(qq[g] / ((pp[g] + qq[g]) / 2))
        for g in pp)
    ce = sum(-pp[g] * math.log2(qq[g]) for g in pp)
    assert abs(o["kl_pq"] - kl) < 1e-12
    assert abs(o["kl_qp"] - klq) < 1e-12
    assert abs(o["jsd"] - jsd) < 1e-12
    assert abs(o["cross_entropy"] - ce) < 1e-12
    assert o["vocab_p"] == 2 and o["vocab_q"] == 2
    assert abs(o["vocab_jaccard"] - 1.0) < 1e-12
    assert o["tokens_p"] == 3 and o["tokens_q"] == 4


def test_corpus_divergence_identical_is_zero(spark):
    p = spark.createDataFrame([("x y z",), ("x x",)], "text string")
    ctx = Context(spark=spark, collections={"ref": p})
    (o,) = compile_pipeline(
        [{"$corpusDivergence": {"input": "$text", "against": "ref"}}],
        ctx)(p).collect()
    assert abs(o["kl_pq"]) < 1e-12 and abs(o["jsd"]) < 1e-12
    assert o["vocab_jaccard"] == 1.0


def test_corpus_divergence_bigrams_and_options(spark):
    p = spark.createDataFrame([("a b c",)], "text string")
    q = spark.createDataFrame([("a b",)], "text string")
    ctx = Context(spark=spark, collections={"ref": q})
    (o,) = compile_pipeline(
        [{"$corpusDivergence": {"input": "$text", "against": "ref",
                                "n": 2}}], ctx)(p).collect()
    # P bigrams {ab, bc}, Q {ab}: union 2, jaccard 1/2
    assert o["vocab_p"] == 2 and o["vocab_q"] == 1
    assert abs(o["vocab_jaccard"] - 0.5) < 1e-12
    for bad in ({"n": 0}, {"k": 0}, {"tokenizer": "nope"},
                {"maxWords": 0}):
        with pytest.raises(ValueError):
            compile_pipeline(
                [{"$corpusDivergence": {"input": "$text",
                                        "against": "ref", **bad}}], ctx)


# --------------------------------------------------------- diversity


def test_distinct_n_hand(spark):
    rows = [("a b a",), ("b c",), (None,)]
    (o,) = _one(spark, rows, "text string",
                [{"$distinctN": {"input": "$text", "maxN": 2}}])
    assert o["docs"] == 3 and o["tokens"] == 5
    assert abs(o["distinct_1"] - 3 / 5) < 1e-12
    # bigrams: "a b","b a","b c" -> 3 distinct / 3 total
    assert abs(o["distinct_2"] - 1.0) < 1e-12


def test_distinct_n_empty_corpus(spark):
    (o,) = _one(spark, [(None,)], "text string",
                [{"$distinctN": {"input": "$text"}}])
    assert o["docs"] == 1 and o["tokens"] == 0
    assert o["distinct_1"] is None


# -------------------------------------------------------------- zipf


def test_zipf_fit_hand(spark):
    """freqs a:4 b:2 c:2 d:1 -> classes (4,1) (2,2) (1,1) with midpoint
    ranks 1 / 2.5 / 4; weighted OLS of ln f on ln r recomputed here."""
    (o,) = _one(spark, [("a a a a b b c c d",)], "text string",
                [{"$zipfFit": {"input": "$text"}}])
    pts = [(math.log(1), math.log(4), 1.0),
           (math.log(2.5), math.log(2), 2.0),
           (math.log(4), math.log(1), 1.0)]
    W = sum(m for _, _, m in pts)
    Sx = sum(m * x for x, _, m in pts)
    Sy = sum(m * y for _, y, m in pts)
    Sxx = sum(m * x * x for x, _, m in pts)
    Syy = sum(m * y * y for _, y, m in pts)
    Sxy = sum(m * x * y for x, y, m in pts)
    vxy, vxx, vyy = Sxy - Sx * Sy / W, Sxx - Sx * Sx / W, Syy - Sy * Sy / W
    slope = vxy / vxx
    assert abs(o["slope"] - slope) < 1e-12
    assert abs(o["intercept"] - (Sy - slope * Sx) / W) < 1e-12
    assert abs(o["r2"] - vxy * vxy / (vxx * vyy)) < 1e-12
    assert o["vocab"] == 4 and o["tokens"] == 9
    assert o["distinct_freqs"] == 3


def test_zipf_fit_degenerate_single_class(spark):
    """Every word same frequency -> one class, slope undefined."""
    (o,) = _one(spark, [("a b c",)], "text string",
                [{"$zipfFit": {"input": "$text"}}])
    assert o["slope"] is None and o["r2"] is None
    assert o["vocab"] == 3 and o["distinct_freqs"] == 1


def test_zipf_fit_min_count(spark):
    (o,) = _one(spark, [("a a a b",)], "text string",
                [{"$zipfFit": {"input": "$text", "minCount": 2}}])
    assert o["vocab"] == 1 and o["tokens"] == 3


# ------------------------------------------------------ bradley-terry


def _bt(spark, rows, iterations=8):
    out = _one(spark, rows, "w string, l string",
               [{"$bradleyTerry": {"winner": "$w", "loser": "$l",
                                   "iterations": iterations}}])
    return {r["player"]: r for r in out}


def test_bradley_terry_two_player_closed_form(spark):
    """A beats B twice, B beats A once: the MLE is pi_A/pi_B = 2 ->
    (2/3, 1/3) normalized; the 2-player MM converges in one round."""
    d = _bt(spark, [("A", "B"), ("A", "B"), ("B", "A")])
    assert abs(d["A"]["strength"] - 2 / 3) < 1e-9
    assert abs(d["B"]["strength"] - 1 / 3) < 1e-9
    assert d["A"]["wins"] == 2 and d["A"]["games"] == 3
    assert d["B"]["wins"] == 1 and d["B"]["games"] == 3


def test_bradley_terry_cycle_symmetric(spark):
    """Rock-paper-scissors: symmetry forces uniform strengths."""
    d = _bt(spark, [("A", "B"), ("B", "C"), ("C", "A")])
    for p in "ABC":
        assert abs(d[p]["strength"] - 1 / 3) < 1e-9


def test_bradley_terry_transitive_order(spark):
    """A dominant over B dominant over C: strengths must order
    A > B > C, and zero-win C tends toward 0."""
    rows = ([("A", "B")] * 3 + [("B", "A")] * 1
            + [("B", "C")] * 3 + [("C", "B")] * 1
            + [("A", "C")] * 4)
    d = _bt(spark, rows)
    assert d["A"]["strength"] > d["B"]["strength"] > d["C"]["strength"]
    s = sum(v["strength"] for v in d.values())
    assert abs(s - 1.0) < 1e-9


def test_bradley_terry_self_and_null_pairs_dropped(spark):
    d = _bt(spark, [("A", "B"), ("A", "A"), (None, "B"), ("B", None),
                    ("B", "A")])
    assert d["A"]["games"] == 2 and d["A"]["wins"] == 1


def test_bradley_terry_options(spark):
    with pytest.raises(ValueError, match="iterations"):
        compile_pipeline(
            [{"$bradleyTerry": {"winner": "$w", "loser": "$l",
                                "iterations": 0}}],
            Context(spark=spark))


# ------------------------------------------------------ plan honesty


def test_stats_plans_pure_jvm(spark):
    """No Python eval nodes anywhere in the family (module contract)."""
    p = spark.createDataFrame([("a b", "x", "y", 1, 2)],
                              "text string, w string, l string, a int, b int")
    q = spark.createDataFrame([("a b",)], "text string")
    ctx = Context(spark=spark, collections={"ref": q})
    pipes = [
        [{"$cohenKappa": {"a": "$a", "b": "$b"}}],
        [{"$corpusDivergence": {"input": "$text", "against": "ref"}}],
        [{"$distinctN": {"input": "$text"}}],
        [{"$zipfFit": {"input": "$text"}}],
    ]
    for pipe in pipes:
        df = compile_pipeline(pipe, ctx)(p)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython",
                       "MapInPandas"):
            assert marker not in plan, (pipe, marker)


# ------------------------------------------------------ krippendorff


def test_krippendorff_nominal_hand(spark):
    """u1=[a,a], u2=[a,b], u3=[b,b]: D_o=1/3, D_e=0.6, alpha=4/9."""
    rows = [("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "b"),
            ("u3", "b"), ("u3", "b")]
    (o,) = _one(spark, rows, "u string, v string",
                [{"$krippendorffAlpha": {"item": "$u", "value": "$v"}}])
    assert o["units"] == 3 and o["n"] == 6
    assert abs(o["d_o"] - 1 / 3) < 1e-12
    assert abs(o["d_e"] - 0.6) < 1e-12
    assert abs(o["alpha"] - 4 / 9) < 1e-12


def test_krippendorff_interval_hand(spark):
    """u1=[1,2], u2=[3,3]: D_o=0.5, D_e=11/6, alpha=8/11."""
    rows = [("u1", 1.0), ("u1", 2.0), ("u2", 3.0), ("u2", 3.0)]
    (o,) = _one(spark, rows, "u string, v double",
                [{"$krippendorffAlpha": {"item": "$u", "value": "$v",
                                         "metric": "interval"}}])
    assert o["units"] == 2 and o["n"] == 4
    assert abs(o["d_o"] - 0.5) < 1e-12
    assert abs(o["d_e"] - 11 / 6) < 1e-12
    assert abs(o["alpha"] - 8 / 11) < 1e-12


def test_krippendorff_singleton_units_excluded(spark):
    """A unit with one rating is unpairable and must not contribute."""
    rows = [("u1", "a"), ("u1", "a"), ("u2", "b")]
    (o,) = _one(spark, rows, "u string, v string",
                [{"$krippendorffAlpha": {"item": "$u", "value": "$v"}}])
    assert o["units"] == 1 and o["n"] == 2
    # single eligible unit, perfect agreement, all-same category ->
    # D_e = 0 with D_o = 0 -> alpha = 1
    assert o["alpha"] == 1.0


def test_krippendorff_perfect_agreement(spark):
    rows = [("u1", "a"), ("u1", "a"), ("u2", "b"), ("u2", "b")]
    (o,) = _one(spark, rows, "u string, v string",
                [{"$krippendorffAlpha": {"item": "$u", "value": "$v"}}])
    assert o["alpha"] == 1.0


def test_krippendorff_options(spark):
    with pytest.raises(ValueError, match="metric"):
        compile_pipeline(
            [{"$krippendorffAlpha": {"item": "$u", "value": "$v",
                                     "metric": "ordinal"}}],
            Context(spark=spark))


# --------------------------------------------------- KS / chi-square


def _ks_p(d, np_, nq_):
    import math as m

    ne = np_ * nq_ / (np_ + nq_)
    lam = (m.sqrt(ne) + 0.12 + 0.11 / m.sqrt(ne)) * d
    if lam < 0.04:
        return 1.0
    s = sum((-1) ** (j - 1) * m.exp(-2 * j * j * lam * lam)
            for j in range(1, 101))
    return min(max(2 * s, 0.0), 1.0)


def test_ks_test_hand(spark):
    """P=[1,2,3], Q=[2,3,4]: D = 1/3 at every value below 4."""
    p = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    q = spark.createDataFrame([(2.0,), (3.0,), (4.0,)], "v double")
    ctx = Context(spark=spark, collections={"ref": q})
    (o,) = compile_pipeline(
        [{"$ksTest": {"input": "$v", "against": "ref"}}],
        ctx)(p).collect()
    assert o["n_p"] == 3 and o["n_q"] == 3
    assert abs(o["d_stat"] - 1 / 3) < 1e-12
    assert abs(o["p_value"] - _ks_p(1 / 3, 3, 3)) < 1e-12


def test_ks_test_identical_zero(spark):
    p = spark.createDataFrame([(float(i % 7),) for i in range(50)],
                              "v double")
    ctx = Context(spark=spark, collections={"ref": p})
    (o,) = compile_pipeline(
        [{"$ksTest": {"input": "$v", "against": "ref"}}],
        ctx)(p).collect()
    assert o["d_stat"] == 0.0 and o["p_value"] == 1.0


def test_ks_test_binned(spark):
    """Binned mode quantizes into equal-width buckets; identical data
    still reads D=0, and bins is validated."""
    p = spark.createDataFrame([(float(i),) for i in range(100)],
                              "v double")
    ctx = Context(spark=spark, collections={"ref": p})
    (o,) = compile_pipeline(
        [{"$ksTest": {"input": "$v", "against": "ref", "bins": 10}}],
        ctx)(p).collect()
    assert o["d_stat"] == 0.0
    with pytest.raises(ValueError, match="bins"):
        compile_pipeline(
            [{"$ksTest": {"input": "$v", "against": "ref", "bins": 1}}],
            ctx)


def test_chi_square_hand(spark):
    """P: a x10 / b x10, Q: a x5 / b x15 -> chi2 = 8/3, df 1,
    cramers_v = sqrt(chi2/40); p via the same Wilson-Hilferty + A&S
    erf transcription."""
    import math as m

    p = spark.createDataFrame([("a",)] * 10 + [("b",)] * 10,
                              "v string")
    q = spark.createDataFrame([("a",)] * 5 + [("b",)] * 15, "v string")
    ctx = Context(spark=spark, collections={"ref": q})
    (o,) = compile_pipeline(
        [{"$chiSquareTest": {"input": "$v", "against": "ref"}}],
        ctx)(p).collect()
    chi2 = 8 / 3
    assert o["categories"] == 2 and o["df"] == 1
    assert abs(o["chi2"] - chi2) < 1e-12
    assert abs(o["cramers_v"] - m.sqrt(chi2 / 40)) < 1e-12

    def erf(x):
        sign = -1.0 if x < 0 else 1.0
        ax = abs(x)
        t = 1.0 / (1.0 + 0.3275911 * ax)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        return sign * (1.0 - poly * m.exp(-ax * ax))

    z = ((chi2 / 1) ** (1 / 3) - (1 - 2 / 9)) / m.sqrt(2 / 9)
    exp_p = 0.5 * (1 - erf(z / m.sqrt(2)))
    assert abs(o["p_value"] - exp_p) < 1e-9
    # sanity: the WH approximation sits near the true chi2(1) sf 0.1025
    assert 0.08 < o["p_value"] < 0.13


def test_chi_square_identical_distributions(spark):
    p = spark.createDataFrame([("a",)] * 6 + [("b",)] * 4, "v string")
    ctx = Context(spark=spark, collections={"ref": p})
    (o,) = compile_pipeline(
        [{"$chiSquareTest": {"input": "$v", "against": "ref"}}],
        ctx)(p).collect()
    assert o["chi2"] == 0.0 and o["p_value"] > 0.9
