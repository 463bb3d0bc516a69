"""Eval-metric family: $ngramOverlap, $profile, $rougeL, $bleu,
$bleuCorpus, $chrf, $qaEval, $chrfCorpus, $wer, $werCorpus and the
shared clipped-overlap helpers.

Split out of functions/datapipe.py (r10); the import surface stays
``functions.datapipe`` — the aggregator re-exports every name.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..context import Context
from ..expressions import ExprContext, compile_expr
from ..pipeline import StageFn, register_stage
from .dp_dedup import _spread


@register_stage("$ngramOverlap")
def ngram_overlap_stage(expression: Any, ctx: Context) -> StageFn:
    """Clipped word-n-gram overlap between a candidate and a reference
    text IN THE SAME ROW — the row-local core of BLEU/ROUGE-style eval
    and contamination scoring: ``{candidate, reference, n?, maxWords?,
    as?}`` adds ``struct<n_cand, n_ref, n_match, precision, recall,
    f1>`` where ``n_match`` is the CLIPPED match count (per distinct
    gram, ``min(count_in_candidate, count_in_reference)`` — BLEU's
    modified precision numerator; ROUGE-N recall = the same numerator
    over the reference count).  precision/recall are 0.0 when their
    denominator is 0; f1 is their harmonic mean (0.0 when both are 0).
    Null in either text -> null struct.

    ``maxWords`` (default 2000, advisor r8) truncates BOTH texts first,
    the same cap discipline as ``$rougeL``: the clipped-match aggregate
    is O(d·(|c|+|r|)) per row, so one pathological document pair
    (say 10^5 words each) would cost ~10^9 comparisons in a single
    task — the cap is the honest bound, loudly documented rather than
    hidden.

    MULTI-REFERENCE (r9, Lin 2004 §4's ROUGE-N convention):
    ``references: <expr -> array<string>>`` scores the candidate
    against EACH reference and keeps the struct of the best f1 (ties ->
    the first reference in array order) — n_ref/n_match/precision/
    recall all come from that winning reference.  Null reference
    elements are dropped; a null or effectively-empty array -> null
    struct.  Exactly one of ``reference``/``references``; a 1-element
    array agrees exactly with the scalar form.

    100 TB shape: pure higher-order-function column program (split ->
    sliding-window grams -> aggregate over distinct grams) — row-local,
    zero shuffle, whole-stage codegen; O(d·(|c|+|r|)) per row where d
    is the distinct-gram count (x|refs| in multi-reference form, one
    fold over the reference array).  Compose per-n for multi-n BLEU."""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$ngramOverlap needs exactly one of reference | references")
    n = int(expression.get("n", 1))
    max_words = int(expression.get("maxWords", 2000))
    as_field = expression.get("as", "overlap")
    if n < 1:
        raise ValueError("$ngramOverlap n must be >= 1")
    if max_words < 1:
        raise ValueError("$ngramOverlap maxWords must be >= 1")

    _OV_T = ("struct<n_cand:bigint,n_ref:bigint,n_match:bigint,"
             "precision:double,recall:double,f1:double>")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            stage = df.withColumn(
                "__ngo_gc",
                _eval_grams(_eval_words(cand, max_words), n),
            ).withColumn(
                "__ngo_grs",
                F.transform(
                    F.filter(refs, lambda r: r.isNotNull()),
                    lambda r: _eval_grams(_eval_words(r, max_words), n)))
            gc, grs = F.col("__ngo_gc"), F.col("__ngo_grs")
            nc = F.size(gc).cast("long")

            def score_one(gr: Column) -> Column:
                m = F.aggregate(
                    F.array_distinct(gc), F.lit(0).cast("long"),
                    lambda acc, g: acc + F.least(
                        F.size(F.filter(gc, lambda x: x == g)),
                        F.size(F.filter(gr, lambda x: x == g)),
                    ).cast("long"))
                nr = F.size(gr).cast("long")
                p = F.when(nc > 0, m / nc.cast("double")) \
                    .otherwise(F.lit(0.0))
                r = F.when(nr > 0, m / nr.cast("double")) \
                    .otherwise(F.lit(0.0))
                f = F.when(p + r > 0, 2.0 * p * r / (p + r)) \
                    .otherwise(F.lit(0.0))
                return F.struct(
                    nc.alias("n_cand"), nr.alias("n_ref"),
                    m.alias("n_match"), p.alias("precision"),
                    r.alias("recall"), f.alias("f1"))

            # materialize per-reference structs FIRST (transform runs
            # score_one once per ref), THEN fold comparing fields — a
            # fold calling score_one directly would re-run the O(d·c)
            # clip aggregate per lambda mention (no CSE in HOF lambdas,
            # see _eval_clipped's contract).  Strict > keeps ties on
            # the FIRST reference in array order.
            stage = stage.withColumn(
                "__ngo_sc", F.transform(grs, score_one))
            best = F.aggregate(
                F.col("__ngo_sc"), F.lit(None).cast(_OV_T),
                lambda acc, s: F.when(
                    acc.isNull() | (s["f1"] > acc["f1"]), s,
                ).otherwise(acc))
            null_st = F.lit(None).cast(_OV_T)
            out = F.when(
                cand.isNull() | refs.isNull() | (F.size(grs) == 0),
                null_st).otherwise(best)
            return stage.withColumn(as_field, out) \
                .drop("__ngo_gc", "__ngo_grs", "__ngo_sc")
        ref = compile_expr(ref_e, sctx)
        # materialize grams and the clipped-match count as TEMP COLUMNS:
        # the struct below references each several times (precision,
        # recall and f1 all contain the match count), and inlining the
        # aggregate expression would make Catalyst evaluate the O(d·c)
        # HOF per reference — measured 10x+ on the oracle query.
        # CollapseProject keeps multiply-referenced non-cheap aliases
        # materialized, so each computes once per row.
        stage = df.withColumn(
            "__ngo_gc", _eval_grams(_eval_words(cand, max_words), n),
        ).withColumn(
            "__ngo_gr", _eval_grams(_eval_words(ref, max_words), n))
        gc, gr = F.col("__ngo_gc"), F.col("__ngo_gr")
        stage = stage.withColumn(
            "__ngo_m", _eval_clipped(gc, gr),
        ).withColumn("__ngo_p", F.when(
            F.size(gc) > 0,
            F.col("__ngo_m") / F.size(gc).cast("long")).otherwise(F.lit(0.0))
        ).withColumn("__ngo_r", F.when(
            F.size(gr) > 0,
            F.col("__ngo_m") / F.size(gr).cast("long")).otherwise(F.lit(0.0)))
        prec, rec = F.col("__ngo_p"), F.col("__ngo_r")
        f1 = F.when(prec + rec > 0,
                    2.0 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
        st = F.struct(
            F.size(gc).cast("long").alias("n_cand"),
            F.size(gr).cast("long").alias("n_ref"),
            F.col("__ngo_m").alias("n_match"), prec.alias("precision"),
            rec.alias("recall"), f1.alias("f1"))
        null_st = F.lit(None).cast(
            "struct<n_cand:bigint,n_ref:bigint,n_match:bigint,"
            "precision:double,recall:double,f1:double>")
        return stage.withColumn(
            as_field,
            F.when(cand.isNull() | ref.isNull(), null_st).otherwise(st),
        ).drop("__ngo_gc", "__ngo_gr", "__ngo_m", "__ngo_p", "__ngo_r")

    return fn


def _tok13a(t: Column) -> Column:
    """mteval-v13a tokenization (sacrebleu's default BLEU tokenizer,
    public rules): strip ``<skipped>``, unwrap hyphen-newlines, unescape
    the four SGML entities, then pad punctuation with spaces — except
    ``.``/``,`` between digits and ``-`` not preceded by a digit.  The
    character class is written with explicit hex ranges so Java (Spark),
    RE2 (DuckDB oracles) and Python (test references) agree — verified
    three-way this session."""
    t = F.regexp_replace(t, "<skipped>", "")
    t = F.regexp_replace(t, "-\n", "")
    t = F.regexp_replace(t, "\n", " ")
    t = F.regexp_replace(t, "&quot;", "\"")
    t = F.regexp_replace(t, "&amp;", "&")
    t = F.regexp_replace(t, "&lt;", "<")
    t = F.regexp_replace(t, "&gt;", ">")
    t = F.concat(F.lit(" "), t, F.lit(" "))
    t = F.regexp_replace(
        t, r"([\x7b-\x7e\x5b-\x60\x20-\x26\x28-\x2b\x3a-\x40\x2f])",
        " $1 ")
    t = F.regexp_replace(t, r"([^0-9])([\.,])", "$1 $2 ")
    t = F.regexp_replace(t, r"([\.,])([^0-9])", " $1 $2")
    t = F.regexp_replace(t, r"([0-9])(-)", "$1 $2 ")
    return t


def _tok_intl(t: Column) -> Column:
    """mteval-v14 INTERNATIONAL tokenization (sacrebleu's ``intl``
    tokenizer, public rules, r12): pad Unicode punctuation with spaces
    — except when adjacent to a digit on the relevant side — and pad
    every Unicode symbol; the caller's whitespace split normalizes.
    The three regexes apply IN ORDER like the reference implementation
    (rule 2 sees rule 1's output).  ``\\p{P}``/``\\p{S}``/``\\P{N}``
    are Unicode general-category classes that Java (Spark), RE2 (the
    DuckDB oracles) and Python's ``regex`` module all support."""
    t = F.regexp_replace(t, r"(\P{N})(\p{P})", "$1 $2 ")
    t = F.regexp_replace(t, r"(\p{P})(\P{N})", " $1 $2")
    t = F.regexp_replace(t, r"(\p{S})", " $1 ")
    return t


_TOKENIZERS = {"13a": _tok13a, "intl": _tok_intl}


def _check_tokenizer(stage: str, tokenizer: Any) -> Optional[str]:
    if tokenizer not in (None, "none", "13a", "intl"):
        raise ValueError(
            f"{stage} tokenizer must be 'none', '13a' or 'intl', "
            f"got {tokenizer!r}")
    return None if tokenizer == "none" else tokenizer


def _tok_fn(tokenizer: Optional[str]):
    """Tokenizer column transform for a validated tokenizer name."""
    return _TOKENIZERS.get(tokenizer, lambda r: r)


def _eval_words(t: Column, max_words: Optional[int] = None) -> Column:
    """Whitespace word split shared by the BLEU-family stages
    ($ngramOverlap / $bleu) — Java \\s semantics, empties dropped.
    ``max_words`` truncates the word array (the stages' per-row cost
    cap — see $rougeL's maxWords note)."""
    w = F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != F.lit(""))
    return w if max_words is None else F.slice(w, 1, max_words)


def _eval_grams(w: Column, n: int) -> Column:
    """Sliding word-n-gram windows (space-joined) over a word array."""
    if n == 1:
        return w
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def _eval_clipped(gc: Column, gr: Column) -> Column:
    """Clipped multiset intersection: per distinct candidate gram,
    min(count in candidate, count in reference) — BLEU's modified-
    precision numerator.  CALLERS MUST pass materialized temp COLUMNS,
    never inline expressions: HOFs re-evaluate captured array
    expressions per call (no CSE), and downstream struct fields
    referencing the result would each re-run it.

    r13: computed by a sort-merge fold — tag each gram with its side,
    sort the combined struct array, and count same-gram runs in ONE
    linear pass whose lambda touches only its own arguments (never a
    captured array).  The per-distinct-gram re-filter it replaces was
    O(distinct x (|gc|+|gr|)) per row — 36+ s for the chrF query at
    sf0.1 (6 char orders over 2000-char strips); this form is
    O(L log L).  Counts are exact integers, so scores are
    bit-identical.  Null semantics mirror the old least-skips-null
    fold: null gc -> null; null gr -> size(gc)."""
    merged = F.array_sort(F.concat(
        F.transform(gc, lambda g: F.struct(
            g.alias("g"), F.lit(1).alias("c"), F.lit(0).alias("r"))),
        F.transform(gr, lambda g: F.struct(
            g.alias("g"), F.lit(0).alias("c"), F.lit(1).alias("r"))),
    ))
    zero = F.lit(0).cast("long")
    fold = F.aggregate(
        merged,
        F.struct(F.lit(None).cast("string").alias("g"),
                 zero.alias("c"), zero.alias("r"), zero.alias("tot")),
        lambda acc, x: F.when(
            x["g"].eqNullSafe(acc["g"]),
            F.struct(acc["g"].alias("g"),
                     (acc["c"] + x["c"]).alias("c"),
                     (acc["r"] + x["r"]).alias("r"),
                     acc["tot"].alias("tot")),
        ).otherwise(F.struct(
            x["g"].alias("g"),
            x["c"].cast("long").alias("c"),
            x["r"].cast("long").alias("r"),
            (acc["tot"] + F.least(acc["c"], acc["r"])).alias("tot"))),
        lambda acc: acc["tot"] + F.least(acc["c"], acc["r"]))
    return (
        F.when(gc.isNull(), F.lit(None).cast("long"))
        .when(gr.isNull(), F.size(gc).cast("long"))
        .otherwise(fold)
    )


def _eval_clipped_multi(gc: Column, grs: Column) -> Column:
    """Multi-reference clipped intersection (Papineni 2002 §2.2): per
    distinct candidate gram, ``min(count in candidate, MAX count across
    references)`` — a gram is creditable up to the most any single
    reference supports it, never the sum.  ``grs`` is an array of gram
    arrays (one per reference).  Same materialized-temp-column contract
    as :func:`_eval_clipped`, same r13 sort-merge rewrite: entries are
    tagged (gram, ref-index) with -1 for the candidate side, and the
    fold tracks the current ref's run plus the running max across refs
    so ``min(c, max_j r_j)`` falls out of one linear pass."""
    merged = F.array_sort(F.concat(
        F.transform(gc, lambda g: F.struct(
            g.alias("g"), F.lit(-1).alias("j"))),
        F.flatten(F.transform(
            grs,
            lambda arr, j: F.transform(arr, lambda g: F.struct(
                g.alias("g"), j.alias("j"))))),
    ))
    zero = F.lit(0).cast("long")
    minus1 = F.lit(-1)
    fold = F.aggregate(
        merged,
        F.struct(F.lit(None).cast("string").alias("g"),
                 minus1.alias("j"), zero.alias("c"), zero.alias("cur"),
                 zero.alias("mx"), zero.alias("tot")),
        lambda acc, x: F.when(
            x["g"].eqNullSafe(acc["g"]),
            # same gram: candidate entries (j=-1) sort first, ref
            # entries follow grouped by ref index
            F.when(x["j"] == minus1, F.struct(
                acc["g"].alias("g"), acc["j"].alias("j"),
                (acc["c"] + 1).alias("c"), acc["cur"].alias("cur"),
                acc["mx"].alias("mx"), acc["tot"].alias("tot")))
            .when(x["j"] == acc["j"], F.struct(
                acc["g"].alias("g"), acc["j"].alias("j"),
                acc["c"].alias("c"), (acc["cur"] + 1).alias("cur"),
                acc["mx"].alias("mx"), acc["tot"].alias("tot")))
            .otherwise(F.struct(
                acc["g"].alias("g"), x["j"].alias("j"),
                acc["c"].alias("c"), F.lit(1).cast("long").alias("cur"),
                F.greatest(acc["mx"], acc["cur"]).alias("mx"),
                acc["tot"].alias("tot"))),
        ).otherwise(F.struct(
            x["g"].alias("g"), x["j"].alias("j"),
            F.when(x["j"] == minus1, F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("c"),
            F.when(x["j"] == minus1, F.lit(0)).otherwise(F.lit(1))
            .cast("long").alias("cur"),
            zero.alias("mx"),
            (acc["tot"] + F.least(
                acc["c"], F.greatest(acc["mx"], acc["cur"])))
            .alias("tot"))),
        lambda acc: acc["tot"] + F.least(
            acc["c"], F.greatest(acc["mx"], acc["cur"])))
    return (
        F.when(gc.isNull(), F.lit(None).cast("long"))
        .when(grs.isNull(), F.size(gc).cast("long"))
        .otherwise(fold)
    )


@register_stage("$profile")
def profile_stage(expression: Any, ctx: Context) -> StageFn:
    """One-pass data profiling: ``{columns: [...], percentiles?:
    [0.25, 0.5, 0.75], exact?: false, topK?: 0}`` -> one row PER COLUMN
    with ``(column, type, n_rows, n_null, n_distinct, min, max, mean,
    stddev, p<pct>..., min_str, max_str, min_len, max_len, avg_len,
    top)`` — the first thing a pipeline runs against a new 100 TB
    table.  r9 (carried r7 verdict item 5): besides numerics, STRING
    columns profile too (lexicographic min/max in ``min_str``/
    ``max_str``, character-length min/max/avg, optional ``topK`` most
    frequent values as ``array<struct<value,n>>`` ordered by count desc
    then value) and DATE/TIMESTAMP columns (null/distinct counts +
    ISO-rendered min/max in ``min_str``/``max_str``).  Fields that do
    not apply to a column's type are null; ``type`` says which reading
    applies.

    Spark-first shape: ALL statistics for ALL columns compute in ONE
    global aggregate (a single shuffle whose partial aggregation
    reduces every task to one row), then the stat row pivots to
    per-column rows with ``inline`` — no per-column passes, no driver
    collect.  ``topK`` is the one exception (off by default): each
    string column adds one partial-aggregated count-by-value, a
    TakeOrderedAndProject top-k, and a 1-row broadcast join back onto
    the stat row — the same pinned 1-row-join pattern as
    ``$decontaminate``, still fully declarative and scan-parallel.
    ``exact: false`` (default) uses ``approx_count_distinct`` (HLL) and
    ``percentile_approx`` — the 100 TB configuration; ``exact: true``
    uses exact distinct counts and interpolated percentiles (DuckDB
    ``quantile_cont`` semantics) for oracle-grade answers at test
    scale.

    CORPUS-ONLY (r9, carried r7 verdict item): the output claims to be
    a profile of the whole input — inside a foreachBatch re-entry it
    would silently profile ONE micro-batch and label it a corpus
    profile, the exact silent-wrong-answer class ``_corpus_only``
    exists for.  Rejected at submit time by the streaming runtime and
    per micro-batch here (defense in depth)."""
    cols = expression["columns"]
    pcts = expression.get("percentiles", [0.25, 0.5, 0.75])
    exact = bool(expression.get("exact", False))
    top_k = int(expression.get("topK", 0))
    if not cols or not isinstance(cols, list):
        raise ValueError("$profile needs a non-empty columns list")
    if len(set(cols)) != len(cols):
        raise ValueError("$profile columns must be distinct")
    if top_k < 0:
        raise ValueError("$profile topK must be >= 0")
    names = [f"p{int(round(p * 100))}" for p in pcts]
    if any(not 0 <= p <= 1 for p in pcts):
        raise ValueError("$profile percentiles must be in [0, 1]")
    if len(set(names)) != len(names):
        raise ValueError(
            f"$profile percentiles collide at integer-percent names: "
            f"{names} — use distinct hundredths")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _corpus_only

        _corpus_only("$profile", c)
        kinds: dict = {}
        for col in cols:
            if col not in df.columns:
                raise ValueError(f"$profile: no column {col!r}")
            dt = df.schema[col].dataType
            if isinstance(dt, T.NumericType):
                kinds[col] = "numeric"
            elif isinstance(dt, T.StringType):
                kinds[col] = "string"
            elif isinstance(dt, T.DateType):
                kinds[col] = "date"
            elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                kinds[col] = "timestamp"
            elif isinstance(dt, T.ArrayType) \
                    and isinstance(dt.elementType, T.NumericType):
                # r11: embedding columns — the numeric stat fields
                # describe the L2 NORM distribution, the *_len fields
                # the DIMENSION (reusing the fixed output schema)
                kinds[col] = "vector"
            else:
                raise ValueError(
                    f"$profile: {col!r} is {dt.simpleString()} — "
                    "profilable kinds are numeric, string, date, "
                    "timestamp and array<numeric> (cast or $addFields "
                    "first)")

        # positional internal keys + backtick-quoted access: a column
        # name containing dots must neither break the agg (unquoted
        # resolution parses nested access) nor the stat readback
        # (review r7)
        def qcol(col: str) -> Column:
            return F.col("`" + col.replace("`", "``") + "`")

        key = {col: f"__pf{i}" for i, col in enumerate(cols)}
        # vector columns: materialize the norm ONCE as a temp column —
        # every stat aggregate would otherwise re-run the O(dim) HOF
        # fold per row per aggregate (the HOF-CSE rule)
        stage = df
        for col in cols:
            if kinds[col] == "vector":
                raw = qcol(col)
                norm = F.sqrt(F.aggregate(
                    F.transform(raw, lambda v: v.cast("double")),
                    F.lit(0.0), lambda a, v: a + v * v))
                stage = stage.withColumn(f"{key[col]}_normc", norm)
        aggs = [F.count(F.lit(1)).alias("__n_rows")]
        # r14 (guide §2.3): with >= 2 exact count_distinct's Spark
        # plans an Expand — one replica of every row per distinct
        # group — and the exact percentile buffers then process the
        # multiplied row stream (measured at sf0.1: basic+pct 3.3 s,
        # distinct-only 0.7 s, combined 10.1 s).  Split the exact
        # distincts into their OWN aggregation (narrow Expand, no
        # percentile buffers riding along) and broadcast-join the two
        # 1-row results.  A SINGLE distinct group plans without Expand
        # and the split would only add a scan (measured: profile_vector
        # 0.44 -> 1.03 s) — keep one pass then.  Approx mode (the
        # 100 TB configuration) keeps the single pass — HLL needs no
        # Expand.
        split = exact and len(cols) >= 2
        dist_aggs: list = []
        for col in cols:
            k, kind = key[col], kinds[col]
            raw = qcol(col)
            x = raw.cast("double") if kind == "numeric" else raw
            distinct = (F.count_distinct(x) if exact
                        else F.approx_count_distinct(x))
            aggs.append(F.count(x).alias(f"{k}_nn"))
            (dist_aggs if split else aggs).append(
                distinct.cast("long").alias(f"{k}_nd"))
            if kind == "numeric":
                aggs += [
                    F.min(x).alias(f"{k}_min"),
                    F.max(x).alias(f"{k}_max"),
                    F.avg(x).alias(f"{k}_mean"),
                    F.stddev_pop(x).alias(f"{k}_sd"),
                ]
                # r13: ONE array-percentile aggregate per column — a
                # scalar percentile() per requested percentile buffered
                # the whole column once EACH (3 pcts x 3 columns = 9
                # full-column buffers in the exact mode; same values,
                # one buffer per column now)
                if pcts:
                    parr = F.array(*[F.lit(float(p)) for p in pcts])
                    q = (F.percentile(x, parr) if exact
                         else F.percentile_approx(x, parr))
                    aggs.append(q.alias(f"{k}_pct"))
            elif kind == "string":
                ln = F.length(x)
                aggs += [
                    F.min(x).alias(f"{k}_smin"),
                    F.max(x).alias(f"{k}_smax"),
                    F.min(ln).alias(f"{k}_lmin"),
                    F.max(ln).alias(f"{k}_lmax"),
                    F.avg(ln).alias(f"{k}_lavg"),
                ]
            elif kind == "vector":
                nv = F.col(f"{k}_normc")
                dim = F.size(raw)
                aggs += [
                    F.min(nv).alias(f"{k}_min"),
                    F.max(nv).alias(f"{k}_max"),
                    F.avg(nv).alias(f"{k}_mean"),
                    F.stddev_pop(nv).alias(f"{k}_sd"),
                    F.min(dim).alias(f"{k}_lmin"),
                    F.max(dim).alias(f"{k}_lmax"),
                    F.avg(dim).alias(f"{k}_lavg"),
                ]
                if pcts:
                    parr = F.array(*[F.lit(float(p)) for p in pcts])
                    q = (F.percentile(nv, parr) if exact
                         else F.percentile_approx(nv, parr))
                    aggs.append(q.alias(f"{k}_pct"))
            else:  # date / timestamp
                aggs += [
                    F.min(x).alias(f"{k}_tmin"),
                    F.max(x).alias(f"{k}_tmax"),
                ]
        row = stage.agg(*aggs)
        if dist_aggs:
            # both frames are exactly one row (global aggregates), so
            # the broadcast cross join is a 1x1 attach
            row = row.crossJoin(F.broadcast(stage.agg(*dist_aggs)))
        if top_k:
            for col in cols:
                if kinds[col] != "string":
                    continue
                x = qcol(col)
                top = (
                    df.where(x.isNotNull())
                    .groupBy(x.alias("__v"))
                    .agg(F.count(F.lit(1)).alias("__n"))
                    .orderBy(F.col("__n").desc(), F.col("__v"))
                    .limit(top_k)
                    .agg(F.collect_list(
                        F.struct(F.col("__v").alias("value"),
                                 F.col("__n").alias("n")))
                         .alias(f"{key[col]}_top"))
                )
                row = row.crossJoin(F.broadcast(top))
        d_null = F.lit(None).cast("double")
        l_null = F.lit(None).cast("long")
        s_null = F.lit(None).cast("string")
        top_null = F.lit(None).cast("array<struct<value:string,n:bigint>>")
        structs = []
        for col in cols:
            k, kind = key[col], kinds[col]
            base = [
                F.lit(col).alias("column"),
                F.lit(kind).alias("type"),
                F.col("__n_rows").cast("long").alias("n_rows"),
                (F.col("__n_rows") - F.col(f"{k}_nn")).cast("long")
                .alias("n_null"),
                F.col(f"{k}_nd").alias("n_distinct"),
            ]
            if kind == "numeric":
                num = [
                    F.col(f"{k}_min").alias("min"),
                    F.col(f"{k}_max").alias("max"),
                    F.col(f"{k}_mean").alias("mean"),
                    F.col(f"{k}_sd").alias("stddev"),
                    *[F.element_at(F.col(f"{k}_pct"), i + 1).alias(nm)
                      for i, nm in enumerate(names)],
                ]
                strs = [s_null.alias("min_str"), s_null.alias("max_str")]
                lens = [l_null.alias("min_len"), l_null.alias("max_len"),
                        d_null.alias("avg_len")]
                top_c = top_null
            elif kind == "vector":
                # numeric fields = the L2 norm distribution, length
                # fields = the dimension (schema unchanged; type says
                # which reading applies)
                num = [
                    F.col(f"{k}_min").alias("min"),
                    F.col(f"{k}_max").alias("max"),
                    F.col(f"{k}_mean").alias("mean"),
                    F.col(f"{k}_sd").alias("stddev"),
                    *[F.element_at(F.col(f"{k}_pct"), i + 1).alias(nm)
                      for i, nm in enumerate(names)],
                ]
                strs = [s_null.alias("min_str"), s_null.alias("max_str")]
                lens = [F.col(f"{k}_lmin").cast("long").alias("min_len"),
                        F.col(f"{k}_lmax").cast("long").alias("max_len"),
                        F.col(f"{k}_lavg").alias("avg_len")]
                top_c = top_null
            else:
                num = [d_null.alias("min"), d_null.alias("max"),
                       d_null.alias("mean"), d_null.alias("stddev"),
                       *[d_null.alias(nm) for nm in names]]
                if kind == "string":
                    strs = [F.col(f"{k}_smin").alias("min_str"),
                            F.col(f"{k}_smax").alias("max_str")]
                    lens = [F.col(f"{k}_lmin").cast("long")
                            .alias("min_len"),
                            F.col(f"{k}_lmax").cast("long")
                            .alias("max_len"),
                            F.col(f"{k}_lavg").alias("avg_len")]
                    if top_k:
                        # the limit's output order is not contractual
                        # through the collect_list, so re-sort: count
                        # desc, then value asc — deterministic
                        top_c = F.array_sort(
                            F.col(f"{k}_top"),
                            lambda l, r: F.when(l["n"] > r["n"],
                                                F.lit(-1))
                            .when(l["n"] < r["n"], F.lit(1))
                            .when(l["value"] < r["value"], F.lit(-1))
                            .when(l["value"] > r["value"], F.lit(1))
                            .otherwise(F.lit(0)))
                    else:
                        top_c = top_null
                else:
                    fmt = ("yyyy-MM-dd" if kind == "date"
                           else "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
                    strs = [F.date_format(F.col(f"{k}_tmin"), fmt)
                            .alias("min_str"),
                            F.date_format(F.col(f"{k}_tmax"), fmt)
                            .alias("max_str")]
                    lens = [l_null.alias("min_len"),
                            l_null.alias("max_len"),
                            d_null.alias("avg_len")]
                    top_c = top_null
            structs.append(
                F.struct(*base, *num, *strs, *lens, top_c.alias("top")))
        return row.select(F.inline(F.array(*structs)))

    return fn


_ROUGE_TYPE = ("struct<lcs:bigint,precision:double,"
               "recall:double,f1:double>")


@register_stage("$rougeL")
def rouge_l_stage(expression: Any, ctx: Context) -> StageFn:
    """ROUGE-L (Lin 2004): longest-common-subsequence overlap between a
    candidate and a reference text in the same row — ``{candidate,
    reference | references, beta?, maxWords?, as?}`` adds ``struct<lcs,
    precision, recall, f1>`` where ``precision = LCS/|cand|``,
    ``recall = LCS/|ref|`` and f1 is the beta-weighted harmonic mean
    (Lin's F_lcs with ``beta`` defaulting to 1; ROUGE's recall-heavy
    variant uses a large beta).  Word-level, Java-\\s tokenization like
    the rest of the eval family.

    MULTI-REFERENCE (r9): ``references: <expr -> array<string>>``
    scores the candidate against EACH reference and keeps the struct of
    the reference with the best F_lcs (Lin 2004 §5's multi-reference
    max; ties -> the first reference in array order).  Null reference
    elements are dropped; a null or effectively-empty array -> null.
    Exactly one of ``reference``/``references``; a single-element array
    agrees exactly with the scalar form.

    LCS needs a dynamic program (no closed column form), so this is an
    Arrow-batched Pandas UDF — the eval-family's documented Python
    boundary (row-local, zero shuffle).  ``maxWords`` (default 2000)
    truncates the candidate and every reference first: the DP is
    O(|c|·|r|) per row and an unbounded pair would make one row cost
    10^8 cells; the cap is the honest bound, loudly documented here
    rather than hidden."""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$rougeL needs exactly one of reference | references")
    beta = float(expression.get("beta", 1.0))
    max_words = int(expression.get("maxWords", 2000))
    as_field = expression.get("as", "rouge_l")
    if beta <= 0:
        raise ValueError("$rougeL beta must be > 0")
    if max_words < 1:
        raise ValueError("$rougeL maxWords must be >= 1")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        ref = compile_expr(ref_e, sctx) if ref_e is not None else None
        refs = compile_expr(refs_e, sctx) if refs_e is not None else None
        b2 = beta * beta

        def lcs_len(a: list, b: list) -> int:
            # r13: bit-parallel LCS length (Allison & Dix 1986; Hyyrö
            # 2004's LLCS recurrence V' = (V + U) | (V - U) with
            # U = V & Match[x]): the shorter side becomes the bit
            # vector, so each longer-side word costs O(min/64) bigint
            # ops instead of an O(min) Python DP row — ~40x on this
            # boundary (eval_multiref 39 s -> ~3 s at sf0.1).
            # Differential-pinned against the classic two-row DP in
            # tests/test_eval_properties.py.
            if len(a) < len(b):
                a, b = b, a
            n = len(b)
            if n == 0:
                return 0
            masks: dict = {}
            for j, y in enumerate(b):
                masks[y] = masks.get(y, 0) | (1 << j)
            full = (1 << n) - 1
            v = full
            for x in a:
                m = masks.get(x)
                if m:
                    u = v & m
                    v = ((v + u) | (v - u)) & full
            return n - bin(v).count("1")

        import re as _re

        ws_split = _re.compile(r"[ \t\n\r\f\x0b]+").split  # Java \s

        def score(pair) -> Any:
            ct, rt = pair
            if ct is None or rt is None:
                return None
            wc = [w for w in ws_split(ct) if w][:max_words]
            wr = [w for w in ws_split(rt) if w][:max_words]
            m = lcs_len(wc, wr)
            p = m / len(wc) if wc else 0.0
            r = m / len(wr) if wr else 0.0
            f = ((1 + b2) * p * r / (r + b2 * p)) if p + r else 0.0
            return (m, p, r, f)

        def score_multi(pair) -> Any:
            ct, rts = pair
            if ct is None or rts is None:
                return None
            vals = [score((ct, rt)) for rt in rts if rt is not None]
            if not vals:
                return None
            # max F_lcs across references; Python max keeps the FIRST
            # maximal element, so ties resolve to array order (pinned)
            return max(vals, key=lambda v: v[3])

        def _frame(vals) -> pd.DataFrame:
            return pd.DataFrame(
                [(None, None, None, None) if v is None else v
                 for v in vals],
                columns=["lcs", "precision", "recall", "f1"])

        if refs is not None:
            @F.pandas_udf(_ROUGE_TYPE)
            def _rouge_multi(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                return _frame([score_multi(pr) for pr in zip(s, t)])

            out = _rouge_multi(cand, refs)
            null_in = cand.isNull() | refs.isNull()
        else:
            @F.pandas_udf(_ROUGE_TYPE)
            def _rouge(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                return _frame([score(pr) for pr in zip(s, t)])

            out = _rouge(cand, ref)
            null_in = cand.isNull() | ref.isNull()
        # null in -> null STRUCT (the UDF can only null the fields); a
        # multi-ref row whose references all filter away also comes
        # back as null FIELDS — normalize both to a null struct.  The
        # UDF output lands in a temp column first so the when-tree
        # never references the Python expression twice.
        null_st = F.lit(None).cast(_ROUGE_TYPE)
        stage = df.withColumn("__rl_raw", out)
        raw = F.col("__rl_raw")
        return stage.withColumn(
            as_field,
            F.when(null_in | raw["f1"].isNull(), null_st).otherwise(raw),
        ).drop("__rl_raw")

    return fn


def _rouge_tokens(t: Column, max_words: Optional[int] = None) -> Column:
    """google-research/rouge's default tokenizer (the HF-evaluate /
    rouge_score convention, public rules): lowercase, then keep
    ``[a-z0-9]+`` runs as tokens — digits survive, punctuation and any
    other character split.  The complement-split form below is
    equivalent to the library's ``findall(r"[a-z0-9]+")`` and runs
    identically in Java (Spark), RE2 (DuckDB oracles) and Python."""
    w = F.filter(F.split(F.lower(t), "[^a-z0-9]+"),
                 lambda x: x != F.lit(""))
    return w if max_words is None else F.slice(w, 1, max_words)


_ROUGE_TOKENIZERS = ("rougeScore", "whitespace")


def _rouge_words(tok: str, t: Column, max_words: int) -> Column:
    return (_rouge_tokens(t, max_words) if tok == "rougeScore"
            else _eval_words(t, max_words))


@register_stage("$rougeN")
def rouge_n_stage(expression: Any, ctx: Context) -> StageFn:
    """ROUGE-N (Lin 2004) with rouge_score-library parity: ``{candidate,
    reference | references, n?, tokenizer?, maxWords?, as?}`` adds
    ``struct<n_cand, n_ref, n_match, precision, recall, f1>`` where
    ``n_match`` is the clipped word-n-gram match count, ``recall =
    n_match/n_ref`` (the ROUGE-N headline number), ``precision =
    n_match/n_cand`` and ``f1`` the harmonic mean — exactly
    rouge_score's (precision, recall, fmeasure) triple for ``rougeN``.

    The mathematical core is `$ngramOverlap`'s; what this stage adds is
    the CONVENTION the summarization literature actually reports:
    ``tokenizer: "rougeScore"`` (default) lowercases and keeps
    ``[a-z0-9]+`` runs (the google-research/rouge default that
    HF-evaluate wraps), so scores line up with published ROUGE-1/2
    numbers; ``tokenizer: "whitespace"`` reproduces `$ngramOverlap`
    exactly (differential-tested).  MULTI-REFERENCE keeps the struct of
    the best f1 (rouge_score's ``score_multi`` max-fmeasure; ties ->
    first reference in array order).  Null handling, ``maxWords``
    (default 2000) cost cap and the temp-column CSE discipline are the
    `$ngramOverlap` contract verbatim.

    100 TB shape: pure higher-order-function column program — row-local,
    zero shuffle, whole-stage codegen, O(d·(|c|+|r|)) per row."""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$rougeN needs exactly one of reference | references")
    n = int(expression.get("n", 1))
    tok = expression.get("tokenizer", "rougeScore")
    max_words = int(expression.get("maxWords", 2000))
    as_field = expression.get("as", "rouge_n")
    if n < 1:
        raise ValueError("$rougeN n must be >= 1")
    if tok not in _ROUGE_TOKENIZERS:
        raise ValueError(
            f"$rougeN tokenizer must be one of {_ROUGE_TOKENIZERS}")
    if max_words < 1:
        raise ValueError("$rougeN maxWords must be >= 1")

    _OV_T = ("struct<n_cand:bigint,n_ref:bigint,n_match:bigint,"
             "precision:double,recall:double,f1:double>")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        words = lambda t: _rouge_words(tok, t, max_words)  # noqa: E731
        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            stage = df.withColumn(
                "__rn_gc", _eval_grams(words(cand), n),
            ).withColumn(
                "__rn_grs",
                F.transform(
                    F.filter(refs, lambda r: r.isNotNull()),
                    lambda r: _eval_grams(words(r), n)))
            gc, grs = F.col("__rn_gc"), F.col("__rn_grs")
            nc = F.size(gc).cast("long")

            def score_one(gr: Column) -> Column:
                m = _eval_clipped(gc, gr)
                nr = F.size(gr).cast("long")
                p = F.when(nc > 0, m / nc.cast("double")) \
                    .otherwise(F.lit(0.0))
                r = F.when(nr > 0, m / nr.cast("double")) \
                    .otherwise(F.lit(0.0))
                f = F.when(p + r > 0, 2.0 * p * r / (p + r)) \
                    .otherwise(F.lit(0.0))
                return F.struct(
                    nc.alias("n_cand"), nr.alias("n_ref"),
                    m.alias("n_match"), p.alias("precision"),
                    r.alias("recall"), f.alias("f1"))

            # per-reference structs materialize FIRST, then one fold
            # comparing f1 — same no-CSE-in-HOF-lambdas discipline as
            # $ngramOverlap (see _eval_clipped's contract)
            stage = stage.withColumn(
                "__rn_sc", F.transform(grs, score_one))
            best = F.aggregate(
                F.col("__rn_sc"), F.lit(None).cast(_OV_T),
                lambda acc, s: F.when(
                    acc.isNull() | (s["f1"] > acc["f1"]), s,
                ).otherwise(acc))
            null_st = F.lit(None).cast(_OV_T)
            out = F.when(
                cand.isNull() | refs.isNull() | (F.size(grs) == 0),
                null_st).otherwise(best)
            return stage.withColumn(as_field, out) \
                .drop("__rn_gc", "__rn_grs", "__rn_sc")
        ref = compile_expr(ref_e, sctx)
        stage = df.withColumn(
            "__rn_gc", _eval_grams(words(cand), n),
        ).withColumn(
            "__rn_gr", _eval_grams(words(ref), n))
        gc, gr = F.col("__rn_gc"), F.col("__rn_gr")
        stage = stage.withColumn(
            "__rn_m", _eval_clipped(gc, gr),
        ).withColumn("__rn_p", F.when(
            F.size(gc) > 0,
            F.col("__rn_m") / F.size(gc).cast("long")).otherwise(F.lit(0.0))
        ).withColumn("__rn_r", F.when(
            F.size(gr) > 0,
            F.col("__rn_m") / F.size(gr).cast("long")).otherwise(F.lit(0.0)))
        prec, rec = F.col("__rn_p"), F.col("__rn_r")
        f1 = F.when(prec + rec > 0,
                    2.0 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
        st = F.struct(
            F.size(gc).cast("long").alias("n_cand"),
            F.size(gr).cast("long").alias("n_ref"),
            F.col("__rn_m").alias("n_match"), prec.alias("precision"),
            rec.alias("recall"), f1.alias("f1"))
        null_st = F.lit(None).cast(_OV_T)
        return stage.withColumn(
            as_field,
            F.when(cand.isNull() | ref.isNull(), null_st).otherwise(st),
        ).drop("__rn_gc", "__rn_gr", "__rn_m", "__rn_p", "__rn_r")

    return fn


_ROUGE_LSUM_TYPE = ("struct<hits:bigint,precision:double,"
                    "recall:double,f1:double>")


@register_stage("$rougeLsum")
def rouge_lsum_stage(expression: Any, ctx: Context) -> StageFn:
    """ROUGE-Lsum — summary-level ROUGE-L (Lin 2004 §3.2 as implemented
    by google-research/rouge, the variant summarization papers report):
    ``{candidate, reference | references, tokenizer?, maxWords?, as?}``
    adds ``struct<hits, precision, recall, f1>``.

    Both texts split into sentences on newlines (the library's
    convention — upstream summarizers emit one sentence per line); for
    each REFERENCE sentence the UNION of its LCS match positions
    against every candidate sentence is taken, and union hits are
    CLIPPED by remaining token counts on both sides (each token
    occurrence credits at most once corpus-wide), processing reference
    sentences in order — the exact rouge_score ``_summary_level_lcs``
    procedure.  ``recall = hits/|ref tokens|``, ``precision =
    hits/|cand tokens|``, ``f1`` harmonic.  With single-sentence texts
    this reduces to sentence-level ROUGE-L with f-beta=1
    (differential-tested).

    ``tokenizer``: ``"rougeScore"`` (default — lowercase ``[a-z0-9]+``
    runs, the library default) or ``"whitespace"`` (the eval-family
    Java-\\s split).  MULTI-REFERENCE keeps the struct of the best f1
    (rouge_score ``score_multi``; ties -> first reference).  Null in
    either side -> null struct.

    The union-LCS dynamic program has no closed column form, so this
    runs on the eval family's documented Arrow boundary (row-local,
    zero shuffle).  ``maxWords`` (default 2000) caps the TOTAL token
    count per side (truncating mid-sentence): the per-row cost is
    O(|sentences_r| x |sentences_c| x len^2) and the cap is the honest
    bound, loudly documented rather than hidden."""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$rougeLsum needs exactly one of reference | references")
    tok = expression.get("tokenizer", "rougeScore")
    max_words = int(expression.get("maxWords", 2000))
    as_field = expression.get("as", "rouge_lsum")
    if tok not in _ROUGE_TOKENIZERS:
        raise ValueError(
            f"$rougeLsum tokenizer must be one of {_ROUGE_TOKENIZERS}")
    if max_words < 1:
        raise ValueError("$rougeLsum maxWords must be >= 1")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        import re as _re

        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        ref = compile_expr(ref_e, sctx) if ref_e is not None else None
        refs = compile_expr(refs_e, sctx) if refs_e is not None else None

        if tok == "rougeScore":
            toks = _re.compile(r"[a-z0-9]+").findall

            def tok_fn(s: str) -> list:
                return toks(s.lower())
        else:
            ws_split = _re.compile(r"[ \t\n\r\f\x0b]+").split

            def tok_fn(s: str) -> list:
                return [w for w in ws_split(s) if w]

        def sents_of(text: str) -> list:
            out, total = [], 0
            for line in text.split("\n"):
                words = tok_fn(line)
                if not words:
                    continue
                if total + len(words) >= max_words:
                    words = words[: max_words - total]
                    if words:
                        out.append(words)
                    break
                out.append(words)
                total += len(words)
            return out

        def lcs_ref_indices(r: list, c: list) -> set:
            """Positions in ``r`` belonging to one LCS of (r, c) — the
            rouge_score backtrack: match wins; otherwise step up
            (i-1) unless the left cell is STRICTLY greater — ties
            prefer up, exactly the library's ``_lcs_ind``."""
            if not r or not c:
                return set()
            rows = len(r) + 1
            cols = len(c) + 1
            t = [[0] * cols for _ in range(rows)]
            for i in range(1, rows):
                ri = r[i - 1]
                ti = t[i]
                tp = t[i - 1]
                for j in range(1, cols):
                    if ri == c[j - 1]:
                        ti[j] = tp[j - 1] + 1
                    else:
                        a, b = tp[j], ti[j - 1]
                        ti[j] = a if a >= b else b
            out = set()
            i, j = len(r), len(c)
            while i > 0 and j > 0:
                if r[i - 1] == c[j - 1]:
                    out.add(i - 1)
                    i -= 1
                    j -= 1
                elif t[i - 1][j] >= t[i][j - 1]:
                    i -= 1
                else:
                    j -= 1
            return out

        def summary_hits(ref_sents: list, can_sents: list):
            from collections import Counter

            m = sum(len(s) for s in ref_sents)
            nn = sum(len(s) for s in can_sents)
            if m == 0 or nn == 0:
                return 0, m, nn
            tc: Any = Counter()
            tr: Any = Counter()
            for s in can_sents:
                tc.update(s)
            for s in ref_sents:
                tr.update(s)
            hits = 0
            for r in ref_sents:
                union: set = set()
                for cs in can_sents:
                    union |= lcs_ref_indices(r, cs)
                for i in sorted(union):
                    w = r[i]
                    if tc[w] > 0 and tr[w] > 0:
                        hits += 1
                        tc[w] -= 1
                        tr[w] -= 1
            return hits, m, nn

        def score(pair) -> Any:
            ct, rt = pair
            if ct is None or rt is None:
                return None
            hits, m, nn = summary_hits(sents_of(rt), sents_of(ct))
            p = hits / nn if nn else 0.0
            r = hits / m if m else 0.0
            f = (2.0 * p * r / (p + r)) if p + r else 0.0
            return (hits, p, r, f)

        def score_multi(pair) -> Any:
            ct, rts = pair
            if ct is None or rts is None:
                return None
            vals = [score((ct, rt)) for rt in rts if rt is not None]
            if not vals:
                return None
            return max(vals, key=lambda v: v[3])

        def _frame(vals) -> pd.DataFrame:
            return pd.DataFrame(
                [(None, None, None, None) if v is None else v
                 for v in vals],
                columns=["hits", "precision", "recall", "f1"])

        if refs is not None:
            @F.pandas_udf(_ROUGE_LSUM_TYPE)
            def _rlsum_multi(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                return _frame([score_multi(pr) for pr in zip(s, t)])

            out = _rlsum_multi(cand, refs)
            null_in = cand.isNull() | refs.isNull()
        else:
            @F.pandas_udf(_ROUGE_LSUM_TYPE)
            def _rlsum(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                return _frame([score(pr) for pr in zip(s, t)])

            out = _rlsum(cand, ref)
            null_in = cand.isNull() | ref.isNull()
        null_st = F.lit(None).cast(_ROUGE_LSUM_TYPE)
        stage = df.withColumn("__rls_raw", out)
        raw = F.col("__rls_raw")
        return stage.withColumn(
            as_field,
            F.when(null_in | raw["f1"].isNull(), null_st).otherwise(raw),
        ).drop("__rls_raw")

    return fn


_METEOR_TYPE = ("struct<matches:bigint,chunks:bigint,"
                "precision:double,recall:double,fmean:double,"
                "score:double>")


@register_stage("$meteor")
def meteor_stage(expression: Any, ctx: Context) -> StageFn:
    """METEOR, exact-match variant with NLTK parity (Banerjee & Lavie
    2005; nltk.translate.meteor_score's exact stage): ``{candidate,
    reference | references, alpha?, beta?, gamma?, tokenizer?,
    maxWords?, as?}`` adds ``struct<matches, chunks, precision, recall,
    fmean, score>`` with ``fmean = P·R / (alpha·P + (1-alpha)·R)``,
    ``penalty = gamma·(chunks/matches)^beta`` and ``score =
    fmean·(1-penalty)`` — NLTK's defaults alpha 0.9 / beta 3 /
    gamma 0.5.  Zero matches -> score 0.0 (chunks 0).  Stem and
    WordNet-synonym stages need external linguistic data and are
    deliberately out of scope; with exact matching only, scores equal
    NLTK's given identical tokenization (differential-tested against a
    verbatim reference implementation).

    THE ALIGNMENT IS CLOSED-FORM: NLTK's reverse greedy (hypothesis
    scanned last-to-first, each word taking the last still-available
    reference occurrence) pairs the k-th-FROM-END occurrence of word w
    in the hypothesis with the k-th-from-end occurrence in the
    reference — so the match set is pure occurrence-rank arithmetic,
    no search.  That makes this stage an all-JVM higher-order-function
    column program (the only eval-family alignment metric with no
    Arrow boundary) AND gives the DuckDB oracle the same closed form.
    Chunks count contiguity breaks over the matches in hypothesis
    order (both indices advancing by exactly 1 extend a chunk).

    Both texts are LOWERCASED first (NLTK's ``preprocess`` default);
    ``tokenizer``: ``"whitespace"`` (default) or ``"rougeScore"``.
    MULTI-REFERENCE keeps the best-score struct (NLTK takes the max;
    ties -> first reference).  Null in either side -> null struct.

    ``maxWords`` (default 500) truncates both sides: the rank
    arithmetic is O(n^2) HOF work per row — sentence-level inputs are
    the intended shape, and the cap is the honest bound."""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$meteor needs exactly one of reference | references")
    alpha = float(expression.get("alpha", 0.9))
    beta = float(expression.get("beta", 3.0))
    gamma = float(expression.get("gamma", 0.5))
    tok = expression.get("tokenizer", "whitespace")
    max_words = int(expression.get("maxWords", 500))
    as_field = expression.get("as", "meteor")
    if not (0.0 < alpha < 1.0):
        raise ValueError("$meteor alpha must be in (0, 1)")
    if beta <= 0 or gamma < 0:
        raise ValueError("$meteor needs beta > 0 and gamma >= 0")
    if tok not in _ROUGE_TOKENIZERS:
        raise ValueError(
            f"$meteor tokenizer must be one of {_ROUGE_TOKENIZERS}")
    if max_words < 1:
        raise ValueError("$meteor maxWords must be >= 1")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)

        def words(t: Column) -> Column:
            return _rouge_words(tok, F.lower(t), max_words)

        hw = F.col("__mt_h")

        def pairs_with(rw: Column) -> Column:
            """Aligned (hi, ri) pairs in hypothesis order: hypothesis
            position i (rank r = occurrences of hw[i] at or after i)
            matches the r-th-from-end reference occurrence of the same
            word, when one exists."""
            def one(i: Column) -> Column:
                w = F.element_at(hw, i)
                rank = F.size(F.filter(
                    F.slice(hw, i, F.size(hw) - i + 1),
                    lambda x: x == w))
                occ = F.filter(
                    F.sequence(F.lit(1), F.size(rw)),
                    lambda j: F.element_at(rw, j) == w)
                ri = F.when(
                    rank <= F.size(occ),
                    F.element_at(occ, F.size(occ) - rank + 1))
                return F.struct(i.alias("hi"), ri.alias("ri"))

            return F.when(
                (F.size(hw) > 0) & (F.size(rw) > 0),
                F.filter(
                    F.transform(F.sequence(F.lit(1), F.size(hw)), one),
                    lambda p: p["ri"].isNotNull()),
            ).otherwise(F.array().cast("array<struct<hi:int,ri:int>>"))

        def score_struct(rw: Column, ps: Column) -> Column:
            m = F.size(ps).cast("long")
            # chunk breaks: consecutive matches (hypothesis order)
            # where either index does not advance by exactly 1
            breaks = F.when(
                m >= 2,
                F.aggregate(
                    F.zip_with(
                        F.slice(ps, 1, F.size(ps) - 1),
                        F.slice(ps, 2, F.size(ps) - 1),
                        lambda a, b: F.when(
                            (b["hi"] == a["hi"] + 1)
                            & (b["ri"] == a["ri"] + 1),
                            F.lit(0)).otherwise(F.lit(1))),
                    F.lit(0), lambda acc, x: acc + x),
            ).otherwise(F.lit(0))
            chunks = F.when(m > 0, (breaks + 1).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
            p = m / F.size(hw).cast("double")
            r = m / F.size(rw).cast("double")
            fmean = (p * r) / (F.lit(alpha) * p + F.lit(1 - alpha) * r)
            penalty = F.lit(gamma) * F.pow(
                chunks.cast("double") / m.cast("double"), F.lit(beta))
            score = F.when(m > 0, fmean * (1.0 - penalty)) \
                .otherwise(F.lit(0.0))
            return F.struct(
                m.alias("matches"), chunks.alias("chunks"),
                F.when(m > 0, p).otherwise(F.lit(0.0)).alias("precision"),
                F.when(m > 0, r).otherwise(F.lit(0.0)).alias("recall"),
                F.when(m > 0, fmean).otherwise(F.lit(0.0)).alias("fmean"),
                score.alias("score"))

        null_st = F.lit(None).cast(_METEOR_TYPE)
        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            stage = df.withColumn("__mt_h", words(cand)).withColumn(
                "__mt_rs",
                F.transform(F.filter(refs, lambda r: r.isNotNull()),
                            words))
            # per-reference pair arrays materialize first (no CSE in
            # HOF lambdas), then per-reference structs, then a max
            # fold on score with first-reference ties
            stage = stage.withColumn(
                "__mt_ps",
                F.transform(F.col("__mt_rs"), pairs_with))
            stage = stage.withColumn(
                "__mt_sc",
                F.zip_with(F.col("__mt_rs"), F.col("__mt_ps"),
                           score_struct))
            best = F.aggregate(
                F.col("__mt_sc"), null_st,
                lambda acc, s: F.when(
                    acc.isNull() | (s["score"] > acc["score"]), s,
                ).otherwise(acc))
            out_c = F.when(
                cand.isNull() | refs.isNull()
                | (F.size(F.col("__mt_rs")) == 0),
                null_st).otherwise(best)
            return stage.withColumn(as_field, out_c) \
                .drop("__mt_h", "__mt_rs", "__mt_ps", "__mt_sc")
        ref = compile_expr(ref_e, sctx)
        stage = df.withColumn("__mt_h", words(cand)) \
                  .withColumn("__mt_r", words(ref))
        stage = stage.withColumn(
            "__mt_ps", pairs_with(F.col("__mt_r")))
        out_c = F.when(cand.isNull() | ref.isNull(), null_st) \
            .otherwise(score_struct(F.col("__mt_r"), F.col("__mt_ps")))
        return stage.withColumn(as_field, out_c) \
            .drop("__mt_h", "__mt_r", "__mt_ps")

    return fn


@register_stage("$bleu")
def bleu_stage(expression: Any, ctx: Context) -> StageFn:
    """Sentence-level BLEU (Papineni et al. 2002): ``{candidate,
    reference | references, maxN?, maxWords?, smooth?, as?}`` adds the
    BLEU-``maxN`` score (default 4): brevity penalty x geometric mean
    of the clipped n-gram precisions p_1..p_maxN (the same clipped
    counts as ``$ngramOverlap``).  Unsmoothed by default — any zero
    p_n gives 0.0, as standard; ``smooth: "add1"`` applies add-one
    smoothing to the n >= 2 precisions (Lin & Och 2004's method), the
    common choice for sentence-level scoring.  A candidate with no
    n-grams at some order (shorter than ``maxN`` words) scores 0.0.
    Null in either side -> null.

    MULTI-REFERENCE (r9, Papineni 2002 §2.2-2.3 — how real eval
    harnesses score): ``references: <expr -> array<string>>`` clips
    each candidate n-gram against the MAX count of that gram across
    all references, and the brevity penalty uses the reference whose
    length is CLOSEST to the candidate's (ties -> the shorter
    reference, the sacrebleu/NLTK convention).  Null reference
    ELEMENTS are dropped; a null or effectively-empty references array
    -> null score.  Exactly one of ``reference``/``references``.
    With a single-element array the two forms agree exactly
    (differential-tested).

    ``maxWords`` (default 2000, advisor r8) truncates the candidate
    and every reference first — the same per-row cost cap as
    ``$rougeL``/``$ngramOverlap``: the clipped-match aggregate runs
    once per order, so an uncapped pathological pair would cost ~10^9
    comparisons across 4 orders in a single task.

    100 TB shape: same row-local HOF column programs as $ngramOverlap,
    one clipped-match aggregate per order materialized as a temp column
    (never inlined — see $ngramOverlap's CSE note), zero shuffle —
    multi-reference adds one nested transform per order, still fully
    JVM-side."""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$bleu needs exactly one of reference | references")
    max_n = int(expression.get("maxN", 4))
    max_words = int(expression.get("maxWords", 2000))
    smooth = expression.get("smooth")
    as_field = expression.get("as", "bleu")
    # r11: tokenizer "13a" (sacrebleu's default) pre-tokenizes both
    # sides with the mteval-v13a punctuation rules before the
    # whitespace word split; "none" (default) keeps raw whitespace
    # words — backward compatible
    tokenizer = _check_tokenizer("$bleu", expression.get("tokenizer"))
    if not 1 <= max_n <= 8:
        raise ValueError("$bleu maxN must be in 1..8")
    if max_words < 1:
        raise ValueError("$bleu maxWords must be >= 1")
    if smooth not in (None, "add1"):
        raise ValueError(f"$bleu smooth must be 'add1' or absent, "
                         f"got {smooth!r}")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        cand = _tok_fn(tokenizer)(cand)
        # r14 (guide §1.2, the §2-bootstrap class): dependency-layered
        # withColumns — one analyzer pass per layer and no stacked
        # Project copies of the gram arrays at runtime; identical
        # columns and expressions.
        tok = _tok_fn(tokenizer)
        layer1 = {"__bleu_wc": _eval_words(cand, max_words)}
        wc = F.col("__bleu_wc")
        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            layer1["__bleu_wrs"] = F.transform(
                F.filter(refs, lambda r: r.isNotNull()),
                lambda r: _eval_words(tok(r), max_words))
            wrs = F.col("__bleu_wrs")
            null_in = cand.isNull() | refs.isNull() | (F.size(wrs) == 0)
        else:
            ref = compile_expr(ref_e, sctx)
            layer1["__bleu_wr"] = _eval_words(tok(ref), max_words)
            null_in = cand.isNull() | ref.isNull()
        wr = F.col("__bleu_wr")
        stage = df.withColumns(layer1)
        temps = list(layer1)
        layer2: dict = {}

        def _grams_of(_n: int):
            # not a default-arg lambda: F.transform treats a 2-param
            # callable as the (element, index) form
            return lambda w: _eval_grams(w, _n)

        for n in range(1, max_n + 1):
            layer2[f"__bleu_gc{n}"] = _eval_grams(wc, n)
            if refs_e is not None:
                layer2[f"__bleu_grs{n}"] = F.transform(wrs, _grams_of(n))
            else:
                layer2[f"__bleu_gr{n}"] = _eval_grams(wr, n)
        stage = stage.withColumns(layer2)
        temps += list(layer2)
        layer3 = {}
        for n in range(1, max_n + 1):
            if refs_e is not None:
                layer3[f"__bleu_m{n}"] = _eval_clipped_multi(
                    F.col(f"__bleu_gc{n}"), F.col(f"__bleu_grs{n}"))
            else:
                layer3[f"__bleu_m{n}"] = _eval_clipped(
                    F.col(f"__bleu_gc{n}"), F.col(f"__bleu_gr{n}"))
        stage = stage.withColumns(layer3)
        temps += list(layer3)
        # zero-precision guard: any order with no candidate grams, or an
        # unsmoothed order with zero matches, zeroes the whole score
        zero = F.lit(False)
        log_sum = F.lit(0.0)
        for n in range(1, max_n + 1):
            cnt = F.size(F.col(f"__bleu_gc{n}")).cast("double")
            m = F.col(f"__bleu_m{n}").cast("double")
            if smooth == "add1" and n >= 2:
                p = (m + 1.0) / (cnt + 1.0)
                zero = zero | (cnt == 0.0)
            else:
                p = m / cnt
                zero = zero | (cnt == 0.0) | (m == 0.0)
            log_sum = log_sum + F.log(p) / max_n
        c_len = F.size(wc).cast("double")
        if refs_e is not None:
            # effective reference length: closest to the candidate's,
            # ties -> shorter (Papineni 2002 §2.3 "best match length")
            c_len_l = F.size(wc).cast("long")
            best = F.aggregate(
                F.transform(wrs, lambda w: F.size(w).cast("long")),
                F.struct(F.lit(None).cast("long").alias("d"),
                         F.lit(None).cast("long").alias("l")),
                lambda acc, ln: F.when(
                    acc["l"].isNull()
                    | (F.abs(ln - c_len_l) < acc["d"])
                    | ((F.abs(ln - c_len_l) == acc["d"])
                       & (ln < acc["l"])),
                    F.struct(F.abs(ln - c_len_l).cast("long").alias("d"),
                             ln.alias("l")),
                ).otherwise(acc))
            r_len = best["l"].cast("double")
        else:
            r_len = F.size(wr).cast("double")
        bp = F.when(c_len >= r_len, F.lit(1.0)) \
            .otherwise(F.exp(1.0 - r_len / c_len))
        score = F.when(zero, F.lit(0.0)).otherwise(bp * F.exp(log_sum))
        out = F.when(null_in, F.lit(None).cast("double")).otherwise(score)
        return stage.withColumn(as_field, out).drop(*temps)

    return fn


@register_stage("$bleuCorpus")
def bleu_corpus_stage(expression: Any, ctx: Context) -> StageFn:
    """CORPUS-level BLEU (Papineni 2002 §2 — the metric MT papers
    actually report; sentence-BLEU averaged is NOT it): ``{candidate,
    reference | references, maxN?, maxWords?, smooth?}`` -> ONE row
    ``(bleu, bp, c_len, r_len, n_segments, p1..p<maxN>)``.  Per order,
    the corpus precision is ``sum of per-segment clipped matches /
    sum of per-segment candidate gram counts``; the brevity penalty
    compares the TOTAL candidate length against the sum of per-segment
    effective reference lengths (closest-to-candidate, ties shorter,
    §2.3 — single-reference form uses the reference length directly).
    ``smooth: "add1"`` adds one to numerator and denominator of the
    n >= 2 corpus precisions.  Segments with a null candidate or a
    null/effectively-empty reference side are EXCLUDED from every sum
    (and from n_segments), matching how eval harnesses drop unscorable
    pairs.

    CORPUS-ONLY: this is a corpus-wide aggregate — inside a
    foreachBatch re-entry it would silently score one micro-batch and
    label it the corpus score, so it is gated exactly like $profile.

    100 TB shape: the per-segment clipped counts are the same
    row-local, zero-shuffle HOF programs as $bleu; the corpus reduction
    is ONE global aggregate whose partial aggregation collapses every
    task to a single row of 2·maxN+3 longs — nothing else moves."""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$bleuCorpus needs exactly one of reference | references")
    max_n = int(expression.get("maxN", 4))
    max_words = int(expression.get("maxWords", 2000))
    smooth = expression.get("smooth")
    # r11: sacrebleu's default 13a tokenization, like $bleu
    tokenizer = _check_tokenizer("$bleuCorpus", expression.get("tokenizer"))
    if not 1 <= max_n <= 8:
        raise ValueError("$bleuCorpus maxN must be in 1..8")
    if max_words < 1:
        raise ValueError("$bleuCorpus maxWords must be >= 1")
    if smooth not in (None, "add1"):
        raise ValueError(f"$bleuCorpus smooth must be 'add1' or absent, "
                         f"got {smooth!r}")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        from ..operators.extended import _corpus_only

        _corpus_only("$bleuCorpus", c)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        tok = _tok_fn(tokenizer)
        stage = df.withColumn("__blc_wc",
                              _eval_words(tok(cand), max_words))
        wc = F.col("__blc_wc")
        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            stage = stage.withColumn(
                "__blc_wrs",
                F.transform(F.filter(refs, lambda r: r.isNotNull()),
                            lambda r: _eval_words(tok(r), max_words)))
            wrs = F.col("__blc_wrs")
            scorable = cand.isNotNull() & refs.isNotNull() \
                & (F.size(wrs) > 0)
        else:
            ref = compile_expr(ref_e, sctx)
            stage = stage.withColumn("__blc_wr",
                                     _eval_words(tok(ref), max_words))
            scorable = cand.isNotNull() & ref.isNotNull()
        wr = F.col("__blc_wr")
        stage = stage.filter(scorable)
        for n in range(1, max_n + 1):
            gc_n, m_n = f"__blc_gc{n}", f"__blc_m{n}"
            stage = stage.withColumn(gc_n, _eval_grams(wc, n))
            if refs_e is not None:
                grs_n = f"__blc_grs{n}"
                stage = stage.withColumn(
                    grs_n, F.transform(wrs, lambda w: _eval_grams(w, n)))
                stage = stage.withColumn(
                    m_n, _eval_clipped_multi(F.col(gc_n), F.col(grs_n)))
            else:
                gr_n = f"__blc_gr{n}"
                stage = stage.withColumn(gr_n, _eval_grams(wr, n))
                stage = stage.withColumn(
                    m_n, _eval_clipped(F.col(gc_n), F.col(gr_n)))
        c_len_l = F.size(wc).cast("long")
        if refs_e is not None:
            # per-segment effective reference length (Papineni §2.3)
            best = F.aggregate(
                F.transform(wrs, lambda w: F.size(w).cast("long")),
                F.struct(F.lit(None).cast("long").alias("d"),
                         F.lit(None).cast("long").alias("l")),
                lambda acc, ln: F.when(
                    acc["l"].isNull()
                    | (F.abs(ln - c_len_l) < acc["d"])
                    | ((F.abs(ln - c_len_l) == acc["d"])
                       & (ln < acc["l"])),
                    F.struct(F.abs(ln - c_len_l).cast("long").alias("d"),
                             ln.alias("l")),
                ).otherwise(acc))
            r_len_seg = best["l"]
        else:
            r_len_seg = F.size(wr).cast("long")
        zero_l = F.lit(0).cast("long")
        aggs = [
            F.count(F.lit(1)).alias("n_segments"),
            F.coalesce(F.sum(c_len_l), zero_l).alias("c_len"),
            F.coalesce(F.sum(r_len_seg), zero_l).alias("r_len"),
        ]
        for n in range(1, max_n + 1):
            aggs += [
                F.coalesce(F.sum(F.col(f"__blc_m{n}")), zero_l)
                .alias(f"m{n}"),
                F.coalesce(
                    F.sum(F.size(F.col(f"__blc_gc{n}")).cast("long")),
                    zero_l).alias(f"t{n}"),
            ]
        row = stage.agg(*aggs)
        zero = F.lit(False)
        log_sum = F.lit(0.0)
        precs = []
        for n in range(1, max_n + 1):
            m = F.col(f"m{n}").cast("double")
            t = F.col(f"t{n}").cast("double")
            if smooth == "add1" and n >= 2:
                p = (m + 1.0) / (t + 1.0)
                zero = zero | (t == 0.0)
            else:
                p = m / t
                zero = zero | (t == 0.0) | (m == 0.0)
            precs.append(
                F.when(t == 0.0, F.lit(0.0)).otherwise(p).alias(f"p{n}"))
            log_sum = log_sum + F.log(p) / max_n
        c_tot = F.col("c_len").cast("double")
        r_tot = F.col("r_len").cast("double")
        bp = F.when(F.col("n_segments") == 0, F.lit(0.0)) \
            .when(c_tot >= r_tot, F.lit(1.0)) \
            .otherwise(F.exp(1.0 - r_tot / c_tot))
        score = F.when((F.col("n_segments") == 0) | zero, F.lit(0.0)) \
            .otherwise(bp * F.exp(log_sum))
        return row.select(
            score.alias("bleu"), bp.alias("bp"),
            F.col("c_len"), F.col("r_len"), F.col("n_segments"),
            *precs)

    return fn


@register_stage("$chrf")
def chrf_stage(expression: Any, ctx: Context) -> StageFn:
    """chrF (Popović 2015): character-n-gram F-score between a
    candidate and a reference in the same row — the eval-family's
    tokenization-free metric (robust to morphology, the standard
    complement to BLEU in MT eval harnesses): ``{candidate,
    reference | references, maxN?, beta?, maxChars?, as?}`` adds the
    chrF score in [0, 1].

    MULTI-REFERENCE (r10): ``references: <expr -> array<string>>``
    scores the candidate against EACH reference independently and
    takes the MAX — the sacrebleu multi-reference convention for chrF
    (best-matching reference wins; statistics are never pooled across
    references).  Null reference ELEMENTS are dropped; a null or
    effectively-empty references array -> null score.  Exactly one of
    ``reference``/``references``; a 1-element array equals the scalar
    form.

    Semantics, pinned precisely: whitespace is REMOVED first (the
    sacrebleu default); for each order n = 1..maxN (default 6),
    ``p_n = clipped/|cand grams|`` and ``r_n = clipped/|ref grams|``
    where clipped is the multiset-intersection count ($ngramOverlap's
    clip at character level); P and R are arithmetic means over the
    EFFECTIVE orders (orders where either side has grams — trailing
    orders longer than both strings don't dilute the average);
    ``chrF = (1+beta^2)PR / (beta^2 P + R)`` with ``beta`` defaulting
    to 2 (chrF2, recall-weighted).  A pair with no effective orders
    (both texts empty) scores 0.0; null in either side -> null.

    FORMULA (r11): ``formula: "popovic"`` (default) follows the
    PAPER's formula (Popović 2015 eq. 1 — average P and average R over
    orders where EITHER side has grams, combined into ONE F);
    ``formula: "sacrebleu"`` reproduces the sacrebleu TOOL's
    convention instead — the per-order F-scores averaged over orders
    where BOTH sides have grams (multiply by 100 to compare against
    sacrebleu's 0-100 reporting).  The whitespace-strip and clipping
    match sacrebleu in both modes.

    chrF++ (r12): ``wordOrder: k`` adds word n-gram orders 1..k to the
    SAME statistics pool (Popović 2017; ``wordOrder: 2`` is the chrF++
    MT papers report, sacrebleu's ``chrF2++``).  Word tokens come from
    the ORIGINAL text (not the whitespace-stripped form) via the
    chrF++.py convention: whitespace words with ONE level of
    edge-punctuation splitting (see :func:`_chrfpp_tokens`);
    ``maxWords`` (default 2000) caps the token array.  With the
    popovic formula the word orders join the P/R averages; with the
    sacrebleu formula they join the per-order-F average — both exactly
    how the respective tools pool the statistics lists.

    ``maxChars`` (default 2000) truncates both sides first — the same
    cost-cap discipline as the word-level family (the clip aggregate
    is O(d·|s|) per order per row).

    100 TB shape: pure JVM HOF column program (regexp strip ->
    substring gram windows -> clip aggregates materialized as temp
    columns), row-local, zero shuffle — identical plan shape to
    $bleu; the multi-reference form adds one nested transform per
    order plus a per-reference score fold, still fully JVM-side."""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$chrf needs exactly one of reference | references")
    max_n = int(expression.get("maxN", 6))
    beta = float(expression.get("beta", 2.0))
    max_chars = int(expression.get("maxChars", 2000))
    as_field = expression.get("as", "chrf")
    # r11: formula "sacrebleu" removes the documented deviation — it
    # averages the PER-ORDER F-scores over orders where BOTH sides
    # have grams (sacrebleu's _compute_f_score, modulo its x100
    # scaling); "popovic" (default) keeps the paper's avg-P/avg-R
    # single-F combination, backward compatible
    formula = expression.get("formula", "popovic")
    if formula not in ("popovic", "sacrebleu"):
        raise ValueError(
            f"$chrf formula must be popovic|sacrebleu, got {formula!r}")
    # r12: chrF++ — wordOrder word n-gram orders join the char orders
    # in the SAME P/R (popovic) or per-order-F (sacrebleu) average,
    # exactly how chrF++.py and sacrebleu pool the statistics lists
    word_order, wmax_words = _check_word_order("$chrf", expression)
    if not 1 <= max_n <= 10:
        raise ValueError("$chrf maxN must be in 1..10")
    if beta <= 0:
        raise ValueError("$chrf beta must be > 0")
    if max_chars < 1:
        raise ValueError("$chrf maxChars must be >= 1")
    b2 = beta * beta

    def char_grams(s: Column, n: int) -> Column:
        # substring/length are CODEPOINT-correct for every n (a
        # lookahead-regex split would cut UTF-16 surrogate pairs —
        # emoji — into broken halves at n=1, caught by the randomized
        # differential); the when-guard also covers the empty string,
        # where the otherwise-branch avoids a phantom "" gram
        ln = F.length(s)
        grams = F.transform(F.sequence(F.lit(1), ln - (n - 1)),
                            lambda i: F.substring(s, i, F.lit(n)))
        return F.when(ln >= n, grams) \
            .otherwise(F.array().cast("array<string>"))

    def one_score(cn_rn_m: list) -> Column:
        """Combine per-order (cand-count, ref-count, clipped) triples
        into one chrF score — shared by the scalar and per-reference
        paths."""
        if formula == "sacrebleu":
            f_sum = F.lit(0.0)
            n_eff = F.lit(0)
            for cn, rn, m in cn_rn_m:
                eff = (cn > 0) & (rn > 0)
                p = m / cn
                r = m / rn
                f_n = F.when(b2 * p + r > 0.0,
                             (1 + b2) * p * r / (b2 * p + r)) \
                    .otherwise(F.lit(0.0))
                f_sum = f_sum + F.when(eff, f_n).otherwise(F.lit(0.0))
                n_eff = n_eff + eff.cast("int")
            return F.when(n_eff == 0, F.lit(0.0)) \
                .otherwise(f_sum / n_eff)
        p_sum = F.lit(0.0)
        r_sum = F.lit(0.0)
        n_eff = F.lit(0)
        for cn, rn, m in cn_rn_m:
            eff = (cn > 0) | (rn > 0)
            p_sum = p_sum + F.when(eff & (cn > 0), m / cn) \
                .otherwise(F.lit(0.0))
            r_sum = r_sum + F.when(eff & (rn > 0), m / rn) \
                .otherwise(F.lit(0.0))
            n_eff = n_eff + eff.cast("int")
        p = p_sum / n_eff
        r = r_sum / n_eff
        return F.when(
            n_eff == 0, F.lit(0.0),
        ).when(p + r == 0.0, F.lit(0.0)) \
            .otherwise((1 + b2) * p * r / (b2 * p + r))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        strip = lambda t: F.substring(  # noqa: E731
            F.regexp_replace(t, r"\s+", ""), 1, max_chars)
        # r14 (guide §1.2, the §2-bootstrap class): dependency-layered
        # withColumns — one analyzer pass per layer over the large
        # clipped-fold trees; identical columns and expressions.
        layer1 = {"__chrf_sc": strip(cand)}
        sc = F.col("__chrf_sc")
        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            layer1["__chrf_srs"] = F.transform(
                F.filter(refs, lambda r: r.isNotNull()), strip)
            srs = F.col("__chrf_srs")
            if word_order > 0:
                # word tokens come from the ORIGINAL (unstripped) texts;
                # the token arrays align index-wise with __chrf_srs
                # because both run the same null filter
                layer1["__chrf_wc"] = _chrfpp_tokens(cand, wmax_words)
                layer1["__chrf_wrs"] = F.transform(
                    F.filter(refs, lambda r: r.isNotNull()),
                    lambda r: _chrfpp_tokens(r, wmax_words))
            stage = df.withColumns(layer1)
            temps = list(layer1)

            def _char_grams_of(_n: int):
                # not default-arg lambdas: F.transform treats a 2-param
                # callable as the (element, index) form
                return lambda s: char_grams(s, _n)

            def _grams_of(_n: int):
                return lambda w: _eval_grams(w, _n)

            def _clip_against(gc_name: str):
                return lambda g: _eval_clipped(F.col(gc_name), g)

            layer2 = {}
            for n in range(1, max_n + 1):
                layer2[f"__chrf_gc{n}"] = char_grams(sc, n)
                # per-reference grams and clips materialize as array
                # temp columns (array<array<string>> / array<long>) —
                # the HOF-CSE rule applied to the multi-ref axis
                layer2[f"__chrf_grs{n}"] = F.transform(
                    srs, _char_grams_of(n))
            for n in range(1, word_order + 1):
                layer2[f"__chrf_wgc{n}"] = _eval_grams(
                    F.col("__chrf_wc"), n)
                layer2[f"__chrf_wgrs{n}"] = F.transform(
                    F.col("__chrf_wrs"), _grams_of(n))
            stage = stage.withColumns(layer2)
            temps += list(layer2)
            layer3 = {}
            for n in range(1, max_n + 1):
                layer3[f"__chrf_ms{n}"] = F.transform(
                    F.col(f"__chrf_grs{n}"),
                    _clip_against(f"__chrf_gc{n}"))
            for n in range(1, word_order + 1):
                layer3[f"__chrf_wms{n}"] = F.transform(
                    F.col(f"__chrf_wgrs{n}"),
                    _clip_against(f"__chrf_wgc{n}"))
            stage = stage.withColumns(layer3)
            temps += list(layer3)

            def ref_score(i: Column) -> Column:
                triples = []
                for n in range(1, max_n + 1):
                    cn = F.size(F.col(f"__chrf_gc{n}")).cast("double")
                    rn = F.size(
                        F.element_at(F.col(f"__chrf_grs{n}"), i)
                    ).cast("double")
                    m = F.element_at(
                        F.col(f"__chrf_ms{n}"), i).cast("double")
                    triples.append((cn, rn, m))
                for n in range(1, word_order + 1):
                    cn = F.size(F.col(f"__chrf_wgc{n}")).cast("double")
                    rn = F.size(
                        F.element_at(F.col(f"__chrf_wgrs{n}"), i)
                    ).cast("double")
                    m = F.element_at(
                        F.col(f"__chrf_wms{n}"), i).cast("double")
                    triples.append((cn, rn, m))
                return one_score(triples)

            # best-matching reference wins (sacrebleu multi-ref: max)
            score = F.array_max(
                F.transform(F.sequence(F.lit(1), F.size(srs)),
                            ref_score))
            null_in = cand.isNull() | refs.isNull() | (F.size(srs) == 0)
        else:
            ref = compile_expr(ref_e, sctx)
            layer1["__chrf_sr"] = strip(ref)
            sr = F.col("__chrf_sr")
            if word_order > 0:
                layer1["__chrf_wc"] = _chrfpp_tokens(cand, wmax_words)
                layer1["__chrf_wr"] = _chrfpp_tokens(ref, wmax_words)
            stage = df.withColumns(layer1)
            temps = list(layer1)
            layer2 = {}
            for n in range(1, max_n + 1):
                layer2[f"__chrf_gc{n}"] = char_grams(sc, n)
                layer2[f"__chrf_gr{n}"] = char_grams(sr, n)
            for n in range(1, word_order + 1):
                layer2[f"__chrf_wgc{n}"] = _eval_grams(
                    F.col("__chrf_wc"), n)
                layer2[f"__chrf_wgr{n}"] = _eval_grams(
                    F.col("__chrf_wr"), n)
            stage = stage.withColumns(layer2)
            temps += list(layer2)
            layer3 = {}
            for n in range(1, max_n + 1):
                layer3[f"__chrf_m{n}"] = _eval_clipped(
                    F.col(f"__chrf_gc{n}"), F.col(f"__chrf_gr{n}"))
            for n in range(1, word_order + 1):
                layer3[f"__chrf_wm{n}"] = _eval_clipped(
                    F.col(f"__chrf_wgc{n}"), F.col(f"__chrf_wgr{n}"))
            stage = stage.withColumns(layer3)
            temps += list(layer3)
            triples = [
                (F.size(F.col(f"__chrf_gc{n}")).cast("double"),
                 F.size(F.col(f"__chrf_gr{n}")).cast("double"),
                 F.col(f"__chrf_m{n}").cast("double"))
                for n in range(1, max_n + 1)]
            triples += [
                (F.size(F.col(f"__chrf_wgc{n}")).cast("double"),
                 F.size(F.col(f"__chrf_wgr{n}")).cast("double"),
                 F.col(f"__chrf_wm{n}").cast("double"))
                for n in range(1, word_order + 1)]
            score = one_score(triples)
            null_in = cand.isNull() | ref.isNull()
        out = F.when(null_in, F.lit(None).cast("double")) \
            .otherwise(score)
        return stage.withColumn(as_field, out).drop(*temps)

    return fn


_CHRFPP_PUNCT = r"[\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e]"


def _chrfpp_tokens(t: Column, max_words: int) -> Column:
    """chrF++ word tokenization (Popović 2017, chrF++.py
    ``separate_punctuation``, which sacrebleu adapts for its
    ``word_order`` statistics): whitespace words, then ONE level of
    edge-punctuation splitting — a word longer than one char whose LAST
    char is punctuation splits into (head, punct); else whose FIRST
    char is punctuation splits into (punct, tail); interior punctuation
    stays attached and the split never recurses ("(word)" ->
    ["(word", ")"], exactly the reference script's quirk).  Punctuation
    is ASCII ``string.punctuation``, written as hex ranges for
    Java/RE2/Python three-way parity."""
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != F.lit(""))

    def split_word(w: Column) -> Column:
        ln = F.length(w)
        first = F.substring(w, 1, 1)
        last = F.substring(w, -1, 1)
        return (
            F.when((ln > 1) & last.rlike(_CHRFPP_PUNCT),
                   F.array(F.substring(w, F.lit(1), ln - 1), last))
            .when((ln > 1) & first.rlike(_CHRFPP_PUNCT),
                  F.array(first, F.substring(w, F.lit(2), ln - 1)))
            .otherwise(F.array(w)))

    return F.slice(F.flatten(F.transform(words, split_word)), 1, max_words)


def _check_word_order(stage: str, expression: dict) -> tuple[int, int]:
    """Validate the chrF++ options: ``wordOrder`` (default 0 = plain
    chrF; 2 = chrF++ as reported by MT papers) and the word-side cost
    cap ``maxWords`` (default 2000, like the BLEU family)."""
    word_order = int(expression.get("wordOrder", 0))
    max_words = int(expression.get("maxWords", 2000))
    if not 0 <= word_order <= 4:
        raise ValueError(f"{stage} wordOrder must be in 0..4")
    if max_words < 1:
        raise ValueError(f"{stage} maxWords must be >= 1")
    return word_order, max_words


_QA_PUNCT = r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""


@register_stage("$qaEval")
def qa_eval_stage(expression: Any, ctx: Context) -> StageFn:
    """SQuAD-style QA eval (Rajpurkar et al. 2016): ``{prediction,
    answers, as?}`` adds ``struct<exact_match, f1>`` scored against an
    array of gold answers — THE standard extractive-QA / closed-book
    eval pair.

    Normalization, pinned to the official SQuAD script with ONE
    portability deviation: lowercase, strip ASCII punctuation, split on
    whitespace (Java ``\\s``), then drop the articles a/an/the as
    standalone TOKENS.  The script drops articles with a regex
    ``\\b``-boundary — but Java, RE2 (the DuckDB oracle) and Python
    each draw word boundaries differently around characters like ½, so
    the token-level drop is the engine-portable semantic; on natural
    text (articles separated by spaces/punctuation) the two agree.
    ``exact_match`` = 1.0 if the normalized prediction
    equals ANY normalized answer; ``f1`` = the MAX over answers of the
    token-level F1 (clipped multiset overlap of whitespace tokens —
    the same clip as $ngramOverlap at n=1).  Both-empty after
    normalization counts as a match (EM 1, F1 1), matching the official
    script's handling of empty answers.  Null prediction or null
    answers array -> null struct; null answer ELEMENTS are dropped; an
    effectively-empty answers array -> null struct.

    100 TB shape: pure JVM HOF column program — normalization is three
    regexp passes, the per-answer overlap is a nested transform +
    clip aggregate over a handful of gold answers; row-local, zero
    shuffle."""
    pred_e = expression["prediction"]
    ans_e = expression["answers"]
    as_field = expression.get("as", "qa")
    _T = "struct<exact_match:double,f1:double>"

    def norm(t: Column) -> Column:
        lowered = F.lower(t)
        no_punct = F.regexp_replace(lowered, _QA_PUNCT, "")
        toks = F.filter(F.split(F.trim(no_punct), r"\s+"),
                        lambda x: x != F.lit(""))
        return F.filter(
            toks,
            lambda x: ~x.isin("a", "an", "the"))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        sctx = ExprContext(schema=df.schema)
        pred = compile_expr(pred_e, sctx)
        answers = compile_expr(ans_e, sctx)
        temps = ["__qa_p", "__qa_as"]
        stage = df.withColumn("__qa_p", norm(pred)).withColumn(
            "__qa_as",
            F.transform(F.filter(answers, lambda a: a.isNotNull()),
                        lambda a: norm(a)))
        tp, tas = F.col("__qa_p"), F.col("__qa_as")
        em = F.exists(
            tas, lambda ta: F.array_join(ta, " ") == F.array_join(tp, " "),
        ).cast("double")

        def f1_one(ta: Column) -> Column:
            m = F.aggregate(
                F.array_distinct(tp), F.lit(0).cast("long"),
                lambda acc, g: acc + F.least(
                    F.size(F.filter(tp, lambda x: x == g)),
                    F.size(F.filter(ta, lambda x: x == g)),
                ).cast("long")).cast("double")
            np_, na = F.size(tp).cast("double"), F.size(ta).cast("double")
            # official script: if either side is empty, F1 is 1 when
            # both are empty else 0
            both_empty = (np_ == 0) & (na == 0)
            p = F.when(np_ > 0, m / np_).otherwise(F.lit(0.0))
            r = F.when(na > 0, m / na).otherwise(F.lit(0.0))
            f = F.when(both_empty, F.lit(1.0)).when(
                p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
            return f

        f1 = F.array_max(F.transform(tas, f1_one))
        st = F.struct(em.alias("exact_match"), f1.alias("f1"))
        null_st = F.lit(None).cast(_T)
        out = F.when(
            pred.isNull() | answers.isNull() | (F.size(tas) == 0),
            null_st).otherwise(st)
        return stage.withColumn(as_field, out).drop(*temps)

    return fn


@register_stage("$chrfCorpus")
def chrf_corpus_stage(expression: Any, ctx: Context) -> StageFn:
    """CORPUS-level chrF: ``{candidate, reference, maxN?, beta?,
    maxChars?}`` -> ONE row ``(chrf, n_segments, p1..p<maxN>,
    r1..r<maxN>)``.  The AGGREGATION SHAPE matches sacrebleu's
    corpus_chrf — sum the per-segment n-gram statistics corpus-wide,
    THEN score (the mean of sentence chrF is a different, noisier
    statistic) — but the final SCORING FORMULA follows the Popović
    2015 paper like $chrf (average P and average R over effective
    orders -> one F; an order counts as effective when EITHER side has
    grams corpus-wide), so corpus numbers will not reproduce
    sacrebleu's corpus_chrf exactly.  Per order, corpus
    precision/recall = summed clipped matches / summed candidate
    (resp. reference) gram counts; F_beta with beta = 2 default.
    Segments with a null side are EXCLUDED.  Corpus-only gated like
    $bleuCorpus/$profile.

    100 TB shape: per-segment clips are $chrf's row-local zero-shuffle
    HOF programs; the reduction is ONE global partial-aggregated sum to
    a single 3·maxN+1-long row."""
    cand_e = expression["candidate"]
    ref_e = expression["reference"]
    max_n = int(expression.get("maxN", 6))
    beta = float(expression.get("beta", 2.0))
    max_chars = int(expression.get("maxChars", 2000))
    # r11: formula "sacrebleu" = per-order F over POOLED counts,
    # averaged over orders where both pooled sides have grams —
    # exactly sacrebleu's corpus chrF (its statistics pool across
    # segments before one _compute_f_score), modulo the x100 scaling
    formula = expression.get("formula", "popovic")
    if formula not in ("popovic", "sacrebleu"):
        raise ValueError(
            f"$chrfCorpus formula must be popovic|sacrebleu, "
            f"got {formula!r}")
    # r12 chrF++: word n-gram orders pool corpus-wide exactly like the
    # char orders (sacrebleu's corpus chrF2++ sums word-gram statistics
    # across segments before one _compute_f_score); adds wp{n}/wr{n}
    # output columns only when wordOrder > 0, so the default schema is
    # unchanged
    word_order, wmax_words = _check_word_order("$chrfCorpus", expression)
    if not 1 <= max_n <= 10:
        raise ValueError("$chrfCorpus maxN must be in 1..10")
    if beta <= 0:
        raise ValueError("$chrfCorpus beta must be > 0")
    if max_chars < 1:
        raise ValueError("$chrfCorpus maxChars must be >= 1")
    b2 = beta * beta

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        from ..operators.extended import _corpus_only

        _corpus_only("$chrfCorpus", c)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        ref = compile_expr(ref_e, sctx)
        strip = lambda t: F.substring(  # noqa: E731
            F.regexp_replace(t, r"\s+", ""), 1, max_chars)

        def char_grams(s: Column, n: int) -> Column:
            ln = F.length(s)
            grams = F.transform(F.sequence(F.lit(1), ln - (n - 1)),
                                lambda i: F.substring(s, i, F.lit(n)))
            return F.when(ln >= n, grams) \
                .otherwise(F.array().cast("array<string>"))

        # r14 (guide §1.2, the §2-bootstrap class): dependency-layered
        # withColumns — one analyzer pass per layer over the large
        # clipped-fold trees instead of ~20 (measured 4.0 s of plan
        # build at bench config); identical columns and expressions.
        layer1 = {"__chc_sc": strip(cand), "__chc_sr": strip(ref)}
        if word_order > 0:
            layer1["__chc_wc"] = _chrfpp_tokens(cand, wmax_words)
            layer1["__chc_wr"] = _chrfpp_tokens(ref, wmax_words)
        stage = df.filter(cand.isNotNull() & ref.isNotNull()) \
            .withColumns(layer1)
        sc, sr = F.col("__chc_sc"), F.col("__chc_sr")
        layer2 = {}
        for n in range(1, max_n + 1):
            layer2[f"__chc_gc{n}"] = char_grams(sc, n)
            layer2[f"__chc_gr{n}"] = char_grams(sr, n)
        for n in range(1, word_order + 1):
            layer2[f"__chc_wgc{n}"] = _eval_grams(F.col("__chc_wc"), n)
            layer2[f"__chc_wgr{n}"] = _eval_grams(F.col("__chc_wr"), n)
        stage = stage.withColumns(layer2)
        layer3 = {}
        for n in range(1, max_n + 1):
            layer3[f"__chc_m{n}"] = _eval_clipped(
                F.col(f"__chc_gc{n}"), F.col(f"__chc_gr{n}"))
        for n in range(1, word_order + 1):
            layer3[f"__chc_wm{n}"] = _eval_clipped(
                F.col(f"__chc_wgc{n}"), F.col(f"__chc_wgr{n}"))
        stage = stage.withColumns(layer3)
        zero_l = F.lit(0).cast("long")
        aggs = [F.count(F.lit(1)).alias("n_segments")]
        # (sum-column, cand-total, ref-total, output-prefix) per order:
        # char orders then word orders — the chrF++ statistics pool
        orders = [(f"__chc_m{n}", f"__chc_gc{n}", f"__chc_gr{n}",
                   f"m{n}", f"tc{n}", f"tr{n}", f"p{n}", f"r{n}")
                  for n in range(1, max_n + 1)]
        orders += [(f"__chc_wm{n}", f"__chc_wgc{n}", f"__chc_wgr{n}",
                    f"wm{n}", f"wtc{n}", f"wtr{n}", f"wp{n}", f"wr{n}")
                   for n in range(1, word_order + 1)]
        for m_c, gc_c, gr_c, m_a, tc_a, tr_a, _p, _r in orders:
            aggs += [
                F.coalesce(F.sum(F.col(m_c)), zero_l).alias(m_a),
                F.coalesce(F.sum(F.size(F.col(gc_c))
                                 .cast("long")), zero_l).alias(tc_a),
                F.coalesce(F.sum(F.size(F.col(gr_c))
                                 .cast("long")), zero_l).alias(tr_a),
            ]
        row = stage.agg(*aggs)
        p_sum = F.lit(0.0)
        r_sum = F.lit(0.0)
        f_sum = F.lit(0.0)
        n_eff = F.lit(0)
        outs = []
        for _m_c, _gc_c, _gr_c, m_a, tc_a, tr_a, p_a, r_a in orders:
            m = F.col(m_a).cast("double")
            tc = F.col(tc_a).cast("double")
            tr = F.col(tr_a).cast("double")
            p = F.when(tc > 0, m / tc).otherwise(F.lit(0.0))
            r = F.when(tr > 0, m / tr).otherwise(F.lit(0.0))
            if formula == "sacrebleu":
                eff = (tc > 0) & (tr > 0)
                pd_, rd_ = m / tc, m / tr
                f_n = F.when(b2 * pd_ + rd_ > 0.0,
                             (1 + b2) * pd_ * rd_ / (b2 * pd_ + rd_)) \
                    .otherwise(F.lit(0.0))
                f_sum = f_sum + F.when(eff, f_n).otherwise(F.lit(0.0))
            else:
                eff = (tc > 0) | (tr > 0)
                p_sum = p_sum + F.when(eff, p).otherwise(F.lit(0.0))
                r_sum = r_sum + F.when(eff, r).otherwise(F.lit(0.0))
            n_eff = n_eff + eff.cast("int")
            outs += [p.alias(p_a), r.alias(r_a)]
        if formula == "sacrebleu":
            score = F.when(n_eff == 0, F.lit(0.0)) \
                .otherwise(f_sum / n_eff)
        else:
            pavg = p_sum / n_eff
            ravg = r_sum / n_eff
            score = F.when(n_eff == 0, F.lit(0.0)) \
                .when(pavg + ravg == 0.0, F.lit(0.0)) \
                .otherwise((1 + b2) * pavg * ravg / (b2 * pavg + ravg))
        return row.select(score.alias("chrf"), F.col("n_segments"), *outs)

    return fn


_WER_TYPE = "struct<distance:bigint,wer:double,n_hyp:bigint,n_ref:bigint>"

def _make_wer_scorers(max_words: int):
    """(score_one, score_multi) closures for the $wer family's Arrow
    boundary.  Defined INSIDE a factory so cloudpickle serializes them
    by value — executors never need this package importable (the
    engine's standing driver-side-only deployment property; a
    module-level helper would pickle by reference and break
    sys.path-based runs).

    score_multi scores against each reference and the BEST reference
    wins — smallest WER, ties broken by smallest distance then
    smallest reference length (the NIST multi-reference convention:
    error-count of the best-matching reference).  A reference with
    undefined WER (empty reference, non-empty hypothesis) sorts after
    every defined one, so it is chosen only when ALL references are
    undefined (then wer is null with the smallest distance still
    reported).  Returns None (null struct) for a null hypothesis or
    no usable references."""
    import re as _re

    ws_split = _re.compile(r"[ \t\n\r\f\x0b]+").split  # Java \s

    def lev(a: list, b: list) -> int:
        # two-row DP, rows over the shorter side for O(min) memory
        if len(a) < len(b):
            a, b = b, a
        if not b:
            return len(a)
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            cur = [i]
            append = cur.append
            for j, y in enumerate(b, 1):
                append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (x != y)))
            prev = cur
        return prev[-1]

    def score_one(ct, rt):
        wc = [w for w in ws_split(ct) if w][:max_words]
        wr = [w for w in ws_split(rt) if w][:max_words]
        d = lev(wc, wr)
        if wr:
            w = d / len(wr)
        else:
            w = 0.0 if not wc else None
        return (d, w, len(wc), len(wr))

    def score_multi(ct, refs):
        if ct is None:
            return None
        refs = [r for r in refs if r is not None]
        if not refs:
            return None
        best = None
        for rt in refs:
            d, w, nh, nr = score_one(ct, rt)
            key = (w if w is not None else float("inf"), d, nr)
            if best is None or key < best[0]:
                best = (key, (d, w, nh, nr))
        return best[1]

    return score_one, score_multi


@register_stage("$wer")
def wer_stage(expression: Any, ctx: Context) -> StageFn:
    """Word error rate (the standard ASR / MT edit metric):
    ``{candidate, reference | references, maxWords?, as?}`` adds
    ``struct<distance, wer, n_hyp, n_ref>`` where ``distance`` is the
    word-level Levenshtein distance (unit costs for substitution/
    insertion/deletion) between the candidate (hypothesis) and the
    reference, and ``wer = distance / n_ref``.  Same Java-\\s
    tokenization as the rest of the eval family.  An empty reference
    gives wer 0.0 when the hypothesis is also empty, else null wer
    with the distance still reported (the conventional undefined case,
    surfaced rather than faked).  Null in either side -> null struct.

    MULTI-REFERENCE (r10): ``references: <expr -> array<string>>``
    scores against each reference and reports the BEST — minimum WER,
    ties by minimum distance then minimum reference length (the NIST
    convention; see :func:`_make_wer_scorers`).  Null reference
    ELEMENTS are
    dropped; a null or effectively-empty array -> null struct.
    Exactly one of ``reference``/``references``.

    Levenshtein needs a dynamic program (no closed column form), so
    like ``$rougeL`` this is an Arrow-batched Pandas UDF — the eval
    family's documented Python boundary (row-local, zero shuffle).
    ``maxWords`` (default 2000) truncates BOTH sides first: the DP is
    O(|c|·|r|) per row (times the number of references).

    ``caseSensitive: false`` (r11) lowercases both sides first — the
    usual ASR scoring convention; the default stays case-sensitive
    (backward compatible).

    (Spark's builtin ``levenshtein`` is character-level; WER is defined
    over words, hence the DP here.)"""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$wer needs exactly one of reference | references")
    max_words = int(expression.get("maxWords", 2000))
    case_sensitive = bool(expression.get("caseSensitive", True))
    as_field = expression.get("as", "wer")
    if max_words < 1:
        raise ValueError("$wer maxWords must be >= 1")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        if not case_sensitive:
            cand = F.lower(cand)
        score_one, score_multi = _make_wer_scorers(max_words)

        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            if not case_sensitive:
                refs = F.transform(refs, F.lower)

            @F.pandas_udf(_WER_TYPE)
            def _wer(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                vals = [
                    None if rs is None
                    else score_multi(ct, list(rs))
                    for ct, rs in zip(s, t)
                ]
                return pd.DataFrame(
                    [(None, None, None, None) if v is None else v
                     for v in vals],
                    columns=["distance", "wer", "n_hyp", "n_ref"])

            out = _wer(cand, refs)
            null_guard = cand.isNull() | refs.isNull()
        else:
            ref = compile_expr(ref_e, sctx)
            if not case_sensitive:
                ref = F.lower(ref)

            @F.pandas_udf(_WER_TYPE)
            def _wer(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                vals = [
                    None if ct is None or rt is None
                    else score_one(ct, rt)
                    for ct, rt in zip(s, t)
                ]
                return pd.DataFrame(
                    [(None, None, None, None) if v is None else v
                     for v in vals],
                    columns=["distance", "wer", "n_hyp", "n_ref"])

            out = _wer(cand, ref)
            null_guard = cand.isNull() | ref.isNull()
        null_st = F.lit(None).cast(_WER_TYPE)
        stage = df.withColumn("__wer_raw", out)
        raw = F.col("__wer_raw")
        return stage.withColumn(
            as_field,
            F.when(null_guard | raw["n_hyp"].isNull(), null_st)
            .otherwise(raw),
        ).drop("__wer_raw")

    return fn


@register_stage("$werCorpus")
def wer_corpus_stage(expression: Any, ctx: Context) -> StageFn:
    """CORPUS-level word error rate — TOTAL edit distance over TOTAL
    reference words (how ASR harnesses report WER; the mean of
    per-utterance WERs over-weights short references): ``{candidate,
    reference | references, maxWords?}`` -> ONE row ``(wer, distance,
    n_hyp, n_ref, n_segments)``.

    Per segment the edit distance and reference length come from
    :func:`_make_wer_scorers` — single reference directly, multiple
    references via the best-matching reference (min WER, NIST
    convention) — and the corpus sums those, then divides once.
    Segments with a null hypothesis or no usable reference are
    EXCLUDED from every sum (and from n_segments).  A corpus whose
    total reference length is 0 reports wer 0.0 when the total
    distance is also 0, else null wer (the undefined case, surfaced
    like $wer's).

    CORPUS-ONLY: gated exactly like $bleuCorpus/$chrfCorpus — inside a
    foreachBatch re-entry it would silently score one micro-batch and
    label it the corpus WER.

    100 TB shape: the per-segment DP runs on the same Arrow-batched
    boundary as $wer (row-local, zero shuffle, maxWords-capped); the
    reduction is ONE global partial-aggregated sum to a single 5-long
    row — the $bleuCorpus shape."""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$werCorpus needs exactly one of reference | references")
    max_words = int(expression.get("maxWords", 2000))
    case_sensitive = bool(expression.get("caseSensitive", True))
    if max_words < 1:
        raise ValueError("$werCorpus maxWords must be >= 1")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        from ..operators.extended import _corpus_only

        _corpus_only("$werCorpus", c)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        if not case_sensitive:
            cand = F.lower(cand)
        score_one, score_multi = _make_wer_scorers(max_words)

        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            if not case_sensitive:
                refs = F.transform(refs, F.lower)

            @F.pandas_udf(_WER_TYPE)
            def _wer(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                vals = [
                    None if rs is None
                    else score_multi(ct, list(rs))
                    for ct, rs in zip(s, t)
                ]
                return pd.DataFrame(
                    [(None, None, None, None) if v is None else v
                     for v in vals],
                    columns=["distance", "wer", "n_hyp", "n_ref"])

            raw = _wer(cand, refs)
        else:
            ref = compile_expr(ref_e, sctx)
            if not case_sensitive:
                ref = F.lower(ref)

            @F.pandas_udf(_WER_TYPE)
            def _wer(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                vals = [
                    None if ct is None or rt is None
                    else score_one(ct, rt)
                    for ct, rt in zip(s, t)
                ]
                return pd.DataFrame(
                    [(None, None, None, None) if v is None else v
                     for v in vals],
                    columns=["distance", "wer", "n_hyp", "n_ref"])

            raw = _wer(cand, ref)
        # r13: NO not-null .filter on the UDF column — pushdown moved
        # it below the fan-out exchange and ExtractPythonUDFs then
        # materialized a SECOND, single-task ArrowEvalPython at the
        # scan (the whole per-segment DP ran twice, once serial).
        # Excluded segments return an all-null struct, so count(col)
        # and null-skipping sums compute the identical exclusion.
        stage = df.withColumn("__wrc", raw)
        zero_l = F.lit(0).cast("long")
        row = stage.agg(
            F.count("__wrc.n_hyp").alias("n_segments"),
            F.coalesce(F.sum("__wrc.distance"), zero_l).alias("distance"),
            F.coalesce(F.sum("__wrc.n_hyp"), zero_l).alias("n_hyp"),
            F.coalesce(F.sum("__wrc.n_ref"), zero_l).alias("n_ref"),
        )
        d_tot = F.col("distance").cast("double")
        r_tot = F.col("n_ref").cast("double")
        wer = F.when(F.col("n_ref") > 0, d_tot / r_tot) \
            .when(F.col("distance") == 0, F.lit(0.0)) \
            .otherwise(F.lit(None).cast("double"))
        return row.select(
            wer.alias("wer"), F.col("distance"), F.col("n_hyp"),
            F.col("n_ref"), F.col("n_segments"))

    return fn


_TER_TYPE = ("struct<edits:bigint,ter:double,shifts:bigint,"
             "n_hyp:bigint,n_ref:bigint>")


def _make_ter_scorers(max_words: int, max_shift_size: int,
                      max_shift_dist: int):
    """(score_one, score_multi) closures for the $ter family's Arrow
    boundary (factory pattern = cloudpickle-by-value, exactly like
    :func:`_make_wer_scorers`).

    Translation Edit Rate (Snover et al. 2006, "A Study of Translation
    Edit Rate with Targeted Human Annotation"): minimum number of word
    edits — insertions, deletions, substitutions, plus phrase SHIFTS
    (moving a contiguous span counts as ONE edit) — normalized by the
    reference length.  Like tercom, the shift search is GREEDY: each
    round applies the shift that most reduces the remaining word edit
    distance, until no shift strictly reduces it; ``edits = shifts +
    remaining distance``.

    PINNED SEMANTICS (a documented simplification of tercom's
    exhaustive sub-span search — differential-tested against an
    independent implementation of the same rules):

    - a shift candidate is the MAXIMAL matching span: for each
      hypothesis position i and each reference occurrence k of
      ``hyp[i]``, the span extends while words match, capped at
      ``maxShiftSize`` (default 10, the tercom cap);
    - the span is removed and reinserted to START at index
      ``min(k, len(rest))`` of the remaining sequence (aligning it
      with its reference occurrence); candidates with ``|i - k| >
      maxShiftDistance`` (default 50, the tercom cap) or that land in
      place are skipped;
    - the greedy round picks the smallest resulting distance, ties
      broken by smallest i then smallest k (first-found under the
      scan order);
    - candidate distances are evaluated with the Myers bit-parallel
      Levenshtein (exact integers) under an exact best-so-far cutoff,
      so losing candidates abandon in O(n·ceil(m/64)) word ops; rounds
      that provably end in a zero-distance shift skip the candidate
      scan outright (r14, see _zero_shift_round).

    ``maxWords`` defaults to 250 (not 2000): the greedy search is
    O(candidates · n · dist) per round — quadratic-ish where $wer is
    one DP — and 250 words is the sentence/segment regime TER is
    defined for.  score_multi picks the best reference by (ter, edits,
    n_ref) — the same NIST convention as $wer."""
    import re as _re
    from collections import defaultdict as _dd

    ws_split = _re.compile(r"[ \t\n\r\f\x0b]+").split  # Java \s

    def _myers_tables(wr: list):
        """(PM, m, mask, top) for bit-parallel Levenshtein against the
        FIXED word list ``wr`` — built once per segment and reused by
        every candidate evaluation of every greedy round (r14).  PM
        maps word -> bitmask of its positions in wr."""
        m = len(wr)
        PM: dict = {}
        bit = 1
        for w in wr:
            PM[w] = PM.get(w, 0) | bit
            bit <<= 1
        return PM, m, bit - 1, (1 << (m - 1)) if m else 0

    def myers_lev(text: list, wr: list, PM: dict, m: int, mask: int,
                  top: int, limit: int) -> int:
        """Exact ``lev(text, wr)`` if <= limit, else limit + 1.

        Myers 1999 bit-parallel edit distance in the Hyyrö 2001
        "distance computation" variant (carry-in 1 on the horizontal
        positive vector = the first DP column i).  Exact unit-cost
        Levenshtein — same integers as the classic DP (randomized
        differential pinned in tests/test_eval_properties.py).  The
        early abandon is exact too: the tracked score is D[i][m] and a
        text word changes it by at most 1, so score - remaining is a
        lower bound on the final distance (r13's banded row-min cutoff
        had the same contract at O(n*limit) interpreted cell ops; this
        is O(n * ceil(m/64)) word ops)."""
        lt = len(text)
        if limit < 0:
            # nothing can qualify; only equality is "within" a
            # negative limit (callers never accept the result anyway)
            return 0 if text == wr else limit + 1
        big = limit + 1
        if abs(lt - m) > limit:
            return big
        if m == 0:
            return lt  # <= limit (the abs guard above caught the rest)
        VP = mask
        VN = 0
        score = m
        rem = lt
        get = PM.get
        for c in text:
            rem -= 1
            Eq = get(c, 0)
            Xv = Eq | VN
            Xh = (((Eq & VP) + VP) ^ VP) | Eq
            Ph = VN | ~(Xh | VP)
            Mh = VP & Xh
            if Ph & top:
                score += 1
                if score - rem > limit:
                    return big
            elif Mh & top:
                score -= 1
            Ph = (Ph << 1) | 1
            VP = ((Mh << 1) | ~(Xv | Ph)) & mask
            VN = Ph & Xv
        return score if score <= limit else big

    def _zero_shift_round(hyp: list, wr: list) -> bool:
        """True iff a VALID zero-distance shift candidate provably
        exists: some (i, k) under the pinned candidate rules whose
        shifted sequence equals wr exactly (r14, O(window * shiftSize)).

        Soundness is the load-bearing property — on True the caller
        takes the round as (shifts + 1, base = 0), which is outcome-
        identical to the scan accepting ANY zero-distance candidate:
        the round ends, base = 0 exits the greedy loop, and the
        returned (edits, shifts, remaining) triple does not depend on
        WHICH zero candidate was applied.  Completeness is not
        required: only the two canonical single-block-move forms
        (moved block flush at one end of the mismatch window [p, q])
        are checked, and a miss just falls through to the full scan.
        """
        n = len(hyp)  # == len(wr), checked by the caller
        p = 0
        while p < n and hyp[p] == wr[p]:
            p += 1
        if p == n:
            return False  # equal sequences (base > 0 rules this out)
        q = n - 1
        while hyp[q] == wr[q]:
            q -= 1
        width = q + 1 - p
        wp = wr[p]
        hp = hyp[p]
        for L in range(1, min(width - 1, max_shift_size) + 1):
            # LEFT move: span hyp[i:i+L] at i = q+1-L reinserts at
            # at = k = p.  Needs B: hyp[q+1-L:q+1] == wr[p:p+L] and
            # A: hyp[p:q+1-L] == wr[p+L:q+1]; the maximal-match rule
            # must stop the span at exactly L; |i - k| <= shift dist.
            if (wr[p + L] == hp and hyp[q + 1 - L] == wp
                    and q + 1 - L - p <= max_shift_dist
                    and (L == max_shift_size or q + 1 == n
                         or hyp[q + 1] != wr[p + L])
                    and hyp[q + 1 - L:q + 1] == wr[p:p + L]
                    and hyp[p:q + 1 - L] == wr[p + L:q + 1]):
                return True
            # RIGHT move: span hyp[p:p+L] reinserts at at = k = q+1-L.
            # Needs B: hyp[p:p+L] == wr[q+1-L:q+1] and
            # A: hyp[p+L:q+1] == wr[p:q+1-L]; same maximality/dist.
            if (hyp[p + L] == wp and wr[q + 1 - L] == hp
                    and q + 1 - L - p <= max_shift_dist
                    and (L == max_shift_size or q + 1 == n
                         or hyp[p + L] != wr[q + 1])
                    and hyp[p:p + L] == wr[q + 1 - L:q + 1]
                    and hyp[p + L:q + 1] == wr[p:q + 1 - L]):
                return True
        return False

    def ter_edits(wc: list, wr: list):
        """(edits, shifts, remaining) for capped word lists."""
        hyp = wc
        PM, m, mask, top = _myers_tables(wr)
        base = myers_lev(hyp, wr, PM, m, mask, top, len(hyp) + m)
        shifts = 0
        if not wr:
            return base, 0, base
        pos = _dd(list)
        for k, w in enumerate(wr):
            pos[w].append(k)
        n_h = len(hyp)  # shifts preserve the hypothesis length
        while base > 0:
            # r14: when the round provably ends in a zero-distance
            # shift (single-block-move rounds — see _zero_shift_round
            # for the outcome-identity argument), skip the candidate
            # scan entirely; the dominant workload shape (rotations /
            # one displaced span) resolves every round here.
            if n_h == m and _zero_shift_round(hyp, wr):
                shifts += 1
                base = 0
                break
            limit = base - 1
            best = None
            # r13, both loops exact-preserving:
            # - seen-set: distinct (i, k) pairs often build the SAME
            #   shifted sequence (repeated words); a duplicate's
            #   distance equals the first evaluation's, and best only
            #   updates on d <= limit = best_d - 1 (strict improvement),
            #   so skipping duplicates can never change the greedy pick
            #   or its first-found tie-break.
            # - limit < 0 break: once a zero-distance shift is found no
            #   candidate can satisfy d <= -1, so the remaining scan
            #   only built O(n) lists to throw away (the dominant cost
            #   of long-doc rounds that end in a perfect shift).
            seen = set()
            for i, w in enumerate(hyp):
                if limit < 0:
                    break
                for k in pos.get(w, ()):
                    if abs(i - k) > max_shift_dist:
                        continue
                    l = 1
                    while (i + l < len(hyp) and k + l < len(wr)
                           and l < max_shift_size
                           and hyp[i + l] == wr[k + l]):
                        l += 1
                    rest = hyp[:i] + hyp[i + l:]
                    at = min(k, len(rest))
                    if at == i:
                        continue
                    cand = rest[:at] + hyp[i:i + l] + rest[at:]
                    key = tuple(cand)
                    if key in seen:
                        continue
                    seen.add(key)
                    d = myers_lev(cand, wr, PM, m, mask, top, limit)
                    if d <= limit:
                        best = (d, cand)
                        limit = d - 1
                        if limit < 0:
                            break
                if best is not None and best[0] == 0:
                    break
            if best is None:
                break
            shifts += 1
            base, hyp = best
        return shifts + base, shifts, base

    def score_one(ct, rt):
        wc = [w for w in ws_split(ct) if w][:max_words]
        wr = [w for w in ws_split(rt) if w][:max_words]
        edits, shifts, _ = ter_edits(wc, wr)
        if wr:
            t = edits / len(wr)
        else:
            t = 0.0 if not wc else None
        return (edits, t, shifts, len(wc), len(wr))

    def score_multi(ct, refs):
        if ct is None:
            return None
        refs = [r for r in refs if r is not None]
        if not refs:
            return None
        best = None
        for rt in refs:
            e, t, sh, nh, nr = score_one(ct, rt)
            key = (t if t is not None else float("inf"), e, nr)
            if best is None or key < best[0]:
                best = (key, (e, t, sh, nh, nr))
        return best[1]

    return score_one, score_multi


@register_stage("$ter")
def ter_stage(expression: Any, ctx: Context) -> StageFn:
    """Translation Edit Rate (Snover 2006) — the third metric of the
    sacrebleu BLEU/chrF/TER triple: ``{candidate, reference |
    references, maxWords?, maxShiftSize?, maxShiftDistance?, as?}``
    adds a struct ``(edits, ter, shifts, n_hyp, n_ref)``.  A shift of
    a contiguous phrase counts as ONE edit; see
    :func:`_make_ter_scorers` for the pinned greedy-shift semantics
    and the deliberate deviations from tercom.  Null in either side ->
    null struct; empty reference with non-empty hypothesis -> null
    ter with edits still reported (the $wer convention).

    MULTI-REFERENCE: best reference by (ter, edits, n_ref) — NIST.
    ``caseSensitive: false`` lowercases both sides first (sacrebleu
    TER's default; ours defaults to case-sensitive like $wer).

    100 TB shape: row-local on the $wer Arrow boundary, zero shuffle;
    the greedy search is capped by maxWords (default 250) /
    maxShiftSize (10) / maxShiftDistance (50) — the tercom caps."""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError("$ter needs exactly one of reference | references")
    max_words = int(expression.get("maxWords", 250))
    max_shift_size = int(expression.get("maxShiftSize", 10))
    max_shift_dist = int(expression.get("maxShiftDistance", 50))
    # sacrebleu's TER lowercases by default (case_sensitive=False);
    # ours defaults to case-sensitive like $wer — caseSensitive: false
    # opts into the sacrebleu behavior (F.lower on both sides, JVM)
    case_sensitive = bool(expression.get("caseSensitive", True))
    as_field = expression.get("as", "ter")
    if max_words < 1:
        raise ValueError("$ter maxWords must be >= 1")
    if max_shift_size < 1:
        raise ValueError("$ter maxShiftSize must be >= 1")
    if max_shift_dist < 0:
        raise ValueError("$ter maxShiftDistance must be >= 0")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        if not case_sensitive:
            cand = F.lower(cand)
        score_one, score_multi = _make_ter_scorers(
            max_words, max_shift_size, max_shift_dist)

        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            if not case_sensitive:
                refs = F.transform(refs, F.lower)

            @F.pandas_udf(_TER_TYPE)
            def _ter(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                vals = [None if rs is None else score_multi(ct, list(rs))
                        for ct, rs in zip(s, t)]
                return pd.DataFrame(
                    [(None, None, None, None, None) if v is None else v
                     for v in vals],
                    columns=["edits", "ter", "shifts", "n_hyp", "n_ref"])

            raw = _ter(cand, refs)
        else:
            ref = compile_expr(ref_e, sctx)
            if not case_sensitive:
                ref = F.lower(ref)

            @F.pandas_udf(_TER_TYPE)
            def _ter(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                vals = [None if ct is None or rt is None
                        else score_one(ct, rt)
                        for ct, rt in zip(s, t)]
                return pd.DataFrame(
                    [(None, None, None, None, None) if v is None else v
                     for v in vals],
                    columns=["edits", "ter", "shifts", "n_hyp", "n_ref"])

            raw = _ter(cand, ref)
        # null hypothesis / no usable references -> a NULL STRUCT, not
        # a struct of nulls (the $wer convention)
        null_st = F.lit(None).cast(_TER_TYPE)
        stage = df.withColumn("__ter_raw", raw)
        rawc = F.col("__ter_raw")
        return stage.withColumn(
            as_field,
            F.when(rawc["n_hyp"].isNull(), null_st).otherwise(rawc),
        ).drop("__ter_raw")

    return fn


@register_stage("$terCorpus")
def ter_corpus_stage(expression: Any, ctx: Context) -> StageFn:
    """CORPUS-level TER (tercom's corpus number): ``{candidate,
    reference | references, maxWords?, maxShiftSize?,
    maxShiftDistance?}`` -> ONE row ``(ter, edits, shifts, n_hyp,
    n_ref, n_segments)`` where ``ter = total edits / total reference
    words`` — NOT the mean of per-segment TERs.  Multi-reference uses
    each segment's best reference's edits and length ($werCorpus's
    convention).  Segments with a null side are EXCLUDED.

    CORPUS-ONLY: gated in streaming like $werCorpus.

    100 TB shape: per-segment greedy search row-local on the Arrow
    boundary; the reduction is ONE global partial-aggregated sum to a
    single short row — the $bleuCorpus shape."""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$terCorpus needs exactly one of reference | references")
    max_words = int(expression.get("maxWords", 250))
    max_shift_size = int(expression.get("maxShiftSize", 10))
    max_shift_dist = int(expression.get("maxShiftDistance", 50))
    case_sensitive = bool(expression.get("caseSensitive", True))
    if max_words < 1:
        raise ValueError("$terCorpus maxWords must be >= 1")
    if max_shift_size < 1:
        raise ValueError("$terCorpus maxShiftSize must be >= 1")
    if max_shift_dist < 0:
        raise ValueError("$terCorpus maxShiftDistance must be >= 0")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        from ..operators.extended import _corpus_only

        _corpus_only("$terCorpus", c)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        if not case_sensitive:
            cand = F.lower(cand)
        score_one, score_multi = _make_ter_scorers(
            max_words, max_shift_size, max_shift_dist)

        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            if not case_sensitive:
                refs = F.transform(refs, F.lower)

            @F.pandas_udf(_TER_TYPE)
            def _ter(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                vals = [None if rs is None else score_multi(ct, list(rs))
                        for ct, rs in zip(s, t)]
                return pd.DataFrame(
                    [(None, None, None, None, None) if v is None else v
                     for v in vals],
                    columns=["edits", "ter", "shifts", "n_hyp", "n_ref"])

            raw = _ter(cand, refs)
        else:
            ref = compile_expr(ref_e, sctx)
            if not case_sensitive:
                ref = F.lower(ref)

            @F.pandas_udf(_TER_TYPE)
            def _ter(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                vals = [None if ct is None or rt is None
                        else score_one(ct, rt)
                        for ct, rt in zip(s, t)]
                return pd.DataFrame(
                    [(None, None, None, None, None) if v is None else v
                     for v in vals],
                    columns=["edits", "ter", "shifts", "n_hyp", "n_ref"])

            raw = _ter(cand, ref)
        # r13: same as $werCorpus — no not-null .filter on the UDF
        # column (pushdown + ExtractPythonUDFs ran the WHOLE greedy TER
        # a second time in a single-task scan filter: 336 s vs 283 s
        # single-core compute at sf0.1); null-skipping aggregates
        # compute the identical segment exclusion.
        stage = df.withColumn("__trc", raw)
        zero_l = F.lit(0).cast("long")
        row = stage.agg(
            F.count("__trc.n_hyp").alias("n_segments"),
            F.coalesce(F.sum("__trc.edits"), zero_l).alias("edits"),
            F.coalesce(F.sum("__trc.shifts"), zero_l).alias("shifts"),
            F.coalesce(F.sum("__trc.n_hyp"), zero_l).alias("n_hyp"),
            F.coalesce(F.sum("__trc.n_ref"), zero_l).alias("n_ref"),
        )
        e_tot = F.col("edits").cast("double")
        r_tot = F.col("n_ref").cast("double")
        ter = F.when(F.col("n_ref") > 0, e_tot / r_tot) \
            .when(F.col("edits") == 0, F.lit(0.0)) \
            .otherwise(F.lit(None).cast("double"))
        return row.select(
            ter.alias("ter"), F.col("edits"), F.col("shifts"),
            F.col("n_hyp"), F.col("n_ref"), F.col("n_segments"))

    return fn


@register_stage("$classificationEval")
def classification_eval_stage(expression: Any, ctx: Context) -> StageFn:
    """Classification metrics over (predicted, actual) label pairs —
    the standard harness summary for classifier / LLM-labeling runs:
    ``{predicted, actual, average?}``.

    Default (per-label): one row PER LABEL over the UNION of labels
    observed on either side (the sklearn convention), with ``(label,
    tp, fp, fn, support, precision, recall, f1)``; a zero denominator
    scores 0.0 (sklearn ``zero_division=0`` — deterministic and
    oracle-checkable, never NaN).  ``support = tp + fn`` (actual
    occurrences).  Rows with a null on either side are EXCLUDED.

    ``average: "macro" | "micro" | "weighted"`` -> ONE row ``(n,
    accuracy, precision, recall, f1)``: macro = unweighted means of
    the per-label scores; weighted = support-weighted means; micro =
    pooled-count P/R/F1 (with no label restriction every FP is another
    label's FN, so micro-P = micro-R = micro-F1 = accuracy — the
    single-label identity).  ``labels: [...]`` fixes the reported /
    averaged label set exactly (sklearn ``labels=``): observed-only
    labels drop out, absent ones appear with zero counts; ``n`` and
    ``accuracy`` stay global (sklearn's accuracy_score ignores
    ``labels=``).

    CORPUS-ONLY: the output claims corpus scope, so it is gated in
    streaming exactly like $bleuCorpus.

    100 TB shape: ONE partial-aggregated groupBy over (actual,
    predicted) collapses the corpus to the confusion matrix (≤ |labels|²
    rows — labels are few by construction); every derived number is
    arithmetic on that tiny frame (a second ≤ 2·|labels|²-row shuffle),
    nothing else moves.  Labels compare as strings (cast once), so
    numeric and string label columns both work."""
    pred_e = expression["predicted"]
    act_e = expression["actual"]
    average = expression.get("average")
    labels_param = expression.get("labels")
    if average not in (None, "macro", "micro", "weighted"):
        raise ValueError(
            f"$classificationEval average must be 'macro', 'micro', "
            f"'weighted' or absent, got {average!r}")
    if labels_param is not None and (
            not isinstance(labels_param, list) or not labels_param):
        raise ValueError(
            "$classificationEval labels must be a non-empty list")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _corpus_only

        _corpus_only("$classificationEval", c)
        sctx = ExprContext(schema=df.schema)
        pred = compile_expr(pred_e, sctx).cast("string")
        act = compile_expr(act_e, sctx).cast("string")
        cm = (df.select(pred.alias("__p"), act.alias("__a"))
              .filter(F.col("__p").isNotNull() & F.col("__a").isNotNull())
              .groupBy("__a", "__p").agg(F.count(F.lit(1)).alias("n")))
        # each confusion cell contributes to two labels' counts: the
        # actual's tp-or-fn and the predicted's fp — explode to per-label
        # contributions, then one tiny groupBy (≤ 2·|labels|² rows)
        hit = F.col("__a") == F.col("__p")
        zero = F.lit(0).cast("long")
        contrib = cm.select(F.explode(F.array(
            F.struct(
                F.col("__a").alias("label"),
                F.when(hit, F.col("n")).otherwise(zero).alias("tp"),
                zero.alias("fp"),
                F.when(~hit, F.col("n")).otherwise(zero).alias("fn"),
            ),
            F.struct(
                F.col("__p").alias("label"),
                zero.alias("tp"),
                F.when(~hit, F.col("n")).otherwise(zero).alias("fp"),
                zero.alias("fn"),
            ),
        )).alias("s")).select("s.*")
        per = contrib.groupBy("label").agg(
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp"),
            F.sum("fn").alias("fn"))
        tp, fp, fn_ = (F.col("tp").cast("double"),
                       F.col("fp").cast("double"),
                       F.col("fn").cast("double"))
        prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
        rec = F.when(tp + fn_ > 0, tp / (tp + fn_)).otherwise(F.lit(0.0))
        f1 = F.when(tp + tp + fp + fn_ > 0,
                    2 * tp / (tp + tp + fp + fn_)).otherwise(F.lit(0.0))
        per = per.select(
            "label", "tp", "fp", "fn",
            (F.col("tp") + F.col("fn")).alias("support"),
            prec.alias("precision"), rec.alias("recall"),
            f1.alias("f1"))
        if labels_param is not None:
            # sklearn labels=: report/average EXACTLY this label set —
            # observed-only labels drop out, absent ones appear with
            # zero counts (their tp/fp/fn against the full pair set are
            # genuinely zero: an unobserved label is never predicted
            # nor actual).  n/accuracy stay GLOBAL (sklearn's
            # accuracy_score ignores labels=), computed from the
            # unrestricted frame below.
            ldf = c.spark.createDataFrame(
                [(str(x),) for x in labels_param], "label string")
            sel = ldf.join(per, "label", "left").na.fill(
                0, ["tp", "fp", "fn", "support"]).na.fill(
                0.0, ["precision", "recall", "f1"])
        else:
            sel = per
        if average is None:
            return sel.orderBy("label")
        # F.sum over an empty frame is NULL; coalesce so the empty corpus
        # reports n = 0 with null metrics, matching $regressionEval /
        # $pairedBootstrap ("empty corpus -> n = 0")
        total = F.coalesce(F.sum(F.col("tp") + F.col("fn")), F.lit(0))
        acc = F.when(
            total > 0, F.sum("tp").cast("double") / total.cast("double")
        ).otherwise(F.lit(None).cast("double"))
        base = per.agg(total.alias("n"), acc.alias("accuracy"))
        if average == "macro":
            summ = sel.agg(
                F.avg("precision").alias("precision"),
                F.avg("recall").alias("recall"),
                F.avg("f1").alias("f1"))
        elif average == "weighted":
            sup = F.sum("support").cast("double")
            wavg = lambda col: F.when(  # noqa: E731
                sup > 0,
                F.sum(F.col(col) * F.col("support").cast("double")) / sup,
            ).otherwise(F.lit(0.0))
            summ = sel.agg(
                wavg("precision").alias("precision"),
                wavg("recall").alias("recall"),
                wavg("f1").alias("f1"))
        else:
            # micro over the (possibly restricted) label set:
            # P = Σtp/(Σtp+Σfp), R = Σtp/(Σtp+Σfn), F1 harmonic —
            # with no restriction Σfp = Σfn, so all three equal the
            # global accuracy (the single-label identity)
            stp = F.sum("tp").cast("double")
            sfp = F.sum("fp").cast("double")
            sfn = F.sum("fn").cast("double")
            mp = F.when(stp + sfp > 0, stp / (stp + sfp)) \
                .otherwise(F.lit(0.0))
            mr = F.when(stp + sfn > 0, stp / (stp + sfn)) \
                .otherwise(F.lit(0.0))
            mf = F.when(2 * stp + sfp + sfn > 0,
                        2 * stp / (2 * stp + sfp + sfn)) \
                .otherwise(F.lit(0.0))
            summ = sel.agg(mp.alias("precision"), mr.alias("recall"),
                           mf.alias("f1"))
        null_d = F.lit(None).cast("double")
        empty = F.col("n") == 0
        return base.crossJoin(F.broadcast(summ)).select(
            "n", "accuracy",
            F.when(empty, null_d).otherwise(F.col("precision")).alias("precision"),
            F.when(empty, null_d).otherwise(F.col("recall")).alias("recall"),
            F.when(empty, null_d).otherwise(F.col("f1")).alias("f1"))

    return fn


@register_stage("$regressionEval")
def regression_eval_stage(expression: Any, ctx: Context) -> StageFn:
    """Regression metrics over (predicted, actual) numeric pairs:
    ``{predicted, actual}`` -> ONE row ``(n, mse, rmse, mae, r2)``.

    ``r2 = 1 - SS_res / SS_tot`` with ``SS_tot = var_pop(actual) · n``
    — Spark's ``var_pop`` uses a numerically stable single-pass update,
    unlike the textbook ``Σa² - (Σa)²/n`` identity which cancels
    catastrophically when ``|mean| >> stddev`` (actuals ~1e9 with unit
    variance lose all significant digits in double precision).  A
    constant actual column (SS_tot = 0) reports null r2 — the undefined
    case surfaced, not faked.  Pairs with a null on either side are
    EXCLUDED; an empty corpus returns n = 0 with null metrics.

    CORPUS-ONLY: gated in streaming like $classificationEval.

    100 TB shape: ONE global partial-aggregated sum (5 doubles + a
    count) to a single row — the $bleuCorpus reduction shape; every
    metric derives from that row arithmetically."""
    pred_e = expression["predicted"]
    act_e = expression["actual"]

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _corpus_only

        _corpus_only("$regressionEval", c)
        sctx = ExprContext(schema=df.schema)
        pred = compile_expr(pred_e, sctx).cast("double")
        act = compile_expr(act_e, sctx).cast("double")
        pairs = df.select(pred.alias("__p"), act.alias("__a")) \
            .filter(F.col("__p").isNotNull() & F.col("__a").isNotNull())
        err = F.col("__p") - F.col("__a")
        row = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(err * err).alias("__ssr"),
            F.sum(F.abs(err)).alias("__sae"),
            F.var_pop("__a").alias("__va"))
        n_d = F.col("n").cast("double")
        mse = F.col("__ssr") / n_d
        mae = F.col("__sae") / n_d
        ss_tot = F.col("__va") * n_d
        r2 = F.when(ss_tot > 0, 1.0 - F.col("__ssr") / ss_tot) \
            .otherwise(F.lit(None).cast("double"))
        null_d = F.lit(None).cast("double")
        empty = F.col("n") == 0
        return row.select(
            "n",
            F.when(empty, null_d).otherwise(mse).alias("mse"),
            F.when(empty, null_d).otherwise(F.sqrt(mse)).alias("rmse"),
            F.when(empty, null_d).otherwise(mae).alias("mae"),
            F.when(empty, null_d).otherwise(r2).alias("r2"))

    return fn


# Poisson(1) inverse-CDF thresholds: P(X <= k) for k = 0..7; a uniform
# draw above the last threshold caps at 8 (mass 1e-5 — the standard
# truncation for Poisson-bootstrap weights)
_POISSON1_CDF = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033254,
]


_CORPUS_STATISTICS = ("corpusBleu", "corpusChrf", "corpusWer",
                      "corpusTer")


def _corpus_stat_machinery(statistic: str, expression: dict, stage_name: str):
    """Per-segment sufficient-statistics machinery for the corpus-
    statistic bootstrap modes (r11, VERDICT r10 #2): Koehn 2004
    resamples the test set and recomputes the CORPUS metric per
    replicate — for non-decomposable metrics (corpus BLEU/chrF) that is
    NOT the mean of per-segment scores.  Because every corpus metric
    here is a function of SUMS of per-segment sufficient statistics, a
    replicate's corpus score is ``score(Σ wᵢ·statsᵢ)`` over the same
    deterministic Poisson weights — exact, shuffle-cheap, and
    oracle-checkable.

    Returns ``(shared, build, score, lower_is_better, fields)``:

    - ``shared(stage, sctx) -> (stage, ok)`` adds reference-side temp
      columns used by both systems and the reference validity predicate;
    - ``build(stage, sctx, cand_expr, suffix) -> (stage, ok)`` adds one
      system's flat stat columns named ``__pb{suffix}_{field}``;
    - ``score(get) -> Column`` computes the corpus statistic from
      (possibly weighted) SUMS of those fields, ``get(field) -> Column``;
    - ``lower_is_better`` flips the win direction (corpusWer);
    - ``fields`` lists the stat field names.

    Statistic formulas are byte-for-byte the $bleuCorpus / $chrfCorpus /
    $werCorpus reductions (dp_eval.py above) applied to resampled sums.
    """
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if statistic == "corpusChrf":
        # $chrfCorpus is single-reference (chrF statistics are never
        # pooled across references — see $chrf's sacrebleu note)
        if ref_e is None or refs_e is not None:
            raise ValueError(
                f"{stage_name} statistic corpusChrf needs reference "
                "(references is not supported, matching $chrfCorpus)")
    elif (ref_e is None) == (refs_e is None):
        raise ValueError(
            f"{stage_name} statistic {statistic} needs exactly one "
            "of reference | references")
    # full per-statistic option whitelist (ADVICE r12 — the r11 fix
    # only special-cased `tokenizer`; a wordOrder/smooth/formula option
    # silently ignored by the active statistic is the same "interval
    # does not bracket the point score" hazard).  Any key that is a
    # metric option for SOME statistic but not this one is rejected;
    # caller-level keys (id/a/b/candidate/input/samples/seed/alpha/
    # statistic/reference/references/as) pass through untouched.
    stat_opts = {
        "corpusBleu": {"maxN", "maxWords", "smooth", "tokenizer"},
        "corpusChrf": {"maxN", "beta", "maxChars", "formula",
                       "wordOrder", "maxWords"},
        "corpusWer": {"maxWords", "caseSensitive"},
        "corpusTer": {"maxWords", "maxShiftSize", "maxShiftDistance",
                      "caseSensitive"},
    }
    allowed = stat_opts[statistic]
    bad = sorted(
        k for k in expression
        if k in set().union(*stat_opts.values()) and k not in allowed)
    if bad:
        raise ValueError(
            f"{stage_name} statistic {statistic} does not take "
            f"{', '.join(bad)} (allowed metric options: "
            f"{', '.join(sorted(allowed))})")

    if statistic == "corpusBleu":
        max_n = int(expression.get("maxN", 4))
        max_words = int(expression.get("maxWords", 2000))
        smooth = expression.get("smooth")
        # r12 (ADVICE r11): thread the $bleu/$bleuCorpus tokenizer
        # option through the corpus-statistic bootstrap so a corpusBleu
        # interval brackets a 13a-tokenized $bleuCorpus point score —
        # previously silently ignored (raw whitespace tokens).
        tokenizer = _check_tokenizer(stage_name, expression.get("tokenizer"))
        tok = _tok_fn(tokenizer)
        if not 1 <= max_n <= 8:
            raise ValueError(f"{stage_name} maxN must be in 1..8")
        if max_words < 1:
            raise ValueError(f"{stage_name} maxWords must be >= 1")
        if smooth not in (None, "add1"):
            raise ValueError(
                f"{stage_name} smooth must be 'add1' or absent")
        fields = (["c_len", "r_len"]
                  + [f"m{n}" for n in range(1, max_n + 1)]
                  + [f"t{n}" for n in range(1, max_n + 1)])

        def shared(stage: DataFrame, sctx: ExprContext):
            # r14 (guide §1.2): dependency-layered withColumns — one
            # analyzer pass per layer instead of one per column; the
            # columns (names and expressions) are identical, and
            # CollapseProject merged the per-column Projects into the
            # same shape anyway, so the optimized plan is unchanged
            # while the measured driver plan-build cost drops ~3x.
            if refs_e is not None:
                refs = compile_expr(refs_e, sctx)
                stage = stage.withColumns({
                    "__pbs_wrs": F.transform(
                        F.filter(refs, lambda r: r.isNotNull()),
                        lambda r: _eval_words(tok(r), max_words))})
                wrs = F.col("__pbs_wrs")
                layer2 = {"__pbs_rls": F.transform(
                    wrs, lambda w: F.size(w).cast("long"))}

                def _grams_of(_n: int):
                    # NOT a default-arg lambda: F.transform treats a
                    # 2-parameter callable as the (element, index) form
                    return lambda w: _eval_grams(w, _n)

                for n in range(1, max_n + 1):
                    layer2[f"__pbs_grs{n}"] = F.transform(
                        wrs, _grams_of(n))
                stage = stage.withColumns(layer2)
                ok = refs.isNotNull() & (F.size(wrs) > 0)
            else:
                ref = compile_expr(ref_e, sctx)
                stage = stage.withColumns(
                    {"__pbs_wr": _eval_words(tok(ref), max_words)})
                stage = stage.withColumns({
                    f"__pbs_gr{n}": _eval_grams(F.col("__pbs_wr"), n)
                    for n in range(1, max_n + 1)})
                ok = ref.isNotNull()
            return stage, ok

        def build(stage: DataFrame, sctx: ExprContext, cand_e: Any,
                  suffix: str):
            p = f"__pb{suffix}"
            cand = compile_expr(cand_e, sctx)
            stage = stage.withColumns(
                {f"{p}_wc": _eval_words(tok(cand), max_words)})
            wc = F.col(f"{p}_wc")
            c_len_l = F.size(wc).cast("long")
            layer2 = {f"{p}_gc{n}": _eval_grams(wc, n)
                      for n in range(1, max_n + 1)}
            layer2[f"{p}_c_len"] = c_len_l
            stage = stage.withColumns(layer2)
            layer3 = {}
            for n in range(1, max_n + 1):
                if refs_e is not None:
                    m = _eval_clipped_multi(F.col(f"{p}_gc{n}"),
                                            F.col(f"__pbs_grs{n}"))
                else:
                    m = _eval_clipped(F.col(f"{p}_gc{n}"),
                                      F.col(f"__pbs_gr{n}"))
                layer3[f"{p}_m{n}"] = m
                layer3[f"{p}_t{n}"] = F.size(F.col(f"{p}_gc{n}")) \
                    .cast("long")
            if refs_e is not None:
                # per-segment effective reference length relative to
                # THIS system's candidate (Papineni 2002 §2.3: closest,
                # ties -> shorter)
                best = F.aggregate(
                    F.col("__pbs_rls"),
                    F.struct(F.lit(None).cast("long").alias("d"),
                             F.lit(None).cast("long").alias("l")),
                    lambda acc, ln: F.when(
                        acc["l"].isNull()
                        | (F.abs(ln - c_len_l) < acc["d"])
                        | ((F.abs(ln - c_len_l) == acc["d"])
                           & (ln < acc["l"])),
                        F.struct(F.abs(ln - c_len_l).cast("long")
                                 .alias("d"), ln.alias("l")),
                    ).otherwise(acc))
                r_len = best["l"]
            else:
                r_len = F.size(F.col("__pbs_wr")).cast("long")
            layer3[f"{p}_r_len"] = r_len
            stage = stage.withColumns(layer3)
            return stage, cand.isNotNull()

        def score(get) -> Column:
            zero = F.lit(False)
            log_sum = F.lit(0.0)
            for n in range(1, max_n + 1):
                m = get(f"m{n}").cast("double")
                t = get(f"t{n}").cast("double")
                if smooth == "add1" and n >= 2:
                    p_ = (m + 1.0) / (t + 1.0)
                    zero = zero | (t == 0.0)
                else:
                    p_ = m / t
                    zero = zero | (t == 0.0) | (m == 0.0)
                log_sum = log_sum + F.log(p_) / max_n
            c_tot = get("c_len").cast("double")
            r_tot = get("r_len").cast("double")
            bp = F.when(c_tot >= r_tot, F.lit(1.0)) \
                .otherwise(F.exp(1.0 - r_tot / c_tot))
            return F.when(zero, F.lit(0.0)).otherwise(bp * F.exp(log_sum))

        return shared, build, score, False, fields

    if statistic == "corpusChrf":
        max_n = int(expression.get("maxN", 6))
        beta = float(expression.get("beta", 2.0))
        max_chars = int(expression.get("maxChars", 2000))
        formula = expression.get("formula", "popovic")
        if formula not in ("popovic", "sacrebleu"):
            raise ValueError(
                f"{stage_name} formula must be popovic|sacrebleu, "
                f"got {formula!r}")
        if not 1 <= max_n <= 10:
            raise ValueError(f"{stage_name} maxN must be in 1..10")
        if beta <= 0:
            raise ValueError(f"{stage_name} beta must be > 0")
        if max_chars < 1:
            raise ValueError(f"{stage_name} maxChars must be >= 1")
        # r12 chrF++: word orders ride the same sufficient-statistics
        # shape — a replicate's corpus chrF++ pools Σ wᵢ·(word-gram
        # stats) next to the char-gram sums
        word_order, wmax_words = _check_word_order(stage_name, expression)
        b2 = beta * beta
        # (m, tc, tr) field-name triples: char orders then word orders
        triples = [(f"m{n}", f"tc{n}", f"tr{n}", "c", n)
                   for n in range(1, max_n + 1)]
        triples += [(f"wm{n}", f"wtc{n}", f"wtr{n}", "w", n)
                    for n in range(1, word_order + 1)]
        fields = [k for t in triples for k in t[:3]]

        def strip(t: Column) -> Column:
            return F.substring(F.regexp_replace(t, r"\s+", ""),
                               1, max_chars)

        def char_grams(s: Column, n: int) -> Column:
            ln = F.length(s)
            grams = F.transform(F.sequence(F.lit(1), ln - (n - 1)),
                                lambda i: F.substring(s, i, F.lit(n)))
            return F.when(ln >= n, grams) \
                .otherwise(F.array().cast("array<string>"))

        def shared(stage: DataFrame, sctx: ExprContext):
            # r14 (guide §1.2): layered withColumns — one analyzer pass
            # per dependency layer; identical columns, same optimized
            # plan (see the corpusBleu note above).
            ref = compile_expr(ref_e, sctx)
            layer1 = {"__pbs_sr": strip(ref)}
            if word_order > 0:
                layer1["__pbs_wr"] = _chrfpp_tokens(ref, wmax_words)
            stage = stage.withColumns(layer1)
            layer2 = {f"__pbs_gr{n}": char_grams(F.col("__pbs_sr"), n)
                      for n in range(1, max_n + 1)}
            for n in range(1, word_order + 1):
                layer2[f"__pbs_wgr{n}"] = _eval_grams(
                    F.col("__pbs_wr"), n)
            stage = stage.withColumns(layer2)
            return stage, ref.isNotNull()

        def build(stage: DataFrame, sctx: ExprContext, cand_e: Any,
                  suffix: str):
            p = f"__pb{suffix}"
            cand = compile_expr(cand_e, sctx)
            layer1 = {f"{p}_sc": strip(cand)}
            if word_order > 0:
                layer1[f"{p}_wtoks"] = _chrfpp_tokens(cand, wmax_words)
            stage = stage.withColumns(layer1)
            layer2 = {f"{p}_gc{n}": char_grams(F.col(f"{p}_sc"), n)
                      for n in range(1, max_n + 1)}
            for n in range(1, word_order + 1):
                layer2[f"{p}_wgc{n}"] = _eval_grams(
                    F.col(f"{p}_wtoks"), n)
            stage = stage.withColumns(layer2)
            layer3 = {}
            for n in range(1, max_n + 1):
                layer3[f"{p}_m{n}"] = _eval_clipped(
                    F.col(f"{p}_gc{n}"), F.col(f"__pbs_gr{n}"))
                layer3[f"{p}_tc{n}"] = F.size(F.col(f"{p}_gc{n}")) \
                    .cast("long")
                layer3[f"{p}_tr{n}"] = F.size(F.col(f"__pbs_gr{n}")) \
                    .cast("long")
            for n in range(1, word_order + 1):
                layer3[f"{p}_wm{n}"] = _eval_clipped(
                    F.col(f"{p}_wgc{n}"), F.col(f"__pbs_wgr{n}"))
                layer3[f"{p}_wtc{n}"] = F.size(F.col(f"{p}_wgc{n}")) \
                    .cast("long")
                layer3[f"{p}_wtr{n}"] = F.size(F.col(f"__pbs_wgr{n}")) \
                    .cast("long")
            stage = stage.withColumns(layer3)
            return stage, cand.isNotNull()

        def score(get) -> Column:
            if formula == "sacrebleu":
                f_sum = F.lit(0.0)
                n_eff = F.lit(0)
                for m_k, tc_k, tr_k, _kind, _n in triples:
                    m = get(m_k).cast("double")
                    tc = get(tc_k).cast("double")
                    tr = get(tr_k).cast("double")
                    eff = (tc > 0) & (tr > 0)
                    p_, r_ = m / tc, m / tr
                    f_n = F.when(
                        b2 * p_ + r_ > 0.0,
                        (1 + b2) * p_ * r_ / (b2 * p_ + r_)
                    ).otherwise(F.lit(0.0))
                    f_sum = f_sum + F.when(eff, f_n).otherwise(F.lit(0.0))
                    n_eff = n_eff + eff.cast("int")
                return F.when(n_eff == 0, F.lit(0.0)) \
                    .otherwise(f_sum / n_eff)
            p_sum = F.lit(0.0)
            r_sum = F.lit(0.0)
            n_eff = F.lit(0)
            for m_k, tc_k, tr_k, _kind, _n in triples:
                m = get(m_k).cast("double")
                tc = get(tc_k).cast("double")
                tr = get(tr_k).cast("double")
                eff = (tc > 0) | (tr > 0)
                p_ = F.when(tc > 0, m / tc).otherwise(F.lit(0.0))
                r_ = F.when(tr > 0, m / tr).otherwise(F.lit(0.0))
                p_sum = p_sum + F.when(eff, p_).otherwise(F.lit(0.0))
                r_sum = r_sum + F.when(eff, r_).otherwise(F.lit(0.0))
                n_eff = n_eff + eff.cast("int")
            pavg = p_sum / n_eff
            ravg = r_sum / n_eff
            return F.when(n_eff == 0, F.lit(0.0)) \
                .when(pavg + ravg == 0.0, F.lit(0.0)) \
                .otherwise((1 + b2) * pavg * ravg / (b2 * pavg + ravg))

        return shared, build, score, False, fields

    # corpusWer / corpusTer — the edit-rate statistics share a shape:
    # per-segment (numerator, reference length) through the Arrow DP
    # boundary; the corpus score is Σnum / Σn_ref (lower is better)
    if statistic == "corpusTer":
        max_words = int(expression.get("maxWords", 250))
        max_shift_size = int(expression.get("maxShiftSize", 10))
        max_shift_dist = int(expression.get("maxShiftDistance", 50))
        case_sensitive = bool(expression.get("caseSensitive", True))
        if max_shift_size < 1:
            raise ValueError(f"{stage_name} maxShiftSize must be >= 1")
        if max_shift_dist < 0:
            raise ValueError(
                f"{stage_name} maxShiftDistance must be >= 0")
        num = "edits"
        udf_type = _TER_TYPE
        udf_cols = ["edits", "ter", "shifts", "n_hyp", "n_ref"]

        def scorers():
            return _make_ter_scorers(max_words, max_shift_size,
                                     max_shift_dist)
    else:
        max_words = int(expression.get("maxWords", 2000))
        case_sensitive = bool(expression.get("caseSensitive", True))
        num = "distance"
        udf_type = _WER_TYPE
        udf_cols = ["distance", "wer", "n_hyp", "n_ref"]

        def scorers():
            return _make_wer_scorers(max_words)
    if max_words < 1:
        raise ValueError(f"{stage_name} maxWords must be >= 1")
    fields = [num, "n_ref"]
    null_row = (None,) * len(udf_cols)

    def shared(stage: DataFrame, sctx: ExprContext):
        return stage, F.lit(True)  # validity lives in the null struct

    def build(stage: DataFrame, sctx: ExprContext, cand_e: Any,
              suffix: str):
        score_one, score_multi = scorers()
        cand = compile_expr(cand_e, sctx)
        if not case_sensitive:
            cand = F.lower(cand)
        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            if not case_sensitive:
                refs = F.transform(refs, F.lower)

            @F.pandas_udf(udf_type)
            def _w(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                vals = [None if rs is None else score_multi(ct, list(rs))
                        for ct, rs in zip(s, t)]
                return pd.DataFrame(
                    [null_row if v is None else v for v in vals],
                    columns=udf_cols)

            raw = _w(cand, refs)
        else:
            ref = compile_expr(ref_e, sctx)
            if not case_sensitive:
                ref = F.lower(ref)

            @F.pandas_udf(udf_type)
            def _w(s: pd.Series, t: pd.Series) -> pd.DataFrame:
                vals = [None if ct is None or rt is None
                        else score_one(ct, rt)
                        for ct, rt in zip(s, t)]
                return pd.DataFrame(
                    [null_row if v is None else v for v in vals],
                    columns=udf_cols)

            raw = _w(cand, ref)
        p = f"__pb{suffix}"
        stage = stage.withColumn(f"{p}_raw", raw)
        stage = stage.withColumn(f"{p}_{num}", F.col(f"{p}_raw.{num}"))
        stage = stage.withColumn(f"{p}_n_ref", F.col(f"{p}_raw.n_ref"))
        return stage, F.col(f"{p}_raw.n_hyp").isNotNull()

    def score(get) -> Column:
        d = get(num).cast("double")
        r = get("n_ref").cast("double")
        return F.when(get("n_ref") > 0, d / r) \
            .when(get(num) == 0, F.lit(0.0)) \
            .otherwise(F.lit(None).cast("double"))

    return shared, build, score, True, fields


@register_stage("$pairedBootstrap")
def paired_bootstrap_stage(expression: Any, ctx: Context) -> StageFn:
    """Paired bootstrap resampling (Koehn 2004, "Statistical
    Significance Tests for Machine Translation Evaluation") over two
    per-segment metric columns — THE standard test for "is system A
    actually better than system B on this eval set, or is the gap
    noise?": ``{id, a, b, samples?, seed?}`` -> ONE row ``(n, mean_a,
    mean_b, delta, wins_a, ties, b_samples, p_value)``.

    Each bootstrap replicate resamples the segment set with replacement
    and recomputes the mean difference; ``p_value`` is the one-sided
    fraction of replicates where A does NOT beat B (delta <= 0 or the
    replicate drew no weight) — small p = "A > B is stable under
    resampling".  ``wins_a``/``ties`` count replicates with positive /
    zero-or-undefined resampled delta.  ZERO-WEIGHT REPLICATES (every
    Poisson weight 0 — possible only at tiny n, P ≈ e^-n): the
    resampled delta is undefined, and the replicate counts as a TIE,
    i.e. against system A in ``p_value = (samples - wins_a)/samples``
    — the conservative direction.  Identical in the mean and corpus
    statistic modes (ADVICE r11: this is deliberate, not an accident
    of null propagation; a replicate that sampled nothing is no
    evidence that A beats B).

    DETERMINISM (the retry/oracle contract): resampling weights are
    Poisson(1) draws — the standard distributed approximation of
    with-replacement resampling, exact as n grows — derived from
    ``md5(seed:id:replicate)`` through the inverse CDF, so the result
    is a pure function of the data (reruns, task retries and the
    DuckDB oracle all reproduce it bit-for-bit; no RNG state
    anywhere).  ``id`` must be a stable per-segment key.  Rows with a
    null id/a/b are EXCLUDED.

    CORPUS-ONLY: gated in streaming like $bleuCorpus — a
    per-micro-batch "significance test" is a silent wrong answer.

    STATISTIC MODES (r11, the full Koehn 2004 procedure):
    ``statistic: "mean"`` (default) resamples the mean of the two
    per-segment score columns ``a``/``b`` — correct for decomposable
    metrics (WER-as-mean, accuracy, EM/F1).  For NON-decomposable
    corpus metrics (mean of sentence BLEUs ≠ corpus BLEU — the reason
    $bleuCorpus exists), ``statistic: "corpusBleu" | "corpusChrf" |
    "corpusWer"`` recomputes the CORPUS metric per replicate as
    ``score(Σ wᵢ·statsᵢ)`` over per-segment sufficient statistics —
    bit-identical to rescoring the resampled test set, because each
    corpus metric is a function of summed per-segment counts.  In
    these modes ``a``/``b`` are the two systems' candidate expressions
    (or ``{candidate: <expr>}``), a shared ``reference`` /
    ``references`` sits at the top level, and the metric options
    (``maxN``/``maxWords``/``smooth`` for BLEU; ``maxN``/``beta``/
    ``maxChars`` for chrF, single-reference like $chrfCorpus;
    ``maxWords`` for WER) apply to both systems.  ``mean_a``/
    ``mean_b`` then carry the two CORPUS scores; for ``corpusWer``
    (lower is better) ``wins_a`` counts replicates where A's WER is
    LOWER (delta < 0).  Segments where either system or the reference
    side is unscorable are EXCLUDED (pairing requires both).

    100 TB shape: the replicate axis explodes row-locally (n x B
    weights, each one md5 + a CASE ladder) and groupBy(replicate)
    partial-aggregates every task down to <= B rows before the ONLY
    shuffle (B x tasks rows); the per-replicate frame (B rows) and the
    1-row base-means frame combine via the pinned 1-row broadcast
    cross join.  B defaults to 200 (Koehn uses 300-1000 at eval-set
    scale; raise it for small n).  Corpus modes ride the same shape —
    the explode carries ~2·|fields| longs instead of 2 doubles, and
    every per-replicate corpus score is arithmetic on one row of
    integer sums."""
    id_e = expression["id"]
    a_e = expression["a"]
    b_e = expression["b"]
    statistic = expression.get("statistic", "mean")
    if statistic not in ("mean",) + _CORPUS_STATISTICS:
        raise ValueError(
            "$pairedBootstrap statistic must be one of "
            f"mean|{'|'.join(_CORPUS_STATISTICS)}, got {statistic!r}")
    if statistic != "mean":
        machinery = _corpus_stat_machinery(statistic, expression,
                                           "$pairedBootstrap")
        a_e = a_e["candidate"] if isinstance(a_e, dict) else a_e
        b_e = b_e["candidate"] if isinstance(b_e, dict) else b_e
    samples = int(expression.get("samples", 200))
    seed = int(expression.get("seed", 0))
    if not 1 <= samples <= 10000:
        raise ValueError("$pairedBootstrap samples must be in 1..10000")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        from ..operators.extended import _corpus_only

        _corpus_only("$pairedBootstrap", c)
        sctx = ExprContext(schema=df.schema)
        idc = compile_expr(id_e, sctx).cast("string")
        if statistic != "mean":
            shared, build, stat_score, lower_better, fields = machinery
            stage = df.withColumn("__pb_id", idc)
            stage, ok_sh = shared(stage, sctx)
            stage, ok_a = build(stage, sctx, a_e, "a")
            stage, ok_b = build(stage, sctx, b_e, "b")
            slim = stage.select(
                F.col("__pb_id").alias("__id"),
                (ok_sh & ok_a & ok_b).alias("__ok"),
                *[F.col(f"__pba_{f}").alias(f"__a_{f}") for f in fields],
                *[F.col(f"__pbb_{f}").alias(f"__b_{f}") for f in fields])
            # same checkpoint barrier + ordering rationale as the mean
            # path below (predicate-pushdown substitution hazard)
            has_dir = c.spark.sparkContext._jsc.sc().getCheckpointDir() \
                .isDefined()
            slim = (slim.checkpoint(eager=False) if has_dir
                    else slim.localCheckpoint(eager=False))
            pairs = slim.filter(
                F.col("__id").isNotNull() & F.col("__ok"))
            statcols = ([f"__a_{f}" for f in fields]
                        + [f"__b_{f}" for f in fields])
            ws = F.transform(
                F.sequence(F.lit(1), F.lit(samples)),
                lambda r: _poisson1_weight(seed, F.col("__id"), r))
            ex = pairs.withColumn("__ws", ws).select(
                *statcols, F.posexplode("__ws").alias("__r", "__w"))
            wl = F.col("__w").cast("long")  # integer weights: exact sums
            rep = ex.groupBy("__r").agg(
                *[F.sum(wl * F.col(sc)).alias(sc) for sc in statcols],
                F.sum("__w").alias("__wsum"))
            sa_r = stat_score(lambda f: F.col(f"__a_{f}"))
            sb_r = stat_score(lambda f: F.col(f"__b_{f}"))
            delta_r = F.when(F.col("__wsum") > 0, sa_r - sb_r)
            win = (delta_r < 0) if lower_better else (delta_r > 0)
            summ = rep.agg(
                F.coalesce(F.sum(F.when(win, 1).otherwise(0)), F.lit(0))
                .cast("long").alias("wins_a"),
                F.coalesce(
                    F.sum(F.when(delta_r.isNull() | (delta_r == 0), 1)
                          .otherwise(0)), F.lit(0)
                ).cast("long").alias("ties"),
            )
            base = pairs.agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(sc).alias(sc) for sc in statcols])
            sa_b = stat_score(lambda f: F.col(f"__a_{f}"))
            sb_b = stat_score(lambda f: F.col(f"__b_{f}"))
            out = base.crossJoin(F.broadcast(summ))
            null_d = F.lit(None).cast("double")
            empty = F.col("n") == 0
            return out.select(
                "n",
                F.when(empty, null_d).otherwise(sa_b).alias("mean_a"),
                F.when(empty, null_d).otherwise(sb_b).alias("mean_b"),
                F.when(empty, null_d).otherwise(sa_b - sb_b)
                .alias("delta"),
                F.col("wins_a"),
                F.col("ties"),
                F.lit(samples).cast("long").alias("b_samples"),
                F.when(empty, null_d)
                .otherwise((F.lit(samples) - F.col("wins_a"))
                           .cast("double") / F.lit(float(samples)))
                .alias("p_value"),
            )
        a = compile_expr(a_e, sctx).cast("double")
        b = compile_expr(b_e, sctx).cast("double")
        slim = df.select(
            idc.alias("__id"), a.alias("__a"), b.alias("__b"))
        # HARD plan barrier (checkpoint, the graphcc policy) BETWEEN
        # the projection and the null filter.  Ordering is the whole
        # point: a filter placed below the barrier gets predicate-
        # pushed through every upstream Project, each crossing
        # SUBSTITUTING the metric attributes with their defining
        # expressions — a $chrf/$bleu column program inlines
        # combinatorially (measured 173 s vs 7 s for a mere
        # isNotNull over two chrF scores on 500 docs).  With the
        # barrier first, the filter tests materialized slim rows, the
        # upstream metric evaluates exactly once per row, and the
        # base-means and replicate subtrees share the same
        # materialization.  Durable checkpoint when the session has a
        # checkpoint dir (cluster), local otherwise — same policy as
        # $connectedComponents/$pageRank.
        has_dir = c.spark.sparkContext._jsc.sc().getCheckpointDir() \
            .isDefined()
        slim = (slim.checkpoint(eager=False) if has_dir
                else slim.localCheckpoint(eager=False))
        pairs = slim.filter(
            F.col("__id").isNotNull() & F.col("__a").isNotNull()
            & F.col("__b").isNotNull())

        ws = F.transform(
            F.sequence(F.lit(1), F.lit(samples)),
            lambda r: _poisson1_weight(seed, F.col("__id"), r))
        ex = pairs.withColumn("__ws", ws).select(
            "__a", "__b", F.posexplode("__ws").alias("__r", "__w"))
        wd = F.col("__w").cast("double")
        rep = ex.groupBy("__r").agg(
            F.sum(wd * (F.col("__a") - F.col("__b"))).alias("__wdiff"),
            F.sum("__w").alias("__wsum"))
        delta_r = F.when(F.col("__wsum") > 0,
                         F.col("__wdiff") / F.col("__wsum").cast("double"))
        summ = rep.agg(
            F.coalesce(
                F.sum(F.when(delta_r > 0, 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("wins_a"),
            F.coalesce(
                F.sum(F.when(delta_r.isNull() | (delta_r == 0), 1)
                      .otherwise(0)), F.lit(0)
            ).cast("long").alias("ties"),
        )
        base = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__a").alias("mean_a"),
            F.avg("__b").alias("mean_b"))
        out = base.crossJoin(F.broadcast(summ))
        null_d = F.lit(None).cast("double")
        empty = F.col("n") == 0
        return out.select(
            "n",
            F.when(empty, null_d).otherwise(F.col("mean_a"))
            .alias("mean_a"),
            F.when(empty, null_d).otherwise(F.col("mean_b"))
            .alias("mean_b"),
            F.when(empty, null_d)
            .otherwise(F.col("mean_a") - F.col("mean_b")).alias("delta"),
            F.col("wins_a"),
            F.col("ties"),
            F.lit(samples).cast("long").alias("b_samples"),
            F.when(empty, null_d)
            .otherwise((F.lit(samples) - F.col("wins_a"))
                       .cast("double") / F.lit(float(samples)))
            .alias("p_value"),
        )

    return fn


@register_stage("$materialize")
def materialize_stage(expression: Any, ctx: Context) -> StageFn:
    """Explicit plan barrier: ``{}`` or ``{mode: "auto"|"local"|
    "durable"}``.  Pins the current rows as materialized data so that
    (1) predicate pushdown cannot substitute downstream filters into
    the upstream column programs — a ``$match`` directly over a deep
    HOF metric column ($chrf, $bleu, ...) inlines combinatorially (the
    measured 173-s-vs-7-s hazard in SCALE.md §"pairedBootstrap") — and
    (2) multiple downstream consumers share ONE upstream evaluation.

    ``auto`` (default) durably checkpoints when the session has a
    checkpoint directory configured (survives executor loss — the
    cluster choice) and uses ``localCheckpoint`` otherwise; ``local``
    and ``durable`` force the respective behavior (``durable`` without
    a checkpoint dir raises at run time, from Spark).  Lazy in both
    modes: nothing materializes until the first downstream action.

    Batch-only in the streaming PLAN path (an unbounded DataFrame
    cannot checkpoint); inside foreachBatch it is a per-micro-batch
    barrier, which is exactly what a $match-over-metric needs there
    too."""
    mode = (expression or {}).get("mode", "auto")
    if mode not in ("auto", "local", "durable"):
        raise ValueError(
            f"$materialize mode must be auto|local|durable, got {mode!r}")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _batch_only

        _batch_only("$materialize", c)
        if mode == "local":
            return df.localCheckpoint(eager=False)
        if mode == "durable":
            return df.checkpoint(eager=False)
        has_dir = c.spark.sparkContext._jsc.sc().getCheckpointDir() \
            .isDefined()
        return (df.checkpoint(eager=False) if has_dir
                else df.localCheckpoint(eager=False))

    return fn


def _poisson1_weight(seed: int, id_col: Column, r: Column) -> Column:
    """Deterministic Poisson(1) bootstrap weight for (segment, replicate):
    md5(seed:id:replicate) -> uniform in [0,1) -> inverse CDF (capped at
    8).  Column-building only — runs on the driver, nothing pickles."""
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), id_col, F.lit(":"),
                           r.cast("string"))),
            1, 15),
        16, 10).cast("double") / F.lit(float(16 ** 15))
    w: Column = F.lit(8)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("long")


@register_stage("$bootstrapCI")
def bootstrap_ci_stage(expression: Any, ctx: Context) -> StageFn:
    """Bootstrap confidence interval for a per-segment metric's mean:
    ``{id, input, samples?, alpha?, seed?}`` -> ONE row ``(n, mean,
    ci_low, ci_high, b_samples, alpha)`` — "BLEU 34.2 ± what?", the
    companion to $pairedBootstrap's two-system test.

    Each replicate resamples the segments (the same deterministic
    md5-derived Poisson(1) weights as $pairedBootstrap — reruns and
    the DuckDB oracle reproduce it bit-for-bit) and recomputes the
    weighted mean; the interval is the empirical
    ``[ceil((alpha/2)·B), ceil((1-alpha/2)·B)]``-th order statistics
    of the B replicate means (1-based, a pinned convention — no
    interpolation, so exact-rational inputs stay hash-stable).
    Replicates that draw zero total weight are excluded from the order
    statistics.  Rows with a null id/input are EXCLUDED; empty corpus
    -> n = 0, null interval.

    CORPUS-ONLY in streaming, like $pairedBootstrap.

    STATISTIC MODES (r11): ``statistic: "mean"`` (default) intervals
    the mean of the per-segment ``input`` column.  ``statistic:
    "corpusBleu" | "corpusChrf" | "corpusWer" | "corpusTer"``
    intervals the CORPUS
    metric — "corpus BLEU 34.2 ± what?" — recomputing it per replicate
    as ``score(Σ wᵢ·statsᵢ)`` over per-segment sufficient statistics
    (the Koehn 2004 procedure; see $pairedBootstrap).  In corpus modes
    the spec takes ``candidate`` (instead of ``input``) plus
    ``reference`` / ``references`` and the metric options; ``mean``
    carries the full-corpus score.  Replicates whose corpus score is
    undefined (e.g. corpusWer with an all-empty resampled reference)
    are excluded from the order statistics like zero-weight replicates.

    100 TB shape: identical to $pairedBootstrap — row-local replicate
    explode, partial-aggregated groupBy(replicate) (<= B rows per task
    before the only shuffle), then the B-row frame sorts in one task
    and combines with the 1-row base frame via the pinned broadcast
    cross join; the checkpoint barrier keeps an upstream metric
    program evaluated once per row."""
    id_e = expression["id"]
    statistic = expression.get("statistic", "mean")
    if statistic not in ("mean",) + _CORPUS_STATISTICS:
        raise ValueError(
            "$bootstrapCI statistic must be one of "
            f"mean|{'|'.join(_CORPUS_STATISTICS)}, got {statistic!r}")
    if statistic != "mean":
        machinery = _corpus_stat_machinery(statistic, expression,
                                           "$bootstrapCI")
        in_e = expression["candidate"]
    else:
        in_e = expression["input"]
    samples = int(expression.get("samples", 200))
    alpha = float(expression.get("alpha", 0.05))
    seed = int(expression.get("seed", 0))
    if not 1 <= samples <= 10000:
        raise ValueError("$bootstrapCI samples must be in 1..10000")
    if not 0.0 < alpha < 1.0:
        raise ValueError("$bootstrapCI alpha must be in (0, 1)")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        import math

        from ..operators.extended import _corpus_only

        _corpus_only("$bootstrapCI", c)
        sctx = ExprContext(schema=df.schema)
        idc = compile_expr(id_e, sctx).cast("string")
        has_dir = c.spark.sparkContext._jsc.sc().getCheckpointDir() \
            .isDefined()
        barrier = lambda d: (d.checkpoint(eager=False) if has_dir  # noqa: E731
                             else d.localCheckpoint(eager=False))
        if statistic != "mean":
            shared, build, stat_score, _lower, fields = machinery
            stage = df.withColumn("__bci_id", idc)
            stage, ok_sh = shared(stage, sctx)
            stage, ok_a = build(stage, sctx, in_e, "a")
            slim = stage.select(
                F.col("__bci_id").alias("__id"),
                (ok_sh & ok_a).alias("__ok"),
                *[F.col(f"__pba_{f}").alias(f"__a_{f}") for f in fields])
            slim = barrier(slim)
            pairs = slim.filter(
                F.col("__id").isNotNull() & F.col("__ok"))
            statcols = [f"__a_{f}" for f in fields]
            ws = F.transform(
                F.sequence(F.lit(1), F.lit(samples)),
                lambda r: _poisson1_weight(seed, F.col("__id"), r))
            ex = pairs.withColumn("__ws", ws).select(
                *statcols, F.posexplode("__ws").alias("__r", "__w"))
            wl = F.col("__w").cast("long")
            rep = ex.groupBy("__r").agg(
                *[F.sum(wl * F.col(sc)).alias(sc) for sc in statcols],
                F.sum("__w").alias("__wsum"))
            mean_r = F.when(
                F.col("__wsum") > 0,
                stat_score(lambda f: F.col(f"__a_{f}")))
            base_cols = [F.count(F.lit(1)).alias("n")] + \
                [F.sum(sc).alias(sc) for sc in statcols]
            base = pairs.agg(*base_cols).select(
                "n",
                stat_score(lambda f: F.col(f"__a_{f}")).alias("mean"))
        else:
            v = compile_expr(in_e, sctx).cast("double")
            slim = df.select(idc.alias("__id"), v.alias("__v"))
            slim = barrier(slim)
            pairs = slim.filter(
                F.col("__id").isNotNull() & F.col("__v").isNotNull())
            ws = F.transform(
                F.sequence(F.lit(1), F.lit(samples)),
                lambda r: _poisson1_weight(seed, F.col("__id"), r))
            ex = pairs.withColumn("__ws", ws).select(
                "__v", F.posexplode("__ws").alias("__r", "__w"))
            rep = ex.groupBy("__r").agg(
                F.sum(F.col("__w").cast("double") * F.col("__v"))
                .alias("__wv"),
                F.sum("__w").alias("__wsum"))
            mean_r = F.when(F.col("__wsum") > 0,
                            F.col("__wv") / F.col("__wsum").cast("double"))
            base = pairs.agg(F.count(F.lit(1)).alias("n"),
                             F.avg("__v").alias("mean"))
        lo_i = max(1, math.ceil(alpha / 2.0 * samples))
        hi_i = max(1, math.ceil((1.0 - alpha / 2.0) * samples))
        stats = rep.agg(
            F.sort_array(F.collect_list(mean_r)).alias("__means"))
        # order statistics over the DEFINED replicate means; indices
        # clamp to the defined count (all-zero-weight replicates only
        # happen on degenerate corpora)
        m = F.col("__means")
        cnt = F.size(m)
        pick = lambda i: F.when(  # noqa: E731
            cnt > 0, F.element_at(m, F.least(F.lit(i), cnt))
        ).otherwise(F.lit(None).cast("double"))
        summ = stats.select(pick(lo_i).alias("ci_low"),
                            pick(hi_i).alias("ci_high"))
        out = base.crossJoin(F.broadcast(summ))
        null_d = F.lit(None).cast("double")
        empty = F.col("n") == 0
        return out.select(
            "n",
            F.when(empty, null_d).otherwise(F.col("mean")).alias("mean"),
            F.when(empty, null_d).otherwise(F.col("ci_low"))
            .alias("ci_low"),
            F.when(empty, null_d).otherwise(F.col("ci_high"))
            .alias("ci_high"),
            F.lit(samples).cast("long").alias("b_samples"),
            F.lit(alpha).alias("alpha"),
        )

    return fn


# ----------------------------------------------------------------- SARI

@register_stage("$sari")
def sari_stage(expression: Any, ctx: Context) -> StageFn:
    """SARI (Xu et al. 2016, "Optimizing Statistical Machine Translation
    for Text Simplification", TACL) — THE text-simplification /
    text-rewriting metric: it compares the candidate against BOTH the
    source and the references, crediting n-grams correctly ADDED
    (in output and references but not source), correctly KEPT (in
    source, output and references) and correctly DELETED (dropped from
    the source like the references drop them): ``{source, candidate,
    reference | references, maxN?, maxWords?, caseSensitive?, as?}``
    adds ``struct<sari, add, keep, del>``.

    IMPLEMENTS THE PAPER'S EQUATIONS with multiset counts and
    fractional reference counts #g(r) = (sum over references of the
    gram count) / R (the paper's multi-reference treatment):

        p_add  = sum_g min(#g(c\\s), #g(r))   / sum_g #g(c\\s)
        r_add  = sum_g min(#g(c\\s), #g(r))   / sum_g #g(r\\s)
        p_keep = sum_g min(#g(cns), #g(snr)) / sum_g #g(cns)
        r_keep = sum_g min(#g(cns), #g(snr)) / sum_g #g(snr)
        p_del  = sum_g min(#g(s\\c), #g(s\\r)) / sum_g #g(s\\c)

    with multiset difference max(a-b, 0) and intersection min(a, b);
    F_add/F_keep are harmonic means, deletion uses PRECISION ONLY
    (paper §5: deletion recall rewards over-deleting), each operation
    score is the mean over n = 1..maxN (default 4), and
    SARI = (F_add + F_keep + P_del) / 3.  A 0/0 component is 0, the
    conventional guard.  NOTE: this is the paper-equation definition;
    the JHU "star" script adds per-gram ratio weighting in keep/delete
    — a documented deviation, not a bug.

    ``caseSensitive: false`` (default) lowercases everything first (the
    HF-evaluate convention).  Null candidate/source -> null struct;
    null references are dropped from the array (empty array -> null).

    100 TB shape: pure higher-order-function column program — one pass
    over the distinct-gram support per order, row-local, zero shuffle,
    O(maxN * |support| * (|c|+|s|+R*|r|)) per row, capped by
    ``maxWords`` (default 200 — simplification is sentence-level)."""
    src_e = expression["source"]
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$sari needs exactly one of reference | references")
    max_n = int(expression.get("maxN", 4))
    max_words = int(expression.get("maxWords", 200))
    case_sensitive = bool(expression.get("caseSensitive", False))
    as_field = expression.get("as", "sari")
    if not 1 <= max_n <= 8:
        raise ValueError("$sari maxN must be in 1..8")
    if max_words < 1:
        raise ValueError("$sari maxWords must be >= 1")

    _SARI_T = "struct<sari:double,add:double,keep:double,del:double>"

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # r13: heavy per-row column program — fan a single-scan-task
        # corpus out across cores first (dp_dedup._spread's row-group
        # gate makes this a no-op for already-wide real-scale inputs)
        df = _spread(df)
        sctx = ExprContext(schema=df.schema)
        src = compile_expr(src_e, sctx)
        cand = compile_expr(cand_e, sctx)
        if not case_sensitive:
            src, cand = F.lower(src), F.lower(cand)
        if refs_e is not None:
            refs = F.filter(compile_expr(refs_e, sctx),
                            lambda r: r.isNotNull())
        else:
            r1 = compile_expr(ref_e, sctx)
            refs = F.when(r1.isNotNull(), F.array(r1)) \
                .otherwise(F.array().cast("array<string>"))
        if not case_sensitive:
            refs = F.transform(refs, F.lower)
        stage = df.withColumn("__sa_ws", _eval_words(src, max_words)) \
                  .withColumn("__sa_wc", _eval_words(cand, max_words)) \
                  .withColumn("__sa_wrs",
                              F.transform(refs, lambda r: _eval_words(
                                  r, max_words)))
        ws, wc, wrs = (F.col("__sa_ws"), F.col("__sa_wc"),
                       F.col("__sa_wrs"))
        # floor at 1: rows with zero references are nulled by `valid`
        # below, but their support sets still evaluate — keep the
        # fractional-count division away from /0
        nref = F.greatest(F.size(wrs), F.lit(1)).cast("double")

        f_add_sum = F.lit(0.0)
        f_keep_sum = F.lit(0.0)
        p_del_sum = F.lit(0.0)
        for n in range(1, max_n + 1):
            stage = stage.withColumn(f"__sa_gs{n}", _eval_grams(ws, n))
            stage = stage.withColumn(f"__sa_gc{n}", _eval_grams(wc, n))
            stage = stage.withColumn(
                f"__sa_grs{n}",
                F.transform(wrs, lambda r: _eval_grams(r, n)))
            gs = F.col(f"__sa_gs{n}")
            gc = F.col(f"__sa_gc{n}")
            grs = F.col(f"__sa_grs{n}")
            support = F.array_distinct(
                F.concat(gc, gs, F.flatten(grs)))
            zero = F.struct(*[
                F.lit(0.0).alias(k)
                for k in ("an", "adp", "adr", "kn", "kdp", "kdr",
                          "dn", "ddp")])

            def step(acc: Column, g: Column) -> Column:
                cs = F.size(F.filter(gc, lambda x: x == g)) \
                    .cast("double")
                ss = F.size(F.filter(gs, lambda x: x == g)) \
                    .cast("double")
                rr = F.aggregate(
                    grs, F.lit(0.0),
                    lambda a, arr: a + F.size(
                        F.filter(arr, lambda x: x == g))) / nref
                c_minus_s = F.greatest(cs - ss, F.lit(0.0))
                r_minus_s = F.greatest(rr - ss, F.lit(0.0))
                c_and_s = F.least(cs, ss)
                s_and_r = F.least(ss, rr)
                s_minus_c = F.greatest(ss - cs, F.lit(0.0))
                s_minus_r = F.greatest(ss - rr, F.lit(0.0))
                return F.struct(
                    (acc["an"] + F.least(c_minus_s, rr)).alias("an"),
                    (acc["adp"] + c_minus_s).alias("adp"),
                    (acc["adr"] + r_minus_s).alias("adr"),
                    (acc["kn"] + F.least(c_and_s, s_and_r)).alias("kn"),
                    (acc["kdp"] + c_and_s).alias("kdp"),
                    (acc["kdr"] + s_and_r).alias("kdr"),
                    (acc["dn"] + F.least(s_minus_c, s_minus_r))
                    .alias("dn"),
                    (acc["ddp"] + s_minus_c).alias("ddp"),
                )

            stage = stage.withColumn(
                f"__sa_s{n}", F.aggregate(support, zero, step))
            s = F.col(f"__sa_s{n}")
            p_add = F.when(s["adp"] > 0, s["an"] / s["adp"]) \
                .otherwise(F.lit(0.0))
            r_add = F.when(s["adr"] > 0, s["an"] / s["adr"]) \
                .otherwise(F.lit(0.0))
            f_add = F.when(p_add + r_add > 0,
                           2.0 * p_add * r_add / (p_add + r_add)) \
                .otherwise(F.lit(0.0))
            p_keep = F.when(s["kdp"] > 0, s["kn"] / s["kdp"]) \
                .otherwise(F.lit(0.0))
            r_keep = F.when(s["kdr"] > 0, s["kn"] / s["kdr"]) \
                .otherwise(F.lit(0.0))
            f_keep = F.when(p_keep + r_keep > 0,
                            2.0 * p_keep * r_keep / (p_keep + r_keep)) \
                .otherwise(F.lit(0.0))
            p_del = F.when(s["ddp"] > 0, s["dn"] / s["ddp"]) \
                .otherwise(F.lit(0.0))
            f_add_sum = f_add_sum + f_add / max_n
            f_keep_sum = f_keep_sum + f_keep / max_n
            p_del_sum = p_del_sum + p_del / max_n

        valid = (src.isNotNull() & cand.isNotNull()
                 & (F.size(wrs) > 0))
        out = F.when(
            valid,
            F.struct(
                ((f_add_sum + f_keep_sum + p_del_sum) / 3.0)
                .alias("sari"),
                f_add_sum.alias("add"),
                f_keep_sum.alias("keep"),
                p_del_sum.alias("del"),
            ),
        ).otherwise(F.lit(None).cast(_SARI_T))
        stage = stage.withColumn(as_field, out)
        return stage.drop(*[c_ for c_ in stage.columns
                            if c_.startswith("__sa_")])

    return fn


@register_stage("$permutationTest")
def permutation_test_stage(expression: Any, ctx: Context) -> StageFn:
    """Paired sign-flip permutation test (Fisher randomization; the
    exact-test alternative to $pairedBootstrap): ``{id, a, b,
    samples?, seed?}`` -> ONE row ``(n, mean_a, mean_b, delta,
    extreme, b_samples, p_value)``.

    Under H0 (no systematic difference) each paired delta d_i =
    a_i - b_i is symmetric, so its sign is exchangeable: replicate r
    flips each d_i by a deterministic coin from ``md5(seed:id:r)``
    (the $pairedBootstrap derivation with u < 0.5 as the flip) and
    recomputes the summed delta.  Two-sided p-value with the
    add-one correction p = (1 + #{r : |T_r| >= |T_obs|}) / (B + 1)
    (Phipson & Smyth 2010 — a permutation p of exactly 0 is
    impossible by construction).  Replicates compare SUMS, not means
    (same n every replicate), so no division enters the comparison.

    DETERMINISM + CORPUS-ONLY: exactly the $pairedBootstrap contract
    — pure function of the data, bit-reproducible, DuckDB-oracle-able,
    gated in streaming.  Rows with a null id/a/b are EXCLUDED."""
    id_e = expression["id"]
    a_e = expression["a"]
    b_e = expression["b"]
    samples = int(expression.get("samples", 200))
    seed = int(expression.get("seed", 0))
    if not 1 <= samples <= 10000:
        raise ValueError("$permutationTest samples must be in 1..10000")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _corpus_only

        _corpus_only("$permutationTest", c)
        sctx = ExprContext(schema=df.schema)
        idc = compile_expr(id_e, sctx).cast("string")
        a = compile_expr(a_e, sctx).cast("double")
        b = compile_expr(b_e, sctx).cast("double")
        base = df.select(
            idc.alias("__id"), a.alias("__a"), b.alias("__b")).filter(
            F.col("__id").isNotNull() & F.col("__a").isNotNull()
            & F.col("__b").isNotNull())
        obs = base.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__a").alias("__sa"),
            F.sum("__b").alias("__sb"),
            F.sum(F.col("__a") - F.col("__b")).alias("__t"))
        reps = base.select(
            "__id", (F.col("__a") - F.col("__b")).alias("__d"),
            F.explode(F.sequence(F.lit(1), F.lit(samples)))
            .alias("__r"))
        u = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col("__id"),
                               F.lit(":"), F.col("__r").cast("string"))),
                1, 15),
            16, 10).cast("double") / F.lit(float(16 ** 15))
        sign = F.when(u < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        per_rep = reps.select(
            "__r", (sign * F.col("__d")).alias("__sd")).groupBy(
            "__r").agg(F.sum("__sd").alias("__tr"))
        ext = per_rep.join(F.broadcast(obs), F.lit(True), "left").agg(
            F.sum((F.abs(F.col("__tr")) >= F.abs(F.col("__t")))
                  .cast("long")).alias("extreme"))
        out = obs.join(F.broadcast(ext), F.lit(True), "left")
        n_d = F.col("n").cast("double")
        return out.select(
            F.col("n"),
            F.when(F.col("n") > 0, F.col("__sa") / n_d)
            .alias("mean_a"),
            F.when(F.col("n") > 0, F.col("__sb") / n_d)
            .alias("mean_b"),
            F.when(F.col("n") > 0, F.col("__t") / n_d).alias("delta"),
            F.when(F.col("n") > 0, F.col("extreme")).alias("extreme"),
            F.lit(samples).cast("long").alias("b_samples"),
            F.when(F.col("n") > 0,
                   (F.col("extreme") + 1.0) / (samples + 1.0))
            .alias("p_value"),
        )

    return fn
