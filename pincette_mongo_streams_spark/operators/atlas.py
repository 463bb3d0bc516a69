"""Atlas-syntax compatibility stages: ``$vectorSearch`` and ``$search``.

MongoDB Atlas users write ``$vectorSearch`` / ``$search`` as the FIRST
stage of a pipeline; this module accepts that syntax and maps it onto
the engine's native retrieval machinery so those pipelines run
unchanged:

- ``$vectorSearch`` → row-local cosine scoring + TakeOrderedAndProject
  (the $annTopK plan for a single literal query vector).  Scores follow
  Atlas' cosine normalization ``(1 + cos) / 2``.  ``filter`` compiles
  through the $match language and pushes down to the scan.
  ``exact: false`` opts into the LSH-pruned scan (query bucket +
  1-bit-flip multiprobe, hyperplanes shared with $annLsh);
  ``exact: true`` — the default, recall 1.0 — scans everything.  The
  horizontal-scale multi-query ANN paths remain
  $annLshSearch/$annIvfSearch.
- ``$search`` (``text`` operator subset) → the $bm25 scoring fold over
  one or more paths, emitting every matching document ordered by score;
  a following ``$limit`` collapses the global sort into
  TakeOrderedAndProject (Catalyst), which is how Atlas pipelines are
  written anyway.

Both stages bind their relevance score to a hidden column that the
``{"$meta": "vectorSearchScore" | "searchScore"}`` expression
(expressions.py) reads — the Atlas idiom
``{"$project": {"score": {"$meta": "vectorSearchScore"}}}`` works
as-is.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..context import Context
from ..expressions import ExprContext, compile_expr
from ..match import compile_match
from ..paths import nested_col, split_path
from ..pipeline import StageFn, register_stage

VSCORE = "__meta_vectorSearchScore"
SSCORE = "__meta_searchScore"


@register_stage("$vectorSearch")
def vector_search_stage(expression: Any, ctx: Context) -> StageFn:
    """``{index?, path, queryVector, numCandidates?, limit, filter?,
    exact?, bits?}`` — Atlas $vectorSearch syntax.

    ``exact: true`` (the default here — recall 1.0, never worse than
    Atlas' ANN; Atlas defaults to approximate) scans the whole
    (filtered) corpus.  ``exact: false`` prunes the scan with the
    engine's sign-bit LSH:
    the query vector's bucket is computed driver-side from the SAME
    md5-derived hyperplanes the corpus column uses, and only rows in the
    query's bucket or a 1-bit-flip neighbor (standard multiprobe) get
    the exact cosine — ``bits`` (default 8) sizes the pruning; recall is
    standard-LSH approximate.  ``numCandidates`` is accepted for
    syntax compatibility (bucket membership, not a candidate count, is
    the pruning unit here)."""
    path = expression["path"]
    qv = [float(x) for x in expression["queryVector"]]
    limit = int(expression["limit"])
    flt = expression.get("filter")
    exact = bool(expression.get("exact", True))
    bits = int(expression.get("bits", 8))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        ectx = ExprContext(schema=df.schema)
        if flt:
            df = df.filter(compile_match(flt, ectx))
        emb = nested_col(split_path(path)).cast("array<double>")
        if not exact:
            from ..functions.datapipe import _plane_component, lsh_bucket

            dim = len(qv)
            qb = 0
            for j in range(bits):
                dot = sum(
                    qv[d] * _plane_component(j, d) for d in range(dim)
                )
                if dot >= 0:
                    qb |= 1 << j
            probes = [qb] + [qb ^ (1 << j) for j in range(bits)]
            df = df.filter(lsh_bucket(emb, bits, dim).isin(probes))
        qlit = F.array(*[F.lit(x) for x in qv])
        import math

        qn = math.sqrt(sum(x * x for x in qv)) or 1.0
        dot = F.expr(
            f"aggregate(zip_with(`__vs_e`, `__vs_q`, (a, b) -> a * b), "
            f"0.0D, (acc, x) -> acc + x)"
        )
        cn = F.expr(
            "sqrt(aggregate(`__vs_e`, 0.0D, (acc, x) -> acc + x * x))"
        )
        scored = (
            df.withColumn("__vs_e", emb)
            .withColumn("__vs_q", qlit)
            .withColumn(
                VSCORE,
                (F.lit(1.0) + dot / F.when(cn > 0, cn * F.lit(qn)))
                / F.lit(2.0),
            )
            .drop("__vs_e", "__vs_q")
        )
        order_keys = [F.col(VSCORE).desc()] + [
            F.col(x) for x in df.columns[:1]
        ]
        # null/zero-norm/wrong-length embeddings score NULL — exclude
        # them (Atlas only returns indexed vectors) instead of letting
        # null-scored rows pad the top-k when limit exceeds the matches
        return (
            scored.filter(F.col(VSCORE).isNotNull())
            .orderBy(*order_keys)
            .limit(limit)
        )

    return fn


@register_stage("$search")
def search_stage(expression: Any, ctx: Context) -> StageFn:
    """``{index?, text: {query, path}}`` — the Atlas $search ``text``
    operator subset, BM25-scored (k1=1.2, b=0.75).  Emits every document
    with a positive score, ordered by score descending; compose with
    ``$limit`` for top-k (collapses to TakeOrderedAndProject)."""
    spec = expression.get("text")
    if not isinstance(spec, dict):
        raise NotImplementedError(
            "$search supports the `text` operator (compound/autocomplete "
            "and friends are Atlas-index features)"
        )
    query = spec["query"]
    paths = spec["path"]
    if isinstance(paths, str):
        paths = [paths]
    import re as _re

    terms = list(dict.fromkeys(
        t for t in _re.sub(r"[^a-z0-9 ]", " ", query.lower()).split() if t
    ))
    if not terms:
        raise ValueError("$search text.query needs at least one term")
    k1, b = 1.2, 0.75

    def fn(df: DataFrame, c: Context) -> DataFrame:
        terms_sql = ", ".join(
            "'" + t.replace("'", "''") + "'" for t in terms
        )
        out = df
        for pi, p in enumerate(paths):
            text = compile_expr(f"${p}", ExprContext(schema=df.schema))
            # a null path must contribute an EMPTY token list, not null:
            # a null tf array would null the summed score (dropping docs
            # that match on another path) and size(null) = -1 would
            # pollute the avgdl length normalization
            toks = F.coalesce(
                F.filter(
                    F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
                ),
                F.array().cast("array<string>"),
            )
            out = out.withColumn(f"__s_toks{pi}", toks).withColumn(
                f"__s_tfs{pi}",
                F.expr(
                    f"aggregate(`__s_toks{pi}`, "
                    f"array_repeat(0.0D, {len(terms)}), "
                    f"(acc, t) -> zip_with(acc, array({terms_sql}), "
                    f"(a, trm) -> a + if(t = trm, 1.0D, 0.0D)))"
                ),
            ).withColumn(
                f"__s_dl{pi}",
                F.expr(f"cast(size(`__s_toks{pi}`) as double)"),
            ).drop(f"__s_toks{pi}")
        stats = out.groupBy().agg(
            F.expr("cast(count(1) as double)").alias("__n"),
            *[F.expr(f"avg(__s_dl{pi})").alias(f"__avgdl{pi}")
              for pi in range(len(paths))],
            *[
                F.expr(
                    f"sum(cast(__s_tfs{pi}[{i}] > 0 as double))"
                ).alias(f"__df{pi}_{i}")
                for pi in range(len(paths))
                for i in range(len(terms))
            ],
        )
        joined = out.crossJoin(F.broadcast(stats))
        score_sql = " + ".join(
            f"ln(1.0D + (__n - __df{pi}_{i} + 0.5D) / (__df{pi}_{i} + 0.5D))"
            f" * __s_tfs{pi}[{i}] * {k1 + 1.0}D"
            f" / (__s_tfs{pi}[{i}] + {k1}D * ({1.0 - b}D + {b}D * "
            f"__s_dl{pi} / __avgdl{pi}))"
            for pi in range(len(paths))
            for i in range(len(terms))
        )
        scored = joined.withColumn(
            SSCORE, F.expr(f"0.0D + {score_sql}")
        )
        drop = (
            ["__n"]
            + [f"__avgdl{pi}" for pi in range(len(paths))]
            + [f"__df{pi}_{i}" for pi in range(len(paths))
               for i in range(len(terms))]
            + [f"__s_tfs{pi}" for pi in range(len(paths))]
            + [f"__s_dl{pi}" for pi in range(len(paths))]
        )
        return (
            scored.filter(F.col(SSCORE) > 0)
            .drop(*drop)
            .orderBy(F.col(SSCORE).desc(), *[F.col(df.columns[0])])
        )

    return fn


@register_stage("$searchMeta")
def search_meta_stage(expression: Any, ctx: Context) -> StageFn:
    """``{index?, text: {query, path}, count?: {type}}`` — Atlas
    $searchMeta's count form: ONE row ``{count: {total}}`` with the
    number of documents the equivalent $search would return.  Always
    reports an exact ``total`` (Atlas's lowerBound mode is an
    index-internal shortcut; exact is never less correct).  Facet
    collection is ``$facet``'s job in this engine."""
    cnt = expression.get("count", {})
    if not isinstance(cnt, dict):
        raise ValueError("$searchMeta count takes an options document")
    if cnt.get("type", "total") not in ("total", "lowerBound"):
        raise ValueError(
            f"$searchMeta count.type must be total or lowerBound, "
            f"got {cnt.get('type')!r}"
        )
    if "facet" in expression:
        raise NotImplementedError(
            "$searchMeta facets: use $search + $facet (native facets)"
        )
    spec = expression.get("text")
    if not isinstance(spec, dict):
        raise NotImplementedError("$searchMeta supports the text operator")
    query = spec["query"]
    paths = spec["path"]
    if isinstance(paths, str):
        paths = [paths]
    import re as _re

    terms = list(dict.fromkeys(
        t for t in _re.sub(r"[^a-z0-9 ]", " ", query.lower()).split() if t
    ))
    if not terms:
        raise ValueError("$searchMeta text.query needs at least one term")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        # a document counts iff ANY path contains ANY query term — the
        # BM25 score is positive exactly then, so the count needs only a
        # tokenize + overlap filter, not the full scoring plan
        tlit = F.array(*[F.lit(t) for t in terms])
        match = None
        for p in paths:
            text = compile_expr(f"${p}", ExprContext(schema=df.schema))
            toks = F.coalesce(
                F.filter(
                    F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
                ),
                F.array().cast("array<string>"),
            )
            m = F.arrays_overlap(toks, tlit)
            match = m if match is None else (match | m)
        return df.filter(match).groupBy().agg(
            F.count(F.lit(1)).alias("__n")
        ).select(F.struct(F.col("__n").alias("total")).alias("count"))

    return fn
