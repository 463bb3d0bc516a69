"""Beyond-reference operators for large-scale training-data pipelines.

These are first-class ``$``-stages on the same pipeline compiler (SURVEY.md
§7 step 8): deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality scoring, token counting,
fingerprinting) and multimodal column plumbing.

Scale design notes (the 100 TB story, per operator):

- Hashing uses **md5** (available and bit-identical in both Spark and
  DuckDB) so every operator stays oracle-checkable; at production scale
  swap to xxhash64 via one constant.
- Exact dedup: hash-partitioned window, one shuffle on the key.
- MinHash/LSH: signatures are computed row-local (higher-order functions,
  no UDF, no shuffle); the only shuffle is the band-bucket explode+groupBy,
  and candidate pruning keeps the min doc per bucket — no O(n²) pair join.
- Embedding ops: dot products via ``F.aggregate``/``zip_with`` stay inside
  codegen; brute-force ANN broadcasts the (small) query set so the corpus
  never shuffles; the LSH variant buckets by random-hyperplane sign bits.
- Multimodal: media live as opaque ``binary`` columns + typed metadata;
  decode/extract runs in Arrow-batched ``mapInPandas`` (the real decode
  libs are not in this container — the codec boundary is stubbed
  deterministically, the Spark plumbing is real).
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

# ------------------------------------------------------------------ hashing


def md5_long(col: Column, seed: int) -> Column:
    """Deterministic 60-bit hash reproducible in DuckDB:
    ``conv(substr(md5(concat(seed,':',x)),1,15),16,10)``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


def _spread(df: DataFrame) -> DataFrame:
    """Fan a compute-bound stage out to all cores.  Small files arrive as a
    single scan partition (one 500 KB parquet = one task), serializing
    per-row-heavy hash/regex work; a cheap round-robin repartition fixes
    that.  Gated so large inputs (already many partitions at 100 TB) are
    never reshuffled."""
    try:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < max(2, parallelism // 2):
            return df.repartition(parallelism)
    except Exception:
        pass
    return df


def _seeded_hasher(seed: int):
    """Bind the hash seed via closure — a ``lambda s, i=i:`` default arg
    would change the lambda's arity and make pyspark pass the array index
    as the second argument."""

    def h(s: Column) -> Column:
        return md5_long(s, seed)

    return h


def word_shingles(col: Column, n: int) -> Column:
    """Distinct word n-grams of a lowercased text column — computed with
    higher-order functions only (row-local, codegen-friendly)."""
    words = F.split(F.lower(col), "\\s+")
    k = F.size(words) - F.lit(n - 1)
    idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    )


# whitespace class shared with the DuckDB oracles: Java's \s and RE2's
# \s disagree on vertical tab (\x0B), so operators whose oracle
# tokenizes in SQL spell the set out explicitly on both sides
_WS = "[ \\t\\n\\r\\f\\x0B]"


# --------------------------------------------------- embedding-pair shared


def _unit_vector(emb: Column) -> Column:
    """Unit-normalize ONCE per row (zero vectors pass through) so each
    candidate pair later costs a single dot product — norms recomputed
    per pair would triple the pairwise HOF work."""
    norm = F.sqrt(
        F.aggregate(F.transform(emb, lambda x: x * x), F.lit(0.0),
                    lambda acc, v: acc + v)
    )
    return F.when(norm > 0, F.transform(emb, lambda x: x / norm)).otherwise(emb)


def _pair_dot(a: Column, b: Column) -> Column:
    """Dot product of two (unit) vectors — codegen fold, zero shuffle."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, v: acc + v)


def _cc_labels(pairs: DataFrame) -> DataFrame:
    """Connected components over a near-dup pair frame (__ida, __idb):
    resolves chained near-dups (a≈b≈c with a̸≈c) into one component,
    labeled by its min id (columns __cc_node, __cc_comp)."""
    from ..operators.graphcc import connected_components

    return connected_components(
        pairs.select(F.col("__ida").alias("a"), F.col("__idb").alias("b")))


def _annotate_components(df: DataFrame, labels: DataFrame,
                         id_field: str, as_field: str) -> DataFrame:
    """ANNOTATE mode shared by $minhashDedup/$embedDedup/$semanticDedup:
    label every row with its component id (isolated rows label
    themselves) instead of dropping."""
    lab = labels.select(F.col("__cc_node").alias("__did"),
                        F.col("__cc_comp").alias("__lab"))
    return (
        df.join(lab, df[id_field] == lab["__did"], "left")
        .withColumn(as_field, F.coalesce(F.col("__lab"), F.col(id_field)))
        .drop("__did", "__lab")
    )


def _component_dups(labels: DataFrame) -> DataFrame:
    """Every non-representative component member as a (__did) frame —
    exactly the min-id doc of each cluster survives the anti-join."""
    return (
        labels.filter(F.col("__cc_node") != F.col("__cc_comp"))
        .select(F.col("__cc_node").alias("__did"))
    )


# ------------------------------------------------------------- exact dedup


@register_stage("$dedupExact")
def dedup_exact_stage(expression: Any, ctx: Context) -> StageFn:
    """Exact dedup on one or more key expressions: single hash-partitioned
    shuffle; deterministic keeper = min of ``keep`` column (default: first
    key col order)."""
    keys = expression["keys"] if isinstance(expression, dict) else [expression]
    keep_by = expression.get("keepBy") if isinstance(expression, dict) else None

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from pyspark.sql import Window

        ectx = ExprContext(schema=df.schema)
        key_cols = [compile_expr(k, ectx).alias(f"__k{i}") for i, k in enumerate(keys)]
        order = (
            compile_expr(keep_by, ectx)
            if keep_by is not None
            else (F.col(c.order_by) if c.order_by and c.order_by in df.columns
                  else F.monotonically_increasing_id())
        )
        tagged = df.select("*", *key_cols, order.alias("__keep"))
        w = Window.partitionBy(*[F.col(f"__k{i}") for i in range(len(keys))]).orderBy("__keep")
        return (
            tagged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__keep", *[f"__k{i}" for i in range(len(keys))])
        )

    return fn


# ------------------------------------------------------------ MinHash/LSH

MINHASH_P = (1 << 31) - 1  # Mersenne prime: products stay under 2^62

# $embedDedup: corpora estimated above this refuse the exact O(n²)
# all-pairs plan unless {exact: true} (use {bits: k} LSH instead)
ALL_PAIRS_SIZE_LIMIT = 32 << 20


def minhash_coeffs(num: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a_i, b_i), shared with the
    oracle SQL generator."""
    return [
        ((i * 2654435761 + 1) % MINHASH_P or 1, (i * 40503 + 7) % MINHASH_P)
        for i in range(num)
    ]


def minhash_bases(text: Column, n: int) -> Column:
    """One md5-derived base hash per distinct shingle (the expensive part,
    computed exactly once)."""
    sh = word_shingles(text, n)
    return F.transform(sh, lambda s: md5_long(s, 0) % F.lit(MINHASH_P))


def minhash_sig_from_bases(bases: Column, num: int) -> Column:
    """num cheap (a*h+b) mod P permutations over the materialized base-hash
    array; each term is a tiny codegen-friendly transform+min.  (Chaining
    the md5 inside every term would recompute it num times; folding with
    nested zip_with drops out of codegen — both measured much slower.)"""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    bases,
                    (lambda a_, b_: lambda h: (F.lit(a_) * h + F.lit(b_))
                     % F.lit(MINHASH_P))(a, b),
                )
            )
            for a, b in minhash_coeffs(num)
        ]
    )


def minhash_sig_sql(bases_col: str, num: int) -> Column:
    """Same expression as ``minhash_sig_from_bases`` over a named column,
    built as ONE SQL string: the per-permutation ``F.transform`` lambdas
    cost a py4j roundtrip each (~0.6 s of plan-build time at num=32),
    while one ``F.expr`` is a single roundtrip.  Products stay < 2^62
    (both factors < MINHASH_P = 2^31-1), so no ANSI overflow."""
    terms = ", ".join(
        f"array_min(transform(`{bases_col}`, h -> ({a}L * h + {b}L) % {MINHASH_P}L))"
        for a, b in minhash_coeffs(num)
    )
    return F.expr(f"array({terms})")


def minhash_signature(text: Column, n: int, num: int) -> Column:
    return minhash_sig_from_bases(minhash_bases(text, n), num)


@register_stage("$minhash")
def minhash_stage(expression: Any, ctx: Context) -> StageFn:
    """Add a MinHash signature column: ``{input, as, shingle: n, numHashes}``.
    Row-local, no shuffle, single pass over the shingles."""
    inp = expression["input"]
    as_field = expression.get("as", "minhash")
    n = int(expression.get("shingle", 3))
    num = int(expression.get("numHashes", 32))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        df = _spread(df)
        text = compile_expr(inp, ExprContext(schema=df.schema))
        # two steps so the 32 permutation terms reference the materialized
        # base array (multi-referenced aliases survive CollapseProject)
        return (
            df.withColumn("__mh_bases", minhash_bases(text, n))
            .withColumn(as_field, minhash_sig_sql("__mh_bases", num))
            .drop("__mh_bases")
        )

    return fn


def minhash_band_hashes(sig_col: str, bands: int,
                        rows_per_band: int) -> list:
    """Band hashes over a MinHash signature column — ONE format shared by
    $minhashDedup and $crossDedup (the DuckDB oracles pin it, so the two
    stages must never drift apart)."""
    return [
        F.md5(F.concat_ws(",", *[
            F.lit(b),
            F.slice(F.col(sig_col), b * rows_per_band + 1,
                    rows_per_band).cast("string"),
        ]))
        for b in range(bands)
    ]


def _check_bands(stage: str, num: int, bands: int) -> None:
    """bands must tile numHashes exactly: rows_per_band = 0 would make
    every band hash identical (silently deleting the whole corpus), and a
    non-divisible split silently ignores trailing signature rows."""
    if bands <= 0 or bands > num or num % bands != 0:
        raise ValueError(
            f"{stage}: numHashes ({num}) must be divisible by bands "
            f"({bands}) with 1 <= bands <= numHashes"
        )


@register_stage("$minhashDedup")
def minhash_dedup_stage(expression: Any, ctx: Context) -> StageFn:
    """Near-dup removal via MinHash + LSH banding.

    ``{input, id, shingle, numHashes, bands, verify?, transitive?}`` —
    docs sharing any band bucket are candidate duplicates; within a
    bucket only the min-``id`` doc survives.  This is the scale path:
    explode to (band, bucket-hash) pairs, one groupBy over buckets, one
    semi-join back — never a pairwise O(n²) comparison.  Bucket-transitive
    pruning is slightly more aggressive than exact pairwise Jaccard >= t
    (standard LSH); ``verify: <threshold>`` adds an exact-Jaccard check on
    each (bucket keeper, member) candidate pair — only pairs whose TRUE
    shingle Jaccard reaches the threshold are dropped, at the cost of one
    extra candidate-sized join (candidates are bucket-bounded, not n²).

    ``transitive: true`` resolves candidate pairs with connected
    components (operators/graphcc.py) instead of per-bucket pruning:
    overlapping buckets merge into one cluster and exactly the min-id doc
    of each *transitive* cluster survives (per-bucket pruning can leave
    several survivors in a chained cluster, e.g. buckets {b,c} and {a,b}
    keep both a and b).  The pair graph stays linear in bucket size —
    star edges (member, bucket keeper), never all pairs.  With ``verify``
    the edges are the verified pairs, so clusters only span docs whose
    pairwise path passed the exact-Jaccard check.

    ``as: "<field>"`` (requires ``transitive: true``) switches to
    ANNOTATE mode: every row is kept and labeled with its transitive
    cluster id (the component's min id; singletons label themselves)
    instead of dropping non-canonical members — compose with
    ``$groupCap {by: "$<field>", cap: 1, sortBy: {quality: -1, ...}}``
    to keep the best-quality document per near-dup cluster rather than
    the min-id one.
    """
    inp = expression["input"]
    id_field = expression.get("id", "_id")
    n = int(expression.get("shingle", 3))
    num = int(expression.get("numHashes", 32))
    bands = int(expression.get("bands", 8))
    verify = expression.get("verify")
    transitive = bool(expression.get("transitive", False))
    as_field = expression.get("as")
    if as_field and not transitive:
        raise ValueError(
            "$minhashDedup as (annotate mode) requires transitive: true — "
            "cluster labels are connected-component ids; per-bucket "
            "pruning has no single well-defined cluster per document")
    _check_bands("$minhashDedup", num, bands)
    rows_per_band = num // bands

    def fn(df: DataFrame, c: Context) -> DataFrame:
        df = _spread(df)
        text = compile_expr(inp, ExprContext(schema=df.schema))
        band_hash = minhash_band_hashes("__sig", bands, rows_per_band)
        with_sig = (
            df.withColumn("__mh_bases", minhash_bases(text, n))
            .withColumn("__sig", minhash_sig_sql("__mh_bases", num))
            .drop("__mh_bases")
        )
        buckets = with_sig.select(
            F.col(id_field).alias("__did"), F.explode(F.array(*band_hash)).alias("__bucket")
        )
        # min doc id per bucket survives; every other bucket member is a dup
        keepers = buckets.groupBy("__bucket").agg(F.min("__did").alias("__keep"))
        cands = (
            buckets.join(keepers, "__bucket")
            .filter(F.col("__did") != F.col("__keep"))
            .select("__did", "__keep")
            .distinct()
        )
        if verify is not None:
            # exact-Jaccard confirmation per candidate pair over the true
            # shingle sets — candidate-sized work, not all-pairs
            sh = df.select(F.col(id_field).alias("__vid"),
                           word_shingles(text, n).alias("__vsh"))
            sa = sh.select(F.col("__vid").alias("__did"),
                           F.col("__vsh").alias("__sha"))
            sb = sh.select(F.col("__vid").alias("__keep"),
                           F.col("__vsh").alias("__shb"))
            inter = F.size(F.array_intersect("__sha", "__shb"))
            cands = (
                cands.join(sa, "__did").join(sb, "__keep")
                .filter(
                    inter / (F.size("__sha") + F.size("__shb") - inter)
                    >= float(verify)
                )
            )
        if transitive:
            from ..operators.graphcc import connected_components

            labels = connected_components(
                cands.select(F.col("__did").alias("a"), F.col("__keep").alias("b"))
            )
            if as_field:
                # annotate mode: keep every row, add the transitive
                # cluster id (min id of the component; singletons label
                # themselves) — compose with $groupCap {by: "$<as>"} to
                # keep the BEST doc per cluster instead of the min-id one
                lab = labels.select(
                    F.col("__cc_node").alias("__did"),
                    F.col("__cc_comp").alias("__lab"),
                )
                return (
                    with_sig.join(
                        lab, with_sig[id_field] == lab["__did"], "left")
                    .withColumn(
                        as_field,
                        F.coalesce(F.col("__lab"), F.col(id_field)))
                    .drop("__did", "__lab", "__sig")
                )
            dups = (
                labels.filter(F.col("__cc_node") != F.col("__cc_comp"))
                .select(F.col("__cc_node").alias("__did"))
            )
        else:
            dups = cands.select(F.col("__did")).distinct()
        return with_sig.join(
            dups, with_sig[id_field] == dups["__did"], "left_anti"
        ).drop("__sig")

    return fn


@register_stage("$crossDedup")
def cross_dedup_stage(expression: Any, ctx: Context) -> StageFn:
    """Cross-corpus near-dup removal: drop input documents that
    near-duplicate ANY document of a *reference* collection.

    ``{from, input, foreignInput?, id, shingle, numHashes, bands,
    verify?}`` — the near-dup generalization of ``$decontaminate``
    (which needs exact shingle overlap and broadcasts the benchmark):
    here BOTH corpora can be 100 TB class.  Each side computes MinHash
    band hashes row-locally; the membership test is a bucket equi-join —
    the input explodes to (id, bucket), the reference reduces to DISTINCT
    buckets, and a left-semi join marks contaminated ids.  Nothing
    broadcasts, nothing is pairwise.  ``verify: <threshold>`` joins the
    true shingle sets of each candidate (input, reference) pair and keeps
    only exact Jaccard ≥ threshold — candidate-sized work, bucket-bounded.

    Input rows are REMOVED when contaminated (the ``$decontaminate``
    convention of keeping a flag column is available by composing
    ``$minhash`` + ``$lookup`` instead).
    """
    from_coll = expression["from"]
    inp = expression["input"]
    fin = expression.get("foreignInput", inp)
    id_field = expression.get("id", "_id")
    n = int(expression.get("shingle", 3))
    num = int(expression.get("numHashes", 32))
    bands = int(expression.get("bands", 8))
    verify = expression.get("verify")
    _check_bands("$crossDedup", num, bands)
    rows_per_band = num // bands

    def band_hashes(sig_col: str) -> list:
        return minhash_band_hashes(sig_col, bands, rows_per_band)

    def fn(df: DataFrame, c: Context) -> DataFrame:
        df = _spread(df)
        ref = c.collection(from_coll)
        text = compile_expr(inp, ExprContext(schema=df.schema))
        rtext = compile_expr(fin, ExprContext(schema=ref.schema))
        left_sig = (
            df.withColumn("__mh_bases", minhash_bases(text, n))
            .withColumn("__sig", minhash_sig_sql("__mh_bases", num))
        )
        right_sig = (
            ref.withColumn("__mh_bases", minhash_bases(rtext, n))
            .withColumn("__sig", minhash_sig_sql("__mh_bases", num))
        )
        lb = left_sig.select(
            F.col(id_field).alias("__did"),
            F.explode(F.array(*band_hashes("__sig"))).alias("__bucket"),
        )
        if verify is None:
            rb = right_sig.select(
                F.explode(F.array(*band_hashes("__sig"))).alias("__bucket")
            ).distinct()
            dups = lb.join(rb, "__bucket", "left_semi").select(
                "__did"
            ).distinct()
        else:
            # candidate pairs carry only ids through the bucket join; the
            # true shingle sets are fetched per-side afterwards (the
            # $minhashDedup verify pattern — shipping shingle arrays
            # through the band explode would multiply the shuffle payload
            # by `bands`).  The reference-side key is a deterministic
            # content hash, so retries and re-reads agree.
            rkey = F.xxhash64(rtext)
            rb = right_sig.select(
                rkey.alias("__rid"),
                F.explode(F.array(*band_hashes("__sig"))).alias("__bucket"),
            )
            rsh = ref.select(
                rkey.alias("__rid"), word_shingles(rtext, n).alias("__shb")
            ).dropDuplicates(["__rid"])
            lsh = df.select(
                F.col(id_field).alias("__did"),
                word_shingles(text, n).alias("__sha"),
            )
            pairs = (
                lb.join(rb, "__bucket")
                .select("__did", "__rid")
                .distinct()
                .join(rsh, "__rid")
                .join(lsh, "__did")
            )
            inter = F.size(F.array_intersect("__sha", "__shb"))
            dups = pairs.filter(
                inter / (F.size("__sha") + F.size("__shb") - inter)
                >= float(verify)
            ).select("__did").distinct()
        return df.join(
            dups, df[id_field] == dups["__did"], "left_anti"
        )

    return fn


@register_stage("$jaccardJoin")
def jaccard_join_stage(expression: Any, ctx: Context) -> StageFn:
    """Near-dup PAIR output: ``{from?, input, id, foreignInput?,
    foreignId?, shingle, numHashes, bands, threshold}`` →
    ``(left_id, right_id, jaccard)`` rows for every candidate pair whose
    exact shingle Jaccard reaches ``threshold``.

    The analytical counterpart of $minhashDedup (which *removes*): the
    pair list feeds near-dup graph audits, cluster review, and
    $connectedComponents without deciding survivors.  Same scale
    profile: candidates come from the MinHash band-bucket equi-join
    (never all-pairs), collapse to DISTINCT id pairs (a pair colliding
    in several bands verifies once), and the exact-Jaccard verify
    fetches each side's shingle set by id — candidate-sized joins.
    Without ``from`` it is a self-join emitting each unordered pair once
    (left_id < right_id).  ``jaccard`` is rounded half-up at 9 digits
    (the SQL-oracle convention).
    """
    from_coll = expression.get("from")
    inp = expression["input"]
    id_field = expression.get("id", "_id")
    fin = expression.get("foreignInput", inp)
    fid = expression.get("foreignId", id_field)
    n = int(expression.get("shingle", 3))
    num = int(expression.get("numHashes", 32))
    bands = int(expression.get("bands", 8))
    threshold = float(expression.get("threshold", 0.7))
    _check_bands("$jaccardJoin", num, bands)
    rows_per_band = num // bands

    def fn(df: DataFrame, c: Context) -> DataFrame:
        df = _spread(df)
        text = compile_expr(inp, ExprContext(schema=df.schema))
        left = (
            df.withColumn("__mh_bases", minhash_bases(text, n))
            .withColumn("__sig", minhash_sig_sql("__mh_bases", num))
        )
        lb = left.select(
            F.col(id_field).alias("left_id"),
            F.explode(
                F.array(*minhash_band_hashes("__sig", bands, rows_per_band))
            ).alias("__bucket"),
        )
        if from_coll is None:
            right_df, rtext, rid = df, text, id_field
        else:
            right_df = c.collection(from_coll)
            rtext = compile_expr(fin, ExprContext(schema=right_df.schema))
            rid = fid
        right = (
            right_df.withColumn("__mh_bases", minhash_bases(rtext, n))
            .withColumn("__sig", minhash_sig_sql("__mh_bases", num))
        )
        rb = right.select(
            F.col(rid).alias("right_id"),
            F.explode(
                F.array(*minhash_band_hashes("__sig", bands, rows_per_band))
            ).alias("__bucket"),
        )
        pairs = lb.join(rb, "__bucket").select("left_id", "right_id")
        if from_coll is None:
            pairs = pairs.filter(F.col("left_id") < F.col("right_id"))
        pairs = pairs.distinct()
        lsh = df.select(
            F.col(id_field).alias("left_id"),
            word_shingles(text, n).alias("__sha"),
        )
        rsh = right_df.select(
            F.col(rid).alias("right_id"),
            word_shingles(rtext, n).alias("__shb"),
        )
        inter = F.size(F.array_intersect("__sha", "__shb"))
        union = F.size("__sha") + F.size("__shb") - inter
        jacc = inter / union
        return (
            pairs.join(lsh, "left_id")
            .join(rsh, "right_id")
            .filter(union > 0)
            .withColumn(
                "jaccard",
                F.floor(jacc * 1e9 + F.lit(0.5)).cast("double") / F.lit(1e9),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("left_id", "right_id", "jaccard")
        )

    return fn


@register_stage("$editDistanceJoin")
def edit_distance_join_stage(expression: Any, ctx: Context) -> StageFn:
    """Edit-distance similarity join: ``{from?, input, id, foreignInput?,
    foreignId?, maxDistance, gram}`` → ``(left_id, right_id, distance)``
    rows for every pair whose Levenshtein distance is <= ``maxDistance``.

    Complements $jaccardJoin for short strings (titles, names, OCR/typo
    noise) where set similarity is too coarse.  Candidate generation is
    EXACT (no recall loss, unlike the MinHash/SimHash banding families):

    * Long strings (``len >= gram*(maxDistance+1)``) use q-gram prefix
      filtering (ED-Join, Xiao et al., VLDB 2008): <= ``maxDistance``
      edits destroy at most ``gram*maxDistance`` of a string's positional
      q-grams, so two strings within distance k must share a gram among
      their ``gram*k + 1`` globally-rarest grams.  One corpus-wide gram
      document-frequency aggregate defines the rarity order; per-string
      prefix selection is a ``row_number <= q*k+1`` (WindowGroupLimit);
      candidates come from an equi-join of the tiny prefix sets — rare
      grams first means hot grams (stop-word shingles) almost never key
      the join, which is what keeps bucket sizes bounded at corpus scale.
    * Short strings (too few grams for the pigeonhole bound) fall back to
      a length-band equi-join: the short side fans out to its 2k+1
      admissible lengths; both sides of the band are restricted to
      ``len < gram*(maxDistance+1) + maxDistance``, so the band pool only
      degenerates when the whole corpus is that short (pick a smaller
      ``gram``).

    Verification is Spark's banded `levenshtein(a, b, k)` (O(k·n) per
    pair, returns -1 above the threshold) behind a length-difference
    prefilter.  Without ``from`` it is a self-join emitting each
    unordered pair once (left_id < right_id).  Null strings never match.
    """
    from_coll = expression.get("from")
    inp = expression["input"]
    id_field = expression.get("id", "_id")
    fin = expression.get("foreignInput", inp)
    fid = expression.get("foreignId", id_field)
    k = int(expression.get("maxDistance", 1))
    q = int(expression.get("gram", 2))
    if k < 0:
        raise ValueError("$editDistanceJoin maxDistance must be >= 0")
    if q < 1:
        raise ValueError("$editDistanceJoin gram must be >= 1")
    prefix_len = q * k + 1
    min_long = q * (k + 1)

    def positional_grams(s: Column) -> Column:
        # array<struct<pos, g>>: the q-length windows of s (1-based pos);
        # only called where length(s) >= min_long >= q, so the sequence
        # bound is always >= 1
        return F.transform(
            F.sequence(F.lit(1), F.length(s) - q + 1),
            lambda i: F.struct(i.alias("pos"), s.substr(i, F.lit(q)).alias("g")),
        )

    def fn(df: DataFrame, c: Context) -> DataFrame:
        df = _spread(df)
        ltext = compile_expr(inp, ExprContext(schema=df.schema)).cast("string")
        left = df.select(F.col(id_field).alias("left_id"), ltext.alias("__sa"))
        if from_coll is None:
            right = left.select(
                F.col("left_id").alias("right_id"), F.col("__sa").alias("__sb")
            )
        else:
            right_df = c.collection(from_coll)
            rtext = compile_expr(
                fin, ExprContext(schema=right_df.schema)
            ).cast("string")
            right = right_df.select(
                F.col(fid).alias("right_id"), rtext.alias("__sb")
            )

        def grams(side: DataFrame, idc: str, sc: str) -> DataFrame:
            return (
                side.filter(F.length(sc) >= min_long)
                .select(idc, F.explode(positional_grams(F.col(sc))).alias("__pg"))
                .select(
                    idc,
                    F.col("__pg.g").alias("__g"),
                    F.col("__pg.pos").alias("__pos"),
                )
            )

        lg = grams(left, "left_id", "__sa")
        if from_coll is None:
            rg = lg.select(
                F.col("left_id").alias("right_id"), "__g", "__pos"
            )
            all_grams = lg.select("__g")
        else:
            rg = grams(right, "right_id", "__sb")
            all_grams = lg.select("__g").unionByName(rg.select("__g"))
        # one global gram-frequency pass defines the rarity order; the
        # result is vocabulary-sized (AQE broadcasts it when small)
        freq = all_grams.groupBy("__g").agg(F.count("*").alias("__df"))

        def prefix(g: DataFrame, idc: str) -> DataFrame:
            from pyspark.sql import Window

            w = Window.partitionBy(idc).orderBy("__df", "__g", "__pos")
            return (
                g.join(freq, "__g")
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= prefix_len)
                .select(idc, "__g")
            )

        cand_long = prefix(lg, "left_id").join(
            prefix(rg, "right_id"), "__g"
        ).select("left_id", "right_id")
        # short-string fallback: both pool members are < min_long + k
        # chars, and any pair with a sub-min_long member has both members
        # in the pool; the left fans out to its 2k+1 admissible lengths
        short_cut = min_long + k
        ls = left.filter(F.length("__sa") < short_cut).select(
            "left_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(-k), F.lit(k)),
                    lambda d: F.length("__sa") + d,
                )
            ).alias("__lb"),
        )
        rs = right.filter(F.length("__sb") < short_cut).select(
            "right_id", F.length("__sb").alias("__lb")
        )
        cand_short = ls.join(rs, "__lb").select("left_id", "right_id")
        pairs = cand_long.unionByName(cand_short)
        if from_coll is None:
            pairs = pairs.filter(F.col("left_id") < F.col("right_id"))
        pairs = pairs.distinct()
        dist = (
            F.levenshtein("__sa", "__sb", k) if k > 0
            else F.when(F.col("__sa") == F.col("__sb"), 0).otherwise(-1)
        )
        return (
            pairs.join(left, "left_id")
            .join(right, "right_id")
            .filter(F.abs(F.length("__sa") - F.length("__sb")) <= k)
            .withColumn("distance", dist.cast("long"))
            .filter(F.col("distance") >= 0)
            .select("left_id", "right_id", "distance")
        )

    return fn


@register_stage("$simhash")
def simhash_stage(expression: Any, ctx: Context) -> StageFn:
    """64-bit SimHash over word shingles: ``{input, as, shingle, bits}``.
    bit_j = sign of sum over shingles of (hash bit j ? +1 : -1); near-dups
    differ in few bits (Hamming).  Row-local, no UDF."""
    inp = expression["input"]
    as_field = expression.get("as", "simhash")
    n = int(expression.get("shingle", 2))
    bits = int(expression.get("bits", 16))
    if not 1 <= bits <= 60:
        raise ValueError("$simhash bits must be in [1, 60] (the shingle "
                         "hashes carry 60 bits)")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        return _with_simhash(_spread(df), inp, n, bits, as_field)

    return fn


def _with_simhash(df: DataFrame, inp: Any, n: int, bits: int,
                  out_col: str) -> DataFrame:
    """Append the SimHash column (shared by $simhash and $simhashDedup).

    Two steps, both ONE SQL string (the equivalent nested-lambda Column
    construction costs ~0.6 s of py4j roundtrips per plan at bits=16):
    materialize one md5 hash per shingle, then per bit j the vote sum is
    2·(count of set bits) − n — a compact nested-HOF expression (one tree
    node per construct, not per bit: the bits-way unrolled vote-vector
    fold cost ~1 s of parse/analysis per plan and allocated a 16-wide
    array per shingle at runtime)."""
    text = compile_expr(inp, ExprContext(schema=df.schema))
    sh = word_shingles(text, n)
    hashes = F.expr(
        "transform(`__sh`, s -> "
        "cast(conv(substr(md5(concat('0:', s)), 1, 15), 16, 10) as bigint))"
    )
    value = F.expr(
        f"aggregate(transform(sequence(0, {bits - 1}), j -> "
        f"if(2L * aggregate(`__sh_h`, 0L, "
        f"(acc, h) -> acc + (shiftright(h, j) & 1)) "
        f"> size(`__sh_h`), shiftleft(1L, j), 0L)), "
        f"0L, (acc, x) -> acc + x)"
    )
    return (
        df.withColumn("__sh", sh)
        .withColumn("__sh_h", hashes)
        .withColumn(out_col, value)
        .drop("__sh", "__sh_h")
    )


@register_stage("$simhashDedup")
def simhash_dedup_stage(expression: Any, ctx: Context) -> StageFn:
    """Hamming-ball near-dup removal over SimHash signatures:
    ``{input, id, shingle, bits, maxHamming, transitive?}``.

    The pigeonhole band trick: split the ``bits``-bit signature into
    ``maxHamming + 1`` contiguous bands — two signatures within Hamming
    distance ``maxHamming`` must agree EXACTLY on at least one band — so
    candidate pairs come from an equi-join on (band index, band value),
    and one ``bit_count(xor)`` per candidate verifies the true distance.
    Exact over the (member, bucket-keeper) pairing, bucket-bounded,
    never all-pairs; the same scale profile as $minhashDedup with a far
    cheaper verify (one popcount vs a shingle-set intersection).
    ``transitive: true`` resolves verified pairs with connected
    components, like $minhashDedup."""
    inp = expression["input"]
    id_field = expression.get("id", "_id")
    n = int(expression.get("shingle", 2))
    bits = int(expression.get("bits", 16))
    max_h = int(expression.get("maxHamming", 3))
    transitive = bool(expression.get("transitive", False))
    if not 1 <= bits <= 60:
        raise ValueError("$simhashDedup bits must be in [1, 60] (the "
                         "shingle hashes carry 60 bits)")
    nb = max_h + 1
    if nb > bits:
        raise ValueError("$simhashDedup needs bits >= maxHamming + 1")
    base_w, extra = divmod(bits, nb)
    bands = []  # (start, width)
    start = 0
    for i in range(nb):
        w = base_w + (1 if i < extra else 0)
        bands.append((start, w))
        start += w

    def fn(df: DataFrame, c: Context) -> DataFrame:
        hashed = _with_simhash(_spread(df), inp, n, bits, "__simh")
        band_vals = [
            F.concat(
                F.lit(f"{i}:"),
                (F.shiftright(F.col("__simh"), s)
                 .bitwiseAND(F.lit((1 << w) - 1))).cast("string"),
            )
            for i, (s, w) in enumerate(bands)
        ]
        buckets = hashed.select(
            F.col(id_field).alias("__did"), F.col("__simh").alias("__dh"),
            F.explode(F.array(*band_vals)).alias("__bucket"),
        )
        keepers = buckets.groupBy("__bucket").agg(
            F.min("__did").alias("__keep")
        )
        cands = (
            buckets.join(keepers, "__bucket")
            .filter(F.col("__did") != F.col("__keep"))
            .select("__did", "__dh", "__keep")
            .distinct()
        )
        kh = hashed.select(
            F.col(id_field).alias("__keep"), F.col("__simh").alias("__kh")
        )
        verified = cands.join(kh, "__keep").filter(
            F.bit_count(F.col("__dh").bitwiseXOR(F.col("__kh"))) <= max_h
        )
        if transitive:
            from ..operators.graphcc import connected_components

            labels = connected_components(
                verified.select(F.col("__did").alias("a"),
                                F.col("__keep").alias("b"))
            )
            dups = labels.select(F.col("__cc_node").alias("__did"))
        else:
            dups = verified.select("__did").distinct()
        return hashed.join(
            dups, hashed[id_field] == dups["__did"], "left_anti"
        ).drop("__simh")

    return fn


@register_stage("$ngramJaccardDedup")
def ngram_jaccard_dedup_stage(expression: Any, ctx: Context) -> StageFn:
    """Exact n-gram Jaccard near-dup removal: ``{input, id, n, threshold}``.

    Pairs are generated only for docs sharing at least one shingle
    (inverted-index join on exploded shingles), then exact Jaccard =
    |inter| / |union| filters candidates; the larger-``id`` doc of each
    qualifying pair is removed.

    Scale guard: one stop-word-like shingle shared by m documents makes a
    quadratic m² bucket.  Shingles whose document frequency exceeds
    ``maxShingleDf`` (default 1000) are dropped from CANDIDATE GENERATION
    only; the Jaccard of each surviving candidate pair is still computed
    exactly over the full shingle sets (array_intersect), so results are
    unchanged unless a near-dup pair shares *only* hot shingles — the
    standard inverted-index-dedup recall trade, documented in SCALE.md.
    """
    inp = expression["input"]
    id_field = expression.get("id", "_id")
    n = int(expression.get("n", 3))
    threshold = float(expression.get("threshold", 0.8))
    max_df = int(expression.get("maxShingleDf", 1000))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        df = _spread(df)
        text = compile_expr(inp, ExprContext(schema=df.schema))
        with_sh = df.withColumn("__sh", word_shingles(text, n))
        docs = with_sh.select(F.col(id_field).alias("__did"), "__sh")
        inv = docs.select("__did", F.explode("__sh").alias("__g"))
        # document-frequency cap: the DF aggregate shuffles inv by __g —
        # the same partitioning the candidate self-join needs, so the cap
        # costs no extra shuffle of the big side (no broadcast of the hot
        # list either: it can be large in open-world corpora)
        cold = (
            inv.groupBy("__g").agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("__g")
        )
        inv_c = inv.join(cold, "__g")
        cands = (
            inv_c.alias("a")
            .join(inv_c.alias("b"), (F.col("a.__g") == F.col("b.__g"))
                  & (F.col("a.__did") < F.col("b.__did")))
            .select(F.col("a.__did").alias("__ida"),
                    F.col("b.__did").alias("__idb"))
            .distinct()
        )
        sa = docs.select(F.col("__did").alias("__ida"), F.col("__sh").alias("__sha"))
        sb = docs.select(F.col("__did").alias("__idb"), F.col("__sh").alias("__shb"))
        scored = (
            cands.join(sa, "__ida").join(sb, "__idb")
            .withColumn("__inter",
                        F.size(F.array_intersect("__sha", "__shb")))
            .withColumn(
                "__j",
                F.col("__inter")
                / (F.size("__sha") + F.size("__shb") - F.col("__inter")),
            )
        )
        dups = scored.filter(F.col("__j") >= threshold).select(
            F.col("__idb").alias("__did")
        ).distinct()
        return with_sh.join(dups, with_sh[id_field] == dups["__did"], "left_anti").drop("__sh")

    return fn


# ------------------------------------------------------ embedding ops / ANN


def vec_dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, v: acc + v)


def vec_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                              lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return F.try_divide(vec_dot(a, b), vec_norm(a) * vec_norm(b))


def cosine_hoisted(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with the O(n·m) norm recomputation hoisted out of a join:
    each side carries a precomputed norm column, so the per-pair work is
    one dot product instead of three array folds."""
    return F.try_divide(vec_dot(a, b), na * nb)


@register_stage("$embedDedup")
def embed_dedup_stage(expression: Any, ctx: Context) -> StageFn:
    """Embedding-cosine near-dup removal: ``{input, id, threshold, bits}``.

    LSH bucketing by random-hyperplane sign bits (seeded md5 hyperplanes)
    limits candidate pairs to same-bucket docs; exact cosine then decides.
    The larger id of each near-dup pair is dropped.

    ``transitive: true`` resolves chained near-dups (a≈b≈c with a̸≈c)
    with connected components — exactly the min-id doc of each cluster
    survives; ``as: "<field>"`` (requires transitive) switches to
    ANNOTATE mode, labeling every row with its cluster id instead of
    dropping (compose with ``$groupCap`` for best-per-cluster keep) —
    the same contract as ``$minhashDedup``.

    Scale guard: with ``bits`` omitted the plan is an exact all-pairs
    self-join — O(n²) and unrunnable on a large corpus.  That plan is
    REFUSED when the input's optimizer size estimate exceeds
    ``ALL_PAIRS_SIZE_LIMIT`` unless ``{exact: true}`` is passed; set
    ``{bits: k}`` for the LSH path instead.
    """
    inp = expression["input"]
    id_field = expression.get("id", "vec_id")
    threshold = float(expression.get("threshold", 0.99))
    bits = expression.get("bits")
    dim = int(expression.get("dim", 16))
    force_exact = bool(expression.get("exact", False))
    transitive = bool(expression.get("transitive", False))
    as_field = expression.get("as")
    if as_field and not transitive:
        raise ValueError(
            "$embedDedup as (annotate mode) requires transitive: true — "
            "cluster labels are connected-component ids (same contract "
            "as $minhashDedup)")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        if bits is None and not force_exact:
            try:
                est = int(
                    df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
                )
            except Exception:
                est = 0
            if est >= (1 << 63) - 1:
                est = 0  # Long.MaxValue sentinel: no estimate (in-memory
                # relations, CBO off) — don't refuse what we can't size
            if est > ALL_PAIRS_SIZE_LIMIT:
                raise ValueError(
                    "$embedDedup: exact all-pairs self-join refused for a "
                    f"corpus estimated at {est} bytes "
                    f"(> {ALL_PAIRS_SIZE_LIMIT}); pass {{bits: k}} for the "
                    "LSH path or {exact: true} to force the O(n²) plan"
                )
        emb = compile_expr(inp, ExprContext(schema=df.schema)).cast("array<double>")
        docs = df.select(F.col(id_field).alias("__did"),
                         _unit_vector(emb).alias("__e"))
        # candidate generation: exact pairwise by default; {bits: k} is the
        # 100 TB path — same-bucket LSH candidates only (see $annLsh),
        # recall traded per LSH guarantees
        if bits is not None:
            docs = docs.withColumn("__bkt", lsh_bucket(F.col("__e"), int(bits), dim))
            cond = (F.col("a.__did") < F.col("b.__did")) & (
                F.col("a.__bkt") == F.col("b.__bkt")
            )
        else:
            cond = F.col("a.__did") < F.col("b.__did")
        pairs = (
            docs.alias("a")
            .join(docs.alias("b"), cond)
            .select(F.col("a.__did").alias("__ida"),
                    F.col("b.__did").alias("__idb"),
                    _pair_dot(F.col("a.__e"), F.col("b.__e")).alias("__cos"))
            .filter(F.col("__cos") >= threshold)
        )
        if transitive:
            labels = _cc_labels(pairs)
            if as_field:
                return _annotate_components(df, labels, id_field, as_field)
            dups = _component_dups(labels)
        else:
            dups = pairs.select(F.col("__idb").alias("__did")).distinct()
        return df.join(dups, df[id_field] == dups["__did"], "left_anti")

    return fn


@register_stage("$vectorNormalize")
def vector_normalize_stage(expression: Any, ctx: Context) -> StageFn:
    """Unit-normalize an embedding column: ``{input, as}``.  Zero vectors
    pass through unchanged (same convention as $embedDedup).  Map-only.
    Normalizing at rest turns every downstream cosine into a plain dot
    product — one array fold per pair instead of three."""
    inp = expression["input"]
    as_field = expression.get("as", "embedding")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        emb = compile_expr(inp, ExprContext(schema=df.schema)).cast("array<double>")
        norm = F.sqrt(F.aggregate(emb, F.lit(0.0), lambda a, x: a + x * x))
        unit = F.when(norm > 0, F.transform(emb, lambda x: x / norm)).otherwise(emb)
        return df.withColumn(as_field, unit)

    return fn


@register_stage("$vectorQuantize")
def vector_quantize_stage(expression: Any, ctx: Context) -> StageFn:
    """Symmetric per-vector int quantization for embedding storage:
    ``{input, as, bits=8}`` -> struct ``{scale: double, q: array<int>}``
    with ``x ~ q * scale``, ``|q| <= 2^(bits-1)-1``.

    The 100 TB storage lever: float64 embeddings shrink 8x at int8 with
    ~1e-2 relative error — the standard trade for retrieval corpora.
    Rounding is floor(x+0.5) (engine-portable HALF_UP) so results are
    bit-reproducible against the DuckDB oracle.  Map-only."""
    inp = expression["input"]
    as_field = expression.get("as", "qvec")
    bits = int(expression.get("bits", 8))
    qmax = (1 << (bits - 1)) - 1

    def fn(df: DataFrame, c: Context) -> DataFrame:
        emb = compile_expr(inp, ExprContext(schema=df.schema)).cast("array<double>")
        amax = F.aggregate(
            emb, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
        )
        scale = amax / F.lit(float(qmax))
        q = F.when(
            scale > 0,
            F.transform(emb, lambda x: F.floor(x / scale + 0.5).cast("int")),
        ).otherwise(F.transform(emb, lambda x: F.lit(0)))
        return df.withColumn(
            as_field, F.struct(scale.alias("scale"), q.alias("q"))
        )

    return fn


@register_stage("$vectorDequantize")
def vector_dequantize_stage(expression: Any, ctx: Context) -> StageFn:
    """Inverse of $vectorQuantize: ``{input, as}`` — the ``{scale, q}``
    struct back to ``array<double>``.  Map-only."""
    inp = expression["input"]
    as_field = expression.get("as", "embedding")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        qv = compile_expr(inp, ExprContext(schema=df.schema))
        out = F.transform(qv["q"], lambda x: x.cast("double") * qv["scale"])
        return df.withColumn(as_field, out)

    return fn


@register_stage("$annTopK")
def ann_topk_stage(expression: Any, ctx: Context) -> StageFn:
    """Brute-force cosine top-k: ``{queries: <collection>, input, id, k, as}``.

    The query set is broadcast; the corpus is scanned once with a row-local
    cosine and a per-query top-k (window) — the baseline every ANN variant
    is measured against.  100 TB path: $annLsh prunes the scan to matching
    hyperplane buckets first.
    """
    queries_coll = expression["queries"]
    inp = expression["input"]
    id_field = expression.get("id", "vec_id")
    k = int(expression.get("k", 10))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from pyspark.sql import Window

        q = c.collection(queries_coll)
        emb = compile_expr(inp, ExprContext(schema=df.schema))
        # norms + dot as generated SQL (one py4j call each) — the Python
        # HOF-lambda form costs a py4j round-trip per lambda, which is
        # pure driver latency on every plan build (the bm25 lesson).
        # aggregate(a, 0, (acc,x) -> acc + x*x) folds in the same order as
        # aggregate(transform(a, x -> x*x), ...) — bit-identical sums.
        norm = "sqrt(aggregate({0}, 0.0D, (acc, x) -> acc + x * x))"
        corpus = df.select(
            F.col(id_field).alias("corpus_id"), emb.cast("array<double>").alias("__ce")
        ).selectExpr("corpus_id", "__ce", norm.format("__ce") + " as __cn")
        queries = q.selectExpr(
            "query_id", "cast(embedding as array<double>) as __qe"
        ).selectExpr("query_id", "__qe", norm.format("__qe") + " as __qn")
        dot = ("aggregate(zip_with(__ce, __qe, (x, y) -> x * y), 0.0D, "
               "(acc, v) -> acc + v)")
        scored = corpus.crossJoin(F.broadcast(queries)).selectExpr(
            "query_id", "corpus_id",
            f"try_divide({dot}, __cn * __qn) as score",
        )
        w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("corpus_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    return fn


def _plane_component(j: int, d: int) -> float:
    """Hyperplane component h[j][d] in [-1,1): the same md5 derivation as
    md5_long, computed driver-side in Python — 512 Spark md5-of-literal
    expressions cost seconds of constant folding per plan, a float literal
    costs nothing."""
    import hashlib

    h = int(hashlib.md5(f"{j}:p{j}d{d}".encode()).hexdigest()[:15], 16)
    return (h % 2000 - 1000) / 1000.0


def lsh_bucket(emb: Column, bits: int, dim: int) -> Column:
    """Sign-bit bucket for a seeded set of md5-derived hyperplanes —
    deterministic, pure column algebra."""
    planes = [
        F.array(*[F.lit(_plane_component(j, d)) for d in range(dim)])
        for j in range(bits)
    ]
    bit_cols = []
    for plane in planes:
        dot = F.aggregate(F.zip_with(emb, plane, lambda x, y: x * y), F.lit(0.0),
                          lambda acc, v: acc + v)
        bit_cols.append(F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0)))
    value = bit_cols[0]
    for j in range(1, bits):
        value = value + F.shiftleft(bit_cols[j], j)
    return value


@register_stage("$annLsh")
def ann_lsh_stage(expression: Any, ctx: Context) -> StageFn:
    """LSH-bucketed ANN: adds a sign-bit bucket column for a seeded set of
    md5-derived hyperplanes: ``{input, as, bits, dim}``.  Candidate search
    joins on equal buckets (optionally multi-probe), pruning the corpus
    scan; exactness is traded per standard LSH guarantees."""
    inp = expression["input"]
    as_field = expression.get("as", "bucket")
    bits = int(expression.get("bits", 8))
    dim = int(expression.get("dim", 16))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        emb = compile_expr(inp, ExprContext(schema=df.schema)).cast("array<double>")
        return df.withColumn(as_field, lsh_bucket(emb, bits, dim))

    return fn


@register_stage("$annLshSearch")
def ann_lsh_search_stage(expression: Any, ctx: Context) -> StageFn:
    """The 100 TB ANN path: ``{queries, input, id, k, bits, dim, probes}``.

    Corpus rows are bucketed once (column algebra, no shuffle); the
    broadcast query side explodes to ``probes`` buckets (its own bucket +
    1-bit flips, standard multi-probe LSH), the equi-join on bucket prunes
    the corpus to candidates (~probes/2^bits of the scan), and cosine +
    per-query top-k runs on the survivors only.  Same output schema as
    $annTopK (query_id, corpus_id, score, rank); recall traded per LSH
    guarantees — pytest pins recall vs the brute-force baseline.
    """
    queries_coll = expression["queries"]
    inp = expression["input"]
    id_field = expression.get("id", "vec_id")
    k = int(expression.get("k", 10))
    bits = int(expression.get("bits", 8))
    dim = int(expression.get("dim", 16))
    probes = int(expression.get("probes", 1 + 8))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from pyspark.sql import Window

        emb = compile_expr(inp, ExprContext(schema=df.schema)).cast("array<double>")
        corpus = df.select(
            F.col(id_field).alias("corpus_id"),
            emb.alias("__ce"),
        ).withColumn("__bucket", lsh_bucket(F.col("__ce"), bits, dim)).withColumn(
            "__cn", vec_norm(F.col("__ce"))
        )
        q = c.collection(queries_coll)
        qe = F.col("embedding").cast("array<double>")
        queries = q.select(F.col("query_id"), qe.alias("__qe")).withColumn(
            "__qbucket", lsh_bucket(F.col("__qe"), bits, dim)
        ).withColumn("__qn", vec_norm(F.col("__qe")))
        # multi-probe: own bucket + single-bit flips, capped at `probes`
        probe_buckets = F.slice(
            F.concat(
                F.array(F.col("__qbucket")),
                F.array(*[
                    F.col("__qbucket").bitwiseXOR(F.lit(1 << b))
                    for b in range(bits)
                ]),
            ),
            1,
            probes,
        )
        probed = queries.select(
            "query_id", "__qe", "__qn", F.explode(probe_buckets).alias("__bucket")
        )
        candidates = corpus.join(F.broadcast(probed), "__bucket")
        scored = candidates.select(
            "query_id", "corpus_id",
            cosine_hoisted(F.col("__ce"), F.col("__qe"),
                           F.col("__cn"), F.col("__qn")).alias("score"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("corpus_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    return fn


@register_stage("$annIvfSearch")
def ann_ivf_search_stage(expression: Any, ctx: Context) -> StageFn:
    """IVF-flat ANN: ``{queries, input, id, k, nlist, nprobe}``.

    The data-dependent complement to $annLshSearch's data-independent
    hyperplanes.  Coarse quantizer = ``nlist`` corpus vectors sampled
    deterministically (smallest ``md5('ivf:' || id)`` — a random sample
    under a fixed seed, and md5 is bit-identical in DuckDB so even the
    *approximate* configuration has a full SQL oracle, not just the
    nprobe == nlist exact mode); centroids are tiny metadata, collected once and inlined
    as plan literals, so **cell assignment is pure column algebra with
    zero shuffle** — each corpus row scores against the literal centroid
    array and takes the argmax.  Queries probe their ``nprobe`` nearest
    cells; the equi-join on cell prunes the scan to ~nprobe/nlist of the
    corpus; exact cosine + per-query top-k runs on survivors.  With
    nprobe == nlist this degrades to exact brute force (tested).  A
    production deployment would Lloyd-refine the sample and persist the
    centroid set with the table; the search plan is unchanged.
    """
    queries_coll = expression["queries"]
    inp = expression["input"]
    id_field = expression.get("id", "vec_id")
    k = int(expression.get("k", 10))
    nlist = int(expression.get("nlist", 16))
    nprobe = int(expression.get("nprobe", 4))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from pyspark.sql import Window

        emb = compile_expr(inp, ExprContext(schema=df.schema)).cast("array<double>")
        corpus = df.select(
            F.col(id_field).alias("corpus_id"), emb.alias("__ce")
        ).withColumn("__cn", vec_norm(F.col("__ce")))
        # coarse quantizer: nlist sampled vectors, unit-normalized driver
        # side (nlist × dim floats — dimension-table-sized metadata)
        sample = (
            corpus.select("corpus_id", "__ce")
            .orderBy(
                F.md5(F.concat(F.lit("ivf:"), F.col("corpus_id").cast("string"))),
                "corpus_id",
            )
            .limit(nlist)
            .collect()
        )
        import math

        def unit(v: list) -> list:
            n = math.sqrt(sum(x * x for x in v))
            return [x / n for x in v] if n > 0 else list(v)

        if not sample:
            # empty corpus: no centroids to inline — return the (empty)
            # result with the standard output schema; corpus_id must take
            # the CORPUS id column's type (the queries table's id type may
            # differ, which would break downstream unions)
            q0 = c.collection(queries_coll)
            cid_type = corpus.schema["corpus_id"].dataType
            return (
                q0.select(F.col("query_id"))
                .withColumn("corpus_id", F.lit(None).cast(cid_type))
                .withColumn("score", F.lit(0.0))
                .withColumn("rank", F.lit(1))
                .limit(0)
            )
        cents = F.array(*[
            F.array(*[F.lit(float(x)) for x in unit(r["__ce"])]) for r in sample
        ])

        def cell_scores(vec: Column) -> Column:
            return F.transform(cents, lambda cv: vec_dot(cv, vec))

        def best_cell(vec: Column) -> Column:
            s = cell_scores(vec)
            return (F.array_position(s, F.array_max(s)) - 1).cast("int")

        corpus = corpus.withColumn("__cell", best_cell(F.col("__ce")))
        q = c.collection(queries_coll)
        qe = F.col("embedding").cast("array<double>")
        queries = (
            q.select(F.col("query_id"), qe.alias("__qe"))
            .withColumn("__qn", vec_norm(F.col("__qe")))
        )
        # top-nprobe cells per query: sort (−score, cell) structs, slice
        idx = F.sequence(F.lit(0), F.lit(nlist - 1))
        ranked = F.array_sort(F.zip_with(
            cell_scores(F.col("__qe")), idx,
            lambda s, i: F.struct((-s).alias("d"), i.cast("int").alias("cid")),
        ))
        probe_cells = F.transform(F.slice(ranked, 1, nprobe), lambda x: x["cid"])
        probed = queries.select(
            "query_id", "__qe", "__qn", F.explode(probe_cells).alias("__cell")
        )
        candidates = corpus.join(F.broadcast(probed), "__cell")
        scored = candidates.select(
            "query_id", "corpus_id",
            cosine_hoisted(F.col("__ce"), F.col("__qe"),
                           F.col("__cn"), F.col("__qn")).alias("score"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("corpus_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    return fn


def _round9(x: float) -> float:
    """Half-up 9-digit rounding (same fold as the oracle's
    floor(x*1e9+0.5)/1e9): quantizes away float-summation-order ULP noise
    so centroids are bit-identical run-to-run and engine-to-engine."""
    import math

    return math.floor(x * 1e9 + 0.5) / 1e9


def _round9_col(col: Column) -> Column:
    """Column twin of :func:`_round9` — the identical fold on both sides
    keeps engine-vs-oracle float comparisons exact."""
    return F.floor(col * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)


def _km_dist2(vec: Column, centroid: list) -> Column:
    """Squared Euclidean distance of an array column to a literal
    centroid — pure codegen fold, zero shuffle."""
    ca = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, ca, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _km_assign(vec: Column, cents: list[list]) -> Column:
    """Argmin-Euclidean cell assignment against k×dim centroid literals
    (first index wins ties) — row-local column algebra."""
    ds = F.array(*[_km_dist2(vec, ct) for ct in cents])
    return (F.array_position(ds, F.array_min(ds)) - 1).cast("int")


def _lloyd_centroids(
    pts: DataFrame, id_field: str, k: int, iterations: int
) -> list[list[float]]:
    """Deterministic Lloyd iteration shared by ``$kmeans`` and
    ``$semanticDedup`` — ``pts`` must carry the embedding in ``__km_e``.
    Init = the k rows with the smallest ``md5('kmeans:' || id)``; each
    round assigns by argmin Euclidean then updates via posexplode →
    ``groupBy(cell, dim).sum`` (partial aggregation bounds the shuffle at
    tasks×k×dim rows) and a k×dim driver collect (metadata-sized).  Means
    round half-up to 9 digits so parallel-summation ULP noise cannot make
    runs or engines disagree; an empty cell keeps its previous centroid.
    Returns [] on an empty input."""
    sample = (
        pts.select(F.col(id_field).alias("__kid"), "__km_e")
        .orderBy(
            F.md5(F.concat(F.lit("kmeans:"), F.col("__kid").cast("string"))),
            "__kid",
        )
        .limit(k)
        .collect()
    )
    if not sample:
        return []
    cents = [list(r["__km_e"]) for r in sample]
    for _ in range(iterations):
        assigned = pts.withColumn("__cell", _km_assign(F.col("__km_e"), cents))
        stats = (
            assigned.select(
                "__cell", F.posexplode("__km_e").alias("__d", "__v")
            )
            .groupBy("__cell", "__d")
            .agg(F.sum("__v").alias("__s"), F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        sums: dict[int, dict[int, tuple[float, int]]] = {}
        for r in stats:
            sums.setdefault(r["__cell"], {})[r["__d"]] = (r["__s"], r["__n"])
        new_cents = []
        for ci, old in enumerate(cents):
            comp = sums.get(ci)
            if not comp:
                new_cents.append(old)  # empty cell keeps its centroid
                continue
            new_cents.append([
                _round9(comp[d][0] / comp[d][1]) for d in range(len(old))
            ])
        cents = new_cents
    return cents


@register_stage("$kmeans")
def kmeans_stage(expression: Any, ctx: Context) -> StageFn:
    """Lloyd k-means over an embedding column: ``{input, id, k,
    iterations, as, distanceAs?}`` — labels every row with its final
    cluster (0..k-1).

    This is the production "Lloyd-refine the IVF sample" step
    ($annIvfSearch docstring) as a first-class operator, and it is fully
    deterministic so the *whole iteration* is DuckDB-oracle-able:

    - init = the ``k`` rows with the smallest ``md5('kmeans:' || id)``
      (the same seeded-sample trick as the IVF quantizer);
    - each Lloyd round: cell assignment is pure column algebra against
      the k×dim centroid literals (zero shuffle — argmin Euclidean);
      the update is ``posexplode`` → ``groupBy(cell, dim).sum`` — partial
      aggregation shrinks the shuffle to tasks×k×dim rows regardless of
      input size — then k×dim sums collect to the driver (dimension-table
      metadata, same size class as the IVF centroid inline);
    - new centroids round to 9 digits (half-up), so parallel-summation
      ULP noise cannot make runs or engines disagree;
    - a cell that loses all members keeps its previous centroid;
    - ``iterations`` is a fixed count (no data-dependent convergence
      test), which keeps the computation reproducible and the oracle SQL
      finite.

    Scale: per round, one partial-aggregated shuffle over (cell, dim) and
    one k×dim collect.  k is quantizer-sized (≤ a few thousand); this is
    not a general clustering service for millions of centroids.
    """
    inp = expression["input"]
    id_field = expression.get("id", "_id")
    k = int(expression.get("k", 8))
    iterations = int(expression.get("iterations", 2))
    as_field = expression.get("as", "cluster")
    dist_as = expression.get("distanceAs")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _batch_only

        _batch_only("$kmeans", c)
        emb = compile_expr(inp, ExprContext(schema=df.schema)).cast("array<double>")
        pts = df.withColumn("__km_e", emb)
        cents = _lloyd_centroids(pts, id_field, k, iterations)
        if not cents:
            return df.withColumn(as_field, F.lit(None).cast("int"))
        out = pts.withColumn(as_field, _km_assign(F.col("__km_e"), cents))
        if dist_as:
            ds = F.array(*[_km_dist2(F.col("__km_e"), ct) for ct in cents])
            out = out.withColumn(dist_as, F.sqrt(F.array_min(ds)))
        return out.drop("__km_e")

    return fn


@register_stage("$semanticDedup")
def semantic_dedup_stage(expression: Any, ctx: Context) -> StageFn:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): ``{input, id, k, iterations?, threshold?, keep?,
    transitive?, as?}``.

    Candidate pairs are bounded to SAME-CLUSTER documents — a
    deterministic Lloyd k-means (shared with ``$kmeans``: md5-seeded
    init, fixed ``iterations``, 9-digit-rounded means) partitions the
    corpus into ``k`` cells, and the pair join is a plain equi-join on
    the cell id.  That is the whole scale story of the paper: expected
    O(n²/k) candidate work instead of O(n²), with no broadcast and no
    cartesian product; ``k`` grows with the corpus.  Within a cell,
    pairs with unit-vector cosine ≥ ``threshold`` (default 0.95) are
    semantic duplicates:

    - ``keep: "far"`` (default — the paper's policy): the pair member
      FARTHER from its cluster centroid survives, the closer (more
      redundant) one drops; distance ties drop the larger id.  Distances
      round half-up to 9 digits so engine/run float noise cannot flip a
      comparison.
    - ``keep: "minId"``: the larger id of each pair drops (the
      ``$embedDedup`` rule, cluster-bounded).
    - ``transitive: true`` resolves duplicate chains with connected
      components (min-id doc per component survives); ``as: "<field>"``
      switches to annotate mode, labeling rows with their component id —
      the same contract as ``$minhashDedup`` / ``$embedDedup``.
      ``keep: "far"`` is pairwise and cannot combine with transitive.

    Clustering operates on the raw embedding (as ``$kmeans`` does);
    compose with ``$vectorNormalize`` first for the paper's exact
    normalized-embedding setup.  Skew note: one giant cluster degrades
    toward all-pairs within that cell — size ``k`` so the expected cell
    population keeps cell²·dim work tractable (SCALE.md §3).
    """
    inp = expression["input"]
    id_field = expression.get("id", "vec_id")
    k = int(expression.get("k", 8))
    iterations = int(expression.get("iterations", 1))
    threshold = float(expression.get("threshold", 0.95))
    keep = expression.get("keep")
    transitive = bool(expression.get("transitive", False))
    as_field = expression.get("as")
    if keep not in (None, "far", "minId"):
        raise ValueError("$semanticDedup keep must be 'far' or 'minId'")
    if transitive and keep == "far":
        raise ValueError(
            "$semanticDedup keep: 'far' is pairwise — transitive chains "
            "resolve by component min-id; drop keep or use keep: 'minId'")
    if as_field and not transitive:
        raise ValueError(
            "$semanticDedup as (annotate mode) requires transitive: true")
    if keep is None:
        keep = "minId" if transitive else "far"

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _corpus_only

        _corpus_only("$semanticDedup", c)
        emb = compile_expr(inp, ExprContext(schema=df.schema)).cast("array<double>")
        pts = df.withColumn("__km_e", emb)
        cents = _lloyd_centroids(pts, id_field, k, iterations)
        if not cents:
            return df
        # one pass over the corpus: cell assignment + unit normalization
        # are row-local column algebra; the min over the dist2 array IS
        # the distance to the assigned (argmin) centroid
        ds = F.array(*[_km_dist2(F.col("__km_e"), ct) for ct in cents])
        docs = pts.select(
            F.col(id_field).alias("__did"),
            _unit_vector(F.col("__km_e")).alias("__e"),
            _km_assign(F.col("__km_e"), cents).alias("__cell"),
            _round9_col(F.array_min(ds)).alias("__cd"),
        )
        # the cosine rounds half-up at 9 digits BEFORE the threshold
        # comparison (like the distances): the oracle computes it with a
        # different float operation order, and an unrounded >= would let
        # a 1-ULP disagreement flip a pair at the threshold edge
        pairs = (
            docs.alias("a")
            .join(docs.alias("b"),
                  (F.col("a.__cell") == F.col("b.__cell"))
                  & (F.col("a.__did") < F.col("b.__did")))
            .filter(_round9_col(_pair_dot(F.col("a.__e"), F.col("b.__e")))
                    >= F.lit(threshold))
            .select(F.col("a.__did").alias("__ida"),
                    F.col("b.__did").alias("__idb"),
                    F.col("a.__cd").alias("__cda"),
                    F.col("b.__cd").alias("__cdb"))
        )
        if transitive:
            labels = _cc_labels(pairs)
            if as_field:
                return _annotate_components(df, labels, id_field, as_field)
            dups = _component_dups(labels)
        elif keep == "far":
            # the member CLOSER to its centroid is the redundant one
            dups = pairs.select(
                F.when(F.col("__cda") < F.col("__cdb"), F.col("__ida"))
                .when(F.col("__cdb") < F.col("__cda"), F.col("__idb"))
                .otherwise(F.greatest("__ida", "__idb"))
                .alias("__did")
            ).distinct()
        else:
            dups = pairs.select(F.col("__idb").alias("__did")).distinct()
        return df.join(dups, df[id_field] == dups["__did"], "left_anti")

    return fn


@register_stage("$knnJoin")
def knn_join_stage(expression: Any, ctx: Context) -> StageFn:
    """k-NN JOIN: ``{from?, input, id, foreignInput?, foreignId?, k, bits,
    dim, probes, excludeSelf?}`` — every LEFT document finds its ``k``
    nearest neighbors in a corpus (``from`` collection, or the input
    itself when absent = self-join).

    This is the corpus-to-corpus scale primitive the search stages don't
    cover: $annTopK/$annLshSearch/$annIvfSearch all broadcast a *small*
    query set, but embedding clustering / near-dup graph construction
    needs a left side as large as the corpus.  Physical strategy: both
    sides compute the LSH sign-bucket row-locally (same md5-derived
    hyperplanes as $annLsh — deterministic, oracle-able); the left side
    explodes to its ``probes`` multi-probe buckets (own bucket + 1-bit
    flips); the join is a plain equi-join on bucket — both sides
    hash-partition, **nothing broadcasts, no all-pairs product**; exact
    cosine + per-left top-k runs on the bucket-bounded survivors.

    A right-side vector occupies exactly one bucket and probe buckets are
    distinct, so a (left, right) pair is generated at most once — no
    dedup shuffle is needed before the top-k window.

    Scale notes: the bucket join fans out to 2^bits keys — size ``bits``
    so 2^bits ≫ shuffle partitions or hot buckets serialize (at corpus
    scale use 16-24 bits; AQE skew-split absorbs residual imbalance).
    ``bits: 0`` puts everything in one bucket = exact brute force —
    quadratic, only for tests/oracles and small corpora.
    """
    from_coll = expression.get("from")
    inp = expression["input"]
    id_field = expression.get("id", "_id")
    fin = expression.get("foreignInput", inp)
    fid = expression.get("foreignId", id_field)
    k = int(expression.get("k", 10))
    bits = int(expression.get("bits", 8))
    dim = int(expression.get("dim", 16))
    probes = int(expression.get("probes", 1))
    exclude_self = bool(expression.get("excludeSelf", from_coll is None))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from pyspark.sql import Window

        from ..operators.extended import _batch_only

        _batch_only("$knnJoin", c)
        left_emb = compile_expr(inp, ExprContext(schema=df.schema)).cast(
            "array<double>"
        )
        left = df.select(
            F.col(id_field).alias("left_id"), left_emb.alias("__le")
        ).withColumn("__ln", vec_norm(F.col("__le")))
        right_df = c.collection(from_coll) if from_coll else df
        right_emb = compile_expr(fin, ExprContext(schema=right_df.schema)).cast(
            "array<double>"
        )
        right = right_df.select(
            F.col(fid).alias("right_id"), right_emb.alias("__re")
        ).withColumn("__rn", vec_norm(F.col("__re")))
        if bits > 0:
            right = right.withColumn(
                "__bucket", lsh_bucket(F.col("__re"), bits, dim)
            )
            lb = left.withColumn("__lb", lsh_bucket(F.col("__le"), bits, dim))
            probe_buckets = F.slice(
                F.concat(
                    F.array(F.col("__lb")),
                    F.array(*[
                        F.col("__lb").bitwiseXOR(F.lit(1 << b))
                        for b in range(bits)
                    ]),
                ),
                1,
                min(probes, bits + 1),
            )
            left = lb.withColumn("__bucket", F.explode(probe_buckets)).drop("__lb")
        else:
            right = right.withColumn("__bucket", F.lit(0))
            left = left.withColumn("__bucket", F.lit(0))
        cand = left.join(right, "__bucket")
        if exclude_self:
            cand = cand.filter(~F.col("left_id").eqNullSafe(F.col("right_id")))
        scored = cand.select(
            "left_id", "right_id",
            cosine_hoisted(F.col("__le"), F.col("__re"),
                           F.col("__ln"), F.col("__rn")).alias("score"),
        )
        w = Window.partitionBy("left_id").orderBy(
            F.col("score").desc(), F.col("right_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    return fn


# ------------------------------------------------------------ text analysis

_STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "it", "that", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "que", "por"],
}


def _stopword_hits(words: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


@register_stage("$langId")
def lang_id_stage(expression: Any, ctx: Context) -> StageFn:
    """Stopword-vote language ID: ``{input, as}``.  Argmax over per-language
    stopword hit counts ('und' for ties/zero hits).  Pure column algebra —
    at 100 TB this is a map-only pass."""
    inp = expression["input"]
    as_field = expression.get("as", "lang_pred")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        text = compile_expr(inp, ExprContext(schema=df.schema))
        words = F.split(F.lower(text), "[^a-z]+")
        # materialize the hit counts ONCE in an intermediate projection:
        # HOFs are interpreted (no codegen CSE), and the argmax when-chain
        # references each score ~6x — inlined, that re-runs split+filter
        # ~24x per row.  CollapseProject keeps non-cheap expressions in
        # their own project, so the struct evaluates once.
        hits = F.struct(*[
            _stopword_hits(words, lang).alias(lang) for lang in _STOPWORDS
        ])
        tmp = df.withColumn("__lang_hits", hits)
        scores = {lang: F.col(f"__lang_hits.{lang}") for lang in _STOPWORDS}
        best = F.greatest(*scores.values())
        expr = F.lit("und")
        # deterministic tie-break: language order en,de,fr,es (first wins)
        for lang in reversed(list(_STOPWORDS)):
            expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
        expr = F.when(best <= 0, F.lit("und")).otherwise(expr)
        return tmp.withColumn(as_field, expr).drop("__lang_hits")

    return fn


@register_stage("$qualityScore")
def quality_score_stage(expression: Any, ctx: Context) -> StageFn:
    """Heuristic doc quality in [0,1]: ``{input, as}`` — blend of length
    band, alpha ratio, punctuation ratio and mean word length.  Map-only."""
    inp = expression["input"]
    as_field = expression.get("as", "quality")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        text = compile_expr(inp, ExprContext(schema=df.schema))
        n = F.length(text).cast("double")
        alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
        punct = F.length(F.regexp_replace(text, "[^.,;:!?]", "")).cast("double")
        words = F.split(F.trim(text), "\\s+")
        n_words = F.size(words).cast("double")
        len_score = F.least(n / F.lit(500.0), F.lit(1.0))
        alpha_ratio = F.try_divide(alpha, n)
        punct_penalty = F.lit(1.0) - F.least(F.try_divide(punct * 10.0, n), F.lit(1.0))
        mean_wl = F.try_divide(n, n_words)
        wl_score = F.when((mean_wl >= 3) & (mean_wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
        score = F.round(
            (len_score + F.coalesce(alpha_ratio, F.lit(0.0))
             + F.coalesce(punct_penalty, F.lit(1.0)) + wl_score) / F.lit(4.0), 6)
        return df.withColumn(as_field, score)

    return fn


@register_stage("$repetitionScore")
def repetition_score_stage(expression: Any, ctx: Context) -> StageFn:
    """Gopher-style repetition signals (Rae et al. 2021, table A1), the
    classic pretraining-data repetition filters: ``{input, as?}`` adds a
    struct of six doubles (rounded to 6):

    - ``dup_line_frac`` — 1 − distinct/total over non-empty lines
    - ``dup_line_char_frac`` — characters inside lines occurring more
      than once / total line characters
    - ``top2_char_frac`` / ``top3_char_frac`` / ``top4_char_frac`` —
      occurrences × length of the most frequent word n-gram / length of
      the normalized text (0.0 unless it occurs at least twice; ties
      break to the lexicographically smallest n-gram; capped at 1.0 —
      overlapping occurrences can over-count)
    - ``dup5_char_frac`` — Σ occurrences × length over 5-grams occurring
      more than once / normalized length, capped at 1.0 (an
      overlap-agnostic upper bound of Gopher's covered-character
      fraction — documented approximation)

    Normalization: words = lowercased text with non-[a-z0-9] mapped to
    spaces, split on whitespace; lines split on ``\\n``, empty lines
    dropped.  100 TB shape: pure row-local column program — sort_array +
    one aggregate() fold per metric, no shuffle, no Python."""
    inp = expression["input"]
    as_field = expression.get("as", "repetition")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        text = compile_expr(inp, ExprContext(schema=df.schema))
        out = df.withColumn("__rep_t", text)
        # non-empty lines, sorted so duplicates are neighbors
        out = out.withColumn(
            "__rep_lines",
            F.sort_array(F.filter(F.split(F.col("__rep_t"), "\n"),
                                  lambda x: x != F.lit(""))),
        )
        # normalized word array + joined length (the n-gram denominator)
        out = out.withColumn(
            "__rep_w",
            F.filter(
                F.split(F.regexp_replace(F.lower(F.col("__rep_t")),
                                         "[^a-z0-9]", " "), " "),
                lambda x: x != F.lit(""),
            ),
        ).withColumn(
            "__rep_wlen", F.length(F.concat_ws(" ", F.col("__rep_w")))
        )
        # neighbor-run fold over a sorted array: on the SECOND element of
        # a run both occurrences' characters become "duplicated", each
        # further one adds its own — O(L log L), no pairwise compare
        run_fold = """
            aggregate({arr},
              named_struct('prev', cast(null as string), 'run', 0L,
                           'best', 0L, 'bestlen', 0L,
                           'dup', 0L, 'tot', 0L),
              (acc, x) -> named_struct(
                 'prev', x,
                 'run', IF(x <=> acc.prev, acc.run + 1L, 1L),
                 'best', IF(IF(x <=> acc.prev, acc.run + 1L, 1L) > acc.best,
                            IF(x <=> acc.prev, acc.run + 1L, 1L), acc.best),
                 'bestlen', IF(IF(x <=> acc.prev, acc.run + 1L, 1L) > acc.best,
                               length(x), acc.bestlen),
                 'dup', acc.dup + IF(x <=> acc.prev,
                        IF(acc.run = 1L, 2L, 1L) * length(x), 0L),
                 'tot', acc.tot + length(x)))
        """
        out = out.withColumn(
            "__rep_lagg", F.expr(run_fold.format(arr="__rep_lines")))

        def grams(n: int) -> Column:
            return F.expr(f"""
                IF(size(__rep_w) >= {n},
                   sort_array(transform(
                      sequence(1, size(__rep_w) - {n} + 1),
                      i -> concat_ws(' ', slice(__rep_w, i, {n})))),
                   array())
            """)

        for n in (2, 3, 4, 5):
            out = out.withColumn(f"__rep_g{n}", grams(n)).withColumn(
                f"__rep_a{n}", F.expr(run_fold.format(arr=f"__rep_g{n}")))

        def r6(col: Column) -> Column:
            # coalesce BEFORE least: Spark's least() skips nulls, so a
            # 0/0 try_divide null would otherwise "win" as 1.0
            return F.round(
                F.least(F.coalesce(col, F.lit(0.0)), F.lit(1.0)), 6)

        nlines = F.size("__rep_lines").cast("double")
        la = F.col("__rep_lagg")
        wlen = F.col("__rep_wlen").cast("double")

        def top_frac(n: int) -> Column:
            a = F.col(f"__rep_a{n}")
            return r6(
                F.when(
                    a["best"] >= 2,
                    F.try_divide(
                        (a["best"] * a["bestlen"]).cast("double"), wlen),
                ).otherwise(F.lit(0.0))
            )

        rep = F.struct(
            r6(F.when(nlines > 0,
                      F.lit(1.0) - F.size(F.array_distinct("__rep_lines"))
                      / nlines).otherwise(F.lit(0.0))
               ).alias("dup_line_frac"),
            r6(F.try_divide(la["dup"].cast("double"),
                            la["tot"].cast("double"))
               ).alias("dup_line_char_frac"),
            top_frac(2).alias("top2_char_frac"),
            top_frac(3).alias("top3_char_frac"),
            top_frac(4).alias("top4_char_frac"),
            r6(F.try_divide(F.col("__rep_a5")["dup"].cast("double"), wlen)
               ).alias("dup5_char_frac"),
        )
        drops = (["__rep_t", "__rep_lines", "__rep_w", "__rep_wlen",
                  "__rep_lagg"]
                 + [f"__rep_g{n}" for n in (2, 3, 4, 5)]
                 + [f"__rep_a{n}" for n in (2, 3, 4, 5)])
        return out.withColumn(as_field, rep).drop(*drops)

    return fn


@register_stage("$gopherRules")
def gopher_rules_stage(expression: Any, ctx: Context) -> StageFn:
    """Gopher's published document-quality filters (Rae et al. 2021,
    Table A1 — the non-repetition rules; `$repetitionScore` carries the
    repetition table): ``{input, as?, ...thresholds}`` adds a struct of
    the measured signals plus a ``pass`` verdict:

    - ``n_words`` — whitespace word count; pass requires
      ``minWords`` ≤ n ≤ ``maxWords`` (50 / 100000)
    - ``mean_word_len`` — characters per word; ``minMeanWordLen`` /
      ``maxMeanWordLen`` (3 / 10)
    - ``hash_word_ratio`` / ``ellipsis_word_ratio`` — ``#`` count and
      non-overlapping ``...``/``…`` count over words; each must stay
      ≤ ``maxSymbolRatio`` (0.1)
    - ``bullet_line_frac`` — non-empty lines starting with a bullet
      (``• ‣ ▪ - *``); ≤ ``maxBulletFrac`` (0.9)
    - ``ellipsis_line_frac`` — non-empty lines ending in an ellipsis;
      ≤ ``maxEllipsisLineFrac`` (0.3)
    - ``alpha_word_frac`` — words containing at least one ``[A-Za-z]``;
      ≥ ``minAlphaFrac`` (0.8)
    - ``stop_word_hits`` — how many of Gopher's eight stop words (the,
      be, to, of, and, that, have, with) appear as lowercase words;
      ≥ ``minStopWords`` (2)

    Ratios round half-up to 6 digits; an empty document measures zeros
    and fails.  100 TB shape: pure row-local column program (split /
    filter / aggregate higher-order functions), no shuffle, no Python.
    """
    inp = expression["input"]
    as_field = expression.get("as", "gopher")
    min_words = int(expression.get("minWords", 50))
    max_words = int(expression.get("maxWords", 100_000))
    min_mwl = float(expression.get("minMeanWordLen", 3))
    max_mwl = float(expression.get("maxMeanWordLen", 10))
    max_symbol = float(expression.get("maxSymbolRatio", 0.1))
    max_bullet = float(expression.get("maxBulletFrac", 0.9))
    max_ell_line = float(expression.get("maxEllipsisLineFrac", 0.3))
    min_alpha = float(expression.get("minAlphaFrac", 0.8))
    min_stop = int(expression.get("minStopWords", 2))

    STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]

    def fn(df: DataFrame, c: Context) -> DataFrame:
        text = compile_expr(inp, ExprContext(schema=df.schema))
        # null text measures like the empty document (zeros, fail) —
        # without the coalesce, size(split(NULL)) would surface as -1
        out = df.withColumn(
            "__gr_t", F.coalesce(text.cast("string"), F.lit("")))
        t = F.col("__gr_t")
        # explicit whitespace class: Java's \s and RE2's \s disagree on
        # vertical tab, so the oracle would tokenize differently
        words = F.filter(F.split(t, _WS + "+"),
                         lambda w: w != F.lit(""))
        n_words = F.size(words).cast("double")
        word_chars = F.aggregate(
            F.transform(words, F.length), F.lit(0),
            lambda acc, v: acc + v).cast("double")
        mean_wl = F.coalesce(F.try_divide(word_chars, n_words), F.lit(0.0))
        hashes = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
                  ).cast("double")
        ellipses = F.regexp_count(t, F.lit("\\.\\.\\.|…")).cast("double")
        hash_ratio = F.coalesce(F.try_divide(hashes, n_words), F.lit(0.0))
        ell_ratio = F.coalesce(F.try_divide(ellipses, n_words), F.lit(0.0))
        # lines split on \r?\n (a CRLF \r left on the line would let
        # Java's $ match before it while RE2's $ would not) and trim
        # [ \t] at both ends — F.trim is space-only AND has an optional
        # second param, so bare in transform() it would bind the array
        # index as a trim-character set (the _seeded_hasher arity trap)
        lines = F.filter(
            F.transform(
                F.split(t, "\r?\n"),
                lambda l: F.regexp_replace(l, "^[ \\t]+|[ \\t]+$", "")),
            lambda l: l != F.lit(""))
        n_lines = F.size(lines).cast("double")
        bullet_frac = F.coalesce(F.try_divide(
            F.size(F.filter(lines,
                            lambda l: l.rlike("^[•‣▪*-]"))).cast("double"),
            n_lines), F.lit(0.0))
        # \z (absolute end), not $: Java's $ also matches before a
        # residual final \r (or U+2028/U+2029/U+0085) that the [ \t]
        # trim keeps, where RE2's $ and Python's $ do not
        ell_line_frac = F.coalesce(F.try_divide(
            F.size(F.filter(lines,
                            lambda l: l.rlike("(\\.\\.\\.|…)\\z"))
                   ).cast("double"),
            n_lines), F.lit(0.0))
        alpha_frac = F.coalesce(F.try_divide(
            F.size(F.filter(words,
                            lambda w: w.rlike("[A-Za-z]"))).cast("double"),
            n_words), F.lit(0.0))
        stop_hits = F.size(F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in STOP])))
        sig = {
            "n_words": n_words.cast("long"),
            "mean_word_len": _half_up6(mean_wl),
            "hash_word_ratio": _half_up6(hash_ratio),
            "ellipsis_word_ratio": _half_up6(ell_ratio),
            "bullet_line_frac": _half_up6(bullet_frac),
            "ellipsis_line_frac": _half_up6(ell_line_frac),
            "alpha_word_frac": _half_up6(alpha_frac),
            "stop_word_hits": stop_hits.cast("long"),
        }
        # thresholds compare the ROUNDED signals, so the verdict is
        # exactly reproducible from the exposed numbers (and the oracle)
        ok = (
            (sig["n_words"] >= min_words) & (sig["n_words"] <= max_words)
            & (sig["mean_word_len"] >= min_mwl)
            & (sig["mean_word_len"] <= max_mwl)
            & (sig["hash_word_ratio"] <= max_symbol)
            & (sig["ellipsis_word_ratio"] <= max_symbol)
            & (sig["bullet_line_frac"] <= max_bullet)
            & (sig["ellipsis_line_frac"] <= max_ell_line)
            & (sig["alpha_word_frac"] >= min_alpha)
            & (sig["stop_word_hits"] >= min_stop)
        )
        struct = F.struct(
            *[v.alias(k) for k, v in sig.items()], ok.alias("pass"))
        return out.withColumn(as_field, struct).drop("__gr_t")

    return fn


@register_stage("$c4Filter")
def c4_filter_stage(expression: Any, ctx: Context) -> StageFn:
    """C4-style cleaning (Raffel et al. 2020 §2.2, the public heuristics
    behind the C4 corpus): ``{input, as?, minWords?}`` adds a struct:

    - ``clean_text`` — the kept lines joined with ``\\n``: a line stays
      when it ends in terminal punctuation (``. ! ? "``), has at least
      ``minWords`` words (default 5), and does not contain
      ``javascript`` (case-insensitive) — C4's line rules
    - ``n_lines`` / ``n_kept`` — line counts before/after
    - ``drop_doc`` — C4's document rules: fewer than 3 kept sentences
      (terminal-punctuation count over kept lines), or the raw text
      contains ``{`` (code) or ``lorem ipsum``

    Deviation from the paper: the "bad words" blocklist is not shipped
    (policy-laden, corpus-specific) — compose with ``$match`` over
    ``clean_text`` for custom blocklists.  100 TB shape: pure row-local
    column program, no shuffle, no Python."""
    inp = expression["input"]
    as_field = expression.get("as", "c4")
    min_words = int(expression.get("minWords", 5))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        text = compile_expr(inp, ExprContext(schema=df.schema))
        out = df.withColumn("__c4_t", text)
        lines = F.split(F.col("__c4_t"), "\n")
        keep = F.filter(
            lines,
            lambda x: (
                F.trim(x).rlike('[.!?"]$')
                & (F.size(F.filter(F.split(F.trim(x), "\\s+"),
                                   lambda w: w != F.lit("")))
                   >= F.lit(min_words))
                & ~F.lower(x).contains("javascript")
            ),
        )
        out = out.withColumn("__c4_keep", keep)
        clean = F.concat_ws("\n", F.col("__c4_keep"))
        # sentence count: terminal punctuation marks across kept lines
        n_sent = F.length(F.regexp_replace(clean, "[^.!?]", ""))
        drop = (
            (n_sent < 3)
            | F.col("__c4_t").contains("{")
            | F.lower(F.col("__c4_t")).contains("lorem ipsum")
        )
        st = F.struct(
            clean.alias("clean_text"),
            F.coalesce(F.size(lines), F.lit(0)).cast("int")
            .alias("n_lines"),
            F.coalesce(F.size(F.col("__c4_keep")), F.lit(0)).cast("int")
            .alias("n_kept"),
            F.coalesce(drop, F.lit(True)).alias("drop_doc"),
        )
        return out.withColumn(as_field, st).drop("__c4_t", "__c4_keep")

    return fn


@register_stage("$tokenCount")
def token_count_stage(expression: Any, ctx: Context) -> StageFn:
    """Token counting: ``{input, as, mode: whitespace|bpe, tokenizer?}``.
    ``bpe`` uses a GPT-style pre-tokenizer regex (contractions / letter
    runs / digit runs / punctuation) as a deterministic proxy for a real
    BPE vocab.  r6: ``tokenizer: {merges: "<collection>"}`` runs REAL
    byte-pair encoding against a broadcast GPT-2-style merge-rank table
    (functions/bpe.py; r7: BYTE-level over the GPT-2 byte->unicode
    alphabet with a Unicode-class scanner pre-tokenizer — public
    merges.txt tables work verbatim) — the count a context budget
    actually means.  The
    merge loop is unbounded-depth, so this mode is an Arrow-batched
    Pandas UDF: the documented tokenizer Python boundary (like the
    $decodeMedia codec boundary), row-local, zero shuffle."""
    inp = expression["input"]
    as_field = expression.get("as", "n_tokens")
    mode = expression.get("mode", "whitespace")
    tokenizer = expression.get("tokenizer")
    if tokenizer is not None and "merges" not in tokenizer:
        raise ValueError("$tokenCount tokenizer needs a merges collection")
    if tokenizer is not None and "mode" in expression:
        # a tokenizer IS the mode — accepting both would silently ignore
        # one of them (advisor r6)
        raise ValueError(
            "$tokenCount: pass either mode or tokenizer, not both "
            f"(got mode={expression['mode']!r} with a tokenizer)")
    if mode not in ("whitespace", "bpe"):
        raise ValueError(f"bad token mode {mode}")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        text = compile_expr(inp, ExprContext(schema=df.schema))
        if tokenizer is not None:
            from . import bpe as _bpe

            _bpe.ship()
            bc = _bpe.broadcast_tokenizer(c, tokenizer["merges"])
            count_tokens = _bpe.count_tokens

            cache: dict = {}  # per-TASK word memo (closure state
            # survives Arrow batches; reset if it ever balloons)

            @F.pandas_udf("long")
            def _count(s: pd.Series) -> pd.Series:
                _bpe.trim_memo(cache)
                rk, _ = bc.value
                return s.map(lambda t: count_tokens(t, rk, cache))

            return df.withColumn(as_field, _count(text))
        if mode == "whitespace":
            count = F.size(F.split(F.trim(text), "\\s+"))
        else:  # "bpe" (mode validated at compile time)
            pattern = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
            count = F.regexp_count(text, F.lit(pattern))
        return df.withColumn(as_field, count.cast("long"))

    return fn


@register_stage("$bpeEncode")
def bpe_encode_stage(expression: Any, ctx: Context) -> StageFn:
    """Full BPE tokenization — the artifact a training pipeline
    actually materializes: ``{input, tokenizer: {merges, vocab?}, as?}``
    adds ``as`` (default "tokens") as ``array<string>`` of byte-level
    BPE tokens in the GPT-2 remap alphabet (``"Ġthe"`` — the public
    vocab.json symbol space; ``bpe.decode(tokens) == text`` exactly).
    With ``vocab`` (a collection mapping ``token -> id``), emits
    ``array<long>`` ids instead; tokens absent from the vocab map to
    ``-1`` — r7 byte-level note: a vocab containing all 256 single-byte
    symbols (every public GPT-2-style vocab does) can never OOV, since
    an unmerged token IS a byte symbol.  Null in -> null out.

    100 TB shape: same Arrow-batched tokenizer boundary as
    ``$tokenCount`` — merge table (and vocab) broadcast once per
    executor, row-local, zero shuffle."""
    inp = expression["input"]
    as_field = expression.get("as", "tokens")
    tokenizer = expression.get("tokenizer") or {}
    if "merges" not in tokenizer:
        raise ValueError("$bpeEncode tokenizer needs a merges collection")
    vocab_name = tokenizer.get("vocab")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from . import bpe as _bpe

        _bpe.ship()
        bc = _bpe.broadcast_tokenizer(c, tokenizer["merges"], vocab_name)
        encode = _bpe.encode
        text = compile_expr(inp, ExprContext(schema=df.schema))

        cache: dict = {}  # per-task word memo, see $tokenCount

        if vocab_name is None:
            @F.pandas_udf("array<string>")
            def _enc(s: pd.Series) -> pd.Series:
                _bpe.trim_memo(cache)
                rk, _ = bc.value
                return s.map(lambda t: None if t is None
                             else encode(t, rk, cache))
        else:
            @F.pandas_udf("array<long>")
            def _enc(s: pd.Series) -> pd.Series:
                _bpe.trim_memo(cache)
                rk, vb = bc.value
                return s.map(lambda t: None if t is None
                             else [vb.get(tok, -1)
                                   for tok in encode(t, rk, cache)])

        return df.withColumn(as_field, _enc(text))

    return fn


@register_stage("$bpeDecode")
def bpe_decode_stage(expression: Any, ctx: Context) -> StageFn:
    """Invert ``$bpeEncode``: ``{input, as?, tokenizer?, onError?}``
    turns a token array back into text.

    - ``array<string>`` input (remap-alphabet tokens, the $bpeEncode
      default output): decoding needs NO model at all — the GPT-2
      byte->unicode remap inverts as a compile-time ``translate`` map
      and the byte join is ``encode(ISO-8859-1)`` + ``decode(UTF-8)``.
      **Pure JVM column program** (whole-stage codegen, no broadcast,
      no Python) — the decode direction is the cheap one, by design.
    - ``array<long>`` / ``array<int>`` input (vocab ids): needs
      ``tokenizer: {vocab}`` — the id->token reverse map broadcasts
      (same memo as the encoder) and decoding runs on the Arrow
      tokenizer boundary.

    ``onError`` (default ``"error"``): token sequences that do not form
    valid UTF-8 (an arbitrary slice can cut a multi-byte codepoint),
    tokens containing chars outside the GPT-2 remap alphabet (not
    ``$bpeEncode`` output — advisor r8: raw control chars like
    ``"\\x07"`` are latin-1 but the remap never emits them, so both
    paths reject them), or ids absent from the vocab raise; ``"null"``
    yields null for that row instead.  Null in -> null out.  100 TB
    shape: row-local, zero shuffle either way."""
    inp = expression["input"]
    as_field = expression.get("as", "text")
    tokenizer = expression.get("tokenizer") or {}
    vocab_name = tokenizer.get("vocab")
    on_error = expression.get("onError", "error")
    if on_error not in ("error", "null"):
        raise ValueError(
            f"$bpeDecode onError must be error|null, got {on_error!r}")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from . import bpe as _bpe

        toks = compile_expr(inp, ExprContext(schema=df.schema))
        dt = df.select(toks.alias("__t")).schema[0].dataType
        if not isinstance(dt, T.ArrayType):
            raise ValueError(
                f"$bpeDecode input must be an array (got {dt.simpleString()})")
        if isinstance(dt.elementType, T.StringType):
            # JVM path: invert the remap via translate, re-read the
            # latin-1 bytes as UTF-8
            pairs = sorted((u, b) for b, u in _bpe.BYTE_TO_UNICODE.items()
                           if ord(u) != b)
            frm = "".join(u for u, _ in pairs)
            to = "".join(chr(b) for _, b in pairs)
            # review r7: a null ELEMENT would silently vanish in
            # concat_ws — that's data corruption, not decoding; and a
            # token containing a char outside the remap alphabet makes
            # encode(ISO-8859-1) itself raise, so the lenient mode must
            # guard BEFORE encode (nested when = guaranteed
            # short-circuit), not just before decode.
            # advisor r8: validate against the REMAP ALPHABET itself,
            # not merely latin-1 — chars like "\x07" or a raw "\n" are
            # latin-1 bytes but are NOT $bpeEncode output (the remap
            # maps those bytes to Ā-range symbols), and the id
            # path rejects their vocab analogs; without this guard the
            # string path silently decoded them.  The class is built
            # from BYTE_TO_UNICODE so it IS the encoder's alphabet.
            alpha_cps = sorted(ord(u) for u in _bpe.BYTE_TO_UNICODE
                               .values())
            runs: list[list[int]] = []
            for cp in alpha_cps:
                if runs and cp == runs[-1][1] + 1:
                    runs[-1][1] = cp
                else:
                    runs.append([cp, cp])
            alpha_re = "^[%s]*$" % "".join(
                f"\\u{a:04x}-\\u{b:04x}" if a != b else f"\\u{a:04x}"
                for a, b in runs)
            has_null_tok = F.exists(toks, lambda x: x.isNull())
            raw = F.concat_ws("", toks)
            alpha_ok = raw.rlike(alpha_re)
            translated = F.translate(raw, frm, to)
            joined = F.encode(translated, "ISO-8859-1")
            decoded = F.decode(joined, "UTF-8")
            if on_error == "null":
                decoded = F.when(
                    alpha_ok,
                    F.when(F.call_function("is_valid_utf8", joined),
                           decoded))
                bad_elem = F.lit(None).cast("string")
            else:
                decoded = F.when(alpha_ok, decoded).otherwise(
                    F.raise_error(F.concat(
                        F.lit("$bpeDecode: token outside the GPT-2 "
                              "remap alphabet (tokens must be "
                              "$bpeEncode output; use onError: 'null' "
                              "to tolerate)"),
                    )).cast("string"))
                bad_elem = F.raise_error(F.concat(
                    F.lit("$bpeDecode: null token element at input "),
                    F.lit("(tokens must be a complete $bpeEncode "
                          "output; use onError: 'null' to tolerate)"),
                )).cast("string")
            out = F.when(toks.isNull(), F.lit(None).cast("string")) \
                .when(has_null_tok, bad_elem) \
                .otherwise(decoded)
            return df.withColumn(as_field, out)
        if not isinstance(dt.elementType, T.IntegralType):
            raise ValueError(
                "$bpeDecode input must be array<string> tokens or "
                f"array<long> ids (got {dt.simpleString()})")
        if vocab_name is None:
            raise ValueError(
                "$bpeDecode on id arrays needs tokenizer: {vocab: ...}")
        _bpe.ship()
        # reuse the encoder's broadcast memo keyed on the vocab alone
        # (merges resolves too if present; ids only need the vocab)
        merges_name = tokenizer.get("merges")
        if merges_name is not None:
            bc = _bpe.broadcast_tokenizer(c, merges_name, vocab_name)

            def get_vocab():
                return bc.value[1]
        else:
            bcv = _bpe.broadcast_vocab(c, vocab_name)

            def get_vocab():
                return bcv.value
        null_on_err = on_error == "null"
        decode_ids = _bpe.decode_ids
        memo: dict = {}  # reverse map inverted once per task, not per
        # Arrow batch (review r7) — the closure state survives batches

        @F.pandas_udf("string")
        def _dec(s: pd.Series) -> pd.Series:
            rev = memo.get("rev")
            if rev is None:
                rev = {i: t for t, i in get_vocab().items()}
                memo["rev"] = rev
            return s.map(lambda ids: None if ids is None
                         else decode_ids(ids, rev, null_on_err))

        return df.withColumn(as_field, _dec(toks))

    return fn


@register_stage("$bpeTrain")
def bpe_train_stage(expression: Any, ctx: Context) -> StageFn:
    """Learn a BPE merge table FROM the corpus — the in-engine source
    for ``$tokenCount``/``$truncateTokens`` ``tokenizer: {merges}``:
    ``{input, merges, minCount?, maxWords?}`` emits ``(left, right,
    rank)`` rows (feed back via ``Context.collections``).

    100 TB shape (how practical BPE training works): the corpus
    collapses to a WORD-FREQUENCY table first — pre-tokenize (the same
    Python pre-tokenizer the encoder uses, Arrow-batched), explode,
    one partial-aggregated groupBy(word) — then the top ``maxWords``
    (default 1,000,000; TakeOrderedAndProject, no global sort) rows
    come to the driver and the frequency-greedy merge loop (Sennrich et
    al. 2016, incremental pair-count bookkeeping — functions/bpe.py
    ``train``) runs driver-side over that BOUNDED table, exactly like
    reference tokenizer trainers.  ``minCount`` (default 2) stops when
    no pair reaches it.  Eager (the word-count job runs when the stage
    executes, like $bucketAuto's boundary job); the output plan is a
    local relation."""
    inp = expression["input"]
    n_merges = int(expression["merges"])
    min_count = int(expression.get("minCount", 2))
    max_words = int(expression.get("maxWords", 1_000_000))
    if n_merges < 1 or min_count < 1 or max_words < 1:
        raise ValueError(
            "$bpeTrain needs merges >= 1, minCount >= 1, maxWords >= 1")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _corpus_only

        _corpus_only("$bpeTrain", c)
        from . import bpe as _bpe

        _bpe.ship()  # the scanner closure pickles by value
        text = compile_expr(inp, ExprContext(schema=df.schema))
        pretokenize = _bpe.pretokenize

        @F.pandas_udf("array<string>")
        def _pretok(s: pd.Series) -> pd.Series:
            return s.map(lambda t: [] if t is None
                         else pretokenize(t))

        word_rows = (
            df.select(F.explode(_pretok(text)).alias("__w"))
            .groupBy("__w").agg(F.count(F.lit(1)).alias("__c"))
            .orderBy(F.col("__c").desc(), F.col("__w"))
            .limit(max_words)
            .collect()
        )
        counts = {r["__w"]: int(r["__c"]) for r in word_rows}
        merges = _bpe.train(counts, n_merges, min_count)
        return c.spark.createDataFrame(
            merges, "left string, right string, rank long")

    return fn


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
    never inline expressions: the aggregate re-evaluates its array
    arguments inside the HOF lambda per element (no CSE), and downstream
    struct fields referencing the result would each re-run it."""
    return F.aggregate(
        F.array_distinct(gc), F.lit(0).cast("long"),
        lambda acc, g: acc + F.least(
            F.size(F.filter(gc, lambda x: x == g)),
            F.size(F.filter(gr, lambda x: x == g)),
        ).cast("long"))


def _eval_clipped_multi(gc: Column, grs: Column) -> Column:
    """Multi-reference clipped intersection (Papineni 2002 §2.2): per
    distinct candidate gram, ``min(count in candidate, MAX count across
    references)`` — a gram is creditable up to the most any single
    reference supports it, never the sum.  ``grs`` is an array of gram
    arrays (one per reference).  Same materialized-temp-column contract
    as :func:`_eval_clipped`."""
    return F.aggregate(
        F.array_distinct(gc), F.lit(0).cast("long"),
        lambda acc, g: acc + F.least(
            F.size(F.filter(gc, lambda x: x == g)),
            F.array_max(F.transform(
                grs, lambda arr: F.size(F.filter(arr, lambda x: x == g)))),
        ).cast("long"))


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
            else:
                raise ValueError(
                    f"$profile: {col!r} is {dt.simpleString()} — "
                    "profilable kinds are numeric, string, date and "
                    "timestamp (cast or $addFields first)")

        # positional internal keys + backtick-quoted access: a column
        # name containing dots must neither break the agg (unquoted
        # resolution parses nested access) nor the stat readback
        # (review r7)
        def qcol(col: str) -> Column:
            return F.col("`" + col.replace("`", "``") + "`")

        key = {col: f"__pf{i}" for i, col in enumerate(cols)}
        aggs = [F.count(F.lit(1)).alias("__n_rows")]
        for col in cols:
            k, kind = key[col], kinds[col]
            raw = qcol(col)
            x = raw.cast("double") if kind == "numeric" else raw
            distinct = (F.count_distinct(x) if exact
                        else F.approx_count_distinct(x))
            aggs += [
                F.count(x).alias(f"{k}_nn"),
                distinct.cast("long").alias(f"{k}_nd"),
            ]
            if kind == "numeric":
                aggs += [
                    F.min(x).alias(f"{k}_min"),
                    F.max(x).alias(f"{k}_max"),
                    F.avg(x).alias(f"{k}_mean"),
                    F.stddev_pop(x).alias(f"{k}_sd"),
                ]
                for p, nm in zip(pcts, names):
                    q = (F.percentile(x, F.lit(float(p))) if exact
                         else F.percentile_approx(x, F.lit(float(p))))
                    aggs.append(q.alias(f"{k}_{nm}"))
            elif kind == "string":
                ln = F.length(x)
                aggs += [
                    F.min(x).alias(f"{k}_smin"),
                    F.max(x).alias(f"{k}_smax"),
                    F.min(ln).alias(f"{k}_lmin"),
                    F.max(ln).alias(f"{k}_lmax"),
                    F.avg(ln).alias(f"{k}_lavg"),
                ]
            else:  # date / timestamp
                aggs += [
                    F.min(x).alias(f"{k}_tmin"),
                    F.max(x).alias(f"{k}_tmax"),
                ]
        row = df.agg(*aggs)
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
                    *[F.col(f"{k}_{nm}").alias(nm) for nm in names],
                ]
                strs = [s_null.alias("min_str"), s_null.alias("max_str")]
                lens = [l_null.alias("min_len"), l_null.alias("max_len"),
                        d_null.alias("avg_len")]
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
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        ref = compile_expr(ref_e, sctx) if ref_e is not None else None
        refs = compile_expr(refs_e, sctx) if refs_e is not None else None
        b2 = beta * beta

        def lcs_len(a: list, b: list) -> int:
            # two-row DP; rows over the shorter side for O(min) memory
            if len(a) < len(b):
                a, b = b, a
            if not b:
                return 0
            prev = [0] * (len(b) + 1)
            for x in a:
                cur = [0]
                append = cur.append
                for j, y in enumerate(b, 1):
                    if x == y:
                        append(prev[j - 1] + 1)
                    else:
                        pj = prev[j]
                        cj = cur[j - 1]
                        append(pj if pj >= cj else cj)
                prev = cur
            return prev[-1]

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
    if not 1 <= max_n <= 8:
        raise ValueError("$bleu maxN must be in 1..8")
    if max_words < 1:
        raise ValueError("$bleu maxWords must be >= 1")
    if smooth not in (None, "add1"):
        raise ValueError(f"$bleu smooth must be 'add1' or absent, "
                         f"got {smooth!r}")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        temps = ["__bleu_wc"]
        stage = df.withColumn("__bleu_wc", _eval_words(cand, max_words))
        wc = F.col("__bleu_wc")
        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            temps.append("__bleu_wrs")
            stage = stage.withColumn(
                "__bleu_wrs",
                F.transform(F.filter(refs, lambda r: r.isNotNull()),
                            lambda r: _eval_words(r, max_words)))
            wrs = F.col("__bleu_wrs")
            null_in = cand.isNull() | refs.isNull() | (F.size(wrs) == 0)
        else:
            ref = compile_expr(ref_e, sctx)
            temps.append("__bleu_wr")
            stage = stage.withColumn("__bleu_wr",
                                     _eval_words(ref, max_words))
            null_in = cand.isNull() | ref.isNull()
        wr = F.col("__bleu_wr")
        for n in range(1, max_n + 1):
            gc_name, m_name = f"__bleu_gc{n}", f"__bleu_m{n}"
            temps += [gc_name, m_name]
            stage = stage.withColumn(gc_name, _eval_grams(wc, n))
            if refs_e is not None:
                grs_name = f"__bleu_grs{n}"
                temps.append(grs_name)
                stage = stage.withColumn(
                    grs_name,
                    F.transform(wrs, lambda w: _eval_grams(w, n)))
                stage = stage.withColumn(
                    m_name,
                    _eval_clipped_multi(F.col(gc_name), F.col(grs_name)))
            else:
                gr_name = f"__bleu_gr{n}"
                temps.append(gr_name)
                stage = stage.withColumn(gr_name, _eval_grams(wr, n))
                stage = stage.withColumn(
                    m_name, _eval_clipped(F.col(gc_name), F.col(gr_name)))
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
    if not 1 <= max_n <= 8:
        raise ValueError("$bleuCorpus maxN must be in 1..8")
    if max_words < 1:
        raise ValueError("$bleuCorpus maxWords must be >= 1")
    if smooth not in (None, "add1"):
        raise ValueError(f"$bleuCorpus smooth must be 'add1' or absent, "
                         f"got {smooth!r}")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _corpus_only

        _corpus_only("$bleuCorpus", c)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        stage = df.withColumn("__blc_wc", _eval_words(cand, max_words))
        wc = F.col("__blc_wc")
        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            stage = stage.withColumn(
                "__blc_wrs",
                F.transform(F.filter(refs, lambda r: r.isNotNull()),
                            lambda r: _eval_words(r, max_words)))
            wrs = F.col("__blc_wrs")
            scorable = cand.isNotNull() & refs.isNotNull() \
                & (F.size(wrs) > 0)
        else:
            ref = compile_expr(ref_e, sctx)
            stage = stage.withColumn("__blc_wr",
                                     _eval_words(ref, max_words))
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

    DELIBERATE DEVIATION from the sacrebleu tool: this follows the
    PAPER's formula (Popović 2015 eq. 1 — average P and average R over
    orders, combined into ONE F), whereas sacrebleu averages the
    per-order F-scores and counts an order effective only when BOTH
    sides have grams.  Values therefore do not reproduce sacrebleu's
    chrF2 numbers exactly; the whitespace-strip and clipping match.

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
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        strip = lambda t: F.substring(  # noqa: E731
            F.regexp_replace(t, r"\s+", ""), 1, max_chars)
        temps = ["__chrf_sc"]
        stage = df.withColumn("__chrf_sc", strip(cand))
        sc = F.col("__chrf_sc")
        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)
            temps.append("__chrf_srs")
            stage = stage.withColumn(
                "__chrf_srs",
                F.transform(F.filter(refs, lambda r: r.isNotNull()),
                            strip))
            srs = F.col("__chrf_srs")
            for n in range(1, max_n + 1):
                gc_n, grs_n, ms_n = (f"__chrf_gc{n}", f"__chrf_grs{n}",
                                     f"__chrf_ms{n}")
                temps += [gc_n, grs_n, ms_n]
                stage = stage.withColumn(gc_n, char_grams(sc, n))
                # per-reference grams and clips materialize as array
                # temp columns (array<array<string>> / array<long>) —
                # the HOF-CSE rule applied to the multi-ref axis
                stage = stage.withColumn(
                    grs_n, F.transform(srs, lambda s: char_grams(s, n)))
                stage = stage.withColumn(
                    ms_n,
                    F.transform(F.col(grs_n),
                                lambda g: _eval_clipped(F.col(gc_n), g)))

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
                return one_score(triples)

            # best-matching reference wins (sacrebleu multi-ref: max)
            score = F.array_max(
                F.transform(F.sequence(F.lit(1), F.size(srs)),
                            ref_score))
            null_in = cand.isNull() | refs.isNull() | (F.size(srs) == 0)
        else:
            ref = compile_expr(ref_e, sctx)
            temps.append("__chrf_sr")
            stage = stage.withColumn("__chrf_sr", strip(ref))
            sr = F.col("__chrf_sr")
            for n in range(1, max_n + 1):
                gc_n, gr_n, m_n = (f"__chrf_gc{n}", f"__chrf_gr{n}",
                                   f"__chrf_m{n}")
                temps += [gc_n, gr_n, m_n]
                stage = stage.withColumn(gc_n, char_grams(sc, n)) \
                             .withColumn(gr_n, char_grams(sr, n))
                stage = stage.withColumn(
                    m_n, _eval_clipped(F.col(gc_n), F.col(gr_n)))
            score = one_score([
                (F.size(F.col(f"__chrf_gc{n}")).cast("double"),
                 F.size(F.col(f"__chrf_gr{n}")).cast("double"),
                 F.col(f"__chrf_m{n}").cast("double"))
                for n in range(1, max_n + 1)])
            null_in = cand.isNull() | ref.isNull()
        out = F.when(null_in, F.lit(None).cast("double")) \
            .otherwise(score)
        return stage.withColumn(as_field, out).drop(*temps)

    return fn


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
    if not 1 <= max_n <= 10:
        raise ValueError("$chrfCorpus maxN must be in 1..10")
    if beta <= 0:
        raise ValueError("$chrfCorpus beta must be > 0")
    if max_chars < 1:
        raise ValueError("$chrfCorpus maxChars must be >= 1")
    b2 = beta * beta

    def fn(df: DataFrame, c: Context) -> DataFrame:
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

        stage = df.filter(cand.isNotNull() & ref.isNotNull()) \
            .withColumn("__chc_sc", strip(cand)) \
            .withColumn("__chc_sr", strip(ref))
        sc, sr = F.col("__chc_sc"), F.col("__chc_sr")
        for n in range(1, max_n + 1):
            gc_n, gr_n, m_n = (f"__chc_gc{n}", f"__chc_gr{n}",
                               f"__chc_m{n}")
            stage = stage.withColumn(gc_n, char_grams(sc, n)) \
                         .withColumn(gr_n, char_grams(sr, n))
            stage = stage.withColumn(
                m_n, _eval_clipped(F.col(gc_n), F.col(gr_n)))
        zero_l = F.lit(0).cast("long")
        aggs = [F.count(F.lit(1)).alias("n_segments")]
        for n in range(1, max_n + 1):
            aggs += [
                F.coalesce(F.sum(F.col(f"__chc_m{n}")), zero_l)
                .alias(f"m{n}"),
                F.coalesce(F.sum(F.size(F.col(f"__chc_gc{n}"))
                                 .cast("long")), zero_l).alias(f"tc{n}"),
                F.coalesce(F.sum(F.size(F.col(f"__chc_gr{n}"))
                                 .cast("long")), zero_l).alias(f"tr{n}"),
            ]
        row = stage.agg(*aggs)
        p_sum = F.lit(0.0)
        r_sum = F.lit(0.0)
        n_eff = F.lit(0)
        outs = []
        for n in range(1, max_n + 1):
            m = F.col(f"m{n}").cast("double")
            tc = F.col(f"tc{n}").cast("double")
            tr = F.col(f"tr{n}").cast("double")
            eff = (tc > 0) | (tr > 0)
            p = F.when(tc > 0, m / tc).otherwise(F.lit(0.0))
            r = F.when(tr > 0, m / tr).otherwise(F.lit(0.0))
            p_sum = p_sum + F.when(eff, p).otherwise(F.lit(0.0))
            r_sum = r_sum + F.when(eff, r).otherwise(F.lit(0.0))
            n_eff = n_eff + eff.cast("int")
            outs += [p.alias(f"p{n}"), r.alias(f"r{n}")]
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

    (Spark's builtin ``levenshtein`` is character-level; WER is defined
    over words, hence the DP here.)"""
    cand_e = expression["candidate"]
    ref_e = expression.get("reference")
    refs_e = expression.get("references")
    if (ref_e is None) == (refs_e is None):
        raise ValueError(
            "$wer needs exactly one of reference | references")
    max_words = int(expression.get("maxWords", 2000))
    as_field = expression.get("as", "wer")
    if max_words < 1:
        raise ValueError("$wer maxWords must be >= 1")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        score_one, score_multi = _make_wer_scorers(max_words)

        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)

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
    if max_words < 1:
        raise ValueError("$werCorpus maxWords must be >= 1")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _corpus_only

        _corpus_only("$werCorpus", c)
        sctx = ExprContext(schema=df.schema)
        cand = compile_expr(cand_e, sctx)
        score_one, score_multi = _make_wer_scorers(max_words)

        if refs_e is not None:
            refs = compile_expr(refs_e, sctx)

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
        stage = df.withColumn("__wrc", raw) \
            .filter(F.col("__wrc.n_hyp").isNotNull())
        zero_l = F.lit(0).cast("long")
        row = stage.agg(
            F.count(F.lit(1)).alias("n_segments"),
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


@register_stage("$bm25")
def bm25_stage(expression: Any, ctx: Context) -> StageFn:
    """BM25 ranked retrieval: ``{query, input, id, k, k1, b}`` →
    ``(id, score, rank)`` for the top-k documents.

    Spark-first plan: per-document term frequencies are array-filter
    counts over the tokenized text (one column per query term — query
    terms are few, so no explode), corpus statistics (N, avgdl, per-term
    document frequency) are ONE global aggregate broadcast back as a
    single row, and the final top-k is orderBy+limit, which Spark
    executes as TakeOrderedAndProject (per-partition heap-k + driver
    merge — no global sort shuffle).  At 100 TB the only wide operation
    is the single-row stats aggregate, whose partial aggregation reduces
    each task to one row.

    Streaming classification (r9, pinned in README): PER-BATCH by
    design — the corpus statistics fit on each micro-batch (windowed
    retrieval; scores comparable within a batch, not across).  For
    cross-batch-comparable scores, precompute stats on a static corpus
    and stream against them.
    """
    query = expression["query"]
    inp = expression["input"]
    id_field = expression.get("id", "_id")
    k = int(expression.get("k", 10))
    k1 = float(expression.get("k1", 1.2))
    b = float(expression.get("b", 0.75))
    import re as _re

    terms = list(dict.fromkeys(
        t for t in _re.sub(r"[^a-z0-9 ]", " ", query.lower()).split() if t
    ))
    if not terms:
        raise ValueError("$bm25 needs at least one query term")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from pyspark.sql import Window

        df = _spread(df)  # a small corpus file arrives as ONE scan
        # partition; the token fold is the per-row-heavy work _spread
        # exists for (large inputs are already wide and pass through)
        text = compile_expr(inp, ExprContext(schema=df.schema))
        tokens = F.filter(
            F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
        )
        # ALL term frequencies in one fold over the token array (the
        # simhash vote-fold pattern): tokenization happens once per row
        # regardless of query size, instead of once per term — HOFs are
        # interpreted (no codegen CSE), so textual duplication would
        # really recompute the split.  The fold is ONE SQL string: the
        # equivalent nested-lambda Column construction costs ~1 s of py4j
        # round-trips per plan (the simhash lesson).
        terms_sql = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
        counts = F.expr(
            f"aggregate(`__toks`, array_repeat(0.0D, {len(terms)}), "
            f"(acc, t) -> zip_with(acc, array({terms_sql}), "
            f"(a, trm) -> a + if(t = trm, 1.0D, 0.0D)))"
        )
        # the whole scoring plan is built from GENERATED SQL strings — a
        # handful of py4j calls total, instead of O(terms) Column-building
        # round-trips (~0.3 s of driver latency per plan at 3 terms)
        idq = f"`{id_field}`"
        base = df.withColumn("__toks", tokens).select(
            F.col(id_field),
            F.expr("cast(size(`__toks`) as double)").alias("__dl"),
            counts.alias("__tfs"),
        ).selectExpr(
            idq, "__dl",
            *[f"__tfs[{i}] as __tf{i}" for i in range(len(terms))],
        )
        stats = base.groupBy().agg(
            F.expr("cast(count(1) as double)").alias("__n"),
            F.expr("avg(__dl)").alias("__avgdl"),
            *[
                F.expr(f"sum(cast(__tf{i} > 0 as double))").alias(f"__df{i}")
                for i in range(len(terms))
            ],
        )
        joined = base.crossJoin(F.broadcast(stats))
        score_sql = " + ".join(
            f"ln(1.0D + (__n - __df{i} + 0.5D) / (__df{i} + 0.5D))"
            f" * __tf{i} * {k1 + 1.0}D"
            f" / (__tf{i} + {k1}D * ({1.0 - b}D + {b}D * __dl / __avgdl))"
            for i in range(len(terms))
        )
        scored = joined.selectExpr(idq, f"0.0D + {score_sql} as score")
        top = scored.orderBy(F.col("score").desc(), F.col(id_field)).limit(k)
        w = Window.orderBy(F.col("score").desc(), F.col(id_field))
        return top.withColumn("rank", F.row_number().over(w))

    return fn


@register_stage("$tfIdf")
def tf_idf_stage(expression: Any, ctx: Context) -> StageFn:
    """Per-document top-K TF-IDF keyword extraction:
    ``{input, id, topK, minDf?, maxDfRatio?}`` → ``(id, term, tf, score,
    rank)`` rows, ``topK`` terms per document.

    The curation twin of $bm25: where $bm25 ranks documents for a fixed
    query, $tfIdf surfaces each document's most characteristic terms
    (corpus labeling, cluster naming, topic drift checks).  ``minDf``
    drops hapax noise; ``maxDfRatio`` drops stopword-ish terms present in
    more than that fraction of documents.

    Spark-first plan, corpus-scale by construction: term frequencies are
    one (id, term) partial-aggregated shuffle over the exploded tokens;
    document frequencies reduce the SAME aggregate again by term
    (vocabulary-sized); N is a single-row aggregate broadcast back; the
    tf⋈df equi-join shuffles on term (AQE broadcasts it when the
    vocabulary is small); the per-document top-K window rides the id
    shuffle.  Nothing is quadratic and nothing collects to the driver.
    Scores are ``tf · ln(N/df)`` rounded to 9 digits so parallel
    summation order can't leak into comparisons.

    Streaming classification (r9, pinned in README): PER-BATCH by
    design — the corpus statistics fit on each micro-batch (windowed
    retrieval; scores comparable within a batch, not across).  For
    cross-batch-comparable scores, precompute stats on a static corpus
    and stream against them.
    """
    inp = expression["input"]
    id_field = expression.get("id", "_id")
    top_k = int(expression.get("topK", 5))
    min_df = float(expression.get("minDf", 1))
    max_df_ratio = float(expression.get("maxDfRatio", 1.0))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from pyspark.sql import Window

        df = _spread(df)
        text = compile_expr(inp, ExprContext(schema=df.schema))
        tokens = F.filter(
            F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
        )
        pairs = df.select(
            F.col(id_field).alias("__tid"), F.explode(tokens).alias("term")
        )
        tf = pairs.groupBy("__tid", "term").agg(
            F.count(F.lit(1)).cast("double").alias("tf")
        )
        dfreq = tf.groupBy("term").agg(
            F.count(F.lit(1)).cast("double").alias("__df")
        )
        n = df.groupBy().agg(F.count(F.lit(1)).cast("double").alias("__n"))
        scored = (
            tf.join(dfreq, "term")
            .crossJoin(F.broadcast(n))
            .filter(
                (F.col("__df") >= F.lit(min_df))
                & (F.col("__df") / F.col("__n") <= F.lit(max_df_ratio))
            )
            .withColumn(
                "score",
                # half-up at 9 digits via the floor formula — bit-identical
                # to the SQL-oracle convention (plain round() differs
                # between engines on boundary halves)
                F.floor(
                    F.col("tf") * F.log(F.col("__n") / F.col("__df")) * 1e9
                    + F.lit(0.5)
                ).cast("double")
                / F.lit(1e9),
            )
        )
        w = Window.partitionBy("__tid").orderBy(
            F.col("score").desc(), F.col("term")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(
                F.col("__tid").alias(id_field), "term", "tf", "score", "rank"
            )
        )

    return fn


@register_stage("$collocations")
def collocations_stage(expression: Any, ctx: Context) -> StageFn:
    """Corpus-level collocation mining: ``{input, top, minCount?}`` →
    the ``top`` adjacent word pairs by pointwise mutual information, as
    ``(w1, w2, count, pmi, rank)`` rows.

    PMI = ln((c12 / B) / ((c1 / T) · (c2 / T))) with T total tokens and
    B total bigrams; ``minCount`` (default 5) suppresses the classic
    low-frequency PMI explosion.  Corpus-scale plan: bigram and unigram
    counts are two partial-aggregated shuffles over row-local explodes;
    totals are a single-row broadcast; the two unigram joins are
    vocabulary-sized equi-joins (AQE broadcasts small vocabularies); the
    final top-N is orderBy+limit = TakeOrderedAndProject (per-partition
    heap, no global sort shuffle).

    Streaming classification (r9, pinned in README): PER-BATCH by
    design — the corpus statistics fit on each micro-batch (windowed
    retrieval; scores comparable within a batch, not across).  For
    cross-batch-comparable scores, precompute stats on a static corpus
    and stream against them.
    """
    inp = expression["input"]
    top = int(expression.get("top", 20))
    min_count = int(expression.get("minCount", 5))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        df = _spread(df)
        text = compile_expr(inp, ExprContext(schema=df.schema))
        tokens = F.filter(
            F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
        )
        toked = df.select(tokens.alias("__toks"))
        uni = (
            toked.select(F.explode("__toks").alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).cast("double").alias("c"))
        )
        bi_arr = F.expr(
            "filter(zip_with(`__toks`, slice(`__toks`, 2, "
            "greatest(size(`__toks`) - 1, 0)), "
            "(a, b) -> struct(a as w1, b as w2)), p -> p.w2 is not null)"
        )
        bi_all = (
            toked.select(F.explode(bi_arr).alias("p"))
            .select("p.w1", "p.w2")
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).cast("double").alias("count"))
        )
        bi = bi_all.filter(F.col("count") >= min_count)
        # T and B are exactly the sums of the two count aggregates — a
        # third tokenize pass over the corpus would just recompute them;
        # these re-reduce the (reused) shuffle outputs, vocabulary-sized
        totals = uni.groupBy().agg(
            F.sum("c").alias("__t")
        ).crossJoin(bi_all.groupBy().agg(F.sum("count").alias("__b")))
        c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("__c1"))
        c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("__c2"))
        scored = (
            bi.join(c1, "w1")
            .join(c2, "w2")
            .crossJoin(F.broadcast(totals))
            .withColumn(
                "pmi",
                F.floor(
                    F.log(
                        (F.col("count") / F.col("__b"))
                        / ((F.col("__c1") / F.col("__t"))
                           * (F.col("__c2") / F.col("__t")))
                    ) * 1e9 + F.lit(0.5)
                ).cast("double") / F.lit(1e9),
            )
        )
        from pyspark.sql import Window

        ranked = scored.orderBy(
            F.col("pmi").desc(), F.col("w1"), F.col("w2")
        ).limit(top)
        w = Window.orderBy(F.col("pmi").desc(), F.col("w1"), F.col("w2"))
        return ranked.withColumn("rank", F.row_number().over(w)).select(
            "w1", "w2", "count", "pmi", "rank"
        )

    return fn


# ordered scrub rules: name -> (regex, replacement token).  Emails before
# URLs (an email's domain must not be half-matched as a URL), URLs before
# phone-ish digit runs.
SCRUB_RULES: list[tuple[str, tuple[str, str]]] = [
    ("email", (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
               "<EMAIL>")),
    ("url", (r"https?://[^\s]+", "<URL>")),
    ("ip", (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>")),
    ("phone", (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>")),
]


@register_stage("$scrubText")
def scrub_text_stage(expression: Any, ctx: Context) -> StageFn:
    """PII scrubbing for training corpora: ``{input, as, rules?}`` —
    emails, URLs, IPs and phone-number-shaped digit runs are replaced by
    placeholder tokens, in a fixed rule order (emails before URLs before
    digit runs, so one entity is never half-matched by a later rule).
    ``rules`` selects a subset by name.  A chain of native
    ``regexp_replace`` calls: map-only, scales."""
    inp = expression["input"]
    as_field = expression.get("as", "text")
    selected = expression.get("rules")
    rules = [
        (name, rx, tok) for name, (rx, tok) in SCRUB_RULES
        if selected is None or name in selected
    ]
    if selected is not None and len(rules) != len(selected):
        known = [n for n, _ in SCRUB_RULES]
        raise ValueError(f"$scrubText: unknown rule in {selected}; known: {known}")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        col = compile_expr(inp, ExprContext(schema=df.schema))
        for _name, rx, tok in rules:
            col = F.regexp_replace(col, rx, tok)
        return df.withColumn(as_field, col)

    return fn


@register_stage("$datasetSplit")
def dataset_split_stage(expression: Any, ctx: Context) -> StageFn:
    """Deterministic train/val/test assignment:
    ``{id, weights: {name: w, ...}, as, seed}``.

    A document's bucket is the first name whose cumulative weight range
    contains ``md5_long(seed:id) % 1e6`` — reproducible across runs and
    engines (md5 is portable, unlike engine-native hashes), and stable
    under corpus growth: assignment depends only on the row's own id,
    never on other rows.  Map-only — scales trivially."""
    id_expr = expression.get("id", "$_id")
    weights: dict = expression["weights"]
    as_field = expression.get("as", "split")
    seed = int(expression.get("seed", 0))
    if not weights:
        raise ValueError("$datasetSplit needs non-empty weights")
    total = float(sum(weights.values()))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        idc = compile_expr(id_expr, ExprContext(schema=df.schema)).cast("string")
        h = md5_long(idc, seed) % F.lit(1_000_000)
        col = None
        cum = 0.0
        names = list(weights)
        for name in names[:-1]:
            cum += float(weights[name]) / total
            cond = h < F.lit(int(round(cum * 1_000_000)))
            col = F.when(cond, name) if col is None else col.when(cond, name)
        col = names[-1] if col is None else col.otherwise(names[-1])
        return df.withColumn(as_field, F.lit(col) if isinstance(col, str) else col)

    return fn


@register_stage("$packSequences")
def pack_sequences_stage(expression: Any, ctx: Context) -> StageFn:
    """Concatenate-then-chunk layout for LLM pretraining shards:
    ``{tokens, budget, sortBy, as, partitionBy?}``.

    Documents are laid out in ``sortBy`` order and the running token
    offset assigns ``as = floor(offset / budget)`` plus
    ``<as>_offset = offset % budget`` — the standard "concatenate all
    text, cut every N tokens" pretraining pipeline, expressed as ONE
    window cumulative sum.  With ``partitionBy`` the layout is per shard
    (chunk ids repeat per shard — combine (shard, chunk) downstream) and
    the window shuffles once on the shard key: scales.  Without it the
    global order serializes the cumsum to a single partition — the same
    documented caveat as ordered ``$per`` (SCALE.md §5)."""
    tokens_expr = expression["tokens"]
    budget = int(expression["budget"])
    as_field = expression.get("as", "pack")
    part = expression.get("partitionBy")
    sort_by = expression.get("sortBy")
    if budget <= 0:
        raise ValueError("$packSequences needs a positive budget")
    if not sort_by:
        raise ValueError("$packSequences needs sortBy (deterministic layout)")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from pyspark.sql import Window

        ectx = ExprContext(schema=df.schema)
        t = compile_expr(tokens_expr, ectx).cast("long")
        order_cols = [
            F.col(k).asc() if d >= 0 else F.col(k).desc()
            for k, d in sort_by.items()
        ]
        base = (
            Window.partitionBy(compile_expr(part, ectx))
            if part is not None
            else Window
        )
        w = base.orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, -1
        )
        off = F.coalesce(F.sum(t).over(w), F.lit(0))
        tagged = df.withColumn("__off", off)
        return (
            tagged.withColumn(as_field, (F.col("__off") / budget).cast("long"))
            .withColumn(f"{as_field}_offset", F.col("__off") % budget)
            .drop("__off")
        )

    return fn


@register_stage("$sentenceSplit")
def sentence_split_stage(expression: Any, ctx: Context) -> StageFn:
    """Sentence segmentation: ``{input, as, minChars?}`` — splits on
    runs of sentence-ending punctuation (``.!?``) followed by
    whitespace (or end of text), trims, and drops segments shorter than
    ``minChars`` (default 1).  Row-local HOFs, no shuffle; compose with
    ``$unwind {includeArrayIndex}`` for per-sentence rows.  The regex is
    deliberately lookaround-free so the same pattern runs identically in
    any SQL engine (trailing punctuation is consumed, not kept)."""
    inp = expression["input"]
    as_field = expression.get("as", "sentences")
    min_chars = int(expression.get("minChars", 1))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        df = _spread(df)
        text = compile_expr(inp, ExprContext(schema=df.schema))
        return df.withColumn("__ss_t", text).withColumn(
            as_field,
            F.expr(
                "filter(transform(split(`__ss_t`, "
                r"'[.!?]+\\s+|[.!?]+$'), s -> trim(s)), "
                f"s -> length(s) >= {min_chars})"
            ),
        ).drop("__ss_t")

    return fn


@register_stage("$spanDedup")
def span_dedup_stage(expression: Any, ctx: Context) -> StageFn:
    """C4's corpus-wide sentence-span dedup (Raffel et al. 2020 §2.2:
    "we removed any three-sentence span occurring more than once"):
    ``{input, id, as?, span?, minChars?, unit?}`` — sentences split
    with the $sentenceSplit rule, every window of ``span`` (default 3)
    consecutive sentences is matched CORPUS-WIDE (case-insensitive);
    for each duplicated span, the occurrence with the minimum
    (id, position) survives and every other occurrence's sentences are
    removed from their documents.  ``id`` must be unique per row.

    ``unit: "tokens"`` switches the segmentation to whitespace tokens —
    the Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better") exact-substring-dedup analog, where duplicated
    ``span``-token windows (their paper uses 50; the default becomes 50
    in this mode) are removed wherever they recur.  The removal is
    window-granular (whole windows drop), a scalable approximation of
    the paper's suffix-array character spans.

    Adds a struct ``as`` (default "span_dedup"): ``text`` (surviving
    segments joined with single spaces — the rewrite is lossy about
    original punctuation/whitespace, as C4's was), ``n_sentences`` (the
    SEGMENT count — tokens in token mode), ``n_removed``.

    Duplicate spans are identified by xxhash64 of the lowercased span.
    A 64-bit hash collides (birthday bound) with ~50% probability once
    the corpus holds ~5e9 DISTINCT spans — at that scale a collision
    deletes an unrelated span with no verification.  ``verify: true``
    closes that: the ownership groupBy keys on the span STRING itself
    (hash only pre-buckets), so only true duplicates are removed, at
    the cost of shuffling span text instead of 8-byte hashes.

    100 TB shape: spans explode to slim (id, pos, xxhash64) rows —
    O(corpus sentences); ownership is one groupBy(span-hash) with
    partial aggregation (boilerplate spans collapse map-side); removals
    group back by id and join the corpus once (AQE broadcasts when the
    removal set is small).  Never pairwise."""
    inp = expression["input"]
    id_expr = expression["id"]
    as_field = expression.get("as", "span_dedup")
    verify = bool(expression.get("verify", False))
    unit = expression.get("unit", "sentences")
    if unit not in ("sentences", "tokens"):
        raise ValueError("$spanDedup unit must be 'sentences' or 'tokens'")
    if unit == "tokens" and "minChars" in expression:
        # segmentation feeds BOTH window matching and the rewrite, so a
        # token-length floor would silently delete short tokens from
        # every document's text even when nothing is duplicated
        raise ValueError(
            "$spanDedup minChars is a sentence-mode option; token mode "
            "keeps every non-empty token")
    span = int(expression.get("span", 50 if unit == "tokens" else 3))
    min_chars = int(expression.get("minChars", 1))
    if span < 1:
        raise ValueError("$spanDedup span must be >= 1")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _corpus_only

        # corpus-wide ownership needs the whole corpus: a streaming
        # micro-batch would dedup only within itself (and the self-join
        # shape is unsupported on streams anyway)
        _corpus_only("$spanDedup", c)
        ectx = ExprContext(schema=df.schema)
        if unit == "tokens":
            seg = F.filter(
                F.split(F.col("__sd_t"), _WS + "+"),
                lambda s: (s != F.lit("")) & (F.length(s) >= min_chars))
        else:
            seg = F.expr(
                "filter(transform(split(`__sd_t`, "
                r"'[.!?]+\\s+|[.!?]+$'), s -> trim(s)), "
                f"s -> length(s) >= {min_chars})"
            )
        base = (
            df.withColumn("__sd_id", compile_expr(id_expr, ectx))
            .withColumn("__sd_t", compile_expr(inp, ectx))
            .withColumn("__sd_s", seg)
        )
        # slim span occurrences: (id, pos, hash of the lowercased span);
        # verify mode also carries the span string so ownership keys on
        # true equality (a hash collision can't delete an unrelated span)
        span_s = (f"lower(concat_ws(' ', slice(__sd_s, i, {span})))"
                  if verify else "''")
        occ = base.select(
            F.col("__sd_id").alias("__id"),
            F.explode(
                F.expr(
                    f"""IF(size(__sd_s) >= {span},
                       transform(sequence(1, size(__sd_s) - {span} + 1),
                         i -> named_struct(
                            'pos', i,
                            'h', xxhash64(lower(
                                concat_ws(' ', slice(__sd_s, i, {span})))),
                            's', {span_s})),
                       array())"""
                )
            ).alias("__sp"),
        ).select("__id", F.col("__sp.pos").alias("__pos"),
                 F.col("__sp.h").alias("__h"),
                 *([F.col("__sp.s").alias("__s")] if verify else []))
        key = ["__h", "__s"] if verify else ["__h"]
        owners = occ.groupBy(*key).agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct(F.col("__id"), F.col("__pos"))).alias("__own"),
        )
        # non-canonical occurrences of duplicated spans -> removed
        # sentence indices per doc
        removed = (
            occ.join(owners, key)
            .filter(
                (F.col("__n") > 1)
                & ~F.struct(F.col("__id"), F.col("__pos"))
                .eqNullSafe(F.col("__own"))
            )
            .select(
                "__id",
                F.explode(
                    F.sequence(F.col("__pos"),
                               F.col("__pos") + F.lit(span - 1))
                ).alias("__ri"),
            )
            .groupBy("__id")
            .agg(F.array_sort(F.collect_set("__ri")).alias("__removed"))
        )
        out = base.join(removed, base["__sd_id"] == removed["__id"], "left")
        keep = F.filter(
            F.col("__sd_s"),
            lambda s, i: F.col("__removed").isNull()
            | ~F.array_contains(F.col("__removed"), i + 1),
        )
        st = F.struct(
            F.concat_ws(" ", keep).alias("text"),
            F.coalesce(F.size("__sd_s"), F.lit(0)).cast("int")
            .alias("n_sentences"),
            F.coalesce(F.size("__removed"), F.lit(0)).cast("int")
            .alias("n_removed"),
        )
        return out.withColumn(as_field, st).drop(
            "__sd_id", "__sd_t", "__sd_s", "__id", "__removed"
        )

    return fn


@register_stage("$winnow")
def winnow_stage(expression: Any, ctx: Context) -> StageFn:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003 — the MOSS algorithm): ``{input, as?, k?, window?}`` — the text
    normalizes (lowercase, non-[a-z0-9] stripped), every char k-gram
    (k default 5) hashes with the same md5-derived 60-bit hash as the
    dedup family (bit-identical in DuckDB — oracle-able), a window of
    ``window`` consecutive hashes (default 4) slides selecting each
    window's minimum, and the DISTINCT selected hashes emit sorted as an
    array<long>.  Value-set semantics make the paper's rightmost-tie
    rule irrelevant.  Guarantee: any shared substring of length >=
    window + k - 1 between two documents yields at least one shared
    fingerprint — position-robust local fingerprints for
    plagiarism/near-dup detection, pair via ``$crossDedup``-style band
    joins or array intersection.  Fewer than ``window`` k-grams winnow
    to the single global minimum; shorter than ``k`` to an empty array.
    100 TB shape: pure row-local HOFs, zero shuffle, no Python."""
    inp = expression["input"]
    as_field = expression.get("as", "fingerprints")
    k = int(expression.get("k", 5))
    w = int(expression.get("window", 4))
    if k < 1 or w < 1:
        raise ValueError("$winnow needs k >= 1 and window >= 1")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        text = compile_expr(inp, ExprContext(schema=df.schema))
        out = df.withColumn(
            "__wn_t",
            F.regexp_replace(F.lower(text), "[^a-z0-9]", ""),
        )
        out = out.withColumn(
            "__wn_h",
            F.expr(
                f"""IF(length(__wn_t) >= {k},
                   transform(sequence(1, length(__wn_t) - {k} + 1),
                     i -> cast(conv(substr(md5(concat('7:',
                            substr(__wn_t, i, {k}))), 1, 15), 16, 10)
                          as bigint)),
                   array())"""
            ),
        )
        fps = F.expr(
            f"""CASE
               WHEN size(__wn_h) = 0 THEN array()
               WHEN size(__wn_h) < {w}
                 THEN array(array_min(__wn_h))
               ELSE array_sort(array_distinct(
                 transform(sequence(1, size(__wn_h) - {w} + 1),
                   j -> array_min(slice(__wn_h, j, {w})))))
               END"""
        )
        return out.withColumn(as_field, fps).drop("__wn_t", "__wn_h")

    return fn


@register_stage("$charLmScore")
def char_lm_score_stage(expression: Any, ctx: Context) -> StageFn:
    """Corpus-trained character-bigram cross-entropy: ``{input, as}`` —
    appends bits-per-character under a Laplace-smoothed char-bigram
    model fit on the SAME corpus.  The perplexity-style quality signal
    without a neural LM: gibberish, encoding junk, and wrong-language
    text score high; fluent text scores low.  Null for docs shorter
    than two characters.

    bits = −mean log2 (c(ab)+1) / (c(a)+V) over the doc's bigrams,
    where c(ab)/c(a) are corpus bigram/prefix counts and V the corpus
    character vocabulary size.

    Corpus-scale plan: bigrams come from row-local substr explodes; the
    two count tables partial-aggregate to character-vocabulary size
    (≤ |charset|²) and BROADCAST back to the scoring join; the per-doc
    mean rides one doc-keyed shuffle.  Join keys are substr slices in
    both engines, so the DuckDB oracle is exact.
    """
    inp = expression["input"]
    as_field = expression.get("as", "bits_per_char")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        df = _spread(df)
        text = compile_expr(inp, ExprContext(schema=df.schema))
        lowered = F.lower(text)
        # positions 1..len-1: bigram substr(i,2); its conditioning
        # prefix is substr(i,1)
        # sequence(1, 0) DESCENDS in Spark — gate short strings to an
        # explicit empty array
        bi_arr = F.expr(
            "if(length(`__lm_t`) < 2, array(), "
            "transform(sequence(1, length(`__lm_t`) - 1), "
            "i -> substring(`__lm_t`, i, 2)))"
        )
        uni_arr = F.expr(
            "if(length(`__lm_t`) < 1, array(), "
            "transform(sequence(1, length(`__lm_t`)), "
            "i -> substring(`__lm_t`, i, 1)))"
        )
        base = df.withColumn("__lm_t", lowered)
        corpus_bi = (
            base.select(F.explode(bi_arr).alias("__bg"))
            .groupBy("__bg")
            .agg(F.count(F.lit(1)).cast("double").alias("__cab"))
        )
        corpus_uni = (
            base.select(
                F.explode(
                    F.expr(
                        "if(length(`__lm_t`) < 2, array(), "
                        "transform(sequence(1, length(`__lm_t`) - 1), "
                        "i -> substring(`__lm_t`, i, 1)))"
                    )
                ).alias("__pre")
            )
            .groupBy("__pre")
            .agg(F.count(F.lit(1)).cast("double").alias("__ca"))
        )
        vocab = base.select(F.explode(uni_arr).alias("__ch")).agg(
            F.countDistinct("__ch").cast("double").alias("__v")
        )
        key = F.xxhash64(F.col("__lm_t"))
        doc_bi = base.withColumn("__did", key).select(
            "__did", F.explode(bi_arr).alias("__bg")
        ).withColumn("__pre", F.substring("__bg", 1, 1))
        scored = (
            doc_bi.join(F.broadcast(corpus_bi), "__bg")
            .join(F.broadcast(corpus_uni), "__pre")
            .crossJoin(F.broadcast(vocab))
            .groupBy("__did")
            .agg(
                F.avg(
                    -F.log2(
                        (F.col("__cab") + 1.0)
                        / (F.col("__ca") + F.col("__v"))
                    )
                ).alias("__bits")
            )
        )
        # doc-keyed equi-join (scored is corpus-cardinality — never
        # broadcast); AQE picks the strategy
        out = base.withColumn("__did", key).join(scored, "__did", "left")
        # half-up at 9 digits (the SQL-oracle convention)
        return out.withColumn(
            as_field,
            F.floor(F.col("__bits") * 1e9 + F.lit(0.5)).cast("double")
            / F.lit(1e9),
        ).drop("__lm_t", "__did", "__bits")

    return fn


@register_stage("$quantileBin")
def quantile_bin_stage(expression: Any, ctx: Context) -> StageFn:
    """Equal-frequency bin labels: ``{input, bins, as, exact?,
    accuracy?}`` — appends a 1-based bin index (decile/percentile
    bucketing for feature engineering and stratified reporting).

    Two physical modes:
    - default (scale path): bin BOUNDARIES come from one
      ``percentile_approx`` aggregate (Greenwald-Khanna sketch,
      driver-sized result), and the bin index is a row-local literal
      CASE chain — no global sort, no extra shuffle beyond the single
      aggregate.  Bin populations are approximately equal (sketch
      ``accuracy``, default 10000).
    - ``exact: true``: Spark ``ntile`` over a global order — exactly
      equal counts, but a single-partition sort; test/small-data only
      (same stance as $bucketAuto's ntile).
    """
    inp = expression["input"]
    bins = int(expression["bins"])
    as_field = expression.get("as", "bin")
    exact = bool(expression.get("exact", False))
    accuracy = int(expression.get("accuracy", 10000))
    tie_break = expression.get("tieBreak")
    if bins < 2:
        raise ValueError("$quantileBin needs bins >= 2")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from pyspark.sql import Window

        sctx = ExprContext(schema=df.schema)
        value = compile_expr(inp, sctx).cast("double")
        if exact:
            # ntile on ties is order-dependent; an explicit tieBreak key
            # makes the assignment fully deterministic
            keys = [value] + (
                [compile_expr(tie_break, sctx)] if tie_break else []
            )
            w = Window.orderBy(*keys)
            return df.withColumn(as_field, F.ntile(bins).over(w))
        ps = [i / bins for i in range(1, bins)]
        row = df.select(
            F.percentile_approx(
                value, F.array(*[F.lit(p) for p in ps]), F.lit(accuracy)
            ).alias("__qb")
        ).collect()[0]["__qb"]
        bounds = list(row) if row is not None else []
        idx = F.lit(bins)
        for i in range(len(bounds) - 1, -1, -1):
            idx = F.when(value <= F.lit(float(bounds[i])),
                         F.lit(i + 1)).otherwise(idx)
        return df.withColumn(as_field, F.when(value.isNotNull(), idx))

    return fn


@register_stage("$fingerprint")
def fingerprint_stage(expression: Any, ctx: Context) -> StageFn:
    """Normalized content fingerprint: ``{input, as}`` = md5 of
    lowercase/whitespace-collapsed/punctuation-stripped text — the standard
    near-exact-dup key (casing/spacing-invariant)."""
    inp = expression["input"]
    as_field = expression.get("as", "fingerprint")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        df = _spread(df)
        text = compile_expr(inp, ExprContext(schema=df.schema))
        norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(text),
                                                        "[^a-z0-9\\s]", ""), "\\s+", " "))
        return df.withColumn(as_field, F.md5(norm))

    return fn


# ------------------------------------------------------------- multimodal


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("content", T.BinaryType()),    # opaque encoded bytes
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)
"""Canonical multimodal column bundle: media as opaque binary + typed
metadata.  Partitioning guidance: bucket by media_id; keep `content` out of
every projection until the decode stage (column pruning keeps scans thin)."""


@register_stage("$decodeMedia")
def decode_media_stage(expression: Any, ctx: Context) -> StageFn:
    """Decode/feature-extract media bytes: ``{input, kind, as, op}``.

    The Spark plumbing (schema, Arrow batching, partition-local decode) is
    real; the codec itself is a deterministic stub (this container has no
    image/audio libraries).  ``op``: ``meta`` (byte stats) | ``resize`` |
    ``frame_sample`` — each returns a typed feature struct.
    """
    inp = expression["input"]
    as_field = expression.get("as", "features")
    op = expression.get("op", "meta")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        out_schema = T.StructType(
            list(df.schema.fields)
            + [
                T.StructField(
                    as_field,
                    T.StructType(
                        [
                            T.StructField("n_bytes", T.LongType()),
                            T.StructField("checksum", T.StringType()),
                            T.StructField("op", T.StringType()),
                        ]
                    ),
                )
            ]
        )
        col_name = inp[1:] if isinstance(inp, str) and inp.startswith("$") else inp

        def decode(batches: Iterator) -> Iterator:
            import hashlib

            for pdf in batches:
                feats = []
                for v in pdf[col_name]:
                    if v is None:
                        feats.append(None)
                        continue
                    raw = bytes(v)
                    # -- codec boundary: real decoders (PIL/ffmpeg) plug in
                    # here; deterministic stub keeps the pipeline testable
                    feats.append(
                        {
                            "n_bytes": len(raw),
                            "checksum": hashlib.md5(raw).hexdigest(),
                            "op": op,
                        }
                    )
                yield pdf.assign(**{as_field: feats})

        return df.mapInPandas(decode, out_schema)

    return fn


@register_stage("$frameSample")
def frame_sample_stage(expression: Any, ctx: Context) -> StageFn:
    """Sample fixed-size byte windows ("frames") from a binary column:
    ``{input, frameSize, stride, as}`` -> ``array<struct<idx, data>>``.

    The framing is pure JVM column algebra (sequence + transform + substr)
    — zero Python, pipelines with the scan.  A real container-format
    demuxer (mp4/mkv) would replace the byte-window step behind the same
    schema via mapInPandas (the $decodeMedia codec boundary); the
    partitioning/batch plumbing is identical.
    """
    inp = expression["input"]
    frame_size = int(expression["frameSize"])
    stride = int(expression.get("stride", frame_size))
    as_field = expression.get("as", "frames")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        data = compile_expr(inp, ExprContext(schema=df.schema))
        n = F.octet_length(data)
        count = F.when(
            n >= frame_size, F.floor((n - frame_size) / stride) + 1
        ).otherwise(F.lit(0))
        frames = F.transform(
            F.sequence(F.lit(0), count.cast("long") - 1),
            lambda i: F.struct(
                i.cast("long").alias("idx"),
                F.substr(data, (i * stride + 1).cast("int"), F.lit(frame_size)).alias(
                    "data"
                ),
            ),
        )
        return df.withColumn(
            as_field, F.when(count > 0, frames).otherwise(F.array().cast(
                "array<struct<idx:bigint,data:binary>>"))
        )

    return fn


@register_stage("$stratifiedSample")
def stratified_sample_stage(expression: Any, ctx: Context) -> StageFn:
    """Deterministic per-stratum sampling for training-mix construction:
    ``{by: <expr>, fractions: {value: fraction, ...} | fraction,
    seed?, default?}``.

    Each row keeps iff ``md5_long(seed:key) % 10^6 < fraction * 10^6`` —
    a pure map-side filter (no shuffle, no RNG state), reproducible
    across engines and stable under retries/recomputation, unlike
    ``df.sample``.  ``by`` is the stratum label; with a scalar
    ``fractions`` every stratum uses the same rate.  Keying the hash on
    the DOCUMENT key (pass ``key: <expr>``, default ``$_id``) keeps the
    decision per-document, not per-stratum."""
    by = expression["by"]
    fractions = expression["fractions"]
    seed = int(expression.get("seed", 0))
    key = expression.get("key", "$_id")
    default = float(expression.get("default", 0.0))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        ectx = ExprContext(schema=df.schema)
        # a null key must not silently drop the row (null < thresh is
        # null -> filtered): null-keyed rows hash as "" — one shared,
        # deterministic decision per stratum; give documents a real
        # unique key for per-document decisions
        key_str = F.coalesce(
            compile_expr(key, ectx).cast("string"), F.lit(""))
        h = F.pmod(md5_long(key_str, seed), F.lit(1_000_000))
        if isinstance(fractions, dict):
            stratum = compile_expr(by, ectx).cast("string")
            thresh: Column = F.lit(int(default * 1_000_000))
            for value, frac in fractions.items():
                thresh = F.when(
                    stratum == str(value), F.lit(int(float(frac) * 1_000_000))
                ).otherwise(thresh)
        else:
            thresh = F.lit(int(float(fractions) * 1_000_000))
        return df.filter(h < thresh)

    return fn


@register_stage("$chunkText")
def chunk_text_stage(expression: Any, ctx: Context) -> StageFn:
    """Split a text column into overlapping WORD-window chunks (training
    context windows / RAG passages): ``{input, size, overlap?, as}`` ->
    ``array<struct<idx, text, n_words>>``.

    Pure HOF column algebra (split -> sequence -> slice -> join): row-
    local, zero shuffle, pipelines with the scan.  The last chunk may be
    short; a document shorter than ``size`` yields one chunk.

    Null semantics, IDENTICAL across units (advisor r8 — they used to
    diverge): null text -> null; a non-null document with no units ->
    ``[]`` (unit "words": empty or whitespace-only — words are the
    eval-family split, Java ``\\s`` with empties dropped, so
    whitespace-only docs no longer yield phantom empty-string chunks;
    unit "tokens": empty only — whitespace is real bytes and
    tokenizes).

    r7: ``unit: "tokens"`` + ``tokenizer: {merges}`` chunks by REAL BPE
    token windows — what a context window actually measures — emitting
    ``array<struct<idx, text, n_tokens>>`` where each chunk's text is
    the EXACT substring of the document its tokens cover (byte-offset
    slice — whitespace intact; a window edge inside a multi-byte
    codepoint keeps the longest whole-character substring).  Same
    Arrow-batched tokenizer boundary as ``$truncateTokens``: merge
    table broadcast once per executor, row-local, zero shuffle."""
    inp = expression["input"]
    size = int(expression["size"])
    overlap = int(expression.get("overlap", 0))
    as_field = expression.get("as", "chunks")
    unit = {"token": "tokens", "word": "words"}.get(
        expression.get("unit", "words"), expression.get("unit", "words"))
    tokenizer = expression.get("tokenizer")
    if unit not in ("words", "tokens"):
        raise ValueError(f"$chunkText unit must be words|tokens, got {unit}")
    if unit == "tokens" and (tokenizer is None or "merges" not in tokenizer):
        raise ValueError(
            "$chunkText unit 'tokens' needs tokenizer: {merges: ...}")
    if unit == "words" and tokenizer is not None:
        raise ValueError("$chunkText tokenizer applies to unit 'tokens'")
    if not 0 <= overlap < size:
        raise ValueError("$chunkText needs 0 <= overlap < size")
    stride = size - overlap

    def fn(df: DataFrame, c: Context) -> DataFrame:
        text = compile_expr(inp, ExprContext(schema=df.schema))
        if unit == "tokens":
            from . import bpe as _bpe

            _bpe.ship()
            bc = _bpe.broadcast_tokenizer(c, tokenizer["merges"])
            chunker = _bpe.chunk_tokens

            cache: dict = {}  # per-task word memo, see $tokenCount

            @F.pandas_udf(
                "array<struct<idx:bigint,text:string,n_tokens:bigint>>")
            def _chunks(s: pd.Series) -> pd.Series:
                _bpe.trim_memo(cache)
                rk, _ = bc.value
                return s.map(
                    lambda t: chunker(t, size, stride, rk, cache))

            return df.withColumn(as_field, _chunks(text))
        words = _eval_words(text)
        n = F.size(words)
        # chunk starts: 0, stride, 2*stride, ...; the last window reaches
        # the end (ceil), with no redundant tail chunk once covered; docs
        # shorter than the overlap still yield their single chunk
        n_chunks = F.when(
            n > 0,
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil((n - F.lit(overlap)) / F.lit(stride)),
            ),
        ).otherwise(F.lit(0)).cast("int")
        chunks = F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("long").alias("idx"),
                F.array_join(
                    F.slice(words, i * stride + 1, size), " "
                ).alias("text"),
                F.least(F.lit(size), n - i * stride).cast("long")
                .alias("n_words"),
            ),
        )
        chunk_t = "array<struct<idx:bigint,text:string,n_words:bigint>>"
        return df.withColumn(
            as_field,
            F.when(text.isNull(), F.lit(None).cast(chunk_t))
            .when(n_chunks > 0, chunks)
            .otherwise(F.array().cast(chunk_t)),
        )

    return fn


@register_stage("$dsirScore")
def dsir_score_stage(expression: Any, ctx: Context) -> StageFn:
    """DSIR importance weighting (Xie et al. 2023, arXiv:2302.03169):
    ``{input, id, from, targetInput?, sourceFrom?, sourceInput?, n?,
    buckets?, smoothing?, as?}`` — scores every input document by how
    much more likely its hashed n-gram bag is under a TARGET corpus'
    unigram-feature model than under the source corpus' model:

        score(x) = Σ_{g ∈ ngrams(x)} ln p_target(bucket(g))
                                   − ln p_source(bucket(g))

    Features are word n-grams for every size 1..``n`` (default 2 —
    the paper's unigram+bigram bag), hashed into ``buckets`` (default
    10000) via the engine's md5 bucket hash (oracle-reproducible);
    probabilities are Laplace-smoothed (``smoothing``, default 1.0):
    p[b] = (count_b + α) / (total + α·buckets).  Select with a
    downstream ``$match``/``$quantileBin`` on the score (the paper adds
    Gumbel noise for sampling — compose ``$stratifiedSample`` for
    that).  Scores round half-up at 6 digits.

    By default the SOURCE model fits on the input corpus itself, which
    needs the whole corpus — batch only.  r6: ``sourceFrom`` names a
    collection to fit the source model on instead (``sourceInput``
    defaults to ``input``'s expression) — the PRE-TRAINED-model mode:
    both models are static, per-document scoring is row-pure, and the
    stage runs under Structured Streaming (per-message scores identical
    regardless of micro-batch boundaries).

    100 TB shape: both corpus models are one explode + partial-aggregated
    ``groupBy(bucket)`` — at most ``buckets`` rows survive each shuffle,
    independent of corpus size; totals are single-row broadcast
    aggregates; the per-bucket log-ratio table is buckets-sized (AQE
    broadcasts it into the feature join); per-doc summation rides one
    shuffle on ``id``.  No driver collect, no pairwise work, no Python.
    """
    inp = expression["input"]
    id_field = expression["id"]
    from_coll = expression["from"]
    target_input = expression.get("targetInput", inp)
    source_from = expression.get("sourceFrom")
    source_input = expression.get("sourceInput", inp)
    n = int(expression.get("n", 2))
    buckets = int(expression.get("buckets", 10_000))
    alpha = float(expression.get("smoothing", 1.0))
    as_field = expression.get("as", "dsir_score")
    if n < 1 or buckets < 1 or alpha <= 0:
        raise ValueError(
            "$dsirScore needs n >= 1, buckets >= 1 and smoothing > 0")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        if source_from is None:
            from ..operators.extended import _corpus_only

            _corpus_only("$dsirScore", c)
        tgt = c.collection(from_coll)

        def feats(col: Column) -> Column:
            """All word n-grams of sizes 1..n as a BAG (not distinct),
            hashed to bucket ids — row-local HOFs only.  The explicit
            whitespace class keeps tokenization identical to the RE2
            oracle (Java \\s vs RE2 \\s differ on vertical tab)."""
            words = F.filter(F.split(F.lower(col), _WS + "+"),
                             lambda w: w != F.lit(""))
            def gram_hasher(size):
                # closure binding, NOT a default arg — `lambda i, s=size:`
                # would change the lambda's arity and make pyspark pass
                # the array index as the second argument (same trap as
                # _seeded_hasher)
                def g(i: Column) -> Column:
                    return F.pmod(
                        md5_long(
                            F.array_join(F.slice(words, i + 1, size), " "),
                            0),
                        F.lit(buckets))

                return g

            parts = []
            for size in range(1, n + 1):
                k = F.size(words) - F.lit(size - 1)
                idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
                    F.array().cast("array<int>"))
                parts.append(F.transform(idx, gram_hasher(size)))
            return F.concat(*parts) if len(parts) > 1 else parts[0]

        src_expr = compile_expr(inp, ExprContext(schema=df.schema))
        tgt_expr = compile_expr(target_input, ExprContext(schema=tgt.schema))
        src_feats = df.select(
            F.col(id_field).alias("__did"),
            F.explode(feats(src_expr)).alias("__b"))
        tgt_feats = tgt.select(F.explode(feats(tgt_expr)).alias("__b"))
        if source_from is not None:
            # pre-trained source model from a static collection — the
            # input corpus only provides the documents being scored
            src_coll = c.collection(source_from)
            src_model_expr = compile_expr(
                source_input, ExprContext(schema=src_coll.schema))
            model_feats = src_coll.select(
                F.explode(feats(src_model_expr)).alias("__b"))
        else:
            model_feats = src_feats
        src_counts = model_feats.groupBy("__b").agg(
            F.count(F.lit(1)).alias("__cs"))
        tgt_counts = tgt_feats.groupBy("__b").agg(
            F.count(F.lit(1)).alias("__ct"))
        # totals derive from the already-aggregated bucket tables — a
        # count over tgt_feats would re-run the whole feature explode
        src_tot = src_counts.agg(F.sum("__cs").alias("__ts"))
        tgt_tot = tgt_counts.agg(F.sum("__ct").alias("__tt"))
        a = F.lit(alpha)
        ab = F.lit(alpha * buckets)
        # full_outer + coalesced counts: in sourceFrom mode a document
        # bucket may be absent from either model and must score its
        # Laplace default, not silently drop (in the default fit-on-input
        # mode every document bucket is in src_counts, so this is the
        # same table plus never-joined target-only rows)
        ratios = (
            src_counts.join(tgt_counts, "__b", "full_outer")
            .crossJoin(F.broadcast(src_tot))
            .crossJoin(F.broadcast(tgt_tot))
            .select(
                "__b",
                (F.log((F.coalesce(F.col("__ct"), F.lit(0)) + a)
                       / (F.coalesce(F.col("__tt"), F.lit(0)) + ab))
                 - F.log((F.coalesce(F.col("__cs"), F.lit(0)) + a)
                         / (F.coalesce(F.col("__ts"), F.lit(0)) + ab))
                 ).alias("__lr"),
            )
        )
        scores = (
            src_feats.join(ratios, "__b", "left")
            .crossJoin(F.broadcast(src_tot))
            .crossJoin(F.broadcast(tgt_tot))
            .withColumn(
                "__lr1",
                F.coalesce(
                    F.col("__lr"),
                    F.log(a / (F.coalesce(F.col("__tt"), F.lit(0)) + ab))
                    - F.log(a / (F.coalesce(F.col("__ts"), F.lit(0))
                                 + ab))))
            .groupBy("__did")
            .agg(F.sum("__lr1").alias("__raw"))
        )
        return (
            df.join(scores, df[id_field] == scores["__did"], "left")
            .withColumn(as_field,
                        _half_up6(F.coalesce(F.col("__raw"), F.lit(0.0))))
            .drop("__did", "__raw")
        )

    return fn


@register_stage("$mmr")
def mmr_stage(expression: Any, ctx: Context) -> StageFn:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): ``{score, input, id, by?, k?, lambda?, as?}`` — per group
    (``by``, e.g. the query id; omitted = one global group) greedily
    select ``k`` candidates, each step taking the argmax of

        lambda * score  -  (1 - lambda) * max cosine-sim to selected

    — the classic diversified top-k for retrieval/sampling: high
    ``lambda`` favors relevance, low favors diversity.  Emits ONLY the
    selected rows, with their 1-based selection rank in ``as`` (default
    ``mmr_rank``; an existing column of that name is replaced).
    Deterministic: candidates order by ``id``, the MMR value and the
    pairwise similarities round half-up at 9 digits, and value ties
    pick the smaller id — so the whole greedy iteration is
    DuckDB-oracle-able (unrolled like $kmeans).  Rows with a null or
    NaN score, or a null embedding/id, are not candidates.  ``id``
    should be unique within its group: duplicated ids collapse to the
    highest-scoring candidate before selection (so a rank is assigned
    at most once per id), and every source row carrying a selected id
    is emitted with that rank.

    Scale: one ``groupBy(by).collect_list`` shuffle — holistic, the
    group must hold ONE QUERY'S candidate set (top-N sized, e.g. the
    output of $annTopK/$knnJoin/$bm25; thousands, not corpus-scale);
    selection is a row-local k-step fold carrying a running max-sim per
    candidate (O(k·n·dim) per group); the rank joins back on
    (group, id).  No driver collect, no cartesian.
    """
    score_e = expression["score"]
    inp = expression["input"]
    id_field = expression["id"]
    by = expression.get("by")
    k = int(expression.get("k", 10))
    lam = float(expression.get("lambda", 0.5))
    as_field = expression.get("as", "mmr_rank")
    if k < 1:
        raise ValueError("$mmr needs k >= 1")
    if not 0.0 <= lam <= 1.0:
        raise ValueError("$mmr lambda must be in [0, 1]")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _batch_only

        _batch_only("$mmr", c)
        ectx = ExprContext(schema=df.schema)
        emb = compile_expr(inp, ectx).cast("array<double>")
        score = compile_expr(score_e, ectx).cast("double")
        gexpr = (compile_expr(by, ectx) if by is not None else F.lit(0))
        pts = df.select(
            gexpr.alias("__g"),
            F.col(id_field).alias("__i"),
            score.alias("__s"),
            _unit_vector(emb).alias("__e"),
        ).filter(F.col("__i").isNotNull() & F.col("__s").isNotNull()
                 & ~F.isnan(F.col("__s")) & F.col("__e").isNotNull())
        # candidates sort by id (struct field order), so position-order
        # argmax ties resolve to the smaller id on every engine/run
        sorted_cands = F.sort_array(F.collect_list(
            F.struct(F.col("__i").alias("i"), F.col("__s").alias("s"),
                     F.col("__e").alias("e"))))
        # duplicated ids collapse to their LAST (= highest (s, e))
        # sorted entry, so a rank is assigned at most once per id
        grouped = pts.groupBy("__g").agg(
            F.filter(
                sorted_cands,
                lambda c, i: (i == F.size(sorted_cands) - 1)
                | (F.element_at(sorted_cands, i + 2).getField("i")
                   != c.getField("i")),
            ).alias("__c"))
        cands = F.col("__c")
        neg = F.lit(-1e300)

        # the fold state carries (picks, per-candidate running max-sim to
        # the picked set) so each step dots every candidate against ONLY
        # the newly picked vector — O(k·n·dim) total, not O(k²·n·dim).
        # The running max of per-pair ROUNDED sims equals the max over
        # all rounded sims, so results are bit-identical to the naive
        # recompute (and to the unrolled oracle).
        init = F.struct(
            F.array().cast("array<int>").alias("picks"),
            F.transform(cands, lambda c: F.lit(float("-inf"))).alias("ms"),
        )

        def step(acc: Column, _n: Column) -> Column:
            picks = acc.getField("picks")
            ms = acc.getField("ms")
            vals = F.transform(
                cands,
                lambda cand, i: F.when(F.array_contains(picks, i), neg)
                .otherwise(_round9_col(
                    F.lit(lam) * cand.getField("s")
                    - F.lit(1.0 - lam) * F.when(
                        F.size(picks) > 0, F.element_at(ms, i + 1)
                    ).otherwise(F.lit(0.0)))),
            )
            pick = (F.array_position(vals, F.array_max(vals)) - 1).cast("int")
            picked_e = F.element_at(cands, pick + 1).getField("e")
            new_ms = F.zip_with(
                cands, ms,
                lambda cand, m: F.greatest(
                    m, _round9_col(_pair_dot(cand.getField("e"), picked_e))),
            )
            done = F.size(picks) >= F.size(cands)
            return F.struct(
                F.when(done, picks)
                .otherwise(F.concat(picks, F.array(pick))).alias("picks"),
                F.when(done, ms).otherwise(new_ms).alias("ms"),
            )

        sel = F.aggregate(
            F.sequence(F.lit(1), F.lit(k)), init, step,
        ).getField("picks")
        ranked = grouped.select(
            "__g",
            F.explode(F.transform(
                sel,
                lambda p, r: F.struct(
                    F.element_at(cands, p + 1).getField("i").alias("i"),
                    (r + 1).cast("int").alias("r")))).alias("__x"),
        ).select(F.col("__g").alias("__mg"),
                 F.col("__x.i").alias("__mi"),
                 F.col("__x.r").alias("__mr"))
        return (
            df.join(
                ranked,
                gexpr.eqNullSafe(F.col("__mg"))
                & (F.col(id_field) == F.col("__mi")))
            .withColumn(as_field, F.col("__mr"))
            .drop("__mg", "__mi", "__mr")
        )

    return fn


@register_stage("$rankEval")
def rank_eval_stage(expression: Any, ctx: Context) -> StageFn:
    """Ranking-quality evaluation over (group, rank, gain) triples:
    ``{by, rank, gain, k?, dcg?}`` — one output row per group (query):

    - ``_id`` — the group key
    - ``ndcg`` — nDCG@k: DCG over ranks ≤ k divided by the ideal DCG of
      the group's top-k gains; ``dcg: "linear"`` (default,
      gain/log2(rank+1)) or ``"exp"`` ((2^gain − 1)/log2(rank+1))
    - ``precision`` / ``recall`` — relevant (gain > 0) in the top k
      over k / over all relevant (recall null when nothing is relevant)
    - ``ap`` — average precision@k: Σ over relevant ranks r ≤ k of
      precision@r, normalized by min(k, total relevant) — the per-query
      term of MAP (null when nothing is relevant)
    - ``mrr`` — 1 / first relevant rank (null when nothing is relevant)
    - ``n_relevant`` — total relevant items in the group

    ``rank`` is the 1-based position your ranker assigned (e.g. a
    ``$documentNumber`` window or $annTopK's ``rank``); doubles round
    half-up at 6 digits.  Scale: ONE partial-aggregated groupBy — the
    ideal-DCG term collects the group's gains (a query's result list,
    top-N sized), everything else is algebraic.  No joins, no driver
    collect."""
    by = expression["by"]
    rank_e = expression["rank"]
    gain_e = expression["gain"]
    k = int(expression.get("k", 10))
    dcg_mode = expression.get("dcg", "linear")
    if k < 1:
        raise ValueError("$rankEval needs k >= 1")
    if dcg_mode not in ("linear", "exp"):
        raise ValueError("$rankEval dcg must be 'linear' or 'exp'")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _batch_only

        _batch_only("$rankEval", c)
        ectx = ExprContext(schema=df.schema)
        g = compile_expr(by, ectx)
        rank = compile_expr(rank_e, ectx).cast("double")
        gain = compile_expr(gain_e, ectx).cast("double")
        if dcg_mode == "exp":
            gain = F.pow(F.lit(2.0), gain) - F.lit(1.0)
        rel = gain > 0
        dcg = F.sum(F.when(rank <= k, gain / F.log2(rank + 1))
                    .otherwise(F.lit(0.0)))
        # ideal DCG: the group's top-k gains in descending order
        gains = F.reverse(F.array_sort(F.collect_list(gain)))
        idcg = F.aggregate(
            F.zip_with(
                F.slice(gains, 1, k),
                F.sequence(F.lit(1), F.least(F.size(gains), F.lit(k))),
                lambda gn, i: gn / F.log2(i.cast("double") + 1.0)),
            F.lit(0.0), lambda acc, v: acc + v)
        hits = F.sum(F.when(rel & (rank <= k), 1).otherwise(0))
        n_rel = F.sum(F.when(rel, 1).otherwise(0))
        first_rel = F.min(F.when(rel, rank))
        # average precision: fold the rank-sorted (rank, rel) pairs,
        # accumulating precision@r at each relevant r <= k
        pairs = F.sort_array(F.collect_list(F.struct(
            rank.alias("r"),
            F.when(rel, 1.0).otherwise(0.0).alias("v"))))
        ap_sum = F.aggregate(
            pairs,
            F.struct(F.lit(0.0).alias("cnt"), F.lit(0.0).alias("ap")),
            lambda acc, p: F.struct(
                (acc.getField("cnt") + p.getField("v")).alias("cnt"),
                (acc.getField("ap") + F.when(
                    (p.getField("v") > 0) & (p.getField("r") <= k),
                    (acc.getField("cnt") + p.getField("v"))
                    / p.getField("r")).otherwise(F.lit(0.0))).alias("ap"),
            ),
            lambda acc: acc.getField("ap"))
        out = df.groupBy(g.alias("_id")).agg(
            _half_up6(F.when(idcg > 0, dcg / idcg)
                      .otherwise(F.lit(0.0))).alias("ndcg"),
            _half_up6(hits.cast("double") / F.lit(float(k))
                      ).alias("precision"),
            _half_up6(F.when(n_rel > 0, hits.cast("double") / n_rel)
                      ).alias("recall"),
            _half_up6(F.when(
                n_rel > 0,
                ap_sum / F.least(F.lit(float(k)), n_rel.cast("double")))
            ).alias("ap"),
            _half_up6(F.lit(1.0) / first_rel).alias("mrr"),
            n_rel.cast("long").alias("n_relevant"),
        )
        return out

    return fn


@register_stage("$decontaminate")
def decontaminate_stage(expression: Any, ctx: Context) -> StageFn:
    """Training-corpus decontamination against a reference set (e.g. an
    eval benchmark): ``{input, against: <collection>, againstField,
    shingle?, minOverlap?, as?, mode?}``.

    Both sides reduce to distinct word-``shingle`` n-gram hash sets; the
    reference side's DISTINCT shingle hashes broadcast (benchmarks are
    dimension-sized next to a training corpus); each document counts its
    overlapping shingles with one row-local array intersection against
    the broadcast set — no shuffle of the corpus.  ``mode``: ``flag``
    (default — adds ``as`` with the overlap count), ``drop`` (removes
    contaminated docs: overlap >= minOverlap), ``keep`` (keeps only
    contaminated docs, for auditing).  100 TB path: the broadcast is
    gated by the same limit as $lookup; beyond it, pre-join on a bucket
    of the shingle hash instead."""
    inp = expression["input"]
    against = expression["against"]
    against_field = expression.get("againstField", "text")
    shingle = int(expression.get("shingle", 8))
    min_overlap = int(expression.get("minOverlap", 1))
    as_field = expression.get("as", "contamination")
    mode = expression.get("mode", "flag")
    if mode not in ("flag", "drop", "keep"):
        raise ValueError("$decontaminate mode must be flag|drop|keep")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        ref = c.collection(against)
        ref_hashes = (
            ref.select(
                F.explode(
                    word_shingles(F.col(against_field), shingle)
                ).alias("__s")
            )
            .select(md5_long(F.col("__s"), 0).alias("__h"))
            .distinct()
            .agg(F.collect_list("__h").alias("__ref"))
        )
        text = compile_expr(inp, ExprContext(schema=df.schema))
        doc_hashes = F.transform(
            word_shingles(text, shingle), _seeded_hasher(0)
        )
        tagged = df.crossJoin(F.broadcast(ref_hashes)).withColumn(
            as_field,
            F.size(F.array_intersect(doc_hashes, F.col("__ref"))),
        ).drop("__ref")
        if mode == "drop":
            return tagged.filter(F.col(as_field) < min_overlap).drop(as_field)
        if mode == "keep":
            return tagged.filter(F.col(as_field) >= min_overlap)
        return tagged

    return fn


@register_stage("$mediaEmbed")
def media_embed_stage(expression: Any, ctx: Context) -> StageFn:
    """Deterministic feature embedding of a binary column:
    ``{input, dim, as}`` -> ``array<double>`` in [-1, 1).

    Stub featurizer (this container has no image/audio models): dimension
    d = the same 60-bit md5 derivation as ``md5_long`` over ``d:bytes`` —
    deterministic, JVM-native, reproducible in any SQL engine with md5
    (``(('0x'||substr(md5(d||':'||x),1,15))::BIGINT % 2000)/1000 - 1`` in
    DuckDB), and shaped exactly like a real model's output so it composes
    with $annTopK/$annLsh/$embedDedup.  A real encoder replaces the hash
    with an Arrow-batched mapInPandas model call behind the same schema.
    """
    inp = expression["input"]
    dim = int(expression.get("dim", 16))
    as_field = expression.get("as", "embedding")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        data = compile_expr(inp, ExprContext(schema=df.schema)).cast("binary")
        comps = [
            F.conv(
                F.substring(
                    F.md5(F.concat(F.encode(F.lit(f"{d}:"), "UTF-8"), data)),
                    1, 15,
                ),
                16, 10,
            ).cast("long") % 2000 / 1000.0 - 1.0
            for d in range(dim)
        ]
        return df.withColumn(as_field, F.array(*comps))

    return fn


@register_stage("$urlParse")
def url_parse_stage(expression: Any, ctx: Context) -> StageFn:
    """URL decomposition for corpus curation: ``{input, as?}`` adds a
    struct (default ``url``) with ``scheme``, ``host``, ``domain``
    (host minus one leading ``www.``), ``apex`` (last two host labels),
    ``path``, ``query`` and ``fragment`` — each part null when that
    component is absent.  Values with no recognizable URL structure get
    all-null parts, but scheme-less inputs like ``example.com/path``
    parse PARTIALLY (Java URI semantics: path non-null, host/scheme
    null) — filter on ``url.host`` (not ``url.path``) as the
    "parsed as a web URL" proxy.

    The standard front door to domain-level curation (blocklists,
    per-domain caps, URL dedup): follow with $match on ``url.domain``
    or $lookup against a domain table.  ``apex`` is a PSL-free
    approximation — correct for ``example.com``-style hosts, wrong for
    multi-label public suffixes like ``co.uk``; pipelines that need
    exact registrable domains join a public-suffix-list collection
    instead (the engine keeps this row-local rather than embedding a
    suffix snapshot that silently goes stale).

    100 TB: a map-only pass — ``try_parse_url`` and label slicing are
    JVM intrinsics, zero shuffle, zero Python.
    """
    inp = expression["input"]
    as_field = expression.get("as", "url")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        text = compile_expr(inp, ExprContext(schema=df.schema))
        tmp = df.withColumn("__url_in", text)

        def part(p: str) -> Column:
            return F.expr(f"try_parse_url(`__url_in`, '{p}')")

        host = part("HOST")
        domain = F.regexp_replace(host, r"^www\.", "")
        labels = F.split(domain, r"\.")
        apex = F.when(
            F.size(labels) >= 2,
            F.concat_ws(
                ".",
                F.element_at(labels, -2), F.element_at(labels, -1)),
        ).otherwise(domain)
        out = tmp.withColumn(
            as_field,
            F.struct(
                part("PROTOCOL").alias("scheme"),
                host.alias("host"),
                domain.alias("domain"),
                apex.alias("apex"),
                part("PATH").alias("path"),
                part("QUERY").alias("query"),
                part("REF").alias("fragment"),
            ),
        )
        return out.drop("__url_in")

    return fn


@register_stage("$groupCap")
def group_cap_stage(expression: Any, ctx: Context) -> StageFn:
    """Per-group row cap: ``{by, cap, sortBy}`` keeps the first ``cap``
    rows of each group in ``sortBy`` order — the domain-cap /
    best-per-cluster curation primitive (``cap: 1`` is argmin/argmax:
    e.g. keep the highest-quality document per ``url.domain``, or cap
    any one domain's contribution to a training mix).

    ``by`` is one expression or a list (compound key); ``sortBy`` is a
    Mongo sort document over field paths (``{field: 1|-1}``) and is
    REQUIRED — a cap without an order is nondeterministic; add a unique
    tie-break field (the doc id) for fully stable output.

    100 TB shape: compiles to ``row_number`` over (by, sortBy), which
    Spark rewrites to WindowGroupLimit — every task pre-prunes its
    input to ``cap`` rows per group BEFORE the exchange, so a skewed
    group (one domain = half the corpus) costs cap×tasks shuffled rows,
    not its full size.  One hash shuffle on the group key, no join, no
    global sort.
    """
    by = expression["by"]
    cap = int(expression["cap"])
    sort_by = expression.get("sortBy")
    if cap < 1:
        raise ValueError("$groupCap cap must be >= 1")
    if not sort_by:
        raise ValueError(
            "$groupCap needs sortBy — a cap without an order would keep "
            "arbitrary rows")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from pyspark.sql import Window

        from ..operators.extended import _batch_only, _sort_cols

        _batch_only("$groupCap", c)
        ectx = ExprContext(schema=df.schema)
        keys = by if isinstance(by, list) else [by]
        w = Window.partitionBy(
            *[compile_expr(k, ectx) for k in keys]
        ).orderBy(*_sort_cols(sort_by))
        return (
            df.withColumn("__gc_rn", F.row_number().over(w))
            .filter(F.col("__gc_rn") <= cap)
            .drop("__gc_rn")
        )

    return fn


# ------------------------------------------------- markup / quality signals


def _half_up6(col: Column) -> Column:
    """Half-up at 6 digits via the floor formula — bit-identical to the
    SQL-oracle ``_r(expr, 6)`` convention (plain round() differs between
    engines on boundary halves)."""
    return (F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("double")


# &amp; decodes LAST: decoding it first would double-decode escaped
# references ("&amp;lt;" must become the literal "&lt;", not "<")
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


@register_stage("$htmlStrip")
def html_strip_stage(expression: Any, ctx: Context) -> StageFn:
    """Markup removal for web-scraped corpora: ``{input, as?}`` adds a
    struct:

    - ``clean_text`` — ``<script>``/``<style>`` blocks dropped wholesale
      (their text is code, not prose), every remaining tag replaced by a
      space, the common named entities decoded (``&amp; &lt; &gt; &quot;
      &#39; &apos; &nbsp;``), whitespace runs collapsed, trimmed
    - ``n_tags`` — tag count in the raw text (markup-density signal)
    - ``markup_ratio`` — ``1 - len(clean)/len(raw)`` (0 for empty raw):
      the fraction of the document that was markup

    This is a heuristic regex stripper for corpus triage, not an HTML
    parser — CDATA, conditional comments and numeric entities pass
    through (documented boundary; a real extraction pass would sit in
    ``mapInPandas`` behind the same schema).  Regexes avoid
    backreferences so the operator stays oracle-checkable under RE2.
    100 TB shape: a row-local ``regexp_replace`` chain — no shuffle, no
    Python."""
    inp = expression["input"]
    as_field = expression.get("as", "html")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        raw = compile_expr(inp, ExprContext(schema=df.schema))
        clean = raw
        for block in ("script", "style"):
            clean = F.regexp_replace(
                clean, f"(?is)<{block}[^>]*>.*?</{block}>", " ")
        clean = F.regexp_replace(clean, "<[^>]*>", " ")
        for ent, rep in HTML_ENTITIES:
            clean = F.replace(clean, F.lit(ent), F.lit(rep))
        clean = F.trim(F.regexp_replace(clean, r"\s+", " "))
        ratio = (
            F.when(raw.isNull(), F.lit(None).cast("double"))
            .when(
                F.length(raw) > 0,
                _half_up6(1.0 - F.length(clean).cast("double")
                          / F.length(raw)),
            )
            .otherwise(F.lit(0.0))
        )
        st = F.struct(
            clean.alias("clean_text"),
            F.regexp_count(raw, F.lit("<[^>]*>")).cast("int").alias("n_tags"),
            ratio.alias("markup_ratio"),
        )
        return df.withColumn(as_field, st)

    return fn


@register_stage("$readability")
def readability_stage(expression: Any, ctx: Context) -> StageFn:
    """Flesch readability metrics (Flesch 1948 / Kincaid et al. 1975):
    ``{input, as?}`` adds a struct:

    - ``n_sentences`` — terminal-punctuation runs (``. ! ?``; at least
      1 for non-empty text, so ratios stay defined)
    - ``n_words`` — whitespace words (the $gopherRules separator class)
    - ``n_syllables`` — vowel-group approximation: ``[aeiouy]+`` runs
      per lowercased word, min 1 per word carrying a letter (the
      standard dictionary-free estimator; no silent-e handling — a
      documented approximation, consistent on both engines)
    - ``flesch`` — 206.835 − 1.015·(words/sentences)
      − 84.6·(syllables/words)
    - ``fk_grade`` — 0.39·(words/sentences) + 11.8·(syllables/words)
      − 15.59

    Scores round half-up at 6 digits; empty/null text measures zeros
    and null scores.  Row-local column program — no shuffle, no Python.
    """
    inp = expression["input"]
    as_field = expression.get("as", "readability")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        text = compile_expr(inp, ExprContext(schema=df.schema))
        t = F.coalesce(text.cast("string"), F.lit(""))
        words = F.filter(F.split(t, _WS + "+"), lambda w: w != F.lit(""))
        n_words = F.size(words).cast("double")
        sent_runs = F.regexp_count(t, F.lit("[.!?]+")).cast("double")
        n_sent = F.when(n_words > 0, F.greatest(sent_runs, F.lit(1.0))
                        ).otherwise(F.lit(0.0))
        syl = F.aggregate(
            F.transform(
                words,
                lambda w: F.when(
                    w.rlike("[A-Za-z]"),
                    F.greatest(
                        F.regexp_count(F.lower(w), F.lit("[aeiouy]+")),
                        F.lit(1)),
                ).otherwise(F.lit(0))),
            F.lit(0), lambda acc, v: acc + v).cast("double")
        wps = F.try_divide(n_words, n_sent)
        spw = F.try_divide(syl, n_words)
        flesch = (F.lit(206.835) - F.lit(1.015) * wps
                  - F.lit(84.6) * spw)
        fk = (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59))
        struct = F.struct(
            n_sent.cast("long").alias("n_sentences"),
            n_words.cast("long").alias("n_words"),
            syl.cast("long").alias("n_syllables"),
            _half_up6(flesch).alias("flesch"),
            _half_up6(fk).alias("fk_grade"),
        )
        return df.withColumn(as_field, struct)

    return fn


@register_stage("$entropyScore")
def entropy_score_stage(expression: Any, ctx: Context) -> StageFn:
    """Shannon entropy of the document's unigram distribution —
    ``{input, as?, unit?: "char"|"word"}`` adds a double column (bits):
    low character entropy flags gibberish / boilerplate / repeated-key
    spam, low word entropy flags template pages (a standard
    quality-filter feature alongside $repetitionScore's Gopher rules).

    Entirely a higher-order-function column program (no UDF, no
    shuffle): tokens -> ``array_sort`` -> run-length boundaries via an
    indexed ``filter`` -> counts via ``zip_with`` against the shifted
    boundary list -> ``H = log2(n) - sum(c*log2(c))/n`` via
    ``aggregate``.  Per-row memory is O(doc length) — the same bound as
    the shingling operators.  Null input -> null; empty -> 0.0.
    Rounded to 6 digits (cross-engine libm drift)."""
    inp = expression["input"]
    as_field = expression.get("as", "entropy")
    # plural accepted too, mirroring $truncateTokens
    unit = {"chars": "char", "words": "word"}.get(
        expression.get("unit", "char"), expression.get("unit", "char"))
    if unit not in ("char", "word"):
        raise ValueError(f"$entropyScore unit must be char|word, got {unit}")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        raw = compile_expr(inp, ExprContext(schema=df.schema))
        sep = "" if unit == "char" else r"\s+"
        toks = F.filter(F.split(raw, sep), lambda x: x != F.lit(""))
        s = F.array_sort(toks)
        n = F.size(s)
        # 0-based positions where a new run starts in the sorted array
        idx = F.filter(
            F.transform(s, lambda x, i: i),
            lambda i: (i == F.lit(0))
            | (F.element_at(s, i) != F.element_at(s, i + F.lit(1))),
        )
        shifted = F.concat(
            F.slice(idx, 2, F.greatest(F.size(idx) - 1, F.lit(0))),
            F.array(n),
        )
        counts = F.zip_with(idx, shifted, lambda a, b: b - a)
        sum_clogc = F.aggregate(
            counts,
            F.lit(0.0),
            lambda acc, cnt: acc
            + cnt.cast("double") * F.log2(cnt.cast("double")),
        )
        ent = (
            F.when(raw.isNull(), F.lit(None).cast("double"))
            .when(n > 0, _half_up6(F.log2(n.cast("double")) - sum_clogc / n))
            .otherwise(F.lit(0.0))
        )
        return df.withColumn(as_field, ent)

    return fn


@register_stage("$piiStats")
def pii_stats_stage(expression: Any, ctx: Context) -> StageFn:
    """PII density signals: ``{input, as?}`` adds a struct with a
    non-overlapping match count per $scrubText rule — ``{email, url,
    ip, phone, total, has_pii}`` — so pipelines can FILTER or ROUTE on
    PII density (``$scrubText`` rewrites; this one measures).  Counts
    are independent per rule (a URL embedding an @-token counts under
    both ``url`` and ``email``), unlike $scrubText's ordered rewrite
    chain — document-level triage wants the raw per-pattern signal.
    100 TB shape: four native ``regexp_count`` calls, row-local, no
    shuffle, no Python."""
    inp = expression["input"]
    as_field = expression.get("as", "pii")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        raw = compile_expr(inp, ExprContext(schema=df.schema))
        counts = {
            name: F.regexp_count(raw, F.lit(rx)).cast("int")
            for name, (rx, _tok) in SCRUB_RULES
        }
        total = None
        for cnt in counts.values():
            total = cnt if total is None else total + cnt
        st = F.struct(
            *[cnt.alias(name) for name, cnt in counts.items()],
            total.cast("int").alias("total"),
            (total > 0).alias("has_pii"),
        )
        return df.withColumn(as_field, st)

    return fn


@register_stage("$shuffle")
def shuffle_stage(expression: Any, ctx: Context) -> StageFn:
    """Deterministic corpus shuffle: ``{id, seed?}`` orders the corpus
    by ``md5(seed:id)`` — the write-order randomization step of a
    training-data pipeline.  Seeded and engine-portable (same md5 fold
    as $datasetSplit), so a re-run, a retry, or another engine produces
    the SAME order; changing ``seed`` produces an independent
    permutation.  The id string is the secondary sort key, so hash
    collisions (60-bit prefixes collide with real probability at
    billions of docs) still place deterministically; rows SHARING an id
    remain mutually unordered — give documents unique ids for a total
    order.  Null ids sort first (Spark's null ordering; engines that
    default nulls-last would place them at the other end — keep ids
    non-null for the cross-engine guarantee).  Documents keep all their
    columns.

    100 TB shape: one range exchange on the hash (uniform keys ⇒
    balanced ranges, no skew by construction) — exactly the cost of any
    global sort, and the sampling pass is over the 8-byte hash, not the
    documents.  There is no window function and no single-partition
    funnel; each output partition is written independently in hash
    order.  Batch-only (a global order is meaningless mid-stream)."""
    id_expr = expression.get("id", "$_id")
    seed = int(expression.get("seed", 0))

    def fn(df: DataFrame, c: Context) -> DataFrame:
        from ..operators.extended import _batch_only

        _batch_only("$shuffle", c)
        idc = compile_expr(id_expr, ExprContext(schema=df.schema))
        ids = idc.cast("string")
        return df.orderBy(md5_long(ids, seed), ids)

    return fn


@register_stage("$truncateTokens")
def truncate_tokens_stage(expression: Any, ctx: Context) -> StageFn:
    """Token-budget truncation: ``{input, as?, max, unit?:
    "tokens"|"chars"}`` cuts each document to its first ``max``
    whitespace tokens (rejoined single-spaced — documented: original
    whitespace runs are not preserved) or to ``max`` characters.  The
    context-length guard of a training pipeline ("cap documents at 8k
    tokens before packing").  Null in -> null out; a non-positive
    ``max`` is a compile-time error.  100 TB shape: row-local
    slice/substr column program, zero shuffle.

    r6: ``tokenizer: {merges: "<collection>"}`` truncates to ``max``
    REAL BPE tokens (functions/bpe.py — GPT-2-style merge ranks
    broadcast from a Context collection).  Pre-tokens carry their
    leading whitespace, so the kept tokens concatenate to the EXACT
    prefix of the original text (no whitespace loss, unlike the
    whitespace mode's single-space rejoin; r7 byte-level: a cut inside
    a multi-byte codepoint keeps the longest whole-character prefix).
    Arrow-batched Pandas UDF —
    the documented tokenizer boundary; row-local, zero shuffle."""
    inp = expression["input"]
    as_field = expression.get("as", "text")
    max_n = int(expression["max"])
    tokenizer = expression.get("tokenizer")
    if tokenizer is not None and "merges" not in tokenizer:
        raise ValueError(
            "$truncateTokens tokenizer needs a merges collection")
    # singular and plural both accepted — $entropyScore spells the same
    # knob "char"/"word"; the family must not punish the analogy
    unit = {"token": "tokens", "char": "chars"}.get(
        expression.get("unit", "tokens"), expression.get("unit", "tokens"))
    if max_n <= 0:
        raise ValueError("$truncateTokens max must be >= 1")
    if unit not in ("tokens", "chars"):
        raise ValueError(
            f"$truncateTokens unit must be tokens|chars, got {unit}")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        text = compile_expr(inp, ExprContext(schema=df.schema))
        if tokenizer is not None:
            if unit != "tokens":
                raise ValueError(
                    "$truncateTokens tokenizer applies to unit 'tokens'")
            from . import bpe as _bpe

            _bpe.ship()
            bc = _bpe.broadcast_tokenizer(c, tokenizer["merges"])
            truncate = _bpe.truncate_tokens

            cache: dict = {}  # per-task word memo, see $tokenCount

            @F.pandas_udf("string")
            def _trunc(s: pd.Series) -> pd.Series:
                _bpe.trim_memo(cache)
                rk, _ = bc.value
                return s.map(lambda t: truncate(t, max_n, rk, cache))

            return df.withColumn(as_field, _trunc(text))
        if unit == "chars":
            out = F.substring(text, 1, max_n)
        else:
            toks = F.filter(F.split(F.trim(text), r"\s+"),
                            lambda x: x != F.lit(""))
            out = F.concat_ws(" ", F.slice(toks, 1, max_n))
            # concat_ws treats null arrays as '' — keep null in -> null out
            out = F.when(text.isNull(), F.lit(None).cast("string")) \
                .otherwise(out)
        return df.withColumn(as_field, out)

    return fn


@register_stage("$mixCorpora")
def mix_corpora_stage(expression: Any, ctx: Context) -> StageFn:
    """Deterministic weighted corpus mixture — the "70% web / 30%
    books" composition step of a training-data pipeline:

    ``{id, seed?, as?, base: {name, rate}, extra: {name: {from,
    rate, id?}}}``

    The pipeline frame is the ``base`` corpus, down-sampled to
    ``rate``; each ``extra`` entry names a Context collection sampled
    at its own rate; all parts union (by column name, missing columns
    null-filled) with the part's name in the ``as`` column (default
    ``mix_source``).  Sampling keeps a row when
    ``md5(seed:name:id) % 1e6 < rate*1e6`` — the same engine-portable
    fold as $datasetSplit, so the mixture is reproducible across runs,
    retries and engines, stable under corpus growth (a row's fate
    depends only on its own id), and independent per part (the part
    name salts the hash).  Null ids hash as the empty string, so all
    null-id rows of a part share one deterministic fate rather than
    silently dropping — give rows unique ids for per-row sampling.
    Rates are exact in expectation, not exact counts — cheap and shuffle-free where an exact-count mix would
    need a global sort; compose with $groupCap for hard caps.

    100 TB shape: row-local hash filters + a metadata-only union —
    zero shuffle, each part's parquet scan prunes independently."""
    id_expr = expression.get("id", "$_id")
    seed = int(expression.get("seed", 0))
    as_field = expression.get("as", "mix_source")
    base = expression.get("base", {})
    base_name = base.get("name", "base")
    extra: dict = expression.get("extra", {})
    parts = [(base_name, None, float(base.get("rate", 1.0)), id_expr)]
    for name, spec in extra.items():
        if not isinstance(spec, dict) or "from" not in spec:
            raise ValueError(
                f"$mixCorpora extra part {name!r} needs "
                "{from: <collection>, rate?}")
        parts.append((name, spec["from"], float(spec.get("rate", 1.0)),
                      spec.get("id", id_expr)))
    for name, _src, rate, _id in parts:
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"$mixCorpora rate for {name!r} must be in "
                             f"[0, 1], got {rate}")
    if len({name for name, *_ in parts}) != len(parts):
        raise ValueError("$mixCorpora part names must be unique")

    def fn(df: DataFrame, c: Context) -> DataFrame:
        out = None
        for name, src, rate, part_id in parts:
            part = df if src is None else c.collections[src]
            idc = compile_expr(part_id, ExprContext(schema=part.schema))
            # null ids hash as the empty string (coalesce), not to a
            # dropped NULL predicate — a row's fate must be a decision,
            # never silent loss ($datasetSplit keeps null-id rows too)
            h = md5_long(
                F.concat(F.lit(f"{name}:"),
                         F.coalesce(idc.cast("string"), F.lit(""))),
                seed) % F.lit(1_000_000)
            kept = part.filter(h < F.lit(int(round(rate * 1_000_000)))) \
                .withColumn(as_field, F.lit(name))
            out = kept if out is None else out.unionByName(
                kept, allowMissingColumns=True)
        return out

    return fn
