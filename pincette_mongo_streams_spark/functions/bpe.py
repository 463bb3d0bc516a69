"""GPT-2-style byte-pair-encoding for ``$tokenCount`` / ``$truncateTokens``
``tokenizer: {merges: "<collection>"}`` mode.

The merge table is a Context collection (metadata-sized, like the Atlas
synonym mappings) with columns ``(left, right, rank)`` or ``(pair, rank)``
where ``pair`` is the merges.txt line form ``"lo w"``.  It is collected on
the driver (50k rows for a GPT-2-sized vocab) and shipped once per
executor inside the Arrow-batched UDF closure.

The encoder is the standard BPE algorithm (Sennrich et al. 2016; the
GPT-2 tokenizer applies it per pre-token): split the text with a
GPT-2-style pre-tokenizer, start each pre-token as characters, and
repeatedly merge ALL occurrences of the lowest-rank adjacent pair until
no adjacent pair has a rank.  Two documented simplifications vs the real
GPT-2 tokenizer (tiktoken/tokenizers are not in the image — this is the
tokenizer analog of the $decodeMedia codec boundary):

- the pre-tokenizer is the ASCII approximation of GPT-2's regex
  (``\\p{L}`` -> ``[A-Za-z]``, ``\\p{N}`` -> ``[0-9]``), and
- symbols are CHARACTERS, not UTF-8 bytes with the byte->unicode
  remap — identical for ASCII text, coarser for multi-byte scripts.

Both the pre-tokenizer and the per-pre-token BPE preserve
concatenation: ``"".join(tokens) == text`` (spaces travel with their
following pre-token, GPT-2-style), so token-budget truncation
reconstructs the exact prefix of the original text.

The merge LOOP is unbounded-depth (one iteration per merge applied), so
it runs as an Arrow-batched Pandas UDF rather than Spark HOFs — a
documented Python boundary (SCALE.md §0); plan shape: one ArrowEvalPython
over the projected text column, row-local, zero shuffle.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

# ASCII approximation of the GPT-2 pre-tokenizer regex
PRETOKEN_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)"
    r"|\s+"
)

Ranks = Dict[Tuple[str, str], int]


def ship():
    """Register this module for pickle-by-value so executors need no
    package install for the tokenizer closures (same pattern as the
    jq/JSLT tier-2 interpreters)."""
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover - older pickler
        pass


def broadcast_tokenizer(ctx, merges_name: str, vocab_name=None):
    """Resolve, validate, and broadcast ``(ranks, vocab)`` ONCE per
    (merges, vocab) name pair per Context: the broadcast memoizes on the
    Context, so foreachBatch's per-micro-batch stage recompilation
    reuses one broadcast instead of re-collecting the tables and
    leaking a new broadcast every batch.  The memo key includes the
    IDENTITY of the resolved DataFrames (advisor r6): rebinding a
    collection name to a different DataFrame on the same Context is
    picked up — the stale broadcast is unpersisted (safe for plans
    already compiled against it) and the new model collected.  (``Context.collection`` caches loader results, so a
    ``collection_loader`` path still collects once per Context.)  Long-
    lived Contexts can free executor memory with
    :func:`release_broadcasts`."""
    cache = getattr(ctx, "_bpe_broadcasts", None)
    if cache is None:
        cache = {}
        ctx._bpe_broadcasts = cache
    # resolve FIRST (Context.collection caches loader results), then key
    # the memo on the resolved DataFrame identities: same frames -> one
    # broadcast forever; a rebound name -> unpersist + re-collect
    try:
        mdf = ctx.collection(merges_name)
    except KeyError:
        raise ValueError(
            f"tokenizer.merges: unknown collection {merges_name!r} — wire "
            "it as Context(collections={...}) or via a collection_loader")
    vdf = None
    if vocab_name is not None:
        try:
            vdf = ctx.collection(vocab_name)
        except KeyError as e:
            raise ValueError(f"tokenizer.vocab: {e}") from e
    names = (merges_name, vocab_name)
    ids = (id(mdf), None if vdf is None else id(vdf))
    hit = cache.get(names)
    if hit is not None:
        if hit[0] == ids:
            return hit[1]
        # a name was rebound to a different DataFrame: evict the stale
        # model.  unpersist (NOT destroy): DataFrames compiled against
        # the old model may still be live — unpersist frees the executor
        # copies now and transparently re-ships if such a plan runs
        # again; destroy would poison it (INTERNAL_ERROR_BROADCAST)
        try:
            hit[1].unpersist()
        except Exception:  # pragma: no cover - already released
            pass
        del cache[names]
    ranks = _ranks_from_df(mdf)
    vocab = None
    if vdf is not None:
        if not {"token", "id"} <= set(vdf.columns):
            raise ValueError(
                "tokenizer.vocab collection needs (token, id) columns")
        rows = vdf.select("token", "id").collect()
        if not rows:
            # fail fast like the merges path: an empty vocab would
            # silently map EVERY token to -1
            raise ValueError("tokenizer.vocab collection is empty")
        vocab = {r["token"]: int(r["id"]) for r in rows}
    bc = ctx.spark.sparkContext.broadcast((ranks, vocab))
    cache[names] = (ids, bc)
    return bc


def release_broadcasts(ctx) -> int:
    """Destroy every tokenizer broadcast memoized on ``ctx`` and clear
    the memo; returns how many were released.  For long-lived Contexts
    that cycle through many tokenizer models (advisor r6).  destroy()
    is final — call only when no DataFrame compiled against these
    models is still going to execute; the rebind path inside
    :func:`broadcast_tokenizer` uses the gentler unpersist for exactly
    that reason."""
    cache = getattr(ctx, "_bpe_broadcasts", None) or {}
    n = 0
    for _, bc in cache.values():
        try:
            bc.destroy()
        except Exception:  # pragma: no cover - already destroyed
            pass
        n += 1
    cache.clear()
    return n


def _ranks_from_df(df) -> Ranks:
    """Collect a merge-rank DataFrame into ``{(l, r): rank}``.
    Driver-side and metadata-sized by contract (the table IS the model,
    like the $dsirScore hashed-ngram tables)."""
    cols = set(df.columns)
    if {"left", "right", "rank"} <= cols:
        rows = df.select("left", "right", "rank").collect()
        ranks = {(r["left"], r["right"]): int(r["rank"]) for r in rows}
    elif {"pair", "rank"} <= cols:
        # merges.txt line form; symbols containing literal spaces (the
        # char-level analog of GPT-2's Ġ) are only expressible in the
        # (left, right, rank) column form
        ranks = {}
        for r in df.select("pair", "rank").collect():
            parts = r["pair"].split(" ")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(
                    f"tokenizer.merges: pair {r['pair']!r} must be two "
                    "space-separated symbols (symbols with spaces need "
                    "the left/right/rank column form)")
            ranks[(parts[0], parts[1])] = int(r["rank"])
    else:
        raise ValueError(
            "tokenizer.merges collection needs columns (left, right, rank) "
            f"or (pair, rank); got {sorted(cols)}")
    if not ranks:
        raise ValueError("tokenizer.merges collection is empty")
    return ranks


def _apply_merge(syms: List[str], pair: Tuple[str, str]) -> List[str]:
    """Greedy left-to-right replacement of every adjacent occurrence of
    ``pair`` — THE single definition of one merge application, shared by
    the encoder and the trainer so their semantics cannot drift."""
    merged: List[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
            merged.append(syms[i] + syms[i + 1])
            i += 2
        else:
            merged.append(syms[i])
            i += 1
    return merged


def bpe_word(word: str, ranks: Ranks, cache: dict) -> List[str]:
    """Encode ONE pre-token: start from characters, repeatedly merge all
    occurrences of the lowest-rank adjacent pair."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    parts: List[str] = list(word)
    while len(parts) > 1:
        best = None
        best_rank = None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best = (parts[i], parts[i + 1])
        if best is None:
            break
        parts = _apply_merge(parts, best)
    cache[word] = parts
    return parts


def encode(text: str, ranks: Ranks, cache: dict) -> List[str]:
    """Full-text BPE: pre-tokenize, encode each pre-token.  Tokens
    concatenate back to ``text`` exactly."""
    out: List[str] = []
    for m in PRETOKEN_RE.finditer(text):
        out.extend(bpe_word(m.group(0), ranks, cache))
    return out


def count_tokens(text, ranks: Ranks, cache: dict):
    if text is None:
        return None
    n = 0
    for m in PRETOKEN_RE.finditer(text):
        n += len(bpe_word(m.group(0), ranks, cache))
    return n


def train(word_counts, n_merges: int, min_pair_count: int = 2):
    """Learn ``n_merges`` BPE merge rules from ``{word: count}`` — the
    standard frequency-greedy training loop (Sennrich et al. 2016) with
    the classic incremental pair-count bookkeeping: maintain a pair ->
    count map and a pair -> {word ids} index, each round merge the most
    frequent pair inside the words that contain it and update only the
    pairs those words touched.  Deterministic: ties break on the pair
    itself.  Returns ``[(left, right, rank)]``.  Runs on the DRIVER over
    the (bounded) word-frequency table — see the $bpeTrain stage for the
    distributed aggregation that produces it."""
    words = {i: (list(w), c) for i, (w, c) in enumerate(word_counts.items())}
    pair_counts: Dict[Tuple[str, str], int] = {}
    where: Dict[Tuple[str, str], set] = {}

    def add_word(wid, sign=1):
        syms, c = words[wid]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + sign * c
            if sign > 0:
                where.setdefault(p, set()).add(wid)

    for wid in words:
        add_word(wid)
    merges: List[Tuple[str, str, int]] = []
    for rank in range(n_merges):
        best = None
        best_c = min_pair_count - 1
        for p, c in pair_counts.items():
            if c > best_c or (c == best_c and best is not None and p < best):
                best, best_c = p, c
        if best is None:
            break
        merges.append((best[0], best[1], rank))
        for wid in list(where.get(best, ())):
            syms, c = words[wid]
            add_word(wid, sign=-1)  # retract this word's old pairs
            words[wid] = (_apply_merge(syms, best), c)
            add_word(wid)
        pair_counts.pop(best, None)
        where.pop(best, None)
        # retracting can zero out pairs; drop them so the argmax scan
        # stays proportional to live pairs
        if rank % 64 == 63:
            dead = [p for p, c in pair_counts.items() if c <= 0]
            for p in dead:
                pair_counts.pop(p, None)
                where.pop(p, None)
    return merges


def truncate_tokens(text, max_n: int, ranks: Ranks, cache: dict):
    if text is None:
        return None
    kept: List[str] = []
    n = 0
    for m in PRETOKEN_RE.finditer(text):
        toks = bpe_word(m.group(0), ranks, cache)
        if n + len(toks) <= max_n:
            kept.append(m.group(0))  # whole pre-token survives verbatim
            n += len(toks)
            if n == max_n:
                break
        else:
            kept.extend(toks[: max_n - n])
            break
    return "".join(kept)
