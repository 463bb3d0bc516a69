"""Property-based tests (hypothesis) for the byte-level BPE core —
arbitrary Unicode inputs, randomized merge tables.  These pin the
invariants every stage built on functions/bpe.py relies on:

- pretokenize is a partition of the text (concatenation-preserving,
  no empty tokens);
- decode(encode(text)) == text for ANY text and ANY merge table whose
  rules are reachable merges (byte-level: no OOV, no loss);
- truncate_tokens returns a character-level prefix of the text and
  never exceeds the budget;
- chunk_tokens with overlap=0 partitions the text exactly.
"""

import random

from hypothesis import given, settings, strategies as st

from pincette_mongo_streams_spark.functions import bpe

# text with a bias toward the interesting classes: whitespace runs,
# contractions, CJK/accents/emoji (multi-byte), digits, controls
_ALPHABET = st.sampled_from(
    list("ab c.'stx09\t\n") + ["é", "日", "🚀", "½", "\x1c", " "]
)
_TEXT = st.text(alphabet=_ALPHABET, max_size=60)


def _random_ranks(text: str, seed: int) -> dict:
    """A random-but-consistent merge table learned from the text itself
    (reachable rules), plus a few junk rules that never apply."""
    rng = random.Random(seed)
    n = rng.randint(0, 12)
    merges = bpe.train({pt: 1 for pt in bpe.pretokenize(text)} or {"x": 1},
                       n, min_pair_count=1)
    ranks = {(l, r): k for l, r, k in merges}
    ranks[("ZZ", "QQ")] = 999  # unreachable rule is harmless
    return ranks


@settings(max_examples=300, deadline=None)
@given(_TEXT)
def test_pretokenize_partitions_text(s):
    toks = bpe.pretokenize(s)
    assert "".join(toks) == s
    assert all(toks)  # no empty pre-tokens


@settings(max_examples=200, deadline=None)
@given(_TEXT, st.integers(0, 10))
def test_encode_decode_round_trip(s, seed):
    ranks = _random_ranks(s, seed)
    toks = bpe.encode(s, ranks, {})
    assert bpe.decode(toks) == s
    assert bpe.count_tokens(s, ranks, {}) == len(toks)


@settings(max_examples=200, deadline=None)
@given(_TEXT, st.integers(1, 30), st.integers(0, 10))
def test_truncate_is_bounded_prefix(s, max_n, seed):
    ranks = _random_ranks(s, seed)
    out = bpe.truncate_tokens(s, max_n, ranks, {})
    assert s.startswith(out)  # character-level prefix, always
    # the kept text re-tokenizes within budget (whole pre-tokens keep
    # their counts; a partial tail can only shrink further)
    assert bpe.count_tokens(out, ranks, {}) <= max_n
    # budget >= total -> identity
    total = bpe.count_tokens(s, ranks, {})
    if max_n >= total:
        assert out == s


@settings(max_examples=200, deadline=None)
@given(_TEXT, st.integers(1, 12), st.integers(0, 10))
def test_chunks_partition_text_without_overlap(s, size, seed):
    ranks = _random_ranks(s, seed)
    chunks = bpe.chunk_tokens(s, size, size, ranks, {})  # stride == size
    assert [c[0] for c in chunks] == list(range(len(chunks)))
    assert all(1 <= c[2] <= size for c in chunks)
    total = bpe.count_tokens(s, ranks, {})
    assert sum(c[2] for c in chunks) == total
    assert all(c[1] in s for c in chunks)  # substrings, always
    # exact partition holds when every chunk edge is codepoint-aligned;
    # a multi-byte char whose bytes straddle an edge is dropped from
    # BOTH sides (the documented whole-character-substring rule —
    # hypothesis found '00½' at size 1).  ASCII text is always aligned:
    if s.isascii():
        assert "".join(c[1] for c in chunks) == s
