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


# r10: split by family into dp_dedup / dp_vector / dp_quality / dp_tokens /
# dp_eval / dp_retrieval / dp_text / dp_curation (this file had reached
# 5,800 lines / 69 stages).  Importing this module keeps registering every
# stage and re-exports EVERY public and underscore name, so existing
# ``from ...functions.datapipe import X`` call sites (tests, atlas.py,
# __spark_entry__.py) are untouched.
#
# RE-EXPORTS ARE BY VALUE: the loop below copies bindings into this
# module's globals at import time.  Reading any name through
# ``datapipe.X`` works, but REBINDING it (monkeypatch, tunables such as
# ALL_PAIRS_SIZE_LIMIT or SCRUB_RULES) does NOT reach the implementing
# dp_* module — the stages read their constants from their OWNING module.
# Patch tunables on the owner (e.g. ``dp_dedup.ALL_PAIRS_SIZE_LIMIT``),
# never on this aggregator.

from . import (  # noqa: E402  (registration side effects, order matters)
    dp_dedup,
    dp_vector,
    dp_quality,
    dp_tokens,
    dp_eval,
    dp_retrieval,
    dp_text,
    dp_curation,
    dp_lm,
    dp_stats,
)

for _m in (dp_dedup, dp_vector, dp_quality, dp_tokens, dp_eval,
           dp_retrieval, dp_text, dp_curation, dp_lm, dp_stats):
    for _k, _v in vars(_m).items():
        if not _k.startswith("__"):
            globals()[_k] = _v
del _m, _k, _v
