"""Reusable column-function library (all JVM-side built-ins unless noted).

One import surface for the engine's scalar/array helpers:
- text: tokenization, token counts, language heuristic, fingerprints
- dedup: normalization + content hashing, shingles
- similarity: dot/norm/cosine over array columns
- governance: deterministic split assignment (pure function of an id)
"""

from ..operators.splits import split_assignment
from ..operators.dedup import normalized_text, shingle_udf, shingles, text_hash
from ..operators.similarity import cosine, dot, norm
from ..operators.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    doc_fingerprint_from_tokens,
    lang_id_heuristic,
    token_count,
    tokens,
)

__all__ = [
    "split_assignment",
    "normalized_text",
    "text_hash",
    "shingles",
    "shingle_udf",
    "cosine",
    "dot",
    "norm",
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "lang_id_heuristic",
    "doc_fingerprint",
    "doc_fingerprint_from_tokens",
]
