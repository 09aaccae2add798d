"""Tokenize -> stem -> unigram+bigram term frequencies.

Reference: /root/reference/Cloud/scripts/indexer_worker.py:52,139-150
  tokens = re.compile(r'\\w+').findall(text.lower())
  stems  = [PorterStemmer().stem(w) for w in tokens]
  freqs  = unigram counts + adjacent-bigram ("s1 s2") counts

Tokenization stays in Python (not Catalyst ``regexp_extract_all``)
because Java's ``\\w`` is ASCII-only unless ``(?U)`` while Python 3's
``\\w`` is Unicode-aware — the fixture corpus includes zh/ar tokens to
pin this (SURVEY.md §2.4 P4).

Frequencies are computed row-locally (a dict per page, exactly like
the reference) inside the Arrow UDF, so the postings build needs NO
shuffle for the counting step — per (job, url) counts are emitted
directly from the map side.
"""

from __future__ import annotations

import re

from .stemmer import porter_stem

__all__ = ["WORD_RE", "tokenize", "stem_tokens", "term_freqs"]

WORD_RE = re.compile(r"\w+")

# Per-process stem memo: Porter stemming is a pure function and real
# corpora have vocabulary ≪ token count (Zipf), so memoizing turns the
# hot loop into dict lookups.  Capped to bound worker memory; persists
# across Arrow batches because pandas-UDF workers are reused.
_STEM_CACHE: dict[str, str] = {}
_STEM_CACHE_MAX = 1_000_000


def _stem_cached(w: str) -> str:
    s = _STEM_CACHE.get(w)
    if s is None:
        s = porter_stem(w)
        if len(_STEM_CACHE) < _STEM_CACHE_MAX:
            _STEM_CACHE[w] = s
    return s


def tokenize(text: str) -> list[str]:
    return WORD_RE.findall(text.lower())


def stem_tokens(tokens: list[str]) -> list[str]:
    return [_stem_cached(w) for w in tokens]


def term_freqs(text: str) -> list[tuple[str, int]]:
    """Unigram + adjacent-bigram frequencies in first-seen order (the
    reference's dict preserves insertion order on py3.7+; order only
    matters for determinism of row layout, not semantics)."""
    stems = stem_tokens(tokenize(text))
    freqs: dict[str, int] = {}
    for s in stems:
        freqs[s] = freqs.get(s, 0) + 1
    for i in range(len(stems) - 1):
        bg = stems[i] + " " + stems[i + 1]
        freqs[bg] = freqs.get(bg, 0) + 1
    return list(freqs.items())
