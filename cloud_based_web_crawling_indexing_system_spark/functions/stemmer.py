"""Porter stemmer, NLTK-extensions mode.

The reference stems every token with ``nltk.stem.PorterStemmer()``
(default mode NLTK_EXTENSIONS) on both the index path
(/root/reference/Cloud/scripts/indexer_worker.py:29,51,142) and the
query path (/root/reference/Cloud/scripts/master.py:21,45,185-188).
nltk is not installed in this environment, so this is a from-scratch
implementation of Porter (1980) plus the NLTK extensions (irregular-
form pool, len<=2 passthrough, ies/ied special cases for 4-letter
words, consonant-y step-1c condition, alli-first + fulli + logi step-2
rules, bli->ble, 2-letter ends-cvc).  The same function is used by the
engine's Arrow UDF and by the oracle, keeping engine/oracle parity
exact regardless of any residual divergence from nltk itself.

Pure function: str -> str, lowercases its input (nltk ``to_lowercase``
default).
"""

from __future__ import annotations

__all__ = ["porter_stem"]

_VOWELS = frozenset("aeiou")

_POOL: dict[str, str] = {}
for _stem, _forms in {
    "sky": ["sky", "skies"],
    "die": ["dying"],
    "lie": ["lying"],
    "tie": ["tying"],
    "news": ["news"],
    "inning": ["innings", "inning"],
    "outing": ["outings", "outing"],
    "canning": ["cannings", "canning"],
    "howe": ["howe"],
    "proceed": ["proceed"],
    "exceed": ["exceed"],
    "succeed": ["succeed"],
}.items():
    for _f in _forms:
        _POOL[_f] = _stem


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    # number of VC sequences in the C?(VC)^m V? decomposition
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_vowel and not v:
            m += 1
        prev_vowel = v
    return m


def _positive_measure(stem: str) -> bool:
    return _measure(stem) > 0


def _contains_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return len(word) >= 2 and word[-1] == word[-2] and _is_cons(word, len(word) - 1)


def _ends_cvc(word: str) -> bool:
    return (
        len(word) >= 3
        and _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in ("w", "x", "y")
    ) or (
        # NLTK extension: 2-letter vowel+consonant words end cvc
        len(word) == 2
        and not _is_cons(word, 0)
        and _is_cons(word, 1)
    )


def _apply_rules(word: str, rules) -> str:
    """First rule whose suffix matches fires (or blocks, if its
    condition fails) — NLTK ``_apply_rule_list`` semantics."""
    for suffix, replacement, condition in rules:
        if suffix == "*d":
            if _ends_double_cons(word):
                stem = word[:-2]
                if condition is None or condition(stem):
                    return stem + replacement
                return word
            continue
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)] if suffix else word
            if condition is None or condition(stem):
                return stem + replacement
            return word
    return word


def _step1a(word: str) -> str:
    if word.endswith("ies") and len(word) == 4:  # ties -> tie
        return word[:-3] + "ie"
    return _apply_rules(
        word,
        [("sses", "ss", None), ("ies", "i", None), ("ss", "ss", None), ("s", "", None)],
    )


def _step1b(word: str) -> str:
    if word.endswith("ied"):
        return word[:-3] + ("ie" if len(word) == 4 else "i")
    if word.endswith("eed"):
        stem = word[:-3]
        return stem + "ee" if _measure(stem) > 0 else word
    intermediate = None
    for suffix in ("ed", "ing"):
        if word.endswith(suffix):
            stem = word[: -len(suffix)]
            if _contains_vowel(stem):
                intermediate = stem
            break
    if intermediate is None:
        return word
    return _apply_rules(
        intermediate,
        [
            ("at", "ate", None),
            ("bl", "ble", None),
            ("iz", "ize", None),
            ("*d", intermediate[-1] if intermediate else "",
             lambda stem: intermediate[-1] not in ("l", "s", "z")),
            ("", "e",
             lambda stem: _measure(stem) == 1 and _ends_cvc(stem)),
        ],
    )


def _step1c(word: str) -> str:
    return _apply_rules(
        word,
        [("y", "i", lambda stem: len(stem) > 1 and _is_cons(stem, len(stem) - 1))],
    )


def _step2(word: str) -> str:
    if word.endswith("alli") and _positive_measure(word[:-4]):
        return _step2(word[:-4] + "al")
    rules = [
        ("ational", "ate", _positive_measure),
        ("tional", "tion", _positive_measure),
        ("enci", "ence", _positive_measure),
        ("anci", "ance", _positive_measure),
        ("izer", "ize", _positive_measure),
        ("bli", "ble", _positive_measure),
        ("alli", "al", _positive_measure),
        ("entli", "ent", _positive_measure),
        ("eli", "e", _positive_measure),
        ("ousli", "ous", _positive_measure),
        ("ization", "ize", _positive_measure),
        ("ation", "ate", _positive_measure),
        ("ator", "ate", _positive_measure),
        ("alism", "al", _positive_measure),
        ("iveness", "ive", _positive_measure),
        ("fulness", "ful", _positive_measure),
        ("ousness", "ous", _positive_measure),
        ("aliti", "al", _positive_measure),
        ("iviti", "ive", _positive_measure),
        ("biliti", "ble", _positive_measure),
        ("fulli", "ful", _positive_measure),
        # 'l' of 'logi' kept with the stem (NLTK extension)
        ("logi", "log", lambda stem: _positive_measure(word[:-3])),
    ]
    return _apply_rules(word, rules)


def _step3(word: str) -> str:
    return _apply_rules(
        word,
        [
            ("icate", "ic", _positive_measure),
            ("ative", "", _positive_measure),
            ("alize", "al", _positive_measure),
            ("iciti", "ic", _positive_measure),
            ("ical", "ic", _positive_measure),
            ("ful", "", _positive_measure),
            ("ness", "", _positive_measure),
        ],
    )


def _step4(word: str) -> str:
    m_gt_1 = lambda stem: _measure(stem) > 1  # noqa: E731
    return _apply_rules(
        word,
        [
            ("al", "", m_gt_1),
            ("ance", "", m_gt_1),
            ("ence", "", m_gt_1),
            ("er", "", m_gt_1),
            ("ic", "", m_gt_1),
            ("able", "", m_gt_1),
            ("ible", "", m_gt_1),
            ("ant", "", m_gt_1),
            ("ement", "", m_gt_1),
            ("ment", "", m_gt_1),
            ("ent", "", m_gt_1),
            ("ion", "", lambda stem: _measure(stem) > 1 and bool(stem) and stem[-1] in ("s", "t")),
            ("ou", "", m_gt_1),
            ("ism", "", m_gt_1),
            ("ate", "", m_gt_1),
            ("iti", "", m_gt_1),
            ("ous", "", m_gt_1),
            ("ive", "", m_gt_1),
            ("ize", "", m_gt_1),
        ],
    )


def _step5a(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        if _measure(stem) > 1:
            return stem
        if _measure(stem) == 1 and not _ends_cvc(stem):
            return stem
    return word


def _step5b(word: str) -> str:
    if word.endswith("ll") and _measure(word[:-1]) > 1:
        return word[:-1]
    return word


def porter_stem(word: str) -> str:
    """NLTK-mode Porter stem of ``word`` (lowercased first)."""
    w = word.lower()
    if w in _POOL:
        return _POOL[w]
    if len(w) <= 2:
        return w
    w = _step1a(w)
    w = _step1b(w)
    w = _step1c(w)
    w = _step2(w)
    w = _step3(w)
    w = _step4(w)
    w = _step5a(w)
    w = _step5b(w)
    return w
