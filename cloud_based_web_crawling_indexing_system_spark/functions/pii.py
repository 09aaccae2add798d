"""PII detection and redaction for webtext training pipelines.

Large-scale corpus pipelines (CCNet/BigScience-style preprocessing)
scrub personally identifiable information before training: emails,
IPv4 addresses, phone numbers.  At 100 TB this must be a pure
per-row map — no shuffle, no Python: everything here is a Catalyst
column builder (regexp_extract_all / regexp_replace, JVM-side,
whole-stage-codegen'd), so the scrub rides the same scan as the rest
of the row-level quality stack.

Regex dialect discipline: the patterns are written in the common
subset of Java regex (Spark) and RE2 (DuckDB oracle) — no
backreferences, no lookarounds, only `\\b`, bounded/unbounded counted
repeats, and non-capturing groups, all of which both engines support
with identical leftmost-first match semantics on ASCII text.  The
DuckDB mirrors live in plans/probes.py (q57) and must be kept
byte-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "EMAIL_RE", "IPV4_RE", "PHONE_RE",
    "pii_count_cols", "scrub_pii",
]

# ordered: the scrub applies email -> ipv4 -> phone; replacement
# tokens contain no '@', dots-between-digits, or '+digits', so no
# pass can create a match for a later pass
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+\d{10,14}"

_PATTERNS = (("email", EMAIL_RE, "<EMAIL>"),
             ("ipv4", IPV4_RE, "<IP>"),
             ("phone", PHONE_RE, "<PHONE>"))


def pii_count_cols(text: Column) -> dict[str, Column]:
    """{'n_emails': Column, 'n_ipv4': ..., 'n_phones': ...} — match
    counts per PII class, computed on the raw text (long, so the
    driver's dtype-strict gate sees BIGINT on both sides)."""
    return {
        f"n_{name}s" if name != "ipv4" else "n_ipv4": F.size(
            F.regexp_extract_all(text, F.lit(pat), F.lit(0))
        ).cast("long")
        for name, pat, _ in _PATTERNS
    }


def scrub_pii(text: Column) -> Column:
    """Redact all three PII classes, in the fixed email -> ipv4 ->
    phone order (see _PATTERNS note; the order is part of the
    contract the DuckDB oracle mirrors)."""
    out = text
    for _, pat, repl in _PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
