"""URL canonicalization.

Two modes:

- ``reference``: exactly what the reference does — resolve each href
  against the page url with ``urljoin`` after stripping everything
  from the first ``#`` (/root/reference/Cloud/scripts/crawler_worker.py:196),
  then filter on ``urlparse(link).scheme in ('http','https')``
  (:197-199).  Used by default so crawl ordering and the URL-seen set
  match the reference.

- ``full``: RFC 3986 superset for the 10^10-scale seen-set — lowercase
  scheme/host, drop default ports, percent-decode UNRESERVED chars
  only (6.2.2.2 — reserved ones like %2F stay encoded: a slash inside
  a segment is NOT a path separator), uppercase remaining %XX, sort
  query params (stable by key then value), fold leading ``www.``
  labels, fold https->http scheme, remove fragment, empty path to
  ``/``.  Every operation is idempotent and maps RFC-equivalent
  spellings (and the www/scheme equivalence classes the north-star
  adds) to ONE key without conflating distinct resources.  Used when
  ``CrawlConfig.canonicalization == 'full'``.

Pure functions shared by the Arrow UDFs and the oracle.
"""

from __future__ import annotations

import hashlib
import re
import string
from urllib.parse import parse_qsl, urlencode, urlparse, urlunparse

__all__ = ["canonicalize_reference", "canonicalize_full", "url_md5", "host_hash31", "split_url"]

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = frozenset(string.ascii_letters + string.digits + "-._~")


def _pct_normalize(s: str) -> str:
    """RFC 3986 6.2.2: decode %XX only when the octet is UNRESERVED,
    uppercase the hex of the rest.  Reserved chars stay encoded (a
    %2F is data, not a path separator); invalid %-sequences pass
    through untouched (no lossy U+FFFD folding).  Idempotent."""

    def fix(m: re.Match) -> str:
        h = m.group(1)
        ch = chr(int(h, 16))
        return ch if ch in _UNRESERVED else "%" + h.upper()

    return re.sub(r"%([0-9A-Fa-f]{2})", fix, s)


def canonicalize_reference(link: str) -> str:
    """Identity modulo the defrag already applied at extraction time.

    Kept as a function so the 'reference' mode slots into the same
    pipeline stage as 'full'.
    """
    return link


def canonicalize_full(link: str) -> str:
    try:
        p = urlparse(link)
    except ValueError:
        return link
    scheme = p.scheme.lower()
    if scheme == "https":
        scheme = "http"  # scheme fold per north-star
    netloc = p.netloc.lower()
    if "@" in netloc:
        _, netloc = netloc.rsplit("@", 1)  # strip userinfo
    if ":" in netloc:
        host, _, port = netloc.rpartition(":")
        # strip the port if it is the default for EITHER the original
        # or the folded scheme: https://h:80/ folds to http, where :80
        # IS default — keeping it would make canonicalization
        # non-idempotent (a second pass would strip it), splitting the
        # seen set between equivalent spellings
        # an EMPTY port ('http://h:/') is RFC-3986-equivalent to no
        # port at all — strip the bare colon too
        if port == "" or port in (
            _DEFAULT_PORTS.get(p.scheme.lower()),
            _DEFAULT_PORTS.get(scheme),
        ):
            netloc = host
    while netloc.startswith("www."):
        netloc = netloc[4:]  # fold EVERY leading www. label (idempotent)
    path = _pct_normalize(p.path)
    if path == "":
        path = "/"
    query = urlencode(sorted(parse_qsl(p.query, keep_blank_values=True)))
    # path parameters (';key=v') get the same 6.2.2 treatment as the
    # path — RFC-equivalent %XX spellings must map to one seen-set key
    return urlunparse((scheme, netloc, path, _pct_normalize(p.params), query, ""))


def url_md5(url: str) -> str:
    """MD5 hex of the url — the reference's seen-set key
    (/root/reference/Cloud/scripts/indexer_worker.py:106)."""
    return hashlib.md5(url.encode("utf-8")).hexdigest()


def host_hash31(host: str) -> int:
    """Deterministic 31-bit host hash for canonical frontier ordering
    and partitioning — first 8 hex digits of md5(host), masked to 31
    bits so it is computable identically in Spark SQL
    (``conv(substring(md5(host),1,8),16,10) & 0x7FFFFFFF``), Python,
    and DuckDB."""
    return int(hashlib.md5(host.encode("utf-8")).hexdigest()[:8], 16) & 0x7FFFFFFF


def split_url(url: str) -> tuple[str, str, str]:
    """(scheme, netloc, path) via the same stdlib urlparse the
    reference uses — Java's parse_url diverges on edge cases, so URL
    splitting stays in Python UDF batches."""
    try:
        p = urlparse(url)
        return p.scheme, p.netloc, p.path
    except ValueError:
        return "", "", ""
