"""The engine's vectorized (pandas/Arrow) UDF surface.

Per the input hint (BASELINE.json:15) every per-row Python runs inside
Arrow-batched pandas UDFs — there are NO row-at-a-time Python UDFs and
no RDD maps anywhere in the engine.  Struct fields holding arrays are
returned as *parallel primitive arrays* (links / link_hosts /
link_schemes, terms / freqs) and re-assembled with
``arrays_zip``/``posexplode`` on the JVM side, which keeps the Arrow
transfer to flat, well-supported types.

UDF inventory (SURVEY.md §2.10):
  parse_page      html+url -> text, index_text, links(+scheme/host)
  term_freqs      index_text -> unigram+bigram terms + freqs
  can_fetch       robots_txt+url -> bool   (robots gate F6)
  robots_delay    robots_txt -> crawl delay seconds (politeness C1)
  url_meta        url -> url_hash/host/scheme/host_hash
  canon_full      url -> RFC3986-canonicalized url (scale mode)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .htmltext import extract_links, extract_text_crawl, extract_text_index
from .robots import RobotsRules
from .terms import term_freqs
from .urlnorm import canonicalize_full, host_hash31, split_url, url_md5

__all__ = [
    "parse_page_udf",
    "term_freqs_udf",
    "can_fetch_udf",
    "robots_delay_udf",
    "url_meta_udf",
    "canon_full_udf",
]

_PARSE_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("index_text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("link_schemes", T.ArrayType(T.StringType())),
        T.StructField("link_hosts", T.ArrayType(T.StringType())),
    ]
)


@F.pandas_udf(_PARSE_SCHEMA)
def parse_page_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """One HTML parse per page: crawl text (P2), composed index text
    (P3∘P2 — the byte-identical invariant), links resolved+defragged
    (P1/F4) with scheme/host split via Python urlparse (P7)."""
    texts: list[str | None] = []
    index_texts: list[str | None] = []
    links_col: list[list[str] | None] = []
    schemes_col: list[list[str] | None] = []
    hosts_col: list[list[str] | None] = []
    for raw, u in zip(html, url):
        if raw is None:
            texts.append(None)
            index_texts.append(None)
            links_col.append(None)
            schemes_col.append(None)
            hosts_col.append(None)
            continue
        page = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
        text = extract_text_crawl(page)
        texts.append(text)
        index_texts.append(extract_text_index(text))
        links = extract_links(page, u)
        schemes, hosts = [], []
        for lk in links:
            s, h, _ = split_url(lk)
            schemes.append(s)
            hosts.append(h)
        links_col.append(links)
        schemes_col.append(schemes)
        hosts_col.append(hosts)
    return pd.DataFrame(
        {
            "text": texts,
            "index_text": index_texts,
            "links": links_col,
            "link_schemes": schemes_col,
            "link_hosts": hosts_col,
        }
    )


_TERMS_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("freqs", T.ArrayType(T.LongType())),
    ]
)


@F.pandas_udf(_TERMS_SCHEMA)
def term_freqs_udf(index_text: pd.Series) -> pd.DataFrame:
    """P4 tokenize + P5 Porter stem + P6 unigram/bigram counts,
    computed row-locally (map-side; no shuffle needed to count)."""
    terms_col: list[list[str] | None] = []
    freqs_col: list[list[int] | None] = []
    for text in index_text:
        if text is None:
            terms_col.append(None)
            freqs_col.append(None)
            continue
        tf = term_freqs(text)
        terms_col.append([t for t, _ in tf])
        freqs_col.append([c for _, c in tf])
    return pd.DataFrame({"terms": terms_col, "freqs": freqs_col})


def _rules_cache_lookup(cache: dict, robots_txt: str | None) -> RobotsRules:
    key = robots_txt
    rules = cache.get(key)
    if rules is None:
        rules = RobotsRules(robots_txt)
        cache[key] = rules
    return rules


@F.pandas_udf(T.BooleanType())
def can_fetch_udf(robots_txt: pd.Series, url: pd.Series) -> pd.Series:
    """Robots gate (F6).  Parsers are cached per distinct robots body
    within the batch, so cost is ~one parse per host per batch."""
    cache: dict = {}
    out = []
    for txt, u in zip(robots_txt, url):
        out.append(_rules_cache_lookup(cache, txt).can_fetch(u))
    return pd.Series(out)


@F.pandas_udf(T.DoubleType())
def robots_delay_udf(robots_txt: pd.Series) -> pd.Series:
    """Raw crawl_delay('*'), NULL when absent — including the
    reference's quirk that an explicit 0 counts as absent
    (crawler_worker.py:149's ``or``).  The caller coalesces NULL to
    CrawlConfig.default_delay (the reference DELAY env knob), so the
    configured default reaches hosts whose robots lack a crawl-delay,
    not just hosts with no robots at all."""
    cache: dict = {}
    out = []
    for txt in robots_txt:
        cd = _rules_cache_lookup(cache, txt).crawl_delay if txt is not None else None
        out.append(float(cd) if cd is not None else None)
    return pd.Series(out, dtype="float64")


_URL_META_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.StringType()),
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("host_hash", T.LongType()),
    ]
)


@F.pandas_udf(_URL_META_SCHEMA)
def url_meta_udf(url: pd.Series) -> pd.DataFrame:
    """md5 seen-key (P8), scheme/host via Python urlparse (P7), and the
    31-bit host hash used for frontier partitioning/ordering."""
    hashes, schemes, hosts, hh = [], [], [], []
    for u in url:
        if u is None:  # null-safe like every sibling UDF here
            hashes.append(None)
            schemes.append(None)
            hosts.append(None)
            hh.append(None)
            continue
        hashes.append(url_md5(u))
        s, h, _ = split_url(u)
        schemes.append(s)
        hosts.append(h)
        hh.append(host_hash31(h))
    return pd.DataFrame({"url_hash": hashes, "scheme": schemes, "host": hosts, "host_hash": hh})


@F.pandas_udf(T.StringType())
def canon_full_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: canonicalize_full(u) if u is not None else None)
