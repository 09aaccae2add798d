"""Property tests (hypothesis) for the canonicalization kernels — the
invariants the 10^10-scale seen-set depends on:

- canonicalize_full is IDEMPOTENT (a canonical url re-canonicalizes to
  itself — otherwise a url could dedup against a different key when
  rediscovered through a different path);
- equivalent spellings (scheme case, host case, default port, www,
  fragment, query order) collapse to one key;
- url_md5/host_hash31 are pure and stable (the JVM recomputes them, so
  any instability would split the seen set).
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from cloud_based_web_crawling_indexing_system_spark.functions.urlnorm import (
    canonicalize_full,
    host_hash31,
    url_md5,
)

_host_label = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=8)
_hosts = st.builds(lambda a, b: f"{a}.{b}.org", _host_label, _host_label)
_path_seg = st.text(
    alphabet=string.ascii_letters + string.digits + "-._~%",
    min_size=0,
    max_size=8,
)
_paths = st.lists(_path_seg, min_size=0, max_size=4).map(lambda segs: "/" + "/".join(segs))
_qkeys = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=4)
_queries = st.lists(st.tuples(_qkeys, _qkeys), min_size=0, max_size=4).map(
    lambda kvs: "&".join(f"{k}={v}" for k, v in kvs)
)


from hypothesis import example


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    www = draw(st.sampled_from(["", "www.", "WWW."]))
    host = draw(_hosts)
    port = draw(st.sampled_from(["", ":", ":80", ":443", ":8080"]))
    path = draw(_paths)
    q = draw(_queries)
    frag = draw(st.sampled_from(["", "#top", "#a/b"]))
    return f"{scheme}://{www}{host}{port}{path}" + (f"?{q}" if q else "") + frag


@settings(max_examples=300, deadline=None)
@given(urls())
@example("https://0.0.org:80/")  # regression: port stripped vs ORIGINAL scheme only
@example("http://a.b.org:/")  # regression: bare empty port kept the colon
@example("http://www.www.a.org/x")  # regression: single-prefix www fold
@example("http://a.b.org/p%2Fq%41%zz")  # reserved/unreserved/invalid %-seqs
def test_canonicalize_full_idempotent(u):
    c = canonicalize_full(u)
    assert canonicalize_full(c) == c


@settings(max_examples=300, deadline=None)
@given(urls())
def test_equivalent_spellings_one_seen_key(u):
    # the url with scheme/host case noise, www, default port, and
    # fragment MUST share the canonical key with its clean spelling
    c = canonicalize_full(u)
    assert "#" not in c
    assert not c.split("://", 1)[1].startswith("www.")
    assert c.split("://", 1)[0] == "http"
    assert url_md5(c) == url_md5(canonicalize_full(c))


@settings(max_examples=200, deadline=None)
@given(urls())
def test_query_order_invariance(u):
    base = u.split("?")[0].split("#")[0]
    a = canonicalize_full(base + "?b=2&a=1")
    b = canonicalize_full(base + "?a=1&b=2")
    assert a == b


@settings(max_examples=200, deadline=None)
@given(_hosts)
def test_host_hash31_pure_and_bounded(h):
    assert host_hash31(h) == host_hash31(h)
    assert 0 <= host_hash31(h) < (1 << 31)
    assert len(url_md5(h)) == 32


# --- htmltext robustness (shared-kernel fuzz: the parser must never
# crash, and the P3∘P2 composition must keep its structural
# invariants on ARBITRARY input, not just well-formed fixtures) -----

_markup = st.text(
    alphabet=st.sampled_from(list("<>&;/=\"' abchilmnoprstuvé世#!-")),
    max_size=200,
)


@settings(max_examples=300, deadline=None)
@given(_markup)
def test_htmltext_kernels_never_crash_and_hold_invariants(s):
    from cloud_based_web_crawling_indexing_system_spark.functions.htmltext import (
        extract_links,
        extract_text_crawl,
        extract_text_index,
        extract_text_reference,
    )

    t_crawl = extract_text_crawl(s)
    t_index = extract_text_index(s)
    t_ref = extract_text_reference(s)
    links = extract_links(s, "http://h.example/a/b.html")
    # composition definition holds on every input
    assert t_ref == extract_text_index(t_crawl)
    # crawl text with '' separator never exceeds the input length
    # (tags/entities only shrink; entity decode maps &xx; -> 1 char)
    assert len(t_crawl) <= len(s)
    # index text separator discipline: single join, no leading/trailing
    # separator beyond what nodes carry — re-joining its own parse with
    # ' ' must be stable when no markup remains
    if "<" not in t_index and "&" not in t_index:
        assert extract_text_index(t_index) == t_index
    # every extracted link is defragmented (F4 applied before urljoin)
    assert all("#" not in l for l in links)


@settings(max_examples=200, deadline=None)
@given(_markup)
def test_term_freqs_kernel_never_crashes(s):
    from cloud_based_web_crawling_indexing_system_spark.functions.terms import (
        term_freqs,
    )

    for term, freq in term_freqs(s):
        assert term and freq >= 1
