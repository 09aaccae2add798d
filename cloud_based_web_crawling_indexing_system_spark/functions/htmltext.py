"""HTML -> text / link extraction, faithful to the reference pipeline.

The reference uses BeautifulSoup with the ``html.parser`` builder:

- crawl-side text:  ``BeautifulSoup(html,'html.parser').get_text()``
  (/root/reference/Cloud/scripts/crawler_worker.py:181-182) — note NO
  separator and NO script/style strip, so script/style bodies are
  *included*.
- index-side text: re-parse the crawl-side text, ``decompose()`` every
  ``<script>``/``<style>`` tag, then ``get_text(separator=' ')``
  (/root/reference/Cloud/scripts/indexer_worker.py:135-138).  Because
  the crawl-side pass already removed all tags, the strip is a no-op
  on real data, but entities get a SECOND decode pass and stray ``<``
  characters can open bogus tags — quirks preserved here.
- links: ``soup.find_all('a', href=True)`` then
  ``urljoin(url, href.split('#')[0])``
  (/root/reference/Cloud/scripts/crawler_worker.py:194-202).

bs4 is not available in this environment, so this module reimplements
the exact event stream bs4's ``html.parser`` tree builder sees, using
the same stdlib ``html.parser.HTMLParser`` bs4 wraps:

- ``convert_charrefs=True`` (bs4 default): entities decoded in text
  and attribute values; runs of text+charrefs coalesce into single
  text nodes, split only at tags/comments/declarations.
- ``<script>``/``<style>`` bodies arrive as raw CDATA text nodes (no
  entity decoding) — included by ``get_text()``, excluded after
  ``decompose()``.
- comments / doctype / processing instructions are NOT text nodes.
- ``get_text(sep)`` = ``sep.join`` over text nodes in document order.
- valueless attributes become ``''`` (bs4 HTMLParserTreeBuilder),
  duplicate attributes: last occurrence wins.

The same functions run inside the engine's Arrow UDFs
(functions/udfs.py) and inside the single-threaded oracle
(oracle.py), so the byte-identical-text invariant compares the
distributed Arrow path against a plain-Python execution of this exact
code.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

__all__ = [
    "parse_events",
    "extract_text_crawl",
    "extract_text_index",
    "extract_text_reference",
    "extract_links",
]

# text-node kinds
_DATA = 0  # regular text node (entities decoded)
_CDATA = 1  # raw text inside <script>/<style>


class _SoupEvents(HTMLParser):
    """Records the event stream bs4's html.parser builder consumes."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.texts: list[tuple[int, str]] = []  # (kind, data) in doc order
        self.anchors: list[dict[str, str]] = []  # attr dicts of <a> tags
        self._cdata_depth = 0  # inside <script>/<style>

    # -- tags ---------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in ("script", "style"):
            self._cdata_depth += 1
        if tag == "a":
            d: dict[str, str] = {}
            for k, v in attrs:  # last duplicate wins, None -> ''
                d[k] = v if v is not None else ""
            self.anchors.append(d)

    def handle_endtag(self, tag: str) -> None:
        if tag in ("script", "style") and self._cdata_depth:
            self._cdata_depth -= 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <a href=x/> still carries the attribute; script/style
        # self-closing tags have no CDATA body.
        if tag == "a":
            d: dict[str, str] = {}
            for k, v in attrs:
                d[k] = v if v is not None else ""
            self.anchors.append(d)

    # -- text nodes -----------------------------------------------------
    def handle_data(self, data: str) -> None:
        if data:
            kind = _CDATA if self._cdata_depth else _DATA
            self.texts.append((kind, data))

    # comments / doctype / PIs are not NavigableStrings -> ignored
    def handle_comment(self, data: str) -> None:  # pragma: no cover
        pass

    def handle_decl(self, decl: str) -> None:  # pragma: no cover
        pass

    def handle_pi(self, data: str) -> None:  # pragma: no cover
        pass

    def unknown_decl(self, data: str) -> None:  # pragma: no cover
        pass


def parse_events(html: str) -> _SoupEvents:
    p = _SoupEvents()
    p.feed(html)
    p.close()
    return p


def extract_text_crawl(html: str) -> str:
    """P2: ``soup.get_text()`` — all text nodes, no separator, script
    and style bodies included (crawler_worker.py:181-182)."""
    ev = parse_events(html)
    return "".join(t for _, t in ev.texts)


def extract_text_index(content: str) -> str:
    """P3: re-parse ``content`` as HTML, drop script/style subtrees,
    ``get_text(separator=' ')`` (indexer_worker.py:135-138)."""
    ev = parse_events(content)
    return " ".join(t for kind, t in ev.texts if kind == _DATA)


def extract_text_reference(html: str) -> str:
    """The composed Cloud pipeline P3∘P2 applied to raw html — the
    byte-identical per-row invariant binds to this function."""
    return extract_text_index(extract_text_crawl(html))


def extract_links(html: str, base_url: str) -> list[str]:
    """P1+F4, Cloud variant: ``urljoin(url, href.split('#')[0])`` for
    every ``<a>`` carrying an href attribute (even ``href=""``),
    document order, duplicates preserved
    (crawler_worker.py:194-196)."""
    ev = parse_events(html)
    out: list[str] = []
    for attrs in ev.anchors:
        if "href" in attrs:
            try:
                out.append(urljoin(base_url, attrs["href"].split("#")[0]))
            except ValueError:
                # urljoin raises on some malformed IPv6-ish hrefs; the
                # reference would crash the thread and drop the task —
                # we drop the single link instead.
                continue
    return out
