"""HTML -> text / link extraction, faithful to the reference pipeline.

The reference uses BeautifulSoup with the ``html.parser`` builder:

- crawl-side text:  ``BeautifulSoup(html,'html.parser').get_text()``
  (/root/reference/Cloud/scripts/crawler_worker.py:181-182).  The
  reference pins NO bs4 version (requirements.txt:4 is bare
  ``beautifulsoup4``), so any current install gets bs4 >= 4.9.0
  (2020-04), where the html.parser builder stores ``<script>`` /
  ``<style>`` contents as ``Script``/``Stylesheet`` string subclasses
  that ``get_text()`` EXCLUDES (exact-type ``interesting_string_types``
  check; see the bs4 4.9.0 changelog / "NavigableString subclasses"
  docs).  So crawl text contains no script/style bodies.  (Pre-4.9
  bs4 included them; re-enabling that legacy mode is the one-line
  ``kind == _CDATA`` inclusion in ``extract_text_crawl``.)
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
  and attribute values.
- CONSECUTIVE data events coalesce into ONE text node, exactly like
  bs4's ``current_data`` buffer (flushed by ``endData()`` on every
  tag/comment/declaration/PI event): a literal ``<`` that fails to
  open a tag splits the stdlib event stream but NOT the node stream,
  so ``get_text(' ')`` must not insert separators around it.
- ``<script>``/``<style>`` bodies arrive as raw CDATA text nodes (no
  entity decoding) — excluded by ``get_text()`` (bs4 >= 4.9, above)
  and by ``decompose()``.
- comments / doctype / processing instructions are NOT text nodes but
  DO split adjacent text into separate nodes (bs4 flushes around
  them).
- ``get_text(sep)`` = ``sep.join`` over text nodes in document order.
- valueless attributes become ``''`` (bs4 HTMLParserTreeBuilder),
  duplicate attributes: last occurrence wins.
- ``<template>`` contents: bs4 >= 4.9 stores every text node inside a
  template subtree as ``TemplateString`` (the ``string_containers``
  map keys off the nearest open container tag on bs4's
  ``string_container_stack``, so nesting below the template does not
  escape it), and ``get_text()``'s exact-type ``NavigableString``
  check EXCLUDES them — modeled here via an open-tag stack with
  ``_popToTag`` semantics (pop through the most recent matching open
  tag; stray end tags are no-ops; void elements never sit on the
  stack).  Anchors inside templates ARE still collected — bs4's
  ``find_all('a')`` traverses template subtrees.  Known-divergence
  note (pinned in tests): for pathologically misnested markup bs4's
  exact pop behavior around tags it reparents is not fully modeled;
  the fuzz suite pins OUR behavior so any drift is deliberate.

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
_TEMPLATE = 2  # text inside a <template> subtree (TemplateString, bs4 >= 4.9)

# bs4 HTMLTreeBuilder.empty_element_tags: pushed then immediately
# popped, so they never sit on the open-tag stack
_VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input keygen link menuitem meta param "
    "source track wbr basefont bgsound command frame image isindex nextid "
    "spacer".split()
)


class _SoupEvents(HTMLParser):
    """Records the event stream bs4's html.parser builder consumes."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.texts: list[tuple[int, str]] = []  # (kind, data) in doc order
        self.anchors: list[dict[str, str]] = []  # attr dicts of <a> tags
        self._cdata_depth = 0  # inside <script>/<style>
        # open non-void tags, modeling bs4's tagStack/_popToTag just
        # far enough to know whether a <template> is open: bs4's
        # string_container_stack keys the container class off the
        # nearest open string-container tag, so EVERY text node inside
        # a template subtree (any nesting) becomes TemplateString
        self._open: list[str] = []
        self._n_template = 0  # count of 'template' entries in _open
        self._buf: list[str] = []  # bs4's current_data coalesce buffer
        self._buf_kind = _DATA

    def _flush(self) -> None:
        """bs4's ``endData()``: consecutive data events between any
        two structural events become ONE NavigableString."""
        if self._buf:
            self.texts.append((self._buf_kind, "".join(self._buf)))
            self._buf = []

    @staticmethod
    def _attr_dict(attrs) -> dict[str, str]:
        # bs4 HTMLParserTreeBuilder: last duplicate wins, None -> ''
        d: dict[str, str] = {}
        for k, v in attrs:
            d[k] = v if v is not None else ""
        return d

    # -- tags ---------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        self._flush()
        if tag in ("script", "style"):
            self._cdata_depth += 1
        if tag == "a":
            self.anchors.append(self._attr_dict(attrs))
        if tag not in _VOID_ELEMENTS:
            self._open.append(tag)
            if tag == "template":
                self._n_template += 1

    def handle_endtag(self, tag: str) -> None:
        self._flush()
        if tag in ("script", "style") and self._cdata_depth:
            self._cdata_depth -= 1
        # bs4 _popToTag: pop up to AND INCLUDING the most recent open
        # tag with this name; no open tag with the name -> nothing
        # popped (stray end tags are no-ops)
        if tag not in _VOID_ELEMENTS and tag in self._open:
            while self._open:
                t = self._open.pop()
                if t == "template":
                    self._n_template -= 1
                if t == tag:
                    break

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <a href=x/> still carries the attribute; script/style
        # self-closing tags have no CDATA body.
        self._flush()
        if tag == "a":
            self.anchors.append(self._attr_dict(attrs))

    # -- text nodes -----------------------------------------------------
    def handle_data(self, data: str) -> None:
        if data:
            # kind is stable within a run: tags flush the buffer and
            # only tags can toggle the cdata/template state
            if self._cdata_depth:
                self._buf_kind = _CDATA
            elif self._n_template:
                self._buf_kind = _TEMPLATE
            else:
                self._buf_kind = _DATA
            self._buf.append(data)

    # comments / doctype / PIs are not NavigableStrings, but they DO
    # split adjacent text runs (bs4 calls endData around each)
    def handle_comment(self, data: str) -> None:
        self._flush()

    def handle_decl(self, decl: str) -> None:
        self._flush()

    def handle_pi(self, data: str) -> None:
        self._flush()

    def unknown_decl(self, data: str) -> None:
        self._flush()

    def close(self) -> None:
        super().close()
        self._flush()


def parse_events(html: str) -> _SoupEvents:
    p = _SoupEvents()
    p.feed(html)
    p.close()
    return p


def extract_text_crawl(html: str) -> str:
    """P2: ``soup.get_text()`` — no separator; script/style bodies
    EXCLUDED (bs4 >= 4.9 Script/Stylesheet strings are not
    'interesting', see module docstring; the reference pins no bs4
    version so modern behavior governs, crawler_worker.py:181-182)."""
    ev = parse_events(html)
    return "".join(t for kind, t in ev.texts if kind == _DATA)


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
