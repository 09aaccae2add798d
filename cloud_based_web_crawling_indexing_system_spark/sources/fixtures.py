"""Deterministic synthetic web-corpus generator (FIXTURES.md).

Builds the three crawl input tables — ``pages``, ``robots``, ``seeds``
— as pandas DataFrames and/or parquet files.  Everything is a pure
function of (seed, scale): byte-stable across runs and machines.

Shape mirrors BASELINE.json:15: pages(url, warc_ts, html binary,
text, lang) where ``text`` is precomputed by the SAME reference
pipeline the engine's UDF implements (P3∘P2), so the byte-identical
check downstream is a column comparison.

Corpus properties exercised (FIXTURES.md §1):
- Zipf-skewed host sizes with one mega-host holding ~1/3 of pages
  (skew/salting tests) and single-page tail hosts;
- links mixing relative, absolute same-host, absolute cross-host,
  ``#fragment``, ``mailto:``/``ftp:`` (scheme-filtered), dangling
  (fetch-failure/retry), duplicates (in-batch dedup), ``href=""``;
- robots.txt per host: ~30% disallow a live path prefix, ~20% set
  Crawl-delay, ~10% absent (allow-on-error path);
- script/style blocks and HTML entities (double-decode quirk);
- zh/ar/es/de tokens to pin Python-``\\w`` tokenization.
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timedelta
from random import Random

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.htmltext import extract_text_reference

__all__ = ["gen_corpus", "write_corpus", "SCALES"]

SCALES = {
    "tiny": dict(n_hosts=8, n_pages=200),
    "small": dict(n_hosts=50, n_pages=5000),
    "bench": dict(n_hosts=500, n_pages=200_000),
}

_EPOCH = datetime(2024, 1, 1)

_WORDS_EN = (
    "running jumps relational conditional traditional crawling indexing "
    "engine frontier politeness agreement plastered motoring scheduled "
    "distributed computing happily flying skies dying rational national "
    "optimization generate generated generates probate controlling "
    "batch window spark order data column aggregate join small line "
    "customer query partition shuffle broadcast vector token stemming"
).split()
_WORDS_ES = "rápido señal año corazón música librería".split()
_WORDS_DE = "straße über größe fußball müller".split()
_WORDS_ZH = "网络 爬虫 索引 数据 分布式 计算".split()
_WORDS_AR = "شبكة زاحف فهرس بيانات حوسبة".split()
_LANG_WORDS = {"en": _WORDS_EN, "es": _WORDS_ES, "de": _WORDS_DE, "zh": _WORDS_ZH, "ar": _WORDS_AR}
_LANGS = ["en", "en", "en", "es", "de", "zh", "ar"]  # en-heavy


def _host_name(i: int) -> str:
    return f"host{i:04d}.example.org"


def _zipf_host_sizes(rng: Random, n_hosts: int, n_pages: int) -> list[int]:
    """Mega-host gets ~1/3 of pages; the rest Zipf(1.1)-ish; every
    host gets >=1 page."""
    if n_hosts < 1 or n_pages < n_hosts:
        raise ValueError(f"need n_pages >= n_hosts >= 1, got {n_hosts=} {n_pages=}")
    if n_hosts == 1:
        return [n_pages]
    mega = max(1, min(n_pages // 3, n_pages - (n_hosts - 1)))
    rest = n_pages - mega - (n_hosts - 1)
    weights = [1.0 / ((i + 2) ** 1.1) for i in range(n_hosts - 1)]
    wsum = sum(weights)
    sizes = [mega] + [1 + int(rest * w / wsum) for w in weights]
    # distribute rounding leftovers deterministically
    leftover = n_pages - sum(sizes)
    i = 0
    while leftover > 0:
        sizes[1 + (i % (n_hosts - 1))] += 1
        leftover -= 1
        i += 1
    assert sum(sizes) == n_pages
    return sizes


def _para(rng: Random, lang: str, n: int) -> str:
    words = _LANG_WORDS[lang]
    return " ".join(rng.choice(words) for _ in range(n))


def _page_html(rng: Random, lang: str, hrefs: list[str],
               para_words: tuple[int, int] = (8, 40), n_paras: tuple[int, int] = (1, 4)) -> str:
    title = _para(rng, "en", 3)
    body_paras = [
        f"<p>{_para(rng, lang, rng.randint(*para_words))}</p>"
        for _ in range(rng.randint(*n_paras))
    ]
    entity_bits = ""
    if rng.random() < 0.3:
        # entity double-decode quirk material: &amp;lt; -> &lt; -> <
        entity_bits = "<p>Tom &amp; Jerry &amp;lt;tag&amp;gt; caf&eacute;</p>"
    comment = "<!-- hidden comment text -->" if rng.random() < 0.3 else ""
    script = f"<script>var x = {rng.randint(0, 99)}; // tracker</script>" if rng.random() < 0.5 else ""
    style = "<style>body { color: red; }</style>" if rng.random() < 0.4 else ""
    anchor_tags = []
    for h in hrefs:
        label = _para(rng, "en", 2)
        anchor_tags.append(f'<a href="{h}">{label}</a>')
    if rng.random() < 0.1:
        anchor_tags.append("<a href>valueless</a>")  # href='' -> urljoin(base,'')
    body = "\n".join(body_paras + anchor_tags)
    return (
        f"<html><head><title>{title}</title>{script}{style}</head>"
        f"<body>{comment}\n{body}\n</body></html>"
    )


def gen_corpus(scale: str = "tiny", seed: int = 42, n_hosts: int | None = None,
               n_pages: int | None = None) -> dict[str, pd.DataFrame]:
    if scale not in SCALES:
        raise ValueError(f"unknown scale {scale!r}; one of {sorted(SCALES)}")
    cfg = SCALES[scale].copy()
    if n_hosts:
        cfg["n_hosts"] = n_hosts
    if n_pages:
        cfg["n_pages"] = n_pages
    H, P = cfg["n_hosts"], cfg["n_pages"]
    rng = Random(seed)

    sizes = _zipf_host_sizes(rng, H, P)
    hosts = [_host_name(i) for i in range(H)]
    # robots decisions per host
    robots_rows = []
    disallowed: dict[str, str | None] = {}
    delays: dict[str, float | None] = {}
    for i, h in enumerate(hosts):
        r = rng.random()
        if r < 0.10:
            # robots fetch fails -> absent row -> allow-all
            disallowed[h] = None
            delays[h] = None
            continue
        lines = ["User-agent: *"]
        dis = None
        if rng.random() < 0.30:
            dis = "/private"
            lines.append(f"Disallow: {dis}")
        delay = None
        if rng.random() < 0.20:
            delay = rng.choice([0.5, 1.0, 2.0])
            lines.append(f"Crawl-delay: {delay}")
        disallowed[h] = dis
        delays[h] = delay
        robots_rows.append({"host": h, "robots_txt": "\n".join(lines) + "\n",
                            "crawl_delay": delay})

    # page paths per host (mega-host includes /private pages when disallowed)
    host_paths: dict[str, list[str]] = {}
    for h, size in zip(hosts, sizes):
        paths = ["/"]
        for j in range(1, size):
            if disallowed.get(h) and j % 7 == 3:
                paths.append(f"/private/p{j:05d}.html")
            else:
                paths.append(f"/page{j:05d}.html")
        host_paths[h] = paths

    # build pages
    rows = []
    for hi, h in enumerate(hosts):
        paths = host_paths[h]
        for pi, path in enumerate(paths):
            lang = _LANGS[(hi * 13 + pi) % len(_LANGS)]
            hrefs: list[str] = []
            # same-host links: relative + absolute, biased to children of '/'
            n_same = min(len(paths) - 1, rng.randint(2, 6)) if len(paths) > 1 else 0
            for _ in range(n_same):
                tgt = paths[rng.randrange(len(paths))]
                if rng.random() < 0.5:
                    hrefs.append(tgt)  # absolute-path relative href
                else:
                    hrefs.append(f"http://{h}{tgt}")
            # root is a hub; every page chains to the next one — so a
            # depth-5 domain crawl reaches most of a host (bench needs
            # realistic BFS growth, not islands)
            if path == "/" and len(paths) > 1:
                for tgt in paths[1 : min(len(paths), 30)]:
                    hrefs.append(tgt)
            if pi + 1 < len(paths):
                hrefs.append(paths[pi + 1])
            # cross-host
            for _ in range(rng.randint(0, 3)):
                oh = hosts[rng.randrange(H)]
                opaths = host_paths[oh]
                hrefs.append(f"http://{oh}{opaths[rng.randrange(len(opaths))]}")
            # fragments / off-scheme / dangling / duplicates
            if rng.random() < 0.4 and hrefs:
                hrefs.append(hrefs[0] + "#section-2")
            if rng.random() < 0.3:
                hrefs.append("mailto:admin@example.org")
            if rng.random() < 0.2:
                hrefs.append("ftp://files.example.org/pub")
            if rng.random() < 0.25:
                hrefs.append(f"/missing{rng.randint(0, 9999):05d}.html")
            if rng.random() < 0.3 and hrefs:
                hrefs.append(hrefs[rng.randrange(len(hrefs))])  # duplicate
            html = _page_html(rng, lang, hrefs)
            url = f"http://{h}{path}"
            rows.append(
                {
                    "url": url,
                    "warc_ts": _EPOCH + timedelta(seconds=hi * 86400 + pi * 7),
                    "html": html.encode("utf-8"),
                    "text": extract_text_reference(html),
                    "lang": lang,
                }
            )
    pages = pd.DataFrame(rows)

    # seeds: mega-host root (domain job), a mid host root, a deep-path
    # job, a duplicate seed, and an off-corpus seed (fetch fails)
    seed_urls = [
        f"http://{hosts[0]}/",
        f"http://{hosts[min(1, H - 1)]}/",
        f"http://{hosts[min(2, H - 1)]}{host_paths[hosts[min(2, H - 1)]][min(1, len(host_paths[hosts[min(2, H - 1)]]) - 1)]}",
        f"http://{hosts[0]}/",  # duplicate (order-preserving dedup D3)
        "http://nonexistent.example.net/",
    ]
    seed_rows = []
    for i, su in enumerate(seed_urls):
        seed_rows.append(
            {
                "job_id": str(uuid.UUID(int=seed * 1000 + i)),
                "seed_url": su,
                "depth_limit": [9, 4, 2, 3, 5][i % 5],  # 9 exercises the [1,5] clamp (F8)
                "seed_idx": i,
                "created_at": _EPOCH,
            }
        )
    from urllib.parse import urlparse

    for r in seed_rows:
        r["domain"] = urlparse(r["seed_url"]).path in ("", "/")  # F7
    seeds = pd.DataFrame(seed_rows)

    robots = pd.DataFrame(robots_rows, columns=["host", "robots_txt", "crawl_delay"])
    return {"pages": pages, "robots": robots, "seeds": seeds}


_SCHEMAS = {
    "pages": pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    ),
    "robots": pa.schema(
        [("host", pa.string()), ("robots_txt", pa.string()), ("crawl_delay", pa.float64())]
    ),
    "seeds": pa.schema(
        [
            ("job_id", pa.string()),
            ("seed_url", pa.string()),
            ("depth_limit", pa.int32()),
            ("domain", pa.bool_()),
            ("seed_idx", pa.int32()),
            ("created_at", pa.timestamp("us")),
        ]
    ),
}


def write_corpus(out_dir: str, scale: str = "tiny", seed: int = 42, **kw) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    dfs = gen_corpus(scale=scale, seed=seed, **kw)
    paths = {}
    for name, df in dfs.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        table = pa.Table.from_pandas(df, schema=_SCHEMAS[name], preserve_index=False)
        pq.write_table(table, path)
        paths[name] = path
    return paths
