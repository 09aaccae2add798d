"""Spark-parallel synthetic web-corpus generator for BENCH scales.

The sequential generator (fixtures.py) threads one RNG through every
page — inherently serial.  This generator re-keys all randomness so
each page is a pure function of (seed, host_idx, page_idx): the
driver computes only the tiny per-host metadata (Zipf sizes, robots
decisions), and the page HTML + the oracle-extracted text render
inside an Arrow ``mapInPandas`` stage across all cores.  200k+ pages
generate in well under a minute on local[32]; the output is byte-
stable for a given (seed, n_hosts, n_pages) regardless of
parallelism (content depends only on the key, and files are written
partitioned by a deterministic key range).

Pages are deliberately heavier than the unit-test corpus (several KB
of text each) so crawl benchmarks measure real parse/index work, not
scheduler overhead.
"""

from __future__ import annotations

import os
from datetime import timedelta
from random import Random

import pandas as pd

from ..functions.htmltext import extract_text_reference
from .fixtures import (
    _EPOCH,
    _LANGS,
    _host_name,
    _page_html,
    _zipf_host_sizes,
)

__all__ = ["write_corpus_spark"]


def _host_meta(seed: int, n_hosts: int, n_pages: int) -> pd.DataFrame:
    sizes = _zipf_host_sizes(Random(seed), n_hosts, n_pages)
    rows = []
    for i in range(n_hosts):
        h = _host_name(i)
        r = Random(f"{seed}|robots|{h}")
        x = r.random()
        if x < 0.10:
            robots_txt, dis, delay = None, False, None
        else:
            lines = ["User-agent: *"]
            dis = r.random() < 0.30
            if dis:
                lines.append("Disallow: /private")
            delay = r.choice([0.5, 1.0, 2.0]) if r.random() < 0.20 else None
            if delay is not None:
                lines.append(f"Crawl-delay: {delay}")
            robots_txt = "\n".join(lines) + "\n"
        rows.append(
            {"host_idx": i, "host": h, "size": sizes[i], "disallow": dis,
             "robots_txt": robots_txt, "crawl_delay": delay}
        )
    return pd.DataFrame(rows)


def _path(disallow: bool, j: int) -> str:
    if j == 0:
        return "/"
    if disallow and j % 7 == 3:
        return f"/private/p{j:05d}.html"
    return f"/page{j:05d}.html"


def write_corpus_spark(
    spark,
    out_dir: str,
    n_hosts: int,
    n_pages: int,
    seed: int = 42,
    para_words: tuple[int, int] = (40, 120),
    n_paras: tuple[int, int] = (3, 8),
    n_seed_jobs: int = 4,
    p_dangling: float = 0.2,
) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    meta = _host_meta(seed, n_hosts, n_pages)

    import pyarrow as pa
    import pyarrow.parquet as pq

    from .fixtures import _SCHEMAS

    # tiny dims written driver-side (us-timestamps — Spark can't read
    # pandas' default nanosecond parquet timestamps)
    robots = meta[meta.robots_txt.notna()][["host", "robots_txt", "crawl_delay"]]
    pq.write_table(
        pa.Table.from_pandas(robots, schema=_SCHEMAS["robots"], preserve_index=False),
        os.path.join(out_dir, "robots.parquet"),
    )

    import uuid
    from urllib.parse import urlparse

    seed_urls = [f"http://{meta.host.iloc[i % n_hosts]}/" for i in range(n_seed_jobs)]
    seeds = pd.DataFrame(
        {
            "job_id": [str(uuid.UUID(int=seed * 1000 + i)) for i in range(n_seed_jobs)],
            "seed_url": seed_urls,
            "depth_limit": [5] * n_seed_jobs,
            "domain": [urlparse(u).path in ("", "/") for u in seed_urls],
            "seed_idx": list(range(n_seed_jobs)),
            "created_at": [_EPOCH] * n_seed_jobs,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(seeds, schema=_SCHEMAS["seeds"], preserve_index=False),
        os.path.join(out_dir, "seeds.parquet"),
    )

    # page keys: (host_idx, page_idx) exploded JVM-side, rendered in pandas
    sizes = {int(r.host_idx): int(r.size) for r in meta.itertuples()}
    dis = {int(r.host_idx): bool(r.disallow) for r in meta.itertuples()}
    hosts = {int(r.host_idx): r.host for r in meta.itertuples()}
    bc = spark.sparkContext.broadcast(
        (sizes, dis, hosts, seed, para_words, n_paras, p_dangling)
    )

    keys = spark.createDataFrame(
        pd.DataFrame(
            [(hi, pi) for hi, sz in sizes.items() for pi in range(sz)],
            columns=["host_idx", "page_idx"],
        )
    ).repartitionByRange(
        # range partitioning on the pure key makes the FILE layout (not
        # just row content) deterministic across parallelism levels —
        # plain repartition() round-robins from the input chunking,
        # which varies with defaultParallelism
        max(8, int(spark.conf.get("spark.sql.shuffle.partitions"))),
        "host_idx",
        "page_idx",
    )

    def render(batches):
        sizes, dis, hosts, seed, para_words, n_paras, p_dangling = bc.value
        H = len(hosts)
        for pdf in batches:
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for hi, pi in zip(pdf["host_idx"], pdf["page_idx"]):
                hi, pi = int(hi), int(pi)
                h = hosts[hi]
                sz = sizes[hi]
                rng = Random(f"{seed}|{h}|{pi}")
                path = _path(dis[hi], pi)
                lang = _LANGS[(hi * 13 + pi) % len(_LANGS)]
                hrefs: list[str] = []
                # hub root + next-chain + random same-host + cross-host
                if pi == 0 and sz > 1:
                    hrefs += [_path(dis[hi], j) for j in range(1, min(sz, 80))]
                if pi + 1 < sz:
                    hrefs.append(_path(dis[hi], pi + 1))
                for _ in range(rng.randint(2, 6)):
                    hrefs.append(_path(dis[hi], rng.randrange(sz)))
                for _ in range(rng.randint(0, 3)):
                    oh = rng.randrange(H)
                    hrefs.append(
                        f"http://{hosts[oh]}{_path(dis[oh], rng.randrange(sizes[oh]))}"
                    )
                if rng.random() < 0.3 and hrefs:
                    hrefs.append(hrefs[0] + "#frag")
                if rng.random() < 0.2:
                    hrefs.append("mailto:admin@example.org")
                if rng.random() < p_dangling:
                    hrefs.append(f"/missing{rng.randint(0, 99999):06d}.html")
                html = _page_html(rng, lang, hrefs,
                                  para_words=para_words, n_paras=n_paras)
                urls.append(f"http://{h}{path}")
                tss.append(_EPOCH + timedelta(seconds=hi * 86400 + pi * 7))
                htmls.append(html.encode("utf-8"))
                texts.append(extract_text_reference(html))
                langs.append(lang)
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
            )

    pages = keys.mapInPandas(
        render, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    pages.write.mode("overwrite").parquet(os.path.join(out_dir, "pages.parquet"))
    return {
        "pages": os.path.join(out_dir, "pages.parquet"),
        "robots": os.path.join(out_dir, "robots.parquet"),
        "seeds": os.path.join(out_dir, "seeds.parquet"),
    }
