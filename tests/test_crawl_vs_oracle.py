"""Engine-vs-oracle parity: the core correctness gate (SURVEY.md §5.1).

Runs the distributed engine and the sequential reference-faithful
oracle on the same deterministic corpus and asserts:

- byte-identical extracted text per url (the per-row invariant,
  BASELINE.json:15);
- final URL-seen set equality (url_hash -> url, first_round);
- per-round frontier equality in canonical order (crawl ordering,
  BASELINE.json:14);
- postings equality (term, job_id, url, frequency);
- per-round metric equality (fetched/blocked/deferred/missed/new...);
- search-result equality over a grammar-covering query corpus.
"""

import pandas as pd
import pytest

from cloud_based_web_crawling_indexing_system_spark.functions.urlnorm import host_hash31
from cloud_based_web_crawling_indexing_system_spark.operators.crawl import CrawlRun
from cloud_based_web_crawling_indexing_system_spark.oracle import (
    CrawlConfig,
    crawl_oracle,
    search_oracle,
)
from cloud_based_web_crawling_indexing_system_spark.plans.search_query import compile_search

CFG = CrawlConfig(round_budget_s=8.0)  # small budget -> deferrals exercised

QUERIES = [
    "running",
    "data engine",
    "data or engine",
    "data not slow",
    '"data engine"',
    '"crawling indexing engine"',  # 3-word phrase -> must be empty
    "data and engine",
    "data data",  # duplicate-term AND quirk -> empty
    "fast not",  # trailing 'not' becomes an include term
    "",
]


@pytest.fixture(scope="module")
def both(spark, tiny_corpus, tmp_path_factory):
    pages = pd.read_parquet(tiny_corpus["pages"])
    robots = pd.read_parquet(tiny_corpus["robots"])
    seeds = pd.read_parquet(tiny_corpus["seeds"])
    oracle = crawl_oracle(pages, robots, seeds, CFG)

    root = str(tmp_path_factory.mktemp("crawlrun"))
    run = CrawlRun(spark, root, CFG)
    run.init(
        tiny_corpus["pages"],
        spark.read.parquet(tiny_corpus["robots"]),
        spark.read.parquet(tiny_corpus["seeds"]),
    )
    engine_metrics = run.run()
    return oracle, run, engine_metrics


def test_rounds_and_metrics_match(both):
    oracle, run, em = both
    assert len(em) == len(oracle.metrics)
    for e, o in zip(em, oracle.metrics):
        for k in ("n_in", "n_blocked", "n_deferred", "n_fetched", "n_missed",
                  "n_failed", "n_disc", "n_new", "n_indexed", "n_postings"):
            assert e[k] == o[k], f"round {o['round']} metric {k}: engine {e[k]} oracle {o[k]}"


def test_byte_identical_text_per_url(both):
    oracle, run, _ = both
    got = {r["url"]: r["index_text"] for r in run.texts_df().select("url", "index_text").collect()}
    assert set(got) == set(oracle.texts)
    for url, expected_bytes in oracle.texts.items():
        assert got[url].encode("utf-8") == expected_bytes, f"text mismatch for {url}"


def test_texts_match_precomputed_fixture_column(both, tiny_corpus):
    # fixture 'text' column was precomputed by the same reference
    # pipeline at generation time — engine must reproduce it exactly
    oracle, run, _ = both
    pages = pd.read_parquet(tiny_corpus["pages"]).set_index("url")
    got = {r["url"]: r["index_text"] for r in run.texts_df().select("url", "index_text").collect()}
    for url, text in got.items():
        assert text == pages.loc[url, "text"]


def test_seen_set_equality(both):
    oracle, run, _ = both
    got = {
        r["url_hash"]: (r["url"], r["first_round"])
        for r in run.seen_df().select("url_hash", "url", "first_round").collect()
    }
    assert got == oracle.seen


def test_frontier_per_round_canonical_order(both):
    oracle, run, _ = both
    rows = run.frontier_log_df().select(
        "round", "job_id", "url", "url_hash", "host", "depth", "tries"
    ).collect()
    by_round: dict[int, list] = {}
    for r in rows:
        by_round.setdefault(r["round"], []).append(r)
    # canonical order within each round
    engine_log = []
    for rnd in sorted(by_round):
        rs = sorted(by_round[rnd], key=lambda r: (host_hash31(r["host"]), r["depth"], r["url"]))
        engine_log.extend(
            {"round": rnd, "job_id": r["job_id"], "url": r["url"], "url_hash": r["url_hash"],
             "host": r["host"], "depth": r["depth"], "tries": r["tries"]}
            for r in rs
        )
    # drop the terminal empty round the engine may commit
    oracle_log = oracle.frontier_log
    assert engine_log == oracle_log


def test_postings_equality(both):
    oracle, run, _ = both
    got = {
        (r["term"], r["job_id"], r["url"]): r["frequency"]
        for r in run.postings_df().collect()
    }
    exp = {}
    for p in oracle.postings:
        exp[(p["term"], p["job_id"], p["url"])] = exp.get((p["term"], p["job_id"], p["url"]), 0) + p["frequency"]
    assert got == exp


def test_per_job_counters_match(both):
    """A3 per-job attribution: the engine's stage='job' metric rows sum
    to the reference jobs-table counters the oracle maintains
    (discovered_count/indexed_count, crawler_worker.py:171-177,
    indexer_worker.py:166-169)."""
    oracle, run, _ = both
    got = {}
    for r in run.job_counters_df().collect():
        d = got.setdefault(r["job_id"], {"discovered": 0, "indexed": 0})
        key = "discovered" if r["key"] == "n_fetched" else "indexed"
        d[key] += r["value"]
    exp = {
        j: dict(c) for j, c in oracle.job_counters.items()
        if c["discovered"] or c["indexed"]  # zero-count jobs emit no rows
    }
    assert got == exp
    assert len(got) > 1, "fixture must exercise MULTI-job attribution"


@pytest.mark.parametrize("q", QUERIES)
def test_search_parity(both, spark, q):
    oracle, run, _ = both
    postings = run.postings_df()
    got = [(r["url"], r["frequency"]) for r in compile_search(spark, postings, q).collect()]
    exp = search_oracle(oracle.postings, q)
    assert got == exp, f"query {q!r}"
