"""Semantic property tests on the oracle (engine parity to the oracle
is proven separately, so properties proven here hold for the engine):
politeness budgets never exceeded, dedup idempotence, retry caps."""

import pandas as pd

from cloud_based_web_crawling_indexing_system_spark.functions.robots import RobotsRules
from cloud_based_web_crawling_indexing_system_spark.oracle import CrawlConfig, crawl_oracle
from cloud_based_web_crawling_indexing_system_spark.sources.fixtures import gen_corpus


def _fixture():
    return gen_corpus(scale="tiny", seed=42)


def test_politeness_budget_never_exceeded():
    """The token bucket, asserted EXACTLY from the oracle's admit log:
    per (round, host), admitted == min(budget, passing rows), and the
    budget matches crawl_delay-or-default arithmetic."""
    dfs = _fixture()
    cfg = CrawlConfig(round_budget_s=5.0)
    res = crawl_oracle(dfs["pages"], dfs["robots"], dfs["seeds"], cfg)
    rules = {r.host: RobotsRules(r.robots_txt) for r in dfs["robots"].itertuples()}
    log = pd.DataFrame(res.admit_log)
    assert not log.empty and log["admitted"].any() and (~log["admitted"]).any()
    for (rnd, host), grp in log.groupby(["round", "host"]):
        cd = rules[host].crawl_delay if host in rules else None
        delay = cd if cd is not None else cfg.default_delay
        budget = max(1, int(cfg.round_budget_s / delay))
        assert set(grp["budget"]) == {budget}
        n_admitted = int(grp["admitted"].sum())
        assert n_admitted == min(budget, len(grp))
    # total deferrals in metrics == deferred rows in the admit log
    total_deferred = sum(m["n_deferred"] for m in res.metrics)
    assert total_deferred == int((~log["admitted"]).sum())


def test_default_delay_knob_changes_budget():
    """cfg.default_delay is honored for hosts with no robots AND hosts
    whose robots lack a crawl-delay (the reference's DELAY env)."""
    dfs = _fixture()
    slow = crawl_oracle(dfs["pages"], dfs["robots"], dfs["seeds"],
                        CrawlConfig(round_budget_s=6.0, default_delay=3.0))
    fast = crawl_oracle(dfs["pages"], dfs["robots"], dfs["seeds"],
                        CrawlConfig(round_budget_s=6.0, default_delay=1.0))
    rules = {r.host: RobotsRules(r.robots_txt) for r in dfs["robots"].itertuples()}
    slog = pd.DataFrame(slow.admit_log)
    flog = pd.DataFrame(fast.admit_log)
    defaulted_hosts = {
        h for h in set(slog["host"])
        if h not in rules or rules[h].crawl_delay is None
    }
    assert defaulted_hosts  # fixture must exercise the fallback
    assert set(slog[slog["host"].isin(defaulted_hosts)]["budget"]) == {2}
    assert set(flog[flog["host"].isin(defaulted_hosts)]["budget"]) == {6}
    # throttling can only delay discovery (a url first reached at a
    # deeper depth may lose descendants at the depth limit), so the
    # throttled seen set is a subset — never a superset
    assert set(slow.seen.keys()) <= set(fast.seen.keys())


def test_tries_capped_at_three():
    dfs = _fixture()
    res = crawl_oracle(dfs["pages"], dfs["robots"], dfs["seeds"], CrawlConfig())
    log = pd.DataFrame(res.frontier_log)
    assert log["tries"].max() < 3  # F9/C2: dropped after 3 attempts


def test_dedup_idempotence_and_seen_consistency():
    dfs = _fixture()
    res = crawl_oracle(dfs["pages"], dfs["robots"], dfs["seeds"], CrawlConfig())
    log = pd.DataFrame(res.frontier_log)
    # every frontier url is in seen; a (url, depth) pair enters the
    # frontier at most once per (round, tries) — no duplicate discovery
    assert set(log["url_hash"]) <= set(res.seen.keys())
    fresh = log[log["tries"] == 0]
    first = fresh.groupby("url_hash")["round"].min()
    # a url with tries=0 appears in exactly one round, EXCEPT deferrals
    # (politeness), which carry tries=0 across rounds — so instead
    # assert the url's first appearance matches its seen first_round
    # recorded at discovery time
    for uh, rnd in first.items():
        assert res.seen[uh][1] <= rnd


def test_politeness_off_drains_faster():
    dfs = _fixture()
    fast = crawl_oracle(dfs["pages"], dfs["robots"], dfs["seeds"],
                        CrawlConfig(politeness=False))
    slow = crawl_oracle(dfs["pages"], dfs["robots"], dfs["seeds"],
                        CrawlConfig(round_budget_s=3.0))
    assert fast.rounds <= slow.rounds
    # deferral can only DELAY discovery, so a url's discovery depth is
    # >= the un-throttled depth — descendants can drop out at the depth
    # limit but never appear from nowhere: throttled seen ⊆ open seen
    assert set(slow.seen.keys()) <= set(fast.seen.keys())


def test_salted_window_equals_unsalted(spark):
    """The salted two-phase rank (mega-host skew path, taken when a
    round is large) must produce EXACTLY the unsalted window's
    admit/defer decisions — phase 2 sees every salt's top-budget rows,
    so no admissible row can be lost."""
    import random

    from pyspark.sql import functions as F

    from cloud_based_web_crawling_indexing_system_spark.operators.politeness import (
        admit_defer,
    )

    rng = random.Random(7)
    rows = []
    hosts = [f"h{i}" for i in range(9)]
    budgets = {h: rng.randint(1, 6) for h in hosts}
    budgets["h0"] = 2  # mega-host: many rows, tiny budget
    for i in range(3000):
        h = "h0" if i % 2 == 0 else rng.choice(hosts)
        rows.append(
            (h, rng.randint(0, 4), f"http://{h}.org/p{rng.randint(0, 10_000):05d}",
             budgets[h], f"job{i % 3}", i % 7)
        )
    df = spark.createDataFrame(
        rows, "host string, depth int, url string, budget int, job_id string, seed_idx int"
    ).dropDuplicates(["host", "depth", "url", "job_id", "seed_idx"])

    def decisions(salts):
        out = admit_defer(df, "budget", salts=salts)
        return sorted(
            (r["host"], r["depth"], r["url"], r["job_id"], r["seed_idx"], r["admitted"])
            for r in out.collect()
        )

    unsalted = decisions(1)
    assert decisions(8) == unsalted
    assert decisions(3) == unsalted
    # budgets actually bind: every host admits exactly min(budget, n)
    import collections

    per_host = collections.Counter(h for h, *_rest, adm in unsalted if adm)
    n_host = collections.Counter(h for h, *_ in unsalted)
    for h in n_host:
        assert per_host[h] == min(budgets[h], n_host[h])
