"""Smoke test for the reference-verb façade (api.CrawlService):
start-job -> crawl -> search -> monitor -> health in one lifecycle,
mirroring the master's four HTTP verbs (master.py:68-242)."""

import pandas as pd

from cloud_based_web_crawling_indexing_system_spark.api import (
    CrawlService,
    parse_seed_submission,
)
from cloud_based_web_crawling_indexing_system_spark.oracle import (
    CrawlConfig,
    crawl_oracle,
    search_oracle,
)


def test_parse_seed_submission_order_preserving_dedup():
    # master.py:117 list(dict.fromkeys(manual + file))
    got = parse_seed_submission(
        "http://a/\n\n http://b/ \nhttp://a/", "http://c/\nhttp://b/"
    )
    assert got == ["http://a/", "http://b/", "http://c/"]
    assert parse_seed_submission(None, None) == []


def test_full_lifecycle(spark, tiny_corpus):
    import tempfile

    seeds_pdf = pd.read_parquet(tiny_corpus["seeds"])
    manual = "\n".join(seeds_pdf.seed_url)
    svc = CrawlService(
        spark,
        tempfile.mkdtemp(prefix="svc"),
        tiny_corpus["pages"],
        spark.read.parquet(tiny_corpus["robots"]),
        CrawlConfig(round_budget_s=1e9),
    )
    # POST /jobs: empty submission errors like master.py:118-119
    assert "error" in svc.start_job("")
    job = svc.start_job(manual_text=manual, depth_limit=2)
    # one job per seed url, like master.py:124-141
    assert len(job["jobIds"]) == job["seeds"] == len(set(seeds_pdf.seed_url))

    # GET /jobs/<id> works immediately after POST (reference inserts
    # the row at submission time, master.py:129-136)
    pre = svc.job_status(job["jobIds"][0])
    assert pre["status"] == "PENDING" and pre["discoveredCount"] == 0
    assert pre["seedUrl"] and pre["createdAt"] > 0

    metrics = svc.crawl()
    # createdAt is the SUBMISSION timestamp and survives the crawl
    # (the reference stamps the jobs row at POST time, master.py:129-136)
    assert svc.job_status(job["jobIds"][0])["createdAt"] == pre["createdAt"]
    assert metrics and sum(m["n_fetched"] for m in metrics) > 0

    # GET /search matches the oracle over the same corpus
    cfg = CrawlConfig(round_budget_s=1e9, depth_clamp=(1, 5))
    oracle = crawl_oracle(
        pd.read_parquet(tiny_corpus["pages"]),
        pd.read_parquet(tiny_corpus["robots"]),
        pd.read_parquet(tiny_corpus["seeds"]).assign(depth_limit=2),
        cfg,
    )
    got = svc.search("data engine", limit=10)
    exp = [
        {"pageUrl": u, "frequency": f}
        for u, f in search_oracle(oracle.postings, "data engine")[:10]
    ]
    assert got == exp

    # GET /search default is BOUNDED: a top-k TakeOrdered plan, never a
    # full-result collect (master's SQL has no LIMIT; at 10^10 urls an
    # unbounded collect OOMs the driver)
    plan = svc.run.search("data or engine", limit=50)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrdered" in plan
    # unbounded=True streams the faithful full result set as a
    # GENERATOR (driver memory bounded end-to-end — never a list)
    full = svc.search("data or engine", unbounded=True)
    assert not isinstance(full, list)
    exp_full = [
        {"pageUrl": u, "frequency": f}
        for u, f in search_oracle(oracle.postings, "data or engine")
    ]
    assert list(full) == exp_full

    # GET /jobs/<job_id>: per-job counters match the oracle jobs table,
    # keyed by seed url (the facade mints its own uuids per seed)
    exp_by_seed = {}
    for i, jid in enumerate(seeds_pdf.job_id):
        # first-wins: a DUPLICATE seed's job gets zero fetches (D3
        # drops its frontier row), exactly like the facade's dedup
        exp_by_seed.setdefault(seeds_pdf.seed_url.iloc[i], oracle.job_counters[jid])
    for jid in job["jobIds"]:
        st = svc.job_status(jid)
        assert st["jobId"] == jid and st["status"] == "PENDING"
        assert st["depthLimit"] == 2 and st["createdAt"] > 0
        exp = exp_by_seed[st["seedUrl"]]
        assert st["discoveredCount"] == exp["discovered"]
        assert st["indexedCount"] == exp["indexed"]
    assert any(svc.job_status(j)["discoveredCount"] > 0 for j in job["jobIds"])
    assert svc.job_status("no-such-job") == {"error": "Job not found"}

    # GET /nodes: every partition that committed parse output is alive
    nd = svc.nodes()
    assert nd and all(v == "alive" for v in nd.values())

    # GET /suggest: offline index-vocabulary autocomplete (O3)
    assert svc.suggest("") == []  # blank -> [] like master.py:77
    sug = svc.suggest("da")
    assert sug and all(s.startswith("da") for s in sug[:1]) and "data" in sug
    assert "data" in svc.suggest("datq")  # Levenshtein typo fallback
    assert len(svc.suggest("d")) <= 5

    mon = svc.monitor()
    assert mon["round"] == metrics[-1]["round"]
    assert mon["counters"]["n_in"] == metrics[-1]["n_in"]
    assert any(p["key"] == "n_parsed" for p in mon["partitions"]) or metrics[-1]["n_fetched"] == 0
    # partitions holds ONLY parse lineage (job rows live under 'jobs')
    assert all(p["key"] == "n_parsed" for p in mon["partitions"])

    h = svc.health()
    assert h["status"] == "healthy" and h["rounds_done"] == len(metrics)

    # spark.sql surface: the engine tables as temp views
    names = svc.run.register_views()
    assert "crawl_postings" in names and "crawl_seen" in names
    top = spark.sql(
        "SELECT url, SUM(frequency) AS f FROM crawl_postings "
        "WHERE term = 'data' GROUP BY url ORDER BY f DESC, url LIMIT 1"
    ).collect()
    assert top and top[0]["f"] > 0
    n_seen_sql = spark.sql("SELECT COUNT(*) AS n FROM crawl_seen").collect()[0]["n"]
    assert n_seen_sql == svc.run.seen_df().count()

    # post-start submission becomes a dynamic url append (S10)
    pages = pd.read_parquet(tiny_corpus["pages"])
    seen = {r["pageUrl"] for r in svc.search("data or engine or running")}
    dyn = svc.start_job(manual_text=pages.url.iloc[-1])
    assert dyn.get("dynamic") is True
