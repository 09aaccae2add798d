"""Jobs-per-round profiler for the crawl floor (judge r5 #7).

Runs the bench crawl corpus end-to-end and brackets every round (and
every _mark phase inside a round) with the DAGScheduler's job-id
counter, attributing Spark job submissions to phases.  Small rounds
pay one stage-job LAUNCH LATENCY per job (PROFILE_r03-r05), so the
per-round job count IS the small-round floor.

Usage: python scripts/jobs_probe.py [cpus]
Prints per-round phase job counts + the jobs/round summary.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CBWCIS_PROFILE", "1")

from bench import BENCH_CORPUS, REPO, bench_crawl, ensure_corpus  # noqa: E402
from cloud_based_web_crawling_indexing_system_spark.operators import crawl as crawl_mod  # noqa: E402
from cloud_based_web_crawling_indexing_system_spark.session import get_spark  # noqa: E402


def main() -> int:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    spark = get_spark(master=f"local[{cpus}]", app_name="jobs-probe")
    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    def jid() -> int:
        return jsc.dagScheduler().nextJobId().get() if hasattr(jsc.dagScheduler().nextJobId(), "get") else jsc.dagScheduler().nextJobId()

    crawl_mod._JOBS_HOOK = jid  # per-phase job counts in the profile

    # per-sink attribution: serialize the commit pool (job COUNTS are
    # unchanged by concurrency; only wall is) and bracket every
    # write_round / bloom update with the job counter
    import concurrent.futures as _cf
    import os.path as _osp

    class _SerialPool:
        def __init__(self, *a, **k):  # noqa: ANN002, ANN003
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):  # noqa: ANN002
            return False

        def submit(self, fn, *args, **kw):  # noqa: ANN002, ANN003
            f = _cf.Future()
            try:
                f.set_result(fn(*args, **kw))
            except BaseException as e:  # noqa: BLE001
                f.set_exception(e)
            return f

    _cf.ThreadPoolExecutor = _SerialPool

    from cloud_based_web_crawling_indexing_system_spark.operators import seen as seen_mod
    from cloud_based_web_crawling_indexing_system_spark.sources import lake

    sink_jobs: dict[str, int] = {}
    orig_wr = lake.RoundTable.write_round

    def wr(self, r, df, *a, **k):  # noqa: ANN001, ANN002, ANN003
        j0 = jid()
        out = orig_wr(self, r, df, *a, **k)
        name = _osp.basename(self.path.rstrip("/"))
        sink_jobs[name] = sink_jobs.get(name, 0) + (jid() - j0)
        return out

    lake.RoundTable.write_round = wr
    orig_bloom = seen_mod.BloomSeen.add_positions_df

    def bl(self, df, *a, **k):  # noqa: ANN001, ANN002, ANN003
        j0 = jid()
        out = orig_bloom(self, df, *a, **k)
        sink_jobs["bloom_add"] = sink_jobs.get("bloom_add", 0) + (jid() - j0)
        return out

    seen_mod.BloomSeen.add_positions_df = bl

    orig_step = crawl_mod.CrawlRun.step
    rounds: list[dict] = []

    def step(self):  # noqa: ANN001
        j0 = jid()
        out = orig_step(self)
        out["jobs"] = jid() - j0
        rounds.append({"round": out["round"], "jobs": out["jobs"],
                       "profile": out.get("profile", {})})
        return out

    crawl_mod.CrawlRun.step = step
    try:
        ensure_corpus(BENCH_CORPUS, n_hosts=80, n_pages=8000)
        t0 = time.time()
        crawl = bench_crawl(spark, BENCH_CORPUS,
                            os.path.join(REPO, ".cache", "jobs_probe_run"))
        wall = time.time() - t0
    finally:
        crawl_mod.CrawlRun.step = orig_step

    total = sum(r["jobs"] for r in rounds)
    for r in rounds:
        print(f"round {r['round']}: jobs={r['jobs']} profile={r['profile']}")
    print(f"SINKS (jobs across all rounds): {sink_jobs}")
    print(
        f"TOTAL rounds={len(rounds)} jobs={total} "
        f"jobs/round={total / max(1, len(rounds)):.1f} "
        f"wall={crawl['sec']:.1f}s fetched={crawl['urls_fetched']} "
        f"urls/s={crawl['urls_per_sec']}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
