"""Wide-pair (local[8] -> local[32]) attribution probes.

Two modes over the scaling corpus (scripts/scaling_bench.py builds it):

``--mode dup [--no-barrier]``
    Counts ACTUAL parse-UDF row executions with an accumulator while
    the commit pool's concurrent jobs share the ``parsed`` cache.
    Result (committed in BENCH/BASELINE.md prose): rows executed ==
    rows fetched exactly, with or without a pre-pool materialization
    barrier — local mode's BlockManager serializes get-or-compute per
    cached block, so concurrent first waves do NOT duplicate the
    parse work and a barrier only adds wall time.

``--mode stages``
    Runs the crawl with the UI REST API on and dumps stage-level
    totals: executorRunTime vs executorCpuTime, GC, deserialize,
    shuffle fetch/write.  Result: task_run_s ~= cores * wall (cores
    ~100% occupied, no idle/unscalable stage); the run-vs-cpu gap is
    JVM task threads waiting on the Arrow/Python pipeline that is
    itself using the cores.

Usage: python scripts/wide_pair_probe.py --mode dup --cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CORPUS = os.path.join(REPO, ".cache", "scaling_corpus")


def _spark(cpus: int, ui: bool):
    from cloud_based_web_crawling_indexing_system_spark.session import get_spark

    extra = {
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        "spark.ui.showConsoleProgress": "false",
    }
    if ui:
        extra.update({
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "5000",
        })
    return get_spark(master=f"local[{cpus}]", app_name=f"wideprobe-{cpus}",
                     shuffle_partitions=48, extra_conf=extra)


def _crawl(spark, cpus: int, max_rounds: int):
    from cloud_based_web_crawling_indexing_system_spark.operators.crawl import CrawlRun
    from cloud_based_web_crawling_indexing_system_spark.oracle import CrawlConfig

    wd = os.path.join(REPO, ".cache", f"wideprobe_run_{cpus}")
    if os.path.isdir(wd):
        shutil.rmtree(wd)
    run = CrawlRun(spark, wd, CrawlConfig(round_budget_s=1e9, max_rounds=max_rounds))
    run.init(os.path.join(CORPUS, "pages.parquet"),
             spark.read.parquet(os.path.join(CORPUS, "robots.parquet")),
             spark.read.parquet(os.path.join(CORPUS, "seeds.parquet")))
    t0 = time.time()
    ms = run.run()
    return ms, time.time() - t0


def mode_dup(cpus: int) -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from cloud_based_web_crawling_indexing_system_spark.functions import udfs
    from cloud_based_web_crawling_indexing_system_spark.operators import crawl as crawl_mod

    spark = _spark(cpus, ui=False)
    acc = spark.sparkContext.accumulator(0)

    @F.pandas_udf(udfs._PARSE_SCHEMA)
    def counting_parse(html: pd.Series, url: pd.Series) -> pd.DataFrame:
        acc.add(len(html))
        return udfs.parse_page_udf.func(html, url)

    crawl_mod.parse_page_udf = counting_parse
    ms, dt = _crawl(spark, cpus, max_rounds=5)
    fetched = sum(m["n_fetched"] for m in ms)
    print(json.dumps({
        "mode": "dup", "cpus": cpus, "fetched": fetched,
        "parse_rows_executed": acc.value,
        "dup_factor": round(acc.value / max(1, fetched), 3),
        "sec": round(dt, 1),
    }))
    spark.stop()


def mode_stages(cpus: int) -> None:
    spark = _spark(cpus, ui=True)
    ms, dt = _crawl(spark, cpus, max_rounds=10)
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"))
    tot = dict(run=0.0, cpu=0.0, deser=0.0, gc=0.0, fetch_wait=0.0, shuf_write=0.0)
    n_tasks = 0
    for s in stages:
        if s.get("submissionTime") is None:
            continue
        n_tasks += s["numCompleteTasks"]
        tot["run"] += s["executorRunTime"] / 1e3
        tot["cpu"] += s["executorCpuTime"] / 1e9
        tot["deser"] += s["executorDeserializeTime"] / 1e3
        tot["gc"] += s["jvmGcTime"] / 1e3
        tot["fetch_wait"] += s.get("shuffleFetchWaitTime", 0) / 1e3
        tot["shuf_write"] += s.get("shuffleWriteTime", 0) / 1e9
    print(json.dumps({
        "mode": "stages", "cpus": cpus, "wall": round(dt, 1),
        "tasks": n_tasks, "core_s_available": round(dt * cpus, 1),
        **{f"task_{k}_s": round(v, 1) for k, v in tot.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["dup", "stages"], required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--no-barrier", action="store_true",
                    help="(historical) the barrier was removed after this probe")
    args = ap.parse_args()
    if args.mode == "dup":
        mode_dup(args.cpus)
    else:
        mode_stages(args.cpus)
