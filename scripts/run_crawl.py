"""spark-submit entrypoint (the north-rule deployment shape:
``spark-submit --py-files cbwcis.zip scripts/run_crawl.py ...``).

The SparkSession comes from spark-submit's configuration (master,
executors, confs) — this script only declares the job.  In the
sandbox that is ``--master local[N]``; on a cluster the SAME command
line with a YARN/k8s master and the same --py-files zip runs the
identical job (the package has no driver-local imports outside
stdlib/pyspark/pandas/numpy/pyarrow).

Prints one JSON line of run metrics on completion, and resumes from
the last committed round if ``--root`` already holds a crawl.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="dir with pages/robots/seeds parquet")
    ap.add_argument("--root", required=True, help="crawl state dir (resumes if present)")
    ap.add_argument("--round-budget", type=float, default=1e9)
    ap.add_argument(
        "--max-rounds", type=int, default=64,
        help="TOTAL round-number ceiling (absolute, counts rounds already "
        "committed in --root): a resume at round >= this runs zero rounds",
    )
    ap.add_argument("--dedup", choices=["discovery", "index"], default="discovery")
    ap.add_argument("--canonicalization", choices=["reference", "full"], default="reference")
    ap.add_argument("--search", default=None, help="optional query to run after the crawl")
    args = ap.parse_args()

    # import AFTER spark-submit has placed the --py-files zip on the path
    from pyspark.sql import SparkSession

    from cloud_based_web_crawling_indexing_system_spark.operators.crawl import CrawlRun
    from cloud_based_web_crawling_indexing_system_spark.oracle import CrawlConfig

    spark = SparkSession.builder.appName("cbwcis-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    cfg = CrawlConfig(
        round_budget_s=args.round_budget,
        max_rounds=args.max_rounds,
        dedup=args.dedup,
        canonicalization=args.canonicalization,
    )
    run = CrawlRun(spark, args.root, cfg)
    resumed = os.path.isfile(os.path.join(args.root, "state.json"))
    if not resumed:
        run.init(
            os.path.join(args.corpus, "pages.parquet"),
            spark.read.parquet(os.path.join(args.corpus, "robots.parquet")),
            spark.read.parquet(os.path.join(args.corpus, "seeds.parquet")),
        )
    t0 = time.time()
    # pass max_rounds EXPLICITLY: on resume the semantic knobs reload
    # from state.json (budget, dedup, canonicalization must not drift
    # mid-crawl).  NOTE: run() treats this as an ABSOLUTE round-number
    # ceiling, not a per-invocation increment — see --max-rounds help
    metrics = run.run(max_rounds=args.max_rounds)
    out = {
        "resumed": resumed,
        "rounds": len(metrics),
        "urls_scheduled": sum(m["n_in"] for m in metrics),
        "urls_fetched": sum(m["n_fetched"] for m in metrics),
        "urls_indexed": sum(m["n_indexed"] for m in metrics),
        "sec": round(time.time() - t0, 2),
    }
    if args.search:
        out["search"] = [
            {"pageUrl": r["url"], "frequency": r["frequency"]}
            for r in run.search(args.search, limit=5).collect()
        ]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
