"""Benchmark harness: headline queries + crawl end-to-end.

Runs on local[$SPARK_GRAFT_CPUS] against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

The crawl_e2e entry times a full deterministic crawl
(schedule + robots + politeness + fetch-join + parse + dedup + index)
over a generated fixture corpus (cached under .cache/), and the
throughput in URLs/s is reported in the auxiliary "crawl" key.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cloud_based_web_crawling_indexing_system_spark.oracle import CrawlConfig  # noqa: E402
from cloud_based_web_crawling_indexing_system_spark.plans import probes  # noqa: E402
from cloud_based_web_crawling_indexing_system_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q02_topk_revenue_orders",
    "q07_top3_orders_per_customer",
    "q11_events_hourly",
    # r6: q12 absorbed q13's first-event route (same window, one pass)
    "q12_session_stats",
    # r6: q18 absorbed q19's bigram route (kind column) — renamed so
    # round-over-round tooling never compares the old 1-route walls
    # against the merged 2-route work under the same key
    "q18_term_ngram_top50",
    "q20_postings",
    "q21_search_and",
    "q24_minhash_lsh_pairs",
    "q25_simhash_signatures",
    "q27_knn_cosine_top5_routes",
    # r6: q30 absorbed q31_blob_stats (bench key was q31; the merged
    # probe's wall = shingle-fingerprint agg + blob projection join)
    "q30_doc_fingerprint",
    "q33_srp_ann_topk",
    "q34_ivf_ann_topk",
    "q35_embedding_neardup_lsh",
    "q36_lang_id_confusion_routes",
    # r6: q37 absorbed q26's exact route (route column) — renamed like q18
    "q37_ngram_jaccard_routes",
    "q41_image_decode_roundtrip",
    "q42_bpe_token_count_routes",
    "q43_audio_decode_roundtrip",
    "q39_token_len_quantiles_routes",
    # r6: q54 absorbed q44 (raw AVI) and q45 (MJPEG AVI) as container
    # routes — its wall is now all four containers; q44/q45 keys retired
    "q54_container_frame_sample",
    # r6 second pass: the new webtext-pipeline operators (new keys —
    # no prior rounds to compare against)
    "q57_pii_scrub",
    "q58_chunk_dedup",
    "q59_decontam",
    "q60_host_pagerank",
    "q61_warc_roundtrip",
]

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_CORPUS = os.path.join(REPO, ".cache", "bench_corpus_small")


def ensure_corpus(path: str, n_hosts: int, n_pages: int) -> None:
    marker = os.path.join(path, "pages.parquet")
    if os.path.exists(marker):
        return
    from cloud_based_web_crawling_indexing_system_spark.sources.fixtures import write_corpus

    write_corpus(path, scale="small", seed=42, n_hosts=n_hosts, n_pages=n_pages)


def bench_crawl(spark, corpus_dir: str, workdir: str) -> dict:
    from cloud_based_web_crawling_indexing_system_spark.operators.crawl import CrawlRun

    if os.path.isdir(workdir):
        shutil.rmtree(workdir)
    cfg = CrawlConfig(round_budget_s=1e9, max_rounds=12)  # politeness computed, all admitted
    run = CrawlRun(spark, workdir, cfg)
    run.init(
        os.path.join(corpus_dir, "pages.parquet"),
        spark.read.parquet(os.path.join(corpus_dir, "robots.parquet")),
        spark.read.parquet(os.path.join(corpus_dir, "seeds.parquet")),
    )
    # warm the Arrow UDF workers + codegen before timing (same warmup
    # discipline as scripts/scaling_bench.py): steady-state throughput,
    # not JVM/Python cold start, is the measured quantity
    from cloud_based_web_crawling_indexing_system_spark.functions.udfs import (
        parse_page_udf,
        term_freqs_udf,
    )

    warm = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet")).limit(32)
    warm.select(term_freqs_udf("text"), parse_page_udf("html", "url")).collect()
    t0 = time.time()
    metrics = run.run()
    dt = time.time() - t0
    fetched = sum(m["n_fetched"] for m in metrics)
    scheduled = sum(m["n_in"] for m in metrics)
    return {
        "sec": dt,
        "rounds": len(metrics),
        "urls_fetched": fetched,
        "urls_scheduled": scheduled,
        "urls_per_sec": round(fetched / dt, 1) if dt > 0 else None,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(master=f"local[{cpus}]", app_name="cbwcis-bench")
    spark.range(1000).count()  # warm up

    # machine-speed calibration: two FIXED workloads (one JVM, one
    # Python-kernel) timed alongside the queries.  This sandbox VM's
    # effective CPU swings up to ~4x between runs (hypervisor
    # co-tenancy, measured in BENCH/PROFILE_r03.md), so round-over-
    # round comparisons must normalize by these anchors, not read
    # absolute walls.
    from cloud_based_web_crawling_indexing_system_spark.functions.terms import (
        term_freqs,
    )

    # warm the anchor workload itself (JIT + codegen) so the pre/post
    # anchors time the SAME steady-state kernel and are comparable
    spark.range(30_000_000).selectExpr("sum(xxhash64(id) % 1000000)").collect()
    t0 = time.time()
    # % bounds the terms so the ANSI-mode sum cannot overflow long
    spark.range(30_000_000).selectExpr("sum(xxhash64(id) % 1000000)").collect()
    jvm_calib = round(time.time() - t0, 3)
    t0 = time.time()
    for i in range(40):
        # vary the text per iteration: term_freqs memoizes stems, and
        # 40 identical calls would time the cache, not the kernel
        term_freqs(
            " ".join(f"run{i}x{j} jumps relational conditional" for j in range(120))
        )
    py_calib = round(time.time() - t0, 3)

    # Repeat protocol (judge r3 #2): a single-shot wall conflates
    # one-time plan/codegen compile (2-4x the steady state) and this
    # VM's ~4x ambient speed swings with actual execution cost.  Each
    # query runs REPEATS times; "queries" carries the min-of-N
    # (steady-state, the round-over-round comparable number) and
    # "queries_first" the first-call wall (compile included).  Compare
    # rounds on min-walls normalized by the calibration anchors.
    REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    reg = probes.registry()

    def eval_full(df):
        # evaluate EVERY column of EVERY row (r6 protocol fix): the
        # old .count() let Catalyst ELIMINATE count-preserving left
        # joins and prune aggregate expressions below the count, so
        # keys whose plan ends in a left join (q30/q58/q59 post-fold)
        # timed a fraction of their operator — sum(xxhash64(all
        # columns)) forces full evaluation with no driver transfer.
        from pyspark.sql import functions as F

        # pmod bounds the terms so the ANSI-mode sum cannot overflow
        # long (same trick as the calibration anchor)
        return df.agg(
            F.sum(F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(1_000_000)))
        ).collect()

    times: dict[str, float] = {}
    first_times: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        walls = []
        for _ in range(REPEATS):
            t0 = time.time()
            eval_full(reg[name](spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
        first_times[name] = walls[0]
        times[name] = min(walls)
        all_runs[name] = walls

    # second anchor AFTER the query block: a big first-vs-second anchor
    # gap flags a mid-run contention spike (PROFILE_r03.md measured the
    # same workload at 0.89s and 1.285s minutes apart)
    t0 = time.time()
    spark.range(30_000_000).selectExpr("sum(xxhash64(id) % 1000000)").collect()
    jvm_calib_post = round(time.time() - t0, 3)

    ensure_corpus(BENCH_CORPUS, n_hosts=80, n_pages=8000)
    crawl = bench_crawl(spark, BENCH_CORPUS, os.path.join(REPO, ".cache", "bench_crawl_run"))
    times["crawl_e2e"] = round(crawl["sec"], 3)
    first_times["crawl_e2e"] = times["crawl_e2e"]  # one run: warmed, see bench_crawl

    total = round(sum(times.values()), 3)
    calibration = {
        "jvm_hash_30m_sec": jvm_calib,
        "jvm_hash_30m_sec_post": jvm_calib_post,
        "py_termfreq_40x_sec": py_calib,
    }
    # ratio-to-control column (judge r4 #6): each query's min-wall over
    # the q01 min-wall — a VM-speed-invariant number for round-over-
    # round comparison (both numerator and denominator ran in the same
    # ambient window)
    control = times.get("q01_pricing_summary") or 1.0
    ratios = {k: round(v / control, 3) for k, v in times.items()}
    full = {
        "metric": "headline_queries_plus_crawl_e2e",
        "value": total,
        "unit": "sec",
        "queries": times,
        "queries_first": first_times,
        "runs": all_runs,
        "ratio_to_q01": ratios,
        "protocol": {
            # self-describing headline convention (judge r5 #8): the
            # `queries` block IS min-of-repeats — round-over-round
            # tooling must never compare it against a first-call block
            "headline": "min",
            # r6: walls are NOT comparable to r5 and earlier per-key —
            # the eval changed from .count() (join-eliminable) to
            # full-column evaluation; see BENCH/PROFILE_r06.md
            "eval": "sum_xxhash64_all_columns",
            "repeats": REPEATS,
            "queries_sec": "min-of-repeats (steady-state)",
            "queries_first_sec": "first call (plan+codegen compile included)",
            "ratio_to_q01": "min-wall / q01 min-wall (VM-speed-invariant)",
        },
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": crawl,
        "calibration": calibration,
    }
    full_path = os.path.join(REPO, "BENCH", "BENCH_full_latest.json")
    os.makedirs(os.path.dirname(full_path), exist_ok=True)
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1)
    # the FINAL stdout line must fit the driver's 2000-char tail window
    # or it records "parsed": null (judge r4 #6) — keep it compact and
    # point at the full payload on disk
    compact = {
        "metric": "headline_queries_plus_crawl_e2e",
        "value": total,
        "unit": "sec",
        "queries": times,
        "protocol": {"headline": "min", "repeats": REPEATS,
                     "eval": "sum_xxhash64_all_columns"},
        "sf": full["sf"],
        "crawl": {k: crawl[k] for k in ("sec", "urls_per_sec", "urls_fetched")},
        "calibration": calibration,
        "full": "BENCH/BENCH_full_latest.json",
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # drop per-query detail before overflowing
        compact["queries"] = {"total_only": total}
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
