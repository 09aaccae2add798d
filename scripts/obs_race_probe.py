"""Micro-repro probe for the Observation zero-latch flake (STATUS.md).

Mirrors the crawl round's commit shape: an observed+persisted df
(``parsed``), a second observed+persisted df derived from it
(``new_children``), and 4 CONCURRENT write actions (texts, postings,
seen, frontier) whose plans all reach the observed nodes through the
caches — exactly operators/crawl.py's ThreadPoolExecutor commit group.

PySpark's Observation latches "the first action's" metrics via an async
QueryExecutionListener; hypothesis: with concurrent consumers of a
shared cached observed plan, a consumer whose query ends while the
shared CollectMetrics accumulator is still empty (or which never
executes the node) can latch a spurious zero/empty row.

Usage: python scripts/obs_race_probe.py [iters] [cores]
Prints one line per anomaly and a summary; exit 1 if any anomaly.
"""
import shutil
import sys
import tempfile
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("obs-race-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="obsrace_")
    n_rows = 20
    anomalies = 0
    try:
        for i in range(iters):
            obs_a = Observation()
            # "parsed": a non-trivial subtree so materialization isn't
            # instant, observed, then persisted
            a = (
                spark.range(0, n_rows, 1, 4)
                .withColumn("url", F.concat(F.lit("u"), F.col("id")))
                .withColumn("h", F.md5(F.encode("url", "utf-8")))
                .observe(obs_a, F.count(F.lit(1)).alias("n_fetched"))
            )
            a.persist()

            obs_b = Observation()
            # "new_children": derived, observed, persisted
            b = (
                a.where(F.col("id") % 2 == 0)
                .select("id", "url", "h")
                .observe(obs_b, F.count(F.lit(1)).alias("n_disc"))
            )
            b.persist()

            # "retry": anti-join against broadcast of the cached a
            indep = spark.range(100, 110).select(
                F.col("id"), F.lit("x").alias("url"), F.lit("y").alias("h")
            )
            retry = indep.join(F.broadcast(a.select("url")), "url", "left_anti").select(
                "id", "url", "h"
            )
            frontier = retry.unionByName(b.select("id", "url", "h")).repartition(2, "h")

            writes = [
                a.select("url", "h"),                       # texts
                a.groupBy("h").count(),                     # postings
                b.select("h", "url"),                       # seen
                frontier,                                   # frontier
            ]
            with ThreadPoolExecutor(max_workers=6) as pool:
                futs = [
                    pool.submit(
                        (lambda d, p: d.write.mode("overwrite").parquet(p)),
                        d,
                        f"{root}/w{j}",
                    )
                    for j, d in enumerate(writes)
                ]
                for f in futs:
                    f.result()

            va = dict(obs_a.get)
            vb = dict(obs_b.get)
            ok_a = va.get("n_fetched") == n_rows
            ok_b = vb.get("n_disc") == n_rows // 2
            if not (ok_a and ok_b):
                anomalies += 1
                print(f"ANOMALY iter={i} a={va!r} b={vb!r}", flush=True)
            a.unpersist()
            b.unpersist()
            if i and i % 50 == 0:
                print(f"...{i} iters, {anomalies} anomalies", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(f"DONE iters={iters} anomalies={anomalies}")
    return 1 if anomalies else 0


if __name__ == "__main__":
    raise SystemExit(main())
