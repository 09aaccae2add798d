"""Per-query measurement harness for optimization work (guide §1).

NOT the frozen bench.py: this exists so single queries can be timed,
re-timed, and plan-dumped in isolation without paying for the full
headline sweep.  Uses the same evaluation as bench.py's r6 protocol
(sum(xxhash64(struct(*)))) so numbers are comparable to the frozen
harness, plus an optional noop-sink mode (guide §1.4) and
.explain("formatted") capture for plans/r07/.

Usage:
  python bench_extra.py q35_embedding_neardup_lsh q59_decontam \
      --sf /root/testdata/sf1.0 --repeats 3 [--noop] [--explain plans/r07 --suffix before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cloud_based_web_crawling_indexing_system_spark.plans import probes  # noqa: E402
from cloud_based_web_crawling_indexing_system_spark.session import get_spark  # noqa: E402


def eval_full(df):
    from pyspark.sql import functions as F

    return df.agg(
        F.sum(F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(1_000_000)))
    ).collect()


def eval_noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="noop sink instead of xxhash64 eval")
    ap.add_argument("--explain", default=None, help="directory to write <name>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="cbwcis-bench-extra")
    spark.range(1000).count()
    # same calibration anchor as bench.py so runs can be window-normalized
    spark.range(30_000_000).selectExpr("sum(xxhash64(id) % 1000000)").collect()
    t0 = time.time()
    spark.range(30_000_000).selectExpr("sum(xxhash64(id) % 1000000)").collect()
    anchor = round(time.time() - t0, 3)

    reg = probes.registry()
    ev = eval_noop if args.noop else eval_full
    out: dict[str, object] = {"sf_dir": args.sf, "anchor_jvm_hash_30m_sec": anchor,
                              "eval": "noop" if args.noop else "sum_xxhash64_all_columns"}
    walls: dict[str, list[float]] = {}
    for name in args.names:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = reg[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        runs = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            ev(reg[name](spark, args.sf))
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        walls[name] = runs
    t0 = time.time()
    spark.range(30_000_000).selectExpr("sum(xxhash64(id) % 1000000)").collect()
    out["anchor_post_sec"] = round(time.time() - t0, 3)
    out["walls"] = walls
    out["mins"] = {k: min(v) for k, v in walls.items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
