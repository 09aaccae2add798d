"""N-vs-4N scaling evidence for the WEBTEXT operator axis (the crawl
axis lives in scaling_bench.py): run the heaviest corpus-shuffle
probe — q58_chunk_dedup, whose window route explodes ~10x instances
into a (kind, hash) groupBy + co-partitioned semi join — at two
parallelism widths, each in its OWN process/JVM (same plan, same
input, same shuffle width = the width), and report rows/s at both
plus (thr_hi / thr_lo) / (hi / lo).

Protocol follows the repo's bench rules (driver-contract-gotchas):
fresh JVM per width, one warm-up pass then min-of-3, nothing else
running, calibration anchor (fixed 30M-row range count) quoted per width.

The sf0.1 documents table (5,000 docs) finishes in fixed-overhead
time at any width, so the probe runs over a LARGER deterministic
corpus of the same shape (input_hint: synthesise deterministically at
the scale the measurement needs): 200k docs x 60 tokens, text derived
from doc_id arithmetic in pure Catalyst (no Python, no randomness),
with planted duplicate pairs (doc_id % 29 in {0,1} share one text) —
cached under .cache/webtext_scaling_corpus.  The measured job
aggregates every output column (a bare count() lets Catalyst
ELIMINATE the count-preserving left join and with it the entire
dedup computation — measured 0.5 s walls that were pure explode).

Usage: python scripts/webtext_scaling.py [lo] [hi]
       (defaults 2 8; prints one JSON line)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
cpus = %(cpus)d
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from cloud_based_web_crawling_indexing_system_spark.plans import probes
SF = %(sf)r
from pyspark.sql import functions as F
reg = probes.registry()

def job():
    # aggregate every output column: forces the dup-set groupBy and
    # the count-attach join (a bare count() lets Catalyst eliminate
    # the left join and prune the whole dedup computation)
    df = reg["q58_chunk_dedup"](spark, SF)
    return df.agg(F.count("*").alias("n"),
                  F.sum("n_chunks").alias("c"),
                  F.sum("n_dup_chunks").alias("d"),
                  F.sum("dup_permille").alias("p")).collect()[0]

r0 = job()  # warm-up: codegen + scans
t0 = time.time()
spark.sql("SELECT count(*) FROM range(30000000)").collect()
anchor = time.time() - t0
runs = []
for _ in range(3):
    t0 = time.time()
    r = job()
    runs.append(time.time() - t0)
    assert tuple(r) == tuple(r0)
print(json.dumps({"cpus": cpus, "out_rows": int(r0["n"]),
                  "chunk_instances": int(r0["c"]),
                  "dup_instances": int(r0["d"]), "runs": runs,
                  "min_sec": min(runs), "anchor_range_30m_sec": anchor}))
spark.stop()
"""


def run_width(cpus: int, sf: str) -> dict:
    code = _CHILD % {"repo": REPO, "cpus": cpus, "sf": sf}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


CORPUS = os.path.join(REPO, ".cache", "webtext_scaling_corpus")

_GEN = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
n, ntok = 200_000, 60
d = spark.range(n).select(F.col("id").alias("doc_id"))
# duplicate pairs: ids with doc_id %% 29 in {0,1} share a text id
tid = F.when(F.col("doc_id") %% 29 < 2,
             F.col("doc_id") - (F.col("doc_id") %% 29)).otherwise(F.col("doc_id"))
# xxhash64 mixing: (tid * K + i) mod V would collapse every doc to
# its tid-mod-V class (one of 997 texts repeated ~200x — measured:
# dup_instances == chunk_instances), killing the dedup shuffle via
# map-side combine.  Hash-mixed tokens give each tid a distinct
# stream; duplicates come ONLY from the planted tid pairs.
d = d.withColumn("tid", tid).withColumn(
    "text",
    F.expr(f"array_join(transform(sequence(0, {ntok - 1}),"
           f" i -> concat('w', pmod(xxhash64(tid, i), 997))), ' ')"),
)
out = d.select("doc_id", "text", F.lit("en").alias("lang"),
               F.concat(F.lit("src"), (F.col("doc_id") %% 20).cast("string")).alias("source"),
               F.length("text").alias("n_chars"))
out.coalesce(8).write.mode("overwrite").parquet(%(corpus)r + "/documents.parquet")
spark.stop()
"""


def ensure_corpus() -> None:
    marker = os.path.join(CORPUS, "documents.parquet", "_SUCCESS")
    if os.path.exists(marker):
        return
    subprocess.run(
        [sys.executable, "-c", _GEN % {"repo": REPO, "corpus": CORPUS}],
        check=True, cwd=REPO,
    )


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ensure_corpus()
    a, b = run_width(lo, CORPUS), run_width(hi, CORPUS)
    thr = lambda r: r["chunk_instances"] / r["min_sec"]  # noqa: E731
    eff = (thr(b) / thr(a)) / (hi / lo)
    print(json.dumps({
        "op": "q58_chunk_dedup", "corpus": "200k docs x 60 tokens",
        "lo": a, "hi": b,
        "instances_per_sec_lo": round(thr(a), 1),
        "instances_per_sec_hi": round(thr(b), 1),
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
