"""Alternating A/B of the crawl end-to-end between two repo trees
(e.g. HEAD vs the pre-change parent in a git worktree), same corpus,
same box, interleaved A/B/A/B so a VM-speed drift cannot masquerade
as a code effect (the protocol BENCH/PROFILE_r05.md established).

Usage: python scripts/crawl_ab.py OLD_TREE [reps] [cpus]
Each rep spawns a fresh subprocess per side (own JVM) that runs
bench.bench_crawl on the SHARED bench corpus and prints one wall.
"""
import json
import os
import subprocess
import sys

NEW = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
os.environ.setdefault("SPARK_GRAFT_CPUS", sys.argv[3])
from bench import BENCH_CORPUS, bench_crawl, ensure_corpus
from cloud_based_web_crawling_indexing_system_spark.session import get_spark
spark = get_spark(master=f"local[{sys.argv[3]}]", app_name="crawl-ab")
ensure_corpus(sys.argv[2], n_hosts=80, n_pages=8000)
out = bench_crawl(spark, sys.argv[2], os.path.join("/tmp", "crawl_ab_run"))
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_side(repo: str, corpus: str, cpus: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, repo, corpus, cpus],
        capture_output=True, text=True, timeout=560,
    )
    for ln in p.stdout.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[7:])
    raise RuntimeError(f"no RESULT from {repo}:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> int:
    old = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"
    corpus = os.path.join(NEW, ".cache", "bench_corpus_small")
    walls: dict[str, list[float]] = {"old": [], "new": []}
    for i in range(reps):
        for tag, repo in (("old", old), ("new", NEW)):
            r = run_side(repo, corpus, cpus)
            walls[tag].append(r["sec"])
            print(f"rep {i} {tag}: {r['sec']:.2f}s {r['urls_per_sec']} urls/s")
    print(json.dumps({
        "old_walls": [round(x, 2) for x in walls["old"]],
        "new_walls": [round(x, 2) for x in walls["new"]],
        "old_min": round(min(walls["old"]), 2),
        "new_min": round(min(walls["new"]), 2),
        "speedup_min": round(min(walls["old"]) / min(walls["new"]), 3),
        "cpus": cpus, "reps": reps,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
