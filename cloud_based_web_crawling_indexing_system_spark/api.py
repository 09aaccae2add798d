"""Reference-verb façade over the engine (SURVEY.md §3 lifecycle).

The reference master exposes four verbs over HTTP
(/root/reference/Cloud/scripts/master.py):

- ``POST /jobs``   — parse seed urls from form text + uploaded file,
  clamp depth to [1,5], dedup order-preserving, classify domain
  seeds, enqueue (master.py:101-145);
- ``GET /search``  — the §2.8 grammar over the postings table
  (master.py:165-213), JSON rows ``{"pageUrl": ..., "frequency": ...}``;
- ``GET /jobs/<job_id>`` — the jobs-table row incl. per-job
  discovered/indexed counters (master.py:147-163);
- ``GET /nodes``   — node-id -> alive/dead liveness map (master.py:215-217);
- ``GET /suggest`` — top-5 word suggestions (offline index-vocabulary
  equivalent of the reference's external Datamuse proxy, master.py:72-90);
- ``GET /monitor`` — node liveness + counters (master.py:219-242);
- ``GET /health``  — ``{"status": "healthy"}`` (master.py:68-70).

``CrawlService`` offers the same verbs as plain Python over
``CrawlRun`` — no HTTP server needed in-sandbox; any web framework
can mount these four methods 1:1.

Lifecycle divergence (documented): the reference accepts new jobs at
any time because workers poll queues forever; the engine's round loop
fixes the JOB DIM at init, so ``start_job`` accumulates jobs before
the first ``crawl()`` and later submissions feed ``add_urls`` (the
S10 dynamic-url source) against an existing job.

Datamuse spell suggestions (master.py:85) are an external network API
with no sandbox network; ``suggest`` serves the same verb offline from
the index vocabulary (prefix-first + Levenshtein<=2, frequency-ranked,
top-5) — a documented equivalent, not a proxy.
"""

from __future__ import annotations

import uuid

import os
import time
from collections.abc import Iterator  # noqa: F401 — return annotation

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.crawl import CrawlRun
from .oracle import CrawlConfig

__all__ = ["CrawlService", "parse_seed_submission"]


def parse_seed_submission(manual_text: str | None, file_text: str | None) -> list[str]:
    """master.py:109-117: newline-split both sources, strip, drop
    blanks, dedup preserving order (``dict.fromkeys``)."""
    urls: list[str] = []
    for blob in (manual_text, file_text):
        if blob:
            urls.extend(u.strip() for u in blob.splitlines())
    return list(dict.fromkeys(u for u in urls if u))


class CrawlService:
    """The reference master's lifecycle as a library."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        pages_path: str,
        robots_df: DataFrame,
        cfg: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.root = root
        self.pages_path = pages_path
        self.robots_df = robots_df
        self.cfg = cfg or CrawlConfig()
        self.run = CrawlRun(spark, root, self.cfg)
        self._pending: list[dict] = []
        self._jobs_cache = None
        # a root with committed state is a crawl to RESUME: a restarted
        # service must never re-init() over it (that would replace the
        # job dim and round-0 tables under a mid-crawl frontier)
        self._started = os.path.isfile(os.path.join(root, "state.json"))

    # -- POST /jobs (master.py:101-145) --------------------------------------

    def start_job(
        self,
        manual_text: str | None = None,
        file_text: str | None = None,
        depth_limit: int = 2,
        job_id_prefix: str | None = None,
    ) -> dict:
        """Submit crawl jobs — ONE job per seed url, exactly like the
        reference (master.py:124-141 mints a uuid per url and returns
        ``jobIds``).  Depth clamping (F8) and domain classification
        (F7) happen in CrawlRun.init (master.py:104-107,127-128)."""
        seeds = parse_seed_submission(manual_text, file_text)
        if not seeds:
            return {"error": "No seed URLs provided"}  # master.py:119
        if self._started:
            # post-start submissions are dynamic urls (S10) against the
            # first job's config; the reference's always-on workers
            # would take fresh jobs any time — our round loop pins the
            # job dim at init (documented divergence)
            jid = self._first_job()
            self.run.add_seeds(seeds, job_id=jid, depth=1)
            return {"jobIds": [jid], "seeds": len(seeds), "dynamic": True}
        job_ids = []
        for u in seeds:
            # index by the GLOBAL pending count: a per-call counter
            # would mint duplicate ids across multiple submissions,
            # fanning out the job-config broadcast join
            jid = (
                f"{job_id_prefix}-{len(self._pending):04d}"
                if job_id_prefix
                else str(uuid.uuid4())
            )
            self._pending.append(
                {"job_id": jid, "seed_url": u, "depth_limit": depth_limit,
                 "seed_idx": len(self._pending), "created_at": time.time()}
            )
            job_ids.append(jid)
        return {"jobIds": job_ids, "seeds": len(seeds)}

    def _jobs_pdf(self):
        """The jobs dim, read once per service: immutable after init
        (the engine pins the job table at crawl start), so polling
        job_status N times costs one parquet read total."""
        if getattr(self, "_jobs_cache", None) is None:
            jobs_path = os.path.join(self.root, "jobs.parquet")
            if not os.path.isfile(jobs_path):
                return None
            self._jobs_cache = pd.read_parquet(jobs_path)
        return self._jobs_cache

    def _first_job(self) -> str:
        if self.run._jobs_df is None:
            self.run._load_dims()  # resumed service: dims not loaded yet
        return self.run._jobs_df.select("job_id").head(1)[0][0]

    # -- crawl loop -----------------------------------------------------------

    def crawl(self, max_rounds: int | None = None) -> list[dict]:
        """Drain the frontier (the workers' poll loop, compressed)."""
        if not self._started:
            if not self._pending:
                raise ValueError("start_job first: no seeds submitted")
            seeds_df = self.spark.createDataFrame(
                pd.DataFrame(self._pending)[
                    ["job_id", "seed_url", "depth_limit", "seed_idx", "created_at"]
                ],
                schema="job_id string, seed_url string, depth_limit int, "
                "seed_idx int, created_at double",
            )
            self.run.init(self.pages_path, self.robots_df, seeds_df)
            self._started = True
            # the pending list is now the persisted jobs table —
            # job_status must read THAT (live counters), not the
            # pre-init snapshot
            self._pending = []
        return self.run.run(max_rounds=max_rounds)

    # -- GET /search (master.py:165-213) --------------------------------------

    def search(
        self, query: str, limit: int | None = 50, unbounded: bool = False
    ) -> list[dict] | Iterator[dict]:
        """Returns ranked ``{"pageUrl", "frequency"}`` results (O1);
        empty before anything is indexed (the reference returns [] for
        an empty index, master.py:213).

        Bounded by default: the reference SQL has no LIMIT
        (master.py:209) but its UI shows one page of results — an
        unbounded collect of a broad OR query at 10^10-URL scale would
        OOM the driver.  ``limit=50`` returns a ``list`` and keeps the
        plan a TakeOrdered (top-k, no global sort materialized).
        ``unbounded=True`` (or ``limit=None``) is the faithful full
        result set and returns a GENERATOR backed by
        ``toLocalIterator`` — at most one partition resident in the
        JVM collect buffer and one row resident in Python at a time,
        so driver memory stays bounded end-to-end (advisor r3: the old
        list materialization made the claim JVM-side only)."""
        if self.run.postings_df() is None:
            # keep the return protocol consistent with the non-empty
            # path: unbounded callers always get an iterator
            return iter(()) if (unbounded or limit is None) else []
        if unbounded or limit is None:
            df = self.run.search(query, limit=None)
            return (
                {"pageUrl": r["url"], "frequency": r["frequency"]}
                for r in df.toLocalIterator()
            )
        df = self.run.search(query, limit=limit)
        return [
            {"pageUrl": r["url"], "frequency": r["frequency"]} for r in df.collect()
        ]

    # -- GET /jobs/<job_id> (master.py:147-163) --------------------------------

    def job_status(self, job_id: str) -> dict:
        """The jobs-table row: config + lifetime discovered/indexed
        counters, exactly the reference's job-status payload
        (master.py:147-163).  discoveredCount counts re-fetches in
        ``dedup='index'`` mode (crawler_worker.py:171-177)."""
        # a job submitted but not yet crawled is queryable immediately
        # (the reference inserts the row at POST time, master.py:129-136)
        for p in self._pending:
            if p["job_id"] == job_id:
                lo, hi = self.cfg.depth_clamp
                return {
                    "jobId": job_id,
                    "seedUrl": p["seed_url"],
                    "depthLimit": max(lo, min(int(p["depth_limit"]), hi)),
                    "discoveredCount": 0,
                    "indexedCount": 0,
                    "status": "PENDING",
                    "createdAt": float(p["created_at"]),
                }
        jobs = self._jobs_pdf()
        if jobs is None:
            return {"error": "Job not found"}  # master.py:162
        row = jobs[jobs["job_id"] == job_id]
        if row.empty:
            return {"error": "Job not found"}
        row = row.iloc[0]
        counters = {"n_fetched": 0, "n_indexed": 0}
        jc = self.run.job_counters_df()
        if jc is not None:
            for r in jc.where(F.col("job_id") == job_id).collect():
                counters[r["key"]] = int(r["value"])
        return {
            "jobId": job_id,
            "seedUrl": row["seed_url"],
            "depthLimit": int(row["depth_limit"]),
            "discoveredCount": counters["n_fetched"],
            "indexedCount": counters["n_indexed"],
            "status": row["status"],
            "createdAt": float(row["created_at"]),
        }

    # -- GET /nodes (master.py:215-217) ----------------------------------------

    def nodes(self) -> dict:
        """node-id -> 'alive'|'dead' — the reference's heartbeat-poller
        view (master.py:49-62,215-217).  Engine equivalent: the latest
        committed round's per-partition parse lineage; every partition
        that committed output is alive (a dead executor's task was
        re-run elsewhere — Spark's task retry IS the liveness
        mechanism, SURVEY §2.9 C7).  An idle latest round (nothing
        fetched, so no parse lineage) falls back to the most recent
        round that DID parse — liveness is about nodes, not about the
        last round having had work (master.py reports registered
        nodes regardless)."""
        m = self.run.metrics_df()
        if m is None:
            return {}
        # compute the latest parse round IN Spark and filter before the
        # collect (advisor r3): the lineage history is O(rounds x
        # partitions) and only the last round's rows are the liveness
        # map — never ship the whole history to the driver
        parse = m.where(F.col("stage") == "parse")
        last_parse_round = parse.agg(F.max("round")).head()[0]
        if last_parse_round is None:
            return {}
        rows = (
            parse.where(F.col("round") == last_parse_round)
            .select("partition_id")
            .orderBy("partition_id")
            .collect()
        )
        return {f"partition-{r['partition_id']}": "alive" for r in rows}

    # -- GET /suggest (master.py:72-90, offline equivalent) --------------------

    def suggest(self, query: str) -> list[str]:
        """Top-5 word suggestions for a partial query.  The reference
        proxies the external Datamuse API; this serves the same verb
        from the index vocabulary (prefix-first, Levenshtein<=2 typo
        fallback, frequency-ranked) — [] on blank query or empty index,
        like master.py:77,87-89."""
        from .plans.search_query import suggest_terms

        postings = self.run.postings_df()
        df = suggest_terms(self.spark, postings, query)
        return [r["term"] for r in df.collect()]

    # -- GET /monitor (master.py:219-242) --------------------------------------

    def monitor(self) -> dict:
        """Latest round's counters + per-partition parse lineage — the
        heartbeat table reshaped as data (C6)."""
        m = self.run.monitor_df()
        if m is None:
            return {"round": None, "counters": {}, "partitions": [], "jobs": {}}
        rows = m.collect()
        rnd = rows[0]["round"] if rows else None
        counters = {
            r["key"]: r["value"] for r in rows if r["stage"] == "round"
        }
        partitions = [
            {"partition_id": r["partition_id"], "key": r["key"], "value": r["value"]}
            for r in rows
            if r["stage"] == "parse"
        ]
        jobs: dict[str, dict] = {}
        for r in rows:
            if r["stage"] == "job":
                jobs.setdefault(r["job_id"], {})[r["key"]] = r["value"]
        return {"round": rnd, "counters": counters, "partitions": partitions, "jobs": jobs}

    # -- GET /health (master.py:68-70) -----------------------------------------

    def health(self) -> dict:
        try:
            self.spark.sql("SELECT 1").collect()
            committed = self.run.metrics.last_round()
            return {
                "status": "healthy",
                "rounds_done": (committed + 1) if committed is not None else 0,
                "started": self._started,
            }
        except Exception as e:  # pragma: no cover - session death
            return {"status": "unhealthy", "error": str(e)}
