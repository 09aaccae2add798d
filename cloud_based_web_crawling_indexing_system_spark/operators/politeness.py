"""Politeness as data: per-host token-bucket window (C1).

The reference sleeps ``crawl_delay('*') or 1.0`` seconds before every
fetch (/root/reference/Cloud/scripts/crawler_worker.py:149).  The
set-oriented equivalent: in a round of budget ``T`` seconds, host
``h`` may fetch ``max(1, floor(T / delay(h)))`` URLs; the rest are
deferred to the next round unchanged.

Skew handling (north_rule: "partitioning / shuffle / skew handled
explicitly"): a mega-host holding 30%+ of the frontier would make
``Window.partitionBy(host)`` a single giant sort task.  We therefore
rank in two phases:

  1. salt each row into S buckets by ``pmod(xxhash64(url), S)`` and
     rank within (host, salt) — S parallel small sorts;
  2. only rows with salted rank <= budget (at most S*budget per host)
     enter the exact global per-host rank.

A row outside the top-budget of its salt bucket cannot be in the
host's global top-budget, so phase 2 sees a bounded input and the
result is exactly equal to the unsalted window — deterministic under
any parallelism because the order key (priority, url) is content-
derived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["admit_defer"]

# canonical within-host order (priority=depth); (job_id, seed_idx)
# refine ties, which only exist in dedup='index' mode where the same
# url can sit in one round under several jobs — without them the
# admit/defer split of duplicates would be shuffle-layout-dependent
ORDER_COLS = ["depth", "url", "job_id", "seed_idx"]


def admit_defer(
    df: DataFrame,
    budget_col: str = "budget",
    salts: int = 8,
) -> DataFrame:
    """Adds boolean ``admitted``; rows with admitted=false are the
    deferrals.  ``df`` must carry ``host`` plus every ORDER_COLS
    column (depth, url, job_id, seed_idx) and ``budget_col`` —
    (job_id, seed_idx) refine duplicate-url ties in index-dedup mode,
    see the module comment."""
    order = [F.col(c) for c in ORDER_COLS]
    if salts <= 1:
        w = Window.partitionBy("host").orderBy(*order)
        return df.withColumn(
            "admitted", F.row_number().over(w) <= F.col(budget_col)
        )
    salted = df.withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(salts)))
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    ranked1 = salted.withColumn("_rk1", F.row_number().over(w1))
    survivors = ranked1.where(F.col("_rk1") <= F.col(budget_col))
    losers = ranked1.where(F.col("_rk1") > F.col(budget_col)).withColumn(
        "admitted", F.lit(False)
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    ranked2 = survivors.withColumn("_rk2", F.row_number().over(w2))
    decided = ranked2.withColumn("admitted", F.col("_rk2") <= F.col(budget_col)).drop("_rk2")
    return decided.unionByName(losers).drop("_salt", "_rk1")
